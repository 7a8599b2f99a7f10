"""Compression kernel round-trips (mirrors PredictorModel*Test, CodecM32Test)."""

from __future__ import annotations

import numpy as np
import pytest

from gridfour_spark import compress as C


def _grids():
    rng = np.random.default_rng(42)
    # smooth DEM-like grid
    r, c = np.meshgrid(np.arange(12), np.arange(17), indexing="ij")
    smooth = np.floor(4000 * np.sin(r * 0.2) * np.cos(c * 0.17)).astype(np.int32)
    # value-rule grid (SampleFiles)
    rule = (r * 17 + c - 1).astype(np.int32)
    # random noise incl. large magnitudes (int-overflow edge cases,
    # PredictorModelDifferencingTest)
    noise = rng.integers(-(2**31) + 1, 2**31 - 1, size=(12, 17), dtype=np.int64).astype(np.int32)
    small = rng.integers(-50, 50, size=(2, 2), dtype=np.int64).astype(np.int32)
    return {"smooth": smooth, "rule": rule, "noise": noise, "small": small}


@pytest.mark.parametrize("ptype", list(C.PREDICTORS))
@pytest.mark.parametrize("gname", ["smooth", "rule", "noise", "small"])
def test_predictor_round_trip(ptype, gname):
    v = _grids()[gname]
    nr, nc = v.shape
    enc, dec = C.PREDICTORS[ptype]
    seed, syms = enc(v)
    assert len(syms) == nr * nc - 1
    back = dec(seed, syms, nr, nc)
    np.testing.assert_array_equal(back, v)


def test_m32_thresholds_and_boundaries():
    """CodecM32Test: threshold/boundary values, each encodes to the documented
    byte count and round-trips (CodecM32.java:55-111)."""
    cases = {
        0: 1, 126: 1, -126: 1,
        127: 2, 254: 2, -127: 2, -254: 2,
        255: 3, 16638: 3,
        16639: 4, 2113790: 4,
        2113791: 5, 270549246: 5,
        270549247: 6, 2**31 - 1: 6, -(2**31) + 1: 6,
        -(2**31): 1,  # special -128 code
    }
    vals = np.array(list(cases), dtype=np.int32)
    buf = C.m32_encode(vals)
    assert len(buf) == sum(cases.values())
    back = C.m32_decode(buf, len(vals))
    np.testing.assert_array_equal(back, vals)


def test_m32_documented_examples():
    """Spec examples (CodecM32.java:81-90): 126 -> [126]; 127 -> [127, 0];
    128 -> [127, 1]; 255 -> [127, 0x80, 0x00]; 16638 -> [127, 0xFF, 0x7F]."""
    def b(v):
        return list(C.m32_encode(np.array([v], dtype=np.int32)))

    assert b(126) == [126]
    assert b(127) == [127, 0]
    assert b(128) == [127, 1]
    assert b(255) == [127, 0x80, 0x00]
    assert b(16638) == [127, 0xFF, 0x7F]
    assert b(16639) == [127, 0x80, 0x80, 0x00]


def test_m32_random_round_trip():
    rng = np.random.default_rng(7)
    mags = np.concatenate(
        [
            rng.integers(-126, 127, 5000),
            rng.integers(-20000, 20000, 2000),
            rng.integers(-(2**31), 2**31 - 1, 2000),
        ]
    ).astype(np.int32)
    rng.shuffle(mags)
    back = C.m32_decode(C.m32_encode(mags), len(mags))
    np.testing.assert_array_equal(back, mags)


def test_encode_tile_race_and_round_trip():
    v = _grids()["smooth"]
    nr, nc = v.shape
    res = C.encode_tile(v.ravel(), nr, nc)
    assert res["kept"] and res["n_bytes"] < res["standard_bytes"]
    back = C.decode_tile(res["payload"], nr, nc)
    np.testing.assert_array_equal(back, v.reshape(nr, nc))


def test_encode_tile_incompressible_not_kept():
    v = _grids()["noise"]
    nr, nc = v.shape
    res = C.encode_tile(v.ravel(), nr, nc)
    assert not res["kept"]  # random int32 noise cannot beat 4 bytes/cell


def test_bits_per_sample_smooth_dem():
    """Smooth synthetic DEM should land in the few-bits-per-sample regime the
    reference reports for real DEMs (README.md:111-112 ~5.5 b/s on GEBCO)."""
    r, c = np.meshgrid(np.arange(120), np.arange(180), indexing="ij")
    v = np.floor(
        4000 * np.sin(r * 0.021) * np.cos(c * 0.017) + 2000 * np.sin(r * 0.005 + c * 0.003)
    ).astype(np.int32)
    res = C.encode_tile(v.ravel(), 120, 180)
    bps = C.bits_per_sample(res["n_bytes"], v.size)
    assert res["kept"]
    assert bps < 8.0, bps


def test_huffman_round_trip_and_race():
    """C7/C8: Huffman joins the codec race; round trip through decode_tile's
    codec dispatch (CodecMaster.decode:195-202)."""
    from gridfour_spark import huffman as H

    rng = np.random.default_rng(5)
    # geometric-ish residual distribution favors Huffman's small table
    v = np.cumsum(rng.integers(-3, 4, size=(20, 30)), axis=1).astype(np.int32)
    res = C.encode_tile(v.ravel(), 20, 30, use_huffman=True)
    back = C.decode_tile(res["payload"], 20, 30)
    np.testing.assert_array_equal(back, v)

    # force-huffman payload decodes identically
    seed, syms = C.PREDICTORS[res["predictor"]][0](v)
    m32 = C.m32_encode(syms)
    header = bytes([res["predictor"]]) + int(np.int64(seed) & 0xFFFFFFFF).to_bytes(4, "little") + len(m32).to_bytes(4, "little")
    forced = bytes([H.HUFFMAN_CODEC_INDEX]) + header + H.huff_encode(m32)
    np.testing.assert_array_equal(C.decode_tile(forced, 20, 30), v)


def test_huffman_edge_streams():
    from gridfour_spark import huffman as H

    for data in [bytes(500), bytes([3] * 7), bytes(range(256)) * 4]:
        assert H.huff_decode(H.huff_encode(data)) == data
