"""Zarr v2 array source + sink — pure numpy + stdlib codecs, no external
libs.

Cloud-native sibling of the NetCDF-3 / GeoTIFF sources: the PUBLIC Zarr v2
spec (https://zarr.readthedocs.io/en/stable/spec/v2.html) stores an N-D
array as a directory of independently-compressed chunk objects plus a tiny
``.zarray`` JSON descriptor. Structurally this is the same
tile-of-independent-blocks layout the reference's GVRS format uses
(core/.../gvrs/GvrsFile.java tile store; GvrsFileSpecification.java
nRowsInTile/nColsInTile), but flattened into one object per chunk — the
shape object stores and 1000-executor scans want, because every chunk is
independently addressable with no shared directory to page.

- ``parse_zarr_array`` — driver-side metadata parse. Reads ONLY the
  ``.zarray`` / ``.zattrs`` JSON (O(bytes)); never touches chunk data.
- ``zarr_cells`` — DISTRIBUTED chunk read with exact chunk-grid pushdown:
  the task list is a ``spark.range`` over chunk ids (never a driver-side
  list), filtered arithmetically to the chunks intersecting the requested
  window, so a 10^8-chunk store plans in O(1) driver memory and a window
  read opens only its covering chunks. Absent chunk objects decode to
  ``fill_value`` per spec.
- ``write_zarr`` — FULLY DISTRIBUTED sink: cells group by chunk id and
  each executor task encodes + atomically writes its own chunk object; the
  driver writes only the JSON metadata. Unlike the GVRS single-file
  packaging contract (a declared driver-streamed assembly), this sink
  parallelizes to cluster width — the shape a 100 TB export needs.
- ``update_zarr`` — DISTRIBUTED chunk upsert: deltas group by chunk id and
  each executor task read-modify-writes only its own chunk object. Cost is
  O(touched chunks); untouched chunks are never opened. Contrast with the
  GVRS single-file update (record-manager compaction): Zarr's
  one-object-per-chunk layout makes update embarrassingly parallel, which
  is exactly why object stores favor it.
- ``write_zarr_pyramid`` — multiscale overview pyramid (the A5 downsample /
  COG-overview analytics as a STORED artifact): level 0 plus factor-2
  mean-pooled levels, each written with the distributed sink and each
  level's input read back from the level below (the sink is the source —
  no lineage recompute), plus a ``.zgroup`` + consolidated multiscale
  attrs in the OME-NGFF style.
- ``write_zarr_array`` / ``read_zarr_array`` — driver-side whole-array
  convenience for tests and golden vectors, sharing the same chunk codec.

Codec support is honest about the sandbox: ``zlib`` / ``gzip`` / ``bz2`` /
``lzma`` / ``null`` (all stdlib) plus the numcodecs ``delta`` filter;
``blosc`` / ``zstd`` raise ``NotImplementedError`` (their libs are not in
this container).

Zarr v3 (round 6): ``parse_zarr_array`` auto-detects ``zarr.json`` and maps
the v3 core metadata — regular chunk grid, "default" (``c/``-prefixed) and
"v2" chunk key encodings, the "bytes" array->bytes codec (either endian),
gzip and crc32c bytes->bytes codecs, and the ``sharding_indexed`` codec
(inner chunks packed into shard objects behind a crc32c'd uint64 offset
index, all-fill inner chunks omitted — the GVRS tiles-in-one-file layout
re-expressed for object stores; the distributed kernels treat a shard as
their chunk unit, so sink/read/upsert work unchanged) — onto the same
ZarrInfo, so every distributed kernel (zarr_cells / write_zarr /
update_zarr / pyramid) serves both formats; the sinks take
``zarr_format=3``. Transpose and the non-stdlib v3 codecs raise honestly.
"""

from __future__ import annotations

import bz2
import gzip
import json
import lzma
import math
import os
import struct
import uuid
import zlib
from dataclasses import dataclass, field

import numpy as np

ZARR_FORMAT = 2

# Zarr v3 data_type names (no endianness — that lives in the "bytes" codec)
_V3_DTYPES = {
    "int8": "i1", "int16": "i2", "int32": "i4", "int64": "i8",
    "uint8": "u1", "uint16": "u2", "uint32": "u4", "uint64": "u8",
    "float32": "f4", "float64": "f8",
}
_V3_NAMES = {v: k for k, v in _V3_DTYPES.items()}


# ---------------------------------------------------------------------------
# metadata
# ---------------------------------------------------------------------------


@dataclass
class ZarrInfo:
    path: str
    shape: tuple
    chunks: tuple
    dtype: np.dtype
    order: str  # "C" | "F"
    fill_value: object  # python scalar or None
    compressor: dict | None
    filters: list | None
    separator: str  # "." (default) | "/"
    attrs: dict = field(default_factory=dict)
    zarr_format: int = 2
    key_prefix: str = ""  # v3 "default" chunk_key_encoding prepends "c"
    # v3 "transpose" array->array codec: axis permutation applied BEFORE
    # the bytes codec serializes (pure-numpy; None = identity)
    transpose: tuple | None = None

    @property
    def chunk_grid(self) -> tuple:
        return tuple(-(-s // c) for s, c in zip(self.shape, self.chunks))

    def chunk_key(self, *idx: int) -> str:
        parts = ([self.key_prefix] if self.key_prefix else []) + [
            str(i) for i in idx
        ]
        return self.separator.join(parts)


def _fill_from_json(v, dtype: np.dtype):
    # spec: NaN/Infinity/-Infinity are encoded as strings in .zarray
    if v is None:
        return None
    if isinstance(v, str):
        if v in ("NaN", "Infinity", "-Infinity"):
            return float(v.replace("Infinity", "inf"))
        raise NotImplementedError(f"string fill_value {v!r} (base64 struct fills unsupported)")
    return v


def _fill_to_json(v):
    if v is None:
        return None
    f = float(v)
    if math.isnan(f):
        return "NaN"
    if math.isinf(f):
        return "Infinity" if f > 0 else "-Infinity"
    return v


def parse_zarr_array(path: str) -> ZarrInfo:
    """Driver-side parse of a Zarr array directory — v2 (``.zarray``) or
    v3 (``zarr.json``), auto-detected. Reads only the JSON metadata:
    O(bytes) driver state regardless of how many chunk objects the array
    has. Both formats map onto the same ZarrInfo, so every distributed
    kernel (zarr_cells / write_zarr / update_zarr / pyramid) serves both."""
    za = os.path.join(path, ".zarray")
    if not os.path.exists(za) and os.path.exists(os.path.join(path, "zarr.json")):
        return _parse_zarr_v3(path)
    with open(za, "rb") as f:
        meta = json.load(f)
    if meta.get("zarr_format") != ZARR_FORMAT:
        raise ValueError(f"not a Zarr v2 array: zarr_format={meta.get('zarr_format')}")
    dtype = np.dtype(meta["dtype"])
    if dtype.kind not in "iuf":
        raise NotImplementedError(f"dtype {meta['dtype']!r} (only int/uint/float supported)")
    order = meta.get("order", "C")
    if order not in ("C", "F"):
        raise ValueError(f"bad order {order!r}")
    attrs = {}
    zattrs = os.path.join(path, ".zattrs")
    if os.path.exists(zattrs):
        with open(zattrs, "rb") as f:
            attrs = json.load(f)
    return ZarrInfo(
        path=path,
        shape=tuple(meta["shape"]),
        chunks=tuple(meta["chunks"]),
        dtype=dtype,
        order=order,
        fill_value=_fill_from_json(meta.get("fill_value"), dtype),
        compressor=meta.get("compressor"),
        filters=meta.get("filters"),
        separator=meta.get("dimension_separator", "."),
        attrs=attrs,
    )


def _v3_codec_chain(codecs: list) -> tuple[str, list, tuple | None]:
    """Parse a v3 codec list -> (endian, internal bytes->bytes chain,
    transpose permutation or None).  Requires exactly one "bytes"
    array->bytes codec; "transpose" (pure-numpy axis permutation, round 7)
    must precede it; gzip/crc32c supported, zstd/blosc raise
    codec-unavailable, everything else NotImplementedError."""
    ab = [c for c in codecs if c.get("name") == "bytes"]
    if len(ab) != 1:
        raise NotImplementedError(
            "v3 codecs must contain exactly one 'bytes' array->bytes codec"
        )
    endian = (ab[0].get("configuration") or {}).get("endian", "little")
    chain = []
    perm = None
    seen_bytes = False
    for c in codecs:
        name, ccfg = c.get("name"), c.get("configuration") or {}
        if name == "bytes":
            seen_bytes = True
            continue
        if name == "transpose":
            if seen_bytes:
                raise ValueError(
                    "v3 'transpose' is an array->array codec: it must "
                    "precede 'bytes'")
            perm = tuple(int(i) for i in ccfg["order"])
            if sorted(perm) != list(range(len(perm))):
                raise ValueError(f"transpose order {perm!r} is not a permutation")
        elif name == "gzip":
            chain.append({"id": "gzip", "level": int(ccfg.get("level", 6))})
        elif name == "crc32c":
            chain.append({"id": "crc32c"})
        elif name in ("zstd", "blosc"):
            raise _codec_unavailable(name)
        else:
            raise NotImplementedError(f"v3 codec {name!r} unsupported")
    # identity permutation = no transpose
    if perm is not None and perm == tuple(range(len(perm))):
        perm = None
    return endian, chain, perm


def _parse_zarr_v3(path: str) -> ZarrInfo:
    """Zarr v3 (https://zarr-specs.readthedocs.io/en/latest/v3/core/index.html)
    array metadata -> ZarrInfo. Supported: regular chunk grid, "default"
    (``c/``-prefixed) and "v2" chunk key encodings, the required "bytes"
    array->bytes codec (either endian), gzip / crc32c bytes->bytes codecs,
    and the ``sharding_indexed`` codec (inner chunks packed into shard
    objects with a binary offset/length index — the GVRS tiles-in-one-file
    layout, v3 edition), and the "transpose" array->array codec (pure-numpy
    axis permutation, round 7 — top-level or shard-inner); zstd and blosc
    raise the honest codec-unavailable error."""
    with open(os.path.join(path, "zarr.json"), "rb") as f:
        meta = json.load(f)
    if meta.get("zarr_format") != 3 or meta.get("node_type") != "array":
        raise ValueError(
            f"not a Zarr v3 array: zarr_format={meta.get('zarr_format')} "
            f"node_type={meta.get('node_type')}"
        )
    base = _V3_DTYPES.get(meta["data_type"])
    if base is None:
        raise NotImplementedError(f"v3 data_type {meta['data_type']!r} unsupported")
    cg = meta["chunk_grid"]
    if cg.get("name") != "regular":
        raise NotImplementedError(f"v3 chunk_grid {cg.get('name')!r} unsupported")
    chunks = tuple(cg["configuration"]["chunk_shape"])
    cke = meta.get("chunk_key_encoding", {"name": "default"})
    cfg = cke.get("configuration") or {}
    if cke.get("name") == "default":
        sep, prefix = cfg.get("separator", "/"), "c"
    elif cke.get("name") == "v2":
        sep, prefix = cfg.get("separator", "."), ""
    else:
        raise NotImplementedError(f"v3 chunk_key_encoding {cke.get('name')!r}")
    codecs = meta.get("codecs", [])
    transpose = None
    if len(codecs) == 1 and codecs[0].get("name") == "sharding_indexed":
        scfg = codecs[0]["configuration"]
        endian, inner_chain, inner_perm = _v3_codec_chain(scfg["codecs"])
        i_endian, i_chain, i_perm = _v3_codec_chain(
            scfg.get("index_codecs",
                     [{"name": "bytes",
                       "configuration": {"endian": "little"}},
                      {"name": "crc32c"}]))
        if i_endian != "little" or i_perm is not None or any(
            c["id"] != "crc32c" for c in i_chain
        ):
            raise NotImplementedError(
                "sharding index_codecs: little-endian bytes (+ crc32c) only")
        loc = scfg.get("index_location", "end")
        if loc not in ("end", "start"):
            raise ValueError(f"bad index_location {loc!r}")
        chain = {"id": "shard",
                 "inner_chunks": tuple(scfg["chunk_shape"]),
                 "codecs": inner_chain,
                 "index_crc": any(c["id"] == "crc32c" for c in i_chain),
                 "index_location": loc}
        if inner_perm is not None:
            chain["transpose"] = inner_perm
    else:
        endian, chain, transpose = _v3_codec_chain(codecs)
        chain = chain or None
    dtype = np.dtype(("<" if endian == "little" else ">") + base)
    return ZarrInfo(
        path=path,
        shape=tuple(meta["shape"]),
        chunks=chunks,
        dtype=dtype,
        order="C",
        fill_value=_fill_from_json(meta.get("fill_value"), dtype),
        compressor=chain,
        filters=None,
        separator=sep,
        attrs=meta.get("attributes", {}),
        zarr_format=3,
        key_prefix=prefix,
        transpose=transpose,
    )


# ---------------------------------------------------------------------------
# chunk codec (shared by the distributed source/sink and the local helpers)
# ---------------------------------------------------------------------------

_STDLIB_CODECS = ("zlib", "gzip", "bz2", "lzma", None)


def _codec_unavailable(cid: str) -> NotImplementedError:
    return NotImplementedError(
        f"zarr compressor {cid!r} needs a lib not in this container "
        f"(supported hermetically: {', '.join(str(c) for c in _STDLIB_CODECS)})"
    )


def _compress(buf: bytes, compressor: dict | list | None) -> bytes:
    if compressor is None:
        return buf
    if isinstance(compressor, list):  # v3 bytes->bytes codec chain, in order
        for c in compressor:
            buf = _compress(buf, c)
        return buf
    cid = compressor.get("id")
    level = int(compressor.get("level", 6))
    if cid == "zlib":
        return zlib.compress(buf, level)
    if cid == "gzip":
        # numcodecs GZip: standard gzip member, mtime irrelevant to decode;
        # pin mtime=0 so chunk bytes are deterministic across retries
        return gzip.compress(buf, compresslevel=level, mtime=0)
    if cid == "bz2":
        return bz2.compress(buf, compresslevel=max(1, level))
    if cid == "lzma":
        return lzma.compress(buf, preset=compressor.get("preset"))
    if cid == "crc32c":
        # v3 crc32c codec: append little-endian CRC32C of the input (the
        # same Castagnoli polynomial the GVRS inspector uses, C13)
        from gridfour_spark.floatcodec import crc32c

        return buf + struct.pack("<I", crc32c(buf))
    raise _codec_unavailable(cid)


def _decompress(buf: bytes, compressor: dict | list | None) -> bytes:
    if compressor is None:
        return buf
    if isinstance(compressor, list):
        for c in reversed(compressor):
            buf = _decompress(buf, c)
        return buf
    cid = compressor.get("id")
    if cid == "zlib":
        return zlib.decompress(buf)
    if cid == "gzip":
        return gzip.decompress(buf)
    if cid == "bz2":
        return bz2.decompress(buf)
    if cid == "lzma":
        return lzma.decompress(buf)
    if cid == "crc32c":
        from gridfour_spark.floatcodec import crc32c

        body, want = buf[:-4], struct.unpack("<I", buf[-4:])[0]
        got = crc32c(body)
        if got != want:
            raise ValueError(
                f"zarr crc32c checksum mismatch: stored {want:#010x}, "
                f"computed {got:#010x}"
            )
        return body
    raise _codec_unavailable(cid)


def _filters_encode(arr: np.ndarray, filters: list | None) -> np.ndarray:
    if not filters:
        return arr
    for f in filters:
        if f.get("id") == "delta":
            # numcodecs Delta: out[0] = a[0]; out[i] = a[i] - a[i-1],
            # stored as astype (default: same as dtype)
            astype = np.dtype(f.get("astype", f["dtype"]))
            flat = arr.ravel()
            enc = np.empty(flat.shape, dtype=astype)
            enc[0:1] = flat[0:1].astype(astype)
            np.subtract(flat[1:], flat[:-1], out=enc[1:], casting="unsafe")
            arr = enc
        else:
            raise NotImplementedError(f"zarr filter {f.get('id')!r} unsupported")
    return arr


def _filters_decode(arr: np.ndarray, filters: list | None) -> np.ndarray:
    if not filters:
        return arr
    for f in reversed(filters):
        if f.get("id") == "delta":
            arr = np.cumsum(arr, dtype=np.dtype(f["dtype"]))
        else:
            raise NotImplementedError(f"zarr filter {f.get('id')!r} unsupported")
    return arr


def _is_sharded(info: ZarrInfo) -> bool:
    return isinstance(info.compressor, dict) and info.compressor.get("id") == "shard"


def _inner_info(info: ZarrInfo) -> ZarrInfo:
    """Per-inner-chunk codec view of a sharded array (chunks = the inner
    chunk shape, compressor = the inner bytes->bytes chain)."""
    sh = info.compressor
    inner = tuple(sh["inner_chunks"])
    return ZarrInfo(
        path=info.path, shape=inner, chunks=inner, dtype=info.dtype,
        order="C", fill_value=info.fill_value,
        compressor=sh["codecs"] or None, filters=None,
        separator=info.separator, zarr_format=3, key_prefix=info.key_prefix,
        transpose=sh.get("transpose"),
    )


_SHARD_ABSENT = 0xFFFFFFFFFFFFFFFF


def _shard_grid(info: ZarrInfo) -> tuple:
    ih, iw = info.compressor["inner_chunks"]
    return (-(-info.chunks[0] // ih), -(-info.chunks[1] // iw))


def _encode_shard(chunk: np.ndarray, info: ZarrInfo) -> bytes:
    """v3 sharding_indexed shard object: inner chunks (C-order scan of the
    inner grid) encoded with the inner codec chain and concatenated, plus a
    uint64-LE (offset, nbytes) pair per inner chunk; all-fill inner chunks
    are OMITTED (sentinel 2^64-1 per spec) so a sparse shard costs only its
    occupied inner chunks — the same skip-all-fill rule as the GVRS tile
    store (T7). Deterministic bytes, so task retries rewrite identically."""
    sh = info.compressor
    iinf = _inner_info(info)
    ih, iw = iinf.chunks
    gr, gc = _shard_grid(info)
    fv = info.fill_value
    if fv is None:
        fv = np.nan if info.dtype.kind == "f" else 0
    parts, index = [], []
    pos = 0
    for ci in range(gr):
        for cj in range(gc):
            block = np.full((ih, iw), fv, dtype=info.dtype)
            sub = chunk[ci * ih:(ci + 1) * ih, cj * iw:(cj + 1) * iw]
            block[: sub.shape[0], : sub.shape[1]] = sub
            if (
                np.all(block == info.dtype.type(fv))
                or (info.dtype.kind == "f" and math.isnan(float(fv))
                    and bool(np.all(np.isnan(block))))
            ):
                index.append((_SHARD_ABSENT, _SHARD_ABSENT))
                continue
            enc = encode_chunk(block, iinf)
            index.append((pos, len(enc)))
            parts.append(enc)
            pos += len(enc)
    idx = b"".join(struct.pack("<QQ", o, n) for o, n in index)
    if sh.get("index_crc", True):
        from gridfour_spark.floatcodec import crc32c

        idx += struct.pack("<I", crc32c(idx))
    if sh.get("index_location", "end") == "start":
        shift = len(idx)
        idx = b"".join(
            struct.pack("<QQ",
                        o if o == _SHARD_ABSENT else o + shift,
                        n)
            for o, n in index)
        if sh.get("index_crc", True):
            idx += struct.pack("<I", crc32c(idx))
        return idx + b"".join(parts)
    return b"".join(parts) + idx


def _decode_shard(buf: bytes, info: ZarrInfo) -> np.ndarray:
    sh = info.compressor
    iinf = _inner_info(info)
    ih, iw = iinf.chunks
    gr, gc = _shard_grid(info)
    n = gr * gc
    idx_len = 16 * n + (4 if sh.get("index_crc", True) else 0)
    raw = buf[-idx_len:] if sh.get("index_location", "end") == "end" \
        else buf[:idx_len]
    if sh.get("index_crc", True):
        from gridfour_spark.floatcodec import crc32c

        body, want = raw[:-4], struct.unpack("<I", raw[-4:])[0]
        got = crc32c(body)
        if got != want:
            raise ValueError(
                f"shard index crc32c mismatch: stored {want:#010x}, "
                f"computed {got:#010x}")
        raw = body
    pairs = np.frombuffer(raw, dtype="<u8").reshape(n, 2)
    out = _fill_array(info).copy()
    for k in range(n):
        off, nb = int(pairs[k, 0]), int(pairs[k, 1])
        if off == _SHARD_ABSENT:
            continue
        ci, cj = divmod(k, gc)
        sub = decode_chunk(buf[off:off + nb], iinf)
        r1 = min((ci + 1) * ih, info.chunks[0])
        c1 = min((cj + 1) * iw, info.chunks[1])
        out[ci * ih:r1, cj * iw:c1] = sub[: r1 - ci * ih, : c1 - cj * iw]
    return out


def read_shard_window(
    path: str,
    info: ZarrInfo,
    lr0: int,
    lr1: int,
    lc0: int,
    lc1: int,
) -> tuple[np.ndarray, int]:
    """PARTIAL shard read (round 7, r6 verdict #6): probe the crc32c'd
    uint64 index, then range-read ONLY the inner chunks intersecting the
    local window [lr0:lr1, lc0:lc1) — never the whole shard object.  This
    is the request-rate property ``sharding_indexed`` exists for at object
    -store scale: a point probe against a 4x4-inner shard costs the index
    (16B x inner-chunk-count + 4) plus ONE inner chunk, ~1/16 of the shard
    bytes.  Returns (window array, bytes_read) — bytes_read is the exact
    I/O accounting the pytest bounds, mirroring the paged GVRS directory's
    ``bytes_read`` proof (tests/test_gvrs_bounded.py)."""
    sh = info.compressor
    iinf = _inner_info(info)
    ih, iw = iinf.chunks
    gr, gc = _shard_grid(info)
    n = gr * gc
    crc = sh.get("index_crc", True)
    idx_len = 16 * n + (4 if crc else 0)
    fv = info.fill_value
    if fv is None:
        fv = np.nan if info.dtype.kind == "f" else 0
    out = np.full((lr1 - lr0, lc1 - lc0), fv, dtype=info.dtype)
    with open(path, "rb") as f:
        if sh.get("index_location", "end") == "end":
            f.seek(-idx_len, os.SEEK_END)
        raw = f.read(idx_len)
        bytes_read = idx_len
        if crc:
            from gridfour_spark.floatcodec import crc32c

            body, want = raw[:-4], struct.unpack("<I", raw[-4:])[0]
            got = crc32c(body)
            if got != want:
                raise ValueError(
                    f"shard index crc32c mismatch: stored {want:#010x}, "
                    f"computed {got:#010x}")
            raw = body
        pairs = np.frombuffer(raw, dtype="<u8").reshape(n, 2)
        for ii in range(lr0 // ih, -(-lr1 // ih)):
            for jj in range(lc0 // iw, -(-lc1 // iw)):
                off, nb = (int(x) for x in pairs[ii * gc + jj])
                if off == _SHARD_ABSENT:
                    continue  # unwritten inner chunk -> fill (already there)
                f.seek(off)
                buf = f.read(nb)
                bytes_read += nb
                sub = decode_chunk(buf, iinf)
                # intersection of this inner chunk with the window, in
                # window-local coordinates
                a0, a1 = max(lr0, ii * ih), min(lr1, (ii + 1) * ih)
                b0, b1 = max(lc0, jj * iw), min(lc1, (jj + 1) * iw)
                out[a0 - lr0:a1 - lr0, b0 - lc0:b1 - lc0] = sub[
                    a0 - ii * ih:a1 - ii * ih, b0 - jj * iw:b1 - jj * iw
                ]
    return out, bytes_read


def splice_shard_update(
    buf: bytes | None,
    lr: np.ndarray,
    lc: np.ndarray,
    z: np.ndarray,
    info: ZarrInfo,
) -> tuple[bytes, dict]:
    """PARTIAL shard update — the write-side sibling of read_shard_window:
    decode and re-encode ONLY the inner chunks the update cells touch;
    every untouched inner chunk's encoded bytes are spliced VERBATIM into
    the new shard object (offsets shift, content bytes do not). The shard
    object itself is still rewritten whole (object stores have no range
    PUT), so the win is CPU and determinism: at a 4x4 inner grid a
    single-cell update decodes 1/16 of the shard instead of all of it, and
    the spliced output is bit-identical to a full decode+re-encode (the
    inner codec is deterministic) — asserted in tests/test_zarr.py.

    (lr, lc) are shard-local cell coordinates, z the new values (already
    dtype-coerced by the caller). Returns (new shard bytes, telemetry):
    telemetry = {n_inner, n_touched, n_spliced, decoded_bytes} where
    decoded_bytes counts index + touched-chunk bytes only."""
    sh = info.compressor
    iinf = _inner_info(info)
    ih, iw = iinf.chunks
    gr, gc = _shard_grid(info)
    n = gr * gc
    crc = sh.get("index_crc", True)
    idx_len = 16 * n + (4 if crc else 0)
    fv = info.fill_value
    if fv is None:
        fv = np.nan if info.dtype.kind == "f" else 0

    if buf is None:
        pairs = np.full((n, 2), _SHARD_ABSENT, dtype="<u8")
        decoded_bytes = 0
    else:
        raw = buf[-idx_len:] if sh.get("index_location", "end") == "end" else buf[:idx_len]
        if crc:
            from gridfour_spark.floatcodec import crc32c

            body, want = raw[:-4], struct.unpack("<I", raw[-4:])[0]
            got = crc32c(body)
            if got != want:
                raise ValueError(
                    f"shard index crc32c mismatch: stored {want:#010x}, "
                    f"computed {got:#010x}")
            raw = body
        pairs = np.frombuffer(raw, dtype="<u8").reshape(n, 2)
        decoded_bytes = idx_len

    touched: dict[int, list[int]] = {}
    for i in range(len(lr)):
        k = (int(lr[i]) // ih) * gc + (int(lc[i]) // iw)
        touched.setdefault(k, []).append(i)

    parts, index = [], []
    pos = 0
    n_spliced = 0
    for k in range(n):
        off, nb = int(pairs[k, 0]), int(pairs[k, 1])
        if k not in touched:
            if off == _SHARD_ABSENT:
                index.append((_SHARD_ABSENT, _SHARD_ABSENT))
            else:
                index.append((pos, nb))
                parts.append(buf[off:off + nb])
                pos += nb
                n_spliced += 1
            continue
        ci, cj = divmod(k, gc)
        if off == _SHARD_ABSENT:
            block = np.full((ih, iw), fv, dtype=info.dtype)
        else:
            block = decode_chunk(buf[off:off + nb], iinf).copy()
            decoded_bytes += nb
        sel = touched[k]
        block[
            np.asarray([int(lr[i]) - ci * ih for i in sel]),
            np.asarray([int(lc[i]) - cj * iw for i in sel]),
        ] = z[sel]
        # same skip-all-fill rule as _encode_shard, so splice output stays
        # bit-identical to a full re-encode
        if (
            np.all(block == info.dtype.type(fv))
            or (info.dtype.kind == "f" and math.isnan(float(fv))
                and bool(np.all(np.isnan(block))))
        ):
            index.append((_SHARD_ABSENT, _SHARD_ABSENT))
            continue
        enc = encode_chunk(block, iinf)
        index.append((pos, len(enc)))
        parts.append(enc)
        pos += len(enc)

    idx = b"".join(struct.pack("<QQ", o, nb2) for o, nb2 in index)
    if crc:
        from gridfour_spark.floatcodec import crc32c

        idx += struct.pack("<I", crc32c(idx))
    if sh.get("index_location", "end") == "start":
        shift = len(idx)
        idx = b"".join(
            struct.pack("<QQ",
                        o if o == _SHARD_ABSENT else o + shift,
                        nb2)
            for o, nb2 in index)
        if crc:
            idx += struct.pack("<I", crc32c(idx))
        out = idx + b"".join(parts)
    else:
        out = b"".join(parts) + idx
    tel = {
        "n_inner": n,
        "n_touched": len(touched),
        "n_spliced": n_spliced,
        "decoded_bytes": decoded_bytes,
    }
    return out, tel


def encode_chunk(chunk: np.ndarray, info: ZarrInfo) -> bytes:
    """chunk must be the FULL chunk shape (edge chunks pad with fill)."""
    assert chunk.shape == info.chunks, (chunk.shape, info.chunks)
    if _is_sharded(info):
        return _encode_shard(chunk, info)
    if info.transpose is not None:
        # v3 transpose array->array codec: permute axes, then serialize the
        # PERMUTED layout C-order (pure numpy)
        chunk = np.ascontiguousarray(
            np.asarray(chunk, dtype=info.dtype).transpose(info.transpose)
        )
    a = np.ascontiguousarray(chunk, dtype=info.dtype) if info.order == "C" else \
        np.asfortranarray(chunk, dtype=info.dtype)
    enc = _filters_encode(a.ravel(order=info.order), info.filters)
    return _compress(enc.tobytes(), info.compressor)


def decode_chunk(buf: bytes, info: ZarrInfo) -> np.ndarray:
    if _is_sharded(info):
        return _decode_shard(buf, info)
    raw = _decompress(buf, info.compressor)
    n = int(np.prod(info.chunks))
    if info.filters:
        astype = info.dtype
        for f in info.filters:
            if f.get("id") == "delta":
                astype = np.dtype(f.get("astype", f["dtype"]))
        flat = _filters_decode(np.frombuffer(raw, dtype=astype, count=n), info.filters)
        flat = flat.astype(info.dtype, copy=False)
    else:
        flat = np.frombuffer(raw, dtype=info.dtype, count=n)
    if info.transpose is not None:
        perm = info.transpose
        stored_shape = tuple(info.chunks[i] for i in perm)
        inv = tuple(int(i) for i in np.argsort(perm))
        return flat.reshape(stored_shape, order=info.order).transpose(inv)
    return flat.reshape(info.chunks, order=info.order)


def _fill_array(info: ZarrInfo) -> np.ndarray:
    fv = info.fill_value
    if fv is None:
        fv = np.nan if info.dtype.kind == "f" else 0
    return np.full(info.chunks, fv, dtype=info.dtype)


# ---------------------------------------------------------------------------
# driver-side whole-array helpers (tests, golden vectors, oracle grids)
# ---------------------------------------------------------------------------


def _write_meta(path: str, info: ZarrInfo) -> None:
    os.makedirs(path, exist_ok=True)
    if info.zarr_format == 3:
        _write_meta_v3(path, info)
        return
    meta = {
        "zarr_format": ZARR_FORMAT,
        "shape": list(info.shape),
        "chunks": list(info.chunks),
        "dtype": info.dtype.str,
        "compressor": info.compressor,
        "fill_value": _fill_to_json(info.fill_value),
        "order": info.order,
        "filters": info.filters,
    }
    if info.separator != ".":
        meta["dimension_separator"] = info.separator
    with open(os.path.join(path, ".zarray"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)
    if info.attrs:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(info.attrs, f, indent=1, sort_keys=True)


def _write_meta_v3(path: str, info: ZarrInfo) -> None:
    if info.order != "C" or info.filters:
        raise NotImplementedError("v3 writer: C order only, no v2 filters")
    if info.fill_value is None:
        raise ValueError("zarr v3 requires an explicit fill_value")
    name = _V3_NAMES.get(info.dtype.str.lstrip("<>=|"))
    if name is None:
        raise NotImplementedError(f"v3 data_type for dtype {info.dtype} unsupported")
    def _bb_chain(chain, perm=None):
        out = []
        if perm is not None:
            out.append({"name": "transpose",
                        "configuration": {"order": [int(i) for i in perm]}})
        out.append({"name": "bytes",
                    "configuration": {"endian": "big" if info.dtype.str[0] == ">"
                                      else "little"}})
        for c in (chain or []):
            if c["id"] == "gzip":
                out.append({"name": "gzip",
                            "configuration": {"level": int(c.get("level", 6))}})
            elif c["id"] == "crc32c":
                out.append({"name": "crc32c"})
            else:
                raise NotImplementedError(
                    f"v3 writer codec {c['id']!r} unsupported")
        return out

    if _is_sharded(info):
        sh = info.compressor
        index_codecs = [{"name": "bytes",
                         "configuration": {"endian": "little"}}]
        if sh.get("index_crc", True):
            index_codecs.append({"name": "crc32c"})
        codecs = [{"name": "sharding_indexed",
                   "configuration": {
                       "chunk_shape": list(sh["inner_chunks"]),
                       "codecs": _bb_chain(sh["codecs"], sh.get("transpose")),
                       "index_codecs": index_codecs,
                       "index_location": sh.get("index_location", "end"),
                   }}]
    else:
        codecs = _bb_chain(info.compressor, info.transpose)
    meta = {
        "zarr_format": 3,
        "node_type": "array",
        "shape": list(info.shape),
        "data_type": name,
        "chunk_grid": {"name": "regular",
                       "configuration": {"chunk_shape": list(info.chunks)}},
        "chunk_key_encoding": {"name": "default",
                               "configuration": {"separator": info.separator}},
        "fill_value": _fill_to_json(info.fill_value),
        "codecs": codecs,
    }
    if info.attrs:
        meta["attributes"] = info.attrs
    with open(os.path.join(path, "zarr.json"), "w") as f:
        json.dump(meta, f, indent=1, sort_keys=True)


def _chunk_path(info: ZarrInfo, ci: int, cj: int) -> str:
    key = info.chunk_key(ci, cj)
    if info.separator == "/":
        return os.path.join(info.path, *key.split("/"))
    return os.path.join(info.path, key)


def _atomic_write(path: str, data: bytes) -> None:
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = f"{path}.tmp-{uuid.uuid4().hex}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: concurrent task retries can't interleave


def _normalize_sink_opts(
    zarr_format: int, compressor, separator: str | None
) -> tuple:
    """Shared writer-option normalization -> (compressor, separator,
    key_prefix). v2 defaults: zlib level 6, "." separator, no prefix.
    v3 defaults: [gzip level 6] chain, "/" separator, "c" prefix; a dict
    compressor is lifted into a one-codec chain; {"id": "null"} -> None."""
    if zarr_format == 2:
        if compressor is None:
            compressor = {"id": "zlib", "level": 6}
        elif isinstance(compressor, dict) and compressor.get("id") == "null":
            compressor = None
        return compressor, separator or ".", ""
    if zarr_format != 3:
        raise ValueError(f"zarr_format must be 2 or 3, got {zarr_format}")
    if compressor is None:
        compressor = [{"id": "gzip", "level": 6}]
    elif isinstance(compressor, dict):
        if compressor.get("id") == "shard":
            compressor = {"index_crc": True, "index_location": "end",
                          "codecs": [{"id": "gzip", "level": 6}],
                          **compressor,
                          "inner_chunks": tuple(compressor["inner_chunks"])}
        elif compressor.get("id") == "null":
            compressor = None
        else:
            compressor = [compressor]
    return compressor, separator or "/", "c"


def write_zarr_array(
    path: str,
    arr: np.ndarray,
    chunks: tuple = (128, 128),
    compressor: dict | None = None,
    fill_value=0,
    order: str = "C",
    separator: str | None = None,
    filters: list | None = None,
    attrs: dict | None = None,
    zarr_format: int = 2,
) -> ZarrInfo:
    """Driver-side 2-D writer (tests / small arrays). The distributed sink
    is ``write_zarr``; both share encode_chunk, so bytes are identical."""
    if arr.ndim != 2:
        raise ValueError("write_zarr_array is 2-D")
    compressor, separator, prefix = _normalize_sink_opts(
        zarr_format, compressor, separator)
    info = ZarrInfo(
        path=path, shape=arr.shape, chunks=tuple(chunks), dtype=arr.dtype,
        order=order, fill_value=fill_value, compressor=compressor,
        filters=filters, separator=separator, attrs=attrs or {},
        zarr_format=zarr_format, key_prefix=prefix,
    )
    _write_meta(path, info)
    ch, cw = info.chunks
    for ci in range(info.chunk_grid[0]):
        for cj in range(info.chunk_grid[1]):
            block = _fill_array(info)
            sub = arr[ci * ch : (ci + 1) * ch, cj * cw : (cj + 1) * cw]
            block[: sub.shape[0], : sub.shape[1]] = sub
            _atomic_write(_chunk_path(info, ci, cj), encode_chunk(block, info))
    return info


def read_zarr_array(path: str) -> np.ndarray:
    """Driver-side whole-array read (tests only; the scan path is
    zarr_cells)."""
    info = parse_zarr_array(path)
    if len(info.shape) != 2:
        raise ValueError("read_zarr_array is 2-D")
    out = np.empty(info.shape, dtype=info.dtype)
    ch, cw = info.chunks
    for ci in range(info.chunk_grid[0]):
        for cj in range(info.chunk_grid[1]):
            p = _chunk_path(info, ci, cj)
            if os.path.exists(p):
                with open(p, "rb") as f:
                    block = decode_chunk(f.read(), info)
            else:
                block = _fill_array(info)
            r0, c0 = ci * ch, cj * cw
            h = min(ch, info.shape[0] - r0)
            w = min(cw, info.shape[1] - c0)
            out[r0 : r0 + h, c0 : c0 + w] = block[:h, :w]
    return out


# ---------------------------------------------------------------------------
# distributed source
# ---------------------------------------------------------------------------


def zarr_cells(
    spark,
    path: str,
    row_range: tuple[int, int] | None = None,
    col_range: tuple[int, int] | None = None,
    fill_as_null: bool = False,
):
    """Distributed cell view (row, col, z double) of a 2-D Zarr array.

    Chunk-grid pushdown is exact and arithmetic: the task frame is a
    ``spark.range`` over the ids of chunks INTERSECTING the window (JVM-side
    div/mod, no driver list — a 10^8-chunk store plans in O(1) driver
    memory), and each task opens only its own chunk object. Absent chunks
    materialize ``fill_value`` per spec (a ``None`` fill surfaces as NULL).

    Zarr's fill_value means "value of unwritten cells", NOT a missing-data
    sentinel, so by default equal-to-fill data passes through as real
    values (a DEM legitimately contains 0s). ``fill_as_null=True`` opts in
    to GVRS-style sentinel semantics (core/.../gvrs/GvrsElementFloat.java
    fill handling) for stores that use fill as no-data. Float NaN always
    surfaces as NULL, matching netcdf_cells."""
    import pandas as pd
    from pyspark.sql import functions as F

    info = parse_zarr_array(path)
    if len(info.shape) != 2:
        raise ValueError("zarr_cells is 2-D")
    nrows, ncols = info.shape
    ch, cw = info.chunks
    r0, r1 = row_range or (0, nrows)
    c0, c1 = col_range or (0, ncols)
    r0, r1 = max(0, r0), min(nrows, r1)
    c0, c1 = max(0, c0), min(ncols, c1)
    schema = "row long, col long, z double"
    if r1 <= r0 or c1 <= c0:
        return spark.createDataFrame([], schema)
    ci_lo, ci_hi = r0 // ch, -(-r1 // ch)  # [lo, hi)
    cj_lo, cj_hi = c0 // cw, -(-c1 // cw)
    n_ci, n_cj = ci_hi - ci_lo, cj_hi - cj_lo
    n_tasks = n_ci * n_cj
    par = spark.sparkContext.defaultParallelism
    tasks = (
        spark.range(0, n_tasks, 1, min(n_tasks, max(par, 1)))
        .select(
            (F.lit(ci_lo) + (F.col("id") / n_cj).cast("long")).alias("ci"),
            (F.lit(cj_lo) + F.col("id") % n_cj).alias("cj"),
        )
    )
    b = spark.sparkContext.broadcast((path, r0, r1, c0, c1, fill_as_null))

    def kernel(batches):
        pth, rr0, rr1, cc0, cc1, f_null = b.value
        inf = parse_zarr_array(pth)  # executor-local reparse: O(bytes)
        hh, ww = inf.chunks
        for pdf in batches:
            for ci, cj in zip(pdf["ci"], pdf["cj"]):
                ci, cj = int(ci), int(cj)
                p = _chunk_path(inf, ci, cj)
                absent = not os.path.exists(p)
                # local slice of the global window within this chunk
                lr0 = max(rr0 - ci * hh, 0)
                lr1 = min(rr1 - ci * hh, hh, inf.shape[0] - ci * hh)
                lc0 = max(cc0 - cj * ww, 0)
                lc1 = min(cc1 - cj * ww, ww, inf.shape[1] - cj * ww)
                if lr1 <= lr0 or lc1 <= lc0:
                    continue
                if absent:
                    sub = _fill_array(inf)[lr0:lr1, lc0:lc1]
                elif _is_sharded(inf) and (lr1 - lr0) * (lc1 - lc0) < hh * ww:
                    # partial window over a sharded chunk: index probe +
                    # range reads of only the touched inner chunks
                    sub, _ = read_shard_window(p, inf, lr0, lr1, lc0, lc1)
                else:
                    with open(p, "rb") as f:
                        sub = decode_chunk(f.read(), inf)[lr0:lr1, lc0:lc1]
                rr, cc = np.indices(sub.shape)
                z = sub.ravel().astype(np.float64)
                if absent and inf.fill_value is None:
                    z = np.full(z.shape, np.nan)
                elif f_null and inf.fill_value is not None:
                    z = np.where(sub.ravel() == inf.dtype.type(inf.fill_value),
                                 np.nan, z)
                yield pd.DataFrame(
                    {
                        "row": (rr.ravel() + ci * hh + lr0).astype(np.int64),
                        "col": (cc.ravel() + cj * ww + lc0).astype(np.int64),
                        "z": z,
                    }
                )

    cells = tasks.mapInPandas(kernel, schema)
    return cells.withColumn(
        "z", F.when(F.isnan("z"), F.lit(None).cast("double")).otherwise(F.col("z"))
    )


# ---------------------------------------------------------------------------
# distributed sink
# ---------------------------------------------------------------------------


def write_zarr(
    cells,
    path: str,
    shape: tuple,
    chunks: tuple = (128, 128),
    dtype: str = "<i4",
    compressor: dict | None = None,
    fill_value=0,
    order: str = "C",
    separator: str | None = None,
    attrs: dict | None = None,
    zarr_format: int = 2,
) -> dict:
    """Fully distributed Zarr sink (v2 default; ``zarr_format=3`` writes a
    v3 array — ``zarr.json`` metadata, ``c/``-keyed chunks, gzip/crc32c
    codec chain): ``cells`` (row, col, z) group by chunk id and EACH
    EXECUTOR TASK encodes + atomically writes its own chunk object; the
    driver writes only the JSON metadata. Cells absent from a written
    chunk take ``fill_value``; chunks with no cells at all are simply not
    written (spec: readers fill them) — so a sparse export costs
    O(occupied chunks). Returns {'n_chunks', 'n_cells', 'n_bytes'} from a
    tiny post-aggregation collect."""
    from pyspark.sql import functions as F

    if len(shape) != 2:
        raise ValueError("write_zarr is 2-D")
    compressor, separator, prefix = _normalize_sink_opts(
        zarr_format, compressor, separator)
    info = ZarrInfo(
        path=path, shape=tuple(shape), chunks=tuple(chunks),
        dtype=np.dtype(dtype), order=order, fill_value=fill_value,
        compressor=compressor, filters=None, separator=separator,
        attrs=attrs or {},
        zarr_format=zarr_format, key_prefix=prefix,
    )
    _write_meta(path, info)
    ch, cw = info.chunks

    keyed = cells.select(
        (F.col("row") / ch).cast("long").alias("ci"),
        (F.col("col") / cw).cast("long").alias("cj"),
        "row", "col", "z",
    )

    def emit(key, pdf):
        import pandas as pd

        ci, cj = int(key[0]), int(key[1])
        block = _fill_array(info)
        lr = pdf["row"].to_numpy() - ci * ch
        lc = pdf["col"].to_numpy() - cj * cw
        z = pdf["z"].to_numpy()
        if info.dtype.kind in "iu":
            z = np.rint(np.nan_to_num(z, nan=float(info.fill_value or 0)))
        block[lr, lc] = z.astype(info.dtype)
        data = encode_chunk(block, info)
        _atomic_write(_chunk_path(info, ci, cj), data)
        return pd.DataFrame(
            {"ci": [ci], "cj": [cj], "n_cells": [len(pdf)], "n_bytes": [len(data)]}
        )

    out = keyed.groupBy("ci", "cj").applyInPandas(
        emit, "ci long, cj long, n_cells long, n_bytes long"
    )
    row = out.agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_cells").alias("n_cells"),
        F.sum("n_bytes").alias("n_bytes"),
    ).collect()[0]
    return {"n_chunks": row["n_chunks"] or 0,
            "n_cells": row["n_cells"] or 0,
            "n_bytes": row["n_bytes"] or 0}


def update_zarr(deltas, path: str) -> dict:
    """Distributed chunk upsert: ``deltas`` (row, col, z) group by chunk id
    and EACH EXECUTOR TASK read-modify-writes only its own chunk object
    (absent chunk -> start from fill). Untouched chunks are never opened,
    so the cost is O(touched chunks) with zero driver state beyond the
    .zarray JSON — the property the GVRS single-file update
    (gvrsfile.py update_gvrs, record-manager compaction per
    core/.../gvrs/RecordManager.java) has to work for, Zarr gets
    structurally from one-object-per-chunk. ``os.replace`` keeps each
    object atomic under task retries (same input -> same bytes, so a retry
    rewrites identically). Returns {'n_chunks', 'n_cells', 'n_bytes'}."""
    from pyspark.sql import functions as F

    info = parse_zarr_array(path)
    if len(info.shape) != 2:
        raise ValueError("update_zarr is 2-D")
    ch, cw = info.chunks

    keyed = deltas.select(
        (F.col("row") / ch).cast("long").alias("ci"),
        (F.col("col") / cw).cast("long").alias("cj"),
        "row", "col", "z",
    )

    sharded = _is_sharded(info)

    def emit(key, pdf):
        import pandas as pd

        ci, cj = int(key[0]), int(key[1])
        p = _chunk_path(info, ci, cj)
        lr = pdf["row"].to_numpy() - ci * ch
        lc = pdf["col"].to_numpy() - cj * cw
        z = pdf["z"].to_numpy()
        if info.dtype.kind in "iu":
            z = np.rint(np.nan_to_num(z, nan=float(info.fill_value or 0)))
        z = z.astype(info.dtype)
        if sharded:
            # partial-shard splice: only the touched inner chunks are
            # decoded/re-encoded; untouched inner bytes copy verbatim
            buf = None
            if os.path.exists(p):
                with open(p, "rb") as f:
                    buf = f.read()
            data, _tel = splice_shard_update(buf, lr, lc, z, info)
        else:
            if os.path.exists(p):
                with open(p, "rb") as f:
                    block = decode_chunk(f.read(), info).copy()
            else:
                block = _fill_array(info)
            block[lr, lc] = z
            data = encode_chunk(block, info)
        _atomic_write(p, data)
        return pd.DataFrame(
            {"ci": [ci], "cj": [cj], "n_cells": [len(pdf)], "n_bytes": [len(data)]}
        )

    out = keyed.groupBy("ci", "cj").applyInPandas(
        emit, "ci long, cj long, n_cells long, n_bytes long"
    )
    row = out.agg(
        F.count("*").alias("n_chunks"),
        F.sum("n_cells").alias("n_cells"),
        F.sum("n_bytes").alias("n_bytes"),
    ).collect()[0]
    return {"n_chunks": row["n_chunks"] or 0,
            "n_cells": row["n_cells"] or 0,
            "n_bytes": row["n_bytes"] or 0}


# ---------------------------------------------------------------------------
# multiscale pyramid (stored A5 / COG-overview artifact)
# ---------------------------------------------------------------------------


def write_zarr_pyramid(
    cells,
    path: str,
    shape: tuple,
    n_levels: int,
    chunks: tuple = (128, 128),
    compressor: dict | None = None,
    fill_value=0,
    zarr_format: int = 2,
) -> list:
    """Multiscale mean pyramid as a Zarr GROUP: ``path/0`` is the full-res
    array (float64), ``path/l`` is a factor-2 mean-pool of ``path/(l-1)``
    (edge blocks average their real cells only — same semantics as
    raster_ops.downsample / the reference's ExampleDownsample.java:164-205
    and the GeoTIFF COG overview chain). Each level is written with the
    DISTRIBUTED sink and each level's input is ``zarr_cells`` of the level
    below — the store itself is the stage boundary, so level l+1 reads 1/4
    the bytes of level l and nothing recomputes from the source lineage.
    The group carries OME-NGFF-style multiscale attrs — in ``.zattrs``
    beside a ``.zgroup`` for v2, or in the group-node ``zarr.json``
    ``attributes`` for ``zarr_format=3``. Returns the per-level stats
    list."""
    from pyspark.sql import functions as F

    if n_levels < 1:
        raise ValueError("n_levels >= 1")
    if zarr_format not in (2, 3):
        raise ValueError(f"zarr_format must be 2 or 3, got {zarr_format}")
    os.makedirs(path, exist_ok=True)
    if zarr_format == 2:
        with open(os.path.join(path, ".zgroup"), "w") as f:
            json.dump({"zarr_format": ZARR_FORMAT}, f)

    stats = []
    cur, cur_shape = cells.select("row", "col", F.col("z").cast("double").alias("z")), tuple(shape)
    spark = cells.sparkSession
    datasets = []
    for lvl in range(n_levels):
        lp = os.path.join(path, str(lvl))
        stats.append(
            write_zarr(cur, lp, shape=cur_shape, chunks=chunks, dtype="<f8",
                       compressor=compressor, fill_value=fill_value,
                       zarr_format=zarr_format)
        )
        datasets.append({"path": str(lvl),
                         "coordinateTransformations": [
                             {"type": "scale", "scale": [float(2 ** lvl)] * 2}]})
        if lvl + 1 == n_levels:
            break
        prev = zarr_cells(spark, lp)
        cur = (
            prev.groupBy(
                F.expr("CAST(row div 2 AS BIGINT)").alias("row"),
                F.expr("CAST(col div 2 AS BIGINT)").alias("col"),
            )
            .agg(F.avg("z").alias("z"))
        )
        cur_shape = (-(-cur_shape[0] // 2), -(-cur_shape[1] // 2))

    ms_attrs = {"multiscales": [{"version": "0.4",
                                 "name": os.path.basename(path),
                                 "axes": [{"name": "row", "type": "space"},
                                          {"name": "col", "type": "space"}],
                                 "datasets": datasets, "type": "mean"}]}
    if zarr_format == 3:
        with open(os.path.join(path, "zarr.json"), "w") as f:
            json.dump({"zarr_format": 3, "node_type": "group",
                       "attributes": ms_attrs}, f, indent=1, sort_keys=True)
    else:
        with open(os.path.join(path, ".zattrs"), "w") as f:
            json.dump(ms_attrs, f, indent=1, sort_keys=True)
    return stats


def pyramid_levels(path: str) -> list[str]:
    """Level paths of a multiscale group, in fine-to-coarse order, from the
    OME-NGFF-style multiscale attrs (v2 ``.zattrs`` or the v3 group-node
    ``zarr.json``)."""
    za = os.path.join(path, ".zattrs")
    if os.path.exists(za):
        with open(za) as f:
            attrs = json.load(f)
    else:
        with open(os.path.join(path, "zarr.json")) as f:
            gmeta = json.load(f)
        if gmeta.get("zarr_format") != 3 or gmeta.get("node_type") != "group":
            raise ValueError(f"{path}: not a Zarr group")
        attrs = gmeta.get("attributes", {})
    ms = attrs["multiscales"][0]
    return [os.path.join(path, d["path"]) for d in ms["datasets"]]


def pyramid_cells(
    spark,
    path: str,
    level: int = 0,
    row_range: tuple[int, int] | None = None,
    col_range: tuple[int, int] | None = None,
):
    """Distributed cell view of ONE pyramid level (the Zarr twin of
    geotiff.read_geotiff_cells(level=...)); ranges are in THIS level's
    coordinates and push down to the level's chunk grid."""
    levels = pyramid_levels(path)
    if not 0 <= level < len(levels):
        raise ValueError(f"level {level} outside 0..{len(levels) - 1}")
    return zarr_cells(spark, levels[level],
                      row_range=row_range, col_range=col_range)


def update_zarr_pyramid(deltas, path: str) -> list[dict]:
    """Incremental multiscale refresh: apply ``deltas`` (row, col, z) to
    level 0 via update_zarr, then propagate UP the pyramid recomputing only
    the coarse chunks whose footprint a delta touched — the raster sibling
    of the hypertable's incremental continuous-aggregate refresh
    (hypertable.RollupStore.refresh). Per touched coarse chunk, one
    executor task reads the <=4 finer chunk objects under it (post-update),
    NaN-aware factor-2 mean-pools them, and atomically replaces the coarse
    object; untouched chunks at every level are never opened, so the total
    cost is O(touched level-0 chunks), shrinking 4x per level. Driver state
    is the JSON metadata only — touched-chunk sets stay DataFrames.

    Equality with a full rebuild is exact for integer-valued data (the sums
    are exact); otherwise agreement is to float addition-order, since the
    full build's F.avg may sum the 2x2 block in a different order.

    Levels must share one chunk shape (write_zarr_pyramid guarantees it),
    so a coarse chunk's footprint is exactly the 2x2 finer chunks at
    (2ci..2ci+1, 2cj..2cj+1). Returns per-level stats like the builder."""
    import pandas as pd
    from pyspark.sql import functions as F

    levels = pyramid_levels(path)
    stats = [update_zarr(deltas, levels[0])]

    for lvl in range(1, len(levels)):
        coarse_p, fine_p = levels[lvl], levels[lvl - 1]
        info = parse_zarr_array(coarse_p)
        ch, cw = info.chunks
        f_div = 1 << lvl
        touched = deltas.select(
            F.expr(f"CAST(row div {f_div} AS BIGINT) div {ch}").alias("ci"),
            F.expr(f"CAST(col div {f_div} AS BIGINT) div {cw}").alias("cj"),
        ).distinct()

        def _make_emit(_coarse, _fine):
            def emit(key, pdf):
                return _refresh_coarse_chunk(key, pdf, _coarse, _fine)
            return emit

        out = touched.groupBy("ci", "cj").applyInPandas(
            _make_emit(coarse_p, fine_p),
            "ci long, cj long, n_cells long, n_bytes long",
        )
        row = out.agg(
            F.count("*").alias("n_chunks"),
            F.sum("n_cells").alias("n_cells"),
            F.sum("n_bytes").alias("n_bytes"),
        ).collect()[0]
        stats.append({"n_chunks": row["n_chunks"] or 0,
                      "n_cells": row["n_cells"] or 0,
                      "n_bytes": row["n_bytes"] or 0})
    return stats


def _refresh_coarse_chunk(key, pdf, _coarse: str, _fine: str):
    """Executor kernel for update_zarr_pyramid: recompute ONE coarse chunk
    from the <=4 finer chunk objects under its footprint."""
    import pandas as pd

    ci, cj = int(key[0]), int(key[1])
    cinf = parse_zarr_array(_coarse)
    finf = parse_zarr_array(_fine)
    hh, ww = cinf.chunks
    # assemble the 2x2 finer-chunk footprint, out-of-shape -> NaN
    fine = np.full((2 * hh, 2 * ww), np.nan)
    for di in range(2):
        for dj in range(2):
            fi, fj = 2 * ci + di, 2 * cj + dj
            if fi * hh >= finf.shape[0] or fj * ww >= finf.shape[1]:
                continue
            p = _chunk_path(finf, fi, fj)
            if os.path.exists(p):
                with open(p, "rb") as f:
                    blk = decode_chunk(f.read(), finf).astype(np.float64)
            else:
                blk = _fill_array(finf).astype(np.float64)
            # cells past the array shape are chunk padding, not data
            vr = min(finf.shape[0] - fi * hh, hh)
            vc = min(finf.shape[1] - fj * ww, ww)
            blk[vr:, :] = np.nan
            blk[:, vc:] = np.nan
            fine[di * hh:(di + 1) * hh, dj * ww:(dj + 1) * ww] = blk
    q = fine.reshape(hh, 2, ww, 2)
    fin = np.isfinite(q)
    cnt = fin.sum(axis=(1, 3))
    s = np.where(fin, q, 0.0).sum(axis=(1, 3))
    pooled = np.where(cnt > 0, s / np.maximum(cnt, 1), np.nan)
    block = _fill_array(cinf).astype(np.float64)
    vr = min(cinf.shape[0] - ci * hh, hh)
    vc = min(cinf.shape[1] - cj * ww, ww)
    block[:vr, :vc] = pooled[:vr, :vc]
    data = encode_chunk(block.astype(cinf.dtype), cinf)
    _atomic_write(_chunk_path(cinf, ci, cj), data)
    return pd.DataFrame(
        {"ci": [ci], "cj": [cj], "n_cells": [int(vr * vc)],
         "n_bytes": [len(data)]}
    )
