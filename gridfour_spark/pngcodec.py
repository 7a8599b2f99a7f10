"""Pure-stdlib PNG codec: real encode/decode for the multimodal media path.

The engine's media columns are opaque ``binary`` payloads with typed
metadata (similarity.MEDIA_SCHEMA).  Until round 6 the decode stage
synthesized features from md5 bytes; this module makes the column
first-class with NO new dependency: PNG is implemented from the spec with
``zlib`` (inflate/deflate, crc32) and numpy scanline (un)filtering —
chunk framing, CRC-32 verification, and all five filter types
(None/Sub/Up/Average/Paeth) in both directions.

Closest reference analog: the imaging experiments store images
channel-planar behind Deflate
(demo/src/main/java/org/gridfour/demo/imaging/ExperimentalImageStorage.java:55-295);
here the interchange format is real PNG so the decode stage exercises a
genuine codec chain and the encode side doubles as a self-verifying
round-trip oracle for tests.

Scope (honest): 8- and 16-bit greyscale (color type 0), RGB (2) and RGBA
(6), non-interlaced — 16-bit is the form that round-trips elevation tiles
losslessly.  Palette / sub-byte depths / Adam7 raise
``NotImplementedError``.

Scale note: executors decode whole images inside Arrow batches
(similarity.decode_media loops per image within a mapInPandas kernel,
numpy-vectorized per scanline) — the same batch shape as the tile codecs,
no per-pixel Python in any dependency-free direction (encode filtering and
Sub/Up decode are fully vectorized; Average/Paeth decode carry the spec's
inherent left-pixel recurrence, looped per PIXEL-COLUMN only).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    crc = zlib.crc32(tag + body) & 0xFFFFFFFF
    return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (PNG spec 9.4) over int16 inputs."""
    p = a.astype(np.int16) + b.astype(np.int16) - c.astype(np.int16)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray, filters=None) -> bytes:
    """Encode a uint8 (8-bit) or uint16 (16-bit) array as a non-interlaced
    PNG.

    ``arr``: (H, W) greyscale, or (H, W, 3|4) RGB(A); dtype uint8 -> bit
    depth 8, uint16 -> depth 16 (big-endian samples per spec — the form
    that round-trips 16-bit elevation tiles losslessly).
    ``filters``: per-row filter types (int or sequence of H ints 0..4);
    default rotates ``row % 5`` so every filter type appears — the decoder
    exercise the synthetic corpus wants.  Filtering is the direct
    (recurrence-free) direction, fully vectorized; per the spec it
    operates on BYTES with a bpp-byte left offset regardless of depth.
    """
    a = np.asarray(arr)
    depth = 16 if a.dtype == np.uint16 else 8
    a = np.ascontiguousarray(a, dtype=np.uint16 if depth == 16 else np.uint8)
    if a.ndim == 2:
        color, ch = 0, 1
        a = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] in (3, 4):
        color, ch = (2, 3) if a.shape[2] == 3 else (6, 4)
    else:
        raise ValueError(f"unsupported array shape {arr.shape}")
    h, w = a.shape[:2]
    bpp = ch * (depth // 8)
    if filters is None:
        frow = np.arange(h) % 5
    elif np.isscalar(filters):
        frow = np.full(h, int(filters))
    else:
        frow = np.asarray(filters, dtype=np.int64)
        if frow.shape != (h,):
            raise ValueError("filters must be scalar or length-H")
    if depth == 16:
        flat = a.astype(">u2").view(np.uint8).reshape(h, w * bpp)
    else:
        flat = a.reshape(h, w * bpp)
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    upleft = np.zeros_like(flat)
    upleft[1:, bpp:] = flat[:-1, :-bpp]
    out = bytearray()
    for y in range(h):
        f = int(frow[y])
        raw = flat[y]
        if f == 0:
            line = raw
        elif f == 1:
            line = raw - left[y]
        elif f == 2:
            line = raw - up[y]
        elif f == 3:
            line = raw - (
                (left[y].astype(np.uint16) + up[y].astype(np.uint16)) // 2
            ).astype(np.uint8)
        elif f == 4:
            line = raw - _paeth(left[y], up[y], upleft[y])
        else:
            raise ValueError(f"bad filter type {f}")
        out.append(f)
        out += line.astype(np.uint8).tobytes()
    ihdr = struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(out), 6))
        + _chunk(b"IEND", b"")
    )


def png_info(data: bytes) -> dict:
    """Parse the IHDR of a PNG byte string (no pixel decode)."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    length, tag = struct.unpack(">I4s", data[8:16])
    if tag != b"IHDR" or length != 13:
        raise ValueError("first chunk is not IHDR")
    w, h, depth, color, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", data[16:29]
    )
    return {
        "width": w, "height": h, "bit_depth": depth, "color_type": color,
        "compression": comp, "filter_method": filt, "interlace": interlace,
    }


def decode_png(data: bytes, verify_crc: bool = True) -> np.ndarray:
    """Decode a PNG byte string to a uint8 array ((H,W) grey / (H,W,C)).

    Full chunk walk with CRC-32 verification, IDAT concatenation + zlib
    inflate, then scanline unfiltering: Sub is a per-channel cumulative sum
    (vectorized via reshape-to-(W,ch) cumsum mod 256), Up is one vector
    add, Average/Paeth carry the spec's left-pixel recurrence so they loop
    over pixel columns operating on channel vectors.
    """
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos, ihdr, idat = 8, None, []
    while pos + 8 <= len(data):
        length, tag = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {tag!r} chunk")
        if verify_crc:
            (crc,) = struct.unpack(">I", data[pos + 8 + length : pos + 12 + length])
            if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
                raise ValueError(f"CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth not in (8, 16) or color not in _CHANNELS:
        raise NotImplementedError(
            f"only 8/16-bit grey/RGB/RGBA supported (depth={depth} color={color})"
        )
    if interlace:
        raise NotImplementedError("Adam7 interlace not supported")
    ch = _CHANNELS[color]
    bpp = ch * (depth // 8)
    raw = zlib.decompress(b"".join(idat))
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length does not match dimensions")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = lines[:, 0]
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = int(ftypes[y])
        line = lines[y, 1:].copy()
        if f == 0:
            rec = line
        elif f == 1:
            # per-byte-lane cumulative sum; uint8 wraparound == mod 256
            rec = np.cumsum(
                line.reshape(w, bpp), axis=0, dtype=np.uint64
            ).astype(np.uint8).reshape(stride)
        elif f == 2:
            rec = line + prev
        elif f in (3, 4):
            # left-pixel recurrence is inherently sequential, but each
            # BYTE LANE is independent — run it as per-lane scalar-int
            # loops (plain Python ints beat per-pixel numpy allocs ~10x)
            la = line.reshape(w, bpp)
            pva = prev.reshape(w, bpp)
            rc = np.empty((w, bpp), dtype=np.uint8)
            for c in range(bpp):
                fl = la[:, c].tolist()
                up_l = pva[:, c].tolist()
                left_v = 0
                upleft_v = 0
                out_c = [0] * w
                if f == 3:
                    for x in range(w):
                        left_v = (fl[x] + ((left_v + up_l[x]) >> 1)) & 255
                        out_c[x] = left_v
                else:
                    for x in range(w):
                        bb = up_l[x]
                        p = left_v + bb - upleft_v
                        pa = p - left_v if p >= left_v else left_v - p
                        pb = p - bb if p >= bb else bb - p
                        pc = p - upleft_v if p >= upleft_v else upleft_v - p
                        if pa <= pb and pa <= pc:
                            pred = left_v
                        elif pb <= pc:
                            pred = bb
                        else:
                            pred = upleft_v
                        left_v = (fl[x] + pred) & 255
                        out_c[x] = left_v
                        upleft_v = bb
                rc[:, c] = out_c
            rec = rc.reshape(stride)
        else:
            raise ValueError(f"bad filter type {f} on row {y}")
        out[y] = rec
        prev = out[y]
    if depth == 16:
        px = out.reshape(h * stride).view(">u2").astype(np.uint16)
        return px.reshape(h, w) if ch == 1 else px.reshape(h, w, ch)
    return out.reshape(h, w) if ch == 1 else out.reshape(h, w, ch)
