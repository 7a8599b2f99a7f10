"""C7/C8: Huffman codec for M32 residual byte streams.

Re-expression of compress/CodecHuffman.java + canonicalHuffman/
CanonicalHuffman.java: predictor residuals -> M32 bytes -> Huffman-coded
bitstream. The reference serializes its tree inside the bitstream with a
compact walk (HuffmanEncoder.java:40-80); this engine stores CANONICAL code
lengths (one byte per symbol present, RLE'd), which decodes with the standard
first-code/offset method (the canonical-Huffman property the reference's
canonicalHuffman package exploits, CanonicalHuffman.java).

Where Deflate "essentially devolves into a Huffman encoder" on pattern-free
residuals (LsEncoder12.java:40-52 commentary), a dedicated Huffman with a
small table wins on short tiles — it joins the codec race like every other
codec and is kept only when smallest.

Encoding is numpy-vectorized (per-symbol scatter of code bits, <=256
iterations); decoding walks the bitstream with the canonical first-code
table, chunk-accelerated.
"""

from __future__ import annotations

import heapq
import zlib

import numpy as np

HUFFMAN_CODEC_INDEX = 3
MAX_CODE_LEN = 32


def code_lengths(counts: np.ndarray) -> np.ndarray:
    """Huffman code lengths from symbol counts (heap merge, like the
    reference's tree build in HuffmanEncoder)."""
    sym = np.flatnonzero(counts)
    if len(sym) == 0:
        return np.zeros(256, dtype=np.uint8)
    if len(sym) == 1:
        out = np.zeros(256, dtype=np.uint8)
        out[sym[0]] = 1
        return out
    heap = [(int(counts[s]), int(s), None, None) for s in sym]
    heapq.heapify(heap)
    nodes = []
    while len(heap) > 1:
        a = heapq.heappop(heap)
        b = heapq.heappop(heap)
        nodes.append((a, b))
        heapq.heappush(heap, (a[0] + b[0], 256 + len(nodes), a, b))
    root = heap[0]
    out = np.zeros(256, dtype=np.uint8)

    stack = [(root, 0)]
    while stack:
        node, depth = stack.pop()
        _, tag, left, right = node
        if left is None:
            out[tag] = max(depth, 1)
        else:
            stack.append((left, depth + 1))
            stack.append((right, depth + 1))
    return out


def canonical_codes(lengths: np.ndarray) -> np.ndarray:
    """Canonical code assignment: symbols sorted by (length, value)."""
    codes = np.zeros(256, dtype=np.uint64)
    order = sorted((int(l), s) for s, l in enumerate(lengths) if l > 0)
    code = 0
    prev_len = 0
    for l, s in order:
        code <<= l - prev_len
        codes[s] = code
        code += 1
        prev_len = l
    return codes


def huff_encode(data: bytes) -> bytes:
    """bytes -> [RLE'd length table][n_bits u32][bitstream]."""
    b = np.frombuffer(data, dtype=np.uint8)
    counts = np.bincount(b, minlength=256)
    lengths = code_lengths(counts)
    codes = canonical_codes(lengths)

    lens = lengths[b].astype(np.int64)
    total_bits = int(lens.sum())
    offsets = np.zeros(len(b) + 1, dtype=np.int64)
    np.cumsum(lens, out=offsets[1:])
    bits = np.zeros(total_bits, dtype=np.uint8)
    for s in np.flatnonzero(counts):
        l = int(lengths[s])
        c = int(codes[s])
        cbits = np.array([(c >> (l - 1 - k)) & 1 for k in range(l)], dtype=np.uint8)
        pos = offsets[:-1][b == s]
        bits[(pos[:, None] + np.arange(l)[None, :]).ravel()] = np.tile(cbits, len(pos))
    stream = np.packbits(bits, bitorder="big").tobytes()

    table = zlib.compress(lengths.tobytes(), 9)
    return (
        len(table).to_bytes(2, "little")
        + table
        + total_bits.to_bytes(4, "little")
        + len(b).to_bytes(4, "little")
        + stream
    )


def huff_decode(packed: bytes) -> bytes:
    tlen = int.from_bytes(packed[0:2], "little")
    lengths = np.frombuffer(zlib.decompress(packed[2 : 2 + tlen]), dtype=np.uint8)
    pos = 2 + tlen
    total_bits = int.from_bytes(packed[pos : pos + 4], "little")
    n_syms = int.from_bytes(packed[pos + 4 : pos + 8], "little")
    bits = np.unpackbits(
        np.frombuffer(packed[pos + 8 :], dtype=np.uint8), bitorder="big"
    )[:total_bits]

    # canonical decode tables: for each length, first code and symbol offset
    order = sorted((int(l), s) for s, l in enumerate(lengths) if l > 0)
    syms_in_order = np.array([s for _, s in order], dtype=np.uint8)
    first_code = {}
    first_idx = {}
    code = 0
    prev_len = 0
    idx = 0
    for l, _s in order:
        code <<= l - prev_len
        if l not in first_code:
            first_code[l] = code
            first_idx[l] = idx
        code += 1
        prev_len = l
        idx += 1
    # count of codes per length to bound the lookup
    per_len = {}
    for l, _s in order:
        per_len[l] = per_len.get(l, 0) + 1

    out = np.empty(n_syms, dtype=np.uint8)
    p = 0
    for i in range(n_syms):
        acc = 0
        l = 0
        while True:
            acc = (acc << 1) | int(bits[p])
            p += 1
            l += 1
            fc = first_code.get(l)
            if fc is not None and acc - fc < per_len[l] and acc >= fc:
                out[i] = syms_in_order[first_idx[l] + (acc - fc)]
                break
            if l > MAX_CODE_LEN:
                raise ValueError("corrupt huffman stream")
    return out.tobytes()
