"""rANS 4x8 codec (CRAM 3.0 block compression method 4), from the CRAM
specification's rANS section (order-0 and order-1, byte-wise renormalization,
4 interleaved states, TOTFREQ = 4096, lower bound L = 1<<23).

The reference reads rANS blocks via htsjdk; this is a from-scratch
implementation.  The decoder follows the spec's frequency-table and state
pseudocode (so spec-conformant files decode); the encoder emits streams the
decoder (and any spec decoder) accepts, which is how the pair is tested —
exhaustive round-trips over adversarial byte distributions.

Stream layout: 1 byte order, uint32-LE compressed size (of everything after
this 9-byte header), uint32-LE raw size, frequency table(s), 4×uint32-LE
initial states, interleaved renormalization bytes.
"""

from __future__ import annotations

import struct

TOTFREQ = 4096
TF_SHIFT = 12
RANS_L = 1 << 23

# ------------------------------------------------------------------ freq tables


def _read_freq(data: bytes, pos: int) -> tuple[int, int]:
    f = data[pos]
    pos += 1
    if f >= 0x80:
        f = ((f & 0x7F) << 8) | data[pos]
        pos += 1
    return f, pos


def _write_freq(out: bytearray, f: int) -> None:
    if f < 0x80:
        out.append(f)
    else:
        out.append(0x80 | (f >> 8))
        out.append(f & 0xFF)


def _read_freq_table(data: bytes, pos: int) -> tuple[list[int], int]:
    """Spec RLE symbol enumeration: ascending symbols; a symbol equal to
    previous+1 is followed by a run-length byte; terminated by symbol 0."""
    freqs = [0] * 256
    sym = data[pos]
    pos += 1
    last = sym
    rle = 0
    while True:
        f, pos = _read_freq(data, pos)
        freqs[sym] = f
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = data[pos]
            pos += 1
            if sym == 0:  # terminator (0 can only be a *first* symbol)
                break
            if sym == last + 1:
                rle = data[pos]
                pos += 1
            last = sym
    return freqs, pos


def _write_freq_table(out: bytearray, freqs: list[int]) -> None:
    syms = [s for s in range(256) if freqs[s] > 0]
    i = 0
    while i < len(syms):
        run = 0
        while i + run + 1 < len(syms) and syms[i + run + 1] == syms[i + run] + 1:
            run += 1
        out.append(syms[i])
        _write_freq(out, freqs[syms[i]])
        if run > 0:
            # consecutive run: emit the second symbol, the count of further
            # implicit symbols, then the run's frequencies in order
            out.append(syms[i + 1])
            out.append(run - 1)
            for k in range(1, run + 1):
                _write_freq(out, freqs[syms[i + k]])
            i += run + 1
        else:
            i += 1
    out.append(0)  # terminator


def _cumulative(freqs: list[int]) -> list[int]:
    cum = [0] * 257
    for s in range(256):
        cum[s + 1] = cum[s] + freqs[s]
    return cum


def _normalize(counts: list[int], total: int = TOTFREQ) -> list[int]:
    n = sum(counts)
    if n == 0:
        return [0] * 256
    freqs = [0] * 256
    # largest-remainder scaling keeping every present symbol >= 1
    scaled = [(counts[s] * total / n, s) for s in range(256) if counts[s] > 0]
    base = 0
    for v, s in scaled:
        freqs[s] = max(1, int(v))
        base += freqs[s]
    # fix drift onto the most frequent symbol
    top = max(range(256), key=lambda s: freqs[s])
    freqs[top] += total - base
    if freqs[top] <= 0:
        raise ValueError("cannot normalize frequency table")
    return freqs


class _SymbolTable:
    """cum→symbol lookup for decoding."""

    __slots__ = ("freqs", "cum", "lookup")

    def __init__(self, freqs: list[int]):
        self.freqs = freqs
        self.cum = _cumulative(freqs)
        self.lookup = bytearray(TOTFREQ)
        for s in range(256):
            if freqs[s]:
                start, end = self.cum[s], self.cum[s + 1]
                for i in range(start, end):
                    self.lookup[i] = s


# ---------------------------------------------------------------------- order 0


def encode_o0(data: bytes) -> bytes:
    from collections import Counter

    counts = [0] * 256
    for b, c in Counter(data).items():
        counts[b] = c
    freqs = _normalize(counts)
    table = bytearray()
    _write_freq_table(table, freqs)

    n = len(data)
    # the (i & 3, data[i]) reverse walk, inlined (the generator's
    # tuple-per-byte overhead is measurable on 3.0 write paths)
    cum = _cumulative(freqs)
    states = [RANS_L] * 4
    out = bytearray()
    append = out.append
    renorm_base = (RANS_L >> TF_SHIFT) << 8
    for i in range(n - 1, -1, -1):
        j = i & 3
        sym = data[i]
        f = freqs[sym]
        x = states[j]
        x_max = renorm_base * f
        while x >= x_max:
            append(x & 0xFF)
            x >>= 8
        states[j] = ((x // f) << TF_SHIFT) + (x % f) + cum[sym]
    out.reverse()
    body = (
        bytes(table)
        + b"".join(struct.pack("<I", s) for s in states)
        + bytes(out)
    )
    return struct.pack("<BII", 0, len(body), n) + body


def decode_o0(data: bytes) -> bytes:
    order, _csize, rsize = struct.unpack_from("<BII", data, 0)
    pos = 9
    freqs, pos = _read_freq_table(data, pos)
    tbl = _SymbolTable(freqs)
    states = list(struct.unpack_from("<4I", data, pos))
    pos += 16
    out = bytearray(rsize)
    lookup, cum, fr = tbl.lookup, tbl.cum, tbl.freqs
    mask = TOTFREQ - 1
    for i in range(rsize):
        j = i & 3
        x = states[j]
        f = x & mask
        s = lookup[f]
        out[i] = s
        x = fr[s] * (x >> TF_SHIFT) + f - cum[s]
        while x < RANS_L and pos < len(data):
            x = (x << 8) | data[pos]
            pos += 1
        states[j] = x
    return bytes(out)


# ---------------------------------------------------------------------- order 1


def encode_o1(data: bytes) -> bytes:
    n = len(data)
    isz4 = n >> 2
    bounds = [0, isz4, 2 * isz4, 3 * isz4, n]
    counts = [[0] * 256 for _ in range(256)]
    for j in range(4):
        ctx = 0
        for i in range(bounds[j], bounds[j + 1]):
            counts[ctx][data[i]] += 1
            ctx = data[i]
    freqs = [
        _normalize(c) if any(c) else [0] * 256 for c in counts
    ]
    table = bytearray()
    # outer RLE over contexts with nonzero tables
    ctxs = [c for c in range(256) if any(counts[c])]
    i = 0
    while i < len(ctxs):
        run = 0
        while i + run + 1 < len(ctxs) and ctxs[i + run + 1] == ctxs[i + run] + 1:
            run += 1
        table.append(ctxs[i])
        _write_freq_table(table, freqs[ctxs[i]])
        if run > 0:
            table.append(ctxs[i + 1])
            table.append(run - 1)
            _write_freq_table(table, freqs[ctxs[i + 1]])
            for k in range(2, run + 1):
                _write_freq_table(table, freqs[ctxs[i + k]])
            i += run + 1
        else:
            i += 1
    table.append(0)

    # decode consumption order: step t: for j in 0..3 decode position
    # bounds[j]+t (while in range); so reverse order: t from max down, j 3..0
    max_len = max(bounds[j + 1] - bounds[j] for j in range(4))

    # the reverse walk inlined (was a nested-tuple-per-byte generator)
    states = [RANS_L] * 4
    out = bytearray()
    append = out.append
    cums = [_cumulative(f) for f in freqs]
    renorm_base = (RANS_L >> TF_SHIFT) << 8
    for t in range(max_len - 1, -1, -1):
        for j in (3, 2, 1, 0):
            i = bounds[j] + t
            if i < bounds[j + 1]:
                ctx = data[i - 1] if i > bounds[j] else 0
                sym = data[i]
                f = freqs[ctx][sym]
                x = states[j]
                x_max = renorm_base * f
                while x >= x_max:
                    append(x & 0xFF)
                    x >>= 8
                states[j] = ((x // f) << TF_SHIFT) + (x % f) + cums[ctx][sym]
    out.reverse()
    body = bytes(table) + b"".join(struct.pack("<I", s) for s in states) + bytes(out)
    return struct.pack("<BII", 1, len(body), n) + body


def decode_o1(data: bytes) -> bytes:
    order, _csize, rsize = struct.unpack_from("<BII", data, 0)
    pos = 9
    tables: dict[int, _SymbolTable] = {}
    ctx = data[pos]
    pos += 1
    last = ctx
    rle = 0
    while True:
        freqs, pos = _read_freq_table(data, pos)
        tables[ctx] = _SymbolTable(freqs)
        if rle > 0:
            rle -= 1
            ctx += 1
        else:
            nxt = data[pos]
            pos += 1
            if nxt == last + 1:
                rle = data[pos]
                pos += 1
            last = nxt
            ctx = nxt
        if ctx == 0:
            break
    states = list(struct.unpack_from("<4I", data, pos))
    pos += 16
    isz4 = rsize >> 2
    bounds = [0, isz4, 2 * isz4, 3 * isz4, rsize]
    out = bytearray(rsize)
    ctxs = [0, 0, 0, 0]
    mask = TOTFREQ - 1
    max_len = max(bounds[j + 1] - bounds[j] for j in range(4))
    for t in range(max_len):
        for j in range(4):
            i = bounds[j] + t
            if i >= bounds[j + 1]:
                continue
            tbl = tables[ctxs[j]]
            x = states[j]
            f = x & mask
            s = tbl.lookup[f]
            out[i] = s
            x = tbl.freqs[s] * (x >> TF_SHIFT) + f - tbl.cum[s]
            while x < RANS_L and pos < len(data):
                x = (x << 8) | data[pos]
                pos += 1
            states[j] = x
            ctxs[j] = s
    return bytes(out)


# ------------------------------------------------------------------- public API


def compress(data: bytes, order: int = 0) -> bytes:
    if len(data) == 0:
        return struct.pack("<BII", order, 0, 0)
    if order == 0 or len(data) < 8:
        return encode_o0(data)
    return encode_o1(data)


def decompress(data: bytes) -> bytes:
    order = data[0]
    (_csize, rsize) = struct.unpack_from("<II", data, 1)
    if rsize == 0:
        return b""
    if order == 0:
        return decode_o0(data)
    if order == 1:
        return decode_o1(data)
    raise ValueError(f"unknown rANS order {order}")
