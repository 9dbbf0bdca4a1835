"""rANS Nx16 codec (CRAM 3.1 block compression method 5) — order-0 read
and write paths, from the public CRAM 3.1 codecs specification
(samtools/hts-specs CRAMcodecs: rANS Nx16 section).

The reference engine never reads 3.1 (it delegates CRAM to htsjdk, which
handled 3.0-era codecs — reference anchor ``cram/CramSource.java:153-167``);
this module begins the repo's own 3.1 surface with the most common block
codec.  Differences from the 3.0-era rANS 4x8 (``rans4x8.py``):

- header: one FLAGS byte + a big-endian base-128 varint (``uint7``) of the
  uncompressed size — no compressed-size field;
- 16-bit renormalization with lower bound L = 1<<15 (4x8: 8-bit, 1<<23);
- N interleaved states, N = 4 or 32 (flag 0x04), each seeded at L;
- the frequency table lists the symbol ALPHABET first (RLE over ascending
  symbols), then one uint7 frequency per present symbol, normalized so they
  sum to exactly 4096 (TF_SHIFT = 12, same total as 4x8);
- bit-flags select stream transforms.  Implemented: order-0, order-1
  (flag 0x01 — per-context tables with shift 12 or 10, zero-run freq
  encoding, optionally order-0-rANS-compressed table, N equal slices with
  the last state running long over the remainder), X32, CAT (stored
  verbatim), PACK (0x80 — ≤16-symbol alphabets bit-pack to 1/2/4 bits
  per value before entropy coding; metadata = symbol map + packed length,
  decode runs entropy-then-unpack), STRIPE (0x08 — N byte planes
  compressed as independent NOSZ substreams, the fixed-width numeric
  layout), and RLE (0x40 — per-symbol run-length collapse before entropy
  coding: metadata = RLE'd symbol set + uint7 extra-run counts, itself
  optionally order-0-compressed; decode expands runs AFTER the entropy
  stage and BEFORE un-packing, spec transform order).  The full 3.1
  transform set is covered; a standalone NOSZ (0x10) stream outside a
  STRIPE container still requires the caller-supplied size from the CRAM
  block header (``decompress(expected_len=...)``).

Tested by exhaustive round-trips over adversarial distributions plus
byte-exact known-answer vectors derived by hand from the spec's transform
arithmetic (``tests/test_rans_nx16.py``) — the same differential posture
as ``rans4x8.py``.
"""

from __future__ import annotations

import struct

from .rans4x8 import TOTFREQ, _cumulative, _normalize, _SymbolTable

TF_SHIFT = 12
RANS_NX16_L = 1 << 15

FLAG_ORDER1 = 0x01
FLAG_X32 = 0x04
FLAG_STRIPE = 0x08
FLAG_NOSZ = 0x10
FLAG_CAT = 0x20
FLAG_RLE = 0x40
FLAG_PACK = 0x80


# ------------------------------------------------------------------ uint7


def _write_uint7(out: bytearray, v: int) -> None:
    """Base-128 varint, most-significant 7-bit group first, continuation
    bit 0x80 on every byte except the last."""
    groups = [v & 0x7F]
    v >>= 7
    while v:
        groups.append(0x80 | (v & 0x7F))
        v >>= 7
    out.extend(reversed(groups))


def _read_uint7(data: bytes, pos: int) -> tuple[int, int]:
    v = 0
    while True:
        c = data[pos]
        pos += 1
        v = (v << 7) | (c & 0x7F)
        if not (c & 0x80):
            return v, pos


# ------------------------------------------------------------ alphabet + freqs


def _write_alphabet(out: bytearray, syms: list[int]) -> None:
    """Spec RLE over the ascending symbol list: a symbol that extends a
    consecutive run is followed by the count of FURTHER implicit symbols;
    terminated by a 0 byte (0 can only appear as the first symbol)."""
    i = 0
    while i < len(syms):
        out.append(syms[i])
        if i > 0 and syms[i - 1] == syms[i] - 1:
            run = 0
            while i + run + 1 < len(syms) and syms[i + run + 1] == syms[i + run] + 1:
                run += 1
            out.append(run)
            i += run + 1
        else:
            i += 1
    out.append(0)


def _read_alphabet(data: bytes, pos: int) -> tuple[list[int], int]:
    syms: list[int] = []
    rle = 0
    sym = data[pos]
    pos += 1
    last = sym
    while True:
        syms.append(sym)
        if rle > 0:
            rle -= 1
            sym += 1
        else:
            sym = data[pos]
            pos += 1
            if sym == last + 1:
                rle = data[pos]
                pos += 1
        last = sym
        if sym == 0:
            break
    return syms, pos


def _write_freq_table_o0(out: bytearray, freqs: list[int]) -> None:
    syms = [s for s in range(256) if freqs[s] > 0]
    _write_alphabet(out, syms)
    for s in syms:
        _write_uint7(out, freqs[s])


def _read_freq_table_o0(data: bytes, pos: int) -> tuple[list[int], int]:
    syms, pos = _read_alphabet(data, pos)
    freqs = [0] * 256
    for s in syms:
        freqs[s], pos = _read_uint7(data, pos)
    total = sum(freqs)
    if total != TOTFREQ:
        # spec encoders normalize to exactly 4096; anything else would make
        # the state transform ambiguous here — refuse rather than guess
        raise ValueError(
            f"rANS Nx16 frequency table sums to {total}, expected {TOTFREQ}"
        )
    return freqs, pos


# ---------------------------------------------------------------- order-0 core


def _encode_o0_stream(data: bytes, freqs: list[int], n_states: int) -> bytes:
    """Interleaved encoder: symbol i belongs to state i % N; symbols are
    processed in reverse so the decoder consumes forward.  Renormalization
    emits 16-bit little-endian words; each word is appended high-byte-first
    so the final whole-buffer reverse restores little-endian word order.

    Per-symbol (f, cum, x_max) are precomputed into one flat tuple table —
    three list hops and a multiply per byte collapse to one indexed
    load (this walk is on the container-encode critical path)."""
    cum = _cumulative(freqs)
    renorm_base = (RANS_NX16_L >> TF_SHIFT) << 16
    tbl = [
        (f, cum[s], renorm_base * f) if f else None
        for s, f in enumerate(freqs)
    ]
    states = [RANS_NX16_L] * n_states
    out = bytearray()
    append = out.append
    for i in range(len(data) - 1, -1, -1):
        j = i % n_states
        f, c, x_max = tbl[data[i]]
        x = states[j]
        while x >= x_max:
            append((x >> 8) & 0xFF)
            append(x & 0xFF)
            x >>= 16
        states[j] = ((x // f) << TF_SHIFT) + (x % f) + c
    out.reverse()
    head = b"".join(struct.pack("<I", s) for s in states)
    return head + bytes(out)


def _decode_o0_stream(
    data: bytes, pos: int, freqs: list[int], n_states: int, out_len: int
) -> bytes:
    tbl = _SymbolTable(freqs)
    states = list(struct.unpack_from(f"<{n_states}I", data, pos))
    pos += 4 * n_states
    out = bytearray(out_len)
    lookup, cum, fr = tbl.lookup, tbl.cum, tbl.freqs
    mask = TOTFREQ - 1
    end = len(data)
    for i in range(out_len):
        j = i % n_states
        x = states[j]
        m = x & mask
        s = lookup[m]
        out[i] = s
        x = fr[s] * (x >> TF_SHIFT) + m - cum[s]
        # one 16-bit word always suffices (pre-step x >= L ⇒ post-step
        # x >= L>>TF_SHIFT = 8 ⇒ x<<16 > L); the while form is equivalent.
        # In a valid stream any mid-decode state below L has its renorm
        # words present (the encoder emitted them), so running dry here
        # means truncation — fail loud, don't decode garbage (r6 ADVICE)
        while x < RANS_NX16_L:
            if pos + 2 > end:
                raise ValueError(
                    "rANS Nx16 stream truncated: renormalization ran out "
                    "of input"
                )
            x = (x << 16) | (data[pos] | (data[pos + 1] << 8))
            pos += 2
        states[j] = x
    return bytes(out)


# ---------------------------------------------------------------- order-1 core
#
# Order-1 layout (spec "rANS Nx16 Order-1"): one frequency row per CONTEXT
# symbol; data splits into N slices of floor(len/N) with the LAST state
# continuing over the remainder; each slice's first byte uses context 0.
# The table section starts with one byte: high nibble = the frequency
# shift (12, or 10 for the "fast" profile), low bit = table itself
# compressed with the BARE order-0 rANS codec (freq table + 4 states, no
# flags/size wrapper).  Within the table: the alphabet (order-0 RLE
# scheme), then for each context row the frequencies of the alphabet's
# symbols in order, uint7 each, where a 0 frequency is followed by one
# byte counting FURTHER zeros to skip.


def _slice_bounds(n: int, n_states: int) -> list[int]:
    """Start offsets of the N slices plus the end sentinel: N equal
    floor(n/N) slices, the last one absorbing the remainder."""
    step = n // n_states
    return [j * step for j in range(n_states)] + [n]


def _o1_pairs_reverse(data: bytes, n_states: int):
    """(state, context, symbol) triples in EXACT reverse of the decoder's
    consumption order: the remainder tail (state N-1) first, then the
    lockstep steps t = step-1 .. 0 visiting states N-1 .. 0."""
    bounds = _slice_bounds(len(data), n_states)
    step = len(data) // n_states
    last = n_states - 1
    for p in range(len(data) - 1, bounds[last] + step - 1, -1):
        yield last, data[p - 1] if p > bounds[last] else 0, data[p]
    for t in range(step - 1, -1, -1):
        for j in range(last, -1, -1):
            p = bounds[j] + t
            yield j, data[p - 1] if t > 0 else 0, data[p]


def _write_freq_table_o1(freqs: dict[int, list[int]], alphabet: list[int]) -> bytes:
    out = bytearray()
    _write_alphabet(out, alphabet)
    for i in alphabet:
        row = freqs.get(i)
        j = 0
        while j < len(alphabet):
            f = row[alphabet[j]] if row else 0
            _write_uint7(out, f)
            if f == 0:
                run = 0
                while (
                    j + run + 1 < len(alphabet)
                    and (row[alphabet[j + run + 1]] if row else 0) == 0
                    and run < 255
                ):
                    run += 1
                out.append(run)
                j += run + 1
            else:
                j += 1
    return bytes(out)


def _read_freq_table_o1(
    data: bytes, pos: int, shift: int
) -> tuple[dict[int, "_SymbolTable"], int]:
    syms, pos = _read_alphabet(data, pos)
    tables: dict[int, _SymbolTable] = {}
    total = 1 << shift
    for i in syms:
        row = [0] * 256
        j = 0
        while j < len(syms):
            f, pos = _read_uint7(data, pos)
            row[syms[j]] = f
            if f == 0:
                run = data[pos]
                pos += 1
                j += run + 1
            else:
                j += 1
        rsum = sum(row)
        if rsum == 0:
            continue  # symbol never used as a context — row never consulted
        if rsum != total:
            raise ValueError(
                f"rANS Nx16 order-1 context row for symbol {i} sums to "
                f"{rsum}, expected {total}"
            )
        tables[i] = _SymbolTable(row) if shift == TF_SHIFT else _ShiftTable(row, shift)
    return tables, pos


class _ShiftTable:
    """_SymbolTable for a non-4096 total (the order-1 shift-10 profile)."""

    __slots__ = ("freqs", "cum", "lookup")

    def __init__(self, freqs: list[int], shift: int):
        self.freqs = freqs
        self.cum = _cumulative(freqs)
        self.lookup = bytearray(1 << shift)
        for s in range(256):
            if freqs[s]:
                for i in range(self.cum[s], self.cum[s + 1]):
                    self.lookup[i] = s


def _encode_o1_stream(data: bytes, n_states: int, shift: int = TF_SHIFT) -> bytes:
    """``shift`` is 12 by default; 10 is the spec's reduced-precision
    profile (smaller tables, slightly worse ratio) — the encoder emits it
    only when asked (tests), the decoder accepts both."""
    # (ctx, sym) counts are ORDER-INDEPENDENT: they equal the adjacent
    # bigram multiset of `data` with each slice's first byte re-keyed to
    # context 0 — Counter(zip(...)) counts the bigrams at C speed instead
    # of driving the 2-tuples-per-byte generator a first time (the encode
    # pass below still walks the exact reverse order, where order matters)
    from collections import Counter

    counts: dict[int, list[int]] = {}
    alpha = set(data)
    if len(data) // n_states == 0:
        # tiny input: slices collide at bound 0 and the bigram arithmetic
        # below would miscount — walk the exact pair stream instead
        for _j, ctx, sym in _o1_pairs_reverse(data, n_states):
            counts.setdefault(ctx, [0] * 256)[sym] += 1
            alpha.add(ctx)
    else:
        bounds = _slice_bounds(len(data), n_states)
        bigrams = Counter(zip(data, data[1:]))
        for j in range(1, n_states):
            b = bounds[j]  # >= 1 here (step >= 1), so b-1 never wraps
            bigrams[(data[b - 1], data[b])] -= 1
            bigrams[(0, data[b])] += 1
        bigrams[(0, data[0])] += 1  # state 0's first byte has context 0
        for (ctx, sym), c in bigrams.items():
            if c:
                counts.setdefault(ctx, [0] * 256)[sym] += c
                alpha.add(ctx)
    freqs = {c: _normalize(row, 1 << shift) for c, row in counts.items()}
    table = _write_freq_table_o1(freqs, sorted(alpha))
    # table-compression option: nest the table through the bare order-0
    # codec when it pays (htscodecs does the same; decoders accept both)
    comp = compress_o0_bare(table)
    if len(comp) + 4 < len(table):
        # field order per the public 3.1 implementations (htscodecs
        # rans4x16pr.c, htsjdk RANSNx16Decode): UNCOMPRESSED size first,
        # then compressed size (r6 ADVICE — the swapped order round-tripped
        # against our own reader but broke samtools/htsjdk interop)
        head = bytearray([shift << 4 | 1])
        _write_uint7(head, len(table))
        _write_uint7(head, len(comp))
        table_out = bytes(head) + comp
    else:
        table_out = bytes([shift << 4]) + table

    # flat per-context (f, cum, x_max) tuple tables: the walk below pays
    # one ctx hop + one sym load per byte instead of two dict lookups, a
    # multiply and two list hops (this loop is the per-core 3.1 write
    # frontier)
    renorm_base = (RANS_NX16_L >> shift) << 16
    tbl: dict[int, list] = {}
    for c, f_row in freqs.items():
        crow = _cumulative(f_row)
        tbl[c] = [
            (f, crow[s], renorm_base * f) if f else None
            for s, f in enumerate(f_row)
        ]
    states = [RANS_NX16_L] * n_states
    out = bytearray()
    # the exact reverse pair order of _o1_pairs_reverse, inlined: the
    # generator's tuple-per-byte overhead was ~15% of the encode stream
    ebounds = _slice_bounds(len(data), n_states)
    estep = len(data) // n_states
    last = n_states - 1
    append = out.append
    x = states[last]
    for p in range(len(data) - 1, ebounds[last] + estep - 1, -1):
        ctx = data[p - 1] if p > ebounds[last] else 0
        f, cm, x_max = tbl[ctx][data[p]]
        while x >= x_max:
            append((x >> 8) & 0xFF)
            append(x & 0xFF)
            x >>= 16
        x = ((x // f) << shift) + (x % f) + cm
    states[last] = x
    for t in range(estep - 1, -1, -1):
        for j in range(last, -1, -1):
            p = ebounds[j] + t
            ctx = data[p - 1] if t > 0 else 0
            f, cm, x_max = tbl[ctx][data[p]]
            x = states[j]
            while x >= x_max:
                append((x >> 8) & 0xFF)
                append(x & 0xFF)
                x >>= 16
            states[j] = ((x // f) << shift) + (x % f) + cm
    out.reverse()
    head = b"".join(struct.pack("<I", s) for s in states)
    return table_out + head + bytes(out)


def _decode_o1_stream(data: bytes, pos: int, n_states: int, out_len: int) -> bytes:
    comp = data[pos]
    pos += 1
    shift = comp >> 4
    if shift not in (10, 12):
        raise ValueError(f"rANS Nx16 order-1 frequency shift {shift} invalid")
    if comp & 1:
        ulen, pos = _read_uint7(data, pos)
        clen, pos = _read_uint7(data, pos)
        table = decompress_o0_bare(data[pos : pos + clen], ulen)
        tables, used = _read_freq_table_o1(table, 0, shift)
        pos += clen
    else:
        tables, pos = _read_freq_table_o1(data, pos, shift)
    states = list(struct.unpack_from(f"<{n_states}I", data, pos))
    pos += 4 * n_states
    out = bytearray(out_len)
    bounds = _slice_bounds(out_len, n_states)
    step = out_len // n_states
    mask = (1 << shift) - 1
    end = len(data)
    L = RANS_NX16_L
    # dense context lookup as PREBOUND (lookup, freqs, cum) tuples — the
    # inner loop is the per-core decode frontier (VERDICT r7), so it pays
    # for zero attribute lookups.  A missing row means a corrupt stream —
    # surface it as a clear ValueError, not a KeyError/TypeError from
    # deep in the loop.
    tlist = [
        (t.lookup, t.freqs, t.cum) if t is not None else None
        for t in (tables.get(i) for i in range(256))
    ]
    # per-state cursors: (ctx row, output position, ctx) — the row is
    # prebound so the hot loop does zero attribute lookups; ctx rides
    # along only for the corrupt-stream error message
    cur = [(tlist[0], bounds[j], 0) for j in range(n_states)]

    def _corrupt_ctx(ctx: int) -> ValueError:
        return ValueError(
            f"rANS Nx16 order-1 stream references context {ctx} with no "
            "frequency row — corrupt stream"
        )

    for t in range(step):
        for j in range(n_states):
            rowj, p, ctx = cur[j]
            if rowj is None:
                raise _corrupt_ctx(ctx)
            lookup, freqs, cum = rowj
            x = states[j]
            m = x & mask
            s = lookup[m]
            out[p] = s
            x = freqs[s] * (x >> shift) + m - cum[s]
            while x < L:
                if pos + 2 > end:
                    raise ValueError(
                        "rANS Nx16 stream truncated: renormalization ran "
                        "out of input"
                    )
                x = (x << 16) | (data[pos] | (data[pos + 1] << 8))
                pos += 2
            states[j] = x
            cur[j] = (tlist[s], p + 1, s)
    last = n_states - 1
    rowl, p, ctx = cur[last]
    for p in range(p, out_len):
        if rowl is None:
            raise _corrupt_ctx(ctx)
        lookup, freqs, cum = rowl
        x = states[last]
        m = x & mask
        s = lookup[m]
        out[p] = s
        x = freqs[s] * (x >> shift) + m - cum[s]
        while x < L:
            if pos + 2 > end:
                raise ValueError(
                    "rANS Nx16 stream truncated: renormalization ran out "
                    "of input"
                )
            x = (x << 16) | (data[pos] | (data[pos + 1] << 8))
            pos += 2
        states[last] = x
        rowl, ctx = tlist[s], s
    return bytes(out)


# ------------------------------------------------------------------- RLE
#
# Spec "RLE" (flag 0x40): maximal runs of a chosen symbol SET collapse to
# one literal byte each; the per-run EXTRA copies (length − 1) go to a
# side metadata stream as uint7s.  Stream metadata (after the PACK meta,
# if any): uint7(2·meta_len | raw_bit), uint7(literal length), then the
# meta bytes raw (bit set) or uint7(comp_len) + a bare-order-0-compressed
# meta (bit clear) — the same nesting the order-1 frequency table uses.
# The meta buffer itself: one byte n (0 encodes 256), the n RLE'd
# symbols, then the run counts in literal order.  Decode order is
# entropy → RLE-expand → un-PACK (encode applied PACK first).


def _rle_encode(data: bytes) -> tuple[bytes, bytes] | None:
    """(meta, literals) for the RLE transform, or None when no symbol's
    runs pay for their run-length bytes.  Symbol choice is encoder
    freedom under the spec; the rule here is the simple honest one —
    collapse symbol s only if the literal bytes it saves exceed ~2 bytes
    per run (a uint7 run count is 1-2 bytes at any plausible run
    length).

    Run discovery is vectorized (the per-byte while-walk was the
    single hottest line of the 3.1 container encode): run boundaries
    fall out of one C-level inequality over adjacent bytes, per-symbol
    run counts/totals out of two bincounts, and — because every run is
    one symbol repeated — the literal stream is one ``np.repeat``
    (collapsed runs contribute their symbol once, kept runs reproduce
    themselves verbatim).  Only the per-run uint7 metadata stays a
    Python loop, O(runs) not O(bytes).  Byte-identical output."""
    import numpy as np

    n = len(data)
    if n == 0:
        return None  # documented contract: None when no symbol pays
    a = np.frombuffer(data, np.uint8)
    change = np.nonzero(a[1:] != a[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    run_syms = a[starts]
    run_lens = np.diff(np.concatenate((starts, [n])))
    run_cnt = np.bincount(run_syms, minlength=256)
    tot = np.bincount(run_syms, weights=run_lens, minlength=256).astype(np.int64)
    pays = tot - 3 * run_cnt > 0
    syms = np.nonzero(pays)[0].tolist()
    if not syms:
        return None
    meta = bytearray([len(syms) if len(syms) < 256 else 0])
    meta.extend(syms)
    collapse = pays[run_syms]
    lit = np.repeat(run_syms, np.where(collapse, 1, run_lens)).tobytes()
    extras = (run_lens[collapse] - 1).tolist()
    if extras and max(extras) < 0x80:
        meta.extend(extras)
    else:
        for e in extras:
            _write_uint7(meta, e)
    return bytes(meta), lit


def _rle_decode(
    lit: bytes, meta: bytes, out_len: int, label: str = "rANS Nx16"
) -> bytes:
    nsym = meta[0]
    mpos = 1
    if nsym == 0:
        nsym = 256
    syms = meta[mpos : mpos + nsym]
    if len(syms) != nsym:
        raise ValueError(
            f"{label} RLE metadata truncated: {len(syms)} of {nsym} "
            "symbols present"
        )
    mpos += nsym
    in_set = bytearray(256)
    for s in syms:
        in_set[s] = 1
    out = bytearray()
    for b in lit:
        out.append(b)
        if in_set[b]:
            run, mpos = _read_uint7(meta, mpos)
            if len(out) + run > out_len:
                raise ValueError(
                    f"{label} RLE run overflows the declared size "
                    f"{out_len} — corrupt stream"
                )
            out.extend(bytes([b]) * run)
    if len(out) != out_len:
        raise ValueError(
            f"{label} RLE expanded to {len(out)} bytes, expected {out_len}"
        )
    return bytes(out)


# ------------------------------------------------------------------ PACK
#
# Spec "Pack transform": for alphabets of ≤16 distinct symbols, values map
# to small indices and pack 8/4/2-per-byte (LSB-first) BEFORE entropy
# coding.  Stream metadata (after flags + uncompressed size): nsym byte,
# the nsym-symbol map, uint7 packed length; the remaining stream is the
# entropy-coded PACKED bytes, so decode runs entropy-then-unpack.  A
# 1-symbol input stores no packed data at all (plen = 0).


def _pack_values(data: bytes, syms: list[int]) -> bytes:
    """LSB-first bit pack, vectorized: a 256-entry LUT maps bytes to
    symbol indices, then each group of ``per`` indices ORs into one
    output byte with C-level shifts (byte-identical to the per-byte
    ``|=`` loop this replaces — zero-padding the tail group matches the
    implicit zeros of the preallocated bytearray)."""
    import numpy as np

    n = len(syms)
    if n <= 1:
        return b""
    if n <= 2:
        per, bits = 8, 1
    elif n <= 4:
        per, bits = 4, 2
    else:
        per, bits = 2, 4
    lut = np.zeros(256, np.uint8)
    lut[list(syms)] = np.arange(n, dtype=np.uint8)
    idx = lut[np.frombuffer(data, np.uint8)]
    pad = (-len(idx)) % per
    if pad:
        idx = np.concatenate((idx, np.zeros(pad, np.uint8)))
    groups = idx.reshape(-1, per).astype(np.uint16)
    shifts = (bits * np.arange(per, dtype=np.uint16))[None, :]
    packed = np.bitwise_or.reduce(groups << shifts, axis=1).astype(np.uint8)
    return packed.tobytes()


def _unpack_values(
    packed: bytes, syms: list[int], out_len: int, label: str = "rANS Nx16"
) -> bytes:
    n = len(syms)
    if n <= 1:
        if not syms and out_len:
            raise ValueError(f"{label} PACK stream with empty symbol map")
        return bytes([syms[0]]) * out_len if out_len else b""
    if n <= 2:
        per, bits = 8, 1
    elif n <= 4:
        per, bits = 4, 2
    else:
        per, bits = 2, 4
    if (out_len + per - 1) // per > len(packed):
        raise ValueError(
            f"{label} PACK stream truncated: {len(packed)} packed bytes "
            f"cannot hold {out_len} values at {bits} bits"
        )
    # vectorized unpack (decode twin of _pack_values' shift-OR reduce):
    # each packed byte fans out to `per` indices with C-level shifts,
    # then one LUT gather maps indices to symbols.  Same values and the
    # same first-offending-index error as the per-value loop.
    import numpy as np

    mask = (1 << bits) - 1
    nbytes = (out_len + per - 1) // per
    arr = np.frombuffer(packed[:nbytes], np.uint8)
    shifts = (bits * np.arange(per, dtype=np.uint8))[None, :]
    vals = ((arr[:, None] >> shifts) & mask).reshape(-1)[:out_len]
    if n < 1 << bits:
        bad = np.nonzero(vals >= n)[0]
        if bad.size:
            raise ValueError(
                f"{label} PACK index {int(vals[bad[0]])} out of range for a "
                f"{n}-symbol map — corrupt stream"
            )
    lut = np.zeros(1 << bits, np.uint8)
    lut[: len(syms)] = syms
    return lut[vals].tobytes()


def compress_o0_bare(data: bytes) -> bytes:
    """The BARE order-0 form (freq table + 4 states + renorm words, no
    flags/size header) used to nest order-1 frequency tables."""
    counts = [0] * 256
    for b in data:
        counts[b] += 1
    freqs = _normalize(counts)
    table = bytearray()
    _write_freq_table_o0(table, freqs)
    return bytes(table) + _encode_o0_stream(data, freqs, 4)


def decompress_o0_bare(data: bytes, out_len: int) -> bytes:
    freqs, pos = _read_freq_table_o0(data, 0)
    return _decode_o0_stream(data, pos, freqs, 4, out_len)


# ------------------------------------------------------------------- public API


def _entropy_body(data: bytes, n_states: int, order: int) -> tuple[int, bytes]:
    """(flag bits, encoded body) for the plain entropy stage."""
    if order == 1 and len(data) >= n_states:
        return FLAG_ORDER1, _encode_o1_stream(data, n_states)
    counts = [0] * 256
    for b in data:
        counts[b] += 1
    freqs = _normalize(counts)
    table = bytearray()
    _write_freq_table_o0(table, freqs)
    return 0, bytes(table) + _encode_o0_stream(data, freqs, n_states)


def _rle_candidate(payload: bytes, entropy_body, nest_meta: bool = True):
    """(extra flag bits, body) for the RLE-transformed form, or None when
    no symbol's runs pay.  ``entropy_body(literals) -> (bits, body)``
    codes the post-RLE literal stream; ``nest_meta`` allows compressing
    the run metadata through the bare order-0 codec when that pays
    (the Nx16 writer does; the arith writer keeps raw metadata).
    Shared by both codec writers — the caller compares the returned
    body against its un-collapsed coding, the same honest size test as
    the CAT fallback."""
    rle = _rle_encode(payload)
    if rle is None:
        return None
    rmeta, lit = rle
    m2 = bytearray()
    comp = compress_o0_bare(rmeta) if nest_meta else None
    if comp is not None and len(comp) + 2 < len(rmeta):
        _write_uint7(m2, len(rmeta) << 1)  # bit 0 clear: nested meta
        _write_uint7(m2, len(lit))
        _write_uint7(m2, len(comp))
        m2.extend(comp)
    else:
        _write_uint7(m2, (len(rmeta) << 1) | 1)  # raw meta
        _write_uint7(m2, len(lit))
        m2.extend(rmeta)
    bits, body = entropy_body(lit)
    return FLAG_RLE | bits, bytes(m2) + body


def _stripe_container(data: bytes, n_planes: int, compress_plane) -> bytes:
    """STRIPE container: byte plane j (``data[j::n_planes]``) compresses
    independently (its own flags — PACK/order fall out naturally per
    plane) with NOSZ set, sizes derived from the total.  The standard
    layout for fixed-width numeric series (e.g. 4-byte coordinates →
    4 planes of far lower per-plane entropy).  Shared by both codecs."""
    if not 1 <= n_planes <= 255:
        raise ValueError(f"STRIPE plane count must be 1..255, got {n_planes}")
    subs = []
    for j in range(n_planes):
        sub = compress_plane(data[j::n_planes])
        _, size_end = _read_uint7(sub, 1)
        subs.append(bytes([sub[0] | FLAG_NOSZ]) + sub[size_end:])
    out = bytearray([FLAG_STRIPE])
    _write_uint7(out, len(data))
    out.append(n_planes)
    for s in subs:
        _write_uint7(out, len(s))
    for s in subs:
        out.extend(s)
    return bytes(out)


def compress_striped(data: bytes, n_planes: int = 4, n_states: int = 4,
                     order: int = 0) -> bytes:
    return _stripe_container(data, n_planes, lambda p: compress(p, n_states, order))


def _container_encode(
    data: bytes, *, entropy_body, base_flags: int = 0, nest_rle_meta: bool = True
) -> bytes:
    """The transform-container writer shared by both codecs (second r7
    review — the decode walk had been consolidated for drift, the encode
    side had not): bit-PACK ≤16-symbol inputs before the entropy stage,
    try the RLE collapse where it pays (PACK → RLE → entropy, the spec
    order), fall back to CAT (stored verbatim) when entropy coding does
    not pay — all forms any spec-conformant 3.1 decoder accepts.
    ``entropy_body(payload) -> (flag bits, body)`` codes the entropy
    slot; ``base_flags`` carries codec-specific bits (Nx16's X32)."""
    header = bytearray()
    _write_uint7(header, len(data))
    if len(data) > 0:
        flags = base_flags
        meta = b""
        payload = data
        if len(data) >= 32:
            syms = sorted(set(data))
            if len(syms) <= 16:
                flags |= FLAG_PACK
                payload = _pack_values(data, syms)
                m = bytearray([len(syms)])
                m.extend(syms)
                _write_uint7(m, len(payload))
                meta = bytes(m)
        if payload:
            obits, body = entropy_body(payload)
            cand = (
                _rle_candidate(payload, entropy_body, nest_meta=nest_rle_meta)
                if len(payload) >= 32
                else None
            )
            if cand is not None and len(cand[1]) < len(body):
                obits, body = cand
            flags |= obits
        else:
            body = b""  # 1-symbol PACK: the map alone reconstructs everything
        if len(meta) + len(body) < len(data):
            return bytes([flags]) + bytes(header) + meta + body
    return bytes([FLAG_CAT]) + bytes(header) + data


def compress(data: bytes, n_states: int = 4, order: int = 0) -> bytes:
    """rANS Nx16 (N = 4 or 32), order 0 or 1, through the shared
    transform container."""
    if n_states not in (4, 32):
        raise ValueError(f"rANS Nx16 interleave must be 4 or 32, got {n_states}")
    if order not in (0, 1):
        raise ValueError(f"rANS Nx16 order must be 0 or 1, got {order}")
    return _container_encode(
        data,
        entropy_body=lambda p: _entropy_body(p, n_states, order),
        base_flags=FLAG_X32 if n_states == 32 else 0,
    )


def decompress(data: bytes, expected_len: int | None = None) -> bytes:
    """Decode any supported Nx16 stream.  ``expected_len`` enables
    top-level NOSZ streams (legal in CRAM blocks, whose header already
    stores the raw size — the block layer passes it through).  Corrupt or
    truncated input raises ValueError (never a bare IndexError /
    struct.error from deep in the bit machinery — r6 review finding)."""
    try:
        return _decompress(data, expected_len)
    except (IndexError, struct.error) as exc:
        raise ValueError(
            f"rANS Nx16 stream truncated or corrupt ({type(exc).__name__}: "
            f"{exc})"
        ) from exc


def _container_decode(
    data: bytes,
    expected_len: int | None,
    *,
    label: str,
    entropy,
    recurse,
    meta_o0=None,
    in_stripe: bool = False,
) -> bytes:
    """The transform-container walk shared by rANS Nx16 and the method-6
    arithmetic codec (identical flag scheme apart from the entropy-slot
    bit each claims — the r7 review found the two private copies already
    drifting).  ``entropy(data, pos, flags, out_len)`` decodes the
    entropy slot; ``recurse(sub, plane_len, in_stripe)`` decodes a STRIPE
    plane with the owning codec; ``meta_o0(blob, out_len)`` decodes
    nested (compressed) RLE metadata with the OWNING codec's bare
    order-0 form — rANS for method 5, arithmetic for method 6 (second
    r7 review: routing arith metadata through the rANS decoder would
    break real method-6 files while round-tripping our own).

    Transform metadata appears in stream order PACK then RLE; the decode
    pipeline applies entropy (or CAT) → RLE-expand → un-PACK, inverting
    the encoder's PACK → RLE → entropy order (spec transform order)."""
    flags = data[0]
    pos = 1
    if flags & FLAG_NOSZ:
        if expected_len is None:
            raise ValueError(
                f"{label} NOSZ stream without an externally-known size: "
                "the uncompressed size is unrecoverable (CRAM blocks pass "
                "their header raw_size through decompress(expected_len=...))"
            )
        rsize = expected_len
    else:
        rsize, pos = _read_uint7(data, pos)
        if expected_len is not None and rsize != expected_len:
            # the CRAM block header already knows the raw size — a
            # disagreement is corruption, and catching it HERE also stops
            # a corrupt uint7 from driving a huge allocation (MemoryError
            # instead of the fail-loud ValueError contract)
            raise ValueError(
                f"{label} stream declares {rsize} uncompressed bytes but "
                f"the enclosing block says {expected_len} — corrupt stream"
            )
    if flags & FLAG_STRIPE:
        # spec "Stripe transform": N byte-plane substreams (plane j holds
        # out[j::N]), each a full stream with NOSZ set (plane sizes derive
        # from the total), lengths as uint7 before the payloads.  Planes
        # are ENTROPY substreams — no real encoder nests STRIPE, and
        # accepting nesting would let a ~4-bytes-per-level crafted stream
        # blow the recursion limit (RecursionError escaping the ValueError
        # contract — r6 review finding)
        if in_stripe:
            raise ValueError(
                f"{label} STRIPE nested inside a STRIPE plane — corrupt "
                "stream"
            )
        n = data[pos]
        pos += 1
        if n == 0:
            raise ValueError(f"{label} STRIPE stream with zero substreams")
        clens = []
        for _ in range(n):
            c, pos = _read_uint7(data, pos)
            clens.append(c)
        out = bytearray(rsize)
        for j in range(n):
            plane_len = (rsize - j + n - 1) // n if rsize > j else 0
            plane = recurse(data[pos : pos + clens[j]], plane_len, True)
            if len(plane) != plane_len:
                raise ValueError(
                    f"{label} STRIPE plane {j} decoded {len(plane)} "
                    f"bytes, expected {plane_len}"
                )
            out[j::n] = plane
            pos += clens[j]
        return bytes(out)
    if rsize == 0:
        return b""
    pack_syms = None
    out_len = rsize
    if flags & FLAG_PACK:
        nsym = data[pos]
        pos += 1
        if nsym > 16:
            raise ValueError(
                f"{label} PACK symbol map has {nsym} symbols, spec "
                "maximum is 16 — corrupt stream"
            )
        pack_syms = list(data[pos : pos + nsym])
        pos += nsym
        out_len, pos = _read_uint7(data, pos)
    rle_meta = None
    rle_out_len = 0
    if flags & FLAG_RLE:
        rmeta_len, pos = _read_uint7(data, pos)
        lit_len, pos = _read_uint7(data, pos)
        msz = rmeta_len >> 1
        if rmeta_len & 1:
            rle_meta = bytes(data[pos : pos + msz])
            if len(rle_meta) != msz:
                raise ValueError(
                    f"{label} RLE metadata truncated: {len(rle_meta)} of "
                    f"{msz} bytes present"
                )
            pos += msz
        else:
            cmeta_len, pos = _read_uint7(data, pos)
            rle_meta = (meta_o0 or decompress_o0_bare)(
                data[pos : pos + cmeta_len], msz
            )
            pos += cmeta_len
        rle_out_len = out_len  # expansion target: packed length, or rsize
        out_len = lit_len  # the entropy stage produces the literals
    if flags & FLAG_CAT:
        if len(data) - pos < out_len:
            raise ValueError(
                f"{label} CAT stream truncated: {len(data) - pos} payload "
                f"bytes for declared size {out_len}"
            )
        payload = bytes(data[pos : pos + out_len])
    elif out_len == 0:
        payload = b""
    else:
        payload = entropy(data, pos, flags, out_len)
    if rle_meta is not None:
        payload = _rle_decode(payload, rle_meta, rle_out_len, label)
    if pack_syms is not None:
        return _unpack_values(payload, pack_syms, rsize, label)
    return payload


def _nx16_entropy(data: bytes, pos: int, flags: int, out_len: int) -> bytes:
    n_states = 32 if flags & FLAG_X32 else 4
    if flags & FLAG_ORDER1:
        return _decode_o1_stream(data, pos, n_states, out_len)
    freqs, pos = _read_freq_table_o0(data, pos)
    return _decode_o0_stream(data, pos, freqs, n_states, out_len)


def _decompress(
    data: bytes, expected_len: int | None, in_stripe: bool = False
) -> bytes:
    return _container_decode(
        data,
        expected_len,
        label="rANS Nx16",
        entropy=_nx16_entropy,
        recurse=_decompress,
        in_stripe=in_stripe,
    )
