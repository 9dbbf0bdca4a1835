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
- bit-flags select stream transforms.  Implemented: order-0, X32, CAT
  (stored verbatim).  Not implemented (fail-loud with the flag name so a
  3.1 file using them degrades to a clear error, never silent corruption):
  order-1 (0x01), STRIPE (0x08), standalone NOSZ (0x10), RLE (0x40),
  PACK (0x80).

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
_UNSUPPORTED = (
    (FLAG_ORDER1, "ORDER-1"),
    (FLAG_STRIPE, "STRIPE"),
    (FLAG_NOSZ, "NOSZ"),
    (FLAG_RLE, "RLE"),
    (FLAG_PACK, "PACK"),
)


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
    so the final whole-buffer reverse restores little-endian word order."""
    cum = _cumulative(freqs)
    states = [RANS_NX16_L] * n_states
    out = bytearray()
    for i in range(len(data) - 1, -1, -1):
        j = i % n_states
        sym = data[i]
        f = freqs[sym]
        x = states[j]
        x_max = ((RANS_NX16_L >> TF_SHIFT) << 16) * f
        while x >= x_max:
            out.append((x >> 8) & 0xFF)
            out.append(x & 0xFF)
            x >>= 16
        states[j] = ((x // f) << TF_SHIFT) + (x % f) + cum[sym]
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
        # x >= L>>TF_SHIFT = 8 ⇒ x<<16 > L); the while form is equivalent
        while x < RANS_NX16_L and pos + 2 <= end:
            x = (x << 16) | (data[pos] | (data[pos + 1] << 8))
            pos += 2
        states[j] = x
    return bytes(out)


# ------------------------------------------------------------------- public API


def compress(data: bytes, n_states: int = 4) -> bytes:
    """Order-0 rANS Nx16 (N = 4 or 32), falling back to CAT (stored
    verbatim) when entropy coding does not pay — both forms any
    spec-conformant 3.1 decoder accepts."""
    if n_states not in (4, 32):
        raise ValueError(f"rANS Nx16 interleave must be 4 or 32, got {n_states}")
    header = bytearray()
    _write_uint7(header, len(data))
    if len(data) > 0:
        counts = [0] * 256
        for b in data:
            counts[b] += 1
        freqs = _normalize(counts)
        table = bytearray()
        _write_freq_table_o0(table, freqs)
        body = bytes(table) + _encode_o0_stream(data, freqs, n_states)
        if len(body) < len(data):
            flags = FLAG_X32 if n_states == 32 else 0
            return bytes([flags]) + bytes(header) + body
    return bytes([FLAG_CAT]) + bytes(header) + data


def decompress(data: bytes) -> bytes:
    flags = data[0]
    pos = 1
    for bit, name in _UNSUPPORTED:
        if flags & bit:
            raise ValueError(
                f"rANS Nx16 {name} transform (flags=0x{flags:02x}) not "
                "implemented: this reader supports order-0 (X4/X32) and CAT "
                "3.1 streams"
            )
    rsize, pos = _read_uint7(data, pos)
    if flags & FLAG_CAT:
        if len(data) - pos < rsize:
            raise ValueError(
                f"rANS Nx16 CAT stream truncated: {len(data) - pos} payload "
                f"bytes for declared size {rsize}"
            )
        return bytes(data[pos : pos + rsize])
    if rsize == 0:
        return b""
    n_states = 32 if flags & FLAG_X32 else 4
    freqs, pos = _read_freq_table_o0(data, pos)
    return _decode_o0_stream(data, pos, freqs, n_states, rsize)
