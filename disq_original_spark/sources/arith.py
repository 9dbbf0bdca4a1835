"""CRAM 3.1 adaptive arithmetic codec ("range coder", block method 6) —
read and write paths, from the public CRAM 3.1 codecs specification
(samtools/hts-specs CRAMcodecs: "Adaptive arithmetic coding").

The reference engine never reads 3.1 (htsjdk 3.0-era delegation,
reference anchor ``cram/CramSource.java:153-167``).  This module covers
the method-6 block codec; together with rANS Nx16 and tok3 it leaves
only fqzcomp (method 7) gated.

Container layout mirrors rANS Nx16's flag scheme, with two differences:
bit 0 is the model order (no interleave — the arithmetic coder is a
single sequential stream) and bit 0x04 selects EXTERNAL compression
(the payload is a whole bzip2 stream instead of an entropy-coded one):

- 0x01 ORDER1, 0x04 EXT (bzip2), 0x08 STRIPE, 0x10 NOSZ, 0x20 CAT,
  0x40 RLE, 0x80 PACK; uint7 uncompressed size unless NOSZ; PACK/RLE/
  STRIPE metadata byte-identical to the Nx16 layouts (shared helpers).

Entropy layer (spec section "Range coding"): the carry-aware byte-wise
range coder — 64-bit ``low``, 32-bit ``range`` renormalized below
2^24, encoder cache/FF-run carry propagation, decoder primed with FIVE
bytes (the first is the encoder's initial zero cache byte and falls off
the 32-bit code register) — driving an adaptive frequency model: one
byte reads ``max_sym`` (0 encodes 256), then per symbol the model scans
its (symbol, freq) table in current order, codes (cumfreq, freq,
total), bumps the symbol's frequency by STEP = 8, swaps it one slot
toward the front when its frequency now exceeds its predecessor's (the
deterministic move-to-front BOTH sides replay), and halves every
frequency (``f -= f >> 1``, floor 1) when the total crosses
MAX_TOTAL = 2^16 − 16.  Order-1 keeps one such model per preceding
byte (context 0 for the first).

Interop notes for review: the renormalization bound (2^24), 5-byte
decoder priming, STEP, MAX_TOTAL, and the adjacent-swap model update
are written from the spec's reference pseudocode; the byte-exact vectors
in ``tests/test_arith.py`` pin each so a disagreement with htscodecs
shows up as a vector diff, not a silent symmetric round-trip.
"""

from __future__ import annotations

import bz2

from .rans_nx16 import (
    FLAG_CAT,
    FLAG_NOSZ,
    FLAG_ORDER1,
    FLAG_PACK,
    FLAG_RLE,
    FLAG_STRIPE,
    _pack_values,
    _read_uint7,
    _rle_decode,
    _rle_encode,
    _unpack_values,
    _write_uint7,
)

FLAG_EXT = 0x04  # bzip2 payload (replaces Nx16's X32 bit position)

_TOP = 1 << 24
_STEP = 8
_MAX_TOTAL = (1 << 16) - _STEP * 2  # rescale headroom: total + STEP stays < 2^16


# ------------------------------------------------------------ range coder


class _Encoder:
    __slots__ = ("low", "range", "cache", "ffnum", "first", "out")

    def __init__(self) -> None:
        self.low = 0
        self.range = 0xFFFFFFFF
        self.cache = 0
        self.ffnum = 0
        self.first = True
        self.out = bytearray()

    def _shift_low(self) -> None:
        if self.low < 0xFF000000 or self.low > 0xFFFFFFFF:
            carry = self.low >> 32
            if not self.first:
                self.out.append((self.cache + carry) & 0xFF)
            else:
                # the very first shift emits the initial zero cache byte,
                # which the decoder's 5-byte priming drops off its 32-bit
                # register
                self.out.append(carry & 0xFF)
                self.first = False
            while self.ffnum:
                self.out.append((0xFF + carry) & 0xFF)
                self.ffnum -= 1
            self.cache = (self.low >> 24) & 0xFF
        else:
            self.ffnum += 1
        self.low = (self.low << 8) & 0xFFFFFFFF

    def encode(self, cumfreq: int, freq: int, total: int) -> None:
        r = self.range // total
        self.low += cumfreq * r
        self.range = r * freq
        while self.range < _TOP:
            self._shift_low()
            self.range = (self.range << 8) & 0xFFFFFFFF

    def finish(self) -> bytes:
        for _ in range(5):
            self._shift_low()
        return bytes(self.out)


class _Decoder:
    __slots__ = ("code", "range", "data", "pos")

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.code = 0
        self.range = 0xFFFFFFFF
        for _ in range(5):
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF

    def _byte(self) -> int:
        if self.pos < len(self.data):
            b = self.data[self.pos]
            self.pos += 1
            return b
        raise ValueError("arith stream truncated: range decoder ran out of input")

    def get_freq(self, total: int) -> int:
        self.range //= total
        return self.code // self.range

    def decode(self, cumfreq: int, freq: int) -> None:
        self.code -= cumfreq * self.range
        self.range *= freq
        while self.range < _TOP:
            self.code = ((self.code << 8) | self._byte()) & 0xFFFFFFFF
            self.range = (self.range << 8) & 0xFFFFFFFF


# ---------------------------------------------------------- adaptive model


class _Model:
    """Adaptive (symbol, frequency) table scanned in current order; the
    STEP bump, adjacent swap and halving rescale are deterministic on
    both sides, so the table order is part of the format."""

    __slots__ = ("syms", "freqs", "total")

    def __init__(self, nsym: int) -> None:
        self.syms = list(range(nsym))
        self.freqs = [1] * nsym
        self.total = nsym

    def _bump(self, i: int) -> None:
        self.freqs[i] += _STEP
        self.total += _STEP
        if i > 0 and self.freqs[i] > self.freqs[i - 1]:
            self.syms[i - 1], self.syms[i] = self.syms[i], self.syms[i - 1]
            self.freqs[i - 1], self.freqs[i] = self.freqs[i], self.freqs[i - 1]
        if self.total > _MAX_TOTAL:
            total = 0
            for j, f in enumerate(self.freqs):
                f -= f >> 1
                self.freqs[j] = f
                total += f
            self.total = total

    def encode(self, enc: _Encoder, sym: int) -> None:
        acc = 0
        for i, s in enumerate(self.syms):
            if s == sym:
                enc.encode(acc, self.freqs[i], self.total)
                self._bump(i)
                return
            acc += self.freqs[i]
        raise ValueError(f"arith model: symbol {sym} outside max_sym alphabet")

    def decode(self, dec: _Decoder) -> int:
        x = dec.get_freq(self.total)
        acc = 0
        for i, f in enumerate(self.freqs):
            if acc + f > x:
                dec.decode(acc, f)
                sym = self.syms[i]
                self._bump(i)
                return sym
            acc += f
        raise ValueError("arith stream corrupt: cumulative frequency overrun")


def _encode_stream(data: bytes, order: int) -> bytes:
    max_sym = (max(data) + 1) if data else 1
    out = bytearray([max_sym & 0xFF])  # 256 wraps to 0 per the spec
    enc = _Encoder()
    if order:
        models = [_Model(max_sym) for _ in range(max_sym)]
        last = 0
        for b in data:
            models[last].encode(enc, b)
            last = b
    else:
        model = _Model(max_sym)
        for b in data:
            model.encode(enc, b)
    out.extend(enc.finish())
    return bytes(out)


def _decode_stream(data: bytes, pos: int, order: int, out_len: int) -> bytes:
    if pos >= len(data):
        raise ValueError("arith stream truncated before max_sym byte")
    max_sym = data[pos] or 256
    pos += 1
    dec = _Decoder(data, pos)
    out = bytearray(out_len)
    if order:
        models = [_Model(max_sym) for _ in range(max_sym)]
        last = 0
        for i in range(out_len):
            b = models[last].decode(dec)
            out[i] = b
            last = b
    else:
        model = _Model(max_sym)
        for i in range(out_len):
            out[i] = model.decode(dec)
    return bytes(out)


# ------------------------------------------------------------- public API


def compress(data: bytes, order: int = 0) -> bytes:
    """Adaptive-arithmetic block stream (method 6): PACK and RLE engage
    when they pay (same honest size tests as the Nx16 encoder), CAT when
    entropy coding does not."""
    if order not in (0, 1):
        raise ValueError(f"arith order must be 0 or 1, got {order}")
    header = bytearray()
    _write_uint7(header, len(data))
    if len(data) > 0:
        flags = 0
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
            obits = FLAG_ORDER1 if order else 0
            body = _encode_stream(payload, order)
            if len(payload) >= 32:
                rle = _rle_encode(payload)
                if rle is not None:
                    rmeta, lit = rle
                    m2 = bytearray()
                    _write_uint7(m2, (len(rmeta) << 1) | 1)  # raw meta
                    _write_uint7(m2, len(lit))
                    m2.extend(rmeta)
                    lbody = _encode_stream(lit, order)
                    if len(m2) + len(lbody) < len(body):
                        obits, body = FLAG_RLE | (FLAG_ORDER1 if order else 0), bytes(
                            m2
                        ) + lbody
            flags |= obits
        else:
            body = b""
        if len(meta) + len(body) < len(data):
            return bytes([flags]) + bytes(header) + meta + body
    return bytes([FLAG_CAT]) + bytes(header) + data


def compress_striped(data: bytes, n_planes: int = 4, order: int = 0) -> bytes:
    if not 1 <= n_planes <= 255:
        raise ValueError(f"STRIPE plane count must be 1..255, got {n_planes}")
    subs = []
    for j in range(n_planes):
        sub = compress(data[j::n_planes], order)
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


def decompress(data: bytes, expected_len: int | None = None) -> bytes:
    """Decode any supported method-6 stream; ``expected_len`` serves
    top-level NOSZ blocks (size known from the CRAM block header).
    Corrupt input raises ValueError, never a bare IndexError."""
    try:
        return _decompress(data, expected_len)
    except IndexError as exc:
        raise ValueError(
            f"arith stream truncated or corrupt (IndexError: {exc})"
        ) from exc


def _decompress(
    data: bytes, expected_len: int | None, in_stripe: bool = False
) -> bytes:
    flags = data[0]
    pos = 1
    if flags & FLAG_NOSZ:
        if expected_len is None:
            raise ValueError(
                "arith NOSZ stream without an externally-known size (CRAM "
                "blocks pass their header raw_size through "
                "decompress(expected_len=...))"
            )
        rsize = expected_len
    else:
        rsize, pos = _read_uint7(data, pos)
    if flags & FLAG_STRIPE:
        if in_stripe:
            raise ValueError("arith STRIPE nested inside a STRIPE plane")
        n = data[pos]
        pos += 1
        if n == 0:
            raise ValueError("arith STRIPE stream with zero substreams")
        clens = []
        for _ in range(n):
            c, pos = _read_uint7(data, pos)
            clens.append(c)
        out = bytearray(rsize)
        for j in range(n):
            plane_len = (rsize - j + n - 1) // n if rsize > j else 0
            plane = _decompress(data[pos : pos + clens[j]], plane_len, in_stripe=True)
            if len(plane) != plane_len:
                raise ValueError(
                    f"arith STRIPE plane {j} decoded {len(plane)} bytes, "
                    f"expected {plane_len}"
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
                f"arith PACK symbol map has {nsym} symbols, spec maximum "
                "is 16 — corrupt stream"
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
                raise ValueError("arith RLE metadata truncated")
            pos += msz
        else:
            from .rans_nx16 import decompress_o0_bare

            cmeta_len, pos = _read_uint7(data, pos)
            rle_meta = decompress_o0_bare(data[pos : pos + cmeta_len], msz)
            pos += cmeta_len
        rle_out_len = out_len
        out_len = lit_len
    if flags & FLAG_CAT:
        if len(data) - pos < out_len:
            raise ValueError(
                f"arith CAT stream truncated: {len(data) - pos} payload "
                f"bytes for declared size {out_len}"
            )
        payload = bytes(data[pos : pos + out_len])
    elif flags & FLAG_EXT:
        payload = bz2.decompress(data[pos:])
        if len(payload) != out_len:
            raise ValueError(
                f"arith EXT (bzip2) stream decoded {len(payload)} bytes, "
                f"expected {out_len}"
            )
    elif out_len == 0:
        payload = b""
    else:
        payload = _decode_stream(data, pos, flags & FLAG_ORDER1, out_len)
    if rle_meta is not None:
        payload = _rle_decode(payload, rle_meta, rle_out_len)
    if pack_syms is not None:
        return _unpack_values(payload, pack_syms, rsize)
    return payload
