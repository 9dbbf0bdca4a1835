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
shows up as a vector diff, not a silent symmetric round-trip.  Since r8
(ADVICE r7) the encoder is additionally pinned end-to-end: a fully
hand-derived order-1 whole-stream vector, a white-box proof that the
adjacent swap compares PRE-rescale frequencies, and two long vectors
crossing the MAX_TOTAL halving checked against an independent clean-room
transcription of the spec pseudocode plus SHA-256 digests.  RESIDUAL
RISK, accepted and documented: no htscodecs/samtools binary exists in
this environment, so no foreign-generated method-6 fixture can be
committed — if the spec reading here diverges from htscodecs on a
constant (STEP, MAX_TOTAL, swap-vs-rescale order), decoding a FOREIGN
stream would produce out_len silently wrong bytes.  The transcription +
hand-derived vectors bound that risk to "both derivations misread the
spec the same way"; close it by committing an htscodecs-produced stream
the moment one can be generated.
"""

from __future__ import annotations

import bz2
import struct

from .rans_nx16 import (
    FLAG_ORDER1,
    _container_decode,
    _container_encode,
    _stripe_container,
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


def compress(data: bytes, order: int = 0, ext: bool = False) -> bytes:
    """Adaptive-arithmetic block stream (method 6) through the shared
    transform container.  RLE metadata stays RAW (``nest_rle_meta=False``)
    — a nested form would have to be arith-order-0-coded, and raw is
    always spec-legal.

    ``ext=True`` lets the encoder EMIT the spec's EXTERNAL (bzip2)
    entropy slot when the bz2 stream is strictly smaller than the
    arithmetic one — the same honest size test the CAT fallback uses
    (encoder freedom; any conformant decoder accepts either).  The slot
    composes with PACK/RLE exactly as on the decode side: EXT replaces
    only the entropy stage."""
    if order not in (0, 1):
        raise ValueError(f"arith order must be 0 or 1, got {order}")

    def entropy_body(p: bytes) -> tuple[int, bytes]:
        bits, body = FLAG_ORDER1 if order else 0, _encode_stream(p, order)
        if ext:
            bz = bz2.compress(p, 9)
            if len(bz) < len(body):
                return FLAG_EXT, bz
        return bits, body

    return _container_encode(
        data,
        entropy_body=entropy_body,
        nest_rle_meta=False,
    )


def compress_striped(data: bytes, n_planes: int = 4, order: int = 0) -> bytes:
    return _stripe_container(data, n_planes, lambda p: compress(p, order))


def decompress(data: bytes, expected_len: int | None = None) -> bytes:
    """Decode any supported method-6 stream; ``expected_len`` serves
    top-level NOSZ blocks (size known from the CRAM block header).
    Corrupt input raises ValueError, never a bare IndexError."""
    try:
        return _decompress(data, expected_len)
    except (IndexError, struct.error) as exc:
        # struct reaches in through the shared container's nested-RLE-meta
        # path (bare order-0 state unpack)
        raise ValueError(
            f"arith stream truncated or corrupt ({type(exc).__name__}: "
            f"{exc})"
        ) from exc


def _arith_entropy(data: bytes, pos: int, flags: int, out_len: int) -> bytes:
    if flags & FLAG_EXT:
        try:
            payload = bz2.decompress(data[pos:])
        except OSError as exc:
            # bz2 raises OSError on corrupt input — keep the module's
            # ValueError fail-loud contract (r7 review finding)
            raise ValueError(
                f"arith EXT (bzip2) payload corrupt: {exc}"
            ) from exc
        if len(payload) != out_len:
            raise ValueError(
                f"arith EXT (bzip2) stream decoded {len(payload)} bytes, "
                f"expected {out_len}"
            )
        return payload
    return _decode_stream(data, pos, flags & FLAG_ORDER1, out_len)


def _meta_o0_bare(blob: bytes, out_len: int) -> bytes:
    """Nested (compressed) RLE metadata in a method-6 stream is coded
    with the ARITHMETIC order-0 form, not rANS (second r7 review — the
    repo's own writer keeps metadata raw, so only foreign files exercise
    this path)."""
    return _decode_stream(blob, 0, 0, out_len)


def _decompress(
    data: bytes, expected_len: int | None, in_stripe: bool = False
) -> bytes:
    return _container_decode(
        data,
        expected_len,
        label="arith",
        entropy=_arith_entropy,
        recurse=_decompress,
        meta_o0=_meta_o0_bare,
        in_stripe=in_stripe,
    )
