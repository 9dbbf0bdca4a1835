"""CRAM 3.1 name-tokenizer codec ("tok3", block method 8) — read and
write paths, from the public CRAM 3.1 codecs specification
(samtools/hts-specs CRAMcodecs: "Name tokenisation codec").

The reference engine never reads 3.1 at all (it delegates CRAM to
htsjdk's 3.0-era codecs — reference anchor ``cram/CramSource.java:
153-167``); this module closes the read-path gap for the codec samtools'
default 3.1 profile uses on read names.

Model: each name splits into tokens (alphanumeric runs, digit runs with
or without leading zeros, single characters); per TOKEN POSITION and
TOKEN TYPE there is one byte stream, and every stream is independently
entropy-coded (rANS Nx16, or the adaptive arithmetic coder when the
header's ``use_arith`` byte is set — ``arith.py``).  Names
compress well because consecutive names usually differ in one numeric
token — encoded as a small delta against the name ``dist`` back.

Serialized layout (spec section "Name tokenisation"):

- 9-byte header: uint32-LE uncompressed length, uint32-LE name count,
  1 byte ``use_arith`` (0 = rANS Nx16 per stream, 1 = range coder);
- a sequence of token-stream records: 1 descriptor byte
  ``type | 0x40 (first stream of the next token position) | 0x80 (this
  stream duplicates another)``; a duplicate is followed by two bytes
  (source position, source type); otherwise a uint7 compressed length
  and the self-describing entropy stream;
- token types: 0 TYPE, 1 ALPHA (nul-terminated string), 2 CHAR,
  3 DZLEN (zero-pad width), 4 DIGITS0 (uint32-LE, zero-padded),
  5 DUP (whole-name copy, uint32-LE distance), 6 DIFF (back-reference
  distance for the following tokens), 7 DIGITS (uint32-LE),
  8 DDELTA (uint8 delta vs the referenced name's numeric token),
  9 DDELTA0 (same, preserving the referenced token's zero-pad width),
  10 MATCH (copy the referenced name's token), 11 NOP, 12 END.

Per name: position 0's TYPE stream yields DUP or DIFF plus a distance;
positions 1.. replay tokens against name ``i - dist`` until END.  Names
are nul-separated in the uncompressed byte stream (the CRAM read-name
block's stop byte), and the uncompressed length in the header is the
authoritative output size — a mismatch fails loud.

Interop notes for review: the descriptor bit assignment (0x40 = new
position, 0x80 = duplicate followed by (pos, type)) and the uint32-LE
value encoding follow the spec document; the byte-exact known-answer
vectors in ``tests/test_tok3.py`` pin every field so a disagreement
with htscodecs/htsjdk shows up as a vector diff, not a silent
symmetric-codec round-trip.
"""

from __future__ import annotations

import struct

from .rans_nx16 import _read_uint7, _write_uint7
from .rans_nx16 import compress as nx16_compress
from .rans_nx16 import decompress as nx16_decompress

N_TYPE = 0
N_ALPHA = 1
N_CHAR = 2
N_DZLEN = 3
N_DIGITS0 = 4
N_DUP = 5
N_DIFF = 6
N_DIGITS = 7
N_DDELTA = 8
N_DDELTA0 = 9
N_MATCH = 10
N_NOP = 11
N_END = 12

_MAX_TOKEN_DIGITS = 9  # keeps every numeric token below 2^32


class _Reader:
    __slots__ = ("data", "pos", "key")

    def __init__(self, data: bytes, key: tuple[int, int]):
        self.data = data
        self.pos = 0
        self.key = key

    def _need(self, n: int) -> None:
        if self.pos + n > len(self.data):
            raise ValueError(
                f"tok3 stream (position {self.key[0]}, type {self.key[1]}) "
                "exhausted — corrupt name-tokenizer block"
            )

    def byte(self) -> int:
        self._need(1)
        b = self.data[self.pos]
        self.pos += 1
        return b

    def u32(self) -> int:
        self._need(4)
        (v,) = struct.unpack_from("<I", self.data, self.pos)
        self.pos += 4
        return v

    def cstr(self) -> bytes:
        end = self.data.find(0, self.pos)
        if end < 0:
            raise ValueError(
                f"tok3 ALPHA stream (position {self.key[0]}) missing nul "
                "terminator — corrupt name-tokenizer block"
            )
        s = self.data[self.pos : end]
        self.pos = end + 1
        return s


def decode(data: bytes, raw_size: int) -> bytes:
    """Decode a tok3 block back to its nul-separated name bytes.
    ``raw_size`` is the CRAM block header's raw size — cross-checked
    against the codec's own header.  Corrupt or truncated input raises
    ValueError, never a bare IndexError from deep in the stream walk
    (the same wrapper contract as rans_nx16/arith — r7 review
    finding)."""
    try:
        return _decode(data, raw_size)
    except (IndexError, struct.error) as exc:
        raise ValueError(
            f"tok3 block truncated or corrupt ({type(exc).__name__}: {exc})"
        ) from exc


def _decode(data: bytes, raw_size: int) -> bytes:
    if len(data) < 9:
        raise ValueError("tok3 block shorter than its 9-byte header")
    ulen, nnames = struct.unpack_from("<II", data, 0)
    use_arith = data[8]
    if ulen != raw_size:
        raise ValueError(
            f"tok3 header size {ulen} disagrees with the CRAM block raw "
            f"size {raw_size} — corrupt block"
        )
    if use_arith not in (0, 1):
        raise ValueError(f"tok3 use_arith byte must be 0 or 1, got {use_arith}")
    if use_arith:
        from .arith import decompress as stream_decompress
    else:
        stream_decompress = nx16_decompress

    streams: dict[tuple[int, int], bytes] = {}
    pos = 9
    tnum = -1
    while pos < len(data):
        ttype = data[pos]
        pos += 1
        typ = ttype & 0x3F
        if ttype & 0x40:
            tnum += 1
        if tnum < 0:
            raise ValueError(
                "tok3 first stream descriptor lacks the new-position bit "
                "— corrupt block"
            )
        if typ > N_END:
            raise ValueError(f"tok3 token type {typ} out of range — corrupt block")
        if ttype & 0x80:
            if pos + 2 > len(data):
                raise ValueError("tok3 duplicate descriptor truncated")
            src = (data[pos], data[pos + 1])
            pos += 2
            if src not in streams:
                raise ValueError(
                    f"tok3 duplicate stream references missing source "
                    f"(position {src[0]}, type {src[1]}) — corrupt block"
                )
            streams[(tnum, typ)] = streams[src]
            continue
        clen, pos = _read_uint7(data, pos)
        if pos + clen > len(data):
            raise ValueError("tok3 compressed stream truncated")
        streams[(tnum, typ)] = stream_decompress(data[pos : pos + clen])
        pos += clen

    readers = {k: _Reader(v, k) for k, v in streams.items()}

    def reader(t: int, typ: int) -> _Reader:
        r = readers.get((t, typ))
        if r is None:
            raise ValueError(
                f"tok3 name references missing stream (position {t}, type "
                f"{typ}) — corrupt block"
            )
        return r

    # per-name, per-position (string, numeric value or None) for back-refs
    toks: list[list[tuple[bytes, int | None]]] = []
    names: list[bytes] = []
    for i in range(nnames):
        t0 = reader(0, N_TYPE).byte()
        if t0 not in (N_DUP, N_DIFF):
            raise ValueError(
                f"tok3 name {i} starts with token type {t0}, expected "
                "DUP/DIFF — corrupt block"
            )
        dist = reader(0, t0).u32()
        if dist > i or (t0 == N_DUP and dist == 0):
            raise ValueError(
                f"tok3 name {i} references {dist} names back — corrupt block"
            )
        if t0 == N_DUP:
            names.append(names[i - dist])
            toks.append(toks[i - dist])
            continue
        ref = toks[i - dist] if dist > 0 else None
        mine: list[tuple[bytes, int | None]] = [(b"", None)]  # position 0
        parts: list[bytes] = []
        t = 0
        while True:
            t += 1
            typ = reader(t, N_TYPE).byte()
            if typ == N_END:
                break
            if typ == N_NOP:
                mine.append((b"", None))
                continue
            rtok = ref[t] if ref is not None and t < len(ref) else None
            if typ == N_ALPHA:
                s, v = reader(t, N_ALPHA).cstr(), None
            elif typ == N_CHAR:
                s, v = bytes([reader(t, N_CHAR).byte()]), None
            elif typ == N_DIGITS:
                v = reader(t, N_DIGITS).u32()
                s = b"%d" % v
            elif typ == N_DIGITS0:
                v = reader(t, N_DIGITS0).u32()
                width = reader(t, N_DZLEN).byte()
                s = b"%0*d" % (width, v)
            elif typ == N_DDELTA:
                if rtok is None or rtok[1] is None:
                    raise ValueError(
                        f"tok3 DDELTA at name {i} position {t} has no "
                        "numeric token to reference — corrupt block"
                    )
                v = rtok[1] + reader(t, N_DDELTA).byte()
                s = b"%d" % v
            elif typ == N_DDELTA0:
                if rtok is None or rtok[1] is None:
                    raise ValueError(
                        f"tok3 DDELTA0 at name {i} position {t} has no "
                        "numeric token to reference — corrupt block"
                    )
                v = rtok[1] + reader(t, N_DDELTA0).byte()
                s = b"%0*d" % (len(rtok[0]), v)
            elif typ == N_MATCH:
                if rtok is None:
                    raise ValueError(
                        f"tok3 MATCH at name {i} position {t} has no "
                        "token to reference — corrupt block"
                    )
                s, v = rtok
            else:
                raise ValueError(
                    f"tok3 token type {typ} invalid at position {t} — "
                    "corrupt block"
                )
            parts.append(s)
            mine.append((s, v))
        names.append(b"".join(parts))
        toks.append(mine)

    out = b"\x00".join(names) + b"\x00" if names else b""
    if len(out) != ulen:
        raise ValueError(
            f"tok3 decoded {len(out)} bytes, header declares {ulen} — "
            "the name block is not nul-separated as this reader assumes, "
            "or the block is corrupt"
        )
    return out


# --------------------------------------------------------------- encoder


def _tokenize(name: bytes) -> list[tuple[int, bytes, int | None]]:
    """(type, text, numeric value) triples: digit runs become DIGITS /
    DIGITS0 (chunked so every value fits uint32), everything else is an
    ALPHA run.  Encoder freedom under the spec — any split the type
    streams can replay is legal."""
    out: list[tuple[int, bytes, int | None]] = []
    i, n = 0, len(name)
    while i < n:
        c = name[i]
        if 0x30 <= c <= 0x39:
            j = i + 1
            while j < n and 0x30 <= name[j] <= 0x39:
                j += 1
            for k in range(i, j, _MAX_TOKEN_DIGITS):
                chunk = name[k : min(k + _MAX_TOKEN_DIGITS, j)]
                typ = N_DIGITS0 if chunk[0] == 0x30 and len(chunk) > 1 else N_DIGITS
                out.append((typ, chunk, int(chunk)))
            i = j
        else:
            j = i + 1
            while j < n and not (0x30 <= name[j] <= 0x39):
                j += 1
            out.append((N_ALPHA, name[i:j], None))
            i = j
    return out


def encode(raw: bytes, use_arith: bool = False) -> bytes:
    """Encode nul-separated (and nul-terminated) names.  Deliberately
    simple and spec-legal rather than ratio-optimal: every name encodes
    against its immediate predecessor (dist 1) with MATCH / DDELTA /
    DDELTA0 / DUP where they apply, literals otherwise.  ``use_arith``
    selects the adaptive-arithmetic per-stream codec (method-6 machinery)
    instead of rANS Nx16."""
    if raw and not raw.endswith(b"\x00"):
        raise ValueError(
            "tok3 encoder requires nul-terminated names (the CRAM "
            "read-name block's stop byte)"
        )
    names = raw.split(b"\x00")[:-1] if raw else []
    streams: dict[tuple[int, int], bytearray] = {}

    def put(t: int, typ: int) -> bytearray:
        return streams.setdefault((t, typ), bytearray())

    prev: list[tuple[int, bytes, int | None]] | None = None
    for i, name in enumerate(names):
        toks = _tokenize(name)
        if prev is not None and toks == prev:
            put(0, N_TYPE).append(N_DUP)
            put(0, N_DUP).extend(struct.pack("<I", 1))
            continue
        put(0, N_TYPE).append(N_DIFF)
        put(0, N_DIFF).extend(struct.pack("<I", 0 if prev is None else 1))
        for t, (typ, text, val) in enumerate(toks, start=1):
            rtok = prev[t - 1] if prev is not None and t - 1 < len(prev) else None
            if rtok is not None and rtok[1:] == (text, val) and rtok[0] == typ:
                put(t, N_TYPE).append(N_MATCH)
                continue
            if (
                typ in (N_DIGITS, N_DIGITS0)
                and rtok is not None
                and rtok[0] in (N_DIGITS, N_DIGITS0)
                and rtok[2] is not None
                and val is not None
                and 0 <= val - rtok[2] <= 255
                and (
                    (typ == N_DIGITS and rtok[0] == N_DIGITS)
                    or (
                        typ == N_DIGITS0
                        and rtok[0] == N_DIGITS0
                        and len(text) == len(rtok[1])
                    )
                )
            ):
                dtyp = N_DDELTA if typ == N_DIGITS else N_DDELTA0
                put(t, N_TYPE).append(dtyp)
                put(t, dtyp).append(val - rtok[2])
                continue
            put(t, N_TYPE).append(typ)
            if typ == N_ALPHA:
                put(t, N_ALPHA).extend(text + b"\x00")
            elif typ == N_DIGITS:
                put(t, N_DIGITS).extend(struct.pack("<I", val))
            else:  # N_DIGITS0
                put(t, N_DIGITS0).extend(struct.pack("<I", val))
                put(t, N_DZLEN).append(len(text))
        put(len(toks) + 1, N_TYPE).append(N_END)
        prev = toks

    if use_arith:
        from .arith import compress as stream_compress
    else:
        stream_compress = nx16_compress
    out = bytearray(struct.pack("<II", len(raw), len(names)))
    out.append(1 if use_arith else 0)
    max_t = max((t for t, _ in streams), default=-1)
    seen: dict[bytes, tuple[int, int]] = {}
    for t in range(max_t + 1):
        first = True
        for typ in range(N_END + 1):
            body = streams.get((t, typ))
            if body is None:
                continue
            key = bytes(body)
            src = seen.get(key)
            if src is not None:
                # byte-identical stream already emitted: the 0x80 dup
                # descriptor stores (source position, source type) in two
                # bytes — frequent for TYPE streams of similar positions
                # (e.g. every position whose type pattern is all-MATCH)
                out.append(typ | 0x80 | (0x40 if first else 0))
                out.extend(src)
            else:
                out.append(typ | (0x40 if first else 0))
                comp = stream_compress(key)
                _write_uint7(out, len(comp))
                out.extend(comp)
                if t <= 255:  # the dup reference fields are single bytes
                    seen[key] = (t, typ)
            first = False
    return bytes(out)
