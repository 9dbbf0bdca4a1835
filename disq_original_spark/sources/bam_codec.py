"""BAM binary codec: record parse/encode, boundary guesser, SBI index.

Pure-Python, spec-level (SAM/BAM spec §4.2; alignment record layout also
documented at reference `bam/BamRecordGuesser.java:80-96`).  No htsjdk, no
pysam — everything from the published spec.

The guesser re-implements the reference's *behavior* (validate N consecutive
records by field plausibility — `bam/BamRecordGuesser.java:14-231`): it is
what makes BAM splittable without an index.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass
from pathlib import Path
from typing import BinaryIO, Iterator

CIGAR_OPS = "MIDNSHP=X"
SEQ_CODES = "=ACMGRSVTWYHKDBN"
FIXED_RECORD_BYTES = 32  # bytes after block_size before variable sections
READS_TO_CHECK = 10  # consecutive plausible records to confirm a boundary
MAX_READ_SIZE = 10_000_000  # search bound per partition (uncompressed bytes)
MAX_RECORD_BYTES = 8_000_000

# vectorized decode tables: a nibble is a hex digit of .hex(), so seq decoding
# is one C-level translate; qual is one translate (+33 phred-to-printable)
_HEX2BASE = str.maketrans("0123456789abcdef", SEQ_CODES)
_QUAL33 = bytes((i + 33) & 0xFF for i in range(256))
_QUAL_MINUS33 = bytes((i - 33) & 0xFF for i in range(256))
# base byte -> its 4-bit SEQ code as a lowercase hex CHARACTER (unknown
# bases -> 'f' == 15, the historical fallback); feeds bytes.fromhex pair
# packing in encode_record
_BASE2HEXCODE = bytes.maketrans(
    SEQ_CODES.encode("ascii"), "0123456789abcdef".encode("ascii")
)
_BASE2HEXCODE = bytes(
    _BASE2HEXCODE[i] if chr(i) in SEQ_CODES else ord("f") for i in range(256)
)
# prebound Struct objects: parse_record runs once per alignment, and the
# per-call format-string cache lookup is measurable at that frequency
_S_I32 = struct.Struct("<i")
_S_FIXED = struct.Struct("<iiBBHHHiiii")


# ------------------------------------------------------------------ record parse


def parse_record(
    buf: bytes | memoryview,
    off: int,
    refs: list[str],
    fields: frozenset[str] | None = None,
) -> tuple[dict, int] | None:
    """Parse one alignment record at ``off``; returns (row, next_off) or
    None if the buffer ends before the record does."""
    if off + 4 > len(buf):
        return None
    (block_size,) = _S_I32.unpack_from(buf, off)
    end = off + 4 + block_size
    if block_size < FIXED_RECORD_BYTES or end > len(buf):
        return None
    (
        ref_id,
        pos,
        l_read_name,
        mapq,
        _bin,
        n_cigar,
        flag,
        l_seq,
        next_ref_id,
        next_pos,
        tlen,
    ) = _S_FIXED.unpack_from(buf, off + 4)
    # Column pruning (``fields``): the record is always WALKED in full
    # (lengths come from the fixed header, so offsets advance by pure
    # arithmetic) but the materializations — qname decode, CIGAR unpack +
    # string join, seq/qual byte copies and translations, the aux-tag
    # dictionary walk — are skipped for columns the caller did not
    # request.  ``fields=None`` keeps the full-schema behavior.
    want = fields  # None -> everything

    def _want(name: str) -> bool:
        return want is None or name in want

    p = off + 4 + FIXED_RECORD_BYTES
    qname = (
        bytes(buf[p : p + l_read_name - 1]).decode("ascii", "replace")
        if _want("qname")
        else None
    )
    p += l_read_name
    if _want("cigar"):
        cigar_ops = struct.unpack_from(f"<{n_cigar}I", buf, p)
        cigar = (
            "".join(f"{op >> 4}{CIGAR_OPS[op & 0xF]}" for op in cigar_ops)
            if n_cigar
            else "*"
        )
    else:
        cigar = None
    p += 4 * n_cigar
    n_seq_bytes = (l_seq + 1) // 2
    seq = qual = None
    if l_seq:
        if _want("seq"):
            seq = bytes(buf[p : p + n_seq_bytes]).hex().translate(_HEX2BASE)[:l_seq]
        if _want("qual"):
            qual_b = bytes(buf[p + n_seq_bytes : p + n_seq_bytes + l_seq])
            qual = (
                "*"
                if qual_b and qual_b[0] == 0xFF
                else qual_b.translate(_QUAL33).decode("latin-1")
            )
    elif _want("seq") or _want("qual"):
        seq = "*"
        qual = "*"
    p += n_seq_bytes + l_seq

    attrs = _parse_aux(buf, p, end) if _want("attributes") else None

    rname = refs[ref_id] if 0 <= ref_id < len(refs) else None
    if next_ref_id == ref_id and next_ref_id >= 0:
        rnext = "="
    elif 0 <= next_ref_id < len(refs):
        rnext = refs[next_ref_id]
    else:
        rnext = None
    row = {
        "qname": qname,
        "flag": flag,
        "rname": rname,
        "pos": pos + 1,  # BAM is 0-based; reads schema is SAM 1-based
        "mapq": mapq,
        "cigar": cigar,
        "rnext": rnext,
        "pnext": next_pos + 1,
        "tlen": tlen,
        "seq": seq,
        "qual": qual,
        "attributes": attrs,
    }
    if want is not None:
        row = {k: row[k] for k in row if k in want}
    return row, end


# Aux-parse lookup tables, hoisted: _parse_aux runs once per record and the
# per-tag dict-literal construction + bytes-copy tag decode dominated the
# whole decode profile (~43% of record time before hoisting).
_AUX_INT_FMT = {
    "c": ("<b", 1), "C": ("<B", 1), "s": ("<h", 2),
    "S": ("<H", 2), "i": ("<i", 4), "I": ("<I", 4),
}
_AUX_B_FMT = dict(_AUX_INT_FMT, f=("<f", 4))
_AUX_TYPE = [chr(i) for i in range(256)]
# tag names repeat across records (a file carries a handful of distinct
# tags); memoize the 2-byte name -> str decode keyed on the 16-bit value
_TAG_STRS: dict[int, str] = {}
# One-byte tag payloads admit complete 256-entry value->string LUTs, and
# the sized int types each get a prebound Struct: dispatching on the RAW
# type byte (never building a per-tag format string or tuple-unpacking a
# dict entry) is ~13% of whole-record decode on tag-heavy files.
_AUX_C_STR = [f"i:{v}" for v in range(256)]
_AUX_c_STR = [f"i:{v - 256 if v >= 128 else v}" for v in range(256)]
_AUX_A_STR = ["A:" + chr(i) for i in range(256)]
_S_I16 = struct.Struct("<h")
_S_U16 = struct.Struct("<H")
_S_U32 = struct.Struct("<I")
_S_F32 = struct.Struct("<f")


def _parse_aux(buf: bytes | memoryview, p: int, end: int) -> dict[str, str]:
    out: dict[str, str] = {}
    tag_strs = _TAG_STRS
    while p + 3 <= end:
        tk = (buf[p] << 8) | buf[p + 1]
        tag = tag_strs.get(tk)
        if tag is None:
            tag = tag_strs[tk] = bytes(buf[p : p + 2]).decode("ascii", "replace")
        t = buf[p + 2]
        p += 3
        if t == 0x43:  # 'C'
            out[tag] = _AUX_C_STR[buf[p]]
            p += 1
        elif t == 0x63:  # 'c'
            out[tag] = _AUX_c_STR[buf[p]]
            p += 1
        elif t == 0x69:  # 'i'
            out[tag] = f"i:{_S_I32.unpack_from(buf, p)[0]}"
            p += 4
        elif t == 0x73:  # 's'
            out[tag] = f"i:{_S_I16.unpack_from(buf, p)[0]}"
            p += 2
        elif t == 0x53:  # 'S'
            out[tag] = f"i:{_S_U16.unpack_from(buf, p)[0]}"
            p += 2
        elif t == 0x49:  # 'I'
            out[tag] = f"i:{_S_U32.unpack_from(buf, p)[0]}"
            p += 4
        elif t == 0x41:  # 'A'
            out[tag] = _AUX_A_STR[buf[p]]
            p += 1
        elif t == 0x66:  # 'f'
            v = _S_F32.unpack_from(buf, p)[0]
            out[tag] = f"f:{v:g}"
            p += 4
        elif t in (0x5A, 0x48):  # 'Z' / 'H'
            # bytes(...) copy: memoryview has no .index, and the silent
            # q=end fallback would swallow every later tag
            seg = bytes(buf[p:end])
            q = seg.find(0)
            if q < 0:
                q = len(seg)
            out[tag] = f"{_AUX_TYPE[t]}:{seg[:q].decode('ascii', 'replace')}"
            p = p + q + 1
        elif t == 0x42:  # 'B'
            sub = _AUX_TYPE[buf[p]]
            (count,) = _S_U32.unpack_from(buf, p + 1)
            p += 5
            fmt, size = _AUX_B_FMT[sub]
            vals = struct.unpack_from(f"<{count}{fmt[1]}", buf, p)
            p += count * size
            body = ",".join(f"{v:g}" if sub == "f" else str(v) for v in vals)
            out[tag] = f"B:{sub},{body}"
        else:  # unknown type: stop parsing aux to stay safe
            break
    return out


# ------------------------------------------------------------------ record encode


def reg2bin(beg: int, end: int) -> int:
    """BAM bin computation (SAM spec §5.3), 0-based half-open [beg, end)."""
    end -= 1
    if beg >> 14 == end >> 14:
        return ((1 << 15) - 1) // 7 + (beg >> 14)
    if beg >> 17 == end >> 17:
        return ((1 << 12) - 1) // 7 + (beg >> 17)
    if beg >> 20 == end >> 20:
        return ((1 << 9) - 1) // 7 + (beg >> 20)
    if beg >> 23 == end >> 23:
        return ((1 << 6) - 1) // 7 + (beg >> 23)
    if beg >> 26 == end >> 26:
        return ((1 << 3) - 1) // 7 + (beg >> 26)
    return 0


def _cigar_tuples(cigar: str) -> list[tuple[int, int]]:
    if not cigar or cigar == "*":
        return []
    out = []
    n = 0
    for ch in cigar:
        if ch.isdigit():
            n = n * 10 + int(ch)
        else:
            out.append((n, CIGAR_OPS.index(ch)))
            n = 0
    return out


def cigar_ref_length(cigar: str) -> int:
    return sum(n for n, op in _cigar_tuples(cigar) if CIGAR_OPS[op] in "MDN=X")


def encode_record(row: dict, ref_index: dict[str, int]) -> bytes:
    """Encode one reads-schema row as a BAM alignment record."""
    qname = (row["qname"] or "").encode("ascii")
    cigar = _cigar_tuples(row["cigar"] or "*")
    seq = row["seq"] or "*"
    qual = row["qual"] or "*"
    l_seq = 0 if seq == "*" else len(seq)
    pos0 = (row["pos"] or 0) - 1
    ref_id = ref_index.get(row["rname"], -1) if row["rname"] else -1
    rnext = row["rnext"]
    if rnext == "=":
        next_ref_id = ref_id
    elif rnext:
        next_ref_id = ref_index.get(rnext, -1)
    else:
        next_ref_id = -1
    ref_len = max(1, cigar_ref_length(row["cigar"] or "*"))
    bin_ = reg2bin(max(0, pos0), max(0, pos0) + ref_len) if pos0 >= 0 else 4680

    body = bytearray()
    body += struct.pack(
        "<iiBBHHHiiii",
        ref_id,
        pos0,
        len(qname) + 1,
        row["mapq"] or 0,
        bin_,
        len(cigar),
        row["flag"] or 0,
        l_seq,
        next_ref_id,
        (row["pnext"] or 0) - 1,
        row["tlen"] or 0,
    )
    body += qname + b"\x00"
    if cigar:
        body += struct.pack(f"<{len(cigar)}I", *((n << 4) | op for n, op in cigar))
    if l_seq:
        # nibble packing via the hex trick (the encoder twin of the
        # decoder's .hex().translate): translate each base byte to its
        # 4-bit code AS A HEX CHARACTER, then bytes.fromhex packs pairs
        # (hi<<4)|lo in C — the per-base str.index loop this replaces was
        # the whole-record encode hotspot (~2.6x on seq-heavy records)
        hexcodes = seq.encode("ascii", "replace").translate(_BASE2HEXCODE)
        if l_seq & 1:
            hexcodes += b"0"  # odd length: low nibble of last byte is 0
        body += bytes.fromhex(hexcodes.decode("ascii"))
        if qual == "*":
            body += b"\xff" * l_seq
        else:
            try:
                body += qual.encode("latin-1").translate(_QUAL_MINUS33)
            except UnicodeEncodeError as e:
                # qual chars above U+00FF are invalid SAM; name the record
                # instead of leaking a raw UnicodeEncodeError (ADVICE r9)
                raise ValueError(
                    f"record {row.get('qname')!r}: qual contains non-phred "
                    f"character {qual[e.start]!r} (codepoint > 0xFF)"
                ) from None
    for tag, tv in (row.get("attributes") or {}).items():
        typ, _, val = tv.partition(":")
        t = tag.encode("ascii")
        if typ == "A":
            body += t + b"A" + val[:1].encode()
        elif typ == "i":
            v = int(val)
            if v > 0x7FFFFFFF:
                # parse_record normalizes unsigned 'I' tags to 'i:'; values
                # past int32 must round-trip back as unsigned
                body += t + b"I" + struct.pack("<I", v)
            else:
                body += t + b"i" + struct.pack("<i", v)
        elif typ == "f":
            body += t + b"f" + struct.pack("<f", float(val))
        elif typ in ("Z", "H"):
            body += t + typ.encode() + val.encode("ascii") + b"\x00"
        elif typ == "B":
            sub, _, rest = val.partition(",")
            vals = rest.split(",") if rest else []
            fmt = {"c": "<b", "C": "<B", "s": "<h", "S": "<H", "i": "<i", "I": "<I", "f": "<f"}[sub]
            body += t + b"B" + sub.encode() + struct.pack("<I", len(vals))
            for v in vals:
                body += struct.pack(fmt, float(v) if sub == "f" else int(v))
    return struct.pack("<i", len(body)) + bytes(body)


def encode_bam_header(header_text: str, refs: list[tuple[str, int]]) -> bytes:
    out = bytearray(b"BAM\x01")
    text = header_text.encode("utf-8")
    out += struct.pack("<i", len(text)) + text
    out += struct.pack("<i", len(refs))
    for name, length in refs:
        nb = name.encode("utf-8") + b"\x00"
        out += struct.pack("<i", len(nb)) + nb + struct.pack("<i", length)
    return bytes(out)


# ------------------------------------------------------------------ guesser


class BamRecordGuesser:
    """Field-plausibility validation of candidate record boundaries
    (behavioral port of the reference's checks, `BamRecordGuesser.java:79-194`)."""

    def __init__(self, n_ref: int):
        self.n_ref = n_ref

    def _check_one(self, buf: bytes | memoryview, off: int) -> int | None:
        """Return next record offset if the record at ``off`` is plausible,
        -1 if plausible-but-truncated, None if implausible."""
        n = len(buf)
        if off + 4 > n:
            return -1
        (block_size,) = struct.unpack_from("<i", buf, off)
        if block_size < FIXED_RECORD_BYTES or block_size > MAX_RECORD_BYTES:
            return None
        if off + 4 + FIXED_RECORD_BYTES > n:
            return -1
        (
            ref_id,
            pos,
            l_read_name,
            _mapq,
            _bin,
            n_cigar,
            _flag,
            l_seq,
            next_ref_id,
            next_pos,
            _tlen,
        ) = struct.unpack_from("<iiBBHHHiiii", buf, off + 4)
        if not (-1 <= ref_id < self.n_ref) or not (-1 <= next_ref_id < self.n_ref):
            return None
        if not (-1 <= pos < (1 << 31) - 1) or not (-1 <= next_pos < (1 << 31) - 1):
            return None
        if l_read_name < 2:
            return None
        if l_seq < 0:
            return None
        # length arithmetic must fit in the record
        min_len = FIXED_RECORD_BYTES + l_read_name + 4 * n_cigar + (l_seq + 1) // 2 + l_seq
        if min_len > block_size:
            return None
        # read name: printable [!-~], NUL-terminated
        name_end = off + 4 + FIXED_RECORD_BYTES + l_read_name
        if name_end > n:
            return -1
        name = buf[off + 4 + FIXED_RECORD_BYTES : name_end]
        if name[-1] != 0:
            return None
        for b in name[:-1]:
            if b < 0x21 or b > 0x7E:
                return None
        # cigar op codes valid
        cigar_end = name_end + 4 * n_cigar
        if cigar_end > n:
            return -1
        for i in range(n_cigar):
            (op,) = struct.unpack_from("<I", buf, name_end + 4 * i)
            if (op & 0xF) > 8:
                return None
        return off + 4 + block_size

    def is_record_start(
        self,
        buf: bytes | memoryview,
        off: int,
        reads_to_check: int = READS_TO_CHECK,
        at_eof: bool = False,
    ) -> bool:
        """True if ``reads_to_check`` consecutive plausible records begin at
        ``off``.  When the buffer ends mid-record: with ``at_eof`` (the buffer
        extends to end-of-file) that is implausible — real records tile the
        file exactly; otherwise the window simply ran out and earlier
        successes count (the caller provides a generous window, reference
        MAX_READ_SIZE)."""
        checked = 0
        while checked < reads_to_check:
            nxt = self._check_one(buf, off)
            if nxt is None:
                return False
            if nxt == -1 or nxt > len(buf):
                if at_eof:
                    return False
                return checked > 0 or len(buf) - off < MAX_RECORD_BYTES
            off = nxt
            checked += 1
            if off == len(buf):
                return True
        return True


# ------------------------------------------------------------------ SBI index

SBI_MAGIC = b"SBI\x01"


@dataclass(frozen=True)
class SbiIndex:
    """SBI splitting index (format per hts-specs / reference
    `htsjdk/samtools/SBIIndex.java:106-275`)."""

    file_length: int
    md5: bytes
    uuid: bytes
    total_records: int
    granularity: int
    offsets: tuple[int, ...]  # virtual offsets, last = end-of-records sentinel

    @classmethod
    def load(cls, path: str | Path) -> "SbiIndex":
        from .fsio import fs_read_bytes

        data = fs_read_bytes(str(path))
        if data[:4] != SBI_MAGIC:
            raise ValueError(f"{path}: bad SBI magic {data[:4]!r}")
        file_length, = struct.unpack_from("<q", data, 4)
        md5 = data[12:28]
        uuid_ = data[28:44]
        total_records, granularity, n = struct.unpack_from("<qqq", data, 44)
        offsets = struct.unpack_from(f"<{n}q", data, 68)
        return cls(file_length, md5, uuid_, total_records, granularity, tuple(offsets))

    def dump(self) -> bytes:
        out = bytearray(SBI_MAGIC)
        out += struct.pack("<q", self.file_length)
        out += self.md5.ljust(16, b"\x00")[:16]
        out += self.uuid.ljust(16, b"\x00")[:16]
        out += struct.pack("<qqq", self.total_records, self.granularity, len(self.offsets))
        out += struct.pack(f"<{len(self.offsets)}q", *self.offsets)
        return bytes(out)

    def chunk_for_split(self, split_start: int, split_end: int) -> tuple[int, int] | None:
        """Map a compressed byte range to a (start, end) virtual-offset chunk
        of records beginning in it — the *intended* semantics of the
        reference's SBI fast path (its snapshot drops the result,
        `bam/BamSource.java:74-92`; we implement the fix)."""
        lo = _first_voffset_at_or_after(self.offsets, split_start)
        hi = _first_voffset_at_or_after(self.offsets, split_end)
        if lo is None or (hi is not None and lo >= hi):
            return None
        return lo, hi if hi is not None else self.offsets[-1]


def _first_voffset_at_or_after(offsets: tuple[int, ...], coffset: int) -> int | None:
    import bisect

    target = coffset << 16
    i = bisect.bisect_left(offsets, target)
    return offsets[i] if i < len(offsets) else None


# ------------------------------------------------------------------ streams


def iter_records_window(
    data: bytes, start_off: int, refs: list[str]
) -> Iterator[tuple[int, dict]]:
    """Parse records sequentially from ``start_off`` in an uncompressed
    window; yields (offset, row) and stops at a truncated record."""
    off = start_off
    while True:
        parsed = parse_record(data, off, refs)
        if parsed is None:
            return
        row, nxt = parsed
        yield off, row
        off = nxt
