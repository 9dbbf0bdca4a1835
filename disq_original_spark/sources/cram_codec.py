"""CRAM 2.x record decoder, from the CRAM spec (no htsjdk).

The reference delegates CRAM decode wholesale to htsjdk
(`cram/CramSource.java:153-167`); this module implements the codec itself so
the rebuild can read CRAM without a JVM:

- block layer: raw/gzip/bzip2/lzma/rANS-4x8 methods (``rans4x8``),
- compression header: preservation map (RN/AP/RR/SM/TD), data-series and
  tag encoding maps,
- entropy codecs: EXTERNAL, canonical HUFFMAN, BETA, GAMMA, SUBEXP,
  BYTE_ARRAY_LEN, BYTE_ARRAY_STOP over a core bit stream + external byte
  streams,
- record decode: flags/positions/mate info/tags, feature-list CIGAR
  reconstruction, and reference-based sequence reconstruction via the
  substitution matrix.

Layout facts are from the CRAM 2.1/3.0 specification (EBI); naming follows
the spec's two-letter data-series keys.  The slice-header reference MD5 is
verified against the supplied FASTA when decoding mapped slices (the same
integrity check htsjdk performs).
"""

from __future__ import annotations

import bz2
import gzip
import hashlib
import lzma
import struct
import zlib
from dataclasses import dataclass, field
from pathlib import Path

CRAM_MAGIC = b"CRAM"
FILE_DEFINITION_SIZE = 26

BLOCK_RAW, BLOCK_GZIP, BLOCK_BZIP2, BLOCK_LZMA, BLOCK_RANS = 0, 1, 2, 3, 4
# CRAM 3.1 block methods.  Implemented: rANS Nx16 (method 5, every
# transform — rans_nx16.py), the adaptive range coder (method 6,
# arith.py) and the name tokenizer (method 8, tok3.py), all read+write.
#
# fqzcomp (method 7) is PERMANENTLY DESCOPED — decision note (VERDICT r7
# directive #3, decided r7, reaffirmed r8): its parameter block embeds
# run-length coded tables (the spec's ReadArray form) and a multi-field
# context-packing scheme (qtab/ptab/dtab locations, selector and
# dedup/len flags) whose exact bit-level layout cannot be reconstructed
# here with confidence — this sandbox has neither the CRAMcodecs
# document text nor any samtools/htscodecs binary to generate a foreign
# known-answer fixture.  Every other 3.1 codec in this repo is pinned by
# hand-derived byte vectors; fqzcomp admits no such verification today,
# and a plausible-but-unverified decoder would return exactly out_len
# SILENTLY WRONG quality bytes (qualities have no structural checksum).
# Fail-loud-by-name beats confidently-wrong: a user hitting an
# fqzcomp-compressed block gets this codec named in the error, and the
# decode path (decode-level pruning, _byte_run) already skips quality
# blocks entirely when 'qual' is pruned, so metadata scans of such files
# still work.  Revisit only with access to the spec's ReadArray
# pseudocode or an htscodecs-generated fixture to verify against.
BLOCK_RANS_NX16, BLOCK_RANGE, BLOCK_FQZCOMP, BLOCK_TOK3 = 5, 6, 7, 8
_NX16_PLUS_NAMES = {
    BLOCK_FQZCOMP: "fqzcomp quality",
}
CT_FILE_HEADER, CT_COMPRESSION_HEADER, CT_MAPPED_SLICE, CT_RESERVED, CT_EXTERNAL, CT_CORE = (
    0, 1, 2, 3, 4, 5,
)

# BAM flag bits used during reconstruction
FLAG_PAIRED = 0x1
FLAG_UNMAPPED = 0x4
FLAG_MATE_UNMAPPED = 0x8
FLAG_MATE_REVERSE = 0x20

# CF (CRAM compression-record flag) bits
CF_QS_PRESERVED = 0x1
CF_DETACHED = 0x2
CF_HAS_MATE_DOWNSTREAM = 0x4

# data-series value kinds: how EXTERNAL payloads are read
_INT_SERIES = {"BF", "CF", "RI", "RL", "AP", "RG", "MF", "NS", "NP", "TS", "NF",
               "TL", "FN", "FP", "DL", "MQ", "HC", "PD", "RS", "EC"}
_BYTE_SERIES = {"FC", "BA", "QS", "BS"}
_BYTES_SERIES = {"RN", "IN", "SC", "BB", "QQ"}

# SAM aux-tag struct tables: ONE definition (bam_codec) shared by both
# codecs, so a tag-type addition or format fix cannot drift between the
# BAM and CRAM decoders.  Hoisted module-level because _decode_tag runs
# once per tag per record and a per-call dict literal is measurable.
from .bam_codec import _AUX_B_FMT as _TAG_B_FMT  # noqa: E402
from .bam_codec import _AUX_INT_FMT as _TAG_INT_FMT  # noqa: E402


class Buf:
    """Cursor over bytes with the CRAM varint primitives."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def u8(self) -> int:
        v = self.data[self.pos]
        self.pos += 1
        return v

    def take(self, n: int) -> bytes:
        b = self.data[self.pos : self.pos + n]
        self.pos += n
        return b

    def itf8(self) -> int:
        # inline fast path: single-byte values dominate real streams
        # (flags, small lengths, deltas), and itf8 is the hottest varint
        b0 = self.data[self.pos]
        self.pos += 1
        if b0 < 0x80:
            return b0
        if b0 < 0xC0:
            return ((b0 & 0x7F) << 8) | self.u8()
        if b0 < 0xE0:
            return ((b0 & 0x3F) << 16) | (self.u8() << 8) | self.u8()
        if b0 < 0xF0:
            b = self.take(3)
            return ((b0 & 0x1F) << 24) | (b[0] << 16) | (b[1] << 8) | b[2]
        b = self.take(4)
        v = ((b0 & 0x0F) << 28) | (b[0] << 20) | (b[1] << 12) | (b[2] << 4) | (b[3] & 0x0F)
        return v - (1 << 32) if v >= (1 << 31) else v

    def ltf8(self) -> int:
        b0 = self.u8()
        n = 0
        mask = 0x80
        while n < 8 and b0 & mask:
            n += 1
            mask >>= 1
        if n == 0:
            return b0
        v = b0 & (0xFF >> (n + (0 if n == 8 else 1)))
        for byte in self.take(n):
            v = (v << 8) | byte
        return v - (1 << 64) if v >= (1 << 63) else v

    def remaining(self) -> int:
        return len(self.data) - self.pos

    def skip(self, n: int) -> None:
        """Advance without touching the bytes (LazyBuf never inflates for
        a pure skip — the column-pruning fast path)."""
        self.pos += n


class LazyBuf(Buf):
    """A Buf whose backing bytes decompress ON FIRST ACCESS: ``skip``
    advances the cursor without inflating, so an external block whose
    series are entirely pruned (e.g. the QS quality block under
    ``columns=`` without 'qual') is never decompressed at all.  ``data``
    is a property so every access path — including codecs that scan
    ``buf.data`` directly, like ByteArrayStop — forces inflation."""

    __slots__ = ("_blob",)

    def __init__(self, inflate):
        self._blob = inflate  # callable until forced, then bytes
        self.pos = 0

    @property
    def data(self) -> bytes:  # shadows the parent slot descriptor
        if callable(self._blob):
            self._blob = self._blob()
        return self._blob


class BitReader:
    """MSB-first bit reader over the core block."""

    __slots__ = ("data", "byte_pos", "bit_pos")

    def __init__(self, data: bytes):
        self.data = data
        self.byte_pos = 0
        self.bit_pos = 0

    def read_bit(self) -> int:
        b = (self.data[self.byte_pos] >> (7 - self.bit_pos)) & 1
        self.bit_pos += 1
        if self.bit_pos == 8:
            self.bit_pos = 0
            self.byte_pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def decompress(method: int, payload: bytes, raw_size: int) -> bytes:
    if method == BLOCK_RAW:
        return payload
    if method == BLOCK_GZIP:
        return gzip.decompress(payload)
    if method == BLOCK_BZIP2:
        return bz2.decompress(payload)
    if method == BLOCK_LZMA:
        return lzma.decompress(payload)
    if method == BLOCK_RANS:
        from .rans4x8 import decompress as rans_decompress

        return rans_decompress(payload)
    if method == BLOCK_RANS_NX16:
        from .rans_nx16 import decompress as nx16_decompress

        # the block header's raw size enables spec-legal top-level NOSZ
        # streams (their own size byte omitted)
        return nx16_decompress(payload, expected_len=raw_size)
    if method == BLOCK_RANGE:
        from .arith import decompress as arith_decompress

        return arith_decompress(payload, expected_len=raw_size)
    if method == BLOCK_TOK3:
        from .tok3 import decode as tok3_decode

        return tok3_decode(payload, raw_size)
    if method in _NX16_PLUS_NAMES:
        raise ValueError(
            f"CRAM 3.1 block codec '{_NX16_PLUS_NAMES[method]}' (method "
            f"{method}) not implemented: this reader supports methods 0-6 "
            "(raw/gzip/bzip2/lzma/rANS-4x8/rANS-Nx16/arith) and 8 (tok3)"
        )
    raise ValueError(f"unknown CRAM block compression method {method}")


@dataclass
class Block:
    method: int
    content_type: int
    content_id: int
    raw_size: int
    data: object  # decompressed bytes, or a 0-arg inflate callable (defer)


def read_block(buf: Buf, major: int, defer: bool = False) -> Block:
    start = buf.pos
    method = buf.u8()
    ctype = buf.u8()
    cid = buf.itf8()
    csize = buf.itf8()
    rsize = buf.itf8()
    payload = buf.take(csize)
    if major >= 3:
        # CRC32 over the preceding block bytes (spec §8): verify instead of
        # skipping, so a corrupt payload fails HERE with block context
        # rather than deep inside a codec (r6 review finding)
        (want,) = struct.unpack("<I", buf.take(4))
        got = zlib.crc32(buf.data[start : buf.pos - 4])
        if got != want:
            raise ValueError(
                f"CRAM block CRC32 mismatch (content id {cid}, method "
                f"{method}): stored {want:#010x}, computed {got:#010x} — "
                "corrupt block"
            )
    if defer:
        # column pruning defers EXTERNAL block inflation to first access
        # (LazyBuf); a fully-skipped block never decompresses
        return Block(
            method, ctype, cid, rsize,
            lambda m=method, pl=payload, rs=rsize: decompress(m, pl, rs),
        )
    return Block(method, ctype, cid, rsize, decompress(method, payload, rsize))


@dataclass
class ContainerHeader:
    offset: int
    length: int
    ref_seq_id: int
    start: int
    span: int
    n_records: int
    counter: int
    bases: int
    n_blocks: int
    landmarks: list[int]
    header_size: int

    @property
    def is_eof(self) -> bool:
        return self.ref_seq_id == -1 and self.start == 4_542_278 and self.n_records == 0


def read_container_header(buf: Buf, offset: int, major: int) -> ContainerHeader:
    buf.pos = offset
    (length,) = struct.unpack_from("<i", buf.data, buf.pos)
    buf.pos += 4
    ref_seq_id = buf.itf8()
    start = buf.itf8()
    span = buf.itf8()
    n_records = buf.itf8()
    # record counter is LTF8 only from CRAM 3.0 (spec §8); 2.x uses ITF8 —
    # the encodings agree below 2^28, so the switch only matters for files
    # whose cumulative record count reaches ~268M
    counter = buf.ltf8() if major >= 3 else buf.itf8()
    bases = buf.ltf8()
    n_blocks = buf.itf8()
    n_landmarks = buf.itf8()
    landmarks = [buf.itf8() for _ in range(n_landmarks)]
    if major >= 3:
        (want,) = struct.unpack("<I", buf.take(4))
        got = zlib.crc32(buf.data[offset : buf.pos - 4])
        if got != want:
            raise ValueError(
                f"CRAM container header CRC32 mismatch at offset {offset}: "
                f"stored {want:#010x}, computed {got:#010x} — corrupt header"
            )
    return ContainerHeader(
        offset, length, ref_seq_id, start, span, n_records, counter, bases,
        n_blocks, landmarks, buf.pos - offset,
    )


# ------------------------------------------------------------ compression header


@dataclass
class CompressionHeader:
    read_names_included: bool = True
    ap_delta: bool = True
    reference_required: bool = True
    substitution_matrix: bytes = b"\x1b" * 5
    tag_dictionary: list[list[tuple[str, str]]] = field(default_factory=list)
    data_series: dict[str, tuple[int, bytes]] = field(default_factory=dict)
    tag_encodings: dict[str, tuple[int, bytes]] = field(default_factory=dict)


def parse_compression_header(data: bytes) -> CompressionHeader:
    buf = Buf(data)
    ch = CompressionHeader()
    # preservation map
    buf.itf8()  # byte size
    for _ in range(buf.itf8()):
        key = buf.take(2).decode("ascii")
        if key == "RN":
            ch.read_names_included = bool(buf.u8())
        elif key == "AP":
            ch.ap_delta = bool(buf.u8())
        elif key == "RR":
            ch.reference_required = bool(buf.u8())
        elif key == "SM":
            ch.substitution_matrix = buf.take(5)
        elif key == "TD":
            raw = buf.take(buf.itf8())
            ch.tag_dictionary = [
                [(e[i : i + 2].decode(), e[i + 2 : i + 3].decode()) for i in range(0, len(e), 3)]
                for e in raw.split(b"\x00")[:-1]
            ]
        else:
            raise ValueError(f"unknown preservation-map key {key!r}")
    # data series encodings
    buf.itf8()
    for _ in range(buf.itf8()):
        key = buf.take(2).decode("ascii")
        enc = buf.itf8()
        params = buf.take(buf.itf8())
        ch.data_series[key] = (enc, params)
    # tag encodings
    buf.itf8()
    for _ in range(buf.itf8()):
        k = buf.itf8()
        name = chr((k >> 16) & 0xFF) + chr((k >> 8) & 0xFF) + chr(k & 0xFF)
        enc = buf.itf8()
        params = buf.take(buf.itf8())
        ch.tag_encodings[name] = (enc, params)
    return ch


# ------------------------------------------------------------------- slice header


@dataclass
class SliceHeader:
    ref_seq_id: int
    start: int
    span: int
    n_records: int
    counter: int
    n_blocks: int
    content_ids: list[int]
    embedded_ref_id: int
    ref_md5: bytes


def parse_slice_header(data: bytes, major: int) -> SliceHeader:
    buf = Buf(data)
    ref_seq_id = buf.itf8()
    start = buf.itf8()
    span = buf.itf8()
    n_records = buf.itf8()
    counter = buf.ltf8() if major >= 3 else buf.itf8()
    n_blocks = buf.itf8()
    content_ids = [buf.itf8() for _ in range(buf.itf8())]
    embedded_ref_id = buf.itf8()
    ref_md5 = buf.take(16)
    return SliceHeader(
        ref_seq_id, start, span, n_records, counter, n_blocks, content_ids,
        embedded_ref_id, ref_md5,
    )


# ------------------------------------------------------------------------ codecs


class Codec:
    def read_int(self, core: BitReader, ext: dict[int, Buf]) -> int:
        raise NotImplementedError

    def read_byte(self, core: BitReader, ext: dict[int, Buf]) -> int:
        raise NotImplementedError

    def read_bytes(self, core: BitReader, ext: dict[int, Buf]) -> bytes:
        raise NotImplementedError


class ExternalCodec(Codec):
    def __init__(self, params: bytes):
        self.cid = Buf(params).itf8()

    def read_int(self, core, ext):
        return ext[self.cid].itf8()

    def read_byte(self, core, ext):
        return ext[self.cid].u8()


class HuffmanCodec(Codec):
    """Canonical Huffman over int symbols (spec §13.4; code assignment is the
    canonical ordering by (bit length, symbol))."""

    def __init__(self, params: bytes):
        buf = Buf(params)
        symbols = [buf.itf8() for _ in range(buf.itf8())]
        lengths = [buf.itf8() for _ in range(buf.itf8())]
        pairs = sorted(zip(lengths, symbols))
        self.const: int | None = None
        if len(pairs) == 1 and pairs[0][0] == 0:
            self.const = pairs[0][1]
            return
        self.table: dict[tuple[int, int], int] = {}
        code = 0
        prev_len = pairs[0][0]
        for i, (ln, sym) in enumerate(pairs):
            if i > 0:
                code = (code + 1) << (ln - prev_len)
                prev_len = ln
            self.table[(ln, code)] = sym
        self.max_len = pairs[-1][0]

    def read_int(self, core, ext):
        if self.const is not None:
            return self.const
        code = 0
        ln = 0
        while ln <= self.max_len:
            code = (code << 1) | core.read_bit()
            ln += 1
            sym = self.table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in core stream")

    read_byte = read_int


class BetaCodec(Codec):
    def __init__(self, params: bytes):
        buf = Buf(params)
        self.offset = buf.itf8()
        self.nbits = buf.itf8()

    def read_int(self, core, ext):
        return core.read_bits(self.nbits) - self.offset

    read_byte = read_int


class GammaCodec(Codec):
    """Elias-gamma (encoding id 9).  htsjdk ``GammaIntegerCodec`` returns
    the decoded value minus the offset — the gamma value itself is ≥ 1 and
    is NOT additionally decremented."""

    def __init__(self, params: bytes):
        self.offset = Buf(params).itf8()

    def read_int(self, core, ext):
        n = 0
        while core.read_bit() == 0:
            n += 1
        v = 1
        for _ in range(n):
            v = (v << 1) | core.read_bit()
        return v - self.offset

    read_byte = read_int


class GolombCodec(Codec):
    """Golomb (encoding id 2, spec §13.6; htsjdk ``GolombIntegerCodec``):
    unary quotient (1-bits terminated by a 0) then a truncated-binary
    remainder mod M — values below ``2^b - M`` use b-1 bits, the rest use
    b bits with the ``2^b - M`` bias."""

    def __init__(self, params: bytes):
        buf = Buf(params)
        self.offset = buf.itf8()
        self.m = buf.itf8()
        if self.m <= 0:
            raise ValueError(f"Golomb M must be positive (got {self.m})")
        # b = floor(log2(M)) + 1; remainder starts at b-1 bits and takes one
        # more only when >= 2^b - M.  For M = 2^k the cutoff equals M, so the
        # extra bit is never taken — a plain k-bit remainder, as in htsjdk.
        self.b = self.m.bit_length()
        self.cutoff = (1 << self.b) - self.m

    def read_int(self, core, ext):
        q = 0
        while core.read_bit() == 1:
            q += 1
        r = core.read_bits(self.b - 1) if self.b > 1 else 0
        if r >= self.cutoff:
            r = ((r << 1) | core.read_bit()) - self.cutoff
        return q * self.m + r - self.offset

    read_byte = read_int


class GolombRiceCodec(Codec):
    """Golomb-Rice (encoding id 8; htsjdk ``GolombRiceIntegerCodec``): the
    M = 2^log2m special case — unary quotient then a fixed log2m-bit
    remainder."""

    def __init__(self, params: bytes):
        buf = Buf(params)
        self.offset = buf.itf8()
        self.log2m = buf.itf8()

    def read_int(self, core, ext):
        q = 0
        while core.read_bit() == 1:
            q += 1
        r = core.read_bits(self.log2m) if self.log2m > 0 else 0
        return (q << self.log2m) + r - self.offset

    read_byte = read_int


class SubexpCodec(Codec):
    def __init__(self, params: bytes):
        buf = Buf(params)
        self.offset = buf.itf8()
        self.k = buf.itf8()

    def read_int(self, core, ext):
        n = 0
        while core.read_bit() == 1:
            n += 1
        if n == 0:
            v = core.read_bits(self.k)
        else:
            v = (1 << (self.k + n - 1)) | core.read_bits(self.k + n - 1)
        return v - self.offset

    read_byte = read_int


def _codec_cids(codec: "Codec | None") -> set[int]:
    """External content-ids a codec touches — the sharing analysis behind
    decode-level series skipping (a series may be skipped entirely only
    when its block is EXCLUSIVE to it; a shared block's cursor must keep
    advancing for the other readers)."""
    if codec is None:
        return set()
    if isinstance(codec, (ExternalCodec, ByteArrayStopCodec)):
        return {codec.cid}
    if isinstance(codec, ByteArrayLenCodec):
        return _codec_cids(codec.len_codec) | _codec_cids(codec.val_codec)
    return set()


def _core_free(codec: "Codec | None") -> bool:
    """True when reading the codec never consumes CORE bits — skipping it
    then cannot desynchronize the interleaved core stream.  Constant
    (zero-bit) Huffman counts: it reads nothing."""
    if isinstance(codec, (ExternalCodec, ByteArrayStopCodec)):
        return True
    if isinstance(codec, ByteArrayLenCodec):
        return _core_free(codec.len_codec) and _core_free(codec.val_codec)
    if isinstance(codec, HuffmanCodec):
        return codec.const is not None
    return False


class ByteArrayStopCodec(Codec):
    def __init__(self, params: bytes):
        buf = Buf(params)
        self.stop = buf.u8()
        self.cid = buf.itf8()

    def read_bytes(self, core, ext):
        b = ext[self.cid]
        start = b.pos
        data = b.data
        stop = self.stop
        pos = data.find(stop, start)
        if pos < 0:
            pos = len(data)
        b.pos = pos + 1
        return bytes(data[start:pos])


class ByteArrayLenCodec(Codec):
    def __init__(self, params: bytes):
        buf = Buf(params)
        len_enc = buf.itf8()
        len_params = buf.take(buf.itf8())
        val_enc = buf.itf8()
        val_params = buf.take(buf.itf8())
        self.len_codec = build_codec(len_enc, len_params)
        self.val_codec = build_codec(val_enc, val_params)

    def read_bytes(self, core, ext):
        n = self.len_codec.read_int(core, ext)
        if isinstance(self.val_codec, ExternalCodec):
            return bytes(ext[self.val_codec.cid].take(n))
        return bytes(self.val_codec.read_byte(core, ext) for _ in range(n))


ENCODING_IDS = {
    1: ExternalCodec,
    2: GolombCodec,
    3: HuffmanCodec,
    4: ByteArrayLenCodec,
    5: ByteArrayStopCodec,
    6: BetaCodec,
    7: SubexpCodec,
    8: GolombRiceCodec,
    9: GammaCodec,
}


def build_codec(enc: int, params: bytes) -> Codec:
    if enc == 0:
        return Codec()  # NULL: never read
    cls = ENCODING_IDS.get(enc)
    if cls is None:
        raise NotImplementedError(f"CRAM encoding id {enc} not implemented")
    return cls(params)


# --------------------------------------------------------------------- reference


class IndexedFasta:
    """Minimal .fai-indexed FASTA reader (driver- or executor-side)."""

    def __init__(self, path: str | Path):
        from .fsio import fs_exists, fs_open_text, fs_read_bytes

        self.path = str(path)
        self.index: list[tuple[str, int, int, int, int]] = []
        fai = str(path) + ".fai"
        if fs_exists(fai):
            for line in fs_read_bytes(fai).decode().splitlines():
                name, ln, off, lb, lw = line.split("\t")[:5]
                self.index.append((name, int(ln), int(off), int(lb), int(lw)))
        else:  # build in memory
            name, seqs, order = None, {}, []
            with fs_open_text(self.path) as fh:
                for line in fh:
                    if line.startswith(">"):
                        name = line[1:].split()[0]
                        seqs[name] = []
                        order.append(name)
                    elif name:
                        seqs[name].append(line.strip())
            self._mem = {n: "".join(seqs[n]).upper().encode() for n in order}
            self.index = [(n, len(self._mem[n]), 0, 0, 0) for n in order]
            return
        self._mem = None

    def names(self) -> list[str]:
        return [e[0] for e in self.index]

    def get(self, idx: int) -> bytes:
        name, ln, off, lb, lw = self.index[idx]
        if self._mem is not None:
            return self._mem[name]
        from .fsio import fs_open

        nlines = (ln + lb - 1) // lb
        with fs_open(self.path) as fh:
            fh.seek(off)
            raw = fh.read(ln + nlines * (lw - lb))
        return raw.replace(b"\n", b"").replace(b"\r", b"")[:ln].upper()


_SUB_BASES = {
    ord("A"): b"CGTN", ord("C"): b"AGTN", ord("G"): b"ACTN",
    ord("T"): b"ACGN", ord("N"): b"ACGT",
}


from .bam_codec import _QUAL33 as _QUAL_PLUS_33  # one phred+33 table repo-wide

_SUB_LUT_CACHE: dict[bytes, list[list[int]]] = {}


def _sub_lut(matrix: bytes) -> list[list[int]]:
    """256×4 lookup table for one substitution matrix: row = ref base
    byte, column = 2-bit code, value = substituted base.  Built once per
    matrix (one per compression header) so the per-X-feature cost is two
    list indexes instead of a chr/upper/find/scan — the X path runs ~50
    times per 100 bp read on real data."""
    lut = _SUB_LUT_CACHE.get(matrix)
    if lut is not None:
        # refresh recency (ADVICE r8: plain FIFO evicted the oldest-
        # INSERTED entry — typically the hottest, longest-lived matrix —
        # first; pop+reinsert makes dict insertion order LRU order, so
        # eviction removes the least-recently-USED matrix instead)
        _SUB_LUT_CACHE.pop(matrix)
        _SUB_LUT_CACHE[matrix] = lut
    else:
        if len(_SUB_LUT_CACHE) >= 64:
            # one entry per distinct substitution matrix — real encoders
            # reuse a handful, so 64 is generous; evict ONE (least-
            # recently-used) entry rather than clearing, so matrix churn
            # past the cap can't thrash every hot LUT (2nd/3rd r8
            # reviews: adversarial many-matrix inputs must not grow this
            # forever)
            _SUB_LUT_CACHE.pop(next(iter(_SUB_LUT_CACHE)))
        lut = []
        for b in range(256):
            u = chr(b).upper()
            order = "ACGTN".find(u)
            if order < 0:
                order = 4
                u = "N"
            alts = _SUB_BASES[ord(u)]
            byte = matrix[order]
            row = [ord("N")] * 4
            # reversed so a duplicate packed code resolves to the FIRST
            # matching slot, as the original linear scan did
            for i in reversed(range(4)):
                row[(byte >> (6 - 2 * i)) & 0x3] = alts[i]
            lut.append(row)
        _SUB_LUT_CACHE[matrix] = lut
    return lut


def substitute(matrix: bytes, ref_base: int, code: int) -> int:
    """Substitution matrix lookup: for each ref base its byte packs the code
    (2 bits, MSB-first) of each alternative base in ACGTN order.  A code
    outside 0..3 (corrupt BS byte) yields 'N', matching the pre-LUT scan.
    (A lowercase soft-masked ref base substitutes as its uppercase form —
    IndexedFasta uppercases, so this only matters for custom
    ``ref_getter`` callables.)"""
    if code > 3 or code < 0:
        return ord("N")
    return _sub_lut(matrix)[ref_base][code]


# ---------------------------------------------------------------- record decode


class SliceDecoder:
    def __init__(
        self,
        chdr: CompressionHeader,
        slice_hdr: SliceHeader,
        core: bytes,
        ext_blocks: dict[int, object],
        ref_names: list[str],
        rg_ids: list[str],
        ref_getter=None,
        fields: frozenset[str] | None = None,
    ):
        self.chdr = chdr
        self.sh = slice_hdr
        self.core = BitReader(core)
        self.ext = {
            cid: (LazyBuf(d) if callable(d) else Buf(d))
            for cid, d in ext_blocks.items()
        }
        self.fields = fields
        self.ref_names = ref_names
        self.rg_ids = rg_ids
        self.ref_getter = ref_getter
        self.codecs = {k: build_codec(e, p) for k, (e, p) in chdr.data_series.items()}
        self.tag_codecs = {k: build_codec(e, p) for k, (e, p) in chdr.tag_encodings.items()}
        self._ref_cache: dict[int, bytes] = {}
        self._readers: dict[tuple[str, str], object] = {}
        # qname pruning: the RN series normally reads every record (its
        # BYTE_ARRAY_STOP cursor must stay in sync), but when qname is
        # pruned AND the RN block is EXCLUSIVE to RN, nothing else ever
        # touches that block — skip the reads and the block (a tok3-coded
        # 3.1 name block then never even decompresses).  Shared-cid
        # layouts (spec-legal) keep the always-read path.
        self._skip_rn = False
        if fields is not None and "qname" not in fields:
            rn = self.codecs.get("RN")
            rn_cids = _codec_cids(rn)
            others: set[int] = set()
            for k, c in self.codecs.items():
                if k != "RN":
                    others |= _codec_cids(c)
            for c in self.tag_codecs.values():
                others |= _codec_cids(c)
            # _core_free matters here exactly as for tags (r7 third
            # review): a core-consuming RN codec (BYTE_ARRAY_LEN with a
            # real Huffman length) skipped per-record would desync every
            # other core-coded series
            self._skip_rn = (
                bool(rn_cids) and not (rn_cids & others) and _core_free(rn)
            )
        # attributes pruning, same shape: skip every tag read when the tag
        # blocks are exclusive to tags AND no tag codec touches the core
        # bitstream (skipping a core reader would desync every other
        # interleaved series) — tag payloads are often the bulk of a
        # real-world container, so a counter scan never inflates them
        self._skip_tags = False
        if fields is not None and "attributes" not in fields and self.tag_codecs:
            tag_cids: set[int] = set()
            for c in self.tag_codecs.values():
                tag_cids |= _codec_cids(c)
            series_cids: set[int] = set()
            for c in self.codecs.values():
                series_cids |= _codec_cids(c)
            self._skip_tags = (
                all(_core_free(c) for c in self.tag_codecs.values())
                and not (tag_cids & series_cids)
            )

    def _want(self, name: str) -> bool:
        return self.fields is None or name in self.fields

    def _int(self, key: str) -> int:
        return self.codecs[key].read_int(self.core, self.ext)

    def _byte(self, key: str) -> int:
        return self.codecs[key].read_byte(self.core, self.ext)

    def _reader(self, key: str, kind: str):
        """Prebound per-series reader (decode hot path: ~100 series reads
        per record went through two dict hops + two call layers each).
        EXTERNAL series bind the block Buf's own itf8/u8 method directly —
        a LazyBuf is inflated ONCE here and swapped for a plain Buf so
        subsequent reads pay slot access, not a property call per byte.
        Built lazily per (key, kind), so series a slice never touches
        (pruned columns, no detached mates) keep their deferred blocks."""
        cache = self._readers
        k = (key, kind)
        fn = cache.get(k)
        if fn is None:
            codec = self.codecs[key]
            if isinstance(codec, ExternalCodec):
                buf = self.ext[codec.cid]
                if isinstance(buf, LazyBuf):
                    nb = Buf(buf.data)
                    nb.pos = buf.pos
                    self.ext[codec.cid] = nb
                    buf = nb
                fn = buf.itf8 if kind == "int" else buf.u8
            else:
                core, ext = self.core, self.ext
                if kind == "int":
                    fn = lambda: codec.read_int(core, ext)  # noqa: E731
                else:
                    fn = lambda: codec.read_byte(core, ext)  # noqa: E731
            cache[k] = fn
        return fn

    def _bytes(self, key: str) -> bytes:
        return self.codecs[key].read_bytes(self.core, self.ext)

    def _ref(self, ref_id: int) -> bytes:
        if ref_id not in self._ref_cache:
            if self.ref_getter is None:
                raise ValueError(
                    "CRAM slice requires the reference sequence; pass reference_path"
                )
            self._ref_cache[ref_id] = self.ref_getter(ref_id)
        return self._ref_cache[ref_id]

    def decode_records(self) -> list[dict]:
        ch, sh = self.chdr, self.sh
        prev_ap = sh.start
        raw: list[dict] = []
        # prebound unconditional per-record readers (see _reader); the
        # conditional series (RI/MF/NS/... and feature operands) bind
        # lazily on first use so untouched blocks stay deferred
        rd = self._reader
        bf_r, cf_r, rl_r, ap_r, rg_r, tl_r = (
            rd("BF", "int"), rd("CF", "int"), rd("RL", "int"),
            rd("AP", "int"), rd("RG", "int"), rd("TL", "int"),
        )
        multiref = sh.ref_seq_id == -2
        ri_r = rd("RI", "int") if multiref else None
        # mapped-record readers + feature-operand thunks bind on FIRST
        # mapped record / first occurrence of each feature code, so
        # all-unmapped slices and absent feature series keep their
        # blocks deferred exactly as before
        fn_r = mq_r = fp_r = fc_r = None
        op_cache: dict[str, object] = {}
        for _ in range(sh.n_records):
            r: dict = {}
            bf = bf_r()
            cf = cf_r()
            ref_id = ri_r() if multiref else sh.ref_seq_id
            rl = rl_r()
            ap = ap_r()
            if ch.ap_delta:
                ap = prev_ap + ap
                prev_ap = ap
            rg = rg_r()
            if ch.read_names_included and not self._skip_rn:
                qname = self._bytes("RN").decode("ascii")
            else:
                qname = None
            mate = None
            nf = None
            if cf & CF_DETACHED:
                mf = self._int("MF")
                if not ch.read_names_included and not self._skip_rn:
                    qname = self._bytes("RN").decode("ascii")
                mate = (mf, self._int("NS"), self._int("NP"), self._int("TS"))
            elif cf & CF_HAS_MATE_DOWNSTREAM:
                nf = self._int("NF")
            tl = tl_r()
            attrs: dict[str, str] = {}
            if not self._skip_tags:
                for tag, typ in (ch.tag_dictionary[tl] if ch.tag_dictionary else []):
                    attrs[tag] = self._decode_tag(tag, typ)
            if rg >= 0 and rg < len(self.rg_ids):
                attrs["RG"] = f"Z:{self.rg_ids[rg]}"

            flag = bf
            features = []
            mq = 255
            quals: bytes | None = None
            bases: bytes | None = None
            if not flag & FLAG_UNMAPPED:
                if fn_r is None:
                    fn_r, mq_r = rd("FN", "int"), rd("MQ", "int")
                fpos = 0
                fn_n = fn_r()
                if fn_n:
                    if fp_r is None:
                        fp_r, fc_r = rd("FP", "int"), rd("FC", "byte")
                    for _ in range(fn_n):
                        fpos += fp_r()
                        fc = chr(fc_r())
                        fn = op_cache.get(fc)
                        if fn is None:
                            fn = op_cache[fc] = self._operand_thunk(fc)
                        features.append((fpos, fc, fn()))
                mq = mq_r()
                if cf & CF_QS_PRESERVED:
                    quals = self._byte_run("QS", rl, self._want("qual"))
            else:
                bases = self._byte_run("BA", rl, self._want("seq"))
                if cf & CF_QS_PRESERVED:
                    quals = self._byte_run("QS", rl, self._want("qual"))

            r.update(
                bf=bf, cf=cf, ref_id=ref_id, rl=rl, ap=ap, qname=qname,
                mate=mate, nf=nf, attrs=attrs, flag=flag, features=features,
                mq=mq, quals=quals, bases=bases,
            )
            raw.append(r)

        self._restore_mates(raw)
        return [self._to_row(r) for r in raw]

    def _byte_run(self, series: str, n: int, want: bool) -> bytes | None:
        """Read ``n`` bytes of a per-base series (QS quals / BA bases).
        When the column is pruned: an EXTERNAL stream advances with
        ``skip`` (its block never inflates if nothing else reads it); a
        core-encoded stream must still be consumed bit-exactly to keep
        every interleaved series in sync, so it reads and discards."""
        codec = self.codecs[series]
        if isinstance(codec, ExternalCodec):
            if want:
                return bytes(self.ext[codec.cid].take(n))
            self.ext[codec.cid].skip(n)
            return None
        if want:
            return bytes(codec.read_byte(self.core, self.ext) for _ in range(n))
        for _ in range(n):
            codec.read_byte(self.core, self.ext)
        return None

    def _feature_operand(self, fc: str):
        return self._operand_thunk(fc)()

    def _operand_thunk(self, fc: str):
        """Zero-arg reader for one feature code's operand, built once per
        slice per code (decode_records caches them) — the per-feature
        dispatch chain + per-call series lookups were a measurable slice
        of the decode profile."""
        rd = self._reader
        if fc == "X":
            return rd("BS", "byte")
        if fc == "I":
            return lambda: self._bytes("IN")
        if fc == "S":
            return lambda: self._bytes("SC")
        if fc == "i":
            return rd("BA", "byte")
        if fc == "B":
            ba, qs = rd("BA", "byte"), rd("QS", "byte")
            return lambda: (ba(), qs())
        if fc == "Q":
            return rd("QS", "byte")
        if fc == "D":
            return rd("DL", "int")
        if fc == "N":
            return rd("RS", "int")
        if fc == "P":
            return rd("PD", "int")
        if fc == "H":
            return rd("HC", "int")
        if fc == "b":
            return lambda: self._bytes("BB")
        if fc == "q":
            return lambda: self._bytes("QQ")
        raise ValueError(f"unknown CRAM feature code {fc!r}")

    def _decode_tag(self, tag: str, typ: str) -> str:
        data = self.tag_codecs[tag + typ].read_bytes(self.core, self.ext)
        if typ == "Z":
            return f"Z:{data.decode('ascii', 'replace').rstrip(chr(0))}"
        if typ == "H":
            return f"H:{data.decode('ascii', 'replace').rstrip(chr(0))}"
        if typ == "A":
            return f"A:{chr(data[0])}"
        if typ in "cCsSiI":
            return f"i:{struct.unpack_from(_TAG_INT_FMT[typ][0], data, 0)[0]}"
        if typ == "f":
            return f"f:{struct.unpack_from('<f', data, 0)[0]:g}"
        if typ == "B":
            sub = chr(data[0])
            (count,) = struct.unpack_from("<I", data, 1)
            fmt, size = _TAG_B_FMT[sub]
            vals = struct.unpack_from(f"<{count}{fmt[1]}", data, 5)
            body = ",".join(f"{v:g}" if sub == "f" else str(v) for v in vals)
            return f"B:{sub},{body}"
        return f"Z:{data.decode('ascii', 'replace')}"

    def _restore_mates(self, raw: list[dict]) -> None:
        """Intra-slice mate chains (NF): link records, set mate fields and
        template size the way htsjdk's normalizer does."""
        for i, r in enumerate(raw):
            if r["nf"] is None:
                continue
            j = i + r["nf"] + 1
            if j >= len(raw):
                continue
            m = raw[j]
            r["mate_info"] = (m["flag"], m["ref_id"], m["ap"])
            m["mate_info_back"] = (r["flag"], r["ref_id"], r["ap"])
            # template size (htsjdk computeInsertSize): leftmost-start to
            # rightmost-end span, positive on the leftmost record — only
            # defined when both ends are mapped to the same reference
            if (
                not (r["flag"] & FLAG_UNMAPPED)
                and not (m["flag"] & FLAG_UNMAPPED)
                and r["ref_id"] == m["ref_id"] >= 0
            ):
                r_end = r["ap"] + _ref_span(r) - 1
                m_end = m["ap"] + _ref_span(m) - 1
                insert = max(r_end, m_end) - min(r["ap"], m["ap"]) + 1
                if r["ap"] <= m["ap"]:
                    r["tlen_"], m["tlen_"] = insert, -insert
                else:
                    r["tlen_"], m["tlen_"] = -insert, insert
        # compute pairwise fields
        for i, r in enumerate(raw):
            info = r.get("mate_info") or r.get("mate_info_back")
            if info is None:
                continue
            mflag, mref, map_ = info
            mf = 0
            if mflag & 0x10:
                mf |= 1
            if mflag & FLAG_UNMAPPED:
                mf |= 2
            r["mate"] = (mf, mref, map_, r.get("tlen_", 0))

    def _to_row(self, r: dict) -> dict:
        flag = r["flag"]
        unmapped = bool(flag & FLAG_UNMAPPED)
        ref_id = r["ref_id"]
        rname = self.ref_names[ref_id] if 0 <= ref_id < len(self.ref_names) else None
        rnext, pnext, tlen = None, 0, 0
        if r["mate"] is not None:
            mf, ns, np_, ts = r["mate"]
            if mf & 1:
                flag |= FLAG_MATE_REVERSE
            if mf & 2:
                flag |= FLAG_MATE_UNMAPPED
            if 0 <= ns < len(self.ref_names):
                rnext = "=" if ns == ref_id else self.ref_names[ns]
            pnext = np_
            tlen = ts

        if unmapped:
            seq = (r["bases"].decode("ascii") if r["bases"] else "*") if self._want("seq") else None
            cigar = "*"
            pos = r["ap"]
            mapq = 0
        else:
            # pruned seq skips the whole reference-based reconstruction
            # (and, with no other seq consumer, the reference fetch)
            seq = self._reconstruct_seq(r) if self._want("seq") else None
            cigar = (
                _features_to_cigar(r["features"], r["rl"])
                if self._want("cigar")
                else None
            )
            pos = r["ap"]
            mapq = r["mq"]
        if self._want("qual"):
            quals = r["quals"]
            if quals is None:
                qual = "*"
            elif quals and max(quals) > 222:
                # q+33 past one byte: keep the exact chr() semantics the
                # translate fast path can't represent (corrupt-data only)
                qual = "".join(chr(q + 33) for q in quals)
            else:
                qual = quals.translate(_QUAL_PLUS_33).decode("latin-1")
        else:
            qual = None
        row = {
            "qname": r["qname"] or "*",
            "flag": flag,
            "rname": rname,
            "pos": pos,
            "mapq": mapq,
            "cigar": cigar,
            "rnext": rnext,
            "pnext": pnext,
            "tlen": tlen,
            "seq": seq,
            "qual": qual,
            "attributes": r["attrs"],
        }
        if self.fields is not None:
            row = {k: row[k] for k in row if k in self.fields}
        return row

    def _reconstruct_seq(self, r: dict) -> str:
        rl = r["rl"]
        ref = self._ref(r["ref_id"])
        ref_len = len(ref)
        sm = self.chdr.substitution_matrix
        sub_lut = _sub_lut(sm)
        seq = bytearray(rl)
        ref_pos = r["ap"] - 1  # 0-based
        read_pos = 0  # 0-based

        def ref_base(p: int) -> int:
            return ref[p] if 0 <= p < ref_len else ord("N")

        def check_fits(n: int) -> None:
            # every read-consuming branch must stay inside rl (r8
            # reviews): a bytearray SLICE-assign past the end silently
            # GROWS seq (match stretches and the I/S/b branches), and a
            # single-index write (X/i/B) would raise a bare IndexError —
            # both corrupt-feature shapes fail loud with one named error
            if read_pos + n > rl:
                raise ValueError(
                    f"CRAM feature positions exceed the read length {rl} "
                    "— corrupt feature stream"
                )

        def copy_match(n: int) -> None:
            # bulk slice copy of a match stretch; the per-base fallback
            # only runs when the span leaves the reference (pads 'N')
            nonlocal read_pos, ref_pos
            if n <= 0:
                return
            check_fits(n)
            if 0 <= ref_pos and ref_pos + n <= ref_len:
                seq[read_pos : read_pos + n] = ref[ref_pos : ref_pos + n]
                read_pos += n
                ref_pos += n
            else:
                for _ in range(n):
                    seq[read_pos] = ref_base(ref_pos)
                    read_pos += 1
                    ref_pos += 1

        for fpos, fc, op in r["features"]:
            copy_match(fpos - 1 - read_pos)
            if fc == "X":
                check_fits(1)
                seq[read_pos] = (
                    sub_lut[ref_base(ref_pos)][op]
                    if 0 <= op <= 3
                    else ord("N")
                )
                read_pos += 1
                ref_pos += 1
            elif fc in ("I", "S"):
                check_fits(len(op))
                seq[read_pos : read_pos + len(op)] = op
                read_pos += len(op)
            elif fc == "i":
                check_fits(1)
                seq[read_pos] = op
                read_pos += 1
            elif fc == "B":
                check_fits(1)
                seq[read_pos] = op[0]
                read_pos += 1
                ref_pos += 1
            elif fc == "b":
                check_fits(len(op))
                seq[read_pos : read_pos + len(op)] = op
                read_pos += len(op)
                ref_pos += len(op)
            elif fc == "D":
                ref_pos += op
            elif fc == "N":
                ref_pos += op
            # Q/H/P: no sequence effect
        copy_match(rl - read_pos)
        return seq.decode("ascii")


def _ref_span(r: dict) -> int:
    """Reference-consumed length of a raw record (features + read length),
    via its reconstructed CIGAR — used for mate template-size restoration."""
    import re as _re

    cigar = _features_to_cigar(r["features"], r["rl"])
    return sum(
        int(n)
        for n, op in _re.findall(r"(\d+)([MIDNSHP=X])", cigar)
        if op in "MDN=X"
    )


def _features_to_cigar(features: list[tuple[int, str, object]], read_length: int) -> str:
    if not features:
        return f"{read_length}M"
    ops: list[tuple[int, str]] = []

    def add(n: int, op: str) -> None:
        if n <= 0:
            return
        if ops and ops[-1][1] == op:
            ops[-1] = (ops[-1][0] + n, op)
        else:
            ops.append((n, op))

    cur = 1  # 1-based read position of next unaccounted base
    for fpos, fc, op in features:
        add(fpos - cur, "M")
        cur = max(cur, fpos)
        if fc == "S":
            add(len(op), "S")
            cur = fpos + len(op)
        elif fc == "I":
            add(len(op), "I")
            cur = fpos + len(op)
        elif fc == "i":
            add(1, "I")
            cur = fpos + 1
        elif fc == "b":
            add(len(op), "M")
            cur = fpos + len(op)
        elif fc == "D":
            add(op, "D")
        elif fc == "N":
            add(op, "N")
        elif fc == "P":
            add(op, "P")
        elif fc == "H":
            add(op, "H")
        # X/B/Q sit inside an M run
    add(read_length - cur + 1, "M")
    return "".join(f"{n}{op}" for n, op in ops)


# ------------------------------------------------------------------ file decode


@dataclass
class CramFileMeta:
    major: int
    minor: int
    header_text: str
    ref_names: list[str]
    rg_ids: list[str]


def read_cram_meta(data: bytes) -> tuple[CramFileMeta, int]:
    """Parse the file definition + first (SAM header) container.  Returns
    (meta, offset of the first data container)."""
    if data[:4] != CRAM_MAGIC:
        raise ValueError("not a CRAM file")
    major, minor = data[4], data[5]
    buf = Buf(data)
    hdr = read_container_header(buf, FILE_DEFINITION_SIZE, major)
    block = read_block(Buf(data, FILE_DEFINITION_SIZE + hdr.header_size), major)
    (text_len,) = struct.unpack_from("<i", block.data, 0)
    text = block.data[4 : 4 + text_len].decode("utf-8", "replace")
    from .headers import header_ref_and_rg_names

    ref_names, rg_ids = header_ref_and_rg_names(text)
    meta = CramFileMeta(major, minor, text, ref_names, rg_ids)
    return meta, hdr.offset + hdr.header_size + hdr.length


def read_cram_meta_file(path: str | Path) -> tuple[CramFileMeta, int]:
    """Like ``read_cram_meta`` but reads exactly the bytes needed from
    ``path`` (the SAM-header container can exceed any fixed guess)."""
    from .fsio import fs_open

    with fs_open(str(path)) as fh:
        head = fh.read(4096)
        if head[:4] != CRAM_MAGIC:
            raise ValueError("not a CRAM file")
        hdr = read_container_header(Buf(head), FILE_DEFINITION_SIZE, head[4])
        need = hdr.offset + hdr.header_size + hdr.length
        if need > len(head):
            fh.seek(0)
            head = fh.read(need)
    return read_cram_meta(head)


def decode_container(
    data: bytes,
    offset: int,
    meta: CramFileMeta,
    ref_getter=None,
    verify_ref_md5: bool = True,
    fields: frozenset[str] | None = None,
) -> tuple[list[dict], int]:
    """Decode all slices of the container at ``offset``; returns (rows, next
    container offset).  ``fields`` prunes the decode (see SliceDecoder):
    external blocks whose series are entirely skipped never inflate."""
    buf = Buf(data)
    hdr = read_container_header(buf, offset, meta.major)
    end = hdr.offset + hdr.header_size + hdr.length
    if hdr.is_eof or hdr.n_records == 0:
        return [], end
    body = Buf(data, hdr.offset + hdr.header_size)
    chdr_block = read_block(body, meta.major)
    if chdr_block.content_type != CT_COMPRESSION_HEADER:
        raise ValueError("expected compression header block")
    chdr = parse_compression_header(chdr_block.data)
    rows: list[dict] = []
    while body.pos < end:
        slice_hdr_block = read_block(body, meta.major)
        if slice_hdr_block.content_type != CT_MAPPED_SLICE:
            raise ValueError(
                f"expected slice header block, got type {slice_hdr_block.content_type}"
            )
        sh = parse_slice_header(slice_hdr_block.data, meta.major)
        core: bytes = b""
        ext: dict[int, object] = {}
        for _ in range(sh.n_blocks):
            # core/compression blocks are always needed; externals defer
            # inflation under pruning (a fully-skipped series' block —
            # e.g. QS without 'qual' — never decompresses)
            b = read_block(body, meta.major, defer=fields is not None)
            if b.content_type == CT_CORE:
                core = b.data() if callable(b.data) else b.data
            elif b.content_type == CT_EXTERNAL:
                ext[b.content_id] = b.data
        want_seq = fields is None or "seq" in fields
        if sh.embedded_ref_id >= 0 and sh.embedded_ref_id in ext and want_seq:
            # only force the embedded-reference block when sequence
            # reconstruction will actually consume it — a pruned counter
            # scan leaves it lazily un-inflated like any skipped block
            if callable(ext[sh.embedded_ref_id]):
                ext[sh.embedded_ref_id] = ext[sh.embedded_ref_id]()
            # embedded reference block: covers [slice.start, start+span);
            # shadow the external FASTA for this slice (spec §8.5).  Exposed
            # as an offset view, NOT b"N" * (start-1) padding — that would
            # allocate memory proportional to the genomic coordinate.
            emb = ext[sh.embedded_ref_id]

            class _OffsetRef:
                __slots__ = ("data", "off")

                def __init__(self, data, off):
                    self.data, self.off = data, off

                def __getitem__(self, key):
                    if isinstance(key, slice):
                        lo = (key.start or 0) - self.off
                        hi = len(self.data) if key.stop is None else key.stop - self.off
                        if lo >= 0:
                            return self.data[lo:hi]
                        # positions before the embedded window read as 'N'
                        return b"N" * (min(hi, 0) - lo) + self.data[0 : max(hi, 0)]
                    i = key - self.off
                    return self.data[i] if i >= 0 else ord("N")

                def __len__(self):
                    return self.off + len(self.data)

            def ref_getter_slice(_ri, _view=_OffsetRef(emb, sh.start - 1)):  # noqa: ANN001
                return _view
        else:
            ref_getter_slice = ref_getter
        if (
            verify_ref_md5
            and want_seq  # the MD5 guards seq RECONSTRUCTION; a pruned
            # counter scan must not fetch+hash the chromosome per slice
            and ref_getter is not None
            and sh.ref_seq_id >= 0
            and sh.ref_md5 != b"\x00" * 16
        ):
            try:
                ref = ref_getter(sh.ref_seq_id)
            except IndexError:
                raise ValueError(
                    f"reference FASTA has no sequence at index {sh.ref_seq_id}"
                    " — wrong reference FASTA?"
                ) from None
            span = ref[sh.start - 1 : sh.start - 1 + sh.span]
            if hashlib.md5(span).digest() != sh.ref_md5:
                raise ValueError(
                    f"reference MD5 mismatch for slice at {sh.ref_seq_id}:{sh.start}"
                    " — wrong reference FASTA?"
                )
        dec = SliceDecoder(
            chdr, sh, core, ext, meta.ref_names, meta.rg_ids, ref_getter_slice,
            fields=fields,
        )
        rows.extend(dec.decode_records())
    return rows, end


def decode_cram(path: str | Path, reference_path: str | Path | None = None) -> list[dict]:
    """Decode a whole CRAM file into reads-schema rows (driver-side utility;
    the Spark path decodes per-container in executors)."""
    from .fsio import fs_read_bytes

    data = fs_read_bytes(str(path))
    meta, pos = read_cram_meta(data)
    fasta = IndexedFasta(reference_path) if reference_path else None
    ref_getter = fasta.get if fasta else None
    rows: list[dict] = []
    while pos < len(data):
        chunk, pos = decode_container(data, pos, meta, ref_getter)
        rows.extend(chunk)
    return rows
