"""CRAM 3.1 name-tokenizer (tok3, block method 8): byte-exact decode
known-answer vectors hand-built from the spec layout (so the descriptor
bits, uint32-LE values and stream wiring can't drift symmetrically with
our own encoder), encode→decode round-trips over realistic read-name
shapes, duplicate-stream descriptors, and fail-loud behavior on corrupt
or arithmetic-mode blocks."""

from __future__ import annotations

import random
import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from disq_original_spark.sources.tok3 import (
    N_ALPHA,
    N_DDELTA,
    N_DDELTA0,
    N_DIFF,
    N_DIGITS,
    N_DIGITS0,
    N_DUP,
    N_DZLEN,
    N_END,
    N_MATCH,
    N_TYPE,
    decode,
    encode,
)


def _cat(body: bytes) -> bytes:
    """A minimal rANS Nx16 CAT stream: flags 0x20, uint7 size, raw bytes
    (sizes here stay under 128 so the uint7 is one byte)."""
    assert len(body) < 128
    return bytes([0x20, len(body)]) + body


def _stream(desc: int, body: bytes) -> bytes:
    comp = _cat(body)
    assert len(comp) < 128
    return bytes([desc, len(comp)]) + comp


# ------------------------------------------------------------- known answers


def test_known_answer_two_names_decode():
    """Hand-built block for names 'r1', 'r2': name 0 is a literal DIFF
    (dist 0, ALPHA 'r', DIGITS 1); name 1 DIFFs against it (dist 1,
    MATCH, DDELTA +1).  Every descriptor/field is written out by hand —
    this is the vector that pins the layout."""
    raw = b"r1\x00r2\x00"
    blk = struct.pack("<II", len(raw), 2) + b"\x00"
    blk += _stream(0x40 | N_TYPE, bytes([N_DIFF, N_DIFF]))  # position 0
    blk += _stream(N_DIFF, struct.pack("<II", 0, 1))
    blk += _stream(0x40 | N_TYPE, bytes([N_ALPHA, N_MATCH]))  # position 1
    blk += _stream(N_ALPHA, b"r\x00")
    blk += _stream(0x40 | N_TYPE, bytes([N_DIGITS, N_DDELTA]))  # position 2
    blk += _stream(N_DIGITS, struct.pack("<I", 1))
    blk += _stream(N_DDELTA, bytes([1]))
    blk += _stream(0x40 | N_TYPE, bytes([N_END, N_END]))  # position 3
    assert decode(blk, len(raw)) == raw


def test_known_answer_whole_name_dup():
    raw = b"x\x00x\x00"
    blk = struct.pack("<II", len(raw), 2) + b"\x00"
    blk += _stream(0x40 | N_TYPE, bytes([N_DIFF, N_DUP]))
    blk += _stream(N_DIFF, struct.pack("<I", 0))
    blk += _stream(N_DUP, struct.pack("<I", 1))
    blk += _stream(0x40 | N_TYPE, bytes([N_ALPHA]))
    blk += _stream(N_ALPHA, b"x\x00")
    blk += _stream(0x40 | N_TYPE, bytes([N_END]))
    assert decode(blk, len(raw)) == raw


def test_known_answer_duplicate_stream_descriptor():
    """Descriptor bit 0x80: the stream is a byte-for-byte alias of an
    earlier (position, type) stream — two bytes name the source."""
    raw = b"ab\x00ab\x00"
    blk = struct.pack("<II", len(raw), 2) + b"\x00"
    blk += _stream(0x40 | N_TYPE, bytes([N_DIFF, N_DIFF]))
    blk += _stream(N_DIFF, struct.pack("<II", 0, 1))
    blk += _stream(0x40 | N_TYPE, bytes([N_ALPHA, N_MATCH]))
    blk += _stream(N_ALPHA, b"ab\x00")
    # position 2's TYPE stream duplicates position 3's... build forward:
    blk += _stream(0x40 | N_TYPE, bytes([N_END, N_END]))  # position 2
    # position 3: TYPE stream aliases position 2's TYPE stream
    blk += bytes([0x80 | 0x40 | N_TYPE, 2, N_TYPE])
    assert decode(blk, len(raw)) == raw


def _walk_encoded(enc):
    """Structural walk of an encoded block (layout rules applied from the
    spec text): 9-byte header, then per stream a descriptor byte; 0x80 →
    two source bytes, else uint7 length + entropy body (decompressed here
    so the PLAIN stream contents can be pinned against hand-derived
    constants — the rANS byte-exactness is pinned by test_rans_nx16's own
    hand-derived vectors, so layering the checks keeps each independent)."""
    from disq_original_spark.sources.rans_nx16 import _read_uint7, decompress

    header, pos, out = enc[:9], 9, []
    while pos < len(enc):
        desc = enc[pos]
        pos += 1
        if desc & 0x80:
            out.append((desc, (enc[pos], enc[pos + 1])))
            pos += 2
        else:
            clen, pos = _read_uint7(enc, pos)
            out.append((desc, decompress(enc[pos : pos + clen])))
            pos += clen
    return header, out


def test_encode_vector_ddelta0_dzlen_paths():
    """Encoder vector (VERDICT r7 directive #4): names 'x007', 'x009'.
    Hand-derived expectation — name 0 tokenizes to ALPHA 'x' +
    DIGITS0 007 (leading zero, so the value 7 goes to the DIGITS0
    stream as uint32-LE and the pad width 3 to DZLEN); name 1 DIFFs
    against it with MATCH at position 1 and DDELTA0 (+2, width
    preserved) at position 2.  Streams serialize in (position, type)
    order, 0x40 marking each position's first stream."""
    raw = b"x007\x00x009\x00"
    header, streams = _walk_encoded(encode(raw))
    assert header == struct.pack("<II", 10, 2) + b"\x00"
    assert streams == [
        (0x40 | N_TYPE, bytes([N_DIFF, N_DIFF])),       # position 0
        (N_DIFF, struct.pack("<II", 0, 1)),
        (0x40 | N_TYPE, bytes([N_ALPHA, N_MATCH])),     # position 1
        (N_ALPHA, b"x\x00"),
        (0x40 | N_TYPE, bytes([N_DIGITS0, N_DDELTA0])),  # position 2
        (N_DZLEN, bytes([3])),                          # pad width 3
        (N_DIGITS0, struct.pack("<I", 7)),              # value 7, LE
        (N_DDELTA0, bytes([2])),                        # 9 = 7 + 2
        (0x40 | N_TYPE, bytes([N_END, N_END])),         # position 3
    ]
    assert decode(encode(raw), len(raw)) == raw


def test_encode_vector_dup_stream_descriptors():
    """Encoder vector for the 0x80 dup-stream descriptor: names
    'ab12cd34', 'ab13cd35'.  Hand-derived expectation — positions 1/3
    share the TYPE pattern [ALPHA, MATCH] and positions 2/4 share
    [DIGITS, DDELTA] plus the delta byte [1], so the encoder must emit
    position 3's TYPE as 0xC0 (dup + first-of-position) referencing
    (1, TYPE), position 4's TYPE as 0xC0 referencing (2, TYPE), and
    position 4's DDELTA as 0x88 (dup, NOT first) referencing
    (2, DDELTA)."""
    raw = b"ab12cd34\x00ab13cd35\x00"
    header, streams = _walk_encoded(encode(raw))
    assert header == struct.pack("<II", 18, 2) + b"\x00"
    assert streams == [
        (0x40 | N_TYPE, bytes([N_DIFF, N_DIFF])),       # position 0
        (N_DIFF, struct.pack("<II", 0, 1)),
        (0x40 | N_TYPE, bytes([N_ALPHA, N_MATCH])),     # position 1
        (N_ALPHA, b"ab\x00"),
        (0x40 | N_TYPE, bytes([N_DIGITS, N_DDELTA])),   # position 2
        (N_DIGITS, struct.pack("<I", 12)),
        (N_DDELTA, bytes([1])),                         # 13 = 12 + 1
        (0xC0 | N_TYPE, (1, N_TYPE)),                   # position 3 TYPE dup
        (N_ALPHA, b"cd\x00"),
        (0xC0 | N_TYPE, (2, N_TYPE)),                   # position 4 TYPE dup
        (N_DIGITS, struct.pack("<I", 34)),
        (0x80 | N_DDELTA, (2, N_DDELTA)),               # dup, not first
        (0x40 | N_TYPE, bytes([N_END, N_END])),         # position 5
    ]
    assert decode(encode(raw), len(raw)) == raw


# ---------------------------------------------------------------- round trips


NAME_SHAPES = [
    [],
    [b""],
    [b"r1"],
    [b"SRR1544323.1", b"SRR1544323.2", b"SRR1544323.3"],
    [b"HS25_09827:2:1105:4242:1069", b"HS25_09827:2:1105:4242:1070",
     b"HS25_09827:2:1106:1:99999"],
    [b"read007", b"read008", b"read010", b"read010"],
    [b"a0b", b"a1b", b"a00000001b"],
    [b"x" * 300],
    [b"12345678901234567890123456789"],  # digit run chunking (>9 digits)
    [b"0"],
    [b"q", b"q", b"q", b"q"],
]


@pytest.mark.parametrize("names", NAME_SHAPES, ids=range(len(NAME_SHAPES)))
def test_encode_decode_round_trip(names):
    raw = b"".join(n + b"\x00" for n in names)
    enc = encode(raw)
    assert decode(enc, len(raw)) == raw


def test_encoder_emits_dup_stream_descriptors():
    """Byte-identical streams (e.g. the TYPE streams of two positions
    with the same per-name type pattern) are emitted once and referenced
    via the 0x80 dup descriptor; the decode side replays them."""
    names = [b"a%db%d" % (i, i) for i in range(100)]
    raw = b"".join(n + b"\x00" for n in names)
    enc = encode(raw)
    # walk descriptors: positions 2 and 4 carry identical DIGITS/DDELTA
    # type patterns, so at least one dup descriptor must appear
    pos, tnum, dups = 9, -1, 0
    from disq_original_spark.sources.rans_nx16 import _read_uint7

    while pos < len(enc):
        ttype = enc[pos]
        pos += 1
        if ttype & 0x40:
            tnum += 1
        if ttype & 0x80:
            dups += 1
            pos += 2
            continue
        clen, pos = _read_uint7(enc, pos)
        pos += clen
    assert dups > 0
    assert decode(enc, len(raw)) == raw


def test_sequential_names_compress_well():
    raw = b"".join(b"machine:1:2:%d:%d\x00" % (i // 7, 1000 + i) for i in range(2000))
    enc = encode(raw)
    assert len(enc) < len(raw) // 4, (len(raw), len(enc))
    assert decode(enc, len(raw)) == raw


@settings(max_examples=150, deadline=None)
@given(
    st.lists(
        st.text(
            alphabet="ACGT:._-0123456789abcZ", min_size=0, max_size=30
        ).map(str.encode),
        min_size=0,
        max_size=40,
    )
)
def test_round_trip_fuzz(names):
    raw = b"".join(n + b"\x00" for n in names)
    enc = encode(raw)
    assert decode(enc, len(raw)) == raw


def test_cram_block_dispatch():
    from disq_original_spark.sources.cram_codec import decompress as blk

    raw = b"".join(b"read:%d\x00" % i for i in range(50))
    assert blk(8, encode(raw), len(raw)) == raw


# ------------------------------------------------------------------ fail loud


def test_bad_use_arith_byte_fails_loud():
    blk = struct.pack("<II", 4, 1) + b"\x07"
    with pytest.raises(ValueError, match="use_arith"):
        decode(blk, 4)


def test_header_size_mismatch_fails_loud():
    raw = b"r1\x00"
    enc = encode(raw)
    with pytest.raises(ValueError, match="raw size"):
        decode(enc, len(raw) + 5)


def test_truncated_stream_fails_loud():
    raw = b"".join(b"read:%d\x00" % i for i in range(20))
    enc = encode(raw)
    with pytest.raises(ValueError):
        decode(enc[: len(enc) - 3], len(raw))


def test_missing_first_position_bit_fails_loud():
    blk = struct.pack("<II", 3, 1) + b"\x00"
    blk += _stream(N_TYPE, bytes([N_DIFF]))  # no 0x40 on the first stream
    with pytest.raises(ValueError, match="new-position"):
        decode(blk, 3)


def test_bad_backreference_fails_loud():
    # name 0 claims DIFF dist 3 — there is no name 3 names back
    raw_len = 3
    blk = struct.pack("<II", raw_len, 1) + b"\x00"
    blk += _stream(0x40 | N_TYPE, bytes([N_DIFF]))
    blk += _stream(N_DIFF, struct.pack("<I", 3))
    with pytest.raises(ValueError, match="references"):
        decode(blk, raw_len)


def test_dup_dist_zero_fails_loud():
    """DUP with dist 0 (a name copying itself) passed the dist>i guard
    and hit a bare IndexError before the r7 review fix."""
    blk = struct.pack("<II", 2, 1) + b"\x00"
    blk += _stream(0x40 | N_TYPE, bytes([N_DUP]))
    blk += _stream(N_DUP, struct.pack("<I", 0))
    with pytest.raises(ValueError, match="references"):
        decode(blk, 2)


def test_mutation_fuzz_never_leaks_bare_errors():
    """Every corruption of a valid block must either decode (harmless
    flip) or raise ValueError — never IndexError/struct.error (the
    fail-loud wrapper contract, r7 review finding: 66/800 mutations
    leaked IndexError before the wrapper)."""
    raw = b"".join(b"read:%d\x00" % i for i in range(30))
    enc = bytearray(encode(raw))
    rng = random.Random(5)
    for _ in range(400):
        m = bytearray(enc)
        for _ in range(rng.randrange(1, 4)):
            m[rng.randrange(len(m))] = rng.randrange(256)
        try:
            decode(bytes(m), len(raw))
        except ValueError:
            pass  # the contract
    # truncations too
    for cut in range(1, len(enc), 7):
        try:
            decode(bytes(enc[:-cut]), len(raw))
        except ValueError:
            pass


def test_encoder_rejects_unterminated_input():
    with pytest.raises(ValueError, match="nul-terminated"):
        encode(b"name-without-nul")


def test_decode_output_must_be_nul_separated():
    """A block whose names don't reassemble to the declared size fails
    loud instead of silently emitting the wrong bytes."""
    raw = b"r1\x00"
    enc = bytearray(encode(raw))
    struct.pack_into("<I", enc, 0, len(raw) + 1)  # lie about ulen
    with pytest.raises(ValueError, match="declares"):
        decode(bytes(enc), len(raw) + 1)


def test_encode_vector_whole_name_dup_stream():
    """Byte-pinned ENCODER vector for the whole-name N_DUP token mode
    (VERDICT r9 task #7 — previously decode-vector + round-trip only):
    'q','q','q' tokenizes identically each time, so names 2 and 3 must
    encode as position-0 TYPE = DUP with uint32-LE distance 1 and emit
    NOTHING at any other position for them."""
    raw = b"q\x00q\x00q\x00"
    header, streams = _walk_encoded(encode(raw))
    assert header == struct.pack("<II", 6, 3) + b"\x00"
    assert streams == [
        (0x40 | N_TYPE, bytes([N_DIFF, N_DUP, N_DUP])),  # position 0
        (N_DUP, struct.pack("<II", 1, 1)),               # two copies, dist 1
        (N_DIFF, struct.pack("<I", 0)),                  # first name: dist 0
        (0x40 | N_TYPE, bytes([N_ALPHA])),               # position 1: one name only
        (N_ALPHA, b"q\x00"),
        (0x40 | N_TYPE, bytes([N_END])),                 # position 2 terminator
    ]
    assert decode(encode(raw), len(raw)) == raw
