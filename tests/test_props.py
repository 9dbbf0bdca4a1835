"""Property-based tests (hypothesis) for codec primitives — the byte-level
layers everything else stands on."""

from __future__ import annotations

import io

from hypothesis import given, settings
from hypothesis import strategies as st

from disq_original_spark.sources import rans4x8
from disq_original_spark.sources.cram_codec import Buf
from disq_original_spark.sources.cram_writer import itf8, ltf8


@given(st.integers(min_value=-(2**31), max_value=2**31 - 1))
def test_itf8_roundtrip(v):
    assert Buf(itf8(v)).itf8() == v


@given(st.integers(min_value=0, max_value=2**63 - 1))
def test_ltf8_roundtrip(v):
    assert Buf(ltf8(v)).ltf8() == v


@given(st.binary(max_size=4096), st.sampled_from([0, 1]))
@settings(max_examples=200, deadline=None)
def test_rans_roundtrip_property(data, order):
    assert rans4x8.decompress(rans4x8.compress(data, order)) == data


@given(st.binary(min_size=1, max_size=200000))
@settings(max_examples=30, deadline=None)
def test_bgzf_roundtrip_property(data):
    from disq_original_spark.sources.bgzf import BgzfReader, BgzfWriter

    buf = io.BytesIO()
    with BgzfWriter(buf, write_terminator=True) as w:
        w.write(data)
    buf.seek(0)
    reader = BgzfReader(buf)
    reader.seek_virtual(0)
    assert reader.read(len(data) + 10) == data


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=100),  # pos
            st.text(alphabet="ACGTN", min_size=1, max_size=50),  # seq
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(max_examples=50, deadline=None)
def test_cram_container_roundtrip_property(reads):
    """Arbitrary unmapped reads survive encode->decode exactly."""
    from disq_original_spark.sources.cram_codec import (
        CramFileMeta,
        decode_container,
    )
    from disq_original_spark.sources.cram_writer import encode_container

    rows = [
        {
            "qname": f"r{i}",
            "flag": 4,
            "rname": None,
            "pos": 0,
            "mapq": 0,
            "cigar": "*",
            "rnext": None,
            "pnext": 0,
            "tlen": 0,
            "seq": seq,
            "qual": "I" * len(seq),
            "attributes": {},
        }
        for i, (pos, seq) in enumerate(reads)
    ]
    data = encode_container(rows, [], [], None)
    meta = CramFileMeta(2, 1, "", [], [])
    back, _ = decode_container(data, 0, meta)
    assert [(r["qname"], r["seq"], r["qual"]) for r in back] == [
        (r["qname"], r["seq"], r["qual"]) for r in rows
    ]


_REFS = ["chr1", "chr2"]


@given(
    st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126, exclude_characters="@"),
        min_size=1,
        max_size=20,
    ),
    st.integers(min_value=0, max_value=0xFFFF),  # flag
    st.sampled_from([None, "chr1", "chr2"]),
    st.integers(min_value=1, max_value=10_000_000),  # pos
    st.integers(min_value=0, max_value=254),  # mapq
    st.text(alphabet="ACGTN", min_size=1, max_size=60),  # seq
    st.integers(min_value=-1_000_000, max_value=1_000_000),  # tlen
    st.dictionaries(
        st.text(alphabet="ABXYZ", min_size=2, max_size=2),
        st.one_of(
            st.integers(min_value=-1000, max_value=1000).map(lambda v: f"i:{v}"),
            st.text(alphabet="abc xyz", max_size=12).map(lambda s: f"Z:{s}"),
        ),
        max_size=3,
    ),
)
@settings(max_examples=150, deadline=None)
def test_bam_record_roundtrip_property(qname, flag, rname, pos, mapq, seq, tlen, attrs):
    """Arbitrary reads-schema rows survive encode_record -> parse_record."""
    from disq_original_spark.sources.bam_codec import encode_record, parse_record

    row = {
        "qname": qname,
        "flag": flag,
        "rname": rname,
        "pos": pos if rname else 0,
        "mapq": mapq,
        "cigar": f"{len(seq)}M" if rname else "*",
        "rnext": None,
        "pnext": 0,
        "tlen": tlen,
        "seq": seq,
        "qual": "I" * len(seq),
        "attributes": attrs,
    }
    ref_index = {name: i for i, name in enumerate(_REFS)}
    blob = encode_record(row, ref_index)
    parsed, consumed = parse_record(blob, 0, _REFS)
    assert consumed == len(blob)
    for k in ("qname", "flag", "rname", "mapq", "cigar", "tlen", "seq", "qual"):
        assert parsed[k] == row[k], k
    assert parsed["pos"] == (pos if rname else 0)
    assert parsed["attributes"] == attrs


@given(st.integers(min_value=2**31, max_value=2**32 - 1))
@settings(max_examples=20, deadline=None)
def test_unsigned_aux_tag_roundtrips(v):
    """'I'-typed aux values >= 2^31 (normalized to 'i:' on parse) must
    re-encode as unsigned, not crash struct.pack('<i')."""
    from disq_original_spark.sources.bam_codec import encode_record, parse_record

    row = {
        "qname": "r",
        "flag": 4,
        "rname": None,
        "pos": 0,
        "mapq": 0,
        "cigar": "*",
        "rnext": None,
        "pnext": 0,
        "tlen": 0,
        "seq": "A",
        "qual": "I",
        "attributes": {"XX": f"i:{v}"},
    }
    blob = encode_record(row, {})
    parsed, consumed = parse_record(blob, 0, [])
    assert consumed == len(blob)
    assert parsed["attributes"] == {"XX": f"i:{v}"}


def test_parse_aux_handles_memoryview():
    """Z tags parsed from a memoryview must terminate at NUL, not swallow
    the following tags."""
    from disq_original_spark.sources.bam_codec import encode_record, parse_record

    row = {
        "qname": "r",
        "flag": 4,
        "rname": None,
        "pos": 0,
        "mapq": 0,
        "cigar": "*",
        "rnext": None,
        "pnext": 0,
        "tlen": 0,
        "seq": "A",
        "qual": "I",
        "attributes": {"XA": "Z:hello", "XB": "i:7"},
    }
    blob = encode_record(row, {})
    parsed, _ = parse_record(memoryview(blob), 0, [])
    assert parsed["attributes"] == {"XA": "Z:hello", "XB": "i:7"}


_B_SUBS = "cCsSiI"
_B_RANGES = {
    "c": (-128, 127), "C": (0, 255), "s": (-(2**15), 2**15 - 1),
    "S": (0, 2**16 - 1), "i": (-(2**31), 2**31 - 1), "I": (0, 2**32 - 1),
}


@given(
    st.sampled_from(_B_SUBS).flatmap(
        lambda sub: st.lists(
            st.integers(*_B_RANGES[sub]), min_size=0, max_size=8
        ).map(lambda vs: (sub, vs))
    ),
    st.sampled_from("!~Qz"),  # 'A' char values
    st.integers(min_value=-(2**12), max_value=2**12),  # f halves: exact fp
)
@settings(max_examples=150, deadline=None)
def test_aux_tag_all_types_roundtrip(sub_vals, a_char, f_half):
    """Every aux tag TYPE survives encode_record -> parse_record: A (char),
    f (float, on exactly-representable halves so text round-trips), Z, and
    B arrays of each integer subtype at their full value ranges — the
    paths the hoisted lookup tables and the one-shot B-array unpack
    rewrote."""
    from disq_original_spark.sources.bam_codec import encode_record, parse_record

    sub, vals = sub_vals
    f_val = f_half / 2
    attrs = {
        "XB": f"B:{sub}," + ",".join(str(v) for v in vals)
        if vals
        else f"B:{sub},",
        "XA": f"A:{a_char}",
        "XF": f"f:{f_val:g}",
        "XZ": "Z:text with spaces",
    }
    row = {
        "qname": "r", "flag": 4, "rname": None, "pos": 0, "mapq": 0,
        "cigar": "*", "rnext": None, "pnext": 0, "tlen": 0,
        "seq": "A", "qual": "I", "attributes": attrs,
    }
    blob = encode_record(row, {})
    parsed, consumed = parse_record(memoryview(blob), 0, [])
    assert consumed == len(blob)
    assert parsed["attributes"] == attrs


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 22),  # beg0
            st.integers(min_value=1, max_value=1 << 16),  # span
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=1 << 22),  # query beg
    st.integers(min_value=1, max_value=1 << 18),  # query span
    st.sampled_from([(14, 5), (12, 6), (10, 4)]),
)
@settings(max_examples=120, deadline=None)
def test_csi_query_never_misses_overlap(feats, qbeg, qspan, geometry):
    """The load-bearing index invariant: for ANY feature layout and ANY
    query, every feature overlapping the query must have its voffset chunk
    admitted by the index — false negatives are data loss (false positives
    only cost the residual filter work)."""
    import os
    import tempfile

    from disq_original_spark.sources.csi import (
        CsiAccumulator,
        csi_query_chunks,
        parse_csi,
    )

    min_shift, depth = geometry
    acc = CsiAccumulator(1, min_shift, depth)
    feats = sorted((b, b + s) for b, s in feats)  # indexers see sorted input
    for i, (b, e) in enumerate(feats):
        acc.add(0, b, e, i << 16, (i << 16) + 100)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.csi")
        open(p, "wb").write(acc.dump())
        idx = parse_csi(p)
    qend = qbeg + qspan  # 0-based half-open query [qbeg, qend)
    got = csi_query_chunks(idx.bins[0], qbeg + 1, qend, min_shift, depth)
    admitted = set()
    for u, v in got:
        admitted.update(range(u >> 16, ((v - 1) >> 16) + 1))
    for i, (b, e) in enumerate(feats):
        if b < qend and e > qbeg:  # overlaps
            assert i in admitted, (i, (b, e), (qbeg, qend), geometry)


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=1 << 22),
            st.integers(min_value=1, max_value=1 << 16),
        ),
        min_size=1,
        max_size=60,
    ),
    st.integers(min_value=0, max_value=1 << 22),
    st.integers(min_value=1, max_value=1 << 18),
)
@settings(max_examples=120, deadline=None)
def test_tabix_accumulator_query_never_misses_overlap(feats, qbeg, qspan):
    """Same invariant through the TabixAccumulator dump -> parse_tabix ->
    bin_query_chunks pipeline (exercises the serialized form, not just the
    in-memory accumulator)."""
    import tempfile, os

    from disq_original_spark.sources.tabix import (
        TabixAccumulator,
        bin_query_chunks,
        parse_tabix,
    )

    acc = TabixAccumulator()
    feats = sorted((b, b + s) for b, s in feats)
    for i, (b, e) in enumerate(feats):
        acc.add("c1", b, e, i << 16, (i << 16) + 100)
    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "x.tbi")
        open(p, "wb").write(acc.dump())
        idx = parse_tabix(p)
    qend = qbeg + qspan
    got = bin_query_chunks(idx.bins[0], idx.linear[0], qbeg + 1, qend)
    admitted = set()
    for u, v in got:
        admitted.update(range(u >> 16, ((v - 1) >> 16) + 1))
    for i, (b, e) in enumerate(feats):
        if b < qend and e > qbeg:
            assert i in admitted, (i, (b, e), (qbeg, qend))


@given(
    toks=st.lists(st.integers(min_value=1, max_value=400), min_size=0, max_size=60),
)
@settings(max_examples=200, deadline=None)
def test_sequence_packing_invariants(toks):
    """Next-fit packing invariants, pure-Python (no Spark): every sequence
    fits the budget unless it is an oversized singleton; doc order and
    counts are preserved; sequence indices are dense from 0."""
    import pandas as pd

    from disq_original_spark.queries.packing import _CAPACITY, _pack_bucket

    pdf = pd.DataFrame(
        {"doc_id": range(len(toks)), "bucket": 0, "toks": toks}
    )
    out = _pack_bucket(pdf)
    assert out["n_docs"].sum() == len(toks)
    assert out["seq_tokens"].sum() == sum(toks)
    assert list(out["seq_idx"]) == list(range(len(out)))
    for _, row in out.iterrows():
        assert row["seq_tokens"] <= _CAPACITY or row["n_docs"] == 1
    # next-fit is greedy: two consecutive sequences can never be merged
    st_tokens = list(out["seq_tokens"])
    first_tok_of_seq = []
    i = 0
    for _, row in out.iterrows():
        first_tok_of_seq.append(toks[i])
        i += int(row["n_docs"])
    for prev, nxt_first in zip(st_tokens, first_tok_of_seq[1:]):
        assert prev + nxt_first > _CAPACITY


def test_keep_hash_engine_parity_at_extreme_ids(spark):
    """p02's keep-hash must agree between Spark, DuckDB, and exact Python
    arithmetic for the FULL int64 id domain — including doc_id = 2^33, where
    the naive doc_id * KNUTH product overflows int64 (Spark would wrap,
    DuckDB would raise)."""
    import duckdb

    from disq_original_spark.queries.packing import _KEEP_HASH_SQL, _KNUTH, _keep_hash_col

    ids = [0, 1, 99, 2**31 - 1, 2**32 - 1, 2**32, 2**33, 2**33 + 7,
           3_500_000_000, 10**12 + 17, 2**62, 2**63 - 1]
    # high-bits scaling (h32 * mod >> 32), NOT % mod — the low bits of
    # a multiplicative hash are unmixed (see packing._knuth_hash_sql)
    expected = [(((v & 0xFFFFFFFF) * _KNUTH) % 2**32) * 100 >> 32 for v in ids]

    df = spark.createDataFrame([(v,) for v in ids], "doc_id long")
    got_spark = [r[0] for r in df.select(_keep_hash_col().alias("h")).collect()]
    assert got_spark == expected

    con = duckdb.connect()
    rows = ", ".join(f"({v})" for v in ids)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_KEEP_HASH_SQL} FROM (VALUES {rows}) AS t(doc_id) "
        ).fetchall()
    ]
    assert got_duck == expected


def test_text_normalization_cross_engine_adversarial(spark):
    """Every text operator rests on one contract: Spark's split, DuckDB's
    string_split_regex, and the pytwins re-implementation tokenize
    IDENTICALLY for any input.  The whitespace run is the EXPLICIT class
    [ \\t\\n\\x0b\\f\\r]+ in all three, because Java's \\s includes
    vertical tab while RE2's excludes it — with '\\s+' the engines diverge
    on any document containing \\x0b.  Pin the contract on adversarial
    inputs — exotic unicode whitespace, zero-width chars, CJK, emoji,
    case-folding edge cases — because a silent divergence here would skew
    every t/d/p operator at once while small fixtures stay green."""
    import duckdb

    from disq_original_spark.functions import tokens
    from disq_original_spark.functions.pytwins import py_tokens

    nasty = [
        "",
        " ",
        "\t\n\r\f\v",
        "plain ascii words",
        "  leading and trailing  ",
        "multiple   internal\t\tspaces",
        "nbsp is not ascii space",
        "line sep and para sep",
        "zero​width space",
        "ideographic　space",
        "CJK 中文 分词 测试",
        "emoji 🙂 and 👍🏽 tokens",
        "GREEK Σ SIGMA ς",
        "combining é vs é",
        "tab\tmix \nnewline",
        "ALLCAPS MiXeD case",
        "punct,comma.dot;semi",
        "num3r1c 123 456.78",
        "a",
    ]
    # KNOWN oracle boundary, deliberately pinned: lower() itself diverges on
    # locale-sensitive case mappings — Java/Python apply the full Unicode
    # mapping (U+0130 İ → 'i' + combining dot above), DuckDB's lower() the
    # simple single-codepoint one ('i').  The ENGINE (Spark) and its Python
    # twins stay mutually consistent, so pipeline results are
    # self-consistent; DuckDB-as-oracle byte-parity is scoped to text
    # without such mappings (the driver corpus is ASCII).
    divergent_lower = ["Turkish \u0130 and dotless \u0131"]
    alltexts = nasty + divergent_lower
    df = spark.createDataFrame(
        [(i, s) for i, s in enumerate(alltexts)], "i long, t string"
    )
    spark_toks = {
        r["i"]: list(r["toks"])
        for r in df.select("i", tokens("t").alias("toks")).collect()
    }
    con = duckdb.connect()
    duck_toks = {
        i: con.execute(
            r"SELECT string_split_regex(lower(trim(?)), '[ \t\n\x0b\f\r]+')", [s]
        ).fetchone()[0]
        for i, s in enumerate(alltexts)
    }
    py_toks = {i: py_tokens(s) for i, s in enumerate(alltexts)}
    for i, s in enumerate(alltexts):
        # Spark and the Python twins must agree on EVERY input — they feed
        # the same fused passes and a split here is silent corruption.
        assert spark_toks[i] == py_toks[i], (s, spark_toks[i], py_toks[i])
        if s in divergent_lower:
            assert spark_toks[i] != duck_toks[i], f"divergence healed? {s!r}"
        else:
            assert spark_toks[i] == duck_toks[i], (s, spark_toks[i], duck_toks[i])


def test_encode_unknown_bases_map_to_n_in_both_nibble_positions():
    """Unknown sequence characters encode as code 15 ('N') regardless of
    nibble position.  (The pre-r9 per-base loop mapped odd-position
    unknowns to 0 == '=', an inconsistency nothing pinned; the hex-trick
    encoder is position-uniform by construction.)"""
    from disq_original_spark.sources.bam_codec import encode_record, parse_record

    row = {
        "qname": "u", "flag": 4, "rname": None, "pos": 0, "mapq": 0,
        "cigar": "*", "rnext": None, "pnext": 0, "tlen": 0,
        # unknowns in even (X) and odd (Z, ?) positions, plus lowercase
        "seq": "AXGZacN?T", "qual": "IIIIIIIII", "attributes": {},
    }
    blob = encode_record(row, {})
    back, _ = parse_record(memoryview(blob), 0, [], None)
    assert back["seq"] == "ANGNNNNNT"


def test_int_units_engine_parity_on_boundary_doubles(spark):
    """The single-sourced cents idiom (`relational._int_units`, DuckDB twin
    ``CAST(floor(x*scale + 0.5) AS BIGINT)``) must agree between Spark,
    DuckDB, and exact Python arithmetic on its declared domain — doubles
    whose true value is an exact multiple of 1/scale — INCLUDING the
    half-boundary class that flipped t14 at sf0.1 (r11): constructed
    values where x*scale lands within one ulp of K + 0.5.

    Domain note pinned here: the idiom recovers K = round(x·scale)
    exactly while K stays well below 2^52 (the double x·scale then
    carries < 0.5 absolute error); e2 cents of any realistic price and
    e4/e6 micro-units of bounded scores sit far inside that."""
    import duckdb
    from pyspark.sql import functions as F

    from disq_original_spark.queries.relational import _int_units

    # Family A — e2-exact rationals K/100 across magnitudes (incl. near
    # 2^50): the idiom must recover K exactly, same value in both engines.
    ks = [0, 1, 49, 50, 51, 99, 100, 12345, 10**6 + 50, 10**9 + 50,
          10**12 + 49, 10**12 + 50, 2**50 - 1, 2**50 + 51]
    # Family B — the adversarial half-boundary family: E·(100−D) ≡ 50
    # (mod 100), so the discounted price in cents is an EXACT ....5
    # boundary in the rationals.  The double can land an ulp either side
    # (0.03 · 7.5 = 22.4999…98), so the contract here is NOT half-up of
    # the rational — it is (a) BOTH ENGINES IDENTICAL (same double, same
    # IEEE ops — the property every oracle hash rides on) and (b) the
    # result is the floor or the ceil of the true half, never anything
    # else.  `round()` instead of floor(x+0.5) breaks (a): Spark rounds
    # the shortest-decimal rendering, DuckDB the binary value
    # (SCALE.md r11, the t14 sf0.1 flip).
    bnd: list[tuple[float, int]] = []          # (x, true_half_floor = E·D'//100)
    for e in (3, 51, 12351, 999951):           # price cents
        for d in (50, 150, 350, 750):          # (100−D) with e·d % 100 == 50
            if (e * d) % 100 != 50:
                continue
            bnd.append(((e / 100) * (d / 100), (e * d) // 100))

    xs = [k / 100 for k in ks] + [x for x, _ in bnd]
    df = spark.createDataFrame([(float(x),) for x in xs], "x double")
    got_spark = [r[0] for r in df.select(_int_units(F.col("x")).alias("u")).collect()]

    con = duckdb.connect()
    rows = ", ".join(f"({x!r})" for x in xs)
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT CAST(floor(x * 100 + 0.5) AS BIGINT) "
            f"FROM (VALUES {rows}) AS t(x)"
        ).fetchall()
    ]
    # cross-engine identity on EVERY input, boundary or not
    assert got_spark == got_duck, list(zip(xs, got_spark, got_duck))
    # family A: exact recovery of K
    assert got_spark[: len(ks)] == ks, list(zip(xs, got_spark, ks))
    # family B: floor-or-ceil of the true half, nothing else
    for (x, lo), got in zip(bnd, got_spark[len(ks):]):
        assert got in (lo, lo + 1), (x, got, lo)
