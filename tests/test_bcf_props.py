"""Property-based BCF codec fuzzing: random records under a declared header
must survive encode→decode under the typed-format contract, for every value
shape the spec allows (scalar/vector ints of every width, float32 vectors,
strings, flags, ragged per-sample vectors, arbitrary ploidy/phasing/missing
GTs, '.' filters vs PASS vs named).  Pure Python — no Spark session — so
hypothesis can run hundreds of examples."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from disq_original_spark.sources.bcf import (
    BcfContext,
    _fmt_float32,
    _Reader,
    decode_record,
    encode_record,
)

_HEADER = (
    "##fileformat=VCFv4.3\n"
    "##contig=<ID=c1,length=1000000>\n"
    "##contig=<ID=c2,length=500000>\n"
    '##FILTER=<ID=q10,Description="q">\n'
    '##FILTER=<ID=s50,Description="s">\n'
    '##INFO=<ID=NS,Number=1,Type=Integer,Description="x">\n'
    '##INFO=<ID=AC,Number=A,Type=Integer,Description="x">\n'
    '##INFO=<ID=AF,Number=A,Type=Float,Description="x">\n'
    '##INFO=<ID=AA,Number=1,Type=String,Description="x">\n'
    '##INFO=<ID=DB,Number=0,Type=Flag,Description="x">\n'
    '##FORMAT=<ID=GT,Number=1,Type=String,Description="x">\n'
    '##FORMAT=<ID=GQ,Number=1,Type=Integer,Description="x">\n'
    '##FORMAT=<ID=AD,Number=R,Type=Integer,Description="x">\n'
    '##FORMAT=<ID=GL,Number=G,Type=Float,Description="x">\n'
    '##FORMAT=<ID=FT,Number=1,Type=String,Description="x">\n'
    "#CHROM\tPOS\tID\tREF\tALT\tQUAL\tFILTER\tINFO\tFORMAT\tS1\tS2\tS3\n"
)
_CTX = BcfContext(_HEADER)

_bases = st.text(alphabet="ACGT", min_size=1, max_size=8)

# ints covering all three widths, away from the reserved sentinel band
_ints = st.integers(min_value=-2_000_000_000, max_value=2_000_000_000)


def _f32(x: float) -> str:
    return _fmt_float32(np.float32(x))


_floats = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
).map(_f32)


def _int_vec(min_size=1, max_size=4):
    return st.lists(
        st.one_of(st.just("."), _ints.map(str)), min_size=min_size, max_size=max_size
    ).map(",".join)


def _float_vec(min_size=1, max_size=4):
    return st.lists(
        st.one_of(st.just("."), _floats), min_size=min_size, max_size=max_size
    ).map(",".join)


def _gt_fixed(draw):
    n = draw(st.integers(1, 3))
    alleles = [draw(st.sampled_from(["0", "1", "2", "."])) for _ in range(n)]
    seps = [draw(st.sampled_from(["/", "|"])) for _ in range(n - 1)]
    out = alleles[0]
    for a, s in zip(alleles[1:], seps):
        out += s + a
    return out


_record = st.fixed_dictionaries(
    {
        "contig": st.sampled_from(["c1", "c2"]),
        "pos": st.integers(1, 900_000),
        "id": st.one_of(st.none(), st.text(alphabet="rs0123456789", min_size=1, max_size=8)),
        "ref": _bases,
        "alts": st.lists(_bases, max_size=3),
        "qual": st.one_of(
            st.none(),
            st.floats(0, 1e4, allow_nan=False).map(lambda x: float(np.float32(x))),
        ),
        "filters": st.one_of(
            st.none(),
            st.just([]),
            st.lists(st.sampled_from(["q10", "s50"]), min_size=1, max_size=2, unique=True),
        ),
        "info": st.fixed_dictionaries(
            {},
            optional={
                "NS": _ints.map(str),
                "AC": _int_vec(),
                "AF": _float_vec(),
                "AA": st.text(alphabet="ACGTN", min_size=1, max_size=6),
                "DB": st.just(""),
            },
        ),
        "genotypes": st.lists(
            st.fixed_dictionaries(
                {
                    "attrs": st.fixed_dictionaries(
                        {},
                        optional={
                            "GT": st.composite(lambda draw: _gt_fixed(draw))(),
                            "GQ": _ints.map(str),
                            "AD": _int_vec(max_size=4),
                            "GL": _float_vec(max_size=3),
                            "FT": st.one_of(
                                st.just("."),
                                st.text(alphabet="PASqlowD;_", min_size=1, max_size=10),
                            ),
                        },
                    )
                }
            ),
            min_size=0,
            max_size=3,
        ),
    }
)


def _expect_value(v: str) -> str | None:
    """Decoder-side canonical form of an encoded string-vector value:
    all-missing collapses to absent (None)."""
    parts = v.split(",")
    if all(p == "." for p in parts):
        return None
    return v


def _expected(rec: dict) -> dict:
    """The typed-format contract applied to the input record."""
    genos = []
    for i, g in enumerate(rec["genotypes"][:3]):
        attrs = {}
        for k, v in g["attrs"].items():
            if k == "GT":
                # lone missing allele == absent GT
                if v == ".":
                    continue
                attrs[k] = v
            else:
                ev = _expect_value(v)
                if ev is not None:
                    attrs[k] = ev
        genos.append(
            {"sample": _CTX.samples[i], "gt": attrs.get("GT"), "attrs": attrs}
        )
    info = {}
    for k, v in rec["info"].items():
        if k == "DB":
            info[k] = ""
        elif v == "":
            info[k] = "."
        else:
            info[k] = _expect_value(v) or "."
    return {
        "contig": rec["contig"],
        "pos": rec["pos"],
        "id": rec["id"],
        "ref": rec["ref"],
        "alts": list(rec["alts"]),
        "qual": rec["qual"],
        "filters": rec["filters"],
        "info": info,
        "genotypes": genos,
    }


@settings(max_examples=800, deadline=None)
@given(_record)
def test_bcf_record_round_trip(rec):
    # all samples must carry dict attrs (schema contract)
    rec = dict(rec)
    rec["genotypes"] = [
        {"sample": _CTX.samples[i], "gt": g["attrs"].get("GT"), "attrs": g["attrs"]}
        for i, g in enumerate(rec["genotypes"])
    ]
    data = encode_record(rec, _CTX)
    got = decode_record(_Reader(data, 0), _CTX)
    want = _expected(rec)
    assert got == want, f"\nin:   {rec}\ngot:  {got}\nwant: {want}"


@settings(max_examples=100, deadline=None)
@given(
    n_alts=st.integers(min_value=63, max_value=80),
    ploidy=st.integers(min_value=1, max_value=3),
    phased=st.booleans(),
)
def test_bcf_gt_widens_past_int8(n_alts, ploidy, phased):
    """GT vectors referencing alleles past 62 must widen to int16 and
    round-trip (encoded value (allele+1)<<1|phase > 127) — including mixed
    ploidy so the int16 END_OF_VECTOR padding is exercised."""
    sep = "|" if phased else "/"
    gt_hi = sep.join([str(n_alts)] * ploidy)
    rec = {
        "contig": "c1", "pos": 10, "id": None, "ref": "A",
        "alts": ["A" * (i + 2) for i in range(n_alts)],
        "qual": None, "filters": None, "info": {},
        "genotypes": [
            {"attrs": {"GT": gt_hi}},
            {"attrs": {"GT": "0"}},  # haploid: needs type-correct EOV pad
            {"attrs": {}},
        ],
    }
    back = decode_record(_Reader(encode_record(rec, _CTX), 0), _CTX)
    gts = [g["gt"] for g in back["genotypes"]]
    assert gts == [gt_hi, "0", None]
    assert back["alts"] == rec["alts"]
