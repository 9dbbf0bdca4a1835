"""rANS 4x8 codec round-trips (CRAM 3.0 block method 4) and CRAM 3.0
write->read via the full container path."""

from __future__ import annotations

import random
from pathlib import Path

import pytest

from disq_original_spark.sources import rans4x8

RES = Path("/root/reference/src/test/resources")


@pytest.mark.parametrize("order", [0, 1])
@pytest.mark.parametrize(
    "name,data",
    [
        ("empty", b""),
        ("single", b"A"),
        ("const", b"Q" * 10000),
        ("short", b"xyz"),
        (
            "quals",
            bytes(
                random.Random(7).choices(b"!#$%&'()*+,-./0123456789:;<=>?@ABCDEFGHIJ", k=65537)
            ),
        ),
        ("uniform", bytes(random.Random(9).randrange(256) for _ in range(20000))),
        (
            "runs",
            bytes(random.Random(11).choices(range(60, 90), k=30000)),
        ),
    ],
)
def test_rans_roundtrip(order, name, data):
    enc = rans4x8.compress(data, order)
    assert rans4x8.decompress(enc) == data


def test_rans_compresses_skewed_data():
    data = bytes(random.Random(3).choices(range(4), k=50000))
    assert len(rans4x8.compress(data, 0)) < len(data) // 3


def test_cram_v3_roundtrip_with_rans(spark, tmp_path):
    from disq_original_spark.sources.cram import CramSink, CramSource
    from disq_original_spark.sources.cram_codec import decode_cram, read_cram_meta

    cram = str(RES / "valid.cram")
    fasta = str(RES / "valid.fasta")
    hdr = read_cram_meta(Path(cram).read_bytes())[0].header_text
    df = CramSource().read(spark, cram, reference_path=fasta)
    out = str(tmp_path / "v3.cram")
    CramSink().write(df, hdr, out, reference_path=fasta, version=(3, 0))
    data = Path(out).read_bytes()
    assert (data[4], data[5]) == (3, 0)
    back = decode_cram(out, fasta)
    orig = decode_cram(cram, fasta)
    key = lambda r: (r["qname"], r["flag"], r["pos"], r["cigar"], r["seq"], r["qual"])
    assert sorted(map(key, back)) == sorted(map(key, orig))
    # and the distributed reader handles v3 containers
    assert CramSource().read(spark, out, reference_path=fasta).count() == len(orig)
