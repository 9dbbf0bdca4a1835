"""Freshness guard for the committed genomics oracle parquet twins
(fixtures/oracle/, built by tools/build_oracle_fixtures.py).

The g03/g04/g06/g07/g10-g15/g19-g24 oracles run DuckDB SQL over these
parquet files.  If a decoder changes behavior, the committed twin must be
regenerated or the driver's hash rows silently anchor to stale decode
output — so this test re-derives every frame from the live decoders and
compares logical content (schema-insensitive cell equality) against the
committed files.  A red here means: re-run tools/build_oracle_fixtures.py
and review the diff (intentional decoder change) or fix the decoder
regression it just caught."""

from __future__ import annotations

import sys
from pathlib import Path

import pandas as pd
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "tools"))

from build_oracle_fixtures import OUT, build_frames  # noqa: E402

from .util import assert_frames_match  # noqa: E402


@pytest.fixture(scope="module")
def fresh_frames(spark):
    return build_frames(spark)


def _committed(name: str) -> pd.DataFrame:
    path = OUT / name
    assert path.exists(), f"missing committed fixture {path}; run tools/build_oracle_fixtures.py"
    return pd.read_parquet(path)


@pytest.mark.parametrize(
    "name",
    [
        "bam_1_reads.parquet",
        "bam_1_contigs.parquet",
        "bam_1_dupsig.parquet",
        "bam_sharded_reads.parquet",
        "bam_sharded_spans.parquet",
        "vcf_hiseq.parquet",
        "vcf_hiseq_gt.parquet",
        "vcf_test.parquet",
        "fasta_valid_seqs.parquet",
    ],
)
def test_committed_fixture_matches_fresh_decode(fresh_frames, name):
    assert name in fresh_frames
    assert_frames_match(fresh_frames[name], _committed(name), name)


def test_oracles_reference_only_committed_fixtures():
    """Every read_parquet() path in a genomics oracle must point at a file
    that exists in fixtures/oracle/ (a renamed fixture or a typo'd path
    would otherwise surface only as a driver-side oracle error)."""
    import re

    from disq_original_spark.queries import QUERIES

    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        for m in re.findall(r"read_parquet\('([^']+)'\)", q.oracle):
            assert Path(m).exists(), f"{name}: oracle references missing {m}"
