"""Malformed-input behavior: corrupt or truncated inputs must raise, never
silently return partial data — on a 100 TB pipeline a reader that drops the
tail of a truncated shard is the worst failure mode there is (silent data
loss that no downstream count will catch)."""

from __future__ import annotations

from pathlib import Path

import pytest

from disq_original_spark.sources.bam import BamSource
from disq_original_spark.sources.vcf import VcfSource

BAM = "/root/reference/src/test/resources/1.bam"
HISEQ = "/root/reference/src/test/resources/HiSeq.10000.vcf.bgz"


def test_truncated_bam_raises_not_partial(spark, tmp_path):
    data = Path(BAM).read_bytes()
    trunc = tmp_path / "trunc.bam"
    trunc.write_bytes(data[: int(len(data) * 0.6)])
    with pytest.raises(Exception):
        BamSource().read(spark, str(trunc), split_size=128 * 1024).count()


def test_bam_bad_magic_raises_cleanly(spark, tmp_path):
    data = Path(BAM).read_bytes()
    bad = tmp_path / "bad.bam"
    bad.write_bytes(b"XXXX" + data[4:])
    with pytest.raises(ValueError, match="BGZF"):
        BamSource().read(spark, str(bad), split_size=128 * 1024).count()


def test_truncated_bgzf_vcf_raises_not_partial(spark, tmp_path):
    data = Path(HISEQ).read_bytes()
    trunc = tmp_path / "trunc.vcf.bgz"
    # cut inside a compressed block (not on a block boundary)
    trunc.write_bytes(data[: int(len(data) * 0.6) + 13])
    with pytest.raises(Exception):
        VcfSource().read(spark, str(trunc), split_size=64 * 1024).count()
