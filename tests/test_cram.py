"""CRAM container machinery vs the reference fixtures: container offsets
must agree with the .crai index; split planning snaps to containers."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from disq_original_spark.sources.cram import (
    CramSource,
    enumerate_containers,
    read_crai_offsets,
    read_file_definition,
    snap_splits_to_containers,
)

RES = Path("/root/reference/src/test/resources")
CRAM = str(RES / "valid.cram")
CRAM_NOIDX = str(RES / "valid_no_index.cram")


def test_file_definition():
    with open(CRAM, "rb") as fh:
        major, minor = read_file_definition(fh)
    assert (major, minor) == (2, 1)


def test_container_offsets_match_crai():
    with open(CRAM, "rb") as fh:
        containers = enumerate_containers(fh)
    data_offsets = [c.offset for c in containers if not c.is_eof and c.n_records > 0]
    assert data_offsets == read_crai_offsets(CRAM + ".crai")


def test_eof_container_detected():
    with open(CRAM, "rb") as fh:
        containers = enumerate_containers(fh)
    assert containers[-1].is_eof
    # container chain tiles the file exactly
    assert sum(1 for c in containers if c.is_eof) == 1


def test_no_index_scan_agrees_with_indexed():
    with open(CRAM, "rb") as fh:
        a = [c.offset for c in enumerate_containers(fh) if c.n_records > 0]
    with open(CRAM_NOIDX, "rb") as fh:
        b = [c.offset for c in enumerate_containers(fh) if c.n_records > 0]
    assert len(a) == len(b)  # same content, same container shape


def test_split_planning_drops_empty_and_covers_all():
    src = CramSource()
    chunks = src.plan_splits(CRAM, split_size=2048)
    with open(CRAM, "rb") as fh:
        data_offsets = [c.offset for c in enumerate_containers(fh) if c.n_records > 0]
    covered = set()
    for s, e in chunks:
        covered.update(o for o in data_offsets if s <= o < e)
    assert covered == set(data_offsets)
    # chunk starts are container starts
    assert all(s in data_offsets for s, _ in chunks)


def test_containers_dataframe(spark):
    df = CramSource().containers(spark, CRAM)
    rows = df.collect()
    assert sum(r["n_records"] for r in rows) == 8
    assert any(r["is_eof"] for r in rows)


def test_read_raises_with_guidance(spark):
    with pytest.raises(NotImplementedError, match="CRAM record decode"):
        CramSource().read(spark, CRAM)
