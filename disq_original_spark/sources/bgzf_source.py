"""Distributed BGZF block enumeration — a DataFrame of every block in a file
(reference parity: `bgzf/BgzfBlockSource.java:24-89`).

Each task scans its byte range for block starts (guesser) and emits the
blocks that *start* in its range — the same exactly-once ownership rule the
text and BAM readers use, so any tiling of the file enumerates each block
exactly once."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .fsio import get_fs


class BgzfBlockSource:
    def blocks(
        self, spark: SparkSession, path: str, split_size: int = 128 * 1024
    ) -> DataFrame:
        fs = get_fs(path)
        flen = fs.size(path)
        ranges = [(s, min(s + split_size, flen)) for s in range(0, flen, split_size)] or [(0, 0)]

        def scan(it):
            from .bgzf import enumerate_blocks

            for s, e in it:
                with fs.open_input(path) as fh:
                    for b in enumerate_blocks(fh, s, e):
                        yield (path, b.pos, b.c_size, b.u_size)

        rdd = spark.sparkContext.parallelize(ranges, len(ranges)).mapPartitions(scan)
        return spark.createDataFrame(
            rdd, "path string, pos long, c_size int, u_size int"
        )
