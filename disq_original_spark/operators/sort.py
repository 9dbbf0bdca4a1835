"""Distributed coordinate sort for reads — the ``samtools sort`` of this
engine, expressed as Spark's native range-partitioned sort.

Reference parity: the reference keeps whatever order the input file has
(``SURVEY §2.6``; htsjdk/samtools own sorting in its ecosystem).  A Spark
engine gets the distributed sort for free, and it is the precondition for
every indexed write path this repo ships (``.bai``/``.crai`` builders
require position-sorted partitions), so the operator is first-class here.

Scale shape: ``repartitionByRange`` samples the keys (driver holds only the
range bounds — one tiny job), gives totally ORDERED partitions (every row in
partition i sorts before every row in partition i+1), then
``sortWithinPartitions`` finishes locally — the classic TeraSort shape.  One
shuffle, no global single-reducer sort, no driver materialization; at 100 TB
the sort scales with executors exactly like any Spark ORDER BY, and the
output feeds the single-file or sharded sinks (parts concatenate in
partition order, so the committed file is globally coordinate-sorted and
its write-time ``.bai`` is valid).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.headers import SamHeader


def contig_rank_col(header: SamHeader, contig_col: str = "rname") -> F.Column:
    """Map a contig-name column to its @SQ index in the header's reference
    dictionary — the sort key ``samtools sort`` uses.  Unmapped reads
    (NULL rname) and contigs absent from the header rank AFTER every known
    contig, matching the BAM convention of unmapped-at-end."""
    n = len(header.contigs)
    rank = F.lit(n)
    # build the CASE chain in reverse so the first contig wins ties
    for i, (name, _len) in reversed(list(enumerate(header.contigs))):
        rank = F.when(F.col(contig_col) == name, i).otherwise(rank)
    return rank


def coordinate_sort(
    reads: DataFrame,
    header: SamHeader,
    num_partitions: int | None = None,
    contig_col: str = "rname",
    pos_col: str = "pos",
) -> DataFrame:
    """Globally sort reads by (reference-dictionary order, position), the
    ``SO:coordinate`` contract: range-partition on the sort key, then sort
    within partitions.  Returns a DataFrame whose partitions are ordered
    AND internally sorted — ready for ``BamSink.write(...,
    write_index=True)`` / ``write_sharded`` (both require position-sorted
    partitions) without any further repartitioning."""
    key = contig_rank_col(header, contig_col).alias("__ctg_rank")
    with_key = reads.withColumn("__ctg_rank", key)
    n = num_partitions or reads.sparkSession.sparkContext.defaultParallelism
    return (
        with_key.repartitionByRange(n, F.col("__ctg_rank"), F.col(pos_col))
        .sortWithinPartitions("__ctg_rank", pos_col)
        .drop("__ctg_rank")
    )


def set_sort_order(header: SamHeader, order: str = "coordinate") -> SamHeader:
    """Return a header whose @HD SO: field says ``order`` (adding the @HD
    line if the input has none) — what a sorting tool stamps on its output."""
    lines = header.text.splitlines()
    if lines and lines[0].startswith("@HD"):
        hd = lines[0]
        if "SO:" in hd:
            hd = re.sub(r"SO:[^\t]*", f"SO:{order}", hd)
        else:
            hd = hd + f"\tSO:{order}"
        lines[0] = hd
    else:
        lines.insert(0, f"@HD\tVN:1.6\tSO:{order}")
    text = "\n".join(lines)
    if not text.endswith("\n"):
        text += "\n"
    return SamHeader(text=text, contigs=list(header.contigs))
