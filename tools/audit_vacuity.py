"""Witness-vacuity audit over the ENTIRE query registry.

Round 8 found (by hand) that q21_except and q08_anti_join had been
hash-GREEN for eight consecutive rounds while returning the EMPTY SET at
every scale factor — the synthetic data is FK-complete, so "customers
with no orders" witnesses nothing.  A green driver row proves Spark and
DuckDB AGREE; it does not prove the query result carries information.
This tool makes that discovery systematic: it executes every registered
query at two scale factors and flags results whose green hash would be
a vacuous witness.

Flags (per query):

- ``empty``            — 0 rows at the larger sf.
- ``all_trivial``      — every cell in every row is NULL / 0 / "" /
                         empty array (the result exists but says nothing).
- ``no_varying_column``— multi-row result where NO column has more than
                         one distinct value (each row is a clone).
- ``sf_insensitive``   — byte-identical result rows at BOTH scale
                         factors.  Legitimate for fixed-cardinality
                         outputs (a date spine, region-level rollups,
                         audits of capped structures) — every accepted
                         case must appear in ``ALLOW_SF_INSENSITIVE``
                         with a reason; anything else is suspicious.

Usage (from the repo root; takes a few minutes — one Spark session,
the full registry × 2 scale factors):

    python tools/audit_vacuity.py [small_sf_dir] [big_sf_dir]

Prints one JSON object and exits nonzero if any non-allowlisted flag
fires.  Run per-round on the final tree; the round ships with BAD == {}.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Fixed-cardinality-by-design results: identical rows at sf0.001 and
# sf0.01 are EXPECTED (not evidence of a dead predicate).  Every entry
# needs a reason; the audit still applies the other three flags to them.
_GENOMIC_FIXTURE_REASON = (
    "reads the FIXED genomics fixture set (reference test BAM/VCF/BCF/GFF "
    "files / their committed parquet twins), which does not scale with sf — "
    "identical output at every sf is the expected behavior, and the decode "
    "correctness is differential-tested against the fixtures directly"
)
ALLOW_SF_INSENSITIVE: dict[str, str] = {
    "q38_recursive_spine": "complete month spine over a FIXED date range; "
    "recursion generates the spine, data only decorates it",
    "d02_dedup_stats": "data-limited: the driver testdata carries ZERO "
    "exact-duplicate texts at sf0.001/sf0.01 (uniq == total at both), so "
    "the stats coincide; actual duplicate counting is pinned on a "
    "constructed corpus in tests/test_vacuity_closure.py",
    "p07_deterministic_shuffle": "by design: the shuffle key is a pure "
    "function of doc_id and the doc_id domain (0..499) is identical at "
    "sf0.001/sf0.01 — determinism across runs is the operator's contract",
    "s08_graph_bucket_audit": "data-limited: driver-sf buckets max out "
    "near 40 of the 512 cap, so the audit reads (16,0,0,0)-shaped at both "
    "sfs; real truncation reporting is pinned on a constructed over-cap "
    "bucket in tests/test_vacuity_closure.py",
    **{
        name: _GENOMIC_FIXTURE_REASON
        for name in (
            "g03_bam_contig_stats", "g04_vcf_variant_stats",
            "g06_coverage_windows", "g07_typed_variant_stats",
            "g09_mark_duplicates", "g10_flagstat", "g11_cycle_quality",
            "g12_tstv", "g13_region_depth", "g14_multiallelic_split",
            "g15_idxstats", "g19_gc_windows", "g20_kmer_spectrum",
            "g21_cpg_islands", "g22_roh_runs", "g23_bcf_stats",
            "g24_bam_to_fastq", "g25_gff_gene_model",
            "g26_variant_annotation", "g27_coverage_uniformity",
        )
    },
}


def _canon(rows: list) -> list[tuple]:
    out = []
    for r in rows:
        d = r.asDict(recursive=True)
        out.append(tuple((k, repr(d[k])) for k in sorted(d)))
    return sorted(out)


def audit(small_sf: str, big_sf: str) -> dict[str, dict]:
    from disq_original_spark.cache import release_persists
    from disq_original_spark.queries import QUERIES
    from disq_original_spark.session import get_spark

    spark = get_spark(master="local[16]", shuffle_partitions=16)
    spark.sparkContext.setLogLevel("ERROR")
    report: dict[str, dict] = {}
    for name, q in sorted(QUERIES.items()):
        flags: list[str] = []
        info: dict[str, object] = {}
        try:
            release_persists()
            big = _canon(q.build(spark, big_sf).collect())
            release_persists()
            small = _canon(q.build(spark, small_sf).collect())
        except Exception as e:  # noqa: BLE001 — audit must report, not die
            report[name] = {"flags": ["error"], "err": f"{type(e).__name__}: {e}"}
            continue
        info["rows_small"], info["rows_big"] = len(small), len(big)
        if not big:
            flags.append("empty")
        else:
            cells = [v for row in big for (_k, v) in row]
            # triviality is decided on the canonical (repr-ed) cells —
            # the single source of truth for "this cell says nothing"
            if all(v in ("None", "0", "0.0", "''", '""', "[]", "{}", "()") for v in cells):
                flags.append("all_trivial")
            if len(big) > 1:
                ncols = len(big[0])
                varying = any(
                    len({row[i][1] for row in big}) > 1 for i in range(ncols)
                )
                if not varying:
                    flags.append("no_varying_column")
            if small == big and name not in ALLOW_SF_INSENSITIVE:
                flags.append("sf_insensitive")
        report[name] = {"flags": flags, **info}
    return report


def main() -> int:
    small = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    big = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    report = audit(small, big)
    bad = {n: r for n, r in report.items() if r["flags"]}
    print(json.dumps({"bad": bad, "n_queries": len(report)}, indent=1))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
