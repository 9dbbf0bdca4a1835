"""Interleaved A/B timing of one query under env-switched variants.

    python tools/ab_query.py <name> ENVVAR=a,b,c [-n 5]

Runs one warm pass per variant, then N interleaved rounds a,b,c,a,b,c...
in ONE session (persists released + cache cleared between passes), printing
min and median per variant.  Interleaving makes box-load drift hit every
variant equally — the per-variant MIN compares like-for-like.
"""

from __future__ import annotations

import argparse
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from disq_original_spark.cache import release_persists  # noqa: E402
from disq_original_spark.queries import QUERIES  # noqa: E402
from disq_original_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("name")
    ap.add_argument("spec")  # ENVVAR=v1,v2
    ap.add_argument("-n", type=int, default=5)
    args = ap.parse_args()
    var, vals = args.spec.split("=", 1)
    vals = vals.split(",")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab-query")
    spark.sparkContext.setLogLevel("ERROR")

    def one(v: str) -> float:
        os.environ[var] = v
        t0 = time.perf_counter()
        QUERIES[args.name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        el = time.perf_counter() - t0
        release_persists()
        spark.catalog.clearCache()
        return round(el, 3)

    for v in vals:  # warm (codegen per variant)
        one(v)
    res: dict[str, list[float]] = {v: [] for v in vals}
    for _ in range(args.n):
        for v in vals:
            res[v].append(one(v))
    for v in vals:
        print(
            f"{args.name} {var}={v}: min={min(res[v])} "
            f"med={statistics.median(res[v])} all={res[v]}",
            flush=True,
        )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
