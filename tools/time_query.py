"""Time individual bench queries in isolation (noop sink, min-of-N) and,
with --stages, print a per-stage wall/task-time breakdown from the UI REST
API so the expensive stage is identifiable without guessing.

    python tools/time_query.py [-n 3] [--stages] [--conf k=v ...] name [name ...]

Methodology matches bench.py: one warm pass (codegen + page cache), then N
timed passes; persists released and cache cleared between passes so every
timed build pays its own persists from cold.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from disq_original_spark.cache import release_persists  # noqa: E402
from disq_original_spark.queries import QUERIES  # noqa: E402
from disq_original_spark.session import get_spark  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("-n", type=int, default=3)
    ap.add_argument("--stages", action="store_true")
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    extra = {"spark.ui.enabled": "true"} if args.stages else {}
    for kv in args.conf:
        k, v = kv.split("=", 1)
        extra[k] = v
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="time-query", extra_conf=extra)
    spark.sparkContext.setLogLevel("ERROR")
    app_id = spark.sparkContext.applicationId

    def drain(name: str) -> None:
        QUERIES[name].build(spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()

    for name in args.names:
        spark.sparkContext.setJobDescription(f"warm:{name}")
        drain(name)
        release_persists()
        spark.catalog.clearCache()
        best, times = None, []
        for i in range(args.n):
            spark.sparkContext.setJobDescription(f"timed:{name}:{i}")
            t0 = time.perf_counter()
            drain(name)
            el = round(time.perf_counter() - t0, 3)
            times.append(el)
            best = el if best is None else min(best, el)
            release_persists()
            spark.catalog.clearCache()
        print(f"{name}: min={best} all={times}", flush=True)

    if args.stages:
        base = f"http://localhost:4040/api/v1/applications/{app_id}"
        stages = json.load(
            urllib.request.urlopen(f"{base}/stages?status=complete")
        )
        rows = []
        for st in stages:
            dur = st.get("executorRunTime", 0)
            rows.append(
                (
                    st["stageId"],
                    st.get("attemptId", 0),
                    st["name"].split("\n")[0][:70],
                    st.get("numCompleteTasks", st.get("numTasks")),
                    round((st.get("completionTime") is not None) and dur / 1000.0, 2),
                    st.get("inputBytes", 0),
                    st.get("shuffleReadBytes", 0),
                    st.get("shuffleWriteBytes", 0),
                    st.get("description") or "",
                )
            )
        rows.sort(key=lambda r: -r[4])
        print("stageId tasks runTime(s) input shufR shufW name | jobdesc")
        for r in rows[:40]:
            print(
                f"{r[0]:>6} {r[3]:>5} {r[4]:>9} {r[5]:>9} {r[6]:>8} "
                f"{r[7]:>8} {r[2]} | {r[8][:40]}"
            )
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
