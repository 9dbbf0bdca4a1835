"""One-off differential check for a named subset of queries, at several
scale factors, using THE SAME compare as simulate_driver_window.py
(imported, not copied — a diverged copy once lacked the DECIMAL
pandas-fetch risk rule and gave false 'green' for exactly the bug class
this tool pre-catches).

    python tools/check_new_queries.py q53_tpch_q17 q54_tpch_q20 ...
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from disq_original_spark.queries import QUERIES
from disq_original_spark.session import get_spark
from disq_original_spark.tables import TABLES

_spec = importlib.util.spec_from_file_location(
    "simwin", Path(__file__).resolve().parent / "simulate_driver_window.py"
)
_simwin = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_simwin)
compare_query = _simwin.compare_query


def main() -> int:
    names = sys.argv[1:] or ["q53_tpch_q17", "q54_tpch_q20", "q55_tpch_q15"]
    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rc = 0
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
            )
        for name in names:
            q = QUERIES[name]
            status = compare_query(q.build(spark, sf), con.sql(q.oracle))
            print(f"{sf.rsplit('/', 1)[1]} {name}: {status}")
            if not status.startswith("green"):
                rc = 1
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
