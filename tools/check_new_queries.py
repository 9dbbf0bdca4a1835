"""One-off differential check for a named subset of queries, at several
scale factors, mirroring the driver compare (sorted columns, repr rows).

    python tools/check_new_queries.py q53_tpch_q17 q54_tpch_q20 ...
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from disq_original_spark.queries import QUERIES
from disq_original_spark.session import get_spark
from disq_original_spark.tables import TABLES


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
            df = q.build(spark, sf)
            cols = sorted(df.columns)
            rows = sorted(repr(tuple(r[c] for c in cols)) for r in df.collect())
            rel = con.sql(q.oracle)
            ocols = list(rel.columns)
            risky = [
                f"{c}:{t}"
                for c, t in zip(ocols, (str(t) for t in rel.types))
                if str(t) in ("HUGEINT", "UHUGEINT", "UBIGINT")
            ]
            oidx = [ocols.index(c) for c in sorted(ocols)]
            orows = sorted(
                repr(tuple(r[i] for i in oidx)) for r in rel.fetchall()
            )
            ok = cols == sorted(ocols) and rows == orows and not risky
            print(
                f"{sf.rsplit('/',1)[1]} {name}: "
                + ("green" if ok else "BAD")
                + f" rows={len(rows)}"
                + (f" risky={risky}" if risky else "")
            )
            if not ok:
                rc = 1
                if cols != sorted(ocols):
                    print("  cols", cols, "vs", sorted(ocols))
                for a, b in list(zip(rows, orows))[:3]:
                    if a != b:
                        print("  ", a, "vs", b)
                if len(rows) != len(orows):
                    print("  rowcount", len(rows), "vs", len(orows))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
