"""UDF/UDAF/UDTF registration surface (SURVEY §2.7/§2.8).

The reference registers no UDFs — consumers use Spark's own extension
points on the returned data.  These tests prove that surface works
end-to-end in this engine: scalar pandas UDF, grouped-aggregate pandas UDF
(UDAF), and Python UDTF, each registered by name and invoked from SQL,
checked against the equivalent native expression."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udtf

from disq_original_spark.tables import load_table


@pytest.fixture()
def lineitem(spark, sf_dir):
    df = load_table(spark, sf_dir, "lineitem")
    df.createOrReplaceTempView("li_udf")
    return df


def test_scalar_pandas_udf_registration(spark, lineitem):
    @pandas_udf("double")
    def discounted(price: pd.Series, disc: pd.Series) -> pd.Series:
        return price * (1 - disc)

    spark.udf.register("discounted", discounted)
    got = spark.sql(
        "SELECT round(sum(discounted(l_extendedprice, l_discount)), 0) AS s FROM li_udf"
    ).collect()[0]["s"]
    want = lineitem.agg(
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 0).alias("s")
    ).collect()[0]["s"]
    assert got == want


def test_grouped_agg_pandas_udaf_registration(spark, lineitem):
    @pandas_udf("double")
    def mean_qty(q: pd.Series) -> float:
        return float(q.mean())

    spark.udf.register("mean_qty", mean_qty)
    got = {
        r["l_returnflag"]: round(r["m"], 6)
        for r in spark.sql(
            "SELECT l_returnflag, mean_qty(l_quantity) AS m FROM li_udf GROUP BY l_returnflag"
        ).collect()
    }
    want = {
        r["l_returnflag"]: round(r["m"], 6)
        for r in lineitem.groupBy("l_returnflag").agg(F.avg("l_quantity").alias("m")).collect()
    }
    assert got == want


def test_python_udtf_registration(spark):
    @udtf(returnType="word: string, n: int")
    class Words:
        def eval(self, s: str):
            for w in s.split():
                yield w, len(w)

    spark.udtf.register("words", Words)
    rows = spark.sql("SELECT * FROM words('alpha beta gamma')").collect()
    assert [(r["word"], r["n"]) for r in rows] == [
        ("alpha", 5),
        ("beta", 4),
        ("gamma", 5),
    ]
