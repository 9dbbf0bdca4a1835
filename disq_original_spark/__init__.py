"""disq_original_spark — a PySpark-native rebuild of the capabilities of
tomwhite/disq-original (reference, read-only at /root/reference/).

The reference is a Spark I/O layer for genomics formats (BAM/CRAM/SAM/VCF on
BGZF) plus interval predicate pushdown; all relational computation is delegated
to Spark.  This package re-expresses that surface Spark-first:

- ``sources/``   splittable, record-boundary-correct readers and single-file
                 committing writers for SAM/BAM/VCF/BGZF (CRAM descoped/stubbed),
                 producing/consuming **DataFrames** with fixed schemas.
- ``operators/`` interval (genomic-range) filtering and range-join helpers.
- ``queries/``   the declared relational query surface (SURVEY.md §2.9) plus
                 large-scale training-data operators (dedup, similarity, text
                 analysis) — every one a DataFrame program with a DuckDB oracle.
- ``functions/`` reusable column expressions (cosine similarity, tokenizers,
                 fingerprints) built from native pyspark.sql.functions.
- ``streaming/`` Structured Streaming equivalents (windowed aggregation,
                 watermarked dedup).
- ``plans/``     plan-inspection helpers used by tests to assert pushdown /
                 broadcast / codegen properties.
"""

__version__ = "0.1.0"
