"""Bloom-prefilter join queries (operators/bloom.py): the approximate
bit-set gets a HASH-EXACT oracle because its positions derive from the
engine-portable md5 bucket — DuckDB reproduces the exact same
false-positive set, so pass/match/fp counts are bit-checkable (the
kmv_distinct_users philosophy applied to join pre-filtering).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query

_M = 4096
_K = 3


def _bucket_sql(expr: str, i: int) -> str:
    return (
        f"CAST('0x' || substr(md5('bloom{i}' || CAST({expr} AS VARCHAR)), 1, 6) "
        f"AS INTEGER) % {_M}"
    )


@query(
    "orders_bloom_prefilter",
    oracle=f"""
    WITH build AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal < 0
    ), bits AS (
      {" UNION ".join(f"SELECT DISTINCT {_bucket_sql('c_custkey', i)} AS pos FROM build" for i in range(_K))}
    ), probe AS (
      SELECT o_custkey,
             {" AND ".join(f"({_bucket_sql('o_custkey', i)}) IN (SELECT pos FROM bits)" for i in range(_K))}
               AS bloom_pass,
             o_custkey IN (SELECT c_custkey FROM build) AS true_match
      FROM orders
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT) AS n_true_match,
           CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positive
    FROM probe
    """,
)
def orders_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join pre-filtering audit: a bloom bit set trained on the
    negative-balance customers (the selective build side) probes every
    order IN THE SCAN STAGE — k md5 shift/and tests against 64 literal
    longs, no join, no shuffle for the rejected majority. The report
    counts scan rows, bloom survivors, true matches, and the exact
    false-positive overlap the md5 positions imply. Zero false NEGATIVES
    by construction (every true match passes) — the property that makes
    the pre-filter safe; the real join then drops the false positives."""
    from etl_poc_spark.operators.bloom import bloom_build, bloom_contains

    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    build = c.filter(F.col("c_acctbal") < 0).select("c_custkey")
    words = bloom_build(build, "c_custkey", _M, _K)
    passed = bloom_contains(F.col("o_custkey"), words, _M, _K)
    true_keys = build.distinct().withColumnRenamed("c_custkey", "o_custkey")
    flagged = o.select("o_custkey", passed.alias("bloom_pass")).join(
        F.broadcast(true_keys.withColumn("__t", F.lit(True))), "o_custkey", "left"
    )
    return flagged.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("bloom_pass").cast("long")).cast("bigint").alias("n_bloom_pass"),
        F.sum(F.col("__t").isNotNull().cast("long")).cast("bigint").alias("n_true_match"),
        F.sum((F.col("bloom_pass") & F.col("__t").isNull()).cast("long"))
        .cast("bigint")
        .alias("n_false_positive"),
    )
