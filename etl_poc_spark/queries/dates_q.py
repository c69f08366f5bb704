"""Date arithmetic + percentile coverage (SURVEY §2.8 ABSENT-category
surface the engine exposes as built-ins)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query


@query(
    "order_date_arithmetic",
    oracle="""
    SELECT o.o_orderkey,
           strftime(o.o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           datediff('day', o.o_orderdate, l.l_shipdate) AS days_to_ship,
           CAST(extract(year FROM o.o_orderdate) AS INT) AS order_year,
           CAST(extract(month FROM o.o_orderdate) AS INT) AS order_month,
           CAST(dayofweek(o.o_orderdate) + 1 AS INT) AS order_dow
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey AND l.l_linenumber = 1
    WHERE o.o_orderkey <= 1000
    """,
)
def order_date_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date arithmetic: interval add, day diff, calendar field extraction
    (dow aligned to Spark's 1=Sunday convention in the oracle)."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    return (
        o.join(l, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "o_orderkey",
            F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("days_to_ship"),
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
            F.dayofweek("o_orderdate").alias("order_dow"),
        )
    )


@query(
    "price_quantiles",
    oracle="""
    SELECT l_returnflag,
           round(quantile_cont(l_extendedprice, 0.5), 4) AS median_price,
           round(quantile_cont(l_extendedprice, 0.9), 4) AS p90_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def price_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median, p90) per return flag —
    Spark's percentile() matches DuckDB's quantile_cont interpolation;
    rounded to 4 decimals to absorb last-ulp formula differences."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("median_price"),
        F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )
