"""Relational operator inventory (SURVEY.md §2.2-2.8) over the TPC-H-ish tables.

Numeric policy for oracle parity: monetary/quantity sums accumulate in
DECIMAL(18,2) (exact, order-independent) and cast to double once at the end;
ratios are single integer/integer double divisions. This makes every value
bit-identical between Spark and the DuckDB oracle regardless of partitioning
or aggregation order — which is also the right call for reproducible
pipelines at 100 TB scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query


def _dec(col: F.Column) -> F.Column:
    return col.cast("decimal(18,2)")


@query(
    "pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           -- VARCHAR hop before DOUBLE: DuckDB's direct DECIMAL->DOUBLE cast
           -- divides an int128 by 10^scale in floating point, off by 1-2 ulp
           -- once the unscaled value passes 2^53 (sum_charge crosses at ~sf0.3;
           -- found at sf1). String->double is correctly rounded in both
           -- engines, matching Spark's BigDecimal.doubleValue exactly.
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_disc_price,
           CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2)) * CAST(1 + l_tax AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary: scan -> filter (parquet-pushed) ->
    partial+final hash agg. One shuffle on the 6-value grouping key."""
    li = load_table(spark, sf_dir, "lineitem")
    qty, price = _dec(F.col("l_quantity")), _dec(F.col("l_extendedprice"))
    disc = _dec(F.lit(1) - F.col("l_discount"))
    tax = _dec(F.lit(1) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02 00:00:00")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * disc).cast("double").alias("sum_disc_price"),
            F.sum(price * disc * tax).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@query(
    "top_revenue_orders",
    oracle="""
    SELECT o.o_orderkey,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l.l_discount AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, o.o_orderkey
    LIMIT 10
    """,
)
def top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped join+agg+top-k. customer is small -> broadcast; the
    orders<->lineitem join shuffles on orderkey (the natural key); top-k is
    TakeOrderedAndProject (no global sort materialization)."""
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01 00:00:00")
    l = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1996-01-01 00:00:00")
    rev = _dec(F.col("l_extendedprice")) * _dec(F.lit(1) - F.col("l_discount"))
    return (
        l.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "o_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


@query(
    "per_group_quota",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    ) WHERE rn <= 5
    """,
)
def per_group_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group quota (SURVEY §2.6 O3): top-5 customers per market segment.
    Single shuffle on the partition key; deterministic tiebreak on custkey."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("c_acctbal"), F.asc("c_custkey"))
    return (
        c.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "c_custkey", "c_acctbal", "rn")
    )


@query(
    "sorted_limit",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderpriority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sorted_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global sorted limit (O1+O2): Spark plans TakeOrderedAndProject —
    per-partition top-k then a driver-side merge of k*partitions rows."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
    )


@query(
    "rollup_sales",
    oracle="""
    SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
           COALESCE(l_linestatus, 'ALL') AS linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
)
def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup (SURVEY §2.4 ABSENT-category surface): built-in
    `rollup` — Spark expands grouping sets in one pass, no extra scans."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.sum(_dec(F.col("l_quantity"))).cast("double").alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@query(
    "running_supplier_revenue",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_revenue,
           row_number() OVER (
             PARTITION BY l_suppkey ORDER BY l_shipdate, l_orderkey, l_linenumber) AS rn
    FROM lineitem
    WHERE l_suppkey <= 10
    """,
)
def running_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window functions (SURVEY §2.5): running sum + row_number over a
    deterministic total order. Decimal accumulation keeps every prefix sum
    exact. One shuffle on l_suppkey serves both window functions."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") <= 10)
    order = [F.asc("l_shipdate"), F.asc("l_orderkey"), F.asc("l_linenumber")]
    w = Window.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.sum(_dec(F.col("l_extendedprice"))).over(w.rowsBetween(Window.unboundedPreceding, 0)).cast("double").alias("running_revenue"),
        F.row_number().over(w).alias("rn"),
    )


@query(
    "nation_region_rollup",
    oracle="""
    SELECT r.r_name AS region_name, COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def nation_region_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snowflake dimension join (J1-shaped): both dims broadcast — zero
    shuffle on the fact side until the final 5-group aggregation."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("r_name").alias("region_name"))
        .agg(F.count(F.lit(1)).alias("n_customers"), F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_acctbal"))
    )


@query(
    "order_lineitem_semi_anti",
    oracle="""
    SELECT 'with_lineitems' AS bucket, COUNT(*) AS n_orders
    FROM orders o WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    UNION ALL
    SELECT 'without_lineitems' AS bucket, COUNT(*) AS n_orders
    FROM orders o WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
    """,
)
def order_lineitem_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti join surface (SURVEY §2.3): EXISTS/NOT EXISTS as
    left_semi/left_anti — no row multiplication, single shuffle each."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    semi = o.join(l.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_semi")
    anti = o.join(l.select(F.col("l_orderkey").alias("o_orderkey")), "o_orderkey", "left_anti")
    return semi.agg(F.count(F.lit(1)).alias("n_orders")).select(F.lit("with_lineitems").alias("bucket"), "n_orders").unionByName(
        anti.agg(F.count(F.lit(1)).alias("n_orders")).select(F.lit("without_lineitems").alias("bucket"), "n_orders")
    )
