"""Remaining canonical TPC-H decision-support shapes (Q6/Q8/Q10/Q15/Q19/Q22)
adapted to the testdata schema.

Completes the relational sweep started in queries/relational.py (Q1/Q3/Q5),
relational2_q.py (Q4/Q13/Q14/Q18) and relational3_q.py (Q7/Q9/Q11/Q17/Q21):
a pure scan-aggregate (Q6), an 8-table market-share ratio (Q8), a top-k
revenue report over returned items (Q10), a scalar-max view join (Q15),
disjunctive multi-branch predicates (Q19), and an anti-join gated by a
scalar-average subquery (Q22).

Same numeric policy as the sibling modules: monetary sums accumulate in
DECIMAL (exact, order-independent under any partitioning) and cast to
double once at the output boundary; ratios are one double division of
exact operands — bit-identical between Spark and the DuckDB oracle.

Reference parity note: the reference (parhampr/ETL-POC) delegates all
tabular computation to external runtimes (docetl/Airflow,
`airflow/dags/zara_hybrid_etl.py`); this module is part of the §2.2-2.8
relational inventory a replacement engine must provide natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query


def _dec(col: F.Column) -> F.Column:
    return col.cast("decimal(18,2)")


# revenue = extendedprice * (1 - discount), decimal-exact
def _rev() -> F.Column:
    return _dec(F.col("l_extendedprice")) * _dec(F.lit(1) - F.col("l_discount"))


_REV_SQL = "CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,2))"


@query(
    "forecast_revenue_change",
    oracle=f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))
                    * CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) AS lost_revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would be lost by eliminating a band of
    discounts — the canonical scan-dominated query. No join, no window:
    the entire plan is parquet scan -> filter -> partial agg -> final agg.
    All three predicates and the 4-column projection reach the scan
    (PushedFilters/ReadSchema), so at 100 TB this reads only the
    row-groups whose min/max straddle the ship-date year."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        F.sum(_dec(F.col("l_extendedprice")) * _dec(F.col("l_discount")))
        .cast("double")
        .alias("lost_revenue"),
        F.count(F.lit(1)).alias("n_lineitems"),
    )


@query(
    "nation_market_share",
    oracle=f"""
    WITH vol AS (
      SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
             {_REV_SQL} AS volume,
             n2.n_name AS supp_nation
      FROM lineitem l
      JOIN orders o    ON o.o_orderkey = l.l_orderkey
      JOIN customer c  ON c.c_custkey = o.o_custkey
      JOIN nation n1   ON n1.n_nationkey = c.c_nationkey
      JOIN region r    ON r.r_regionkey = n1.n_regionkey
      JOIN supplier s  ON s.s_suppkey = l.l_suppkey
      JOIN nation n2   ON n2.n_nationkey = s.s_nationkey
      JOIN part p      ON p.p_partkey = l.l_partkey
      WHERE r.r_name = 'ASIA'
        AND p.p_type = 'STANDARD'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    SELECT o_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                         ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE) AS mkt_share,
           COUNT(*) AS n_lineitems
    FROM vol
    GROUP BY o_year
    ORDER BY o_year
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (market share): the fraction of a region's revenue
    on one part type supplied by one nation, per order year — the widest
    join in the suite (8 tables).

    Scale strategy: lineitem/orders/customer/supplier/part are fact-scale
    in TPC-H (SF x 6M/1.5M/150k/10k/200k), so all of them join on their
    natural shuffle keys and AQE picks broadcast only when a filtered side
    turns out tiny; nation (25 rows) and region (5 rows) broadcast
    explicitly. The two decimal conditional sums collapse to one double
    division per year — exact, order-independent."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_partkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01 00:00:00")
        & (F.col("o_orderdate") < "1998-01-01 00:00:00")
    )
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select("p_partkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_nation = (
        c.join(F.broadcast(n.select("n_nationkey", "n_regionkey")),
               F.col("n_nationkey") == F.col("c_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("c_custkey")
    )
    supp_nation = s.join(
        F.broadcast(n.select(F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation"))),
        F.col("s_nk") == F.col("s_nationkey"),
    ).select("s_suppkey", "supp_nation")
    vol = (
        li.join(o.select("o_orderkey", "o_custkey", "o_orderdate"),
                F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust_nation, F.col("c_custkey") == F.col("o_custkey"))
        .join(p, F.col("p_partkey") == F.col("l_partkey"))
        .join(supp_nation, F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            _rev().alias("volume"),
            "supp_nation",
        )
    )
    target = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        _dec(F.lit(0))
    )
    return (
        vol.groupBy("o_year")
        .agg(
            (F.sum(target).cast("double") / F.sum("volume").cast("double")).alias("mkt_share"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "returned_item_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           c.c_acctbal, n.n_name AS nation
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE o.o_orderdate >= TIMESTAMP '1996-10-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY SUM({_REV_SQL}) DESC, c.c_custkey
    LIMIT 20
    """,
)
def returned_item_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: the 20 customers who returned the most revenue in
    one quarter. The quarter filter prunes orders at the scan; lineitem
    filters to returnflag='R' before the orderkey join; customer attrs
    join on custkey AFTER the heavy agg (the agg output is
    customer-cardinality, not lineitem-cardinality). The final top-20 is
    TakeOrderedAndProject — no global sort materializes. Ties broken by
    custkey so the limit is deterministic across engines."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-10-01 00:00:00")
        & (F.col("o_orderdate") < "1997-01-01 00:00:00")
    ).select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    per_cust = (
        li.join(o, F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_custkey")
        .agg(F.sum(_rev()).alias("__rev"))
    )
    return (
        per_cust.join(c, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("c_nationkey"))
        .select(
            "c_custkey",
            "c_name",
            F.col("__rev").cast("double").alias("revenue"),
            "c_acctbal",
            F.col("n_name").alias("nation"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "top_supplier_revenue",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey, SUM({_REV_SQL}) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, CAST(r.total_rev AS DOUBLE) AS total_revenue
    FROM supplier s
    JOIN revenue r ON r.l_suppkey = s.s_suppkey
    WHERE r.total_rev = (SELECT MAX(total_rev) FROM revenue)
    ORDER BY s.s_suppkey
    """,
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): suppliers whose quarterly revenue
    equals the global maximum. The scalar subquery decorrelates into a
    1-row aggregate of the ALREADY-AGGREGATED revenue view (supplier
    cardinality, SF x 10k — not lineitem cardinality), broadcast back as
    an equi-join key. Revenue stays DECIMAL through the max comparison so
    the equality is exact; cast to double only at the output."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1996-04-01 00:00:00")
    )
    revenue = li.groupBy("l_suppkey").agg(F.sum(_rev()).alias("total_rev"))
    best = revenue.agg(F.max("total_rev").alias("total_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        revenue.join(F.broadcast(best), "total_rev")
        .join(F.broadcast(s), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", F.col("total_rev").cast("double").alias("total_revenue"))
    )


@query(
    "branded_shipment_revenue",
    oracle=f"""
    SELECT CAST(SUM({_REV_SQL}) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lineitems
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#3'  AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1  AND l.l_quantity <= 11)
       OR (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 25
           AND l.l_quantity >= 10 AND l.l_quantity <= 20)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 35
           AND l.l_quantity >= 20 AND l.l_quantity <= 30)
    """,
)
def branded_shipment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under three OR'd brand/size/quantity
    branches — the canonical disjunctive-predicate query. The disjunction
    references BOTH sides, so it cannot be pushed below the join whole;
    Catalyst instead derives the implied per-side prefilters
    (p_brand IN (...) AND p_size<=35; l_quantity BETWEEN 1 AND 30) and
    pushes those to the scans, leaving the cross-branch disjunction as
    the join's residual condition on the equi-joined pairs."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    q = F.col("l_quantity")
    branch = (
        ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15) & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#13") & F.col("p_size").between(1, 25) & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 35) & (q >= 20) & (q <= 30))
    )
    return (
        li.join(p, F.col("p_partkey") == F.col("l_partkey"))
        .filter(branch)
        .agg(
            F.sum(_rev()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


@query(
    "dormant_rich_customers",
    oracle="""
    WITH thresh AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_bal
      FROM customer
      WHERE c_acctbal > 0
        AND c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
    )
    SELECT c.c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_acctbal
    FROM customer c, thresh t
    WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
      AND c.c_acctbal > t.avg_bal
      AND NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey
          AND o.o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
)
def dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers in target
    segments whose balance beats the positive-balance average but who
    have gone dormant (no orders since 1999). The scalar average
    decorrelates to a 1-row
    aggregate cross-broadcast as a filter; NOT EXISTS compiles to a
    left_anti join on custkey against an orders side projected to its
    join key only. The average is computed as exact decimal sum / exact
    count -> ONE double division, so the threshold is bit-identical
    across engines and no row flips membership."""
    segs = ["BUILDING", "MACHINERY", "AUTOMOBILE"]
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment").isin(segs))
    thresh = c.filter(F.col("c_acctbal") > 0).agg(
        (F.sum(_dec(F.col("c_acctbal"))).cast("double") / F.count(F.lit(1))).alias("avg_bal")
    )
    o_keys = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= "1999-01-01 00:00:00")
        .select("o_custkey")
    )
    return (
        c.join(F.broadcast(thresh))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(o_keys, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec(F.col("c_acctbal"))).cast("double").alias("total_acctbal"),
        )
    )


@query(
    "customer_order_counts",
    oracle="""
    SELECT n_orders, CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c.c_custkey, CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    ORDER BY n_customers DESC, n_orders DESC
    """,
)
def customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): how many customers placed
    exactly N orders, INCLUDING the zero-order customers the outer join
    preserves. Double aggregation: the first groupBy runs at customer
    cardinality on the custkey shuffle; the second is a tiny
    (max-orders-per-customer)-cardinality rollup. count(o_orderkey)
    counts matches only — the null row of an orderless customer
    contributes 0, not 1."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    per_cust = (
        c.join(o, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
