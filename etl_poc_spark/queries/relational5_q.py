"""Final TPC-H decision-support shapes (Q2/Q12/Q16/Q20), completing the
22-shape relational sweep started in queries/relational.py (Q1/Q3/Q5),
relational2_q.py (Q4/Q13/Q14/Q18), relational3_q.py (Q7/Q9/Q11/Q17/Q21)
and relational4_q.py (Q6/Q8/Q10/Q15/Q19/Q22).

These four exercise surface the sweep hadn't proven yet: a correlated
min-cost subquery over a 4-table dim chain (Q2), OR-predicate conditional
aggregation with a cross-table date-arithmetic filter (Q12), an anti-join
feeding a grouped count-distinct (Q16), and a nested semi-join chain with
a correlated 0.5x-sum threshold (Q20).

Schema adaptation (this dataset has no partsupp, l_shipmode or
l_commitdate/l_receiptdate): the supplier-part offer relation is derived
from lineitem — cost(part, supp) = MIN(decimal extendedprice) over that
supplier's lines for the part (Q2), the shipmode-class column is
l_returnflag (Q12), the "complaints" supplier exclusion set is suppliers
with negative account balance (Q16), and Q20's availability threshold
compares a supplier's shipped quantity for a part against half the
part's total shipped quantity in the window.

Numeric policy (same as the sibling modules): monetary/quantity sums
accumulate in DECIMAL (exact, order-independent under any partitioning)
and cast to double once at the output boundary; the Q2 min-cost equality
join and Q20's 0.5x threshold (rewritten multiplication-side:
2*q > total) compare exact decimals, so row selection is bit-portable
between Spark and the DuckDB oracle.

Scale notes (100 TB): Q2's correlated min decorrelates into a per-partkey
aggregate joined back on (partkey, cost) — the Q17 pattern — with the
part-attribute filter semi-joined BEFORE the min so only qualifying
parts' offers aggregate; region/nation are broadcast. Q12 is one
orders-lineitem shuffle join with map-side conditional partial aggs.
Q16's exclusion is a broadcast left_anti (the negative-balance set is
dim-sized) over the distinct (part, supp) association. Q20 chains two
keyed aggregations on the same l_partkey shuffle and resolves to a
semi-join on suppkey — no correlated re-scan of lineitem per supplier.

Reference parity note: the reference (parhampr/ETL-POC) has no SQL
engine — it delegates tabular work to docetl/Airflow
(`airflow/dags/zara_hybrid_etl.py`); this module is part of the
§2.2-2.8 relational inventory a replacement engine must cover natively.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query


def _dec(col: F.Column) -> F.Column:
    return col.cast("decimal(18,2)")


@query(
    "min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             MIN(CAST(l_extendedprice AS DECIMAL(18,2))) AS cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), eu AS (
      SELECT o.l_partkey, o.cost, s.s_acctbal, s.s_name, n.n_name
      FROM offers o
      JOIN supplier s ON o.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      WHERE r.r_name = 'EUROPE'
    ), best AS (
      SELECT l_partkey, MIN(cost) AS min_cost FROM eu GROUP BY l_partkey
    )
    SELECT CAST(e.s_acctbal AS DOUBLE) AS s_acctbal, e.s_name, e.n_name,
           p.p_partkey, p.p_name, CAST(e.cost AS DOUBLE) AS best_price
    FROM eu e
    JOIN best b ON e.l_partkey = b.l_partkey AND e.cost = b.min_cost
    JOIN part p ON e.l_partkey = p.p_partkey
    WHERE p.p_type = 'LARGE' AND p.p_size BETWEEN 10 AND 20
    ORDER BY s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 100
    """,
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each LARGE mid-size part, the EUROPE
    supplier(s) offering it at the minimum cost — the canonical
    correlated min-cost subquery over the supplier->nation->region dim
    chain, decorrelated into a per-partkey min joined back on the exact
    decimal (partkey, cost) pair. The part-attribute filter semi-joins
    the offer table BEFORE the min aggregate (restricting the partkey
    set cannot change a per-partkey min), so at 100 TB only qualifying
    parts' offers are aggregated; region and nation broadcast. The
    ORDER BY includes s_name and p_partkey, making the LIMIT 100 a
    deterministic total order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")

    offers = (
        li.join(part.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min(_dec(F.col("l_extendedprice"))).alias("cost"))
    )
    eu = (
        offers.join(sup, offers.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .select("l_partkey", "cost", "s_acctbal", "s_name", "n_name")
    )
    best = eu.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("cost").alias("min_cost")
    )
    return (
        eu.join(
            best,
            (eu.l_partkey == best.b_partkey) & (eu.cost == best.min_cost),
        )
        .join(
            load_table(spark, sf_dir, "part").filter(
                (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
            ),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.col("s_acctbal").cast("double").alias("s_acctbal"),
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            F.col("cost").cast("double").alias("best_price"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@query(
    "late_ship_priority_counts",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT','2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag IN ('A','R')
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    GROUP BY l.l_returnflag ORDER BY l.l_returnflag
    """,
)
def late_ship_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per ship class (l_returnflag standing in for the
    absent l_shipmode), how many late-shipped 1996 lines belonged to
    high- vs low-priority orders — the OR-predicate conditional
    aggregation (CASE WHEN priority IN (...)). The 60-day lateness
    predicate is the cross-table date-arithmetic filter (shipdate vs
    orderdate) standing in for commitdate<receiptdate; it evaluates
    inside the one orders-lineitem shuffle join, and both conditional
    sums partial-aggregate map-side. The in-set and date predicates on
    lineitem reach the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .groupBy(F.col("l_returnflag").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).cast("bigint").alias("low_line_count"),
        )
    )


@query(
    "part_supplier_diversity",
    oracle="""
    WITH assoc AS (
      SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
    )
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT a.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM assoc a JOIN part p ON a.l_partkey = p.p_partkey
    WHERE NOT (p.p_brand = 'Brand#1' OR p.p_type = 'PROMO')
      AND p.p_size IN (1,5,10,15,20,25,30,35)
      AND a.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    LIMIT 40
    """,
)
def part_supplier_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: how many distinct suppliers can furnish parts of
    each (brand, type, size) bucket, excluding one brand, one type, and
    the "complaints" suppliers (adapted: negative account balance) — the
    anti-join + grouped count-distinct combination. The part-supplier
    association is the DISTINCT (l_partkey, l_suppkey) projection of
    lineitem (this dataset's partsupp); the exclusion set is dim-sized,
    so the NOT IN compiles to a broadcast left_anti hash join, and the
    count-distinct rides the (brand,type,size) shuffle. The ORDER BY's
    trailing group keys make the LIMIT a deterministic total order."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        ~((F.col("p_brand") == "Brand#1") | (F.col("p_type") == "PROMO"))
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    neg_sup = load_table(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0)
    assoc = li.select("l_partkey", "l_suppkey").distinct()
    return (
        assoc.join(
            F.broadcast(neg_sup.select("s_suppkey")),
            assoc.l_suppkey == F.col("s_suppkey"),
            "left_anti",
        )
        .join(part, F.col("l_partkey") == part.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
        .limit(40)
    )


@query(
    "dominant_part_suppliers",
    oracle="""
    WITH shipped AS (
      SELECT l.l_partkey, l.l_suppkey,
             SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS q
      FROM lineitem l
      JOIN part p ON l.l_partkey = p.p_partkey
      WHERE p.p_name LIKE 'small%'
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l.l_partkey, l.l_suppkey
    ), totals AS (
      SELECT l_partkey, SUM(q) AS total_q FROM shipped GROUP BY l_partkey
    ), dominant AS (
      SELECT DISTINCT s.l_suppkey
      FROM shipped s
      JOIN totals t ON s.l_partkey = t.l_partkey
      WHERE 2 * s.q > t.total_q
    )
    SELECT s.s_name, CAST(s.s_acctbal AS DOUBLE) AS s_acctbal
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND s.s_suppkey IN (SELECT l_suppkey FROM dominant)
    ORDER BY s.s_name
    """,
)
def dominant_part_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: ASIA suppliers who, for some 'small%' part,
    shipped MORE THAN HALF of that part's total 1996 volume — the nested
    semi-join chain (supplier <- dominant suppkeys <- per-(part,supp)
    aggregate) gated by a correlated 0.5x-sum threshold. The threshold
    is rewritten multiplication-side (2*q > total) so the comparison is
    decimal-exact, and both the per-(part,supp) and per-part aggregates
    ride ONE l_partkey-keyed shuffle (the second groupBy re-aggregates
    the first's output, already co-partitioned). The p_name filter
    semi-joins lineitem before any aggregation; supplier resolution is a
    broadcast-dim chain plus a left_semi on the distinct dominant
    suppkey set — never a correlated re-scan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01 00:00:00")
        & (F.col("l_shipdate") < "1997-01-01 00:00:00")
    )
    small_parts = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    )
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    shipped = (
        li.join(
            small_parts.select("p_partkey"), li.l_partkey == F.col("p_partkey"), "left_semi"
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("q"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("q").alias("total_q")
    )
    dominant = (
        shipped.join(totals, shipped.l_partkey == totals.t_partkey)
        .filter(F.lit(2) * F.col("q") > F.col("total_q"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"), "left_semi")
        .join(dominant, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .select("s_name", F.col("s_acctbal").cast("double").alias("s_acctbal"))
    )
