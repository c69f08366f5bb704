"""SCD Type 2 / point-in-time queries (operators/scd.py) driven over the
orders change log: each customer's order-priority value treated as a
slowly-changing attribute (a new order whose priority differs from the
previous one opens a new episode), and lineitems looked up point-in-time
against that history at ship date — the leakage-free feature-lookup
pattern an ML feature store runs at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query

_EPISODES_SQL = """
      WITH ordered AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey,
               lag(o_orderpriority) OVER (PARTITION BY o_custkey
                                          ORDER BY o_orderdate, o_orderkey)
                 AS prev
        FROM orders
      ), eps AS (
        SELECT o_custkey, o_orderpriority, o_orderdate, o_orderkey
        FROM ordered
        WHERE prev IS NULL OR prev IS DISTINCT FROM o_orderpriority
      )
      SELECT o_custkey, o_orderpriority AS priority,
             o_orderdate AS valid_from,
             lead(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate, o_orderkey)
               AS valid_to
      FROM eps
"""


def _priority_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_poc_spark.operators.scd import scd2_from_changes

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderpriority").alias("priority"),
        "o_orderdate",
        "o_orderkey",
    )
    return scd2_from_changes(
        o, ["o_custkey"], ["priority"], "o_orderdate",
        tiebreak_cols=["o_orderkey"],
    )


@query(
    "customer_priority_scd2",
    oracle=f"""
    WITH hist AS ({_EPISODES_SQL})
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_episodes,
           MIN(valid_from) AS first_from,
           MAX(valid_from) AS last_from,
           CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_open
    FROM hist GROUP BY o_custkey ORDER BY o_custkey
    """,
)
def customer_priority_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 episode history per customer, summarized: episode count,
    first/last change dates, and the invariant that EXACTLY ONE episode
    per key is open (valid_to NULL) — checked by the gate on every
    customer. The history itself is one key-partitioned window pass
    (lag collapses no-op repeats, lead links intervals): the
    dimension-maintenance shape that rewrites key-scoped state only."""
    h = _priority_history(spark, sf_dir)
    return (
        h.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_episodes"),
            F.min("valid_from").alias("first_from"),
            F.max("valid_from").alias("last_from"),
            F.sum(
                F.when(F.col("valid_to").isNull(), 1).otherwise(0)
            ).alias("n_open"),
        )
    )


@query(
    "lineitem_pit_priority",
    # The natural LEFT JOIN + interval-predicate spelling is semantically
    # identical but planner-hostile: DuckDB 1.0 cannot split the equality
    # out of an OUTER join condition that carries an OR residual, and
    # falls to BLOCKWISE_NL_JOIN — ~7e12 predicate evaluations at the sf1
    # scratch (measured ~40 min vs 1.1s for the hash plan; r16). Episodes
    # are DISJOINT per customer by construction ([valid_from, next
    # valid_from) tiles, ties collapse to empty intervals), so each fact
    # matches AT MOST one episode and the LEFT join decomposes exactly
    # into the INNER join (hash-joinable on the equality) plus one
    # NULL-priority row counting the unmatched remainder.
    oracle=f"""
    WITH hist AS ({_EPISODES_SQL}),
    facts AS (
      SELECT o.o_custkey AS k, l.l_shipdate AS fts
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ), matched AS (
      SELECT h.priority, CAST(COUNT(*) AS BIGINT) AS n_lineitems
      FROM facts f JOIN hist h
        ON f.k = h.o_custkey
       AND h.valid_from <= f.fts
       AND (h.valid_to IS NULL OR f.fts < h.valid_to)
      GROUP BY h.priority
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n FROM facts
    ), mtot AS (
      SELECT CAST(COALESCE(SUM(n_lineitems), 0) AS BIGINT) AS n FROM matched
    )
    SELECT priority, n_lineitems FROM matched
    UNION ALL
    SELECT NULL AS priority, tot.n - mtot.n AS n_lineitems
    FROM tot, mtot WHERE tot.n > mtot.n
    ORDER BY priority
    """,
)
def lineitem_pit_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup at fact grain: every lineitem joined to the
    customer's order-priority episode IN EFFECT at its ship date
    ([valid_from, valid_to) semantics — the leakage-free feature lookup),
    rolled up to counts per in-effect priority. The engine side runs the
    as-of union shape (ONE shuffle on the key, no interval theta-join);
    the oracle states the interval join declaratively — the gate proves
    they are the same function."""
    from etl_poc_spark.operators.scd import pit_join

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    facts = li.join(o, li.l_orderkey == o.o_orderkey).select(
        F.col("o_custkey").alias("k"), F.col("l_shipdate").alias("fts")
    )
    h = _priority_history(spark, sf_dir).withColumnRenamed("o_custkey", "k")
    out = pit_join(facts, h, ["k"], "fts", ["priority"])
    return (
        out.groupBy("priority")
        .agg(F.count(F.lit(1)).alias("n_lineitems"))
    )
