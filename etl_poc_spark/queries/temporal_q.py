"""Temporal join queries: as-of join and range join over the TPC-H-ish
tables — operators Spark's API lacks as primitives, expressed Spark-first
(union + window for as-of; broadcast non-equi join for ranges) with exact
DuckDB oracles (ASOF JOIN / BETWEEN join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.operators.temporal import asof_join
from etl_poc_spark.registry import query


@query(
    "events_asof_click_view",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), views AS (
      SELECT user_id, ts, MAX(event_id) AS view_event_id
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    )
    SELECT c.event_id,
           c.user_id,
           strftime(c.ts, '%Y-%m-%d %H:%M:%S') AS click_ts,
           strftime(v.ts, '%Y-%m-%d %H:%M:%S') AS view_ts,
           v.view_event_id AS asof_view_event_id,
           epoch_us(c.ts) - epoch_us(v.ts) AS gap_us
    FROM clicks c
    ASOF LEFT JOIN views v ON c.user_id = v.user_id AND c.ts >= v.ts
    """,
)
def events_asof_click_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: every click gets the latest at-or-before view of the same
    user (attribution's core primitive). Spark-first union + window — one
    shuffle on user_id, linear per-user scan; the right side is
    pre-aggregated to one row per (user, ts) so the match is deterministic,
    mirroring DuckDB ASOF semantics."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("view_event_id"))
    )
    views = views.withColumn("view_ts", F.col("ts"))  # carry the matched ts as payload
    joined = asof_join(clicks, views, by=["user_id"], right_cols=["view_event_id", "view_ts"])
    return joined.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("click_ts"),
        F.date_format("asof_view_ts", "yyyy-MM-dd HH:mm:ss").alias("view_ts"),
        "asof_view_event_id",
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("asof_view_ts"))).alias("gap_us"),
    )


@query(
    "orders_price_band_range_join",
    oracle="""
    WITH bands(band, lo, hi) AS (
      VALUES ('small', 0.0, 50000.0), ('mid', 50000.0, 150000.0),
             ('large', 150000.0, 300000.0), ('jumbo', 300000.0, 1e12)
    )
    SELECT b.band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_price
    FROM orders o JOIN bands b ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.band
    """,
)
def orders_price_band_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join: orders against a small band dimension on a BETWEEN-style
    predicate. The band table broadcasts, so the non-equi join is a
    broadcast nested-loop over 4 rows — the right plan for interval dims
    (at scale, a larger interval table would be binned to convert this to
    an equi-join on bin id)."""
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("small", 0.0, 5e4), ("mid", 5e4, 1.5e5), ("large", 1.5e5, 3e5), ("jumbo", 3e5, 1e12)],
        "band string, lo double, hi double",
    )
    return (
        o.join(F.broadcast(bands), (o.o_totalprice >= bands.lo) & (o.o_totalprice < bands.hi))
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("total_price"),
        )
    )


@query(
    "events_asof_next_error",
    oracle="""
    WITH clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'
    ), errors AS (
      SELECT user_id, ts, MAX(event_id) AS error_event_id
      FROM events WHERE event_type = 'error' GROUP BY user_id, ts
    )
    SELECT c.event_id,
           c.user_id,
           e.error_event_id AS asof_error_event_id,
           epoch_us(e.ts) - epoch_us(c.ts) AS gap_us
    FROM clicks c
    ASOF LEFT JOIN errors e ON c.user_id = e.user_id AND c.ts <= e.ts
    """,
)
def events_asof_next_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: every click gets the next at-or-after error of
    the same user (time-to-failure attribution). Identical union + window
    plan as the backward variant, with the frame looking ahead."""
    e = load_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select("event_id", "user_id", "ts")
    errors = (
        e.filter(F.col("event_type") == "error")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("error_event_id"))
        .withColumn("error_ts", F.col("ts"))
    )
    joined = asof_join(
        clicks, errors, by=["user_id"],
        right_cols=["error_event_id", "error_ts"], direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        F.col("asof_error_event_id"),
        (F.unix_micros(F.col("asof_error_ts")) - F.unix_micros(F.col("ts"))).alias("gap_us"),
    )
