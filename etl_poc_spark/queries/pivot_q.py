"""Pivot API + map-literal lookup — the remaining §2-cited techniques.

- events_type_pivot: the DataFrame `pivot()` API (distinct from the
  conditional-agg formulation in events_pivot_rates) with an explicit value
  list so the plan stays single-pass.
- dim_lookup_map: SURVEY §2.3 J1's alternative implementation —
  `element_at(create_map(...), key)` with a coalesce default; zero joins,
  the literal map rides the expression tree. Shares SOURCE_CATEGORIES with
  dim_lookup (single source of truth; the oracle CASE is generated from it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.queries.documents_q import SOURCE_CATEGORIES
from etl_poc_spark.registry import query

# the full event_type domain of the test corpus (verified against
# sf0.01/sf0.1: click, error, purchase, signup, view)
EVENT_TYPES = ("click", "view", "error", "purchase", "signup")

_PIVOT_COLS_SQL = ",\n           ".join(
    f"CAST(SUM(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,2)) "
    f"ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS {t}"
    for t in EVENT_TYPES
)

_DIM_CASE_SQL = "\n             ".join(
    f"WHEN '{k}' THEN '{v}'" for k, v in SOURCE_CATEGORIES
)


@query(
    "events_type_pivot",
    oracle=f"""
    SELECT user_id,
           {_PIVOT_COLS_SQL}
    FROM events
    WHERE user_id < 50
    GROUP BY user_id
    """,
)
def events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True pivot(): per-user value sums by event type in one pass (the
    explicit value list avoids the extra distinct-values job)."""
    e = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 50)
    pivoted = (
        e.groupBy("user_id")
        .pivot("event_type", list(EVENT_TYPES))
        .agg(F.sum(F.col("value").cast("decimal(18,2)")))
    )
    return pivoted.select(
        "user_id",
        *[F.coalesce(F.col(t).cast("double"), F.lit(0.0)).alias(t) for t in EVENT_TYPES],
    )


@query(
    "dim_lookup_map",
    oracle=f"""
    SELECT doc_id,
           CASE source
             {_DIM_CASE_SQL}
             ELSE 'Category: ' || source
           END AS category_description
    FROM documents
    """,
)
def dim_lookup_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 via a literal map expression (no join at all): element_at over
    create_map + coalesce default — the right shape when the dim is a
    handful of constants. Returns the same values as dim_lookup."""
    d = load_table(spark, sf_dir, "documents")
    pairs = []
    for k, v in SOURCE_CATEGORIES:
        pairs.extend([F.lit(k), F.lit(v)])
    lookup = F.element_at(F.create_map(*pairs), F.col("source"))
    return d.select(
        "doc_id",
        F.coalesce(lookup, F.concat(F.lit("Category: "), F.col("source"))).alias("category_description"),
    )
