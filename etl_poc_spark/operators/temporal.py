"""Temporal join operators Spark lacks natively: as-of join and range join
helpers.

asof_join (backward, inclusive) is implemented as the scalable
union + window formulation, not a per-row subquery:

1. tag left rows side=1, right rows side=0, union on (by, ts, side, payload)
2. one shuffle: window partitioned by `by`, ordered by (ts, side)
3. every left row reads `last(right payload, ignorenulls=True)` over the
   preceding frame — i.e. the latest right row with right.ts <= left.ts
   (equal timestamps match because side 0 sorts before side 1)
4. keep side=1 rows

Cost is a single shuffle on the join key and a linear window scan — the
same shape as sessionization, so it survives 100× data (per-key streams are
processed independently; skewed keys hit the usual window-skew mitigations).
Right rows should be unique per (by, ts) for determinism — pre-aggregate
duplicates (the query layer does) exactly as DuckDB's ASOF JOIN expects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: list[str],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Inclusive as-of join: append, to every left row, the payload of the
    latest right row with right_ts <= left_ts (direction='backward') or the
    earliest right row with right_ts >= left_ts (direction='forward')
    within the same `by` group (nulls when no match — left-join
    semantics). Same single-shuffle union + window plan either way; only
    the tie-order of left vs right at equal timestamps and the frame
    direction flip."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    right_cols = right_cols or [c for c in right.columns if c not in (*by, right_ts)]
    l_payload = [c for c in left.columns if c not in (*by,)]

    l_tag = left.select(
        *by,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.col(c) for c in l_payload if c != left_ts],
        F.col(left_ts),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
    )
    r_tag = right.select(
        *by,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_payload if c != left_ts],
        F.lit(None).cast(left.schema[left_ts].dataType).alias(left_ts),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    if direction == "backward":
        # right rows (side 0) sort before left at equal ts -> inclusive
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts"), F.col("__side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        pick = lambda c: F.last(F.col(c), ignorenulls=True)  # noqa: E731
    else:
        # forward: left rows sort before right at equal ts, frame looks ahead
        w = (
            Window.partitionBy(*by)
            .orderBy(F.col("__ts"), (1 - F.col("__side")))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        pick = lambda c: F.first(F.col(c), ignorenulls=True)  # noqa: E731
    matched = l_tag.unionByName(r_tag)
    for c in right_cols:
        matched = matched.withColumn(f"__m_{c}", pick(f"__r_{c}").over(w))
    return matched.filter(F.col("__side") == 1).select(
        *by,
        *[F.col(c) for c in l_payload],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_cols],
    )
