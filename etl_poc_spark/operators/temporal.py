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
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Inclusive as-of join: append, to every left row, the payload of the
    latest right row with right_ts <= left_ts (direction='backward') or the
    earliest right row with right_ts >= left_ts (direction='forward')
    within the same `by` group (nulls when no match — left-join
    semantics). Same single-shuffle union + window plan either way; only
    the tie-order of left vs right at equal timestamps and the frame
    direction flip.

    `tolerance_seconds` bounds the lookback/lookahead (pandas merge_asof
    parity): a matched right row farther than the tolerance nulls out —
    the matched ts rides along in the same window pick, so the bound
    costs one integer comparison, not a second join."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be 'backward' or 'forward', got {direction!r}")
    if tolerance_seconds is not None and tolerance_seconds < 0:
        raise ValueError("tolerance_seconds must be >= 0")
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
    if tolerance_seconds is not None:
        # the matched right row's own timestamp rides along in the same
        # window pick so the tolerance check is one integer compare
        l_tag = l_tag.withColumn("__r___ts", F.lit(None).cast(r_tag.schema["__ts"].dataType))
        r_tag = r_tag.withColumn("__r___ts", F.col("__ts"))
    matched = l_tag.unionByName(r_tag)
    for c in right_cols:
        matched = matched.withColumn(f"__m_{c}", pick(f"__r_{c}").over(w))
    out = matched.filter(F.col("__side") == 1)
    if tolerance_seconds is not None:
        m_ts = pick("__r___ts").over(w)
        matched = matched.withColumn("__m___ts", m_ts)
        out = matched.filter(F.col("__side") == 1)
        # timestamp keys compare in integer microseconds; plain numeric
        # keys compare raw (tolerance then reads in the key's own units)
        if dict(matched.dtypes)["__ts"].startswith("timestamp"):
            gap = F.abs(
                F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m___ts"))
            )
            tol = F.lit(tolerance_seconds) * 1_000_000
        else:
            gap = F.abs(F.col("__ts") - F.col("__m___ts"))
            tol = F.lit(tolerance_seconds)
        within = F.col("__m___ts").isNotNull() & (gap <= tol)
        return out.select(
            *by,
            *[F.col(c) for c in l_payload],
            *[
                F.when(within, F.col(f"__m_{c}")).alias(f"asof_{c}")
                for c in right_cols
            ],
        )
    return out.select(
        *by,
        *[F.col(c) for c in l_payload],
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_cols],
    )
