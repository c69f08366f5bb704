"""Generic as-of join — attach, to each left row, the attributes of the
temporally closest right row at-or-before (backward) or at-or-after
(forward) its timestamp, per key, optionally within a tolerance.

The time-series primitive (pandas merge_asof, kdb aj, QuestDB/DuckDB
ASOF JOIN) that Spark's join operators don't express directly: a naive
formulation is an interval theta-join (O(n*m) per key), and a windowed
`max(right_ts) <= left_ts` subquery is two shuffles plus a re-join.

Shape here is the UNION-WINDOW trick (same as operators/scd.py::pit_join,
which is the gapless-history special case): interleave right rows and
left rows on ONE (key, ts) sort, carry the last (backward) right-row
attribute struct onto each left row with `last(..., ignorenulls=True)`.
ONE key shuffle total, no theta-join, no re-join — the 100-TB-safe plan.
Tolerance is a post-filter on the carried timestamp (integer microsecond
arithmetic), so it costs nothing extra.

Ordering at one instant: right rows sort BEFORE left rows (a quote AT the
event's timestamp matches — inclusive, pandas merge_asof default); among
same-instant right rows the carry takes the last by `tiebreak_cols` so
the winner is deterministic.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: Sequence[str],
    left_ts: str,
    right_ts: str,
    attr_cols: Sequence[str],
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Left as-of join: every left row, plus `attr_cols` from the matched
    right row (NULLs when nothing qualifies) and `__matched_ts` with the
    matched right timestamp. Output columns: left's, then attr_cols."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = list(key_cols)
    attrs = list(attr_cols)
    payload = F.struct(
        F.col(right_ts).alias("__rts"), *[F.col(c) for c in attrs]
    )
    r = right.select(
        *keys,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__tb_{i}") for i, c in enumerate(tiebreak_cols)],
        payload.alias("__p"),
    )
    left_cols = list(left.columns)
    l = left.select(  # noqa: E741
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        *[
            F.lit(None).cast(dict(right.dtypes)[c]).alias(f"__tb_{i}")
            for i, c in enumerate(tiebreak_cols)
        ],
        F.lit(None).cast(r.schema["__p"].dataType).alias("__p"),
    )
    union = r.select(
        *keys,
        *[
            F.lit(None).cast(dict(left.dtypes)[c]).alias(c)
            for c in left_cols
            if c not in keys
        ],
        "__ts",
        "__is_left",
        *[f"__tb_{i}" for i in range(len(tiebreak_cols))],
        "__p",
    ).unionByName(
        l.select(
            *keys,
            *[F.col(c) for c in left_cols if c not in keys],
            "__ts",
            "__is_left",
            *[f"__tb_{i}" for i in range(len(tiebreak_cols))],
            "__p",
        )
    )
    # backward: ascending ts, right-before-left at equal instants, larger
    # tiebreak later (so `last` picks it). forward: the mirror — descending
    # ts carries the NEXT right row backward over the sort.
    asc = direction == "backward"
    order = [F.asc("__ts") if asc else F.desc("__ts"), F.asc("__is_left")]
    for i in range(len(tiebreak_cols)):
        order.append(F.asc(f"__tb_{i}") if asc else F.desc(f"__tb_{i}"))
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = union.withColumn(
        "__eff", F.last("__p", ignorenulls=True).over(w)
    ).where(F.col("__is_left") == 1)
    if tolerance_seconds is not None:
        gap = F.unix_micros(F.col("__ts")) - F.unix_micros(
            F.col("__eff").getField("__rts")
        )
        if direction == "forward":
            gap = -gap
        out = out.withColumn(
            "__eff",
            F.when(gap <= int(tolerance_seconds) * 1_000_000, F.col("__eff")),
        )
    return out.select(
        *left_cols,
        F.col("__eff").getField("__rts").alias("__matched_ts"),
        *[F.col("__eff").getField(c).alias(c) for c in attrs],
    )


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
