"""Stream-stream joins (Structured Streaming §2.10 depth).

The canonical attribution shape: match each left-stream event with
right-stream events for the same key that arrive inside a bounded
interval after it. Both sides carry watermarks and the join condition
bounds event time in BOTH directions, so Spark can evict join state —
without the time bound the state store would grow forever, which is the
stream-stream scale failure mode (the batch as-of analog is
operators/temporal.py).

Reference parity: the reference has no streaming runtime at all
(SURVEY.md §2.10 — Airflow @daily batches); this is engine surface the
replacement adds, consistent with the batch/streaming equivalence policy
(every streaming op has a batch formulation and an equality test).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    max_delay: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on `key` where the right event lands in
    [left_ts, left_ts + max_delay]. Works identically on batch frames
    (watermarks are a no-op there) — the equivalence tests rely on that.

    Column names other than `key` must be disjoint between the sides
    (rename before joining, as with any self-ish join). State eviction:
    each side keeps rows only until its watermark passes the interval
    bound, so state is O(rate x max_delay) per key — input-size
    independent."""
    l = left.withWatermark(left_ts, watermark).alias("l")
    r = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"interval {max_delay}"))
    )
    return l.join(r, cond, how).drop(F.col(f"r.{key}"))
