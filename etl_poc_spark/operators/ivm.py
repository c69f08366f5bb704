"""Incremental view maintenance for join views (append-only bases).

The 100-TB pattern: a denormalized join view (facts x dim, orders x
customer) that downstream consumers read constantly is too expensive to
rebuild per ingest — the standard delta rule maintains it instead:

    dJ = dL  JOIN  (R_old  U  dR)   union   L_old  JOIN  dR

(equivalently dL JOIN R_new  U  L_old JOIN dR — the dL x dR cross term is
counted exactly once). Each ingest shuffles ONLY delta-sized frames
against the bases; the full join never recomputes. With inserts-only
bases the view is append-only too, so the store is a plain parquet log —
no merge, no tombstones. (Updates/deletes need the versioned MERGE tier,
operators/upsert.py; this operator is the insert-path fast lane.)

Store layout under `store_dir`: left/, right/ (accumulated base rows,
needed because the delta rule joins deltas against the OTHER side's
history) and view/ (the maintained join). All three are append-only.
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:  # first ingest: no store yet (AnalysisException)
        return None


def incremental_join_view_ingest(
    spark: SparkSession,
    store_dir: str,
    on: Sequence[str],
    left_delta: DataFrame | None = None,
    right_delta: DataFrame | None = None,
) -> None:
    """Fold a batch of left and/or right inserts into the join view.

    The view delta materializes (localCheckpoint) BEFORE any base append —
    the delta plans read the base parquet, and Spark lists files at action
    time, so appending first would double-count the dL x dR term."""
    keys = list(on)
    l_dir = os.path.join(store_dir, "left")
    r_dir = os.path.join(store_dir, "right")
    v_dir = os.path.join(store_dir, "view")
    l_old = _read_or_none(spark, l_dir)
    r_old = _read_or_none(spark, r_dir)

    parts: list[DataFrame] = []
    if left_delta is not None:
        r_new = (
            r_old.unionByName(right_delta)
            if (r_old is not None and right_delta is not None)
            else (right_delta if r_old is None else r_old)
        )
        if r_new is not None:
            parts.append(left_delta.join(r_new, keys))
    if right_delta is not None and l_old is not None:
        parts.append(l_old.join(right_delta, keys))
    view_delta = None
    if parts:
        view_delta = parts[0]
        for p in parts[1:]:
            view_delta = view_delta.unionByName(p)
        view_delta = view_delta.localCheckpoint(eager=True)

    if left_delta is not None:
        left_delta.write.mode("append").parquet(l_dir)
    if right_delta is not None:
        right_delta.write.mode("append").parquet(r_dir)
    if view_delta is not None:
        view_delta.write.mode("append").parquet(v_dir)


def read_join_view(spark: SparkSession, store_dir: str) -> DataFrame:
    """The maintained view (empty-schema-safe only once something joined)."""
    return spark.read.parquet(os.path.join(store_dir, "view"))


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
