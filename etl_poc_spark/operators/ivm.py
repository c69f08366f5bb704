"""Incremental view maintenance: join views (append-only fast lane +
versioned CDF-driven with delete/update propagation) and aggregate
views (additively-maintained GROUP BY over a versioned base).

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


# --- IVM over VERSIONED bases: deletes/updates via the change feed ---------
#
# The append-only delta rule above can't retract view rows; once a base
# supports updates/deletes (the versioned MERGE tier), the maintained view
# must too. The composition: both bases are versioned tables
# (operators/upsert.py), their change feeds come from table_changes (the
# Delta-CDF shape), and the VIEW ITSELF is a versioned table — deletions
# propagate with delete_versioned (so right-to-be-forgotten erasure on a
# base reaches every denormalized copy in the view), additions/updates
# with upsert_versioned. Each maintenance run shuffles delta-sized frames
# against the current bases; the full join never recomputes.


def _ivm_state_path(view_dir: str) -> str:
    return os.path.join(view_dir, "_ivm_state.json")


def _read_ivm_state(spark: SparkSession, view_dir: str) -> dict | None:
    import json

    from etl_poc_spark.operators.upsert import _hfs

    path = _ivm_state_path(view_dir)
    fs, P = _hfs(spark, path)
    if not fs.exists(P(path)):
        return None
    stream = fs.open(P(path))
    try:
        body = spark._jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return json.loads(body)


def _write_ivm_state(spark: SparkSession, view_dir: str, state: dict) -> None:
    import json

    from etl_poc_spark.operators.upsert import _hfs

    path = _ivm_state_path(view_dir)
    fs, P = _hfs(spark, path)
    out = fs.create(P(path), True)
    try:
        out.write(bytearray(json.dumps(state).encode("utf-8")))
    finally:
        out.close()


def maintain_join_view_versioned(
    spark: SparkSession,
    left_dir: str,
    right_dir: str,
    view_dir: str,
    on: Sequence[str],
    left_key: Sequence[str],
    right_key: Sequence[str],
    partition_col: str,
) -> dict:
    """Bring the versioned join view at `view_dir` up to date with the
    CURRENT states of the versioned bases at `left_dir` / `right_dir`,
    consuming only the change feed since the last maintenance run.

    - view rows: left JOIN right ON `on`; view primary key is
      left_key + right_key (both sides' keys must be carried into the
      view — they are, since the join keeps all columns);
    - deletes/updates on a base RETRACT their view rows via
      delete_versioned keyed on that side's key alone (every
      denormalized copy goes — the erasure-propagation contract), then
      updated/inserted rows re-join against the other base's CURRENT
      state and upsert back in;
    - the dL x dR term is exact: changed/inserted left rows join the
      full new right, and changed/inserted right rows join only the
      UNTOUCHED left rows, so pairs where both sides changed appear
      exactly once;
    - maintenance state (the last-consumed commit sequence per base)
      lives in `view_dir/_ivm_state.json`; the first call builds the
      view with one full join.

    Cost per run: two table_changes diffs (full-outer joins on the base
    keys — the CDF read), delta x base joins, and one delete + one
    upsert commit on the view. Returns the new state dict. Valid while
    the bases' `from_seq` resolutions survive vacuum — run maintenance
    inside the retention window."""
    from pyspark.sql import functions as F

    from etl_poc_spark.operators.upsert import (
        _list_commits,
        delete_versioned,
        read_versioned,
        table_changes,
        upsert_versioned,
    )

    keys = list(on)
    lk = list(left_key)
    rk = list(right_key)
    view_key = lk + rk
    ln = len(_list_commits(spark, left_dir))
    rn = len(_list_commits(spark, right_dir))
    l_new = read_versioned(spark, left_dir)
    r_new = read_versioned(spark, right_dir)
    state = _read_ivm_state(spark, view_dir)
    epoch = (state or {}).get("epoch", 0) + 1

    if state is None:
        view = l_new.join(r_new, keys).withColumn("__seq", F.lit(epoch))
        upsert_versioned(
            spark, view, view_dir, view_key, "__seq", partition_col
        )
        new_state = {"left_seq": ln, "right_seq": rn, "epoch": epoch}
        _write_ivm_state(spark, view_dir, new_state)
        return new_state

    def changes(base_dir, key_cols, cols, from_seq, to_seq):
        if to_seq == from_seq:
            return None
        compare = [c for c in cols if c not in key_cols]
        ch = table_changes(
            spark, base_dir, key_cols, compare, from_seq=from_seq, to_seq=to_seq
        ).where(F.col("status") != "unchanged")
        touched = ch.select(*key_cols).distinct()
        added = ch.where(F.col("status").isin("inserted", "changed")).select(
            *key_cols, *[F.col(f"new_{c}").alias(c) for c in compare]
        )
        return touched, added

    lch = changes(left_dir, lk, l_new.columns, state["left_seq"], ln)
    rch = changes(right_dir, rk, r_new.columns, state["right_seq"], rn)

    # retractions first: every view row carrying a touched base key goes
    # (deleted keys stay gone; changed/inserted keys re-enter below)
    for key_cols, ch in ((lk, lch), (rk, rch)):
        if ch is None:
            continue
        touched, _ = ch
        try:
            delete_versioned(spark, touched, view_dir, key_cols, partition_col)
        except ValueError as exc:
            if "matches no live partition" not in str(exc):
                raise
            # nothing in the view carried these keys (pure inserts)

    parts: list[DataFrame] = []
    if lch is not None:
        parts.append(lch[1].join(r_new, keys))
    if rch is not None:
        l_base = l_new
        if lch is not None:
            # pairs where BOTH sides changed already joined above
            l_base = l_new.join(lch[1].select(*lk).distinct(), lk, "left_anti")
        parts.append(l_base.join(rch[1], keys))
    if parts:
        delta = parts[0]
        for p in parts[1:]:
            delta = delta.unionByName(p)
        if not delta.isEmpty():
            upsert_versioned(
                spark,
                delta.withColumn("__seq", F.lit(epoch)),
                view_dir,
                view_key,
                "__seq",
                partition_col,
            )
    new_state = {"left_seq": ln, "right_seq": rn, "epoch": epoch}
    _write_ivm_state(spark, view_dir, new_state)
    return new_state


def read_join_view_versioned(spark: SparkSession, view_dir: str) -> DataFrame:
    """The maintained versioned view's live state, without the internal
    sequence column."""
    from etl_poc_spark.operators.upsert import read_versioned

    return read_versioned(spark, view_dir).drop("__seq")


def maintain_agg_view_versioned(
    spark: SparkSession,
    base_dir: str,
    view_dir: str,
    *,
    base_key: Sequence[str],
    group_key: Sequence[str],
    sums: Sequence[str],
    partition_col: str,
) -> dict:
    """Incrementally maintain a GROUP BY materialized view over the
    versioned base at `base_dir`, consuming only the change feed since
    the last run — the aggregate sibling of maintain_join_view_versioned.

    View schema: group_key..., `sum_<c>` for each c in `sums`, and
    `n_rows` (group row count). SUM/COUNT are the additively-maintainable
    aggregates: each changed base row contributes (new − old), inserts
    (+new, +1), deletes (−old, −1) — including rows whose GROUP changes
    on update (they retract under the old group values and re-enter
    under the new ones). Groups whose n_rows reaches 0 are deleted from
    the view. AVG derives as sum/n_rows at read time; MIN/MAX are NOT
    delete-maintainable without per-group history and stay out of scope
    (rebuild those, or keep a sorted sketch).

    NULL measure values contribute 0 to the sum and still count in
    n_rows (document-level semantics; an SQL AVG ignoring nulls needs
    its own non-null counter — add the indicator column upstream).
    With DOUBLE measures the maintained sum can differ from a rebuild
    by float associativity — use integer/DECIMAL measures where exact
    equivalence matters (the pytest pins integer measures bit-exact).

    Cost per run: one CDF diff (full-outer join of the two base
    SNAPSHOTS on base_key — O(base), not O(delta)), one delta-sized
    groupBy, one delta×view join on the group key, and one delete + one
    upsert commit. Measured at 10x (SCALING.md): a cheap 15-group sum
    REBUILDS faster than it maintains — use this operator when rebuild
    is genuinely expensive (wide multi-join views) or when versioned
    delete/update propagation is the point; for append-only rollups
    prefer the O(delta) incremental count stores. At 100 TB
    the view stays partitioned on `partition_col` (must be one of
    group_key) so the merge rewrites only touched partitions.

    First call builds the view with one full groupBy. State (the
    last-consumed base commit count) lives in `view_dir/_ivm_state.json`.
    Valid while `from_seq` survives the base's vacuum retention window."""
    from pyspark.sql import functions as F

    from etl_poc_spark.operators.upsert import (
        _list_commits,
        delete_versioned,
        read_versioned,
        table_changes,
        upsert_versioned,
    )

    gk = list(group_key)
    if partition_col not in gk:
        raise ValueError(
            f"partition_col {partition_col!r} must be one of group_key {gk}"
        )
    ms = list(sums)
    bad_ms = [c for c in ms if c in set(base_key)]
    if bad_ms:
        raise ValueError(
            f"sum measures {bad_ms} are base-key columns — a key is "
            "invariant across versions so its delta is always 0; drop it "
            "from sums (keys may appear in group_key, not in sums)"
        )
    base_n = len(_list_commits(spark, base_dir))
    state = _read_ivm_state(spark, view_dir)
    epoch = (state or {}).get("epoch", 0) + 1

    def agg_cols():
        return [
            *[F.sum(F.coalesce(F.col(c), F.lit(0))).alias(f"sum_{c}") for c in ms],
            F.count(F.lit(1)).alias("n_rows"),
        ]

    if state is None:
        full = read_versioned(spark, base_dir)
        view = full.groupBy(*gk).agg(*agg_cols()).withColumn("__seq", F.lit(epoch))
        upsert_versioned(spark, view, view_dir, gk, "__seq", partition_col)
        new_state = {"base_seq": base_n, "epoch": epoch}
        _write_ivm_state(spark, view_dir, new_state)
        return new_state

    if base_n == state["base_seq"]:
        return state

    cur = read_versioned(spark, base_dir)
    compare = [c for c in cur.columns if c not in base_key]
    ch = table_changes(
        spark, base_dir, list(base_key), compare,
        from_seq=state["base_seq"], to_seq=base_n,
    ).where(F.col("status") != "unchanged")

    # retractions carry old group/measure values with negative sign;
    # additions carry the new values — one unioned delta frame, then a
    # delta-sized groupBy produces per-group net contributions. Group
    # columns that are ALSO base-key columns come through table_diff
    # unprefixed (keys are coalesced, invariant across old/new), so
    # they select as-is on both sides.
    bk = set(base_key)

    def side(statuses: list[str], prefix: str, sign: int) -> DataFrame:
        return ch.where(F.col("status").isin(statuses)).select(
            *[
                (F.col(c) if c in bk else F.col(f"{prefix}{c}")).alias(c)
                for c in gk
            ],
            *[
                (F.lit(sign) * F.coalesce(F.col(f"{prefix}{c}"), F.lit(0))).alias(c)
                for c in ms
            ],
            F.lit(sign).alias("__dn"),
        )

    delta_rows = side(["deleted", "changed"], "old_", -1).unionByName(
        side(["inserted", "changed"], "new_", +1)
    )
    delta = delta_rows.groupBy(*gk).agg(
        *[F.sum(c).alias(f"d_sum_{c}") for c in ms],
        F.sum("__dn").alias("d_n"),
    )
    if delta.isEmpty():
        new_state = {"base_seq": base_n, "epoch": epoch}
        _write_ivm_state(spark, view_dir, new_state)
        return new_state

    old_view = read_versioned(spark, view_dir).drop("__seq")
    merged = delta.join(old_view, gk, "left").select(
        *gk,
        *[
            (
                F.coalesce(F.col(f"sum_{c}"), F.lit(0))
                + F.col(f"d_sum_{c}")
            ).alias(f"sum_{c}")
            for c in ms
        ],
        (F.coalesce(F.col("n_rows"), F.lit(0)) + F.col("d_n")).alias("n_rows"),
    )
    merged = merged.persist()
    try:
        gone = merged.where(F.col("n_rows") == 0).select(*gk)
        if not gone.isEmpty():
            try:
                delete_versioned(spark, gone, view_dir, gk, partition_col)
            except ValueError as exc:
                if "matches no live partition" not in str(exc):
                    raise
        live = merged.where(F.col("n_rows") != 0).withColumn(
            "__seq", F.lit(epoch)
        )
        if not live.isEmpty():
            upsert_versioned(spark, live, view_dir, gk, "__seq", partition_col)
    finally:
        merged.unpersist()
    new_state = {"base_seq": base_n, "epoch": epoch}
    _write_ivm_state(spark, view_dir, new_state)
    return new_state


def read_agg_view_versioned(spark: SparkSession, view_dir: str) -> DataFrame:
    """The maintained aggregate view's live state, without the internal
    sequence column."""
    from etl_poc_spark.operators.upsert import read_versioned

    return read_versioned(spark, view_dir).drop("__seq")


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
