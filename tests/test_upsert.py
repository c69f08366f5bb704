"""Keyed parquet MERGE: latest-sequence-wins, partition-pruned dynamic
overwrite, first-load bootstrap, update-batch-internal dedup."""

from __future__ import annotations

import os

from pyspark.sql import functions as F


def _rows(spark, data):
    return spark.createDataFrame(data, "k long, day string, v string, seq long")


def _read(spark, d):
    return {
        (r["k"]): (r["day"], r["v"], r["seq"])
        for r in spark.read.parquet(d).collect()
    }


def test_upsert_latest_wins_and_prunes_partitions(spark, tmp_path):
    from etl_poc_spark.operators.upsert import upsert_parquet

    target = str(tmp_path / "t")
    base = _rows(
        spark,
        [(1, "d1", "a", 1), (2, "d1", "b", 1), (3, "d2", "c", 1)],
    )
    upsert_parquet(spark, base, target, ["k"], "seq", partition_col="day")
    assert _read(spark, target) == {
        1: ("d1", "a", 1),
        2: ("d1", "b", 1),
        3: ("d2", "c", 1),
    }
    d2_mtime = os.path.getmtime(str(tmp_path / "t" / "day=d2"))

    # update key 2 (same day), insert key 4 into d1; d2 untouched
    upd = _rows(spark, [(2, "d1", "B", 2), (4, "d1", "d", 2)])
    upsert_parquet(spark, upd, target, ["k"], "seq", partition_col="day")
    assert _read(spark, target) == {
        1: ("d1", "a", 1),
        2: ("d1", "B", 2),
        3: ("d2", "c", 1),
        4: ("d1", "d", 2),
    }
    # the untouched partition directory was not rewritten
    assert os.path.getmtime(str(tmp_path / "t" / "day=d2")) == d2_mtime


def test_upsert_stale_update_loses_and_batch_dedupes(spark, tmp_path):
    from etl_poc_spark.operators.upsert import upsert_parquet

    target = str(tmp_path / "t")
    upsert_parquet(
        spark, _rows(spark, [(1, "d1", "new", 5)]), target, ["k"], "seq",
        partition_col="day",
    )
    # a STALE update (seq 3 < 5) must not clobber; a batch with two
    # versions of key 2 keeps only its latest
    upd = _rows(spark, [(1, "d1", "old", 3), (2, "d1", "x", 1), (2, "d1", "y", 2)])
    upsert_parquet(spark, upd, target, ["k"], "seq", partition_col="day")
    got = _read(spark, target)
    assert got[1] == ("d1", "new", 5)
    assert got[2] == ("d1", "y", 2)


def test_upsert_equal_seq_prefers_update(spark, tmp_path):
    from etl_poc_spark.operators.upsert import upsert_parquet

    target = str(tmp_path / "t")
    upsert_parquet(
        spark, _rows(spark, [(1, "d1", "old", 1)]), target, ["k"], "seq",
        partition_col="day",
    )
    upsert_parquet(
        spark, _rows(spark, [(1, "d1", "new", 1)]), target, ["k"], "seq",
        partition_col="day",
    )
    assert _read(spark, target)[1] == ("d1", "new", 1)


def test_upsert_unpartitioned_small_dim(spark, tmp_path):
    from etl_poc_spark.operators.upsert import upsert_parquet

    target = str(tmp_path / "dim")
    upsert_parquet(spark, _rows(spark, [(1, "d1", "a", 1)]), target, ["k"], "seq")
    upsert_parquet(spark, _rows(spark, [(1, "d1", "A", 2)]), target, ["k"], "seq")
    assert _read(spark, target) == {1: ("d1", "A", 2)}
    # staging dirs are cleaned up
    assert [p for p in os.listdir(tmp_path) if "staging" in p] == []


# --- versioned MERGE with commit manifest -----------------------------------


def _vread(spark, d):
    from etl_poc_spark.operators.upsert import read_versioned

    return {
        r["k"]: (r["day"], r["v"], r["seq"]) for r in read_versioned(spark, d).collect()
    }


def test_versioned_upsert_merge_and_untouched_partitions(spark, tmp_path):
    """Two commits: the second updates one key in one partition; untouched
    partitions keep serving their original commit's files (resolution is
    per-partition, and the first commit's data dir is never rewritten)."""
    from etl_poc_spark.operators.upsert import _resolve_partitions, upsert_versioned

    target = str(tmp_path / "vt")
    upsert_versioned(
        spark,
        _rows(spark, [(1, "d1", "x", 1), (2, "d1", "y", 2), (3, "d2", "z", 1)]),
        target, ["k"], "seq", "day",
    )
    before = _resolve_partitions(target)
    upsert_versioned(
        spark, _rows(spark, [(1, "d1", "new", 5)]), target, ["k"], "seq", "day"
    )
    after = _resolve_partitions(target)
    got = _vread(spark, target)
    assert got[1] == ("d1", "new", 5)
    assert got[2] == ("d1", "y", 2)      # carried through the d1 merge
    assert got[3] == ("d2", "z", 1)      # untouched partition
    assert after["d2"] == before["d2"]   # same immutable files, not rewritten
    assert after["d1"] != before["d1"]   # d1 resolved to the new commit


def test_versioned_upsert_crash_before_finalize_serves_pre_merge_state(
    spark, tmp_path
):
    """The crash-window pytest the protocol exists for: simulate a failure
    AFTER the commit's data files are fully written but BEFORE the
    manifest rename, and show readers still see the exact pre-merge
    state; re-running the merge then converges, and vacuum removes the
    orphaned half-commit."""
    import pytest

    import etl_poc_spark.operators.upsert as U

    target = str(tmp_path / "vt")
    U.upsert_versioned(
        spark, _rows(spark, [(1, "d1", "x", 1), (2, "d2", "y", 1)]),
        target, ["k"], "seq", "day",
    )
    pre = _vread(spark, target)

    # crash: data phase completes, finalize never runs
    real_finalize = U._finalize_commit

    def boom(*a, **k):
        raise RuntimeError("simulated crash before manifest publish")

    U._finalize_commit = boom
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            U.upsert_versioned(
                spark, _rows(spark, [(1, "d1", "new", 9)]),
                target, ["k"], "seq", "day",
            )
    finally:
        U._finalize_commit = real_finalize

    # orphan data exists on disk, but the reader resolves pre-merge state
    data_dirs = os.listdir(os.path.join(target, "_data"))
    assert len(data_dirs) == 2  # original commit + orphaned half-commit
    assert _vread(spark, target) == pre

    # retry converges; vacuum drops the orphan and the superseded version
    U.upsert_versioned(
        spark, _rows(spark, [(1, "d1", "new", 9)]), target, ["k"], "seq", "day"
    )
    got = _vread(spark, target)
    assert got[1] == ("d1", "new", 9) and got[2] == ("d2", "y", 1)
    removed = U.vacuum_versioned(spark, target)
    assert removed >= 2  # orphan d1 + superseded d1
    assert _vread(spark, target) == got  # vacuum never changes visible data


def test_versioned_read_errors_without_commits(spark, tmp_path):
    import pytest

    from etl_poc_spark.operators.upsert import read_versioned

    with pytest.raises(ValueError, match="no finalized commits"):
        read_versioned(spark, str(tmp_path / "nothing"))
