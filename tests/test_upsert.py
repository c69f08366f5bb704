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
