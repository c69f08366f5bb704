"""Keyed upsert (MERGE) into partitioned parquet without a table format.

The CDC/latest-record-wins pattern: fold an update batch into a parquet
target so each key keeps its highest-sequence row. Lake formats (Delta,
Iceberg, Hudi) ship MERGE natively; this operator provides the same
semantics on plain parquet — the honest fallback when no table format is
available (none is baked into this environment).

Scale discipline:
- only AFFECTED partitions are read and rewritten: the update batch's
  partition values prune the target scan, and
  `partitionOverwriteMode=dynamic` rewrites just those directories —
  a 100 TB table with daily updates touches days, not history;
- the merge itself is one window (row_number over key, ordered by the
  sequence column descending) — the same single-shuffle shape as
  per-group quota;
- updates are staged to a sibling directory before the overwrite because
  Spark cannot overwrite a path it is lazily reading from; the staging
  write materializes the merge, the overwrite then re-reads the staged
  frame. Two sequential writes of the AFFECTED partitions only.

Crash-safety note (documented, not hidden): parquet-without-a-format has
no atomic commit across partitions; a crash between partition rewrites
leaves mixed state. That is exactly the gap table formats close — at
production scale, put Delta/Iceberg in front of this operator and use
native MERGE; the logical plan stays identical.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def latest_by_key(df: DataFrame, key_cols: list[str], seq_col: str) -> DataFrame:
    """Keep the highest-seq row per key (ties broken arbitrarily but
    deterministically by preferring the update source flag if present)."""
    order = [F.col(seq_col).desc()]
    if "__is_update" in df.columns:
        order.append(F.col("__is_update").desc())
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "__is_update")
    )


def upsert_parquet(
    spark: SparkSession,
    updates: DataFrame,
    target_dir: str,
    key_cols: list[str],
    seq_col: str,
    partition_col: str | None = None,
    staging_dir: str | None = None,
) -> None:
    """MERGE `updates` into the parquet table at `target_dir`.

    With `partition_col`: prune the target read to the update batch's
    partition values and dynamically overwrite only those partitions.
    Without: whole-table rewrite (the small-dimension path — document the
    choice at call sites)."""
    from pyspark.errors import AnalysisException

    staging = staging_dir or f"{target_dir}__staging_{uuid.uuid4().hex[:8]}"
    upd = updates.withColumn("__is_update", F.lit(1))
    try:
        existing = spark.read.parquet(target_dir)
        have_target = True
    except AnalysisException:
        # first load only — anything else (corrupt footer etc.) surfaces
        have_target = False

    if have_target:
        if partition_col is not None:
            # bounded collect: one value per AFFECTED partition (days of a
            # daily feed — KBs), used to prune the target scan
            parts = [r[0] for r in updates.select(partition_col).distinct().collect()]
            existing = existing.where(F.col(partition_col).isin(parts))
        merged = latest_by_key(
            existing.withColumn("__is_update", F.lit(0)).unionByName(upd),
            key_cols,
            seq_col,
        )
    else:
        merged = latest_by_key(upd, key_cols, seq_col)

    merged.write.mode("overwrite").parquet(staging)
    staged = spark.read.parquet(staging)
    writer = staged.write.mode("overwrite")
    if partition_col is not None and have_target:
        writer = writer.option("partitionOverwriteMode", "dynamic").partitionBy(
            partition_col
        )
    elif partition_col is not None:
        writer = writer.partitionBy(partition_col)
    writer.parquet(target_dir)

    # best-effort staging cleanup through the Hadoop FS API (works for
    # local paths and cluster filesystems alike)
    try:
        jpath = spark._jvm.org.apache.hadoop.fs.Path(staging)
        fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
        fs.delete(jpath, True)
    except Exception:  # noqa: BLE001 — cleanup must never fail the merge
        pass


# --- Versioned MERGE with a commit manifest (closes the crash window) -------
#
# The minimal table-format protocol: data files are IMMUTABLE once written
# (each commit writes to a fresh _data/<commit_id>/ directory; nothing is
# ever overwritten in place), and visibility is controlled solely by small
# JSON manifests in _commits/, finalized via an atomic single-file rename.
# A crash at ANY point before the manifest rename leaves only orphan data
# files — readers keep resolving the previous finalized commit per
# partition, i.e. the exact pre-merge state. This is the same
# write-data-then-swap-pointer commit rule Delta/Iceberg use, specialized
# to partition granularity.
#
# Layout:
#   target/_data/<commit_id>/__p=<val>/part-*.parquet
#   target/_commits/<seq:08d>_<commit_id>.json
#       {"commit_id": ..., "partitions": ["<val>", ...]}
#
# The partition value is kept as a REAL data column in the files (the
# directory key is a duplicated __p column that partitionBy consumes), so
# leaf directories from different commits read uniformly without basePath
# gymnastics. Manifest listing is driver-side and bounded: one small JSON
# per commit (compact with vacuum_versioned).
#
# Scope notes: manifest IO uses the local filesystem API (this
# environment's storage); a cluster deployment swaps _list_commits/
# _finalize_commit to the Hadoop FS equivalents — rename is atomic on
# HDFS too, and on S3 the rename becomes a conditional PUT. Partition
# values must be directory-name-safe (dates, ids — the usual partition
# keys); values needing escaping would diverge between the manifest
# string and Spark's escaped directory name.

_COMMITS = "_commits"
_DATA = "_data"


def _list_commits(target_dir: str) -> list[dict]:
    """Finalized commits in sequence order. Unfinalized work is invisible
    by construction (the manifest only appears via the final rename)."""
    import json
    import os

    cdir = os.path.join(target_dir, _COMMITS)
    if not os.path.isdir(cdir):
        return []
    out = []
    for name in sorted(os.listdir(cdir)):
        if name.startswith(".") or not name.endswith(".json"):
            continue
        with open(os.path.join(cdir, name)) as f:
            out.append(json.load(f))
    return out


def _resolve_partitions(target_dir: str) -> dict[str, str]:
    """partition value -> leaf data path of its latest finalized commit."""
    import os

    latest: dict[str, str] = {}
    for c in _list_commits(target_dir):
        for p in c["partitions"]:
            latest[p] = os.path.join(
                target_dir, _DATA, c["commit_id"], f"__p={p}"
            )
    return latest


def _write_commit_data(
    merged: DataFrame, target_dir: str, partition_col: str, commit_id: str
) -> None:
    """Phase 1: write the merged rows for the affected partitions to an
    immutable fresh directory. Crashing after this leaves orphans only."""
    import os

    (
        merged.withColumn("__p", F.col(partition_col).cast("string"))
        .write.partitionBy("__p")
        .parquet(os.path.join(target_dir, _DATA, commit_id))
    )


def _finalize_commit(
    target_dir: str, commit_id: str, partitions: list[str]
) -> None:
    """Phase 2: publish. One small JSON written to a dot-temp name then
    renamed — the atomic visibility switch (POSIX/HDFS single-file
    rename)."""
    import json
    import os

    cdir = os.path.join(target_dir, _COMMITS)
    os.makedirs(cdir, exist_ok=True)
    seq = len(_list_commits(target_dir)) + 1
    tmp = os.path.join(cdir, f".tmp_{commit_id}.json")
    with open(tmp, "w") as f:
        json.dump({"commit_id": commit_id, "partitions": sorted(partitions)}, f)
    os.rename(tmp, os.path.join(cdir, f"{seq:08d}_{commit_id}.json"))


def read_versioned(spark: SparkSession, target_dir: str) -> DataFrame:
    """Read the table at its latest finalized commit per partition.
    Partitions mid-merge (data written, manifest not yet renamed) serve
    their previous committed version — the pre-merge state."""
    paths = sorted(_resolve_partitions(target_dir).values())
    if not paths:
        raise ValueError(f"no finalized commits under {target_dir}")
    return spark.read.parquet(*paths)


def upsert_versioned(
    spark: SparkSession,
    updates: DataFrame,
    target_dir: str,
    key_cols: list[str],
    seq_col: str,
    partition_col: str,
) -> str:
    """MERGE `updates` into the versioned table at `target_dir` with the
    commit-manifest protocol (see module comment): merge the affected
    partitions against the current committed state, write the result to
    an immutable commit directory, then atomically publish the manifest.
    Returns the commit id. Readers (read_versioned) never observe a
    partial merge."""
    commit_id = uuid.uuid4().hex[:12]
    upd = updates.withColumn("__is_update", F.lit(1))
    # bounded collect: one value per AFFECTED partition (days of a daily
    # feed — KBs), used both to prune the current-state read and as the
    # manifest's partition list
    parts = [str(r[0]) for r in updates.select(partition_col).distinct().collect()]
    current = _resolve_partitions(target_dir)
    have = [p for p in parts if p in current]
    if have:
        existing = spark.read.parquet(*[current[p] for p in have]).withColumn(
            "__is_update", F.lit(0)
        )
        merged = latest_by_key(existing.unionByName(upd), key_cols, seq_col)
    else:
        merged = latest_by_key(upd, key_cols, seq_col)
    _write_commit_data(merged, target_dir, partition_col, commit_id)
    _finalize_commit(target_dir, commit_id, parts)
    return commit_id


def vacuum_versioned(spark: SparkSession, target_dir: str) -> int:
    """Delete data directories no finalized manifest's LATEST resolution
    references (superseded versions and crash orphans). Returns how many
    leaf directories were removed. Safe to run concurrently with readers
    that resolved before the vacuum only if superseded versions outlive
    reader runtime — same caveat as any table format's vacuum."""
    import os
    import shutil

    live = set(_resolve_partitions(target_dir).values())
    ddir = os.path.join(target_dir, _DATA)
    removed = 0
    if not os.path.isdir(ddir):
        return 0
    for cid in os.listdir(ddir):
        cpath = os.path.join(ddir, cid)
        for leaf in os.listdir(cpath):
            lpath = os.path.join(cpath, leaf)
            if leaf.startswith("__p=") and lpath not in live:
                shutil.rmtree(lpath)
                removed += 1
        if not any(n.startswith("__p=") for n in os.listdir(cpath)):
            shutil.rmtree(cpath)
    return removed
