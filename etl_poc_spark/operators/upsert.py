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
