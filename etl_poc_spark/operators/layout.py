"""Data-layout operators: range-partitioned globally-sorted writes.

A 100-TB pipeline's output layout decides every downstream read: a
total-order-by-key dataset lets merge scans, as-of probes, and
range-pruned reads skip everything outside their key window. The naive
way to a total order — `orderBy(...).write` — funnels through a global
sort whose final stage still writes from range-partitioned tasks; this
operator makes the contract EXPLICIT and file-addressable:

  repartitionByRange(k, key)   -> sampled range boundaries, k disjoint
                                  key intervals, one per output task
  sortWithinPartitions(key)    -> each task's rows in key order
  write (one file per task)    -> file i holds a sorted, disjoint key
                                  range; files ordered by range

The concatenation of the files in range order IS the globally sorted
dataset, but no single machine ever held it: the only wide operation is
the range exchange (with a driver-side boundary sample), and each task
sorts only its own slice. A min/max manifest of the produced files gives
a reader O(log n_files) lookup to the file containing any key.

Reference parity: the reference materializes plain JSON lists
(`airflow/dags/zara_hybrid_etl.py` save steps) with no layout contract;
this operator is part of the engine's scale surface (SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_range_sorted(
    df: DataFrame, path: str, key_col: str, n_ranges: int = 8
) -> None:
    """Write `df` as `n_ranges` parquet files, each a sorted disjoint
    key range (see module docstring). Rows with equal keys stay in one
    range (repartitionByRange boundaries are between distinct key
    values), so per-file key intervals never overlap."""
    (
        df.repartitionByRange(n_ranges, F.col(key_col))
        .sortWithinPartitions(key_col)
        .write.mode("overwrite")
        .parquet(path)
    )


def range_manifest(spark: SparkSession, path: str, key_col: str) -> DataFrame:
    """Per-file (file, min_key, max_key, n_rows) manifest of a
    range-sorted dataset — the reader-side index for key -> file lookup
    and for verifying the layout contract (disjoint, ordered ranges).
    Uses the parquet scan's `input_file_name`, one aggregate, no driver
    iteration; at scale this is a metadata-weight job (column-pruned to
    the key)."""
    return (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"), F.col(key_col).alias("k"))
        .groupBy("file")
        .agg(
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .orderBy("min_key")
    )
