"""Measure the delta-log store read cost before/after compaction.

Builds an exact-dedup fingerprint store with N tag-slotted batches (the
shape a year of continuous micro-batch ingest leaves behind), times the
full store fold (read_exact_dedup_store().count()), compacts, re-times.
The listing/footer cost is O(#slots) before and O(1 + tail) after; row
content is identical by construction (the equivalence is pytest-pinned in
tests/test_deltastore.py — this script measures only the cost).

Usage: python tools/store_compaction_cost.py [--batches 500] [--rows 20]
Prints one JSON line for SCALING.md.
"""

from __future__ import annotations

import argparse
import json
import shutil
import tempfile
import time


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=500)
    ap.add_argument("--rows", type=int, default=20)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from etl_poc_spark.operators.incremental import (
        compact_exact_dedup_store,
        read_exact_dedup_store,
    )
    from etl_poc_spark.session import get_spark

    spark = get_spark("store-compaction-cost")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="store_cost_")
    store = f"{root}/fp_store"
    try:
        t0 = time.time()
        for b in range(args.batches):
            # write the delta slot directly (same layout as
            # incremental_exact_dedup_ingest's tagged append) — building
            # via the full ingest would time N anti-joins, not the store
            (
                spark.range(args.rows)
                .select(
                    F.concat(F.lit(f"fp{b % 97}_"), F.col("id").cast("string"))
                    .alias("fp"),
                    (F.col("id") + b).alias("min_id"),
                    F.lit(1).cast("bigint").alias("n_copies"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(f"{store}/tag=b{b:05d}")
            )
        build_s = time.time() - t0

        def timed_read() -> tuple[float, int]:
            spark.catalog.clearCache()
            t = time.time()
            n = read_exact_dedup_store(spark, store).count()
            return time.time() - t, n

        # warm a throwaway read so JVM/codegen warmup doesn't inflate the
        # "before" number, then time twice and keep the min
        timed_read()
        before_s = min(timed_read()[0] for _ in range(2))
        n_before = timed_read()[1]

        t = time.time()
        rep = compact_exact_dedup_store(spark, store)
        compact_s = time.time() - t
        after_s = min(timed_read()[0] for _ in range(2))
        n_after = timed_read()[1]
        assert n_before == n_after, (n_before, n_after)

        print(
            json.dumps(
                {
                    "metric": "exact_dedup_store_fold_seconds",
                    "batches": args.batches,
                    "rows_per_batch": args.rows,
                    "distinct_fps": n_after,
                    "build_s": round(build_s, 2),
                    "read_before_s": round(before_s, 3),
                    "compact_s": round(compact_s, 2),
                    "read_after_s": round(after_s, 3),
                    "speedup": round(before_s / max(after_s, 1e-9), 1),
                    "data_files_before": rep["data_files_before"],
                    "data_files_after": rep["data_files_after"],
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
