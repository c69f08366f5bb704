"""Capture .explain("formatted") output for registered queries.

Usage:
    PYTHONPATH=/root/repo python tools/capture_plans.py --out plans/r16 --suffix before [query ...]

With no query args, captures every registered query. Plan capture is
driver-only (no job runs), so it is cheap and safe to run any time.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def explain_formatted(df) -> str:
    mode = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="plans/r16")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from etl_poc_spark import registry
    from etl_poc_spark.session import get_spark

    registry.load_all()
    spark = get_spark("capture_plans")
    names = args.queries or sorted(registry.QUERIES)
    os.makedirs(args.out, exist_ok=True)
    for name in names:
        try:
            df = registry.QUERIES[name](spark, args.sf_dir)
            text = explain_formatted(df)
        except Exception as exc:  # noqa: BLE001 — record, keep sweeping
            text = f"ERROR capturing plan: {type(exc).__name__}: {exc}"
        path = os.path.join(args.out, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(text)
            if not text.endswith("\n"):
                fh.write("\n")
        n_exchange = text.count("Exchange")
        n_py = sum(
            text.count(t) for t in ("BatchEvalPython", "ArrowEvalPython")
        )
        joins = [
            t
            for t in (
                "BroadcastHashJoin",
                "SortMergeJoin",
                "ShuffledHashJoin",
                "BroadcastNestedLoopJoin",
                "CartesianProduct",
            )
            if t in text
        ]
        print(f"{name}: exchanges={n_exchange} pyeval={n_py} joins={joins}")


if __name__ == "__main__":
    main()
