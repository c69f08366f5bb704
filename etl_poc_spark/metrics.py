"""Engine-side run metrics (SURVEY.md §2.4 A4/A6, §4.1 cost observability).

The reference scrapes costs/shapes from subprocess stdout
(zara_hybrid_etl.py:39-75, docetl_operator.py:261-317). The engine replaces
that with first-class mechanisms:

- `with_observation`: Spark's Observation API — metrics computed inline
  with the job (row counts, sums) with zero extra passes over the data.
- `analyze_output`: A4 output-shape stats (item count, field inventory,
  null profile) from one schema inspection + one aggregate.
- `assemble_run_summary`: A6 — merge per-stage metric dicts into a single
  summary record (the reference's XCom-merge, zara_hybrid_etl.py:259-287),
  returned as both a dict and a single-row DataFrame for sinking.
"""

from __future__ import annotations

from datetime import datetime, timezone
from typing import Any

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


def with_observation(df: DataFrame, name: str = "metrics") -> tuple[DataFrame, Observation]:
    """Attach an Observation counting rows inline with whatever action the
    caller runs — no second scan. Read `obs.get` after an action."""
    obs = Observation(name)
    observed = df.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    return observed, obs


def analyze_output(df: DataFrame) -> dict[str, Any]:
    """A4 output-shape stats: count + field inventory + per-field null
    counts in a single aggregate pass."""
    fields = [f.name for f in df.schema.fields]
    aggs = [F.count(F.lit(1)).alias("__n")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}") for c in fields
    ]
    row = df.agg(*aggs).collect()[0]
    return {
        "total_items": row["__n"],
        "fields": fields,
        "n_fields": len(fields),
        "null_counts": {c: row[f"__nulls_{c}"] for c in fields},
        "schema": df.schema.simpleString(),
    }


def assemble_run_summary(spark: SparkSession, stages: dict[str, dict[str, Any]]) -> tuple[dict[str, Any], DataFrame]:
    """A6: merge per-stage metric dicts into one summary record."""
    summary: dict[str, Any] = {"timestamp": datetime.now(timezone.utc).isoformat()}
    for stage, metrics in stages.items():
        for k, v in metrics.items():
            summary[f"{stage}_{k}"] = v
    df = spark.createDataFrame([{k: str(v) for k, v in summary.items()}])
    return summary, df
