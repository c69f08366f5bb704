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


def execution_health(df: DataFrame) -> dict[str, Any]:
    """Run-health snapshot for an already-executed DataFrame (call after an
    action): walks the executed physical plan's SQL metrics and aggregates
    the numbers an operator dashboard needs — rows scanned/produced,
    shuffle volume, spill, and the node inventory. This is the engine's
    replacement for the reference's monitor.sh log-scraping: metrics come
    from the plan, not stdout."""
    import re

    node = df._jdf.queryExecution().executedPlan()
    plan_str = node.toString()
    metrics: dict[str, int] = {}

    def walk(n) -> None:
        it = n.metrics().iterator()
        while it.hasNext():
            kv = it.next()
            name = kv._1()
            value = kv._2().value()
            try:
                metrics[name] = metrics.get(name, 0) + int(value)
            except (TypeError, ValueError):
                pass
        cit = n.children().iterator()
        while cit.hasNext():
            walk(cit.next())
        # AQE wrappers: AdaptiveSparkPlanExec exposes executedPlan(), the
        # QueryStageExec family wraps its subtree as plan() — descend both
        for accessor in ("executedPlan", "plan"):
            try:
                walk(getattr(n, accessor)())
            except Exception:  # noqa: BLE001 — not every node exposes these
                pass

    try:
        walk(node)
    except Exception:  # noqa: BLE001 — health reporting must never fail a job
        pass
    return {
        "output_rows": metrics.get("numOutputRows", 0),
        "shuffle_bytes_written": metrics.get("shuffleBytesWritten", 0),
        "shuffle_records_written": metrics.get("shuffleRecordsWritten", 0),
        "spill_bytes": metrics.get("spillSize", 0),
        "files_read": metrics.get("numFiles", 0),
        "files_bytes": metrics.get("filesSize", 0),
        "peak_memory_bytes": metrics.get("peakMemory", 0),
        "scan_time_ms": metrics.get("scanTime", 0),
        "n_plan_nodes": len(re.findall(r"^\s*[+:]?-?\s*\*?\(?\d*\)?\s*\w", plan_str, re.M)),
        "raw": metrics,
    }
