"""Job-level execution harness: wall-clock timeout + bounded retries +
error quarantine around pipeline execution.

Reference parity: the reference wraps every DocETL run in an
`execution_timeout` (3600s) with `retries`/`retry_delay` defaults and routes
failures into an error-quarantine record
(/root/reference/airflow/plugins/docetl_operator.py:39,184-200,319-334;
/root/reference/airflow/dags/zara_hybrid_etl.py:20-21). Here the contract
wraps the Spark driver program: the body runs on a worker thread; on budget
exhaustion all Spark jobs are cancelled (Spark tasks are interruptible at
task granularity — the standard way to abort a runaway distributed job),
the attempt is retried up to `retries` times, and a final failure is
quarantined via the S9 error sink and re-raised for a nonzero exit.
"""

from __future__ import annotations

import threading
import time
from typing import Any, Callable, TypeVar

from pyspark.sql import SparkSession

from etl_poc_spark.sinks.sinks import write_error_record

T = TypeVar("T")


class PipelineTimeoutError(RuntimeError):
    """The pipeline exceeded its wall-clock budget."""


def run_with_harness(
    spark: SparkSession,
    body: Callable[[], T],
    *,
    timeout_seconds: float = 3600.0,
    retries: int = 1,
    retry_delay_seconds: float = 0.0,
    errors_dir: str | None = None,
    context: dict[str, Any] | None = None,
) -> T:
    """Run `body` under the operator contract; returns its result.

    A FAILED attempt (body raised) is retried up to `retries` times, each
    separated by `retry_delay_seconds`. A TIMED-OUT attempt cancels the
    in-flight Spark jobs and fails immediately without retrying — the hung
    Python thread cannot be killed and a concurrent retry would race it.
    The final error is quarantined as a JSON record in `errors_dir` (when
    given) and re-raised.
    """
    last_err: BaseException | None = None
    attempts_made = 0
    for attempt in range(retries + 1):
        result: dict[str, T] = {}
        error: dict[str, BaseException] = {}

        def target() -> None:
            try:
                result["v"] = body()
            except BaseException as e:  # noqa: BLE001 — harness reports, caller decides
                error["v"] = e

        th = threading.Thread(target=target, name=f"pipeline-attempt-{attempt}", daemon=True)
        attempts_made += 1
        th.start()
        th.join(timeout_seconds)
        if th.is_alive():
            spark.sparkContext.cancelAllJobs()
            # A timed-out attempt is NOT retried: Python threads cannot be
            # killed, so the hung body may still be running (cancelAllJobs
            # only aborts Spark-side work) — a retry would race it on sinks
            # and double provider cost. Timeouts quarantine and fail fast.
            last_err = PipelineTimeoutError(
                f"pipeline exceeded {timeout_seconds}s wall-clock budget (attempt {attempt + 1})"
            )
            break
        if "v" in error:
            last_err = error["v"]
        else:
            return result["v"]
        if attempt < retries and retry_delay_seconds > 0:
            time.sleep(retry_delay_seconds)
    assert last_err is not None
    if errors_dir:
        write_error_record(
            last_err,
            {**(context or {}), "attempts": attempts_made, "timeout_seconds": timeout_seconds},
            errors_dir,
        )
    raise last_err
