from __future__ import annotations

from etl_poc_spark.metrics import analyze_output, assemble_run_summary, with_observation


def test_observation_counts_inline(spark):
    df = spark.range(100).toDF("id")
    observed, obs = with_observation(df)
    assert observed.filter("id >= 0").count() == 100
    assert obs.get["n_rows"] == 100


def test_analyze_output_shape(spark):
    df = spark.createDataFrame([(1, "a"), (2, None), (3, "c")], "id int, s string")
    stats = analyze_output(df)
    assert stats["total_items"] == 3
    assert stats["fields"] == ["id", "s"]
    assert stats["null_counts"] == {"id": 0, "s": 1}
    assert "struct<id:int,s:string>" == stats["schema"]


def test_assemble_run_summary(spark):
    summary, df = assemble_run_summary(
        spark, {"ingest": {"total_papers": 10}, "quality": {"pass_rate": 0.8}}
    )
    assert summary["ingest_total_papers"] == 10
    assert summary["quality_pass_rate"] == 0.8
    row = df.collect()[0].asDict()
    assert row["ingest_total_papers"] == "10"
    assert "timestamp" in row


def test_execution_health_reads_plan_metrics(spark, sf_dir):
    from etl_poc_spark import registry
    from etl_poc_spark.metrics import execution_health

    registry.load_all()
    df = registry.QUERIES["pricing_summary"](spark, sf_dir)
    df.collect()
    h = execution_health(df)
    assert h["output_rows"] > 0           # rows flowed through the plan
    assert h["files_read"] >= 1           # parquet scan counted
    assert h["shuffle_records_written"] > 0  # the agg exchange is visible
    assert h["spill_bytes"] == 0          # nothing spilled at this scale
    assert h["n_plan_nodes"] > 3
