"""Deeper streaming coverage: stream-static joins, watermark dedup,
foreachBatch sinks — plus partitioned-write/partition-pruning (the batch
side of landing-zone discipline, SCALING.md)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_poc_spark.streaming.windows import read_events_stream


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    from etl_poc_spark.io import load_table

    d = str(tmp_path_factory.mktemp("events_in"))
    load_table(spark, sf_dir, "events").limit(1000).coalesce(1).write.mode("overwrite").parquet(d)
    return d


def test_stream_static_join(spark, stream_dir):
    """Enrich a stream against a static dimension (broadcast per batch)."""
    dim = spark.createDataFrame(
        [("click", "engagement"), ("view", "engagement"), ("error", "ops"), ("purchase", "revenue"), ("scroll", "engagement")],
        "event_type string, category string",
    )
    stream = read_events_stream(spark, stream_dir)
    enriched = stream.join(F.broadcast(dim), "event_type", "left").groupBy("category").count()
    q = enriched.writeStream.format("memory").queryName("enriched").outputMode("complete").trigger(availableNow=True).start()
    q.awaitTermination(120)
    got = {r["category"]: r["count"] for r in spark.sql("SELECT * FROM enriched").collect()}
    batch = spark.read.parquet(stream_dir).join(dim, "event_type", "left").groupBy("category").count()
    expected = {r["category"]: r["count"] for r in batch.collect()}
    assert got == expected and sum(got.values()) == 1000


def test_dedup_within_watermark(spark, stream_dir, tmp_path):
    """Streaming exact-dedup: duplicate the input files; event_id dedup
    within the watermark returns each event once."""
    dup_dir = str(tmp_path / "dup_in")
    df = spark.read.parquet(stream_dir)
    df.unionByName(df).coalesce(2).write.mode("overwrite").parquet(dup_dir)
    stream = read_events_stream(spark, dup_dir)
    deduped = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    q = deduped.groupBy().count().writeStream.format("memory").queryName("dedup_count").outputMode("complete").trigger(availableNow=True).start()
    q.awaitTermination(120)
    n = spark.sql("SELECT * FROM dedup_count").collect()[0]["count"]
    assert n == 1000  # 2000 raw rows -> 1000 distinct events


def test_foreachbatch_sink(spark, stream_dir, tmp_path):
    """foreachBatch: the arbitrary-sink escape hatch — write each micro-batch
    through the engine's parquet writer with exactly-once batch ids."""
    out = str(tmp_path / "batches")
    seen = []

    def handle(batch_df, batch_id: int):
        seen.append(batch_id)
        batch_df.groupBy("event_type").count().write.mode("overwrite").parquet(f"{out}/b{batch_id}")

    stream = read_events_stream(spark, stream_dir)
    q = stream.writeStream.foreachBatch(handle).trigger(availableNow=True).start()
    q.awaitTermination(120)
    assert seen == [0]
    agg = spark.read.parquet(f"{out}/b0")
    assert agg.agg(F.sum("count")).collect()[0][0] == 1000


def test_partitioned_write_prunes(spark, sf_dir, tmp_path):
    """Partition discipline: date-partitioned parquet scans read only the
    matching partition directories (PartitionFilters, not data filters)."""
    from etl_poc_spark.io import load_table

    out = str(tmp_path / "events_by_day")
    e = load_table(spark, sf_dir, "events").withColumn("day", F.date_format("ts", "yyyy-MM-dd"))
    e.write.mode("overwrite").partitionBy("day").parquet(out)

    days = [r["day"] for r in spark.read.parquet(out).select("day").distinct().collect()]
    assert len(days) > 1
    probe_day = sorted(days)[len(days) // 2]  # derived from the data, not hardcoded
    scan = spark.read.parquet(out).filter(F.col("day") == probe_day)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(day" in plan
    # pruned scan touches exactly one partition directory
    assert scan.select("day").distinct().count() == 1
