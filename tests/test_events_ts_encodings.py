"""Timestamp-encoding robustness for the events table.

The driver has shipped events.parquet in multiple physical encodings across
rounds — TIMESTAMP(NANOS), timestamp[us] with the UTC flag (Spark LTZ), and
timestamp[us] WITHOUT the flag (Spark TIMESTAMP_NTZ, which broke round 4:
`unix_micros` rejects NTZ at analysis time). `io._load_events` must
normalize ALL of them to TIMESTAMP so every events/as-of query both analyzes
and produces identical values regardless of how the parquet was written."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

QUERIES = [
    "events_hourly",
    "events_sessionize",
    "events_asof_click_view",
    "events_asof_next_error",
]

ENCODINGS = ["us_ntz", "us_utc", "ns"]


@pytest.fixture(scope="module")
def encoded_dirs(sf_dir, tmp_path_factory):
    """One tmp sf-dir per physical ts encoding, same logical values."""
    table = pq.read_table(os.path.join(sf_dir, "events.parquet"))
    ts_us = table.column("ts").cast(pa.timestamp("us"))
    dirs = {}
    for enc in ENCODINGS:
        if enc == "us_ntz":
            col = ts_us
        elif enc == "us_utc":
            col = ts_us.cast(pa.timestamp("us", tz="UTC"))
        else:  # TIMESTAMP(NANOS) — the round-1..3 encoding
            col = ts_us.cast(pa.timestamp("ns"))
        t = table.set_column(table.schema.get_field_index("ts"), "ts", col)
        d = tmp_path_factory.mktemp(f"events_{enc}")
        pq.write_table(t, str(d / "events.parquet"), coerce_timestamps=None, version="2.6")
        dirs[enc] = str(d)
    return dirs


def test_load_events_always_yields_timestamp(spark, encoded_dirs):
    from etl_poc_spark.io import load_table

    for enc, d in encoded_dirs.items():
        dt = dict(load_table(spark, d, "events").dtypes)["ts"]
        assert dt == "timestamp", f"encoding {enc}: ts loaded as {dt}"


@pytest.mark.parametrize("qname", QUERIES)
def test_events_queries_match_across_encodings(spark, encoded_dirs, qname):
    from etl_poc_spark import registry

    registry.load_all()
    fn = registry.QUERIES[qname]
    results = {}
    for enc, d in encoded_dirs.items():
        df = fn(spark, d)
        results[enc] = sorted(map(tuple, df.collect()))
        assert len(results[enc]) > 0, f"{qname} empty under {enc}"
    base = results["us_ntz"]
    for enc in ENCODINGS[1:]:
        assert results[enc] == base, f"{qname}: {enc} differs from us_ntz"
