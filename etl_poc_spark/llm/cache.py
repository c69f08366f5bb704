"""LLM result cache as an anti-join (SURVEY.md §4.1).

The reference relies on DocETL's opaque on-disk cache (scraped from logs,
zara_hybrid_etl.py:43). The engine's cache is a first-class parquet table
keyed on a deterministic (model, prompt-template-hash, input-hash) key:

    misses  = inputs LEFT ANTI JOIN cache ON key       -- run provider on these
    results = hits (from cache) UNION ALL fresh misses -- then append misses

Both legs are plain joins, so at 100 TB the cache lookup is a shuffle (or
broadcast, if the cache is small) instead of a per-row KV roundtrip, and
cache appends are atomic parquet writes. Keys hash the rendered prompt
inputs, so template or model changes naturally miss.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_poc_spark.llm.ops import llm_map
from etl_poc_spark.llm.provider import LLMProvider, StubProvider


def cache_key_col(model: str, prompt_template: str, input_cols: list[str]) -> F.Column:
    tmpl_hash = F.md5(F.lit(prompt_template))
    input_hash = F.md5(F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in input_cols]))
    return F.md5(F.concat_ws("|", F.lit(model), tmpl_hash, input_hash))


def cached_llm_map(
    df: DataFrame,
    prompt_template: str,
    output_schema: T.StructType,
    cache_path: str,
    provider: LLMProvider | None = None,
    model: str = "stub",
    input_cols: list[str] | None = None,
    **llm_kwargs,
) -> DataFrame:
    """llm_map with a parquet-backed result cache.

    Returns the same shape as llm_map (input cols + output fields + _valid).
    Materializes the miss results eagerly (they must be appended to the
    cache exactly once); the returned DataFrame reads hits from the cache
    table and misses from the fresh append."""
    spark = df.sparkSession
    provider = provider or StubProvider()
    input_cols = input_cols or df.columns
    keyed = df.withColumn("__cache_key", cache_key_col(model, prompt_template, input_cols))

    cache_exists = os.path.exists(cache_path)
    if cache_exists:
        cache = spark.read.parquet(cache_path)
        misses_in = keyed.join(cache.select("__cache_key"), "__cache_key", "left_anti")
    else:
        misses_in = keyed

    # One provider call per distinct key: input rows identical in input_cols
    # share a cache entry, and the final inner join on __cache_key fans the
    # shared result back out to every input row.
    misses_in = misses_in.dropDuplicates(["__cache_key"])
    # Persist before counting so the provider runs exactly once — without it
    # the count and the cache write would each re-execute llm_map (double
    # cost, and a non-deterministic provider would cache different results
    # than were counted).
    fresh = llm_map(misses_in, prompt_template, output_schema, provider=provider, **llm_kwargs).persist()
    try:
        n_misses = fresh.count()
        result_cols = [c for c in df.columns] + [f.name for f in output_schema.fields] + ["_valid"]
        if n_misses > 0:
            out_cols = ["__cache_key"] + [f.name for f in output_schema.fields] + ["_valid"]
            fresh.select(*out_cols).write.mode("append").parquet(cache_path)
        elif not cache_exists:
            # No cache table and nothing fresh (empty input): reading the
            # nonexistent path would throw, and there is nothing to join.
            return spark.createDataFrame([], fresh.select(*result_cols).schema)

        # dropDuplicates guards against a cache table holding two entries for
        # one key (two concurrent runs both missing it, or a legacy append):
        # without it every matching input row fans out per duplicate entry
        cache = spark.read.parquet(cache_path).dropDuplicates(["__cache_key"])
        joined = keyed.join(cache, "__cache_key", "inner").select(*result_cols)
        # joined reads hits + appended misses from the parquet table, so it
        # no longer depends on the persisted plan.
        return joined
    finally:
        fresh.unpersist()


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
