"""LLM op machinery + YAML pipeline front-end tests (stub provider)."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from etl_poc_spark.llm.ops import eval_validator, llm_map, llm_reduce, render_prompt
from etl_poc_spark.llm.provider import JsonEchoProvider, StubProvider, get_provider
from etl_poc_spark.plans.schema_grammar import to_spark_type, to_struct_type
from etl_poc_spark.plans.yaml_pipeline import PipelineConfigError, run_pipeline, validate_config


def test_render_prompt_docetl_style():
    assert render_prompt("Summarize: {{ input.text }} by {{input.author}}", {"text": "abc", "author": "me"}) == "Summarize: abc by me"
    assert render_prompt("missing {{ input.nope }}", {}) == "missing "


def test_eval_validator_restricted():
    assert eval_validator("len(output['t']) > 2", {"t": "abcd"})
    assert not eval_validator("len(output['t']) > 9", {"t": "abcd"})
    assert not eval_validator("__import__('os')", {})  # no builtins
    assert not eval_validator("open('/etc/passwd')", {})


def test_schema_grammar():
    assert isinstance(to_spark_type("string"), T.StringType)
    assert isinstance(to_spark_type("integer"), T.LongType)
    assert isinstance(to_spark_type("number"), T.DoubleType)
    assert to_spark_type("list[string]") == T.ArrayType(T.StringType())
    assert to_spark_type("list") == T.ArrayType(T.StringType())
    assert to_spark_type("object") == T.MapType(T.StringType(), T.StringType())
    nested = to_spark_type({"a": "string", "b": {"c": "integer"}})
    assert isinstance(nested, T.StructType)
    assert isinstance(nested["b"].dataType["c"].dataType, T.LongType)
    with pytest.raises(ValueError):
        to_spark_type("widget")


def test_llm_map_stub_extract(spark):
    df = spark.createDataFrame([(1, "alpha beta gamma delta epsilon zeta eta theta")], "doc_id int, text string")
    out_schema = to_struct_type({"title": "string", "abstract_summary": "string", "word_count": "integer"})
    out = llm_map(df, "Extract from {{ input.text }}", out_schema).collect()[0]
    assert out["title"] == "alpha beta gamma delta epsilon zeta"
    assert out["_valid"] is True
    assert out["doc_id"] == 1


def test_llm_map_validate_retry(spark):
    df = spark.createDataFrame([(1, "short text")], "doc_id int, text string")
    # first two responses fail validation, third passes -> _valid True, 3 calls
    provider = JsonEchoProvider(responses=[{"title": ""}, {"title": ""}, {"title": "good title"}])
    out_schema = to_struct_type({"title": "string"})
    out = llm_map(df, "p", out_schema, provider=provider, validators=("len(output['title']) > 0",), max_retries=2).collect()[0]
    assert out["title"] == "good title" and out["_valid"] is True

    # all responses fail -> flagged, not dropped
    provider2 = JsonEchoProvider(responses=[{"title": ""}] * 3)
    out2 = llm_map(df, "p", out_schema, provider=provider2, validators=("len(output['title']) > 0",), max_retries=2).collect()
    assert len(out2) == 1 and out2[0]["_valid"] is False


def test_llm_reduce_groups_chunks(spark):
    rows = [(1, 0, "first chunk words"), (1, 1, "second chunk words"), (2, 0, "other doc")]
    df = spark.createDataFrame(rows, "doc_id int, chunk_id int, chunk_text string")
    out_schema = to_struct_type({"title": "string"})
    out = {r["doc_id"]: r for r in llm_reduce(df, ["doc_id"], "Synthesize {{ input.text }}", out_schema).collect()}
    assert out[1]["title"].startswith("first chunk words second")
    assert out[2]["title"] == "other doc"


def test_get_provider_gating():
    assert isinstance(get_provider("stub"), StubProvider)
    with pytest.raises(NotImplementedError):
        get_provider("openai")
    with pytest.raises(ValueError):
        get_provider("nonsense")


PIPELINE_CONFIG = {
    "default_model": "stub",
    "datasets": {"docs": {"type": "file", "source": "local", "path": "<injected>"}},
    "operations": [
        {"name": "chunk", "type": "split", "split_key": "text", "chunk_size": 20, "chunk_overlap": 5},
        {
            "name": "extract",
            "type": "map",
            "prompt": "Extract structured content from {{ input.chunk_text }}",
            "output_schema": {"title": "string", "abstract_summary": "string"},
            "validate": ["len(output['title']) > 0"],
        },
        {
            "name": "synthesize",
            "type": "reduce",
            "reduce_key": "doc_id",
            "text_key": "chunk_text",
            "prompt": "Synthesize {{ input.text }}",
            "output_schema": {"title": "string", "key_findings": "string"},
        },
    ],
    "pipeline": {"steps": [{"name": "s1", "input": "docs", "operations": ["chunk", "extract"]},
                           {"name": "s2", "input": "docs", "operations": ["chunk", "synthesize"]}]},
}


def test_yaml_pipeline_end_to_end(spark, sf_dir):
    from etl_poc_spark.io import load_table

    docs = load_table(spark, sf_dir, "documents").limit(20).select("doc_id", "text")
    result = run_pipeline(spark, PIPELINE_CONFIG, datasets={"docs": docs})
    chunks = result["s1"]
    assert chunks.count() >= 20
    assert {"doc_id", "chunk_id", "chunk_text", "title", "abstract_summary", "_valid"} <= set(chunks.columns)
    assert chunks.filter("_valid").count() == chunks.count()
    synth = result["s2"]
    assert synth.count() == 20  # one row per doc after reduce
    assert result["__final__"] is synth


def test_pipeline_config_validation():
    with pytest.raises(PipelineConfigError, match="default_model"):
        validate_config({"operations": [{"name": "a", "type": "map", "prompt": "p"}], "pipeline": {"steps": [{"input": "d", "operations": []}]}})
    with pytest.raises(PipelineConfigError, match="prompt"):
        validate_config({"default_model": "m", "datasets": {"d": {}}, "operations": [{"name": "a", "type": "map"}],
                         "pipeline": {"steps": [{"name": "s", "input": "d", "operations": ["a"]}]}})
    with pytest.raises(PipelineConfigError, match="unknown operation"):
        validate_config({"default_model": "m", "datasets": {"d": {}}, "operations": [{"name": "a", "type": "filter", "condition": "1=1"}],
                         "pipeline": {"steps": [{"name": "s", "input": "d", "operations": ["zzz"]}]}})


def test_eval_validator_blocks_sandbox_escapes():
    # attribute access is structurally rejected — the classic empty-builtins
    # escape via str.mro()/__subclasses__ cannot even parse past the whitelist
    assert not eval_validator("str.mro()[1].__subclasses__()", {})
    assert not eval_validator("().__class__.__bases__[0].__subclasses__()", {})
    assert not eval_validator("output.__class__", {})
    assert not eval_validator("getattr(str, 'mro')", {})
    assert not eval_validator("[x for x in (1,)]", {})  # comprehensions rejected
    assert not eval_validator("(lambda: 1)()", {})
    # while rich-but-safe expressions still work
    assert eval_validator("len(output['t']) > 2 and output['n'] % 2 == 0", {"t": "abcd", "n": 4})
    assert eval_validator("'x' in output['t'] or output['n'] >= 10", {"t": "axb", "n": 1})
    assert eval_validator("int(output['n']) + 1 == 5 if output['t'] else False", {"t": "y", "n": 4})


def test_pipeline_config_rejects_forward_and_self_references():
    base = {
        "default_model": "m",
        "datasets": {"d": {}},
        "operations": [{"name": "a", "type": "filter", "condition": "1=1"}],
    }
    with pytest.raises(PipelineConfigError, match="unknown input"):
        validate_config({**base, "pipeline": {"steps": [
            {"name": "s1", "input": "s2", "operations": ["a"]},  # forward ref
            {"name": "s2", "input": "d", "operations": ["a"]},
        ]}})
    with pytest.raises(PipelineConfigError, match="unknown input"):
        validate_config({**base, "pipeline": {"steps": [
            {"name": "s1", "input": "s1", "operations": ["a"]},  # self ref
        ]}})
    # backward reference remains valid
    validate_config({**base, "pipeline": {"steps": [
        {"name": "s1", "input": "d", "operations": ["a"]},
        {"name": "s2", "input": "s1", "operations": ["a"]},
    ]}})


def test_eval_validator_safe_methods_but_no_attribute_escape():
    # immediately-called whitelisted data methods work
    assert eval_validator("len(output['t'].split()) >= 3", {"t": "a b c"})
    assert eval_validator("output['t'].strip().lower() == 'x'", {"t": "  X "})
    assert eval_validator("output['t'].startswith('ab')", {"t": "abc"})
    # bare attribute access / non-whitelisted / dunder methods are rejected
    assert not eval_validator("output['t'].split", {"t": "a b"})
    assert not eval_validator("output['t'].__class__", {"t": "a"})
    assert not eval_validator("output['t'].mro()", {"t": "a"})
    assert not eval_validator("output['t'].format('x')", {"t": "{}"})
    assert not eval_validator("str.mro()[1].__subclasses__()", {})


def test_load_dataset_formats(spark, tmp_path):
    from etl_poc_spark.plans.yaml_pipeline import _load_dataset

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, s string")
    paths = {
        "parquet": str(tmp_path / "d.parquet"),
        "csv": str(tmp_path / "d.csv"),
        "orc": str(tmp_path / "d.orc"),
        "jsonl": str(tmp_path / "d.jsonl"),
    }
    df.write.parquet(paths["parquet"])
    df.write.option("header", True).csv(paths["csv"])
    df.write.orc(paths["orc"])
    df.write.json(paths["jsonl"])
    for fmt, path in paths.items():
        # explicit format and extension-sniffed both work
        for spec in ({"path": path, "format": fmt}, {"path": path}):
            got = sorted((r["id"], r["s"]) for r in _load_dataset(spark, spec).collect())
            assert got == [(1, "a"), (2, "b")], (fmt, spec)
