"""End-to-end pipeline query: the reference's dataflow (§3.1 stages 3-4)
run through the REAL llm_map machinery (mapInPandas + stub provider +
validators + retry) — not a Column-expression shortcut — yet still fully
DuckDB-oracle-checkable because the stub provider's derivations are pure
string ops with exact SQL equivalents (llm/provider.py docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.llm.ops import llm_map
from etl_poc_spark.plans.schema_grammar import to_struct_type
from etl_poc_spark.registry import query


@query(
    "pipeline_e2e_extract_stats",
    oracle="""
    WITH w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM documents
    ), ext AS (
      SELECT doc_id,
             array_to_string(list_slice(words, 1, 6), ' ') AS title,
             array_to_string(list_slice(words, 1, 30), ' ') AS abstract_summary,
             len(words) AS word_count
      FROM w
    )
    SELECT COUNT(*) AS total_docs,
           CAST(SUM(CASE WHEN length(title) > 0 AND len(string_split_regex(abstract_summary, '\\s+')) >= 25
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_valid,
           CAST(SUM(length(title)) AS DOUBLE) / COUNT(*) AS avg_title_len,
           CAST(SUM(word_count) AS DOUBLE) / COUNT(*) AS avg_word_count
    FROM ext
    """,
)
def pipeline_e2e_extract_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> llm_map stub extract (L2, with the reference's own
    validators: non-empty title, >= 25-word abstract —
    article_pipeline.yaml.j2:45-48) -> aggregate stats. `_valid` comes from
    the validation-retry loop inside the UDF; the oracle reproduces the
    stub's extractive derivations in SQL."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out_schema = to_struct_type({"title": "string", "abstract_summary": "string", "word_count": "integer"})
    ext = llm_map(
        docs,
        "Extract structured content from this paper: {{ input.text }}",
        out_schema,
        validators=("len(output['title']) > 0", "len(output['abstract_summary'].split()) >= 25"),
        max_retries=1,
    )
    valid = F.when(F.col("_valid"), F.lit(1)).otherwise(F.lit(0))
    return ext.agg(
        F.count(F.lit(1)).alias("total_docs"),
        F.sum(valid).alias("n_valid"),
        (F.sum(F.length("title")).cast("double") / F.count(F.lit(1))).alias("avg_title_len"),
        (F.sum("word_count").cast("double") / F.count(F.lit(1))).alias("avg_word_count"),
    )
