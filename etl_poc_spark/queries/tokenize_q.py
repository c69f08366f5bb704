"""BPE-ish token counting (north-star text analysis: "whitespace + a
BPE-ish regex"). The pattern approximates subword pre-tokenization:
letter runs | digit runs | single non-alnum-non-space symbols — the
ASCII-safe skeleton of the GPT-2 pre-tokenizer, identical in Java regex
and RE2 so the count is oracle-exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query

BPE_ISH_PATTERN = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"


@query(
    "bpe_token_counts",
    oracle="""
    WITH t AS (
      SELECT doc_id, lang,
             len(list_filter(string_split_regex(text, '\\s+'), w -> w <> '')) AS ws_tokens,
             len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_tokens
      FROM documents
    )
    SELECT doc_id, lang, ws_tokens, bpe_tokens,
           CASE WHEN ws_tokens = 0 THEN 0.0
                ELSE CAST(bpe_tokens AS DOUBLE) / ws_tokens END AS fertility
    FROM t
    """,
)
def bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-ish token counts per document + fertility ratio
    (the tokens-per-word statistic used for corpus budgeting)."""
    d = load_table(spark, sf_dir, "documents")
    from etl_poc_spark.functions.text import word_count

    ws = word_count(F.col("text"))
    bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH_PATTERN), F.lit(0)))
    return d.select(
        "doc_id",
        "lang",
        ws.alias("ws_tokens"),
        bpe.alias("bpe_tokens"),
        F.when(ws == 0, F.lit(0.0)).otherwise(bpe.cast("double") / ws.cast("double")).alias("fertility"),
    )
