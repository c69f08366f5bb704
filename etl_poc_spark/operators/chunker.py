"""Document chunker — the reference's `split` op (SURVEY.md §2.9 L1).

Reference: `docetl/config/paper_extraction.yaml:17-24` — split by token
count with overlap, `preserve_metadata: true` (all input columns carried
through to every chunk).

Spark-first design: the tokenizer/slicer is a pure Column-expression
flatMap (`sequence` + `slice` + `posexplode`) — no Python UDF, so it
codegen-fuses with up- and downstream operators and scales linearly with
input size. One row in, ceil(n_tokens/step) rows out, zero shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_by_tokens(
    df: DataFrame,
    text_col: str = "text",
    chunk_size: int = 40,
    chunk_overlap: int = 10,
    out_prefix: str = "chunk",
) -> DataFrame:
    """Split `text_col` into whitespace-token chunks of `chunk_size` tokens
    with `chunk_overlap` tokens of overlap; emits `<prefix>_id` (0-based
    position within the document), `<prefix>_text`, and `<prefix>_n_tokens`.
    Documents with zero tokens produce zero chunks (faithful fan-out
    semantics of the reference split op).
    """
    if chunk_overlap >= chunk_size:
        raise ValueError("chunk_overlap must be < chunk_size")
    step = chunk_size - chunk_overlap

    from etl_poc_spark.functions.text import nonempty_tokens

    words = nonempty_tokens(F.col(text_col))
    with_words = (
        df.withColumn("__words", words)
        .withColumn("__n", F.size(F.col("__words")))
        .filter(F.col("__n") > 0)
    )
    starts = F.sequence(F.lit(0), F.col("__n") - 1, F.lit(step))
    exploded = with_words.select("*", F.posexplode(starts).alias(f"{out_prefix}_id", "__start"))
    return (
        exploded.withColumn(f"{out_prefix}_text", F.concat_ws(" ", F.slice(F.col("__words"), F.col("__start") + 1, chunk_size)))
        .withColumn(f"{out_prefix}_n_tokens", F.least(F.lit(chunk_size), F.col("__n") - F.col("__start")))
        .drop("__words", "__n", "__start")
    )
