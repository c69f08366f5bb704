"""Exact substring-duplication coverage operator (ExactSubstr, Lee et al.
2021, arXiv:2107.06499) — the computation behind
queries/spandedup_q.py::duplicate_span_coverage and the `span_dedup`
YAML pipeline op. See the query module docstring for the full design
rationale (distributed window-hash inverted index instead of a global
suffix array).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def span_coverage(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", window: int = 8
) -> DataFrame:
    """Per-document duplicated-span coverage: (id, n_tokens,
    covered_tokens, dup_coverage) where covered_tokens is the interval
    union of all `window`-token spans that appear verbatim in ANOTHER
    document.

    Hash-only explode (id, start, md5) — the shingle blow-up class, bodies
    never re-cross the wire; one groupBy(hash) inverted index; one lead()
    window per doc. Exact integer arithmetic throughout."""
    d = df.select(
        F.col(id_col),
        F.filter(
            F.split(F.trim(F.lower(F.col(text_col))), "\\s+"), lambda w: w != ""
        ).alias("arr"),
    )
    wins = (
        d.where(F.size("arr") >= window)
        .select(
            id_col,
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, size(arr) - {window}),"
                    f" i -> concat_ws(' ', slice(arr, i + 1, {window})))"
                )
            ).alias("start", "win"),
        )
        .select(id_col, "start", F.md5(F.col("win")).alias("h"))
    )
    dup = (
        wins.groupBy("h").agg(F.countDistinct(id_col).alias("nd")).where(F.col("nd") >= 2)
    )
    shared = wins.join(dup.select("h"), "h", "left_semi")
    lead_w = Window.partitionBy(id_col).orderBy("start")
    cov = (
        shared.withColumn("nxt", F.lead("start").over(lead_w))
        .groupBy(id_col)
        .agg(
            F.sum(
                F.when(
                    F.col("nxt").isNull() | (F.col("nxt") - F.col("start") >= window),
                    F.lit(window),
                ).otherwise(F.col("nxt") - F.col("start"))
            ).alias("covered_tokens")
        )
    )
    n_tok = F.size("arr")
    covered = F.coalesce(F.col("covered_tokens"), F.lit(0))
    return d.join(cov, id_col, "left").select(
        id_col,
        n_tok.cast("long").alias("n_tokens"),
        covered.cast("long").alias("covered_tokens"),
        F.when(n_tok == 0, F.lit(0.0))
        .otherwise(covered.cast("double") / n_tok.cast("double"))
        .alias("dup_coverage"),
    )
