"""Bigram-LM curation tier: hapax-bigram novelty (hash-exact oracle) and
add-1 bigram perplexity (pinned-exact — logs are transcendental, but the
per-doc fold order is fixed so the doubles are partition-independent).

These are the perplexity-filter workloads a CCNet/Gopher-style pipeline
runs after dedup (arXiv:1911.00359 §4.3): train n-gram counts on the
corpus, score every document, gate on the score. The reference has no LM
stage; this extends the training-data curation surface (SURVEY.md §7).

Scale notes (100 TB): training is explode → groupBy with map-side
combine (shuffle carries distinct-bigram partials, not tokens); scoring
joins doc bigrams against the count tables on the bigram key (broadcast
at test scale, shuffle join at corpus scale — AQE's choice), then ONE
doc_id shuffle for the per-doc fold. No driver collect anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.operators.ngram_lm import (
    _bigram_structs,
    perplexity_filter,
    words_col,
)
from etl_poc_spark.queries.vocab_q import _BIGRAMS_SQL, _WORDS_SQL
from etl_poc_spark.registry import query


@query(
    "doc_bigram_novelty",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, unnest({_BIGRAMS_SQL}) AS bigram FROM documents
      WHERE len({_WORDS_SQL}) >= 2
    ), cnt AS (
      SELECT bigram, COUNT(*) AS c FROM b GROUP BY bigram
    )
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(COUNT(*) FILTER (cnt.c = 1) AS BIGINT) AS n_hapax,
           CAST(COUNT(*) FILTER (cnt.c = 1) AS DOUBLE) / COUNT(*) AS hapax_ratio,
           COUNT(*) FILTER (cnt.c = 1) * 2 >= COUNT(*) AS mostly_novel
    FROM b JOIN cnt USING (bigram)
    GROUP BY b.doc_id
    ORDER BY b.doc_id
    """,
)
def doc_bigram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document hapax-bigram novelty: the fraction of a document's
    bigrams that occur exactly once in the whole corpus. High ratio =
    text unlike anything else (novel OR gibberish/OCR noise — either way
    a curation review signal); low ratio = boilerplate-shaped. The
    log-free complement of the perplexity score below, kept in exact
    integers so it carries a hash-exact oracle.

    Plan: one bigram-key shuffle for the corpus counts, the scoring join
    reuses that key, then one doc_id shuffle for the per-doc rollup.
    The ratio is ONE double division of exact BIGINTs; the flag is
    integer arithmetic (n_hapax*2 >= n), no float threshold."""
    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", words_col().alias("words")
    )
    b = (
        d.where(F.size("words") >= 2)
        .select("doc_id", F.explode(_bigram_structs()).alias("p"))
        .select("doc_id", F.col("p.bigram").alias("bigram"))
    )
    cnt = b.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    hapax = F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("bigint")
    return (
        b.join(cnt, "bigram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            hapax.alias("n_hapax"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            "n_hapax",
            (F.col("n_hapax").cast("double") / F.col("n_bigrams")).alias(
                "hapax_ratio"
            ),
            (F.col("n_hapax") * 2 >= F.col("n_bigrams")).alias("mostly_novel"),
        )
        .orderBy("doc_id")
    )


@query("doc_lm_perplexity")  # pinned-exact: transcendental per-doc sums —
# deterministic (fixed fold order) but not reproducible across engines'
# libm, so no SQL oracle; gen_pins verifies bit-stability under the
# adversarial session instead.
def doc_lm_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Add-1 bigram LM perplexity per document, trained on the corpus
    itself (the CCNet shape): p(w2|w1) = (c(w1 w2)+1)/(c(w1)+V).
    Each per-bigram logp is a pure function of exact integer counts;
    the per-doc total folds left-to-right over the position-sorted
    array (operators/ngram_lm.py), so the doubles are bit-identical
    under any partitioning. Rounded to 9 decimals in-query (same policy
    as supplier_pagerank) to absorb libm-version drift."""
    d = load_table(spark, sf_dir, "documents")
    out = perplexity_filter(d, k=1.0)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_nll", 9).alias("avg_nll"),
        F.round("ppl", 6).alias("ppl"),
    ).orderBy("doc_id")


@query("doc_lm_perplexity_heldout")  # pinned-exact: same transcendental-
# fold rationale as doc_lm_perplexity; this row covers the PRODUCTION
# CCNet configuration (train on a reference corpus, score a different
# one) so the reference= path carries gate evidence, not just pytest.
def doc_lm_perplexity_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out bigram perplexity: the LM trains on even-doc_id documents
    and scores the odd ones (a deterministic split standing in for the
    curated-reference-vs-crawl setup, arXiv:1911.00359 §4.3). Unlike the
    train-on-self sibling, scored documents here carry genuinely unseen
    bigrams, so the smoothing mass and OOV handling are exercised in the
    gate, not just in unit tests."""
    d = load_table(spark, sf_dir, "documents")
    ref = d.where(F.col("doc_id") % 2 == 0)
    probe = d.where(F.col("doc_id") % 2 == 1)
    out = perplexity_filter(probe, k=1.0, reference=ref)
    return out.select(
        "doc_id",
        "n_bigrams",
        F.round("avg_nll", 9).alias("avg_nll"),
        F.round("ppl", 6).alias("ppl"),
    ).orderBy("doc_id")
