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
    )


def _ppl_oracle_sql(train_where: str, score_where: str) -> str:
    """Add-1 bigram-LM perplexity oracle (pin→oracle conversion, r15,
    same rationale as doc_dsir_log_weights): every per-bigram logp is a
    pure function of exact integer counts, so the only cross-engine noise
    is 1-ulp ln/exp differences and sum association — ~1e-13 absolute
    against the emitted round(avg_nll, 9)/round(ppl, 6) granularity.
    Partition independence was already pin-proven; this adds the
    cross-engine value check."""
    return f"""
    WITH d AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS ws
      FROM documents
    ), pairs AS (
      SELECT doc_id, ws[i] AS w1, ws[i] || ' ' || ws[i + 1] AS bigram
      FROM d, LATERAL unnest(range(1, len(ws))) t(i)
      WHERE len(ws) >= 2
    ), bic AS (
      SELECT bigram, COUNT(*) AS c_bi FROM pairs
      WHERE {train_where} GROUP BY bigram
    ), unic AS (
      SELECT w1, COUNT(*) AS c_uni FROM pairs
      WHERE {train_where} GROUP BY w1
    ), voc AS (
      SELECT COUNT(DISTINCT tok) AS v
      FROM (SELECT doc_id, unnest(ws) AS tok FROM d)
      WHERE {train_where}
    ), logps AS (
      SELECT p.doc_id,
             ln((COALESCE(bic.c_bi, 0) + CAST(1 AS DOUBLE))
                / (COALESCE(unic.c_uni, 0)
                   + CAST(1 AS DOUBLE) * CAST(voc.v AS DOUBLE))) AS logp
      FROM pairs p
      LEFT JOIN bic USING (bigram)
      LEFT JOIN unic USING (w1)
      CROSS JOIN voc
      WHERE {score_where.replace('doc_id', 'p.doc_id')}
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_bigrams, SUM(logp) AS total
      FROM logps GROUP BY doc_id
    )
    SELECT doc_id, CAST(n_bigrams AS BIGINT) AS n_bigrams,
           round(-total / n_bigrams, 9) AS avg_nll,
           round(exp(-total / n_bigrams), 6) AS ppl
    FROM agg ORDER BY doc_id
    """


@query("doc_lm_perplexity", oracle=_ppl_oracle_sql("TRUE", "TRUE"))
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
    )


@query(
    "doc_lm_perplexity_heldout",
    oracle=_ppl_oracle_sql("doc_id % 2 = 0", "doc_id % 2 = 1"),
)
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
    )
