"""DSIR data-selection tier (arXiv:2302.03169): hashed-n-gram importance
weights toward a target corpus, an exact-integer affinity companion with
a hash-exact DuckDB oracle, and deterministic Gumbel top-k resampling.

Target corpus on the test tables: the English documents (lang = 'en',
~40% of rows) — "select raw web text that looks like the curated English
set" is exactly the DSIR paper's formulation with Wikipedia+books as the
target. The raw corpus is ALL documents, matching the paper (the target
is a subset of raw there too).

Scale notes (100 TB): every post-explode shuffle is bounded by the
n_buckets=1024 feature space (model frames broadcast); scoring adds ONE
doc_id shuffle; resampling is a TakeOrderedAndProject top-k, not a sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.operators.dsir import (
    dsir_log_weights,
    dsir_resample,
    dsir_target_affinity,
)
from etl_poc_spark.queries.vocab_q import _BIGRAMS_SQL, _WORDS_SQL
from etl_poc_spark.registry import query

_B = 1024

_FEATS_SQL = f"""
    w AS (
      SELECT doc_id, lang, unnest({_WORDS_SQL}) AS f FROM documents
    ), bg AS (
      SELECT doc_id, lang, unnest({_BIGRAMS_SQL}) AS f FROM documents
      WHERE len({_WORDS_SQL}) >= 2
    ), feats AS (
      SELECT doc_id, lang,
             CAST('0x' || substr(md5(f), 1, 6) AS BIGINT) % {_B} AS bucket
      FROM (SELECT * FROM w UNION ALL SELECT * FROM bg)
    ), dc AS (
      SELECT doc_id, bucket, COUNT(*) AS cnt FROM feats GROUP BY doc_id, bucket
    ), rawm AS (
      SELECT bucket, SUM(cnt) AS c_raw FROM dc GROUP BY bucket
    ), tgtm AS (
      SELECT bucket, COUNT(*) AS c_tgt FROM feats WHERE lang = 'en'
      GROUP BY bucket
    ), tot AS (
      SELECT (SELECT SUM(c_raw) FROM rawm) AS t_raw,
             (SELECT SUM(c_tgt) FROM tgtm) AS t_tgt
    )
"""


@query(
    "doc_dsir_target_affinity",
    oracle=f"""
    WITH {_FEATS_SQL}
    SELECT dc.doc_id,
           CAST(SUM(dc.cnt) AS BIGINT) AS n_occurrences,
           CAST(COALESCE(SUM(dc.cnt) FILTER (
             CAST(COALESCE(tgtm.c_tgt, 0) + 1 AS DECIMAL(38,0))
               * CAST(tot.t_raw + {_B} AS DECIMAL(38,0))
             > CAST(rawm.c_raw + 1 AS DECIMAL(38,0))
               * CAST(tot.t_tgt + {_B} AS DECIMAL(38,0))
           ), 0) AS BIGINT) AS n_target_leaning,
           CAST(COALESCE(SUM(dc.cnt) FILTER (
             CAST(COALESCE(tgtm.c_tgt, 0) + 1 AS DECIMAL(38,0))
               * CAST(tot.t_raw + {_B} AS DECIMAL(38,0))
             > CAST(rawm.c_raw + 1 AS DECIMAL(38,0))
               * CAST(tot.t_tgt + {_B} AS DECIMAL(38,0))
           ), 0) AS DOUBLE) / SUM(dc.cnt) AS affinity,
           COALESCE(SUM(dc.cnt) FILTER (
             CAST(COALESCE(tgtm.c_tgt, 0) + 1 AS DECIMAL(38,0))
               * CAST(tot.t_raw + {_B} AS DECIMAL(38,0))
             > CAST(rawm.c_raw + 1 AS DECIMAL(38,0))
               * CAST(tot.t_tgt + {_B} AS DECIMAL(38,0))
           ), 0) * 2 >= SUM(dc.cnt) AS target_leaning
    FROM dc
    JOIN rawm USING (bucket)
    LEFT JOIN tgtm USING (bucket)
    CROSS JOIN tot
    GROUP BY dc.doc_id
    ORDER BY dc.doc_id
    """,
)
def doc_dsir_target_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR's log-free companion: per document, the share of hashed
    unigram+bigram occurrences landing in target-leaning buckets (bucket
    leans target iff its add-1-smoothed rate in the English subset beats
    its rate in the full corpus — DECIMAL(38,0) cross-multiplication,
    the chi-square headroom discipline). Exact integers end-to-end, ONE
    double division, integer majority flag → hash-exact oracle.

    Plan: explode → map-side-combined (doc,bucket) partials → two
    ≤1024-row model broadcasts → one doc_id shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    return dsir_target_affinity(
        docs, docs.where(F.col("lang") == "en"), n_buckets=_B
    )


@query(
    "doc_dsir_log_weights",
    # pin→oracle conversion (r15): the per-bucket log-ratio terms are pure
    # functions of exact integer counts, so the ONLY cross-engine noise is
    # (a) 1-ulp ln() differences between libm builds and (b) sum
    # association order — both ~1e-13 absolute against the emitted
    # round(·, 9) granularity of 1e-9 (weights are O(1-100)). The fold is
    # already bucket-sorted (partition-independent, proven by four rounds
    # of adversarial pins), so the oracle upgrade adds the cross-engine
    # value check on top.
    oracle=f"""
    WITH {_FEATS_SQL}
    SELECT dc.doc_id,
           CAST(SUM(dc.cnt) AS BIGINT) AS n_features,
           round(SUM(CAST(dc.cnt AS DOUBLE) * (
             ln(CAST(COALESCE(tgtm.c_tgt, 0) + 1 AS DOUBLE)
                / (tot.t_tgt + CAST({_B} AS DOUBLE)))
             - ln(CAST(rawm.c_raw + 1 AS DOUBLE)
                  / (tot.t_raw + CAST({_B} AS DOUBLE)))
           )), 9) AS log_weight_r9
    FROM dc JOIN rawm USING (bucket)
    LEFT JOIN tgtm USING (bucket)
    CROSS JOIN tot
    GROUP BY dc.doc_id
    ORDER BY dc.doc_id
    """,
)
def doc_dsir_log_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weight log ŵ(x) = Σ_f c_f(x)·(ln p̂_en(f) −
    ln p̂_raw(f)) with add-1 smoothing over 1024 hashed buckets — the
    paper's bag-of-hashed-ngrams likelihood ratio, target = English
    subset, raw = full corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = dsir_log_weights(docs, docs.where(F.col("lang") == "en"), n_buckets=_B)
    return w.select(
        "doc_id",
        "n_features",
        F.round("log_weight", 9).alias("log_weight_r9"),
    )


@query("dsir_gumbel_sample")  # pinned-exact: the Gumbel key is a pure
# per-row function (md5-seeded uniform → −ln(−ln u)) added to the
# deterministic folded weight; top-k + id tiebreak ⇒ fully reproducible.
def dsir_gumbel_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The resampling step: 50 documents drawn WITHOUT replacement with
    probability ∝ exp(log ŵ) via Gumbel top-k, noise seeded from
    md5('dsir|' || doc_id) so the draw is a pure function of the corpus.
    One TakeOrderedAndProject — per-partition heaps, k-row merge —
    never a global sort."""
    docs = load_table(spark, sf_dir, "documents")
    w = dsir_log_weights(docs, docs.where(F.col("lang") == "en"), n_buckets=_B)
    picked = dsir_resample(w, 50)
    return picked.select(
        "doc_id",
        F.round("log_weight", 9).alias("log_weight_r9"),
        F.round("gumbel_key", 9).alias("gumbel_key_r9"),
    )
