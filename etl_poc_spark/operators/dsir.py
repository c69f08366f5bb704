"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169): select pretraining documents whose hashed-n-gram
distribution looks like a TARGET corpus, by importance-weighting every
raw document with the log-likelihood ratio of two bag-of-hashed-ngrams
models and resampling proportional to the weights.

The reference pipeline has no data-selection stage; this extends the
training-data curation surface (SURVEY.md §7) the same way the bigram-LM
perplexity tier does, and shares its determinism discipline:

* feature hashing is md5-derived (first 6 hex digits → 24-bit int mod
  n_buckets) so a DuckDB oracle can reproduce buckets bit-exactly;
* the exact-integer companion (`target_affinity`) compares per-bucket
  target-vs-raw rates by DECIMAL(38,0) cross-multiplication — no floats
  until one final division, so it carries a hash-exact SQL oracle;
* the float path (`log_weights`) folds each document's per-bucket
  log-ratio terms left-to-right over a bucket-sorted array (the
  `ngram_lm` idiom), so the doubles are bit-identical under any
  partitioning — pinned-exact-safe.

Scale notes (100 TB): after the n-gram explode every shuffle is bounded
by `n_buckets` (the corpus models are ≤ n_buckets rows — broadcast
joins), plus ONE doc_id shuffle for the per-document fold. The explode
itself is map-side combined into (doc_id, bucket) partials before any
exchange, so the wire carries at most min(doc_len, n_buckets) rows per
document, never raw tokens. Resampling is a single window prefix-sum
per stratum (the systematic-PPS idiom) — no global sort of the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_poc_spark.operators.ngram_lm import words_col

DEFAULT_BUCKETS = 1024


def _bucket(feature: Column, n_buckets: int) -> Column:
    """Portable 24-bit md5 bucket (sketches.py idiom). DuckDB twin:
    CAST('0x' || substr(md5(f), 1, 6) AS BIGINT) % n_buckets."""
    return (
        F.conv(F.substring(F.md5(feature), 1, 6), 16, 10).cast("long")
        % F.lit(n_buckets)
    ).cast("long")


def hashed_feature_counts(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """(id_col, bucket, cnt): hashed unigram+bigram occurrence counts per
    document — DSIR's feature extractor. Unigrams contain no whitespace
    and bigrams always do, so the two families cannot collide pre-hash.

    The (doc, bucket) rollup happens BEFORE any exchange (map-side
    combine on the explode output), so the shuffle payload per document
    is bounded by min(2·len, n_buckets) rows, not token count."""
    words = docs.select(F.col(id_col), words_col(text_col).alias("words"))
    feats = words.select(
        F.col(id_col),
        F.explode(
            F.concat(
                F.col("words"),
                F.expr(
                    # sequence(0, -1) would be DESCENDING in Spark, so the
                    # short-doc case must be an explicit empty array
                    "IF(size(words) >= 2, "
                    "transform(sequence(0, size(words) - 2), "
                    "i -> concat(words[i], ' ', words[i + 1])), "
                    "CAST(array() AS array<string>))"
                ),
            )
        ).alias("f"),
    )
    return (
        feats.select(F.col(id_col), _bucket(F.col("f"), n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_totals(feat_counts: DataFrame, suffix: str) -> DataFrame:
    """Corpus-level bucket histogram: (bucket, c_<suffix>). At most
    n_buckets rows — always broadcastable."""
    return feat_counts.groupBy("bucket").agg(F.sum("cnt").alias(f"c_{suffix}"))


def _model_frame(raw_f: DataFrame, tgt_f: DataFrame) -> DataFrame:
    """One broadcastable model frame (bucket, c_raw, c_tgt, t_raw, t_tgt)
    covering every bucket present in EITHER corpus, with the corpus
    totals attached via an unpartitioned window over the ≤ n_buckets-row
    frame — no scalar crossJoin, so the scoring join is a single
    BroadcastHashJoin (no BroadcastNestedLoopJoin anywhere in the plan).
    The single-partition window exchange moves at most n_buckets rows."""
    w = Window.partitionBy().rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        bucket_totals(raw_f, "raw")
        .join(bucket_totals(tgt_f, "tgt"), "bucket", "full_outer")
        .withColumn("t_raw", F.sum("c_raw").over(w))
        .withColumn("t_tgt", F.sum("c_tgt").over(w))
    )


def dsir_log_weights(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Per-document DSIR importance weight: log w(x) = Σ_f c_f(x) ·
    (ln p̂_target(f) − ln p̂_raw(f)) with add-1 smoothing over buckets,
    i.e. p̂(f) = (c_f + 1) / (total + n_buckets).

    Output: (id_col, n_features BIGINT, log_weight DOUBLE). Positive →
    the document's hashed-n-gram profile is closer to the target model.

    Determinism: each per-bucket term is a pure function of exact
    integer counts; the per-document sum folds left-to-right over the
    bucket-sorted (bucket, term) array in the JVM, so the double is
    bit-identical under any partitioning (pinned-exact-safe, the
    `ngram_lm.score_documents` discipline).

    Plan shape: one merged ≤ n_buckets-row model frame (totals attached
    by window, see _model_frame) broadcast onto the raw side's
    (doc, bucket) partials — a single BroadcastHashJoin — then ONE
    doc_id shuffle for the fold.
    """
    raw_f = hashed_feature_counts(
        raw_docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    tgt_f = hashed_feature_counts(
        target_docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    nb = float(n_buckets)
    scored = (
        raw_f.join(F.broadcast(_model_frame(raw_f, tgt_f)), "bucket")
        .select(
            F.col(id_col),
            "bucket",
            "cnt",
            (
                F.col("cnt").cast("double")
                * (
                    F.log(
                        (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1)).cast(
                            "double"
                        )
                        / (F.col("t_tgt") + F.lit(nb)).cast("double")
                    )
                    - F.log(
                        (F.col("c_raw") + F.lit(1)).cast("double")
                        / (F.col("t_raw") + F.lit(nb)).cast("double")
                    )
                )
            ).alias("term"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.sum("cnt").alias("n_features"),
        F.expr(
            "aggregate(array_sort(collect_list(struct(bucket, term))), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x.term)"
        ).alias("log_weight"),
    )


def dsir_target_affinity(
    raw_docs: DataFrame,
    target_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_BUCKETS,
) -> DataFrame:
    """Exact-integer companion to the log weight: the share of a
    document's feature occurrences that land in TARGET-LEANING buckets,
    where a bucket leans target iff its smoothed target rate exceeds its
    smoothed raw rate — decided by cross-multiplication in DECIMAL(38,0)
    (the chi-square headroom discipline), no logarithms anywhere:

        (c_tgt + 1) · (t_raw + B)  >  (c_raw + 1) · (t_tgt + B)

    Output: (id_col, n_occurrences, n_target_leaning BIGINT,
    affinity DOUBLE, target_leaning BOOLEAN). affinity is ONE double
    division of exact BIGINTs and the flag is pure integer arithmetic
    (n_target_leaning·2 ≥ n_occurrences), so the whole result carries a
    hash-exact DuckDB oracle."""
    raw_f = hashed_feature_counts(
        raw_docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    tgt_f = hashed_feature_counts(
        target_docs, id_col=id_col, text_col=text_col, n_buckets=n_buckets
    )
    d38 = "decimal(38,0)"
    leaning = (
        (F.coalesce(F.col("c_tgt"), F.lit(0)) + F.lit(1)).cast(d38)
        * (F.col("t_raw") + F.lit(n_buckets)).cast(d38)
    ) > (
        (F.col("c_raw") + F.lit(1)).cast(d38)
        * (F.col("t_tgt") + F.lit(n_buckets)).cast(d38)
    )
    per_bucket = (
        raw_f.join(F.broadcast(_model_frame(raw_f, tgt_f)), "bucket")
        .select(F.col(id_col), "cnt", leaning.alias("leaning"))
    )
    return (
        per_bucket.groupBy(id_col)
        .agg(
            F.sum("cnt").cast("bigint").alias("n_occurrences"),
            F.sum(F.when(F.col("leaning"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_target_leaning"),
        )
        .select(
            F.col(id_col),
            "n_occurrences",
            "n_target_leaning",
            (
                F.col("n_target_leaning").cast("double")
                / F.col("n_occurrences").cast("double")
            ).alias("affinity"),
            (F.col("n_target_leaning") * 2 >= F.col("n_occurrences")).alias(
                "target_leaning"
            ),
        )
    )


def dsir_resample(
    weights: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "log_weight",
    seed: str = "dsir",
) -> DataFrame:
    """Gumbel top-k resampling: draw k documents WITHOUT replacement with
    probability proportional to exp(weight_col) — the exact scheme the
    DSIR paper uses. The Gumbel noise is derived from md5(seed || id),
    so the draw is a pure function of (corpus, seed): reruns and
    stragglers reproduce the same sample.

    key_i = log w_i + Gumbel_i,  Gumbel_i = −ln(−ln(u_i)),
    u_i ∈ (0,1) from the first 13 hex digits of md5: a 52-bit integer
    is EXACT in a double, so after the +1/+2 guard u stays strictly
    inside (0,1) after the float cast too — a 60-bit draw can round to
    exactly 1.0 (values within 128 of 2^60 collapse onto 2^60) and turn
    −ln(−ln u) into NULL, silently dropping the doc from the sample.

    Scale: one global top-k (TakeOrderedAndProject — per-partition heap
    then a k-row merge on one reducer), never a full sort."""
    u = (
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + "|"), F.col(id_col).cast("string"))),
                    1,
                    13,
                ),
                16,
                10,
            ).cast("double")
            + F.lit(1.0)
        )
        / F.lit(float(2**52 + 2))
    )
    key = F.col(weight_col) + (-F.log(-F.log(u)))
    return (
        weights.select(F.col(id_col), F.col(weight_col), key.alias("gumbel_key"))
        .orderBy(F.desc("gumbel_key"), id_col)
        .limit(k)
    )
