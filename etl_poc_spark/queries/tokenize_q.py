"""BPE-ish token counting (north-star text analysis: "whitespace + a
BPE-ish regex"). The pattern approximates subword pre-tokenization:
letter runs | digit runs | single non-alnum-non-space symbols — the
ASCII-safe skeleton of the GPT-2 pre-tokenizer, identical in Java regex
and RE2 so the count is oracle-exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.operators.pins import pin
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


@query(
    "bm25_search",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS words
      FROM documents WHERE trim(text) <> ''
    ), stats AS (
      SELECT COUNT(*) AS n_docs, SUM(len(words)) AS total_len FROM docs
    ), terms(term) AS (VALUES ('spark'), ('join'), ('data')),
    tf AS (
      SELECT d.doc_id, t.term, len(words) AS dl,
             len(list_filter(d.words, w -> w = t.term)) AS f
      FROM docs d CROSS JOIN terms t
    ), df AS (
      SELECT term, COUNT(*) AS n_df FROM tf WHERE f > 0 GROUP BY term
    ), scored AS (
      SELECT tf.doc_id,
             ((CAST(s.n_docs AS DOUBLE) - n_df + 0.5) / (n_df + 0.5))
             * ((CAST(f AS DOUBLE) * 2.2)
                / (f + 1.2 * (0.25 + (0.75 * dl) / (CAST(s.total_len AS DOUBLE) / s.n_docs))))
             AS term_score
      FROM tf JOIN df USING (term) CROSS JOIN stats s
      WHERE f > 0
    ), agg AS (
      SELECT doc_id, round(SUM(term_score), 6) AS bm25
      FROM scored GROUP BY doc_id
    ), ranked AS (
      SELECT doc_id, bm25, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rank
      FROM agg
    )
    SELECT doc_id, bm25, rank FROM ranked WHERE rank <= 20
    """,
)
def bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval (k1=1.2, b=0.75, log-free idf variant) for a fixed
    3-term query over the corpus — the ranking half of a retrieval
    pipeline. Inverted shape: only docs containing a term are scored (the
    f>0 filter lands before the join), corpus stats come from one tiny
    aggregate, document-frequency from one groupBy. The arithmetic is the
    same IEEE expression tree on both engines (no transcendentals — the
    log-free idf keeps it engine-exact), rounded once for ranking
    stability; ranking ties break on doc_id. Top-20 via
    TakeOrderedAndProject, not a global sort."""
    d = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    words = d.select(
        "doc_id", F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("words")
    )
    stats = words.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("words")).alias("total_len"),
    )
    terms = spark.createDataFrame([("spark",), ("join",), ("data",)], "term string")
    # inverted-index shape: explode once, keep only query-term postings via
    # a broadcast join, count occurrences — codegen'd, no interpreted
    # higher-order functions (measured ~6x faster than F.filter(lambda))
    postings = words.select(
        "doc_id", F.size("words").alias("dl"), F.explode("words").alias("term")
    ).join(F.broadcast(terms), "term")
    # tf feeds both the scoring join and the document-frequency aggregate —
    # persist (tracked; release via operators.pins.release_pins) so the
    # scan+explode postings pipeline runs once
    tf = pin(postings.groupBy("doc_id", "term", "dl").agg(F.count(F.lit(1)).alias("f")))
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("n_df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_score",
            ((F.col("n_docs").cast("double") - F.col("n_df") + 0.5) / (F.col("n_df") + 0.5))
            * (
                (F.col("f").cast("double") * 2.2)
                / (
                    F.col("f")
                    + 1.2
                    * (0.25 + (0.75 * F.col("dl")) / (F.col("total_len").cast("double") / F.col("n_docs")))
                )
            ),
        )
    )
    agg = scored.groupBy("doc_id").agg(F.round(F.sum("term_score"), 6).alias("bm25"))
    # orderBy+limit plans TakeOrderedAndProject (per-partition top-k, driver
    # merge); the rank window then runs over just the 20 surviving rows —
    # a global row_number window here would instead force every scored doc
    # through a single-partition sort
    top = agg.orderBy(F.desc("bm25"), F.asc("doc_id")).limit(20)
    w = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    return top.withColumn("rank", F.row_number().over(w))
