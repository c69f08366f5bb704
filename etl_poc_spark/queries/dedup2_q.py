"""Second dedup modality set: SimHash and embedding-cosine near-dup.

SimHash here is a 16-bit signature built from md5 nibbles so the oracle can
reproduce it bit-for-bit (production would use xxhash64 over 64 bits — same
plan shape). Banded on 4x4 bits so candidate pairs come from an equi-join,
then verified by exact Hamming distance — the same
sketch -> bucket-join -> verify architecture as MinHash-LSH.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.operators.pins import pin
from etl_poc_spark.operators.similarity import _pair_cosine_carried  # shared exact-cosine kernel
from etl_poc_spark.registry import query

# --- SimHash ---------------------------------------------------------------
# 16-bit signature: bit j of word w = bit (j%4) of nibble (j//4) of md5(w).
# Signature bit = majority vote over the document's tokens (+1/-1), >0 -> '1'.

_SIMHASH_SQL = """
    WITH w AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM documents
      WHERE trim(text) <> ''
    ), bits AS (
      SELECT doc_id, word, b.j,
             CASE WHEN (CAST(strpos('0123456789abcdef', substr(md5(word), CAST(b.j // 4 AS INT) + 1, 1)) - 1 AS INT)
                        // CAST(power(2, CAST(b.j % 4 AS INT)) AS INT)) % 2 = 1
                  THEN 1 ELSE -1 END AS vote
      FROM w CROSS JOIN (SELECT unnest(range(16)) AS j) b
    ), sig_bits AS (
      SELECT doc_id, j, CASE WHEN SUM(vote) > 0 THEN '1' ELSE '0' END AS bit
      FROM bits GROUP BY doc_id, j
    ), sigs AS (
      SELECT doc_id, string_agg(bit, '' ORDER BY j) AS sig
      FROM sig_bits GROUP BY doc_id
    )
"""


VOTE_EXPR = (
    "CASE WHEN (CAST(instr('0123456789abcdef', substr(md5(word), CAST(j DIV 4 AS INT) + 1, 1)) - 1 AS INT) "
    "DIV CAST(pow(2, CAST(j % 4 AS INT)) AS INT)) % 2 = 1 THEN 1 ELSE -1 END"
)

@query(
    "simhash_signatures",
    oracle=_SIMHASH_SQL + """
    SELECT doc_id, sig FROM sigs
    """,
)
def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-bit md5-nibble SimHash signature per document. One explode + two
    aggregations; everything JVM-side. The md5 digest is hoisted BELOW the
    16-way bit-position explode (the Generate node is a projection-collapse
    barrier, so Catalyst cannot inline it back): one digest per word
    occurrence instead of sixteen, the per-j vote is then substr math."""
    d = load_table(spark, sf_dir, "documents").filter(F.trim(F.col("text")) != "")
    words = d.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
    bits = (
        words.withColumn("__md5", F.md5("word"))
        .select(
            "doc_id",
            "word",
            "__md5",
            F.explode(F.sequence(F.lit(0), F.lit(15))).alias("j"),
        )
        .withColumn("vote", F.expr(VOTE_EXPR.replace("md5(word)", "__md5")))
    )
    sig_bits = bits.groupBy("doc_id", "j").agg(
        F.when(F.sum("vote") > 0, F.lit("1")).otherwise(F.lit("0")).alias("bit")
    )
    return sig_bits.groupBy("doc_id").agg(
        F.concat_ws("", F.array_sort(F.collect_list(F.struct("j", "bit"))).getField("bit")).alias("sig")
    )


@query(
    "simhash_near_dup_pairs",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 2,
                             len(string_split_regex(trim(text), '\\s+'))), ' ') AS text
      FROM documents
      WHERE doc_id % 10 = 0 AND len(string_split_regex(trim(text), '\\s+')) >= 5
    ), w AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM corpus WHERE trim(text) <> ''
    ), bits AS (
      SELECT doc_id, word, b.j,
             CASE WHEN (CAST(strpos('0123456789abcdef', substr(md5(word), CAST(b.j // 4 AS INT) + 1, 1)) - 1 AS INT)
                        // CAST(power(2, CAST(b.j % 4 AS INT)) AS INT)) % 2 = 1
                  THEN 1 ELSE -1 END AS vote
      FROM w CROSS JOIN (SELECT unnest(range(16)) AS j) b
    ), sig_bits AS (
      SELECT doc_id, j, CASE WHEN SUM(vote) > 0 THEN '1' ELSE '0' END AS bit
      FROM bits GROUP BY doc_id, j
    ), sigs AS (
      SELECT doc_id, string_agg(bit, '' ORDER BY j) AS sig
      FROM sig_bits GROUP BY doc_id
    ), banded AS (
      SELECT doc_id, sig, b AS band, substr(sig, b * 4 + 1, 4) AS band_val
      FROM sigs CROSS JOIN (SELECT unnest(range(4)) AS b)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sig AS sig_a, b.sig AS sig_b
      FROM banded a JOIN banded b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    ), ham AS (
      SELECT id_a, id_b,
             (CASE WHEN substr(sig_a,1,1) <> substr(sig_b,1,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,2,1) <> substr(sig_b,2,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,3,1) <> substr(sig_b,3,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,4,1) <> substr(sig_b,4,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,5,1) <> substr(sig_b,5,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,6,1) <> substr(sig_b,6,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,7,1) <> substr(sig_b,7,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,8,1) <> substr(sig_b,8,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,9,1) <> substr(sig_b,9,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,10,1) <> substr(sig_b,10,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,11,1) <> substr(sig_b,11,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,12,1) <> substr(sig_b,12,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,13,1) <> substr(sig_b,13,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,14,1) <> substr(sig_b,14,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,15,1) <> substr(sig_b,15,1) THEN 1 ELSE 0 END +
              CASE WHEN substr(sig_a,16,1) <> substr(sig_b,16,1) THEN 1 ELSE 0 END) AS hamming
      FROM cand
    )
    SELECT id_a, id_b, hamming FROM ham WHERE hamming <= 1
    """,
)
def simhash_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs over the constructed near-dup corpus:
    sketch -> 4x4-bit band join -> exact Hamming verify (<= 1). The banded
    join bounds the pair space exactly like MinHash-LSH.

    Performance: word bit-vectors are computed once per DISTINCT word
    (vocabulary table) and broadcast-joined back to per-doc word counts, so
    the hot path multiplies small integers instead of hashing every token
    occurrence 16 times (22s -> ~3s at sf0.1; at web scale the vocabulary
    table is exactly the shared structure a simhash job should build once)."""
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words_arr = F.split(F.trim(F.col("text")), r"\s+")
    perturbed = (
        d.filter((F.col("doc_id") % 10 == 0) & (F.size(words_arr) >= 5))
        .select((F.col("doc_id") + 100000).alias("doc_id"), F.concat_ws(" ", F.slice(words_arr, 2, F.size(words_arr) - 1)).alias("text"))
    )
    corpus = d.unionByName(perturbed).filter(F.trim(F.col("text")) != "")

    words = corpus.select("doc_id", F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("word"))
    word_counts = words.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("cnt"))
    vocab = words.select("word").distinct()
    # per-j vote exprs with the literal j substituted (same math as VOTE_EXPR)
    vote_cols = [
        F.expr(
            f"CASE WHEN (CAST(instr('0123456789abcdef', substr(md5(word), CAST({j} DIV 4 AS INT) + 1, 1)) - 1 AS INT) "
            f"DIV CAST(pow(2, CAST({j} % 4 AS INT)) AS INT)) % 2 = 1 THEN 1 ELSE -1 END"
        ).alias(f"v{j}")
        for j in range(16)
    ]
    word_bits = vocab.select("word", *vote_cols)
    joined = word_counts.join(F.broadcast(word_bits), "word")
    sig_cols = [
        F.when(F.sum(F.col("cnt") * F.col(f"v{j}")) > 0, F.lit("1")).otherwise(F.lit("0")).alias(f"b{j}")
        for j in range(16)
    ]
    # the 16-bit signature is carried as an INT internally (bit j of the
    # string = int bit 15-j): integer band extraction and bit_count(XOR)
    # hamming replace per-character substr comparisons on every candidate
    # pair — same results, far cheaper on the (large) 16-bit candidate set
    sig_int = sum(
        [F.shiftleft(F.when(F.col(f"b{j}") == "1", F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")), 15 - j) for j in range(16)],
        F.lit(0).cast("long"),
    )
    sigs = pin(
        joined.groupBy("doc_id")
        .agg(*sig_cols)
        .select("doc_id", sig_int.alias("sig"))
    )

    banded = sigs.select(
        "doc_id", "sig", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band")
    ).withColumn("band_val", F.expr("shiftrightunsigned(sig, 12 - band * 4)").bitwiseAND(F.lit(15)))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_val") == F.col("b.band_val")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"), F.col("a.sig").alias("sig_a"), F.col("b.sig").alias("sig_b"))
        .distinct()
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.withColumn("hamming", ham.cast("int")).filter(F.col("hamming") <= 1).select("id_a", "id_b", "hamming")


@query("simhash64_near_dup_pairs")
def simhash64_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production 64-bit SimHash near-dup pairs over the same constructed
    near-dup corpus: xxhash64 word bits -> packed BIGINT signature -> 4 x
    16-bit band equi-join (65,536 values per band, so bucket occupancy is
    ~n/65536 instead of the 16-bit demo's n/16) -> bit_count Hamming verify.
    Bucket cap 200 bounds the worst-case candidate explosion from
    degenerate/boilerplate buckets. Rows-only check: xxhash64 has no DuckDB
    equivalent; the 16-bit md5 variant (simhash_near_dup_pairs) is the
    oracle-verified demo of the identical plan shape."""
    from etl_poc_spark.operators.dedup import simhash64_near_dup_pairs, simhash64_signatures
    from etl_poc_spark.queries.dedup_q import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    sigs = simhash64_signatures(corpus, "doc_id", "text")
    return simhash64_near_dup_pairs(
        sigs, "doc_id", n_bands=4, band_bits=16, max_hamming=3, max_bucket_size=200
    )


@query(
    "simhash64_md5_near_dup_pairs",
    oracle="""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 100000 AS doc_id,
             array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 2,
                             len(string_split_regex(trim(text), '\\s+'))), ' ') AS text
      FROM documents
      WHERE doc_id % 10 = 0
        AND len(string_split_regex(trim(text), '\\s+')) >= 5
    ), w AS (
      SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
      FROM corpus WHERE trim(text) <> ''
    ), wc AS (
      SELECT doc_id, word, COUNT(*) AS cnt FROM w GROUP BY doc_id, word
    ), bits AS (
      -- bit j of the 64-bit md5 word hash = bit (j%4) of nibble (j//4)
      SELECT wc.doc_id, b.j,
             CASE WHEN (CAST(strpos('0123456789abcdef', substr(md5(word), CAST(b.j // 4 AS INT) + 1, 1)) - 1 AS INT)
                        // CAST(power(2, CAST(b.j % 4 AS INT)) AS INT)) % 2 = 1
                  THEN cnt ELSE -cnt END AS vote
      FROM wc CROSS JOIN (SELECT unnest(range(64)) AS j) b
    ), sig_bits AS (
      SELECT doc_id, j, CASE WHEN SUM(vote) > 0 THEN 1 ELSE 0 END AS bit
      FROM bits GROUP BY doc_id, j
    ), bands AS (
      -- production band geometry: 4 bands x 16 bits, value in [0, 65535]
      SELECT doc_id, CAST(j // 16 AS INT) AS band,
             CAST(SUM(bit * CAST(power(2, CAST(j % 16 AS INT)) AS INT)) AS INT) AS band_val
      FROM sig_bits GROUP BY doc_id, CAST(j // 16 AS INT)
    ), under_cap AS (
      SELECT band, band_val FROM bands GROUP BY band, band_val HAVING COUNT(*) <= 200
    ), capped AS (
      SELECT bands.* FROM bands JOIN under_cap USING (band, band_val)
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM capped a JOIN capped b
        ON a.band = b.band AND a.band_val = b.band_val AND a.doc_id < b.doc_id
    ), hams AS (
      SELECT c.id_a, c.id_b,
             CAST(SUM(CASE WHEN sa.bit <> sb.bit THEN 1 ELSE 0 END) AS INT) AS hamming
      FROM cand c
      JOIN sig_bits sa ON sa.doc_id = c.id_a
      JOIN sig_bits sb ON sb.doc_id = c.id_b AND sb.j = sa.j
      GROUP BY c.id_a, c.id_b
    )
    SELECT id_a, id_b, hamming FROM hams WHERE hamming <= 3
    """,
)
def simhash64_md5_near_dup_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PORTABLE-hash twin of simhash64_near_dup_pairs: identical 64-bit
    signature pipeline and production band geometry (4 x 16-bit bands,
    65,536 values/band, bucket cap 200, bit_count Hamming verify <= 3),
    but the word hash is 16 packed md5 nibbles instead of xxhash64 — so
    DuckDB reproduces every signature bit and the whole banded self-join
    is value-hash-checked. xxhash64 stays the production default (faster,
    no string digest); this query proves the band/cap/verify geometry."""
    from etl_poc_spark.operators.dedup import simhash64_near_dup_pairs, simhash64_signatures
    from etl_poc_spark.queries.dedup_q import _near_dup_corpus

    corpus = _near_dup_corpus(spark, sf_dir)
    sigs = simhash64_signatures(corpus, "doc_id", "text", hash_mode="md5")
    return simhash64_near_dup_pairs(
        sigs, "doc_id", n_bands=4, band_bits=16, max_hamming=3, max_bucket_size=200
    ).withColumn("hamming", F.col("hamming").cast("int"))


# --- embedding-cosine near-dup --------------------------------------------


@query(
    "embedding_near_dup_pairs",
    oracle="""
    WITH tagged AS (
      SELECT vec_id, embedding,
             (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[5] >= 0 THEN '1' ELSE '0' END ||
              CASE WHEN embedding[6] >= 0 THEN '1' ELSE '0' END) AS bucket
      FROM embeddings
    ), pairs AS (
      SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, a.embedding AS qv, b.embedding AS bv
      FROM tagged a JOIN tagged b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ), expanded AS (
      SELECT query_id, neighbor_id, qv, bv, unnest(range(1, 65)) AS i FROM pairs
    ), dots AS (
      SELECT query_id, neighbor_id,
             CAST(SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE) AS DECIMAL(25,15))) AS DOUBLE) AS dot,
             CAST(SUM(CAST(CAST(qv[i] AS DOUBLE) * CAST(qv[i] AS DOUBLE) AS DECIMAL(25,15))) AS DOUBLE) AS qn2,
             CAST(SUM(CAST(CAST(bv[i] AS DOUBLE) * CAST(bv[i] AS DOUBLE) AS DECIMAL(25,15))) AS DOUBLE) AS bn2
      FROM expanded GROUP BY query_id, neighbor_id
    )
    SELECT query_id AS id_a, neighbor_id AS id_b,
           round(dot / (sqrt(qn2) * sqrt(bn2)), 7) AS cos_sim
    FROM dots
    WHERE round(dot / (sqrt(qn2) * sqrt(bn2)), 7) >= 0.4
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup: bucketed self-join (6 sign bits -> 64
    buckets) so only same-bucket pairs are scored, then exact-decimal cosine
    >= 0.4. The all-pairs cross join never materializes — the standard
    embedding-dedup shape for billion-row corpora."""
    from etl_poc_spark.operators.similarity import sign_bucket_expr

    emb = load_table(spark, sf_dir, "embeddings")
    # r16: the bucket self-join CARRIES both whole vectors straight into
    # the scorer (guide §2.4/§8) — before, it emitted id pairs and two
    # broadcast joins re-attached the vectors (plus two bounded probe
    # jobs). Same shuffle bytes: each vector crossed an exchange exactly
    # once either way. Norms stay the single pinned per-vector pass
    # (vecs is both cosine sides).
    tagged = emb.select("vec_id", "embedding", sign_bucket_expr("embedding", 6).alias("bucket"))
    a = tagged.select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("__va"), "bucket"
    )
    b = tagged.select(
        F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("__vb"), "bucket"
    )
    carried = a.join(
        b, (a.bucket == b.bucket) & (F.col("query_id") < F.col("neighbor_id"))
    ).drop("bucket")
    vecs = emb.select("vec_id", "embedding")
    scored = _pair_cosine_carried(carried, vecs, vecs, "vec_id", "embedding")
    return (
        scored.filter(F.col("cos_sim") >= 0.4)
        .select(F.col("query_id").alias("id_a"), F.col("neighbor_id").alias("id_b"), "cos_sim")
    )
