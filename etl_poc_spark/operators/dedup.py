"""Deduplication operators for large-scale training-data pipelines.

Three tiers, all DataFrame-native:

- exact_dedup: hash-groupBy on a content fingerprint. One shuffle on the
  fingerprint; map-side partial aggregation makes it cheap even at 100 TB.
- MinHash + LSH near-dedup: shingle -> k minhashes -> band -> bucket
  self-join -> jaccard verification. The bucket join is an equi-join on
  (band, band_value), so Catalyst shuffles only candidate buckets — never
  the O(n^2) pair space. Skewed buckets (degenerate band values) are
  handled by AQE skew-join splitting.
- verify_jaccard: exact set-jaccard on candidate pairs only.

Hash choice: the default `hash_mode="md5"` produces signatures as hex
strings whose MIN is engine-portable (the DuckDB oracle reproduces them
exactly). `hash_mode="xxhash64"` is the production/scale path — 64-bit JVM
hashing, no string churn — identical plan shape, not oracle-hashable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, key_cols: list[str], id_col: str) -> DataFrame:
    """Representative-per-duplicate-group: groups rows by `key_cols` and keeps
    the minimum `id_col` plus the group size. Equivalent to
    `dropDuplicates(key_cols)` but with a deterministic surviving row and an
    n_copies count (dropDuplicates keeps an arbitrary row — not
    oracle-checkable)."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(f"min_{id_col}"),
        F.count(F.lit(1)).alias("n_copies"),
    )


def shingle_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle_words: int = 3,
) -> DataFrame:
    """Distinct word-`shingle_words`-gram shingles per document.

    Documents with fewer than `shingle_words` tokens produce no shingles
    (they are too short to near-dedup on).
    """
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    shingles = F.expr(
        f"transform(sequence(0, size(__words) - {shingle_words}), "
        f"i -> concat_ws(' ', slice(__words, i + 1, {shingle_words})))"
    )
    return (
        df.select(F.col(id_col), words.alias("__words"))
        .filter(F.size("__words") >= shingle_words)
        .select(F.col(id_col), F.explode(shingles).alias("shingle"))
        .distinct()
    )


def minhash_signatures(
    shingles: DataFrame,
    id_col: str = "doc_id",
    n_hashes: int = 8,
    hash_mode: str = "md5",
) -> DataFrame:
    """k minhash values per document: for each seed, MIN over the document's
    shingles of hash(seed || '|' || shingle). Output: (id, seed, minhash)."""
    seeds = F.explode(F.sequence(F.lit(0), F.lit(n_hashes - 1))).alias("seed")
    seeded = shingles.select(F.col(id_col), F.col("shingle"), seeds)
    salted = F.concat(F.col("seed").cast("string"), F.lit("|"), F.col("shingle"))
    if hash_mode == "md5":
        h = F.md5(salted)
    elif hash_mode == "xxhash64":
        h = F.xxhash64(salted)
    else:
        raise ValueError(f"unknown hash_mode {hash_mode!r}")
    return seeded.select(F.col(id_col), F.col("seed"), h.alias("__h")).groupBy(id_col, "seed").agg(
        F.min("__h").alias("minhash")
    )


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    rows_per_band: int = 2,
) -> DataFrame:
    """Band the signature (seed DIV rows_per_band) and self-join on equal
    band values -> distinct candidate pairs (id_a < id_b)."""
    banded = signatures.groupBy(
        F.col(id_col), (F.col("seed") / rows_per_band).cast("int").alias("band")
    ).agg(F.concat_ws("", F.sort_array(F.collect_list(F.concat_ws(":", F.col("seed"), F.col("minhash"))))).alias("band_val")).persist()
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def verify_jaccard(
    shingles: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.8,
) -> DataFrame:
    """Exact jaccard over shingle sets for candidate pairs only; keeps pairs
    with 10*intersection >= threshold*10*union (integer comparison — no
    float boundary ambiguity) and emits the exact jaccard as a double."""
    sizes = shingles.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))
    sh_a = shingles.select(F.col(id_col).alias("id_a"), "shingle")
    sh_b = shingles.select(F.col(id_col).alias("id_b"), "shingle")
    inter = (
        pairs.join(sh_a, "id_a")
        .join(sh_b, ["id_b", "shingle"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_inter"))
    )
    thr_num = int(round(threshold * 1000))
    return (
        inter.join(sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a")), "id_a")
        .join(sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b")), "id_b")
        .withColumn("n_union", F.col("n_a") + F.col("n_b") - F.col("n_inter"))
        .filter(F.col("n_inter") * 1000 >= F.lit(thr_num) * F.col("n_union"))
        .select(
            "id_a",
            "id_b",
            (F.col("n_inter").cast("double") / F.col("n_union").cast("double")).alias("jaccard"),
        )
    )
