"""Behavioral unit tests for engine operators on tiny in-memory data."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_poc_spark.functions.text import slugify, word_count
from etl_poc_spark.operators.chunker import chunk_by_tokens
from etl_poc_spark.operators.dedup import lsh_candidate_pairs, minhash_signatures, shingle_docs, verify_jaccard
from etl_poc_spark.operators.similarity import cosine_topk


def test_chunker_fanout_and_overlap(spark):
    words = " ".join(f"w{i}" for i in range(100))
    df = spark.createDataFrame([(1, words), (2, "only three words"), (3, "")], "doc_id int, text string")
    out = chunk_by_tokens(df, chunk_size=40, chunk_overlap=10).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,30,60,90 -> 4 chunks; last has 10 tokens
    assert len(by_doc[1]) == 4
    c = sorted(by_doc[1], key=lambda r: r["chunk_id"])
    assert c[0]["chunk_text"].split()[:2] == ["w0", "w1"]
    assert c[1]["chunk_text"].split()[0] == "w30"  # overlap of 10
    assert c[-1]["chunk_n_tokens"] == 10
    # doc 2: single chunk of 3 tokens; doc 3 (empty): no chunks
    assert len(by_doc[2]) == 1 and by_doc[2][0]["chunk_n_tokens"] == 3
    assert 3 not in by_doc


def test_minhash_finds_near_dup_and_skips_distinct(spark):
    base = " ".join(f"tok{i}" for i in range(50))
    near = " ".join(f"tok{i}" for i in range(1, 50))  # first token dropped
    other = " ".join(f"zzz{i}" for i in range(50))
    df = spark.createDataFrame([(1, base), (2, near), (3, other)], "doc_id int, text string")
    sh = shingle_docs(df)
    sig = minhash_signatures(sh)
    pairs = lsh_candidate_pairs(sig)
    verified = verify_jaccard(sh, pairs, threshold=0.8).collect()
    assert [(r["id_a"], r["id_b"]) for r in verified] == [(1, 2)]
    assert verified[0]["jaccard"] > 0.9


def test_cosine_topk_exact_neighbor(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (10, [0.9, 0.1, 0.0]),   # closest to query 0
        (11, [0.0, 1.0, 0.0]),
        (12, [-1.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<float>")
    out = cosine_topk(df.filter("vec_id = 0"), df.filter("vec_id >= 10"), k=3).collect()
    ranked = sorted(out, key=lambda r: r["rank"])
    assert [r["neighbor_id"] for r in ranked] == [10, 11, 12]
    assert ranked[0]["cos_sim"] > 0.99


def test_word_count_empty_and_spaces(spark):
    df = spark.createDataFrame([("",), ("   ",), ("a  b c ",)], "s string")
    got = [r[0] for r in df.select(word_count(F.col("s"))).collect()]
    assert got == [0, 0, 3]


def test_slugify_reference_cases(spark):
    df = spark.createDataFrame(
        [("Hello, World!",), ("--a--b--",), ("!!!",), ("Mixed CASE 42",)], "s string"
    )
    got = [r[0] for r in df.select(slugify(F.col("s"))).collect()]
    assert got == ["hello-world", "a-b", "untitled", "mixed-case-42"]
