"""Property-based tests (hypothesis): the Column-expression implementations
must agree with plain-Python reference semantics on arbitrary inputs, and
operator invariants must hold. Batched: each property collects its examples
first, then runs ONE Spark job over all of them."""

from __future__ import annotations

import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from etl_poc_spark.functions.text import slugify, word_count
from etl_poc_spark.operators.chunker import chunk_by_tokens

# \x1c-\x1f are Python-whitespace but not Java-regex \s — a documented
# divergence (functions/text.py::word_count docstring); excluded here.
TEXT = st.text(
    alphabet=st.characters(codec="ascii", exclude_characters="\x00\x1c\x1d\x1e\x1f"),
    max_size=120,
)


def ref_slugify(text: str) -> str:
    s = re.sub(r"[^a-z0-9]+", "-", (text or "").lower())
    s = re.sub(r"-{2,}", "-", s).strip("-")
    return s or "untitled"


def collect_examples(strategy, n=60):
    out = []

    @settings(max_examples=n, deadline=None, database=None)
    @given(strategy)
    def gather(x):
        out.append(x)

    gather()
    return out


def test_slugify_property(spark):
    examples = collect_examples(TEXT)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(examples)], "i int, s string")
    got = {r["i"]: r["slug"] for r in df.select("i", slugify(F.col("s")).alias("slug")).collect()}
    for i, s in enumerate(examples):
        assert got[i] == ref_slugify(s), f"slugify({s!r}): {got[i]!r} != {ref_slugify(s)!r}"


def test_word_count_property(spark):
    examples = collect_examples(TEXT)
    df = spark.createDataFrame([(i, s) for i, s in enumerate(examples)], "i int, s string")
    got = {r["i"]: r["wc"] for r in df.select("i", word_count(F.col("s")).alias("wc")).collect()}
    for i, s in enumerate(examples):
        assert got[i] == len(s.split()), f"word_count({s!r}): {got[i]} != {len(s.split())}"


def test_chunker_invariants_property(spark):
    word_lists = collect_examples(st.lists(st.from_regex(r"[a-z]{1,8}", fullmatch=True), max_size=150), n=40)
    rows = [(i, " ".join(ws)) for i, ws in enumerate(word_lists)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = chunk_by_tokens(df, chunk_size=40, chunk_overlap=10).collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for i, ws in enumerate(word_lists):
        n = len(ws)
        chunks = sorted(by_doc.get(i, []), key=lambda r: r["chunk_id"])
        if n == 0:
            assert chunks == []  # empty docs produce no chunks
            continue
        # chunk count = ceil over starts at step 30
        assert len(chunks) == len(range(0, n, 30))
        # every chunk's tokens are the right slice; concatenation covers all
        for c in chunks:
            start = c["chunk_id"] * 30
            expected = ws[start : start + 40]
            assert c["chunk_text"].split() == expected
            assert c["chunk_n_tokens"] == len(expected)
        covered = set()
        for c in chunks:
            covered.update(range(c["chunk_id"] * 30, c["chunk_id"] * 30 + c["chunk_n_tokens"]))
        assert covered == set(range(n))  # full coverage, no gaps
