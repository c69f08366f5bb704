"""duplicate_span_coverage semantics on constructed corpora: interval
union of shared >=8-token windows, cross-doc only, division-free flag."""

from __future__ import annotations

import pytest


def _run(spark, tmp_path, rows):
    import etl_poc_spark.queries.spandedup_q as m

    sf = tmp_path / "sf"
    sf.mkdir()
    spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long") \
        .write.mode("overwrite").parquet(str(sf / "documents.parquet"))
    out = m.duplicate_span_coverage(spark, str(sf))
    return {r["doc_id"]: r for r in out.collect()}


def _doc(i, text):
    return (i, text, "en", "src0", len(text))


W10 = " ".join(f"tok{j}" for j in range(10))  # a 10-token span


def test_shared_span_interval_union(spark, tmp_path):
    # docs 1 and 2 share the exact 10-token span; doc 3 is all-unique.
    rows = [
        _doc(1, W10 + " " + " ".join(f"a{j}" for j in range(10))),
        _doc(2, W10 + " " + " ".join(f"b{j}" for j in range(10))),
        _doc(3, " ".join(f"c{j}" for j in range(20))),
    ]
    got = _run(spark, tmp_path, rows)
    # shared windows = starts 0,1,2 (8-token windows inside the 10-token
    # span); interval union = min(8,1)+min(8,1)+8 = 10 tokens
    assert got[1]["covered_tokens"] == 10 and got[2]["covered_tokens"] == 10
    assert got[1]["n_tokens"] == 20
    assert got[1]["dup_coverage"] == 10 / 20
    # 10*4 >= 20 -> heavy_dup fires at exactly 25%+
    assert got[1]["heavy_dup"] is True
    assert got[3]["covered_tokens"] == 0 and got[3]["heavy_dup"] is False


def test_within_doc_repeat_does_not_count(spark, tmp_path):
    # the span repeats INSIDE doc 1 only -> cross-doc rule says no coverage
    rows = [
        _doc(1, W10 + " " + W10),
        _doc(2, " ".join(f"z{j}" for j in range(20))),
    ]
    got = _run(spark, tmp_path, rows)
    assert got[1]["covered_tokens"] == 0


def test_short_and_empty_docs_pass_through(spark, tmp_path):
    rows = [_doc(1, "only five words in here"), _doc(2, ""), _doc(3, W10), _doc(4, W10)]
    got = _run(spark, tmp_path, rows)
    assert got[1]["covered_tokens"] == 0 and got[1]["n_tokens"] == 5
    assert got[2]["n_tokens"] == 0 and got[2]["dup_coverage"] == 0.0
    # docs 3 and 4 are verbatim copies: full coverage
    assert got[3]["covered_tokens"] == 10 and got[3]["dup_coverage"] == 1.0
