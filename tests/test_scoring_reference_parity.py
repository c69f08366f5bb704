"""Unit parity tests: the Column-expression scorers must reproduce the
reference's Python semantics exactly (pure-Python reimplementations below
follow zara_hybrid_etl.py:212-222 and arxiv_hook.py:217-294 behaviorally —
written from the SURVEY, not copied)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_poc_spark.functions.scoring import article_quality_score_expr, paper_validation_exprs


def ref_quality_score(article: dict) -> float:
    score = maxs = 0.0
    h = article.get("headline", "")
    if h:
        maxs += 0.2
        score += 0.2 if 10 <= len(h) <= 60 else 0.1
    body = article.get("article_body", "")
    wc = len(body.split()) if body else 0
    maxs += 0.2
    score += 0.2 if 700 <= wc <= 1000 else (0.15 if 500 <= wc <= 1200 else (0.1 if wc > 200 else 0))
    req = ["headline", "subtitle", "article_body", "meta_description"]
    maxs += 0.3
    score += (sum(1 for k in req if str(article.get(k, "")).strip()) / len(req)) * 0.3
    pq = article.get("pull_quotes", [])
    maxs += 0.15
    score += 0.15 if len(pq) >= 2 else (0.1 if len(pq) >= 1 else 0)
    kt = article.get("key_takeaways", [])
    maxs += 0.15
    score += 0.15 if len(kt) >= 3 else (0.1 if len(kt) >= 1 else 0)
    return score / maxs if maxs > 0 else 0.0


CASES = [
    # (headline, subtitle, body_words, meta, n_pq, n_kt)
    ("A good headline here", "sub", 800, "meta", 2, 3),  # all full
    ("", "sub", 800, "meta", 2, 3),  # no headline -> maxs 0.8
    ("short", "sub", 100, "", 0, 0),  # headline out of band, low everything
    ("x" * 61, "", 600, "meta", 1, 1),  # long headline, partial bands
    ("exactly ten", "sub", 1200, "meta", 1, 4),  # boundary wc=1200
    ("h" * 10, "s", 201, "m", 3, 0),  # wc just above minimal threshold
    ("", "", 0, "", 0, 0),  # empty everything
]


@pytest.mark.parametrize("headline,subtitle,n_words,meta,n_pq,n_kt", CASES)
def test_article_quality_matches_reference(spark, headline, subtitle, n_words, meta, n_pq, n_kt):
    body = " ".join(["w"] * n_words)
    article = {
        "headline": headline,
        "subtitle": subtitle,
        "article_body": body,
        "meta_description": meta,
        "pull_quotes": ["q"] * n_pq,
        "key_takeaways": ["t"] * n_kt,
    }
    expected = ref_quality_score(article)
    df = spark.createDataFrame(
        [(headline, subtitle, body, meta, n_pq, n_kt)],
        "headline string, subtitle string, article_body string, meta_description string, n_pq int, n_kt int",
    )
    got = df.select(
        article_quality_score_expr(
            F.col("headline"), F.col("subtitle"), F.col("article_body"),
            F.col("meta_description"), F.col("n_pq"), F.col("n_kt"),
        ).alias("q")
    ).collect()[0]["q"]
    assert got == pytest.approx(expected, abs=1e-12)


def ref_validate_paper(paper: dict, text_content: str | None) -> dict:
    issues = []
    q = 1.0
    for f in ["title", "authors", "summary"]:
        if not paper.get(f):
            issues.append(f"Missing {f}")
            q -= 0.2
    title = paper.get("title", "")
    if len(title) < 10:
        issues.append("Title too short")
        q -= 0.1
    elif len(title) > 200:
        issues.append("Title too long")
        q -= 0.05
    summary = paper.get("summary", "")
    if len(summary) < 100:
        issues.append("Abstract too short")
        q -= 0.1
    elif len(summary) > 5000:
        issues.append("Abstract too long")
        q -= 0.05
    if text_content:
        if len(text_content) < 1000:
            issues.append("Extracted text too short")
            q -= 0.2
        elif len(text_content) > 100000:
            issues.append("Extracted text very long (may affect processing)")
            q -= 0.1
    authors = paper.get("authors", [])
    if not authors:
        issues.append("No authors listed")
        q -= 0.1
    elif len(authors) > 20:
        issues.append("Too many authors (may be collaboration paper)")
        q -= 0.05
    return {"quality_score": max(0.0, q), "issues": issues, "suitable": q > 0.5}


VCASES = [
    ("A reasonable paper title", "s" * 200, 3, "t" * 2000),
    ("", "s" * 200, 3, "t" * 2000),  # missing title (+ too short)
    ("short", "", 0, ""),  # everything missing/short
    ("t" * 201, "s" * 5001, 21, "t" * 100001),  # all "too long" branches
    ("A reasonable paper title", "s" * 99, 1, "t" * 999),  # short bands
]


@pytest.mark.parametrize("title,summary,n_authors,text_content", VCASES)
def test_paper_validation_matches_reference(spark, title, summary, n_authors, text_content):
    expected = ref_validate_paper(
        {"title": title, "summary": summary, "authors": ["a"] * n_authors}, text_content
    )
    df = spark.createDataFrame(
        [(title, summary, n_authors, text_content)],
        "title string, summary string, n_authors int, text_content string",
    )
    v = paper_validation_exprs(F.col("title"), F.col("summary"), F.col("n_authors"), F.col("text_content"))
    row = df.select(
        v["quality_score"].alias("q"), v["issues"].alias("issues"), v["is_suitable_for_processing"].alias("ok")
    ).collect()[0]
    assert row["q"] == pytest.approx(expected["quality_score"], abs=1e-12)
    assert row["issues"] == ", ".join(expected["issues"])
    assert row["ok"] == expected["suitable"]
