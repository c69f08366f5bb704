"""Deterministic rule-based scoring operators (SURVEY.md §2.9 L11/L12).

These are the reference's flagship fully-deterministic operators:

- article quality score: weighted rule score normalized 0-1
  (zara_hybrid_etl.py:212-222)
- paper validation: rule score starting at 1.0 with fixed decrements,
  floored at 0, plus issues + recommendations lists (arxiv_hook.py:217-294)

Both are implemented in EXACT integer arithmetic (milli-points / twentieths)
and divided once at the end, so the resulting doubles are bit-identical
across engines (Spark vs the DuckDB oracle) and across row orderings —
mathematically equal to the reference's float-accumulation formulation.

Everything here is a pure Column expression: whole-stage-codegen'd,
shuffle-free, and trivially scalable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from etl_poc_spark.functions.text import word_count

QUALITY_THRESHOLD = 0.7  # zara_hybrid_etl.py:26


def article_quality_score_expr(
    headline: Column,
    subtitle: Column,
    article_body: Column,
    meta_description: Column,
    n_pull_quotes: Column,
    n_key_takeaways: Column,
) -> Column:
    """Weighted rule score, normalized by attainable max (zara_hybrid_etl.py:212-222).

    Weights (in milli-points): headline 200 (only counted in the max when the
    headline is non-empty — faithful to the reference's `if h: maxs += 0.2`),
    word-count band 200, 4-field completeness 300, pull-quotes 150,
    key-takeaways 150.
    """
    h_len = F.length(F.coalesce(headline, F.lit("")))
    h_nonempty = h_len > 0

    headline_pts = F.when(~h_nonempty, F.lit(0)).when(h_len.between(10, 60), F.lit(200)).otherwise(F.lit(100))

    wc = word_count(F.coalesce(article_body, F.lit("")))
    wc_pts = (
        F.when(wc.between(700, 1000), F.lit(200))
        .when(wc.between(500, 1200), F.lit(150))
        .when(wc > 200, F.lit(100))
        .otherwise(F.lit(0))
    )

    req_filled = None
    for c in (headline, subtitle, article_body, meta_description):
        term = F.when(F.trim(F.coalesce(c, F.lit(""))) != "", F.lit(1)).otherwise(F.lit(0))
        req_filled = term if req_filled is None else req_filled + term
    completeness_pts = req_filled * F.lit(75)  # (n/4) * 300 exactly

    pq_pts = F.when(n_pull_quotes >= 2, F.lit(150)).when(n_pull_quotes >= 1, F.lit(100)).otherwise(F.lit(0))
    kt_pts = F.when(n_key_takeaways >= 3, F.lit(150)).when(n_key_takeaways >= 1, F.lit(100)).otherwise(F.lit(0))

    score = headline_pts + wc_pts + completeness_pts + pq_pts + kt_pts
    maxs = F.when(h_nonempty, F.lit(1000)).otherwise(F.lit(800))
    return score.cast("double") / maxs.cast("double")


def paper_validation_exprs(
    title: Column,
    summary: Column,
    n_authors: Column,
    text_content: Column,
) -> dict[str, Column]:
    """Paper-quality validation (arxiv_hook.py:217-294).

    Returns quality_score (1.0 minus decrements, floor 0), issues (joined
    string, reference append order), is_suitable_for_processing
    (raw score > 0.5), recommendations (joined string).

    Decrements are exact twentieths (0.05 units): missing field -4/20,
    short title -2/20, long title -1/20, short abstract -2/20, long
    abstract -1/20, short text -4/20, very long text -2/20, no authors
    -2/20, >20 authors -1/20.

    Faithful quirks preserved: an empty summary takes BOTH the missing-field
    -0.2 and the abstract-too-short -0.1 decrements; the "Missing abstract"
    recommendation branch (arxiv_hook.py:286) can never fire because the
    issue string emitted is "Missing summary".
    """
    t = F.coalesce(title, F.lit(""))
    s = F.coalesce(summary, F.lit(""))
    tc = F.coalesce(text_content, F.lit(""))
    na = n_authors

    t_len, s_len, tc_len = F.length(t), F.length(s), F.length(tc)

    miss_title = t_len == 0
    miss_authors = na == 0
    miss_summary = s_len == 0
    title_short = t_len < 10  # includes empty, faithful to len('')<10
    title_long = t_len > 200
    abs_short = s_len < 100
    abs_long = s_len > 5000
    has_text = tc_len > 0  # `if text_content:` gate
    text_short = has_text & (tc_len < 1000)
    text_long = has_text & (tc_len > 100000)
    many_authors = na > 20

    def pts(cond: Column, p: int) -> Column:
        return F.when(cond, F.lit(p)).otherwise(F.lit(0))

    deduction = (
        pts(miss_title, 4) + pts(miss_authors, 4) + pts(miss_summary, 4)
        + pts(title_short, 2) + pts(title_long, 1)
        + pts(abs_short, 2) + pts(abs_long, 1)
        + pts(text_short, 4) + pts(text_long, 2)
        + pts(miss_authors, 2) + pts(many_authors, 1)
    )
    raw20 = F.lit(20) - deduction
    quality_score = F.greatest(raw20, F.lit(0)).cast("double") / F.lit(20.0)

    def issue(cond: Column, msg: str) -> Column:
        return F.when(cond, F.lit(msg))

    issues = F.concat_ws(
        ", ",
        issue(miss_title, "Missing title"),
        issue(miss_authors, "Missing authors"),
        issue(miss_summary, "Missing summary"),
        issue(title_short, "Title too short"),
        issue(title_long, "Title too long"),
        issue(abs_short, "Abstract too short"),
        issue(abs_long, "Abstract too long"),
        issue(text_short, "Extracted text too short"),
        issue(text_long, "Extracted text very long (may affect processing)"),
        issue(miss_authors, "No authors listed"),
        issue(many_authors, "Too many authors (may be collaboration paper)"),
    )

    recommendations = F.concat_ws(
        ", ",
        issue(miss_title, "Skip processing - title required for article generation"),
        issue(text_short, "Verify PDF quality and consider manual processing"),
        issue(title_long, "Truncate title for headline generation"),
    )

    return {
        "quality_score": quality_score,
        "issues": issues,
        "is_suitable_for_processing": raw20.cast("double") / F.lit(20.0) > 0.5,
        "recommendations": recommendations,
    }
