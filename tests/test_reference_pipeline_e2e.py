"""Full reference-DAG-shape end-to-end test (SURVEY.md §3.1 / §5.2.2):

ingest (stub arXiv) -> paper validation (L12 gate) -> PDF download+extract
-> chunk (L1) -> LLM extract (L2) -> LLM article generation (L3) -> LLM
judge (L5) -> deterministic quality score (L11) -> threshold partition (P3)
-> stats (A2, the reference's exact stats shape) -> markdown + JSON sinks
(S6/S7) -> run summary (A6). Stub providers end to end — fully
deterministic, asserts real values.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from etl_poc_spark.functions.scoring import QUALITY_THRESHOLD, article_quality_score_expr, paper_validation_exprs
from etl_poc_spark.llm.ops import llm_map, llm_reduce
from etl_poc_spark.metrics import assemble_run_summary
from etl_poc_spark.operators.chunker import chunk_by_tokens
from etl_poc_spark.plans.schema_grammar import to_struct_type
from etl_poc_spark.sinks.sinks import write_json_records, write_markdown_articles
from etl_poc_spark.sources.arxiv import ArxivSource
from etl_poc_spark.sources.pdf import download_pdfs, extract_pdf_text


def test_reference_pipeline_shape(spark, tmp_path):
    out_dir = str(tmp_path)

    # 1. ingest: per-category quota + union + cap (zara_hybrid_etl.py:131-149)
    papers = ArxivSource().search_categories(spark, ["cs.AI", "cs.CL", "cs.LG"], max_results=9)
    assert papers.count() == 9

    # 2. paper validation gate (arxiv_hook.py:217-294): filter unsuitable
    v = paper_validation_exprs(F.col("title"), F.col("summary"), F.size("authors"), F.col("summary"))
    validated = papers.withColumn("paper_q", v["quality_score"]).withColumn("suitable", v["is_suitable_for_processing"])
    suitable = validated.filter("suitable")
    n_suitable = suitable.count()
    assert n_suitable > 0

    # 3. download + extract (S2/S3)
    with_pdfs = download_pdfs(suitable, os.path.join(out_dir, "pdfs"))
    assert with_pdfs.count() == n_suitable
    files = spark.read.format("binaryFile").load(os.path.join(out_dir, "pdfs"))
    texts = extract_pdf_text(files.select("path", "content")).withColumn(
        "doc_key", F.element_at(F.split(F.col("path"), "/"), -1)
    )

    # 4. chunk -> extract -> synthesize article per doc (L1, L2, L6/L3)
    chunks = chunk_by_tokens(texts.select("doc_key", F.col("full_text").alias("text")), chunk_size=30, chunk_overlap=5)
    extracted = llm_map(
        chunks,
        "Extract structured content: {{ input.chunk_text }}",
        to_struct_type({"title": "string", "abstract_summary": "string"}),
        validators=("len(output['title']) > 0",),
    )
    assert extracted.filter("_valid").count() == extracted.count()

    articles = llm_reduce(
        extracted,
        ["doc_key"],
        "Write an article from: {{ input.text }}",
        to_struct_type(
            {
                "headline": "string",
                "subtitle": "string",
                "article_body": "string",
                "meta_description": "string",
                "pull_quotes": "list[string]",
                "key_takeaways": "list[string]",
                "word_count": "integer",
            }
        ),
        text_col="chunk_text",
        order_col="chunk_id",
    )
    assert articles.count() == n_suitable  # one article per document

    # 5. LLM judge (L5): rubric-scored assessment map op
    judged = llm_map(
        articles,
        "Assess this article: {{ input.article_body }}",
        to_struct_type({"confidence_score": "number"}),
    )

    # 6. deterministic quality score + threshold partition (L11 + P3)
    scored = judged.withColumn(
        "quality_score",
        article_quality_score_expr(
            F.col("headline"), F.col("subtitle"), F.col("article_body"),
            F.col("meta_description"), F.size("pull_quotes"), F.size("key_takeaways"),
        ),
    )
    hi = scored.filter(F.col("quality_score") >= QUALITY_THRESHOLD)
    lo = scored.filter(F.col("quality_score") < QUALITY_THRESHOLD)

    # 7. stats — the reference's exact shape (zara_hybrid_etl.py:233-239)
    total = scored.count()
    passed, failed = hi.count(), lo.count()
    stats = {
        "total_articles": total,
        "passed_quality": passed,
        "failed_quality": failed,
        "pass_rate": passed / total,
        "avg_quality": scored.agg(F.avg("quality_score")).collect()[0][0],
    }
    assert stats["total_articles"] == n_suitable
    assert stats["passed_quality"] + stats["failed_quality"] == total
    assert 0.0 <= stats["avg_quality"] <= 1.0

    # 8. materialize (S6/S7)
    write_markdown_articles(hi, os.path.join(out_dir, "articles"))
    n_json = write_json_records(hi, os.path.join(out_dir, "articles_high_quality.json"), single_file=True)
    assert n_json == passed
    slugs = os.listdir(os.path.join(out_dir, "articles")) if passed else []
    assert len(slugs) == passed

    # 9. summary (A6)
    summary, sdf = assemble_run_summary(
        spark,
        {"ingestion": {"total_papers": 9, "suitable": n_suitable}, "quality": stats},
    )
    assert summary["quality_total_articles"] == total
    assert sdf.count() == 1

    # determinism: full rerun produces identical stats
    rerun_avg = judged.withColumn(
        "quality_score",
        article_quality_score_expr(
            F.col("headline"), F.col("subtitle"), F.col("article_body"),
            F.col("meta_description"), F.size("pull_quotes"), F.size("key_takeaways"),
        ),
    ).agg(F.avg("quality_score")).collect()[0][0]
    assert rerun_avg == stats["avg_quality"]
