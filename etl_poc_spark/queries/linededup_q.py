"""Segment-level (CCNet-style line) dedup queries.

The driver corpus has no cross-document boilerplate, so the query injects a
deterministic 10-word boilerplate prefix into every doc_id % 7 == 0 document
— both engines build the same corpus, and the line-dedup operator then has a
real duplicated segment to drop from EVERY injected document while leaving
the rest of each document intact (the CCNet rule: all copies drop, the
reference pipeline's whole-paper unit never does sub-document dedup —
`airflow/dags/zara_hybrid_etl.py:149-154`).

The boilerplate is exactly one segment wide (10 words), so the original
word windows of the injected documents shift by exactly one segment and
stay intact — only the boilerplate segment becomes cross-document.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_poc_spark.io import load_table
from etl_poc_spark.operators.linededup import line_dedup
from etl_poc_spark.registry import query

# exactly 10 words == one full segment at words_per_segment=10
BOILERPLATE = "subscribe to our newsletter follow us on social media today"

_SEG_W = 10

LINE_DEDUP_ORACLE = f"""
    WITH corpus AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN '{BOILERPLATE} ' || text ELSE text END AS text
      FROM documents
    ), w AS (
      SELECT doc_id, string_split_regex(trim(text), '\\s+') AS words FROM corpus
    ), seg AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(list_slice(words, i * {_SEG_W} + 1, i * {_SEG_W} + {_SEG_W}), ' ') AS seg
      FROM (
        SELECT doc_id, words,
               unnest(range(0, CAST(ceil(len(words) / {_SEG_W}.0) AS INT))) AS i
        FROM w
      )
    ), dup AS (
      SELECT md5(seg) AS seg_hash
      FROM seg GROUP BY md5(seg)
      HAVING COUNT(DISTINCT doc_id) >= 2
    ), kept AS (
      SELECT s.doc_id, s.seg_idx, s.seg
      FROM seg s LEFT JOIN dup d ON md5(s.seg) = d.seg_hash
      WHERE d.seg_hash IS NULL
    ), rebuilt AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(seg, ' ' ORDER BY seg_idx) AS dedup_text
      FROM kept GROUP BY doc_id
    ), totals AS (
      SELECT doc_id, COUNT(*) AS n_segments FROM seg GROUP BY doc_id
    )
    SELECT t.doc_id, t.n_segments,
           COALESCE(r.n_kept, 0) AS n_kept,
           t.n_segments - COALESCE(r.n_kept, 0) AS n_dropped,
           COALESCE(r.dedup_text, '') AS dedup_text
    FROM totals t LEFT JOIN rebuilt r USING (doc_id)
"""


def _boilerplate_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return d.select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit(BOILERPLATE + " "), F.col("text")))
        .otherwise(F.col("text"))
        .alias("text"),
    )


@query("line_dedup_stats", oracle=LINE_DEDUP_ORACLE)
def line_dedup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document segment dedup over the boilerplate-injected corpus:
    per document (doc_id, n_segments, n_kept, n_dropped, dedup_text). Only
    128-bit segment hashes + doc ids enter the duplicate-detection shuffle
    (never segment bodies); the rebuild is one hash-partitioned
    array_sort(collect_list) aggregation — no window, no driver collect."""
    return line_dedup(
        _boilerplate_corpus(spark, sf_dir),
        id_col="doc_id",
        text_col="text",
        words_per_segment=_SEG_W,
        min_docs=2,
    )
