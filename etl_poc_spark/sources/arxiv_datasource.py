"""Spark 4 Python DataSource for the arXiv source (SURVEY.md §2.1 S1).

The idiomatic Spark-4 packaging of a custom source: after
`register_arxiv_datasource(spark)`, users read it like any built-in format:

    spark.read.format("arxiv").option("query", "cs.AI") \
         .option("max_results", 20).load()

Partition planning splits max_results into ranges so fetches parallelize
across executors (each partition fetches its slice) — the scan shape a real
HTTP-backed source needs at scale. The default fetcher is the deterministic
stub (no network here); a deployment swaps the fetcher inside ArxivReader.
"""

from __future__ import annotations

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql import types as T

ARXIV_DS_SCHEMA = T.StructType(
    [
        T.StructField("arxiv_id", T.StringType()),
        T.StructField("title", T.StringType()),
        T.StructField("authors", T.ArrayType(T.StringType())),
        T.StructField("summary", T.StringType()),
        T.StructField("primary_category", T.StringType()),
        T.StructField("pdf_url", T.StringType()),
        T.StructField("entry_id", T.StringType()),
    ]
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start, self.end = start, end


class ArxivReader(DataSourceReader):
    def __init__(self, options):
        self.query = options.get("query", "cs.AI")
        self.max_results = int(options.get("max_results", 10))
        self.slice_size = int(options.get("slice_size", 5))

    def partitions(self):
        return [
            _Range(start, min(start + self.slice_size, self.max_results))
            for start in range(0, self.max_results, self.slice_size)
        ]

    def read(self, partition):
        # executor-side fetch of this partition's slice (stub fetcher —
        # deterministic, no network; a real reader pages the arXiv API here)
        from etl_poc_spark.sources.arxiv import StubArxivFetcher

        rows = StubArxivFetcher().search(self.query, self.max_results)
        for r in rows[partition.start : partition.end]:
            yield (
                r["arxiv_id"],
                r["title"],
                r["authors"],
                r["summary"],
                r["primary_category"],
                r["pdf_url"],
                r["entry_id"],
            )


class ArxivDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "arxiv"

    def schema(self):
        return ARXIV_DS_SCHEMA

    def reader(self, schema):
        return ArxivReader(self.options)


def register_arxiv_datasource(spark) -> None:
    spark.dataSource.register(ArxivDataSource)


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
