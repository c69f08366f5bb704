from etl_poc_spark.sources.arxiv import ARXIV_SCHEMA, ArxivSource, StubArxivFetcher  # noqa: F401
