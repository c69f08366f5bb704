"""SQL-registered function surface (SURVEY §2.11: `spark.udf.register`).

`register_sql_functions(spark)` exposes the engine's scalar helpers by name
to `spark.sql` users (engine_slugify, engine_word_count, py_fingerprint).
These are row-at-a-time Python UDFs — the interactive-convenience tier.
Keep them off bulk hot paths: the Column-expression equivalents in
`functions/text.py` are the codegen'd fast path, and the results match
(tests assert SQL-UDF == Column-expr parity).
"""

from __future__ import annotations

import hashlib

from pyspark.sql import SparkSession
from pyspark.sql import types as T


def register_sql_functions(spark: SparkSession) -> None:
    spark.udf.register("engine_slugify", _py_slugify, T.StringType())
    spark.udf.register("engine_word_count", lambda s: len((s or "").split()), T.IntegerType())
    spark.udf.register("py_fingerprint", _py_fingerprint, T.StringType())
    spark.udtf.register("engine_chunks", chunk_udtf())


def chunk_udtf():
    """Python UDTF (Spark 4 table function): the reference's parsing-tool
    `Dict -> List[Dict]` fan-out contract (SURVEY §2.11 X1) as a REAL SQL
    table function — `SELECT ... FROM tbl, LATERAL engine_chunks(text, 40,
    10)`. Semantics match operators/chunker.chunk_by_tokens exactly
    (pytest-pinned); the Column/posexplode chunker remains the bulk fast
    path, this is the interactive/SQL tier."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="chunk_id int, chunk_text string, chunk_n_tokens int")
    class ChunkUDTF:
        def eval(self, text: str, chunk_size: int = 40, chunk_overlap: int = 10):
            if chunk_overlap >= chunk_size:
                # same contract as chunk_by_tokens — a silent step clamp
                # would fan out ~n_tokens chunks per document
                raise ValueError("chunk_overlap must be smaller than chunk_size")
            toks = (text or "").split()
            if not toks:
                return
            step = max(chunk_size - chunk_overlap, 1)
            for cid, start in enumerate(range(0, len(toks), step)):
                window = toks[start : start + chunk_size]
                yield cid, " ".join(window), len(window)

    return ChunkUDTF


def gini_udaf():
    """pandas GROUPED_AGG UDAF (SURVEY §2.11 ABSENT-tier UDAF surface):
    Gini coefficient of a column of non-negative integers. All arithmetic
    is EXACT Python-int (sorted-order weighted sum), with one final
    int/int double division — so the result is bit-identical across
    partitionings and engines (the values arrive in partition order; the
    sort makes that irrelevant)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _gini(values):
        xs = sorted(int(v) for v in values.dropna())
        n = len(xs)
        total = sum(xs)
        if n == 0 or total == 0:
            return 0.0
        num = sum((2 * i - n - 1) * x for i, x in enumerate(xs, start=1))
        return num / (n * total)

    # `from __future__ import annotations` stringifies hints, which breaks
    # pandas_udf's GROUPED_AGG signature inference — set real objects
    _gini.__annotations__ = {"values": pd.Series, "return": float}
    return pandas_udf(_gini, "double")


def count_udaf():
    """GROUPED_AGG row count — companion to gini_udaf (Spark disallows
    mixing pandas and built-in aggregates in one agg call)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _n(values):
        return len(values.dropna())

    _n.__annotations__ = {"values": pd.Series, "return": int}
    return pandas_udf(_n, "long")


def _py_slugify(s: str | None) -> str:
    import re

    out = re.sub(r"[^a-z0-9]+", "-", (s or "").lower())
    out = re.sub(r"-{2,}", "-", out).strip("-")
    return out or "untitled"


def _py_fingerprint(s: str | None, n_hex: int = 16) -> str:
    import re

    normalized = re.sub(r"\s+", " ", (s or "").strip().lower())
    return hashlib.md5(normalized.encode()).hexdigest()[:n_hex]


from etl_poc_spark._serde import register_by_value as _rbv  # noqa: E402

_rbv(__name__)
