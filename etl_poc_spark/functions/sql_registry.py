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
