"""Translator from the reference's YAML output_schema grammar to Spark types.

Grammar observed in the reference configs (SURVEY.md §1.2):
  string -> StringType         integer -> LongType
  number -> DoubleType         boolean -> BooleanType
  list[X] -> ArrayType(X)      bare list -> ArrayType(StringType)
  object -> MapType(String, String)      nested dict -> StructType

Canonical choices for the grammar's untyped forms (`list`, `object`) are
documented here because the reference leaves them open
(paper_extraction.yaml:92, article_generation.yaml:207).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T

_SCALARS = {
    "string": T.StringType(),
    "str": T.StringType(),
    "integer": T.LongType(),
    "int": T.LongType(),
    "number": T.DoubleType(),
    "float": T.DoubleType(),
    "boolean": T.BooleanType(),
    "bool": T.BooleanType(),
}

_LIST_RE = re.compile(r"^list\[\s*(.+?)\s*\]$")


def to_spark_type(spec) -> T.DataType:
    if isinstance(spec, dict):
        return T.StructType([T.StructField(k, to_spark_type(v), True) for k, v in spec.items()])
    s = str(spec).strip()
    if s in _SCALARS:
        return _SCALARS[s]
    if s == "list":
        return T.ArrayType(T.StringType())
    if s == "object":
        return T.MapType(T.StringType(), T.StringType())
    m = _LIST_RE.match(s)
    if m:
        return T.ArrayType(to_spark_type(m.group(1)))
    raise ValueError(f"unknown schema type spec: {spec!r}")


def to_struct_type(output_schema: dict) -> T.StructType:
    return T.StructType([T.StructField(k, to_spark_type(v), True) for k, v in output_schema.items()])
