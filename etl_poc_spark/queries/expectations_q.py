"""Dataset-level data-quality expectation queries
(operators/expectations.py) — the publish gate a curated-corpus or
warehouse batch runs last. Counts are exact integers, so the reports are
hash-checked against SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_poc_spark.io import load_table
from etl_poc_spark.registry import query

_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PRIO_SQL = ", ".join(f"'{p}'" for p in _PRIORITIES)


@query(
    "orders_expectations",
    oracle=f"""
    WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders),
    report AS (
      SELECT 'foreign_key:o_custkey' AS rule, n.n_rows,
             CAST((SELECT COUNT(*) FROM orders o
                   WHERE o.o_custkey IS NOT NULL
                     AND o.o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
               AS n_violations
      FROM n
      UNION ALL
      SELECT 'in_set:o_orderpriority', n.n_rows,
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderpriority IS NOT NULL
                     AND o_orderpriority NOT IN ({_PRIO_SQL})) AS BIGINT)
      FROM n
      UNION ALL
      SELECT 'not_null:o_custkey', n.n_rows,
             CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NULL) AS BIGINT)
      FROM n
      UNION ALL
      SELECT 'range:o_totalprice', n.n_rows,
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_totalprice IS NOT NULL AND o_totalprice < 0) AS BIGINT)
      FROM n
      UNION ALL
      SELECT 'regex:o_orderstatus', n.n_rows,
             CAST((SELECT COUNT(*) FROM orders
                   WHERE o_orderstatus IS NOT NULL
                     AND NOT regexp_matches(o_orderstatus, '^[A-Z]$')) AS BIGINT)
      FROM n
      UNION ALL
      SELECT 'unique:o_orderkey', n.n_rows,
             CAST(COALESCE((SELECT SUM(c) FROM (
                    SELECT COUNT(*) AS c FROM orders GROUP BY o_orderkey
                  ) g WHERE c >= 2), 0) AS BIGINT)
      FROM n
    )
    SELECT rule, n_rows, n_violations, n_violations = 0 AS passed
    FROM report ORDER BY rule
    """,
)
def orders_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publish-gate expectation report over orders: key uniqueness,
    referential integrity into customer, null/range/set/format checks.
    The four row-local rules fold into ONE aggregate pass; uniqueness is
    one o_orderkey groupBy; the FK check is a broadcast left_anti against
    the distinct customer keys. Report rows are exact counts (6 rows,
    KBs) — hash-checked."""
    from etl_poc_spark.operators.expectations import expectation_report

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    rules = [
        {"type": "not_null", "column": "o_custkey"},
        {"type": "unique", "columns": ["o_orderkey"]},
        {"type": "range", "column": "o_totalprice", "min": 0},
        {"type": "in_set", "column": "o_orderpriority", "values": _PRIORITIES},
        {"type": "regex", "column": "o_orderstatus", "pattern": "^[A-Z]$"},
        {"type": "foreign_key", "column": "o_custkey", "ref": "customer", "ref_column": "c_custkey"},
    ]
    return expectation_report(o, rules, refs={"customer": c})
