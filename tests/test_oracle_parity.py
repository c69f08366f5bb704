"""Replicates the driver's correctness gate locally: every registered query
with an oracle must match DuckDB exactly (row count, columns, values) at
sf0.001."""

from __future__ import annotations

import pytest

from etl_poc_spark import registry

registry.load_all()

NAMES = sorted(registry.QUERIES)


@pytest.fixture(scope="module")
def duck(sf_dir):
    from tools.check_oracle import duckdb_conn

    return duckdb_conn(sf_dir)


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(name, spark, sf_dir, duck):
    from tools.check_oracle import compare

    spark_pdf = registry.QUERIES[name](spark, sf_dir).toPandas()
    if name not in registry.ORACLES:
        assert len(spark_pdf) >= 0  # rows-only check
        return
    duck_pdf = duck.sql(registry.ORACLES[name]).df()
    problems = compare(name, spark_pdf, duck_pdf)
    assert not problems, f"{name}: {problems}"
