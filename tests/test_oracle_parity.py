"""Differential tests: every registered query vs its DuckDB oracle.

This is the same check the driver's CORRECTNESS gate performs (row count +
schema + order-insensitive value hash at sf0.01), run locally at sf0.001 for
speed plus sf0.01 for the full gate.
"""

from __future__ import annotations

import pytest

from ser_etl_spark.registry import all_queries
from tests.oracle import compare, duckdb_connection

QUERIES = all_queries()
SQL_BACKED = sorted(n for n, s in QUERIES.items() if s.oracle is not None)
ROWS_ONLY = sorted(n for n, s in QUERIES.items() if s.oracle is None)


@pytest.fixture(scope="module")
def oracle_small(sf_small):
    con = duckdb_connection(sf_small)
    yield con
    con.close()


@pytest.fixture(scope="module")
def oracle_medium(sf_medium):
    con = duckdb_connection(sf_medium)
    yield con
    con.close()


@pytest.mark.parametrize("name", SQL_BACKED)
def test_parity_sf_small(spark, sf_small, oracle_small, name):
    spec = QUERIES[name]
    problems = compare(name, spec.builder(spark, sf_small), oracle_small, spec.oracle)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", SQL_BACKED)
def test_parity_sf_medium(spark, sf_medium, oracle_medium, name):
    spec = QUERIES[name]
    problems = compare(name, spec.builder(spark, sf_medium), oracle_medium, spec.oracle)
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, sf_small, name):
    """Non-SQL-expressible ops at least run and return a stable schema."""
    df = QUERIES[name].builder(spark, sf_small)
    assert df.columns
    assert df.count() >= 0
