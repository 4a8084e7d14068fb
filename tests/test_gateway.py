"""Gateway tests: validator admission contract, executor envelope,
row caps, timeout, schema introspection.

Mirrors + extends the reference's own validator tests
(``/root/reference/etl-service/tests/test_sync.py:28-42``).
"""

from __future__ import annotations

import pytest

from ser_etl_spark.gateway import (
    QueryRejected,
    QueryTimeoutError,
    QueryValidator,
    SnapshotCatalog,
    SparkQueryEngine,
    sanitize_query,
)


@pytest.fixture(scope="module")
def engine(spark, sf_small):
    catalog = SnapshotCatalog(spark, sf_small)
    return SparkQueryEngine(spark, catalog)


# -- validator (C1-C4) ------------------------------------------------------


class TestValidator:
    v = QueryValidator()

    @pytest.mark.parametrize(
        "q,pattern",
        [
            ("SELECT * FROM inventory", "select_all"),
            ("SELECT COUNT(*) FROM products", "count"),
            ("SELECT id, price FROM products", "select_columns"),
            ("SELECT SUM(quantity) FROM inventory", "aggregate"),
            # parens break select_columns' [\w\s,]+ -> falls to group_by
            ("SELECT a, SUM(b) FROM t GROUP BY a", "group_by"),
            ("select * from lowercase_ok", "select_all"),
        ],
    )
    def test_accepts(self, q, pattern):
        assert self.v.validate(q).pattern == pattern

    @pytest.mark.parametrize(
        "q",
        [
            "INSERT INTO t VALUES (1)",
            "DROP TABLE inventory",
            "DELETE FROM t",
            "UPDATE t SET a=1",
            "SELECT * FROM a UNION SELECT * FROM b",
            "CREATE TABLE x AS SELECT 1",
            "EXEC something",
            "PRAGMA version",  # matches no allow pattern
        ],
    )
    def test_rejects(self, q):
        with pytest.raises(QueryRejected):
            self.v.validate(q)

    def test_length_cap(self):
        with pytest.raises(QueryRejected, match="maximum length"):
            self.v.validate("SELECT * FROM t WHERE x = '" + "a" * 5000 + "'")

    def test_row_caps_per_pattern(self):
        assert self.v.validate("SELECT COUNT(*) FROM t").max_rows == 1
        assert self.v.validate("SELECT * FROM t").max_rows == 10000
        # Pattern order is part of the contract: a simple column list
        # matches select_columns (cap 10000) before where_clause sees it —
        # same precedence as the reference's whitelist ordering.
        assert self.v.validate("SELECT a FROM t WHERE a > 1").max_rows == 10000
        assert self.v.validate("SELECT a + 1 FROM t WHERE a > 1").max_rows == 5000

    def test_sanitizer_strips_comments(self):
        q = "SELECT * /* hidden */ FROM t -- trailing\n WHERE a = 1"
        assert sanitize_query(q) == "SELECT * FROM t WHERE a = 1"


# -- executor (C5-C9, B9-B10) ----------------------------------------------


class TestExecutor:
    def test_envelope(self, engine):
        res = engine.execute_query("SELECT COUNT(*) FROM lineitem")
        assert res.row_count == 1
        assert res.columns == ["count(1)"] or len(res.columns) == 1
        assert res.data[0][res.columns[0]] == 6000
        assert res.execution_time_ms > 0
        assert res.pattern == "count"

    def test_max_rows_cap_enforced(self, engine):
        # lineitem has 6000 rows; where_clause pattern caps at 5000 (the
        # `+ 0` expression keeps select_columns' looser 10000 cap from
        # matching first).
        res = engine.execute_query(
            "SELECT l_orderkey + 0 AS k FROM lineitem WHERE l_quantity > 0"
        )
        assert res.row_count == 5000
        assert res.pattern == "where_clause"

    def test_rejected_query_raises(self, engine):
        with pytest.raises(QueryRejected):
            engine.execute_query("DROP TABLE lineitem")

    def test_order_by_limit(self, engine):
        res = engine.execute_query(
            "SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC LIMIT 5"
        )
        assert res.row_count == 5
        prices = [r["o_totalprice"] for r in res.data]
        assert prices == sorted(prices, reverse=True)

    def test_schema_introspection(self, engine):
        schema = engine.get_schema()
        assert "lineitem" in schema
        assert "l_orderkey" in schema["lineitem"]
        assert "customer" in schema

    def test_timeout_cancels(self, spark, sf_small):
        catalog = SnapshotCatalog(spark, sf_small)
        validator = QueryValidator(max_execution_time_s=1.0)
        slow_engine = SparkQueryEngine(spark, catalog, validator)
        # Triple cartesian self-join of lineitem (6000^3 = 2.2e11 rows)
        # aggregated — cannot finish in 1s; must be cancelled.
        with pytest.raises(QueryTimeoutError):
            slow_engine.execute_query(
                "SELECT SUM(a.l_quantity * b.l_extendedprice * c.l_discount) "
                "FROM lineitem a, lineitem b, lineitem c"
            )


class TestCatalogRefresh:
    def test_manifest_missing_returns_empty(self, spark, tmp_path):
        cat = SnapshotCatalog(spark, str(tmp_path))
        assert cat.read_manifest() == {}

    def test_plain_dir_resolution(self, spark, sf_small):
        cat = SnapshotCatalog(spark, sf_small)
        assert cat.refresh() == sf_small
        # second call within TTL is a no-op returning the cached dir
        assert cat.refresh() == sf_small
