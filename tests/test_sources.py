"""Interchange source/sink tests: CSV and JSON-lines roundtrips against
the parquet-loaded truth, with explicit schemas (the scale path) and
inference (the exploration path)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ser_etl_spark.etl.extract import extract_table
from ser_etl_spark.sources.interchange import (
    CsvSource,
    JsonSource,
    write_csv,
    write_json,
)
from ser_etl_spark.sources.parquet import load_table

LINEITEM_DDL = (
    "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
    "l_linenumber int, l_quantity double, l_extendedprice double, "
    "l_discount double, l_tax double, l_returnflag string, "
    "l_linestatus string, l_shipdate timestamp_ntz"
)


def _canon(rows):
    return sorted(map(str, (tuple(r) for r in rows)))


@pytest.fixture(scope="module")
def lineitem(spark, sf_small):
    return load_table(spark, sf_small, "lineitem")


def test_csv_roundtrip_exact(spark, lineitem, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("csv_rt"))
    write_csv(lineitem, f"{root}/lineitem")
    back = CsvSource(root, schema=LINEITEM_DDL).read(spark, "lineitem")
    assert back.schema == lineitem.schema
    assert _canon(back.collect()) == _canon(lineitem.collect())


def test_json_roundtrip_exact(spark, lineitem, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("json_rt"))
    write_json(lineitem, f"{root}/lineitem")
    schema_back = JsonSource(root, schema=LINEITEM_DDL).read(spark, "lineitem")
    assert schema_back.schema == lineitem.schema
    assert _canon(schema_back.collect()) == _canon(lineitem.collect())


def test_csv_inference_fallback(spark, lineitem, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("csv_inf"))
    write_csv(lineitem.select("l_orderkey", "l_quantity", "l_returnflag"),
              f"{root}/lineitem")
    inferred = CsvSource(root).read(spark, "lineitem")
    kinds = [f.dataType.simpleString() for f in inferred.schema.fields]
    assert kinds[0] in ("int", "bigint")  # integral, not string
    assert kinds[1:] == ["double", "string"]
    assert inferred.count() == lineitem.count()


def test_interchange_source_feeds_etl_extraction(
    spark, lineitem, tmp_path_factory
):
    """Interchange sources plug into the same extraction operator (A1/A2)
    as parquet/JDBC — including incremental pushdown on the lazy plan."""
    root = str(tmp_path_factory.mktemp("csv_etl"))
    write_csv(lineitem, f"{root}/lineitem")
    src = CsvSource(root, schema=LINEITEM_DDL)
    full = extract_table(spark, src, "lineitem", ts_col="l_shipdate")
    assert full.count() == lineitem.count()
    since = lineitem.agg(F.max("l_shipdate")).first()[0]
    inc = extract_table(
        spark, src, "lineitem", since=since, ts_col="l_shipdate"
    )
    assert inc.count() == 0


class TestJdbcReaderOptions:
    """A1 parallel-extraction options, validated without a live endpoint."""

    def _src(self, **kw):
        from ser_etl_spark.etl.extract import JdbcSource

        return JdbcSource(
            url="jdbc:sqlserver://db:1433;databaseName=analytics",
            properties={"user": "etl", "fetchsize": 10000},
            **kw,
        )

    def test_unpartitioned_options_complete(self):
        opts = self._src().reader_options("inventory")
        assert opts["dbtable"] == "inventory"
        assert "partitionColumn" not in opts
        assert opts["fetchsize"] == "10000"

    def test_partitioned_requires_bounds(self):
        import pytest

        src = self._src(partition_column="id")
        with pytest.raises(ValueError, match="lower_bound and.*upper_bound"):
            src.reader_options("inventory")

    def test_partitioned_with_bounds_emits_all_four_options(self):
        opts = self._src(
            partition_column="id",
            num_partitions=16,
            lower_bound=1,
            upper_bound=9_999_999,
        ).reader_options("inventory")
        assert opts["partitionColumn"] == "id"
        assert opts["numPartitions"] == "16"
        assert opts["lowerBound"] == "1"
        assert opts["upperBound"] == "9999999"


class _FakeProbeRow(dict):
    """Row-alike: supports row["lo"] / row["hi"]."""


class _FakeLoadedDF:
    def __init__(self, first_row=None):
        self._first = first_row

    def first(self):
        return self._first


class _FakeReader:
    """Records the format + option dict of each .load() on the session."""

    def __init__(self, session):
        self._session = session
        self._format = None
        self._opts: dict[str, str] = {}

    def format(self, fmt):
        self._format = fmt
        return self

    def option(self, k, v):
        self._opts[k] = v
        return self

    def load(self):
        self._session.loads.append((self._format, dict(self._opts)))
        if "SELECT MIN(" in self._opts.get("dbtable", ""):
            return _FakeLoadedDF(_FakeProbeRow(lo=100, hi=900))
        return _FakeLoadedDF()


class _FakeSparkSession:
    """Record/replay seam: every spark.read yields a fresh recording
    reader, so the full JDBC read path runs without a live endpoint."""

    def __init__(self):
        self.loads: list[tuple[str, dict[str, str]]] = []

    @property
    def read(self):
        return _FakeReader(self)


class TestJdbcProbeSeam:
    """A1/A2 integration seam: the probed-bounds read path replayed
    against a fake DataFrameReader — proves exactly one MIN/MAX probe is
    issued, with the expected query text, and that the probed bounds
    land in the final partitioned reader options (reference topology:
    ``/root/reference/etl-service/src/database.py:65-93``)."""

    def _probing_src(self):
        from ser_etl_spark.etl.extract import JdbcSource

        return JdbcSource(
            url="jdbc:sqlserver://db:1433;databaseName=analytics",
            properties={"user": "etl", "fetchsize": 10000},
            partition_column="id",
            num_partitions=4,
            probe_bounds=True,
        )

    def test_probe_query_text_and_final_options(self):
        fake = _FakeSparkSession()
        self._probing_src().read(fake, "orders")

        assert len(fake.loads) == 2, "expected exactly probe + main read"
        probe_fmt, probe_opts = fake.loads[0]
        main_fmt, main_opts = fake.loads[1]
        assert probe_fmt == main_fmt == "jdbc"

        # the probe: one scalar MIN/MAX pushdown subquery, NOT partitioned
        assert probe_opts["dbtable"] == (
            "(SELECT MIN(id) AS lo, MAX(id) AS hi FROM orders) b"
        )
        assert "partitionColumn" not in probe_opts
        assert probe_opts["user"] == "etl"

        # the probed bounds land in the real read's partitioning options
        assert main_opts["dbtable"] == "orders"
        assert main_opts["partitionColumn"] == "id"
        assert main_opts["numPartitions"] == "4"
        assert main_opts["lowerBound"] == "100"
        assert main_opts["upperBound"] == "900"
        assert main_opts["fetchsize"] == "10000"

    def test_exactly_one_probe_per_read(self):
        fake = _FakeSparkSession()
        self._probing_src().read(fake, "orders")
        probes = [
            o for _, o in fake.loads if "SELECT MIN(" in o.get("dbtable", "")
        ]
        assert len(probes) == 1

    def test_static_bounds_skip_the_probe(self):
        import dataclasses

        fake = _FakeSparkSession()
        src = dataclasses.replace(
            self._probing_src(), lower_bound=5, upper_bound=50
        )
        src.read(fake, "orders")
        assert len(fake.loads) == 1
        _, opts = fake.loads[0]
        assert opts["lowerBound"] == "5"
        assert opts["upperBound"] == "50"


class TestOrcInterchange:
    """ORC as a columnar extraction source: exact round-trip (NTZ
    timestamps included), predicate pushdown into the ORC scan, and the
    same ETL extraction plumbing as parquet/CSV."""

    def test_roundtrip_and_pushdown(self, spark, sf_small, tmp_path):
        import re

        from ser_etl_spark.session import explain_string
        from ser_etl_spark.sources.interchange import OrcSource, write_orc
        from ser_etl_spark.sources.parquet import load_table

        events = load_table(spark, sf_small, "events")
        root = str(tmp_path)
        write_orc(events, f"{root}/events")
        back = OrcSource(root).read(spark, "events")
        assert back.schema == events.schema  # NTZ ts survives exactly
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, events.collect())
        )
        filtered = back.filter(F.col("user_id") < 50)
        plan = explain_string(filtered)
        m = re.search(r"PushedFilters: \[(.+?)\]", plan)
        assert m and "user_id" in m.group(1), plan

    def test_feeds_etl_extraction(self, spark, sf_small, tmp_path):
        from ser_etl_spark.etl.extract import extract_table
        from ser_etl_spark.sources.interchange import OrcSource, write_orc
        from ser_etl_spark.sources.parquet import load_table

        events = load_table(spark, sf_small, "events")
        write_orc(events, f"{tmp_path}/events")
        src = OrcSource(str(tmp_path))
        full = extract_table(spark, src, "events", ts_col="ts")
        assert full.count() == events.count()
        since = events.agg(F.max("ts")).first()[0]
        inc = extract_table(spark, src, "events", since=since, ts_col="ts")
        assert inc.count() == 0


class TestLoadTableCache:
    """The driver-time DataFrame memoization in ``load_table``: hits are
    per-session and per listing-fingerprint (r9 ADVICE hardening — the
    old key shared entries across sessions, so two sessions alternating
    over one table evicted each other on every call)."""

    def test_per_session_keying_no_cross_session_thrash(
        self, spark, sf_small
    ):
        a = load_table(spark, sf_small, "region")
        assert load_table(spark, sf_small, "region") is a
        s2 = spark.newSession()
        b = load_table(s2, sf_small, "region")
        assert b is not a
        # alternating sessions must BOTH keep hitting their own entry
        assert load_table(spark, sf_small, "region") is a
        assert load_table(s2, sf_small, "region") is b

    def test_rewrite_misses_cache(self, spark, sf_small, tmp_path):
        src = load_table(spark, sf_small, "region")
        src.write.parquet(f"{tmp_path}/region.parquet")
        first = load_table(spark, str(tmp_path), "region")
        assert load_table(spark, str(tmp_path), "region") is first
        src.limit(1).write.mode("overwrite").parquet(
            f"{tmp_path}/region.parquet"
        )
        again = load_table(spark, str(tmp_path), "region")
        assert again is not first  # listing fingerprint moved
        assert again.count() == 1
