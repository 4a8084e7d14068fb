"""Every registry query against a fully EMPTY (schema-only) snapshot.

Production reality the fixtures never exercise: an incremental extract
can legitimately deliver zero rows for every table (reference A18 skips
empty inputs at build time; the QUERY surface must degrade just as
cleanly). Before r6, nine similarity queries crashed with bare
NoneType/IndexError on empty corpora (data probes — query point,
dimension, centroids — assumed rows exist); they now return typed empty
results that still hash-match their oracles.

The one documented divergence: Spark's native ROLLUP/CUBE emits ZERO
rows over an empty input where ANSI (and DuckDB) emit the grand-total
row — GROUPING SETS containing () is defined as including the global
aggregate, which is one row even over an empty relation. Chasing that
corner row would mean abandoning Spark's optimized Expand-based plan
for a per-level UNION; the engine keeps native semantics and this suite
pins the divergence so a behavior change in either engine surfaces.
"""

from __future__ import annotations

import duckdb
import pytest

from ser_etl_spark.registry import all_queries
from ser_etl_spark.sources.parquet import TABLES
from tests.oracle import compare

#: Spark-native rollup/cube semantics on empty input (0 rows) diverge
#: from ANSI/DuckDB (grand-total row) — see module docstring.
ROLLUP_DIVERGENT = {"sales_rollup", "sales_cube", "time_bucket_rollup",
                    "corpus_rollup"}

QUERIES = all_queries()


@pytest.fixture(scope="module")
def empty_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        schema = pq.read_schema(f"{src}/{t}.parquet")
        pq.write_table(schema.empty_table(), d / f"{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def empty_con(empty_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{empty_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_empty_corpus(spark, empty_dir, empty_con, name):
    spec = QUERIES[name]
    df = spec.builder(spark, empty_dir)  # must not raise
    if spec.oracle is None:
        df.collect()  # rows-only: executes cleanly
        return
    if name in ROLLUP_DIVERGENT:
        # pin the divergence in both directions
        assert df.count() == 0, "Spark rollup-on-empty grew rows"
        assert len(empty_con.execute(spec.oracle).fetchall()) == 1, (
            "DuckDB rollup-on-empty no longer emits the grand-total row"
        )
        return
    problems = compare(name, df, empty_con, spec.oracle)
    assert not problems, "\n".join(problems)


@pytest.fixture(scope="module")
def one_row_dir(tmp_path_factory):
    import pyarrow.parquet as pq

    src = "/root/testdata/sf0.001"
    d = tmp_path_factory.mktemp("sf_one")
    for t in TABLES:
        tb = pq.read_table(f"{src}/{t}.parquet").slice(0, 1)
        pq.write_table(tb, d / f"{t}.parquet")
    return str(d)


@pytest.fixture(scope="module")
def one_row_con(one_row_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{one_row_dir}/{t}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_one_row_corpus(spark, one_row_dir, one_row_con, name):
    """The n=1 boundary (caught two r6 bugs: greatest() arity with a
    single-centroid quantizer, and the ANSI divide-by-zero in sample
    moments at n=1). Full oracle compare — no divergence list needed:
    rollup over one row is ordinary."""
    spec = QUERIES[name]
    df = spec.builder(spark, one_row_dir)
    if spec.oracle is None:
        df.collect()
        return
    problems = compare(name, df, one_row_con, spec.oracle)
    assert not problems, "\n".join(problems)


def test_orc_interchange_inherits_empty_degradation(spark, empty_dir, tmp_path):
    """Directive-r7 #8: the ORC interchange family inherits the
    schema-only degradation guarantees — empty tables round-trip
    write_orc -> OrcSource.read with schema intact and zero rows, and a
    snapshot re-landed from the ORC extract still drives registry
    queries to their typed empty results."""
    from ser_etl_spark.sources.interchange import OrcSource, write_orc
    from ser_etl_spark.sources.parquet import load_table

    tables = ("documents", "embeddings", "orders")
    orc_root = tmp_path / "orc"
    for t in tables:
        write_orc(load_table(spark, empty_dir, t), str(orc_root / t))

    src = OrcSource(str(orc_root))
    reland = tmp_path / "reland"
    for t in tables:
        df = src.read(spark, t)
        assert df.count() == 0
        assert df.schema == load_table(spark, empty_dir, t).schema, t
        df.write.parquet(str(reland / t))

    for name in ("dedup_exact", "ann_cosine_topk"):
        out = QUERIES[name].builder(spark, str(reland))
        assert out.count() == 0
        assert len(out.schema.fields) > 0
