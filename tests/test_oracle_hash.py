"""Three-way pin of the XXH64 machinery: Spark == pure Python == DuckDB.

``ser_etl_spark.oracle_hash`` re-implements Spark's ``xxhash64`` (XXH64,
seed 42) twice — pure Python for import-time constant folding, and as
generated staged DuckDB SQL for the differential oracles (MinHash /
SimHash / sequence-packing shards). Every oracle that bakes hash values
into SQL is only as sound as these equalities, so they are pinned here
over all the shapes the operators hash: empty strings, every tail-length
class (1-byte/4-byte/8-byte remainders), multi-stripe strings (>= 32 and
>= 64 bytes), non-ASCII UTF-8, signed-boundary longs, and the
int-literal chain form ``xxhash64(col, lit(k))`` the MinHash
permutations use.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from ser_etl_spark.oracle_hash import (
    stages_to_ctes,
    to_signed,
    xxh64_bytes,
    xxh64_chain,
    xxh64_int,
    xxh64_long,
    xxh64_str_stage_cols,
    xxh64_long_stage_cols,
)

STRINGS = [
    "",
    "a",
    "ab",
    "abc",
    "abcd",
    "abcde",
    "abcdef",
    "abcdefg",
    "abcdefgh",
    "hello world",
    "the quick brown fox jumps over the lazy dog",
    "x" * 31,
    "y" * 32,
    "z" * 33,
    "q" * 39,
    "w" * 40,
    "m" * 64,
    "v" * 100,
    "word one two",
    "naïve café — ünïcødé ✓",
    "tab\tnew\nline",
    "plane:0:0",
    "plane:3:63",
]

LONGS = [0, 1, -1, 42, 2**63 - 1, -(2**63), 123456789, -987654321, 2**40 + 17]


class TestPythonVsSpark:
    def test_strings(self, spark):
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(STRINGS)], "id long, s string"
        )
        for r in df.select("id", F.xxhash64("s").alias("h")).collect():
            expect = to_signed(xxh64_bytes(STRINGS[r["id"]].encode("utf-8")))
            assert r["h"] == expect, repr(STRINGS[r["id"]])

    def test_longs_and_chains(self, spark):
        df = spark.createDataFrame([(i, v) for i, v in enumerate(LONGS)],
                                   "id long, v long")
        rows = df.select(
            "id",
            F.xxhash64("v").alias("h"),
            *[F.xxhash64("v", F.lit(k)).alias(f"hi{k}") for k in range(4)],
            F.xxhash64("v", F.lit(5).cast("long")).alias("hl"),
            F.xxhash64("v", F.lit(7), F.lit(-3), F.lit(99)).alias("h4"),
        ).collect()
        for r in rows:
            v = LONGS[r["id"]]
            assert r["h"] == to_signed(xxh64_long(v))
            for k in range(4):
                # Python-int literals are IntegerType -> the hashInt path
                assert r[f"hi{k}"] == to_signed(xxh64_chain([v, (k, "int")]))
            assert r["hl"] == to_signed(xxh64_chain([v, (5, "long")]))
            assert r["h4"] == to_signed(
                xxh64_chain([v, (7, "int"), (-3, "int"), (99, "int")])
            )

    def test_corpus_tokens(self, spark, sf_small):
        """Hash equality over real fixture content: every distinct token
        of the first documents — the exact values the SimHash oracle
        hashes."""
        from ser_etl_spark.sources.parquet import load_table

        toks = (
            load_table(spark, sf_small, "documents")
            .filter(F.col("doc_id") < 50)
            .select(
                F.explode(
                    F.split(F.trim(F.lower(F.col("text"))), " +")
                ).alias("tok")
            )
            .distinct()
            .select("tok", F.xxhash64("tok").alias("h"))
            .collect()
        )
        assert len(toks) > 20
        for r in toks:
            assert r["h"] == to_signed(xxh64_bytes(r["tok"].encode("utf-8")))


class TestPythonVsDuckDB:
    @pytest.fixture(scope="class")
    def con(self):
        return duckdb.connect()

    def test_string_stages(self, con):
        con.execute("CREATE OR REPLACE TABLE ts AS SELECT * FROM (VALUES "
                    + ", ".join(f"({i}, ?)" for i in range(len(STRINGS)))
                    + ") v(id, s)", STRINGS)
        ctes, fin = stages_to_ctes("b", xxh64_str_stage_cols("s", "_h"), "_t")
        rows = con.execute(
            f"WITH b AS (SELECT id, s FROM ts){ctes} "
            f"SELECT id, _h FROM {fin} ORDER BY id"
        ).fetchall()
        for i, h in rows:
            assert int(h) == xxh64_bytes(STRINGS[i].encode("utf-8")), STRINGS[i]

    def test_long_stages(self, con):
        con.execute("CREATE OR REPLACE TABLE tl(id INT, v BIGINT)")
        for i, v in enumerate(LONGS):
            con.execute("INSERT INTO tl VALUES (?, ?)", [i, v])
        ctes, fin = stages_to_ctes("b", xxh64_long_stage_cols("v", "_h"), "_t")
        rows = con.execute(
            f"WITH b AS (SELECT id, v FROM tl){ctes} "
            f"SELECT id, _h FROM {fin} ORDER BY id"
        ).fetchall()
        for i, h in rows:
            assert int(h) == xxh64_long(LONGS[i])


def _random_corpus(n: int = 400, seed: int = 20240814) -> list[str]:
    """Seeded mixed-shape strings: every tail-length class, multi-stripe
    lengths, unicode, repeated chars, realistic tokens."""
    import random

    rng = random.Random(seed)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 _-#@€ñ語"
    out = []
    for _ in range(n):
        ln = rng.choice([0, 1, 2, 3, 4, 5, 7, 8, 9, 15, 16, 17, 31, 32,
                         33, 40, 63, 64, 65, 100, 200, rng.randrange(0, 300)])
        out.append("".join(rng.choice(alphabet) for _ in range(ln)))
    return out


class TestRandomCorpusThreeWay:
    """Batch three-way pin over a seeded random corpus: DuckDB staged SQL
    == pure Python == Spark, for strings and for the hashInt rehash the
    MinHash/Count-Min/Bloom oracles build on."""

    def test_duckdb_strings(self):
        corpus = _random_corpus()
        con = duckdb.connect()
        con.execute(
            "CREATE TABLE rc AS SELECT * FROM (VALUES "
            + ", ".join(f"({i}, ?)" for i in range(len(corpus)))
            + ") v(id, s)",
            corpus,
        )
        ctes, fin = stages_to_ctes("b", xxh64_str_stage_cols("s", "_h"), "_t")
        rows = con.execute(
            f"WITH b AS (SELECT id, s FROM rc){ctes} "
            f"SELECT id, _h FROM {fin} ORDER BY id"
        ).fetchall()
        for i, h in rows:
            assert int(h) == xxh64_bytes(corpus[i].encode("utf-8")), repr(
                corpus[i]
            )

    def test_spark_strings_and_rehash(self, spark):
        corpus = _random_corpus(150)
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(corpus)], "id long, s string"
        )
        rows = df.select(
            "id",
            F.xxhash64("s").alias("h"),
            F.xxhash64(F.xxhash64("s"), F.lit(3)).alias("hr"),
        ).collect()
        for r in rows:
            u = xxh64_bytes(corpus[r["id"]].encode("utf-8"))
            assert r["h"] == to_signed(u)
            assert r["hr"] == to_signed(xxh64_int(3, xxh64_long(to_signed(u))))


class TestHypothesisFuzz:
    def test_arbitrary_unicode_strings(self):
        """Property fuzz beyond the seeded corpus: any unicode string's
        staged-SQL hash equals the Python reference (which TestPythonVsSpark
        pins to Spark). One connection, one prepared chain, per-example
        substitution."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        con = duckdb.connect()
        con.execute("CREATE TABLE one(s VARCHAR)")
        ctes, fin = stages_to_ctes("b", xxh64_str_stage_cols("s", "_h"), "_t")
        sql = f"WITH b AS (SELECT s FROM one){ctes} SELECT _h FROM {fin}"

        @settings(max_examples=80, deadline=None)
        @given(st.text(max_size=120))
        def check(s: str) -> None:
            con.execute("DELETE FROM one")
            con.execute("INSERT INTO one VALUES (?)", [s])
            (h,) = con.execute(sql).fetchone()
            assert int(h) == xxh64_bytes(s.encode("utf-8")), repr(s)

        check()


class TestBucketPins:
    """Pin the INTERNAL hash values the sketch/dedup oracles rely on, not
    just their final outputs — a round-5 review found the Count-Min/Bloom
    oracles emulating ``xxhash64(xxhash64(tok), seed)`` instead of
    Spark's one-call ``xxhash64(tok, seed)`` while every fixture output
    still matched (min-over-seeds masked the bucket differences on a
    31-token vocabulary). Output-level parity cannot catch that class;
    these value-level pins do."""

    def test_count_min_buckets_match_spark(self, spark, sf_small):
        from ser_etl_spark.sources.parquet import load_table

        toks = (
            load_table(spark, sf_small, "documents")
            .select(
                F.explode(
                    F.split(F.trim(F.lower(F.col("text"))), " +")
                ).alias("tok")
            )
            .distinct()
        )
        rows = toks.select(
            "tok",
            *[
                F.pmod(F.xxhash64("tok", F.lit(s)), F.lit(2048)).alias(f"b{s}")
                for s in range(4)
            ],
        ).collect()
        assert rows
        for r in rows:
            u = xxh64_bytes(r["tok"].encode("utf-8"))
            for s in range(4):
                # one-call fold: string hash SEEDS the int hash directly
                assert r[f"b{s}"] == xxh64_int(s, u) % 2048

    def test_minhash_rehash_is_the_two_call_form(self, spark):
        """MinHash's ``xxhash64(xxhash64(sh), k)`` IS two calls — the
        string hash emerges as a signed long column and re-enters as an
        8-byte hashLong — unlike the one-call fold above."""
        df = spark.createDataFrame([("alpha beta",)], "s string")
        row = df.select(
            F.xxhash64(F.xxhash64("s"), F.lit(5)).alias("two_call"),
            F.xxhash64("s", F.lit(5)).alias("one_call"),
        ).first()
        u = xxh64_bytes(b"alpha beta")
        assert row["two_call"] == to_signed(xxh64_int(5, xxh64_long(u)))
        assert row["one_call"] == to_signed(xxh64_int(5, u))
        assert row["two_call"] != row["one_call"]


class TestPlaneMatrix:
    def test_python_planes_equal_spark_expression(self, spark):
        """The SRP hyperplanes are now computed driver-side from the
        pure-Python XXH64; they must stay bit-equal to the Spark SQL
        expression they historically came from (CAST(xxhash64(..) AS
        DOUBLE) / 2^63) — the LSH oracle bakes these literals in."""
        from ser_etl_spark.operators.similarity import EMB_DIM, _plane_matrix

        m = _plane_matrix(None, EMB_DIM, 4)
        denom = repr(float(2**63))
        flat = ",".join(
            f"CAST(xxhash64('plane:{p}:{i}') AS DOUBLE)/{denom}"
            for p in range(4)
            for i in range(EMB_DIM)
        )
        row = spark.range(1).select(F.expr(f"array({flat})").alias("m")).first()
        assert [float(x) for x in row["m"]] == [c for pl in m for c in pl]


class TestKnownVectors:
    """Frozen values so a refactor of BOTH re-implementations in the same
    direction still trips something."""

    def test_pinned(self):
        assert xxh64_long(0) == 13194218611613725804
        assert to_signed(xxh64_bytes(b"abc")) == 1423657621850124518
        assert xxh64_int(0) == xxh64_bytes(bytes(4))
        assert xxh64_long(1) == xxh64_bytes((1).to_bytes(8, "little"))
        # chain: the second hash is seeded by the first
        assert xxh64_chain([(3, "long"), (9, "long")]) == xxh64_long(
            9, xxh64_long(3)
        )

    def test_int_long_paths_differ(self):
        # 4-byte vs 8-byte path must NOT be conflated
        assert xxh64_int(7) != xxh64_long(7)
