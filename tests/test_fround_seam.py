"""Round-half-tie seam suite (r10 audit — see ROUNDING_AUDIT.md).

``round(double, d)`` diverges across engines at decimal half-ties: Spark
rounds HALF_UP on the shortest decimal string, DuckDB rounds the binary
value. Every converted site now goes through ``fround`` (Spark) /
``sql_fround`` (oracle) — ``floor(x * 10^d + 0.5) / 10^d`` in pure IEEE
binary — or exact-integer basis points. This suite pins:

1. the tie battery: fround == DuckDB floor-form == the serial model on
   crafted tie values at every scale in use (4, 6, 9);
2. that the OLD ``round`` genuinely diverges on that battery (the seam
   is real, not hypothetical);
3. the scale-0 coincidence: ``round(x)``-to-integer agrees across
   engines even on exact dyadic halves, which is why quantization
   sites were left as ``round``;
4. end-to-end crafted ties through representative converted builders.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from pyspark.sql import functions as F

from ser_etl_spark.functions.numeric import fround, sql_fround

# Tie values: non-dyadic d+1-place decimals ending in 5 (shortest repr
# claims an exact half; the binary value sits a hair off it) plus exact
# dyadic halves and plain non-tie controls.
TIE_VALUES = [
    0.07125,      # 57/800: live Spark-vs-DuckDB round divergence (see below)
    -0.07125,
    -3.94875,     # the r9 winsorized counterexample (sum -3159 / n=8 / 100)
    3.94875,
    0.00005,
    -0.00005,
    1.23455,
    0.031250,     # exact dyadic: 1/32 terminates at 5 places ending in 5
    -0.031250,
    0.1234565,    # 7-place tie for d=6
    -0.1234565,
    2.5e-10 * 2,  # 5e-10: 10-place tie for d=9
    0.1,          # controls
    -7.25,
    123.456789,
    0.0,
]


def _serial_fround(x: float, d: int) -> float:
    """The serial model of fround: same IEEE ops via Python floats."""
    s = float(10**d)
    return math.floor(x * s + 0.5) / s


@pytest.mark.parametrize("d", [4, 6, 9])
def test_fround_tie_battery_cross_engine(spark, d):
    """fround (Spark) == sql_fround (DuckDB) == serial model, on every
    battery value including exact decimal halves."""
    df = spark.createDataFrame([(i, v) for i, v in enumerate(TIE_VALUES)],
                               "i int, x double")
    got = {
        r["i"]: r["y"]
        for r in df.select("i", fround(F.col("x"), d).alias("y")).collect()
    }
    con = duckdb.connect()
    for i, v in enumerate(TIE_VALUES):
        duck = con.execute(
            f"SELECT {sql_fround('CAST(? AS DOUBLE)', d)}", [v]
        ).fetchone()[0]
        serial = _serial_fround(v, d)
        assert got[i] == duck == serial, (v, d, got[i], duck, serial)


def test_old_round_diverges_on_battery():
    """The seam is real, in BOTH directions fround closes:

    - engine vs engine: round(0.07125, 4) = 0.0713 on Spark (string
      HALF_UP: the repr says ...5) but 0.0712 on DuckDB (0.07125*1e4
      correctly rounds to 712.4999..., below the half). 0.07125 is
      57/800 — exactly the counts/cents integer-ratio class.
    - engine vs serial model: round(-3.94875, 4) = -3.9488 on both
      engines but -3.9487 under Python's value round — the r9
      hypothesis failure in winsorized_stats."""
    con = duckdb.connect()
    duck = con.execute(
        "SELECT round(CAST(0.07125 AS DOUBLE), 4)"
    ).fetchone()[0]
    assert duck == 0.0712, duck  # Spark says 0.0713 (pinned below)
    duck2 = con.execute(
        "SELECT round(CAST(-3.94875 AS DOUBLE), 4)"
    ).fetchone()[0]
    assert duck2 == -3.9488 and round(-3.94875, 4) == -3.9487


def test_spark_round_string_semantics(spark):
    """Pin Spark's half-tie behavior so a future Spark change that
    silently fixes/changes it is caught: string-HALF_UP rounds the
    repr-tie UP even when the binary value is below the half."""
    row = spark.sql(
        "SELECT round(CAST(-3.94875 AS DOUBLE), 4) AS a,"
        "       round(CAST(0.07125 AS DOUBLE), 4) AS b"
    ).collect()
    assert row[0]["a"] == -3.9488
    assert row[0]["b"] == 0.0713  # DuckDB says 0.0712 — the live seam


def test_scale0_round_agrees_on_halves(spark):
    """Why quantization sites stayed `round`: at scale 0 a shortest repr
    can only claim a half if the value IS the dyadic half-integer, and
    on those both engines round away from zero — no divergent input."""
    vals = [0.5, -0.5, 2.5, -2.5, 1234.5, -1234.5, 3.5, 1e15 + 0.5]
    df = spark.createDataFrame([(i, v) for i, v in enumerate(vals)],
                               "i int, x double")
    got = {
        r["i"]: r["y"]
        for r in df.select(
            "i", F.round(F.col("x"), 0).cast("long").alias("y")
        ).collect()
    }
    con = duckdb.connect()
    for i, v in enumerate(vals):
        duck = con.execute(
            "SELECT CAST(round(CAST(? AS DOUBLE)) AS BIGINT)", [v]
        ).fetchone()[0]
        assert got[i] == duck, (v, got[i], duck)


# ---------------------------------------------------------------------------
# end-to-end crafted ties through representative converted builders
# ---------------------------------------------------------------------------


def _duck_tables(con, **tables):
    for name, (cols, rows) in tables.items():
        con.execute(f"CREATE TABLE {name} ({cols})")
        ph = ",".join("?" * len(rows[0])) if rows else ""
        for row in rows:
            con.execute(f"INSERT INTO {name} VALUES ({ph})", list(row))


def test_boilerplate_tie_end_to_end(spark):
    """boilerplate_scores on a corpus crafted so one doc's
    n_common/n_shingles = 3159/8000 = 0.394875 — the non-dyadic
    5th-place half class where the old round diverged. The Spark
    builder and a DuckDB replay of the converted floor form must agree
    exactly."""
    from ser_etl_spark.operators.curation import OVERLAP_N, boilerplate_scores

    n = OVERLAP_N
    # doc0: a shared prefix holding exactly 3159 shingles (3159+n-1
    # words) followed by 4841 fresh words — total words 8000+n-1, so
    # exactly 8000 distinct shingles, of which the 3159 fully inside
    # the shared prefix also appear in doc1 (df=2; min_df=2 below).
    shared = " ".join(f"c{i}" for i in range(3159 + n - 1))
    uniq0 = " ".join(f"u{i}" for i in range(4841))
    doc0 = shared + " " + uniq0
    doc1 = shared + " " + " ".join(f"w{i}" for i in range(10))
    df = spark.createDataFrame(
        [(0, "s", doc0), (1, "s", doc1)],
        "doc_id bigint, source string, text string",
    )
    res = {
        r["doc_id"]: r
        for r in boilerplate_scores(df, n=n, min_df=2).collect()
    }
    r0 = res[0]
    assert r0["n_shingles"] == 8000 and r0["n_common"] == 3159
    ratio = r0["n_common"] / r0["n_shingles"]
    got = r0["boilerplate_score"]
    assert got == _serial_fround(ratio, 4)
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {sql_fround('CAST(? AS BIGINT) / CAST(? AS DOUBLE)', 4)}",
        [r0["n_common"], r0["n_shingles"]],
    ).fetchone()[0]
    assert got == duck


def test_minhash_est_tie_value():
    """minhash_error_eval's est_jaccard = matches/64: 2/64 = 0.03125 is
    an exact dyadic 5th-place half — fround and DuckDB agree on it
    (floor form rounds it up to 0.0313 on both)."""
    con = duckdb.connect()
    duck = con.execute(
        f"SELECT {sql_fround('2.0 / 64.0', 4)}"
    ).fetchone()[0]
    assert duck == _serial_fround(2.0 / 64.0, 4) == 0.0313


# ---------------------------------------------------------------------------
# r11: the float-cosine presentation class (ROUNDING_AUDIT sites 34-43)
# ---------------------------------------------------------------------------

#: Adversarial embedding (float32-exact components): with query
#: a = [1, 0, 0] and the engines' exact op order
#: (dot = b0; norm = sqrt((b0^2 + b2^2) + b3^2); q = dot / (1.0 * norm))
#: the computed cosine is EXACTLY the double 0.07125 — a 5th-place
#: decimal tie where Spark's string-HALF_UP round(x, 4) gives 0.0713 and
#: DuckDB's binary round gives 0.0712. Found by tuning b3 (the fine
#: knob: float32 granularity of b3^2 lands several candidates per
#: double-ulp of the norm's radicand).
_ADV_B = [0.07158000022172928, 1.0020782947540283, 0.00010208920139120892]
_ADV_Q = [1.0, 0.0, 0.0]


def test_adversarial_cosine_corpus(spark, tmp_path):
    """The r10 audit deferred the float-cosine round(x, 4) sites on a
    "ties unreachable except by adversarial construction" argument.
    This test IS that construction: a float32 corpus whose cosine lands
    exactly on a divergent tie double — the OLD round(x, 4) provably
    disagrees across engines on it, and the r11 floor-form presentation
    (_present_round / _duck_f) agrees bit-exactly on every row,
    degenerate rows (NaN element, zero norm) included."""
    import numpy as np

    from ser_etl_spark.operators.similarity import (
        _dot_lit_sql,
        _duck_dot,
        _duck_f,
        _duck_norm,
        _norm_sql,
        _present_round,
        _pynorm,
    )

    # preconditions: components are float32-exact and the serial replay
    # of the engines' op order hits the tie double with repr "0.07125"
    for v in _ADV_B:
        assert float(np.float32(v)) == v
    b0, b2, b3 = _ADV_B
    s = (b0 * b0 + b2 * b2) + b3 * b3
    q_serial = b0 / (1.0 * math.sqrt(s))
    assert repr(q_serial) == "0.07125"

    rows = [
        (0, _ADV_B, 0),            # the tie row
        (1, [float("nan"), 1.0, 0.0], 0),   # NaN cosine
        (2, [0.0, 0.0, 0.0], 0),   # zero norm -> NULL via nullif
        (3, [0.25, -0.5, 1.0], 0),  # plain control
    ]
    from tests.test_edge_vectors_parity import _write_embeddings

    path = str(tmp_path / "adv.parquet")
    _write_embeddings(path, rows)

    dim = 3
    raw = (
        f"{_dot_lit_sql('embedding', _ADV_Q)}"
        f" / nullif(({_norm_sql('embedding', dim)})"
        f" * ({_pynorm(_ADV_Q)!r}), 0.0D)"
    )
    df = spark.read.parquet(path)
    barrier = F.monotonically_increasing_id() * F.lit(0)
    got = {
        r["vec_id"]: (r["old"], r["new"])
        for r in df.select(
            "vec_id",
            F.expr(f"round({raw}, 4)").alias("old"),
            (F.expr(raw) + barrier).alias("_rcs"),
        )
        .select(
            "vec_id", "old", _present_round(F.col("_rcs"), 4).alias("new")
        )
        .collect()
    }

    con = duckdb.connect()
    qlit = "[" + ", ".join(repr(v) for v in _ADV_Q) + "]::DOUBLE[]"
    raw_d = (
        f"{_duck_dot('embedding', qlit, dim)}"
        f" / nullif({_duck_norm('embedding', dim)}"
        f" * {_duck_norm(qlit, dim)}, 0.0)"
    )
    duck = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            f"SELECT vec_id, round({raw_d}, 4), {_duck_f(raw_d, 4)} "
            f"FROM read_parquet('{path}') ORDER BY vec_id"
        ).fetchall()
    }

    # 1. the OLD round is a LIVE cross-engine divergence on the tie row
    assert got[0][0] == 0.0713 and duck[0][0] == 0.0712, (got[0], duck[0])
    # 2. the floor form agrees everywhere, NaN/NULL rows included
    for vid in (0, 1, 2, 3):
        s_new, d_new = got[vid][1], duck[vid][1]
        if s_new is None or d_new is None:
            assert s_new is None and d_new is None, (vid, s_new, d_new)
        elif math.isnan(s_new) or (
            isinstance(d_new, float) and math.isnan(d_new)
        ):
            assert math.isnan(s_new) and math.isnan(d_new), (vid, s_new, d_new)
        else:
            assert s_new == d_new, (vid, s_new, d_new)
    # and the tie row's floor form follows the BINARY value (which sits
    # just below the decimal tie — fl(q*1e4 + 0.5) stays under 713) on
    # BOTH engines: the answer is deterministic, not split
    assert got[0][1] == duck[0][1] == 0.0712


def test_present_round_sql_twin_matches_column_form(spark, tmp_path):
    """_present_round_sql is a hand-maintained SQL-text twin of
    _present_round (the batched-selectExpr E-step discipline); silent
    drift in one form would diverge the E-step rounding from every
    other call site without a targeted failure (ADVICE r14 #3). Run
    BOTH forms over the adversarial tie corpus (the exact-tie row, a
    NaN cosine, a zero-norm NULL and a control) plus explicit NaN/Inf/
    NULL operand probes, and assert the results are bit-identical row
    for row."""
    from ser_etl_spark.operators.similarity import (
        _dot_lit_sql,
        _norm_sql,
        _present_round,
        _present_round_sql,
        _pynorm,
    )

    rows = [
        (0, _ADV_B, 0),                     # the exact decimal tie
        (1, [float("nan"), 1.0, 0.0], 0),   # NaN cosine passthrough
        (2, [0.0, 0.0, 0.0], 0),            # zero norm -> NULL
        (3, [0.25, -0.5, 1.0], 0),          # plain control
    ]
    from tests.test_edge_vectors_parity import _write_embeddings

    path = str(tmp_path / "twin.parquet")
    _write_embeddings(path, rows)
    raw = (
        f"{_dot_lit_sql('embedding', _ADV_Q)}"
        f" / nullif(({_norm_sql('embedding', 3)})"
        f" * ({_pynorm(_ADV_Q)!r}), 0.0D)"
    )
    barrier = F.monotonically_increasing_id() * F.lit(0)
    base = spark.read.parquet(path).select(
        "vec_id", (F.expr(raw) + barrier).alias("_rcs")
    )
    got = base.select(
        "vec_id",
        _present_round(F.col("_rcs"), 4).alias("col_form"),
        F.expr(_present_round_sql("_rcs", 4)).alias("sql_form"),
    ).collect()
    assert len(got) == len(rows)
    for r in got:
        a, b = r["col_form"], r["sql_form"]
        if a is None or b is None:
            assert a is None and b is None, r
        elif math.isnan(a) or math.isnan(b):
            assert math.isnan(a) and math.isnan(b), r
        else:
            assert a == b, r

    # operand probes the corpus can't produce: literal Inf/-Inf pass
    # through unrounded in BOTH forms
    probe = spark.range(1).select(
        F.expr("CAST('Infinity' AS DOUBLE)").alias("p"),
        F.expr("CAST('-Infinity' AS DOUBLE)").alias("n"),
    )
    row = probe.select(
        _present_round(F.col("p"), 4).alias("cp"),
        F.expr(_present_round_sql("p", 4)).alias("sp"),
        _present_round(F.col("n"), 4).alias("cn"),
        F.expr(_present_round_sql("n", 4)).alias("sn"),
    ).collect()[0]
    assert row["cp"] == row["sp"] == float("inf"), row
    assert row["cn"] == row["sn"] == float("-inf"), row

    # and the OPTIMIZED expression trees themselves must match (catches
    # a drift that happens to agree on these probes; optimized, not
    # analyzed — constant folding normalizes the SQL form's
    # CAST('Infinity' AS DOUBLE) to the Column form's double literal)
    col_plan = base.select(
        _present_round(F.col("_rcs"), 4).alias("x")
    )._jdf.queryExecution().optimizedPlan().toString()
    sql_plan = base.select(
        F.expr(_present_round_sql("_rcs", 4)).alias("x")
    )._jdf.queryExecution().optimizedPlan().toString()
    import re as _re

    def _norm(p):
        return _re.sub(r"#\d+", "#", p)

    assert _norm(col_plan) == _norm(sql_plan), (col_plan, sql_plan)
