"""TPC-H partsupp-family join shapes (Q2 / Q11 / Q20) over a
deterministic synthesized cross-section.

The fixtures carry no ``partsupp`` table (TESTDATA.md), which blocked
the last 3 of the 22 TPC-H join shapes (COVERAGE.md §2.B). Rather than
leave the shapes uncovered, this module derives a partsupp
cross-section from ``part`` × supplier-count with pure integer
arithmetic — 4 suppliers per part at a fixed stride, cost/availability
from key-mixing — so Spark and the DuckDB oracle construct the SAME
rows independently and every query still gets the full
rows+schema+value-hash differential check. Costs are integer CENTS
(BIGINT): Q11's ``SUM(cost*qty)`` and its group-total threshold stay in
exact associative integer space, immune to double summation order.

Scale design (the shapes, not the synthesis, are the point):
- Q2's correlated-min subquery runs as a windowed min partitioned by
  part — one shuffle on the filtered candidate set, dims broadcast.
- Q11 aggregates per part, then compares against a broadcast 1-row
  scalar total (two aggregations over one shuffled exchange, AQE-reused)
  instead of a per-row correlated subquery.
- Q20's nested IN runs as chained semi-joins: the 1997 sold-quantity
  aggregate joins partsupp on (part, supp), and the qualifying suppkeys
  semi-join the supplier dim.

Reference parity: the reference's allow-pattern admits these query
shapes verbatim (``/root/reference/api-service/src/config.py:34``);
execution there is DuckDB's (``api-service/src/query_engine.py:137``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ser_etl_spark.functions.broadcast import broadcast_if_dim
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def synth_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic partsupp: 4 suppliers per part.

    ``ps_suppkey = (p_partkey + i*(n div 4)) % n + 1`` spreads each
    part's suppliers across the supplier table at a fixed stride;
    cost/availability mix the keys with small odd multipliers. All
    operands are non-negative, so ``pmod`` here and plain ``%`` in the
    oracle agree. The supplier count enters the plan as a broadcast
    1-row aggregate — no driver-side collect.
    """
    part = _t(spark, sf_dir, "part").select("p_partkey")
    n = _t(spark, sf_dir, "supplier").agg(F.count(F.lit(1)).alias("_n"))
    return (
        part.crossJoin(F.broadcast(n))
        .select(
            "p_partkey",
            "_n",
            F.explode(F.expr("sequence(0, 3)")).alias("_i"),
        )
        .select(
            F.col("p_partkey").alias("ps_partkey"),
            F.expr(
                "pmod(p_partkey + _i * greatest(1, _n div 4), _n) + 1"
            ).alias("ps_suppkey"),
            F.expr("pmod(p_partkey * 37 + _i * 101, 100000) + 1").alias(
                "ps_supplycost_cents"
            ),
            F.expr("pmod(p_partkey * 31 + _i * 7, 9999) + 1").alias(
                "ps_availqty"
            ),
        )
    )


#: Oracle-side twin of :func:`synth_partsupp` (DuckDB CTE). `//` is
#: floor division; all `%` operands are non-negative (matches pmod).
SQL_PARTSUPP = """
    ns AS (SELECT COUNT(*) AS _n FROM supplier),
    seq AS (SELECT unnest([0, 1, 2, 3]) AS _i),
    partsupp AS (
      SELECT p_partkey AS ps_partkey,
             (p_partkey + _i * greatest(1, _n // 4)) % _n + 1 AS ps_suppkey,
             (p_partkey * 37 + _i * 101) % 100000 + 1 AS ps_supplycost_cents,
             (p_partkey * 31 + _i * 7) % 9999 + 1 AS ps_availqty
      FROM part, ns, seq
    )
"""


@register(
    "min_cost_supplier",
    oracle=f"""
    WITH {SQL_PARTSUPP},
    cand AS (
      SELECT s.s_acctbal, s.s_name, n.n_name, ps.ps_partkey,
             ps.ps_supplycost_cents,
             MIN(ps.ps_supplycost_cents)
               OVER (PARTITION BY ps.ps_partkey) AS min_cents
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_size = 15
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      JOIN region r ON r.r_regionkey = n.n_regionkey AND r.r_name = 'ASIA'
    )
    SELECT s_acctbal, s_name, n_name,
           ps_partkey AS p_partkey,
           ps_supplycost_cents AS supply_cost_cents
    FROM cand WHERE ps_supplycost_cents = min_cents
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
    description="TPC-H Q2 shape: cheapest supplier per size-15 part "
    "within one region — correlated-min subquery as a windowed min over "
    "the part key (one shuffle on the filtered candidates, dims "
    "broadcast); partsupp synthesized deterministically (module "
    "docstring)",
    covers=("B11",),
)
def min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    part = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size") == 15)
        .select("p_partkey")
    )
    nation = _t(spark, sf_dir, "nation")
    region = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey")
        )
        .join(
            F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey")
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(broadcast_if_dim(part), F.col("ps_partkey") == F.col("p_partkey"))
        .join(broadcast_if_dim(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .select(
            "s_acctbal", "s_name", "n_name", "ps_partkey",
            "ps_supplycost_cents",
        )
    )
    w = Window.partitionBy("ps_partkey")
    return (
        cand.withColumn(
            "_min", F.min("ps_supplycost_cents").over(w)
        )
        .filter(F.col("ps_supplycost_cents") == F.col("_min"))
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("ps_partkey").alias("p_partkey"),
            F.col("ps_supplycost_cents").alias("supply_cost_cents"),
        )
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(100)
    )


@register(
    "important_stock",
    oracle=f"""
    WITH {SQL_PARTSUPP},
    scoped AS (
      SELECT ps.ps_partkey,
             ps.ps_supplycost_cents * ps.ps_availqty AS line_value
      FROM partsupp ps
      JOIN supplier s ON s.s_suppkey = ps.ps_suppkey
      JOIN nation n ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_7'
    ),
    grouped AS (
      SELECT ps_partkey, SUM(line_value) AS value_cents FROM scoped
      GROUP BY ps_partkey
    )
    SELECT ps_partkey, CAST(value_cents AS BIGINT) AS value_cents
    FROM grouped
    WHERE value_cents * 10000 > (SELECT SUM(value_cents) FROM grouped)
    ORDER BY value_cents DESC, ps_partkey
    """,
    description="TPC-H Q11 shape: per-part stock value within one "
    "nation, kept when above 1/10000 of the group total — exact integer "
    "cents arithmetic (associative, partitioning-independent); the "
    "threshold is a broadcast 1-row scalar over the same grouped "
    "exchange, not a per-row subquery",
    covers=("B11",),
)
def important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    supp = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(
                _t(spark, sf_dir, "nation").filter(
                    F.col("n_name") == "NATION_7"
                )
            ),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey")
    )
    grouped = (
        ps.join(broadcast_if_dim(supp), F.col("ps_suppkey") == F.col("s_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_supplycost_cents") * F.col("ps_availqty")
            ).alias("value_cents")
        )
    )
    total = grouped.agg(F.sum("value_cents").alias("_total"))
    return (
        grouped.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 10000 > F.col("_total"))
        .select("ps_partkey", "value_cents")
        .orderBy(F.col("value_cents").desc(), "ps_partkey")
    )


@register(
    "stocked_parts_promotion",
    oracle=f"""
    WITH {SQL_PARTSUPP},
    sold AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(l_quantity AS BIGINT)) AS sold_qty
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    ),
    qualifying AS (
      SELECT ps.ps_suppkey
      FROM partsupp ps
      JOIN part p ON p.p_partkey = ps.ps_partkey AND p.p_name LIKE 'red%'
      JOIN sold ON sold.l_partkey = ps.ps_partkey
               AND sold.l_suppkey = ps.ps_suppkey
      WHERE 2 * ps.ps_availqty > sold.sold_qty
    )
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    JOIN nation n ON n.n_nationkey = s.s_nationkey
    WHERE n.n_name = 'NATION_3'
      AND s.s_suppkey IN (SELECT ps_suppkey FROM qualifying)
    ORDER BY s_name
    """,
    description="TPC-H Q20 shape: suppliers in one nation whose stock "
    "of 'red' parts exceeds half their 1997 sales of that part — nested "
    "IN as chained semi-joins (sold-quantity pre-aggregated per "
    "(part,supp) BEFORE joining, so the shuffle carries one row per "
    "pair); quantities summed as BIGINT for engine-exact comparison",
    covers=("B11",),
)
def stocked_parts_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ps = synth_partsupp(spark, sf_dir)
    red_parts = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    sold = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("sold_qty"))
    )
    qualifying = (
        ps.join(
            broadcast_if_dim(red_parts), F.col("ps_partkey") == F.col("p_partkey")
        )
        .join(
            sold,
            (F.col("ps_partkey") == F.col("l_partkey"))
            & (F.col("ps_suppkey") == F.col("l_suppkey")),
        )
        .filter(2 * F.col("ps_availqty") > F.col("sold_qty"))
        .select("ps_suppkey")
    )
    nation = _t(spark, sf_dir, "nation").filter(
        F.col("n_name") == "NATION_3"
    )
    return (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(
            qualifying,
            F.col("s_suppkey") == F.col("ps_suppkey"),
            "left_semi",
        )
        .select("s_suppkey", "s_name")
        .orderBy("s_name")
    )


# ---------------------------------------------------------------------------
# inventory turnover: fact-to-fact revenue/stock ratio top-k (r9)
# ---------------------------------------------------------------------------


@register(
    "inventory_turnover_topk",
    oracle=f"""
    WITH {SQL_PARTSUPP},
    rev AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             SUM(CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT))
               AS rev_cents,
             CAST(COUNT(*) AS BIGINT) AS n_lines
      FROM lineitem GROUP BY 1, 2
    )
    SELECT p.ps_partkey, p.ps_suppkey,
           CAST(r.rev_cents AS BIGINT) AS rev_cents, r.n_lines,
           CAST(p.ps_availqty AS BIGINT) AS availqty,
           CAST(r.rev_cents // p.ps_availqty AS BIGINT)
             AS turnover_cents_per_unit
    FROM rev r JOIN partsupp p USING (ps_partkey, ps_suppkey)
    ORDER BY turnover_cents_per_unit DESC, ps_partkey ASC, ps_suppkey ASC
    LIMIT 20
    """,
    description="inventory turnover: per (part, supplier) revenue per "
    "stocked unit (exact integer cents div availqty) over the "
    "lineitem-to-partsupp FACT-TO-FACT equi-join on the composite key — "
    "the shape bucketed storage makes shuffle-free — TakeOrdered top-20",
    covers=("B11", "B8"),
)
def inventory_turnover_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per stocked unit, top 20 (part, supplier) pairs.

    Plan shape: lineitem aggregates map-side onto its natural
    (partkey, suppkey) key, then equi-joins the synthesized partsupp on
    the same composite key — at production scale both sides are
    bucketed on (partkey, suppkey) (`etl/build.py` TableLayout
    bucket_by), making this the zero-Exchange fact-to-fact join
    test_plans pins for bucketed tables. Arithmetic is exact integer
    cents with integer division, TakeOrdered for the top-k."""
    li = _t(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy(
            F.col("l_partkey").alias("ps_partkey"),
            F.col("l_suppkey").alias("ps_suppkey"),
        )
        .agg(
            F.sum(
                F.expr("CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)")
            ).alias("rev_cents"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )
    ps = synth_partsupp(spark, sf_dir)
    return (
        rev.join(ps, ["ps_partkey", "ps_suppkey"])
        .select(
            "ps_partkey",
            "ps_suppkey",
            F.col("rev_cents").cast("bigint").alias("rev_cents"),
            "n_lines",
            F.col("ps_availqty").cast("bigint").alias("availqty"),
            F.expr("rev_cents div ps_availqty")
            .cast("bigint")
            .alias("turnover_cents_per_unit"),
        )
        .orderBy(
            F.col("turnover_cents_per_unit").desc(),
            F.col("ps_partkey").asc(),
            F.col("ps_suppkey").asc(),
        )
        .limit(20)
    )
