"""Range / interval joins: banded non-equi join and reshaping (unpivot).

The reference's loose allow-pattern (``/root/reference/api-service/src/
config.py:33-36``) admits arbitrary SELECTs, including non-equi joins —
DuckDB executes them with its IEJoin; Spark has no special inequality-join
operator, so the engine must *choose a strategy*:

- **Small band table** (the overwhelmingly common case — tax brackets,
  price bands, SLA tiers): broadcast it. The plan is a
  BroadcastNestedLoopJoin, which sounds scary but is linear — each fact
  row scans K bands in-core with zero shuffle; for K in the tens this is
  cheaper than any shuffle-based scheme at any fact size.
- **Large-large interval joins**: decompose into an equi-join on a
  coarse bucket key (``floor(value / bucket_width)``, intervals exploded
  to every bucket they overlap) + residual predicate — turning the
  inequality into a co-partitionable key. That variant is
  :func:`bucketed_range_join`.

The registered query uses the broadcast strategy (bands are always
small); the bucketed strategy is exercised by unit tests against the
broadcast result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.functions.numeric import dsum, sql_dsum
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

#: (label, lo, hi) — hi exclusive; None = open end. Chosen to straddle the
#: events.value distribution so every band is non-empty at sf >= 0.01.
VALUE_BANDS: tuple[tuple[str, float | None, float | None], ...] = (
    ("p0_micro", None, 5.0),
    ("p1_small", 5.0, 25.0),
    ("p2_mid", 25.0, 100.0),
    ("p3_large", 100.0, 250.0),
    ("p4_whale", 250.0, None),
)


def bands_df(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(
        [(label, lo, hi) for label, lo, hi in VALUE_BANDS],
        "band string, lo double, hi double",
    )


def band_join(facts: DataFrame, bands: DataFrame, value_col: str) -> DataFrame:
    """Attach the containing band to every fact row: broadcast non-equi
    join ``lo <= value < hi`` with NULL-open endpoints."""
    v = F.col(value_col)
    cond = (F.col("lo").isNull() | (v >= F.col("lo"))) & (
        F.col("hi").isNull() | (v < F.col("hi"))
    )
    return facts.join(F.broadcast(bands), cond, "left")


def bucketed_range_join(
    facts: DataFrame,
    bands: DataFrame,
    value_col: str,
    bucket_width: float,
    value_span: tuple[float, float],
) -> DataFrame:
    """The large-large strategy: equi-join on a coarse bucket key.

    Each interval is exploded to every bucket it overlaps (``sequence``
    over bucket ids — interval span / bucket_width rows each); facts map
    to exactly one bucket. The join becomes a plain shuffled equi-join
    on ``_bucket`` plus the residual range predicate — co-partitionable,
    AQE-skew-splittable, no broadcast needed. ``value_span`` clamps
    open-ended intervals to the data's observed domain (at scale this
    comes from column min/max statistics, not a data pass).
    """
    lo_clamped = F.coalesce(F.col("lo"), F.lit(value_span[0]))
    # hi is exclusive; clamp to just past the max so floor() lands in range
    hi_clamped = F.coalesce(F.col("hi"), F.lit(value_span[1]))
    b = bands.withColumn(
        "_bucket",
        F.explode(
            F.sequence(
                F.floor(lo_clamped / bucket_width).cast("long"),
                F.floor((hi_clamped - F.lit(1e-9)) / bucket_width).cast("long"),
            )
        ),
    )
    v = F.col(value_col)
    f = facts.withColumn("_bucket", F.floor(v / bucket_width).cast("long"))
    cond = (F.col("lo").isNull() | (v >= F.col("lo"))) & (
        F.col("hi").isNull() | (v < F.col("hi"))
    )
    return (
        f.join(b, "_bucket", "inner")
        .filter(cond)
        .drop("_bucket")
    )


def _bands_values_sql() -> str:
    rows = ", ".join(
        f"('{label}', {('NULL' if lo is None else lo)}, "
        f"{('NULL' if hi is None else hi)})"
        for label, lo, hi in VALUE_BANDS
    )
    return f"(VALUES {rows}) AS b(band, lo, hi)"


@register(
    "value_band_join",
    oracle=f"""
    SELECT b.band,
           COUNT(e.event_id) AS events,
           {sql_dsum('e.value', 4)} AS total_value
    FROM events e
    JOIN {_bands_values_sql()}
      ON (b.lo IS NULL OR e.value >= b.lo)
     AND (b.hi IS NULL OR e.value < b.hi)
    GROUP BY b.band
    ORDER BY b.band
    """,
    description="non-equi banded range join: every event matched to its "
    "containing value band via a broadcast nested-loop join (linear — K "
    "bands scanned in-core per row, zero shuffle on the fact side), then "
    "aggregated per band; the large-large fallback is the bucketed "
    "equi-join decomposition (bucketed_range_join, test-verified)",
    covers=("B11", "B6"),
)
def value_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_id", "value")
    joined = band_join(ev, bands_df(spark), "value")
    return (
        joined.groupBy("band")
        .agg(
            F.count("event_id").alias("events"),
            dsum("value", 4).alias("total_value"),
        )
        .orderBy("band")
    )


@register(
    "measures_unpivot",
    oracle=f"""
    SELECT m.measure,
           COUNT(*) AS n,
           {sql_dsum('m.value', 2)} AS total
    FROM (
      SELECT 'extendedprice' AS measure, l_extendedprice AS value FROM lineitem
      UNION ALL SELECT 'quantity', l_quantity FROM lineitem
      UNION ALL SELECT 'tax', l_tax FROM lineitem
    ) m
    GROUP BY m.measure
    ORDER BY m.measure
    """,
    description="unpivot (wide measures -> long key/value rows) via the "
    "built-in stack() expression — a narrow projection, no shuffle until "
    "the aggregate; the relational inverse of event_value_pivot",
    covers=("B2", "B5"),
)
def measures_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    long = li.select(
        F.expr(
            "stack(3, 'extendedprice', l_extendedprice, "
            "'quantity', l_quantity, 'tax', l_tax) AS (measure, value)"
        )
    )
    return (
        long.groupBy("measure")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 2).alias("total"),
        )
        .orderBy("measure")
    )
