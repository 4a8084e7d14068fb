"""Approximate aggregation sketches.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are
shuffle-every-value operations; the standard OLAP answer is sketches:
HyperLogLog++ for distinct counts and a quantile summary for
percentiles — both built into Spark, both mergeable map-side, so the
shuffle carries fixed-size sketch state instead of values.

Sketch outputs are engine-specific (Spark's HLL++ and DuckDB's HLL give
different estimates for the same data), so these register as rows-only
queries; tests bound the estimates against the exact answers instead of
an oracle hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def approx_distinct(
    df: DataFrame, col: str, rsd: float = 0.01
) -> DataFrame:
    """HyperLogLog++ distinct-count estimate (relative std dev ``rsd``)."""
    return df.agg(F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct"))


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """Approximate percentiles via Spark's quantile summary sketch."""
    return df.agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles")
    )


@register(
    "approx_sketches",
    oracle=None,  # HLL/quantile estimates are engine-specific;
    # tests bound them against exact answers
    description="HLL++ distinct orderkeys + approximate price percentiles "
    "over lineitem — mergeable fixed-size sketch state instead of "
    "shuffling values (the 100 TB form of COUNT DISTINCT / percentile)",
    covers=("B4",),
)
def approx_sketches_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias(
            "approx_orders"
        ),
        F.percentile_approx(
            "l_extendedprice", [0.5, 0.95, 0.99], 10000
        ).alias("price_quantiles"),
    )
