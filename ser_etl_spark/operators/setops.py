"""Set operations — an extension beyond the reference's blocked surface.

The reference explicitly blocks ``UNION`` at the gateway
(``/root/reference/shared/schemas/query_whitelist.json:52-69``), so set
operations are *rejections* on the compatibility surface
(``gateway/validator.py`` preserves that); this module provides
INTERSECT / EXCEPT as engine extensions for callers who opt out of the
reference whitelist.

Scale design: Spark plans both as a single hash aggregation over the
union of tagged sides (no sort), shuffling only the distinct key set —
the inputs here are pre-projected to the key column so the shuffle rows
are minimal.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def _buyers(spark: SparkSession, sf_dir: str, year: int) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate")
             >= F.lit(f"{year}-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("o_orderdate")
               < F.lit(f"{year + 1}-01-01 00:00:00").cast("timestamp_ntz"))
        )
        .select(F.col("o_custkey").alias("custkey"))
    )


@register(
    "repeat_buyers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    INTERSECT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
    description="extension: INTERSECT — customers who ordered in both "
    "1996 and 1997; distinct-set semantics, planned as one hash "
    "aggregation over pre-projected keys",
    covers=("X-setop",),
)
def repeat_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir, 1996).intersect(
        _buyers(spark, sf_dir, 1997)
    )


@register(
    "churned_buyers",
    oracle="""
    SELECT o_custkey AS custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    EXCEPT
    SELECT o_custkey FROM orders
    WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    """,
    description="extension: EXCEPT — customers who ordered in 1996 but "
    "not in 1997 (distinct-set difference)",
    covers=("X-setop",),
)
def churned_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _buyers(spark, sf_dir, 1996).subtract(_buyers(spark, sf_dir, 1997))


@register(
    "matched_order_counts",
    oracle="""
    SELECT custkey, COUNT(*) AS matched_orders
    FROM (
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      INTERSECT ALL
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY custkey
    ORDER BY custkey
    """,
    description="extension: INTERSECT ALL (bag semantics) — each customer "
    "kept min(orders_1996, orders_1997) times, i.e. the year-over-year "
    "matched order count; Spark plans multiset intersection as one "
    "count-tagged hash aggregate, no sort, no join",
    covers=("X-setop",),
)
def matched_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    matched = _buyers(spark, sf_dir, 1996).intersectAll(
        _buyers(spark, sf_dir, 1997)
    )
    return (
        matched.groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("matched_orders"))
        .orderBy("custkey")
    )


@register(
    "excess_order_counts",
    oracle="""
    SELECT custkey, COUNT(*) AS excess_orders
    FROM (
      SELECT o_custkey AS custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
      EXCEPT ALL
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY custkey
    ORDER BY custkey
    """,
    description="extension: EXCEPT ALL (bag semantics) — each customer "
    "kept max(0, orders_1996 - orders_1997) times: how many more orders "
    "they placed in 1996 than 1997; multiset difference as one hash "
    "aggregate",
    covers=("X-setop",),
)
def excess_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    excess = _buyers(spark, sf_dir, 1996).exceptAll(
        _buyers(spark, sf_dir, 1997)
    )
    return (
        excess.groupBy("custkey")
        .agg(F.count(F.lit(1)).alias("excess_orders"))
        .orderBy("custkey")
    )
