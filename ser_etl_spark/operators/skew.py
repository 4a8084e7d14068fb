"""Skew-mitigated join: salting.

When a join key is heavily skewed (one customer with 10^9 orders), the
task holding the hot key becomes the straggler that defines job wall
clock. AQE's skew-join splitting handles sort-merge spills at runtime;
*salting* is the declarative form that also works for aggregations and
older planners:

- the big/skewed side gets a deterministic salt in ``[0, n)`` derived
  from non-key columns (``xxhash64`` — no randomness, so plans are
  reproducible and retries are safe);
- the other side is replicated n times, once per salt value;
- the join key becomes ``(key, salt)`` — the hot key's rows spread
  across n tasks instead of one.

Cost: n-fold replication of the smaller side — which is why ``n`` stays
small and the technique targets the "medium dimension, too big to
broadcast, joined to a skewed fact" regime.

The registered query proves semantic equivalence: the salted join
hash-matches the plain-join oracle exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.functions.numeric import dsum, sql_dsum
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

#: Join types for which salting is semantics-preserving. With
#: 'right'/'full_outer' the replicated right side emits each UNMATCHED
#: right row once per salt value (num_salts copies), so those are
#: rejected rather than silently wrong.
_SALTABLE_JOINS = frozenset({"inner", "left", "left_outer", "left_semi", "left_anti"})


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the left (skewed) side salted and the right side
    replicated ``num_salts`` times; result is row-identical to the
    unsalted join for ``how`` in ``_SALTABLE_JOINS`` (right/full outer
    joins would duplicate unmatched right rows and are refused)."""
    if how not in _SALTABLE_JOINS:
        raise ValueError(
            f"salted_join: how={how!r} is not semantics-preserving under "
            f"salting (unmatched right rows replicate {num_salts}x); "
            f"use one of {sorted(_SALTABLE_JOINS)}"
        )
    non_key = [c for c in left.columns if c not in on] or on
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in non_key]), F.lit(num_salts)
    ).cast("int")
    l_salted = left.withColumn("_salt", salt)
    r_replicated = right.withColumn(
        "_salt",
        F.explode(F.array(*[F.lit(i).cast("int") for i in range(num_salts)])),
    )
    return l_salted.join(r_replicated, on=[*on, "_salt"], how=how).drop("_salt")


@register(
    "salted_segment_sales",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS orders,
           {sql_dsum('o.o_totalprice', 2)} AS total_sales
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_mktsegment
    ORDER BY c.c_mktsegment
    """,
    description="skew-salted fact⋈dim join (8 salts, deterministic "
    "xxhash64 salt, dim replicated per salt) aggregated per segment — "
    "hash-matches the plain-join oracle, proving the rewrite is "
    "semantics-preserving",
    covers=("B11",),
)
def salted_segment_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_totalprice"
    )
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    joined = salted_join(o, c, on=["c_custkey"], num_salts=8)
    return (
        joined.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("orders"),
            dsum("o_totalprice", 2).alias("total_sales"),
        )
        .orderBy("c_mktsegment")
    )
