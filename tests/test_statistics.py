"""Exact-moment statistics: formula sanity and partition invariance."""

from __future__ import annotations

from pyspark.sql import functions as F

from ser_etl_spark.operators.statistics import stats_moments
from ser_etl_spark.sources.parquet import load_table


def test_moments_agree_with_builtin_aggregates(spark, sf_small):
    """The decimal-exact formulas must agree with Spark's native
    stddev_samp/var_samp/corr to float tolerance (the natives are
    order-dependent in the last bits, which is why they aren't used)."""
    ours = {r["l_returnflag"]: r for r in stats_moments(spark, sf_small).collect()}
    native = {
        r["l_returnflag"]: r
        for r in load_table(spark, sf_small, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.avg("l_quantity").alias("mean_qty"),
            F.var_samp("l_quantity").alias("var_qty"),
            F.stddev_samp("l_quantity").alias("stddev_qty"),
            F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
        )
        .collect()
    }
    assert set(ours) == set(native)
    for flag, row in ours.items():
        for col in ("mean_qty", "var_qty", "stddev_qty", "corr_qty_price"):
            assert abs(row[col] - native[flag][col]) < 1e-6, (flag, col)


def test_moments_invariant_under_repartitioning(spark, sf_small):
    """Same answer at any parallelism — the whole point of decimal sums."""
    a = stats_moments(spark, sf_small).collect()
    li = load_table(spark, sf_small, "lineitem")
    from ser_etl_spark.operators.statistics import derive_stats, moment_columns

    shuffled = (
        li.repartition(13)
        .groupBy("l_returnflag")
        .agg(*moment_columns("l_quantity", "l_extendedprice"))
    )
    c = derive_stats(shuffled).orderBy("l_returnflag").collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in c]


def test_range_boundaries_honor_parts_argument(spark):
    """parts must flow into the rank-target arithmetic (r9 ADVICE: the
    f-strings hardcoded the module default, so any parts != 8 call
    silently returned 8-way targets). Checked against a serial
    equi-depth model for several part counts, with heavy-key ties."""
    from ser_etl_spark.operators.profiling import range_partition_boundaries

    rows = [(v,) for v in [1] * 5 + [2] * 1 + [3] * 7 + [5] * 3 + [9] * 4]
    df = spark.createDataFrame(rows, "k bigint")

    def model(parts):
        vals = sorted({v for (v,) in rows})
        cnt = {v: sum(1 for (x,) in rows if x == v) for v in vals}
        n = len(rows)
        out = []
        for p in range(1, parts + 1):
            target = (p * n + parts - 1) // parts
            prev = ((p - 1) * n + parts - 1) // parts
            cum = 0
            for v in vals:
                if cum < target <= cum + cnt[v]:
                    out.append((p, v, target - prev))
                    break
                cum += cnt[v]
        return out

    for parts in (1, 3, 8, 16):
        got = [
            (r["part_no"], r["upper_bound"], r["target_rows"])
            for r in range_partition_boundaries(df, "k", parts).collect()
        ]
        assert got == model(parts), (parts, got)
