"""Range-join strategies and reshaping: semantics + plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from ser_etl_spark.operators.ranges import (
    band_join,
    bands_df,
    bucketed_range_join,
)
from ser_etl_spark.session import explain_string
from ser_etl_spark.sources.parquet import load_table


class TestBandJoin:
    def test_every_event_lands_in_exactly_one_band(self, spark, sf_small):
        ev = load_table(spark, sf_small, "events").select("event_id", "value")
        joined = band_join(ev, bands_df(spark), "value")
        assert joined.count() == ev.count()
        assert joined.filter(F.col("band").isNull()).count() == 0

    def test_broadcast_nested_loop_plan(self, spark, sf_small):
        """The small-bands strategy must be a broadcast non-equi join —
        no shuffle of the fact side, no cartesian product."""
        ev = load_table(spark, sf_small, "events").select("event_id", "value")
        plan = explain_string(band_join(ev, bands_df(spark), "value"))
        assert "BroadcastNestedLoopJoin" in plan, plan
        assert "CartesianProduct" not in plan, plan

    def test_bucketed_strategy_matches_broadcast_strategy(self, spark, sf_small):
        """The large-large decomposition (equi-join on coarse bucket +
        residual predicate) returns the identical row set."""
        ev = load_table(spark, sf_small, "events").select("event_id", "value")
        bands = bands_df(spark)
        span = ev.agg(F.min("value"), F.max("value")).first()
        lo, hi = float(span[0]), float(span[1]) + 1.0
        via_broadcast = {
            (r["event_id"], r["band"])
            for r in band_join(ev, bands, "value").collect()
        }
        via_buckets = {
            (r["event_id"], r["band"])
            for r in bucketed_range_join(
                ev, bands, "value", bucket_width=50.0, value_span=(lo, hi)
            ).collect()
        }
        assert via_buckets == via_broadcast

    def test_bucketed_strategy_is_equi_join(self, spark, sf_small):
        """The decomposition's point is a shuffled equi-join, not a
        nested-loop: the plan must contain a hash/merge join."""
        ev = load_table(spark, sf_small, "events").select("event_id", "value")
        plan = explain_string(
            bucketed_range_join(
                ev, bands_df(spark), "value",
                bucket_width=50.0, value_span=(0.0, 1000.0),
            )
        )
        assert "BroadcastNestedLoopJoin" not in plan, plan
        assert "Join" in plan, plan


class TestUnpivot:
    def test_stack_rows_triple_the_input(self, spark, sf_small):
        li = load_table(spark, sf_small, "lineitem")
        long = li.select(
            F.expr(
                "stack(3, 'extendedprice', l_extendedprice, "
                "'quantity', l_quantity, 'tax', l_tax) AS (measure, value)"
            )
        )
        assert long.count() == 3 * li.count()
