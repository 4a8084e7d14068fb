"""Query registry: every implemented operator as a (builder, oracle) pair.

This is the engine's testable surface and the driver contract's backbone
(``__spark_entry__.queries()`` / ``oracle_sql()``): each named query has a
PySpark builder ``(spark, sf_dir) -> DataFrame`` and, where the semantics
are SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB runs
on identical Parquet — the same differential-oracle role DuckDB plays inside
the reference architecture (it *is* the reference's executor,
``/root/reference/api-service/src/query_engine.py:137``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    #: ANSI SQL DuckDB can run on the same parquet views; None => the
    #: operator is not SQL-expressible and gets a rows-only check.
    oracle: str | None
    description: str = ""
    #: SURVEY.md §2 operator ids this query covers (e.g. "B5", "A2").
    covers: tuple[str, ...] = field(default=())


#: name -> spec; populated by operator modules at import time.
REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    covers: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: add a query builder to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, covers)
        return fn

    return deco


#: Queries with a green CORRECTNESS row in a prior round (hash-pass or
#: rows-only for oracle-less ops). The driver verifies only the FIRST ~50
#: registry entries per round, so ``all_queries`` orders these LAST: the
#: verification window is spent on queries that still need a row — the 19
#: never-checked round-1 entries, the 2 round-1 hash failures (fixed, need
#: re-proof), and anything newly added this round.
VERIFIED_PRIOR_ROUNDS: frozenset[str] = frozenset({
    # round 1 (CORRECTNESS_r01.json)
    "shipping_priority", "local_supplier_volume", "top_returned_customers",
    "pricing_summary", "revenue_forecast", "order_priority_check",
    "promo_revenue", "large_orders", "idle_customers", "sales_rollup",
    "sales_cube", "window_topn_per_group", "window_running_total",
    "order_gap_stats", "moving_spend_90d", "text_stats", "lang_id",
    "quality_score", "fingerprint", "token_frequencies", "dedup_exact",
    "dedup_fingerprint", "ngram_jaccard_pairs",
    # "dedup_clusters" was green in r01 but its pair-generation switched
    # to the guarded path in r02 — back to the front for re-verification.
    "minhash_lsh_pairs", "simhash_pairs", "customer_order_distribution",
    "supplier_variety", "small_order_revenue", "disjunctive_revenue",
    "sole_returning_supplier", "top_supplier_revenue", "price_percentiles",
    "nation_trade_volume", "nation_market_share", "product_type_profit",
    "order_reconciliation", "multimodal_features", "pack_sequences",
    "select_all", "select_columns", "count_star", "summary_view",
    "group_by", "where_filter", "order_by", "top_k", "join_fact_dim",
})


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module and return the full registry.

    Order matters: unverified-first (see ``VERIFIED_PRIOR_ROUNDS``), then
    the already-verified tail in registration order.
    """
    # Imports are deferred so `import ser_etl_spark` stays cheap.
    from ser_etl_spark.operators import (  # noqa: F401
        analytics,
        curation,
        dedup,
        join_shapes,
        multimodal,
        packing,
        pipeline,
        profiling,
        ranges,
        relational,
        sampling,
        semistructured,
        setops,
        similarity,
        sketches,
        skew,
        statistics,
        streaming_bridge,
        temporal,
        text,
        timeseries,
    )

    pending = {n: s for n, s in REGISTRY.items() if n not in VERIFIED_PRIOR_ROUNDS}
    verified = {n: s for n, s in REGISTRY.items() if n in VERIFIED_PRIOR_ROUNDS}
    # Oracle-backed pending entries first: they get the strong
    # (rows+schema+value-hash) check, so they must not be crowded out of
    # the window by rows-only entries whose driver check is weaker than
    # the pytest invariants that already cover them.
    pending_oracle = {n: s for n, s in pending.items() if s.oracle is not None}
    pending_rows_only = {n: s for n, s in pending.items() if s.oracle is None}
    return {**pending_oracle, **pending_rows_only, **verified}
