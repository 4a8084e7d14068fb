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

import hashlib
import inspect
import textwrap
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
#: verification window is spent on queries that still need a row. Regenerated
#: each round by ``scripts/update_verified.py --write`` from
#: CORRECTNESS_r*.json — the block between the BEGIN/END markers below,
#: including the per-round curation note, is GENERATED (VERDICT r12 #2:
#: the pending count is recomputed and asserted by the script, never
#: hand-written). A query whose builder source changed since its green
#: row is rotated back automatically via ``VERIFIED_SOURCE_HASHES``
#: (see ``all_queries``).
# --- BEGIN GENERATED VERIFIED ROTATION (scripts/update_verified.py) ---
# Round-13 curation: regenerated from
# CORRECTNESS_r01.json..CORRECTNESS_r12.json (251 kept). Recomputed
# pending set (registered - verified): 22 <= window 50.
VERIFIED_PRIOR_ROUNDS: frozenset[str] = frozenset({
    "ann_blocked_neardup",
    "ann_cosine_topk",
    "ann_index_layout",
    "ann_quantized_rescore",
    "ann_recall_eval",
    "approx_sketches",
    "approx_sketches_twin",
    "basket_lift",
    "benford_leading_digit",
    "bigram_rare_ratio",
    "bloom_fpr_eval",
    "bm25_search",
    "bm25_search_indexed",
    "boilerplate_score",
    "brand_size_skyline",
    "burst_detection",
    "centroid_similarity_matrix",
    "changepoint_cusum",
    "charclass_profile",
    "churned_buyers",
    "cluster_balanced_sample",
    "code_switch_share",
    "cohort_retention",
    "contamination_span_profile",
    "context_fit_histogram",
    "conversion_funnel",
    "corpus_curation",
    "corpus_rollup",
    "corr_matrix",
    "count_min_tokens",
    "count_star",
    "cumulative_distinct_users",
    "curriculum_stage_histogram",
    "customer_order_distribution",
    "customer_order_gaps",
    "customer_spend_quartiles",
    "dataset_split",
    "decayed_activity_topk",
    "decontamination",
    "decontamination_bloom",
    "dedup_canonical",
    "dedup_cluster_sizes",
    "dedup_clusters",
    "dedup_exact",
    "dedup_fingerprint",
    "dedup_rate_by_source",
    "dedup_threshold_sweep",
    "dim_variance_screen",
    "disjunctive_revenue",
    "doc_chunks",
    "doc_embedding_alignment",
    "doc_rarity_topk",
    "doc_repetition",
    "dominant_lang_share",
    "dup_source_matrix",
    "embedding_centroids",
    "embedding_drift",
    "embedding_health_audit",
    "embedding_neardup",
    "embedding_pca_step",
    "embedding_project",
    "embedding_quantize",
    "event_funnel",
    "event_heatmap",
    "event_path_topk",
    "event_transition_matrix",
    "event_transitions",
    "event_value_pivot",
    "excess_order_counts",
    "fingerprint",
    "frame_sample",
    "fulfillment_latency",
    "gap_filled_hourly",
    "group_by",
    "group_ksample",
    "hard_negative_mining",
    "heavy_hitters",
    "idle_customers",
    "important_stock",
    "incremental_dedup",
    "incremental_scan",
    "intra_doc_repetition",
    "inventory_turnover_topk",
    "ivf_ann_topk",
    "ivf_ann_topk_trained",
    "ivf_assign",
    "ivf_list_balance_trained",
    "ivf_recall_trained_vs_seed",
    "join_broadcast_dims",
    "join_fact_dim",
    "json_props_stats",
    "key_skew_histogram",
    "kmeans_lloyd_step",
    "kmeans_train_readout",
    "kmv_distinct",
    "kmv_distinct_by_source",
    "kmv_overlap",
    "kmv_union_distinct",
    "knn_classify",
    "knn_graph_degree_audit",
    "label_centroid_confusion",
    "label_cohesion",
    "lang_id",
    "lang_source_chi2",
    "langid_confusion",
    "large_orders",
    "latest_event_per_user",
    "length_drift",
    "lexical_diversity",
    "local_supplier_volume",
    "lorenz_deciles",
    "lsh_ann_multiprobe",
    "lsh_ann_topk",
    "lsh_candidate_budget",
    "mad_length_outliers",
    "matched_order_counts",
    "max_watermark",
    "measures_unpivot",
    "media_decode_budget",
    "media_frame_features",
    "media_phash_neardup",
    "media_type_profile",
    "min_cost_supplier",
    "minhash_error_eval",
    "minhash_lsh_pairs",
    "mixture_rebalance",
    "mmr_rerank_topk",
    "moving_spend_90d",
    "multimodal_features",
    "name_edit_neardup",
    "nation_market_share",
    "nation_revenue_share",
    "nation_trade_volume",
    "ngram_containment",
    "ngram_jaccard_guarded",
    "ngram_jaccard_pairs",
    "open_orders_timeline",
    "order_by",
    "order_gap_stats",
    "order_priority_check",
    "order_reconciliation",
    "order_seasonality",
    "orphan_events_audit",
    "pack_efficiency",
    "pack_sequences",
    "pattern_match_topk",
    "pii_redact",
    "pii_scan",
    "pii_scrub",
    "postings_layout",
    "price_percentiles",
    "pricing_summary",
    "priority_shipping",
    "product_type_profit",
    "promo_revenue",
    "purchase_attribution",
    "quality_by_lang",
    "quality_canonical_dedup",
    "quality_filter_funnel",
    "quality_quantile_normalize",
    "quality_score",
    "quantization_error_profile",
    "range_partition_boundaries",
    "rate_limit_audit",
    "referential_integrity",
    "repeat_buyers",
    "retention_cohorts",
    "revenue_abc_classes",
    "revenue_forecast",
    "revenue_mom_growth",
    "revenue_trend_ols",
    "rfm_segments",
    "rolling_active_users",
    "rrf_fusion",
    "sales_cube",
    "sales_grouping_sets",
    "sales_rollup",
    "salted_segment_sales",
    "scd2_state_history",
    "select_all",
    "select_columns",
    "semdedup_canonical",
    "series_anomalies",
    "series_autocorr",
    "series_similarity_topk",
    "session_concurrency",
    "session_dwell_stats",
    "sessionize_events",
    "shard_manifest",
    "shingle_df_histogram",
    "shingle_size_sensitivity",
    "shipping_priority",
    "simhash_pairs",
    "small_order_revenue",
    "snapshot_diff_audit",
    "sole_returning_supplier",
    "source_cap",
    "source_length_quartiles",
    "source_mixture",
    "source_overlap_matrix",
    "source_signature_terms",
    "span_removal",
    "spend_gini",
    "stats_moments",
    "stickiness_ratio",
    "stocked_parts_promotion",
    "stratified_sample",
    "streaming_burst_flags",
    "streaming_enriched_counts",
    "streaming_exact_dedup",
    "streaming_incremental_dedup",
    "streaming_pii_gate",
    "streaming_quality_gate",
    "streaming_sessions",
    "streaming_sessions_timeout",
    "streaming_sliding_counts",
    "streaming_tumbling_counts",
    "streaming_view_clicks",
    "substring_dedup",
    "summary_view",
    "supplier_concentration_hhi",
    "supplier_hhi_histogram",
    "supplier_variety",
    "table_profile",
    "text_stats",
    "time_bucket_rollup",
    "time_weighted_value",
    "token_budget_selection",
    "token_cooccurrence",
    "token_frequencies",
    "tokenizer_compression",
    "top_k",
    "top_returned_customers",
    "top_supplier_revenue",
    "top_terms",
    "training_order",
    "uniform_ksample",
    "user_diversity_histogram",
    "value_band_join",
    "value_histogram",
    "value_outliers_mad",
    "vector_quality_audit",
    "view_click_interval",
    "vocab_gini",
    "vocab_growth",
    "weighted_sample",
    "where_filter",
    "window_running_total",
    "window_topn_per_group",
    "windowed_agg",
    "winsorized_stats",
})
# --- END GENERATED VERIFIED ROTATION ---


def spec_source_hash(spec: QuerySpec) -> str | None:
    """sha256[:12] over the builder's (dedented) source + the oracle SQL.

    Used to detect "implementation changed since its green CORRECTNESS
    row": ``scripts/update_verified.py`` records the hash at regeneration
    time and ``all_queries`` rotates any mismatching query back into the
    driver's verification window. Hashing the oracle text too catches
    SQL-side fixes whose builder is untouched. A heuristic, not a proof —
    a builder that delegates to a helper whose body changed hashes the
    same — so manual curation of ``VERIFIED_PRIOR_ROUNDS`` still applies
    for deep rewrites.
    """
    try:
        src = textwrap.dedent(inspect.getsource(spec.builder))
    except (OSError, TypeError):
        return None
    blob = src + "\x00" + (spec.oracle or "")
    return hashlib.sha256(blob.encode()).hexdigest()[:12]


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
        partsupp,
        pipeline,
        profiling,
        ranges,
        relational,
        retrieval,
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

    try:
        from ser_etl_spark._verified_hashes import VERIFIED_SOURCE_HASHES
    except ImportError:  # generated file absent: fall back to the name set
        VERIFIED_SOURCE_HASHES = {}

    def _is_verified(spec: QuerySpec) -> bool:
        if spec.name not in VERIFIED_PRIOR_ROUNDS:
            return False
        recorded = VERIFIED_SOURCE_HASHES.get(spec.name)
        if recorded is None:
            return True
        current = spec_source_hash(spec)
        # Unhashable (no source) => can't prove a change; keep verified.
        return current is None or current == recorded

    pending = {n: s for n, s in REGISTRY.items() if not _is_verified(s)}
    verified = {n: s for n, s in REGISTRY.items() if _is_verified(s)}
    # Oracle-backed pending entries first: they get the strong
    # (rows+schema+value-hash) check, so they must not be crowded out of
    # the window by rows-only entries whose driver check is weaker than
    # the pytest invariants that already cover them.
    pending_oracle = {n: s for n, s in pending.items() if s.oracle is not None}
    pending_rows_only = {n: s for n, s in pending.items() if s.oracle is None}
    return {**pending_oracle, **pending_rows_only, **verified}
