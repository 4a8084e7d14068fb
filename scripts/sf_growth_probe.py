#!/usr/bin/env python
"""SF-growth probe for the dedup/ANN families (r9 directive #8).

Turns the "would this survive 100x data?" judgment into a measured
curve: run each probed query at sf0.01 and sf0.1 (10x the rows) and
assert its wall-clock growth stays under a superlinearity ceiling. A
banded/blocked/inverted-index operator should scale ~linearly in data
(candidate generation is equi-join-shaped); an accidental all-pairs
regression would show up as ~100x growth at 10x rows — far beyond any
host-noise band.

The ceiling is deliberately generous (default 6x for 10x data): at
these SFs, fixed per-query overhead (plan build, stage scheduling,
artifact ensure) dominates the small-SF time, so healthy ratios land
well below it (typically 1-3x), while a quadratic blowup lands far
above. Timings are min-of-N on a warm session, families isolated.

Usage:
  python scripts/sf_growth_probe.py [--ceiling 6.0] [--passes 3]
Exit 0 when every probed query is under the ceiling; 1 otherwise.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: the scale-sensitive candidate-generation queries: banded MinHash,
#: anchor-gram inverted index, the persisted-ANN-index block join, plus
#: the r9/r10 heavy additions (r9 verdict directive #9): the Lloyd
#: E+M pass, the power-iteration PCA step, and the cross-source dup
#: matrix's fingerprint equi-join
PROBES = (
    "minhash_lsh_pairs",
    "substring_dedup",
    "ann_blocked_neardup",
    "kmeans_lloyd_step",
    "embedding_pca_step",
    "dup_source_matrix",
    # r11: the new pair-space / rank-join operators — the label-blocked
    # kNN graph (block self-join), the 3-k shingle expansion, and the
    # quantile normalizer's two-level rank + position join
    "knn_graph_degree_audit",
    "shingle_size_sensitivity",
    "quality_quantile_normalize",
    # r12: the banded mixture rebalancer (two-level hash-prefix rank —
    # VERDICT r11 #1/#3) and the per-user window family's heavies
    "mixture_rebalance",
    "rate_limit_audit",
    "scd2_state_history",
    # r12b: the threshold sweep rides the guarded pair space — probe it
    # directly so a regression in the explode/filter tail shows up
    "dedup_threshold_sweep",
    # r13: the domain dup profile (fp window over the (source, fp)
    # table), the quality-vs-dup fp self-join, the probe-depth sweep's
    # fused E-step + 4-running-sum window, and the prefix miner's
    # top-k heaps
    "domain_dedup_profile",
    "quality_vs_dup_correlation",
    "ann_probe_depth_sweep",
    "doc_prefix_cluster_profile",
    # r13b: the P/R harness rides BOTH bounded pair spaces (band join +
    # guarded exact) — a superlinear blowup in either side shows here
    "minhash_pr_eval",
    # r13c: the prototypicality E-step scan (argmax + winning cosine)
    "prototypicality_profile",
    # r13d: the split-leakage audits ride the banded pair space / the
    # broadcast contamination sliver — probe both compositions
    "cross_split_neardup_leakage",
    "benchmark_leakage_by_split",
    # r13e: the segment explosion (≈ n_tokens/16 rows per doc) + the
    # per-hash window over the reduced (source, hash) table
    "segment_dedup_profile",
    # r13f: the fp-window survivorship pass and the distinct-frequency
    # histogram window (must stay ~sqrt(N)-sized, never type-sized)
    "dedup_quality_shift",
    "vocab_coverage_curve",
)

SF_SMALL = "/root/testdata/sf0.01"
SF_LARGE = "/root/testdata/sf0.1"


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ceiling", type=float, default=6.0,
                    help="max allowed time(sf0.1)/time(sf0.01) ratio")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from ser_etl_spark.registry import all_queries
    from ser_etl_spark.session import get_spark
    from ser_etl_spark.sources.parquet import load_table

    spark = get_spark(
        app_name="sf-growth-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        conf={"spark.ui.enabled": "false"},
    )
    specs = all_queries()
    # warm: JIT, artifact ensure at both SFs (index build time is a
    # write-time cost, not the probe's query-time subject)
    for sf in (SF_SMALL, SF_LARGE):
        load_table(spark, sf, "documents").limit(1).collect()
        for name in PROBES:
            specs[name].builder(spark, sf).collect()

    def min_time(name: str, sf: str) -> float:
        best = float("inf")
        for _ in range(args.passes):
            t0 = time.time()
            specs[name].builder(spark, sf).collect()
            best = min(best, time.time() - t0)
        return round(best, 3)

    report, ok = {}, True
    for name in PROBES:
        small = min_time(name, SF_SMALL)
        large = min_time(name, SF_LARGE)
        ratio = round(large / small, 2) if small > 0 else float("inf")
        within = ratio <= args.ceiling
        ok &= within
        report[name] = {
            "sf0.01_s": small,
            "sf0.1_s": large,
            "growth_10x_data": ratio,
            "ceiling": args.ceiling,
            "within_ceiling": within,
        }
    print(json.dumps({"probes": report, "ok": ok}, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
