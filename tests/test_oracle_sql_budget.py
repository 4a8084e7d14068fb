"""Oracle SQL text-size budget: the map-count exhaustion guard.

Round-11 incident: the index-family oracles spliced dozens of textually
unrolled 64-dim cosines (~17 KB each), and DuckDB's expression allocator
for the resulting 370 KB SQL drove the PROCESS past the kernel's
``vm.max_map_count`` (65 530 mmap regions) whenever a Spark JVM shared
the process — exactly the driver harness topology.  The failure mode is
vicious: ``std::bad_alloc`` on a 16 KB block with 125 GB free, and once
one query crosses the line the map pressure cascades into unrelated
queries' rows in the same run (six spurious CORRECTNESS failures).

The fix folds per-dim unrolls into ``list_reduce(list_transform(...))``
(bit-identical left-to-right IEEE semantics — see ``_duck_dot``); this
test pins the budget so a future generator can't silently regress the
class.  The caps are ~10 % above today's high-water marks, not targets.
"""

from __future__ import annotations

from ser_etl_spark.registry import all_queries

#: largest single oracle today: minhash_error_eval at ~181 KB (baked
#: permutation-hash coefficient tables — data, not expression depth).
PER_ORACLE_CAP = 200_000
#: whole-registry total today: ~1.70 MB.
TOTAL_CAP = 2_500_000
#: the r11 fold brought every cosine-family oracle under this; the
#: unrolled form can't express a 64-dim cosine in less.
COSINE_FAMILY_CAP = 70_000
COSINE_FAMILY = (
    "ivf_recall_trained_vs_seed",
    "kmeans_train_readout",
    "kmeans_lloyd_step",
    "ivf_ann_topk",
    "ivf_ann_topk_trained",
    "ivf_list_balance_trained",
    "ivf_assign",
    "ann_index_layout",
    "ann_quantized_rescore",
    "ann_blocked_neardup",
    "semdedup_canonical",
    "knn_classify",
    "label_centroid_confusion",
    "centroid_similarity_matrix",
    "embedding_drift",
)


def test_every_oracle_under_per_query_cap():
    over = {
        n: len(s.oracle)
        for n, s in all_queries().items()
        if s.oracle is not None and len(s.oracle) > PER_ORACLE_CAP
    }
    assert not over, f"oracle SQL over {PER_ORACLE_CAP} chars: {over}"


def test_registry_total_under_cap():
    total = sum(len(s.oracle or "") for s in all_queries().values())
    assert total <= TOTAL_CAP, f"registry oracle total {total} > {TOTAL_CAP}"


def test_cosine_family_stays_folded():
    q = all_queries()
    over = {
        n: len(q[n].oracle)
        for n in COSINE_FAMILY
        if n in q and q[n].oracle and len(q[n].oracle) > COSINE_FAMILY_CAP
    }
    assert not over, (
        f"cosine-family oracle regressed to unrolled size: {over} "
        f"(cap {COSINE_FAMILY_CAP}) — keep _duck_dot folded"
    )
