#!/usr/bin/env python
"""A/B the duplicate_clusters convergence mechanisms on one host.

Round-5 verdict directive #3: ec8cf5f claims the decimal label-sum
convergence saves one shuffle per round vs the r4 changed-count join,
but raw bench time ROSE 3.76 -> 4.06 s across rounds measured on
different-speed hosts. This script times the three candidate designs
interleaved on the SAME host over the real registry input
(guarded-Jaccard pairs at $SPARK_GRAFT_SF_DIR):

  sum    — current: label-sum aggregate action every round
  join   — r4 form: changed-count labels-vs-updated join every round
  sum2   — label-sum checked every 2nd round only (labels only
           decrease, so late detection is safe; may run 1 extra round)

Usage: python scripts/ab_dedup_convergence.py [reps]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _edges_labels(pairs):
    fwd = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    return edges, labels


def run_sum(pairs, every: int = 1, max_iter: int = 30) -> int:
    from ser_etl_spark.operators.dedup import _propagation_round

    edges, labels = _edges_labels(pairs)

    def label_sum(df):
        return df.agg(F.sum(F.col("label").cast("decimal(38,0)"))).first()[0]

    prev = label_sum(labels)
    rounds = 0
    for i in range(max_iter):
        labels = _propagation_round(edges, labels).localCheckpoint()
        rounds += 1
        if (i + 1) % every == 0:
            s = label_sum(labels)
            if s == prev:
                break
            prev = s
    labels.select("node", "label").count()
    return rounds


def run_join(pairs, max_iter: int = 30) -> int:
    from ser_etl_spark.operators.dedup import _propagation_round

    edges, labels = _edges_labels(pairs)
    rounds = 0
    for _ in range(max_iter):
        updated = _propagation_round(edges, labels).localCheckpoint()
        rounds += 1
        changed = (
            updated.alias("u")
            .join(labels.alias("o"), F.col("u.node") == F.col("o.node"))
            .filter(F.col("u.label") != F.col("o.label"))
            .count()
        )
        labels = updated
        if changed == 0:
            break
    labels.select("node", "label").count()
    return rounds


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ser_etl_spark.operators.dedup import ngram_jaccard_pairs
    from ser_etl_spark.session import get_spark
    from ser_etl_spark.sources.parquet import load_table

    spark = get_spark(
        app_name="ab-dedup", master=f"local[{cpus}]",
        conf={"spark.ui.enabled": "false"},
    )
    docs = load_table(spark, sf_dir, "documents")
    # materialize the pair input once so only the propagation differs
    pairs = ngram_jaccard_pairs(docs, 0.5, max_shingle_df=50).localCheckpoint()
    pairs.count()

    variants = {
        "sum": lambda: run_sum(pairs, every=1),
        "join": lambda: run_join(pairs),
        "sum2": lambda: run_sum(pairs, every=2),
    }
    times: dict[str, list[float]] = {k: [] for k in variants}
    rounds: dict[str, int] = {}
    for _ in range(reps):
        for name, fn in variants.items():
            t0 = time.time()
            rounds[name] = fn()
            times[name].append(round(time.time() - t0, 3))
    for name in variants:
        print(
            f"{name}: min={min(times[name])} all={times[name]} "
            f"rounds={rounds[name]}"
        )


if __name__ == "__main__":
    main()
