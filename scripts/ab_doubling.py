#!/usr/bin/env python
"""A/B: current min-label propagation vs pointer-doubling rounds at sf0.1."""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
SF = "/root/testdata/sf0.1"

from pyspark.sql import functions as F  # noqa: E402

from ser_etl_spark.session import get_spark  # noqa: E402

spark = get_spark(app_name="ab-doubling", master="local[32]",
                  conf={"spark.ui.enabled": "false"})
from ser_etl_spark.sources.parquet import load_table  # noqa: E402

load_table(spark, SF, "lineitem").limit(1).collect()

from ser_etl_spark.operators.dedup import (  # noqa: E402
    DRIVER_PASSES,
    duplicate_clusters,
    ngram_jaccard_pairs,
)


def pairs():
    return ngram_jaccard_pairs(
        load_table(spark, SF, "documents"), 0.5, max_shingle_df=50
    )


def doubling_clusters(pairs_df, max_iter=30):
    fwd = pairs_df.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    rev = pairs_df.select(F.col("doc_b").alias("src"), F.col("doc_a").alias("dst"))
    edges = fwd.union(rev).distinct().localCheckpoint()
    labels = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )

    def label_sum(df):
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("label").cast("decimal(38,0)")).alias("s"),
        ).first()
        return row["s"]

    prev_sum = label_sum(labels)
    rounds = 0
    for _ in range(max_iter):
        rounds += 1
        contrib = edges.join(labels, edges.src == labels.node).select(
            F.col("dst").alias("node"), "label"
        )
        nmin = (
            labels.select("node", "label")
            .union(contrib)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
        )
        jump = labels.select(
            F.col("node").alias("_jnode"), F.col("label").alias("_jlabel")
        )
        updated = (
            nmin.join(jump, nmin.label == F.col("_jnode"))
            .select("node", F.col("_jlabel").alias("label"))
            .localCheckpoint()
        )
        new_sum = label_sum(updated)
        labels = updated
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels.select(
        F.col("node").alias("doc_id"),
        F.col("label").alias("cluster_id"),
        (F.col("node") == F.col("label")).alias("is_survivor"),
    ), rounds


# rounds + result parity + timing, interleaved min-of-2
for rep in range(2):
    d0 = DRIVER_PASSES["propagation"]
    t0 = time.time()
    cur = duplicate_clusters(pairs()).collect()
    t_cur = time.time() - t0
    rounds_cur = DRIVER_PASSES["propagation"] - d0

    t0 = time.time()
    new_df, rounds_new = doubling_clusters(pairs())
    new = new_df.collect()
    t_new = time.time() - t0

    same = sorted(map(tuple, cur)) == sorted(map(tuple, new))
    print(
        f"rep{rep}: current {t_cur:.2f}s/{rounds_cur}r  "
        f"doubling {t_new:.2f}s/{rounds_new}r  results_equal={same}"
    )

spark.stop()
