"""Streaming multimodal ingest meter.

The continuous form of the A/V chunk planner
(``operators/multimodal.media_chunk_rollup``): media assets arrive as a
stream, every micro-batch computes its own per-modality chunk/frame
totals (the chunk plan is a pure per-asset function of the metadata, so
summed per-batch totals are invariant to batch boundaries), and the
overlap-overhead rate is derived once over the merged sums — the live
"how much decode work is queued" meter a multimodal ingest publishes,
the A16 micro-batch story applied to segmentation planning.

Same parquet-sink discipline as the quality/PII gates: each batch
OVERWRITES its own ``b<batch_id>`` subdirectory (idempotent under
failure-replay), zero streaming state, nothing accumulates on the
driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_media_chunks_replay(
    spark, ids: DataFrame, files: int = 2
) -> DataFrame:
    """Replay ``ids`` (a ``doc_id`` projection — the asset manifest) as
    a multi-file ``availableNow`` stream through the chunk planner;
    return per-modality totals (n_assets, total_chunks, decoded_frames,
    source_frames, overlap_overhead_bp) summed over the micro-batches.
    The bp rate is computed AFTER the merge — a ratio of sums, never a
    sum of ratios."""
    import os
    import shutil
    import tempfile

    from ser_etl_spark.operators.multimodal import (
        media_chunk_rollup,
        with_fake_payload,
    )

    tmp = tempfile.mkdtemp(prefix="ser_etl_media_stream_")
    ckpt = tmp + "_ckpt"
    sink = tmp + "_counts"
    schema = (
        "media_type string, n_assets bigint, total_chunks bigint, "
        "decoded_frames bigint, source_frames bigint"
    )
    try:
        ids.repartition(files).write.mode("overwrite").parquet(tmp)
        os.makedirs(sink, exist_ok=True)

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            s = batch_df.sparkSession
            prev = s.conf.get("spark.sql.shuffle.partitions")
            s.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                out = media_chunk_rollup(
                    with_fake_payload(batch_df)
                ).drop("overlap_overhead_bp")
                out.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(sink, f"b{batch_id}")
                )
            finally:
                s.conf.set("spark.sql.shuffle.partitions", prev)

        stream = (
            spark.readStream.schema(ids.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(tmp)
        )
        q = (
            stream.writeStream.foreachBatch(handle)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        batch_dirs = sorted(
            os.path.join(sink, d)
            for d in os.listdir(sink)
            if d.startswith("b")
        )
        if not batch_dirs:
            return spark.createDataFrame(
                [], schema + ", overlap_overhead_bp bigint"
            )
        merged = (
            spark.read.schema(schema)
            .parquet(*batch_dirs)
            .groupBy("media_type")
            .agg(
                F.sum("n_assets").cast("bigint").alias("n_assets"),
                F.sum("total_chunks").cast("bigint").alias("total_chunks"),
                F.sum("decoded_frames")
                .cast("bigint")
                .alias("decoded_frames"),
                F.sum("source_frames")
                .cast("bigint")
                .alias("source_frames"),
            )
            .select(
                "media_type",
                "n_assets",
                "total_chunks",
                "decoded_frames",
                "source_frames",
                F.expr(
                    "(10000 * (decoded_frames - source_frames)) "
                    "div decoded_frames"
                )
                .cast("bigint")
                .alias("overlap_overhead_bp"),
            )
            .orderBy("media_type")
        )
        return merged.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
