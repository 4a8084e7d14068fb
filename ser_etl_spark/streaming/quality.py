"""Streaming quality admission gate.

The continuous form of the batch quality funnel
(``operators/text.quality_filter_funnel``): documents arrive as a
stream, every micro-batch applies the SAME admission flag, and per-batch
per-source pass/fail counts append to a parquet sink — the live
"how much of each feed survives filtering" meter an ingest pipeline
publishes, the A16 micro-batch story applied to quality filtering.

Soundness of micro-batching: a document's verdict depends only on that
document (all five funnel stages are per-row expressions), so summing
per-batch counts over any batching equals the batch operator's per-source
totals — the same invariance argument as ``stream_delta_dedup_replay``,
with the same parquet-sink discipline (each batch OVERWRITES its own
``b<batch_id>`` subdirectory: idempotent under failure-replay, nothing
accumulates on the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_quality_gate_replay(
    spark, docs: DataFrame, files: int = 4
) -> DataFrame:
    """Replay ``docs`` as a multi-file ``availableNow`` stream through
    the funnel admission flag; return per-source totals (n_docs,
    n_pass, n_fail, pass_bp) summed over the micro-batches."""
    import os
    import shutil
    import tempfile

    from ser_etl_spark.operators.text import funnel_stage_flags

    tmp = tempfile.mkdtemp(prefix="ser_etl_quality_stream_")
    ckpt = tmp + "_ckpt"
    sink = tmp + "_counts"
    schema = "source string, n_docs bigint, n_pass bigint"
    try:
        docs.repartition(files).write.mode("overwrite").parquet(tmp)
        os.makedirs(sink, exist_ok=True)

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            # keep the per-batch shuffle narrow, then restore (ADVICE
            # r12). Empirically foreachBatch hands a streaming-cloned
            # session here (the set does NOT propagate to the caller's
            # session on this Spark version), but the restore removes
            # any dependence on that implementation detail.
            s = batch_df.sparkSession
            prev = s.conf.get("spark.sql.shuffle.partitions")
            s.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                out = batch_df.groupBy("source").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    F.sum(funnel_stage_flags()[-1].cast("bigint"))
                    .cast("bigint")
                    .alias("n_pass"),
                )
                out.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(sink, f"b{batch_id}")
                )
            finally:
                s.conf.set("spark.sql.shuffle.partitions", prev)

        stream = (
            spark.readStream.schema(docs.schema)
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
                [], schema + ", n_fail bigint, pass_bp bigint"
            )
        merged = (
            spark.read.schema(schema)
            .parquet(*batch_dirs)
            .groupBy("source")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("n_pass").cast("bigint").alias("n_pass"),
            )
            .select(
                "source",
                "n_docs",
                "n_pass",
                (F.col("n_docs") - F.col("n_pass"))
                .cast("bigint")
                .alias("n_fail"),
                F.expr("(n_pass * 10000) div n_docs")
                .cast("bigint")
                .alias("pass_bp"),
            )
            .orderBy("source")
        )
        return merged.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)


def stream_pii_gate_replay(
    spark, docs: DataFrame, files: int = 2
) -> DataFrame:
    """Replay ``docs`` as a multi-file ``availableNow`` stream through
    the PII detectors (r12): every micro-batch counts flagged documents
    per source and appends to a parquet sink; the return is the
    summed-over-batches rollup (n_docs, n_flagged, flagged_bp). The
    per-row verdict is stateless, so batch boundaries cannot change the
    totals — the streaming admission twin of ``pii_scan``."""
    import os
    import shutil
    import tempfile

    from ser_etl_spark.operators.text import PII_PATTERNS

    tmp = tempfile.mkdtemp(prefix="ser_etl_pii_stream_")
    ckpt = tmp + "_ckpt"
    sink = tmp + "_counts"
    schema = "source string, n_docs bigint, n_flagged bigint"
    try:
        docs.repartition(files).write.mode("overwrite").parquet(tmp)
        os.makedirs(sink, exist_ok=True)

        flagged = None
        for _, pat in PII_PATTERNS:
            c = (
                F.coalesce(
                    F.regexp_count(F.col("text"), F.lit(pat)), F.lit(0)
                )
                > 0
            )
            flagged = c if flagged is None else (flagged | c)

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            # narrow per-batch shuffle, restored afterwards (ADVICE
            # r12; the batch session is a streaming clone on this Spark
            # version, the restore makes that a non-dependency).
            s = batch_df.sparkSession
            prev = s.conf.get("spark.sql.shuffle.partitions")
            s.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                out = batch_df.groupBy("source").agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                    F.sum(flagged.cast("bigint"))
                    .cast("bigint")
                    .alias("n_flagged"),
                )
                out.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(sink, f"b{batch_id}")
                )
            finally:
                s.conf.set("spark.sql.shuffle.partitions", prev)

        stream = (
            spark.readStream.schema(docs.schema)
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
            return spark.createDataFrame([], schema + ", flagged_bp bigint")
        merged = (
            spark.read.schema(schema)
            .parquet(*batch_dirs)
            .groupBy("source")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                F.sum("n_flagged").cast("bigint").alias("n_flagged"),
            )
            .select(
                "source",
                "n_docs",
                "n_flagged",
                F.expr("(10000 * n_flagged) div n_docs")
                .cast("bigint")
                .alias("flagged_bp"),
            )
            .orderBy("source")
        )
        # materialize before the finally deletes the sink it reads from
        return merged.localCheckpoint(eager=True)
    finally:
        for p in (tmp, ckpt, sink):
            shutil.rmtree(p, ignore_errors=True)
