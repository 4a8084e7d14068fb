"""Streaming deduplication and stream-static enrichment.

The streaming twins of the batch training-data operators: exact dedup
over an event stream, and dimension enrichment of a stream without a
stateful shuffle.

Scale design:

- ``streaming_dedup`` uses ``dropDuplicatesWithinWatermark`` — state is
  keyed by the dedup column and *bounded by the watermark*: a key's
  entry is dropped once the watermark passes it, so state size tracks
  the duplicate-arrival horizon (e.g. 2 hours of keys), never the full
  history. Unbounded ``dropDuplicates`` on a stream would grow state
  forever — the classic streaming-dedup failure mode at scale.
- ``enrich_stream`` joins the stream to a *static* dimension: Spark
  plans it as a broadcast hash join per micro-batch — map-side, no
  state, no shuffle of the stream. The static side re-resolves per
  batch, so a snapshot-refreshed dimension table picks up changes
  without restarting the query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def streaming_dedup(
    events: DataFrame,
    key: str = "event_id",
    ts_col: str = "ts",
    watermark: str = "2 hours",
) -> DataFrame:
    """Exact streaming dedup on ``key`` with watermark-bounded state.

    Emits the first arrival of each key; later duplicates are dropped as
    long as they arrive within ``watermark`` of the first (the
    guarantee window — duplicates straggling beyond it would pass, which
    is the documented at-least-once -> exactly-once-within-horizon
    trade every streaming dedup makes to keep state bounded).
    """
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        [key]
    )


def enrich_stream(
    events: DataFrame, dim: DataFrame, on: str = "user_id", how: str = "left"
) -> DataFrame:
    """Stream-static dimension enrichment (broadcast per micro-batch).

    ``dim`` must be a batch DataFrame; small dims broadcast (no shuffle
    of the stream), and the join is stateless — each micro-batch joins
    against the dimension as of that batch.
    """
    return events.join(dim, on=on, how=how)


def stream_delta_dedup_replay(
    spark,
    sf_dir: str,
    delta: DataFrame,
    bands_dir: str,
    delta_pred,
    threshold: float = 0.5,
    files: int = 4,
) -> DataFrame:
    """Continuous incremental dedup, replayed to completion: the delta
    arrives as a multi-file ``availableNow`` stream and every
    micro-batch runs the one-sided band join + candidate-restricted
    verify against the PERSISTED corpus band artifact via
    ``foreachBatch`` — the streaming form of the sync-loop upgrade (A16)
    applied to dedup.

    Soundness of micro-batching: a delta document's matches depend only
    on that document and the corpus, never on other delta documents, so
    the union of per-batch outputs is INVARIANT to batch boundaries —
    equal to the batch operator and therefore to the same SQL oracle
    (pinned by the driver check; batch-boundary independence is the
    property that makes one-sided dedup a sound continuous operation,
    where the symmetric pair join is not: it would miss delta-delta
    pairs split across batches).

    Per batch the corpus side is re-resolved from paths on the batch's
    own session (stream-static pattern, like ``enrich_stream`` — a
    snapshot refresh is picked up without restarting); state is ZERO:
    no watermark, no store — the persisted bands ARE the state, exactly
    as they are for the batch form.

    Batch results go to a parquet SINK, never the driver (r9 directive
    #3 — the old form ``collect()``-ed every batch's matches into a
    driver list, unbounded at corpus scale): each micro-batch
    OVERWRITES its own ``b<batch_id>`` subdirectory, which also makes a
    replayed batch (failure recovery re-runs the last uncommitted
    batch) idempotent rather than double-appended. The replay helper
    then reads the sink back and localCheckpoints the (output-sized)
    result so the temp sink can be removed.
    """
    import os
    import shutil
    import tempfile

    from ser_etl_spark.operators.dedup import delta_dedup_pairs
    from ser_etl_spark.sources.parquet import load_table

    tmp = tempfile.mkdtemp(prefix="ser_etl_delta_stream_")
    ckpt = tmp + "_ckpt"
    sink = tmp + "_matches"
    schema = "corpus_doc bigint, delta_doc bigint, jaccard double"
    try:
        delta.repartition(files).write.mode("overwrite").parquet(tmp)
        os.makedirs(sink, exist_ok=True)

        def handle(batch_df: DataFrame, batch_id: int) -> None:
            s = batch_df.sparkSession
            from pyspark.sql import functions as F

            # Keep the per-batch shuffle narrow (a sync batch is
            # delta-sized; scheduling 32 tasks per tiny shuffle stage
            # dominates replay cost at test SF), then restore — the
            # package-wide foreachBatch conf discipline (quality.py /
            # media.py): empirically the handler gets an isolated
            # streaming clone, but save/restore removes any dependence
            # on that implementation detail.
            prev = s.conf.get("spark.sql.shuffle.partitions")
            s.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                corpus = load_table(s, sf_dir, "documents").filter(
                    ~delta_pred(F)
                )
                corpus_bands = s.read.parquet(bands_dir).filter(
                    ~delta_pred(F)
                )
                out = delta_dedup_pairs(
                    corpus, batch_df, threshold, corpus_bands=corpus_bands
                )
                # one output-sized file per batch, overwrite = idempotent
                out.coalesce(1).write.mode("overwrite").parquet(
                    os.path.join(sink, f"b{batch_id}")
                )
            finally:
                s.conf.set("spark.sql.shuffle.partitions", prev)

        stream = (
            spark.readStream.schema(delta.schema)
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
            return spark.createDataFrame([], schema)
        # explicit schema: an empty batch's directory may hold _SUCCESS
        # and zero part files (the zero-part-file artifact seam)
        result = (
            spark.read.schema(schema)
            .parquet(*batch_dirs)
            .orderBy("delta_doc", "corpus_doc")
        )
        # materialize before the temp sink is removed; the result is
        # pair-sized, so the checkpoint is O(output)
        return result.localCheckpoint(eager=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(sink, ignore_errors=True)
