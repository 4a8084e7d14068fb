"""Structured Streaming windowed aggregation over the events stream.

The reference's only stream is the implicit 60 s micro-batch sync loop;
the idiomatic Spark upgrade (SURVEY.md §7.2-5) is a real event-time
pipeline: file/Kafka source -> watermark for late data -> tumbling or
sliding windows -> sink. State is partitioned by (window, key) across
executors — at 100 TB/day this scales horizontally; nothing here is
driver-resident.

Timezone note: Structured Streaming watermarks demand TIMESTAMP (LTZ)
event time (``EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE`` otherwise), so the
NTZ fixture column is pinned to an instant via pure NTZ arithmetic —
``timestamp_micros(timestampdiff(MICROSECOND, NTZ epoch, ts))`` — which
treats the wall-clock as UTC regardless of session timezone. A
``to_utc_timestamp``/cast conversion would instead coerce NTZ → LTZ
through the SESSION timezone and shift every window under a non-UTC
session (the bug class the verify probe exists for).
:func:`replay_to_batch` converts instants back to UTC wall-clock NTZ on
the way out, so callers see NTZ end-to-end like the batch twins.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.functions.numeric import dsum
from ser_etl_spark.sources.parquet import _ns_timestamp_cols, table_path


#: path -> raw on-disk schema; file streams require a declared schema and
#: probing it is a batch read — cache it so every streaming query in a
#: session doesn't re-pay the probe (fixture files are immutable).
_STREAM_SCHEMA_CACHE: dict[str, object] = {}


def streaming_events(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """The events table as a file-source stream.

    Schema comes from a batch read of the same path (file streams require
    a declared schema). In production the same transformations attach to
    a Kafka source instead — the plan below the source is identical.
    """
    path = table_path(sf_dir, "events")
    ns_cols = _ns_timestamp_cols(path)
    if ns_cols:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # file streams need the raw on-disk schema (ns columns arrive as int64)
    if path not in _STREAM_SCHEMA_CACHE:
        _STREAM_SCHEMA_CACHE[path] = spark.read.parquet(path).schema
    raw_schema = _STREAM_SCHEMA_CACHE[path]
    reader = spark.readStream.schema(raw_schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet"):
        # file streams want a directory; a single-file fixture streams via
        # its parent directory with a glob filter selecting just that file
        reader = reader.option("pathGlobFilter", os.path.basename(path))
        path = os.path.dirname(path)
    from pyspark.sql.types import TimestampNTZType

    df = reader.parquet(path)
    for c in ns_cols:
        # ns-since-epoch -> microsecond instant (session-tz independent)
        df = df.withColumn(c, F.timestamp_micros(F.expr(f"`{c}` div 1000")))
    if isinstance(df.schema["ts"].dataType, TimestampNTZType):
        # NTZ wall-clock -> instant, treating the wall-clock as UTC:
        # micros-since-epoch computed in pure NTZ arithmetic, then
        # attached as an instant — never a cast through the session tz
        df = df.withColumn(
            "ts",
            F.timestamp_micros(
                F.expr(
                    "timestampdiff(MICROSECOND, "
                    "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
                )
            ),
        )
    return df


def tumbling_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Tumbling event-time window counts/sums with late-data watermark."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("events"),
            # decimal-exact sum (cast to double once at the end): float
            # accumulation order varies with state-store partitioning, so a
            # plain SUM(double) would make the output nondeterministic
            # across replays — and unmatchable against the SQL oracle
            dsum("value", 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key),
            "events",
            "sum_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key: str = "event_type",
) -> DataFrame:
    """Sliding event-time windows (overlapping)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(F.col(ts_col), window, slide).alias("w"),
            F.col(key),
        )
        .agg(F.count(F.lit(1)).alias("events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key),
            "events",
        )
    )


def run_to_memory(
    stream_df: DataFrame,
    name: str,
    mode: str = "append",
    shuffle_partitions: int | None = 8,
) -> "object":
    """Drive a streaming plan to completion against current files
    (availableNow trigger) into an in-memory sink table ``name``.
    Returns the finished StreamingQuery.

    ``shuffle_partitions`` sizes the STATEFUL shuffle for the replay:
    every stateful operator materializes one state store per shuffle
    partition, so replaying a small fixture under the batch default (64)
    pays 64x store setup per operator — measured 4x wall-clock on the
    stream-stream join. State partitioning is fixed at first start by
    the checkpoint anyway, so explicit sizing (keys per partition, not
    the batch default) is what a production deployment does too; pass
    ``None`` to inherit the session setting.

    The override mutates ``stream_df``'s OWN session for the duration of
    the replay (restored in ``finally``) — callers that share that
    session with concurrent query builds must pass an isolated
    ``spark.newSession()`` stream instead; :func:`replay_to_batch` does
    exactly that and also cleans up the sink table.
    """
    spark = stream_df.sparkSession
    key = "spark.sql.shuffle.partitions"
    prior = spark.conf.get(key)
    if shuffle_partitions is not None:
        spark.conf.set(key, str(shuffle_partitions))
    try:
        q = (
            stream_df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if shuffle_partitions is not None:
            spark.conf.set(key, prior)
    return q


def replay_to_batch(
    spark: SparkSession,
    build_stream,
    name: str,
    mode: str = "append",
    shuffle_partitions: int | None = 8,
    no_data_batches: bool = True,
) -> DataFrame:
    """Replay a streaming plan to completion and return its result as a
    batch DataFrame on ``spark``, leaving no state behind.

    ``build_stream(session) -> streaming DataFrame`` is invoked against
    an ISOLATED ``spark.newSession()`` (same SparkContext, own conf and
    temp catalog), so the stateful-shuffle override cannot race with
    queries concurrently built on the caller's session, and the memory
    sink's uuid-named table lands in the throwaway session's catalog.
    After the ``availableNow`` replay finishes, the sink rows are
    materialized (memory-sink results are driver-resident already — this
    copies, it does not distribute-then-collect), the sink view is
    dropped, and the rows come back as a local relation on the caller's
    session — nothing retained for the session lifetime.

    Instant (LTZ) columns come back as TIMESTAMP_NTZ holding the UTC
    wall-clock: the naive-datetime round-trip is asymmetric (``collect``
    renders instants in the OS timezone while ``createDataFrame``
    re-interprets naive datetimes in the SESSION timezone), so handing
    LTZ rows across would shift every timestamp under a non-UTC session.
    NTZ round-trips timezone-free in both directions, and matches the
    batch twins, which keep event time NTZ end-to-end.

    The hand-off itself is ``toArrow()`` -> ``createDataFrame(table,
    schema)``: one Arrow batch transfer each way instead of the pickled
    Row path (measured ~2s saved per replay on a ~100k-row sink at
    sf0.1). The explicit schema pin matters — an unpinned Arrow
    ``timestamp[us]`` column would come back as session-tz TIMESTAMP,
    shifting values under a non-UTC session (the tz probe in the verify
    recipe); nulls and integer types round-trip exactly (no pandas
    NaN-float coercion).
    """
    from pyspark.sql.types import TimestampType

    replay = spark.newSession()
    if not no_data_batches:
        # Complete-mode replays re-emit the full result every batch, so
        # the trailing watermark-advancing no-data batch only re-runs the
        # sink write; skipping it saves a micro-batch per replay. NEVER
        # disable for event-time-timeout operators (the timeout
        # sessionizer) or watermark-gated append emission — those need
        # the no-data batch to flush.
        replay.conf.set(
            "spark.sql.streaming.noDataMicroBatches.enabled", "false"
        )
    stream_df = build_stream(replay)
    run_to_memory(
        stream_df, name, mode=mode, shuffle_partitions=shuffle_partitions
    )
    sink = replay.table(name)
    sink = sink.select(
        *[
            F.expr(
                f"timestampadd(MICROSECOND, unix_micros(`{f.name}`), "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
            ).alias(f.name)
            if isinstance(f.dataType, TimestampType)
            else F.col(f.name)
            for f in sink.schema.fields
        ]
    )
    table, schema = sink.toArrow(), sink.schema
    replay.catalog.dropTempView(name)
    return spark.createDataFrame(table, schema)
