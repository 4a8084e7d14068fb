"""Registry bridge for Structured Streaming operators.

The streaming package (``ser_etl_spark/streaming``) upgrades the
reference's 60 s polling loop (A16, ``/root/reference/etl-service/src/
main.py:80-91``) to event-time processing; this module exposes one
streaming pipeline through the query registry so the driver exercises
the stream path itself, not just its batch twin.

The query drives the events file-source stream to completion with an
``availableNow`` trigger into an in-memory sink — the standard
batch-replay harness for streaming plans (same plan a Kafka source
would feed). Registered rows-only: the batch twin ``windowed_agg``
carries the SQL oracle for the same semantics; this entry proves the
*streaming* execution path (watermark + tumbling window + state store)
produces the expected cardinality.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.registry import register
from ser_etl_spark.streaming.windows import (
    replay_to_batch,
    streaming_events,
    tumbling_window_agg,
)


@register(
    "streaming_tumbling_counts",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           CAST(date_trunc('hour', ts) + INTERVAL 1 HOUR AS TIMESTAMP)
             AS window_end,
           event_type,
           COUNT(*) AS events,
           CAST(SUM(CAST(value AS DECIMAL(38,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    description="A16 streaming upgrade exercised end-to-end: events as a "
    "file-source stream -> 1 h tumbling event-time windows with a 2 h "
    "watermark -> availableNow replay into a memory sink (complete "
    "mode); proves the stateful streaming path, not just its batch twin — "
    "oracle-backed: complete-mode availableNow replay emits every window, "
    "so the batch GROUP BY over hour buckets is the exact same relation",
    covers=("A16",),
)
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sink = f"stream_counts_{uuid.uuid4().hex[:8]}"
    result = replay_to_batch(
        spark,
        lambda s: tumbling_window_agg(streaming_events(s, sf_dir)),
        sink,
        mode="complete",
        no_data_batches=False,
    )
    # window_start/window_end arrive as TIMESTAMP_NTZ (UTC wall-clock):
    # replay_to_batch converts instants before the collect round-trip
    return result.orderBy("window_start", "event_type").select(
        "window_start", "window_end", "event_type", "events",
        F.col("sum_value").cast("double").alias("sum_value"),
    )


@register(
    "streaming_sliding_counts",
    oracle="""
    WITH h AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr, event_type
      FROM events
    ), w AS (
      -- each event lands in window/slide = 2 overlapping 2h windows:
      -- the one starting at its hour and the one starting an hour before
      SELECT hr AS window_start, event_type FROM h
      UNION ALL
      SELECT hr - INTERVAL 1 HOUR AS window_start, event_type FROM h
    )
    SELECT window_start,
           CAST(window_start + INTERVAL 2 HOUR AS TIMESTAMP) AS window_end,
           event_type,
           COUNT(*) AS events
    FROM w
    GROUP BY 1, 2, 3
    """,
    description="sliding event-time windows exercised end-to-end: 2 h "
    "windows sliding by 1 h over the events stream (each event counted "
    "in exactly window/slide = 2 windows), complete-mode availableNow "
    "replay — oracle-backed via the hour-shift UNION twin",
    covers=("A16",),
)
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.streaming.windows import sliding_window_agg

    sink = f"stream_slide_{uuid.uuid4().hex[:8]}"
    result = replay_to_batch(
        spark,
        lambda s: sliding_window_agg(
            streaming_events(s, sf_dir), window="2 hours", slide="1 hour"
        ),
        sink,
        mode="complete",
        no_data_batches=False,
    )
    return result.orderBy("window_start", "event_type").select(
        "window_start", "window_end", "event_type", "events"
    )


@register(
    "streaming_view_clicks",
    oracle="""
    WITH v AS (
      SELECT user_id, ts AS view_ts FROM events WHERE event_type = 'view'
    ), c AS (
      SELECT user_id, ts AS click_ts FROM events WHERE event_type = 'click'
    )
    SELECT v.user_id, COUNT(*) AS n_pairs
    FROM v JOIN c
      ON v.user_id = c.user_id
     AND c.click_ts >= v.view_ts
     AND c.click_ts <= v.view_ts + INTERVAL 30 MINUTE
    GROUP BY v.user_id
    """,
    description="stream-stream attribution join exercised end-to-end: "
    "views and clicks as watermarked streams, clicks joined within a "
    "30 min horizon (state expires by watermark, bounded per key); "
    "availableNow replay, pair-set proven equal to the batch twin in "
    "tests",
    covers=("A16", "B11"),
)
def streaming_view_clicks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.streaming.joins import view_click_stream_pairs

    sink = f"stream_vc_{uuid.uuid4().hex[:8]}"
    pairs = replay_to_batch(
        spark,
        lambda s: view_click_stream_pairs(streaming_events(s, sf_dir)),
        sink,
        mode="append",
    )
    return (
        pairs.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
        .orderBy("user_id")
    )


@register(
    "streaming_exact_dedup",
    oracle="""
    SELECT DISTINCT user_id, event_type FROM events
    ORDER BY user_id, event_type
    """,
    description="stateful streaming deduplication exercised end-to-end: "
    "dropDuplicates on (user_id, event_type) over the events stream — "
    "keyed dedup state holding one entry per distinct key (the streaming "
    "analog of batch dedup_exact); append-mode availableNow replay emits "
    "each key's first arrival exactly once, so the output IS the "
    "distinct key set. Exact dedup is scale-safe here because the key "
    "domain is LOW-cardinality (users x event types), so state is "
    "bounded like any DISTINCT; for unbounded keys (event_id) the "
    "watermark-bounded variant streaming/dedup.py streaming_dedup "
    "(dropDuplicatesWithinWatermark) is the production path — its "
    "horizon semantics are watermark-dependent, hence not "
    "oracle-checkable, and it stays pytest-covered",
    covers=("A16", "N-dedup"),
)
def streaming_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sink = f"stream_dedup_{uuid.uuid4().hex[:8]}"
    result = replay_to_batch(
        spark,
        lambda s: streaming_events(s, sf_dir)
        .select("user_id", "event_type")
        .dropDuplicates(["user_id", "event_type"]),
        sink,
        mode="append",
    )
    return result.orderBy("user_id", "event_type")


#: Gap-session CTEs shared by both streaming sessionizer oracles: the
#: exact-integer microsecond gap rule (floor-div, strictly greater), the
#: same (ts, event_id) ordering the stateful operator sorts by, one row
#: per (user, session).
_SESSION_ORACLE_CTES = """
    flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR (epoch_us(CAST(ts AS TIMESTAMP))
                        - epoch_us(LAG(CAST(ts AS TIMESTAMP)) OVER w))
                       // 1000000 > 1800
                  THEN 1 ELSE 0 END AS is_break
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), numbered AS (
      SELECT user_id, ts,
             SUM(is_break) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    ), sess AS (
      SELECT user_id, session_id,
             MIN(ts) AS session_start, MAX(ts) AS session_end,
             COUNT(*) AS events
      FROM numbered GROUP BY user_id, session_id
    )
"""


@register(
    "streaming_sessions",
    oracle=f"""
    WITH {_SESSION_ORACLE_CTES}
    SELECT user_id, session_start, session_end, events
    FROM sess
    QUALIFY session_id < MAX(session_id) OVER (PARTITION BY user_id)
    """,
    description="custom stateful streaming operator exercised end-to-end: "
    "per-user gap sessionization via applyInPandasWithState (keyed "
    "executor-local state, update mode, closed sessions emitted as the "
    "closing gap arrives); availableNow replay of the events stream. "
    "Oracle-backed since r5: a single-file availableNow replay is "
    "deterministic — output == every session except each user's last "
    "(still open in state), which is plain window SQL",
    covers=("A16",),
)
def streaming_sessions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.streaming.sessions import streaming_sessions

    sink = f"stream_sess_{uuid.uuid4().hex[:8]}"
    # 16 state partitions: the r6 sweep over {4,8,16,32} at sf0.1 put the
    # sessionizer's sweet spot at 16 (2.75 s vs 3.02 s at the replay
    # default 8) — enough stores to parallelize the pandas state op,
    # not so many that per-store setup dominates
    result = replay_to_batch(
        spark,
        lambda s: streaming_sessions(streaming_events(s, sf_dir)),
        sink,
        mode="update",
        shuffle_partitions=16,
    )
    # no ORDER BY: the ~94k-session result is compared order-insensitively
    # (rows-only driver record) and the sort costs ~0.5 s at sf0.1
    return result


@register(
    "streaming_sessions_timeout",
    oracle=f"""
    WITH {_SESSION_ORACLE_CTES}, wm AS (
      -- Spark's event-time watermark: per-row event time floored to
      -- MILLIseconds, max over the batch, minus the 1 s delay
      SELECT (MAX(epoch_us(CAST(ts AS TIMESTAMP))) // 1000) - 1000 AS wm_ms
      FROM events
    )
    SELECT user_id, session_start, session_end, events
    FROM sess, wm
    QUALIFY session_id < MAX(session_id) OVER (PARTITION BY user_id)
         OR (epoch_us(session_end) // 1000 + 1800 * 1000) < wm_ms
    """,
    description="production stateful sessionizer: applyInPandasWithState "
    "with EventTimeTimeout — closed sessions emit on their closing gap, "
    "open sessions flush when the watermark passes last_event + gap "
    "(state bounded by ACTIVE users); availableNow replay, no-data "
    "batches advance the final watermark. Oracle-backed since r5: the "
    "final watermark of a single-file replay is max(ts)-1s (ms floor), "
    "so the flush set — open sessions with last_event_ms + gap_ms "
    "strictly below it — is deterministic window SQL",
    covers=("A16",),
)
def streaming_sessions_timeout_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ser_etl_spark.streaming.sessions import streaming_sessions_timeout

    sink = f"stream_sesst_{uuid.uuid4().hex[:8]}"
    # 16 state partitions — see streaming_sessions_query's sweep note
    result = replay_to_batch(
        spark,
        lambda s: streaming_sessions_timeout(streaming_events(s, sf_dir)),
        sink,
        mode="update",
        shuffle_partitions=16,
    )
    # no ORDER BY — same rationale as streaming_sessions
    return result


from ser_etl_spark.operators.dedup import _delta_dedup_oracle


@register(
    "streaming_incremental_dedup",
    oracle=_delta_dedup_oracle(),
    description="continuous incremental dedup exercised end-to-end: the "
    "sync delta (doc_id % 4 == 3) replayed as a multi-file availableNow "
    "stream, each micro-batch one-sided-band-joined against the "
    "PERSISTED corpus band artifact via foreachBatch (stream-static, "
    "zero streaming state — the bands are the state) — oracle-backed "
    "because a delta doc's matches are independent of other delta docs, "
    "so the per-batch union is invariant to batch boundaries and equals "
    "the batch operator's relation",
    covers=("A16", "N-dedup", "A2"),
)
def streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.operators.dedup import (
        _DELTA_MOD,
        _DELTA_REM,
        ensure_minhash_bands,
    )
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.dedup import stream_delta_dedup_replay

    docs = load_table(spark, sf_dir, "documents")
    if docs.first() is None:  # empty corpus: no artifact, no pairs
        return spark.createDataFrame(
            [], "corpus_doc bigint, delta_doc bigint, jaccard double"
        )

    def delta_pred(F):
        return (F.col("doc_id") % _DELTA_MOD) == _DELTA_REM

    from pyspark.sql import functions as F

    bands_dir = ensure_minhash_bands(spark, sf_dir)
    # files=2: enough to PROVE multi-batch execution while keeping the
    # replay cost ~2 plan-fixed batch overheads (~2.5 s each at any test
    # SF — per-batch cost is Catalyst planning + stage scheduling, not
    # data, and amortizes over real batch volumes in production); the
    # 1-vs-7-file invariance is pinned separately in tests.
    return stream_delta_dedup_replay(
        spark, sf_dir, docs.filter(delta_pred(F)), bands_dir, delta_pred,
        files=2,
    )


@register(
    "streaming_burst_flags",
    oracle="""
    WITH h AS (
      SELECT user_id,
             TIMESTAMP '1970-01-01 00:00:00'
               + to_seconds(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT))
                 AS s
      FROM events
    ), w AS (
      SELECT s AS window_start, user_id FROM h
      UNION ALL
      SELECT s - INTERVAL 30 MINUTE AS window_start, user_id FROM h
    )
    SELECT window_start,
           CAST(window_start + INTERVAL 1 HOUR AS TIMESTAMP) AS window_end,
           user_id,
           COUNT(*) AS n_events
    FROM w
    GROUP BY 1, 2, 3
    HAVING COUNT(*) >= 3
    ORDER BY window_start, user_id
    """,
    description="streaming twin of burst_detection: per-user 1 h "
    "windows sliding by 30 min over the watermarked events stream, "
    "flagged when a window holds >= 3 events (the live abuse/bot-rate "
    "guard; state bounded by the watermark horizon like any sliding "
    "agg) — complete-mode availableNow replay, oracle-backed via the "
    "epoch-aligned half-hour-shift UNION twin",
    covers=("A16", "N-quality"),
)
def streaming_burst_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.streaming.windows import sliding_window_agg

    sink = f"stream_burst_{uuid.uuid4().hex[:8]}"
    result = replay_to_batch(
        spark,
        lambda s: sliding_window_agg(
            streaming_events(s, sf_dir),
            window="1 hour",
            slide="30 minutes",
            key="user_id",
        ).filter(F.col("events") >= 3),
        sink,
        mode="complete",
        no_data_batches=False,
    )
    return result.orderBy("window_start", "user_id").select(
        "window_start",
        "window_end",
        "user_id",
        F.col("events").alias("n_events"),
    )


def _quality_gate_oracle() -> str:
    from ser_etl_spark.operators.text import (
        _STOPWORDS,
        FUNNEL_DISTINCT_X10,
        FUNNEL_MIN_TOKENS,
        FUNNEL_WLEN_HI,
        FUNNEL_WLEN_LO,
    )

    stop_list = "[" + ", ".join(f"'{s}'" for s in _STOPWORDS) + "]"
    return f"""
    WITH m AS (
      SELECT source,
             text,
             string_split(regexp_replace(trim(lower(text)),
               ' +', ' ', 'g'), ' ') AS t,
             length(regexp_replace(trim(lower(text)), ' +', ' ', 'g'))
               AS n_chr
      FROM documents
    ), fl AS (
      SELECT source,
             COALESCE(text IS NOT NULL AND trim(text) <> '', FALSE)
             AND COALESCE(len(t) >= {FUNNEL_MIN_TOKENS}, FALSE)
             AND COALESCE(n_chr - len(t) + 1 BETWEEN
                 len(t) * {FUNNEL_WLEN_LO} AND len(t) * {FUNNEL_WLEN_HI},
                 FALSE)
             AND COALESCE(len(list_distinct(t)) * 10 >=
                 len(t) * {FUNNEL_DISTINCT_X10}, FALSE)
             AND COALESCE(len(list_filter(t,
                 x -> list_contains({stop_list}, x))) >= 1, FALSE)
               AS passed
      FROM m
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CAST(passed AS BIGINT)) AS BIGINT) AS n_pass,
           CAST(COUNT(*) - SUM(CAST(passed AS BIGINT)) AS BIGINT) AS n_fail,
           CAST((SUM(CAST(passed AS BIGINT)) * 10000) // COUNT(*)
             AS BIGINT) AS pass_bp
    FROM fl GROUP BY source ORDER BY source
    """


@register(
    "streaming_quality_gate",
    oracle=_quality_gate_oracle(),
    description="continuous quality admission gate: the documents table "
    "replayed as a multi-file availableNow stream, every micro-batch "
    "applying the batch funnel's per-row admission flag and appending "
    "per-source pass/fail counts to a parquet sink (idempotent "
    "per-batch overwrite, zero streaming state, nothing on the driver) "
    "— oracle-backed because verdicts are per-row, so summed per-batch "
    "counts are invariant to batch boundaries and equal the batch "
    "filter's per-source totals",
    covers=("A16", "N-quality"),
)
def streaming_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.quality import stream_quality_gate_replay

    docs = load_table(spark, sf_dir, "documents")
    if docs.first() is None:  # empty corpus: typed empty, no stream
        return spark.createDataFrame(
            [],
            "source string, n_docs bigint, n_pass bigint, n_fail bigint, "
            "pass_bp bigint",
        )
    # files=2: proves multi-batch execution at ~2 plan-fixed batch
    # overheads (the streaming_incremental_dedup costing argument); the
    # batch-boundary invariance is pinned separately in tests.
    return stream_quality_gate_replay(spark, docs, files=2)


@register(
    "streaming_enriched_counts",
    oracle="""
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
    FROM events e JOIN customer c ON c.c_custkey = e.user_id
    GROUP BY 1 ORDER BY segment
    """,
    description="stream-static dimension enrichment driven end-to-end: "
    "the events stream joined per micro-batch to the static customer "
    "dim (broadcast hash join — no stream shuffle, no state; the dim "
    "re-resolves each batch so a snapshot refresh is picked up without "
    "restart), rolled up to per-segment event/user counts — "
    "oracle-backed because the enrichment is per-row, so the complete "
    "replay equals the batch join",
    covers=("A16", "B11"),
)
def streaming_enriched_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    import uuid as _uuid

    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.dedup import enrich_stream
    from ser_etl_spark.streaming.windows import (
        replay_to_batch,
        streaming_events,
    )

    dim = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    sink = f"stream_enrich_{_uuid.uuid4().hex[:8]}"
    # The STREAMING aggregate is one level — (segment, user) counts
    # (streaming forbids COUNT(DISTINCT) and nested aggregations); the
    # distinct-user rollup runs on the replayed BATCH result, where it
    # is an ordinary second aggregate.
    result = replay_to_batch(
        spark,
        lambda s: enrich_stream(
            streaming_events(s, sf_dir),
            load_table(s, sf_dir, "customer").select(
                F.col("c_custkey").alias("user_id"), "c_mktsegment"
            ),
            on="user_id",
            how="inner",
        )
        .groupBy(F.col("c_mktsegment").alias("segment"), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n")),
        sink,
        mode="complete",
        no_data_batches=False,
    )
    return (
        result.groupBy("segment")
        .agg(
            F.sum("n").cast("bigint").alias("n_events"),
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
        )
        .orderBy("segment")
    )


def _pii_gate_oracle() -> str:
    from ser_etl_spark.operators.text import PII_PATTERNS

    any_flag = " OR ".join(
        f"COALESCE(len(regexp_extract_all(text, '{pat}')), 0) > 0"
        for _, pat in PII_PATTERNS
    )
    return f"""
    WITH f AS (
      SELECT source,
             CASE WHEN {any_flag} THEN 1 ELSE 0 END AS _flagged
      FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(_flagged) AS BIGINT) AS n_flagged,
           CAST((10000 * SUM(_flagged)) // COUNT(*) AS BIGINT)
             AS flagged_bp
    FROM f GROUP BY source ORDER BY source
    """


@register(
    "streaming_pii_gate",
    oracle=_pii_gate_oracle(),
    description="continuous PII admission gate (r12): the documents "
    "table replayed as a multi-file availableNow stream, every "
    "micro-batch counting PII-flagged docs per source into a parquet "
    "sink (idempotent per-batch overwrite, zero streaming state) — "
    "oracle-backed because the detector verdict is per-row/stateless, "
    "so summed per-batch counts are invariant to batch boundaries and "
    "equal pii_scan's per-source flag totals",
    covers=("A16", "N-quality"),
)
def streaming_pii_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.quality import stream_pii_gate_replay

    docs = load_table(spark, sf_dir, "documents")
    if docs.first() is None:
        return spark.createDataFrame(
            [], "source string, n_docs bigint, n_flagged bigint, "
            "flagged_bp bigint"
        )
    return stream_pii_gate_replay(spark, docs, files=2)


def _media_chunk_oracle() -> str:
    from ser_etl_spark.operators.multimodal import _chunk_rollup_oracle

    return _chunk_rollup_oracle()


@register(
    "streaming_media_chunks",
    oracle=_media_chunk_oracle(),
    description="continuous multimodal ingest meter (r13): the asset "
    "manifest replayed as a multi-file availableNow stream, every "
    "micro-batch running the A/V chunk planner and appending its "
    "per-modality chunk/frame totals to a parquet sink (idempotent "
    "per-batch overwrite, zero streaming state); the overlap-overhead "
    "bp is a ratio of merged sums, never a sum of ratios — "
    "oracle-backed because the chunk plan is a pure per-asset function "
    "of the metadata, so summed per-batch totals are invariant to "
    "batch boundaries and equal media_chunk_plan's rollup",
    covers=("A16", "N-multimodal"),
)
def streaming_media_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.media import stream_media_chunks_replay

    ids = load_table(spark, sf_dir, "documents").select("doc_id")
    if ids.first() is None:
        return spark.createDataFrame(
            [],
            "media_type string, n_assets bigint, total_chunks bigint, "
            "decoded_frames bigint, source_frames bigint, "
            "overlap_overhead_bp bigint",
        )
    return stream_media_chunks_replay(spark, ids, files=2)
