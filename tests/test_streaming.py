"""Streaming tests: scheduler semantics + Structured Streaming windows
driven end-to-end into a memory sink and checked against the batch plan."""

from __future__ import annotations

import pytest

from ser_etl_spark.streaming.scheduler import run_scheduled
from ser_etl_spark.streaming.windows import (
    run_to_memory,
    sliding_window_agg,
    streaming_events,
    tumbling_window_agg,
)


class TestScheduler:
    def test_immediate_first_run_and_count(self):
        runs = []
        n = run_scheduled(lambda: runs.append(1), interval_s=0.01, max_cycles=3)
        assert n == 3 and len(runs) == 3

    def test_overrun_coalesces(self):
        """A cycle longer than the interval fires the next cycle
        immediately — exactly once, not once per missed tick."""
        now = [0.0]
        sleeps: list[float] = []

        def clock():
            return now[0]

        def sleep(s):
            sleeps.append(s)
            now[0] += s

        def slow():
            now[0] += 2.5  # 2.5x the interval

        run_scheduled(slow, interval_s=1.0, max_cycles=3, sleep=sleep, clock=clock)
        # no sleep between overrunning cycles (coalesced catch-up)
        assert sleeps == []

    def test_fast_cycles_sleep_to_tick(self):
        now = [0.0]
        sleeps: list[float] = []

        def clock():
            return now[0]

        def sleep(s):
            sleeps.append(s)
            now[0] += s

        run_scheduled(lambda: None, interval_s=1.0, max_cycles=3, sleep=sleep, clock=clock)
        assert sleeps == [1.0, 1.0]

    def test_stop_mid_cycle_completes_it_then_exits(self):
        """r9 directive #6: a stop raised DURING a cycle never interrupts
        it — the cycle completes (no abandoned sync work), then the loop
        returns without starting another."""
        import threading

        stop = threading.Event()
        runs = []

        def work():
            runs.append(1)
            if len(runs) == 2:
                stop.set()  # e.g. SIGTERM arrives while cycle 2 runs

        n = run_scheduled(work, interval_s=0.01, max_cycles=100, stop=stop)
        assert n == 2 and len(runs) == 2  # cycle 2 finished, 3 never began

    def test_stop_during_sleep_wakes_immediately(self):
        """A stop set while the loop is sleeping to the next tick ends
        the wait at once — no full-interval latency on shutdown."""
        import threading
        import time as _time

        stop = threading.Event()
        runs = []

        def work():
            runs.append(1)
            if len(runs) == 1:
                threading.Timer(0.05, stop.set).start()

        t0 = _time.monotonic()
        n = run_scheduled(work, interval_s=30.0, max_cycles=5, stop=stop)
        assert n == 1 and _time.monotonic() - t0 < 5.0  # not ~30 s

    def test_stop_set_before_start_runs_nothing(self):
        import threading

        stop = threading.Event()
        stop.set()
        assert run_scheduled(lambda: 1 / 0, interval_s=0.01, stop=stop) == 0

    def test_signal_handler_sets_event_and_restores(self):
        """install_signal_handlers mirrors the reference's SIGINT/SIGTERM
        hook (etl-service main.py:43-56) cooperatively: the handler only
        flags the event; previous handlers are returned for restore."""
        import os
        import signal
        import threading

        from ser_etl_spark.streaming.scheduler import install_signal_handlers

        stop = threading.Event()
        prev = install_signal_handlers(stop, signals=(signal.SIGUSR1,))
        try:
            os.kill(os.getpid(), signal.SIGUSR1)
            assert stop.wait(timeout=5.0)
        finally:
            signal.signal(signal.SIGUSR1, prev[signal.SIGUSR1])


@pytest.mark.usefixtures("spark")
class TestWindows:
    def test_tumbling_matches_batch(self, spark, sf_small):
        from pyspark.sql import functions as F

        from ser_etl_spark.sources.parquet import load_table

        # complete mode emits open windows too; append would (correctly)
        # withhold windows the watermark hasn't closed yet
        stream = tumbling_window_agg(streaming_events(spark, sf_small))
        run_to_memory(stream, "tumbling_out", mode="complete")
        got = {
            (r["window_start"], r["event_type"]): (r["events"], r["sum_value"])
            for r in spark.table("tumbling_out").collect()
        }

        from ser_etl_spark.functions.numeric import dsum

        batch = (
            load_table(spark, sf_small, "events")
            .withColumn("ts", F.to_utc_timestamp(F.col("ts"), "UTC"))
            .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
            # dsum matches the stream side: both sum exact decimals, so
            # the comparison is equality, not float-artifact tolerance
            .agg(F.count(F.lit(1)).alias("events"), dsum("value", 4).alias("sum_value"))
            .collect()
        )
        want = {
            (r["w"]["start"], r["event_type"]): (r["events"], r["sum_value"])
            for r in batch
        }
        assert got == want
        assert len(got) > 100  # ~30 days x 24h x types — real window spread

    def test_sliding_windows_overlap(self, spark, sf_small):
        stream = sliding_window_agg(
            streaming_events(spark, sf_small), window="2 hours", slide="1 hour"
        )
        run_to_memory(stream, "sliding_out", mode="complete")
        rows = spark.table("sliding_out").collect()
        # every event lands in exactly window/slide = 2 windows
        total_events = sum(r["events"] for r in rows)
        assert total_events == 2 * 1000


@pytest.mark.usefixtures("spark")
class TestStatefulSessions:
    def test_streaming_sessions_match_batch_closed(self, spark, sf_small):
        """Streamed closed sessions == batch sessions minus each user's
        last (still-open) session, with identical boundaries/counts."""
        from pyspark.sql import functions as F

        from ser_etl_spark.operators.analytics import sessionize
        from ser_etl_spark.sources.parquet import load_table
        from ser_etl_spark.streaming.sessions import streaming_sessions
        from ser_etl_spark.streaming.windows import run_to_memory, streaming_events

        stream = streaming_sessions(streaming_events(spark, sf_small))
        run_to_memory(stream, "sessions_out", mode="update")
        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["events"])
            for r in spark.table("sessions_out").collect()
        }

        batch_all = sessionize(load_table(spark, sf_small, "events"))
        last = batch_all.groupBy("user_id").agg(
            F.max("session_id").alias("session_id")
        )
        closed = batch_all.join(last, ["user_id", "session_id"], "left_anti")
        # batch ts is NTZ; the stream pins instants to UTC — compare in UTC
        want = {
            (
                r["user_id"],
                r["session_start"],
                r["session_end"],
                r["events"],
            )
            for r in closed.withColumn(
                "session_start", F.to_utc_timestamp("session_start", "UTC")
            )
            .withColumn("session_end", F.to_utc_timestamp("session_end", "UTC"))
            .collect()
        }
        assert got == want
        assert len(got) > 50  # real session spread across 150 users


@pytest.mark.usefixtures("spark")
class TestStreamingDedup:
    def test_duplicated_stream_dedups_to_distinct(self, spark, sf_small):
        """A stream unioned with itself (every event arrives twice)
        dedups back to exactly the distinct event_ids."""
        from ser_etl_spark.sources.parquet import load_table
        from ser_etl_spark.streaming.dedup import streaming_dedup

        s = streaming_events(spark, sf_small)
        doubled = s.union(s)
        run_to_memory(
            streaming_dedup(doubled, key="event_id"), "dedup_out"
        )
        got = spark.table("dedup_out")
        distinct_ids = (
            load_table(spark, sf_small, "events").select("event_id").distinct()
        )
        assert got.count() == distinct_ids.count()
        assert got.select("event_id").distinct().count() == got.count()

    def test_enrich_stream_broadcasts_dimension(self, spark, sf_small):
        """Stream-static join: every event picks up its user's segment;
        row count is preserved (left join, unique dim keys)."""
        from pyspark.sql import functions as F

        from ser_etl_spark.sources.parquet import load_table
        from ser_etl_spark.streaming.dedup import enrich_stream

        events = load_table(spark, sf_small, "events")
        dim = (
            events.select("user_id")
            .distinct()
            .withColumn("segment", F.pmod(F.col("user_id"), F.lit(4)))
        )
        enriched = enrich_stream(
            streaming_events(spark, sf_small), F.broadcast(dim)
        )
        run_to_memory(enriched, "enriched_out")
        out = spark.table("enriched_out")
        assert out.count() == events.count()
        assert "segment" in out.columns
        bad = out.filter(
            F.pmod(F.col("user_id"), F.lit(4)) != F.col("segment")
        )
        assert bad.count() == 0


class TestStreamStreamJoin:
    def test_stream_pairs_equal_batch_interval_join(self, spark, sf_small):
        """The watermarked stream-stream attribution join replayed with
        availableNow produces exactly the batch interval join's pairs."""
        import uuid

        from pyspark.sql import functions as F

        from ser_etl_spark.sources.parquet import load_table
        from ser_etl_spark.streaming.joins import view_click_stream_pairs
        from ser_etl_spark.streaming.windows import run_to_memory, streaming_events

        sink = f"vc_{uuid.uuid4().hex[:8]}"
        run_to_memory(
            view_click_stream_pairs(streaming_events(spark, sf_small)),
            sink,
            mode="append",
        )
        got = {
            (r["vid"], r["cid"])
            for r in spark.table(sink).select("vid", "cid").collect()
        }

        events = load_table(spark, sf_small, "events")
        v = events.filter(F.col("event_type") == "view").select(
            F.col("event_id").alias("vid"), "user_id", F.col("ts").alias("view_ts")
        )
        c = events.filter(F.col("event_type") == "click").select(
            F.col("event_id").alias("cid"),
            F.col("user_id").alias("c_user_id"),
            F.col("ts").alias("click_ts"),
        )
        batch = v.join(
            c,
            (v["user_id"] == c["c_user_id"])
            & (c["click_ts"] >= v["view_ts"])
            & (c["click_ts"] <= v["view_ts"] + F.expr("INTERVAL 30 MINUTES")),
        )
        want = {(r["vid"], r["cid"]) for r in batch.select("vid", "cid").collect()}
        assert got == want
        assert want  # non-degenerate at sf0.001


class TestReplayIsolation:
    """replay_to_batch leaves the caller's session untouched: no
    shuffle-partition mutation (raced with concurrent query builds when
    run_to_memory overrode the shared conf) and no retained memory-sink
    views."""

    def test_caller_conf_and_catalog_untouched(self, spark, sf_small):
        from ser_etl_spark.streaming.windows import replay_to_batch

        key = "spark.sql.shuffle.partitions"
        before = spark.conf.get(key)
        views_before = {
            t.name for t in spark.catalog.listTables() if t.isTemporary
        }

        result = replay_to_batch(
            spark,
            lambda s: tumbling_window_agg(streaming_events(s, sf_small)),
            "iso_probe_sink",
            mode="complete",
            shuffle_partitions=4,
        )
        assert result.count() > 0
        assert spark.conf.get(key) == before
        views_after = {
            t.name for t in spark.catalog.listTables() if t.isTemporary
        }
        assert "iso_probe_sink" not in views_after
        assert views_after == views_before

    def test_result_is_local_and_reusable(self, spark, sf_small):
        from ser_etl_spark.streaming.windows import replay_to_batch

        result = replay_to_batch(
            spark,
            lambda s: tumbling_window_agg(streaming_events(s, sf_small)),
            "iso_probe_sink2",
            mode="complete",
        )
        # collectable twice (a dropped-sink-backed frame would fail)
        assert result.count() == result.count()


class TestSessionTimeout:
    def test_timeout_flushes_provably_closed_sessions(self, spark, sf_small):
        """With event-time timeout, output = closed-by-gap sessions PLUS
        open sessions whose gap deadline the final watermark passed —
        computed exactly from the batch twin."""
        import pyspark.sql.functions as F

        from ser_etl_spark.operators.analytics import sessionize
        from ser_etl_spark.sources.parquet import load_table
        from ser_etl_spark.streaming.sessions import (
            SESSION_GAP_S,
            streaming_sessions_timeout,
        )
        from ser_etl_spark.streaming.windows import replay_to_batch

        got = {
            (r["user_id"], r["session_start"], r["session_end"], r["events"])
            for r in replay_to_batch(
                spark,
                lambda s: streaming_sessions_timeout(
                    __import__(
                        "ser_etl_spark.streaming.windows",
                        fromlist=["streaming_events"],
                    ).streaming_events(s, sf_small)
                ),
                "sess_timeout_sink",
                mode="update",
            ).collect()
        }

        ev = load_table(spark, sf_small, "events")
        batch = sessionize(ev).collect()
        max_ts = ev.agg(F.max("ts")).first()[0]
        # final watermark = max event time - 1s delay (epoch seconds)
        wm_s = max_ts.timestamp() - 1
        expected = set()
        # a user's LAST session is open; it flushes iff its gap deadline
        # (session_end + gap) is at or before the final watermark
        last_per_user = {}
        for r in batch:
            key = (r["user_id"], r["session_start"], r["session_end"], r["events"])
            prev = last_per_user.get(r["user_id"])
            if prev is None or r["session_start"] > prev[1]:
                last_per_user[r["user_id"]] = (key, r["session_start"], r["session_end"])
        last_keys = {v[0] for v in last_per_user.values()}
        for r in batch:
            key = (r["user_id"], r["session_start"], r["session_end"], r["events"])
            if key not in last_keys:
                expected.add(key)  # closed by a later event
            elif r["session_end"].timestamp() + SESSION_GAP_S <= wm_s:
                expected.add(key)  # open, but provably closed by watermark
        # timestamps: batch sessionize yields NTZ; the stream yields
        # instants — compare on (user, epoch, epoch, n)
        canon = lambda s: {
            (u, a.timestamp(), b.timestamp(), n) for (u, a, b, n) in s
        }
        assert canon(got) == canon(expected)

    def test_timeout_watermark_boundary_is_strict(self, spark, tmp_path):
        """Pin the exact flush boundary the sessionizer ORACLE encodes:
        a timeout fires iff deadline_ms (last_event_ms + gap_ms) is
        STRICTLY below the final watermark (max_event_ms - delay_ms).
        The fixtures never land on the equality case, so construct it:
        user 1 has one open session at t0; user 2's lone event places
        the watermark exactly AT user 1's deadline (no flush) or 1 ms
        past it (flush). Guards both the strict `<` and the
        milliseconds-floor watermark arithmetic against Spark-version
        drift."""
        import datetime as dt

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ser_etl_spark.streaming.sessions import (
            SESSION_GAP_S,
            streaming_sessions_timeout,
        )
        from ser_etl_spark.streaming.windows import (
            replay_to_batch,
            streaming_events,
        )

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

        def run_case(name: str, t2: dt.datetime):
            d = tmp_path / name
            d.mkdir()
            table = pa.table(
                {
                    "event_id": pa.array([1, 2], pa.int64()),
                    "ts": pa.array([t0, t2], pa.timestamp("us")),
                    "user_id": pa.array([1, 2], pa.int64()),
                    "event_type": pa.array(["view", "view"]),
                    "value": pa.array([1.0, 1.0]),
                    "props": pa.array(["{}", "{}"]),
                }
            )
            pq.write_table(table, d / "events.parquet")
            rows = replay_to_batch(
                spark,
                lambda s: streaming_sessions_timeout(
                    streaming_events(s, str(d))
                ),
                f"wm_boundary_{name}",
                mode="update",
            ).collect()
            return {(r["user_id"], r["events"]) for r in rows}

        # watermark delay is 1 s; deadline(u1) = t0_ms + gap_ms.
        # Case A: max_ts = t0 + gap + 1s  => wm == deadline -> NO flush.
        at_boundary = run_case(
            "at", t0 + dt.timedelta(seconds=SESSION_GAP_S + 1)
        )
        assert at_boundary == set()
        # Case B: 1 ms past => wm = deadline + 1 -> user 1 flushes.
        past_boundary = run_case(
            "past",
            t0 + dt.timedelta(seconds=SESSION_GAP_S + 1, milliseconds=1),
        )
        assert past_boundary == {(1, 1)}


def test_stream_delta_dedup_invariant_to_batch_boundaries(spark, sf_small):
    """The soundness claim itself: the per-batch union must be identical
    under different micro-batchings (1 file vs 7 files) AND equal to the
    batch operator — a delta doc's matches never depend on other delta
    docs."""
    from pyspark.sql import functions as F

    from ser_etl_spark.operators.dedup import (
        delta_dedup_pairs,
        ensure_minhash_bands,
    )
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.dedup import stream_delta_dedup_replay

    docs = load_table(spark, sf_small, "documents")

    def delta_pred(F_):
        return (F_.col("doc_id") % 4) == 3

    delta = docs.filter(delta_pred(F))
    corpus = docs.filter(~delta_pred(F))
    bands_dir = ensure_minhash_bands(spark, sf_small)

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    one = rows(
        stream_delta_dedup_replay(
            spark, sf_small, delta, bands_dir, delta_pred, files=1
        )
    )
    many = rows(
        stream_delta_dedup_replay(
            spark, sf_small, delta, bands_dir, delta_pred, files=7
        )
    )
    batch = rows(
        delta_dedup_pairs(
            corpus,
            delta,
            corpus_bands=spark.read.parquet(bands_dir).filter(~delta_pred(F)),
        )
    )
    assert one == many == batch and batch


class TestCheckpointRecovery:
    """A16's durability half: a replay killed mid-stream and restarted
    on the SAME checkpoint must RESUME (committed micro-batches are not
    re-read) and the union of emissions must cover the input exactly
    once per committed batch — foreachBatch is at-least-once only for
    the batch in flight at the crash."""

    def test_availablenow_replay_resumes_from_checkpoint(
        self, spark, tmp_path
    ):
        src = str(tmp_path / "src")
        ckpt = str(tmp_path / "ckpt")
        data = [(i, f"v{i}") for i in range(8)]
        df = spark.createDataFrame(data, "id bigint, v string")
        # 4 single-row-ish files -> 4 micro-batches under
        # maxFilesPerTrigger=1
        df.repartition(4).write.parquet(src)

        seen_first: list[tuple] = []

        class Boom(RuntimeError):
            pass

        def crash_after_two(batch_df, batch_id):
            if batch_id >= 2:
                raise Boom("injected crash")
            seen_first.extend((r["id"], r["v"]) for r in batch_df.collect())

        stream = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            stream.writeStream.foreachBatch(crash_after_two)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        import pyspark.errors

        try:
            q.awaitTermination()
            raise AssertionError("expected the injected crash")
        except pyspark.errors.exceptions.captured.StreamingQueryException:
            pass
        assert seen_first, "first run must commit at least one batch"

        seen_second: list[tuple] = []

        def record(batch_df, batch_id):
            seen_second.extend(
                (r["id"], r["v"]) for r in batch_df.collect()
            )

        q2 = (
            spark.readStream.schema(df.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
            .writeStream.foreachBatch(record)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q2.awaitTermination()
        # resumed, not restarted: the second run must not re-read the
        # batches the first run committed
        assert len(seen_second) < len(data), (seen_first, seen_second)
        # and together they cover the input completely (at-least-once:
        # only the crashed in-flight batch may repeat, and here it was
        # never emitted, so the union is exact)
        assert sorted(seen_first + seen_second) == sorted(data)


def test_stream_quality_gate_invariant_to_batch_boundaries(spark, sf_small):
    """r9: per-source pass/fail totals must be identical under different
    micro-batchings (1 vs 7 files) AND equal the batch funnel's admission
    flag applied directly — verdicts are per-row, so batching can't move
    counts."""
    from pyspark.sql import functions as F

    from ser_etl_spark.operators.text import funnel_stage_flags
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.quality import stream_quality_gate_replay

    docs = load_table(spark, sf_small, "documents")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    one = rows(stream_quality_gate_replay(spark, docs, files=1))
    many = rows(stream_quality_gate_replay(spark, docs, files=7))
    batch = rows(
        docs.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(funnel_stage_flags()[-1].cast("bigint"))
            .cast("bigint")
            .alias("n_pass"),
        )
        .select(
            "source", "n_docs", "n_pass",
            (F.col("n_docs") - F.col("n_pass")).cast("bigint").alias("n_fail"),
            F.expr("(n_pass * 10000) div n_docs").cast("bigint").alias(
                "pass_bp"
            ),
        )
        .orderBy("source")
    )
    assert one == many == batch and batch


def test_stream_pii_gate_invariant_to_batch_boundaries(spark, sf_small):
    """r12: per-source PII-flag totals must be identical under different
    micro-batchings (1 vs 7 files) AND equal pii_scan's per-source
    docs_flagged applied directly — detector verdicts are per-row, so
    batching can't move counts."""
    from pyspark.sql import functions as F

    from ser_etl_spark.operators.text import pii_scan
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.quality import stream_pii_gate_replay

    docs = load_table(spark, sf_small, "documents")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    one = rows(stream_pii_gate_replay(spark, docs, files=1))
    many = rows(stream_pii_gate_replay(spark, docs, files=7))
    batch = rows(
        pii_scan(docs).select(
            "source",
            "n_docs",
            F.col("docs_flagged").alias("n_flagged"),
            "flagged_bp",
        )
    )
    assert one == many == batch


def test_stream_media_chunks_invariant_to_batch_boundaries(spark, sf_small):
    """r13: per-modality chunk/frame totals must be identical under
    different micro-batchings (1 vs 7 files) AND equal the batch chunk
    planner's rollup applied directly — the chunk plan is a pure
    per-asset function of the metadata, so batching can't move totals
    (the overhead bp is a ratio of merged sums on both paths)."""
    from ser_etl_spark.operators.multimodal import (
        media_chunk_rollup,
        with_fake_payload,
    )
    from ser_etl_spark.sources.parquet import load_table
    from ser_etl_spark.streaming.media import stream_media_chunks_replay

    ids = load_table(spark, sf_small, "documents").select("doc_id")

    def rows(df):
        return sorted(tuple(r) for r in df.collect())

    one = rows(stream_media_chunks_replay(spark, ids, files=1))
    many = rows(stream_media_chunks_replay(spark, ids, files=7))
    batch = rows(media_chunk_rollup(with_fake_payload(ids)))
    assert one == many == batch and batch
