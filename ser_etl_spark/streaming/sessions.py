"""Stateful streaming sessionization via ``applyInPandasWithState``.

The custom-stateful-operator path (SURVEY.md §7.2-5 upgrade of the
reference's 60 s micro-batch loop, ``/root/reference/etl-service/src/
main.py:80-91``): per-user gap sessions maintained as keyed state across
micro-batches. Each user's open session lives in executor-local state
partitioned by ``user_id`` — no driver involvement, horizontal scale by
key cardinality. Closed sessions are emitted as soon as the gap that
closes them is observed; the final open session per user stays in state
(a production pipeline would close it via ``GroupStateTimeout``).

Semantics are the exact streaming twin of the batch
``operators.analytics.sessionize`` (same floor-of-elapsed-seconds gap
rule, same deterministic (ts, event_id) ordering), which the tests
exploit: stream output == batch sessions minus each user's last.

Timestamps cross the Arrow boundary as microsecond longs — int64 is
timezone-proof and avoids pandas/Spark datetime coercion drift; the
output re-attaches them as TIMESTAMP_NTZ (UTC wall-clock), matching the
NTZ-end-to-end event-time convention of the streaming package.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

#: Gap that closes a session, in seconds (matches the batch operator).
SESSION_GAP_S = 1800

#: Emitted for every *closed* session.
SESSION_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("session_start_us", LongType()),
        StructField("session_end_us", LongType()),
        StructField("events", LongType()),
    ]
)

#: Keyed state: the one open session for this user.
STATE_SCHEMA = StructType(
    [
        StructField("start_us", LongType()),
        StructField("last_us", LongType()),
        StructField("count", LongType()),
    ]
)


def _session_fn(gap_s: int):
    """Build the per-key update function (self-contained for cloudpickle).

    The gap scan is vectorized: event times arrive as epoch-microsecond
    int64 (timestamps never cross the Arrow boundary as datetimes —
    Spark localizes those to the SESSION timezone on the way into
    pandas, which would shift every emitted session under a non-UTC
    session), and session boundaries fall out of one numpy diff over the
    sorted array. A per-row Python loop here was the dominant cost of
    the whole streaming replay at sf0.1.
    """
    import numpy as np

    def update(
        key: tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            start_us, last_us, count = state.get
        else:
            start_us = last_us = None
            count = 0

        frames = list(pdfs)
        batch = (
            frames[0]
            if len(frames) == 1
            else pd.concat(frames, ignore_index=True)
        )
        ts = batch["ts_us"].to_numpy(np.int64, copy=True)
        if len(ts):
            order = np.lexsort((batch["event_id"].to_numpy(np.int64), ts))
            ts = ts[order]
            # start index of each within-batch session segment (floor-div
            # gap rule, identical to the batch operator)
            brk = np.flatnonzero((ts[1:] - ts[:-1]) // 1_000_000 > gap_s) + 1
            bounds = np.concatenate(([0], brk, [len(ts)]))
            seg_start = ts[bounds[:-1]]
            seg_end = ts[bounds[1:] - 1]
            seg_cnt = bounds[1:] - bounds[:-1]
            carried: list[tuple[int, int, int, int]] = []
            if last_us is not None:
                if (int(ts[0]) - last_us) // 1_000_000 > gap_s:
                    # the open session closes before this batch starts
                    carried.append((user_id, start_us, last_us, count))
                else:
                    # first segment continues the open session
                    seg_start[0] = start_us
                    seg_cnt[0] += count
            # every segment but the last closes now; the last stays open.
            # All four columns are int64, so build ONE (n, 4) array and a
            # single-block frame: the per-key pandas constructor cost is
            # what the whole replay pays 1500x per batch at sf0.1
            # (measured ~2x cheaper than the dict-of-arrays form).
            n_closed = len(seg_start) - 1
            block = np.empty((n_closed + len(carried), 4), np.int64)
            if carried:
                block[0, :] = carried[0]
            off = len(carried)
            block[off:, 0] = user_id
            block[off:, 1] = seg_start[:-1]
            block[off:, 2] = seg_end[:-1]
            block[off:, 3] = seg_cnt[:-1]
            closed = pd.DataFrame(
                block,
                columns=[
                    "user_id",
                    "session_start_us",
                    "session_end_us",
                    "events",
                ],
            )
            state.update(
                (int(seg_start[-1]), int(seg_end[-1]), int(seg_cnt[-1]))
            )
            yield closed
        else:
            state.update((start_us, last_us, count))
            yield pd.DataFrame(
                {
                    "user_id": pd.Series([], dtype="int64"),
                    "session_start_us": pd.Series([], dtype="int64"),
                    "session_end_us": pd.Series([], dtype="int64"),
                    "events": pd.Series([], dtype="int64"),
                }
            )

    return update


def streaming_sessions(
    events: DataFrame, gap_s: int = SESSION_GAP_S
) -> DataFrame:
    """Closed gap-sessions per user over a streaming events DataFrame.

    ``groupBy(user_id).applyInPandasWithState``: Arrow-batched state
    updates, update output mode, no timeout (open sessions persist in
    state until a closing gap arrives; :func:`streaming_sessions_timeout`
    is the production variant that flushes them by event-time timeout).
    """
    out = (
        events.select(
            "user_id", "event_id", F.unix_micros("ts").alias("ts_us")
        )
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return out.select(
        "user_id",
        F.expr(
            "timestampadd(MICROSECOND, session_start_us, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("session_start"),
        F.expr(
            "timestampadd(MICROSECOND, session_end_us, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("session_end"),
        "events",
    )


def _session_timeout_fn(gap_s: int):
    """Per-key update fn with event-time timeout: identical gap logic,
    plus each update arms a timeout at ``last_event + gap`` so the open
    session flushes once the watermark proves no closing event can
    arrive — no session is ever stranded in state."""
    import pandas as _pd

    inner = _session_fn(gap_s)

    import numpy as _np

    def update(key, pdfs, state):
        (user_id,) = key
        if state.hasTimedOut:
            start_us, last_us, count = state.get
            state.remove()
            # single-block int64 frame: this path runs once per ACTIVE
            # user in the final no-data flush batch (1500x at sf0.1), so
            # constructor cost is the batch's dominant term
            yield _pd.DataFrame(
                _np.array(
                    [[user_id, start_us, last_us, count]], dtype=_np.int64
                ),
                columns=[
                    "user_id", "session_start_us", "session_end_us", "events",
                ],
            )
            return
        yield from inner(key, pdfs, state)
        # state was just updated by the inner fn; arm the gap deadline
        # (epoch MILLIseconds — the GroupState timeout unit). Spark
        # rejects a timeout at or before the current watermark with
        # IllegalArgumentException — reachable when gap_s is small
        # relative to the watermark delay — so clamp to watermark + 1 ms
        # (the flush then fires on the next no-data batch, which is when
        # the watermark could first prove the session closed anyway).
        _, last_us, _ = state.get
        deadline_ms = last_us // 1_000 + gap_s * 1_000
        state.setTimeoutTimestamp(
            max(deadline_ms, state.getCurrentWatermarkMs() + 1)
        )

    return update


def streaming_sessions_timeout(
    events: DataFrame,
    gap_s: int = SESSION_GAP_S,
    watermark: str = "1 second",
) -> DataFrame:
    """Gap sessions with event-time-timeout flushing — the complete
    production sessionizer: closed sessions emit when their closing gap
    arrives, and open sessions emit once the watermark passes
    ``last_event + gap`` (Structured Streaming's no-data batches advance
    the watermark after the last file, so an ``availableNow`` replay
    flushes everything the final watermark can prove closed). State is
    removed on flush — bounded by ACTIVE users only, strictly smaller
    than the no-timeout variant's all-users-ever state at 100 TB/day.
    """
    out = (
        # `ts` stays in the projection: event-time timeout requires the
        # watermarked column to reach the stateful operator. The pandas
        # fn reads only ts_us (int64) — the datetime column is ignored.
        events.select(
            "user_id", "event_id", "ts", F.unix_micros("ts").alias("ts_us")
        )
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_timeout_fn(gap_s),
            outputStructType=SESSION_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
    return out.select(
        "user_id",
        F.expr(
            "timestampadd(MICROSECOND, session_start_us, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("session_start"),
        F.expr(
            "timestampadd(MICROSECOND, session_end_us, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias("session_end"),
        "events",
    )
