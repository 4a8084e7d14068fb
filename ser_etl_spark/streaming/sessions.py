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
timezone-proof and avoids pandas/Spark datetime coercion drift.
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
    """Build the per-key update function (self-contained for cloudpickle)."""

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

        closed: list[tuple[int, int, int, int]] = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts", "event_id"])
        for ts in batch["ts"]:
            # pandas Timestamp nanoseconds -> microseconds
            us = int(ts.value // 1_000)
            if last_us is None:
                start_us, last_us, count = us, us, 1
            elif (us - last_us) // 1_000_000 > gap_s:
                closed.append((user_id, start_us, last_us, count))
                start_us, last_us, count = us, us, 1
            else:
                last_us = us
                count += 1
        state.update((start_us, last_us, count))
        yield pd.DataFrame(
            closed,
            columns=["user_id", "session_start_us", "session_end_us", "events"],
        )

    return update


def streaming_sessions(
    events: DataFrame, gap_s: int = SESSION_GAP_S
) -> DataFrame:
    """Closed gap-sessions per user over a streaming events DataFrame.

    ``groupBy(user_id).applyInPandasWithState``: Arrow-batched state
    updates, update output mode, no timeout (open sessions persist in
    state until a closing gap arrives).
    """
    out = (
        events.select("user_id", "event_id", "ts")
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
        F.timestamp_micros(F.col("session_start_us")).alias("session_start"),
        F.timestamp_micros(F.col("session_end_us")).alias("session_end"),
        "events",
    )
