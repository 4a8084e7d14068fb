"""Stream-stream joins with watermark-bounded state.

The last missing Structured Streaming shape after windows, sessions,
dedup, and stream-static enrichment: joining two event streams on a key
within a time bound (the streaming attribution-window join — the
streaming twin of ``operators/temporal.py`` ``interval_join``).

Scale design: BOTH sides carry a watermark and the join condition
bounds ``right_ts`` to ``[left_ts, left_ts + horizon]``, which is
exactly what Spark needs to expire join state — each side's buffered
rows are dropped once the watermark passes their eligibility window, so
state per key is one horizon's worth of events, never the stream
history. An unbounded-condition stream-stream join would grow state
forever (the documented failure mode this module exists to avoid).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Inner-join two streams on ``on`` with ``right_ts`` inside
    ``[left_ts, left_ts + horizon]``; state expires via watermarks.

    Column names must already be disjoint apart from ``on`` (rename
    before calling — streaming self-joins otherwise collide).
    """
    l_wm = left.withWatermark(left_ts, watermark)
    r_wm = right.withWatermark(right_ts, watermark)
    cond = (
        (l_wm[on] == r_wm[on])
        & (r_wm[right_ts] >= l_wm[left_ts])
        & (r_wm[right_ts] <= l_wm[left_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    return l_wm.join(r_wm, cond).drop(r_wm[on])


def view_click_stream_pairs(
    events: DataFrame, horizon: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    """(view, click) pairs within the attribution horizon, streaming.

    Splits one event stream into two typed streams and interval-joins
    them — a streaming self-join; Spark buffers each side independently
    with watermark-expired state.
    """
    views = events.filter(F.col("event_type") == "view").select(
        F.col("event_id").alias("vid"),
        "user_id",
        F.col("ts").alias("view_ts"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        F.col("user_id").alias("c_user_id"),
        F.col("ts").alias("click_ts"),
    )
    l_wm = views.withWatermark("view_ts", watermark)
    r_wm = clicks.withWatermark("click_ts", watermark)
    cond = (
        (l_wm["user_id"] == r_wm["c_user_id"])
        & (r_wm["click_ts"] >= l_wm["view_ts"])
        & (r_wm["click_ts"] <= l_wm["view_ts"] + F.expr(f"INTERVAL {horizon}"))
    )
    return l_wm.join(r_wm, cond).select(
        "user_id", "vid", "cid", "view_ts", "click_ts"
    )
