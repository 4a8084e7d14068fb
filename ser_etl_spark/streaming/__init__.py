"""Streaming: micro-batch sync scheduling + Structured Streaming windows."""

from ser_etl_spark.streaming.scheduler import run_scheduled
from ser_etl_spark.streaming.windows import (
    sliding_window_agg,
    streaming_events,
    tumbling_window_agg,
)

__all__ = [
    "run_scheduled",
    "sliding_window_agg",
    "streaming_events",
    "tumbling_window_agg",
]
