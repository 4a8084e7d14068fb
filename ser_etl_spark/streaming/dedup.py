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
