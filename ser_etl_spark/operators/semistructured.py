"""Semi-structured (JSON) column operators.

The events fixture carries a JSON ``props`` string per row — the shape
of every real event pipeline. Extraction uses ``get_json_object``
(JVM-side JSON path evaluation, no Python); for a known stable schema at
scale the faster move is ``from_json`` with an explicit struct type once
at ingest, then columnar storage — which is exactly what
``extract_props`` hands to the snapshot builder.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def extract_props(events: DataFrame, fields: dict[str, str]) -> DataFrame:
    """Project JSON ``props`` paths into typed columns.

    ``fields`` maps output column -> JSON path (``$.key``); values cast
    to long (the fixture's props are integral). One pass, codegen,
    row-local — scales embarrassingly.
    """
    cols = [
        F.get_json_object(F.col("props"), path).cast("long").alias(name)
        for name, path in fields.items()
    ]
    return events.select("event_id", "user_id", "event_type", *cols)


@register(
    "json_props_stats",
    oracle="""
    SELECT event_type,
           COUNT(*) AS events,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS BIGINT)) AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
    description="JSON property extraction (get_json_object, JVM path "
    "eval) + exact integer aggregation per event type",
    covers=("X-json",),
)
def json_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("long")
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )
