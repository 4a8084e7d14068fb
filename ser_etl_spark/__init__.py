"""ser_etl_spark — a PySpark-native analytics engine.

A brand-new engine with the query and data-processing capabilities of the
reference system ``weberjavi/ser-etl`` (a SQL Server -> DuckDB sync-and-serve
analytics platform), re-expressed idiomatically on Apache Spark:

- the validated read-only SQL surface (projection, filters, aggregates,
  group-by, order-by, limit, joins, catalog introspection) becomes Spark
  DataFrame / Spark SQL plans optimized by Catalyst
  (``ser_etl_spark.operators.relational``, ``ser_etl_spark.gateway``);
- the 60-second snapshot ETL loop (incremental watermark extraction,
  materialization with index-replacing write layout, versioned publish with
  manifest + retention) becomes Parquet snapshot pipelines
  (``ser_etl_spark.etl``) drivable by Structured Streaming
  (``ser_etl_spark.streaming``);
- beyond the reference, large-scale training-data pipeline operators
  (deduplication, similarity search, text analysis, multimodal plumbing)
  are first-class distributed transforms (``ser_etl_spark.operators``).

Every operator is a pure DataFrame -> DataFrame transform designed for a
multi-executor cluster at 100 TB scale (no driver-side collects in the data
path, broadcast-vs-shuffle join choices made explicitly, aggregation kept
partial-final, Python kept out of hot paths).
"""

__version__ = "0.1.0"

from ser_etl_spark.session import get_spark  # noqa: F401
