"""ETL pipeline: extract -> build snapshot -> publish -> schedule.

The reference's 60-second sync cycle (``/root/reference/etl-service/src/
sync.py:123-170``) re-expressed as Parquet snapshot pipelines: JDBC/Parquet
extraction with timestamp watermarks, snapshot materialization with an
index-replacing sorted write layout, and atomic versioned publish with a
JSON manifest and retention.
"""

from ser_etl_spark.etl.extract import ParquetSource, extract_table, max_updated_at
from ser_etl_spark.etl.build import build_snapshot
from ser_etl_spark.etl.publish import cleanup_old_versions, publish_snapshot
from ser_etl_spark.etl.state import WatermarkStore
from ser_etl_spark.etl.sync import SyncManager

__all__ = [
    "ParquetSource",
    "SyncManager",
    "WatermarkStore",
    "build_snapshot",
    "cleanup_old_versions",
    "extract_table",
    "max_updated_at",
    "publish_snapshot",
]
