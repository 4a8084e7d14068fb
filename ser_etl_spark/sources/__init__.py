"""Source connectors: Parquet snapshot directories and JDBC extraction."""

from ser_etl_spark.sources.parquet import TABLES, load_table, register_views

__all__ = ["TABLES", "load_table", "register_views"]
