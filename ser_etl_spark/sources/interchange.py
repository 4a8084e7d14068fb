"""CSV / JSON-lines interchange sources and sinks.

The reference's only sources are SQL Server (JDBC) and the S3 snapshot
file; CSV and JSON-lines are the interchange formats everything else in
a data platform speaks, so the engine supports them as first-class
extraction sources (duck-typed like ``ParquetSource``: anything with
``read(spark, table)``) and as export sinks.

Scale notes, encoded as defaults rather than prose:

- **Schema inference is a full extra pass over the data** — at 100 TB
  that doubles the read. Both sources accept a DDL ``schema`` string and
  tests always pass one; inference is the explicit-opt-in fallback for
  exploration.
- CSV/JSON files are line-splittable, so executors parallelize by byte
  range like parquet — but there is no column pruning or predicate
  pushdown, which is why these are *interchange* formats: land the data,
  convert to parquet snapshots (``etl.build``), query the parquet.
- Timestamps are written/read as ISO-8601 without timezone
  (``timestamp_ntz``), matching the engine's end-to-end NTZ discipline.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

#: ISO-8601 with microseconds, no timezone — NTZ discipline everywhere.
TS_FORMAT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


@dataclass(frozen=True)
class CsvSource:
    """A directory of ``<table>.csv`` files (or dirs of part files)."""

    path: str
    schema: str | None = None  # DDL string; None => infer (extra pass)
    header: bool = True

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        reader = (
            spark.read.option("header", str(self.header).lower())
            .option("timestampNTZFormat", TS_FORMAT)
            .option("preferDate", "false")
        )
        if self.schema is not None:
            reader = reader.schema(self.schema)
        else:
            reader = reader.option("inferSchema", "true")
        return reader.csv(_table_file(self.path, table, "csv"))


@dataclass(frozen=True)
class JsonSource:
    """A directory of ``<table>.json`` JSON-lines files."""

    path: str
    schema: str | None = None  # DDL string; None => infer (extra pass)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        reader = spark.read.option("timestampNTZFormat", TS_FORMAT)
        if self.schema is not None:
            reader = reader.schema(self.schema)
        return reader.json(_table_file(self.path, table, "json"))


def _table_file(root: str, table: str, ext: str) -> str:
    file_style = os.path.join(root, f"{table}.{ext}")
    if "://" in root:
        return file_style
    return file_style if os.path.exists(file_style) else os.path.join(root, table)


def write_csv(df: DataFrame, path: str, header: bool = True) -> None:
    """Export a DataFrame as CSV part files (one file per partition —
    writers scale out; a downstream single-file need is a ``coalesce(1)``
    decision the caller makes explicitly)."""
    (
        df.write.mode("overwrite")
        .option("header", str(header).lower())
        .option("timestampNTZFormat", TS_FORMAT)
        .csv(path)
    )


def write_json(df: DataFrame, path: str) -> None:
    """Export a DataFrame as JSON-lines part files."""
    (
        df.write.mode("overwrite")
        .option("timestampNTZFormat", TS_FORMAT)
        .json(path)
    )
