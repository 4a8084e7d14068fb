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


@dataclass(frozen=True)
class OrcSource:
    """A directory of ``<table>.orc`` files (or dirs of part files).

    Unlike CSV/JSON this is a real columnar format — predicate pushdown
    and column pruning reach the ORC scan exactly as they do for parquet
    (plan-asserted in tests), so an ORC lake can be EXTRACTED from
    efficiently, not just landed. The engine's own snapshots stay
    parquet; this source exists because ORC is the other columnar
    format large Hive/Trino estates standardize on, and "switch to this
    repo" must not require converting the estate first. Schema is taken
    from the ORC footer (self-describing — no inference pass)."""

    path: str

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return spark.read.orc(_table_file(self.path, table, "orc"))


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


def write_orc(df: DataFrame, path: str) -> None:
    """Export a DataFrame as ORC part files (columnar: stripe-level
    min/max indexes serve downstream pushdown; TIMESTAMP_NTZ round-trips
    natively, no format option needed)."""
    df.write.mode("overwrite").orc(path)
