"""Extraction operators (reference A1-A3, A5).

The reference extracts with ``SELECT * FROM <t>`` (full) or
``WHERE updated_at > :since ORDER BY updated_at`` (incremental) from SQL
Server into pandas (``/root/reference/etl-service/src/database.py:65-93``).
Here extraction is a lazy DataFrame whose predicate *pushes down* to the
source — Parquet row-group skipping or JDBC WHERE-clause shipping — so an
incremental pull reads only changed data, which is the property that
matters at 100 TB.

Sources are duck-typed: anything with ``read(spark, table) -> DataFrame``.
``ParquetSource`` backs tests and snapshot-to-snapshot flows;
``JdbcSource`` carries the reference's real topology (partitioned parallel
extraction instead of the reference's single pooled connection).
"""

from __future__ import annotations

import datetime as dt
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.sources.parquet import load_table


@dataclass(frozen=True)
class ParquetSource:
    """A directory of parquet tables as an extraction source."""

    path: str

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        return load_table(spark, self.path, table)


@dataclass(frozen=True)
class JdbcSource:
    """JDBC extraction source (SQL Server topology of the reference).

    ``partition_column``/``num_partitions`` split the source table into
    parallel range reads — the scale-out replacement for the reference's
    single SQLAlchemy connection pool
    (``etl-service/src/database.py:28-41``).
    """

    url: str
    properties: dict
    partition_column: str | None = None
    num_partitions: int = 8

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        reader = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option("dbtable", table)
        )
        for k, v in self.properties.items():
            reader = reader.option(k, v)
        if self.partition_column:
            reader = (
                reader.option("partitionColumn", self.partition_column)
                .option("numPartitions", str(self.num_partitions))
            )
        return reader.load()


def extract_table(
    spark: SparkSession,
    source,
    table: str,
    since: dt.datetime | None = None,
    ts_col: str = "updated_at",
) -> DataFrame:
    """Full (A1) or incremental (A2) extraction.

    The ``ts_col > since`` predicate is expressed on the lazy plan so
    Catalyst pushes it into the scan (Parquet min/max skipping; JDBC
    WHERE shipping) — client-side filtering never happens.
    """
    df = source.read(spark, table)
    if since is not None and ts_col in df.columns:
        df = df.filter(F.col(ts_col) > F.lit(since))
    return df


def max_updated_at(df: DataFrame, ts_col: str = "updated_at") -> dt.datetime | None:
    """A3: ``SELECT MAX(ts_col)`` — the new high watermark (None if empty
    or column absent)."""
    if ts_col not in df.columns:
        return None
    row = df.agg(F.max(ts_col).alias("m")).first()
    return row["m"] if row else None


def table_schema(df: DataFrame) -> list[dict]:
    """A5: schema introspection in the reference's INFORMATION_SCHEMA
    shape (``database.py:95-108``): column name, type, nullable."""
    return [
        {
            "column_name": f.name,
            "data_type": f.dataType.simpleString(),
            "is_nullable": f.nullable,
        }
        for f in df.schema.fields
    ]
