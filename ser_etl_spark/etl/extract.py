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

    Spark's JDBC reader requires ``lowerBound``/``upperBound`` whenever
    ``partitionColumn`` is set ("Partitioning incompletely specified"
    otherwise). Bounds can be given statically (``lower_bound``/
    ``upper_bound``) or probed from the source with one
    ``SELECT MIN(col), MAX(col)`` round-trip (``probe_bounds=True`` —
    the same pattern Spark's own docs recommend; cost is one scalar
    query per sync cycle).
    """

    url: str
    properties: dict
    partition_column: str | None = None
    num_partitions: int = 8
    lower_bound: int | str | None = None
    upper_bound: int | str | None = None
    probe_bounds: bool = False

    def reader_options(self, table: str) -> dict[str, str]:
        """The complete option dict handed to ``spark.read.format("jdbc")``
        — separated from ``read`` so partitioning completeness is unit-
        testable without a live endpoint."""
        opts = {"url": self.url, "dbtable": table}
        opts.update({k: str(v) for k, v in self.properties.items()})
        if self.partition_column:
            if self.lower_bound is None or self.upper_bound is None:
                raise ValueError(
                    "JdbcSource: partition_column requires lower_bound and "
                    "upper_bound (or probe_bounds=True to derive them via "
                    "a MIN/MAX probe); Spark refuses incompletely "
                    "specified partitioning"
                )
            opts.update(
                partitionColumn=self.partition_column,
                numPartitions=str(self.num_partitions),
                lowerBound=str(self.lower_bound),
                upperBound=str(self.upper_bound),
            )
        return opts

    def _with_probed_bounds(self, spark: SparkSession, table: str) -> "JdbcSource":
        """One-row MIN/MAX probe (non-partitioned read of an aggregate
        pushdown query) to fill the range bounds."""
        probe = (
            spark.read.format("jdbc")
            .option("url", self.url)
            .option(
                "dbtable",
                f"(SELECT MIN({self.partition_column}) AS lo, "
                f"MAX({self.partition_column}) AS hi FROM {table}) b",
            )
        )
        for k, v in self.properties.items():
            probe = probe.option(k, str(v))
        row = probe.load().first()
        import dataclasses

        return dataclasses.replace(
            self, lower_bound=row["lo"], upper_bound=row["hi"], probe_bounds=False
        )

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        src = self
        if self.partition_column and self.probe_bounds and (
            self.lower_bound is None or self.upper_bound is None
        ):
            src = self._with_probed_bounds(spark, table)
        reader = spark.read.format("jdbc")
        for k, v in src.reader_options(table).items():
            reader = reader.option(k, v)
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
