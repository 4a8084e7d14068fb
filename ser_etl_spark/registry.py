"""Query registry: every implemented operator as a (builder, oracle) pair.

This is the engine's testable surface and the driver contract's backbone
(``__spark_entry__.queries()`` / ``oracle_sql()``): each named query has a
PySpark builder ``(spark, sf_dir) -> DataFrame`` and, where the semantics
are SQL-expressible, an equivalent ANSI-SQL oracle string that DuckDB runs
on identical Parquet — the same differential-oracle role DuckDB plays inside
the reference architecture (it *is* the reference's executor,
``/root/reference/api-service/src/query_engine.py:137``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: Builder
    #: ANSI SQL DuckDB can run on the same parquet views; None => the
    #: operator is not SQL-expressible and gets a rows-only check.
    oracle: str | None
    description: str = ""
    #: SURVEY.md §2 operator ids this query covers (e.g. "B5", "A2").
    covers: tuple[str, ...] = field(default=())


#: name -> spec; populated by operator modules at import time.
REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    description: str = "",
    covers: tuple[str, ...] = (),
) -> Callable[[Builder], Builder]:
    """Decorator: add a query builder to the registry."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, description, covers)
        return fn

    return deco


def all_queries() -> dict[str, QuerySpec]:
    """Import every operator module and return the full registry."""
    # Imports are deferred so `import ser_etl_spark` stays cheap.
    from ser_etl_spark.operators import (  # noqa: F401
        analytics,
        dedup,
        join_shapes,
        multimodal,
        packing,
        relational,
        sampling,
        semistructured,
        setops,
        similarity,
        sketches,
        skew,
        temporal,
        text,
        timeseries,
    )

    return dict(REGISTRY)
