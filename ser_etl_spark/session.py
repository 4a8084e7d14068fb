"""SparkSession factory with scale-oriented defaults.

The reference delegates all execution to embedded DuckDB
(``/root/reference/api-service/src/query_engine.py:108,137``); here the
equivalent "engine bring-up" is a SparkSession with Catalyst/Tungsten plus
the configuration a large cluster job would want from the start:

- AQE on (runtime coalescing of shuffle partitions, skew-join splitting);
- Arrow on for any pandas interchange (the reference's pandas boundary,
  ``etl-service/src/database.py:91``);
- UTC session timezone so timestamp semantics are stable across engines;
- explicit broadcast threshold so small-dimension joins never shuffle.

On the test box this runs ``local[N]``; on a real cluster the same code runs
unmodified — nothing here assumes single-node execution.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Defaults applied when *this module* creates the session. When the driver
#: hands us an existing session (the ``__spark_entry__`` contract) we apply
#: only the runtime-settable subset via :func:`tune_session`.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # 64 MiB: every dimension table in the star schema (region..part) stays
    # broadcastable far beyond sf0.1; the fact tables never are.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.shuffle.partitions": "64",
    "spark.sql.files.maxPartitionBytes": str(128 * 1024 * 1024),
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushdown": "true",
}

#: Subset of DEFAULT_CONF that Spark allows changing on a live session.
_RUNTIME_CONF_KEYS = (
    "spark.sql.session.timeZone",
    "spark.sql.execution.arrow.pyspark.enabled",
    "spark.sql.execution.arrow.maxRecordsPerBatch",
    "spark.sql.adaptive.enabled",
    "spark.sql.adaptive.coalescePartitions.enabled",
    "spark.sql.adaptive.skewJoin.enabled",
    "spark.sql.autoBroadcastJoinThreshold",
    "spark.sql.shuffle.partitions",
    "spark.sql.files.maxPartitionBytes",
    "spark.sql.parquet.filterPushdown",
    "spark.sql.parquet.aggregatePushdown",
)


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an existing session.

    Safe to call on a session we did not create (e.g. the verify driver's):
    only runtime-mutable SQL confs are touched, and failures to set any one
    key are ignored rather than fatal.
    """
    for key in _RUNTIME_CONF_KEYS:
        try:
            spark.conf.set(key, DEFAULT_CONF[key])
        except Exception:  # pragma: no cover - conf locked down
            pass
    return spark


def explain_string(df, mode: str = "formatted") -> str:
    """The plan ``df.explain(mode)`` would print, as a string.

    Used by the plan-assertion tests (and handy interactively) to verify
    physical properties — pushed filters, pruned read schemas, broadcast
    vs shuffle joins, partial aggregation — instead of eyeballing stdout.
    """
    jqe = df._jdf.queryExecution()
    return df.sparkSession._jvm.PythonSQLUtils.explainString(jqe, mode)


def get_spark(
    app_name: str = "ser-etl-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Return the active SparkSession or build one with engine defaults.

    ``master`` resolution: explicit arg > ``$SPARK_MASTER`` >
    ``local[$SPARK_GRAFT_CPUS]`` > ``local[*]``. On a cluster the submit
    machinery sets the master and this factory only contributes conf.
    """
    active = SparkSession.getActiveSession()
    if active is not None:
        return tune_session(active)

    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = os.environ.get(
            "SPARK_MASTER", f"local[{cpus}]" if cpus else "local[*]"
        )

    builder = SparkSession.builder.appName(app_name).master(master)
    merged = {**DEFAULT_CONF, **(conf or {})}
    merged.setdefault(
        "spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g")
    )
    for key, value in merged.items():
        builder = builder.config(key, value)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
