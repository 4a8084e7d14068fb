"""Relational query surface (SURVEY.md §2.B, §2.A scans/aggregates).

Every query class the reference's gateway admits — projection, filters,
scalar and grouped aggregation, ordering, top-k, joins, plus the ETL-side
incremental scan / watermark / summary-view operators — expressed as
Catalyst logical plans. The reference executes these inside embedded DuckDB
(``/root/reference/api-service/src/query_engine.py:137``); here Catalyst
plans them: filters and projections push into the Parquet scan, grouped
aggregation runs partial->shuffle->final, small dimensions broadcast.

Scale notes (100 TB):
- No builder collects or iterates driver-side; each returns a lazy plan.
- Aggregations use decimal-exact sums (``functions.numeric``) — still
  whole-stage-codegen JVM arithmetic, with map-side partial aggregation.
- Dimension joins (`region`, `nation`, `customer` at small SF) are hinted
  with ``F.broadcast``; fact-fact joins are left to sort-merge + AQE.
- Top-k (ORDER BY + LIMIT) becomes ``TakeOrderedAndProject`` — no global
  sort is materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.functions.broadcast import broadcast_if_dim
from ser_etl_spark.functions.numeric import davg, dsum, sql_davg, sql_dsum
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


# ---------------------------------------------------------------------------
# B1/B2 — projection
# ---------------------------------------------------------------------------


@register(
    "select_all",
    oracle="SELECT * FROM customer",
    description="B1 full projection (whitelist `select_all`, "
    "query_whitelist.json:3-8)",
    covers=("B1",),
)
def select_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "customer").select("*")


@register(
    "select_columns",
    oracle="SELECT p_partkey, p_name, p_brand, p_retailprice FROM part",
    description="B2 column projection (whitelist `select_columns`, "
    "query_whitelist.json:9-14); column pruning reaches the scan",
    covers=("B2",),
)
def select_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "part").select(
        "p_partkey", "p_name", "p_brand", "p_retailprice"
    )


# ---------------------------------------------------------------------------
# B3/B4 — scalar aggregates
# ---------------------------------------------------------------------------


@register(
    "count_star",
    oracle="SELECT COUNT(*) AS cnt FROM lineitem",
    description="B3 COUNT(*) (whitelist `count`, query_whitelist.json:15-20)",
    covers=("B3",),
)
def count_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("cnt"))


@register(
    "summary_view",
    oracle=f"""
    SELECT COUNT(*) AS cnt,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           MIN(l_shipdate) AS min_ship,
           MAX(l_shipdate) AS max_ship
    FROM lineitem
    """,
    description="B4 scalar aggregates + A10: the reference's "
    "v_inventory_summary view (COUNT/SUM/AVG/MIN/MAX, "
    "etl-service/src/sync.py:105-114) over the fact table",
    covers=("B4", "A10"),
)
def summary_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("cnt"),
        dsum("l_quantity").alias("sum_qty"),
        davg("l_extendedprice").alias("avg_price"),
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


# ---------------------------------------------------------------------------
# B5 — grouped aggregation (pricing-summary style)
# ---------------------------------------------------------------------------


@register(
    "group_by",
    oracle=f"""
    SELECT l_returnflag,
           l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    description="B5 GROUP BY hash aggregate (whitelist `group_by`, "
    "query_whitelist.json:27-32); partial+final agg, no sort",
    covers=("B5",),
)
def group_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        dsum("l_quantity").alias("sum_qty"),
        dsum("l_extendedprice").alias("sum_base_price"),
        dsum(disc_price, 4).alias("sum_disc_price"),
        davg("l_quantity").alias("avg_qty"),
        davg("l_discount").alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# ---------------------------------------------------------------------------
# B6 — WHERE predicates (pushdown)
# ---------------------------------------------------------------------------


@register(
    "where_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    description="B6 WHERE with range/BETWEEN/comparison predicates "
    "(whitelist `where_clause`, query_whitelist.json:33-38); all predicates "
    "push down to the Parquet scan",
    covers=("B6",),
)
def where_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    # timestamp_ntz literals: parsing is session-timezone-independent,
    # matching the NTZ parquet columns (a plain `timestamp` literal would
    # shift with spark.sql.session.timeZone and change the row set).
    return li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
        & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    ).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )


# ---------------------------------------------------------------------------
# B7 — ORDER BY
# ---------------------------------------------------------------------------


@register(
    "order_by",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC NULLS LAST, c_custkey
    """,
    description="B7 ORDER BY (whitelist `order_by`, query_whitelist.json:39-44)"
    " with explicit NULLS direction to bridge Spark NULLS-FIRST vs DuckDB "
    "NULLS-LAST defaults",
    covers=("B7",),
)
def order_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name", "c_acctbal")
        .orderBy(F.col("c_acctbal").desc_nulls_last(), F.col("c_custkey").asc())
    )


# ---------------------------------------------------------------------------
# B8 — LIMIT / top-k
# ---------------------------------------------------------------------------


@register(
    "top_k",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 100
    """,
    description="B8 ORDER BY + LIMIT top-k (whitelist `limit`, "
    "query_whitelist.json:45-50); Catalyst plans TakeOrderedAndProject — "
    "per-partition heaps, no global sort; o_orderkey tiebreak keeps the "
    "row set deterministic",
    covers=("B8",),
)
def top_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


# ---------------------------------------------------------------------------
# B11 — joins
# ---------------------------------------------------------------------------


@register(
    "join_fact_dim",
    oracle=f"""
    SELECT c.c_mktsegment,
           COUNT(*) AS cnt,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_mktsegment
    """,
    description="B11 fact-dim-dim join (admitted by the loose allow-pattern, "
    "api-service/src/config.py:34): lineitem ⋈ orders shuffles on orderkey; "
    "customer broadcasts (small dim); revenue aggregated per segment",
    covers=("B11",),
)
def join_fact_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_dim(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            dsum(revenue, 4).alias("revenue"),
        )
    )


@register(
    "join_broadcast_dims",
    oracle=f"""
    SELECT r.r_name,
           COUNT(*) AS customers,
           {sql_dsum('c.c_acctbal')} AS total_acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    description="B11 snowflake dim chain: nation and region broadcast to the "
    "customer scan — zero shuffles before the final aggregation",
    covers=("B11",),
)
def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey", "c_acctbal")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("customers"),
            dsum("c_acctbal").alias("total_acctbal"),
        )
    )


# ---------------------------------------------------------------------------
# A2/A3 — incremental scan + watermark aggregate (ETL extraction semantics)
# ---------------------------------------------------------------------------

#: Fixed "last sync" watermark inside the events fixture's 2024-01 range.
_WATERMARK = "2024-01-25 00:00:00"


@register(
    "incremental_scan",
    oracle=f"""
    SELECT event_id, user_id, event_type, value, CAST(ts AS TIMESTAMP) AS ts
    FROM events
    WHERE ts > TIMESTAMP '{_WATERMARK}'
    """,
    description="A2 incremental extraction: WHERE updated_at > :since "
    "(etl-service/src/database.py:79-84) as a pushed-down timestamp "
    "predicate on the events table",
    covers=("A2",),
)
def incremental_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    return ev.filter(F.col("ts") > F.lit(_WATERMARK).cast("timestamp_ntz")).select(
        "event_id", "user_id", "event_type", "value", "ts"
    )


@register(
    "max_watermark",
    oracle="SELECT CAST(MAX(ts) AS TIMESTAMP) AS max_ts FROM events",
    description="A3 SELECT MAX(updated_at) watermark probe "
    "(etl-service/src/database.py:57-63); parquet footer stats answer this "
    "without a full scan when aggregate pushdown applies",
    covers=("A3",),
)
def max_watermark(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _t(spark, sf_dir, "events").agg(F.max("ts").alias("max_ts"))


# ---------------------------------------------------------------------------
# Windowed aggregation (batch form of the streaming upgrade path)
# ---------------------------------------------------------------------------


@register(
    "windowed_agg",
    oracle=f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS events,
           {sql_dsum('value', 4)} AS sum_value
    FROM events
    GROUP BY 1, 2
    """,
    description="Tumbling 1h window aggregate over the events stream table — "
    "the batch-equivalent of the Structured Streaming upgrade of the "
    "reference's 60s micro-batch loop (etl-service/src/main.py:80-91)",
    covers=("A16",),
)
def windowed_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events")
    # Hour truncation in NTZ space via timestampdiff/timestampadd —
    # F.date_trunc would coerce TIMESTAMP_NTZ through the session timezone
    # and shift the window boundaries under non-UTC sessions.
    trunc_hour = F.expr(
        "timestampadd(HOUR, "
        "timestampdiff(HOUR, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts), "
        "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )
    return (
        ev.groupBy(
            trunc_hour.alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("events"),
            dsum("value", 4).alias("sum_value"),
        )
    )
