"""Multi-join analytics and window-function extensions.

TPC-H-shaped workloads over the star schema — the "joins and subqueries
implicitly admitted" surface (SURVEY.md §2.B B11: the reference's loose
allow-pattern ``^SELECT\\s+.+\\s+FROM\\s+\\w+``,
``/root/reference/api-service/src/config.py:34``, admits arbitrary joins
straight through to the executor) — plus window functions and
sessionization, which the reference surface *excludes* and we provide as
extensions (SURVEY.md §2.B "Explicitly blocked / out of surface").

Scale design per query:
- Fact-side scans project only needed columns and carry pushed-down
  date/flag predicates; dims broadcast (``F.broadcast``) so the only
  shuffles are fact⋈fact joins on their natural keys and final
  aggregations.
- Top-k always rides ``TakeOrderedAndProject`` (ORDER BY + LIMIT) — no
  global sort materializes.
- Window functions shuffle once on the partition key; running
  aggregates use decimal accumulation (``functions.numeric``) so
  results are bit-identical to the DuckDB oracle under any
  parallelism.
- Sessionization is the batch twin of the streaming stateful operator
  (``streaming.sessions``): same gap rule, expressed with lag + a
  running break-count — one shuffle on ``user_id``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ser_etl_spark.functions.broadcast import broadcast_if_dim
from ser_etl_spark.functions.numeric import (
    fround,
    PRECISION,
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def _epoch_s(col: str) -> "F.Column":
    """Epoch seconds of an NTZ timestamp column, timezone-pure.

    ``unix_timestamp(cast(c AS TIMESTAMP))`` is the trap this replaces:
    the cast coerces NTZ through the SESSION timezone, so every derived
    epoch bucket shifts by the zone offset — identical to this form only
    under UTC. ``timestampdiff`` over an NTZ pair is pure wall-clock
    arithmetic, matching DuckDB's ``epoch(ts)`` on naive timestamps."""
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _ntz(lit: str):
    """Session-timezone-independent timestamp literal (NTZ columns)."""
    return F.lit(lit).cast("timestamp_ntz")


def _revenue():
    """Lazy: classic-mode Columns need the live JVM, so no module-level Column."""
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# ---------------------------------------------------------------------------
# TPC-H-shaped multi-join analytics (B11 surface, stress joins at scale)
# ---------------------------------------------------------------------------


@register(
    "shipping_priority",
    oracle=f"""
    SELECT l.l_orderkey,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue,
           o.o_orderdate
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, o.o_orderdate ASC, l.l_orderkey ASC
    LIMIT 10
    """,
    description="TPC-H Q3 shape: segment-filtered customer broadcasts into "
    "orders, orders⋈lineitem shuffles on orderkey, top-10 revenue via "
    "TakeOrderedAndProject",
    covers=("B11",),
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < _ntz("1998-01-01 00:00:00"))
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") > _ntz("1998-01-01 00:00:00"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o.join(broadcast_if_dim(c), o.o_custkey == c.c_custkey),
                li.l_orderkey == o.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(
            F.col("revenue").desc(),
            F.col("o_orderdate").asc(),
            F.col("l_orderkey").asc(),
        )
        .limit(10)
    )


@register(
    "local_supplier_volume",
    oracle=f"""
    SELECT n.n_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey  = s.s_suppkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND c.c_nationkey = s.s_nationkey
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n.n_name
    """,
    description="TPC-H Q5 shape: 6-way join — lineitem⋈orders shuffles on "
    "orderkey; supplier/nation/region and the customer nation-equality leg "
    "broadcast; revenue per nation",
    covers=("B11",),
)
def local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ntz("1998-01-01 00:00:00"))
        )
        .select("o_orderkey", "o_custkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "ASIA")
        .select("r_regionkey")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_dim(c), o.o_custkey == c.c_custkey)
        .join(broadcast_if_dim(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(_revenue(), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name").asc())
    )


@register(
    "top_returned_customers",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS lost_revenue,
           COUNT(*) AS returned_items
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY lost_revenue DESC, c.c_custkey
    LIMIT 20
    """,
    description="TPC-H Q10 shape: returned-item revenue per customer; "
    "returnflag predicate pushes to the lineitem scan, customer broadcasts, "
    "top-20 via TakeOrderedAndProject",
    covers=("B11",),
)
def top_returned_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_extendedprice", "l_discount")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_dim(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(_revenue(), 4).alias("lost_revenue"),
            F.count(F.lit(1)).alias("returned_items"),
        )
        .orderBy(F.col("lost_revenue").desc(), F.col("c_custkey").asc())
        .limit(20)
    )


@register(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity', 2)} AS sum_qty,
           {sql_dsum('l_extendedprice', 2)} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS sum_disc_price,
           {sql_davg('l_quantity', 2)} AS avg_qty,
           {sql_davg('l_extendedprice', 2)} AS avg_price,
           {sql_davg('l_discount', 2)} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    description="TPC-H Q1 shape: scan-heavy multi-aggregate pricing summary "
    "— one hash aggregate over the fact table with partial (map-side) "
    "combine on 6 low-cardinality groups; decimal-exact sums",
    covers=("B4", "B5", "B11"),
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") <= _ntz("2001-09-01 00:00:00")
    )
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(_revenue(), 4).alias("sum_disc_price"),
            davg("l_quantity", 2).alias("avg_qty"),
            davg("l_extendedprice", 2).alias("avg_price"),
            davg("l_discount", 2).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "revenue_forecast",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount', 4)} AS revenue_increase
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount >= 0.03 AND l_discount <= 0.07
      AND l_quantity < 24
    """,
    description="TPC-H Q6 shape: pure filter+aggregate — every predicate "
    "(date range, discount band, quantity) lands in PushedFilters on the "
    "parquet scan; no shuffle beyond the 1-row final agg",
    covers=("B4", "B6", "B11"),
)
def revenue_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
        & (F.col("l_shipdate") < _ntz("1997-01-01 00:00:00"))
        & (F.col("l_discount") >= 0.03)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        dsum(F.col("l_extendedprice") * F.col("l_discount"), 4).alias(
            "revenue_increase"
        )
    )


@register(
    "order_priority_check",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_returnflag = 'R')
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="TPC-H Q4 shape: EXISTS correlated subquery as a LEFT SEMI "
    "join on orderkey — the probe side deduplicates during the join, no "
    "distinct needed; returnflag predicate pushes into the lineitem scan",
    covers=("B11",),
)
def order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz("1997-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ntz("1998-01-01 00:00:00"))
        )
        .select("o_orderkey", "o_orderpriority")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select("l_orderkey")
    )
    return (
        o.join(li, o.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


@register(
    "promo_revenue",
    oracle=f"""
    SELECT 100.0 * {sql_dsum("CASE WHEN p.p_type = 'PROMO' "
                             "THEN l.l_extendedprice * (1 - l.l_discount) "
                             "ELSE 0.0 END", 4)}
           / {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS promo_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
    """,
    description="TPC-H Q14 shape: promo revenue share — date-pruned fact "
    "scan, part dimension broadcasts, conditional aggregate ratio in one "
    "pass (no second scan for the denominator)",
    covers=("B11",),
)
def promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz("1997-03-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1997-04-01 00:00:00"))
        )
        .select("l_partkey", "l_extendedprice", "l_discount")
    )
    p = _t(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _revenue()).otherwise(F.lit(0.0))
    return (
        li.join(broadcast_if_dim(p), li.l_partkey == p.p_partkey)
        .agg(
            (
                F.lit(100.0) * dsum(promo, 4) / dsum(_revenue(), 4)
            ).alias("promo_pct")
        )
    )


#: Q18-style "large order" quantity threshold (sf-independent semantics).
LARGE_ORDER_QTY = 250


@register(
    "large_orders",
    oracle=f"""
    SELECT c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice,
           {sql_dsum('l.l_quantity', 2)} AS total_qty
    FROM customer c
    JOIN orders o   ON c.c_custkey  = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem
      GROUP BY l_orderkey
      HAVING CAST(SUM(CAST(l_quantity AS DECIMAL(25,2))) AS DOUBLE)
             > {LARGE_ORDER_QTY}
    )
    GROUP BY c.c_name, c.c_custkey, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
    LIMIT 100
    """,
    description="TPC-H Q18 shape: IN-subquery over an aggregate — the "
    "qualifying orderkey set comes from a grouped HAVING and semi-joins "
    "back into the fact; both lineitem passes share the orderkey shuffle "
    "partitioning; top-100 via TakeOrderedAndProject",
    covers=("B11",),
)
def large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    qualifying = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity", 2).alias("_qty"))
        .filter(F.col("_qty") > LARGE_ORDER_QTY)
        .select("l_orderkey")
    )
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_name")
    big_o = o.join(
        qualifying, o.o_orderkey == qualifying.l_orderkey, "left_semi"
    )
    return (
        li.join(big_o, li.l_orderkey == big_o.o_orderkey)
        .join(broadcast_if_dim(c), big_o.o_custkey == c.c_custkey)
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dsum("l_quantity", 2).alias("total_qty"))
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "idle_customers",
    oracle=f"""
    SELECT c_mktsegment,
           COUNT(*) AS idle_customers,
           {sql_dsum('c_acctbal', 2)} AS total_balance
    FROM customer c
    WHERE c.c_acctbal > (SELECT {sql_davg('c_acctbal', 2)}
                         FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
    description="TPC-H Q22 shape: NOT EXISTS (no recent orders) as a LEFT "
    "ANTI join plus an uncorrelated scalar subquery (global avg balance) "
    "broadcast as a 1-row literal — no per-row recompute, no correlated "
    "execution",
    covers=("B11",),
)
def idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    avg_bal = (
        c.filter(F.col("c_acctbal") > 0.0)
        .agg(davg("c_acctbal", 2).alias("_avg_bal"))
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") >= _ntz("2000-01-01 00:00:00"))
        .select("o_custkey")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(o, F.col("c_custkey") == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("idle_customers"),
            dsum("c_acctbal", 2).alias("total_balance"),
        )
        .orderBy("c_mktsegment")
    )


@register(
    "sales_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    description="ROLLUP hierarchy aggregate: per (flag,status), per flag, "
    "and grand total in one pass — Catalyst expands the grouping sets "
    "with a single shuffle, partial aggregation intact",
    covers=("B5", "B11"),
)
def sales_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .rollup("l_returnflag", "l_linestatus")
        .agg(
            dsum(_revenue(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@register(
    "sales_cube",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    description="CUBE hierarchy aggregate: all 2^2 grouping combinations "
    "(per pair, per flag, per status, grand total) in one grouping-set "
    "expansion — single shuffle, partial aggregation intact",
    covers=("B5", "B11"),
)
def sales_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(
            dsum(_revenue(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


@register(
    "sales_grouping_sets",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           GROUPING(l_returnflag) + 2 * GROUPING(l_linestatus) AS gid,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 4)} AS revenue,
           COUNT(*) AS line_count
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    description="explicit GROUPING SETS (neither ROLLUP nor CUBE): "
    "marginal totals per flag and per status only, with GROUPING() ids "
    "disambiguating which dimension each row aggregates — completes the "
    "grouping-set surface; one shuffle, partial aggregation intact",
    covers=("B5",),
)
def sales_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "lineitem")
        .groupingSets(
            [["l_returnflag"], ["l_linestatus"]],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            (
                F.grouping("l_returnflag")
                + F.lit(2) * F.grouping("l_linestatus")
            ).alias("gid"),
            dsum(_revenue(), 4).alias("revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Window functions (extension beyond the reference's blocked surface)
# ---------------------------------------------------------------------------


@register(
    "window_topn_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal, rn
    FROM (
      SELECT c_mktsegment, c_custkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_mktsegment
               ORDER BY c_acctbal DESC, c_custkey ASC
             ) AS rn
      FROM customer
    )
    WHERE rn <= 3
    """,
    description="extension: top-3 customers per market segment via "
    "ROW_NUMBER — one shuffle on the partition key, rank filter prunes "
    "before any downstream work",
    covers=("X-window",),
)
def window_topn_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return (
        _t(spark, sf_dir, "customer")
        .select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_total",
    oracle=f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL({PRECISION},2))) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_spend
    FROM orders
    WHERE o_custkey < 100
    """,
    description="extension: per-customer running spend (cumulative window "
    "sum, decimal-exact so order of accumulation can't skew doubles)",
    covers=("X-window",),
)
def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    running = (
        F.sum(F.col("o_totalprice").cast(f"decimal({PRECISION},2)"))
        .over(w)
        .cast("double")
    )
    return (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 100)
        .select(
            "o_custkey", "o_orderkey", "o_orderdate",
            running.alias("running_spend"),
        )
    )


@register(
    "customer_spend_quartiles",
    oracle=f"""
    WITH spend AS (
      SELECT c.c_custkey, c.c_mktsegment,
             {sql_dsum('o.o_totalprice', 2)} AS spend
      FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey, c.c_mktsegment
    )
    SELECT c_custkey, c_mktsegment, spend,
           NTILE(4) OVER w AS quartile,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume
    FROM spend
    WINDOW w AS (PARTITION BY c_mktsegment
                 ORDER BY spend ASC, c_custkey ASC)
    """,
    description="extension: ranking-window breadth — NTILE(4) quartile, "
    "PERCENT_RANK and CUME_DIST of per-customer spend within each market "
    "segment (custkey tie-break keeps NTILE deterministic). Windows are "
    "partitioned by segment, never global: a global ranking at 100 TB "
    "would serialize into one task — the scale path is approx-quantile "
    "boundaries + bucket assignment",
    covers=("X-window",),
)
def customer_spend_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = _t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    spend = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_mktsegment")
        .agg(dsum("o_totalprice", 2).alias("spend"))
    )
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("spend").asc(), F.col("c_custkey").asc()
    )
    return spend.select(
        "c_custkey", "c_mktsegment", "spend",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


@register(
    "order_gap_stats",
    oracle="""
    WITH gaps AS (
      SELECT o_custkey,
             floor(epoch(CAST(o_orderdate AS TIMESTAMP))
                   - epoch(LAG(CAST(o_orderdate AS TIMESTAMP)) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate ASC, o_orderkey ASC
                     ))) AS gap_s
      FROM orders
    )
    SELECT o_custkey,
           COUNT(gap_s) AS n_gaps,
           CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
           CAST(MAX(gap_s) AS BIGINT) AS max_gap_s
    FROM gaps
    WHERE gap_s IS NOT NULL
    GROUP BY o_custkey
    ORDER BY o_custkey
    LIMIT 1000
    """,
    description="extension: LAG — seconds between consecutive orders per "
    "customer, aggregated to per-customer gap stats; one shuffle on the "
    "partition key, NTZ-pure second arithmetic (same floor-of-epoch rule "
    "as sessionization)",
    covers=("X-window",),
)
def order_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    gaps = (
        _t(spark, sf_dir, "orders")
        .select(
            "o_custkey",
            F.expr(
                "timestampdiff(SECOND, "
                "lag(o_orderdate) OVER (PARTITION BY o_custkey "
                "ORDER BY o_orderdate ASC, o_orderkey ASC), o_orderdate)"
            ).alias("gap_s"),
        )
        .filter(F.col("gap_s").isNotNull())
    )
    return (
        gaps.groupBy("o_custkey")
        .agg(
            F.count("gap_s").alias("n_gaps"),
            F.min("gap_s").alias("min_gap_s"),
            F.max("gap_s").alias("max_gap_s"),
        )
        .orderBy("o_custkey")
        .limit(1000)
    )


@register(
    "moving_spend_90d",
    oracle=f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL({PRECISION},2))) OVER (
             PARTITION BY o_custkey ORDER BY epoch_s ASC
             RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS spend_90d
    FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP))) AS BIGINT)
               AS epoch_s
      FROM orders WHERE o_custkey < 200
    )
    """,
    description="extension: RANGE window frame — per-customer trailing "
    "90-day spend ordered by event time (epoch seconds so the range frame "
    "is numeric and peer rows group identically on both engines); "
    "decimal-exact accumulation",
    covers=("X-window",),
)
def moving_spend_90d(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.expr(
                "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
                "o_orderdate)"
            ).alias("epoch_s"),
        )
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("epoch_s").asc())
        .rangeBetween(-7776000, 0)
    )
    spend = (
        F.sum(F.col("o_totalprice").cast(f"decimal({PRECISION},2)"))
        .over(w)
        .cast("double")
    )
    return base.select(
        "o_custkey", "o_orderkey", spend.alias("spend_90d")
    )


# ---------------------------------------------------------------------------
# Sessionization (batch twin of the streaming stateful operator)
# ---------------------------------------------------------------------------

#: Gap that closes a session, in seconds.
SESSION_GAP_S = 1800


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the time
    since the previous event exceeds ``gap_s``.

    lag → break flag → running count of breaks = session index; then one
    aggregate per (user, session). Two window passes over the same
    ``user_id`` partitioning — Catalyst reuses a single shuffle. The
    deterministic (ts, event_id) ordering makes the session ids stable
    across engines and runs.
    """
    order = [F.col("ts").asc(), F.col("event_id").asc()]
    w = Window.partitionBy("user_id").orderBy(*order)
    # timestampdiff on NTZ pairs is timezone-pure (floor of elapsed
    # seconds) — unlike unix_timestamp, which detours through the session
    # timezone; the oracle mirrors with floor(epoch(ts) - epoch(prev)).
    with_prev = events.select(
        "user_id", "event_id", "ts", F.lag("ts").over(w).alias("_prev_ts")
    )
    is_break = F.when(
        F.col("_prev_ts").isNull()
        | (F.expr("timestampdiff(SECOND, _prev_ts, ts)") > gap_s),
        1,
    ).otherwise(0)
    cum = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_session = with_prev.select(
        "user_id", "event_id", "ts",
        F.sum(is_break).over(cum).alias("session_id"),
    )
    return (
        with_session.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            "session_id",
            "events",
            "session_start",
            "session_end",
            F.expr(
                "timestampdiff(SECOND, session_start, session_end)"
            ).alias("duration_s"),
        )
    )


@register(
    "sessionize_events",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR floor(epoch(CAST(ts AS TIMESTAMP))
                             - epoch(LAG(CAST(ts AS TIMESTAMP)) OVER w))
                       > {SESSION_GAP_S}
                  THEN 1 ELSE 0 END AS is_break
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), numbered AS (
      SELECT user_id, event_id, ts,
             CAST(SUM(is_break) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS BIGINT) AS session_id
      FROM flagged
    )
    SELECT user_id, session_id,
           COUNT(*) AS events,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           CAST(floor(epoch(MAX(ts)) - epoch(MIN(ts))) AS BIGINT) AS duration_s
    FROM numbered
    GROUP BY user_id, session_id
    """,
    description="extension: gap-based sessionization (30 min) of the events "
    "stream — batch twin of the stateful streaming operator; one user_id "
    "shuffle reused across both window passes",
    covers=("X-session", "A16"),
)
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Product analytics: funnel + retention (events table)
# ---------------------------------------------------------------------------


@register(
    "conversion_funnel",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS viewed,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS clicked_after_view,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS purchased_after_click
    """,
    description="ordered conversion funnel (view -> click -> purchase, "
    "each step strictly after the previous step's first occurrence): "
    "per-step keyed aggregates chained by user_id joins — every join "
    "and aggregate shares the user_id shuffle key, and each stage's "
    "input is type-pruned at the scan",
    covers=("X-funnel", "B11"),
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("viewed"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("clicked_after_view")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("purchased_after_click")))
    )


@register(
    "retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             CAST(floor(epoch(MIN(ts)) / 604800) AS BIGINT) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id,
             CAST(floor(epoch(e.ts) / 604800) AS BIGINT) AS active_week
      FROM events e
    )
    SELECT f.cohort_week,
           CAST(a.active_week - f.cohort_week AS BIGINT) AS week_offset,
           COUNT(DISTINCT a.user_id) AS active_users
    FROM firsts f JOIN activity a ON f.user_id = a.user_id
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    description="retention cohort matrix: users bucketed by first-seen "
    "epoch-week, counted distinct per week offset — two user_id-keyed "
    "aggregates + one join reusing the same shuffle key; epoch-week "
    "arithmetic is pure integer math (no session-tz detour)",
    covers=("X-retention", "B11"),
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    # _epoch_s, not unix_timestamp(cast): the cast coerces NTZ through
    # the SESSION timezone, silently shifting bucket boundaries under any
    # non-UTC session (caught by the r6 full-surface tz probe).
    week = lambda c: F.floor(_epoch_s(c) / F.lit(604800))  # noqa: E731
    firsts = ev.groupBy("user_id").agg(F.min("ts").alias("first_ts")).select(
        "user_id", week("first_ts").alias("cohort_week")
    )
    activity = ev.select("user_id", week("ts").alias("active_week")).distinct()
    return (
        firsts.join(activity, "user_id")
        .select(
            "cohort_week",
            (F.col("active_week") - F.col("cohort_week")).alias("week_offset"),
            "user_id",
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.count_distinct("user_id").alias("active_users"))
        .orderBy("cohort_week", "week_offset")
    )


@register(
    "nation_revenue_share",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n ON s.s_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY n.n_name, r.r_name
    )
    SELECT nation, region, revenue,
           (CAST(floor((revenue / SUM(revenue) OVER (PARTITION BY region))
                 * 1e9 + 0.5) AS DOUBLE) / 1e9)
             AS share_of_region,
           (CAST(floor((revenue / SUM(revenue) OVER ())
                 * 1e9 + 0.5) AS DOUBLE) / 1e9) AS share_of_total
    FROM rev
    ORDER BY region, nation
    """,
    description="ratio-to-report windows: each nation's revenue share of "
    "its region and of the grand total — partition-wide window aggregates "
    "(no ORDER BY frame) over an already-aggregated 25-row input, so the "
    "unpartitioned total window is trivially cheap at any fact size; "
    "shares rounded to 9 decimals (division of identical decimal-exact "
    "sums differs in the last ulp across engines)",
    covers=("X-window", "B11"),
)
def nation_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = _t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(broadcast_if_dim(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(dsum(_revenue(), 4).alias("revenue"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    return rev.select(
        "nation", "region", "revenue",
        # fround: exact-decimal revenue ratio — tie-reachable at the
        # 10th decimal (r10 round-half-tie audit).
        fround(F.col("revenue") / F.sum("revenue").over(w_region), 9)
        .alias("share_of_region"),
        fround(F.col("revenue") / F.sum("revenue").over(w_all), 9)
        .alias("share_of_total"),
    ).orderBy("region", "nation")


@register(
    "session_concurrency",
    oracle=f"""
    WITH sess AS (
      SELECT user_id, session_id, MIN(ts) AS s_start, MAX(ts) AS s_end
      FROM (
        SELECT user_id, event_id, ts,
               CAST(SUM(is_break) OVER (
                 PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS session_id
        FROM (
          SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR floor(epoch(CAST(ts AS TIMESTAMP))
                                 - epoch(LAG(CAST(ts AS TIMESTAMP)) OVER w))
                           > {SESSION_GAP_S}
                      THEN 1 ELSE 0 END AS is_break
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
        )
      )
      GROUP BY user_id, session_id
    ), deltas AS (
      SELECT CAST(floor(epoch(s_start) / 3600) AS BIGINT) AS hour_bucket,
             CAST(1 AS BIGINT) AS delta
      FROM sess
      UNION ALL
      SELECT CAST(floor(epoch(s_end) / 3600) AS BIGINT) + 1, CAST(-1 AS BIGINT)
      FROM sess
    ), per_hour AS (
      SELECT hour_bucket, CAST(SUM(delta) AS BIGINT) AS net FROM deltas
      GROUP BY hour_bucket
    )
    SELECT hour_bucket,
           CAST(SUM(net) OVER (ORDER BY hour_bucket ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_sessions
    FROM per_hour
    ORDER BY hour_bucket
    """,
    description="interval concurrency via the +1/-1 sweep: sessions emit "
    "a start/+1 and end/-1 delta, deltas AGGREGATE to hour buckets FIRST "
    "(the keyed shuffle does the heavy lifting), then one running sum "
    "over the few-hundred-row bucket series — the aggregate-then-window "
    "pattern that keeps global prefix sums off the fact table at 100 TB",
    covers=("X-session", "X-window"),
)
def session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    sess = sessionize(_t(spark, sf_dir, "events")).select(
        "session_start", "session_end"
    )
    # _epoch_s keeps the hour buckets timezone-pure: the previous
    # unix_timestamp(cast) form shifted every bucket by the session-tz
    # offset, changing boundary membership (and even the row count) under
    # odd-offset zones like +05:45 — found by the r6 full-surface
    # Asia/Kathmandu drive, the one MISMATCH in 124 queries.
    hour = lambda c, off=0: (  # noqa: E731
        F.floor(_epoch_s(c) / F.lit(3600)) + F.lit(off)
    ).cast("long")
    deltas = sess.select(
        hour("session_start").alias("hour_bucket"), F.lit(1).cast("long").alias("delta")
    ).unionByName(
        sess.select(
            hour("session_end", 1).alias("hour_bucket"),
            F.lit(-1).cast("long").alias("delta"),
        )
    )
    per_hour = deltas.groupBy("hour_bucket").agg(
        F.sum("delta").cast("long").alias("net")
    )
    w = (
        Window.partitionBy()
        .orderBy(F.col("hour_bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        per_hour.select(
            "hour_bucket",
            F.sum("net").over(w).cast("long").alias("open_sessions"),
        )
        .orderBy("hour_bucket")
    )


# ---------------------------------------------------------------------------
# skyline (Pareto frontier): one-pass staircase per group
# ---------------------------------------------------------------------------


def brand_size_skyline(part: DataFrame) -> DataFrame:
    """Per-brand Pareto frontier of (cheaper, bigger): the parts no
    other same-brand part beats on BOTH price and size — the classic
    2-D skyline query (catalog curation: the undominated quality/cost
    candidates), executed as the one-pass staircase, not the quadratic
    self-join.

    Under the total order (price_cents ASC, partkey ASC), a part is on
    the frontier iff its size strictly exceeds the running maximum size
    of everything ordered before it — one sorted window per brand with
    an exclusive-preceding MAX frame, exact integer comparisons only
    (prices quantized to cents via ``floor(x*100+0.5)``; NULL price or
    size rows excluded up front on both engines). One brand shuffle,
    no join, group cardinality unbounded.
    """
    cents = F.floor(F.col("p_retailprice") * 100.0 + 0.5).cast("bigint")
    base = part.select(
        "p_brand",
        "p_partkey",
        cents.alias("price_cents"),
        "p_size",
    ).filter(F.col("price_cents").isNotNull() & F.col("p_size").isNotNull())
    w = (
        Window.partitionBy("p_brand")
        .orderBy(F.col("price_cents").asc(), F.col("p_partkey").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    mx = F.max("p_size").over(w)
    return (
        base.withColumn("_mx", mx)
        .filter(F.col("_mx").isNull() | (F.col("p_size") > F.col("_mx")))
        .select("p_brand", "p_partkey", "price_cents", "p_size")
        .orderBy("p_brand", "p_partkey")
    )


@register(
    "brand_size_skyline",
    oracle="""
    WITH base AS (
      SELECT p_brand, p_partkey,
             CAST(floor(p_retailprice * 100.0 + 0.5) AS BIGINT)
               AS price_cents,
             p_size
      FROM part
      WHERE floor(p_retailprice * 100.0 + 0.5) IS NOT NULL
        AND p_size IS NOT NULL
    ), staged AS (
      SELECT *,
             MAX(p_size) OVER (
               PARTITION BY p_brand
               ORDER BY price_cents ASC, p_partkey ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
      FROM base
    )
    SELECT p_brand, p_partkey, price_cents, p_size
    FROM staged
    WHERE mx IS NULL OR p_size > mx
    ORDER BY p_brand, p_partkey
    """,
    description="2-D skyline (Pareto frontier) per brand: undominated "
    "(price, size) parts via the one-pass staircase — sorted window "
    "with an exclusive-preceding MAX, integer cents, no quadratic "
    "self-join; one brand shuffle",
    covers=("X-window", "B6"),
)
def brand_size_skyline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return brand_size_skyline(load_table(spark, sf_dir, "part"))


# ---------------------------------------------------------------------------
# activity heatmap: hour-of-week profile via pure epoch arithmetic
# ---------------------------------------------------------------------------


def event_heatmap(events: DataFrame) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap over the event feed —
    the ops-monitoring readout (traffic shape, bot windows, deploy
    gaps). Both axes come from PURE integer epoch arithmetic on the NTZ
    timestamp: ``dow = (epoch_day + 3) mod 7`` (0 = Monday; 1970-01-01
    was a Thursday) and ``hour = epoch_hour mod 24`` — no engine
    calendar function whose week-start or zone convention could differ
    (Spark ``dayofweek`` is 1=Sunday, DuckDB's is 0=Sunday; this
    sidesteps the seam entirely, the ``_epoch_s`` discipline).

    One fixed-cardinality (<=168 rows) hash aggregate with map-side
    partials; values quantized to cents for an exact total.
    """
    es = _epoch_s("ts")
    dow = F.pmod(F.floor(es / F.lit(86400)) + F.lit(3), F.lit(7))
    hour = F.pmod(F.floor(es / F.lit(3600)), F.lit(24))
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    return (
        events.select(
            dow.cast("long").alias("dow"),
            hour.cast("long").alias("hour"),
            cents.alias("cents"),
        )
        .groupBy("dow", "hour")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("cents").alias("total_cents"),
        )
        .orderBy("dow", "hour")
    )


@register(
    "event_heatmap",
    oracle="""
    SELECT CAST(((ed + 3) % 7 + 7) % 7 AS BIGINT) AS dow,
           CAST((eh % 24 + 24) % 24 AS BIGINT) AS hour,
           COUNT(*) AS n_events,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM (
      -- floor division via the nonneg-remainder identity: DuckDB's //
      -- truncates while Spark's floor(es/86400) floors, so negative
      -- (pre-1970) epochs would otherwise bucket differently; the
      -- outer (x % m + m) % m mirrors Spark's pmod
      SELECT (es - ((es % 86400 + 86400) % 86400)) // 86400 AS ed,
             (es - ((es % 3600 + 3600) % 3600)) // 3600 AS eh,
             cents
      FROM (
        SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
               CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
        FROM events))
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
    description="hour-of-week activity heatmap: dow/hour from pure "
    "integer epoch arithmetic (no engine calendar seam; floor-division "
    "and nonneg-mod identities keep pre-1970 epochs engine-exact), "
    "cents-exact value totals, one fixed-cardinality aggregate",
    covers=("B5", "X-window"),
)
def event_heatmap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_heatmap(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# ABC / Pareto classification: cumulative-share classes without a row sort
# ---------------------------------------------------------------------------


def revenue_abc_classes(lineitem: DataFrame) -> DataFrame:
    """ABC (Pareto) classification of parts by discounted revenue: class
    A = parts covering the top 80% of cumulative revenue, B = the next
    15%, C = the tail — the inventory-curation classic, and the same
    cumulative-share machinery a corpus pipeline uses to find the
    sources worth hand-auditing.

    Exactness: line revenue is the pure BIGINT product
    ``cents(extprice) × (100 − bp(discount))`` (1e-4-dollar units —
    TPC-H discounts are exact hundredths, so nothing rounds); class
    boundaries are integer predicates ``cum_before·100 < total·80/95``
    over decimal(38,0)/HUGEINT cumulative sums. Ties (equal part
    revenue) share one cum_before and classify identically —
    deterministic without a row-level tiebreak.

    Scale shape (the ``spend_gini`` trick): rows shuffle once into the
    per-part aggregate, parts collapse to DISTINCT revenue values, and
    the only ordered pass is a window over that distinct-value series —
    bounded by the value domain, never the part count; the class
    labels aggregate straight off the staged rows, no join back.
    """
    from pyspark.sql import Window

    cents = F.floor(F.col("l_extendedprice") * 100.0 + 0.5).cast("bigint")
    dbp = F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint")
    line = lineitem.select(
        "l_partkey", (cents * (F.lit(100) - dbp)).alias("rev_c4")
    ).filter(F.col("rev_c4").isNotNull())
    per_part = line.groupBy("l_partkey").agg(F.sum("rev_c4").alias("rev"))
    vals = per_part.groupBy("rev").agg(F.count(F.lit(1)).alias("cnt"))
    grp_rev = (F.col("rev").cast("decimal(28,0)") * F.col("cnt")).cast(
        "decimal(38,0)"
    )
    wv = (
        Window.orderBy(F.col("rev").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wall = Window.partitionBy()
    staged = vals.select(
        "rev",
        "cnt",
        grp_rev.alias("grp_rev"),
        F.coalesce(
            F.sum(grp_rev).over(wv), F.lit(0).cast("decimal(38,0)")
        ).alias("cumb"),
        F.sum(grp_rev).over(wall).alias("total"),
    )
    cls = (
        F.when(F.col("cumb") * 100 < F.col("total") * 80, F.lit("A"))
        .when(F.col("cumb") * 100 < F.col("total") * 95, F.lit("B"))
        .otherwise(F.lit("C"))
    )
    return (
        staged.groupBy(cls.alias("abc_class"))
        .agg(
            F.sum("cnt").alias("n_parts"),
            F.sum("grp_rev").cast("long").alias("class_rev_c4"),
            # an all-zero-revenue (yet non-empty) corpus has total = 0:
            # guard the share division identically on both engines
            # (Spark ANSI div and DuckDB // both throw on 0); -1 is the
            # undefined-share sentinel — a NULL would float the BIGINT
            # column through the driver's pandas path
            F.expr(
                "CASE WHEN max(total) > 0 THEN"
                " (sum(grp_rev) * 10000) div max(total) ELSE -1 END"
            )
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("abc_class")
    )


@register(
    "revenue_abc_classes",
    oracle="""
    WITH line AS (
      SELECT l_partkey,
             CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))
               AS rev_c4
      FROM lineitem
      WHERE floor(l_extendedprice * 100.0 + 0.5) IS NOT NULL
        AND floor(l_discount * 100.0 + 0.5) IS NOT NULL
    ), per_part AS (
      SELECT l_partkey, SUM(rev_c4) AS rev FROM line GROUP BY 1
    ), vals AS (
      SELECT rev, COUNT(*) AS cnt, SUM(CAST(rev AS HUGEINT)) AS grp_rev
      FROM per_part GROUP BY rev
    ), staged AS (
      SELECT rev, cnt, grp_rev,
             COALESCE(SUM(grp_rev) OVER (
               ORDER BY rev DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumb,
             SUM(grp_rev) OVER () AS total
      FROM vals
    )
    SELECT CASE WHEN cumb*100 < total*80 THEN 'A'
                WHEN cumb*100 < total*95 THEN 'B'
                ELSE 'C' END AS abc_class,
           CAST(SUM(cnt) AS BIGINT) AS n_parts,
           CAST(SUM(grp_rev) AS BIGINT) AS class_rev_c4,
           CAST(COALESCE((SUM(grp_rev) * 10000) // nullif(MAX(total), 0),
                         -1) AS BIGINT) AS share_bp
    FROM staged GROUP BY 1 ORDER BY 1
    """,
    description="ABC/Pareto revenue classes: exact BIGINT line revenue "
    "(cents x discount-bp), cumulative 80/95% boundaries as integer "
    "predicates over a distinct-value prefix sum — the only ordered "
    "pass is the distinct-value window; no global row sort, no join "
    "back",
    covers=("B5", "X-window", "B4"),
)
def revenue_abc_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_abc_classes(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# RFM segmentation: recency / frequency / monetary terciles
# ---------------------------------------------------------------------------


def rfm_segments(orders: DataFrame) -> DataFrame:
    """Classic RFM customer segmentation: tercile scores for Recency
    (days since last order, vs the corpus max date), Frequency (order
    count) and Monetary (cents spend), combined into the 27 ``rfm``
    cells marketing pipelines act on — and the same
    engagement-stratification recipe a data pipeline uses to weight
    user cohorts.

    Determinism: every metric is exact integer (day diffs, counts,
    cents); each NTILE(3) runs over a TOTAL order (metric, custkey) so
    bucket boundaries cannot float — both engines implement standard
    NTILE (first ``n mod k`` buckets take the extra row). Scale: the
    windows run over the per-customer AGGREGATE (one row per customer,
    never raw orders); exact global terciles are inherently a
    single-task pass over that aggregate — the wide-corpus alternative
    is the ``approx_sketches`` quantile path.
    """
    from pyspark.sql import Window

    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    per_cust = (
        orders.select(
            F.col("o_custkey").alias("cust"),
            F.col("o_orderdate").alias("d"),
            cents.alias("c"),
        )
        .groupBy("cust")
        .agg(
            F.max("d").alias("last_d"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("c").alias("money"),
        )
    )
    bounds = orders.agg(F.max("o_orderdate").alias("max_d"))
    base = per_cust.crossJoin(F.broadcast(bounds)).select(
        "cust",
        F.datediff("max_d", "last_d").cast("long").alias("recency_days"),
        "freq",
        "money",
    )
    wr = Window.orderBy(F.col("recency_days").asc(), F.col("cust").asc())
    wf = Window.orderBy(F.col("freq").desc(), F.col("cust").asc())
    wm = Window.orderBy(F.col("money").desc(), F.col("cust").asc())
    scored = base.select(
        "cust",
        "recency_days",
        "freq",
        "money",
        F.ntile(3).over(wr).alias("r"),
        F.ntile(3).over(wf).alias("f"),
        F.ntile(3).over(wm).alias("m"),
    )
    return (
        scored.groupBy(
            F.concat(F.col("r"), F.col("f"), F.col("m")).alias("rfm")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("money").alias("segment_cents"),
        )
        .orderBy("rfm")
    )


@register(
    "rfm_segments",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey AS cust, MAX(o_orderdate) AS last_d,
             COUNT(*) AS freq,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS money
      FROM orders GROUP BY 1
    ), b AS (
      SELECT MAX(o_orderdate) AS max_d FROM orders
    ), base AS (
      SELECT cust,
             CAST(date_diff('day', CAST(last_d AS DATE),
                            CAST(max_d AS DATE)) AS BIGINT)
               AS recency_days,
             freq, money
      FROM per_cust, b
    ), scored AS (
      SELECT cust, money,
             NTILE(3) OVER (ORDER BY recency_days ASC, cust ASC) AS r,
             NTILE(3) OVER (ORDER BY freq DESC, cust ASC) AS f,
             NTILE(3) OVER (ORDER BY money DESC, cust ASC) AS m
      FROM base
    )
    SELECT CAST(r AS VARCHAR) || CAST(f AS VARCHAR) || CAST(m AS VARCHAR)
             AS rfm,
           COUNT(*) AS n_customers,
           CAST(SUM(money) AS BIGINT) AS segment_cents
    FROM scored GROUP BY 1 ORDER BY 1
    """,
    description="RFM customer segmentation: exact integer recency/"
    "frequency/monetary metrics, NTILE(3) terciles under total orders "
    "(custkey tiebreak — standard NTILE on both engines), 27-cell "
    "aggregate; windows run over the per-customer aggregate, never raw "
    "orders",
    covers=("X-window", "B5", "B4"),
)
def rfm_segments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rfm_segments(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# market-basket association: pairwise co-purchase lift
# ---------------------------------------------------------------------------


def basket_lift(
    lineitem: DataFrame, min_support: int = 3, k: int = 20
) -> DataFrame:
    """Top-``k`` co-purchased part pairs by lift — association-rule
    mining's core readout (``lift = P(a,b) / (P(a)·P(b))``), the same
    machinery ``token_cooccurrence`` applies to documents, here on the
    orders fact (recommender candidates, bundle detection).

    Scale shape: baskets dedupe to (order, part) rows first; the pair
    generator is a SELF-JOIN ON THE ORDER KEY with ``p1 < p2`` — the
    expansion is Σ C(basket_size, 2), bounded by the small per-order
    line count, never |parts|². Pair supports, per-part order counts
    and the 1-row order total are all exact BIGINTs; lift is one double
    expression over them (round 6), ranked with a (p1, p2) tiebreak via
    TakeOrderedAndProject. ``min_support`` prunes the long noise tail
    before the rank.
    """
    baskets = lineitem.select(
        F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("pk")
    ).distinct()
    left = baskets.select("okey", F.col("pk").alias("p1"))
    right = baskets.select("okey", F.col("pk").alias("p2"))
    pairs = (
        left.join(right, "okey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    part_n = baskets.groupBy("pk").agg(F.count(F.lit(1)).alias("n_part"))
    totals = baskets.select("okey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    enriched = (
        pairs.join(part_n.select(F.col("pk").alias("p1"),
                                 F.col("n_part").alias("n1")), "p1")
        .join(part_n.select(F.col("pk").alias("p2"),
                            F.col("n_part").alias("n2")), "p2")
        .crossJoin(F.broadcast(totals))
    )
    # fround: counts ratio — tie-reachable at the 7th decimal (r10
    # round-half-tie audit).
    lift = fround(
        F.col("support").cast("double") * F.col("n_orders").cast("double")
        / (F.col("n1").cast("double") * F.col("n2").cast("double")),
        6,
    )
    return (
        enriched.select("p1", "p2", "support", "n1", "n2",
                        lift.alias("lift"))
        .orderBy(F.col("lift").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(k)
    )


@register(
    "basket_lift",
    oracle="""
    WITH baskets AS (
      SELECT DISTINCT l_orderkey AS okey, l_partkey AS pk FROM lineitem
    ), pairs AS (
      SELECT a.pk AS p1, b.pk AS p2, COUNT(*) AS support
      FROM baskets a JOIN baskets b
        ON a.okey = b.okey AND a.pk < b.pk
      GROUP BY 1, 2 HAVING COUNT(*) >= 3
    ), part_n AS (
      SELECT pk, COUNT(*) AS n_part FROM baskets GROUP BY pk
    ), t AS (
      SELECT COUNT(DISTINCT okey) AS n_orders FROM baskets
    )
    SELECT p1, p2, support, a.n_part AS n1, b.n_part AS n2,
           (CAST(floor((CAST(support AS DOUBLE) * CAST(n_orders AS DOUBLE)
                 / (CAST(a.n_part AS DOUBLE) * CAST(b.n_part AS DOUBLE)))
                 * 1e6 + 0.5) AS DOUBLE) / 1e6) AS lift
    FROM pairs
    JOIN part_n a ON a.pk = p1
    JOIN part_n b ON b.pk = p2
    CROSS JOIN t
    ORDER BY lift DESC, p1 ASC, p2 ASC
    LIMIT 20
    """,
    description="market-basket association mining: top-20 co-purchased "
    "part pairs by lift — basket self-join bounded by per-order line "
    "count (never |parts|^2), exact BIGINT supports, one double lift "
    "expression, min-support prune, TakeOrderedAndProject",
    covers=("B11", "B8", "N-dedup"),
)
def basket_lift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return basket_lift(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# user behavioral diversity (Simpson index) histogram (r9)
# ---------------------------------------------------------------------------


def user_diversity_histogram(events: DataFrame) -> DataFrame:
    """Distribution of per-user behavioral diversity over event types,
    via the Gini-Simpson index ``D = 1 - sum(n_i*(n_i-1)) / (n*(n-1))``
    — the probability two of a user's events differ in type. Unlike
    Shannon entropy, D is a RATIONAL function of the counts, so it
    stays an exact integer comparison end-to-end (no logarithms, no
    cross-engine libm): the decile is ``(10*(den-num)) div den`` in
    pure int64.

    Single-event users carry no diversity information (0/0) and are
    excluded. Output: 0..10 decile buckets x user counts. Scale: two
    keyed hash aggregates (user,type) -> (user), both map-side-partial,
    then an 11-row aggregate."""
    per_type = (
        events.filter(F.col("event_type").isNotNull())
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_user = per_type.groupBy("user_id").agg(
        F.sum(F.expr("c * (c - 1)")).alias("num"),
        F.sum("c").alias("n"),
    ).filter(F.col("n") >= 2)
    decile = F.expr("(10 * (n * (n - 1) - num)) div (n * (n - 1))")
    return (
        per_user.select(decile.cast("int").alias("diversity_decile"))
        .groupBy("diversity_decile")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .orderBy("diversity_decile")
    )


@register(
    "user_diversity_histogram",
    oracle="""
    WITH per_type AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events WHERE event_type IS NOT NULL
      GROUP BY user_id, event_type
    ), per_user AS (
      SELECT user_id,
             CAST(SUM(c * (c - 1)) AS BIGINT) AS num,
             CAST(SUM(c) AS BIGINT) AS n
      FROM per_type GROUP BY user_id
      HAVING SUM(c) >= 2
    )
    SELECT CAST((10 * (n * (n - 1) - num)) // (n * (n - 1)) AS INT)
             AS diversity_decile,
           CAST(COUNT(*) AS BIGINT) AS n_users
    FROM per_user
    GROUP BY 1 ORDER BY 1
    """,
    description="per-user behavioral diversity histogram via the "
    "Gini-Simpson index (rational in the counts — exact integer decile, "
    "no entropy logs): two map-side-partial keyed aggregates then an "
    "11-bucket rollup",
    covers=("B5", "N-quality"),
)
def user_diversity_histogram_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return user_diversity_histogram(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# event path mining: top-k 3-step behavioral sequences (r9)
# ---------------------------------------------------------------------------


def event_path_topk(events: DataFrame, k: int = 10) -> DataFrame:
    """The ``k`` most common 3-step event-type paths across users — the
    sequence-mining readout behind funnel design ("what do users
    actually do in order"). Each user's events form a time-ordered
    sequence (ties broken by event_id for a total order); every
    consecutive triple is one path occurrence.

    Scale: one window per user partition (two LEADs — no self-joins,
    no explode), a path-string aggregate with map-side partials, and a
    TakeOrdered top-k. User partitions are bounded by per-user activity,
    the same distribution sessionize_events rides."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = events.filter(
        F.col("event_type").isNotNull() & F.col("ts").isNotNull()
    ).select(
        "user_id",
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "e1", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), F.col("path").asc())
        .limit(k)
    )


@register(
    "event_path_topk",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS e1,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS e2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS e3
      FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
    )
    SELECT e1 || '>' || e2 || '>' || e3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE e2 IS NOT NULL AND e3 IS NOT NULL
    GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10
    """,
    description="top-10 3-step event-type paths: per-user time-ordered "
    "LEAD window (total order via event_id tie-break, no self-joins), "
    "path-string aggregate with map-side partials, TakeOrdered",
    covers=("X-window", "B8"),
)
def event_path_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_path_topk(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# dyadic recency-decayed activity score (r10)
# ---------------------------------------------------------------------------


def decayed_activity_topk(events: DataFrame, k: int = 20) -> DataFrame:
    """Top-``k`` users by recency-decayed activity: each event
    contributes ``1_000_000 div 2^age_weeks`` score millionths (weight
    halves every week of age) — the engagement-ranking primitive behind
    churn targeting and sampling-by-recency. The decay base is a POWER
    OF TWO evaluated by integer shift, so the whole score is exact
    integer arithmetic — ``exp(-lambda*t)`` would be a libm call two
    engines may round differently; halving per week is the same curve
    family with cross-engine-exact weights (and a natural zero at 20
    weeks, where the integer division underflows — events older than
    that genuinely stop counting, which a production decay wants
    anyway).

    Plan: one events scan -> per (user, age_week) counts (map-side
    partials absorb the raw volume), weight applied per aggregated row,
    per-user sum, TakeOrdered top-k. "Now" is the corpus max day — a
    ts-only column-pruned second scan (the vocab_growth normalizer
    economics: the readout must not depend on wall-clock, or no engine
    could ever replay it)."""
    day = F.floor(_epoch_s("ts") / F.lit(86400)).cast("long")
    mx = events.agg(F.max(day).alias("max_day"))
    per = (
        # NULL user_ids are unattributable (and Spark/DuckDB disagree
        # on NULL placement under the ASC tie-break at the k-cut —
        # the view_click_interval convention)
        events.filter(F.col("user_id").isNotNull())
        .select(F.col("user_id"), day.alias("_d"))
        .crossJoin(F.broadcast(mx))
        .groupBy(
            "user_id",
            # div, not /: float-quotient casts disagree across
            # engines (Spark trunc, DuckDB round) — integer division
            # is the same op everywhere
            F.expr("(max_day - _d) div 7").alias("age_week"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    score = F.expr(
        "n * (1000000 div shiftleft(CAST(1 AS BIGINT), "
        "CAST(least(age_week, 62) AS INT)))"
    )
    return (
        per.groupBy("user_id")
        .agg(F.sum(score).cast("bigint").alias("score_millionths"))
        .orderBy(F.col("score_millionths").desc(), F.col("user_id").asc())
        .limit(k)
    )


@register(
    "decayed_activity_topk",
    oracle="""
    WITH mx AS (
      SELECT MAX(CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400)
                 AS BIGINT)) AS max_day
      FROM events
    ), per AS (
      SELECT user_id,
             (max_day - CAST(floor(epoch(CAST(ts AS TIMESTAMP))
                    / 86400) AS BIGINT)) // 7 AS age_week,
             COUNT(*) AS n
      FROM events, mx WHERE user_id IS NOT NULL GROUP BY 1, 2
    )
    SELECT user_id,
           CAST(SUM(n * (1000000 // (CAST(1 AS BIGINT) <<
                CAST(least(age_week, 62) AS INT)))) AS BIGINT)
             AS score_millionths
    FROM per GROUP BY user_id
    ORDER BY score_millionths DESC, user_id ASC
    LIMIT 20
    """,
    description="recency-decayed user activity top-20: per-event weight "
    "1e6 div 2^age_weeks via integer shifts (exact dyadic half-life, no "
    "libm exp), per-(user, age-week) pre-aggregation absorbs raw volume, "
    "TakeOrdered; 'now' = corpus max day from a ts-only pruned scan",
    covers=("X-window", "B8", "N-quality"),
)
def decayed_activity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return decayed_activity_topk(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# session dwell-time distribution: exact percentiles via value histogram
# ---------------------------------------------------------------------------


def session_dwell_stats(events: DataFrame) -> DataFrame:
    """Exact p50/p90/p99 of session dwell time (seconds) plus the
    bounce share — the engagement distribution a product pipeline
    publishes next to its sessionization.

    Exact percentiles over ALL sessions without a global sort: dwell
    seconds are bounded small integers (a 30-min-gap session lasts
    minutes-to-hours), so the scalable exact plan is the VALUE
    HISTOGRAM — one hash aggregate to (dwell_s -> count), a cumulative
    sum over the |distinct values| series (domain-bounded, not
    row-bounded), and each percentile is the least value whose
    cumulative count reaches ``ceil(p·n)`` — the discrete order
    statistic, all-integer, engine-exact. Bounces (single-event
    sessions) ride the same session aggregate.
    """
    from pyspark.sql import Window

    s = sessionize(events).select("events", "duration_s")
    counts = s.groupBy("duration_s").agg(F.count(F.lit(1)).alias("_c"))
    totals = s.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum(F.when(F.col("events") == 1, 1).otherwise(0)).alias("_b"),
    )
    w = Window.orderBy("duration_s").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = counts.select(
        "duration_s", F.sum("_c").over(w).alias("_cum")
    ).crossJoin(F.broadcast(totals))

    def pick(p: float):
        need = F.ceil(F.lit(p) * F.col("_n"))
        return F.min(
            F.when(F.col("_cum") >= need, F.col("duration_s"))
        ).cast("bigint")

    # -1 sentinels (never coalesced NULL ints): an empty corpus yields the
    # one-row n_sessions=0 summary, and a NULL-bearing BIGINT column would
    # float through the driver's pandas canonicalization (the
    # purchase_attribution r2 lesson, enforced by the oracle-type gate)
    return cum.agg(
        F.coalesce(F.max("_n"), F.lit(0)).cast("bigint").alias("n_sessions"),
        F.coalesce(pick(0.5), F.lit(-1)).alias("p50_dwell_s"),
        F.coalesce(pick(0.9), F.lit(-1)).alias("p90_dwell_s"),
        F.coalesce(pick(0.99), F.lit(-1)).alias("p99_dwell_s"),
        F.coalesce(F.max("duration_s"), F.lit(-1))
        .cast("bigint")
        .alias("max_dwell_s"),
        F.when(
            F.coalesce(F.max("_n"), F.lit(0)) == 0, F.lit(-1)
        )
        .otherwise(F.expr("(10000 * max(_b)) div max(_n)"))
        .cast("bigint")
        .alias("bounce_share_bp"),
    )


@register(
    "session_dwell_stats",
    oracle=f"""
    WITH flagged AS (
      SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR floor(epoch(CAST(ts AS TIMESTAMP))
                             - epoch(LAG(CAST(ts AS TIMESTAMP)) OVER w))
                       > {{gap}}
                  THEN 1 ELSE 0 END AS is_break
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
    ), numbered AS (
      SELECT user_id, event_id, ts,
             SUM(is_break) OVER (
               PARTITION BY user_id ORDER BY ts ASC, event_id ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS session_id
      FROM flagged
    ), s AS (
      SELECT COUNT(*) AS events,
             CAST(floor(epoch(MAX(ts)) - epoch(MIN(ts))) AS BIGINT)
               AS duration_s
      FROM numbered GROUP BY user_id, session_id
    ), counts AS (
      SELECT duration_s, COUNT(*) AS _c FROM s GROUP BY duration_s
    ), totals AS (
      SELECT COUNT(*) AS _n,
             SUM(CASE WHEN events = 1 THEN 1 ELSE 0 END) AS _b
      FROM s
    ), cum AS (
      SELECT duration_s,
             SUM(_c) OVER (ORDER BY duration_s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS _cum,
             t._n, t._b
      FROM counts, totals t
    )
    SELECT CAST(COALESCE(MAX(_n), 0) AS BIGINT) AS n_sessions,
           CAST(COALESCE(MIN(CASE WHEN _cum >= ceil(0.5 * _n)
                               THEN duration_s END), -1)
                AS BIGINT) AS p50_dwell_s,
           CAST(COALESCE(MIN(CASE WHEN _cum >= ceil(0.9 * _n)
                               THEN duration_s END), -1)
                AS BIGINT) AS p90_dwell_s,
           CAST(COALESCE(MIN(CASE WHEN _cum >= ceil(0.99 * _n)
                               THEN duration_s END), -1)
                AS BIGINT) AS p99_dwell_s,
           CAST(COALESCE(MAX(duration_s), -1) AS BIGINT) AS max_dwell_s,
           CAST(CASE WHEN COALESCE(MAX(_n), 0) = 0 THEN -1
                ELSE (10000 * MAX(_b)) // MAX(_n) END AS BIGINT)
             AS bounce_share_bp
    FROM cum
    """.format(gap=SESSION_GAP_S),
    description="engagement distribution: exact p50/p90/p99/max session "
    "dwell seconds + bounce share bp — exact order statistics WITHOUT a "
    "global sort via the value histogram (dwell domain is bounded-small: "
    "one hash agg, a domain-sized cumsum, discrete ceil(p*n) rank picks); "
    "reuses the sessionize shuffle",
    covers=("X-session", "X-stats", "B4"),
)
def session_dwell_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return session_dwell_stats(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# customer reorder-gap histogram (r12)
# ---------------------------------------------------------------------------


def customer_order_gaps(orders: DataFrame) -> DataFrame:
    """Reorder-cadence histogram: days between each customer's
    consecutive orders, bucketed into weeks — the repeat-purchase
    rhythm readout behind retention targets (a week-0 spike means
    same-week reorders; a fat tail means churn risk).

    One keyed shuffle: ``lag`` of the epoch-day over the per-customer
    (day, orderkey) order — integer NTZ epoch-days (``timestampdiff``,
    never ``unix_timestamp``), so the gap is an exact BIGINT
    subtraction; first orders have no predecessor and drop. The
    histogram is a |buckets|-row aggregate; shares are exact basis
    points of all gaps.
    """
    day = F.floor(_epoch_s("o_orderdate") / F.lit(86400)).cast("long")
    w = Window.partitionBy("o_custkey").orderBy("_d", "o_orderkey")
    gaps = (
        orders.filter(
            F.col("o_custkey").isNotNull()
            & F.col("o_orderdate").isNotNull()
        )
        .select("o_custkey", "o_orderkey", day.alias("_d"))
        .withColumn("_prev", F.lag("_d").over(w))
        .filter(F.col("_prev").isNotNull())
        .select((F.col("_d") - F.col("_prev")).alias("_gap"))
    )
    hist = gaps.groupBy(
        F.expr("_gap div 7").cast("bigint").alias("gap_week_bucket")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
    # the total rides a window over the metadata-sized histogram — a
    # second aggregate + crossJoin would replay the orders scan
    return (
        hist.withColumn(
            "_tot", F.sum("n_gaps").over(Window.partitionBy())
        )
        .select(
            "gap_week_bucket",
            "n_gaps",
            F.expr("(10000 * n_gaps) div _tot")
            .cast("bigint")
            .alias("share_bp"),
        )
        .orderBy("gap_week_bucket")
    )


@register(
    "customer_order_gaps",
    oracle="""
    WITH d AS (
      SELECT o_custkey, o_orderkey,
             CAST(floor(epoch(CAST(o_orderdate AS TIMESTAMP)) / 86400)
                  AS BIGINT) AS _d
      FROM orders
      WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
    ), g AS (
      SELECT _d - lag(_d) OVER (PARTITION BY o_custkey
                                ORDER BY _d, o_orderkey) AS _gap
      FROM d
    ), hist AS (
      SELECT _gap // 7 AS gap_week_bucket, COUNT(*) AS n_gaps
      FROM g WHERE _gap IS NOT NULL
      GROUP BY 1
    )
    SELECT CAST(gap_week_bucket AS BIGINT) AS gap_week_bucket,
           CAST(n_gaps AS BIGINT) AS n_gaps,
           CAST((10000 * n_gaps) // (SELECT SUM(n_gaps) FROM hist)
                AS BIGINT) AS share_bp
    FROM hist
    ORDER BY gap_week_bucket
    """,
    description="reorder-cadence histogram: per-customer consecutive-"
    "order gaps in exact epoch-day integers (lag over one custkey "
    "shuffle), bucketed by week with exact bp shares — the repeat-"
    "purchase rhythm readout",
    covers=("X-window", "B5"),
)
def customer_order_gaps_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return customer_order_gaps(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# supplier revenue concentration (HHI) per nation (r12)
# ---------------------------------------------------------------------------


def supplier_concentration_hhi(
    lineitem: DataFrame, supplier: DataFrame, nation: DataFrame
) -> DataFrame:
    """Herfindahl-Hirschman concentration of supplier revenue within
    each nation: per nation the supplier count, total revenue cents,
    top-supplier share and the HHI over basis-point shares (0..1e8 —
    10000^2 = single-supplier monopoly) — the supply-risk readout a
    procurement dashboard keys on. Complements
    ``statistics.supplier_hhi_histogram`` (per-PART quantity
    concentration bucketed into bands): same metric family, different
    axis — this one answers "which NATION's revenue hangs on one
    supplier", with the dim-join plumbing that question needs.

    Exactness: revenue folds to exact cents per supplier; shares are
    integer basis points (``10000*cents div total``); the HHI is a sum
    of squared BIGINT shares — no doubles anywhere. Scale: one
    lineitem scan into a |suppliers|-row aggregate (map-side partials),
    dims broadcast (supplier size-gated, nation fixed), then windows
    over the metadata-sized supplier rollup.
    """
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100.0
        + 0.5
    ).cast("long")
    per_supp = (
        lineitem.join(
            broadcast_if_dim(supplier.select("s_suppkey", "s_nationkey")),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(cents).alias("_cents"))
    )
    wn = Window.partitionBy("n_name")
    shared = per_supp.withColumn(
        "_tot", F.sum("_cents").over(wn)
    ).withColumn("share_bp", F.expr("(10000 * _cents) div _tot"))
    return (
        shared.groupBy("n_name")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.max("_tot").cast("bigint").alias("revenue_cents"),
            F.max("share_bp").cast("bigint").alias("top_share_bp"),
            F.sum(F.col("share_bp") * F.col("share_bp"))
            .cast("bigint")
            .alias("hhi"),
        )
        .orderBy("n_name")
    )


@register(
    "supplier_concentration_hhi",
    oracle="""
    WITH per_supp AS (
      SELECT n.n_name, l.l_suppkey,
             CAST(SUM(CAST(floor(l.l_extendedprice * (1 - l.l_discount)
                                 * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS _cents
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      GROUP BY n.n_name, l.l_suppkey
    ), shared AS (
      SELECT n_name, _cents,
             SUM(_cents) OVER (PARTITION BY n_name) AS _tot,
             (10000 * _cents) // SUM(_cents) OVER (PARTITION BY n_name)
               AS share_bp
      FROM per_supp
    )
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           CAST(MAX(_tot) AS BIGINT) AS revenue_cents,
           CAST(MAX(share_bp) AS BIGINT) AS top_share_bp,
           CAST(SUM(share_bp * share_bp) AS BIGINT) AS hhi
    FROM shared GROUP BY n_name ORDER BY n_name
    """,
    description="supply-risk readout: per-nation supplier revenue "
    "concentration — supplier count, exact revenue cents, top share and "
    "HHI over integer bp shares (no doubles anywhere); one lineitem "
    "scan to a supplier rollup, dims broadcast (size-gated), windows "
    "over the metadata-sized rollup",
    covers=("B11", "B5"),
)
def supplier_concentration_hhi_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return supplier_concentration_hhi(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
    )
