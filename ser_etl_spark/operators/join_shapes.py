"""Outer-join / subquery join shapes completing the B11 surface.

The reference's loose allow-pattern
(``/root/reference/api-service/src/config.py:34``) admits every join
variant DuckDB supports straight through to the executor; ``analytics.py``
covers inner / broadcast / semi / anti joins, and this module adds the
remaining shapes: LEFT OUTER (TPC-H Q13), FULL OUTER, DISTINCT
aggregation with NOT IN (Q16), correlated scalar subqueries (Q17),
disjunctive join predicates (Q19), and conditional counts (Q12) —
adapted to the fixture schema (no partsupp / l_shipmode columns,
TESTDATA.md).

Scale design:
- Q13 aggregates orders down to per-customer counts *before* the outer
  join, so the shuffle carries one row per customer instead of one per
  order; customers with no orders come back via the LEFT join +
  ``coalesce(0)``.
- Q16's NOT IN becomes a broadcast LEFT ANTI join (suppkey is non-null,
  so the semantics coincide); the distinct aggregation rides Catalyst's
  two-phase partial/final distinct expansion.
- Q17 evaluates the correlated AVG as a grouped aggregate over only the
  brand's lineitems (the broadcast part filter prunes first), joined
  back on partkey — one shuffle instead of a per-row subquery.
- Q19's common bounds (size/quantity envelopes) are pre-pushed into the
  scans so the parquet reader skips row groups before the disjunction
  runs.
- The FULL OUTER reconciliation pre-aggregates the fact side to
  distinct keys, keeping both join inputs key-unique.
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


def _ntz(lit: str):
    return F.lit(lit).cast("timestamp_ntz")


@register(
    "customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT OUTER JOIN (
        SELECT o_custkey, o_orderkey FROM orders
        WHERE o_orderpriority <> '1-URGENT'
      ) o ON c.c_custkey = o.o_custkey
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
    description="TPC-H Q13 shape: LEFT OUTER JOIN customer→orders, orders "
    "count per customer (zero-order customers retained), then the "
    "distribution of counts; orders pre-aggregated per custkey before the "
    "join so the shuffle carries one row per customer",
    covers=("B11",),
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer").select("c_custkey")
    per_cust = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") != "1-URGENT")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    counts = (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
        .select(F.coalesce(F.col("_n"), F.lit(0)).alias("c_count"))
    )
    return (
        counts.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.col("custdist").desc(), F.col("c_count").desc())
    )


@register(
    "supplier_variety",
    oracle="""
    SELECT p.p_brand, p.p_type,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size IN (1, 5, 9, 13, 17)
      AND l.l_suppkey NOT IN (
        SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0
      )
    GROUP BY p.p_brand, p.p_type
    ORDER BY supplier_cnt DESC, p.p_brand ASC, p.p_type ASC
    LIMIT 100
    """,
    description="TPC-H Q16 shape: COUNT(DISTINCT suppkey) per brand/type "
    "with a NOT IN exclusion subquery — broadcast LEFT ANTI join (suppkey "
    "non-null makes the semantics identical), distinct agg via Catalyst's "
    "partial/final expand",
    covers=("B11", "B5"),
)
def supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_size").isin(1, 5, 9, 13, 17))
        .select("p_partkey", "p_brand", "p_type")
    )
    bad_supp = (
        _t(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    li = _t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(broadcast_if_dim(bad_supp), li.l_suppkey == bad_supp.s_suppkey,
                "left_anti")
        .join(broadcast_if_dim(p), F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(
            F.col("supplier_cnt").desc(),
            F.col("p_brand").asc(),
            F.col("p_type").asc(),
        )
        .limit(100)
    )


@register(
    "small_order_revenue",
    oracle=f"""
    SELECT {sql_dsum('l.l_extendedprice', 2)} / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND l.l_quantity < (
        SELECT 0.2 * ({sql_davg('l2.l_quantity', 2)})
        FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
    description="TPC-H Q17 shape: correlated scalar subquery (20% of the "
    "per-part average quantity) de-correlated into a grouped aggregate "
    "over the brand's lineitems joined back on partkey — one shuffle, no "
    "per-row re-execution; decimal-exact AVG keeps the threshold "
    "bit-identical to the oracle",
    covers=("B11", "B4"),
)
def small_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_brand") == "Brand#23")
        .select("p_partkey")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    brand_li = li.join(broadcast_if_dim(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = (
        brand_li.groupBy(F.col("l_partkey").alias("_tp"))
        .agg((F.lit(0.2) * davg("l_quantity", 2)).alias("_max_qty"))
    )
    return (
        brand_li.join(
            F.broadcast(thresholds), brand_li.l_partkey == F.col("_tp")
        )
        .filter(F.col("l_quantity") < F.col("_max_qty"))
        .agg((dsum("l_extendedprice", 2) / 7.0).alias("avg_yearly"))
    )


@register(
    "disjunctive_revenue",
    oracle=f"""
    SELECT COUNT(*) AS line_count,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 4)} AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND l.l_quantity BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND l.l_quantity BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 20 AND 30)
    """,
    description="TPC-H Q19 shape: disjunctive (OR-of-conjunction) join "
    "predicate over part⋈lineitem; the common envelopes (size 1-15, "
    "quantity 1-30, the three brands) are pre-pushed into both scans so "
    "row groups are skipped before the residual disjunction evaluates",
    covers=("B11", "B6"),
)
def disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        # envelope of the disjunction — pushed to the parquet scan
        .filter(
            F.col("p_brand").isin("Brand#12", "Brand#23", "Brand#34")
            & F.col("p_size").between(1, 15)
        )
        .select("p_partkey", "p_brand", "p_size")
    )
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_quantity").between(1, 30))
        .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    )
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & F.col("l_quantity").between(1, 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & F.col("l_quantity").between(10, 20))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 15)
           & F.col("l_quantity").between(20, 30))
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(broadcast_if_dim(p), li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("line_count"),
            dsum(revenue, 4).alias("revenue"),
        )
    )


@register(
    "priority_shipping",
    oracle="""
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_returnflag
    ORDER BY l.l_returnflag
    """,
    description="TPC-H Q12 shape: conditional counts (CASE inside SUM) of "
    "high- vs low-priority orders per returnflag; the date range prunes "
    "lineitem at the scan, the orderkey join shuffles only the surviving "
    "year",
    covers=("B11", "B5"),
)
def priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
        )
        .select("l_orderkey", "l_returnflag")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "sole_returning_supplier",
    oracle="""
    SELECT s.s_name, COUNT(*) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o ON o.o_orderkey = l1.l_orderkey
    WHERE o.o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey
          AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey
          AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name ASC
    LIMIT 100
    """,
    description="TPC-H Q21 shape: EXISTS + NOT EXISTS correlated on the "
    "same fact with an inequality (another supplier / no other returning "
    "supplier) — de-correlated into ONE grouped pass over lineitem "
    "(distinct suppliers, distinct returning suppliers per order) joined "
    "back on orderkey, instead of two correlated self-joins; supplier "
    "broadcasts",
    covers=("B11",),
)
def sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_returnflag"
    )
    # EXISTS(other supplier) <=> n_supp > 1; NOT EXISTS(other returning
    # supplier), given l1 itself has flag R <=> n_ret_supp == 1 (suppkey
    # is non-null, so the <> correlation reduces to distinct counts).
    per_order = li.groupBy(F.col("l_orderkey").alias("_ok")).agg(
        F.countDistinct("l_suppkey").alias("_n_supp"),
        F.countDistinct(
            F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
        ).alias("_n_ret_supp"),
    )
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    l1 = li.filter(F.col("l_returnflag") == "R")
    return (
        l1.join(per_order, l1.l_orderkey == F.col("_ok"))
        .filter((F.col("_n_supp") > 1) & (F.col("_n_ret_supp") == 1))
        .join(o, l1.l_orderkey == o.o_orderkey, "left_semi")
        .join(broadcast_if_dim(s), l1.l_suppkey == s.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), F.col("s_name").asc())
        .limit(100)
    )


@register(
    "top_supplier_revenue",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum('l_extendedprice * (1 - l_discount)', 4)}
               AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    ORDER BY s.s_suppkey
    """,
    description="TPC-H Q15 shape: aggregate view (quarterly revenue per "
    "supplier) joined against its own scalar MAX — the 1-row max "
    "broadcasts as a literal; equality on the decimal-exact sum is "
    "deterministic on both engines",
    covers=("B11", "B4"),
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    rev = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz("1997-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1997-04-01 00:00:00"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("total_revenue")
        )
    )
    max_rev = rev.agg(F.max("total_revenue").alias("_max_rev"))
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("_max_rev"))
        .join(broadcast_if_dim(s), F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@register(
    "price_percentiles",
    oracle="""
    SELECT o_orderpriority,
           percentile_cont(0.5) WITHIN GROUP (ORDER BY o_totalprice)
             AS median_price,
           percentile_cont(0.9) WITHIN GROUP (ORDER BY o_totalprice)
             AS p90_price
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
    description="extension: exact percentiles (PERCENTILE_CONT) of order "
    "value per priority class — Spark's exact `percentile` aggregate uses "
    "the same linear interpolation as the SQL spec; the approximate "
    "scale path for wide groups is the quantile sketch in "
    "operators/sketches.py",
    covers=("B4",),
)
def price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", F.lit(0.5)).alias("median_price"),
            F.percentile("o_totalprice", F.lit(0.9)).alias("p90_price"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "nation_trade_volume",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume', 4)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             year(l.l_shipdate) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY supp_nation, cust_nation, l_year
    ORDER BY supp_nation, cust_nation, l_year
    """,
    description="TPC-H Q7 shape: bilateral trade volume between two "
    "nations per year — 6-way join where both nation dims broadcast and "
    "the cross-nation disjunction evaluates as a post-join residual; "
    "YEAR() stays pure on NTZ timestamps",
    covers=("B11",),
)
def nation_trade_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pair = F.col("supp_nation").isin("NATION_1", "NATION_2") & F.col(
        "cust_nation"
    ).isin("NATION_1", "NATION_2") & (
        F.col("supp_nation") != F.col("cust_nation")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = (
        _t(spark, sf_dir, "lineitem")
        .filter(
            (F.col("l_shipdate") >= _ntz("1996-01-01 00:00:00"))
            & (F.col("l_shipdate") < _ntz("1998-01-01 00:00:00"))
        )
        .select("l_orderkey", "l_suppkey", "l_shipdate",
                "l_extendedprice", "l_discount")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_dim(s), li.l_suppkey == s.s_suppkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("_nk1"),
                F.col("n_name").alias("supp_nation"),
            )),
            F.col("s_nationkey") == F.col("_nk1"),
        )
        .join(
            F.broadcast(n.select(
                F.col("n_nationkey").alias("_nk2"),
                F.col("n_name").alias("cust_nation"),
            )),
            F.col("c_nationkey") == F.col("_nk2"),
        )
        .filter(pair)
    )
    return (
        joined.groupBy(
            "supp_nation", "cust_nation",
            F.year("l_shipdate").alias("l_year"),
        )
        .agg(
            dsum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")), 4
            ).alias("revenue")
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


@register(
    "nation_market_share",
    oracle=f"""
    SELECT o_year,
           {sql_dsum("CASE WHEN nation = 'NATION_3' THEN volume ELSE 0 END", 4)}
             / {sql_dsum('volume', 4)} AS mkt_share
    FROM (
      SELECT year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume,
             n2.n_name AS nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'AMERICA'
        AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    )
    GROUP BY o_year
    ORDER BY o_year
    """,
    description="TPC-H Q8 shape: one nation's market share of a part "
    "type's revenue in a region per year — 8-way star join (all dims "
    "broadcast), conditional-over-total ratio of two decimal-exact sums",
    covers=("B11",),
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_type") == "PROMO")
        .select("p_partkey")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    c = _t(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = _t(spark, sf_dir, "nation")
    r = (
        _t(spark, sf_dir, "region")
        .filter(F.col("r_name") == "AMERICA")
        .select("r_regionkey")
    )
    # customer-side nations restricted to the region (broadcast chain)
    n1 = n.join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    ).select(F.col("n_nationkey").alias("_ck_nk"))
    o = (
        _t(spark, sf_dir, "orders")
        .filter(
            (F.col("o_orderdate") >= _ntz("1996-01-01 00:00:00"))
            & (F.col("o_orderdate") < _ntz("1998-01-01 00:00:00"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_extendedprice", "l_discount",
    )
    n2 = n.select(
        F.col("n_nationkey").alias("_sk_nk"), F.col("n_name").alias("nation")
    )
    volume = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    joined = (
        li.join(broadcast_if_dim(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("_ck_nk"),
              "left_semi")
        .join(broadcast_if_dim(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("_sk_nk"))
    )
    target = F.when(F.col("nation") == "NATION_3", volume).otherwise(F.lit(0.0))
    return (
        joined.groupBy(F.year("o_orderdate").alias("o_year"))
        .agg((dsum(target, 4) / dsum(volume, 4)).alias("mkt_share"))
        .orderBy("o_year")
    )


@register(
    "product_type_profit",
    oracle=f"""
    SELECT nation, o_year, {sql_dsum('amount', 4)} AS sum_profit
    FROM (
      SELECT n.n_name AS nation,
             year(o.o_orderdate) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - ((0.6 * p.p_retailprice) * l.l_quantity) AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%green%'
    )
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    description="TPC-H Q9 shape: profit (revenue minus synthesized "
    "supply cost, 60% of retail) per supplier nation per year for parts "
    "matching a name pattern — LIKE prunes at the part scan and "
    "broadcasts into the fact; the cost expression mirrors the oracle's "
    "association order so the doubles are bit-identical before the "
    "decimal-exact sum",
    covers=("B11", "B6"),
)
def product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        _t(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%green%"))
        .select("p_partkey", "p_retailprice")
    )
    s = _t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = _t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    o = _t(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    li = _t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount",
    )
    amount = F.col("l_extendedprice") * (1 - F.col("l_discount")) - (
        (F.lit(0.6) * F.col("p_retailprice")) * F.col("l_quantity")
    )
    return (
        li.join(broadcast_if_dim(p), li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(broadcast_if_dim(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(dsum(amount, 4).alias("sum_profit"))
        .orderBy(F.col("nation").asc(), F.col("o_year").desc())
    )


@register(
    "order_reconciliation",
    oracle="""
    SELECT COUNT(*) AS total_keys,
           COUNT(CASE WHEN o.o_orderkey IS NULL THEN 1 END) AS lineitem_only,
           COUNT(CASE WHEN f.l_orderkey IS NULL THEN 1 END) AS orders_only,
           COUNT(CASE WHEN o.o_orderkey IS NOT NULL
                       AND f.l_orderkey IS NOT NULL THEN 1 END) AS matched
    FROM (SELECT o_orderkey FROM orders WHERE o_orderstatus = 'F') o
    FULL OUTER JOIN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
    ) f ON o.o_orderkey = f.l_orderkey
    """,
    description="FULL OUTER JOIN reconciliation: finished orders vs the "
    "distinct orderkeys present in the fact table, counting keys on each "
    "side only vs matched — the fact side is pre-aggregated to distinct "
    "keys so both inputs are key-unique (audit pattern for snapshot QA)",
    covers=("B11",),
)
def order_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        _t(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey")
    )
    f = _t(spark, sf_dir, "lineitem").select("l_orderkey").distinct()
    j = o.join(f, o.o_orderkey == f.l_orderkey, "full_outer")
    return j.agg(
        F.count(F.lit(1)).alias("total_keys"),
        F.count(F.when(F.col("o_orderkey").isNull(), 1)).alias(
            "lineitem_only"
        ),
        F.count(F.when(F.col("l_orderkey").isNull(), 1)).alias("orders_only"),
        F.count(
            F.when(
                F.col("o_orderkey").isNotNull()
                & F.col("l_orderkey").isNotNull(),
                1,
            )
        ).alias("matched"),
    )
