"""Table profiling: per-column statistics in one pass.

Extends schema introspection (reference A5 — INFORMATION_SCHEMA column
metadata, ``/root/reference/etl-service/src/database.py:95-108``) with
the *data* profile an ETL operator needs before trusting a snapshot:
row count, null count, distinct count, min/max per column. The reference
computes none of this (its QA is limited to the unique index build,
``sync.py:90-94``); here it generalizes the ``check_unique`` gate.

Scale design: ONE aggregate pass computes every column's statistics
simultaneously (a single partial+final hash aggregate, no per-column
jobs); output is then unpivoted to one row per column. ``COUNT(DISTINCT
a), COUNT(DISTINCT b), ...`` in one aggregate triggers Spark's expand
(one input-row replica per distinct aggregate) — fine for a bounded
column list; for very wide tables swap in ``approx_count_distinct``,
which needs no expand (the sketch path of ``operators/sketches.py``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def profile_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """One row per profiled column: (column, n_rows, n_nulls,
    n_distinct, min_value, max_value) — min/max rendered as strings so
    heterogeneous column types fit one output schema."""
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in columns:
        aggs += [
            F.count(F.when(F.col(c).isNull(), 1)).alias(f"_null_{c}"),
            F.count_distinct(F.col(c)).alias(f"_dist_{c}"),
            F.min(F.col(c)).cast("string").alias(f"_min_{c}"),
            F.max(F.col(c)).cast("string").alias(f"_max_{c}"),
        ]
    one = df.agg(*aggs)
    per_col = [
        F.struct(
            F.lit(c).alias("column"),
            F.col("_n").alias("n_rows"),
            F.col(f"_null_{c}").alias("n_nulls"),
            F.col(f"_dist_{c}").alias("n_distinct"),
            F.col(f"_min_{c}").alias("min_value"),
            F.col(f"_max_{c}").alias("max_value"),
        )
        for c in columns
    ]
    return (
        one.select(F.explode(F.array(*per_col)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )


@register(
    "table_profile",
    oracle="""
    WITH one AS (
      SELECT COUNT(*) AS n,
             COUNT(CASE WHEN o_custkey IS NULL THEN 1 END) AS null_custkey,
             COUNT(DISTINCT o_custkey) AS dist_custkey,
             CAST(MIN(o_custkey) AS VARCHAR) AS min_custkey,
             CAST(MAX(o_custkey) AS VARCHAR) AS max_custkey,
             COUNT(CASE WHEN o_orderstatus IS NULL THEN 1 END) AS null_status,
             COUNT(DISTINCT o_orderstatus) AS dist_status,
             CAST(MIN(o_orderstatus) AS VARCHAR) AS min_status,
             CAST(MAX(o_orderstatus) AS VARCHAR) AS max_status,
             COUNT(CASE WHEN o_orderdate IS NULL THEN 1 END) AS null_date,
             COUNT(DISTINCT o_orderdate) AS dist_date,
             CAST(MIN(o_orderdate) AS VARCHAR) AS min_date,
             CAST(MAX(o_orderdate) AS VARCHAR) AS max_date
      FROM orders
    )
    SELECT 'o_custkey' AS "column", n AS n_rows, null_custkey AS n_nulls,
           dist_custkey AS n_distinct, min_custkey AS min_value,
           max_custkey AS max_value
    FROM one
    UNION ALL
    SELECT 'o_orderdate', n, null_date, dist_date, min_date, max_date FROM one
    UNION ALL
    SELECT 'o_orderstatus', n, null_status, dist_status, min_status,
           max_status FROM one
    ORDER BY "column"
    """,
    description="ETL QA extension of A5/A8: per-column profile (rows, "
    "nulls, distinct, min/max) for orders in ONE aggregate pass — "
    "generalizes the unique-index QA gate; sketch variant is the "
    "wide-table path",
    covers=("A5", "A8"),
)
def table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return profile_columns(
        orders, ["o_custkey", "o_orderdate", "o_orderstatus"]
    )


def referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orphan count per declared foreign-key relationship.

    The star schema's integrity contract as one QA query: each
    relationship is a LEFT ANTI join (NOT EXISTS) counted; the parent
    key sets are dimension-sized or id-projections, so Catalyst
    broadcasts them and the fact side never shuffles. Healthy data
    returns all-zero counts — the non-zero case is the alert.
    """
    from ser_etl_spark.etl.quality import fk_orphans

    rels = [
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    parts = []
    for name, child_t, child_c, parent_t, parent_c in rels:
        orphans = fk_orphans(
            load_table(spark, sf_dir, child_t),
            child_c,
            load_table(spark, sf_dir, parent_t),
            parent_c,
        )
        parts.append(
            orphans.agg(F.count(F.lit(1)).alias("orphans")).select(
                F.lit(name).alias("relationship"), "orphans"
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("relationship")


@register(
    "referential_integrity",
    oracle="""
    SELECT 'customer->nation' AS relationship,
           (SELECT COUNT(*) FROM customer c WHERE c.c_nationkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey)) AS orphans
    UNION ALL
    SELECT 'lineitem->orders',
           (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'orders->customer',
           (SELECT COUNT(*) FROM orders o WHERE o.o_custkey IS NOT NULL
              AND NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    ORDER BY relationship
    """,
    description="ETL QA: orphan counts for the star schema's three FK "
    "relationships via LEFT ANTI joins (parent keys broadcast, fact "
    "side unshuffled); completes the A8 unique-index gate with the "
    "referential half of the constraint family",
    covers=("A8", "B11"),
)
def referential_integrity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return referential_integrity(spark, sf_dir)


# ---------------------------------------------------------------------------
# corpus composition: dominant language per source (grouped argmax)
# ---------------------------------------------------------------------------


def dominant_lang_share(docs: DataFrame) -> DataFrame:
    """Per-source corpus composition: each source's most frequent
    language and its share — the mixture-monitoring readout a crawl
    pipeline watches for ingest drift (a source flipping dominant
    language usually means a scraper or boilerplate regression).

    Exactness: the share is integer basis points
    (``lang_docs * 10000 div total_docs`` — no float), the argmax picks
    deterministically by (count DESC, lang ASC), and NULL languages
    count as a real category (both engines group NULL as its own key).
    Shape: one (source, lang) hash aggregate — map-side partials make
    the shuffle carry at most |sources|x|langs| rows — then a rank
    window and total-sum window over those AGGREGATED rows on the
    source key. Raw documents shuffle exactly once.
    """
    from pyspark.sql import Window

    counts = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("lang_docs")
    )
    ws = Window.partitionBy("source")
    wr = Window.partitionBy("source").orderBy(
        F.col("lang_docs").desc(), F.col("lang").asc_nulls_first()
    )
    staged = counts.select(
        "source",
        "lang",
        "lang_docs",
        F.sum("lang_docs").over(ws).alias("total_docs"),
        F.row_number().over(wr).alias("_rn"),
    )
    return (
        staged.filter(F.col("_rn") == 1)
        .select(
            "source",
            F.col("lang").alias("top_lang"),
            "lang_docs",
            "total_docs",
            F.expr("(lang_docs * 10000) div total_docs")
            .cast("long")
            .alias("share_bp"),
        )
        .orderBy("source")
    )


@register(
    "dominant_lang_share",
    oracle="""
    WITH counts AS (
      SELECT source, lang, COUNT(*) AS lang_docs
      FROM documents GROUP BY source, lang
    ), staged AS (
      SELECT source, lang, lang_docs,
             CAST(SUM(lang_docs) OVER (PARTITION BY source) AS BIGINT)
               AS total_docs,
             ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY lang_docs DESC, lang ASC NULLS FIRST) AS rn
      FROM counts
    )
    SELECT source, lang AS top_lang, lang_docs, total_docs,
           CAST((lang_docs * 10000) // total_docs AS BIGINT) AS share_bp
    FROM staged WHERE rn = 1
    ORDER BY source
    """,
    description="ingest-drift monitor: per-source dominant language and "
    "its integer-basis-point share via grouped argmax (count DESC, lang "
    "ASC tiebreak, NULL lang a real category) — one (source,lang) "
    "aggregate, windows only over the aggregated rows",
    covers=("B5", "X-window", "N-quality"),
)
def dominant_lang_share_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dominant_lang_share(load_table(spark, sf_dir, "documents"))
