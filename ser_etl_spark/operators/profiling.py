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


# ---------------------------------------------------------------------------
# join-key skew histogram: group-size bands via exact bit length
# ---------------------------------------------------------------------------


def key_skew_histogram(
    df: DataFrame, key_col: str = "o_custkey"
) -> DataFrame:
    """Group-size distribution of a join/aggregation key in power-of-two
    bands — the skew-detection readout that says whether a key needs
    salting BEFORE a 100 TB join stalls on one straggler task (the
    at-rest companion of ``salted_segment_sales``'s mitigation).

    The band is ``length(bin(n))`` = ⌊log₂ n⌋ + 1 — an exact integer on
    both engines (no float log), so band membership can never waver.
    Shape: one key-grouped count (map-side partials), then a band-sized
    histogram aggregate carrying n_keys, total rows and the band's
    max group size. Fixed ~64-row output at any scale.
    """
    counts = (
        df.select(F.col(key_col).alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    band = F.length(F.bin(F.col("n"))).cast("long")
    return (
        counts.groupBy(band.alias("size_band"))
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("n").alias("total_rows"),
            F.max("n").alias("max_group"),
        )
        .orderBy("size_band")
    )


@register(
    "key_skew_histogram",
    oracle="""
    WITH counts AS (
      SELECT o_custkey AS k, COUNT(*) AS n
      FROM orders WHERE o_custkey IS NOT NULL
      GROUP BY 1
    )
    SELECT CAST(length(bin(n)) AS BIGINT) AS size_band,
           COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           CAST(MAX(n) AS BIGINT) AS max_group
    FROM counts GROUP BY 1 ORDER BY 1
    """,
    description="join-key skew readout: per-key group sizes bucketed "
    "into exact power-of-two bands (length(bin(n)) — integer log2, no "
    "float), with key counts, row totals and the band max; one keyed "
    "count + one fixed-cardinality histogram",
    covers=("B5", "N-quality"),
)
def key_skew_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return key_skew_histogram(
        load_table(spark, sf_dir, "orders"), key_col="o_custkey"
    )


# ---------------------------------------------------------------------------
# length drift: first-half vs second-half document length per source
# ---------------------------------------------------------------------------


def length_drift(docs: DataFrame) -> DataFrame:
    """Per-source document-length drift between two corpus halves
    (the TOP bit of the Knuth hash of doc_id — the multiplicative
    hash's quality bits are the high ones: its LOW bit is just the
    id's own parity, and a plain ``doc_id % 2`` is constant within a
    source whose ids share a residue, as this very fixture's do) — the
    text-side twin of ``embedding_drift``: a
    source whose new half suddenly writes much longer or shorter
    documents usually means a scraper, boilerplate or truncation
    regression upstream.

    All exact integers: per (source, half) character sums and counts,
    then the drift as basis points of the half-0 mean computed by pure
    cross-multiplication — ``(sum1·n0)·10000 div (sum0·n1)`` — so no
    per-half mean ever floats. Sources missing a half are dropped by
    the inner pairing (both engines). One (source, half) aggregate; the
    pairing joins two |sources|-sized frames.
    """
    from ser_etl_spark.operators.sampling import hash_u32

    base = docs.select(
        "source",
        (hash_u32("doc_id") / F.lit(2147483648)).cast("long").alias("half"),
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("chars"),
    ).filter(F.col("doc_id").isNotNull())
    agg = base.groupBy("source", "half").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("chars").alias("s"),
    )
    a = agg.filter(F.col("half") == 0).select(
        "source", F.col("n").alias("n0"), F.col("s").alias("s0")
    )
    b = agg.filter(F.col("half") == 1).select(
        "source", F.col("n").alias("n1"), F.col("s").alias("s1")
    )
    ratio = F.expr(
        "CAST((s1 * n0 * 10000) div nullif(s0 * n1, 0) AS BIGINT)"
    )
    return (
        a.join(b, "source")
        .select("source", "n0", "n1", "s0", "s1",
                ratio.alias("len_ratio_bp"))
        .orderBy("source")
    )


@register(
    "length_drift",
    oracle="""
    WITH base AS (
      SELECT source, ((((doc_id % 2147483648 + 2147483648) % 2147483648) * 2654435761) % 4294967296) // 2147483648 AS half,
             COALESCE(n_chars, 0) AS chars
      FROM documents WHERE doc_id IS NOT NULL
    ), agg AS (
      SELECT source, half, COUNT(*) AS n, SUM(chars) AS s
      FROM base GROUP BY 1, 2
    )
    SELECT a.source,
           CAST(a.n AS BIGINT) AS n0, CAST(b.n AS BIGINT) AS n1,
           CAST(a.s AS BIGINT) AS s0, CAST(b.s AS BIGINT) AS s1,
           CAST((CAST(b.s AS HUGEINT) * a.n * 10000)
                // nullif(CAST(a.s AS HUGEINT) * b.n, 0) AS BIGINT)
             AS len_ratio_bp
    FROM agg a JOIN agg b
      ON a.source = b.source AND a.half = 0 AND b.half = 1
    ORDER BY a.source
    """,
    description="per-source length drift between Knuth-hash corpus "
    "halves: exact "
    "integer cross-multiplied mean ratio in basis points (no per-half "
    "mean ever floats), inner pairing drops single-half sources; one "
    "(source, half) aggregate",
    covers=("B5", "N-quality"),
)
def length_drift_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return length_drift(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# equi-depth range boundaries: the repartitionByRange planner (r9)
# ---------------------------------------------------------------------------

#: target range-partition count for the boundary planner
RANGE_PARTS = 8


def range_partition_boundaries(
    df: DataFrame, key: str, parts: int = RANGE_PARTS
) -> DataFrame:
    """Exact equi-depth boundaries for range-partitioning ``key`` into
    ``parts`` partitions — the planning readout behind every
    ``repartitionByRange`` / sorted-write layout decision (Spark samples
    to estimate these; a layout job materializing a snapshot wants the
    EXACT ones, plus each bucket's true row count to see residual skew
    from heavy keys that straddle a boundary).

    Scale (the spend_gini discipline): collapse to DISTINCT key values
    first (one hash aggregate), then a window over the value domain —
    never a row-level rank. Boundary i is the value at row-rank
    ``ceil(i*n/parts)``; a value run straddling that rank contains it,
    which is exactly how ties behave in a real range partitioner (all
    copies of a value land in one partition, so bucket counts are
    computed from the same runs)."""
    from pyspark.sql.window import Window

    vals = (
        df.filter(F.col(key).isNotNull())
        .groupBy(F.col(key).alias("v"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    staged = vals.select(
        "v",
        "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("cum_start"),
    )
    totals = vals.agg(F.coalesce(F.sum("cnt"), F.lit(0)).alias("_n"))
    crossed = staged.crossJoin(F.broadcast(totals)).select(
        "*",
        F.explode(F.sequence(F.lit(1), F.lit(parts))).alias("part_no"),
    )
    # rank ceil(i*n/parts) in pure integers — the CALL's parts, not the
    # module default (r9 ADVICE: hardcoding RANGE_PARTS here silently
    # mis-bucketed any parts != 8 call)
    target = F.expr(f"((part_no * _n) + {parts - 1}) div {parts}")
    picked = crossed.filter(
        (F.col("cum_start") < target)
        & (target <= F.col("cum_start") + F.col("cnt"))
    )
    # per-part target size: rank span between consecutive boundaries
    # (derived from the same integer targets — no second row pass)
    prev_target = F.expr(
        f"(((part_no - 1) * _n) + {parts - 1}) div {parts}"
    )
    return picked.select(
        F.col("part_no").cast("int").alias("part_no"),
        F.col("v").cast("bigint").alias("upper_bound"),
        (target - prev_target).cast("bigint").alias("target_rows"),
    ).orderBy("part_no")


@register(
    "range_partition_boundaries",
    oracle=f"""
    WITH vals AS (
      SELECT l_orderkey AS v, COUNT(*) AS cnt
      FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
    ), staged AS (
      SELECT v, cnt,
             COALESCE(SUM(cnt) OVER (ORDER BY v
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cum_start
      FROM vals
    ), t AS (SELECT CAST(COALESCE(SUM(cnt), 0) AS BIGINT) AS _n FROM vals),
    parts AS (
      SELECT unnest(range(1, {RANGE_PARTS} + 1)) AS part_no
    ),
    crossed AS (
      SELECT s.*, _n, part_no FROM staged s, t, parts
    )
    SELECT CAST(part_no AS INT) AS part_no,
           CAST(v AS BIGINT) AS upper_bound,
           CAST(((part_no * _n) + {RANGE_PARTS - 1}) // {RANGE_PARTS}
                - (((part_no - 1) * _n) + {RANGE_PARTS - 1})
                  // {RANGE_PARTS} AS BIGINT) AS target_rows
    FROM crossed
    WHERE cum_start < ((part_no * _n) + {RANGE_PARTS - 1}) // {RANGE_PARTS}
      AND ((part_no * _n) + {RANGE_PARTS - 1}) // {RANGE_PARTS}
          <= cum_start + cnt
    ORDER BY part_no
    """,
    description="equi-depth range-partition boundary planner for "
    "l_orderkey (8 parts): exact boundary values at rank ceil(i*n/8) "
    "via the distinct-value window (never a row-level rank) + per-part "
    "target row counts — the repartitionByRange/sorted-layout sizing "
    "readout Spark otherwise only samples",
    covers=("A9", "B5", "X-window"),
)
def range_partition_boundaries_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return range_partition_boundaries(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    )


# ---------------------------------------------------------------------------
# orphan-events referential audit (r9)
# ---------------------------------------------------------------------------


def orphan_events_audit(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Events whose ``user_id`` resolves to no customer row — the
    referential-integrity audit for the BEHAVIORAL table (the
    order-side twin is ``referential_integrity``): per event type, how
    many events are orphaned and what share of the type that is, plus
    the distinct orphaned identities. The ops readout behind "can I
    join events to the customer dim without silent row loss".

    Plan: one broadcast LEFT SEMI-derived flag (small dim key column),
    one event-type aggregate — the events table is scanned once and
    never shuffled on the join key."""
    keys = customer.select(F.col("c_custkey").alias("user_id")).distinct()
    flagged = events.join(
        F.broadcast(keys.withColumn("_known", F.lit(1))), "user_id", "left"
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.coalesce(
                F.sum(F.col("_known").isNull().cast("bigint")), F.lit(0)
            ).cast("bigint").alias("n_orphaned"),
            F.count_distinct(
                F.when(F.col("_known").isNull(), F.col("user_id"))
            ).cast("bigint").alias("orphan_users"),
        )
        .select(
            "event_type",
            "n_events",
            "n_orphaned",
            "orphan_users",
            F.expr("(n_orphaned * 10000) div n_events")
            .cast("bigint")
            .alias("orphan_bp"),
        )
        .orderBy("event_type")
    )


@register(
    "orphan_events_audit",
    oracle="""
    WITH k AS (SELECT DISTINCT c_custkey AS user_id FROM customer),
    f AS (
      SELECT e.event_type, e.user_id,
             CAST(k.user_id IS NULL AS BIGINT) AS orphan
      FROM events e LEFT JOIN k USING (user_id)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COALESCE(SUM(orphan), 0) AS BIGINT) AS n_orphaned,
           CAST(COUNT(DISTINCT CASE WHEN orphan = 1 THEN user_id END)
             AS BIGINT) AS orphan_users,
           CAST((COALESCE(SUM(orphan), 0) * 10000) // COUNT(*) AS BIGINT)
             AS orphan_bp
    FROM f GROUP BY event_type ORDER BY event_type
    """,
    description="referential audit for the behavioral table: per event "
    "type the events whose user_id has no customer row (count, distinct "
    "orphan identities, integer-bp share) via one broadcast key flag — "
    "the silent-row-loss check before any events-to-dim join",
    covers=("B11", "N-quality"),
)
def orphan_events_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return orphan_events_audit(
        load_table(spark, sf_dir, "events"),
        load_table(spark, sf_dir, "customer"),
    )


# ---------------------------------------------------------------------------
# document/embedding alignment audit (r12)
# ---------------------------------------------------------------------------


def doc_embedding_alignment(docs: DataFrame, emb: DataFrame) -> DataFrame:
    """Corpus/vector-store alignment audit: how many documents have an
    embedding, how many are missing one, how many vectors are orphaned
    (no document), and how many present vectors are NULL payloads — the
    join-coverage QA every retrieval pipeline runs before serving (the
    doc/vec id spaces are aligned by the corpus contract
    documents.doc_id == embeddings.vec_id).

    One full-outer equi-join of two id-projected scans (column pruning
    leaves two thin columns + the NULL flag), folded to ONE summary row
    of exact BIGINTs plus coverage in basis points. At 100 TB both
    sides shuffle on their ids once; nothing wider than an id and a
    boolean moves.
    """
    d = docs.select(F.col("doc_id").alias("_did"))
    e = emb.select(
        F.col("vec_id").alias("_vid"),
        F.col("embedding").isNull().alias("_vnull"),
    )
    j = d.join(e, d["_did"] == e["_vid"], "full_outer")
    # coalesce every SUM: over an EMPTY join it is NULL, and a
    # NULL-bearing BIGINT floats through the driver's pandas path
    # (empty-corpus suite) — an empty store has zero of everything
    return j.agg(
        F.count("_did").cast("bigint").alias("n_docs"),
        F.count("_vid").cast("bigint").alias("n_vectors"),
        F.coalesce(
            F.sum(
                (F.col("_did").isNotNull() & F.col("_vid").isNotNull())
                .cast("int")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_matched"),
        F.coalesce(
            F.sum(
                (F.col("_did").isNotNull() & F.col("_vid").isNull())
                .cast("int")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_docs_unembedded"),
        F.coalesce(
            F.sum(
                (F.col("_did").isNull() & F.col("_vid").isNotNull())
                .cast("int")
            ),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_orphan_vectors"),
        F.coalesce(
            F.sum(F.coalesce(F.col("_vnull").cast("int"), F.lit(0))),
            F.lit(0),
        )
        .cast("bigint")
        .alias("n_null_payloads"),
    ).select(
        "n_docs",
        "n_vectors",
        "n_matched",
        "n_docs_unembedded",
        "n_orphan_vectors",
        "n_null_payloads",
        F.when(F.col("n_docs") == 0, F.lit(0))
        .otherwise(F.expr("(10000 * n_matched) div n_docs"))
        .cast("bigint")
        .alias("coverage_bp"),
    )


@register(
    "doc_embedding_alignment",
    oracle="""
    WITH j AS (
      SELECT d.doc_id AS _did, e.vec_id AS _vid,
             CASE WHEN e.vec_id IS NOT NULL AND e.embedding IS NULL
                  THEN 1 ELSE 0 END AS _vnull
      FROM documents d
      FULL OUTER JOIN embeddings e ON d.doc_id = e.vec_id
    )
    SELECT CAST(COUNT(_did) AS BIGINT) AS n_docs,
           CAST(COUNT(_vid) AS BIGINT) AS n_vectors,
           CAST(COALESCE(SUM(CASE WHEN _did IS NOT NULL AND _vid IS NOT NULL
                         THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_matched,
           CAST(COALESCE(SUM(CASE WHEN _did IS NOT NULL AND _vid IS NULL
                         THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_docs_unembedded,
           CAST(COALESCE(SUM(CASE WHEN _did IS NULL AND _vid IS NOT NULL
                         THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_orphan_vectors,
           CAST(COALESCE(SUM(_vnull), 0) AS BIGINT) AS n_null_payloads,
           CAST(CASE WHEN COUNT(_did) = 0 THEN 0
                ELSE (10000 * SUM(CASE WHEN _did IS NOT NULL
                                        AND _vid IS NOT NULL
                                       THEN 1 ELSE 0 END)) // COUNT(_did)
                END AS BIGINT) AS coverage_bp
    FROM j
    """,
    description="retrieval-readiness QA: docs<->vectors full-outer "
    "alignment — matched/unembedded/orphan/NULL-payload counts + "
    "coverage bp in one summary row; two id-projected scans, one "
    "id-keyed shuffle each, nothing wider than an id moves",
    covers=("N-sim", "B11"),
)
def doc_embedding_alignment_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return doc_embedding_alignment(
        load_table(spark, sf_dir, "documents"),
        load_table(spark, sf_dir, "embeddings"),
    )
