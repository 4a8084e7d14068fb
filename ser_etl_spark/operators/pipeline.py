"""End-to-end corpus curation: the composed training-data pipeline.

The individual operators (fingerprint dedup, quality scoring, dataset
splitting — each oracle-verified on its own) are only useful composed:
raw corpus -> dedup survivors -> quality gate -> reproducible split ->
per-split accounting. This module registers that composition as ONE
query so the gate checks the *pipeline*, not just its stages — operator
interactions (join keys, filter ordering, column flow) are where
integration bugs live.

Scale design: the whole pipeline is two shuffles — one fingerprint
group (dedup) and the final split/lang aggregate; quality scoring and
split assignment are stateless projections fused into the surrounding
stages by Catalyst. Filters run before the wide aggregate, so the
shuffled payload is already deduped and quality-gated.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ser_etl_spark.functions.numeric import dsum, sql_dsum
from ser_etl_spark.operators.sampling import assign_split, sql_split_bucket
from ser_etl_spark.operators.text import fingerprint, quality_score
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

QUALITY_THRESHOLD = 0.5

_QUALITY_SQL = """
    0.4 * least(CAST(len(string_split_regex(trim(lower(text)), ' +')) AS DOUBLE) / 64.0, 1.0)
    + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[\\w\\s]', '', 'g')) AS DOUBLE)
               / CAST(length(text) AS DOUBLE))
    + 0.3 * least(CAST(len(list_filter(string_split_regex(trim(lower(text)), ' +'),
         t -> list_contains(['the','a','an','and','or','of','to','in','is','it'], t))) AS DOUBLE)
      / CAST(len(string_split_regex(trim(lower(text)), ' +')) AS DOUBLE) * 4.0, 1.0)
"""


def curate_corpus(docs: DataFrame) -> DataFrame:
    """raw docs -> deduped (min-doc_id survivor per normalized
    fingerprint) -> quality-gated -> split-assigned rows."""
    fp = fingerprint(docs)  # (doc_id, fp)
    w = Window.partitionBy("fp")
    survivors = (
        fp.withColumn("keep", F.col("doc_id") == F.min("doc_id").over(w))
        .filter("keep")
        .select("doc_id")
    )
    quality = quality_score(docs).select("doc_id", "quality")
    kept = (
        docs.join(survivors, "doc_id")
        .join(quality, "doc_id")
        .filter(F.col("quality") >= QUALITY_THRESHOLD)
    )
    return assign_split(kept, "doc_id")


@register(
    "corpus_curation",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, lang, n_chars, text,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fp
      FROM documents
    ), survivors AS (
      SELECT * FROM (
        SELECT fp.*, MIN(doc_id) OVER (PARTITION BY fp) AS min_id FROM fp
      ) WHERE doc_id = min_id
    ), gated AS (
      SELECT * FROM survivors WHERE ({_QUALITY_SQL}) >= {QUALITY_THRESHOLD}
    ), split AS (
      SELECT lang, n_chars,
             CASE WHEN {sql_split_bucket('doc_id')} < 80 THEN 'train'
                  WHEN {sql_split_bucket('doc_id')} < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM gated
    )
    SELECT split, lang,
           COUNT(*) AS n_docs,
           {sql_dsum('n_chars', 0)} AS total_chars
    FROM split
    GROUP BY split, lang
    ORDER BY split, lang
    """,
    description="the COMPOSED training-data pipeline as one gate-checked "
    "query: fingerprint dedup (min-id survivor) -> quality threshold -> "
    "reproducible split -> per-(split, lang) accounting; two shuffles "
    "total, stateless stages fused by Catalyst",
    covers=("N-dedup", "N-text", "X-split"),
)
def corpus_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        curate_corpus(docs)
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            dsum("n_chars", 0).alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# corpus_release (r14, VERDICT r13 #4): the full release gate COMPOSED
# ---------------------------------------------------------------------------


def _corpus_release_oracle() -> str:
    from ser_etl_spark.operators.curation import BENCH_MOD, CONTAMINATION_N
    from ser_etl_spark.operators.packing import _SHARD_CHARS
    from ser_etl_spark.operators.text import PII_PATTERNS

    k = CONTAMINATION_N
    toks = "string_split_regex(trim(lower(text)), ' +')"
    gram = " || ' ' || ".join(
        f"t[i+{j}]" for j in range(k)
    ).replace("t[i+0]", "t[i]")
    split_case = (
        f"CASE WHEN {sql_split_bucket('canon_id')} < 80 THEN 'train' "
        f"WHEN {sql_split_bucket('canon_id')} < 90 THEN 'val' "
        f"ELSE 'test' END"
    )
    pii_any = " OR ".join(
        f"COALESCE(len(regexp_extract_all(text, '{pat}')), 0) > 0"
        for _, pat in PII_PATTERNS
    )
    return f"""
    WITH pool AS (
      SELECT doc_id, COALESCE(n_chars, 0) AS chars, text
      FROM documents WHERE doc_id % {BENCH_MOD} <> 0
    ), bench_sh AS (
      SELECT DISTINCT {gram} AS sh
      FROM (SELECT t, unnest(generate_series(1, len(t)-{k - 1})) AS i
            FROM (SELECT {toks} AS t
                  FROM documents WHERE doc_id % {BENCH_MOD} = 0)
            WHERE len(t) >= {k})
    ), contam AS (
      SELECT DISTINCT doc_id
      FROM (SELECT doc_id, {gram} AS sh
            FROM (SELECT doc_id, t,
                         unnest(generate_series(1, len(t)-{k - 1})) AS i
                  FROM (SELECT doc_id, {toks} AS t FROM pool)
                  WHERE len(t) >= {k}))
      JOIN bench_sh USING (sh)
    ), flags AS (
      SELECT p.doc_id, p.chars, p.text,
             (c.doc_id IS NOT NULL) AS is_contam,
             COALESCE(({_QUALITY_SQL}) >= {QUALITY_THRESHOLD}, FALSE) AS q_ok
      FROM pool p LEFT JOIN contam c USING (doc_id)
    ), funnel AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_raw,
             CAST(COALESCE(SUM(chars), 0) AS BIGINT) AS c_raw,
             CAST(COUNT(*) FILTER (WHERE NOT is_contam) AS BIGINT) AS n_decon,
             CAST(COALESCE(SUM(chars) FILTER (WHERE NOT is_contam), 0)
                  AS BIGINT) AS c_decon,
             CAST(COUNT(*) FILTER (WHERE NOT is_contam AND q_ok)
                  AS BIGINT) AS n_gated,
             CAST(COALESCE(SUM(chars) FILTER (WHERE NOT is_contam AND q_ok),
                  0) AS BIGINT) AS c_gated
      FROM flags
    ), kept AS (
      SELECT doc_id, chars, text,
             md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')))
               AS fp
      FROM flags WHERE NOT is_contam AND q_ok
    ), canon AS (
      SELECT *, MIN(doc_id) OVER (PARTITION BY fp) AS canon_id FROM kept
    ), surv AS (
      SELECT doc_id, chars, canon_id,
             {split_case} AS split,
             CASE WHEN {pii_any} THEN 1 ELSE 0 END AS pii
      FROM canon WHERE doc_id = canon_id
    ), per_split AS (
      SELECT split,
             CAST(COUNT(*) AS BIGINT) AS sn,
             CAST(COALESCE(SUM(chars), 0) AS BIGINT) AS sc,
             CAST(COALESCE(SUM(pii), 0) AS BIGINT) AS pii_docs,
             CAST(COALESCE(SUM(chars) FILTER (WHERE pii = 1), 0) AS BIGINT)
               AS pii_chars
      FROM surv GROUP BY split
    ), sharded AS (
      SELECT split, chars,
             COALESCE(SUM(chars) OVER (
               PARTITION BY split ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               // {_SHARD_CHARS} AS shard_id
      FROM surv
    ), shards AS (
      SELECT split, shard_id, SUM(chars) AS shard_chars
      FROM sharded GROUP BY 1, 2
    )
    SELECT '0_raw' AS stage, 'all' AS detail,
           n_raw AS n_docs, c_raw AS n_chars FROM funnel
    UNION ALL SELECT '1_decontaminated', 'all', n_decon, c_decon FROM funnel
    UNION ALL SELECT '2_quality_gated', 'all', n_gated, c_gated FROM funnel
    UNION ALL SELECT '3_deduped', 'all',
           CAST(COUNT(*) AS BIGINT),
           CAST(COALESCE(SUM(chars), 0) AS BIGINT) FROM surv
    UNION ALL SELECT '4_split', split, sn, sc FROM per_split
    UNION ALL SELECT '5_pii_flagged', split, pii_docs, pii_chars
      FROM per_split
    UNION ALL SELECT '6_shards', split,
           CAST(COUNT(*) AS BIGINT), CAST(MAX(shard_chars) AS BIGINT)
      FROM shards GROUP BY split
    ORDER BY stage, detail
    """


@register(
    "corpus_release",
    oracle=_corpus_release_oracle(),
    description="the FULL release gate composed as one query: "
    "benchmark decontamination -> quality gate -> fingerprint dedup -> "
    "cluster-keyed (leakage-safe) split -> per-split PII accounting -> "
    "byte-balanced shard manifest, with per-stage row/char accounting",
    covers=("N-curation", "N-dedup", "N-quality", "X-sample"),
)
def corpus_release(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The r6-era ``corpus_curation`` composition predates the release-
    gate wave; this is the pipeline a production corpus RELEASE runs
    (VERDICT r13 #4), each stage the registered operator's policy:

    1. drop the held-out benchmark slice and every pool doc sharing a
       word 5-gram with it (``curation.benchmark_contamination``'s
       broadcast n-gram join, existence-only so the pool side never
       shuffles its shingles);
    2. quality gate at the shared ``text.quality_cols`` threshold;
    3. normalized-fingerprint dedup, min-id canonical survivor;
    4. split keyed on the CLUSTER canonical id — the
       ``leakage_safe_split`` policy, so a dup cluster can never
       straddle train/val/test;
    5. per-split PII exposure accounting (``text.pii_by_split``'s
       detectors) — the privacy numbers a release publishes;
    6. byte-balanced shard manifest per split (``packing.
       shard_manifest``'s two-level exact prefix sum).

    Output: one row per (stage, detail) with row/char accounting —
    stage-interaction bugs (column flow, join keys, filter ordering)
    surface as a wrong funnel number, which is exactly what the
    composition exists to catch.

    Scale: two corpus-sized shuffles end-to-end (the fingerprint window
    and the per-(split, bucket) shard window); everything else is
    broadcast joins (bench n-grams, contaminated-id sliver, bucket
    offsets — all slivers by construction) and map-side-partial
    aggregates. All accounting branches derive from ONE ``marked``
    lineage (the canonical id is min-over-KEPT-docs via a conditional
    window min, so no pre-window filter forks the plan); the union's
    branches re-scan that lineage rather than caching — scans
    parallelize at 100 TB, materialized intermediates don't, and the
    identical branch prefixes let Spark's exchange reuse collapse the
    repeated fp exchange at runtime.
    """
    from ser_etl_spark.operators.curation import BENCH_MOD, CONTAMINATION_N
    from ser_etl_spark.operators.packing import _SHARD_BUCKET_W, _SHARD_CHARS
    from ser_etl_spark.operators.sampling import DEFAULT_SPLITS, split_bucket
    from ser_etl_spark.operators.text import PII_PATTERNS, quality_cols

    docs = load_table(spark, sf_dir, "documents")
    is_bench = F.pmod(F.col("doc_id"), F.lit(BENCH_MOD)) == 0
    pool = docs.filter(~is_bench).select(
        "doc_id",
        F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("chars"),
        "text",
    )

    n = CONTAMINATION_N

    def shingles(df: DataFrame) -> DataFrame:
        """dedup.shingle_rows minus its distinct — existence only, so
        the (doc, sh) dedup shuffle is unnecessary on the pool side."""
        toks = df.select(
            "doc_id",
            F.split(F.trim(F.lower(F.col("text"))), " +").alias("_t"),
        ).filter(F.size("_t") >= n)
        t = F.col("_t")
        idx = toks.select(
            "doc_id",
            "_t",
            F.explode(F.sequence(F.lit(1), F.size(t) - (n - 1))).alias("_i"),
        )
        i = F.col("_i")
        sh = F.concat_ws(
            " ",
            F.element_at(t, i),
            *[F.element_at(t, i + j) for j in range(1, n)],
        )
        return idx.select("doc_id", sh.alias("sh"))

    bench_sh = shingles(docs.filter(is_bench)).select("sh").distinct()
    contam_ids = (
        shingles(pool)
        .join(F.broadcast(bench_sh), "sh")
        .select("doc_id")
        .distinct()
    )

    _, _, score = quality_cols()
    fp = F.md5(
        F.trim(F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9]+", " "))
    )
    bucket = split_bucket("canon_id")
    split_expr = F.lit(None).cast("string")
    for sname, lo, hi in reversed(DEFAULT_SPLITS):
        split_expr = F.when((bucket >= lo) & (bucket < hi), sname).otherwise(
            split_expr
        )
    pii_flag = None
    for _, pat in PII_PATTERNS:
        c = F.coalesce(F.regexp_count(F.col("text"), F.lit(pat)), F.lit(0)) > 0
        pii_flag = c if pii_flag is None else (pii_flag | c)

    kept_cond = ~F.col("is_contam") & F.col("q_ok")
    w = Window.partitionBy("fp")
    # ONE lineage for every accounting branch: canonical id = min doc_id
    # among KEPT docs of the fp group (the conditional min ignores
    # nulls), so no pre-window filter forks the plan and the union's
    # branches stay identical prefixes.
    marked = (
        pool.join(
            F.broadcast(contam_ids.withColumn("_hit", F.lit(1))),
            "doc_id",
            "left",
        )
        .withColumn("is_contam", F.coalesce(F.col("_hit"), F.lit(0)) == 1)
        .withColumn(
            "q_ok",
            F.coalesce(score >= F.lit(QUALITY_THRESHOLD), F.lit(False)),
        )
        .withColumn("fp", fp)
        .withColumn(
            "canon_id",
            F.min(F.when(kept_cond, F.col("doc_id"))).over(w),
        )
        .withColumn(
            "is_surv", kept_cond & (F.col("doc_id") == F.col("canon_id"))
        )
        .withColumn("split", split_expr)
        .withColumn("pii", pii_flag.cast("int"))
    )

    def csum(col):
        """conditional sums are NULL over zero rows on Spark; the oracle
        coalesces to 0 — mirror it (empty/one-row corpus seams)."""
        return F.coalesce(F.sum(col), F.lit(0)).cast("bigint")

    funnel_rows = marked.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_raw"),
        csum("chars").alias("c_raw"),
        csum(F.when(~F.col("is_contam"), 1).otherwise(0)).alias("n_decon"),
        csum(
            F.when(~F.col("is_contam"), F.col("chars")).otherwise(0)
        ).alias("c_decon"),
        csum(F.when(kept_cond, 1).otherwise(0)).alias("n_gated"),
        csum(F.when(kept_cond, F.col("chars")).otherwise(0)).alias("c_gated"),
        csum(F.when(F.col("is_surv"), 1).otherwise(0)).alias("n_dedup"),
        csum(
            F.when(F.col("is_surv"), F.col("chars")).otherwise(0)
        ).alias("c_dedup"),
    ).selectExpr(
        "stack(4, "
        "'0_raw', 'all', n_raw, c_raw, "
        "'1_decontaminated', 'all', n_decon, c_decon, "
        "'2_quality_gated', 'all', n_gated, c_gated, "
        "'3_deduped', 'all', n_dedup, c_dedup) "
        "AS (stage, detail, n_docs, n_chars)"
    )

    surv2 = marked.filter("is_surv").select(
        "doc_id", "chars", "split", "pii"
    )

    # one 3-row aggregate feeds BOTH the split and pii stage rows
    split_pii_rows = (
        surv2.groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("sn"),
            F.coalesce(F.sum("chars"), F.lit(0)).cast("bigint").alias("sc"),
            F.coalesce(F.sum("pii"), F.lit(0))
            .cast("bigint")
            .alias("pii_docs"),
            F.coalesce(
                F.sum(F.when(F.col("pii") == 1, F.col("chars")).otherwise(0)),
                F.lit(0),
            )
            .cast("bigint")
            .alias("pii_chars"),
        )
        .selectExpr(
            "stack(2, "
            "'4_split', split, sn, sc, "
            "'5_pii_flagged', split, pii_docs, pii_chars) "
            "AS (stage, detail, n_docs, n_chars)"
        )
    )

    # byte-balanced shards per split: packing.shard_manifest's two-level
    # exact prefix sum, partitioned by split (bucket is monotone in
    # doc_id, so (bucket, doc_id) order == the oracle's doc_id order)
    base = surv2.select("split", "doc_id", "chars").withColumn(
        "bucket",
        F.expr(
            f"(doc_id - pmod(doc_id, {_SHARD_BUCKET_W})) "
            f"div {_SHARD_BUCKET_W}"
        ).cast("long"),
    )
    totals = base.groupBy("split", "bucket").agg(
        F.sum("chars").alias("bucket_chars")
    )
    wb = (
        Window.partitionBy("split")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "split",
        "bucket",
        F.coalesce(F.sum("bucket_chars").over(wb), F.lit(0)).alias(
            "bucket_offset"
        ),
    )
    wd = (
        Window.partitionBy("split", "bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_rows = (
        base.join(F.broadcast(offsets), ["split", "bucket"])
        .withColumn(
            "start_off",
            F.col("bucket_offset")
            + F.coalesce(F.sum("chars").over(wd), F.lit(0)),
        )
        .withColumn("shard_id", F.expr(f"start_off div {_SHARD_CHARS}"))
        .groupBy("split", "shard_id")
        .agg(F.sum("chars").alias("shard_chars"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shards"),
            F.max("shard_chars").cast("bigint").alias("max_chars"),
        )
        .selectExpr(
            "'6_shards' AS stage", "split AS detail",
            "n_shards AS n_docs", "max_chars AS n_chars",
        )
    )

    return (
        funnel_rows.unionAll(split_pii_rows)
        .unionAll(shard_rows)
        .orderBy("stage", "detail")
    )
