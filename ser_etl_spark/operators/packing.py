"""Sequence packing: fill fixed token-budget bins with documents.

Training-data pipelines pack variable-length documents into fixed-size
token windows (e.g. 2048/4096/8192) so no compute is wasted on padding.
The operator here is the distributed form of the standard greedy
streaming packer:

1. Token counts are computed map-side with the BPE-ish pre-tokenizer
   regex (JVM ``regexp_count`` — no Python, no array materialization).
2. Documents are sharded by ``hash(doc_id) % num_shards`` *within* each
   source, bounding every packing group to ~1/num_shards of a source —
   this is what makes the operator safe at 100 TB: a group must fit one
   Arrow batch stream, never a whole corpus partition. Bins never span
   shards, so sharding cannot produce invalid bins (only marginally
   more of them).
3. Each (source, shard) group packs greedily in doc_id order inside an
   ``applyInPandas`` — a sequential running-total-with-reset that SQL
   window functions cannot express (the reset makes it non-prefix-sum).
   Deterministic: same inputs -> same bins, independent of partitioning.

Output: one row per document with its assigned ``(source, shard,
bin_id)`` bin and ``bin_pos`` offset — the shuffle-ready layout for a
downstream "concatenate bin members" write.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ser_etl_spark.operators.text import TOKEN_REGEX
from ser_etl_spark.oracle_hash import stages_to_ctes, xxh64_long_stage_cols
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

#: Default packing window (tokens per bin).
PACK_BUDGET = 1024

#: Shards per source — bounds the size of any single packing group.
#: MUST be a power of two: the oracle emulates Spark's
#: ``pmod(xxhash64(id), PACK_SHARDS)`` with an UNSIGNED ``% PACK_SHARDS``
#: over the mod-2^64 hash value, and the two agree only when PACK_SHARDS
#: divides 2^64.
PACK_SHARDS = 16
assert PACK_SHARDS & (PACK_SHARDS - 1) == 0, "PACK_SHARDS must be a power of two"

PACKED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("source", StringType()),
        StructField("shard", IntegerType()),
        StructField("n_tokens", LongType()),
        StructField("bin_id", LongType()),
        StructField("bin_pos", LongType()),
    ]
)


def greedy_pack(sizes: list[int], budget: int) -> list[tuple[int, int]]:
    """Reference greedy packer: ``(bin_id, bin_pos)`` per input size.

    A new bin opens when the current one cannot fit the next item; an
    item larger than the whole budget gets a bin of its own. Shared by
    the distributed operator (per group) and the tests (as the oracle).
    """
    out: list[tuple[int, int]] = []
    bin_id, used = 0, 0
    for size in sizes:
        if used > 0 and used + size > budget:
            bin_id, used = bin_id + 1, 0
        out.append((bin_id, used))
        used += size
    return out


def pack_sequences(
    docs: DataFrame,
    budget: int = PACK_BUDGET,
    num_shards: int = PACK_SHARDS,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
) -> DataFrame:
    """Assign every document to a ``(source, shard, bin_id)`` token bin."""
    counted = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(group_col).alias("source"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_shards))
        .cast("int")
        .alias("shard"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_REGEX))
        .cast("long")
        .alias("n_tokens"),
    )

    # Self-contained closure: cloudpickle ships it by value, executors
    # never import ser_etl_spark. Mirrors greedy_pack above.
    def pack_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        bin_ids, bin_pos = [], []
        bin_id, used = 0, 0
        for size in pdf["n_tokens"]:
            if used > 0 and used + size > budget:
                bin_id, used = bin_id + 1, 0
            bin_ids.append(bin_id)
            bin_pos.append(used)
            used += int(size)
        pdf["bin_id"] = pd.Series(bin_ids, dtype="int64")
        pdf["bin_pos"] = pd.Series(bin_pos, dtype="int64")
        return pdf

    return counted.groupBy("source", "shard").applyInPandas(
        pack_group, PACKED_SCHEMA
    )


def _pack_oracle() -> str:
    """The greedy fold as a recursive CTE: each iteration advances every
    (source, shard) group by one document in doc_id order, carrying
    (bin_id, used) — recursion expresses the running-total-with-reset
    that window functions cannot. Depth = the largest group, which the
    sharding bounds by construction.

    The shard hash is Spark's ``xxhash64(BIGINT)`` emulated in DuckDB
    HUGEINT mod-2^64 arithmetic via the STAGED CTE-column chain in
    :mod:`ser_etl_spark.oracle_hash` (one named column per hash step —
    the round-4 inline form duplicated the input ~32k times into a
    1.6 MB SQL string); the unsigned ``% PACK_SHARDS`` equals Spark's
    ``pmod`` because PACK_SHARDS divides 2^64 (asserted above).
    """
    stages = xxh64_long_stage_cols("doc_id", "_ph", pfx="_pk")
    hash_ctes, hashed = stages_to_ctes("_pd", stages, "_ps")
    return f"""
    WITH RECURSIVE _pd AS (
      SELECT doc_id, source, text FROM documents
    ){hash_ctes}, counted AS (
      SELECT doc_id, source,
             CAST(_ph % {PACK_SHARDS} AS INTEGER) AS shard,
             CAST(len(regexp_extract_all(text, '{TOKEN_REGEX}')) AS BIGINT)
               AS n_tokens
      FROM {hashed}
    ), items AS (
      SELECT doc_id, source, shard, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY source, shard
                                ORDER BY doc_id) AS rn
      FROM counted
    ), rec AS (
      SELECT doc_id, source, shard, n_tokens, rn,
             CAST(0 AS BIGINT) AS bin_id,
             CAST(0 AS BIGINT) AS bin_pos,
             n_tokens AS used
      FROM items WHERE rn = 1
      UNION ALL
      SELECT i.doc_id, i.source, i.shard, i.n_tokens, i.rn,
             CASE WHEN r.used > 0 AND r.used + i.n_tokens > {PACK_BUDGET}
                  THEN r.bin_id + 1 ELSE r.bin_id END,
             CASE WHEN r.used > 0 AND r.used + i.n_tokens > {PACK_BUDGET}
                  THEN CAST(0 AS BIGINT) ELSE r.used END,
             CASE WHEN r.used > 0 AND r.used + i.n_tokens > {PACK_BUDGET}
                  THEN i.n_tokens ELSE r.used + i.n_tokens END
      FROM rec r JOIN items i
        ON i.source = r.source AND i.shard = r.shard AND i.rn = r.rn + 1
    )
    SELECT doc_id, source, shard, n_tokens, bin_id, bin_pos FROM rec
    """


@register(
    "pack_sequences",
    oracle=_pack_oracle(),
    description="greedy sequence packing into 1024-token bins per "
    "(source, shard) group via applyInPandas — bounded groups, "
    "deterministic bins, map-side JVM token counting. Oracle-backed "
    "since r4: the greedy fold is a recursive CTE (window functions "
    "cannot express the reset) and the xxhash64 shard assignment is "
    "emulated in HUGEINT mod-2^64 arithmetic, so DuckDB reproduces the "
    "exact bins",
    covers=("N-text",),
)
def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# shard manifest: byte-balanced training shards via distributed prefix sum
# ---------------------------------------------------------------------------

#: Coarse doc_id range width for the two-level prefix sum. At 100 TB
#: (~1e10 docs) a wider bucket leaves ~1e7 bucket rows for the
#: offset window — megabytes on one task; recurse a third level if the
#: id space ever outgrows that.
_SHARD_BUCKET_W = 64
#: Target shard payload in characters. Production uses ~256 MiB; the
#: fixture-scale defaults (64-wide buckets, 8 KiB shards) keep BOTH
#: prefix-sum levels exercised on the 500-doc differential corpus.
_SHARD_CHARS = 8192


def _floordiv_sql(num: str, w: int) -> str:
    """Engine-exact floor division for possibly-negative BIGINTs: strip
    the non-negative pmod remainder first so truncating division equals
    floor division in both engines (pure int64 — no float seam)."""
    return f"(({num}) - ((({num}) % {w} + {w}) % {w})) // {w}"


def shard_manifest(
    docs: DataFrame,
    shard_chars: int = _SHARD_CHARS,
    bucket_w: int = _SHARD_BUCKET_W,
) -> DataFrame:
    """Byte-balanced training-shard assignment: every document gets the
    shard ``floor(start_offset / shard_chars)`` where ``start_offset``
    is the EXACT number of corpus characters before it in stable doc_id
    order — the manifest a training-data writer needs to cut ~equal
    shards without a serial pass (reference analog: the snapshot
    publish layout, /root/reference/etl-service/src/s3_uploader.py:27).

    The scale problem is the global cumulative sum: a single ORDER BY
    window is one task over the whole corpus. This uses the standard
    two-level exact prefix sum instead: (1) hash-aggregate per coarse
    doc_id bucket (map-side partials, one keyed shuffle), (2) cumsum
    the TINY bucket-totals series on one task (|buckets| rows, ~1e7 at
    100 TB), (3) broadcast the offsets back and run the within-bucket
    cumsum as a per-bucket window — embarrassingly parallel. Every sum
    is exact BIGINT; floor division goes through the pmod identity so
    negative ids stay engine-exact. Documents straddling a boundary
    belong to the shard their START offset lands in (the standard
    deterministic rule, so shards can overshoot by at most one doc).
    """
    from pyspark.sql import Window

    base = (
        docs.filter(F.col("doc_id").isNotNull())
        .select(
            "doc_id",
            F.coalesce(F.col("n_chars"), F.lit(0)).cast("long").alias("chars"),
        )
        .withColumn(
            "bucket",
            F.expr(
                f"(doc_id - pmod(doc_id, {bucket_w})) div {bucket_w}"
            ).cast("long"),
        )
    )
    totals = base.groupBy("bucket").agg(F.sum("chars").alias("bucket_chars"))
    wb = (
        Window.orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        "bucket",
        F.coalesce(F.sum("bucket_chars").over(wb), F.lit(0)).alias(
            "bucket_offset"
        ),
    )
    wd = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = (
        base.join(F.broadcast(offsets), "bucket")
        .withColumn(
            "start_off",
            F.col("bucket_offset")
            + F.coalesce(F.sum("chars").over(wd), F.lit(0)),
        )
        .withColumn(
            "shard_id",
            F.expr(f"start_off div {shard_chars}").cast("long"),
        )
    )
    return (
        assigned.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("chars").alias("shard_chars"),
            F.min("doc_id").alias("first_doc"),
            F.max("doc_id").alias("last_doc"),
        )
        .orderBy("shard_id")
    )


@register(
    "shard_manifest",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, COALESCE(n_chars, 0) AS chars,
             {_floordiv_sql('doc_id', _SHARD_BUCKET_W)} AS bucket
      FROM documents WHERE doc_id IS NOT NULL
    ), totals AS (
      SELECT bucket, SUM(chars) AS bucket_chars FROM base GROUP BY 1
    ), offsets AS (
      SELECT bucket,
             COALESCE(SUM(bucket_chars) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bucket_offset
      FROM totals
    ), assigned AS (
      SELECT b.doc_id, b.chars,
             o.bucket_offset + COALESCE(SUM(b.chars) OVER (
               PARTITION BY b.bucket ORDER BY b.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_off
      FROM base b JOIN offsets o USING (bucket)
    )
    SELECT CAST(start_off // {_SHARD_CHARS} AS BIGINT) AS shard_id,
           COUNT(*) AS n_docs,
           CAST(SUM(chars) AS BIGINT) AS shard_chars,
           MIN(doc_id) AS first_doc,
           MAX(doc_id) AS last_doc
    FROM assigned GROUP BY 1 ORDER BY 1
    """,
    description="training-shard manifest: exact byte-balanced shard "
    "cuts in stable doc_id order via the two-level distributed prefix "
    "sum (per-bucket partials -> tiny bucket-offset window -> parallel "
    "within-bucket windows) — no single-task corpus pass, pure BIGINT",
    covers=("X-split", "X-window"),
)
def shard_manifest_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_manifest(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# packing efficiency readout (r9)
# ---------------------------------------------------------------------------


def pack_efficiency(
    docs: DataFrame, budget: int = PACK_BUDGET
) -> DataFrame:
    """Fill-efficiency of the greedy packing per source: bins used,
    tokens packed, and fill rate in integer basis points against the
    bin budget — the readout that says how much context-window capacity
    the training run will actually waste. Derived from
    :func:`pack_sequences`' assignment (same bins, one extra two-level
    aggregate — bins then sources; both map-side-partial)."""
    packed = pack_sequences(docs, budget=budget)
    bins = packed.groupBy("source", "shard", "bin_id").agg(
        F.sum("n_tokens").alias("bin_tokens")
    )
    return (
        bins.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bins"),
            F.sum("bin_tokens").cast("bigint").alias("packed_tokens"),
            F.max("bin_tokens").cast("bigint").alias("max_bin_tokens"),
        )
        .select(
            "source",
            "n_bins",
            "packed_tokens",
            "max_bin_tokens",
            F.expr(f"(packed_tokens * 10000) div (n_bins * {budget})")
            .cast("bigint")
            .alias("fill_bp"),
        )
        .orderBy("source")
    )


def _pack_efficiency_oracle() -> str:
    inner = _pack_oracle().strip()
    return f"""
    WITH packed AS ({inner}),
    bins AS (
      SELECT source, shard, bin_id, SUM(n_tokens) AS bin_tokens
      FROM packed GROUP BY source, shard, bin_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM(bin_tokens) AS BIGINT) AS packed_tokens,
           CAST(MAX(bin_tokens) AS BIGINT) AS max_bin_tokens,
           CAST((SUM(bin_tokens) * 10000) // (COUNT(*) * {PACK_BUDGET})
             AS BIGINT) AS fill_bp
    FROM bins GROUP BY source ORDER BY source
    """


@register(
    "pack_efficiency",
    oracle=_pack_efficiency_oracle(),
    description="greedy-packing fill efficiency per source: bins used, "
    "tokens packed, max bin load, fill basis points vs the 1024-token "
    "budget — pack_sequences' bins re-aggregated twice (both levels "
    "map-side-partial), the capacity-waste readout of the packing job",
    covers=("N-curation", "B5"),
)
def pack_efficiency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_efficiency(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# shard skew audit (r14)
# ---------------------------------------------------------------------------


def _shard_assigned_sql() -> str:
    """The manifest's CTE prefix (base -> totals -> offsets ->
    assigned), shared by the shard_manifest oracle's shape and the skew
    audit so the policy exists in one place SQL-side too."""
    return f"""
    WITH base AS (
      SELECT doc_id, COALESCE(n_chars, 0) AS chars,
             {_floordiv_sql('doc_id', _SHARD_BUCKET_W)} AS bucket
      FROM documents WHERE doc_id IS NOT NULL
    ), totals AS (
      SELECT bucket, SUM(chars) AS bucket_chars FROM base GROUP BY 1
    ), offsets AS (
      SELECT bucket,
             COALESCE(SUM(bucket_chars) OVER (
               ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS bucket_offset
      FROM totals
    ), assigned AS (
      SELECT b.doc_id, b.chars,
             o.bucket_offset + COALESCE(SUM(b.chars) OVER (
               PARTITION BY b.bucket ORDER BY b.doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start_off
      FROM base b JOIN offsets o USING (bucket)
    ), shards AS (
      SELECT CAST(start_off // {_SHARD_CHARS} AS BIGINT) AS shard_id,
             COUNT(*) AS n_docs,
             CAST(SUM(chars) AS BIGINT) AS shard_chars
      FROM assigned GROUP BY 1
    )"""


def shard_skew_audit(docs: DataFrame) -> DataFrame:
    """One-row balance readout over :func:`shard_manifest`'s cuts: the
    number the shard writer checks before committing a layout — with
    byte-balanced cuts the imbalance should be bounded by one document
    (a doc straddling a boundary belongs to its START shard), so a
    large value means the cut policy or the doc-size distribution needs
    attention (pathological giant docs).

    ``imbalance_bp`` is integer ``10000 * (max - min) / max`` over
    FULL shards' char payloads; the LAST shard is excluded from min
    (it is legitimately short — the corpus tail), unless it is the
    only one. Derived from the manifest lineage (same two-level exact
    prefix sum), one extra tiny aggregate over |shards| rows.
    """
    m = shard_manifest(docs)
    last = m.agg(F.max("shard_id").alias("_last"))
    full = m.join(F.broadcast(last), F.col("shard_id") != F.col("_last"))
    # all-shards row stats come from m; min over full shards only
    stats = m.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shards"),
        F.coalesce(F.sum("shard_chars"), F.lit(0))
        .cast("bigint")
        .alias("total_chars"),
        F.coalesce(F.max("shard_chars"), F.lit(0))
        .cast("bigint")
        .alias("max_chars"),
    )
    fmin = full.agg(
        F.min("shard_chars").cast("bigint").alias("min_full_chars")
    )
    return stats.crossJoin(F.broadcast(fmin)).select(
        "n_shards",
        "total_chars",
        "max_chars",
        F.coalesce(F.col("min_full_chars"), F.col("max_chars"))
        .cast("bigint")
        .alias("min_full_chars"),
        F.expr(
            "coalesce((10000 * (max_chars - coalesce(min_full_chars, "
            "max_chars))) div nullif(max_chars, 0), 0)"
        )
        .cast("bigint")
        .alias("imbalance_bp"),
    )


@register(
    "shard_skew_audit",
    oracle=f"""{_shard_assigned_sql()}
    , stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
             CAST(COALESCE(SUM(shard_chars), 0) AS BIGINT) AS total_chars,
             CAST(COALESCE(MAX(shard_chars), 0) AS BIGINT) AS max_chars
      FROM shards
    ), fmin AS (
      SELECT CAST(MIN(shard_chars) AS BIGINT) AS min_full_chars
      FROM shards WHERE shard_id <> (SELECT MAX(shard_id) FROM shards)
    )
    SELECT n_shards, total_chars, max_chars,
           CAST(COALESCE(min_full_chars, max_chars) AS BIGINT)
             AS min_full_chars,
           CAST(COALESCE((10000 * (max_chars
                  - COALESCE(min_full_chars, max_chars)))
                // NULLIF(max_chars, 0), 0) AS BIGINT) AS imbalance_bp
    FROM stats CROSS JOIN fmin
    """,
    description="shard-balance readout over the byte-balanced manifest "
    "cuts: shard count, payload totals, and max-vs-min-full-shard "
    "imbalance in bp (last shard excluded from min — the corpus tail "
    "is legitimately short); one tiny aggregate over the manifest",
    covers=("X-split", "X-window"),
)
def shard_skew_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return shard_skew_audit(load_table(spark, sf_dir, "documents"))
