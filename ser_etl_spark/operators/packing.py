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
