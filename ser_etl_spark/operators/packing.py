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
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

#: Default packing window (tokens per bin).
PACK_BUDGET = 1024

#: Shards per source — bounds the size of any single packing group.
PACK_SHARDS = 16

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


@register(
    "pack_sequences",
    oracle=None,  # running-total-with-reset is not window-expressible;
    # tests check the greedy invariants + equality with greedy_pack
    description="greedy sequence packing into 1024-token bins per "
    "(source, shard) group via applyInPandas — bounded groups, "
    "deterministic bins, map-side JVM token counting",
    covers=("N-text",),
)
def pack_sequences_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_sequences(load_table(spark, sf_dir, "documents"))
