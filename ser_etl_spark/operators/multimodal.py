"""Multimodal column plumbing: binary payloads + typed metadata.

Image/audio/video handling for training-data pipelines: media travels as
an opaque ``binary`` column plus a typed metadata struct; decode /
feature-extraction / frame-sampling run as Arrow-batched ``mapInPandas``
transforms so Python touches columnar batches, never rows.

The decode step itself is STUBBED: media codec libraries are not in this
environment, so ``decode_media`` raises ``NotImplementedError`` unless
the deterministic fake decoder is requested. Everything around the stub —
schema contracts, batch shapes, partitioning, the UDF signatures — is
real and tested; swapping in Pillow/ffmpeg is a one-function change.

Scale notes: payload columns dominate bytes, so transforms keep them
out of shuffles (features are computed map-side and payloads dropped as
early as possible); Arrow batch size is bounded by the session's
``spark.sql.execution.arrow.maxRecordsPerBatch``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
)

from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

#: metadata struct carried alongside every payload
MEDIA_META_FIELDS = (
    ("media_type", "string"),
    ("width", "int"),
    ("height", "int"),
    ("n_frames", "int"),
)

FEATURE_DIM = 8


def with_fake_payload(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Attach a deterministic fake binary payload + media metadata.

    Stands in for reading real media bytes from object storage: payload
    = sha256 stream keyed by the row id (stable across runs/executors),
    metadata derived from the id. Gives tests a real binary column with
    realistic per-row sizes.
    """
    idc = F.col(id_col)
    payload = F.unhex(
        F.concat(
            *[F.sha2(F.concat(idc.cast("string"), F.lit(f":{i}")), 256) for i in range(4)]
        )
    )  # 128 bytes per row
    meta = F.struct(
        F.when(idc % 3 == 0, "image")
        .when(idc % 3 == 1, "audio")
        .otherwise("video")
        .alias("media_type"),
        (F.lit(64) + (idc % 8) * 32).cast("int").alias("width"),
        (F.lit(64) + (idc % 5) * 32).cast("int").alias("height"),
        (F.lit(1) + (idc % 16) * 30).cast("int").alias("n_frames"),
    )
    return docs.withColumn("payload", payload).withColumn("media", meta)


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> bytes:
    """Decode a media payload to raw samples/pixels.

    Real decoding needs codec libraries absent from this environment;
    ``fake=True`` returns a deterministic digest-stream standing in for
    decoded bytes so downstream plumbing can be exercised. The fake
    digest is keyed on the payload's lowercase HEX rendering (not the
    raw bytes): string-domain input keeps the stub expressible in any
    SQL engine whose sha256 takes VARCHAR only (the differential oracle
    replays it bit-exactly), while the Spark-side input stays a genuine
    ``binary`` column end to end.
    """
    if not fake:
        raise NotImplementedError(
            "media decoding requires codec libraries (Pillow/ffmpeg); "
            "pass fake=True for the deterministic test decoder"
        )
    return hashlib.sha256(b"decoded:" + payload.hex().encode()).digest()


def feature_schema(id_col: str = "doc_id") -> StructType:
    return StructType(
        [
            StructField(id_col, LongType()),
            StructField("features", ArrayType(DoubleType())),
        ]
    )


def extract_features(
    media_df: DataFrame, id_col: str = "doc_id", dim: int = FEATURE_DIM
) -> DataFrame:
    """Arrow-batched feature extraction over payload bytes.

    ``mapInPandas``: each Arrow batch arrives as a pandas DataFrame; the
    (stubbed) decoder runs per payload and a ``dim``-float feature vector
    is emitted. The payload column is consumed here and *not* returned —
    features, not media bytes, flow into any downstream shuffle.
    """

    # NOTE: this closure must stay self-contained (stdlib/pandas only, no
    # references to package globals) — cloudpickle ships it by value, so
    # executors never need ser_etl_spark importable on their PYTHONPATH.
    # The inline digest mirrors decode_media(..., fake=True).
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in it:
            feats = []
            for payload in pdf["payload"]:
                decoded = hashlib.sha256(
                    b"decoded:" + bytes(payload).hex().encode()
                ).digest()
                feats.append(
                    [
                        int.from_bytes(decoded[4 * i : 4 * i + 4], "big")
                        / float(2**32)
                        for i in range(dim)
                    ]
                )
            yield _pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return media_df.select(id_col, "payload", "media").mapInPandas(
        batches, feature_schema(id_col)
    )


def sample_frames(
    media_df: DataFrame, every_n: int = 30, id_col: str = "doc_id"
) -> DataFrame:
    """Frame sampling plan for video rows: one output row per sampled
    frame index (0, n, 2n, ...) — pure column math, the decode of each
    sampled frame would attach via ``extract_features`` downstream."""
    frames = F.sequence(
        F.lit(0), F.col("media.n_frames") - 1, F.lit(every_n)
    )
    return (
        media_df.filter(F.col("media.media_type") == "video")
        .select(id_col, F.explode(frames).alias("frame_idx"))
    )


@register(
    "frame_sample",
    oracle="""
    WITH vids AS (
      SELECT doc_id, 1 + (doc_id % 16) * 30 AS n_frames
      FROM documents
      WHERE doc_id % 3 = 2
    )
    SELECT doc_id, CAST(unnest(range(0, n_frames, 30)) AS INTEGER) AS frame_idx
    FROM vids
    """,
    description="multimodal plumbing: every-Nth-frame sampling plan for "
    "video rows (one output row per sampled frame, pure column math — "
    "sequence + explode; decode attaches downstream via mapInPandas). "
    "Metadata is deterministic id arithmetic, so the oracle reproduces "
    "the exact sampling plan",
    covers=("N-multimodal",),
)
def frame_sample_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return sample_frames(with_fake_payload(docs), every_n=30)


def _hexint_sql(col: str, start: int) -> str:
    """DuckDB SQL for the big-endian integer of 8 hex chars of ``col``
    starting at 1-based position ``start`` — the SQL twin of
    ``int.from_bytes(digest[4i:4i+4], 'big')`` over the hex rendering.
    Every term is an exact integer < 2^32, so the sum is exact."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {start + j}, 1)) - 1)"
        f" * {16 ** (7 - j)}"
        for j in range(8)
    ) + ")"


def _multimodal_oracle(dims: int = 2) -> str:
    """DuckDB twin of ``multimodal_features_query``: the fake payload is
    replayed hex-domain (4 chained sha256 hex digests — exactly what
    ``with_fake_payload``'s bytes render to via ``.hex()``), the fake
    decode is ``sha256('decoded:' || payload_hex)``, and each feature is
    8 hex chars converted to an exact integer / 2^32."""
    payload_hex = " || ".join(
        f"sha256(CAST(doc_id AS VARCHAR) || ':{i}')" for i in range(4)
    )
    feats = ", ".join(
        f"round(CAST({_hexint_sql('dh', 8 * i + 1)} AS DOUBLE)"
        f" / 4294967296.0, 6) AS f{i}"
        for i in range(dims)
    )
    return f"""
    WITH p AS (
      SELECT doc_id, {payload_hex} AS payload_hex FROM documents
    ), d AS (
      SELECT doc_id, sha256('decoded:' || payload_hex) AS dh FROM p
    )
    SELECT doc_id, {feats} FROM d
    """


@register(
    "multimodal_features",
    oracle=_multimodal_oracle(),
    description="binary media payload -> Arrow-batched (stub) feature "
    "extraction via mapInPandas; deterministic fake decoder keyed on the "
    "payload's hex rendering, so the whole Arrow path (binary column -> "
    "pandas batch -> sha256 stream -> float features) replays bit-exactly "
    "in the SQL oracle (oracle-backed since r6)",
    covers=("N-multimodal",),
)
def multimodal_features_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = extract_features(with_fake_payload(docs))
    return feats.select(
        "doc_id",
        F.round(F.element_at("features", 1), 6).alias("f0"),
        F.round(F.element_at("features", 2), 6).alias("f1"),
    )
