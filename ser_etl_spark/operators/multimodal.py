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

from ser_etl_spark.functions.numeric import fround
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


def _hexint_sql(col: str, start: int, width: int = 8) -> str:
    """DuckDB SQL for the big-endian integer of ``width`` hex chars of
    ``col`` starting at 1-based position ``start`` — the SQL twin of
    ``int.from_bytes(digest[a:b], 'big')`` over the hex rendering.
    Every term is an exact integer (< 2^32 at width 8), so the sum is
    exact."""
    return "(" + " + ".join(
        f"(strpos('0123456789abcdef', substr({col}, {start + j}, 1)) - 1)"
        f" * {16 ** (width - 1 - j)}"
        for j in range(width)
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
        f"(CAST(floor((CAST({_hexint_sql('dh', 8 * i + 1)} AS DOUBLE)"
        f" / 4294967296.0) * 1e6 + 0.5) AS DOUBLE) / 1e6) AS f{i}"
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
        # fround: k/2^32 is dyadic, so a 7th-place decimal half is
        # reachable whenever 2^25 | k (r10 round-half-tie audit).
        fround(F.element_at("features", 1), 6).alias("f0"),
        fround(F.element_at("features", 2), 6).alias("f1"),
    )


# ---------------------------------------------------------------------------
# perceptual-hash near-duplicate detection over media payloads
# ---------------------------------------------------------------------------

#: 16-bit hash bands; Hamming <= PHASH_MAX_HAMMING pairs are near-dups.
#: 4 bands + threshold 3 gives the pigeonhole guarantee below.
PHASH_BANDS = 4
PHASH_MAX_HAMMING = 3


#: size of the simulated shared media-asset pool (doc_id mod this):
#: 256 gives zero collisions at the 50-doc smoke SF, ~244 re-used-asset
#: pairs at sf0.01, and a dense re-use pattern at bench SF.
ASSET_POOL = 256


def with_asset_payload(
    docs: DataFrame, id_col: str = "doc_id", n_assets: int = ASSET_POOL
) -> DataFrame:
    """Attach a fake binary payload drawn from a SHARED asset pool: the
    sha256 stream is keyed on ``doc_id % n_assets``, so documents
    embedding the same asset carry byte-identical media — the re-crawl /
    re-embed shape real pipelines dedup against (the same stock image
    under thousands of page ids). Same 128-byte binary column contract
    as :func:`with_fake_payload`."""
    key = (F.col(id_col) % F.lit(n_assets)).cast("string")
    payload = F.unhex(
        F.concat(
            *[F.sha2(F.concat(key, F.lit(f":{i}")), 256) for i in range(4)]
        )
    )
    return docs.withColumn("payload", payload)


def extract_phash_bands(
    media_df: DataFrame, id_col: str = "doc_id", bands: int = PHASH_BANDS
) -> DataFrame:
    """Arrow-batched perceptual-hash extraction: decode each payload (the
    stubbed deterministic decoder — a real deployment swaps in DCT-based
    pHash over pixels) and emit the 64-bit hash as ``bands`` 16-bit
    integer columns ``b0..b{bands-1}``.

    Band columns, not one 64-bit value, on purpose: they are the LSH
    blocking keys downstream (:func:`phash_neardup_pairs`) AND they
    sidestep signed-int64 seams for the top bit. The payload is consumed
    here — only ``bands`` small ints per row flow into any shuffle.
    """

    # Self-contained closure (cloudpickle ships it by value); the inline
    # digest mirrors decode_media(..., fake=True).
    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import pandas as _pd

        for pdf in it:
            out: dict[str, list] = {f"b{i}": [] for i in range(bands)}
            for payload in pdf["payload"]:
                decoded = hashlib.sha256(
                    b"decoded:" + bytes(payload).hex().encode()
                ).digest()
                for i in range(bands):
                    out[f"b{i}"].append(
                        int.from_bytes(decoded[2 * i : 2 * i + 2], "big")
                    )
            yield _pd.DataFrame({id_col: pdf[id_col], **out})

    schema = ", ".join(
        [f"{id_col} long"] + [f"b{i} long" for i in range(bands)]
    )
    return media_df.select(id_col, "payload").mapInPandas(batches, schema)


def phash_neardup_pairs(
    bands_df: DataFrame,
    max_hamming: int = PHASH_MAX_HAMMING,
    id_col: str = "doc_id",
    bands: int = PHASH_BANDS,
) -> DataFrame:
    """Near-duplicate media pairs: Hamming distance over the 64-bit
    perceptual hash <= ``max_hamming``, found WITHOUT an all-pairs join.

    Pigeonhole blocking (the simhash_pairs discipline, dedup.py): a pair
    differing in <= 3 bits can touch at most 3 of the 4 bands, so at
    least one 16-bit band is IDENTICAL — candidates are generated by a
    band-value equi-join (one shuffle on (band_idx, band_val); block
    sizes are bounded by band-value collision counts, never corpus^2),
    then verified with the exact popcount over all bands. Dedup of
    multi-band matches happens on the small candidate set.
    """
    # ONE exploded frame self-joined through aliases (the
    # minhash_lsh_pairs shape): both join inputs are the identical
    # subplan, so at scale (sort-merge join) AQE's runtime exchange
    # reuse computes the scan + Arrow decode + explode ONCE and replays
    # the shuffle output for the other side (ReusedExchange verified in
    # the executed plan — the broadcast form at tiny SF recomputes, by
    # design).
    expl = bands_df.select(
        "*",
        F.posexplode(
            F.array(*[F.col(f"b{i}") for i in range(bands)])
        ).alias("band_idx", "band_val"),
    )
    a, b = expl.alias("a"), expl.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            *[F.col(f"a.b{i}").alias(f"a{i}") for i in range(bands)],
            *[F.col(f"b.b{i}").alias(f"c{i}") for i in range(bands)],
        )
        .distinct()
    )
    ham = None
    for i in range(bands):
        t = F.expr(f"bit_count(a{i} ^ c{i})")
        ham = t if ham is None else ham + t
    return (
        cand.select("id_a", "id_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
        .orderBy("id_a", "id_b")
    )


def _phash_oracle(
    max_hamming: int = PHASH_MAX_HAMMING, bands: int = PHASH_BANDS
) -> str:
    """DuckDB twin: the asset-pool payload replayed hex-domain (sha256
    chains over the asset id), the fake decode, 4-hex-char band
    extraction via exact strpos arithmetic, the same band-blocked
    candidate join, and xor+bit_count verification."""
    payload_hex = " || ".join(
        f"sha256(CAST(doc_id % {ASSET_POOL} AS VARCHAR) || ':{i}')"
        for i in range(4)
    )
    band_cols = ", ".join(
        f"{_hexint_sql('dh', 4 * i + 1, 4)} AS b{i}" for i in range(bands)
    )
    band_list = "[" + ", ".join(f"b{i}" for i in range(bands)) + "]"
    ham = " + ".join(f"bit_count(xor(a{i}, c{i}))" for i in range(bands))
    a_cols = ", ".join(f"a.b{i} AS a{i}" for i in range(bands))
    c_cols = ", ".join(f"b.b{i} AS c{i}" for i in range(bands))
    return f"""
    WITH p AS (
      SELECT doc_id, {payload_hex} AS payload_hex FROM documents
    ), d AS (
      SELECT doc_id, sha256('decoded:' || payload_hex) AS dh FROM p
    ), bands AS (
      SELECT doc_id, {band_cols} FROM d
    ), expl AS (
      SELECT doc_id, b0, b1, b2, b3, i.i AS band_idx,
             {band_list}[i.i] AS band_val
      FROM bands, (SELECT unnest([1, 2, 3, 4]) AS i) i
    ), cand AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, {a_cols}, {c_cols}
      FROM expl a JOIN expl b
        ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       AND a.doc_id < b.doc_id
    )
    SELECT id_a, id_b, CAST({ham} AS BIGINT) AS hamming
    FROM cand
    WHERE {ham} <= {max_hamming}
    ORDER BY id_a, id_b
    """


@register(
    "media_phash_neardup",
    oracle=_phash_oracle(),
    description="multimodal near-dup detection: 64-bit perceptual hash "
    "(stub decoder; DCT pHash in a real deployment) as 4x16-bit bands "
    "extracted in one Arrow pass, pigeonhole band-blocking (Hamming<=3 "
    "implies an identical band) -> band-value equi-join candidates -> "
    "exact popcount verify — no all-pairs join, payloads never shuffle; "
    "shared-asset-pool fake payloads (doc_id % 256) give documents "
    "genuinely re-used media to find, and the whole path (binary column "
    "-> Arrow batch -> bands -> blocked join) replays bit-exactly in SQL",
    covers=("N-multimodal", "N-dedup"),
)
def media_phash_neardup_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    bands = extract_phash_bands(with_asset_payload(docs))
    return phash_neardup_pairs(bands)


# ---------------------------------------------------------------------------
# decode-budget planner (r9)
# ---------------------------------------------------------------------------


def media_decode_budget(media_df: DataFrame, every_n: int = 30) -> DataFrame:
    """Per media type, what the feature-extraction pass will COST before
    running it: item count, total frames held, frames actually decoded
    under the every-Nth sampling policy (images/audio decode once;
    video decodes ``ceil(n_frames / N)`` sampled frames), and the pixel
    budget those decodes push through the decoder. The sizing readout
    that picks cluster width for the multimodal pass — pure integer
    column math over the metadata struct, one 3-group aggregate, the
    payload bytes never enter the plan."""
    m = F.col("media")
    decode_frames = F.when(
        m["media_type"] == "video",
        F.expr(f"(media.n_frames + {every_n - 1}) div {every_n}"),
    ).otherwise(F.lit(1)).cast("bigint")
    pixels = (
        decode_frames * m["width"].cast("bigint") * m["height"].cast("bigint")
    )
    return (
        media_df.select(
            m["media_type"].alias("media_type"),
            m["n_frames"].cast("bigint").alias("n_frames"),
            decode_frames.alias("decode_frames"),
            pixels.alias("pixels"),
        )
        .groupBy("media_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum("n_frames").cast("bigint").alias("total_frames"),
            F.sum("decode_frames").cast("bigint").alias("frames_to_decode"),
            F.sum("pixels").cast("bigint").alias("pixel_budget"),
        )
        .orderBy("media_type")
    )


@register(
    "media_decode_budget",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             64 + (doc_id % 8) * 32 AS width,
             64 + (doc_id % 5) * 32 AS height,
             1 + (doc_id % 16) * 30 AS n_frames
      FROM documents
    ), b AS (
      SELECT media_type, n_frames,
             CASE WHEN media_type = 'video'
                  THEN (n_frames + 29) // 30 ELSE 1 END AS decode_frames,
             width, height
      FROM m
    )
    SELECT media_type,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(n_frames) AS BIGINT) AS total_frames,
           CAST(SUM(decode_frames) AS BIGINT) AS frames_to_decode,
           CAST(SUM(decode_frames * width * height) AS BIGINT)
             AS pixel_budget
    FROM b GROUP BY media_type ORDER BY media_type
    """,
    description="multimodal decode-budget planner: per media type the "
    "items, frames, every-Nth decodes (video ceil(n/30), image/audio 1) "
    "and pixel volume the extraction pass will push through the decoder "
    "— integer metadata arithmetic only, payload bytes never in-plan",
    covers=("N-multimodal", "B5"),
)
def media_decode_budget_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return media_decode_budget(with_fake_payload(docs))


# ---------------------------------------------------------------------------
# media storage/size profile (r12)
# ---------------------------------------------------------------------------


def media_type_profile(media_df: DataFrame) -> DataFrame:
    """Per-modality storage and decode-cost profile: asset counts,
    exact payload bytes, pixel totals (width·height·frames — the
    decode-cost driver) and the byte share per media type in basis
    points — the capacity-planning readout a multimodal ingest logs
    before scheduling decode fleets.

    Pure column math over payload length + typed metadata (no decode,
    no Python); one scan into a |types|-row aggregate, shares via a
    window over that metadata-sized rollup. All integers exact BIGINTs.
    """
    from pyspark.sql import Window

    base = media_df.select(
        F.col("media.media_type").alias("media_type"),
        F.length("payload").cast("bigint").alias("_bytes"),
        (
            F.col("media.width").cast("bigint")
            * F.col("media.height").cast("bigint")
            * F.col("media.n_frames").cast("bigint")
        ).alias("_pixels"),
    )
    agg = base.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("_bytes").cast("bigint").alias("payload_bytes"),
        F.sum("_pixels").cast("bigint").alias("total_pixels"),
    )
    w = Window.partitionBy()
    return (
        agg.withColumn("_tot", F.sum("payload_bytes").over(w))
        .select(
            "media_type",
            "n_assets",
            "payload_bytes",
            "total_pixels",
            F.expr("(10000 * payload_bytes) div _tot")
            .cast("bigint")
            .alias("bytes_share_bp"),
        )
        .orderBy("media_type")
    )


@register(
    "media_type_profile",
    oracle="""
    WITH m AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'image'
                  WHEN doc_id % 3 = 1 THEN 'audio'
                  ELSE 'video' END AS media_type,
             128 AS _bytes,
             CAST(64 + (doc_id % 8) * 32 AS BIGINT)
               * CAST(64 + (doc_id % 5) * 32 AS BIGINT)
               * CAST(1 + (doc_id % 16) * 30 AS BIGINT) AS _pixels
      FROM documents
    ), agg AS (
      SELECT media_type,
             CAST(COUNT(*) AS BIGINT) AS n_assets,
             CAST(SUM(_bytes) AS BIGINT) AS payload_bytes,
             CAST(SUM(_pixels) AS BIGINT) AS total_pixels
      FROM m GROUP BY media_type
    )
    SELECT media_type, n_assets, payload_bytes, total_pixels,
           CAST((10000 * payload_bytes)
                // SUM(payload_bytes) OVER () AS BIGINT) AS bytes_share_bp
    FROM agg ORDER BY media_type
    """,
    description="multimodal capacity profile: per media type the asset "
    "count, exact payload bytes, pixel totals (decode-cost driver) and "
    "byte share bp — pure column math over payload length + typed "
    "metadata, one scan, |types|-row aggregate (the fake payload is "
    "fixed-width, so the oracle replays sizes from id arithmetic)",
    covers=("N-multimodal",),
)
def media_type_profile_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return media_type_profile(with_fake_payload(docs))


# ---------------------------------------------------------------------------
# per-frame feature extraction (r12)
# ---------------------------------------------------------------------------


def frame_features(
    media_df: DataFrame, every_n: int = 30, id_col: str = "doc_id"
) -> DataFrame:
    """Frame-level feature extraction: the sampling plan of
    :func:`sample_frames` joined back to its payload and pushed through
    the SAME Arrow ``mapInPandas`` path as :func:`extract_features`,
    one feature row per (video, sampled frame) — the composite-key
    batch shape a real video pipeline ships (frames of one asset may
    split across Arrow batches; the stub decode is keyed on payload
    hex + frame index, so batch boundaries cannot change results).

    Scale: the frame explosion happens BEFORE the Python boundary, so
    Arrow batches carry (id, frame_idx, payload) rows and each frame
    decodes independently — embarrassingly parallel at any frame
    count; payload bytes are consumed inside the stage and never
    shuffle.
    """
    frames = F.sequence(
        F.lit(0), F.col("media.n_frames") - 1, F.lit(every_n)
    )
    planned = (
        media_df.filter(F.col("media.media_type") == "video")
        .select(id_col, "payload", F.explode(frames).alias("frame_idx"))
    )

    # self-contained closure (cloudpickle ships it by value)
    def batches(it):
        import hashlib

        import pandas as _pd

        for pdf in it:
            f0, f1 = [], []
            for payload, fi in zip(pdf["payload"], pdf["frame_idx"]):
                dh = hashlib.sha256(
                    b"frame:"
                    + bytes(payload).hex().encode()
                    + b":"
                    + str(int(fi)).encode()
                ).digest()
                f0.append(int.from_bytes(dh[0:4], "big") / float(2**32))
                f1.append(int.from_bytes(dh[4:8], "big") / float(2**32))
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "frame_idx": pdf["frame_idx"],
                    "f0_raw": f0,
                    "f1_raw": f1,
                }
            )

    out_schema = (
        f"{id_col} long, frame_idx int, f0_raw double, f1_raw double"
    )
    return planned.mapInPandas(batches, out_schema)


@register(
    "media_frame_features",
    oracle=f"""
    WITH vids AS (
      SELECT doc_id,
             1 + (doc_id % 16) * 30 AS n_frames,
             {" || ".join(
                 f"sha256(CAST(doc_id AS VARCHAR) || ':{i}')"
                 for i in range(4)
             )} AS payload_hex
      FROM documents WHERE doc_id % 3 = 2
    ), frames AS (
      SELECT doc_id,
             CAST(unnest(range(0, n_frames, 30)) AS INTEGER) AS frame_idx,
             payload_hex
      FROM vids
    ), d AS (
      SELECT doc_id, frame_idx,
             sha256('frame:' || payload_hex || ':'
                    || CAST(frame_idx AS VARCHAR)) AS dh
      FROM frames
    )
    SELECT doc_id, frame_idx,
           (CAST(floor((CAST({_hexint_sql('dh', 1)} AS DOUBLE)
             / 4294967296.0) * 1e6 + 0.5) AS DOUBLE) / 1e6) AS f0,
           (CAST(floor((CAST({_hexint_sql('dh', 9)} AS DOUBLE)
             / 4294967296.0) * 1e6 + 0.5) AS DOUBLE) / 1e6) AS f1
    FROM d
    """,
    description="frame-level multimodal features: sampling plan x payload "
    "through the Arrow mapInPandas path, one row per (video, frame) — "
    "frame-keyed stub decode (payload hex + frame index) makes batch "
    "boundaries irrelevant and replays bit-exactly in SQL; explosion "
    "before the Python boundary, payload never shuffles",
    covers=("N-multimodal",),
)
def media_frame_features_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    feats = frame_features(with_fake_payload(docs))
    return feats.select(
        "doc_id",
        "frame_idx",
        fround(F.col("f0_raw"), 6).alias("f0"),
        fround(F.col("f1_raw"), 6).alias("f1"),
    )


# ---------------------------------------------------------------------------
# chunk/segment planner (r13) — audio/video training windows
# ---------------------------------------------------------------------------

#: default segmentation: 64-frame chunks, 16-frame overlap (stride 48)
CHUNK_FRAMES = 64
CHUNK_OVERLAP = 16


def media_chunk_plan(
    media_df: DataFrame,
    chunk: int = CHUNK_FRAMES,
    overlap: int = CHUNK_OVERLAP,
    id_col: str = "doc_id",
) -> DataFrame:
    """Fixed-window chunk plan for time-based media (audio/video): one
    row per (asset, chunk) with frame bounds — the segmentation every
    A/V training pipeline runs before decode (Whisper-style 30 s audio
    windows, video-clip sampling): chunks of ``chunk`` frames advancing
    by ``chunk - overlap``, last chunk truncated at the asset's end.

    Pure integer column math over the metadata struct — the chunk
    count is closed-form (1 + ceil((n_frames - chunk)/stride) when the
    asset exceeds one window), the plan rows come from an array-local
    ``sequence`` + ``explode`` (no shuffle, no Python), and the payload
    column is NOT carried: the plan is metadata-sized, the decode fleet
    joins payloads back per-partition at execution time.
    """
    stride = chunk - overlap
    nf = F.col("media.n_frames").cast("bigint")
    n_chunks = F.expr(
        f"CASE WHEN CAST(media.n_frames AS BIGINT) <= {chunk} THEN 1L "
        f"ELSE 1L + ((CAST(media.n_frames AS BIGINT) - {chunk} "
        f"+ {stride - 1}) div {stride}) END"
    )
    planned = media_df.filter(
        F.col("media.media_type").isin("audio", "video")
    ).select(
        id_col,
        F.col("media.media_type").alias("media_type"),
        nf.alias("_nf"),
        F.explode(
            F.sequence(F.lit(0).cast("bigint"), n_chunks - 1)
        ).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * stride
    end = F.least(start + chunk, F.col("_nf"))
    return planned.select(
        id_col,
        "media_type",
        "chunk_idx",
        start.cast("bigint").alias("start_frame"),
        end.cast("bigint").alias("end_frame"),
        (end - start).cast("bigint").alias("chunk_frames"),
    )


def media_chunk_rollup(
    media_df: DataFrame,
    chunk: int = CHUNK_FRAMES,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """Per-modality rollup of :func:`media_chunk_plan`: asset count,
    total chunks, decoded-frame total vs source-frame total, and the
    overlap re-decode overhead in basis points — the number that says
    what the chosen (chunk, overlap) costs in duplicated decode work.

    ``source_frames`` sums each asset's frame count ONCE (the plan
    carries it per chunk row, so the rollup takes it from each asset's
    chunk 0 — no second scan, no join back).
    """
    plan = media_chunk_plan(media_df, chunk, overlap)
    # chunk 0 alone may undercount the asset (truncated window) — carry
    # the asset total instead: end of the LAST chunk == n_frames, so
    # max(end_frame) per asset is exact; two-level agg keeps it one pass
    per_asset = plan.groupBy("doc_id", "media_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_chunks"),
        F.sum("chunk_frames").cast("bigint").alias("decoded_frames"),
        F.max("end_frame").cast("bigint").alias("src_frames"),
    )
    agg = per_asset.groupBy("media_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_assets"),
        F.sum("n_chunks").cast("bigint").alias("total_chunks"),
        F.sum("decoded_frames").cast("bigint").alias("decoded_frames"),
        F.sum("src_frames").cast("bigint").alias("source_frames"),
    )
    return agg.select(
        "media_type",
        "n_assets",
        "total_chunks",
        "decoded_frames",
        "source_frames",
        F.expr(
            "(10000 * (decoded_frames - source_frames)) div decoded_frames"
        )
        .cast("bigint")
        .alias("overlap_overhead_bp"),
    ).orderBy("media_type")


def _chunk_rollup_oracle() -> str:
    """DuckDB twin of :func:`media_chunk_rollup` (shared with the
    streaming gate — the replay sums per-batch totals of this same
    per-asset pure function)."""
    return f"""
    WITH m AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END
               AS media_type,
             CAST(1 + (doc_id % 16) * 30 AS BIGINT) AS nf
      FROM documents WHERE doc_id % 3 <> 0
    ), counted AS (
      SELECT doc_id, media_type, nf,
             CASE WHEN nf <= {CHUNK_FRAMES} THEN 1
                  ELSE 1 + (nf - {CHUNK_FRAMES}
                            + {CHUNK_FRAMES - CHUNK_OVERLAP} - 1)
                           // {CHUNK_FRAMES - CHUNK_OVERLAP}
             END AS n_chunks
      FROM m
    ), plan AS (
      SELECT doc_id, media_type, nf,
             unnest(generate_series(0, n_chunks - 1)) AS chunk_idx
      FROM counted
    ), b AS (
      SELECT doc_id, media_type, chunk_idx,
             chunk_idx * {CHUNK_FRAMES - CHUNK_OVERLAP} AS start_frame,
             LEAST(chunk_idx * {CHUNK_FRAMES - CHUNK_OVERLAP}
                   + {CHUNK_FRAMES}, nf) AS end_frame
      FROM plan
    ), pa AS (
      SELECT doc_id, media_type,
             COUNT(*) AS n_chunks,
             SUM(end_frame - start_frame) AS decoded_frames,
             MAX(end_frame) AS src_frames
      FROM b GROUP BY 1, 2
    ), agg AS (
      SELECT media_type,
             CAST(COUNT(*) AS BIGINT) AS n_assets,
             CAST(SUM(n_chunks) AS BIGINT) AS total_chunks,
             CAST(SUM(decoded_frames) AS BIGINT) AS decoded_frames,
             CAST(SUM(src_frames) AS BIGINT) AS source_frames
      FROM pa GROUP BY 1
    )
    SELECT media_type, n_assets, total_chunks, decoded_frames,
           source_frames,
           CAST((10000 * (decoded_frames - source_frames))
                // decoded_frames AS BIGINT) AS overlap_overhead_bp
    FROM agg ORDER BY media_type
    """


@register(
    "media_chunk_plan",
    oracle=_chunk_rollup_oracle(),
    description="A/V chunk/segment planner rollup: 64-frame windows at "
    "stride 48 over every audio/video asset (closed-form chunk count, "
    "array-local sequence+explode, payload never carried), per-modality "
    "asset/chunk/frame totals and the overlap re-decode overhead bp — "
    "the pre-decode segmentation readout",
    covers=("N-multimodal",),
)
def media_chunk_plan_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return media_chunk_rollup(with_fake_payload(docs))


# ---------------------------------------------------------------------------
# aspect-ratio bucketing (r13) — image batch assembly profile
# ---------------------------------------------------------------------------

#: the training buckets in reduced-ratio form (name, bw, bh) — batches
#: mix only same-bucket images, so bucket balance IS batch efficiency
ASPECT_BUCKETS: tuple[tuple[str, int, int], ...] = (
    ("1:1", 1, 1),
    ("4:3", 4, 3),
    ("3:4", 3, 4),
    ("16:9", 16, 9),
    ("9:16", 9, 16),
)

#: LCM of the bucket denominators — scales |w/h - bw/bh| comparisons
#: into a common integer domain (exact argmin, no floats anywhere)
_BUCKET_LCM = 144


def media_aspect_buckets(media_df: DataFrame) -> DataFrame:
    """Aspect-ratio bucket assignment profile for image batching — the
    SDXL-style bucketing readout: every image maps to the nearest
    aspect bucket (batches mix only same-bucket images), and per bucket
    the profile reports image count, population share, and the mean
    crop waste in basis points (pixels lost when center-cropping the
    image to the bucket's aspect — the quality cost of the assignment).

    Everything stays in exact integers: the nearest-bucket argmin
    compares ``|w*bh - bw*h| * (LCM/bh)`` (a common denominator, so the
    comparison IS the rational ``|w/h - bw/bh|`` ordering; ties take
    the first bucket in declaration order on both engines), and per-
    image crop waste is ``10000 - (10000*min(w*bh, bw*h)) div
    max(w*bh, bw*h)``. One scan, stateless row math, |buckets|-row
    aggregate, share via a window over that metadata-sized rollup.
    """
    from pyspark.sql import Window

    w_ = F.col("media.width").cast("bigint")
    h_ = F.col("media.height").cast("bigint")
    diffs = [
        F.abs(w_ * bh - bw * h_) * (_BUCKET_LCM // bh)
        for _, bw, bh in ASPECT_BUCKETS
    ]
    best = F.least(*diffs)
    bucket = F.lit(None).cast("string")
    waste = F.lit(None).cast("bigint")
    for (name, bw, bh), d in reversed(list(zip(ASPECT_BUCKETS, diffs))):
        per_img = F.expr(
            f"10000 - (10000 * least(CAST(media.width AS BIGINT) * {bh}, "
            f"{bw} * CAST(media.height AS BIGINT))) "
            f"div greatest(CAST(media.width AS BIGINT) * {bh}, "
            f"{bw} * CAST(media.height AS BIGINT))"
        )
        bucket = F.when(d == best, F.lit(name)).otherwise(bucket)
        waste = F.when(d == best, per_img).otherwise(waste)
    base = media_df.filter(F.col("media.media_type") == "image").select(
        bucket.alias("bucket"), waste.cast("bigint").alias("_waste")
    )
    agg = base.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_images"),
        F.sum("_waste").cast("bigint").alias("_waste_sum"),
    )
    w = Window.partitionBy()
    return (
        agg.withColumn("_tot", F.sum("n_images").over(w))
        .select(
            "bucket",
            "n_images",
            F.expr("(10000 * n_images) div _tot")
            .cast("bigint")
            .alias("share_bp"),
            F.expr("_waste_sum div n_images")
            .cast("bigint")
            .alias("mean_crop_waste_bp"),
        )
        .orderBy("bucket")
    )


def _aspect_oracle() -> str:
    """DuckDB twin: the same integer argmin/waste math, CASE-chained in
    declaration order (tie policy identical by construction)."""
    w, h = "CAST(64 + (doc_id % 8) * 32 AS BIGINT)", (
        "CAST(64 + (doc_id % 5) * 32 AS BIGINT)"
    )
    diffs = [
        f"(abs({w} * {bh} - {bw} * {h}) * {_BUCKET_LCM // bh})"
        for _, bw, bh in ASPECT_BUCKETS
    ]
    best = "LEAST(" + ", ".join(diffs) + ")"
    b_arms = " ".join(
        f"WHEN {d} = {best} THEN '{name}'"
        for (name, _, _), d in zip(ASPECT_BUCKETS, diffs)
    )
    w_arms = " ".join(
        f"WHEN {d} = {best} THEN 10000 - (10000 * "
        f"LEAST({w} * {bh}, {bw} * {h})) "
        f"// GREATEST({w} * {bh}, {bw} * {h})"
        for (_, bw, bh), d in zip(ASPECT_BUCKETS, diffs)
    )
    return f"""
    WITH imgs AS (
      SELECT CASE {b_arms} END AS bucket,
             CASE {w_arms} END AS waste
      FROM documents WHERE doc_id % 3 = 0
    ), agg AS (
      SELECT bucket,
             CAST(COUNT(*) AS BIGINT) AS n_images,
             CAST(SUM(waste) AS BIGINT) AS waste_sum
      FROM imgs GROUP BY 1
    )
    SELECT bucket, n_images,
           CAST((10000 * n_images) // SUM(n_images) OVER () AS BIGINT)
             AS share_bp,
           CAST(waste_sum // n_images AS BIGINT) AS mean_crop_waste_bp
    FROM agg ORDER BY bucket
    """


@register(
    "media_aspect_buckets",
    oracle=_aspect_oracle(),
    description="image aspect-ratio bucketing profile (SDXL-style batch "
    "assembly): nearest-bucket argmin in exact integers (|w*bh - bw*h| "
    "over the bucket-denominator LCM, first-bucket tie policy), per "
    "bucket the image count, population share bp and mean center-crop "
    "waste bp — one scan, stateless row math, |buckets|-row rollup",
    covers=("N-multimodal", "N-quality"),
)
def media_aspect_buckets_query(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return media_aspect_buckets(with_fake_payload(docs))
