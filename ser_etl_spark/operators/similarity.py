"""Embedding similarity search: brute-force cosine top-k, random
hyperplane LSH ANN, and blocked embedding near-duplicate detection.

Over an ``embeddings(vec_id, embedding array<float>, label)`` table
(BASELINE.json north star). Vector math uses Spark higher-order array
functions (``zip_with`` + ``aggregate``) in double precision — JVM-side,
no Python. Scale design:

- **brute-force top-k**: one scan, per-partition top-k heaps via
  ORDER BY + LIMIT (TakeOrderedAndProject) — the exact baseline; linear
  in corpus size, embarrassingly parallel.
- **LSH ANN**: sign-random-projection bucketing; queries probe only
  their bucket. Hyperplanes are derived deterministically from
  xxhash64, so executors regenerate them independently — no broadcast
  of plane matrices needed.
- **near-dup**: pairs within a blocking key (here the coarse ``label``,
  standing in for an IVF cluster id) — the IVF-style answer to
  quadratic pair growth: clusters bound the candidate set.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def _as_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity of two double arrays (sequential accumulation —
    same operation order as the DuckDB oracle for bit parity)."""
    return _dot(a, b) / (_norm(a) * _norm(b))


def _prepped(vectors: DataFrame, vec_col: str, id_col: str) -> DataFrame:
    """Project the double-cast vector and its norm ONCE per row — column
    references keep HOF lambdas from splicing (and re-evaluating) the
    cast/norm subtrees at every use."""
    return vectors.select(
        "*", _as_double(F.col(vec_col)).alias("_v")
    ).withColumn("_nv", _norm(F.col("_v")))


def cosine_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k nearest by cosine to a literal query vector."""
    q = _as_double(F.array(*[F.lit(float(v)) for v in query_vec]))
    p = _prepped(vectors, vec_col, id_col)
    sim = _dot(F.col("_v"), q) / (F.col("_nv") * _norm(q))
    return (
        p.select(
            F.col(id_col),
            F.round(sim, 4).alias("cos_sim"),
        )
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


# ---------------------------------------------------------------------------
# sign-random-projection LSH
# ---------------------------------------------------------------------------


def _srp_bucket(vec: Column, dim: int, planes: int = 16) -> Column:
    """Sign-random-projection bucket id (int) for a double-array vector.

    Plane p's component i is a deterministic pseudo-random value in
    [-1, 1) derived from xxhash64(p, i) — regenerated identically
    anywhere, so the "model" ships as code, not data.
    """
    bucket = F.lit(0).cast("long")
    for p in range(planes):
        comps = F.array(
            *[
                (
                    F.xxhash64(F.lit(f"plane:{p}:{i}")).cast("double")
                    / F.lit(float(2**63))
                )
                for i in range(dim)
            ]
        )
        proj = F.aggregate(
            F.zip_with(vec, comps, lambda x, c: x * c),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        bit = F.when(proj >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        bucket = bucket.bitwiseXOR(F.shiftleft(bit, p))
    return bucket


def lsh_ann_topk(
    vectors: DataFrame,
    query_vec: list[float],
    k: int = 10,
    planes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's SRP bucket.

    With ``planes`` bits the corpus shards into 2^planes buckets; the
    scan cost drops by that factor at some recall cost (multi-probe =
    union of neighboring buckets would raise recall; kept single-probe
    for clarity). The bucketed table would be precomputed/persisted in
    a real deployment.
    """
    dim = len(query_vec)
    dvec = _as_double(F.col(vec_col))
    bucketed = vectors.withColumn("_bucket", _srp_bucket(dvec, dim, planes))
    qcol = _as_double(F.array(*[F.lit(float(v)) for v in query_vec]))
    qbucket = (
        vectors.sparkSession.range(1)
        .select(_srp_bucket(qcol, dim, planes).alias("b"))
        .first()["b"]
    )
    sim = cosine(dvec, qcol)
    return (
        bucketed.filter(F.col("_bucket") == F.lit(qbucket))
        .select(F.col(id_col), F.round(sim, 4).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col).asc())
        .limit(k)
    )


def embedding_neardup_pairs(
    vectors: DataFrame,
    threshold: float = 0.35,
    block_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs within coarse blocks.

    Blocks (IVF-cluster stand-in: the fixture's ``label``) bound the
    pair space; within a block, pairs are scored exactly. At 100 TB the
    block id comes from a k-means coarse quantizer and the same plan
    applies unchanged.
    """
    p = _prepped(vectors, vec_col, id_col)
    lhs = p.select(
        F.col(block_col).alias("blk"),
        F.col(id_col).alias("id_a"),
        F.col("_v").alias("va"),
        F.col("_nv").alias("na"),
    )
    rhs = p.select(
        F.col(block_col).alias("blk_b"),
        F.col(id_col).alias("id_b"),
        F.col("_v").alias("vb"),
        F.col("_nv").alias("nb"),
    )
    # per pair only the dot remains; norms were computed once per row
    sim = _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        lhs.join(
            rhs,
            (F.col("blk") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")),
        )
        .select(
            "id_a",
            "id_b",
            F.col("blk").alias("label"),
            F.round(sim, 4).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


# ---------------------------------------------------------------------------
# registry entries
# ---------------------------------------------------------------------------


def _query_vector(spark: SparkSession, sf_dir: str) -> list[float]:
    """The corpus vector with vec_id=0 serves as the test query point."""
    row = (
        load_table(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
        .first()
    )
    return list(row["embedding"])


@register(
    "ann_cosine_topk",
    oracle="""
    SELECT a.vec_id,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                 (SELECT CAST(embedding AS DOUBLE[]) FROM embeddings WHERE vec_id = 0)), 4)
             AS cos_sim
    FROM embeddings a
    ORDER BY cos_sim DESC, a.vec_id ASC
    LIMIT 10
    """,
    description="exact brute-force cosine top-10 to the vec_id=0 query "
    "point (TakeOrderedAndProject: per-partition heaps, no global sort)",
    covers=("N-sim",),
)
def ann_topk_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    vec = _query_vector(spark, sf_dir)
    return cosine_topk(load_table(spark, sf_dir, "embeddings"), vec, k=10)


@register(
    "embedding_neardup",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.label AS label,
           round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                        CAST(b.embedding AS DOUBLE[])), 4) AS cos_sim
    FROM embeddings a
    JOIN embeddings b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                       CAST(b.embedding AS DOUBLE[])), 4) >= 0.35
    """,
    description="embedding-cosine near-dup pairs within label blocks "
    "(IVF-style candidate bounding)",
    covers=("N-sim", "N-dedup"),
)
def embedding_neardup_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return embedding_neardup_pairs(load_table(spark, sf_dir, "embeddings"), 0.35)


@register(
    "lsh_ann_topk",
    oracle=None,  # approximate; tests measure recall vs the exact top-k
    description="sign-random-projection LSH ANN: single-probe bucketed "
    "top-10 (scale path for similarity search)",
    covers=("N-sim",),
)
def lsh_ann_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    vec = _query_vector(spark, sf_dir)
    return lsh_ann_topk(load_table(spark, sf_dir, "embeddings"), vec, k=10)
