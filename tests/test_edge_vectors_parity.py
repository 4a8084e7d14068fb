"""Differential parity for the similarity family on seam vectors.

The embeddings fixture is benign — full-length, finite, nonzero
float32 vectors — so the LSH NULL->bit-0 / NaN->bit-1 semantics, the
zero-norm nullif guard, and the short-array/NULL-element propagation in
the generated ANN oracles were hand-reasoned rather than fixture-proven
(round-5 verdict gap). This suite runs the ANN registry queries over a
corpus built to hit exactly those seams and compares Spark vs DuckDB
bit-for-bit, write-time index layout included (the registry probes
build and read the partitioned layout for this corpus too).

Corpus contract: vec_id 0 is the query point and vec_ids 0..7 are the
IVF coarse centroids, so those eight stay well-formed; every seam
vector sits at vec_id >= 8. quantize/project run on a reduced corpus:
their representations diverge BY DESIGN on rows the cosine family
tolerates (posexplode emits one row per *present* element, so a short
array changes the row count; Spark's non-ANSI CAST(NaN AS INT) yields 0
where DuckDB errors) — the reduced set still covers the zero-vector,
negative-zero, denormal and exact-duplicate seams.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from ser_etl_spark.registry import all_queries
from tests.oracle import compare

DIM = 64


def _well_formed(vid: int) -> list[float]:
    # arbitrary deterministic nonzero pattern; float32 storage is what
    # both engines read, so no value needs to be "nice"
    return [((vid * 31 + i * 7) % 13 - 6) / 7.0 + 0.01 for i in range(DIM)]


def _edge_vectors():
    rows: list[tuple[int, list, int]] = []
    for vid in range(8):  # query point + IVF centroids: well-formed
        rows.append((vid, _well_formed(vid), vid % 4))
    rows.append((8, [0.0] * DIM, 0))  # zero vector: cosine undefined
    nanv = _well_formed(9)
    nanv[3] = math.nan
    rows.append((9, nanv, 1))  # NaN element: NaN propagates, sorts first
    nullv = _well_formed(10)
    nullv[3] = None
    rows.append((10, nullv, 2))  # NULL element: NULL propagates, sorts last
    rows.append((11, _well_formed(11)[:5], 3))  # short array: NULL via [i]
    rows.append((12, _well_formed(1), 0))  # exact duplicate of vec_id 1
    rows.append((13, [-0.0] * DIM, 1))  # negative zero: still zero-norm
    infv = _well_formed(14)
    infv[0] = math.inf
    rows.append((14, infv, 2))  # inf element: inf/inf -> NaN both engines
    rows.append((15, [1e-40] * DIM, 3))  # float32 denormals: tiny norm
    # r8 (ADVICE label_cohesion seams, now fixture-proven): a label
    # whose EVERY member is NaN at some dim (centroid cv NULL ->
    # coalesce 0.0 on both engines) and a label whose every member
    # lacks a vector (kept with NULL cohesion via LEFT join on both
    # engines). The third seam — a NULL label — lives in its own
    # corpus (test_label_cohesion_null_label): an INTEGER label column
    # containing NULLs floats under the driver's pandas path, so it
    # must stay out of the shared strict-compare corpus.
    allnan = _well_formed(16)
    allnan[2] = math.nan
    rows.append((16, allnan, 4))  # single-member label: dim 2 all-NaN
    rows.append((17, None, 5))  # vector-less label
    return rows


#: seams the fixed-width quantize/unnest and project representations
#: cannot express identically in both engines (see module docstring)
_REDUCED_EXCLUDES = {9, 10, 11, 14, 16, 17}

FULL_QUERIES = [
    "ann_cosine_topk",
    "lsh_ann_topk",
    "lsh_ann_multiprobe",
    "ivf_assign",
    "ivf_ann_topk",
    # r7: the indexed two-stage rescore joins the full-corpus suite —
    # the v2 layout's try_cast quantization (NaN/Inf component -> NULL
    # qvec entry -> NULL cheap-stage score, sorts last) is replayed by
    # the oracle's TRY_CAST, so even the int8 path runs the seam corpus
    # bit-for-bit.
    "ann_quantized_rescore",
    # r7: label cohesion is NaN-robust end to end (try_cast in BOTH the
    # centroid quantization and the member-score quantization), unlike
    # the by-design-reduced embedding_centroids — so it runs the full
    # seam corpus.
    "label_cohesion",
    # r8b: k-NN label propagation (bucket join + vote — NULL cosines
    # sort last into the n_id tie-break on both engines) and the
    # label/centroid confusion matrix (-1 sentinel for degenerate rows)
    # inherit the same seam obligations as their parents.
    "knn_classify",
    "label_centroid_confusion",
    # r8b: recall eval ranks the same rounded cosines with the same
    # NaN-first/NULL-last DESC ordering on both engines; anchors are
    # well-formed by the corpus contract (vec_ids 0..7).
    "ann_recall_eval",
    # r8b: the vector-QA audit EXISTS to count exactly these seam rows —
    # NULL vec, NaN/NULL components, short arrays, zero/neg-zero norms.
    "vector_quality_audit",
    # r9: the Lloyd step's M-step try_casts quantized components (NaN/Inf
    # degrade to skipped summands, both engines) and the centroid matrix
    # shares the nullif-guarded rounded-cosine convention.
    "kmeans_lloyd_step",
    "centroid_similarity_matrix",
    # r9: the PCA step try_casts every quantized summand
    "embedding_pca_step",
    # r10: the hygiene audit EXISTS for these seam rows; the training
    # loop and its artifact consumers inherit the Lloyd step's try_cast
    # obligations (well-formed seeds by the corpus contract, vec_ids
    # 0..7), and the balance readout replays both E-steps
    "embedding_health_audit",
    "kmeans_train_readout",
    "ivf_ann_topk_trained",
    "ivf_list_balance_trained",
    # r11: the trained-vs-seed recall readout replays both quantizers'
    # E-steps and probe choices over the seam rows
    "ivf_recall_trained_vs_seed",
    # r11: the MMR pool filter (NULL/NaN cosines must never reach the
    # driver-side selection, where python NaN compares diverge from
    # SQL's total order) and the kNN graph's edge filter inherit the
    # same seam obligations; vector-less/degenerate labels must report
    # zero edges, not vanish
    "mmr_rerank_topk",
    "knn_graph_degree_audit",
]

REDUCED_QUERIES = [
    "embedding_quantize",
    "embedding_project",
    # r10: shares embedding_quantize's greatest()-over-NULL seam
    "quantization_error_profile",
]


def _write_embeddings(path, rows) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "vec_id": pa.array([r[0] for r in rows], pa.int64()),
            "embedding": pa.array(
                [r[1] for r in rows], pa.list_(pa.float32())
            ),
            "label": pa.array([r[2] for r in rows], pa.int32()),
        }
    )
    pq.write_table(table, path)


@pytest.fixture(scope="module")
def edge_vec_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_vectors")
    _write_embeddings(d / "embeddings.parquet", _edge_vectors())
    return str(d)


@pytest.fixture(scope="module")
def reduced_vec_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("edge_vectors_reduced")
    rows = [r for r in _edge_vectors() if r[0] not in _REDUCED_EXCLUDES]
    _write_embeddings(d / "embeddings.parquet", rows)
    return str(d)


def _con(sf_dir: str):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{sf_dir}/embeddings.parquet')"
    )
    return con


@pytest.fixture(scope="module")
def edge_vec_con(edge_vec_dir):
    con = _con(edge_vec_dir)
    yield con
    con.close()


@pytest.fixture(scope="module")
def reduced_vec_con(reduced_vec_dir):
    con = _con(reduced_vec_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", FULL_QUERIES)
def test_edge_vector_parity(spark, edge_vec_dir, edge_vec_con, name):
    spec = all_queries()[name]
    problems = compare(
        name, spec.builder(spark, edge_vec_dir), edge_vec_con, spec.oracle
    )
    assert not problems, "\n".join(problems)


@pytest.mark.parametrize("name", REDUCED_QUERIES)
def test_reduced_edge_vector_parity(
    spark, reduced_vec_dir, reduced_vec_con, name
):
    spec = all_queries()[name]
    problems = compare(
        name, spec.builder(spark, reduced_vec_dir), reduced_vec_con, spec.oracle
    )
    assert not problems, "\n".join(problems)


def test_degenerate_rows_place_deterministically(spark, edge_vec_dir):
    """Pin the seam ordering contract the oracles rely on: NaN scores
    sort first, NULL scores (zero-norm / NULL-element / short-array)
    sort last, and the exact duplicate of a centroid assigns to it."""
    from pyspark.sql import functions as F

    from ser_etl_spark.operators.similarity import ivf_assign
    from ser_etl_spark.sources.parquet import load_table

    emb = load_table(spark, edge_vec_dir, "embeddings")
    assign = {
        r["vec_id"]: r["centroid_id"] for r in ivf_assign(emb).collect()
    }
    assert assign[12] == 1  # exact duplicate of centroid 1
    # zero, NULL-element, short, -0.0, NULL-vector
    for degenerate in (8, 10, 11, 13, 17):
        assert assign[degenerate] == -1, (degenerate, assign[degenerate])
    assert assign[9] >= 0  # NaN scores NaN, still assigns
    assert assign[16] >= 0  # NaN at one dim: same class as vec 9
    # zero-norm rows never enter a cosine top-k: scored NULL, sorted last
    from ser_etl_spark.operators.similarity import (
        _query_vector,
        cosine_topk,
    )

    vec = _query_vector(spark, edge_vec_dir)
    top = cosine_topk(emb, vec, k=16).collect()
    sims = [r["cos_sim"] for r in top]
    # NaN rows (vec 9: NaN element; vec 14: inf/inf; vec 16: NaN dim)
    # lead; NULLs (3 of the 5 fit within k=16 over the 18-row corpus)
    # trail
    assert all(
        s is not None and math.isnan(s) for s in sims[:3]
    ), sims
    assert all(s is None for s in sims[-3:]), sims


def test_label_cohesion_null_label(spark, tmp_path_factory):
    """The third ADVICE r8 seam: a NULL label must not crash (the r7
    implementation int()-cast collected labels driver-side) and must
    agree with the oracle value-for-value. Separate corpus because an
    INTEGER label column containing NULLs floats under the driver's
    pandas path — a dtype rendering artifact, not a value divergence —
    so the strict oracle_type_problems gate would flag the shared
    corpus for every labelled query."""
    from ser_etl_spark.registry import all_queries
    from tests.oracle import (
        canonical_rows,
        duckdb_result,
        spark_result,
    )

    d = tmp_path_factory.mktemp("edge_vectors_null_label")
    rows = _edge_vectors()
    rows.append((18, _well_formed(18), None))  # NULL label, real vector
    _write_embeddings(d / "embeddings.parquet", rows)
    con = _con(str(d))
    try:
        spec = all_queries()["label_cohesion"]
        s_cols, s_rows = spark_result(spec.builder(spark, str(d)))
        d_cols, d_rows = duckdb_result(con, spec.oracle)
        assert sorted(s_cols) == sorted(d_cols)
        assert canonical_rows(s_cols, s_rows) == canonical_rows(
            d_cols, d_rows
        )
        # the NULL-label member forms its own group: counted, and with
        # no centroid to equi-match, its cohesion is NULL on both sides
        null_grp = [r for r in s_rows if r[0] is None]
        assert len(null_grp) == 1
        assert null_grp[0][1] == 1 and null_grp[0][2] is None
    finally:
        con.close()
