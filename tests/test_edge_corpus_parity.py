"""Differential parity on an adversarial corpus the fixtures don't cover.

The generated hash oracles (MinHash/SimHash/Count-Min/Bloom/packing) are
hash-green on the synthetic fixtures, but those have a benign shape:
ASCII text, 30+ tokens per doc, a tiny vocabulary. This suite re-runs
the Spark-vs-DuckDB compare over a corpus built to hit the seams —
empty text, whitespace-only, below-shingle-threshold docs, exact
duplicates, unicode/multi-byte tokens, single very long repeated-token
docs — so an oracle that quietly disagrees outside the fixture
distribution fails here first.
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F  # noqa: F401  (parity with peers)

from ser_etl_spark.registry import all_queries
from tests.oracle import compare

EDGE_DOCS = [
    # (doc_id, text, lang, source, n_chars)
    (0, "", "en", "web", 0),
    (1, "   ", "en", "web", 3),
    (2, "one", "en", "web", 3),
    (3, "two tokens", "en", "web", 10),
    (4, "exactly three tokens", "en", "books", 20),
    (5, "exactly three tokens", "en", "books", 20),  # exact duplicate
    (6, "exactly three tokens here", "en", "books", 25),  # near-dup
    (7, "naïve café über münchen — unicode tokens everywhere", "de", "web", 51),
    (8, "語 言 處 理 模 型 訓 練 資 料 管 線", "zh", "web", 35),
    (9, " ".join(["repeat"] * 40), "en", "code", 279),
    (10, " ".join(f"tok{i}" for i in range(64)), "en", "code", 443),
    (11, "Tabs\tand\nnewlines stay intact inside text", "en", "web", 42),
    (12, "exactly  three   tokens", "en", "books", 23),  # multi-space
]

#: Document-table queries whose oracles exercise the generated hash SQL
#: or shingle/token pipelines.
EDGE_QUERIES = [
    "dedup_exact",
    "dedup_fingerprint",
    "ngram_jaccard_pairs",
    "ngram_jaccard_guarded",
    "dedup_clusters",
    "dedup_canonical",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "count_min_tokens",
    "decontamination",
    "decontamination_bloom",
    "pack_sequences",
    # r8b: the source-granular overlap audit and the boilerplate scorer
    # share the shingle pipeline and must agree on unicode, multi-space
    # and repeated-token shapes too.
    "source_overlap_matrix",
    "boilerplate_score",
    "minhash_error_eval",
    # r8c: the new token/shingle/fingerprint consumers must agree on
    # unicode, multi-space and repeated-token shapes too.
    "lexical_diversity",
    "vocab_growth",
    "charclass_profile",
    "bloom_fpr_eval",
    "dedup_rate_by_source",
    "dominant_lang_share",
    "group_ksample",
    "langid_confusion",
    "source_signature_terms",
    # r9: the new token/shingle consumers
    "quality_filter_funnel",
    "doc_rarity_topk",
    "contamination_span_profile",
    "context_fit_histogram",
    "token_budget_selection",
    "snapshot_diff_audit",
    "source_length_quartiles",
    "quality_by_lang",
    "shingle_df_histogram",
    "dup_source_matrix",
    "lsh_candidate_budget",
    "kmv_distinct_by_source",
    "code_switch_share",
    # r10: the new fingerprint/quality/length consumers
    "quality_canonical_dedup",
    "mad_length_outliers",
    "curriculum_stage_histogram",
    # r11: the new token/quality/mixture consumers (rrf_fusion's lexical
    # arm and the quantile normalizer both run the full tokenizer/quality
    # pipeline; the samplers exercise the hash SQL on degenerate lengths)
    "tokenizer_compression",
    "shingle_size_sensitivity",
    "quality_quantile_normalize",
    "weighted_sample",
    "mixture_rebalance",
    "lang_source_chi2",
    "vocab_gini",
    "corpus_rollup",
    # r12: the PII detectors and the adjacent-repeat zipper must agree
    # on unicode, multi-space, empty and repeated-token shapes
    "pii_scan",
    "pii_redact",
    "intra_doc_repetition",
    "dedup_threshold_sweep",
    # r13: the new fingerprint/shingle/band consumers
    "domain_dedup_profile",
    "quality_vs_dup_correlation",
    "doc_prefix_cluster_profile",
    "pii_cooccurrence_matrix",
    "minhash_pr_eval",
    "cross_split_neardup_leakage",
    "benchmark_leakage_by_split",
    # r13d: the segment hasher must agree on empty/short/unicode/
    # multi-space shapes (doc 9's 40 repeated tokens yield 2 identical
    # segments — intra-doc boilerplate; doc 10's 64 tokens yield 4);
    # the media ops exercise the id-derived metadata on a tiny corpus
    "segment_dedup_profile",
    "media_chunk_plan",
    "media_aspect_buckets",
    # r13e: docs 4/5 are an exact-dup pair with adjacent ids — whether
    # the naive split straddles them is decided by the Knuth hash, and
    # both engines must agree on it (plus the fp of empty/whitespace
    # docs collapsing into one cluster)
    "leakage_safe_split",
    # r13f: the survivorship report on the same seams — empty/
    # whitespace docs share one fp (kept=1/dropped=1 inside it), and
    # the micro-quantized quality fold must agree on unicode shapes
    "dedup_quality_shift",
    # r13g: the coverage ladder over the edge vocabulary (empty-string
    # tokens, unicode/CJK types, the 40x 'repeat' hot class)
    "vocab_coverage_curve",
    # r13h: the recipe arithmetic on degenerate token counts (empty/
    # whitespace docs contribute the ''-token, NULL text contributes 0)
    "epoch_plan",
    # r13i: PII flags x the split hash on the same seams
    "pii_by_split",
    # r13j: the by-source contamination rollup and the (split, source)
    # balance audit on the degenerate shapes (empty/whitespace docs
    # carry no grams; every doc_id bucket must agree cross-engine)
    "contamination_by_source",
    "split_mixture_audit",
]


@pytest.fixture(scope="module")
def edge_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("edge_corpus")
    cols = list(zip(*EDGE_DOCS))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1]),
            "lang": pa.array(cols[2]),
            "source": pa.array(cols[3]),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(table, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def edge_con(edge_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{edge_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_edge_corpus_parity(spark, edge_dir, edge_con, name):
    spec = all_queries()[name]
    problems = compare(
        name, spec.builder(spark, edge_dir), edge_con, spec.oracle
    )
    assert not problems, "\n".join(problems)


#: the giant-clique corpus: every document byte-identical (the r6 manual
#: probe made permanent — transitive dedup must produce ONE cluster, the
#: band joins a complete candidate graph, and nothing times out or
#: diverges on the pathological all-pairs shape)
CLIQUE_DOCS = [
    (i, "the same exact document body repeated everywhere", "en",
     ("web", "books", "code")[i % 3], 46)
    for i in range(40)
]

CLIQUE_QUERIES = [
    "dedup_exact",
    "dedup_fingerprint",
    # r10: the quality survivor rule on ONE giant cluster — a single
    # canonical, everyone else dropped, window partition = whole corpus
    "quality_canonical_dedup",
    "ngram_jaccard_guarded",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "dedup_clusters",
    "dedup_canonical",
    "incremental_dedup",
    "media_phash_neardup",
    "heavy_hitters",
    # r8b: the sketch-accuracy eval on the complete candidate graph —
    # every pair is a band candidate, est and exact both 1.0
    "minhash_error_eval",
    # r8b: the 40-identical-docs corpus is ONE cluster of size 40 —
    # the histogram must say exactly that
    "dedup_cluster_sizes",
    # r8c: every source is 100% duplicated (dup_bp = 10000 everywhere);
    # the Bloom eval's clean set is EMPTY (every train shingle is a true
    # contamination), so fpr must be NULL on both engines, not 0/0
    "dedup_rate_by_source",
    "bloom_fpr_eval",
    "lexical_diversity",
    "vocab_growth",
    # r9: on a 40-identical-doc corpus the funnel drops everything at
    # the distinct-ratio gate, rarity is uniform, every doc's grams are
    # fully contaminated (doc 0 is the benchmark), and budget selection
    # ranks a 40-way priority tie purely by doc_id
    "quality_filter_funnel",
    "doc_rarity_topk",
    "contamination_span_profile",
    "context_fit_histogram",
    "token_budget_selection",
    # r9: 40 identical docs across 3 sources — every source pair shares
    # the one fingerprint, and every LSH band has one 40-doc bucket
    # (est_pairs = 780 per band)
    "dup_source_matrix",
    "lsh_candidate_budget",
    # r11: 40 identical docs — every shingle has df=40 at every k
    # (candidate_pairs = 780·distinct), the mixture feasible total is
    # bounded by the 'other'-group absence rule, and the quantile
    # normalizer maps a 40-way score tie purely by doc_id
    "shingle_size_sensitivity",
    "dedup_threshold_sweep",
    "mixture_rebalance",
    "quality_quantile_normalize",
    # r11b: 40 identical docs — the frequency distribution is uniform
    # at f=40 per type (Gini over a point mass), and the rollup's lang
    # level equals its grand total
    "vocab_gini",
    "corpus_rollup",
    # r13: 40 identical docs = one fp clique — the domain profile's fp
    # window holds every source in ONE partition (kept share goes to
    # the min-doc source), the quality-dup bucket is pure dup_3plus,
    # and every doc shares the same 5-token prefix (one 40-doc prefix
    # cluster)
    "domain_dedup_profile",
    "quality_vs_dup_correlation",
    "doc_prefix_cluster_profile",
    # r13b: every pair is both a band candidate and an exact pair —
    # tp = C(40,2), precision = recall = 10000
    "minhash_pr_eval",
    # r13c: the 40-doc clique's 780 pairs spread across every split
    # cell the doc_id hash produces; contamination covers every
    # non-bench doc (benchmark slice is identical text)
    "cross_split_neardup_leakage",
    "benchmark_leakage_by_split",
    # r13d: clique docs are 7 tokens — BELOW the 16-token segment
    # width, so the profile must be EMPTY on both engines (the
    # zero-segment seam)
    "segment_dedup_profile",
    # r13e: ONE 40-doc cluster — the naive policy straddles it (40
    # sequential ids cover every split), the safe policy pins all 40
    # to doc 0's split and reassigns everyone the hash moved
    "leakage_safe_split",
    # r13f: kept=1 / dropped=39 with identical quality everywhere —
    # the cohort means must be equal and the corpus row must fold the
    # same micro-sums
    "dedup_quality_shift",
    # r13j: identical text everywhere — every non-bench doc is fully
    # contaminated (doc 0 is the benchmark slice), per source AND per
    # split cell; the mixture audit sees the id-hash's natural spread
    "contamination_by_source",
    "split_mixture_audit",
    # r14: ONE 40-doc cross-source cluster — purity must report a
    # single mixed '8+' band; the composed release gate drops the
    # ENTIRE pool at decontamination (doc 0 is the bench slice and
    # every doc shares its 5-grams), so every later stage must read 0
    # on both engines; the BPE trainer sees one giant pair tie per
    # iteration (pure lexicographic tie-break seam); truncation loss
    # is zero at every budget (7-token docs); redaction finds no PII;
    # the lang-balance audit sees the id-hash's natural spread over a
    # single-lang corpus (deviation 0 everywhere)
    "cluster_source_purity",
    "corpus_release",
    "bpe_merge_step",
    "context_truncation_loss",
    "token_fertility_by_lang",
    "pii_redaction_impact",
    "split_lang_balance_audit",
    "shard_skew_audit",
]


@pytest.fixture(scope="module")
def clique_dir(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("clique_corpus")
    cols = list(zip(*CLIQUE_DOCS))
    table = pa.table(
        {
            "doc_id": pa.array(cols[0], pa.int64()),
            "text": pa.array(cols[1]),
            "lang": pa.array(cols[2]),
            "source": pa.array(cols[3]),
            "n_chars": pa.array(cols[4], pa.int64()),
        }
    )
    pq.write_table(table, d / "documents.parquet")
    return str(d)


@pytest.fixture(scope="module")
def clique_con(clique_dir):
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{clique_dir}/documents.parquet')"
    )
    yield con
    con.close()


@pytest.mark.parametrize("name", CLIQUE_QUERIES)
def test_identical_corpus_parity(spark, clique_dir, clique_con, name):
    spec = all_queries()[name]
    problems = compare(
        name, spec.builder(spark, clique_dir), clique_con, spec.oracle
    )
    assert not problems, "\n".join(problems)


def test_identical_corpus_collapses_to_one_cluster(spark, clique_dir):
    """Semantics, not just parity: 40 identical docs are one duplicate
    clique — one cluster label, one canonical survivor (doc_id 0)."""
    Q = all_queries()
    labels = {
        r["cluster_id"]
        for r in Q["dedup_clusters"].builder(spark, clique_dir).collect()
    }
    assert labels == {0}
    survivors = [
        r["doc_id"]
        for r in Q["dedup_canonical"].builder(spark, clique_dir).collect()
    ]
    assert survivors == [0]


# ---------------------------------------------------------------------------
# r8 review seams: all-NULL text / all-NULL embeddings
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def nulltext_dir(tmp_path_factory):
    """Documents whose text is entirely NULL (plus one tokenless empty
    string): the token stream is empty, so the postings artifact has
    zero part files and corpus totals derived from row counts would
    diverge from totals derived from the token stream."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nulltext_corpus")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2], pa.int64()),
                "text": pa.array([None, None, None], pa.string()),
                "lang": pa.array(["en"] * 3),
                "source": pa.array(["web"] * 3),
                "n_chars": pa.array([0, 0, 0], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["bm25_search_indexed", "postings_layout", "substring_dedup",
     "span_removal", "ngram_containment", "source_overlap_matrix",
     "boilerplate_score",
     # r8c: tokenless corpora through the new token/fingerprint readers
     "lexical_diversity", "vocab_growth", "charclass_profile",
     "bloom_fpr_eval", "dedup_rate_by_source", "dominant_lang_share",
     "group_ksample", "shard_manifest", "langid_confusion",
     "source_signature_terms",
     # r9 token consumers on a tokenless corpus
     "quality_filter_funnel", "doc_rarity_topk",
     "contamination_span_profile", "context_fit_histogram",
     "token_budget_selection",
     # r9: the streaming gate must count all-NULL-text docs as failures
     # (not crash the sink on a zero-pass batch); diff must call two
     # NULL-text versions unchanged (null-safe fingerprint compare)
     "streaming_quality_gate", "snapshot_diff_audit",
     "source_length_quartiles", "quality_by_lang",
     "shingle_df_histogram", "kmv_distinct_by_source",
     "code_switch_share",
     # r10: quality-aware canonical must share the NULL fingerprint
     # group; MAD screen must survive a no-length corpus; the
     # curriculum histogram must exclude all-junk corpora entirely
     "quality_canonical_dedup", "mad_length_outliers",
     "curriculum_stage_histogram"],
)
def test_nulltext_corpus_parity(spark, nulltext_dir, name):
    """r8 review: a non-empty corpus with no tokenizable text must not
    crash the postings readers (zero-part-file artifact) and must agree
    with the oracle (empty results)."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{nulltext_dir}/documents.parquet')"
        )
        spec = all_queries()[name]
        problems = compare(
            name, spec.builder(spark, nulltext_dir), con, spec.oracle
        )
        assert not problems, "\n".join(problems)
    finally:
        con.close()


def test_null_and_empty_text_totals_match_token_stream(spark, tmp_path):
    """The manifest's n_docs must equal the token-stream doc count
    (NULL text excluded, empty-string text included with dl=1) so the
    indexed BM25 stays bit-equal to the scan form on mixed corpora."""
    from ser_etl_spark.operators.text import _postings_totals

    docs = spark.createDataFrame(
        [(0, None), (1, ""), (2, "two tokens"), (3, None)],
        "doc_id bigint, text string",
    )
    nd, tt = _postings_totals(docs)
    assert nd == 2  # doc 1 (one empty token) + doc 2; NULLs excluded
    assert tt == 3  # 1 + 2 tokens


@pytest.fixture(scope="module")
def nullvec_dir(tmp_path_factory):
    """Embeddings rows present but every vector NULL — labels intact."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("nullvec_corpus")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
                "embedding": pa.array(
                    [None] * 4, pa.list_(pa.float32())
                ),
                "label": pa.array([0, 0, 1, 2], pa.int32()),
            }
        ),
        d / "embeddings.parquet",
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    [
        "semdedup_canonical",
        "label_cohesion",
        # r8b hardening: the whole vector family survives a rows-exist/
        # vectors-all-NULL corpus and matches the oracle's NULL algebra —
        # ivf_centroids keeps NULL centroids, _query_vector distinguishes
        # a NULL query (rows survive NULLS-LAST ranking in the exact/LSH
        # family; `NULL IN probes` empties the IVF/rescore family), and
        # the layout relation emits (bucket 0, -1) without an index.
        "ivf_assign",
        "label_centroid_confusion",
        # r8c: per-dimension screen — all-NULL vectors explode to zero
        # component rows, so the output must be EMPTY on both engines
        "dim_variance_screen",
        "knn_classify",
        "vector_quality_audit",
        "ann_recall_eval",
        "hard_negative_mining",
        "ann_cosine_topk",
        "lsh_ann_topk",
        "lsh_ann_multiprobe",
        "ivf_ann_topk",
        "ann_quantized_rescore",
        "ann_index_layout",
        "ann_blocked_neardup",
        "embedding_neardup",
        "embedding_centroids",
        "embedding_drift",
        # r13: all-NULL vectors -> every row lands in the (-1, -99)
        # sentinel bucket with zero scored mass on both engines
        "prototypicality_profile",
        "ann_probe_depth_sweep",
    ],
)
def test_nullvec_corpus_parity(spark, nullvec_dir, name):
    """r8 review: a non-empty corpus whose vectors are all NULL — no
    pairs and no centroids exist, but ROWS still do: semdedup keeps
    every row (no losers), label_cohesion owes one row per label with
    NULL cohesion (the LEFT-join contract). Both vs DuckDB."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{nullvec_dir}/embeddings.parquet')"
        )
        spec = all_queries()[name]
        problems = compare(
            name, spec.builder(spark, nullvec_dir), con, spec.oracle
        )
        assert not problems, "\n".join(problems)
    finally:
        con.close()


def test_zero_revenue_corpus_abc_shares_null(spark, tmp_path):
    """r8c guard: a non-empty lineitem whose every line rounds to zero
    revenue has total = 0 — the ABC share must be NULL on both engines,
    the -1 sentinel on both engines, not a divide-by-zero error (and
    not a NULL, which would float the BIGINT column)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "zero_rev"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([1, 2, 3], pa.int64()),
                "l_extendedprice": pa.array([0.0, 0.0, 0.0]),
                "l_discount": pa.array([0.0, 0.0, 0.0]),
            }
        ),
        d / "lineitem.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW lineitem AS SELECT * FROM "
            f"read_parquet('{d}/lineitem.parquet')"
        )
        spec = all_queries()["revenue_abc_classes"]
        problems = compare(
            "revenue_abc_classes", spec.builder(spark, str(d)), con,
            spec.oracle,
        )
        assert not problems, "\n".join(problems)
        rows = spec.builder(spark, str(d)).collect()
        assert [r["abc_class"] for r in rows] == ["C"]
        assert rows[0]["share_bp"] == -1
    finally:
        con.close()


def test_pre_epoch_events_heatmap_parity(spark, tmp_path):
    """r8c seam: negative (pre-1970) epochs — DuckDB's // truncates and
    % follows the dividend while Spark floors and pmods, so the heatmap
    buckets diverge without the floordiv/nonneg-mod identities. Pin
    parity on a corpus straddling the epoch."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "preepoch"
    d.mkdir()
    ts = [
        _dt.datetime(1969, 12, 31, 22, 30),
        _dt.datetime(1969, 12, 25, 3, 0),
        _dt.datetime(1970, 1, 1, 0, 30),
        _dt.datetime(1971, 6, 15, 12, 0),
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 2, 2], pa.int64()),
                "event_type": pa.array(["a"] * 4),
                "value": pa.array([1.0, 2.0, 3.0, 4.0]),
                "props": pa.array([None] * 4, pa.string()),
            }
        ),
        d / "events.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        spec = all_queries()["event_heatmap"]
        problems = compare(
            "event_heatmap", spec.builder(spark, str(d)), con, spec.oracle
        )
        assert not problems, "\n".join(problems)
        # Dec 31 1969 was a Wednesday (dow 2 under 0=Monday), 22:30 UTC
        rows = {(r["dow"], r["hour"]) for r in
                spec.builder(spark, str(d)).collect()}
        assert (2, 22) in rows, rows
    finally:
        con.close()


def test_pre_epoch_backlog_timeline_parity(spark, tmp_path):
    """r8c seam twin for the month math: an order opened Dec 1969 must
    report year=1969, month=12 — and identically on both engines."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "preepoch_orders"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([1], pa.int64()),
                "o_orderdate": pa.array([_dt.date(1969, 12, 10)]),
            }
        ),
        d / "orders.parquet",
    )
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array([1], pa.int64()),
                "l_shipdate": pa.array([_dt.date(1970, 2, 20)]),
            }
        ),
        d / "lineitem.parquet",
    )
    con = duckdb.connect()
    try:
        for t in ("orders", "lineitem"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        spec = all_queries()["open_orders_timeline"]
        problems = compare(
            "open_orders_timeline", spec.builder(spark, str(d)), con,
            spec.oracle,
        )
        assert not problems, "\n".join(problems)
        rows = {(r["year"], r["month"]): r["open_end"]
                for r in spec.builder(spark, str(d)).collect()}
        assert rows[(1969, 12)] == 1 and rows[(1970, 2)] == 0, rows
    finally:
        con.close()


# ---------------------------------------------------------------------------
# r9 seam: empty-STRING text (not NULL) — the md5('')/phantom-group class
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emptystr_dir(tmp_path_factory):
    """Documents whose text is present but carries no content: empty
    strings, whitespace-only runs, and punctuation-only bodies. Distinct
    from the all-NULL corpus: every expression still EVALUATES (md5('')
    is a non-NULL constant, split('') is a one-element list), so any
    operator that forgets the nullif/normalize step silently clusters or
    counts these rows — exactly the dedup_rate_by_source bug this round
    fixed (r9 ADVICE)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path_factory.mktemp("emptystr_corpus")
    texts = ["", "   ", "\t  \t", "!!! ... ---", "???", "", "  ", "..."]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(
                    [("web", "books")[i % 2] for i in range(len(texts))]
                ),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


@pytest.mark.parametrize(
    "name",
    ["dedup_exact", "dedup_fingerprint", "dedup_rate_by_source",
     "dup_source_matrix", "fingerprint", "quality_filter_funnel",
     "quality_by_lang", "doc_rarity_topk", "token_budget_selection",
     "context_fit_histogram", "source_length_quartiles",
     "snapshot_diff_audit", "kmv_distinct_by_source", "code_switch_share",
     "shingle_df_histogram", "lexical_diversity", "charclass_profile",
     "lang_id", "text_stats", "quality_score", "corpus_curation",
     "quality_canonical_dedup", "curriculum_stage_histogram",
     "mad_length_outliers"],
)
def test_emptystr_corpus_parity(spark, emptystr_dir, name):
    """Content-free but non-NULL text must neither crash nor diverge:
    both engines see the same md5('')/one-token-split algebra, and the
    nullif-normalized operators must agree that these rows carry no
    fingerprint."""
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{emptystr_dir}/documents.parquet')"
        )
        spec = all_queries()[name]
        problems = compare(
            name, spec.builder(spark, emptystr_dir), con, spec.oracle
        )
        assert not problems, "\n".join(problems)
    finally:
        con.close()


def test_emptystr_corpus_never_phantom_clusters(spark, emptystr_dir):
    """Semantics, not just parity: the nullif-normalized dedup readouts
    must report ZERO duplicates on a corpus of content-free docs — the
    md5('') constant must never form a duplicate group."""
    Q = all_queries()
    rate = Q["dedup_rate_by_source"].builder(spark, emptystr_dir).collect()
    assert rate and all(r["n_dups"] == 0 for r in rate), rate
    assert Q["dup_source_matrix"].builder(spark, emptystr_dir).count() == 0


def test_subsecond_rate_limit_parity(spark, tmp_path):
    """r12 seam (the r11 ADVICE high): sub-second timestamp parts —
    DuckDB's CAST(epoch(ts) AS BIGINT) rounds half-up while Spark's
    timestampdiff truncates, so a .6s fraction shifts the RANGE-frame
    key by one second unless the oracle floors. Pin parity on a corpus
    where every event straddles a rounding boundary."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "subsec"
    d.mkdir()
    base = _dt.datetime(2024, 3, 1, 12, 0, 0)
    ts = [
        base + _dt.timedelta(seconds=s, microseconds=us)
        for s, us in [
            (0, 600_000),   # .6  -> rounds to 1s, truncates to 0s
            (59, 500_000),  # .5  -> half-up boundary itself
            (59, 999_999),  # .999999
            (60, 400_000),
            (61, 700_000),
            (120, 500_001),
        ]
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(6), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 1, 1, 2, 2], pa.int64()),
                "event_type": pa.array(["a"] * 6),
                "value": pa.array([1.0] * 6),
                "props": pa.array([None] * 6, pa.string()),
            }
        ),
        d / "events.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        for name in ("rate_limit_audit", "cumulative_distinct_users"):
            spec = all_queries()[name]
            problems = compare(
                name, spec.builder(spark, str(d)), con, spec.oracle
            )
            assert not problems, f"{name}: " + "\n".join(problems)
        # semantics: user 1's fractions truncate to seconds 0, 59, 59,
        # 60 — the forward frame [0, 59] holds exactly the first three
        # (half-up rounding would have pushed .5/.6 fractions across
        # the boundary and changed the peak)
        rows = {
            r["user_id"]: r
            for r in all_queries()["rate_limit_audit"]
            .builder(spark, str(d))
            .collect()
        }
        assert rows[1]["peak_minute"] == 3, rows
    finally:
        con.close()


def test_null_ts_events_parity(spark, tmp_path):
    """r12 seam (r11 ADVICE low): NULL-ts rows have no day bucket —
    both engines must drop them instead of Spark's collect_set silently
    skipping while the oracle's DISTINCT retains a NULL day row."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "nullts"
    d.mkdir()
    ts = [
        _dt.datetime(2024, 1, 1, 6, 0),
        None,
        _dt.datetime(2024, 1, 2, 6, 0),
        None,
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(4), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array([1, 1, 2, 3], pa.int64()),
                "event_type": pa.array(["a"] * 4),
                "value": pa.array([1.0] * 4),
                "props": pa.array([None] * 4, pa.string()),
            }
        ),
        d / "events.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        spec = all_queries()["cumulative_distinct_users"]
        problems = compare(
            "cumulative_distinct_users", spec.builder(spark, str(d)), con,
            spec.oracle,
        )
        assert not problems, "\n".join(problems)
        rows = spec.builder(spark, str(d)).collect()
        # two real days, no NULL bucket row; user 3 (NULL-ts only)
        # never appears
        assert len(rows) == 2 and rows[-1]["cum_users"] == 2, rows
    finally:
        con.close()


def test_all_null_lang_chi2_parity(spark, tmp_path):
    """r12 seam (r11 ADVICE medium): NULL lang/source IS a category.
    An all-NULL lang column must yield n_langs=1, dof=0 and NULL
    cramers_v — not nl=0, negative dof and sqrt(negative)=NaN."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "nulllang"
    d.mkdir()
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(6), pa.int64()),
                "text": pa.array(["doc text"] * 6),
                "lang": pa.array([None] * 6, pa.string()),
                "source": pa.array(
                    ["web", "web", "books", "books", None, None]
                ),
                "n_chars": pa.array([8] * 6, pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        spec = all_queries()["lang_source_chi2"]
        problems = compare(
            "lang_source_chi2", spec.builder(spark, str(d)), con,
            spec.oracle,
        )
        assert not problems, "\n".join(problems)
        row = spec.builder(spark, str(d)).collect()[0]
        assert row["n_langs"] == 1, row
        assert row["n_sources"] == 3, row  # web, books, NULL
        assert row["dof"] == 0 and row["cramers_v"] is None, row
    finally:
        con.close()


def test_hot_user_window_family_parity(spark, tmp_path):
    """r12 hot-key seam (VERDICT r11 #3): ONE user owning ~all events.
    The per-user window family (scd2_state_history, rate_limit_audit,
    cumulative_distinct_users, session_dwell_stats) keys its shuffle on
    user_id — a hot user concentrates one partition, which is the
    documented linear-state cost, but the ANSWER must be identical to
    the oracle under that skew (ties, frame bounds and run compaction
    all hit the single-partition path)."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "hotuser"
    d.mkdir()
    n = 500
    base = _dt.datetime(2024, 5, 1)
    ts, uid, etype = [], [], []
    for i in range(n):  # user 7 owns 98% of events, bursty + ties
        ts.append(base + _dt.timedelta(seconds=(i // 3) * 20))
        uid.append(7)
        etype.append(["view", "view", "click", "buy"][i % 4])
    for i in range(10):
        ts.append(base + _dt.timedelta(hours=1, seconds=i))
        uid.append(100 + i)
        etype.append("view")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(ts)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(etype),
                "value": pa.array([1.0] * len(ts)),
                "props": pa.array([None] * len(ts), pa.string()),
            }
        ),
        d / "events.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        for name in (
            "scd2_state_history",
            "rate_limit_audit",
            "cumulative_distinct_users",
        ):
            spec = all_queries()[name]
            problems = compare(
                name, spec.builder(spark, str(d)), con, spec.oracle
            )
            assert not problems, f"{name}: " + "\n".join(problems)
        # semantics: the hot user's 60s frames hold 9 events (3 ties x
        # 3 timestamps 20s apart)
        rows = {
            r["user_id"]: r["peak_minute"]
            for r in all_queries()["rate_limit_audit"]
            .builder(spark, str(d))
            .collect()
        }
        assert rows[7] == 9, rows
    finally:
        con.close()


def test_pii_and_repetition_semantics(spark, tmp_path):
    """r12: the new audits on a corpus that actually CONTAINS PII and
    degenerate repetition (the fixtures are clean, so their green rows
    only prove the zero path). Parity plus hand-computed counts."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "piirep"
    d.mkdir()
    texts = [
        "contact me at john.doe+spam@example.com or admin@sub.example.org",
        "server at 192.168.0.1 and 10.0.0.255 responded",
        "call 5551234567 now",
        "clean document with no sensitive content at all",
        "word word word stutter stutter end",
        "",
        None,
        "a a a a a",
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(
                    ["web", "web", "web", "web", "code", "code", "code",
                     "code"]
                ),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        for name in ("pii_scan", "pii_redact", "intra_doc_repetition"):
            spec = all_queries()[name]
            problems = compare(
                name, spec.builder(spark, str(d)), con, spec.oracle
            )
            assert not problems, f"{name}: " + "\n".join(problems)
        pii = {
            r["source"]: r
            for r in all_queries()["pii_scan"].builder(spark, str(d)).collect()
        }
        red = {
            r["doc_id"]: r
            for r in all_queries()["pii_redact"]
            .builder(spark, str(d))
            .collect()
        }
        # doc 0: two emails -> two [EMAIL] markers, no digit-run
        # double-count from the addresses
        assert red[0]["n_email"] == 2 and red[0]["n_digit_run"] == 0
        assert red[0]["redacted_text"].count("[EMAIL]") == 2
        assert red[2]["n_digit_run"] == 1
        assert "[NUM]" in red[2]["redacted_text"]
        assert 3 not in red  # clean doc emits no redaction row
        assert pii["web"]["n_email"] == 2
        assert pii["web"]["n_ipv4"] == 2
        assert pii["web"]["n_digit_run"] == 1
        assert pii["web"]["docs_flagged"] == 3
        assert pii["code"]["docs_flagged"] == 0
        rep = {
            r["source"]: r
            for r in all_queries()["intra_doc_repetition"]
            .builder(spark, str(d))
            .collect()
        }
        # 'word word word stutter stutter end': repeats at (0,1),(1,2),
        # (3,4) = 3; 'a a a a a': 4
        assert rep["code"]["n_repeats"] == 7, rep
        assert rep["code"]["docs_with_repeats"] == 2, rep
        assert rep["web"]["n_repeats"] == 0, rep
    finally:
        con.close()


def test_event_funnel_ordering_semantics(spark, tmp_path):
    """r12: the funnel must be ORDER-sensitive — a click before the
    first view does not convert (even if a purchase follows), and
    equal timestamps DO convert (>= frame). Parity + hand model."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "funnel"
    d.mkdir()
    t0 = _dt.datetime(2024, 2, 1, 12, 0, 0)

    def s(sec):
        return t0 + _dt.timedelta(seconds=sec)

    rows = [
        (1, s(0), "view"), (1, s(10), "click"), (1, s(20), "purchase"),
        (2, s(0), "click"), (2, s(10), "view"), (2, s(20), "purchase"),
        (3, s(0), "view"), (3, s(0), "click"), (3, s(0), "purchase"),
        (4, s(0), "view"),
        (5, s(0), "purchase"),
        (6, s(5), "signup"),  # non-funnel type, ignored
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(rows)), pa.int64()),
                "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
                "user_id": pa.array([r[0] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([1.0] * len(rows)),
                "props": pa.array([None] * len(rows), pa.string()),
            }
        ),
        d / "events.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{d}/events.parquet')"
        )
        for name in ("event_funnel", "cohort_retention",
                     "event_transition_matrix"):
            spec = all_queries()[name]
            problems = compare(
                name, spec.builder(spark, str(d)), con, spec.oracle
            )
            assert not problems, f"{name}: " + "\n".join(problems)
        got = {
            r["stage"]: (r["users"], r["conversion_bp"])
            for r in all_queries()["event_funnel"]
            .builder(spark, str(d))
            .collect()
        }
        # viewers: 1, 2, 3, 4; click-after-view: 1, 3 (user 2's click
        # precedes their view); purchase-after-that-click: 1, 3
        assert got["view"] == (4, 10000), got
        assert got["click"] == (2, 5000), got
        assert got["purchase"] == (2, 10000), got
    finally:
        con.close()


def test_hot_key_funnel_family_parity(spark, tmp_path):
    """r13 (VERDICT r12 #5): the funnel/behavioral family under the
    98%-one-key skew corpus. event_funnel, event_transition_matrix and
    cohort_retention share the hot user_id shuffle; customer_order_gaps
    the hot custkey one. Skew concentrates one partition (the
    documented linear cost) but the ANSWERS must match the oracle:
    funnel stage resolution under massive ties, transition self-loops,
    zero-gap order ties."""
    import datetime as _dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "hotkey2"
    d.mkdir()
    base = _dt.datetime(2024, 5, 1)
    # user 7: ~98% of events, bursty ties (4 events share each
    # timestamp), cycling view->view->click->purchase so the stream has
    # self-loops AND an in-order funnel; a click at t=0 PRECEDING the
    # first view tests the ordered-stage anchor under skew.
    ts, uid, etype = [base], [7], ["click"]
    cycle = ["view", "view", "click", "purchase"]
    for i in range(480):
        ts.append(base + _dt.timedelta(seconds=(i // 4) * 30))
        uid.append(7)
        etype.append(cycle[i % 4])
    # cold users: 5 view-only (funnel drop-off), 5 view->click next day
    for u in range(5):
        ts.append(base + _dt.timedelta(hours=2, seconds=u))
        uid.append(100 + u)
        etype.append("view")
    for u in range(5):
        ts.append(base + _dt.timedelta(days=1, seconds=u))
        uid.append(200 + u)
        etype.append("view")
        ts.append(base + _dt.timedelta(days=1, seconds=u))
        uid.append(200 + u)
        etype.append("click")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(ts)), pa.int64()),
                "ts": pa.array(ts, pa.timestamp("us")),
                "user_id": pa.array(uid, pa.int64()),
                "event_type": pa.array(etype),
                "value": pa.array([1.0] * len(ts)),
                "props": pa.array([None] * len(ts), pa.string()),
            }
        ),
        d / "events.parquet",
    )
    # customer 7: ~98% of orders with zero-gap ties (three orders per
    # day -> gap 0 inside each day), two normal customers with 7/40-day
    # cadences hitting other week buckets.
    okeys, ocust, odates = [], [], []
    k = 0
    for i in range(300):
        okeys.append(k := k + 1)
        ocust.append(7)
        odates.append(base + _dt.timedelta(days=i // 3))
    for i in range(4):
        okeys.append(k := k + 1)
        ocust.append(900)
        odates.append(base + _dt.timedelta(days=7 * i))
        okeys.append(k := k + 1)
        ocust.append(901)
        odates.append(base + _dt.timedelta(days=40 * i))
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(okeys, pa.int64()),
                "o_custkey": pa.array(ocust, pa.int64()),
                "o_orderdate": pa.array(odates, pa.timestamp("us")),
            }
        ),
        d / "orders.parquet",
    )
    con = duckdb.connect()
    try:
        for t in ("events", "orders"):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        for name in (
            "event_funnel",
            "event_transition_matrix",
            "cohort_retention",
            "customer_order_gaps",
        ):
            spec = all_queries()[name]
            problems = compare(
                name, spec.builder(spark, str(d)), con, spec.oracle
            )
            assert not problems, f"{name}: " + "\n".join(problems)
        # semantics under skew: hot user converts in order despite the
        # orphan first click; view-only and next-day-click cold users
        # stop at their stages
        funnel = {
            r["stage"]: r["users"]
            for r in all_queries()["event_funnel"]
            .builder(spark, str(d))
            .collect()
        }
        assert funnel == {"view": 11, "click": 6, "purchase": 1}, funnel
        # transition matrix keeps the hot user's self-loops
        cells = {
            (r["from_type"], r["to_type"]): r["n_transitions"]
            for r in all_queries()["event_transition_matrix"]
            .builder(spark, str(d))
            .collect()
        }
        assert cells[("view", "view")] > 0, cells
        # zero-gap ties land in week bucket 0
        gaps = {
            r["gap_week_bucket"]: r["n_gaps"]
            for r in all_queries()["customer_order_gaps"]
            .builder(spark, str(d))
            .collect()
        }
        assert gaps[0] > 200 and 5 in gaps, gaps
    finally:
        con.close()


def test_sweep_guard_boundary_parity(spark, tmp_path):
    """r13 (VERDICT r12 #6): the ``max_shingle_df=50`` guard boundary
    dedup_threshold_sweep inherits from ngram_jaccard_pairs, pinned on
    an adversarial corpus against a serial model: one trigram shared by
    EXACTLY df=50 docs (kept -> C(50,2)=1225 pairs) and one by df=51
    (dropped -> zero pairs from that clique), plus a j=0.6 pair and a
    j=1.0 pair that actually fire the sweep thresholds. Jaccard
    denominators use PRE-guard shingle-set sizes on both engines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ser_etl_spark.operators.dedup import ngram_jaccard_pairs

    d = tmp_path / "guardb"
    d.mkdir()
    texts = []
    # 50 docs sharing exactly one trigram: df == guard, KEPT
    texts += [f"alpha beta gamma ua{i} va{i}" for i in range(50)]
    # 51 docs sharing a different trigram: df == guard+1, DROPPED
    texts += [f"delta eps zeta wb{i} xb{i}" for i in range(51)]
    # one pair at jaccard 3/5 = 0.6 and one identical pair (1.0)
    texts += [
        "one two three four five six",
        "one two three four five seven",
        "zz yy xx ww vv",
        "zz yy xx ww vv",
        "",
        None,
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts, pa.string()),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["web"] * len(texts)),
                "n_chars": pa.array(
                    [len(t) if t else 0 for t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    docs = spark.read.parquet(str(d / "documents.parquet"))

    # serial model: 1225 clique-A pairs (j=0.2) + the 0.6 + the 1.0 pair
    pairs = ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=50)
    assert pairs.count() == 1225 + 2
    # clique-A pairs vanish one notch tighter: df=50 > 49 drops them
    assert (
        ngram_jaccard_pairs(docs, threshold=0.0, max_shingle_df=49).count()
        == 2
    )
    # clique-B contributed nothing even at the loose guard
    b_ids = set(range(50, 101))
    assert not [
        r
        for r in pairs.collect()
        if r["doc_a"] in b_ids or r["doc_b"] in b_ids
    ]

    # the sweep over that pair space + full oracle parity
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        spec = all_queries()["dedup_threshold_sweep"]
        problems = compare(
            "dedup_threshold_sweep", spec.builder(spark, str(d)), con,
            spec.oracle,
        )
        assert not problems, "\n".join(problems)
        got = {
            r["threshold_bp"]: (r["n_pairs"], r["mean_jaccard_micro"])
            for r in spec.builder(spark, str(d)).collect()
        }
        assert got[5000] == (2, 800000), got  # 0.6 and 1.0 qualify
        assert got[7000] == (1, 1000000), got
        assert got[9000] == (1, 1000000), got
    finally:
        con.close()


def test_minhash_pr_eval_measures_banding_misses(spark, tmp_path):
    """r13: the P/R harness on a corpus where the 16x4 S-curve actually
    loses pairs — 30 near-dup pairs at exact Jaccard 9/17 ≈ 0.529
    (11-token shared prefix + 4 unique tail tokens each side), right
    on the banding threshold where P(candidate) ≈ 0.73. The fixtures
    only exercise the degenerate exact-copy path (P = R = 10000); here
    recall MUST be measurably below 10000 with fn > 0, precision stays
    10000 (the guarded exact join is the truth side, banding only
    loses), and the whole readout still hash-matches DuckDB's replay
    of both pipelines."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "prseam"
    d.mkdir()
    texts = []
    for i in range(30):
        pref = " ".join(f"w{i}t{j}" for j in range(11))
        texts.append(pref + f" a{i}x a{i}y a{i}z a{i}q")
        texts.append(pref + f" b{i}x b{i}y b{i}z b{i}q")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["w"] * len(texts)),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        spec = all_queries()["minhash_pr_eval"]
        df = spec.builder(spark, str(d))
        problems = compare("minhash_pr_eval", df, con, spec.oracle)
        assert not problems, "\n".join(problems)
        row = df.collect()[0]
        assert row["n_exact"] == 30, row
        assert row["precision_bp"] == 10000.0, row
        assert row["fn"] > 0 and row["recall_bp"] < 10000.0, row
        assert row["tp"] + row["fn"] == 30 and row["fp"] == 0, row
    finally:
        con.close()


def test_segment_clique_parity(spark, tmp_path):
    """r13: the segment-clique seam — 30 byte-identical 48-token docs
    across 3 sources: every doc contributes the SAME 3 segments, so the
    hash aggregate holds 3 giant groups (the skew shape a boilerplate
    corpus produces at scale). Per source: all segments duplicated
    (dup_bp exactly 10000) and every segment shared with both other
    sources; hash-parity against the DuckDB string-grouped replay pins
    that the xxhash64 grouping changes nothing on this shape."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "segclique"
    d.mkdir()
    body = " ".join(f"tok{j}" for j in range(48))
    n = 30
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([body] * n),
                "lang": pa.array(["en"] * n),
                "source": pa.array(
                    [("web", "books", "code")[i % 3] for i in range(n)]
                ),
                "n_chars": pa.array([len(body)] * n, pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        spec = all_queries()["segment_dedup_profile"]
        df = spec.builder(spark, str(d))
        problems = compare("segment_dedup_profile", df, con, spec.oracle)
        assert not problems, "\n".join(problems)
        rows = {r["source"]: r for r in df.collect()}
        assert set(rows) == {"web", "books", "code"}
        for r in rows.values():
            assert r["n_segments"] == 30  # 10 docs x 3 segments
            assert r["dup_segments"] == 30 and r["dup_bp"] == 10000, r
            assert r["cross_source_segs"] == 3, r
    finally:
        con.close()


def test_vocab_coverage_boundary_class_parity(spark, tmp_path):
    """r13: the fixtures hold ~31 token types, so every ladder cutoff
    saturates (coverage 10000 bp) and the BOUNDARY-CLASS branch —
    ``(V - types_above) * f`` for the frequency class the cutoff
    splits — never fires. This corpus makes V=100 land INSIDE the
    singleton class: 3 hot types (f=40 each) + 200 singletons, so
    covered@100 = 3*40 + 97*1 exactly, and no tie order can matter
    because every split-class member carries the same f."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    d = tmp_path / "vocabseam"
    d.mkdir()
    texts = []
    for i in range(20):
        hot = " ".join(["hota hotb hotc"] * 2)  # 3 hot types, 2x per doc
        singles = " ".join(f"rare{i}_{j}" for j in range(10))
        texts.append(hot + " " + singles)
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["w"] * len(texts)),
                "n_chars": pa.array([len(t) for t in texts], pa.int64()),
            }
        ),
        d / "documents.parquet",
    )
    con = duckdb.connect()
    try:
        con.execute(
            "CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')"
        )
        spec = all_queries()["vocab_coverage_curve"]
        df = spec.builder(spark, str(d))
        problems = compare("vocab_coverage_curve", df, con, spec.oracle)
        assert not problems, "\n".join(problems)
        rows = {r["vocab_size"]: r for r in df.collect()}
        # 3 hot types at f=40, 200 singletons; total = 120 + 200 = 320
        assert rows[100]["total_tokens"] == 320
        assert rows[100]["covered_tokens"] == 3 * 40 + 97  # boundary split
        assert rows[100]["n_types"] == 100
        assert rows[1000]["covered_tokens"] == 320  # ladder saturates
        assert rows[1000]["n_types"] == 203
    finally:
        con.close()
