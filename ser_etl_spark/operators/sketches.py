"""Approximate aggregation sketches.

At 100 TB, exact COUNT(DISTINCT) and exact percentiles are
shuffle-every-value operations; the standard OLAP answer is sketches:
HyperLogLog++ for distinct counts and a quantile summary for
percentiles — both built into Spark, both mergeable map-side, so the
shuffle carries fixed-size sketch state instead of values.

Native sketch outputs are engine-specific (Spark's HLL++ and DuckDB's
HLL give different estimates for the same data), so ``approx_sketches``
registers rows-only with bound tests. Every OTHER sketch here is
deliberately the differentially-testable member of its family:
Count-Min cells are associative sums over emulated-xxhash64 buckets,
the KMV distinct/union/intersection estimators are pure functions of
the staged hash values, and heavy hitters is the two-pass
candidates-then-exact-rescore form — all oracle-backed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.functions.numeric import fround, sql_fround
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def approx_distinct(
    df: DataFrame, col: str, rsd: float = 0.01
) -> DataFrame:
    """HyperLogLog++ distinct-count estimate (relative std dev ``rsd``)."""
    return df.agg(F.approx_count_distinct(col, rsd=rsd).alias("approx_distinct"))


def approx_quantiles(
    df: DataFrame, col: str, probs: list[float], accuracy: int = 10000
) -> DataFrame:
    """Approximate percentiles via Spark's quantile summary sketch."""
    return df.agg(
        F.percentile_approx(col, probs, accuracy).alias("quantiles")
    )


@register(
    "approx_sketches",
    oracle=None,  # HLL/quantile estimates are engine-specific;
    # tests bound them against exact answers
    description="HLL++ distinct orderkeys + approximate price percentiles "
    "over lineitem — mergeable fixed-size sketch state instead of "
    "shuffling values (the 100 TB form of COUNT DISTINCT / percentile)",
    covers=("B4",),
)
def approx_sketches_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One row of scalar columns: the driver canonicalizes results through
    # a pandas frame, where array-valued cells are unhashable — so the
    # three percentiles are separate scalar aggregates, never one
    # array<double> (the embedding_quantize unnesting rule).
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias(
            "approx_orders"
        ),
        F.percentile_approx("l_extendedprice", F.lit(0.5), F.lit(10000)).alias(
            "p50_price"
        ),
        F.percentile_approx("l_extendedprice", F.lit(0.95), F.lit(10000)).alias(
            "p95_price"
        ),
        F.percentile_approx("l_extendedprice", F.lit(0.99), F.lit(10000)).alias(
            "p99_price"
        ),
    )


def _tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token stream (the token_frequencies/count_min form)."""
    return docs.select(
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), " +")).alias("tok")
    )


def mg_candidates(
    toks: DataFrame, k: int = 200, tok_col: str = "tok"
) -> DataFrame:
    """Pass 1 of the two-pass heavy-hitter pattern: per-partition
    Misra-Gries survivor sets (at most ``k`` counters each, decrementing
    all when full — the classic bounded-state step).

    Guarantee (the pigeonhole + MG survival argument): any token with
    GLOBAL count > N/k has count > N_p/k in at least one partition p
    (if c_p <= N_p/k everywhere, summing gives c <= N/k), and within
    that partition MG can decrement it at most N_p/k times, so it
    survives there. The union of partition survivor sets therefore
    contains EVERY global heavy hitter — candidates may include extras,
    never miss one. Shuffle: ≤ partitions x k candidate rows; the
    vocabulary long tail never crosses the network.
    """
    import pandas as pd

    def mg_partition(batches):
        counters: dict[str, int] = {}
        for pdf in batches:
            for tok in pdf[tok_col]:
                if tok in counters:
                    counters[tok] += 1
                elif len(counters) < k:
                    counters[tok] = 1
                else:
                    # Misra-Gries: decrement everything, evict zeros
                    for key in list(counters):
                        counters[key] -= 1
                        if counters[key] == 0:
                            del counters[key]
        if counters:
            yield pd.DataFrame({tok_col: list(counters)})

    return toks.mapInPandas(mg_partition, f"{tok_col} string").distinct()


def heavy_hitters(
    docs: DataFrame, k: int = 200, text_col: str = "text"
) -> DataFrame:
    """Deterministic heavy hitters: every token with true frequency
    > N/k, with its EXACT count — the standard two-pass pattern
    (Misra-Gries candidates -> exact rescore), r7 directive #2.

    Pass 1 (:func:`mg_candidates`) is partition-dependent bounded-state
    sketching, but it only has to be a SUPERSET of the true heavy
    hitters (guaranteed; see its docstring). Pass 2 broadcast-semi-joins
    the small candidate set back onto the token stream and counts
    exactly, then keeps only ``freq * k > N`` — so the OUTPUT is a pure
    function of the data, independent of partitioning, and
    SQL-expressible (the same move that made KMV the oracle-backed
    approximate-distinct in r6). At most ``k - 1`` rows can satisfy the
    threshold, so the result is always tiny.

    Scale: two passes over the token stream (the price of determinism);
    pass 1 shuffles ≤ partitions x k candidate rows, pass 2's hash
    aggregate is map-side-partial over ≤ |candidates| distinct keys, and
    the stream total N rides the same scan as a 1-row aggregate
    broadcast back. The exact single-pass estimate form stays available
    via ``count_min_estimates`` (overcount-bounded) when two passes are
    too dear.
    """
    toks = _tokens(docs, text_col)
    cands = mg_candidates(toks, k)
    total = toks.agg(F.count(F.lit(1)).alias("_n"))
    return (
        toks.join(F.broadcast(cands), "tok")
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("freq"))
        .crossJoin(F.broadcast(total))
        .filter(F.col("freq") * F.lit(k) > F.col("_n"))
        .select("tok", "freq")
        .orderBy(F.col("freq").desc(), F.col("tok").asc())
    )


@register(
    "heavy_hitters",
    oracle="""
    WITH tk AS (
      SELECT unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
      FROM documents
    ), tf AS (
      SELECT tok, COUNT(*) AS freq FROM tk GROUP BY tok
    ), n AS (
      SELECT COUNT(*) AS n FROM tk
    )
    SELECT tok, freq FROM tf, n
    WHERE freq * 200 > n
    ORDER BY freq DESC, tok ASC
    """,
    description="deterministic heavy hitters: every token with true "
    "frequency > N/200 with its exact count, via the two-pass "
    "Misra-Gries-candidates -> broadcast exact-rescore pattern — the "
    "candidate sketch is partition-dependent but provably a superset, "
    "so the thresholded output is a pure function of the data "
    "(oracle-backed since r7; the bounded-state single-pass estimates "
    "remain available as count_min_tokens)",
    covers=("N-text", "B4"),
)
def heavy_hitters_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return heavy_hitters(load_table(spark, sf_dir, "documents"))


def count_min_estimates(
    docs: DataFrame,
    probe_doc_ids: int = 5,
    w: int = 2048,
    d: int = 4,
    top: int = 50,
    text_col: str = "text",
) -> DataFrame:
    """Count-Min sketch token-frequency estimates — the overcount-bounded
    complement to :func:`heavy_hitters` (Misra-Gries undercounts, CMS
    overcounts; together they bracket the truth).

    The sketch is d×w COUNTERS built with plain DataFrame ops: explode
    tokens × d seeds, bucket by ``xxhash64(tok, seed) mod w``, one hash
    aggregate — map-side combine means the shuffle carries at most
    ``partitions × d × w`` counter rows, never the token stream. The
    aggregated sketch (≤ d×w rows total) broadcasts to answer point
    queries: ``est(tok) = min over seeds of counter[seed][bucket(tok)]``,
    guaranteed ``est >= true`` for every token, overcounting only by
    bucket-collision mass (~stream_len/w per seed, d-way minimized).

    The registered probe set is the distinct tokens of the first
    ``probe_doc_ids`` documents — deterministic, engine-independent.
    The xxhash64 bucketing replays bit-exactly in the DuckDB oracle
    (``_count_min_oracle``); tests additionally pin the bucket values
    against Spark and bound estimates against exact `token_frequencies`.
    """
    toks = docs.select(
        F.col("doc_id"),
        F.explode(F.split(F.trim(F.lower(F.col(text_col))), " +")).alias("tok"),
    )
    seeds = F.explode(F.sequence(F.lit(0), F.lit(d - 1))).alias("seed")
    bucket = F.pmod(F.xxhash64(F.col("tok"), F.col("seed")), F.lit(w)).alias(
        "bucket"
    )
    sketch = (
        toks.select("tok", seeds)
        .select("seed", bucket)
        .groupBy("seed", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    probes = (
        toks.filter(F.col("doc_id") < probe_doc_ids).select("tok").distinct()
    )
    return (
        probes.select("tok", seeds)
        .select("tok", "seed", bucket)
        .join(F.broadcast(sketch), ["seed", "bucket"])
        .groupBy("tok")
        .agg(F.min("cnt").alias("est_freq"))
        .orderBy(F.col("est_freq").desc(), F.col("tok").asc())
        .limit(top)
    )


def _count_min_oracle(
    probe_doc_ids: int = 5, w: int = 2048, d: int = 4, top: int = 50
) -> str:
    """DuckDB twin of ``count_min_estimates``: the exact d x w sketch.

    The CMS content is fully deterministic — counter cells are SUMS
    (associative, partitioning-independent) over
    ``pmod(xxhash64(tok, seed), w)`` buckets — so with the staged XXH64
    emulation the whole sketch, not just its estimates, replays in SQL.
    Spark's multi-argument ``xxhash64(tok, seed)`` folds left: the
    string hash of ``tok`` (seed 42) becomes the SEED of the 4-byte
    ``hashInt`` over ``seed`` — there is NO intermediate hashLong (that
    extra layer belongs only to MinHash's explicit two-call
    ``xxhash64(xxhash64(sh), k)`` form; a round-5 review caught this
    oracle inserting it, self-consistently enough to pass on the
    31-token fixture, and tests now pin the buckets themselves against
    Spark). Buckets hash DISTINCT tokens once and join back to the
    token stream; the unsigned ``& (w-1)`` equals Spark's pmod because
    w is a power of two.
    """
    assert w & (w - 1) == 0, "w must be a power of two for the & bucket"
    from ser_etl_spark.oracle_hash import (
        stages_to_ctes,
        xxh64_int_rehash_stage_cols,
        xxh64_str_stage_cols,
    )

    str_ctes, str_fin = stages_to_ctes(
        "dt", xxh64_str_stage_cols("tok", "_cb", pfx="_cxs"), "_csa"
    )
    seed_ctes, seed_fin = stages_to_ctes(
        str_fin,
        xxh64_int_rehash_stage_cols(
            "_cb", list(range(d)), out_fmt="_cs{k}", pfx="_cp", signed=False
        ),
        "_csc",
    )
    bucket_rows = "\n      UNION ALL ".join(
        f"SELECT tok, {s} AS seed, CAST(_cs{s} & {w - 1} AS BIGINT) AS bucket "
        f"FROM {seed_fin}"
        for s in range(d)
    )
    return f"""
    WITH tk AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), ' +')) AS tok
      FROM documents
    ), dt AS (
      SELECT DISTINCT tok FROM tk
    ){str_ctes}{seed_ctes}, buckets AS (
      {bucket_rows}
    ), sketch AS (
      SELECT b.seed, b.bucket, COUNT(*) AS cnt
      FROM tk t JOIN buckets b USING (tok)
      GROUP BY b.seed, b.bucket
    ), probes AS (
      SELECT DISTINCT tok FROM tk WHERE doc_id < {probe_doc_ids}
    )
    SELECT p.tok, MIN(s.cnt) AS est_freq
    FROM probes p
    JOIN buckets b USING (tok)
    JOIN sketch s ON s.seed = b.seed AND s.bucket = b.bucket
    GROUP BY p.tok
    ORDER BY est_freq DESC, p.tok ASC
    LIMIT {top}
    """


@register(
    "count_min_tokens",
    oracle=_count_min_oracle(),
    description="Count-Min sketch token-frequency estimates (d=4 x "
    "w=2048 counters, one hash aggregate, sketch broadcast for point "
    "queries) — the overcount-bounded complement to heavy_hitters: "
    "est >= true always, excess bounded by d-way-minimized collision "
    "mass. Oracle-backed since r5: counter cells are associative sums "
    "over emulated-xxhash64 buckets, so the exact sketch replays in SQL; "
    "estimates also bounded against exact token_frequencies in tests",
    covers=("N-text", "B4"),
)
def count_min_tokens_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return count_min_estimates(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — the deterministic,
# differentially-testable member of the approximate-distinct family
# ---------------------------------------------------------------------------

#: k-min set size; standard error ~ 1/sqrt(k) ≈ 6.25%
KMV_K = 256

_TWO64 = 18446744073709551616


def kmv_distinct(df: DataFrame, column: str, k: int = KMV_K) -> DataFrame:
    """Approximate distinct count via the k minimum hash values:
    ``D_hat = (k-1) * 2^64 / h_(k)`` where ``h_(k)`` is the k-th
    smallest unsigned xxhash64 over the distinct values (Bar-Yossef et
    al. 2002; the estimator behind theta sketches).

    Why this exists next to HLL++ (``approx_sketches``): HLL register
    layouts are engine-internal, so its estimates can only be
    bound-tested. The KMV estimate is a pure function of the hash
    values — with the staged XXH64 emulation the WHOLE sketch replays
    bit-exactly in SQL, making this the oracle-backed member of the
    family. Scale shape: one distinct aggregate, then a k-row
    TakeOrdered (per-partition partial top-k — the k-min set is a
    mergeable summary, like every KMV/theta sketch); the final state is
    k values regardless of data volume.
    """
    return kmv_estimate(kmv_kmin(df, column, k), k)


def kmv_kmin(df: DataFrame, column: str, k: int = KMV_K) -> DataFrame:
    """The KMV summary itself: the k smallest DISTINCT unsigned xxhash64
    values over the column, as a one-column ``hu`` DataFrame. This is
    the mergeable state — :func:`kmv_merge` combines summaries from
    different tables/partitions/days losslessly.

    Plan shape (the point of a sketch): a naive
    ``distinct().orderBy().limit(k)`` pays the COUNT-DISTINCT shuffle —
    every distinct value crosses the network before the k-min cut. Here
    each partition keeps its own k smallest distinct hashes in one
    Arrow pass (bounded O(k) numpy state, the ``heavy_hitters``
    discipline), so only ``partitions x k`` summary rows shuffle into
    the final merge. The result — the global k smallest distinct
    hashes — is identical under any partitioning (pinned by test and by
    the DuckDB oracle, which computes it the naive way).
    """
    hs = df.select(F.xxhash64(F.col(column)).alias("hs"))

    # Self-contained closure: cloudpickle ships it by value (no package
    # import needed on executors).
    def kmin_partition(batches):
        import numpy as np
        import pandas as pd
        from decimal import Decimal

        state = np.array([], dtype=np.uint64)
        for pdf in batches:
            u = pdf["hs"].to_numpy(dtype=np.int64).astype(np.uint64)
            # np.unique sorts ascending; keep the k smallest distinct
            state = np.unique(np.concatenate([state, u]))[:k]
        if len(state):
            yield pd.DataFrame({"hu": [Decimal(int(x)) for x in state]})

    partial = hs.mapInPandas(kmin_partition, "hu decimal(20,0)")
    return partial.distinct().orderBy(F.col("hu").asc()).limit(k)


def kmv_merge(kmins: list[DataFrame], k: int = KMV_K) -> DataFrame:
    """Merge KMV summaries: union the k-min sets, dedupe, keep the k
    smallest. Exactly equal to sketching the unioned inputs directly —
    every hash among the union's k smallest is among its own side's k
    smallest — which is the theorem that makes the sketch mergeable
    (pinned by test). O(sides * k) rows of state, never data-sized."""
    merged = kmins[0]
    for other in kmins[1:]:
        merged = merged.union(other)
    return merged.distinct().orderBy(F.col("hu").asc()).limit(k)


def kmv_estimate(kmin: DataFrame, k: int = KMV_K) -> DataFrame:
    """The estimator over a k-min summary (exact count below k)."""
    scale = float((k - 1) * _TWO64)  # exact: (k-1) * 2^64 is a dyadic int
    cnt = F.count(F.lit(1))
    # fewer than k distinct values: the k-min set IS the full hash set,
    # so the count is the exact answer (standard KMV degenerate case)
    est = F.when(cnt < k, cnt.cast("double")).otherwise(
        fround(F.lit(scale) / F.max("hu").cast("double"), 4)
    )
    return kmin.agg(
        F.max("hu").cast("string").alias("kth_hash"),
        est.alias("distinct_estimate"),
        F.lit(k).alias("k"),
    )


def _kmv_oracle(column: str, table: str, k: int = KMV_K) -> str:
    """DuckDB twin: the staged XXH64 chain over the distinct values
    (unsigned HUGEINT out), same order/limit/max, same one double
    division. ``kth_hash`` travels as VARCHAR — a DECIMAL/HUGEINT output
    column would be floated by the driver's pandas rendering."""
    from ser_etl_spark.oracle_hash import stages_to_ctes, xxh64_long_stage_cols

    ctes, fin = stages_to_ctes("dv", xxh64_long_stage_cols("v", "_kh"), "_ks")
    scale = float((k - 1) * _TWO64)
    return f"""
    WITH dv AS (SELECT DISTINCT {column} AS v FROM {table}){ctes},
    kmin AS (SELECT _kh FROM {fin} ORDER BY _kh ASC LIMIT {k})
    SELECT CAST(MAX(_kh) AS VARCHAR) AS kth_hash,
           CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE (CAST(floor(({scale!r} / CAST(MAX(_kh) AS DOUBLE)) * 1e4 + 0.5) AS DOUBLE) / 1e4)
           END AS distinct_estimate,
           {k} AS k
    FROM kmin
    """


@register(
    "kmv_distinct",
    oracle=_kmv_oracle("l_partkey", "lineitem"),
    description="KMV (k-minimum-values) approximate distinct count of "
    "lineitem part keys: k=256 smallest unsigned xxhash64 values over "
    "the distinct keys, estimate (k-1)*2^64/h_(k) — deterministic under "
    "any partitioning and oracle-backed through the staged XXH64 "
    "emulation (the differentially-testable complement to the "
    "engine-internal HLL++ in approx_sketches); mergeable k-min-set "
    "state, error bound ~1/sqrt(k) pinned vs the exact count in tests",
    covers=("B4",),
)
def kmv_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return kmv_distinct(load_table(spark, sf_dir, "lineitem"), "l_partkey")


#: bottom-k sample size for the deterministic percentile twin
SAMPLE_K = 1024


def _approx_sketches_twin_oracle(k: int = 256, sk: int = SAMPLE_K) -> str:
    from ser_etl_spark.operators.sampling import sql_hash_u32
    from ser_etl_spark.oracle_hash import stages_to_ctes, xxh64_long_stage_cols

    ctes, fin = stages_to_ctes("dv", xxh64_long_stage_cols("v", "_kh"), "_ks")
    scale = float((k - 1) * _TWO64)
    rk = "(coalesce(l_orderkey, -1) * 8 + coalesce(l_linenumber, 0))"
    return f"""
    WITH dv AS (SELECT DISTINCT l_orderkey AS v FROM lineitem){ctes},
    kmin AS (SELECT _kh FROM {fin} ORDER BY _kh ASC LIMIT {k}),
    est AS (SELECT CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                 ELSE (CAST(floor(({scale!r} / CAST(MAX(_kh) AS DOUBLE)) * 1e4 + 0.5) AS DOUBLE) / 1e4)
            END AS approx_orders FROM kmin),
    samp AS (SELECT l_extendedprice AS price
             FROM lineitem
             WHERE l_extendedprice IS NOT NULL
             ORDER BY {sql_hash_u32(rk)} ASC, l_extendedprice ASC
             LIMIT {sk}),
    arr AS (SELECT list_sort(list(price)) AS a, COUNT(*) AS n FROM samp)
    SELECT e.approx_orders,
           CASE WHEN n > 0 THEN a[CAST(ceil(0.5 * n) AS BIGINT)]
           END AS p50_price,
           CASE WHEN n > 0 THEN a[CAST(ceil(0.95 * n) AS BIGINT)]
           END AS p95_price,
           CASE WHEN n > 0 THEN a[CAST(ceil(0.99 * n) AS BIGINT)]
           END AS p99_price
    FROM est e, arr
    """


@register(
    "approx_sketches_twin",
    oracle=_approx_sketches_twin_oracle(),
    description="deterministic sketch-state twin of approx_sketches "
    "(r9 directive #4): KMV distinct-orderkey estimate (staged-xxhash64 "
    "k-min set, the oracle-replayable counterpart of HLL++) plus "
    "discrete p50/p95/p99 price estimates over a bottom-k-hash uniform "
    "sample — both summaries are fixed-size (256 hashes / 1024 rows) "
    "and mergeable, so the shuffle carries O(k) state at any data "
    "volume, and every output value replays bit-exactly in SQL",
    covers=("B4",),
)
def approx_sketches_twin_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same output shape as ``approx_sketches`` (distinct estimate + 3
    percentiles, one row) built ONLY from deterministic summaries:

    - ``approx_orders``: the KMV estimator over ``l_orderkey`` —
      identical machinery to :func:`kmv_distinct` (per-partition k-min
      sets merged into a global 256-value summary).
    - ``p{50,95,99}_price``: order statistics of a bottom-k-hash sample —
      the 1024 rows with the smallest ``hash_u32`` of the line's stable
      key form a uniform without-replacement sample (bottom-k sampling);
      the discrete quantile is the ``ceil(p*n)``-th smallest price in
      it. ``orderBy(hash).limit(k)`` plans as TakeOrderedAndProject
      (per-partition partial top-k, O(partitions*k) merged rows — a
      mergeable summary, never a data-sized sort), and the k-row array
      the percentiles index into is bounded by the sample size.

    NULL hygiene shared with the oracle: NULL prices never enter the
    sample, and the row key coalesces NULL key parts so the hash (and
    therefore the sample membership) is never NULL — Spark sorts NULLs
    first, DuckDB last, so a NULL sort key would diverge the sample.
    """
    from ser_etl_spark.operators.sampling import hash_u32

    li = load_table(spark, sf_dir, "lineitem")
    est = kmv_estimate(kmv_kmin(li, "l_orderkey")).select(
        F.col("distinct_estimate").alias("approx_orders")
    )
    rowkey = F.coalesce(F.col("l_orderkey"), F.lit(-1)) * F.lit(8) + F.coalesce(
        F.col("l_linenumber"), F.lit(0)
    )
    sample = (
        li.filter(F.col("l_extendedprice").isNotNull())
        .select(
            F.col("l_extendedprice").alias("price"),
            hash_u32(rowkey).alias("_h"),
        )
        .orderBy("_h", "price")
        .limit(SAMPLE_K)
    )
    arr = sample.agg(
        F.sort_array(F.collect_list("price")).alias("a"),
        F.count(F.lit(1)).alias("n"),
    )

    def pick(p: float) -> F.Column:
        idx = F.ceil(F.lit(p) * F.col("n")).cast("int")
        return F.when(F.col("n") > 0, F.element_at(F.col("a"), idx))

    pct = arr.select(
        pick(0.5).alias("p50_price"),
        pick(0.95).alias("p95_price"),
        pick(0.99).alias("p99_price"),
    )
    return est.crossJoin(pct)


def _kmv_union_oracle(k: int = KMV_K) -> str:
    """DuckDB twin of the merged-summary union estimate. The oracle
    sketches the unioned distinct values directly; the builder merges
    per-table summaries — equal by the k-min merge theorem (every hash
    among the union's k smallest is among its own side's k smallest)."""
    from ser_etl_spark.oracle_hash import stages_to_ctes, xxh64_long_stage_cols

    ctes, fin = stages_to_ctes("dv", xxh64_long_stage_cols("v", "_kh"), "_ks")
    scale = float((k - 1) * _TWO64)
    return f"""
    WITH dv AS (
      SELECT o_custkey AS v FROM orders
      UNION
      SELECT user_id AS v FROM events
    ){ctes},
    kmin AS (SELECT _kh FROM {fin} ORDER BY _kh ASC LIMIT {k})
    SELECT CAST(MAX(_kh) AS VARCHAR) AS kth_hash,
           CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE (CAST(floor(({scale!r} / CAST(MAX(_kh) AS DOUBLE)) * 1e4 + 0.5) AS DOUBLE) / 1e4)
           END AS distinct_estimate,
           {k} AS k
    FROM kmin
    """


@register(
    "kmv_union_distinct",
    oracle=_kmv_union_oracle(),
    description="mergeable-sketch set union: per-table KMV summaries of "
    "orders.o_custkey and events.user_id merged (union of k-min sets, "
    "re-take k smallest) and estimated — the builder never touches the "
    "raw union, only O(2k) summary rows, while the oracle sketches the "
    "raw union directly; their equality IS the k-min merge theorem that "
    "lets summaries roll up across tables/partitions/days at scale",
    covers=("B4",),
)
def kmv_union_distinct_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = kmv_kmin(load_table(spark, sf_dir, "orders"), "o_custkey")
    b = kmv_kmin(load_table(spark, sf_dir, "events"), "user_id")
    return kmv_estimate(kmv_merge([a, b]))


def kmv_overlap(
    a_kmin: DataFrame, b_kmin: DataFrame, k: int = KMV_K
) -> DataFrame:
    """Set-OVERLAP estimate from two KMV summaries (the theta-sketch
    intersection pattern): take the union's k smallest hashes ``U``,
    count how many are members of BOTH input summaries, and scale —
    ``est_intersection = (|U ∩ A ∩ B| / |U|) * est_distinct(U)``.

    Why it matters: cross-table overlap ("how many customers also appear
    in the event stream?") is an exact COUNT(DISTINCT) over a JOIN at
    100 TB — two data-sized shuffles. Here each side is summarized
    independently (mergeable k-min state, O(k) rows), the estimate
    composes from summaries alone, and — because every input is a pure
    function of the hash values — the WHOLE estimator replays in SQL:
    the oracle-backed member of the sketch-intersection family, like
    KMV itself vs HLL. Membership tests are exact semi-joins over k-row
    frames; everything after the two per-side sketches is O(k).

    Standard error grows as overlap shrinks (ρ·k samples) — the usual
    theta-sketch caveat; the fixture's ~50% overlap sits comfortably.
    """
    # Provenance flags REPLACE the merge + two semi-joins: a hash in the
    # union's k-min set is a member of side A exactly when it arrived
    # from a_kmin's k-min rows, so tagging each side before the
    # union-dedup-cut carries both memberships through — each sketch
    # (and hence each underlying table scan) is consumed ONCE, where the
    # r9 plan re-derived both sketches for the semi-join probes (the
    # double-scan class; plan-gated single-scan now). Everything after
    # the per-side sketches is one O(k) aggregate.
    ua = a_kmin.select(
        "hu", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    ub = b_kmin.select(
        "hu", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    u = (
        ua.unionByName(ub)
        .groupBy("hu")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
        .orderBy(F.col("hu").asc())
        .limit(k)
    )
    scale = float((k - 1) * _TWO64)
    ucnt = F.count(F.lit(1))
    est_union = F.when(ucnt < k, ucnt.cast("double")).otherwise(
        fround(F.lit(scale) / F.max("hu").cast("double"), 4)
    )
    stats = u.agg(
        ucnt.alias("u_size"),
        est_union.alias("est_union"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
    )
    return stats.select(
        F.coalesce(F.col("n_both"), F.lit(0)).cast("long").alias("n_both"),
        F.col("u_size").cast("long").alias("u_size"),
        # nullif: an EMPTY union (no inputs at all) has no defined
        # overlap ratio — NULL estimate, and no ANSI divide-by-zero
        # fround: n_both/u_size is a counts ratio — tie-reachable
        # at the 5th decimal (r10 round-half-tie audit).
        fround(
            F.coalesce(F.col("n_both"), F.lit(0)).cast("double")
            / F.expr("nullif(CAST(u_size AS DOUBLE), 0.0D)")
            * F.col("est_union"),
            4,
        ).alias("overlap_estimate"),
    )


def _kmv_overlap_oracle(k: int = KMV_K) -> str:
    """DuckDB twin: both per-side k-min sets from the staged XXH64
    chain, union re-cut to k, exact membership via IN, the same
    below-k-exact union estimate and one rounded double expression."""
    from ser_etl_spark.oracle_hash import stages_to_ctes, xxh64_long_stage_cols

    a_ctes, a_fin = stages_to_ctes(
        "dva", xxh64_long_stage_cols("v", "_kh", pfx="_kxa"), "_ksa"
    )
    b_ctes, b_fin = stages_to_ctes(
        "dvb", xxh64_long_stage_cols("v", "_kh", pfx="_kxb"), "_ksb"
    )
    scale = float((k - 1) * _TWO64)
    return f"""
    WITH dva AS (SELECT DISTINCT o_custkey AS v FROM orders){a_ctes},
    dvb AS (SELECT DISTINCT user_id AS v FROM events){b_ctes},
    ka AS (SELECT _kh FROM {a_fin} ORDER BY _kh ASC LIMIT {k}),
    kb AS (SELECT _kh FROM {b_fin} ORDER BY _kh ASC LIMIT {k}),
    u AS (
      SELECT _kh FROM (SELECT _kh FROM ka UNION SELECT _kh FROM kb)
      ORDER BY _kh ASC LIMIT {k}
    ),
    stats AS (
      SELECT COUNT(*) AS u_size,
             CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE (CAST(floor(({scale!r} / CAST(MAX(_kh) AS DOUBLE)) * 1e4 + 0.5) AS DOUBLE) / 1e4)
             END AS est_union
      FROM u
    ),
    hits AS (
      SELECT COUNT(*) AS n_both FROM u
      WHERE _kh IN (SELECT _kh FROM ka) AND _kh IN (SELECT _kh FROM kb)
    )
    SELECT CAST(n_both AS BIGINT) AS n_both,
           CAST(u_size AS BIGINT) AS u_size,
           (CAST(floor((CAST(n_both AS DOUBLE)
                 / nullif(CAST(u_size AS DOUBLE), 0.0)
                 * est_union) * 1e4 + 0.5) AS DOUBLE) / 1e4)
             AS overlap_estimate
    FROM stats, hits
    """


@register(
    "kmv_overlap",
    oracle=_kmv_overlap_oracle(),
    description="mergeable-sketch set INTERSECTION: overlap of "
    "orders.o_custkey and events.user_id estimated purely from the two "
    "k-min summaries (theta-sketch pattern: union's k smallest, exact "
    "membership in both sides, scale by the union estimate) — the "
    "100 TB form of COUNT(DISTINCT) over a join, composed from O(k) "
    "summary state with no data-sized join anywhere; deterministic and "
    "oracle-backed like the rest of the KMV family",
    covers=("B4", "B11"),
)
def kmv_overlap_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = kmv_kmin(load_table(spark, sf_dir, "orders"), "o_custkey")
    b = kmv_kmin(load_table(spark, sf_dir, "events"), "user_id")
    return kmv_overlap(a, b)


# ---------------------------------------------------------------------------
# grouped KMV: per-source distinct estimates (r9)
# ---------------------------------------------------------------------------

#: smaller k for the grouped sketch (state = k per GROUP)
KMV_GROUP_K = 64


def kmv_distinct_by_source(
    docs: DataFrame, k: int = KMV_GROUP_K
) -> DataFrame:
    """Per-source approximate distinct TOKEN counts — the grouped form
    of :func:`kmv_distinct`, replacing a per-group exact COUNT(DISTINCT)
    whose shuffle carries every distinct value: per (source, token) the
    unsigned xxhash64, per source the k smallest (a ranked window over
    the group's distinct hashes), then the (k-1)*2^64/h_(k) estimate.
    State is k values PER GROUP regardless of vocabulary size, and the
    summary stays mergeable across syncs.

    Exact below k (the standard degenerate case); ties cannot occur in
    the rank (hashes are distinct post-DISTINCT). Output includes
    kth_hash as VARCHAR (a DECIMAL output column would float through
    the driver's pandas rendering)."""
    from pyspark.sql.window import Window

    toks = docs.select(
        "source",
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias(
            "tok"
        ),
    ).distinct()
    hashed = toks.select(
        "source",
        F.expr(
            f"CAST(xxhash64(tok) AS DECIMAL(20,0)) + "
            f"CASE WHEN xxhash64(tok) < 0 THEN CAST({_TWO64} AS "
            f"DECIMAL(21,0)) ELSE 0 END"
        ).alias("hu"),
    ).distinct()
    w = Window.partitionBy("source").orderBy(F.col("hu").asc())
    kmin = hashed.select(
        "source", "hu", F.row_number().over(w).alias("rn")
    ).filter(F.col("rn") <= k)
    scale = float((k - 1) * _TWO64)
    cnt = F.count(F.lit(1))
    est = F.when(cnt < k, cnt.cast("double")).otherwise(
        fround(F.lit(scale) / F.max("hu").cast("double"), 4)
    )
    return (
        kmin.groupBy("source")
        .agg(
            F.max("hu").cast("string").alias("kth_hash"),
            est.alias("distinct_estimate"),
            F.lit(k).alias("k"),
        )
        .orderBy("source")
    )


def _kmv_by_source_oracle(k: int = KMV_GROUP_K) -> str:
    from ser_etl_spark.oracle_hash import stages_to_ctes, xxh64_str_stage_cols

    ctes, fin = stages_to_ctes("dv", xxh64_str_stage_cols("v", "_kh"), "_ks")
    scale = float((k - 1) * _TWO64)
    return f"""
    WITH dv AS (
      SELECT DISTINCT source,
             unnest(string_split_regex(trim(lower(text)), ' +')) AS v
      FROM documents
    ){ctes},
    kmin AS (
      SELECT source, _kh,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY _kh ASC)
               AS rn
      FROM (SELECT DISTINCT source, _kh FROM {fin})
    )
    SELECT source,
           CAST(MAX(_kh) AS VARCHAR) AS kth_hash,
           CASE WHEN COUNT(*) < {k} THEN CAST(COUNT(*) AS DOUBLE)
                ELSE (CAST(floor(({scale!r} / CAST(MAX(_kh) AS DOUBLE)) * 1e4 + 0.5) AS DOUBLE) / 1e4)
           END AS distinct_estimate,
           {k} AS k
    FROM kmin WHERE rn <= {k}
    GROUP BY source ORDER BY source
    """


@register(
    "kmv_distinct_by_source",
    oracle=_kmv_by_source_oracle(),
    description="grouped KMV sketch: per-source distinct-token estimate "
    "from each group's 64 smallest unsigned xxhash64 values (k state "
    "per group, mergeable — replaces the shuffle-every-value grouped "
    "COUNT DISTINCT), exact below k, staged-hash oracle",
    covers=("B4", "B5", "N-text"),
)
def kmv_distinct_by_source_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return kmv_distinct_by_source(load_table(spark, sf_dir, "documents"))
