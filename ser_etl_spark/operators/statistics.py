"""Statistical aggregates: variance / stddev / correlation, cross-engine
deterministic.

Extends the reference's scalar-aggregate surface (B4 — SUM/AVG/MIN/MAX/
COUNT, ``/root/reference/shared/schemas/query_whitelist.json:21-26``) with
second-moment statistics, the next thing an analytics user reaches for.

Built-in ``stddev``/``corr`` are order-dependent in both engines (their
running-merge accumulators round differently under different partition
orders), so a value-hash oracle comparison would flake. Instead the
moments are assembled from *exact decimal sums* (see
:mod:`ser_etl_spark.functions.numeric`): n, Σx, Σx², Σy, Σy², Σxy are
bit-exact on any engine at any parallelism, and the final double
arithmetic is the same expression tree on both sides — so even the
round-off is identical. Textbook caveat (catastrophic cancellation of
E[x²]-E[x]²) does not apply: the sums are exact decimals, cancellation
happens once in double space, identically on both engines.

Scale design: one partial+final hash aggregate over six decimal sums —
same shuffle profile as any GROUP BY; no second pass, no window, no
collect.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.functions.broadcast import broadcast_if_dim
from ser_etl_spark.functions.numeric import (
    dsum,
    dsum_prod,
    fround,
    sql_dsum,
    sql_dsum_prod,
    sql_fround,
)
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def moment_columns(x: str, y: str, scale: int = 2) -> list[Column]:
    """The six exact sufficient statistics for mean/var/corr of (x, y)."""
    return [
        F.count(F.col(x)).alias("n"),
        dsum(x, scale).alias("sx"),
        dsum_prod(x, x, scale).alias("sxx"),
        dsum(y, scale).alias("sy"),
        dsum_prod(y, y, scale).alias("syy"),
        dsum_prod(x, y, scale).alias("sxy"),
    ]


def derive_stats(df: DataFrame) -> DataFrame:
    """mean/var_samp/stddev_samp/corr from the sufficient statistics.

    The expressions mirror ``_SQL_STATS`` token-for-token so both engines
    run the identical double-precision expression tree.
    """
    n = F.col("n")
    # nullif on the Bessel denominator: sample moments of a single row
    # are undefined — NULL, matching DuckDB's var_samp (and its float
    # division-by-zero). Under Spark 4's ANSI default a bare (n-1)
    # divide THROWS on n=1 (caught by the r6 one-row-corpus probe).
    nm1 = F.expr("nullif(n - 1, 0)")
    mean_x = F.col("sx") / n
    var_x = (F.col("sxx") - F.col("sx") * F.col("sx") / n) / nm1
    cov_xy = (F.col("sxy") - F.col("sx") * F.col("sy") / n) / nm1
    var_y = (F.col("syy") - F.col("sy") * F.col("sy") / n) / nm1
    # Round the derived moments to 9 decimals: the sufficient statistics
    # are bit-exact, but the final double expression differs by ~2 ulp
    # across engines (FMA contraction in native codegen fuses mul+sub
    # differently than the JVM) — rounding collapses that last-bit noise
    # while the sums pin the first ~15 significant digits. fround (not
    # round): mean_x is an integer ratio sx/n whose decimal expansion can
    # terminate exactly on a 10th-place half (e.g. odd-cents sum over
    # n=256), where Spark's string-HALF_UP and DuckDB's value round
    # diverge — the r10 round-half-tie audit.
    return df.select(
        *[c for c in df.columns if c not in {"sx", "sxx", "sy", "syy", "sxy"}],
        fround(mean_x, 9).alias("mean_qty"),
        fround(var_x, 9).alias("var_qty"),
        fround(F.sqrt(var_x), 9).alias("stddev_qty"),
        fround(cov_xy / F.sqrt(var_x * var_y), 9).alias("corr_qty_price"),
    )


_SQL_STATS = f"""
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(l_quantity) AS n,
             {sql_dsum('l_quantity')} AS sx,
             {sql_dsum_prod('l_quantity', 'l_quantity')} AS sxx,
             {sql_dsum('l_extendedprice')} AS sy,
             {sql_dsum_prod('l_extendedprice', 'l_extendedprice')} AS syy,
             {sql_dsum_prod('l_quantity', 'l_extendedprice')} AS sxy
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           {sql_fround('sx / n', 9)} AS mean_qty,
           {sql_fround('(sxx - sx * sx / n) / (n - 1)', 9)} AS var_qty,
           {sql_fround('sqrt((sxx - sx * sx / n) / (n - 1))', 9)}
             AS stddev_qty,
           {sql_fround('''((sxy - sx * sy / n) / (n - 1))
             / sqrt(((sxx - sx * sx / n) / (n - 1))
                    * ((syy - sy * sy / n) / (n - 1)))''', 9)}
             AS corr_qty_price
    FROM sums
    ORDER BY l_returnflag
"""


@register(
    "stats_moments",
    oracle=_SQL_STATS,
    description="B4 extension: per-returnflag mean/variance/stddev of "
    "quantity and corr(quantity, extendedprice) from exact decimal "
    "sufficient statistics — deterministic under any partitioning, one "
    "partial+final aggregate",
    covers=("B4", "B5"),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    sums = li.groupBy("l_returnflag").agg(
        *moment_columns("l_quantity", "l_extendedprice")
    )
    return derive_stats(sums).orderBy("l_returnflag")


def value_histogram(
    events: DataFrame, width: float = 25.0, n_buckets: int = 20
) -> DataFrame:
    """Equi-width histogram of ``value``: one hash aggregate on the
    bucket id (integer floor division — bit-identical across engines,
    unlike float-boundary bucketing), overflow clamped into the last
    bucket. The fixed-cardinality output (``n_buckets`` rows) makes
    this a partial-agg-friendly single shuffle at any input size.
    """
    bucket = F.least(
        F.floor(F.col("value") / F.lit(width)).cast("int"),
        F.lit(n_buckets - 1),
    )
    return (
        events.select(bucket.alias("bucket"), "value")
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum("value", 2).alias("total_value"),
        )
        .select(
            "bucket",
            (F.col("bucket").cast("double") * width).alias("lo"),
            ((F.col("bucket") + 1).cast("double") * width).alias("hi"),
            "n",
            "total_value",
        )
        .orderBy("bucket")
    )


@register(
    "value_histogram",
    oracle=f"""
    SELECT bucket,
           CAST(bucket AS DOUBLE) * 25.0 AS lo,
           CAST(bucket + 1 AS DOUBLE) * 25.0 AS hi,
           COUNT(*) AS n,
           {sql_dsum('value', 2)} AS total_value
    FROM (
      SELECT least(CAST(floor(value / 25.0) AS INT), 19) AS bucket, value
      FROM events)
    GROUP BY bucket
    ORDER BY bucket
    """,
    description="equi-width histogram of event values: integer bucket "
    "math (engine-exact), fixed-cardinality hash aggregate, overflow "
    "clamped to the last bucket",
    covers=("B5", "X-window"),
)
def value_histogram_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return value_histogram(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# robust outlier detection: exact integer median-absolute-deviation
# ---------------------------------------------------------------------------


def mad_outliers(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group robust outliers by the median-absolute-deviation rule,
    in EXACT integer arithmetic end to end — the data-quality pass that
    flags corrupted numeric fields (price glitches, unit mix-ups)
    without the mean/stddev rule's masking problem (one extreme value
    inflates the stddev and hides the rest).

    Every quantity is a scaled integer so no float comparison can
    diverge cross-engine: prices become cents via
    ``floor(x * 100 + 0.5)``; the group median arrives as ``med2`` = the
    sum of the 1-or-2 central order statistics (= 2 x median);
    per-row deviation as ``dev2 = |2 * cents - med2|`` (= 2 x |dev|);
    the MAD as ``mad2`` = the central-sum of the ``dev2`` ranking
    (= 4 x MAD). The classic |x - med| > 3 * MAD flag is then the pure
    integer predicate ``2 * dev2 > 3 * mad2``. A >=half-constant group
    has MAD 0 and flags every deviating row — the rule's documented
    degeneracy, identical on both engines.

    Scale shape: one shuffle on the group key, then two in-partition
    sorted windows (value ranking, deviation ranking) and two
    partition-wide sums — no joins, no collect, group cardinality
    unbounded. The exact in-group sort is the honest cost of exact
    medians; the sketch-based alternative for wider groups is the
    ``approx_sketches`` KLL family.
    """
    from pyspark.sql.window import Window

    cents = F.floor(F.col(value_col) * 100.0 + 0.5).cast("bigint")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("rid"),
        cents.alias("cents"),
    ).filter(F.col("cents").isNotNull())
    wg = Window.partitionBy("grp")
    wv = Window.partitionBy("grp").orderBy(
        F.col("cents").asc(), F.col("rid").asc()
    )
    lo = F.floor((F.col("_n") + 1) / 2)
    hi = F.floor((F.col("_n") + 2) / 2)
    central = ((F.col("_rn") == lo).cast("bigint") +
               (F.col("_rn") == hi).cast("bigint"))
    s1 = base.withColumn("_rn", F.row_number().over(wv).cast("bigint")) \
             .withColumn("_n", F.count(F.lit(1)).over(wg).cast("bigint"))
    s2 = s1.withColumn("med2", F.sum(F.col("cents") * central).over(wg)) \
           .withColumn("dev2", F.abs(F.lit(2) * F.col("cents") - F.col("med2")))
    wd = Window.partitionBy("grp").orderBy(
        F.col("dev2").asc(), F.col("rid").asc()
    )
    s3 = s2.withColumn("_rd", F.row_number().over(wd).cast("bigint"))
    central_d = ((F.col("_rd") == lo).cast("bigint") +
                 (F.col("_rd") == hi).cast("bigint"))
    s4 = s3.withColumn("mad2", F.sum(F.col("dev2") * central_d).over(wg))
    return (
        s4.filter(F.lit(2) * F.col("dev2") > F.lit(3) * F.col("mad2"))
        .select(
            F.col("grp").alias(group_col),
            F.col("rid").alias(id_col),
            F.col("cents"),
            F.col("med2"),
            F.col("dev2"),
            F.col("mad2"),
        )
        .orderBy(group_col, id_col)
    )


@register(
    "value_outliers_mad",
    oracle="""
    WITH base AS (
      SELECT event_type AS grp, event_id AS rid,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE floor(value * 100.0 + 0.5) IS NOT NULL
    ), s1 AS (
      SELECT grp, rid, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp
                                     ORDER BY cents ASC, rid ASC) AS BIGINT)
               AS rn,
             CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM base
    ), s2 AS (
      SELECT *,
             CAST(SUM(cents * (CAST(rn = (n + 1) // 2 AS BIGINT)
                               + CAST(rn = (n + 2) // 2 AS BIGINT)))
                  OVER (PARTITION BY grp) AS BIGINT) AS med2
      FROM s1
    ), s3 AS (
      SELECT *, abs(2 * cents - med2) AS dev2,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp
                                     ORDER BY abs(2 * cents - med2) ASC,
                                              rid ASC) AS BIGINT) AS rd
      FROM s2
    ), s4 AS (
      SELECT *,
             CAST(SUM(dev2 * (CAST(rd = (n + 1) // 2 AS BIGINT)
                              + CAST(rd = (n + 2) // 2 AS BIGINT)))
                  OVER (PARTITION BY grp) AS BIGINT) AS mad2
      FROM s3
    )
    SELECT grp AS event_type, rid AS event_id, cents, med2, dev2, mad2
    FROM s4 WHERE 2 * dev2 > 3 * mad2
    ORDER BY event_type, event_id
    """,
    description="robust outlier detection on event values per type: exact "
    "integer MAD rule (cents via floor(x*100+0.5), median as the 2x "
    "central-sum order statistic, MAD as the 4x central-sum of "
    "deviations, flag = pure integer predicate 2*dev2 > 3*mad2) — one "
    "shuffle on the group key, two in-partition sorted windows, no "
    "joins, no floats anywhere a comparison happens",
    covers=("X-window", "N-quality"),
)
def value_outliers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mad_outliers(
        load_table(spark, sf_dir, "events"),
        value_col="value",
        group_col="event_type",
        id_col="event_id",
    )


# ---------------------------------------------------------------------------
# winsorized robust aggregates: exact rank-based p05/p95 clipping
# ---------------------------------------------------------------------------


def winsorized_stats(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    lo_pct: int = 5,
    hi_pct: int = 95,
) -> DataFrame:
    """Per-group winsorized mean — the robust-aggregation counterpart of
    ``mad_outliers``: instead of FLAGGING extreme rows, clamp every value
    into the group's exact [p5, p95] order statistics and average the
    clamped series (the standard defense when a mean must survive
    heavy-tailed feeds — price glitches, bot bursts — without dropping
    rows).

    Exactness discipline (the MAD pattern): values become cents via
    ``floor(x * 100 + 0.5)``; the clip bounds are DISCRETE percentiles —
    the value at rank ``ceil(q * n)`` in (cents, id) order, a real data
    point selected by pure integer rank math (no interpolation, no
    float comparisons, deterministic under ties via the id tiebreak);
    clamping and the clamped sum stay in BIGINT. The means are emitted
    as exact-integer BASIS POINTS (1e-4 dollars) rounded
    half-away-from-zero on the scaled integer — ``F.round`` on a
    cents/n double is tie-reachable (an exact decimal half at the 4th
    place rounds differently under Spark's HALF_UP, Python's banker's
    round, and DuckDB's double round; hypothesis found sum=-3159 over
    n=8 as a live counterexample). Positive-operand integer division
    makes Spark ``div`` and DuckDB ``//`` agree, so the oracle replays
    bit-exactly. The only remaining doubles are p05/p95, computed from
    the same BIGINT cents on both engines.

    Scale shape: one shuffle on the group key, one in-partition sorted
    window (rank + the two bound picks as partition-wide conditional
    sums), then a final hash aggregate that reuses the same
    partitioning — no joins, no second shuffle, group cardinality
    unbounded.
    """
    from pyspark.sql.window import Window

    cents = F.floor(F.col(value_col) * 100.0 + 0.5).cast("bigint")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(id_col).alias("rid"),
        cents.alias("cents"),
    ).filter(F.col("cents").isNotNull())
    wg = Window.partitionBy("grp")
    wv = Window.partitionBy("grp").orderBy(
        F.col("cents").asc(), F.col("rid").asc()
    )
    lo_rank = F.floor((F.col("_n") * lo_pct + 99) / 100)
    hi_rank = F.floor((F.col("_n") * hi_pct + 99) / 100)
    s1 = base.withColumn("_rn", F.row_number().over(wv).cast("bigint")) \
             .withColumn("_n", F.count(F.lit(1)).over(wg).cast("bigint"))
    s2 = (
        s1.withColumn(
            "p05c",
            F.sum(F.col("cents") * (F.col("_rn") == lo_rank).cast("bigint"))
            .over(wg),
        )
        .withColumn(
            "p95c",
            F.sum(F.col("cents") * (F.col("_rn") == hi_rank).cast("bigint"))
            .over(wg),
        )
        .withColumn(
            "wcents",
            F.least(F.greatest(F.col("cents"), F.col("p05c")), F.col("p95c")),
        )
    )
    return (
        s2.groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.max("p05c").alias("p05c"),
            F.max("p95c").alias("p95c"),
            F.sum("cents").alias("rawc"),
            F.sum("wcents").alias("winc"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            (F.col("p05c").cast("double") / 100.0).alias("p05"),
            (F.col("p95c").cast("double") / 100.0).alias("p95"),
            # mean in 1e-4-dollar basis points, half-away-from-zero on
            # the scaled integer: sign(c)*((|c|*100*2 + n) div (2*n)).
            F.expr(
                "(CASE WHEN rawc < 0 THEN -1 ELSE 1 END)"
                " * ((abs(rawc) * 100 * 2 + n) div (2 * n))"
            ).cast("bigint").alias("raw_mean_bp"),
            F.expr(
                "(CASE WHEN winc < 0 THEN -1 ELSE 1 END)"
                " * ((abs(winc) * 100 * 2 + n) div (2 * n))"
            ).cast("bigint").alias("wins_mean_bp"),
        )
        .orderBy(group_col)
    )


@register(
    "winsorized_stats",
    oracle="""
    WITH base AS (
      SELECT event_type AS grp, event_id AS rid,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE floor(value * 100.0 + 0.5) IS NOT NULL
    ), s1 AS (
      SELECT grp, rid, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY grp
                                     ORDER BY cents ASC, rid ASC) AS BIGINT)
               AS rn,
             CAST(COUNT(*) OVER (PARTITION BY grp) AS BIGINT) AS n
      FROM base
    ), s2 AS (
      SELECT *,
             CAST(SUM(cents * CAST(rn = (n * 5 + 99) // 100 AS BIGINT))
                  OVER (PARTITION BY grp) AS BIGINT) AS p05c,
             CAST(SUM(cents * CAST(rn = (n * 95 + 99) // 100 AS BIGINT))
                  OVER (PARTITION BY grp) AS BIGINT) AS p95c
      FROM s1
    )
    SELECT grp AS event_type, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MAX(p05c) AS DOUBLE) / 100.0 AS p05,
           CAST(MAX(p95c) AS DOUBLE) / 100.0 AS p95,
           CAST((CASE WHEN SUM(cents) < 0 THEN -1 ELSE 1 END)
                * ((abs(SUM(cents)) * 100 * 2 + MAX(n))
                   // (2 * MAX(n))) AS BIGINT) AS raw_mean_bp,
           CAST((CASE WHEN SUM(least(greatest(cents, p05c), p95c)) < 0
                      THEN -1 ELSE 1 END)
                * ((abs(SUM(least(greatest(cents, p05c), p95c))) * 100 * 2
                    + MAX(n))
                   // (2 * MAX(n))) AS BIGINT) AS wins_mean_bp
    FROM s2 GROUP BY grp ORDER BY grp
    """,
    description="per-type winsorized mean: exact discrete p5/p95 order "
    "statistics (rank = ceil(q*n), id tiebreak — no interpolation), "
    "BIGINT clamp-and-sum, means as exact-integer basis points with "
    "half-away-from-zero rounding (no tie-reachable double round); one "
    "group-key shuffle shared by the sorted window and the final "
    "aggregate",
    covers=("X-window", "N-quality", "B4"),
)
def winsorized_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winsorized_stats(
        load_table(spark, sf_dir, "events"),
        value_col="value",
        group_col="event_type",
        id_col="event_id",
    )


# ---------------------------------------------------------------------------
# concentration metrics: exact Gini coefficient without a global row sort
# ---------------------------------------------------------------------------


def spend_gini(orders: DataFrame) -> DataFrame:
    """Exact Gini coefficient of per-customer order spend — the
    concentration/inequality readout (0 = every customer spends the
    same, →1 = one whale) that monitors corpus/source skew in the same
    way it monitors revenue skew.

    The textbook formula needs every row's GLOBAL rank —
    ``G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx)`` over values sorted
    ascending — which naively is a single-task global sort. The scale
    trick: ranks of TIED values form a contiguous run, so after
    collapsing to DISTINCT spend values (one hash aggregate) the rank
    sum of each run is the arithmetic series
    ``cnt·cum_before + cnt·(cnt+1)/2``, making
    ``Σᵢ i·xᵢ = Σ_v v · rank_sum(v)`` computable from a window over
    the distinct-value series only — |distinct values| rows, bounded by
    the value domain, not the customer count. All terms accumulate in
    decimal(38,0)/HUGEINT over integer cents; the single double is the
    final ratio (round 6).
    """
    from pyspark.sql import Window

    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    spend = (
        orders.select(F.col("o_custkey").alias("cust"), cents.alias("c"))
        .filter(F.col("c").isNotNull())
        .groupBy("cust")
        .agg(F.sum("c").alias("spend"))
    )
    vals = spend.groupBy("spend").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("spend").rowsBetween(Window.unboundedPreceding, -1)
    staged = vals.select(
        "spend",
        "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("cumn"),
    )
    sd = F.col("spend").cast("decimal(19,0)")
    cntd = F.col("cnt").cast("decimal(19,0)")
    cumd = F.col("cumn").cast("decimal(19,0)")
    # 2x the run's rank sum -- the /2 of the arithmetic series is folded
    # into the numerator's 2x factor so NO division (Spark decimal '/'
    # rescales; DuckDB integer '/' floats) ever touches an exact term
    rank_sum2 = F.lit(2).cast("decimal(19,0)") * cntd * cumd \
        + cntd * (cntd + F.lit(1))
    agg = staged.agg(
        F.sum(cntd).alias("n"),
        F.sum(sd * cntd).alias("sx"),
        F.sum(sd * rank_sum2).alias("srx2"),
    )
    num = F.col("srx2") - (F.col("n") + F.lit(1)) * F.col("sx")
    den = F.col("n") * F.col("sx")
    return agg.select(
        # empty input: the global aggregate still emits one row with
        # NULL sums — pin the counts to 0 so the BIGINT columns never
        # carry NULL (driver pandas float seam); gini itself stays NULL
        F.coalesce(F.col("n").cast("long"), F.lit(0)).alias("n_customers"),
        F.coalesce(F.col("sx").cast("long"), F.lit(0)).alias("total_cents"),
        # fround: num/den is an integer ratio (exact decimal cents/counts)
        # whose expansion can land on a 7th-place half — tie-safe floor
        # rounding instead of round(double) (r10 audit).
        fround(
            num.cast("double")
            / F.when(den != F.lit(0).cast("decimal(38,0)"), den.cast("double")),
            6,
        ).alias("gini"),
    )


@register(
    "spend_gini",
    oracle="""
    WITH spend AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS spend
      FROM orders
      WHERE floor(o_totalprice * 100.0 + 0.5) IS NOT NULL
      GROUP BY o_custkey
    ), vals AS (
      SELECT spend, COUNT(*) AS cnt FROM spend GROUP BY spend
    ), staged AS (
      SELECT spend, cnt,
             COALESCE(SUM(cnt) OVER (
               ORDER BY spend
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumn
      FROM vals
    ), agg AS (
      SELECT SUM(CAST(cnt AS HUGEINT)) AS n,
             SUM(CAST(spend AS HUGEINT) * cnt) AS sx,
             SUM(CAST(spend AS HUGEINT)
                 * (2 * CAST(cnt AS HUGEINT) * cumn
                    + CAST(cnt AS HUGEINT) * (cnt + 1))) AS srx2
      FROM staged
    )
    SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n_customers,
           CAST(COALESCE(sx, 0) AS BIGINT) AS total_cents,
           (CAST(floor((CAST(srx2 - (n+1)*sx AS DOUBLE)
                 / nullif(CAST(n*sx AS DOUBLE), 0.0)) * 1e6 + 0.5)
                 AS DOUBLE) / 1e6) AS gini
    FROM agg
    """,
    description="exact Gini coefficient of customer spend without a "
    "global row sort: tied ranks collapse to arithmetic series over "
    "DISTINCT spend values, so the only ordered pass is a window over "
    "the distinct-value series; all rank/value sums exact in "
    "decimal(38,0)/HUGEINT cents, one final double division",
    covers=("B4", "X-window"),
)
def spend_gini_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spend_gini(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# correlation matrix: one-pass pairwise Pearson over the measure columns
# ---------------------------------------------------------------------------

#: (short name, source column) for the lineitem measure set.
_CORR_MEASURES: tuple[tuple[str, str], ...] = (
    ("qty", "l_quantity"),
    ("price", "l_extendedprice"),
    ("disc", "l_discount"),
    ("tax", "l_tax"),
)


def _corr_pairs() -> list[tuple[str, str]]:
    names = [n for n, _ in _CORR_MEASURES]
    return [(a, b) for i, a in enumerate(names) for b in names[i + 1:]]


def corr_matrix(lineitem: DataFrame) -> DataFrame:
    """Pairwise Pearson correlation of the lineitem measure columns
    (quantity, price, discount, tax) — the multivariate profiling pass
    that catches copied/derived columns and broken feeds (a measure
    suddenly correlating 1.0 with another is usually a join bug).

    ONE aggregate pass computes all 15 sufficient statistics (count,
    4 sums, 4 sums of squares, 6 cross sums) over 1e-2-quantized BIGINT
    measures accumulating in decimal(38,0)/HUGEINT — rows where any
    measure is NULL are excluded so every pair shares one n. The 6
    Pearson values are then pure expressions over the single-row
    aggregate (one double division+sqrt each, round 6), emitted via
    ``stack`` — no second scan, no per-pair job. All SQL is generated
    from one measure list (the >20-looped-Columns py4j rule).
    """
    qexprs = [
        f"CAST(floor({src} * 100.0 + 0.5) AS BIGINT) AS q_{n}"
        for n, src in _CORR_MEASURES
    ]
    notnull = " AND ".join(f"q_{n} IS NOT NULL" for n, _ in _CORR_MEASURES)
    base = lineitem.selectExpr(*qexprs).filter(notnull)
    aggs = [F.count(F.lit(1)).alias("n")]
    for n, _ in _CORR_MEASURES:
        aggs.append(
            F.expr(f"SUM(CAST(q_{n} AS DECIMAL(19,0)))").alias(f"s_{n}")
        )
        aggs.append(
            F.expr(
                f"SUM(CAST(q_{n} AS DECIMAL(19,0)) * CAST(q_{n} AS"
                f" DECIMAL(19,0)))"
            ).alias(f"ss_{n}")
        )
    for a, b in _corr_pairs():
        aggs.append(
            F.expr(
                f"SUM(CAST(q_{a} AS DECIMAL(19,0)) * CAST(q_{b} AS"
                f" DECIMAL(19,0)))"
            ).alias(f"sp_{a}_{b}")
        )
    agg = base.agg(*aggs)

    def corr_sql(a: str, b: str) -> str:
        nd = "CAST(n AS DECIMAL(20,0))"
        num = f"({nd} * sp_{a}_{b} - s_{a} * s_{b})"
        dena = f"({nd} * ss_{a} - s_{a} * s_{a})"
        denb = f"({nd} * ss_{b} - s_{b} * s_{b})"
        # sql_fround, not round(double): the operands are exact integer
        # moments, so a perfect-square denominator makes the quotient an
        # integer ratio that can terminate on a 7th-place decimal half
        # (r10 round-half-tie audit); the floor form is valid in both
        # Spark SQL and DuckDB and bit-identical on each.
        return sql_fround(
            f"CAST({num} AS DOUBLE) / nullif(sqrt(CAST({dena} AS"
            f" DOUBLE) * CAST({denb} AS DOUBLE)), 0.0D)",
            6,
        )

    parts = ", ".join(
        f"'{a}~{b}', {corr_sql(a, b)}" for a, b in _corr_pairs()
    )
    return agg.selectExpr(
        "n", f"stack({len(_corr_pairs())}, {parts}) AS (pair, corr)"
    ).select("pair", "n", "corr").orderBy("pair")


def _corr_matrix_oracle() -> str:
    qcols = ",\n             ".join(
        f"CAST(floor({src} * 100.0 + 0.5) AS BIGINT) AS q_{n}"
        for n, src in _CORR_MEASURES
    )
    notnull = " AND ".join(f"q_{n} IS NOT NULL" for n, _ in _CORR_MEASURES)
    sums = []
    for n, _ in _CORR_MEASURES:
        sums.append(f"SUM(CAST(q_{n} AS HUGEINT)) AS s_{n}")
        sums.append(f"SUM(CAST(q_{n} AS HUGEINT) * q_{n}) AS ss_{n}")
    for a, b in _corr_pairs():
        sums.append(f"SUM(CAST(q_{a} AS HUGEINT) * q_{b}) AS sp_{a}_{b}")
    sums_sql = ",\n             ".join(["COUNT(*) AS n"] + sums)

    def one(a: str, b: str) -> str:
        num = f"(n * sp_{a}_{b} - s_{a} * s_{b})"
        dena = f"(n * ss_{a} - s_{a} * s_{a})"
        denb = f"(n * ss_{b} - s_{b} * s_{b})"
        frnd = sql_fround(
            f"CAST({num} AS DOUBLE) / nullif(sqrt(CAST({dena} AS"
            f" DOUBLE) * CAST({denb} AS DOUBLE)), 0.0)",
            6,
        )
        return (
            f"SELECT '{a}~{b}' AS pair, CAST(n AS BIGINT) AS n,"
            f" {frnd} AS corr"
            f" FROM agg"
        )

    union = "\n      UNION ALL ".join(one(a, b) for a, b in _corr_pairs())
    return f"""
    WITH base AS (
      SELECT {qcols}
      FROM lineitem
    ), filtered AS (
      SELECT * FROM base WHERE {notnull}
    ), agg AS (
      SELECT {sums_sql}
      FROM filtered
    )
    SELECT pair, n, corr FROM (
      {union}
    ) ORDER BY pair
    """


@register(
    "corr_matrix",
    oracle=_corr_matrix_oracle(),
    description="pairwise Pearson matrix over the four lineitem "
    "measures: all 15 sufficient statistics in ONE aggregate pass "
    "(quantized BIGINT, decimal(38,0)/HUGEINT accumulation, shared n), "
    "six correlations as expressions over the 1-row aggregate via "
    "stack — no second scan; SQL generated from the measure list on "
    "both engines",
    covers=("B4", "N-quality"),
)
def corr_matrix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return corr_matrix(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# supplier concentration: exact integer HHI histogram
# ---------------------------------------------------------------------------


def supplier_hhi_histogram(lineitem: DataFrame) -> DataFrame:
    """Distribution of supplier concentration per part — the
    Herfindahl–Hirschman index (``HHI = Σ shareᵢ²``) of each part's
    shipped quantity across suppliers, bucketed into ten fixed bands:
    the supply-risk readout (a part whose volume is one supplier's is a
    single point of failure), and with ``spend_gini`` the second member
    of the concentration-metrics family.

    Exactness: quantities quantize to BIGINT hundredths; per part,
    ``HHI_bp = (Σ qᵢ²) · 10000 div (Σ qᵢ)²`` is pure integer arithmetic
    in decimal(38,0)/HUGEINT (shares never materialize as floats), and
    the band is ``HHI_bp div 1000``. Shape: one (part, supplier)
    aggregate, one part-keyed aggregate reusing nothing wider than its
    own key, then a 10-row histogram aggregate — fixed output, map-side
    partials everywhere.
    """
    q = F.floor(F.col("l_quantity") * 100.0 + 0.5).cast("bigint")
    per_ps = (
        lineitem.select("l_partkey", "l_suppkey", q.alias("q"))
        .filter(F.col("q").isNotNull())
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("q").alias("sq"))
    )
    d = F.col("sq").cast("decimal(19,0)")
    per_part = per_ps.groupBy("l_partkey").agg(
        F.sum(d * d).alias("ssq"),
        F.sum(d).alias("tq"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    hhi_bp = F.expr(
        "CAST((ssq * 10000) div nullif(tq * tq, 0) AS BIGINT)"
    )
    return (
        per_part.filter(F.col("tq") > 0)
        .select(hhi_bp.alias("hhi_bp"), "n_supp")
        .groupBy(F.expr("hhi_bp div 1000").cast("long").alias("hhi_band"))
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            # fround: counts ratio — tie-reachable at the 5th decimal
            # (r10 round-half-tie audit).
            fround(
                F.sum("n_supp").cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("avg_suppliers"),
        )
        .orderBy("hhi_band")
    )


@register(
    "supplier_hhi_histogram",
    oracle="""
    WITH per_ps AS (
      SELECT l_partkey, l_suppkey,
             SUM(CAST(floor(l_quantity * 100.0 + 0.5) AS BIGINT)) AS sq
      FROM lineitem
      WHERE floor(l_quantity * 100.0 + 0.5) IS NOT NULL
      GROUP BY 1, 2
    ), per_part AS (
      SELECT l_partkey,
             SUM(CAST(sq AS HUGEINT) * sq) AS ssq,
             SUM(CAST(sq AS HUGEINT)) AS tq,
             COUNT(*) AS n_supp
      FROM per_ps GROUP BY 1
    )
    SELECT CAST(((ssq * 10000) // nullif(tq * tq, 0)) // 1000 AS BIGINT)
             AS hhi_band,
           COUNT(*) AS n_parts,
           (CAST(floor((CAST(SUM(n_supp) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE)) * 1e4 + 0.5)
                 AS DOUBLE) / 1e4) AS avg_suppliers
    FROM per_part WHERE tq > 0
    GROUP BY 1 ORDER BY 1
    """,
    description="supply-concentration histogram: exact integer HHI per "
    "part ((sum q_i^2)*10000 div (sum q_i)^2 in decimal(38,0)/HUGEINT, "
    "shares never float), ten fixed bands; (part,supplier) aggregate "
    "-> part aggregate -> 10-row histogram, map-side partials "
    "throughout",
    covers=("B5", "B4", "N-quality"),
)
def supplier_hhi_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return supplier_hhi_histogram(load_table(spark, sf_dir, "lineitem"))


# ---------------------------------------------------------------------------
# Benford leading-digit profile: entry-fraud / synthetic-data screen (r9)
# ---------------------------------------------------------------------------

#: Benford expected leading-digit shares in integer basis points:
#: round(log10(1 + 1/d) * 10000). Hardcoded literals (log10 is evaluated
#: HERE, once, in Python — never inside either engine, where libm
#: differences would break cross-engine determinism).
BENFORD_BP = (3010, 1761, 1249, 969, 792, 669, 580, 512, 458)


def benford_leading_digit(orders: DataFrame) -> DataFrame:
    """Leading-digit distribution of order totals vs Benford's law —
    the classic screen for fabricated or synthetically generated
    amounts (true transactional magnitudes follow log10(1+1/d); uniform
    generators don't). Emits per digit the observed count, observed and
    expected integer basis points, and the signed excess.

    Determinism: the price becomes exact integer cents (the
    revenue_mom_growth ``floor(x*100+0.5)`` convention), the leading
    digit is the first character of the BIGINT's decimal string
    (integer-to-string is exact in every engine — no log10), and every
    share is integer basis points. One scan, one 9-group aggregate."""
    cents = F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
    base = orders.select(cents.alias("c")).filter(F.col("c") > 0)
    digit = F.substring(F.col("c").cast("string"), 1, 1).cast("int")
    counts = base.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n_obs")
    )
    # The total is the SUM OF THE GROUP COUNTS: a whole-frame window
    # over the 9-row counts frame replaces the base.agg() +
    # crossJoin(broadcast) normalizer that re-scanned orders (r10
    # single-scan sweep; plan-gated).
    from pyspark.sql.window import Window

    wall = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    exp_bp = F.element_at(
        F.array(*[F.lit(b) for b in BENFORD_BP]), F.col("digit")
    )
    return (
        counts.withColumn("_n", F.sum("n_obs").over(wall))
        .select(
            "digit",
            F.col("n_obs").cast("bigint").alias("n_obs"),
            F.expr("(n_obs * 10000) div _n").cast("bigint").alias("obs_bp"),
            exp_bp.cast("bigint").alias("expected_bp"),
            (
                F.expr("(n_obs * 10000) div _n") - exp_bp
            ).cast("bigint").alias("excess_bp"),
        )
        .orderBy("digit")
    )


@register(
    "benford_leading_digit",
    oracle=f"""
    WITH b AS (
      SELECT CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS c
      FROM orders
      WHERE CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) > 0
    ), d AS (
      SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit FROM b
    ), counts AS (
      SELECT digit, COUNT(*) AS n_obs FROM d GROUP BY digit
    ), t AS (SELECT COUNT(*) AS _n FROM d)
    SELECT digit,
           CAST(n_obs AS BIGINT) AS n_obs,
           CAST((n_obs * 10000) // _n AS BIGINT) AS obs_bp,
           CAST({list(BENFORD_BP)}[digit] AS BIGINT) AS expected_bp,
           CAST((n_obs * 10000) // _n - {list(BENFORD_BP)}[digit] AS BIGINT)
             AS excess_bp
    FROM counts, t
    ORDER BY digit
    """,
    description="Benford's-law screen on order totals: leading digit of "
    "exact integer cents (digit via int-to-string, expected shares as "
    "precomputed log10 literals — no libm in either engine), observed "
    "vs expected integer basis points; one scan, 9-group aggregate",
    covers=("N-quality", "B5"),
)
def benford_leading_digit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return benford_leading_digit(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# Lorenz deciles: revenue concentration curve (r9)
# ---------------------------------------------------------------------------


def lorenz_deciles(orders: DataFrame) -> DataFrame:
    """Revenue concentration curve in customer deciles — the Lorenz
    curve behind :func:`spend_gini`'s single number: customers ranked
    by spend ascending, bucketed into 10 equal-count deciles, each
    decile's share of total revenue in integer basis points (plus the
    cumulative share, which IS the Lorenz curve).

    Exactness AND scale (the spend_gini distinct-value trick): NTILE
    over (spend, custkey) assigns tied values to a CONTIGUOUS rank run
    whose internal order can't change any decile's count or cents — so
    the Spark side never ranks customers at all. It collapses to
    DISTINCT spend values (one hash aggregate; windowing is over the
    bounded value domain, not the customer count), derives each NTILE
    bucket's exact rank range arithmetically (bucket i of n rows covers
    ``(i-1)*(n div 10) + min(i-1, n mod 10)`` plus ``n div 10 +
    (i <= n mod 10)`` ranks — the NTILE definition), and intersects
    each value run with each bucket range in pure int64. The ORACLE
    keeps the naive per-customer NTILE formulation as the semantic
    spec; the two agree by the tie-run argument."""
    from pyspark.sql.window import Window

    cents = F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
    per_cust = (
        orders.filter(F.col("o_totalprice").isNotNull())
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("spend_cents"))
    )
    vals = per_cust.groupBy("spend_cents").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wv = Window.orderBy("spend_cents").rowsBetween(
        Window.unboundedPreceding, -1
    )
    # _n/_tot ride a whole-frame window over the SAME distinct-value
    # frame as cum_start (one sort, one pass) instead of a vals.agg() +
    # crossJoin(broadcast) normalizer that re-ran the orders->per_cust->
    # vals subtree (r10 single-scan sweep; plan-gated).
    wall = Window.orderBy("spend_cents").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    staged = vals.select(
        "spend_cents",
        "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("cum_start"),
        F.sum("cnt").over(wall).alias("_n"),
        F.sum(F.col("spend_cents") * F.col("cnt")).over(wall).alias("_tot"),
    )
    crossed = staged.select(
        "*", F.explode(F.sequence(F.lit(1), F.lit(10))).alias("decile")
    )
    bstart = F.expr(
        "(decile - 1) * (_n div 10) + least(decile - 1, _n % 10)"
    )
    bsize = F.expr("(_n div 10) + CAST(decile <= (_n % 10) AS BIGINT)")
    overlap = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(F.col("cum_start") + F.col("cnt"), bstart + bsize)
        - F.greatest(F.col("cum_start"), bstart),
    )
    per_dec = (
        crossed.select(
            "decile", "spend_cents", "_tot", overlap.alias("ov")
        )
        .filter(F.col("ov") > 0)
        .groupBy("decile")
        .agg(
            F.sum("ov").cast("bigint").alias("n_customers"),
            F.sum(F.col("spend_cents") * F.col("ov"))
            .cast("bigint")
            .alias("decile_cents"),
            F.max("_tot").alias("_tot"),
        )
    )
    wcum = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        per_dec.select(
            F.col("decile").cast("int").alias("decile"),
            "n_customers",
            "decile_cents",
            # nullif: an all-zero-spend population has a zero total —
            # shares are undefined (NULL), not a divide-by-zero crash
            # (ANSI) or floor garbage (found by the hypothesis model)
            F.expr("(decile_cents * 10000) div nullif(_tot, 0)")
            .cast("bigint")
            .alias("share_bp"),
            (
                F.sum("decile_cents").over(wcum) * F.lit(10000)
            ).alias("_cum10k"),
            F.col("_tot"),
        )
        .select(
            "decile",
            "n_customers",
            "decile_cents",
            "share_bp",
            F.expr("_cum10k div nullif(_tot, 0)")
            .cast("bigint")
            .alias("cum_share_bp"),
        )
        .orderBy("decile")
    )


@register(
    "lorenz_deciles",
    oracle="""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS spend_cents
      FROM orders WHERE o_totalprice IS NOT NULL
      GROUP BY o_custkey
    ), tiled AS (
      SELECT spend_cents,
             NTILE(10) OVER (ORDER BY spend_cents ASC, o_custkey ASC)
               AS decile
      FROM per_cust
    ), t AS (SELECT CAST(SUM(spend_cents) AS BIGINT) AS _tot FROM tiled),
    per_dec AS (
      SELECT decile, COUNT(*) AS n_customers,
             CAST(SUM(spend_cents) AS BIGINT) AS decile_cents
      FROM tiled GROUP BY decile
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(n_customers AS BIGINT) AS n_customers,
           decile_cents,
           CAST((decile_cents * 10000) // nullif(_tot, 0) AS BIGINT)
             AS share_bp,
           CAST((CAST(SUM(decile_cents) OVER (ORDER BY decile
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) * 10000)
                // nullif(_tot, 0)
             AS BIGINT) AS cum_share_bp
    FROM per_dec, t
    ORDER BY decile
    """,
    description="Lorenz revenue-concentration curve: customers NTILE'd "
    "into spend deciles under a total order, per-decile and cumulative "
    "revenue share in exact integer basis points — the curve behind "
    "spend_gini's single number; one aggregate + one customer-list "
    "window + a 10-row rollup",
    covers=("X-window", "B5"),
)
def lorenz_deciles_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lorenz_deciles(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# chi-square independence test: lang x source
# ---------------------------------------------------------------------------


def lang_source_chi2(docs: DataFrame) -> DataFrame:
    """Pearson chi-square independence statistic of the lang × source
    contingency table, with Cramér's V — the corpus-balance test a
    curation pass runs to detect language/source coupling (a source
    feeding one language its boilerplate is invisible to per-axis
    marginals).

    Per-cell term ``(o·N − r·c)² / (N·r·c)`` — the standard statistic
    cleared to one double division per cell. Exactness discipline:
    counts are exact BIGINTs cast to double (products stay exact below
    2^53, i.e. to ~9e15 docs); each cell's term is 1e-9-quantized to
    BIGINT so the cross-cell SUM is order-independent (the
    ``embedding_centroids`` pattern); Cramér's V is one IEEE sqrt.

    Scale: one corpus scan into a |langs|·|sources| cell aggregate
    (map-side partials); the marginals and the final fold are windows
    and an aggregate over the metadata-sized cell table. NULL lang or
    source groups as its own category (NULL-keyed groupBy on both
    engines).
    """
    from pyspark.sql import Window

    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    )
    wl = Window.partitionBy("lang")
    ws = Window.partitionBy("source")
    wall = Window.partitionBy()
    t = (
        cells.withColumn("r", F.sum("o").over(wl))
        .withColumn("c", F.sum("o").over(ws))
        .withColumn("n", F.sum("o").over(wall))
        # collect_set drops NULLs, but the chi2 sum includes NULL-keyed
        # cells (NULL lang/source IS a category here) — add the NULL
        # group back explicitly so dof counts every category (r11 ADVICE:
        # an all-NULL lang column otherwise yields nl=0 and negative dof)
        .withColumn(
            "nl",
            F.size(F.collect_set("lang").over(wall))
            + F.max(
                F.when(F.col("lang").isNull(), 1).otherwise(0)
            ).over(wall),
        )
        .withColumn(
            "ns",
            F.size(F.collect_set("source").over(wall))
            + F.max(
                F.when(F.col("source").isNull(), 1).otherwise(0)
            ).over(wall),
        )
    )
    term = (
        "(cast(o AS double)*cast(n AS double)"
        " - cast(r AS double)*cast(c AS double))"
    )
    tq = F.expr(
        f"try_cast(round({term}*{term}"
        " / (cast(n AS double)*cast(r AS double)*cast(c AS double))"
        " * 1e9) AS bigint)"
    )
    agg = t.groupBy("n", "nl", "ns").agg(
        (F.sum(tq).cast("double") / F.lit(1.0e9)).alias("chi2")
    )
    return agg.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("nl").cast("bigint").alias("n_langs"),
        F.col("ns").cast("bigint").alias("n_sources"),
        F.expr("greatest((nl - 1) * (ns - 1), 0)")
        .cast("bigint")
        .alias("dof"),
        "chi2",
        # nullif: a 1x1 table has dof 0 — V is undefined (NULL), matching
        # DuckDB's NULL-on-zero-divide instead of ANSI-throwing (the
        # one-row-corpus seam)
        fround(
            F.sqrt(
                F.col("chi2")
                / F.nullif(
                    F.col("n").cast("double")
                    * F.least(F.col("nl") - 1, F.col("ns") - 1).cast(
                        "double"
                    ),
                    F.lit(0.0),
                )
            ),
            6,
        ).alias("cramers_v"),
    )


@register(
    "lang_source_chi2",
    oracle=f"""
    WITH cells AS (
      SELECT lang, source, COUNT(*) AS o
      FROM documents GROUP BY lang, source
    ), t AS (
      SELECT o,
             SUM(o) OVER (PARTITION BY lang) AS r,
             SUM(o) OVER (PARTITION BY source) AS c,
             SUM(o) OVER () AS n,
             COUNT(DISTINCT lang) OVER ()
               + MAX(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) OVER ()
               AS nl,
             COUNT(DISTINCT source) OVER ()
               + MAX(CASE WHEN source IS NULL THEN 1 ELSE 0 END) OVER ()
               AS ns
      FROM cells
    ), q AS (
      SELECT n, nl, ns,
             TRY_CAST(round(
               (CAST(o AS DOUBLE)*CAST(n AS DOUBLE)
                - CAST(r AS DOUBLE)*CAST(c AS DOUBLE))
               * (CAST(o AS DOUBLE)*CAST(n AS DOUBLE)
                  - CAST(r AS DOUBLE)*CAST(c AS DOUBLE))
               / (CAST(n AS DOUBLE)*CAST(r AS DOUBLE)*CAST(c AS DOUBLE))
               * 1e9) AS BIGINT) AS tq
      FROM t
    ), agg AS (
      SELECT n, nl, ns, CAST(SUM(tq) AS DOUBLE) / 1e9 AS chi2
      FROM q GROUP BY n, nl, ns
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(nl AS BIGINT) AS n_langs,
           CAST(ns AS BIGINT) AS n_sources,
           CAST(greatest((nl - 1) * (ns - 1), 0) AS BIGINT) AS dof,
           chi2,
           {sql_fround(
               "sqrt(chi2 / (CAST(n AS DOUBLE)"
               " * CAST(least(nl - 1, ns - 1) AS DOUBLE)))", 6
           )} AS cramers_v
    FROM agg
    """,
    description="corpus-balance test: Pearson chi-square of the "
    "lang x source contingency table + Cramer's V — one scan into a "
    "|langs|x|sources| cell aggregate, marginals as windows over the "
    "metadata-sized cell table, per-cell terms 1e-9-quantized BIGINT so "
    "the fold is order-independent; one double division per cell, one "
    "IEEE sqrt",
    covers=("X-stats", "B5"),
)
def lang_source_chi2_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lang_source_chi2(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# OLS trend: per-nation monthly revenue slope
# ---------------------------------------------------------------------------


def revenue_trend_ols(
    orders: DataFrame, customer: DataFrame, nation: DataFrame
) -> DataFrame:
    """Per-nation ordinary-least-squares revenue trend: the slope and
    intercept of monthly revenue (cents) against the month index — the
    simple-regression readout every revenue dashboard fits, done with
    the engine-exact recipe the correlation matrix established.

    All five regression sums (n, Σx, Σy, Σxy, Σx²) are exact BIGINTs
    over (month-index, cents) pairs — x is ``(year-1995)·12 + month-1``
    from NTZ calendar parts (no epoch math, no tz), y quantizes to
    cents via the tie-safe floor form. The slope
    ``(nΣxy − ΣxΣy) / (nΣx² − (Σx)²)`` is ONE double division of two
    exact integers; the intercept ``(Σy − slope·Σx)/n`` is a fixed
    three-op chain on it — both bit-identical cross-engine. A nation
    with one active month has zero variance: NULL slope/intercept via
    nullif, both engines. Σxy stays under 2^63 to ~1e17 month-cents —
    the ``bm25_search`` overflow-note discipline.

    Scale: fact scan → broadcast customer/nation dims → one
    (nation, month) aggregate (map-side partials) → one |nations|
    aggregate. No windows, no sort until the |nations|-row output.
    """
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    month = (
        (F.year("o_orderdate") - F.lit(1995)) * 12
        + F.month("o_orderdate")
        - F.lit(1)
    ).cast("bigint")
    monthly = (
        orders.join(
            # customer is SF-correlated — size-gated hint, not forced
            # (functions/broadcast.py policy, VERDICT r11 #4)
            broadcast_if_dim(
                customer.select(
                    F.col("c_custkey"), F.col("c_nationkey")
                )
            ),
            orders["o_custkey"] == F.col("c_custkey"),
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey"), F.col("n_name")
                )
            ),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select(F.col("n_name"), month.alias("x"), cents.alias("_c"))
        .groupBy("n_name", "x")
        .agg(F.sum("_c").alias("y"))
    )
    agg = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = F.expr(
        "cast(n*sxy - sx*sy AS double)"
        " / nullif(cast(n*sxx - sx*sx AS double), 0.0D)"
    )
    return (
        agg.select(
            F.col("n_name").alias("nation"),
            F.col("n").cast("bigint").alias("n_months"),
            slope.alias("_s"),
            F.col("sx"),
            F.col("sy"),
            F.col("n"),
        )
        .select(
            "nation",
            "n_months",
            F.col("_s").alias("slope_cents_per_month"),
            (
                (
                    F.col("sy").cast("double")
                    - F.col("_s") * F.col("sx").cast("double")
                )
                / F.col("n").cast("double")
            ).alias("intercept_cents"),
        )
        .orderBy("nation")
    )


@register(
    "revenue_trend_ols",
    oracle="""
    WITH monthly AS (
      SELECT n.n_name,
             CAST((year(o.o_orderdate) - 1995) * 12
                  + month(o.o_orderdate) - 1 AS BIGINT) AS x,
             SUM(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS y
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name, x
    ), agg AS (
      SELECT n_name, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x*y) AS sxy, SUM(x*x) AS sxx
      FROM monthly GROUP BY n_name
    )
    SELECT n_name AS nation, CAST(n AS BIGINT) AS n_months,
           CAST(n*sxy - sx*sy AS DOUBLE)
             / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0)
             AS slope_cents_per_month,
           (CAST(sy AS DOUBLE)
            - (CAST(n*sxy - sx*sy AS DOUBLE)
               / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0))
              * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept_cents
    FROM agg ORDER BY n_name
    """,
    description="per-nation OLS revenue trend: slope/intercept of monthly "
    "cents vs month index — five exact-BIGINT regression sums, ONE double "
    "division for the slope and a fixed 3-op chain for the intercept "
    "(engine bit-identical); fact scan + broadcast dims + two hash "
    "aggregates, no windows; single-month nations yield NULL via nullif",
    covers=("X-stats", "B11", "B5"),
)
def revenue_trend_ols_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_trend_ols(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "customer"),
        load_table(spark, sf_dir, "nation"),
    )


# ---------------------------------------------------------------------------
# vocabulary concentration: exact Gini over token frequencies
# ---------------------------------------------------------------------------


def vocab_gini(docs: DataFrame) -> DataFrame:
    """Exact Gini coefficient of the corpus token-frequency distribution
    — the vocabulary-concentration readout (a healthy natural corpus is
    strongly Zipfian, G near 1; near-uniform token mass flags synthetic
    or template text).

    Same scale trick as :func:`spend_gini`: global ranks collapse to
    arithmetic series over DISTINCT frequency values, so the only
    ordered pass is a window over the |distinct frequencies| series
    (≈ O(sqrt(total tokens)) values under Zipf — metadata-sized at any
    corpus scale). One explode + two hash aggregates before it; all
    rank/value sums exact in decimal(38,0)/HUGEINT.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(
            F.split(F.trim(F.lower(F.col("text"))), " +")
        ).alias("tok")
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    vals = freq.groupBy("f").agg(F.count(F.lit(1)).alias("cnt"))
    wv = Window.orderBy("f").rowsBetween(Window.unboundedPreceding, -1)
    staged = vals.select(
        "f",
        "cnt",
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("cumn"),
    )
    fd = F.col("f").cast("decimal(19,0)")
    cntd = F.col("cnt").cast("decimal(19,0)")
    cumd = F.col("cumn").cast("decimal(19,0)")
    rank_sum2 = F.lit(2).cast("decimal(19,0)") * cntd * cumd \
        + cntd * (cntd + F.lit(1))
    agg = staged.agg(
        F.sum(cntd).alias("n"),
        F.sum(fd * cntd).alias("sx"),
        F.sum(fd * rank_sum2).alias("srx2"),
    )
    num = F.col("srx2") - (F.col("n") + F.lit(1)) * F.col("sx")
    den = F.col("n") * F.col("sx")
    return agg.select(
        F.coalesce(F.col("n").cast("long"), F.lit(0)).alias("n_types"),
        F.coalesce(F.col("sx").cast("long"), F.lit(0)).alias("total_tokens"),
        fround(
            num.cast("double")
            / F.when(den != F.lit(0).cast("decimal(38,0)"), den.cast("double")),
            6,
        ).alias("gini"),
    )


@register(
    "vocab_gini",
    oracle="""
    WITH freq AS (
      SELECT tok, COUNT(*) AS f
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), ' +'))
              AS tok FROM documents)
      GROUP BY tok
    ), vals AS (
      SELECT f, COUNT(*) AS cnt FROM freq GROUP BY f
    ), staged AS (
      SELECT f, cnt,
             COALESCE(SUM(cnt) OVER (
               ORDER BY f
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS cumn
      FROM vals
    ), agg AS (
      SELECT SUM(CAST(cnt AS HUGEINT)) AS n,
             SUM(CAST(f AS HUGEINT) * cnt) AS sx,
             SUM(CAST(f AS HUGEINT)
                 * (2 * CAST(cnt AS HUGEINT) * cumn
                    + CAST(cnt AS HUGEINT) * (cnt + 1))) AS srx2
      FROM staged
    )
    SELECT CAST(COALESCE(n, 0) AS BIGINT) AS n_types,
           CAST(COALESCE(sx, 0) AS BIGINT) AS total_tokens,
           (CAST(floor((CAST(srx2 - (n+1)*sx AS DOUBLE)
                 / nullif(CAST(n*sx AS DOUBLE), 0.0)) * 1e6 + 0.5)
                 AS DOUBLE) / 1e6) AS gini
    FROM agg
    """,
    description="vocabulary concentration: exact Gini of the corpus "
    "token-frequency distribution — tied ranks collapse to arithmetic "
    "series over DISTINCT frequency values (Zipf => ~sqrt(N) of them), "
    "the only ordered pass is the distinct-value window; exact "
    "decimal/HUGEINT sums, one final double division, floor-form 6dp",
    covers=("N-text", "X-stats", "X-window"),
)
def vocab_gini_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return vocab_gini(load_table(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# vocabulary coverage curve (r13) — the tokenizer vocab-size axis
# ---------------------------------------------------------------------------

#: candidate vocabulary sizes a tokenizer design actually chooses between
VOCAB_LADDER: tuple[int, ...] = (100, 1000, 10000)


def vocab_coverage_curve(
    docs: DataFrame, ladder: tuple[int, ...] = VOCAB_LADDER
) -> DataFrame:
    """Token coverage (and OOV rate) at candidate vocabulary sizes —
    the curve a tokenizer design reads before fixing its vocab: with
    the top-V types as the vocabulary, what share of all token
    OCCURRENCES is covered, and what hits <unk>?

    Scale shape (the :func:`vocab_gini` trick, pointed the other way):
    a vocab cutoff never needs per-token global ranks, because every
    type inside one frequency class is interchangeable — so the curve
    collapses onto the DISTINCT-frequency histogram (≈ O(sqrt(total
    tokens)) rows under Zipf). Classes wholly above the cutoff
    contribute full mass; the one boundary class contributes
    ``(V - types_above) · f`` exactly; tie order inside the class
    cannot matter. One explode + two hash aggregates; the only ordered
    pass is a window over the tiny histogram; the whole ladder is
    |ladder| predicates over ONE running types-above column. All
    outputs exact BIGINTs.
    """
    from pyspark.sql import Window

    toks = docs.select(
        F.explode(F.split(F.trim(F.lower(F.col("text"))), " +")).alias(
            "tok"
        )
    )
    freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("f"))
    vals = freq.groupBy("f").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wv = Window.orderBy(F.col("f").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    staged = vals.select(
        F.col("f").cast("bigint").alias("f"),
        "cnt",
        (F.col("f").cast("bigint") * F.col("cnt")).alias("_mass"),
        F.coalesce(F.sum("cnt").over(wv), F.lit(0)).alias("_above"),
    )
    covered = [
        F.sum(
            F.when(F.col("_above") + F.col("cnt") <= v, F.col("_mass"))
            .when(
                F.col("_above") < v,
                (F.lit(v) - F.col("_above")) * F.col("f"),
            )
            .otherwise(F.lit(0))
        ).alias(f"_cov{v}")
        for v in ladder
    ]
    # grouped by a constant so an EMPTY corpus yields zero rows on both
    # engines (an ungrouped aggregate would emit one all-NULL row)
    agg = staged.groupBy(F.lit(1).alias("_g")).agg(
        F.sum("cnt").cast("bigint").alias("_types"),
        F.sum("_mass").cast("bigint").alias("_total"),
        *covered,
    )
    stack_args = ", ".join(f"{v}L, _cov{v}" for v in ladder)
    return (
        agg.selectExpr(
            "_types",
            "_total",
            f"stack({len(ladder)}, {stack_args}) AS (vocab_size, covered)",
        )
        .select(
            F.col("vocab_size").cast("bigint").alias("vocab_size"),
            F.least(F.col("vocab_size"), F.col("_types"))
            .cast("bigint")
            .alias("n_types"),
            F.col("covered").cast("bigint").alias("covered_tokens"),
            F.col("_total").alias("total_tokens"),
            F.when(
                F.col("_total") > 0,
                F.expr("(10000 * covered) div _total"),
            )
            .otherwise(F.lit(-1))
            .cast("bigint")
            .alias("coverage_bp"),
        )
        .orderBy("vocab_size")
    )


def _vocab_coverage_oracle(ladder: tuple[int, ...] = VOCAB_LADDER) -> str:
    covs = ",\n             ".join(
        f"SUM(CASE WHEN _above + cnt <= {v} THEN _mass "
        f"WHEN _above < {v} THEN ({v} - _above) * f "
        f"ELSE 0 END) AS cov{v}"
        for v in ladder
    )
    rows = "\n    UNION ALL\n".join(
        f"""    SELECT CAST({v} AS BIGINT) AS vocab_size,
           CAST(LEAST({v}, _types) AS BIGINT) AS n_types,
           CAST(cov{v} AS BIGINT) AS covered_tokens,
           CAST(_total AS BIGINT) AS total_tokens,
           CAST(CASE WHEN _total > 0 THEN (10000 * cov{v}) // _total
                     ELSE -1 END AS BIGINT) AS coverage_bp
    FROM agg"""
        for v in ladder
    )
    return f"""
    WITH freq AS (
      SELECT tok, COUNT(*) AS f
      FROM (SELECT unnest(string_split_regex(trim(lower(text)), ' +'))
              AS tok FROM documents)
      GROUP BY tok
    ), vals AS (
      SELECT f, COUNT(*) AS cnt FROM freq GROUP BY f
    ), staged AS (
      SELECT f, cnt, f * cnt AS _mass,
             COALESCE(SUM(cnt) OVER (
               ORDER BY f DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS _above
      FROM vals
    ), agg AS (
      SELECT SUM(cnt) AS _types,
             SUM(_mass) AS _total,
             {covs}
      FROM staged GROUP BY 1=1
    )
{rows}
    ORDER BY vocab_size
    """


@register(
    "vocab_coverage_curve",
    oracle=_vocab_coverage_oracle(),
    description="tokenizer vocab-size curve: token-occurrence coverage "
    "and OOV share with the top-V types as vocabulary, V in "
    "100/1k/10k — per-token global ranks collapse onto the "
    "distinct-frequency histogram (types in one class are "
    "interchangeable; the boundary class contributes (V - above) * f "
    "exactly), so the only ordered pass is a window over ~sqrt(N) "
    "rows and the whole ladder shares ONE running types-above column",
    covers=("N-text", "N-quality", "B5"),
)
def vocab_coverage_curve_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return vocab_coverage_curve(load_table(spark, sf_dir, "documents"))
