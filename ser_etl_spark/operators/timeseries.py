"""Time-series extensions over the events stream table: PIVOT and
hypertable-style multi-granularity rollup.

Both are extensions beyond the reference's whitelisted surface (SURVEY.md
§2.B blocks nothing join/aggregate-shaped, and its 60 s micro-batch loop,
``/root/reference/etl-service/src/main.py:80-91``, is the only stream
abstraction) — these are the batch analytics a time-partitioned event
store serves.

Scale design:
- Pivot uses an *explicit* value list: ``df.groupBy().pivot(col)`` without
  values runs a distinct-collect job first, a driver round-trip that
  stalls a 1000-executor cluster; with values it is a single conditional
  aggregation pass (one shuffle, partial aggs intact).
- The rollup computes hourly and daily grains in ONE shuffle via
  ``rollup`` (Catalyst expands the grouping sets map-side) instead of two
  jobs over the fact; at 100 TB pair it with the date-partitioned layout
  (``etl/build.TableLayout.partition_by``) so each grain prunes to its
  time range.
- All truncation stays in TIMESTAMP_NTZ space (timestampdiff arithmetic)
  — ``F.date_trunc`` would coerce through the session timezone.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ser_etl_spark.functions.numeric import dsum, fround, sql_dsum, sql_fround
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table

#: The fixture's closed event-type domain — the explicit pivot value list.
EVENT_TYPES: tuple[str, ...] = ("click", "error", "purchase", "signup", "view")


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return load_table(spark, sf_dir, name)


def _trunc(unit: str, col: str = "ts"):
    """NTZ-pure truncation to ``unit`` boundaries (no session-tz detour)."""
    return F.expr(
        f"timestampadd({unit}, "
        f"timestampdiff({unit}, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col}), "
        f"TIMESTAMP_NTZ '1970-01-01 00:00:00')"
    )


@register(
    "event_value_pivot",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           {sql_dsum("CASE WHEN event_type = 'click' THEN value END", 4)} AS click,
           {sql_dsum("CASE WHEN event_type = 'error' THEN value END", 4)} AS error,
           {sql_dsum("CASE WHEN event_type = 'purchase' THEN value END", 4)} AS purchase,
           {sql_dsum("CASE WHEN event_type = 'signup' THEN value END", 4)} AS signup,
           {sql_dsum("CASE WHEN event_type = 'view' THEN value END", 4)} AS view,
           COUNT(*) AS total_events
    FROM events
    GROUP BY 1
    ORDER BY 1
    """,
    description="extension: PIVOT — daily value matrix, one column per "
    "event type; explicit value list keeps it a single conditional-agg "
    "pass (no distinct-collect pre-job)",
    covers=("X-pivot",),
)
def event_value_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        _trunc("DAY").alias("day"), "event_type", "value"
    )
    # One conditional-aggregation pass: with an explicit value list a
    # pivot IS conditional aggregation, so total_events rides the same
    # groupBy instead of a second scan + day-key join (r9 shape; r10
    # single-scan sweep, plan-gated).
    return (
        ev.groupBy("day")
        .agg(
            *[
                dsum(
                    F.when(F.col("event_type") == t, F.col("value")), 4
                ).alias(t)
                for t in EVENT_TYPES
            ],
            F.count(F.lit(1)).alias("total_events"),
        )
        .orderBy("day")
    )


@register(
    "time_bucket_rollup",
    oracle=f"""
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket_day,
           CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_hour,
           COUNT(*) AS events,
           {sql_dsum('value', 4)} AS sum_value
    FROM events
    GROUP BY ROLLUP (1, 2)
    """,
    description="extension: hypertable-style continuous-aggregate rollup — "
    "hourly, daily, and grand-total grains of the event stream in one "
    "shuffle via grouping-set expansion; the day level prunes with the "
    "date-partitioned layout at scale",
    covers=("X-timeseries", "B5"),
)
def time_bucket_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _t(spark, sf_dir, "events").select(
        _trunc("DAY").alias("bucket_day"),
        _trunc("HOUR").alias("bucket_hour"),
        "value",
    )
    return ev.rollup("bucket_day", "bucket_hour").agg(
        F.count(F.lit(1)).alias("events"),
        dsum("value", 4).alias("sum_value"),
    )


@register(
    "order_seasonality",
    oracle=f"""
    SELECT CAST(EXTRACT(year FROM o_orderdate) AS INT) AS yr,
           CAST(EXTRACT(quarter FROM o_orderdate) AS INT) AS qtr,
           CAST(EXTRACT(month FROM o_orderdate) AS INT) AS mth,
           CAST(EXTRACT(dow FROM o_orderdate) AS INT) AS dow,
           COUNT(*) AS orders,
           {sql_dsum('o_totalprice', 2)} AS total_sales
    FROM orders
    GROUP BY 1, 2, 3, 4
    ORDER BY 1, 2, 3, 4
    """,
    description="calendar-field extraction surface (year/quarter/month/"
    "day-of-week) aggregated over orders — pure NTZ field extraction, no "
    "session-tz detour (DuckDB dow is 0=Sunday; Spark dayofweek is "
    "1=Sunday, bridged by -1); one hash aggregate",
    covers=("B5", "X-time"),
)
def order_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("yr"),
            F.quarter("o_orderdate").alias("qtr"),
            F.month("o_orderdate").alias("mth"),
            (F.dayofweek("o_orderdate") - F.lit(1)).alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("orders"),
            dsum("o_totalprice", 2).alias("total_sales"),
        )
        .orderBy("yr", "qtr", "mth", "dow")
    )


def gap_fill_hourly(
    events: DataFrame,
    key: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Gap-filled hourly series per key: every hour between each key's
    first and last bucket exists in the output, empty hours carrying
    ``events = 0`` and a forward-filled ``filled_sum`` (last non-empty
    hour's sum).

    The time-series densification op (``generate_series`` /
    ``time_bucket_gapfill`` in timeseries stores): aggregate first (one
    shuffle, partial aggs), then each aggregate row GENERATES the gap
    hours it owns — the run from its own bucket up to the next bucket
    minus one (``lead`` over the key, same hash partitioning as the
    aggregate, no extra shuffle) — carrying its forward-filled sum onto
    every generated hour. One scan, one shuffle, zero joins; the r9
    bounds-spine-and-left-join formulation re-ran the aggregate subtree
    twice (r10 single-scan sweep; plan-gated). The generated rows are
    |keys| x hours — never scale with raw event volume. The oracle
    keeps the spine left-join formulation as the semantic spec.
    """
    from pyspark.sql import Window

    agg = (
        events.filter(F.col(ts_col).isNotNull())
        .groupBy(_trunc("HOUR", ts_col).alias("bucket_ts"), F.col(key))
        .agg(
            F.count(F.lit(1)).alias("events"),
            dsum(value_col, 4).alias("sum_value"),
        )
    )
    wk = Window.partitionBy(key).orderBy("bucket_ts")
    wf = wk.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    staged = agg.select(
        F.col(key),
        "bucket_ts",
        "events",
        # the forward fill happens BEFORE expansion (all-NULL-value
        # hours must inherit from further back, not from their own
        # NULL sum), then rides every generated hour of the run
        F.last("sum_value", ignorenulls=True).over(wf).alias("_ffill"),
        F.lead("bucket_ts").over(wk).alias("_next"),
    )
    h = F.explode(
        F.expr(
            "sequence(bucket_ts,"
            " coalesce(_next - interval 1 hour, bucket_ts),"
            " interval 1 hour)"
        )
    )
    return (
        staged.select(
            F.col(key), "bucket_ts", "events", "_ffill", h.alias("_h")
        )
        .select(
            F.col(key),
            F.col("_h").alias("bucket_ts"),
            F.when(F.col("_h") == F.col("bucket_ts"), F.col("events"))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("events"),
            F.col("_ffill").alias("filled_sum"),
        )
        .orderBy(key, "bucket_ts")
    )


@register(
    "gap_filled_hourly",
    oracle=f"""
    WITH agg AS (
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket_ts,
             event_type,
             COUNT(*) AS events,
             {sql_dsum('value', 4)} AS sum_value
      FROM events GROUP BY 1, 2),
    bounds AS (
      SELECT event_type, MIN(bucket_ts) AS lo, MAX(bucket_ts) AS hi
      FROM agg GROUP BY 1),
    spine AS (
      SELECT event_type,
             unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket_ts
      FROM bounds)
    SELECT s.event_type, s.bucket_ts,
           COALESCE(a.events, 0) AS events,
           last_value(a.sum_value IGNORE NULLS) OVER (
             PARTITION BY s.event_type ORDER BY s.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_sum
    FROM spine s LEFT JOIN agg a USING (event_type, bucket_ts)
    """,
    description="gap-filled hourly event series per type: dense hourly "
    "spine between each type's first/last hour (sequence+explode over "
    "aggregate bounds — spine never scales with event volume), empty "
    "hours as zero-count rows with forward-filled sums (one window "
    "pass); the time_bucket_gapfill analog",
    covers=("A16", "B5"),
)
def gap_filled_hourly_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return gap_fill_hourly(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# time-series similarity search: top-k most-correlated series
# ---------------------------------------------------------------------------

#: fixed-point scale for exact value accumulation (events.value has ~4
#: significant decimals; 1e6 leaves headroom while BIGINT sums stay exact)
_TS_SCALE = 1_000_000


def hourly_series(events: DataFrame) -> DataFrame:
    """Per-(user, hour) quantized series points ``(user_id, hour_bucket,
    v)`` — the shared first stage of the series-search family: hour
    buckets via timezone-pure NTZ epoch math, values quantized to 1e-6
    and summed as exact BIGINTs (associative — partitioning cannot
    change them). One hash aggregate; map-side partials mean the shuffle
    carries one row per (user, hour)."""
    hour = F.floor(
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        / F.lit(3600)
    ).cast("long")
    q = F.round(F.col("value") * F.lit(float(_TS_SCALE)), 0).cast("long")
    return (
        events.select(F.col("user_id"), hour.alias("hour_bucket"), q.alias("v"))
        .groupBy("user_id", "hour_bucket")
        .agg(F.sum("v").alias("v"))
    )


def series_similarity_topk(
    events: DataFrame,
    ref_user: int,
    k: int = 10,
    min_overlap: int = 3,
) -> DataFrame:
    """Top-k users whose hourly value series correlates most with a
    reference user's — time-series similarity search as one broadcast
    join plus two keyed aggregates.

    Shape (the distributed-similarity-search pattern, cf. EDBT'19/'20
    top-k series search): aggregate the stream to per-(user, hour)
    series points; the REFERENCE series is tiny (≤ hours in the window)
    so it broadcasts, the candidate side joins map-side on hour_bucket
    (shared support = inner join), and Pearson correlation reduces to
    the six sufficient statistics per candidate — one hash aggregate,
    then a top-k. No series ever shuffles against another series;
    at 100 TB the only data-sized operations are the two keyed
    aggregates.

    Determinism recipe (statistics.py discipline): hour buckets via
    timezone-pure epoch math, values quantized to 1e-6 and summed as
    exact BIGINTs (associative — partitioning cannot change them), ONE
    double expression at the end with a nullif zero-variance guard,
    rounded to 6 decimals, vec-id tie-break.
    """
    series = hourly_series(events)
    ref = series.filter(F.col("user_id") == ref_user).select(
        F.col("hour_bucket"), F.col("v").alias("rv")
    )
    cand = series.filter(F.col("user_id") != ref_user)
    # Accumulate the sufficient statistics in DECIMAL, not BIGINT: v is an
    # hourly SUM of 1e6-scaled values, so v*v exceeds 2^63 for hot
    # users/long windows — under Spark's ANSI default that THROWS while
    # DuckDB's SUM silently promotes to HUGEINT, a divergent failure mode
    # at scale (ADVICE r7). decimal(19,0) holds any BIGINT; the product is
    # decimal(38,0) (< 2^126 always fits) and sums stay exact — the oracle
    # mirrors with explicit HUGEINT casts, so both engines are exact
    # integers until the single double expression at the end.
    joined = cand.join(F.broadcast(ref), "hour_bucket").select(
        "user_id",
        F.col("v").cast("decimal(19,0)").alias("vx"),
        F.col("rv").cast("decimal(19,0)").alias("vy"),
    )
    stats = joined.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("vx").alias("sx"),
        F.sum("vy").alias("sy"),
        F.sum(F.col("vx") * F.col("vx")).alias("sxx"),
        F.sum(F.col("vy") * F.col("vy")).alias("syy"),
        F.sum(F.col("vx") * F.col("vy")).alias("sxy"),
    )
    # one double expression from the exact integer sums; zero-variance
    # candidates (constant series) are undefined -> NULL -> sorted last
    # sql_fround form, not round(double): integer-moment ratio — a
    # perfect-square denominator makes a 7th-place decimal half
    # reachable (r10 round-half-tie audit).
    corr = F.expr(
        "(CAST(floor(((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))"
        " / nullif(sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))"
        " * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 0.0D))"
        " * 1e6 + 0.5) AS DOUBLE) / 1e6)"
    )
    return (
        stats.filter(F.col("n") >= min_overlap)
        .select("user_id", F.col("n").alias("shared_hours"), corr.alias("corr"))
        .orderBy(F.col("corr").desc(), F.col("user_id").asc())
        .limit(k)
    )


@register(
    "series_similarity_topk",
    oracle=f"""
    WITH series AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
               AS hour_bucket,
             SUM(CAST(round(value * {_TS_SCALE}.0) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ), ref AS (
      SELECT hour_bucket, v AS rv FROM series WHERE user_id = 1
    ), stats AS (
      SELECT c.user_id, COUNT(*) AS n,
             SUM(CAST(c.v AS HUGEINT)) AS sx,
             SUM(CAST(r.rv AS HUGEINT)) AS sy,
             SUM(CAST(c.v AS HUGEINT) * c.v) AS sxx,
             SUM(CAST(r.rv AS HUGEINT) * r.rv) AS syy,
             SUM(CAST(c.v AS HUGEINT) * r.rv) AS sxy
      FROM series c JOIN ref r USING (hour_bucket)
      WHERE c.user_id <> 1
      GROUP BY c.user_id
    )
    SELECT user_id, CAST(n AS BIGINT) AS shared_hours,
           (CAST(floor(((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
                 / nullif(sqrt((CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE)*CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE)*CAST(sy AS DOUBLE))), 0.0))
                 * 1e6 + 0.5) AS DOUBLE) / 1e6)
             AS corr
    FROM stats WHERE n >= 3
    ORDER BY corr DESC, user_id ASC
    LIMIT 10
    """,
    description="time-series similarity search: top-10 users whose "
    "hourly value series correlates most with user 1's — reference "
    "series broadcast, shared-support join, Pearson from six exact "
    "integer sufficient statistics per candidate (1e-6-quantized "
    "values; squares accumulate in DECIMAL(38,0)/HUGEINT so hot users "
    "can't overflow BIGINT divergently), one guarded double expression; "
    "zero-variance series score NULL and sort last",
    covers=("N-sim", "X-window"),
)
def series_similarity_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return series_similarity_topk(_t(spark, sf_dir, "events"), ref_user=1)


def pattern_match_topk(
    events: DataFrame,
    pattern: tuple[int, ...] = (1, -2, 1),
    k: int = 10,
) -> DataFrame:
    """Top-k (user, hour) windows where the hourly value series best
    matches an integer convolution ``pattern`` — sliding-window pattern
    search (the streaming-series-similarity shape) with an EXACT score.

    The default (1, -2, 1) is the discrete-spike detector (second
    difference): large positive scores are sharp dips, large negative
    ones sharp spikes. Scoring stays in BIGINT end to end — quantized
    hourly sums convolved with integer weights — so the ranking is
    bit-deterministic on any engine with no float seam at all.

    Shape: one keyed aggregate to series points, one window pass per
    user ordered by hour (LEADs). The window's user-only partitioning
    is a second exchange, but it moves only the AGGREGATED series — one
    row per (user, hour), never the event stream (shuffling raw events
    by user to share the first exchange would forfeit map-side partial
    aggregation, a worse trade at scale). Consecutive-hour guard, then
    TakeOrdered top-k.
    """
    series = hourly_series(events)
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(F.col("hour_bucket").asc())
    width = len(pattern)
    leads = series.select(
        "user_id",
        "hour_bucket",
        "v",
        *[F.lead("v", i).over(w).alias(f"_v{i}") for i in range(1, width)],
        *[
            F.lead("hour_bucket", i).over(w).alias(f"_h{i}")
            for i in range(1, width)
        ],
    )
    consecutive = None
    for i in range(1, width):
        ok = F.col(f"_h{i}") == F.col("hour_bucket") + F.lit(i)
        consecutive = ok if consecutive is None else consecutive & ok
    score = F.lit(int(pattern[0])) * F.col("v")
    for i in range(1, width):
        score = score + F.lit(int(pattern[i])) * F.col(f"_v{i}")
    return (
        leads.filter(consecutive)
        .select("user_id", "hour_bucket", score.alias("score"))
        .orderBy(F.col("score").desc(), F.col("user_id").asc(),
                 F.col("hour_bucket").asc())
        .limit(k)
    )


@register(
    "pattern_match_topk",
    oracle=f"""
    WITH series AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
               AS hour_bucket,
             SUM(CAST(round(value * {_TS_SCALE}.0) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ), leads AS (
      SELECT user_id, hour_bucket, v,
             LEAD(v, 1) OVER w AS v1, LEAD(v, 2) OVER w AS v2,
             LEAD(hour_bucket, 1) OVER w AS h1,
             LEAD(hour_bucket, 2) OVER w AS h2
      FROM series
      WINDOW w AS (PARTITION BY user_id ORDER BY hour_bucket ASC)
    )
    SELECT user_id, hour_bucket,
           CAST(1*v + (-2)*v1 + 1*v2 AS BIGINT) AS score
    FROM leads
    WHERE h1 = hour_bucket + 1 AND h2 = hour_bucket + 2
    ORDER BY score DESC, user_id ASC, hour_bucket ASC
    LIMIT 10
    """,
    description="sliding-pattern search over hourly value series: top-10 "
    "(user, hour) windows by the (1,-2,1) second-difference convolution "
    "(spike/dip detector) — exact BIGINT scoring end to end (quantized "
    "sums x integer weights, zero float seams), consecutive-hour guard; "
    "the window pass re-shuffles only the aggregated series (one row "
    "per user-hour), never the event stream",
    covers=("N-sim", "X-window"),
)
def pattern_match_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pattern_match_topk(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# series anomaly detection: exact-integer z-score outliers
# ---------------------------------------------------------------------------


def series_anomalies(
    events: DataFrame,
    z_sq_threshold: int = 9,
    min_hours: int = 24,
) -> DataFrame:
    """Hours whose value deviates more than ``sqrt(z_sq_threshold)``
    standard deviations from the user's own mean — per-series anomaly
    detection with an EXACT integer predicate (data-quality gate for
    training pipelines: flag corrupted feeds / bot bursts before they
    poison aggregates).

    The float-seam-free trick: the z-score test ``|v - mean| > z * σ``
    squares to ``(n*v - sx)^2 > z^2 * (n*sxx - sx^2)`` after multiplying
    both sides by ``n^2`` — every term an exact integer (v is the
    1e-6-quantized hourly BIGINT sum; squares accumulate in
    decimal(38,0) / HUGEINT per the series_similarity_topk overflow
    discipline), so membership is bit-deterministic on any engine and
    any partitioning, with NO sqrt/division in the predicate. The
    reported ``zsq`` ( = z^2, exact integers -> one double division,
    round 4) is presentation only.

    Shape: one hash aggregate to series points, then per-user whole-
    partition window sums over the AGGREGATED series — the second
    exchange moves one row per (user, hour), never the event stream,
    and no series-vs-series traffic exists at all. Magnitude bound
    (ADVICE r8 correction): the BINDING terms are ``dev^2 = (n*v -
    sx)^2`` and ``sx*sx``, both bounded by ``(n * max|v|)^2`` — they
    scale as (n*V)^2, not n*V^2 — so staying under decimal(38,0) /
    DuckDB HUGEINT (~1.7e38) requires ``n * max|v| < ~1e19``: hourly
    sums up to ~1e13 with 1e6 hours/user, or ~1e15 with 1e4 hours.
    Either envelope is far beyond the fixture's ~1e12-value x ~7e2-hour
    class; a feed that genuinely exceeds it needs the squares split
    into a wider representation before this predicate is safe.
    """
    from pyspark.sql import Window

    series = hourly_series(events)
    w = Window.partitionBy("user_id")
    d = F.col("v").cast("decimal(19,0)")
    scored = series.select(
        "user_id",
        "hour_bucket",
        "v",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum(d).over(w).alias("sx"),
        F.sum(d * d).over(w).alias("sxx"),
    )
    nd = F.col("n").cast("decimal(20,0)")
    dev = nd * F.col("v").cast("decimal(19,0)") - F.col("sx")
    varn = nd * F.col("sxx") - F.col("sx") * F.col("sx")
    # fround: exact-integer ratio dev^2/varn — tie-reachable at the
    # 5th decimal (r10 round-half-tie audit).
    zsq = fround(
        dev.cast("double") * dev.cast("double")
        / F.expr("nullif(CAST((CAST(n AS DECIMAL(20,0)) * sxx - sx * sx) "
                 "AS DOUBLE), 0.0D)"),
        4,
    )
    return (
        scored.filter(
            (F.col("n") >= min_hours)
            & (dev * dev > F.lit(z_sq_threshold) * varn)
        )
        .select(
            "user_id",
            "hour_bucket",
            F.col("v").alias("qv"),
            F.col("n").alias("n_hours"),
            zsq.alias("zsq"),
        )
        .orderBy("user_id", "hour_bucket")
    )


@register(
    "series_anomalies",
    oracle=f"""
    WITH series AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
               AS hour_bucket,
             SUM(CAST(round(value * {_TS_SCALE}.0) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ), st AS (
      SELECT user_id, hour_bucket, v,
             COUNT(*) OVER w AS n,
             SUM(CAST(v AS HUGEINT)) OVER w AS sx,
             SUM(CAST(v AS HUGEINT) * v) OVER w AS sxx
      FROM series
      WINDOW w AS (PARTITION BY user_id)
    )
    SELECT user_id, hour_bucket, CAST(v AS BIGINT) AS qv,
           CAST(n AS BIGINT) AS n_hours,
           (CAST(floor((CAST(n*CAST(v AS HUGEINT) - sx AS DOUBLE)
                 * CAST(n*CAST(v AS HUGEINT) - sx AS DOUBLE)
                 / nullif(CAST(n*sxx - sx*sx AS DOUBLE), 0.0))
                 * 1e4 + 0.5) AS DOUBLE) / 1e4) AS zsq
    FROM st
    WHERE n >= 24
      AND (n*CAST(v AS HUGEINT) - sx) * (n*CAST(v AS HUGEINT) - sx)
          > 9 * (n*sxx - sx*sx)
    ORDER BY user_id, hour_bucket
    """,
    description="per-series anomaly detection: hours deviating > 3 "
    "sigma from the user's own mean, decided by the EXACT integer "
    "predicate (n*v - sx)^2 > 9*(n*sxx - sx^2) (squared z-test, n^2-"
    "scaled — no sqrt/division, bit-deterministic under any "
    "partitioning; squares in decimal(38,0)/HUGEINT); per-user window "
    "sums shuffle only the aggregated series rows, zero series-vs-"
    "series traffic",
    covers=("N-sim", "X-window", "B4"),
)
def series_anomalies_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return series_anomalies(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# rolling active users: sliding-window distinct via bounded expansion
# ---------------------------------------------------------------------------


def rolling_active_users(events: DataFrame, window_hours: int = 24) -> DataFrame:
    """Trailing-``window_hours`` distinct active users per hour bucket
    (the DAU-over-sliding-window analytic): for every hour present in
    the data, how many distinct users had at least one event in
    ``(hour - window_hours, hour]``.

    Sliding-window COUNT(DISTINCT) has no shuffle-free exact form, and
    the naive range join (hours x events, BETWEEN predicate) is a
    nested loop at scale. The scalable exact plan is **bounded window
    expansion**: dedup to (user, hour) presence rows first (one
    aggregate — the explosive raw event stream collapses to at most
    |users| x |hours| rows), explode each presence row into the
    ``window_hours`` window-ends it contributes to (a narrow,
    constant-factor generator — no shuffle), and finish with one
    two-phase ``count_distinct`` keyed on the window-end. Whether a
    window-end actually OCCURS in the data rides the same aggregate —
    ``max(window_end = hour_bucket)`` over the carried source hour — so
    non-occurring ends are dropped by a post-aggregate filter instead
    of the r9 semi-join against a distinct-hours set, which re-ran the
    events scan + presence dedup a second time (r10 single-scan sweep;
    plan-gated). Cost: ``window_hours x |presence rows|`` narrow work +
    two keyed shuffles, independent of raw event volume beyond the
    first dedup.
    """
    hour = F.floor(
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        / F.lit(3600)
    ).cast("long")
    presence = (
        events.select(F.col("user_id"), hour.alias("hour_bucket")).distinct()
    )
    expanded = presence.select(
        "user_id",
        "hour_bucket",
        F.explode(
            F.sequence(
                F.col("hour_bucket"),
                F.col("hour_bucket") + F.lit(window_hours - 1),
            )
        ).alias("window_end"),
    )
    return (
        expanded.groupBy("window_end")
        .agg(
            F.count_distinct("user_id").alias("active_users"),
            F.max(
                (F.col("window_end") == F.col("hour_bucket")).cast("int")
            ).alias("_occ"),
        )
        .filter(F.col("_occ") == 1)
        .select("window_end", "active_users")
        .orderBy("window_end")
    )


@register(
    "rolling_active_users",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
               AS hour_bucket
      FROM events
    ), hours AS (SELECT DISTINCT hour_bucket FROM uh)
    SELECT h.hour_bucket AS window_end,
           COUNT(DISTINCT u.user_id) AS active_users
    FROM hours h
    JOIN uh u ON u.hour_bucket BETWEEN h.hour_bucket - 23 AND h.hour_bucket
    GROUP BY 1 ORDER BY 1
    """,
    description="trailing-24h distinct active users per hour: presence "
    "dedup -> bounded x24 window expansion (narrow generator, no range "
    "join) -> broadcast semi-join on occurring hours -> one two-phase "
    "count_distinct keyed on window-end; the oracle brute-forces the "
    "BETWEEN range join the expansion replaces",
    covers=("X-window",),
)
def rolling_active_users_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rolling_active_users(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# time-weighted average: irregular-series aggregation
# ---------------------------------------------------------------------------


def time_weighted_value(events: DataFrame) -> DataFrame:
    """Per-user time-weighted average of ``value`` over irregular event
    times — the TSDB continuous-aggregate primitive (a sensor that
    reports on change, a metered rate, a position held between fills):
    each reading is weighted by how long it was current (until the next
    event), so burst-sampled periods don't dominate the mean the way
    they do in a plain AVG.

    Exactness recipe: values quantize to cents (``floor(x*100+0.5)``),
    durations are integer NTZ seconds (``timestampdiff`` over the LEAD
    pair — timezone-pure), and the weighted sum accumulates
    ``cents * seconds`` in DECIMAL(38,0)/HUGEINT — associative integer
    addition, partitioning-independent — with ONE double division chain
    at the end, identical on both engines. The last reading per user
    holds no duration and contributes nothing; an all-same-timestamp
    user has zero held time and a NULL average (nullif, both engines).

    Scale: one shuffle on user_id, one in-partition sort shared by the
    LEAD window, then a hash aggregate — the sessionization cost class.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    seg = (
        events.select(
            "user_id",
            "event_id",
            "ts",
            cents.alias("_c"),
            F.lead("ts").over(w).alias("_nts"),
        )
        .filter(F.col("_nts").isNotNull() & F.col("_c").isNotNull())
        .select(
            "user_id",
            "_c",
            F.expr("timestampdiff(SECOND, ts, _nts)").alias("_dur"),
        )
    )
    agg = seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("_dur").alias("held_s"),
        F.sum(
            (F.col("_c") * F.col("_dur")).cast("decimal(38,0)")
        ).alias("_ws"),
    )
    twa = (
        F.col("_ws").cast("double")
        / F.expr("nullif(CAST(held_s AS DOUBLE), 0.0D)")
        / F.lit(100.0)
    )
    return agg.select(
        "user_id",
        "n_segments",
        "held_s",
        # fround: exact-integer ratio ws/held_s — tie-reachable (r10
        # round-half-tie audit).
        fround(twa, 4).alias("twa_value"),
    ).orderBy("user_id")


@register(
    "time_weighted_value",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS c,
             CAST(floor(epoch(LEAD(ts) OVER (PARTITION BY user_id
                                             ORDER BY ts ASC, event_id ASC))
                        - epoch(ts)) AS BIGINT) AS dur
      FROM events
      QUALIFY dur IS NOT NULL AND c IS NOT NULL
    ), agg AS (
      SELECT user_id,
             COUNT(*) AS n_segments,
             CAST(SUM(dur) AS BIGINT) AS held_s,
             SUM(c * dur) AS ws
      FROM seg GROUP BY 1
    )
    SELECT user_id, n_segments, held_s,
           (CAST(floor((CAST(ws AS DOUBLE)
                 / nullif(CAST(held_s AS DOUBLE), 0.0) / 100.0)
                 * 1e4 + 0.5) AS DOUBLE) / 1e4)
             AS twa_value
    FROM agg ORDER BY user_id
    """,
    description="per-user time-weighted average of event values over "
    "irregular times (each reading weighted by how long it was current "
    "— the TSDB continuous-aggregate primitive): cents x integer NTZ "
    "seconds accumulated in DECIMAL(38,0)/HUGEINT, one double division "
    "chain at the end; one user shuffle, one sorted LEAD window, one "
    "hash aggregate",
    covers=("X-window", "N-quality"),
)
def time_weighted_value_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return time_weighted_value(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# series autocorrelation: exact-integer lag-1 ACF per user
# ---------------------------------------------------------------------------


def series_autocorr(events: DataFrame, min_pairs: int = 4) -> DataFrame:
    """Lag-1 autocorrelation of each user's hourly value series — the
    periodicity/burstiness fingerprint (ACF(1) near +1 = smooth trend,
    near -1 = alternating spikes, near 0 = white noise), a standard
    data-quality signal for deciding whether a feed is organic traffic
    or a synthetic/bot pattern before it enters training aggregates
    (reference analog: the metrics queries over the events feed,
    /root/reference/api-service/src/query_engine.py:137).

    Exactness discipline (the ``series_anomalies`` pattern): adjacent
    pairs are formed only for CONSECUTIVE present hours (``h1 = h+1`` —
    gaps never fabricate pairs), and every sufficient statistic
    (n, Σx, Σy, Σxy, Σx², Σy² over the 1e-6-quantized BIGINT hourly
    sums) accumulates in decimal(38,0)/HUGEINT, so the Pearson inputs
    are bit-identical on any engine under any partitioning; the single
    float seam is the final presentation division/sqrt, rounded to 4.

    Shape: one hash aggregate (events → series points), one per-user
    sorted LEAD window over the AGGREGATED series, then a per-user hash
    aggregate that REUSES the window's hash partitioning — the second
    exchange moves one row per (user, hour), and nothing downstream of
    it shuffles again. Magnitude bound as documented on
    ``series_anomalies``: binding terms scale as (n·max|v|)², safe
    under decimal(38,0) while n·max|v| < ~1e19.
    """
    from pyspark.sql import Window

    series = hourly_series(events)
    w = Window.partitionBy("user_id").orderBy("hour_bucket")
    paired = series.select(
        "user_id",
        "hour_bucket",
        "v",
        F.lead("v", 1).over(w).alias("v1"),
        F.lead("hour_bucket", 1).over(w).alias("h1"),
    ).filter(F.col("h1") == F.col("hour_bucket") + F.lit(1))
    x = F.col("v").cast("decimal(19,0)")
    y = F.col("v1").cast("decimal(19,0)")
    agg = (
        paired.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * y).alias("sxy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
        )
        .filter(F.col("n_pairs") >= min_pairs)
    )
    m = F.col("n_pairs").cast("decimal(20,0)")
    num = m * F.col("sxy") - F.col("sx") * F.col("sy")
    denx = m * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = m * F.col("syy") - F.col("sy") * F.col("sy")
    den = F.sqrt(denx.cast("double") * deny.cast("double"))
    # fround: integer-moment ratio with a sqrt denominator — a
    # perfect-square denominator makes the quotient tie-reachable (r10
    # round-half-tie audit).
    acf1 = fround(
        num.cast("double") / F.when(den != F.lit(0.0), den),
        4,
    )
    return agg.select(
        "user_id",
        F.col("n_pairs").cast("long").alias("n_pairs"),
        acf1.alias("acf1"),
    ).orderBy("user_id")


@register(
    "series_autocorr",
    oracle=f"""
    WITH series AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT)
               AS hour_bucket,
             SUM(CAST(round(value * {_TS_SCALE}.0) AS BIGINT)) AS v
      FROM events GROUP BY 1, 2
    ), leads AS (
      SELECT user_id, hour_bucket, v,
             LEAD(v, 1) OVER w AS v1,
             LEAD(hour_bucket, 1) OVER w AS h1
      FROM series
      WINDOW w AS (PARTITION BY user_id ORDER BY hour_bucket ASC)
    ), pairs AS (
      SELECT user_id, CAST(v AS HUGEINT) AS x, CAST(v1 AS HUGEINT) AS y
      FROM leads WHERE h1 = hour_bucket + 1
    ), agg AS (
      SELECT user_id, COUNT(*) AS m,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sxx, SUM(y*y) AS syy
      FROM pairs GROUP BY 1 HAVING COUNT(*) >= 4
    )
    SELECT user_id, CAST(m AS BIGINT) AS n_pairs,
           (CAST(floor((CAST(m*sxy - sx*sy AS DOUBLE)
                 / nullif(sqrt(CAST(m*sxx - sx*sx AS DOUBLE)
                               * CAST(m*syy - sy*sy AS DOUBLE)), 0.0))
                 * 1e4 + 0.5) AS DOUBLE) / 1e4)
             AS acf1
    FROM agg ORDER BY user_id
    """,
    description="per-user lag-1 autocorrelation of the hourly value "
    "series (periodicity / bot-pattern fingerprint): consecutive-hour "
    "pairs only, all six sufficient statistics exact in decimal(38,0)/"
    "HUGEINT over quantized BIGINT sums, one presentation-only double "
    "division at the end; window + final aggregate share one user_id "
    "exchange over aggregated series rows",
    covers=("N-sim", "X-window", "B4"),
)
def series_autocorr_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return series_autocorr(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# month-over-month growth: LAG over the aggregated month series
# ---------------------------------------------------------------------------


def revenue_mom_growth(orders: DataFrame) -> DataFrame:
    """Month-over-month revenue growth in integer basis points — the
    trend readout over the whole order stream: one month-keyed hash
    aggregate (map-side partials; the shuffle carries one row per
    month), then LAG + the growth expression over the TINY month
    series.

    Month index and calendar fields use the pre-1970-safe integer
    identities (``div``/``pmod`` on the Spark side mirrored by
    ``//``/nonneg-``%`` — see ``open_orders_timeline``); revenue is
    exact cents; growth is ``(cur − prev)·10000 div prev`` — exact
    integer basis points, NULL for the first month and for a zero
    previous month (both engines).
    """
    from pyspark.sql import Window

    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    midx = (
        (F.year("o_orderdate") - F.lit(1970)) * 12
        + F.month("o_orderdate") - 1
    ).cast("long")
    per_month = (
        orders.select(midx.alias("m"), cents.alias("c"))
        .filter(F.col("m").isNotNull() & F.col("c").isNotNull())
        .groupBy("m")
        .agg(F.sum("c").alias("rev_cents"))
    )
    w = Window.orderBy("m")
    staged = per_month.select(
        "m",
        (F.lit(1970) + F.expr("(m - pmod(m, 12)) div 12"))
        .cast("long").alias("year"),
        (F.pmod(F.col("m"), F.lit(12)) + 1).cast("long").alias("month"),
        "rev_cents",
        F.lag("rev_cents", 1).over(w).alias("prev_cents"),
    )
    growth = F.expr(
        "((rev_cents - prev_cents) * 10000) div nullif(prev_cents, 0)"
    )
    return staged.select(
        "m", "year", "month", "rev_cents",
        # DOUBLE, not BIGINT: the first month's growth is NULL and a
        # NULL-bearing int column floats through the driver's pandas
        # canonicalization (values are exact small integers)
        growth.cast("double").alias("growth_bp"),
    ).orderBy("m")


@register(
    "revenue_mom_growth",
    oracle="""
    WITH per_month AS (
      SELECT (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS m,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS rev_cents
      FROM orders
      WHERE o_orderdate IS NOT NULL
        AND floor(o_totalprice * 100.0 + 0.5) IS NOT NULL
      GROUP BY 1
    ), staged AS (
      SELECT m,
             CAST(1970 + (m - ((m % 12 + 12) % 12)) // 12 AS BIGINT)
               AS year,
             CAST((m % 12 + 12) % 12 + 1 AS BIGINT) AS month,
             rev_cents,
             LAG(rev_cents, 1) OVER (ORDER BY m) AS prev_cents
      FROM per_month
    )
    SELECT CAST(m AS BIGINT) AS m, year, month,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           CAST(((rev_cents - prev_cents) * 10000)
                // nullif(prev_cents, 0) AS DOUBLE) AS growth_bp
    FROM staged ORDER BY m
    """,
    description="month-over-month revenue growth in exact integer "
    "basis points: one month aggregate (shuffle carries one row per "
    "month), LAG over the tiny series, pre-1970-safe calendar "
    "identities, NULL growth for first/zero-base months",
    covers=("X-window", "B4"),
)
def revenue_mom_growth_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return revenue_mom_growth(_t(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# stickiness ratio: DAU/WAU engagement per epoch week
# ---------------------------------------------------------------------------


def stickiness_ratio(events: DataFrame) -> DataFrame:
    """Weekly stickiness — average daily active users over weekly
    active users, the standard DAU/WAU engagement ratio (10000 bp =
    every weekly user active all 7 days): the cohort-health readout
    next to ``rolling_active_users``'s sliding window.

    All integer: epoch days/weeks via the floor-division identities
    (pre-1970-safe, no calendar seam), ``stickiness_bp =
    Σ_day |DAU| · 10000 div (7 · |WAU|)``.

    Shape (r10 single-scan rewrite — the dau-branch/wau-branch
    formulation scanned events twice and joined): each (week, user)
    collapses to a 7-BIT DAY MASK — ``bit_or(1 << pmod(day, 7))`` — in
    one associative map-side-combining aggregate straight off the raw
    stream (no presence-distinct pass; the mask IS the dedup). Then
    per week: ``wau = count(*)``, ``sum_dau = Σ bit_count(mask)``
    (Σ_user days-active ≡ Σ_day DAU), ``n_days =
    bit_count(bit_or(mask))``. One scan, two bounded shuffles, no
    join; the oracle keeps the naive DAU/WAU formulation as the
    semantic spec.
    """
    es = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    day = F.floor(es / F.lit(86400)).cast("long")
    base = events.select(F.col("user_id"), day.alias("d")).filter(
        F.col("user_id").isNotNull() & F.col("d").isNotNull()
    )
    week = F.expr("(d - pmod(d, 7)) div 7").cast("long")
    per_wu = (
        base.select(
            week.alias("w"),
            "user_id",
            F.expr("shiftleft(1, CAST(pmod(d, 7) AS INT))").alias("_bit"),
        )
        .groupBy("w", "user_id")
        .agg(F.expr("bit_or(_bit)").alias("_mask"))
    )
    return (
        per_wu.groupBy("w")
        .agg(
            F.expr("CAST(bit_count(bit_or(_mask)) AS BIGINT)").alias(
                "n_days"
            ),
            F.expr("CAST(SUM(bit_count(_mask)) AS BIGINT)").alias(
                "sum_dau"
            ),
            F.count(F.lit(1)).alias("wau"),
        )
        .select(
            "w",
            "n_days",
            "sum_dau",
            "wau",
            F.expr("(sum_dau * 10000) div (7 * wau)")
            .cast("long")
            .alias("stickiness_bp"),
        )
        .orderBy("w")
    )


@register(
    "stickiness_ratio",
    oracle="""
    WITH presence AS (
      SELECT DISTINCT user_id,
             (es - ((es % 86400 + 86400) % 86400)) // 86400 AS d
      FROM (
        SELECT user_id,
               CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es
        FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL)
    ), dau AS (
      SELECT (d - ((d % 7 + 7) % 7)) // 7 AS w,
             SUM(dau) AS sum_dau, COUNT(*) AS n_days
      FROM (SELECT d, COUNT(*) AS dau FROM presence GROUP BY d)
      GROUP BY 1
    ), wau AS (
      SELECT w, COUNT(*) AS wau FROM (
        SELECT DISTINCT (d - ((d % 7 + 7) % 7)) // 7 AS w, user_id
        FROM presence)
      GROUP BY w
    )
    SELECT CAST(w AS BIGINT) AS w,
           CAST(n_days AS BIGINT) AS n_days,
           CAST(sum_dau AS BIGINT) AS sum_dau,
           CAST(wau AS BIGINT) AS wau,
           CAST((sum_dau * 10000) // (7 * wau) AS BIGINT) AS stickiness_bp
    FROM dau JOIN wau USING (w)
    ORDER BY w
    """,
    description="weekly DAU/WAU stickiness in exact integer basis "
    "points: (user, day) presence dedup once, two keyed aggregates "
    "over the presence frame, pre-1970-safe epoch-week identities",
    covers=("B5", "B4", "X-window"),
)
def stickiness_ratio_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stickiness_ratio(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# CUSUM changepoint screen over daily revenue (r9)
# ---------------------------------------------------------------------------


def changepoint_cusum(orders: DataFrame) -> DataFrame:
    """CUSUM changepoint screen on the daily revenue series: the running
    sum of deviations from the series mean peaks (in absolute value) at
    the most likely level-shift point — the standard first-pass detector
    for "did the data-generating process change on some day".

    Exactness trick: with ``prefix_t`` = cumulative cents through day t
    and ``total`` over n days, ``cusum_t = prefix_t - t*(total/n)`` is
    computed as the INTEGER ``n*prefix_t - t*total`` (associative,
    engine-independent — no running double accumulation whose summation
    tree could differ) and divided ONCE per row for the dollar-scale
    output. int64 bound: n_days * total_cents must stay under 2^63 —
    ~9e18, comfortable for any horizon whose daily series a single
    window pass should hold anyway.

    Scale: one scan -> per-day aggregate (map-side partial) -> windows
    over the DAY SERIES (bounded by the calendar horizon, never
    data-sized). The max-|cusum| flag is a second pass over the same
    tiny series."""
    from pyspark.sql.window import Window

    day = F.expr(
        "timestampdiff(DAY, TIMESTAMP_NTZ '1970-01-01 00:00:00', o_orderdate)"
    )
    cents = F.expr("CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)")
    daily = (
        orders.filter(
            F.col("o_orderdate").isNotNull()
            & F.col("o_totalprice").isNotNull()
        )
        .select(day.alias("day"), cents.alias("c"))
        .groupBy("day")
        .agg(F.sum("c").alias("rev_cents"))
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    mx = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    # _total/_n ride the SAME whole-frame window pass as the prefix —
    # the embedding_pca_step trick — instead of a daily.agg() +
    # crossJoin(broadcast) normalizer, which RECOMPUTES the orders scan
    # (r9 verdict: 3 scan nodes, only one runtime reuse). One scan, one
    # day-series sort, zero joins (plan-gated in test_plans).
    staged = daily.select(
        "day",
        "rev_cents",
        F.sum("rev_cents").over(w).alias("_prefix"),
        F.row_number().over(Window.orderBy("day")).alias("_t"),
        F.sum("rev_cents").over(mx).alias("_total"),
        F.count(F.lit(1)).over(mx).alias("_n"),
    )
    scaled = F.col("_n") * F.col("_prefix") - F.col("_t") * F.col("_total")
    out = staged.select(
        F.col("day").cast("bigint").alias("day"),
        F.col("rev_cents").cast("bigint").alias("rev_cents"),
        scaled.alias("_s"),
        "_n",
    ).withColumn("_peak", F.max(F.abs(F.col("_s"))).over(mx))
    return out.select(
        "day",
        "rev_cents",
        # fround: exact-integer ratio _s/(100*_n) — tie-reachable
        # (r10 round-half-tie audit).
        fround(
            F.col("_s").cast("double") / (F.lit(100.0) * F.col("_n")), 4
        ).alias("cusum"),
        (F.abs(F.col("_s")) == F.col("_peak")).cast("int").alias("is_peak"),
    ).orderBy("day")


@register(
    "changepoint_cusum",
    oracle="""
    WITH daily AS (
      SELECT date_diff('day', TIMESTAMP '1970-01-01 00:00:00',
                       o_orderdate) AS day,
             SUM(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
               AS rev_cents
      FROM orders
      WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
      GROUP BY 1
    ), staged AS (
      SELECT day, rev_cents,
             SUM(rev_cents) OVER (ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS _prefix,
             ROW_NUMBER() OVER (ORDER BY day) AS _t
      FROM daily
    ), t AS (
      SELECT CAST(SUM(rev_cents) AS BIGINT) AS _total,
             COUNT(*) AS _n FROM daily
    ), s AS (
      SELECT day, rev_cents,
             CAST(_n * _prefix - _t * _total AS BIGINT) AS _s
      FROM staged, t
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(rev_cents AS BIGINT) AS rev_cents,
           (CAST(floor((CAST(_s AS DOUBLE) / (100.0 * _n))
                 * 1e4 + 0.5) AS DOUBLE) / 1e4) AS cusum,
           CAST(abs(_s) = MAX(abs(_s)) OVER () AS INT) AS is_peak
    FROM s, t
    ORDER BY day
    """,
    description="CUSUM changepoint screen on daily revenue: cumulative "
    "deviation from the series mean via the exact integer form "
    "n*prefix - t*total (one double division per row, no running float "
    "accumulation), |cusum| peak flagged; windows only over the bounded "
    "day series",
    covers=("X-window", "N-quality"),
)
def changepoint_cusum_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return changepoint_cusum(load_table(spark, sf_dir, "orders"))


# ---------------------------------------------------------------------------
# cumulative distinct users (first-seen trick)
# ---------------------------------------------------------------------------


def cumulative_distinct_users(events: DataFrame) -> DataFrame:
    """Per-day new and cumulative distinct users — the audience-growth
    curve every event pipeline publishes.

    A naive per-day ``COUNT(DISTINCT user) OVER (ORDER BY day)`` has no
    scalable form (distinct state grows with history); the exact
    linear-state plan is the FIRST-SEEN trick: min-day per user (one
    keyed aggregate with map-side partials), count first-appearances per
    day (second tiny aggregate), then a cumulative sum over the
    |days|-row series — metadata-sized, one ordered window. Days with
    events but no NEW users still appear (new_users = 0) via the
    occurring-day set carried through the SAME first aggregate — no
    second corpus scan (the r10 single-scan discipline). Day buckets are
    epoch-day integers over the NTZ timestamp (``timestampdiff`` from
    the NTZ epoch — never ``unix_timestamp``, whose LTZ cast shifts
    buckets by the session offset; the r6 Kathmandu bug class).
    """
    day = F.floor(
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        / F.lit(86400)
    ).cast("long")
    # NULL-ts rows have no day bucket: drop them explicitly on BOTH
    # engines (collect_set would silently skip them here while a naive
    # oracle DISTINCT would retain a NULL day row — the r11 ADVICE seam)
    per_user = (
        events.select(F.col("user_id"), day.alias("_d"))
        .where(F.col("_d").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min("_d").alias("first_day"),
            F.collect_set("_d").alias("_days"),
        )
    )
    # occurring days ride the same aggregate: explode the per-user day
    # sets and dedup — |users|·|active days/user| rows, far below raw
    # event volume (bounded by the first aggregate's output)
    occurring = (
        per_user.select(F.explode("_days").alias("day_bucket")).distinct()
    )
    news = per_user.groupBy(F.col("first_day").alias("day_bucket")).agg(
        F.count(F.lit(1)).alias("_new")
    )
    from pyspark.sql import Window

    w = Window.orderBy("day_bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        occurring.join(news, "day_bucket", "left")
        .select(
            "day_bucket", F.coalesce(F.col("_new"), F.lit(0)).alias("_new")
        )
        .select(
            "day_bucket",
            F.col("_new").cast("bigint").alias("new_users"),
            F.sum("_new").over(w).cast("bigint").alias("cum_users"),
        )
        .orderBy("day_bucket")
    )


@register(
    "cumulative_distinct_users",
    oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
               AS day_bucket
      FROM events WHERE ts IS NOT NULL
    ), fs AS (
      SELECT user_id, MIN(day_bucket) AS first_day FROM d GROUP BY user_id
    ), occ AS (SELECT DISTINCT day_bucket FROM d),
    news AS (
      SELECT first_day AS day_bucket, COUNT(*) AS _new
      FROM fs GROUP BY first_day
    )
    SELECT o.day_bucket,
           CAST(COALESCE(n._new, 0) AS BIGINT) AS new_users,
           CAST(SUM(COALESCE(n._new, 0)) OVER (ORDER BY o.day_bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM occ o LEFT JOIN news n USING (day_bucket)
    ORDER BY o.day_bucket
    """,
    description="audience-growth curve: per-day new + cumulative distinct "
    "users via the first-seen trick (min-day per user -> per-day counts "
    "-> |days|-row cumsum) — linear state where a windowed "
    "COUNT(DISTINCT) cannot scale; occurring days ride the same "
    "aggregate; NTZ epoch-day buckets",
    covers=("X-window", "B5"),
)
def cumulative_distinct_users_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return cumulative_distinct_users(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# sliding-window rate-limit audit
# ---------------------------------------------------------------------------

#: per-user events allowed in any 60-second window (the data-side twin
#: of the gateway's 50/min limiter, scaled to the fixture's traffic).
RATE_LIMIT_PER_MIN = 10


def rate_limit_audit(
    events: DataFrame, limit: int = RATE_LIMIT_PER_MIN
) -> DataFrame:
    """Per-user peak sliding-minute rate and violation counts — the
    offline audit of the gateway's rate limiter (reference analog:
    ``api-service/src/rate_limiter.py``'s 50/min window, here measured
    over the event log instead of enforced at the door).

    For every event, the count of the SAME user's events in the
    forward 60-second window ``[t, t+59s]`` — an exact sliding window
    via one RANGE frame over integer NTZ epoch-seconds (both engines
    define RANGE frames over ties identically: all equal-timestamp rows
    join the frame). One keyed shuffle, linear per-user state; the
    |users|-row rollup reports the peak window, how many window starts
    exceed ``limit``, and the total events.

    Epoch seconds via ``timestampdiff`` from the NTZ epoch — never
    ``unix_timestamp`` (the r6 Kathmandu bug class).
    """
    from pyspark.sql import Window

    es = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    ).cast("long")
    w = (
        Window.partitionBy("user_id")
        .orderBy("es")
        .rangeBetween(0, 59)
    )
    p = events.select(F.col("user_id"), es.alias("es")).withColumn(
        "_win", F.count(F.lit(1)).over(w)
    )
    return (
        p.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.max("_win").cast("bigint").alias("peak_minute"),
            F.sum(F.when(F.col("_win") > limit, 1).otherwise(0))
            .cast("bigint")
            .alias("n_window_viol"),
        )
        .orderBy("user_id")
    )


@register(
    "rate_limit_audit",
    oracle=f"""
    WITH p AS (
      SELECT user_id,
             COUNT(*) OVER (PARTITION BY user_id
                            ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP)))
                                          AS BIGINT)
                            RANGE BETWEEN CURRENT ROW AND 59 FOLLOWING)
               AS _win
      FROM events
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(MAX(_win) AS BIGINT) AS peak_minute,
           CAST(SUM(CASE WHEN _win > {RATE_LIMIT_PER_MIN} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_window_viol
    FROM p GROUP BY user_id ORDER BY user_id
    """,
    description="offline rate-limiter audit (gateway 50/min analog): per "
    "user the peak forward-60s sliding-window event count and how many "
    "window starts exceed the limit — ONE RANGE frame over integer NTZ "
    "epoch-seconds (tie-inclusive on both engines), one keyed shuffle, "
    "linear per-user state",
    covers=("X-window", "C12"),
)
def rate_limit_audit_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return rate_limit_audit(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# cohort retention matrix (r12)
# ---------------------------------------------------------------------------


def cohort_retention(events: DataFrame) -> DataFrame:
    """Day-cohort retention matrix: users cohorted by FIRST-seen epoch
    day; for every (cohort_day, day_offset) the count of cohort members
    active that day and the retention share in integer basis points —
    the activation/retention readout next to the audience-growth curve
    (:func:`cumulative_distinct_users`).

    Single-scan shape (the first-seen trick extended): ONE per-user
    aggregate carries both the first day and the distinct active-day
    set; exploding the bounded day set yields (cohort, offset)
    presence rows — |users|·|active days/user|, far below event volume
    — and the cohort size rides the offset-0 cell via a per-cohort
    window over the metadata-sized matrix. No join back to the corpus,
    no windowed COUNT(DISTINCT). NTZ epoch-day buckets
    (``timestampdiff``, the r6 Kathmandu discipline); NULL ts/user
    rows are out of scope on both engines.
    """
    from pyspark.sql import Window

    day = F.floor(
        F.expr(
            "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
        )
        / F.lit(86400)
    ).cast("long")
    per_user = (
        events.filter(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .select("user_id", day.alias("_d"))
        .groupBy("user_id")
        .agg(
            F.min("_d").alias("_first"),
            F.collect_set("_d").alias("_days"),
        )
    )
    presence = per_user.select(
        F.col("_first").alias("cohort_day"),
        F.explode("_days").alias("_day"),
    ).select(
        "cohort_day",
        (F.col("_day") - F.col("cohort_day")).alias("day_offset"),
    )
    cells = presence.groupBy("cohort_day", "day_offset").agg(
        F.count(F.lit(1)).cast("bigint").alias("active_users")
    )
    wc = Window.partitionBy("cohort_day")
    return (
        cells.withColumn(
            "cohort_size",
            F.max(
                F.when(F.col("day_offset") == 0, F.col("active_users"))
            ).over(wc),
        )
        .select(
            "cohort_day",
            "day_offset",
            "active_users",
            F.col("cohort_size").cast("bigint").alias("cohort_size"),
            F.expr("(10000 * active_users) div cohort_size")
            .cast("bigint")
            .alias("retention_bp"),
        )
        .orderBy("cohort_day", "day_offset")
    )


@register(
    "cohort_retention",
    oracle="""
    WITH d AS (
      SELECT user_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 86400) AS BIGINT)
               AS _d
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), pu AS (
      SELECT user_id, MIN(_d) AS _first, list_distinct(list(_d)) AS _days
      FROM d GROUP BY user_id
    ), presence AS (
      SELECT _first AS cohort_day, unnest(_days) - _first AS day_offset
      FROM pu
    ), cells AS (
      SELECT cohort_day, day_offset, COUNT(*) AS active_users
      FROM presence GROUP BY cohort_day, day_offset
    )
    SELECT cohort_day, day_offset,
           CAST(active_users AS BIGINT) AS active_users,
           CAST(MAX(CASE WHEN day_offset = 0 THEN active_users END)
                  OVER (PARTITION BY cohort_day) AS BIGINT) AS cohort_size,
           CAST((10000 * active_users)
                // MAX(CASE WHEN day_offset = 0 THEN active_users END)
                   OVER (PARTITION BY cohort_day) AS BIGINT)
             AS retention_bp
    FROM cells
    ORDER BY cohort_day, day_offset
    """,
    description="day-cohort retention matrix: users cohorted by first-"
    "seen day, per (cohort, offset) active members + retention bp — "
    "one per-user aggregate carries first day AND the distinct day set "
    "(no second scan, no windowed COUNT(DISTINCT)), cohort size rides "
    "the offset-0 cell via a window over the metadata-sized matrix",
    covers=("X-window", "B5"),
)
def cohort_retention_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return cohort_retention(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# ordered conversion funnel (r12)
# ---------------------------------------------------------------------------

#: funnel stages in order (event_type values of the events table)
FUNNEL_STAGES: tuple[str, ...] = ("view", "click", "purchase")


def event_funnel(events: DataFrame) -> DataFrame:
    """Ordered conversion funnel over the event stream: per stage, how
    many users reached it IN ORDER (first view, then the first click at
    or after it, then the first purchase at or after that click) and
    the conversion from the previous stage in basis points.

    One keyed shuffle: three chained window passes over the SAME
    user_id partitioning resolve the sequential "first X after first
    Y" dependencies (each stage's anchor is the previous window
    column, so no self-joins and no per-user sort explosion); a
    constant 3-row unpivot of the one-row aggregate yields the funnel.
    Equal timestamps count as reached (``>=`` — a click logged in the
    same microsecond as the view converts) on both engines; the
    event_id tiebreak is unnecessary because only the MIN timestamp
    per stage matters.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id")
    base = events.filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isin(*FUNNEL_STAGES)
    ).select("user_id", "event_type", "ts")
    s1, s2, s3 = FUNNEL_STAGES
    t1 = F.min(F.when(F.col("event_type") == s1, F.col("ts"))).over(w)
    staged = base.withColumn("_t1", t1)
    t2 = F.min(
        F.when(
            (F.col("event_type") == s2) & (F.col("ts") >= F.col("_t1")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("_t2", t2)
    t3 = F.min(
        F.when(
            (F.col("event_type") == s3) & (F.col("ts") >= F.col("_t2")),
            F.col("ts"),
        )
    ).over(w)
    staged = staged.withColumn("_t3", t3)
    per_user = staged.groupBy("user_id").agg(
        F.max(F.col("_t1").isNotNull().cast("int")).alias("_r1"),
        F.max(F.col("_t2").isNotNull().cast("int")).alias("_r2"),
        F.max(F.col("_t3").isNotNull().cast("int")).alias("_r3"),
    )
    # coalesce: SUM over an EMPTY corpus is NULL, and a NULL-bearing
    # BIGINT column floats through the driver's pandas canonicalization
    # (empty-corpus suite) — the funnel of nobody is all zeros
    totals = per_user.agg(
        F.coalesce(F.sum("_r1"), F.lit(0)).cast("bigint").alias("u1"),
        F.coalesce(F.sum("_r2"), F.lit(0)).cast("bigint").alias("u2"),
        F.coalesce(F.sum("_r3"), F.lit(0)).cast("bigint").alias("u3"),
    )
    stages = F.array(
        F.struct(
            F.lit(1).alias("stage_no"),
            F.lit(s1).alias("stage"),
            F.col("u1").alias("users"),
            F.col("u1").alias("prev"),
        ),
        F.struct(
            F.lit(2).alias("stage_no"),
            F.lit(s2).alias("stage"),
            F.col("u2").alias("users"),
            F.col("u1").alias("prev"),
        ),
        F.struct(
            F.lit(3).alias("stage_no"),
            F.lit(s3).alias("stage"),
            F.col("u3").alias("users"),
            F.col("u2").alias("prev"),
        ),
    )
    return (
        totals.select(F.explode(stages).alias("s"))
        .select(
            F.col("s.stage_no").cast("bigint").alias("stage_no"),
            F.col("s.stage").alias("stage"),
            F.col("s.users").alias("users"),
            F.when(F.col("s.prev") == 0, F.lit(0))
            .otherwise(F.expr("(10000 * s.users) div s.prev"))
            .cast("bigint")
            .alias("conversion_bp"),
        )
        .orderBy("stage_no")
    )


@register(
    "event_funnel",
    oracle=f"""
    WITH base AS (
      SELECT user_id, event_type, ts FROM events
      WHERE user_id IS NOT NULL AND ts IS NOT NULL
        AND event_type IN ('{FUNNEL_STAGES[0]}', '{FUNNEL_STAGES[1]}',
                           '{FUNNEL_STAGES[2]}')
    ), w1 AS (
      SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STAGES[0]}' THEN ts END)
                  OVER (PARTITION BY user_id) AS _t1
      FROM base
    ), w2 AS (
      SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STAGES[1]}'
                          AND ts >= _t1 THEN ts END)
                  OVER (PARTITION BY user_id) AS _t2
      FROM w1
    ), w3 AS (
      SELECT *, MIN(CASE WHEN event_type = '{FUNNEL_STAGES[2]}'
                          AND ts >= _t2 THEN ts END)
                  OVER (PARTITION BY user_id) AS _t3
      FROM w2
    ), pu AS (
      SELECT user_id,
             MAX(CASE WHEN _t1 IS NOT NULL THEN 1 ELSE 0 END) AS _r1,
             MAX(CASE WHEN _t2 IS NOT NULL THEN 1 ELSE 0 END) AS _r2,
             MAX(CASE WHEN _t3 IS NOT NULL THEN 1 ELSE 0 END) AS _r3
      FROM w3 GROUP BY user_id
    ), t AS (
      SELECT COALESCE(SUM(_r1), 0) AS u1,
             COALESCE(SUM(_r2), 0) AS u2,
             COALESCE(SUM(_r3), 0) AS u3 FROM pu
    )
    SELECT stage_no, stage, users, conversion_bp FROM (
      SELECT CAST(1 AS BIGINT) AS stage_no, '{FUNNEL_STAGES[0]}' AS stage,
             CAST(u1 AS BIGINT) AS users,
             CAST(CASE WHEN u1 = 0 THEN 0
                  ELSE (10000 * u1) // u1 END AS BIGINT) AS conversion_bp
      FROM t
      UNION ALL
      SELECT 2, '{FUNNEL_STAGES[1]}', CAST(u2 AS BIGINT),
             CAST(CASE WHEN u1 = 0 THEN 0
                  ELSE (10000 * u2) // u1 END AS BIGINT)
      FROM t
      UNION ALL
      SELECT 3, '{FUNNEL_STAGES[2]}', CAST(u3 AS BIGINT),
             CAST(CASE WHEN u2 = 0 THEN 0
                  ELSE (10000 * u3) // u2 END AS BIGINT)
      FROM t)
    ORDER BY stage_no
    """,
    description="ordered conversion funnel view->click->purchase: per "
    "stage the users reaching it in sequence (first-X-after-first-Y via "
    "three chained windows over ONE user_id shuffle, no self-joins) + "
    "stage conversion in bp; constant 3-row unpivot",
    covers=("X-window", "B5"),
)
def event_funnel_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return event_funnel(_t(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# event transition matrix (r12)
# ---------------------------------------------------------------------------


def event_transition_matrix(events: DataFrame) -> DataFrame:
    """First-order event-type transition matrix: for every consecutive
    pair in each user's (ts, event_id)-ordered stream, the count of
    (from_type, to_type) transitions and the row-normalized share in
    integer basis points — the behavioral fingerprint next to the
    funnel (:func:`event_funnel` asks "did they convert"; this asks
    "what do they do next, from anywhere").

    One keyed shuffle: ``lead(event_type)`` over the per-user order,
    then a |types|^2-row hash aggregate; the per-from totals are a
    window over that metadata-sized matrix. The last event of each user
    has no successor and drops (no self-padding sentinel). NULL ts /
    user rows are out of scope on both engines; the event_id tiebreak
    pins equal-timestamp ordering.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        events.filter(
            F.col("user_id").isNotNull() & F.col("ts").isNotNull()
        )
        .select(
            "user_id",
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    cells = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_transitions")
    )
    wf = Window.partitionBy("from_type")
    return (
        cells.withColumn(
            "_row_total", F.sum("n_transitions").over(wf)
        )
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            F.expr("(10000 * n_transitions) div _row_total")
            .cast("bigint")
            .alias("share_bp"),
        )
        .orderBy("from_type", "to_type")
    )


@register(
    "event_transition_matrix",
    oracle="""
    WITH p AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS to_type
      FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL
    ), cells AS (
      SELECT from_type, to_type, COUNT(*) AS n_transitions
      FROM p WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type,
           CAST(n_transitions AS BIGINT) AS n_transitions,
           CAST((10000 * n_transitions)
                // SUM(n_transitions) OVER (PARTITION BY from_type)
                AS BIGINT) AS share_bp
    FROM cells
    ORDER BY from_type, to_type
    """,
    description="first-order event-type transition matrix: per "
    "(from, to) consecutive-pair counts + row-normalized share bp — "
    "lead() over one user_id shuffle, |types|^2 aggregate, per-from "
    "totals as a window over the metadata-sized matrix",
    covers=("X-window", "B5"),
)
def event_transition_matrix_query(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    return event_transition_matrix(_t(spark, sf_dir, "events"))
