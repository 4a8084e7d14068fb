"""Temporal operators: as-of join (point-in-time lookup).

Spark has no native ASOF JOIN (DuckDB/Pandas do). The classic
range-join rewrite (join on key + ts inequality, then keep the max) is
quadratic within a key; the implementation here is the *union trick* —
a single shuffle, linear state:

1. Tag right rows side=0 and left rows side=1, union them aligned.
2. One window pass per key ordered by ``(ts, side)``: ``last(right_row,
   ignoreNulls)`` over the unbounded-preceding frame gives every left
   row the most recent right row with ``right.ts <= left.ts``
   (right-before-left at equal ts makes the match inclusive).
3. Keep the left rows; unmatched lefts carry NULLs (left-join
   semantics).

One shuffle on the key, sort within partitions, O(1) running state per
key — the same cost class as sessionization, at any scale. Skewed keys
hit the same window-shuffle limits as any keyed window; salting the key
and merging boundary matches is the standard escape hatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ser_etl_spark.functions.numeric import fround
from ser_etl_spark.registry import register
from ser_etl_spark.sources.parquet import load_table


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts_col: str = "ts",
) -> DataFrame:
    """For every left row, attach the latest right row with
    ``right.ts <= left.ts`` within the same ``on`` key (NULLs when no
    prior right row exists).

    Right-side columns come back under a ``matched`` struct column;
    callers project fields out (keeps the operator generic over any
    right schema with zero column-name collisions).
    """
    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_side"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*right.columns).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*[F.col(c) for c in right.columns]).alias("_r"),
    )
    return (
        _asof_last_match(l_tagged.unionByName(r_tagged))
        .select(F.col("_l").alias("left"), "matched")
        .select("left.*", "matched")
    )


def _asof_last_match(tagged: DataFrame) -> DataFrame:
    """The as-of WINDOW CORE shared by :func:`asof_join` and its
    single-scan twin ``purchase_attribution`` (r10 review: the twin
    previously inlined a byte-copy of this step, so a future tie/NULL
    semantics fix could silently diverge): per key ``_k``, order by
    ``(_ts, _side)`` ascending — a right row at the same timestamp
    sorts BEFORE the left row, making the match inclusive — and attach
    the running last non-null right struct; the surviving ``_side = 1``
    rows are the left side carrying their match (NULL = unmatched)."""
    w = (
        Window.partitionBy("_k")
        .orderBy(F.col("_ts").asc(), F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("matched", F.last("_r", ignorenulls=True).over(w))
        .filter(F.col("_side") == 1)
    )


@register(
    "purchase_attribution",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT event_id AS click_id, user_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    )
    SELECT p.event_id, p.user_id, p.ts,
           COALESCE(c.click_id, -1) AS click_id, c.click_ts,
           COALESCE(CAST(floor(epoch(p.ts) - epoch(c.click_ts)) AS BIGINT),
                    -1) AS gap_s
    FROM p ASOF LEFT JOIN c
      ON p.user_id = c.user_id AND p.ts >= c.click_ts
    """,
    description="as-of join: each purchase attributed to the user's most "
    "recent prior click — union trick (one keyed shuffle + running "
    "last-non-null window, linear state) vs DuckDB's native ASOF JOIN "
    "as the oracle; unmatched purchases keep left-join semantics with a "
    "-1 sentinel in the integer columns (a NULL in a BIGINT column flips "
    "the driver's pandas rendering of the whole column to float)",
    covers=("X-asof",),
)
def purchase_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Both as-of sides live in the SAME events table, so the union
    # trick's tagged frame is built from ONE scan (side = event_type)
    # instead of two filtered scans unioned (r10 single-scan sweep;
    # plan-gated). asof_join stays the generic two-frame operator for
    # genuinely distinct sides; the window semantics here are its
    # bit-twin: _side 1=left/0=right, (_ts, _side) ascending so a
    # same-timestamp click sorts before the purchase (ts >= inclusive).
    events = load_table(spark, sf_dir, "events")
    is_p = F.col("event_type") == "purchase"
    # NULL seams (r10 review): a NULL-user or NULL-ts CLICK must never
    # be a match candidate — the oracle's ASOF equality/inequality
    # rejects NULLs, while the NULL window-partition (and NULLS-FIRST
    # ASC _ts) would happily attach it. Purchases are kept regardless
    # (left-join semantics: they surface with the -1 sentinel).
    ev = events.filter(
        F.col("event_type").isin("purchase", "click")
    ).filter(
        is_p | (F.col("user_id").isNotNull() & F.col("ts").isNotNull())
    ).select("event_id", "user_id", "ts", "event_type")
    s = F.struct("event_id", "user_id", "ts")
    tagged = ev.select(
        F.col("user_id").alias("_k"),
        F.col("ts").alias("_ts"),
        is_p.cast("int").alias("_side"),
        F.when(is_p, s).alias("_l"),
        F.when(~is_p, s).alias("_r"),
    )
    joined = _asof_last_match(tagged).select(
        "_l.event_id", "_l.user_id", F.col("_l.ts").alias("ts"), "matched"
    )
    return joined.select(
        "event_id",
        "user_id",
        "ts",
        F.coalesce(F.col("matched.event_id"), F.lit(-1)).alias("click_id"),
        F.col("matched.ts").alias("click_ts"),
        F.coalesce(
            F.expr("timestampdiff(SECOND, matched.ts, ts)"), F.lit(-1)
        ).alias("gap_s"),
    )


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    horizon: str = "30 minutes",
) -> DataFrame:
    """All (left, right) pairs with the same key where the right event
    lands inside ``[left_ts, left_ts + horizon]``.

    The attribution-window join (view -> clicks within N minutes) —
    between the as-of join (nearest single match) and the band join
    (static value ranges) in the temporal family. Scale: an equi-join
    on the key carries the shuffle; the time bound is a residual
    predicate evaluated in the join, so there is no range explosion and
    no cross product — state per key is the events inside one horizon.
    """
    cond = (
        (left[on] == right[on])
        & (right[right_ts] >= left[left_ts])
        & (right[right_ts] <= left[left_ts] + F.expr(f"INTERVAL {horizon}"))
    )
    return left.join(right, cond)


@register(
    "view_click_interval",
    oracle="""
    WITH v AS (
      SELECT event_id AS vid, user_id, epoch_us(ts) AS v_us
      FROM events WHERE event_type = 'view'
        AND user_id IS NOT NULL AND ts IS NOT NULL
    ), c AS (
      SELECT user_id, epoch_us(ts) AS c_us
      FROM events WHERE event_type = 'click'
        AND user_id IS NOT NULL AND ts IS NOT NULL
    ), j AS (
      SELECT v.user_id, v.vid, (c.c_us - v.v_us) AS gap_us
      FROM v JOIN c
        ON v.user_id = c.user_id
       AND c.c_us >= v.v_us
       AND c.c_us <= v.v_us + 1800000000
    )
    SELECT user_id,
           COUNT(*) AS n_pairs,
           COUNT(DISTINCT vid) AS n_views_matched,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(SUM(gap_us) AS DOUBLE) / COUNT(*) AS avg_gap_us
    FROM j GROUP BY user_id
    """,
    description="attribution-window interval aggregate: clicks within "
    "30 min after each view of the same user. r10 single-scan rewrite: "
    "one scan of events (view+click rows tagged), per-view forward "
    "RANGE window over exact microsecond epochs — n and sum(click_us) "
    "in [v, v+30min] as conditional frame sums, so sum_gap_us = "
    "sum(c_us) - n*v_us decomposes exactly (gaps reported in integer "
    "microseconds; the r9 per-pair join floored to seconds, which "
    "doesn't decompose). The oracle keeps the naive interval join as "
    "the semantic spec; the streaming twin is streaming/joins.py "
    "stream_interval_join",
    covers=("B11", "X-session"),
)
def view_click_interval(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    ev = (
        events.filter(
            F.col("event_type").isin("view", "click")
            & F.col("user_id").isNotNull()
            & F.col("ts").isNotNull()
        )
        .select(
            "user_id",
            "event_id",
            us.alias("_us"),
            (F.col("event_type") == "click").alias("_is_click"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("_us")
        .rangeBetween(0, 30 * 60 * 1000000)
    )
    scored = ev.select(
        "user_id",
        "event_id",
        "_us",
        "_is_click",
        F.sum(F.col("_is_click").cast("bigint")).over(w).alias("_nc"),
        F.sum(F.when(F.col("_is_click"), F.col("_us"))).over(w).alias(
            "_sc_us"
        ),
    )
    per_view = scored.filter(~F.col("_is_click")).select(
        "user_id",
        F.col("_nc").alias("n_clicks"),
        (F.col("_sc_us") - F.col("_nc") * F.col("_us")).alias("gap_us"),
    )
    return (
        per_view.groupBy("user_id")
        .agg(
            F.sum("n_clicks").alias("n_pairs"),
            F.sum((F.col("n_clicks") > 0).cast("bigint")).alias(
                "n_views_matched"
            ),
            F.sum("gap_us").cast("bigint").alias("sum_gap_us"),
            (
                F.sum("gap_us").cast("double")
                / F.sum("n_clicks").cast("double")
            ).alias("avg_gap_us"),
        )
        .filter(F.col("n_pairs") > 0)
        .select(
            "user_id", "n_pairs", "n_views_matched", "sum_gap_us",
            "avg_gap_us",
        )
    )


def latest_per_key(
    df: DataFrame, key: str, ts_col: str, tiebreak: str
) -> DataFrame:
    """The most recent row per key (CDC read-side compaction).

    ROW_NUMBER over (key / ts desc / tiebreak desc) = 1 — the batch
    read-side of last-writer-wins merge (``etl/merge.py``): given an
    append-only change stream this reconstructs current state. Per-key
    windows shuffle once on the key and sort within partitions only;
    the deterministic tiebreak makes results reproducible under
    concurrent equal timestamps.
    """
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak).desc()
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


@register(
    "latest_event_per_user",
    oracle="""
    SELECT user_id, event_id, ts, event_type, value
    FROM (
      SELECT user_id, event_id, ts, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events)
    WHERE rn = 1
    """,
    description="latest-per-key compaction: each user's most recent "
    "event via a per-key window (one keyed shuffle, deterministic "
    "event_id tiebreak) — the read-side of last-writer-wins CDC merge",
    covers=("X-window", "A2"),
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type", "value"
    )
    return latest_per_key(events, "user_id", "ts", "event_id")


def transition_matrix(
    df: DataFrame,
    key: str,
    ts_col: str,
    type_col: str,
    tiebreak: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-key event sequences:
    ``(from_type, to_type, n_transitions, p)`` where ``p`` is the
    row-normalized transition probability.

    The sequence-mining complement to the funnel/attribution family:
    models *what follows what* (session simulation, next-event
    prediction features, bot-pattern detection) instead of matching one
    fixed pattern. One per-key window pass (LEAD over ``ts, tiebreak`` —
    deterministic under concurrent equal timestamps), then a hash
    aggregate on the (from, to) pair; the matrix is |types|^2 rows, so
    the normalizing per-from totals are a window over the tiny aggregate
    — nothing data-sized after the single keyed shuffle. ``p`` is two
    exact BIGINT counts -> one double division, round 6 (the
    cross-engine determinism recipe).
    """
    w = Window.partitionBy(key).orderBy(
        F.col(ts_col).asc(), F.col(tiebreak).asc()
    )
    pairs = df.select(
        F.col(type_col).alias("from_type"),
        F.lead(type_col).over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    totw = Window.partitionBy("from_type")
    # fround: counts ratio — tie-reachable at the 7th decimal (r10
    # round-half-tie audit).
    p = fround(
        F.col("n_transitions").cast("double")
        / F.sum("n_transitions").over(totw).cast("double"),
        6,
    )
    return counts.select(
        "from_type", "to_type", "n_transitions", p.alias("p")
    ).orderBy("from_type", "to_type")


@register(
    "event_transitions",
    oracle="""
    WITH seq AS (
      SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC)
               AS to_type
      FROM events
    ), c AS (
      SELECT from_type, to_type, COUNT(*) AS n_transitions
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY 1, 2
    )
    SELECT from_type, to_type, n_transitions,
           (CAST(floor((CAST(n_transitions AS DOUBLE)
                 / CAST(SUM(n_transitions) OVER (PARTITION BY from_type)
                        AS DOUBLE)) * 1e6 + 0.5) AS DOUBLE) / 1e6) AS p
    FROM c
    ORDER BY from_type, to_type
    """,
    description="first-order Markov transition matrix over per-user "
    "event sequences: (from, to) counts + row-normalized probabilities "
    "— one LEAD window pass (deterministic event_id tiebreak), one hash "
    "aggregate; normalization is a window over the |types|^2 aggregate, "
    "nothing data-sized after the single keyed shuffle",
    covers=("X-window", "B5"),
)
def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    return transition_matrix(events, "user_id", "ts", "event_type", "event_id")


# ---------------------------------------------------------------------------
# burst detection: sliding event-rate guard
# ---------------------------------------------------------------------------

#: Sliding window width (seconds) and the rate that flags a burst.
BURST_WINDOW_S = 3600
BURST_THRESHOLD = 3


def burst_detection(
    events: DataFrame,
    window_s: int = BURST_WINDOW_S,
    threshold: int = BURST_THRESHOLD,
) -> DataFrame:
    """Per-user sliding-window event-rate flags: every event whose
    trailing ``window_s`` seconds (inclusive) contain >= ``threshold``
    events by the same user. The abuse/bot-rate guard of an event
    pipeline (the reference's gateway rate-limits REQUESTS at 50/min,
    ``/root/reference/api-service/src/auth.py``; this is the same
    semantics applied to the DATA at rest), and the crawler-politeness /
    burst-QA pass of a training-data pipeline.

    Implemented as a numeric RANGE frame over epoch seconds —
    ``RANGE BETWEEN window_s - 1 PRECEDING AND CURRENT ROW`` — so the
    count is event-time true (not bucketed: a burst straddling an hour
    boundary still flags). Epoch seconds come from ``timestampdiff``
    over NTZ pairs (timezone-pure; the ``unix_timestamp`` session-tz
    trap is pinned by the config matrix). Equal-timestamp events are
    RANGE peers and count together on both engines.

    Scale: one shuffle on user_id, one in-partition sort, O(window)
    running state per user — the sessionization cost class. The
    streaming twin of this guard is ``streaming_sliding_counts``.
    """
    sec = F.expr(
        "timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("_s").asc())
        .rangeBetween(-(window_s - 1), 0)
    )
    return (
        events.select("user_id", "event_id", "ts", sec.alias("_s"))
        .withColumn("n_window", F.count(F.lit(1)).over(w))
        .filter(F.col("n_window") >= threshold)
        .select("user_id", "event_id", "n_window")
        .orderBy("user_id", "event_id")
    )


@register(
    "burst_detection",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id,
             CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS s
      FROM events
    ), c AS (
      SELECT user_id, event_id,
             COUNT(*) OVER (PARTITION BY user_id ORDER BY s ASC
                            RANGE BETWEEN {BURST_WINDOW_S - 1} PRECEDING
                                      AND CURRENT ROW) AS n_window
      FROM e
    )
    SELECT user_id, event_id, n_window
    FROM c WHERE n_window >= {BURST_THRESHOLD}
    ORDER BY user_id, event_id
    """,
    description="per-user burst detection: events whose trailing hour "
    "(inclusive, event-time-true numeric RANGE frame over NTZ epoch "
    "seconds) contains >= 3 events by the same user — one shuffle on "
    "user_id, one in-partition sort, O(window) running state; the "
    "at-rest twin of the gateway's request rate limit and of "
    "streaming_sliding_counts",
    covers=("X-window", "N-quality"),
)
def burst_detection_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return burst_detection(load_table(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# open-interval timeline: concurrent open orders per month via delta encoding
# ---------------------------------------------------------------------------


def open_orders_timeline(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Monthly backlog curve: how many orders are OPEN (placed but not
    fully shipped) at the end of every month — the interval-overlap
    aggregate that, done naively, is a range join of every order
    against every month. The scalable exact form is DELTA ENCODING:
    each order contributes +1 at its open month and -1 at its close
    month (= the max ship date over its line items, inner join — orders
    with no lines have no close and are excluded), the deltas collapse
    to per-month counts, and one cumulative-sum window over the TINY
    month series (decades = hundreds of rows) rebuilds the backlog.

    Month index is pure DATE-part arithmetic ``(year-1970)*12+month-1``
    (calendar fields of a DATE carry no timezone seam on either
    engine); the month domain materializes from a broadcast 1-row
    bounds aggregate so empty months still report their backlog.
    """
    from pyspark.sql import Window

    def midx(c: str):
        return (
            (F.year(F.col(c)) - F.lit(1970)) * 12 + F.month(F.col(c)) - 1
        ).cast("long")

    close = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("close_d")
    )
    spans = (
        orders.select("o_orderkey", "o_orderdate")
        .join(close, orders["o_orderkey"] == close["l_orderkey"])
        .select(midx("o_orderdate").alias("mo"), midx("close_d").alias("mc"))
        .filter(F.col("mo").isNotNull() & F.col("mc").isNotNull())
    )
    opened = spans.groupBy(F.col("mo").alias("m")).agg(
        F.count(F.lit(1)).alias("opened")
    )
    closed = spans.groupBy(F.col("mc").alias("m")).agg(
        F.count(F.lit(1)).alias("closed")
    )
    months = (
        spans.agg(F.min("mo").alias("lo"), F.max("mc").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("m"))
    )
    joined = (
        months.join(F.broadcast(opened), "m", "left")
        .join(F.broadcast(closed), "m", "left")
        .select(
            "m",
            F.coalesce("opened", F.lit(0)).alias("opened"),
            F.coalesce("closed", F.lit(0)).alias("closed"),
        )
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, 0)
    return joined.select(
        "m",
        # floor division via the pmod identity: a truncating `div` would
        # pair year 1970 with December for m = -1 (Dec 1969); exactly
        # divisible numerator makes div == floordiv
        (F.lit(1970) + F.expr("(m - pmod(m, 12)) div 12"))
        .cast("long").alias("year"),
        (F.pmod(F.col("m"), F.lit(12)) + 1).cast("long").alias("month"),
        "opened",
        "closed",
        F.sum(F.col("opened") - F.col("closed")).over(w).alias("open_end"),
    ).orderBy("m")


@register(
    "open_orders_timeline",
    oracle="""
    WITH close AS (
      SELECT l_orderkey, MAX(l_shipdate) AS close_d
      FROM lineitem GROUP BY l_orderkey
    ), spans AS (
      SELECT (year(o_orderdate) - 1970) * 12 + month(o_orderdate) - 1 AS mo,
             (year(close_d) - 1970) * 12 + month(close_d) - 1 AS mc
      FROM orders JOIN close ON o_orderkey = l_orderkey
      WHERE o_orderdate IS NOT NULL AND close_d IS NOT NULL
    ), opened AS (
      SELECT mo AS m, COUNT(*) AS opened FROM spans GROUP BY mo
    ), closed AS (
      SELECT mc AS m, COUNT(*) AS closed FROM spans GROUP BY mc
    ), months AS (
      SELECT unnest(generate_series(
        (SELECT MIN(mo) FROM spans), (SELECT MAX(mc) FROM spans))) AS m
    )
    SELECT CAST(m AS BIGINT) AS m,
           CAST(1970 + (m - ((m % 12 + 12) % 12)) // 12 AS BIGINT) AS year,
           CAST((m % 12 + 12) % 12 + 1 AS BIGINT) AS month,
           CAST(COALESCE(opened, 0) AS BIGINT) AS opened,
           CAST(COALESCE(closed, 0) AS BIGINT) AS closed,
           CAST(SUM(COALESCE(opened, 0) - COALESCE(closed, 0)) OVER (
             ORDER BY m
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_end
    FROM months
    LEFT JOIN opened USING (m)
    LEFT JOIN closed USING (m)
    ORDER BY m
    """,
    description="monthly open-order backlog via delta encoding: +1/-1 "
    "at open/close month, per-month delta aggregates, one cumulative "
    "window over the tiny month series — the scalable exact form of "
    "the order-x-month interval-overlap count; month index is pure "
    "DATE-part integer math",
    covers=("X-window", "B11", "B4"),
)
def open_orders_timeline_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return open_orders_timeline(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# fulfillment latency: order -> full-shipment percentiles per priority
# ---------------------------------------------------------------------------


def fulfillment_latency(orders: DataFrame, lineitem: DataFrame) -> DataFrame:
    """Order-to-full-shipment latency distribution per order priority —
    the SLA readout (does URGENT actually ship faster?): latency = days
    from order date to the LAST line shipment, with exact discrete
    p50/p90 order statistics per priority class.

    Exactness: latency is pure integer day arithmetic on DATEs (no
    timezone surface); the percentiles are the ``winsorized_stats``
    discrete-rank picks (value at rank ``ceil(q·n)`` under (latency,
    orderkey) order — real data points, no interpolation); the mean is
    an exact integer sum with one presentation division. Shape: one
    orderkey aggregate + equi-join, then a single priority-key exchange
    shared by the rank window and the final aggregate.
    """
    from pyspark.sql import Window

    close = lineitem.groupBy("l_orderkey").agg(
        F.max("l_shipdate").alias("close_d")
    )
    lat = (
        orders.select("o_orderkey", "o_custkey", "o_orderdate",
                      "o_orderpriority")
        .join(close, orders["o_orderkey"] == close["l_orderkey"])
        .select(
            "o_orderpriority",
            F.col("o_orderkey").alias("okey"),
            F.datediff("close_d", "o_orderdate").cast("long").alias("days"),
        )
        .filter(F.col("days").isNotNull())
    )
    wg = Window.partitionBy("o_orderpriority")
    wv = Window.partitionBy("o_orderpriority").orderBy(
        F.col("days").asc(), F.col("okey").asc()
    )
    s1 = lat.withColumn("_rn", F.row_number().over(wv).cast("bigint")) \
            .withColumn("_n", F.count(F.lit(1)).over(wg).cast("bigint"))
    pick50 = (F.col("_rn") == F.expr("(_n + 1) div 2")).cast("bigint")
    pick90 = (F.col("_rn") == F.expr("(_n * 90 + 99) div 100")).cast("bigint")
    s2 = s1.withColumn("p50", F.sum(F.col("days") * pick50).over(wg)) \
           .withColumn("p90", F.sum(F.col("days") * pick90).over(wg))
    return (
        s2.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.max("p50").alias("p50_days"),
            F.max("p90").alias("p90_days"),
            # fround: counts ratio — tie-reachable (r10 audit).
            fround(
                F.sum("days").cast("double")
                / F.count(F.lit(1)).cast("double"),
                4,
            ).alias("mean_days"),
        )
        .orderBy("o_orderpriority")
    )


@register(
    "fulfillment_latency",
    oracle="""
    WITH close AS (
      SELECT l_orderkey, MAX(l_shipdate) AS close_d
      FROM lineitem GROUP BY l_orderkey
    ), lat AS (
      SELECT o_orderpriority, o_orderkey AS okey,
             CAST(date_diff('day', CAST(o_orderdate AS DATE),
                            CAST(close_d AS DATE)) AS BIGINT) AS days
      FROM orders JOIN close ON o_orderkey = l_orderkey
      WHERE o_orderdate IS NOT NULL AND close_d IS NOT NULL
    ), s1 AS (
      SELECT o_orderpriority, okey, days,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                     ORDER BY days ASC, okey ASC) AS BIGINT)
               AS rn,
             CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
               AS n
      FROM lat
    ), s2 AS (
      SELECT *,
             CAST(SUM(days * CAST(rn = (n + 1) // 2 AS BIGINT))
                  OVER (PARTITION BY o_orderpriority) AS BIGINT) AS p50,
             CAST(SUM(days * CAST(rn = (n * 90 + 99) // 100 AS BIGINT))
                  OVER (PARTITION BY o_orderpriority) AS BIGINT) AS p90
      FROM s1
    )
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           CAST(MAX(p50) AS BIGINT) AS p50_days,
           CAST(MAX(p90) AS BIGINT) AS p90_days,
           (CAST(floor((CAST(SUM(days) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)) * 1e4 + 0.5) AS DOUBLE) / 1e4)
             AS mean_days
    FROM s2 GROUP BY o_orderpriority ORDER BY o_orderpriority
    """,
    description="SLA readout: order-to-full-shipment latency per "
    "priority with exact discrete p50/p90 (rank = ceil(q*n), orderkey "
    "tiebreak) over pure integer day math; orderkey aggregate + "
    "equi-join, then one priority exchange shared by window and "
    "aggregate",
    covers=("X-window", "B11", "N-quality"),
)
def fulfillment_latency_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fulfillment_latency(
        load_table(spark, sf_dir, "orders"),
        load_table(spark, sf_dir, "lineitem"),
    )


# ---------------------------------------------------------------------------
# SCD2 state-change history compaction
# ---------------------------------------------------------------------------


def scd2_state_history(events: DataFrame) -> DataFrame:
    """Type-2 slowly-changing-dimension history of each user's
    ``event_type`` state: compact the event stream to state-CHANGE rows
    and attach validity intervals ``[valid_from, valid_to)`` — the
    read-side builder for CDC history tables (the interval twin of
    ``latest_event_per_user``'s last-writer-wins compaction; reference
    analog: the versioned-snapshot lineage the publish path keeps,
    /root/reference/etl-service/src/s3_uploader.py:27).

    One keyed shuffle: a per-user window ordered by (ts, event_id)
    provides lag(event_type) for the change filter and — after the
    filter, over the SAME partitioning — lead(valid_from) closes each
    interval. Equal-type runs collapse (first row of the run survives);
    the open interval carries ``valid_to NULL`` + ``is_current 1``.
    Timestamps stay NTZ end-to-end (never cast through the session tz);
    the event_id tiebreak pins equal-timestamp ordering on both engines.
    The first row per user always survives (lag NULL != any type via
    null-safe compare).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        events.select("user_id", "event_id", "ts", "event_type")
        .withColumn("_prev", F.lag("event_type").over(w))
        # null-safe inequality: first row (_prev NULL) and NULL-type
        # transitions compact identically on both engines
        .filter(~F.col("_prev").eqNullSafe(F.col("event_type")))
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.col("ts").alias("valid_from"),
            F.lead("ts").over(w2).alias("valid_to"),
        )
        .withColumn(
            "is_current",
            F.when(F.col("valid_to").isNull(), 1).otherwise(0).cast("int"),
        )
        .orderBy("user_id", "valid_from")
    )


@register(
    "scd2_state_history",
    oracle="""
    WITH marked AS (
      SELECT user_id, event_id, ts, event_type,
             lag(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS _prev
      FROM events
    ), changes AS (
      SELECT user_id, event_id, event_type, ts FROM marked
      WHERE _prev IS DISTINCT FROM event_type
    )
    SELECT user_id, event_type AS state, ts AS valid_from,
           lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
             AS valid_to,
           CAST(CASE WHEN lead(ts) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)
                     IS NULL THEN 1 ELSE 0 END AS INTEGER) AS is_current
    FROM changes
    ORDER BY user_id, valid_from
    """,
    description="CDC history build: compact each user's event stream to "
    "state-change rows with [valid_from, valid_to) validity intervals "
    "(SCD type 2) — one keyed shuffle, lag for the change filter + lead "
    "to close intervals over the same partitioning; NTZ end-to-end, "
    "event_id tiebreak, null-safe state compare",
    covers=("A12", "X-window"),
)
def scd2_state_history_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return scd2_state_history(load_table(spark, sf_dir, "events"))
