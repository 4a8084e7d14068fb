"""As-of join unit semantics on synthetic frames (edge cases the
oracle-parity fixture can't pin down: no-match NULLs, inclusive equal
timestamps, latest-of-several)."""

from __future__ import annotations

import datetime as dt

from ser_etl_spark.operators.temporal import asof_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_matches_latest_prior_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "p1"),
            (1, _ts("2024-01-01 12:00:00"), "p2"),
            (2, _ts("2024-01-01 09:00:00"), "p3"),  # before any right row
        ],
        "k bigint, ts timestamp_ntz, name string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:00:00"), "c-early"),
            (1, _ts("2024-01-01 10:00:00"), "c-equal"),   # ties with p1
            (1, _ts("2024-01-01 11:30:00"), "c-late"),
            (2, _ts("2024-01-01 23:00:00"), "c-future"),  # after p3
        ],
        "k bigint, ts timestamp_ntz, tag string",
    )
    out = {
        r["name"]: (r["matched"]["tag"] if r["matched"] else None)
        for r in asof_join(left, right, on="k").collect()
    }
    assert out == {
        "p1": "c-equal",   # equal ts is inclusive
        "p2": "c-late",    # latest of several priors
        "p3": None,        # no prior right row -> NULL (left join)
    }


def test_asof_left_rows_preserved(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 00:00:00"), i) for i in range(5)],
        "k bigint, ts timestamp_ntz, i bigint",
    )
    right = spark.createDataFrame([], "k bigint, ts timestamp_ntz, tag string")
    rows = asof_join(left, right, on="k").collect()
    assert len(rows) == 5
    assert all(r["matched"] is None for r in rows)


class TestGapFill:
    def test_planted_gaps_filled_forward(self, spark):
        import datetime as dt

        from ser_etl_spark.operators.timeseries import gap_fill_hourly

        h = lambda k: dt.datetime(2024, 1, 1, k)
        rows = [
            ("a", h(0), 10.0), ("a", h(0), 5.0),   # hour 0: 2 events, 15
            ("a", h(3), 7.0),                      # hours 1-2 missing
            ("b", h(5), 1.0),                      # single-bucket key
        ]
        ev = spark.createDataFrame(
            rows, "event_type string, ts timestamp_ntz, value double"
        )
        got = {
            (r["event_type"], r["bucket_ts"].hour): (
                r["events"], r["filled_sum"]
            )
            for r in gap_fill_hourly(ev).collect()
        }
        assert got[("a", 0)] == (2, 15.0)
        assert got[("a", 1)] == (0, 15.0)   # gap: zero events, carried sum
        assert got[("a", 2)] == (0, 15.0)
        assert got[("a", 3)] == (1, 7.0)
        assert got[("b", 5)] == (1, 1.0)
        # spine is exactly lo..hi per key — no rows outside the bounds
        assert len(got) == 5


def test_epoch_bucket_queries_are_timezone_pure(spark, sf_small):
    """The r6 full-surface Asia/Kathmandu drive caught session_concurrency
    shifting hour buckets by the session-tz offset (unix_timestamp's
    NTZ->LTZ cast detour); retention_cohorts shared the pattern with
    coarser (weekly) exposure. Pin both: identical rows under UTC and an
    odd-offset zone."""
    from ser_etl_spark.registry import all_queries

    Q = all_queries()
    old = spark.conf.get("spark.sql.session.timeZone")
    per_tz = {}
    try:
        for tz in ("UTC", "Asia/Kathmandu"):
            spark.conf.set("spark.sql.session.timeZone", tz)
            per_tz[tz] = {
                n: sorted(
                    tuple(r) for r in Q[n].builder(spark, sf_small).collect()
                )
                for n in ("session_concurrency", "retention_cohorts")
            }
    finally:
        spark.conf.set("spark.sql.session.timeZone", old)
    for n in per_tz["UTC"]:
        assert per_tz["UTC"][n] == per_tz["Asia/Kathmandu"][n], n


def test_series_similarity_survives_bigint_overflow_magnitudes(spark):
    """ADVICE r7: v is an hourly SUM of 1e6-scaled values, so sum(v*v)
    exceeds 2^63 for hot users — the sufficient statistics must
    accumulate in DECIMAL (Spark) / HUGEINT (DuckDB oracle), not BIGINT,
    or Spark's ANSI default throws where DuckDB silently promotes. Drive
    magnitudes where every square is > 2^63 and pin the exact Pearson
    endpoints a linear/anti-linear relation must produce."""
    import datetime as dt

    from ser_etl_spark.operators.timeseries import series_similarity_topk

    def ts(h):
        return dt.datetime(2024, 1, 1, h, 0, 0)

    big = 4.0e9  # quantized: 4e15 per event; square 1.6e31 >> 2^63
    rows = []
    for h, mult in ((0, 1.0), (1, 2.0), (2, 3.0)):
        rows.append((1, ts(h), big * mult))          # reference user
        rows.append((2, ts(h), big * mult * 2.0))    # perfectly correlated
        rows.append((3, ts(h), big * (4.0 - mult)))  # perfectly anti-corr.
    events = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp_ntz, value double"
    )
    got = {
        r["user_id"]: r["corr"]
        for r in series_similarity_topk(events, ref_user=1, k=10).collect()
    }
    assert got == {2: 1.0, 3: -1.0}


def test_series_anomalies_flags_spike_not_constant(spark):
    """Exact-integer z-test semantics: an obvious spike in an otherwise
    flat-ish series is flagged; a perfectly constant series (zero
    variance) yields nothing; series under min_hours are ignored."""
    import datetime as dt

    from ser_etl_spark.operators.timeseries import series_anomalies

    rows = []
    for h in range(30):
        rows.append((1, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                     10.0 + (h % 2)))           # user 1: mild alternation
        rows.append((2, dt.datetime(2024, 1, 1) + dt.timedelta(hours=h),
                     5.0))                       # user 2: constant
    rows.append((1, dt.datetime(2024, 1, 2, 6), 10_000.0))  # the spike
    rows.append((3, dt.datetime(2024, 1, 1), 99.0))         # too short
    events = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp_ntz, value double"
    )
    got = series_anomalies(events, min_hours=24).collect()
    assert [(r["user_id"], r["zsq"] > 9.0) for r in got] == [(1, True)]
    assert got[0]["qv"] == 10_000 * 1_000_000


def test_transition_matrix_exact_counts_and_probs(spark):
    import datetime as dt

    from ser_etl_spark.operators.temporal import transition_matrix

    def ev(i, u, t):
        return (i, u, dt.datetime(2024, 1, 1) + dt.timedelta(minutes=i), t)

    rows = [
        ev(0, 1, "view"), ev(1, 1, "view"), ev(2, 1, "click"),
        ev(3, 1, "view"),
        ev(4, 2, "view"), ev(5, 2, "click"), ev(6, 2, "purchase"),
    ]
    events = spark.createDataFrame(
        rows, "event_id bigint, user_id bigint, ts timestamp_ntz, "
        "event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n_transitions"], r["p"])
        for r in transition_matrix(
            events, "user_id", "ts", "event_type", "event_id"
        ).collect()
    }
    assert got == {
        ("view", "view"): (1, 0.333333),
        ("view", "click"): (2, 0.666667),
        ("click", "view"): (1, 0.5),
        ("click", "purchase"): (1, 0.5),
    }


def test_purchase_attribution_null_click_seams(spark, monkeypatch, tmp_path):
    """NULL-user or NULL-ts clicks are never match candidates (the
    oracle's ASOF equality rejects NULLs; the window form must too),
    while NULL-user purchases still surface with the -1 sentinel."""
    import datetime as dt

    import pyarrow as pa
    import pyarrow.parquet as pq

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # (event_id, ts, user_id, event_type)
        (1, t0, 7, "click"),
        (2, t0 + dt.timedelta(minutes=5), 7, "purchase"),   # matches 1
        (3, t0, None, "click"),          # NULL-user click: never matches
        (4, t0 + dt.timedelta(minutes=1), None, "purchase"),  # -1
        (5, None, 8, "click"),           # NULL-ts click: never matches
        (6, t0 + dt.timedelta(minutes=2), 8, "purchase"),   # -1
    ]
    pq.write_table(
        pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }),
        tmp_path / "events.parquet",
    )
    from ser_etl_spark.operators.temporal import purchase_attribution

    got = {
        r["event_id"]: r
        for r in purchase_attribution(spark, str(tmp_path)).collect()
    }
    assert got[2]["click_id"] == 1 and got[2]["gap_s"] == 300
    assert got[4]["click_id"] == -1 and got[4]["gap_s"] == -1
    assert got[6]["click_id"] == -1 and got[6]["gap_s"] == -1
