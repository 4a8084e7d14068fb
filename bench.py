#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR.

Prints the full per-query JSON map on the FIRST line (and writes it to
BENCH_DETAIL.json next to this file), then a SHORT summary JSON as the
FINAL line — tail capture of any length always contains the parseable
summary (the round-2 bench line grew past the driver's tail window and
parsed as null).

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

#: Queries kept only as exact parity twins of a guarded/scalable
#: production default; they are benched and reported, but excluded from
#: the headline total so the headline reflects the plans a 100 TB
#: deployment would run (ngram_jaccard_guarded is the dedup default —
#: see operators/dedup.py).
PARITY_ONLY = frozenset({"ngram_jaccard_pairs"})

#: run one single-rep scan-calibration probe after this many timed query
#: executions (VERDICT r13 #2: start/end-only calibration cannot see
#: mid-run host-speed shifts; per-query normalization needs a probe
#: near every query in TIME, not just at the run's edges).
PROBE_EVERY = 25


def _calibrate(spark) -> float:
    """Fixed synthetic workload (data-independent, plan-stable): a
    host-speed yardstick recorded with every run. Cross-round per-query
    comparisons should be read relative to the calibration ratio —
    round-3 measured carried queries uniformly ~1.4x slower than round 1
    *in a fresh isolated JVM with identical code and plans*, i.e. host
    drift, which this number makes visible and divisible-out."""
    best = float("inf")
    for _ in range(2):
        start = time.time()
        (
            spark.range(0, 50_000_000, 1, 32)
            .selectExpr("id % 97 AS k", "id % 7 AS v")
            .groupBy("k")
            .sum("v")
            .collect()
        )
        best = min(best, time.time() - start)
    return round(best, 3)


def _scan_workload(spark, sf_dir: str) -> float:
    """ONE rep of the scan yardstick workload (fixed parquet scan +
    shuffle over the benchmark's own data); seconds. The single
    definition — `_calibrate_scan`, the interleaved probes below, and
    scripts/tier_budget.py all run exactly this."""
    from ser_etl_spark.sources.parquet import load_table

    start = time.time()
    (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg({"l_extendedprice": "sum", "l_quantity": "avg"})
        .collect()
    )
    return time.time() - start


def _calibrate_scan(spark, sf_dir: str) -> float:
    """Second yardstick: best-of-2 of `_scan_workload`. The round-5 run
    showed the two yardsticks can DIVERGE — the pure-JVM calibration
    came out 1.6x FASTER than round 4 while carried, untouched queries
    ran a uniform ~1.2x SLOWER (host IO/steal drift the compute
    yardstick cannot see). Read cross-round deltas against whichever
    yardstick matches the query's bottleneck."""
    return round(min(_scan_workload(spark, sf_dir) for _ in range(2)), 3)


def _isolate(spark) -> None:
    """Between-group hygiene: drop cached plans and ask the JVM for a GC
    so one module's garbage (broadcasts, codegen classloaders, state
    stores) doesn't tax the next module's timings — the round-2 bench
    showed a uniform ~1.6x slowdown from shared-JVM aging, not plans."""
    spark.catalog.clearCache()
    try:
        spark._jvm.System.gc()
    except Exception:
        pass


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    from ser_etl_spark.registry import all_queries
    from ser_etl_spark.session import get_spark

    spark = get_spark(
        app_name="ser-etl-spark-bench",
        master=f"local[{cpus}]",
        conf={"spark.ui.enabled": "false"},
    )

    # warmup: JIT/classload the parquet reader + codegen paths once
    from ser_etl_spark.sources.parquet import load_table

    load_table(spark, sf_dir, "lineitem").limit(1).collect()
    calibration_s = _calibrate(spark)
    scan_calibration_s = _calibrate_scan(spark, sf_dir)

    # Group by defining module; isolate between groups so timings are
    # comparable across rounds regardless of how many other modules the
    # registry has grown.
    by_module: dict[str, list] = {}
    for name, spec in all_queries().items():
        by_module.setdefault(spec.builder.__module__, []).append((name, spec))

    # Two passes, min per query: the host VM shows multi-second CPU-steal
    # bursts (observed 30-60x slowdowns on individual queries); min-of-2
    # reports the engine's actual throughput rather than host noise.
    # Yardstick caveat (r9 pack_sequences triage): the scan yardstick
    # only normalizes SCAN+SHUFFLE-bound queries. Arrow/Python-bound
    # operators (applyInPandas packing, mapInPandas sketches) don't
    # track host IO speed, so a fast-scan round makes their unchanged
    # raw time look like a normalized regression — compare their RAW
    # min-of-N across rounds instead.
    # r10 triage of multimodal_features (r8 0.35s -> r9 0.98s raw, code
    # untouched): min-of-5 at sf0.1 on the r10 host = 0.594s with a
    # 7.9s cold first run — the spread IS Arrow/Python warmup + host
    # noise, same class as pack_sequences r8 (which recovered r9).
    # No fix needed; the min-of-2 below already absorbs the cold run.
    # r11 triage of series_anomalies (r9 1.19s -> r10 1.63s raw; only
    # change was the tie-safe fround conversion): min-of-5 at sf0.1 =
    # 1.261s with a 10.6s cold first run — in band with r9; the r10
    # reading was host noise, per the VERDICT r10 #6 expectation.
    # r14 (VERDICT r13 #2): start/end-only calibration cannot see
    # MID-RUN host-speed shifts (r13 measured a ~1.7x yardstick move
    # against a flat 1.04x carried-query median — unreadable either
    # way). Interleave a single-rep scan probe every PROBE_EVERY query
    # executions and normalize each query by the probe NEAREST IN TIME
    # to the run its min came from; cross-round comparison then happens
    # in per-query units (scripts/bench_compare.py), robust to drift at
    # any point of the run. ~22 probes x ~0.4 s ≈ 9 s of overhead.
    t_run0 = time.time()
    probes: list[dict] = [{"t": 0.0, "scan_s": scan_calibration_s}]
    timings: dict[str, float] = {}
    best_at: dict[str, float] = {}
    ran = 0
    for _pass in range(2):
        for entries in by_module.values():
            _isolate(spark)
            for name, spec in entries:
                start = time.time()
                spec.builder(spark, sf_dir).collect()
                elapsed = round(time.time() - start, 3)
                if name not in timings or elapsed < timings[name]:
                    timings[name] = elapsed
                    best_at[name] = time.time() - t_run0
                ran += 1
                if ran % PROBE_EVERY == 0:
                    probes.append(
                        {
                            "t": round(time.time() - t_run0, 1),
                            "scan_s": round(_scan_workload(spark, sf_dir), 3),
                        }
                    )

    _isolate(spark)
    etl_cycle_s = _bench_etl_cycle(spark, sf_dir)
    # Yardstick again AFTER the run: a large start/end ratio means host
    # speed shifted DURING the bench (observed 2.2x mid-run steal
    # windows) — per-query numbers from such a run are suspect even
    # against their own start-of-run calibration.
    scan_calibration_end_s = _calibrate_scan(spark, sf_dir)
    probes.append(
        {"t": round(time.time() - t_run0, 1), "scan_s": scan_calibration_end_s}
    )

    # Per-query normalized units: seconds / nearest-in-time probe value.
    # A unit is "how many scan-yardstick workloads this query costs on
    # the host AS IT WAS at that moment" — host drift mid-run divides
    # out per query instead of by one global start-of-run factor.
    def _nearest_probe(t: float) -> float:
        return min(probes, key=lambda p: abs(p["t"] - t))["scan_s"]

    query_units = {
        n: round(timings[n] / _nearest_probe(best_at[n]), 3) for n in timings
    }

    sf_raw = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    sf = float(sf_raw) if sf_raw.replace(".", "").isdigit() else sf_raw
    total = round(sum(timings.values()), 3)
    headline = round(
        sum(t for n, t in timings.items() if n not in PARITY_ONLY), 3
    )

    detail = {
        "queries": timings,
        "query_units": query_units,
        "calibration_probes": probes,
        "sf": sf,
        "parity_only_queries": sorted(PARITY_ONLY),
        "calibration_seconds": calibration_s,
        "scan_calibration_seconds": scan_calibration_s,
        "scan_calibration_end_seconds": scan_calibration_end_s,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(detail, fh, indent=1, sort_keys=True)
    print(json.dumps(detail))

    # FINAL line: short, fixed-size, always inside any tail capture.
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                # headline excludes exact parity twins of guarded
                # defaults (see PARITY_ONLY / BENCH_DETAIL.json)
                "headline_seconds": headline,
                # one full extract->build->publish->vacuum cycle over every
                # table at this SF; the reference's operational envelope is
                # a 60 s sync interval (BASELINE.md) — must stay under it.
                "etl_cycle_seconds": etl_cycle_s,
                "etl_cycle_budget_seconds": 60,
                # host-speed yardsticks (see _calibrate/_calibrate_scan):
                # normalize cross-round per-query ratios by the one that
                # matches the query's bottleneck (JVM compute vs scan+
                # shuffle) before reading them as regressions. The scan
                # yardstick is PRIMARY for cross-round comparison: r5
                # proved the compute yardstick can diverge 1.6x from
                # observed query drift (host IO/steal it cannot see),
                # while most registry queries are scan+shuffle-bound.
                "calibration_seconds": calibration_s,
                "scan_calibration_seconds": scan_calibration_s,
                "scan_calibration_end_seconds": scan_calibration_end_s,
                # r14: per-query units (seconds / nearest interleaved
                # probe) are the cross-round comparison currency —
                # scripts/bench_compare.py reads query_units from
                # BENCH_DETAIL.json when both rounds carry them.
                "n_calibration_probes": len(probes),
                "total_query_units": round(sum(query_units.values()), 1),
                "primary_yardstick": "query_units",
                "queries_file": "BENCH_DETAIL.json",
            }
        )
    )


def _bench_etl_cycle(spark, sf_dir: str) -> float:
    """Time one full-refresh sync cycle (A1-A18) at this scale factor."""
    import shutil
    import tempfile

    from ser_etl_spark.etl.build import TableLayout
    from ser_etl_spark.etl.extract import ParquetSource
    from ser_etl_spark.etl.sync import SyncConfig, SyncManager

    store = tempfile.mkdtemp(prefix="bench_etl_store_")
    try:
        mgr = SyncManager(
            spark,
            ParquetSource(sf_dir),
            store,
            SyncConfig(
                tables=(
                    "region", "nation", "customer", "supplier", "part",
                    "orders", "lineitem", "events", "documents",
                ),
                ts_col="ts",
                layouts={
                    "orders": TableLayout(unique_key="o_orderkey", sort_col="o_orderdate"),
                    "customer": TableLayout(unique_key="c_custkey"),
                    "events": TableLayout(unique_key="event_id", sort_col="ts"),
                    "lineitem": TableLayout(unique_key=None, sort_col="l_shipdate"),
                    "documents": TableLayout(unique_key="doc_id"),
                },
            ),
        )
        start = time.time()
        outcome = mgr.run_sync()
        elapsed = round(time.time() - start, 3)
        if not outcome.success:
            raise RuntimeError("bench ETL cycle failed")
        return elapsed
    finally:
        shutil.rmtree(store, ignore_errors=True)


if __name__ == "__main__":
    main()
