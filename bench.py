#!/usr/bin/env python
"""Benchmark: run every registered query at $SPARK_GRAFT_SF_DIR and print
one JSON line with per-query wall-clock seconds.

Usage: python bench.py  (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


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

    # Two passes, min per query: the host VM shows multi-second CPU-steal
    # bursts (observed 30-60x slowdowns on individual queries); min-of-2
    # reports the engine's actual throughput rather than host noise.
    timings: dict[str, float] = {}
    for _pass in range(2):
        for name, spec in all_queries().items():
            start = time.time()
            spec.builder(spark, sf_dir).collect()
            elapsed = round(time.time() - start, 3)
            if name not in timings or elapsed < timings[name]:
                timings[name] = elapsed

    etl_cycle_s = _bench_etl_cycle(spark, sf_dir)

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                # one full extract->build->publish->vacuum cycle over every
                # table at this SF; the reference's operational envelope is a
                # 60 s sync interval (BASELINE.md) — this must stay under it.
                "etl_cycle_seconds": etl_cycle_s,
                "etl_cycle_budget_seconds": 60,
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
