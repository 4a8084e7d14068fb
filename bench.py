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

    sf = os.path.basename(sf_dir.rstrip("/")).removeprefix("sf")
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
