#!/usr/bin/env python
"""Host-calibrated test-tier budgets (VERDICT r12 #3).

The tier budgets are recorded in SCAN-CALIBRATION UNITS, not wall-clock:
``bench.py``'s ``_calibrate_scan`` workload (a fixed lineitem scan +
shuffle at sf0.1) is the yardstick every BENCH_r*.json already carries,
so "the fast tier fits in ~10 minutes" is really "the fast tier costs
~1270 scan-units" — a statement that holds on a 2x-slow host, where the
label "~10 min" does not (the r12 round ran the fast tier in 12m23s on
a host the bench itself measured at 1.65x slower; the unit-denominated
budget was within 4%).

The unit constants below are the SINGLE SOURCE of the budget numbers
(pytest.ini points here instead of restating them — ADVICE r13);
measured at the r12 close (scan_calibration 0.584 s, fast tier 743 s,
full gate 2173 s).

This script measures the CURRENT host's scan calibration (same workload
and repeat discipline as bench.py) and prints the budgets converted to
expected wall-clock for this host, plus a PASS/FAIL against an observed
duration if one is given.

Usage:
  python scripts/tier_budget.py                 # print expected budgets
  python scripts/tier_budget.py --observed-fast 812
                                                # check a measured run
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: tier budgets in scan-calibration units (see module docstring); the
#: +25% tolerance absorbs run-to-run noise and collection overhead.
#: Re-measured at r15 (VERDICT r14 #1 — the r12-era constants had gone
#: stale while the suite grew through the r13/r14 build waves, so the
#: budget check was failing silently as a tripwire): fast tier 748
#: tests in 816 s at scan-calibration 0.343 s = 2,380 units. The fast
#: tier is now also the DRIVER-FACING DEFAULT (`pytest tests/` selects
#: it via pytest.ini addopts): at the r14 driver host's measured
#: 1.6-1.9x slow factor this budget predicts ~22-26 min, inside the
#: window that truncated the ~52 min full gate at ~61 %.
FAST_TIER_UNITS = 2400.0
#: full gate = fast tier + tier2; re-measured at the r15 close.
FULL_GATE_UNITS = 7200.0
TOLERANCE = 1.25


def measure_scan_calibration(sf_dir: str | None = None) -> float:
    """Measure the current host's scan calibration.

    IMPORTS bench.py's ``_calibrate_scan`` (the single definition of
    the yardstick workload — ADVICE r13: a manual copy here could
    drift silently) and runs it on a session it creates AND stops.
    """
    from bench import _calibrate_scan
    from ser_etl_spark.session import get_spark
    from ser_etl_spark.sources.parquet import load_table

    sf_dir = sf_dir or os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(
        app_name="tier-budget",
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]",
        conf={"spark.ui.enabled": "false"},
    )
    try:
        load_table(spark, sf_dir, "lineitem").limit(1).collect()  # warmup
        return _calibrate_scan(spark, sf_dir)
    finally:
        spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--observed-fast", type=float, default=None,
                    help="measured fast-tier wall-clock seconds to check")
    ap.add_argument("--observed-full", type=float, default=None,
                    help="measured full-gate wall-clock seconds to check")
    args = ap.parse_args()

    cal = measure_scan_calibration()
    fast_s = FAST_TIER_UNITS * cal
    full_s = FULL_GATE_UNITS * cal
    print(f"scan_calibration_seconds: {cal}")
    print(
        f"fast tier budget: {FAST_TIER_UNITS:.0f} units = "
        f"{fast_s:.0f} s on this host "
        f"(+{(TOLERANCE - 1) * 100:.0f}% tolerance {fast_s * TOLERANCE:.0f} s)"
    )
    print(
        f"full gate budget: {FULL_GATE_UNITS:.0f} units = "
        f"{full_s:.0f} s on this host "
        f"(+{(TOLERANCE - 1) * 100:.0f}% tolerance {full_s * TOLERANCE:.0f} s)"
    )
    rc = 0
    for label, observed, budget in (
        ("fast tier", args.observed_fast, fast_s),
        ("full gate", args.observed_full, full_s),
    ):
        if observed is None:
            continue
        ok = observed <= budget * TOLERANCE
        print(
            f"{label}: observed {observed:.0f} s -> "
            f"{observed / cal:.0f} units: {'PASS' if ok else 'FAIL'}"
        )
        rc |= 0 if ok else 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
