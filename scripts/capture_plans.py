#!/usr/bin/env python
"""Capture .explain("formatted") for registry queries into plans/<tag>/.

Usage:
  python scripts/capture_plans.py --tag r14 --suffix before [--only a,b,c]

Writes plans/<tag>/<query>_<suffix>.txt for each selected query. Builds
the DataFrame only (no execution) except where a builder itself runs
driver-side jobs (e.g. kmeans_train collects) — those still run their
collects while the final plan is captured.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r14")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--only", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from ser_etl_spark.registry import all_queries
    from ser_etl_spark.session import explain_string, get_spark

    spark = get_spark(
        app_name="plan-capture", conf={"spark.ui.enabled": "false"}
    )
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        args.tag,
    )
    os.makedirs(out_dir, exist_ok=True)

    names = None
    if args.only:
        names = {n.strip() for n in args.only.split(",") if n.strip()}
    for name, spec in all_queries().items():
        if names is not None and name not in names:
            continue
        try:
            df = spec.builder(spark, args.sf)
            txt = explain_string(df, "formatted")
        except Exception as exc:  # pragma: no cover - capture tool
            txt = f"ERROR building plan: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
