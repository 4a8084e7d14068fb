#!/usr/bin/env python
"""Print the VERIFIED_PRIOR_ROUNDS frozenset for ser_etl_spark/registry.py.

Run at the start of each round after the driver writes
CORRECTNESS_r{N}.json: a query counts as verified once any round gave it
a green row (hash_match for oracle-backed entries, a clean rows-only run
for oracle-less ones). Queries whose implementation changed since their
green row should be removed from the output by hand — the set is a
rotation policy, not a proof.

Usage: python scripts/update_verified.py [CORRECTNESS_r*.json ...]
"""

from __future__ import annotations

import glob
import json
import sys


def main() -> None:
    paths = sys.argv[1:] or sorted(glob.glob("CORRECTNESS_r*.json"))
    verified: set[str] = set()
    for path in paths:
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if row.get("hash_match") is True:
                verified.add(name)
            elif row.get("err") == "no_oracle" and row.get("spark_rows") is not None:
                verified.add(name)
    print(f"# from {', '.join(paths)} — {len(verified)} queries")
    print("VERIFIED_PRIOR_ROUNDS: frozenset[str] = frozenset({")
    for name in sorted(verified):
        print(f'    "{name}",')
    print("})")


if __name__ == "__main__":
    main()
