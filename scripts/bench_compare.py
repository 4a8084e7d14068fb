#!/usr/bin/env python
"""Compare two bench detail files with yardstick normalization.

Round-5 lesson: raw cross-round per-query deltas conflate engine changes
with host drift, and the pure-JVM compute yardstick can diverge from the
drift most queries actually experience (scan+shuffle). This tool reads
two BENCH_DETAIL.json-shaped files, normalizes by the PRIMARY yardstick
(scan_calibration_seconds; falls back to calibration_seconds when a side
predates it), and reports per-query ratios outside a noise band.

Usage:
  python scripts/bench_compare.py OLD.json NEW.json [--band 1.3]
"""

from __future__ import annotations

import argparse
import json


def load(path: str) -> dict:
    with open(path) as fh:
        d = json.load(fh)
    if "queries" not in d:
        raise SystemExit(f"{path}: not a bench detail file (no 'queries')")
    return d


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument(
        "--band",
        type=float,
        default=1.3,
        help="normalized ratio beyond which a query is reported (default "
        "1.3x — min-of-2 on a steal-prone host is noisy below that)",
    )
    args = ap.parse_args()
    old, new = load(args.old), load(args.new)

    # r14 (VERDICT r13 #2): when BOTH sides carry per-query units
    # (seconds / nearest interleaved calibration probe — bench.py's
    # query_units), compare in units directly; a single global drift
    # factor cannot represent a host whose speed shifted MID-run.
    ou, nu = old.get("query_units"), new.get("query_units")
    per_query_units = bool(ou) and bool(nu)

    yard = "scan_calibration_seconds"
    if yard not in old or yard not in new:
        yard = "calibration_seconds"
    drift = new.get(yard, 1.0) / old.get(yard, 1.0)
    if per_query_units:
        print(
            "comparing in per-query normalized units (interleaved "
            f"probes: old={len(old.get('calibration_probes', []))} "
            f"new={len(new.get('calibration_probes', []))}); start-of-run "
            f"{yard} drift x{drift:.3f} shown for reference only"
        )
    else:
        print(
            f"yardstick: {yard}  old={old.get(yard)}  new={new.get(yard)}  "
            f"host drift x{drift:.3f} (normalizing by this)"
        )

    oq, nq = old["queries"], new["queries"]
    shared = sorted(set(oq) & set(nq))
    added = sorted(set(nq) - set(oq))
    removed = sorted(set(oq) - set(nq))
    tot_o = sum(oq[n] for n in shared)
    tot_n = sum(nq[n] for n in shared)
    print(
        f"shared {len(shared)} queries: {tot_o:.1f}s -> {tot_n:.1f}s raw "
        f"(x{tot_n / tot_o:.3f} raw, x{tot_n / tot_o / drift:.3f} "
        "start-drift-normalized)"
    )
    if per_query_units:
        ut_o = sum(ou[n] for n in shared if n in ou)
        ut_n = sum(nu[n] for n in shared if n in nu)
        ratios = sorted(
            nu[n] / ou[n]
            for n in shared
            if n in ou and n in nu and ou[n] > 0
        )
        med = ratios[len(ratios) // 2] if ratios else float("nan")
        print(
            f"shared units: {ut_o:.1f} -> {ut_n:.1f} "
            f"(x{ut_n / ut_o:.3f} total, x{med:.3f} median per-query)"
        )
    if added:
        print(f"added ({len(added)}): "
              + ", ".join(f"{n}={nq[n]}" for n in added))
    if removed:
        print(f"removed ({len(removed)}): " + ", ".join(removed))

    flagged = []
    for n in shared:
        if oq[n] <= 0:
            continue
        if per_query_units and n in ou and n in nu and ou[n] > 0:
            norm = nu[n] / ou[n]
        else:
            norm = nq[n] / oq[n] / drift
        if norm >= args.band or norm <= 1 / args.band:
            flagged.append((norm, n))
    for norm, n in sorted(flagged, reverse=True):
        tag = "slower" if norm > 1 else "faster"
        print(f"  {n}: {oq[n]} -> {nq[n]} (x{norm:.2f} normalized, {tag})")
    if not flagged:
        print(f"no per-query change outside the x{args.band} band")


if __name__ == "__main__":
    main()
