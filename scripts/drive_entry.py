"""Drive __spark_entry__ the way the round driver does: vanilla session
(none of our engine conf defaults — they must not be load-bearing),
DuckDB oracle at sf0.01, order-insensitive canonical compare.

The full-surface config matrix (.claude/skills/verify/SKILL.md) is six
invocations of this script:

  python scripts/drive_entry.py --tz Asia/Kathmandu
  python scripts/drive_entry.py --master 'local[3]' --conf spark.sql.shuffle.partitions=7
  python scripts/drive_entry.py --conf spark.sql.ansi.enabled=false
  python scripts/drive_entry.py --conf spark.sql.adaptive.enabled=false
  python scripts/drive_entry.py --tz Europe/Berlin --conf spark.sql.caseSensitive=true
  python scripts/drive_entry.py --conf spark.sql.execution.arrow.maxRecordsPerBatch=16

Usage:
  python scripts/drive_entry.py [--only name1,name2] [--tz ZONE] [--sf DIR]
                                [--conf k=v ...] [--master local[N]]
"""
import argparse
import sys

sys.path.insert(0, "/root/repo")

import datetime as _dt
import math

import duckdb

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def canon(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = ["\x01".join(canon(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None)
    ap.add_argument("--tz", default=None)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local[8]")
    ap.add_argument("--conf", action="append", default=[])
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    b = (SparkSession.builder.master(args.master)
         .config("spark.ui.enabled", "false"))
    if args.tz:
        b = b.config("spark.sql.session.timeZone", args.tz)
    for kv in args.conf:
        k, _, v = kv.partition("=")
        b = b.config(k, v)
    spark = b.getOrCreate()

    import __spark_entry__ as mod

    # smoke
    rows = mod.entry(spark).collect()
    print(f"entry(): {len(rows)} rows OK", flush=True)

    con = duckdb.connect()
    import os
    for t in TABLES:
        p = os.path.join(args.sf, f"{t}.parquet")
        if not os.path.exists(p):
            p = os.path.join(args.sf, t)
        con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{p}')")

    queries = mod.queries()
    oracles = mod.oracle_sql()
    only = set(args.only.split(",")) if args.only else None
    n_pass = n_fail = n_rows_only = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, args.sf)
            s_cols, s_rows = list(df.columns), [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark raised {type(e).__name__}: {e}",
                  flush=True)
            n_fail += 1
            continue
        if name not in oracles:
            n_rows_only += 1
            print(f"rows-only {name}: {len(s_rows)} rows", flush=True)
            continue
        try:
            cur = con.execute(oracles[name])
            d_cols = [d[0] for d in cur.description]
            d_rows = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle raised {type(e).__name__}: {e}",
                  flush=True)
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(d_cols):
            print(f"FAIL {name}: cols spark={s_cols} duck={d_cols}", flush=True)
            n_fail += 1
            continue
        if len(s_rows) != len(d_rows):
            print(f"FAIL {name}: rows spark={len(s_rows)} duck={len(d_rows)}",
                  flush=True)
            n_fail += 1
            continue
        sc, dc = canonical(s_cols, s_rows), canonical(d_cols, d_rows)
        if sc != dc:
            diffs = [(a, b) for a, b in zip(sc, dc) if a != b][:3]
            print(f"FAIL {name}: hash mismatch e.g. {diffs}", flush=True)
            n_fail += 1
            continue
        n_pass += 1
        print(f"pass {name} ({len(s_rows)} rows)", flush=True)
    print(f"SUMMARY pass={n_pass} fail={n_fail} rows_only={n_rows_only}",
          flush=True)
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
