"""Differential-oracle comparison harness (mirrors the driver's check).

Runs a registry query on Spark and its oracle SQL on DuckDB over the same
parquet snapshot, then compares row count, column names, and an
order-insensitive canonical value multiset. Values are canonicalized to
strings strictly (floats via repr) so any cross-engine bit divergence shows
up here before the driver's value-hash does.
"""

from __future__ import annotations

import datetime as _dt
import math

import duckdb

from ser_etl_spark.sources.parquet import TABLES, table_path


def duckdb_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{table_path(sf_dir, t)}')"
        )
    return con


def _canon(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.datetime):
        return v.isoformat(sep=" ", timespec="microseconds")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_canon(x) for x in v) + "]"
    if isinstance(v, bytes):
        return v.hex()
    return str(v)


def canonical_rows(columns: list[str], rows: list[tuple]) -> list[str]:
    """Sort columns by name, canonicalize every cell, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = ["\x01".join(_canon(row[i]) for i in order) for row in rows]
    out.sort()
    return out


def spark_result(df) -> tuple[list[str], list[tuple]]:
    rows = df.collect()
    return list(df.columns), [tuple(r) for r in rows]


def duckdb_result(con, sql: str) -> tuple[list[str], list[tuple]]:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


#: DuckDB output types whose pandas (``fetchdf``) rendering diverges from the
#: native-Python ``fetchall`` values this harness compares: HUGEINT and
#: DECIMAL both become float64 in a pandas frame, so the driver's value hash
#: (it uses the pandas path) sees "1085.0" where we see "1085". Oracles must
#: CAST such outputs (round-1 lesson: priority_shipping / sessionize_events).
_PANDAS_DIVERGENT = ("HUGEINT", "UHUGEINT", "DECIMAL")


_INT_TYPES = ("TINYINT", "SMALLINT", "INTEGER", "BIGINT", "UTINYINT",
              "USMALLINT", "UINTEGER", "UBIGINT")


def oracle_type_problems(name: str, con, sql: str) -> list[str]:
    """Flag oracle output columns whose dtype the driver renders differently."""
    desc = con.execute(f"DESCRIBE {sql}").fetchall()
    problems = [
        f"{name}: oracle column {col!r} has driver-divergent type {typ} — "
        f"CAST it (e.g. AS BIGINT / AS DOUBLE) in the oracle SQL"
        for col, typ, *_ in desc
        if any(typ.upper().startswith(p) for p in _PANDAS_DIVERGENT)
    ]
    # Second divergence class (round-2 lesson, purchase_attribution): an
    # integer column CONTAINING A NULL becomes float64 in a pandas frame,
    # so the driver hashes 1 as "1.0". Detect by comparing declared types
    # with the dtypes fetchdf actually produces.
    pdf = con.execute(sql).fetchdf()
    for col, typ, *_ in desc:
        if typ.upper() in _INT_TYPES and col in pdf.columns:
            if str(pdf[col].dtype).startswith("float"):
                problems.append(
                    f"{name}: oracle column {col!r} is {typ} but contains "
                    f"NULLs, so the driver's pandas path renders the whole "
                    f"column as float — COALESCE to a sentinel or cast to "
                    f"DOUBLE on both sides"
                )
    return problems


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    """Return a list of mismatch descriptions (empty == pass)."""
    problems: list[str] = list(oracle_type_problems(name, con, sql))
    s_cols, s_rows = spark_result(spark_df)
    d_cols, d_rows = duckdb_result(con, sql)
    if sorted(s_cols) != sorted(d_cols):
        problems.append(f"{name}: columns differ spark={s_cols} duckdb={d_cols}")
        return problems
    if len(s_rows) != len(d_rows):
        problems.append(
            f"{name}: row count differs spark={len(s_rows)} duckdb={len(d_rows)}"
        )
    s_canon = canonical_rows(s_cols, s_rows)
    d_canon = canonical_rows(d_cols, d_rows)
    if s_canon != d_canon:
        diffs = [
            (a, b) for a, b in zip(s_canon, d_canon) if a != b
        ][:5]
        extra = abs(len(s_canon) - len(d_canon))
        problems.append(
            f"{name}: value mismatch ({len(diffs)} shown, {extra} length diff); "
            + "; ".join(f"spark={a!r} duckdb={b!r}" for a, b in diffs)
        )
    return problems
