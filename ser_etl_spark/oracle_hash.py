"""Spark-compatible XXH64 in pure Python and in generated DuckDB SQL.

Spark's ``xxhash64`` (org.apache.spark.sql.catalyst.expressions.XXH64,
seed 42) is the engine's content-addressing primitive: it shards packing
groups, drives MinHash signatures and SimHash fingerprints, and seeds the
SRP hyperplanes. The differential-oracle contract (``oracle_sql()``)
therefore needs the SAME function available to DuckDB — which has no
xxhash64 — so this module provides two independent re-implementations of
the public XXH64 algorithm (Collet's spec; Spark's XXH64.java is a
faithful port the tests pin against):

- :func:`xxh64_long` / :func:`xxh64_bytes` / :func:`xxh64_chain`: pure
  Python, used at import time to fold constants (per-permutation tweaks,
  hyperplane coefficients) into generated SQL, and by tests as the
  middle vertex of a three-way Spark == Python == DuckDB check.
- :func:`xxh64_long_stage_cols` / :func:`xxh64_str_stage_cols`: emit the
  hash as a CHAIN OF NAMED CTE COLUMNS over DuckDB HUGEINT mod-2^64
  arithmetic — one column per algorithm step, so every sub-expression is
  written once and total SQL stays linear in step count. (The round-4
  ``pack_sequences`` oracle inlined the whole chain as one nested
  expression, duplicating the input ~32k times into a 1.6 MB string with
  ~8 s of parse/bind; the staged form is the round-5 ADVICE fix.)
  Variable-length byte loops (stripes, tails) that SQL cannot unroll are
  expressed as ``list_reduce`` folds whose lambdas reference only simple
  names, so they cannot blow up either.

All SQL arithmetic is over unsigned values in [0, 2^64) carried as
HUGEINT; :func:`tosigned_sql` converts back to Spark's signed BIGINT at
the boundary.
"""

from __future__ import annotations

_M64 = 1 << 64
_MASK = _M64 - 1

XXP1 = 11400714785074694791
XXP2 = 14029467366897019727
XXP3 = 1609587929392839161
XXP4 = 9650029242287828579
XXP5 = 2870177450012600261

#: Spark's seed for the ``xxhash64`` SQL function.
SPARK_SEED = 42


# ---------------------------------------------------------------------------
# pure-Python reference (bit-equal to Spark's XXH64 — pinned by tests)
# ---------------------------------------------------------------------------


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * XXP2) & _MASK
    h ^= h >> 29
    h = (h * XXP3) & _MASK
    h ^= h >> 32
    return h


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * XXP2) & _MASK
    acc = _rotl(acc, 31)
    return (acc * XXP1) & _MASK


def _merge_round(acc: int, inp: int) -> int:
    acc ^= _round(0, inp)
    return (acc * XXP1 + XXP4) & _MASK


def xxh64_long(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 64-bit value (Spark ``XXH64.hashLong``), unsigned."""
    value &= _MASK  # two's-complement bit pattern of a signed long
    h = (seed + XXP5 + 8) & _MASK
    h ^= _rotl((value * XXP2) & _MASK, 31) * XXP1 & _MASK
    h = (_rotl(h, 27) * XXP1 + XXP4) & _MASK
    return _fmix(h)


def xxh64_int(value: int, seed: int = SPARK_SEED) -> int:
    """XXH64 of one 32-bit value (Spark ``XXH64.hashInt``), unsigned.

    Spark hashes IntegerType columns (including Python-int literals)
    through this 4-byte path, not ``hashLong``.
    """
    value &= 0xFFFFFFFF
    h = (seed + XXP5 + 4) & _MASK
    h ^= (value * XXP1) & _MASK
    h = (_rotl(h, 23) * XXP2 + XXP3) & _MASK
    return _fmix(h)


def xxh64_chain(
    values: list[int | tuple[int, str]], seed: int = SPARK_SEED
) -> int:
    """Spark's multi-argument ``xxhash64(c1, c2, ...)``: each column's
    hash seeds the next (HashExpression's foldLeft). Items are either a
    long value or a ``(value, "int"|"long")`` pair — IntegerType columns
    go through the 4-byte ``hashInt`` path."""
    h = seed
    for v in values:
        if isinstance(v, tuple):
            val, kind = v
            h = xxh64_int(val, h) if kind == "int" else xxh64_long(val, h)
        else:
            h = xxh64_long(v, h)
    return h


def xxh64_bytes(data: bytes, seed: int = SPARK_SEED) -> int:
    """XXH64 of a byte string (Spark ``XXH64.hashUnsafeBytes``), unsigned.

    Spark hashes StringType through this over the UTF-8 bytes.
    """
    n = len(data)

    def w8(o: int) -> int:
        return int.from_bytes(data[o : o + 8], "little")

    if n >= 32:
        v1 = (seed + XXP1 + XXP2) & _MASK
        v2 = (seed + XXP2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - XXP1) & _MASK
        o = 0
        while o <= n - 32:
            v1 = _round(v1, w8(o))
            v2 = _round(v2, w8(o + 8))
            v3 = _round(v3, w8(o + 16))
            v4 = _round(v4, w8(o + 24))
            o += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + XXP5) & _MASK
        o = 0
    h = (h + n) & _MASK
    while o <= n - 8:
        h ^= _round(0, w8(o))
        h = (_rotl(h, 27) * XXP1 + XXP4) & _MASK
        o += 8
    if o + 4 <= n:
        h ^= (int.from_bytes(data[o : o + 4], "little") * XXP1) & _MASK
        h = (_rotl(h, 23) * XXP2 + XXP3) & _MASK
        o += 4
    while o < n:
        h ^= (data[o] * XXP5) & _MASK
        h = (_rotl(h, 11) * XXP1) & _MASK
        o += 1
    return _fmix(h)


def to_signed(u: int) -> int:
    """Unsigned [0, 2^64) -> the signed long Spark reports."""
    return u - _M64 if u >= (1 << 63) else u


# ---------------------------------------------------------------------------
# DuckDB SQL expression helpers (HUGEINT, values kept in [0, 2^64))
# ---------------------------------------------------------------------------


def and_mask_sql(x: str) -> str:
    """SQL for ``x mod 2^64`` as a bitwise AND — 128-bit division is the
    slow path in DuckDB (measured ~3.5x vs ``&``/``>>``), and two's
    complement makes the mask correct for negative inputs too."""
    return f"(({x}) & {_MASK})"


def mulmod_sql(a: str, b) -> str:
    """SQL for ``(a * b) mod 2^64`` over HUGEINT operands in [0, 2^64).

    A direct product of two 64-bit values can exceed signed-128-bit
    HUGEINT, so split at 32 bits: every partial product stays < 2^65.
    All mod/div-by-power-of-two is bitwise (see :func:`and_mask_sql`).
    """
    al = f"(({a}) & 4294967295)"
    ah = f"(({a}) >> 32)"
    bl = f"(({b}) & 4294967295)"
    bh = f"(({b}) >> 32)"
    return (
        f"((({al} * {bl}) + (((({ah} * {bl}) + ({al} * {bh})) "
        f"& 4294967295) << 32)) & {_MASK})"
    )


def rotl_sql(x: str, r: int) -> str:
    return f"(((({x}) << {r}) | (({x}) >> {64 - r})) & {_MASK})"


def shr_xor_sql(x: str, s: int) -> str:
    return (
        f"xor(CAST(({x}) AS HUGEINT), "
        f"CAST(({x}) >> {s} AS HUGEINT))"
    )


def xor_sql(a: str, b: str) -> str:
    return f"xor(CAST(({a}) AS HUGEINT), CAST(({b}) AS HUGEINT))"


def tosigned_sql(u: str) -> str:
    """Unsigned HUGEINT in [0, 2^64) -> signed BIGINT (Spark's long)."""
    return (
        f"CAST(CASE WHEN ({u}) >= {1 << 63} THEN ({u}) - {_M64} "
        f"ELSE ({u}) END AS BIGINT)"
    )


def _round_sql(acc: str, inp: str) -> str:
    """XXH64 round() over two small expressions (keep operands SHORT —
    the text is duplicated ~32x by the wrapping helpers)."""
    add = f"(((({acc}) + {mulmod_sql(inp, XXP2)}) & {_MASK}))"
    return mulmod_sql(rotl_sql(add, 31), XXP1)


def _round0_sql(inp: str) -> str:
    return mulmod_sql(rotl_sql(mulmod_sql(inp, XXP2), 31), XXP1)


#: One stage = list of (column_name, expression) added in one chained CTE.
Stages = list[list[tuple[str, str]]]


def xxh64_long_stage_cols(
    in_expr: str, out: str, seed: int = SPARK_SEED, pfx: str = "_xl"
) -> Stages:
    """Stages computing ``xxhash64(long)`` of ``in_expr`` into column
    ``out`` (unsigned HUGEINT). ``in_expr`` may be signed; it is
    normalized mod 2^64 first."""
    u = f"{pfx}u"
    t = f"{pfx}t"
    h = f"{pfx}h"
    g = f"{pfx}g"
    f1 = f"{pfx}f1"
    h0 = (seed + XXP5 + 8) % _M64
    return [
        [(u, f"((CAST({in_expr} AS HUGEINT)) & {_MASK})")],
        [(t, _round0_sql(u))],
        [(h, xor_sql(str(h0), t))],
        [(g, f"(({mulmod_sql(rotl_sql(h, 27), XXP1)} + {XXP4}) & {_MASK})")],
        [(f1, mulmod_sql(shr_xor_sql(g, 33), XXP2))],
        [(out, shr_xor_sql(mulmod_sql(shr_xor_sql(f1, 29), XXP3), 32))],
    ]


def _w8_sql(bs: str, off: str) -> str:
    """Little-endian 8-byte word of byte-list ``bs`` at 0-based offset
    expression ``off`` (indices are 1-based in DuckDB lists)."""
    return "(" + " + ".join(
        f"({bs})[({off}) + {j + 1}] * {256 ** j}" for j in range(8)
    ) + ")"


def _w4_sql(bs: str, off: str) -> str:
    return "(" + " + ".join(
        f"({bs})[({off}) + {j + 1}] * {256 ** j}" for j in range(4)
    ) + ")"


def xxh64_str_stage_cols(
    str_expr: str, out: str, seed: int = SPARK_SEED, pfx: str = "_xs"
) -> Stages:
    """Stages computing Spark's ``xxhash64(string)`` of ``str_expr`` into
    column ``out`` (unsigned HUGEINT), over the UTF-8 bytes.

    Data-dependent loops (32-byte stripes, 8-byte/1-byte tails) are
    ``list_reduce`` folds; straight-line steps are one named column each,
    conditioned on the byte length where the algorithm branches.
    """
    hx, n, bs = f"{pfx}hx", f"{pfx}n", f"{pfx}bs"
    vv, h0 = f"{pfx}vv", f"{pfx}h0"
    ra, rb, rc, rd = (f"{pfx}r{c}" for c in "abcd")
    h1, h2, h3, h4 = (f"{pfx}h{i}" for i in range(1, 5))
    h5, h6, h7, h8 = (f"{pfx}h{i}" for i in range(5, 9))
    f1 = f"{pfx}f1"

    hexd = "'0123456789ABCDEF'"
    byte_i = (
        f"CAST((strpos({hexd}, ({hx})[2*i-1]) - 1) * 16"
        f" + (strpos({hexd}, ({hx})[2*i]) - 1) AS HUGEINT)"
    )
    stripes = (
        f"list_transform(range(0, ({n}) // 32), t -> "
        f"{{'a': {_w8_sql(bs, '32*t')}, 'b': {_w8_sql(bs, '32*t + 8')}, "
        f"'c': {_w8_sql(bs, '32*t + 16')}, 'd': {_w8_sql(bs, '32*t + 24')}}})"
    )
    init = (
        f"{{'a': CAST({(seed + XXP1 + XXP2) % _M64} AS HUGEINT), "
        f"'b': CAST({(seed + XXP2) % _M64} AS HUGEINT), "
        f"'c': CAST({seed % _M64} AS HUGEINT), "
        f"'d': CAST({(seed - XXP1) % _M64} AS HUGEINT)}}"
    )
    stripe_fold = (
        f"list_reduce(list_prepend({init}, {stripes}), (x, y) -> "
        f"{{'a': {_round_sql('x.a', 'y.a')}, 'b': {_round_sql('x.b', 'y.b')}, "
        f"'c': {_round_sql('x.c', 'y.c')}, 'd': {_round_sql('x.d', 'y.d')}}})"
    )
    big = f"({n}) >= 32"
    merge_sum = (
        f"(({rotl_sql(f'{vv}.a', 1)} + {rotl_sql(f'{vv}.b', 7)} "
        f"+ {rotl_sql(f'{vv}.c', 12)} + {rotl_sql(f'{vv}.d', 18)}) & {_MASK})"
    )

    def merge_step(acc: str, r0: str) -> str:
        return (
            f"CASE WHEN {big} THEN "
            f"(({mulmod_sql(xor_sql(acc, r0), XXP1)} + {XXP4}) & {_MASK}) "
            f"ELSE {acc} END"
        )

    # trailing whole 8-byte words start where the stripes stopped
    off0 = f"(32 * (({n}) // 32))"
    tail8 = (
        f"list_reduce(list_prepend({h5}, "
        f"list_transform(range(0, (({n}) % 32) // 8), j -> "
        f"{_w8_sql(bs, f'{off0} + 8*j')})), (x, y) -> "
        f"(({mulmod_sql(rotl_sql(xor_sql('x', _round0_sql('y')), 27), XXP1)}"
        f" + {XXP4}) & {_MASK}))"
    )
    off1 = f"(8 * (({n}) // 8))"
    chunk4 = (
        f"CASE WHEN (({n}) % 8) >= 4 THEN "
        f"(({mulmod_sql(rotl_sql(xor_sql(h6, f'(({_w4_sql(bs, off1)} * {XXP1}) & {_MASK})'), 23), XXP2)}"
        f" + {XXP3}) & {_MASK}) ELSE {h6} END"
    )
    off2 = f"(4 * (({n}) // 4))"
    tail1 = (
        f"list_reduce(list_prepend({h7}, "
        f"list_transform(range(0, ({n}) % 4), j -> ({bs})[{off2} + j + 1])), "
        f"(x, y) -> "
        f"{mulmod_sql(rotl_sql(xor_sql('x', f'((y * {XXP5}) & {_MASK})'), 11), XXP1)})"
    )

    return [
        [
            (hx, f"hex(encode({str_expr}))"),
            (n, f"CAST(octet_length(encode({str_expr})) AS BIGINT)"),
        ],
        [(bs, f"list_transform(range(1, {n} + 1), i -> {byte_i})")],
        [(vv, stripe_fold)],
        [
            (h0, f"CASE WHEN {big} THEN {merge_sum} ELSE CAST({(seed + XXP5) % _M64} AS HUGEINT) END"),
            (ra, f"CASE WHEN {big} THEN {_round0_sql(f'{vv}.a')} ELSE CAST(0 AS HUGEINT) END"),
            (rb, f"CASE WHEN {big} THEN {_round0_sql(f'{vv}.b')} ELSE CAST(0 AS HUGEINT) END"),
            (rc, f"CASE WHEN {big} THEN {_round0_sql(f'{vv}.c')} ELSE CAST(0 AS HUGEINT) END"),
            (rd, f"CASE WHEN {big} THEN {_round0_sql(f'{vv}.d')} ELSE CAST(0 AS HUGEINT) END"),
        ],
        [(h1, merge_step(h0, ra))],
        [(h2, merge_step(h1, rb))],
        [(h3, merge_step(h2, rc))],
        [(h4, merge_step(h3, rd))],
        [(h5, f"(({h4} + {n}) & {_MASK})")],
        [(h6, tail8)],
        [(h7, chunk4)],
        [(h8, tail1)],
        [(f1, mulmod_sql(shr_xor_sql(h8, 33), XXP2))],
        [(out, shr_xor_sql(mulmod_sql(shr_xor_sql(f1, 29), XXP3), 32))],
    ]


def xxh64_int_rehash_stage_cols(
    h1_col: str,
    tweaks: list[int],
    out_fmt: str = "_s{k}",
    pfx: str = "_ir",
    signed: bool = True,
) -> Stages:
    """Stages computing Spark's ``xxhash64(base, lit(k))`` for each int
    tweak ``k`` from the already-hashed ``h1 = hashLong(base, 42)``
    column: each rehash is the 4-byte ``hashInt(k, h1)`` path with the
    k-dependent mix folded to a Python constant, then fmix — one named
    column per step so the SQL stays linear. Output columns are named
    ``out_fmt.format(k=k)``; signed BIGINT by default (Spark's long),
    or the raw unsigned HUGEINT with ``signed=False``."""
    b0 = f"{pfx}b0"
    stages: Stages = [[(b0, f"(({h1_col} + {(XXP5 + 4) % _M64}) & {_MASK})")]]
    ys = []
    for k in tweaks:
        ck = ((k & 0xFFFFFFFF) * XXP1) % _M64
        ys.append((
            f"{pfx}y{k}",
            f"(({mulmod_sql(rotl_sql(xor_sql(b0, str(ck)), 23), XXP2)}"
            f" + {XXP3}) & {_MASK})",
        ))
    stages.append(ys)
    stages.append([
        (f"{pfx}a{k}", mulmod_sql(shr_xor_sql(f"{pfx}y{k}", 33), XXP2))
        for k in tweaks
    ])
    stages.append([
        (f"{pfx}c{k}", mulmod_sql(shr_xor_sql(f"{pfx}a{k}", 29), XXP3))
        for k in tweaks
    ])
    final = shr_xor_sql
    stages.append([
        (
            out_fmt.format(k=k),
            tosigned_sql(final(f"{pfx}c{k}", 32))
            if signed
            else final(f"{pfx}c{k}", 32),
        )
        for k in tweaks
    ])
    return stages


def stages_to_ctes(
    base_name: str, stages: Stages, pfx: str = "_s", materialized: bool = True
) -> tuple[str, str]:
    """Render stages as chained ``SELECT *``-plus-new-columns CTE bodies.

    Returns ``(cte_definitions, final_cte_name)`` where the definitions
    string starts with a comma and is spliced after an existing WITH
    clause entry named ``base_name``.

    ``materialized`` (default) emits ``AS MATERIALIZED``: DuckDB inlines
    single-use CTEs, and a later stage referencing a column 4-8x would
    re-evaluate the ENTIRE upstream hash chain per reference (measured
    ~5x slower end-to-end on the MinHash oracle without the barrier).
    """
    parts: list[str] = []
    prev = base_name
    kw = "MATERIALIZED " if materialized else ""
    for i, cols in enumerate(stages):
        name = f"{pfx}{i}"
        defs = ",\n        ".join(f"{expr} AS {col}" for col, expr in cols)
        parts.append(
            f"{name} AS {kw}(\n      SELECT *,\n        {defs}\n      FROM {prev})"
        )
        prev = name
    return (", " + ",\n    ".join(parts)) if parts else "", prev
