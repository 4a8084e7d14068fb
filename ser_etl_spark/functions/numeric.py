"""Cross-engine-deterministic numeric aggregation helpers.

Problem: ``SUM(double)`` is order-dependent — Spark's partial/final shuffle
aggregation and DuckDB's sequential scan accumulate in different orders, so
the low bits differ and a value-hash comparison fails spuriously.

Fix: aggregate in *decimal* space. The fixture measures are doubles holding
values with <= 2 (prices, quantities) or <= 4 (price*discount products)
true decimal digits; casting to DECIMAL(25,s) recovers the exact decimal
value identically in any IEEE-754 engine (the true value is never at a
rounding boundary), decimal addition is exact and associative, and the final
cast back to DOUBLE is deterministic. Result: bit-identical aggregates on
Spark and DuckDB regardless of parallelism, at double speed-class (decimal
sums are still JVM-side codegen).

The SQL oracle must use the same shape:
``CAST(SUM(CAST(x AS DECIMAL(25,s))) AS DOUBLE)``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: 25 digits of precision keeps DECIMAL sums exact up to ~1e21 at scale 4 —
#: ample for 100 TB-scale fact tables (1e12 rows x 1e5 magnitudes).
PRECISION = 25


def _dec(col: Column | str, scale: int) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({PRECISION},{scale})")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Deterministic SUM of a double column with <= ``scale`` true decimals."""
    return F.sum(_dec(col, scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Deterministic AVG: exact decimal sum divided by count, in double.

    Spark's AVG(decimal) yields decimal while DuckDB's yields double, so we
    do the division explicitly the same way on both sides:
    ``CAST(SUM(dec) AS DOUBLE) / COUNT(x)``.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(_dec(c, scale)).cast("double") / F.count(c)


#: Operand precision for exact decimal products: DECIMAL(12,s) operands give
#: a DECIMAL(25,2s) product, under both engines' 38-digit cap with exact
#: multiply semantics (Spark result precision = p1+p2+1 = 25, no clamping).
_PROD_PRECISION = 12


def dsum_prod(x: Column | str, y: Column | str, scale: int = 2) -> Column:
    """Deterministic SUM(x*y) where both doubles hold <= ``scale`` true
    decimals: exact decimal multiply then exact decimal sum, cast to
    double once at the end (the second-moment building block —
    sum-of-squares, cross products for variance/correlation)."""
    cx = (F.col(x) if isinstance(x, str) else x).cast(
        f"decimal({_PROD_PRECISION},{scale})"
    )
    cy = (F.col(y) if isinstance(y, str) else y).cast(
        f"decimal({_PROD_PRECISION},{scale})"
    )
    return F.sum((cx * cy).cast(f"decimal({PRECISION},{2 * scale})")).cast("double")


def sql_dsum(expr: str, scale: int = 2) -> str:
    """Oracle-side rendering of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL({PRECISION},{scale}))) AS DOUBLE)"


def sql_dsum_prod(x: str, y: str, scale: int = 2) -> str:
    """Oracle-side rendering of :func:`dsum_prod`."""
    return (
        f"CAST(SUM(CAST(CAST({x} AS DECIMAL({_PROD_PRECISION},{scale})) * "
        f"CAST({y} AS DECIMAL({_PROD_PRECISION},{scale})) "
        f"AS DECIMAL({PRECISION},{2 * scale}))) AS DOUBLE)"
    )


def sql_davg(expr: str, scale: int = 2) -> str:
    """Oracle-side rendering of :func:`davg`."""
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"


# ---------------------------------------------------------------------------
# tie-safe presentation rounding
# ---------------------------------------------------------------------------
#
# ``round(double, d)`` is NOT cross-engine deterministic at decimal
# half-ties: Spark evaluates it HALF_UP on the value's shortest decimal
# string (Double.toString -> BigDecimal), Python's round() is half-even on
# the binary value, and DuckDB rounds the binary value its own way. Any
# operand that is a ratio of integers with a 2^a*5^b denominator (counts,
# cents) can land EXACTLY on a d+1-digit decimal half — hypothesis found a
# live counterexample in winsorized_stats (sum -3159 over n=8: -3.94875
# rounds to -3.9488 on Spark, -3.9487 in Python) — so every presentation
# round over such a ratio is a latent driver-hash flake.
#
# ``fround`` computes floor(x * 10^d + 0.5) / 10^d entirely in IEEE binary:
# multiply, add, floor and divide are each correctly rounded and identical
# on any IEEE-754 engine, so Spark and the DuckDB oracle agree BIT-EXACTLY
# on every input, ties included (halves round toward +inf on both).
# Powers of ten through 1e15 are exactly representable doubles, so the
# scale factor itself is never a source of divergence.
#
# Caller contract: |x| * 10^d must stay below 2^53 (value precision) and
# far below 2^63 (Spark's floor(double) returns BIGINT) — presentation
# ratios (shares, means, correlations, similarity scores) are all O(1) to
# O(1e6), leaving >9 orders of headroom at d=9.


def fround(col: Column | str, d: int) -> Column:
    """Tie-safe ``round(x, d)``: floor-based, bit-identical across engines."""
    c = F.col(col) if isinstance(col, str) else col
    s = F.lit(float(10**d))
    return F.floor(c * s + F.lit(0.5)).cast("double") / s


def sql_fround(expr: str, d: int) -> str:
    """Oracle-side rendering of :func:`fround` (DuckDB floor is double)."""
    return f"(CAST(floor(({expr}) * 1e{d} + 0.5) AS DOUBLE) / 1e{d})"
