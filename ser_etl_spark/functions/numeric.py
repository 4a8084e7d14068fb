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
