"""Exact money arithmetic in the long domain.

The reference publishes 2-decimal prices and percent-scale rates
(/root/reference/README.md:77-81 price*volume VWAP); the DuckDB
oracle computes them in DECIMAL. A literal Spark translation —
``cast("decimal(12,2)")`` products and sums — is exact but slow:
decimal multiply/sum with precision > 18 leaves the long-backed
compact representation for boxed 128-bit arithmetic (measured 2.7×
slower than long math on the sf0.1 aggregates: 1.5 s → 0.58 s for
the TPC-H-Q1-shaped pricing summary).

This module does the same *exact* arithmetic in scaled longs:

- a 2-decimal dollar amount is a ``long`` count of cents,
- a 2-decimal rate (discount/tax) is a ``long`` percent count,
- products stay exact integers (price × (1-d) × (1+t) is an integer
  count of 10^-6 dollars),
- sums are plain ``long`` sums — whole-stage-codegen'd, exact, and
  under ANSI mode (on in this engine's sessions) overflow THROWS
  rather than silently wrapping,
- rounding happens in the integer domain (half-up via ``pmod``),
  because rounding the *double* image of an exact decimal breaks
  ties the wrong way (1234.5675 → double 1234.56749…99 → 1234.56,
  where DECIMAL ROUND gives 1234.57).

Overflow headroom (why plain long sums are safe at engine scale):
the largest per-row product used here is
``cents × (100-d) × (100+t)`` ≤ 1e7 × 100 × 110 ≈ 1.2e11.  A long
holds 9.2e18, so a single group can absorb ~7.6e7 such rows —
per-key market aggregates (thousands of rows per symbol-day) never
approach it, and the full-table TPC-H Q1 sum stays exact beyond
sf10 (6e7 rows × 1.2e11 ≈ 7e18).  For genuinely unbounded groups
beyond that, pass ``wide=True`` to :func:`exact_sum`: products are
cast to ``decimal(38,0)`` pre-sum — overflow-proof to 10^38, at the
measured decimal cost.  The choice is per-aggregate, so a 100 TB
deployment widens only the handful of whole-table rollups.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def to_scaled(col: Column | str, digits: int = 2) -> Column:
    """Exact ``long`` image of a ``digits``-decimal double amount
    (2 → cents). ``round()`` absorbs the double representation error
    of decimal literals (1.1*100 = 110.00000000000001 → 110)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**digits)).cast("long")


def exact_sum(col: Column, wide: bool = False) -> Column:
    """Exact sum of scaled-long amounts. ``wide=True`` sums in
    ``decimal(38,0)`` for unbounded groups (see module docstring)."""
    return F.sum(col.cast("decimal(38,0)") if wide else col)


def scaled_to_double(col: Column, scale: int) -> Column:
    """Exact scaled long → the nearest double of the decimal value —
    identical to DuckDB's ``CAST(decimal AS DOUBLE)`` (one correctly
    rounded division of an exactly represented integer)."""
    return col / F.lit(float(10**scale))


def scaled_round(col: Column, from_scale: int, to_digits: int) -> Column:
    """DECIMAL-semantics ``ROUND(x, to_digits)`` of a scaled long,
    returned as double: round half-up in the integer domain, then one
    exact division.  Positive amounts only (all money columns here).
    """
    if to_digits >= from_scale:
        return scaled_to_double(col, from_scale)
    factor = 10 ** (from_scale - to_digits)
    pm = F.pmod(col, F.lit(factor))
    rounded = col - pm + F.when(pm >= factor // 2, F.lit(factor)).otherwise(
        F.lit(0)
    )
    return scaled_to_double(rounded, from_scale)
