"""Exact-decimal money arithmetic, portable across Spark and DuckDB.

``round()`` on DOUBLE disagrees between engines at displayed-half
boundaries (Spark rounds the exact binary value via BigDecimal HALF_UP;
DuckDB scales-then-rints), so every money expression here is computed in
DECIMAL, where both engines are exact and round identically
(half-away-from-zero).

Source columns carry ≤2 decimal digits (TPC-H money), so DECIMAL(12,2)
represents them exactly; products are kept within DuckDB's 38-digit
multiply limit by lossless intermediate casts.

Still all Catalyst expressions — decimal math stays in codegen.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec2(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def disc_price(ep: str = "l_extendedprice", disc: str = "l_discount") -> Column:
    """extended_price * (1 - discount), exact at scale 4."""
    return (dec2(ep) * (F.lit(1) - dec2(disc))).cast("decimal(18,4)")


def charge(ep: str = "l_extendedprice", disc: str = "l_discount", tax: str = "l_tax") -> Column:
    """disc_price * (1 + tax), exact at scale 6."""
    return (disc_price(ep, disc) * (F.lit(1) + dec2(tax))).cast("decimal(24,6)")


def dsum2(c: Column, alias: str) -> Column:
    """Exact decimal sum, rounded to 2dp, surfaced as double."""
    return F.round(F.sum(c), 2).cast("double").alias(alias)


def davg2(c: Column, alias: str) -> Column:
    """avg as double(exact decimal sum)/count — deterministic because the
    quotient of a non-power-of-two count never lands on a displayed half."""
    return F.round(F.sum(c).cast("double") / F.count(F.lit(1)), 2).alias(alias)


def dround2(c: Column, alias: str) -> Column:
    """Per-row 2dp rounding of an exact decimal expression, as double."""
    return F.round(c, 2).cast("double").alias(alias)


# --- DuckDB oracle renderings ------------------------------------------------

def o_dec2(expr: str) -> str:
    return f"cast({expr} as decimal(12,2))"


def o_disc_price(ep: str = "l_extendedprice", disc: str = "l_discount") -> str:
    return f"cast({o_dec2(ep)} * (1 - {o_dec2(disc)}) as decimal(18,4))"


def o_charge(ep: str = "l_extendedprice", disc: str = "l_discount", tax: str = "l_tax") -> str:
    return f"cast({o_disc_price(ep, disc)} * (1 + {o_dec2(tax)}) as decimal(24,6))"


def o_dsum2(expr: str, alias: str) -> str:
    return f"cast(round(sum({expr}), 2) as double) AS {alias}"


def o_davg2(expr: str, alias: str) -> str:
    return f"round(cast(sum({expr}) as double) / count(*), 2) AS {alias}"


def o_dround2(expr: str, alias: str) -> str:
    return f"cast(round({expr}, 2) as double) AS {alias}"
