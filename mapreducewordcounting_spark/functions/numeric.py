"""Exact money arithmetic for oracle-stable aggregates.

Doubles summed in different orders differ in the last ulp, and Spark's
``round`` (BigDecimal HALF_UP on the shortest decimal string) disagrees
with DuckDB's (binary-value rounding) exactly at .xx5 boundaries — both
observed in testing. The fix is to do money math in DECIMAL (exact,
order-independent, identical in any engine) and cast the final result
to DOUBLE: the same exact decimal maps to the same nearest double
everywhere, so the driver's value-hash is stable.

At scale this is also the *correct* posture: decimal aggregation avoids
catastrophic float accumulation over 100 TB of rows (the same reason we
widened the reference's int32 count to LongType, SURVEY.md §1.2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col: str | Column) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col: str | Column) -> Column:
    """Exact 2-dp decimal view of a money column."""
    return _c(col).cast("decimal(18,2)")


def one() -> Column:
    """Exact decimal literal 1.00 (for (1 − discount)-style factors).
    A function, not a module constant: Column construction needs an
    active SparkContext, which doesn't exist at import time."""
    return F.lit("1.00").cast("decimal(3,2)")


def net_price(price: str | Column = "l_extendedprice",
              discount: str | Column = "l_discount") -> Column:
    """price · (1 − discount), exact decimal(·,4)."""
    return money(price) * (one() - money(discount))


def dsum(expr: Column) -> Column:
    """Exact decimal sum, surfaced as double (order-independent)."""
    return F.sum(expr).cast("double")


def davg(expr: Column) -> Column:
    """Exact-numerator average as double: CAST(sum AS DOUBLE)/count."""
    return F.sum(expr).cast("double") / F.count("*")


# SQL fragments for the DuckDB oracle twins (same exact-decimal math).
SQL_MONEY = "CAST({col} AS DECIMAL(18,2))"
SQL_NET = ("(CAST({price} AS DECIMAL(18,2)) * "
           "(CAST('1.00' AS DECIMAL(3,2)) - CAST({disc} AS DECIMAL(18,2))))")
