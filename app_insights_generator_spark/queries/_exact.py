"""Exact-decimal money arithmetic shared by the query registry.

Why this exists (round-4 verdict item 1): ``SUM`` over DOUBLE is
order-dependent, so ``ROUND(SUM(double), 2)`` can flip by one cent between
runs/engines depending on partition merge order — q9 went driver-red in
round 3 from exactly this. Every money column in the driver tables is an
exact 2-decimal value stored as double (verified: casting through
DECIMAL(18,2) and back is lossless on all of l_extendedprice, l_discount,
l_tax, o_totalprice, c_acctbal, s_acctbal, p_retailprice, events.value), so
summing in DECIMAL is exact and deterministic, and ROUND on a DECIMAL has
identical half-up semantics in Spark and DuckDB. The pattern on both sides:

    Spark : F.round(F.sum(<decimal expr>), 2).cast("double")
    DuckDB: CAST(ROUND(SUM(<decimal expr>), 2) AS DOUBLE)

Decimal widths are chosen tight so products never exceed precision 38
(where Spark silently reduces scale and DuckDB errors): money DECIMAL(14,2)
x (1 ± frac DECIMAL(4,2)) = DECIMAL(20,4); a further (1 + tax) factor gives
DECIMAL(26,6). Sums widen (Spark +10 digits, DuckDB to 38) without losing
exactness — at 100 TB a global money total is ~1e17, far inside range.

Integral-valued doubles (l_quantity, token counts) sum exactly in double
(every intermediate < 2^53), so those aggregates are left as-is.

Ratio aggregates (market share, promo share) divide two exact decimal sums
AFTER casting each to double: one IEEE division of identical inputs is
deterministic and identical across engines; only the summation needed fixing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Matching SQL fragments for oracle strings ------------------------------

#: exact decimal cast of a 2-decimal money column (price, balance, value)
SQL_MONEY = "CAST({col} AS DECIMAL(14,2))"
#: exact (1 - frac) / (1 + frac) for 2-decimal fractions (discount, tax)
SQL_ONE_MINUS = "(CAST(1 AS DECIMAL(3,2)) - CAST({col} AS DECIMAL(4,2)))"
SQL_ONE_PLUS = "(CAST(1 AS DECIMAL(3,2)) + CAST({col} AS DECIMAL(4,2)))"


def sql_money(col: str) -> str:
    return SQL_MONEY.format(col=col)


def sql_disc_price(price: str = "l_extendedprice", disc: str = "l_discount") -> str:
    """l_extendedprice * (1 - l_discount) as an exact DECIMAL(20,4)."""
    return f"{sql_money(price)} * {SQL_ONE_MINUS.format(col=disc)}"


def sql_charge(
    price: str = "l_extendedprice", disc: str = "l_discount", tax: str = "l_tax"
) -> str:
    """price * (1 - disc) * (1 + tax) as an exact DECIMAL(26,6)."""
    return f"{sql_disc_price(price, disc)} * {SQL_ONE_PLUS.format(col=tax)}"


def sql_money_sum(expr: str, nd: int = 2) -> str:
    """ROUND(SUM(decimal expr), nd) cast back to DOUBLE."""
    return f"CAST(ROUND(SUM({expr}), {nd}) AS DOUBLE)"


def sql_mean(expr: str) -> str:
    """Order-independent AVG over non-null rows: exact decimal sum (as
    double) over the count of the same expression."""
    return f"(CAST(SUM({expr}) AS DOUBLE) / COUNT({expr}))"


# Spark-side twins --------------------------------------------------------


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def money(col) -> Column:
    """Exact decimal view of a 2-decimal money column."""
    return _c(col).cast("decimal(14,2)")


def one_minus(col) -> Column:
    return F.lit(1).cast("decimal(3,2)") - _c(col).cast("decimal(4,2)")


def one_plus(col) -> Column:
    return F.lit(1).cast("decimal(3,2)") + _c(col).cast("decimal(4,2)")


def disc_price(price="l_extendedprice", disc="l_discount") -> Column:
    return money(price) * one_minus(disc)


def charge(price="l_extendedprice", disc="l_discount", tax="l_tax") -> Column:
    return disc_price(price, disc) * one_plus(tax)


def money_sum(expr, nd: int = 2) -> Column:
    """ROUND(SUM(decimal expr), nd) as double — alias at the call site."""
    return F.round(F.sum(_c(expr)), nd).cast("double")
