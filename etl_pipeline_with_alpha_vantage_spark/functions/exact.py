"""Cross-engine-exact aggregation helpers.

The driver verifies every query against a DuckDB oracle with an
order-insensitive **value hash** (CORRECTNESS_r{N}.json). A plain
``SUM(double)`` is not reproducible across engines: floating-point addition
is non-associative, and Spark's partial/final aggregation visits rows in a
different order than DuckDB's, so the low bits (and after enough rows, the
printed decimals) diverge.

All numeric measure columns in the synthetic warehouse carry exactly two
decimal places (verified on sf0.01: ``x == round(x, 2)`` for every measure).
So we aggregate in scaled integers ("cents"): ``bigint`` addition is exact
and associative, both engines produce the identical integer, and a final
``/ 100.0`` yields the identical double. The SQL oracles use the same
formulation (see operator modules).

Overflow headroom: sum of cents at sf0.1 is ~2e11; bigint caps at 9.2e18,
so this is safe past sf=10,000 (~6e12 rows of lineitem). Products of two
cents columns (price × discount) scale by 1e4 and still clear 100 TB scale;
three-way products use 1e6 and are used only on filtered subsets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def cents(col: Column | str, scale: int = 2) -> Column:
    """Exact scaled-integer representation of a fixed-decimal double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * (10**scale)).cast("long")


def dsum(col: Column | str, scale: int = 2) -> Column:
    """Order-insensitive exact SUM of a fixed-decimal double, as double."""
    return (F.sum(cents(col, scale)) / float(10**scale)).cast("double")


def davg(col: Column | str, scale: int = 2) -> Column:
    """Exact-sum AVG: integer sum, then one double division (reproducible)."""
    c = F.sum(cents(col, scale)).cast("double") / F.count(
        F.col(col) if isinstance(col, str) else col
    ).cast("double")
    return (c / float(10**scale)).cast("double")


def sql_cents(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`cents` (same rounding, same cast)."""
    return f"CAST(round(({expr}) * {10 ** scale}) AS BIGINT)"


def sql_dsum(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM({sql_cents(expr, scale)}) / {float(10 ** scale)} AS DOUBLE)"


def sql_davg(expr: str, scale: int = 2) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return (
        f"CAST(CAST(SUM({sql_cents(expr, scale)}) AS DOUBLE) / COUNT({expr})"
        f" / {float(10 ** scale)} AS DOUBLE)"
    )
