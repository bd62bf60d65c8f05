"""Shared determinism helpers for oracle-matched queries.

Floating-point sums are order-dependent, and Spark's partial-aggregate
tree differs from DuckDB's, so ``SUM(double)`` can disagree in the last
bits. These helpers make headline money aggregates *exact*: scale to
integer cents/micros, round once (both engines round half away from
zero), sum as 64-bit integers (associative ⇒ order-independent), then
perform a single float division at the end — bit-identical on both
engines. This also holds at 100 TB: the int64 sums stay exact up to
9.2e18 cents.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money_sum(col: Column | str, scale: int = 100) -> Column:
    """Exact, order-independent sum of a fixed-decimal double column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(F.round(c * scale).cast("long")) / F.lit(float(scale))


def money_sum_sql(expr: str, scale: int = 100) -> str:
    """DuckDB mirror of :func:`money_sum` (CAST BIGINT avoids HUGEINT)."""
    return f"CAST(SUM(CAST(round(({expr}) * {scale}) AS BIGINT)) AS BIGINT) / {float(scale)}"


# Fixed-format timestamp rendering used whenever a timestamp appears in
# query output (both engines format to microsecond precision).
TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss.SSSSSS"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S.%f"


def ts_str(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, TS_FMT_SPARK)


def ts_str_sql(expr: str) -> str:
    return f"strftime({expr}, '{TS_FMT_DUCK}')"
