"""Shared helpers for oracle-exact query plans.

The driver compares Spark vs DuckDB results by value hash, so float
aggregation must be bit-identical across engines. Two traps:

1. Float summation order differs between engines/partitions — never
   sum raw doubles.
2. decimal/hugeint -> double casts are NOT correctly rounded the same
   way in both engines (observed 1-2 ulp divergence on ~1e8 sums), so
   "sum in decimal, cast to double" is also unsafe.

The safe recipe, used everywhere: scale each per-row double to an
integer with round(expr * 10^s) (same IEEE multiply + same
ties-away-from-zero rounding on both engines), cast to BIGINT, sum
exactly in int64, convert once int64 -> double (correctly rounded in
both the JVM and C++), and divide by the scale constant with an
identical expression shape.

Overflow envelope: scale 10^6 with ~1e5-magnitude rows holds to
~9e18/1e11 ≈ 9e7 rows per group — fine through sf10. For a 100 TB
production run the same operators would aggregate in decimal(38,s)
(exact, no oracle-bit-match requirement there).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

SCALE = 6
_SCALE_D = float(10**SCALE)


def ssum(expr: Column, alias: str) -> Column:
    """Order-independent, engine-exact sum of a double expression."""
    s = F.sum(F.round(expr * F.lit(_SCALE_D), 0).cast("bigint"))
    return (s.cast("double") / F.lit(_SCALE_D)).alias(alias)


def savg(expr: Column, alias: str) -> Column:
    """Engine-exact average: scaled-int sum / scale / count."""
    s = F.sum(F.round(expr * F.lit(_SCALE_D), 0).cast("bigint"))
    return (s.cast("double") / F.lit(_SCALE_D) / F.count(F.lit(1))).alias(alias)


def _sql_scaled(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST(ROUND(({expr}) * 1000000.0) AS BIGINT)) AS BIGINT) AS DOUBLE)"


def sql_ssum(expr: str, alias: str) -> str:
    return f"{_sql_scaled(expr)} / 1000000.0 AS {alias}"


def sql_savg(expr: str, alias: str) -> str:
    return f"{_sql_scaled(expr)} / 1000000.0 / COUNT(*) AS {alias}"
