"""Portable rounding.

Spark's `round()` converts the double to its SHORTEST decimal
representation (BigDecimal.valueOf) before HALF_UP; DuckDB multiplies
and rounds the double directly.  The two disagree precisely when a
value's decimal expansion lands on the .​..5 boundary — which is
COMMON, not rare, when inputs carry fixed decimals (money columns:
products/averages of 2-decimal values land on exact boundaries).
Found by the sf0.1 oracle sweep: identical doubles rounded to
different values (e.g. 40792.005 → 40792.01 vs 40792.0).

`pround` is the same arithmetic in both engines:
    floor(x * 10^n + 0.5) / 10^n
On identical input doubles the result is bit-identical everywhere.
Every oracle SQL uses the same formula textually (half-up toward +inf
for negatives, consistently on both sides).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def pround(col: Column | str, n: int) -> Column:
    # Magnitude bound: Spark's floor(double) returns BIGINT and
    # saturates at 2^63-1 while DuckDB's floor stays double, so parity
    # holds only while |x| * 10^n < ~9.2e18 (n=6 → |x| < ~9.2e12).
    # Every registered query rounds values far below that (shares,
    # stats, dollar amounts); a query rounding ASTRONOMIC aggregates
    # must pre-scale — the int64_headroom_guard family is the pattern.
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**n)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)


def duck_pround(expr: str, n: int) -> str:
    scale = float(10**n)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def spark_u32(key: Column) -> Column:
    """Exact uint32 from the first 8 hex chars of md5(key) — the
    cross-engine deterministic uniform used by the bootstrap, DP-noise,
    feature-hashing, epoch-shuffle, and HT-sampling operators.  `key`
    must be a STRING column built identically to the oracle's
    `duck_u32` argument (same prefix, same '||' concatenation)."""
    return F.conv(F.substring(F.md5(key.cast("binary")), 1, 8), 16, 10).cast(
        "bigint"
    )


def duck_u32(key_expr: str) -> str:
    """DuckDB twin of spark_u32: uint32 from the first 8 md5 hex chars,
    assembled nibble-by-nibble (DuckDB has no hex→int cast that is
    guaranteed stable across versions)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr(md5({key_expr}), {i + 1}, 1)) - 1) "
            f"* {16 ** (7 - i)}"
            for i in range(8)
        )
        + ")"
    )
