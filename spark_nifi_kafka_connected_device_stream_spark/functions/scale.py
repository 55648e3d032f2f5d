"""Skew and layout primitives for 100 TB operation.

- two-phase salted aggregation: when one group key holds a large share
  of all rows (hot key), a plain groupBy sends every row of that key
  to one reducer.  Salting splits the hot key across `n_salts` partial
  groups, then merges — bounded reducer input at the cost of a second
  (tiny) shuffle.
- salted broadcast-skew join is handled by AQE
  (`spark.sql.adaptive.skewJoin.enabled`, on in session.py); the
  explicit salt here is for aggregations, which AQE does not split.
- bucketed layout: `write_bucketed` persists a table pre-hashed on its
  join key so repeated joins on that key skip the exchange entirely
  (sources/warehouse.py owns plain partitioned layout).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with a random-ish salt derived from a
    stable row hash (deterministic — no rand(), so plans are
    replayable).  `aggs` maps output column name → DECOMPOSABLE
    aggregate expression over the input (count/sum/min/max).  The
    second phase re-aggregates the partials with sum/min/max by name
    convention: pass the merge fn via the expression's type.

    Usage:
        salted_agg(df, ["k"], {"n": F.count(F.lit(1)), "s": F.sum("v")})
    """
    salt = (F.abs(F.hash(*[F.col(c) for c in df.columns])) % n_salts).alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*keys, "_salt").agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    merged = []
    for name, expr in aggs.items():
        fn_name = expr._jc.toString().split("(")[0].lower()  # noqa: SLF001
        partial = F.col(f"_p_{name}")
        if fn_name.startswith("count") or fn_name.startswith("sum"):
            merged.append(F.sum(partial).alias(name))
        elif fn_name.startswith("min"):
            merged.append(F.min(partial).alias(name))
        elif fn_name.startswith("max"):
            merged.append(F.max(partial).alias(name))
        else:
            raise ValueError(f"non-decomposable aggregate for salted_agg: {fn_name}")
    return phase1.groupBy(*keys).agg(*merged)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist hash-bucketed (optionally sorted) layout so joins and
    aggregations on `bucket_col` read co-located buckets with NO
    exchange.  Requires a session catalog (in-memory default works;
    Hive for cross-session persistence)."""
    w = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    w.saveAsTable(table)
