"""Slowly-changing-dimension type 2 merge, without a lakehouse MERGE.

The guide's emulation recipe (anti-join + union + window) made
concrete: given the current SCD2 table (open rows have
`valid_to IS NULL`) and a batch of updates, produce the next SCD2
state — changed keys get their open row closed at the update's
effective timestamp and a new open row appended; unchanged keys pass
through untouched; brand-new keys open their first row.

Plan shape: one shuffle on the business key (dedupe-updates window +
full-outer join share the partitioning), then unions — no driver-side
loops, scales with the dimension.  With Delta/Iceberg present
(sources/lakehouse.py) the same logic is a single MERGE INTO.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Return the next SCD2 state.

    `current`: key, *attrs, valid_from, valid_to (null = open row)
    `updates`: key, *attrs, effective_col (latest per key wins)
    """
    closed = current.filter(F.col(valid_to).isNotNull())
    open_rows = current.filter(F.col(valid_to).isNull())

    w = Window.partitionBy(key).orderBy(F.desc(effective_col))
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    o = open_rows.alias("o")
    u = latest.alias("u")
    joined = o.join(u, F.col(f"o.{key}") == F.col(f"u.{key}"), "full_outer")

    # null-safe per-attribute comparison (a concat-based compare would
    # collide across attribute boundaries and on NULL vs empty string)
    any_attr_diff = None
    for a in attrs:
        diff = ~F.col(f"o.{a}").eqNullSafe(F.col(f"u.{a}"))
        any_attr_diff = diff if any_attr_diff is None else (any_attr_diff | diff)
    changed = F.col(f"u.{key}").isNotNull() & F.col(f"o.{key}").isNotNull() & any_attr_diff

    # open rows with no (effective) change: keep
    unchanged = joined.filter(
        F.col(f"o.{key}").isNotNull() & (F.col(f"u.{key}").isNull() | ~changed)
    ).select([F.col(f"o.{c}").alias(c) for c in open_rows.columns])

    # changed keys: close the old open row at the update's effective ts
    closed_now = joined.filter(changed).select(
        *[F.col(f"o.{c}").alias(c) for c in open_rows.columns if c != valid_to],
        F.col(f"u.{effective_col}").alias(valid_to),
    ).select([F.col(c) for c in open_rows.columns])

    # changed or brand-new keys: append a fresh open row
    fresh = joined.filter(
        changed | (F.col(f"o.{key}").isNull() & F.col(f"u.{key}").isNotNull())
    ).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{effective_col}").alias(valid_from),
        F.lit(None).cast(open_rows.schema[valid_to].dataType).alias(valid_to),
    ).select([F.col(c) for c in open_rows.columns])

    return closed.unionByName(unchanged).unionByName(closed_now).unionByName(fresh)
