"""Deterministic skewed-warehouse generator (stress / benchmark tooling).

The driver's fixtures (TESTDATA.md) are uniform — at sf0.1 no key owns
enough mass for AQE's skew machinery to ever fire, so the bench alone
cannot prove the engine's skew posture.  This module generates a
schema-compatible mini-warehouse whose fact tables carry a deliberate
hot key (~50% of all rows), following the fixtures' protocol:
deterministic (seed folded into xxhash64 — no rand(), identical output
every run on every box), same column names/types as
/root/testdata/sf*/ for the tables it writes — nation, supplier,
part, orders, lineitem, events — so `sources.catalog.load_table` and
any query over THAT subset (q9, the skew pair, the events tier) runs
unchanged; customer/region/documents/embeddings are not generated.

Skew shape:
- `lineitem`: l_orderkey = 1 on every even row (~50% of the fact) —
  the mega-basket that makes the q9 lineitem⋈orders shuffle join
  one-task-bound without AQE skew splitting.
- `events`: user_id = 2 on every even row (~50% mass; even ⇒ the
  skew_hot_key pair's "hot" bucket), one source dominating — the hot
  aggregation key for the salted-vs-plain comparison.

Consumers: tests/test_scale_primitives.py (plan assertions that the
mitigations FIRE) and tools/skew_stress.py (wall-clock evidence,
PERF.md "Skew stress" section).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SEED = 42
HOT_ORDERKEY = 1
HOT_USER_ID = 2


def _u(col, salt: int):
    """Deterministic uniform [0,1) derived from a column + salt."""
    return (
        F.pmod(F.xxhash64(col, F.lit(SEED), F.lit(salt)), F.lit(1_000_000)).cast(
            "double"
        )
        / 1.0e6
    )


def _key(col, salt: int, n: int):
    """Deterministic key in [0, n)."""
    return F.pmod(F.xxhash64(col, F.lit(SEED), F.lit(salt)), F.lit(n))


def generate_skewed_warehouse(
    spark: SparkSession,
    out_dir: str,
    lineitem_rows: int = 240_000,
    events_rows: int = 240_000,
    orders_rows: int = 8_000,
    parts: int = 2_000,
    suppliers: int = 200,
) -> str:
    """Write the skewed mini-warehouse under `out_dir` and return it.

    Every value is a pure function of the row id, so the same sizes
    always produce byte-identical data.  Partition count scales with
    size so generation parallelizes but files stay coarse.
    """
    os.makedirs(out_dir, exist_ok=True)

    nation = spark.range(25).select(
        F.col("id").cast("int").alias("n_nationkey"),
        F.concat(F.lit("NATION_"), F.col("id")).alias("n_name"),
        (F.col("id") % 5).cast("int").alias("n_regionkey"),
    )
    nation.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/nation.parquet")

    supplier = spark.range(1, suppliers + 1).select(
        F.col("id").alias("s_suppkey"),
        F.concat(F.lit("Supplier#"), F.col("id")).alias("s_name"),
        _key(F.col("id"), 1, 25).cast("int").alias("s_nationkey"),
        (_u(F.col("id"), 2) * 10000.0).alias("s_acctbal"),
    )
    supplier.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/supplier.parquet")

    part = spark.range(1, parts + 1).select(
        F.col("id").alias("p_partkey"),
        # ~half the parts match q9's '%ol%' LIKE filter
        F.when(F.col("id") % 2 == 0, F.concat(F.lit("olive metal part "), F.col("id")))
        .otherwise(F.concat(F.lit("plain steel part "), F.col("id")))
        .alias("p_name"),
        F.concat(F.lit("Brand#"), (F.col("id") % 5)).alias("p_brand"),
        F.concat(F.lit("TYPE_"), (F.col("id") % 7)).alias("p_type"),
        ((F.col("id") % 50) + 1).cast("int").alias("p_size"),
        (F.lit(900.0) + _u(F.col("id"), 3) * 1100.0).alias("p_retailprice"),
    )
    part.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/part.parquet")

    orders = spark.range(1, orders_rows + 1).select(
        F.col("id").alias("o_orderkey"),
        (_key(F.col("id"), 4, 10_000) + 1).alias("o_custkey"),
        F.when(F.col("id") % 3 == 0, F.lit("F")).otherwise(F.lit("O")).alias(
            "o_orderstatus"
        ),
        (_u(F.col("id"), 5) * 100_000.0).alias("o_totalprice"),
        F.to_timestamp(
            F.date_add(F.to_date(F.lit("1995-01-01")), _key(F.col("id"), 6, 2557).cast("int"))
        ).alias("o_orderdate"),
        F.concat(F.lit("PRIO_"), (F.col("id") % 5)).alias("o_orderpriority"),
    )
    orders.coalesce(max(1, orders_rows // 500_000 + 1)).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/orders.parquet")

    li = spark.range(lineitem_rows).select(
        # THE hot key: even ids all land on orderkey 1 (~50% mass)
        F.when(F.col("id") % 2 == 0, F.lit(HOT_ORDERKEY))
        .otherwise(_key(F.col("id"), 7, orders_rows - 1) + 2)
        .alias("l_orderkey"),
        (_key(F.col("id"), 8, parts) + 1).alias("l_partkey"),
        (_key(F.col("id"), 9, suppliers) + 1).alias("l_suppkey"),
        ((F.col("id") % 7) + 1).cast("int").alias("l_linenumber"),
        (_key(F.col("id"), 10, 50) + 1).cast("double").alias("l_quantity"),
        (F.lit(100.0) + _u(F.col("id"), 11) * 99_900.0).alias("l_extendedprice"),
        ((_key(F.col("id"), 12, 11)).cast("double") / 100.0).alias("l_discount"),
        ((_key(F.col("id"), 13, 9)).cast("double") / 100.0).alias("l_tax"),
        F.element_at(
            F.array(F.lit("A"), F.lit("N"), F.lit("R")),
            (_key(F.col("id"), 14, 3) + 1).cast("int"),
        ).alias("l_returnflag"),
        F.when(F.col("id") % 2 == 0, F.lit("O")).otherwise(F.lit("F")).alias(
            "l_linestatus"
        ),
        F.to_timestamp(
            F.date_add(F.to_date(F.lit("1995-02-01")), _key(F.col("id"), 15, 2500).cast("int"))
        ).alias("l_shipdate"),
    )
    # the fact tables MUST span multiple files: AQE's skew split
    # divides a hot reduce partition along MAP-OUTPUT boundaries, so a
    # single-file scan (one mapper) makes the hot partition unsplittable
    # no matter how skewed it is — 16+ mappers give the splitter room.
    li.repartition(max(16, lineitem_rows // 2_000_000)).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/lineitem.parquet")

    events = spark.range(events_rows).select(
        F.col("id").alias("event_id"),
        # 2024-01-01 UTC epoch + up to 7 days of deterministic jitter
        F.timestamp_seconds(
            F.lit(1_704_067_200) + _key(F.col("id"), 16, 7 * 86_400)
        ).alias("ts"),
        # THE hot key: even ids all land on user 2 (~50% mass; even ⇒
        # the skew_hot_key pair buckets it as 'hot')
        F.when(F.col("id") % 2 == 0, F.lit(HOT_USER_ID).cast("bigint"))
        .otherwise(_key(F.col("id"), 17, 9_999) + 3)
        .alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase"), F.lit("cart")),
            (_key(F.col("id"), 18, 4) + 1).cast("int"),
        ).alias("event_type"),
        (_u(F.col("id"), 19) * 500.0).alias("value"),
        F.concat(F.lit('{"k": '), _key(F.col("id"), 20, 1000), F.lit("}")).alias(
            "props"
        ),
    )
    events.repartition(max(16, events_rows // 2_000_000)).write.mode(
        "overwrite"
    ).parquet(f"{out_dir}/events.parquet")

    return out_dir


def reducer_share(df: DataFrame, keys: list, n_partitions: int = 32) -> float:
    """Largest hash-partition share of `df`'s rows when shuffled on
    `keys` — the fraction of ALL input one reducer would receive for
    an accumulator-style aggregate (collect_list/set, exact
    percentile) where map-side combine does not shrink its input.
    This is the box-noise-free skew metric: at 100 TB the max reducer
    share IS the straggler wall-clock."""
    part = F.pmod(F.hash(*keys), F.lit(n_partitions)).alias("_p")
    counts = df.select(part).groupBy("_p").count().collect()
    if not counts:
        return 0.0  # empty input: no reducer receives anything
    total = sum(r["count"] for r in counts)
    return max(r["count"] for r in counts) / total
