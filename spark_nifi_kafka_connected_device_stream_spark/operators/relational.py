"""Batch relational operator surface (SURVEY.md §7 Phase 0).

The reference has no batch query corpus (it is a streaming pipeline:
`nifi_spark_kafka_product_view_platform.py`), so per SURVEY.md §2.7
the full relational surface — scans with pushdown, joins of every
flavor, aggregation incl. rollup/cube/distinct, sorts/top-k, set ops,
scalar expressions — is declared here against the driver's TPC-H-ish
testdata, each with a DuckDB oracle.

Scale notes (100 TB posture):
- Filters/projections are written so Catalyst pushes them into the
  parquet scan (verified in tests/test_plans.py via PushedFilters).
- Dimension joins: explicit `F.broadcast` ONLY on provably bounded
  dims (nation 25 rows, region 5 — at 1000 executors a shuffle join
  on those is pure waste).  SF-scaling dims (customer, supplier,
  part) carry NO hint — the planner's measured-size decision
  broadcasts them at every SF where they fit the threshold and falls
  back to co-partitioned sort-merge past it, instead of pinning a
  plan that hits the 8 GB broadcast limit at warehouse scale
  (round-13 review; AQE converts derived small sides back to
  broadcast at runtime).
- No unbounded global sorts: every ORDER BY feeding a LIMIT is a
  bounded top-k (Spark executes orderBy().limit(k) as TakeOrdered,
  no full sort/exchange of the big side).
- Float aggregates are rounded in BOTH engines: summation order is
  nondeterministic under parallel partial aggregation, so the rounded
  value is the cross-engine contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..registry import register
from ..sources.catalog import load_table


# ---------------------------------------------------------------------------
# scans / projection / filter pushdown
# ---------------------------------------------------------------------------

@register(
    "scan_filter_project",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '2000-01-01 00:00:00' AND l_quantity >= 45
    """,
    doc="Parquet scan with filter+projection pushdown (SURVEY.md §2.2 P3/P4; "
        "reference projects via selectExpr at v1:33).",
    tags=("scan",),
)
def scan_filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.filter(
        (F.col("l_shipdate") >= "2000-01-01") & (F.col("l_quantity") >= 45)
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")


# ---------------------------------------------------------------------------
# aggregation core
# ---------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0                                        AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0                                   AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0                AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0  AS sum_charge,
           floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0                                        AS avg_qty,
           floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0                                   AS avg_price,
           floor((avg(l_discount)) * 1000000.0 + 0.5) / 1000000.0                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 shape: the hash-aggregation core (partial/final HashAggregate, "
        "map-side combine). Same operator family as the reference's streaming "
        "groupBy().count() (v1:48-51) in batch form.",
    tags=("agg",),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "2001-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            pround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            pround(F.sum(disc_price), 2).alias("sum_disc_price"),
            pround(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            pround(F.avg("l_quantity"), 4).alias("avg_qty"),
            pround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            pround(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "q6_revenue_delta",
    oracle="""
    SELECT floor((sum(l_extendedprice * l_discount)) * 100.0 + 0.5) / 100.0 AS revenue,
           count(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 shape: tight range predicates + single global aggregate; "
        "all three filters must reach the parquet scan.",
    tags=("agg", "scan"),
)
def q6_revenue_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount").between(0.03, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            pround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "agg_distinct_exact",
    oracle="""
    SELECT o_orderpriority,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total
    FROM orders
    GROUP BY o_orderpriority
    """,
    doc="Exact distinct aggregation (SURVEY.md §2.3 A4 — the reference "
        "*intended* distinct-user counts, v1:46; exact variant).",
    tags=("agg",),
)
def agg_distinct_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.count("*").alias("n_orders"),
        pround(F.sum("o_totalprice"), 2).alias("total"),
    )


@register(
    "agg_approx_distinct_bound",
    oracle="""
    SELECT DISTINCT event_type, true AS within_tolerance
    FROM events
    """,
    doc="approx_count_distinct (HLL++) — the scale path for distinct "
        "users (SURVEY.md §2.3 A4, import at v1:2) — under a "
        "driver-checkable accuracy contract.  This query SUBSUMES the "
        "retired r1 `agg_approx_distinct` (deleted in r14, VERDICT r13 "
        "item 3): the raw sketch estimate is engine-specific so a "
        "value oracle can never exist for it, and a permanently "
        "`no_oracle` registry entry violated the rotation invariant. "
        "The contract instead: per group, "
        "|approx_count_distinct(rsd=0.01) − exact| must stay "
        "within 5% of exact (5 sigma of the configured rsd).  The "
        "estimate itself is engine-specific so the VALUE can't be "
        "oracle-checked — but the BOUND can: the query emits one "
        "boolean per group and the oracle is the constant-true table, "
        "so a sketch regression flips the value hash red.  Both "
        "aggregates run in the same single-shuffle groupBy.",
    tags=("agg", "approx"),
)
def agg_approx_distinct_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # dedup to (event_type, user_id) FIRST, then count (optimization
    # r18): in the mixed distinct+approx aggregate the HLL partial ran
    # over EVERY event row while the countDistinct path deduped in its
    # own aggregate levels; HLL sketches are duplicate-insensitive
    # (re-inserting a value's hash is a register no-op), so
    # approx_count_distinct over the deduped rows builds the IDENTICAL
    # sketch, count(*) over them IS the exact distinct, and both ride
    # one dedup shuffle (2.06x paired at sf0.1)
    d = e.select("event_type", "user_id").distinct()
    g = d.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", 0.01).alias("approx_users"),
        F.count(F.lit(1)).alias("exact_users"),
    )
    return g.select(
        "event_type",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_tolerance"),
    )


@register(
    "agg_rollup",
    oracle="""
    SELECT CASE WHEN grouping(l_returnflag) = 1 THEN 'ALL'
                ELSE l_returnflag END AS returnflag,
           CASE WHEN grouping(l_linestatus) = 1 THEN 'ALL'
                ELSE l_linestatus END AS linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0     AS sum_qty,
           count(*)                      AS n_rows
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    doc="ROLLUP hierarchy totals (grouping-set aggregation; capability gap "
        "called out in SURVEY.md §2.7).",
    tags=("agg",),
)
def agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # grouping(), not coalesce (r12 review fix): a genuine NULL group
    # value would alias with the subtotal rows under coalesce;
    # grouping()=1 is the unambiguous subtotal marker (it must be
    # computed INSIDE the agg, where grouping-set context exists)
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            pround(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.count("*").alias("n_rows"),
            F.grouping("l_returnflag").alias("_g1"),
            F.grouping("l_linestatus").alias("_g2"),
        )
        .select(
            F.when(F.col("_g1") == 1, F.lit("ALL"))
            .otherwise(F.col("l_returnflag"))
            .alias("returnflag"),
            F.when(F.col("_g2") == 1, F.lit("ALL"))
            .otherwise(F.col("l_linestatus"))
            .alias("linestatus"),
            "sum_qty",
            "n_rows",
        )
    )


@register(
    "agg_cube",
    oracle="""
    SELECT CASE WHEN grouping(o_orderstatus) = 1 THEN 'ALL'
                ELSE o_orderstatus END   AS orderstatus,
           CASE WHEN grouping(o_orderpriority) = 1 THEN 'ALL'
                ELSE o_orderpriority END AS orderpriority,
           count(*)                         AS n_orders,
           floor((avg(o_totalprice)) * 10000.0 + 0.5) / 10000.0      AS avg_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    doc="CUBE over two dims (grouping-set aggregation).",
    tags=("agg",),
)
def agg_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # grouping() marker, same rationale and shape as agg_rollup (r12)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            pround(F.avg("o_totalprice"), 4).alias("avg_price"),
            F.grouping("o_orderstatus").alias("_g1"),
            F.grouping("o_orderpriority").alias("_g2"),
        )
        .select(
            F.when(F.col("_g1") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderstatus"))
            .alias("orderstatus"),
            F.when(F.col("_g2") == 1, F.lit("ALL"))
            .otherwise(F.col("o_orderpriority"))
            .alias("orderpriority"),
            "n_orders",
            "avg_price",
        )
    )


@register(
    "agg_pivot_status",
    oracle="""
    SELECT o_orderstatus,
           count(*) FILTER (WHERE o_orderpriority = '1-URGENT')        AS p1_urgent,
           count(*) FILTER (WHERE o_orderpriority = '2-HIGH')          AS p2_high,
           count(*) FILTER (WHERE o_orderpriority = '3-MEDIUM')        AS p3_medium,
           count(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS p4_not_specified,
           count(*) FILTER (WHERE o_orderpriority = '5-LOW')           AS p5_low
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Pivot (long→wide conditional aggregation) with explicit value list "
        "— explicit values avoid the extra distinct-values job at scale.",
    tags=("agg",),
)
def agg_pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
    out_names = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]
    piv = o.groupBy("o_orderstatus").pivot("o_orderpriority", prios).count()
    cols = [F.col("o_orderstatus")] + [
        F.coalesce(F.col(f"`{p}`"), F.lit(0)).alias(n) for p, n in zip(prios, out_names)
    ]
    return piv.select(*cols)


# ---------------------------------------------------------------------------
# joins
# ---------------------------------------------------------------------------

@register(
    "join_broadcast_dim",
    oracle="""
    SELECT n.n_name AS nation,
           count(*) AS n_orders,
           floor((sum(o.o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_price
    FROM orders o
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    doc="Fact⋈dim join, broadcast-planned: the hint is FORCED only on "
        "the bounded dim (nation, 25 rows forever); customer SCALES "
        "with SF, so its join is left to the planner's measured-size "
        "decision — broadcast at any SF where it fits the threshold "
        "(it does at every test SF, so the orders side never "
        "shuffles here), sort-merge past it instead of pinning an "
        "8 GB-broadcast-limit plan at warehouse scale (round-13 "
        "review: the forced-customer-broadcast class removed "
        "repo-wide, same rule as window_share_of_total's r12 fix).",
    tags=("join",),
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.count("*").alias("n_orders"), pround(F.sum("o_totalprice"), 2).alias("total_price"))
    )


@register(
    "join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 400000)
    """,
    doc="Left-semi join (EXISTS). Semi joins shuffle only keys — the right "
        "side is reduced before the join at scale.",
    tags=("join",),
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 400000)
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select("c_custkey", "c_name")


@register(
    "join_anti",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2001-01-01 00:00:00')
    """,
    doc="Left-anti join (NOT EXISTS): customers with no orders in 2001+.",
    tags=("join",),
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") >= "2001-01-01")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


@register(
    "join_outer_null_fill",
    oracle="""
    SELECT c.c_custkey,
           count(o.o_orderkey)                      AS n_big_orders,
           floor((coalesce(sum(o.o_totalprice), 0)) * 100.0 + 0.5) / 100.0 AS big_total
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 450000) o
      ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey
    """,
    doc="Left-outer join with null-aware aggregation (count skips nulls, "
        "sum null-filled to 0).",
    tags=("join",),
)
def join_outer_null_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 450000)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_big_orders"),
            pround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("big_total"),
        )
    )


@register(
    "q3_shipping_priority",
    oracle="""
    SELECT l.l_orderkey,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q3 shape: selective dim filter → fact join → agg → bounded "
        "top-k (TakeOrdered, never a global sort). Tie-break on l_orderkey "
        "makes the result set unique.",
    tags=("join", "agg", "topk"),
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-01-01")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-01-01")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c.select("c_custkey"), o.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            "o_orderpriority",
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5 shape: 6-way join. Dims (supplier/nation/region/customer) "
        "broadcast; only the orders⋈lineitem fact join shuffles.",
    tags=("join", "agg"),
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    ).select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA").select("r_regionkey")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q10_returned_items",
    oracle="""
    SELECT c.c_custkey, c.c_name,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           n.n_name AS nation,
           floor((c.c_acctbal) * 100.0 + 0.5) / 100.0 AS acctbal
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
      AND o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
    GROUP BY c.c_custkey, c.c_name, n.n_name, c.c_acctbal
    ORDER BY revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q10 shape: returned-item revenue ranking, bounded top-20.",
    tags=("join", "agg", "topk"),
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-07-01")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name", "c_acctbal")
        .agg(pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .select(
            "c_custkey",
            "c_name",
            "revenue",
            F.col("n_name").alias("nation"),
            pround("c_acctbal", 2).alias("acctbal"),
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# ---------------------------------------------------------------------------
# sort / top-k / set ops
# ---------------------------------------------------------------------------

@register(
    "sort_topk_global",
    oracle="""
    SELECT o_orderkey, o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 15
    """,
    doc="Global top-k (the reference's foreachBatch sort, v2:10, bounded): "
        "orderBy+limit compiles to TakeOrderedAndProject — per-partition "
        "heap + driver merge, no global sort at scale. Raw column values, "
        "no float arithmetic, so no rounding needed.",
    tags=("topk",),
)
def sort_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_totalprice", "o_orderstatus")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(15)
    )


@register(
    "set_union",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    UNION
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    doc="UNION (distinct) of two key sets.",
    tags=("setop",),
)
def set_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.union(s).distinct()


@register(
    "set_intersect",
    oracle="""
    SELECT o_custkey AS custkey FROM orders WHERE o_totalprice > 300000
    INTERSECT
    SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 5000
    """,
    doc="INTERSECT of two filtered key sets.",
    tags=("setop",),
)
def set_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 300000).select(
        F.col("o_custkey").alias("custkey")
    )
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 5000).select(
        F.col("c_custkey").alias("custkey")
    )
    return o.intersect(c)


@register(
    "set_except",
    oracle="""
    SELECT c_custkey AS custkey FROM customer
    EXCEPT
    SELECT o_custkey AS custkey FROM orders
    """,
    doc="EXCEPT: customers that never ordered.",
    tags=("setop",),
)
def set_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(F.col("c_custkey").alias("custkey"))
    o = load_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("custkey"))
    # distinct FIRST, then subtract (r12 review fix): exceptAll()
    # .distinct() is multiplicity arithmetic — a left key appearing 3x
    # against 1 right occurrence survives with 2 copies and leaks
    # through distinct(), where SQL EXCEPT (the oracle) removes it
    # entirely.  c_custkey happens to be unique so the fixtures never
    # exposed it; subtract() is also cheaper than multiplicity tracking.
    return c.distinct().subtract(o)


# ---------------------------------------------------------------------------
# scalar expression surface
# ---------------------------------------------------------------------------

@register(
    "scalar_string_funcs",
    oracle="""
    SELECT p_partkey,
           upper(p_brand)                   AS brand_u,
           lower(p_type)                    AS type_l,
           substr(p_name, 1, 8)             AS name_prefix,
           length(p_name)                   AS name_len,
           concat_ws('|', p_brand, p_type)  AS brand_type,
           replace(p_type, ' ', '_')        AS type_snake,
           reverse(p_brand)                 AS brand_rev,
           trim(concat(' ', p_brand, ' '))  AS brand_trim
    FROM part
    WHERE p_size <= 10
    """,
    doc="Scalar string expression surface (SURVEY.md §2.2 P3-P6 analog): "
        "all JVM-side, inside whole-stage codegen.",
    tags=("scalar",),
)
def scalar_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    return p.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_u"),
        F.lower("p_type").alias("type_l"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").cast("bigint").alias("name_len"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.reverse("p_brand").alias("brand_rev"),
        F.trim(F.concat(F.lit(" "), F.col("p_brand"), F.lit(" "))).alias("brand_trim"),
    )


@register(
    "scalar_null_handling",
    oracle="""
    SELECT o_orderkey,
           nullif(o_orderstatus, 'P')                      AS status_or_null,
           coalesce(nullif(o_orderstatus, 'P'), 'PENDING') AS status_filled,
           (nullif(o_orderstatus, 'P') IS NULL)            AS was_pending,
           CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END AS price_or_null,
           coalesce(CASE WHEN o_orderstatus = 'P' THEN NULL ELSE o_totalprice END, -1.0)
             AS price_filled
    FROM orders
    WHERE o_orderkey <= 1000
    """,
    doc="Null-handling surface: nullif / coalesce / IS NULL / null-aware "
        "CASE — the three-valued-logic battery.",
    tags=("scalar",),
)
def scalar_null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1000)
    st_null = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    price_null = F.when(F.col("o_orderstatus") == "P", F.lit(None)).otherwise(
        F.col("o_totalprice")
    )
    return o.select(
        "o_orderkey",
        st_null.alias("status_or_null"),
        F.coalesce(st_null, F.lit("PENDING")).alias("status_filled"),
        st_null.isNull().alias("was_pending"),
        price_null.alias("price_or_null"),
        F.coalesce(price_null, F.lit(-1.0)).alias("price_filled"),
    )


@register(
    "scalar_string_distance",
    oracle="""
    SELECT p_partkey,
           levenshtein(p_brand, 'Brand#11')        AS dist_to_b11,
           levenshtein(lower(p_type), 'standard')  AS dist_to_standard,
           (levenshtein(p_brand, 'Brand#11') <= 2) AS near_b11
    FROM part
    WHERE p_partkey <= 300
    """,
    doc="Edit-distance surface (levenshtein) — fuzzy string matching for "
        "entity resolution; identical DP semantics in both engines.",
    tags=("scalar", "text"),
)
def scalar_string_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").filter(F.col("p_partkey") <= 300)
    d_brand = F.levenshtein(F.col("p_brand"), F.lit("Brand#11"))
    return p.select(
        "p_partkey",
        d_brand.alias("dist_to_b11"),
        F.levenshtein(F.lower("p_type"), F.lit("standard")).alias("dist_to_standard"),
        (d_brand <= 2).alias("near_b11"),
    )


@register(
    "unpivot_status_counts",
    oracle="""
    WITH wide AS (
      SELECT o_orderstatus,
             count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS p1_urgent,
             count(*) FILTER (WHERE o_orderpriority = '5-LOW')    AS p5_low
      FROM orders GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, 'p1_urgent' AS priority, p1_urgent AS n FROM wide
    UNION ALL
    SELECT o_orderstatus, 'p5_low' AS priority, p5_low AS n FROM wide
    """,
    doc="Unpivot (wide→long melt) of a pivoted count table — the inverse "
        "of agg_pivot_status; Spark's unpivot()/melt operator.",
    tags=("agg", "reshape"),
)
def unpivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wide = o.groupBy("o_orderstatus").agg(
        F.sum((F.col("o_orderpriority") == "1-URGENT").cast("bigint")).alias("p1_urgent"),
        F.sum((F.col("o_orderpriority") == "5-LOW").cast("bigint")).alias("p5_low"),
    )
    return wide.unpivot(
        ids=["o_orderstatus"],
        values=["p1_urgent", "p5_low"],
        variableColumnName="priority",
        valueColumnName="n",
    )


@register(
    "scalar_date_funcs",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate)                       AS y,
           month(o_orderdate)                      AS m,
           day(o_orderdate)                        AS d,
           quarter(o_orderdate)                    AS q,
           strftime(o_orderdate, '%Y-%m-%d')       AS d_str,
           date_diff('day', o_orderdate, TIMESTAMP '2002-01-01 00:00:00') AS days_to_2002
    FROM orders
    WHERE o_orderkey <= 2000
    """,
    doc="Scalar date/time expression surface — the timestamp handling the "
        "reference did via LEGACY-parser to_timestamp (v1:37-40), done with "
        "explicit deterministic semantics (SURVEY.md §4.1).",
    tags=("scalar",),
)
def scalar_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 2000)
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("bigint").alias("y"),
        F.month("o_orderdate").cast("bigint").alias("m"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("d"),
        F.quarter("o_orderdate").cast("bigint").alias("q"),
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("d_str"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate"))
        .cast("bigint")
        .alias("days_to_2002"),
    )


@register(
    "scalar_date_arith",
    oracle="""
    SELECT o_orderkey,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d')      AS plus_30d,
           strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d')     AS plus_3m,
           strftime(last_day(o_orderdate), '%Y-%m-%d')              AS month_end,
           strftime(date_trunc('month', o_orderdate), '%Y-%m-%d')   AS month_start,
           strftime(date_trunc('year', o_orderdate), '%Y-%m-%d')    AS year_start,
           (2002 - year(o_orderdate)) * 12 + (1 - month(o_orderdate)) AS months_to_2002
    FROM orders
    WHERE o_orderkey <= 1500
    """,
    doc="Date arithmetic surface: interval add (days/months with "
        "end-of-month clamping), last_day, month/year truncation, month "
        "difference — all as formatted strings for engine-neutral compare.",
    tags=("scalar",),
)
def scalar_date_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 1500)
    fmt = lambda c: F.date_format(c, "yyyy-MM-dd")  # noqa: E731
    return o.select(
        "o_orderkey",
        fmt(F.col("o_orderdate") + F.expr("interval 30 days")).alias("plus_30d"),
        fmt(F.add_months("o_orderdate", 3)).alias("plus_3m"),
        fmt(F.last_day("o_orderdate")).alias("month_end"),
        fmt(F.date_trunc("month", "o_orderdate")).alias("month_start"),
        fmt(F.date_trunc("year", "o_orderdate")).alias("year_start"),
        # explicit month-index diff: months_between()'s fractional
        # day-of-month semantics and date_diff('month')'s boundary
        # counting disagree at month ends — this formula is exact in both
        ((F.lit(2002) - F.year("o_orderdate")) * 12 + (F.lit(1) - F.month("o_orderdate")))
        .cast("bigint")
        .alias("months_to_2002"),
    )


@register(
    "scalar_math_case",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100.0 + 0.5) / 100.0 AS charge,
           abs(l_discount - 0.05)                 AS disc_dev,
           CAST(ceil(l_quantity / 10.0) AS BIGINT)         AS qty_decile,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_k,
           floor((sqrt(l_extendedprice)) * 10000.0 + 0.5) / 10000.0        AS price_sqrt,
           CASE WHEN l_quantity < 10 THEN 'small'
                WHEN l_quantity < 30 THEN 'medium'
                ELSE 'large' END                  AS qty_band,
           (l_returnflag = 'R')                   AS is_returned
    FROM lineitem
    WHERE l_orderkey <= 400
    """,
    doc="Scalar math/conditional surface: arithmetic, abs/ceil/floor/sqrt, "
        "CASE WHEN, boolean projection.",
    tags=("scalar",),
)
def scalar_math_case(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 400)
    qty = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(
            F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
        ).alias("charge"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.ceil(qty / 10.0).cast("bigint").alias("qty_decile"),
        F.floor(F.col("l_extendedprice") / 1000.0).cast("bigint").alias("price_k"),
        pround(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.when(qty < 10, "small").when(qty < 30, "medium").otherwise("large").alias("qty_band"),
        (F.col("l_returnflag") == "R").alias("is_returned"),
    )


@register(
    "q12_priority_by_linestatus",
    oracle="""
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_linestatus
    """,
    doc="TPC-H Q12 shape (adapted to the lite schema: linestatus stands "
        "in for shipmode): join lineitem-orders with a ship-date range, "
        "split counts by order priority class. The date range pushes "
        "into the lineitem scan; the join shuffles on l_orderkey with "
        "partial aggregation after.",
    tags=("join", "agg"),
)
def q12_priority_by_linestatus(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    oracle="""
    SELECT floor((100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                         THEN l.l_extendedprice * (1 - l.l_discount)
                         ELSE 0.0 END)
             / sum(l.l_extendedprice * (1 - l.l_discount))) * 10000.0 + 0.5)
             / 10000.0 AS promo_revenue_pct,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: one-month lineitem slice joined to part, "
        "conditional revenue share. The part side is dimension-sized — "
        "Spark broadcasts it (asserted in test_plans for the join "
        "family); the date range pushes into the fact scan.",
    tags=("join", "agg"),
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-03-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    p = load_table(spark, sf_dir, "part")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.col("p_type").like("PROMO%")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            pround(
                F.lit(100.0)
                * F.sum(F.when(promo, rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                4,
            ).alias("promo_revenue_pct"),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q18_large_volume_orders",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, sum(l_quantity) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(l_quantity) > 150.0
    )
    SELECT c.c_name, o.o_custkey, o.o_orderkey, o.o_orderdate AS o_orderdate,
           floor(o.o_totalprice * 100.0 + 0.5) / 100.0 AS o_totalprice,
           floor(b.total_qty * 100.0 + 0.5) / 100.0 AS total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY o.o_totalprice DESC, o.o_orderkey
    LIMIT 100
    """,
    doc="TPC-H Q18 shape: aggregate lineitem per order, HAVING filter "
        "on the summed quantity, join back to orders + customer, "
        "bounded top-100 by total price (o_orderkey tie-break → unique "
        "result set). The HAVING prunes the join input to the rare "
        "large orders BEFORE the joins; top-k is "
        "TakeOrderedAndProject, never a global sort.",
    tags=("join", "agg", "topk"),
)
def q18_large_volume_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150.0)
    )
    return (
        big.join(o, o.o_orderkey == big.l_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .select("c_name", "o_custkey", "o_orderkey", "o_orderdate",
                "o_totalprice", "total_qty")
        # Order on the RAW price (matching the oracle's ORDER BY
        # o.o_totalprice) and round only in the final projection —
        # rounding before the sort could flip the top-100 set whenever
        # two prices differ below the cent.
        .orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .limit(100)
        .select(
            "c_name",
            "o_custkey",
            "o_orderkey",
            F.col("o_orderdate").alias("o_orderdate"),
            pround(F.col("o_totalprice"), 2).alias("o_totalprice"),
            pround(F.col("total_qty"), 2).alias("total_qty"),
        )
    )


@register(
    "q19_disjunctive_revenue",
    oracle="""
    SELECT floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5)
             / 100.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 21)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 1 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 45
           AND l.l_quantity >= 20 AND l.l_quantity <= 40)
    """,
    doc="TPC-H Q19 shape: disjunction of conjunctive brand/size/"
        "quantity ranges across the join. Catalyst extracts the "
        "common single-side conjuncts from the OR and pushes them "
        "below the join (l_quantity range to the fact scan, "
        "brand/size to the broadcast dimension), leaving only the "
        "cross-side residual on the join.",
    tags=("join", "agg", "scan"),
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q, brand, size = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((brand == "Brand#1") & size.between(1, 15) & q.between(1, 21))
        | ((brand == "Brand#2") & size.between(1, 30) & q.between(10, 30))
        | ((brand == "Brand#3") & size.between(1, 45) & q.between(20, 40))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(
            pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
                "revenue"
            ),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "q7_nation_volume_shipping",
    oracle="""
    SELECT sn.n_name AS supp_nation,
           cn.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           floor((sum(l.l_extendedprice * (1 - l.l_discount))) * 100.0 + 0.5)
             / 100.0 AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey = o.o_custkey
    JOIN nation cn   ON cn.n_nationkey = c.c_nationkey
    JOIN supplier s  ON s.s_suppkey = l.l_suppkey
    JOIN nation sn   ON sn.n_nationkey = s.s_nationkey
    WHERE (sn.n_name = 'NATION_18' AND cn.n_name = 'NATION_19')
       OR (sn.n_name = 'NATION_19' AND cn.n_name = 'NATION_18')
    GROUP BY sn.n_name, cn.n_name, CAST(year(l.l_shipdate) AS INTEGER)
    """,
    doc="TPC-H Q7 shape: volume shipped between two nations in both "
        "directions, per year. Two ROLE-PLAYING scans of the nation "
        "dimension (supplier-side and customer-side aliases) — "
        "supplier, customer, and both nation sides broadcast; the only "
        "data-sized shuffle is the lineitem-orders join plus the final "
        "tiny aggregate. The nation-pair disjunction is a cross-side "
        "residual (it references both aliases) and correctly stays on "
        "the joins.",
    tags=("join", "agg"),
)
def q7_nation_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cn = n.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    sn = n.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    joined = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, c.c_custkey == o.o_custkey)
        .join(F.broadcast(cn), F.col("cn_key") == c.c_nationkey)
        .join(s, s.s_suppkey == li.l_suppkey)
        .join(F.broadcast(sn), F.col("sn_key") == s.s_nationkey)
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        joined.filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("int").alias("l_year"),
        )
        .agg(
            pround(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H decorrelation tier (round 7): q2 / q16 / q20 shapes adapted to
# the lite schema (no partsupp table — lineitem's (l_partkey,
# l_suppkey) pairs stand in as the part-supplier relation).
# ---------------------------------------------------------------------------

@register(
    "q2_min_cost_supplier",
    oracle="""
    WITH offers AS (
      SELECT l_partkey AS partkey, l_suppkey AS suppkey,
             min(CAST(floor(l_extendedprice / l_quantity * 100.0 + 0.5)
                      AS BIGINT)) AS cost_c
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), asia AS (
      SELECT o.partkey, o.suppkey, o.cost_c, s.s_name, s.s_acctbal, n.n_name
      FROM offers o
      JOIN supplier s ON s.s_suppkey = o.suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    )
    SELECT a.s_acctbal, a.s_name, a.n_name, p.p_partkey, p.p_type,
           CAST(a.cost_c AS DOUBLE) / 100.0 AS unit_cost
    FROM asia a JOIN part p ON p.p_partkey = a.partkey
    WHERE p.p_size = 15
      AND a.cost_c = (SELECT min(a2.cost_c) FROM asia a2
                      WHERE a2.partkey = a.partkey)
    ORDER BY a.s_acctbal DESC, a.n_name, a.s_name, p.p_partkey
    LIMIT 100
    """,
    doc="TPC-H Q2 shape (min-cost supplier, correlated scalar "
        "subquery): cheapest ASIA supplier per size-15 part, where "
        "'offer cost' is the min unit price each supplier ever charged "
        "for the part (lineitem stands in for partsupp). The "
        "correlated `= (SELECT min ...)` is decorrelated by hand into "
        "a per-part min aggregate joined back on partkey — the exact "
        "rewrite Catalyst/DuckDB perform internally. Unit cost is "
        "rounded to exact integer cents BEFORE min/equality so the "
        "float-equality join is deterministic across engines. Scale: "
        "one lineitem-sized shuffle (the offers agg); everything "
        "after runs on the offers table (|parts|x|suppliers| at "
        "most); supplier/nation/region and part broadcast; top-100 is "
        "TakeOrderedAndProject.",
    tags=("join", "agg", "subquery", "topk"),
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_quantity"
    )
    s = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_name", "s_acctbal", "s_nationkey"
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    p = load_table(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_type"
    )
    cost_c = F.floor(
        F.col("l_extendedprice") / F.col("l_quantity") * 100.0 + F.lit(0.5)
    ).cast("bigint")
    offers = (
        li.select("l_partkey", "l_suppkey", cost_c.alias("cost_c"))
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("cost_c").alias("cost_c"))
    )
    supp_asia = (
        s.join(F.broadcast(n), n.n_nationkey == s.s_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    asia = offers.join(supp_asia, offers.l_suppkey == F.col("s_suppkey"))
    # decorrelate `= (SELECT min ... WHERE partkey = outer.partkey)` as a
    # per-part window min on the offers table rather than a self-joined
    # aggregate: a grouped-agg + join-back branches the plan and makes
    # Spark compute (and scan) the offers subtree twice; the window keeps
    # one linear plan (single lineitem scan) at the cost of one
    # offers-sized shuffle on partkey — many distinct keys, no skew.
    w = Window.partitionBy("l_partkey")
    # size-15 part filter BEFORE the window (r12 review fix): the
    # per-part min is unaffected by removing whole partkey partitions,
    # so the broadcast part join first prunes ~98% of the offers before
    # the window's partkey exchange — identical result, a fraction of
    # the shuffle/sort work
    return (
        asia.join(p, F.col("l_partkey") == p.p_partkey)
        .withColumn("best_c", F.min("cost_c").over(w))
        .filter(F.col("cost_c") == F.col("best_c"))
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_type",
            (F.col("cost_c").cast("double") / F.lit(100.0)).alias("unit_cost"),
        )
        .orderBy(F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


@register(
    "q16_supplier_part_counts",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(count(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#3' AND p.p_type NOT LIKE 'SMALL%'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN
          (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0.0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (parts/supplier relationship): distinct "
        "supplier counts per (brand, type, size) over the lineitem "
        "part-supplier relation, excluding 'complaint' suppliers via "
        "NOT IN (negative account balance stands in for the comment "
        "LIKE filter — the fixture supplier table has no s_comment). "
        "s_suppkey is non-null so NOT IN == broadcast anti-join; the "
        "IN-list size predicate is pushed to the part scan. Scale: "
        "the bad-supplier list and part dim broadcast; the only "
        "shuffle is the two-phase distinct aggregate.",
    tags=("join", "agg", "subquery"),
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf_dir, "part")
        .filter(
            (F.col("p_brand") != "Brand#3")
            & ~F.col("p_type").startswith("SMALL")
            & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
        )
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 0.0)
        .select("s_suppkey")
    )
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, li.l_partkey == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


@register(
    "q20_concentrated_suppliers",
    oracle="""
    WITH pp AS (
      SELECT l.l_suppkey,
             sum(CASE WHEN year(l.l_shipdate) = 1995
                 THEN CAST(floor(l.l_quantity * 100.0 + 0.5) AS BIGINT)
                 ELSE 0 END) AS q95_c,
             sum(CAST(floor(l.l_quantity * 100.0 + 0.5) AS BIGINT)) AS qall_c
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE p.p_name LIKE 'red%'
      GROUP BY l.l_suppkey, l.l_partkey
    )
    SELECT s.s_name, s.s_acctbal
    FROM supplier s
    WHERE s.s_suppkey IN (SELECT l_suppkey FROM pp WHERE q95_c * 2 > qall_c)
    ORDER BY s.s_name
    """,
    doc="TPC-H Q20 shape (potential part promotion, nested IN over a "
        "correlated aggregate): suppliers who shipped more than half "
        "of their all-time 'red' part volume (per part) during 1995 — "
        "availqty > half-of-shipped restated against lineitem since "
        "the lite schema has no partsupp. Quantities are exact "
        "integer centi-units so the x2-vs-total comparison can never "
        "ULP-flip between engines. Scale: part filter broadcasts into "
        "the lineitem scan, one (suppkey, partkey) aggregate shuffle, "
        "then the qualifying-supplier set (bounded by |supplier|) "
        "broadcasts back as a semi-join — the supplier table itself "
        "is never shuffled.",
    tags=("join", "agg", "subquery"),
)
def q20_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_shipdate", "l_quantity"
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").startswith("red"))
        .select("p_partkey")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_name", "s_acctbal", "s_suppkey")
    qty_c = F.floor(F.col("l_quantity") * 100.0 + F.lit(0.5)).cast("bigint")
    pp = (
        li.join(p, li.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                F.when(F.year("l_shipdate") == 1995, qty_c).otherwise(F.lit(0))
            ).alias("q95_c"),
            F.sum(qty_c).alias("qall_c"),
        )
    )
    keep = (
        pp.filter(F.col("q95_c") * 2 > F.col("qall_c")).select("l_suppkey").distinct()
    )
    return (
        s.join(keep, s.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# BOM hierarchy derived deterministically from the part key: parts 0-6
# are root assemblies, everything else hangs under key div 7 with an
# edge quantity of 1 + key % 3 (forest depth ~ log7 |parts|).  Both
# engines rebuild the same forest, so the full traversal is
# value-checked — the dedup-tier synthetic-input trick applied to
# recursive queries.
BOM_FANOUT = 7
BOM_MAX_DEPTH = 12  # covers 7^12 parts — far past any fixture SF


@register(
    "part_bom_explosion",
    oracle=f"""
    WITH RECURSIVE chain AS (
      SELECT p_partkey AS part, p_partkey AS cur,
             0 AS depth, CAST(1 AS BIGINT) AS total
      FROM part
      UNION ALL
      SELECT c.part, c.cur // {BOM_FANOUT}, c.depth + 1,
             c.total * (1 + c.cur % 3)
      FROM chain c WHERE c.cur >= {BOM_FANOUT}
    )
    SELECT CAST(part AS BIGINT)     AS part,
           CAST(cur AS BIGINT)      AS root,
           CAST(depth AS INTEGER)   AS depth,
           total                    AS total_qty
    FROM chain WHERE cur < {BOM_FANOUT}
    """,
    doc=f"Bill-of-materials explosion — the recursive-hierarchy query "
        f"class (org charts, category trees, BOM rollups) Spark has no "
        f"WITH RECURSIVE for: every part resolves to its ROOT "
        f"assembly, its depth, and the cumulative quantity (product "
        f"of per-edge quantities along the path — the 'how many "
        f"screws per tractor' number).  Engine shape: a driver-side "
        f"loop of at most {BOM_MAX_DEPTH} pointer-chasing rounds over "
        f"a materialized EDGE TABLE (parent read as DATA via a "
        f"co-partitioned join, exactly as a real BOM table would be "
        f"— not re-derived arithmetically), resolved rows passing "
        f"through untouched, lineage cut per round with "
        f"localCheckpoint; rounds needed = tree DEPTH (log-bounded), "
        f"not tree size, and each round is ONE equi-join on the "
        f"current pointer.  For pathological depths the rewrite is "
        f"pointer DOUBLING (join state with itself: depth halves per "
        f"round, O(log log) rounds) at the cost of quadratic total "
        f"join work — depth-bounded chasing is the right default for "
        f"real hierarchies.  All-integer arithmetic; the oracle runs "
        f"the same traversal as a recursive CTE.",
    tags=("relational", "hierarchy", "iterative"),
)
def part_bom_explosion(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    edges = (
        p.select(
            F.col("p_partkey").alias("node"),
            F.when(
                F.col("p_partkey") >= BOM_FANOUT,
                F.expr(f"p_partkey div {BOM_FANOUT}"),
            ).alias("parent"),
            (1 + F.col("p_partkey") % 3).cast("bigint").alias("qty"),
        )
        .localCheckpoint(eager=True)
    )
    state = edges.select(
        F.col("node").alias("part"),
        F.col("node").alias("cur"),
        F.lit(0).alias("depth"),
        F.lit(1).cast("bigint").alias("total"),
    )
    e2 = edges.select(
        F.col("node").alias("cur"),
        F.col("parent").alias("nxt"),
        F.col("qty").alias("step_qty"),
    )
    for _ in range(BOM_MAX_DEPTH):
        # converged when every chain sits at a root (keys < BOM_FANOUT
        # by construction): a cheap filter on the checkpointed state
        # replaces the wasted no-op rounds between actual depth and
        # the worst-case bound
        if state.filter(F.col("cur") >= BOM_FANOUT).isEmpty():
            break
        state = (
            # LEFT join (r12 review fix): an inner join silently DROPPED
            # any chain whose current key is absent from the edge table
            # (dangling parent in a sparse key set) — a lost row instead
            # of a surfaced unresolved root.  With the left join a
            # missing node behaves like a root edge (nxt NULL → the row
            # freezes at its current key, loop stays depth-bounded);
            # contiguous fixture keys make this a no-op there, and the
            # arithmetic-chase oracle agrees on any referentially
            # intact BOM.
            state.join(e2, "cur", "left")
            .select(
                "part",
                F.when(F.col("nxt").isNotNull(), F.col("nxt"))
                .otherwise(F.col("cur"))
                .alias("cur"),
                F.when(F.col("nxt").isNotNull(), F.col("depth") + 1)
                .otherwise(F.col("depth"))
                .alias("depth"),
                F.when(
                    F.col("nxt").isNotNull(), F.col("total") * F.col("step_qty")
                )
                .otherwise(F.col("total"))
                .alias("total"),
            )
            .localCheckpoint(eager=True)
        )
    return state.select(
        F.col("part").cast("bigint").alias("part"),
        F.col("cur").cast("bigint").alias("root"),
        F.col("depth").cast("int").alias("depth"),
        F.col("total").alias("total_qty"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter semi-join prefilter (round 9): the runtime-filtering
# pattern behind Spark's row-level bloom pushdown
# (spark.sql.optimizer.runtime.bloomFilter.enabled), stated
# declaratively so the guarantee itself is driver-checkable.  Build a
# k=3-hash Bloom bitset over the "interesting" join keys (URGENT
# orders), probe every distinct lineitem orderkey, and audit the two
# properties that make a Bloom prefilter admissible before a shuffle
# join: ZERO false negatives (deterministic, by construction) and a
# false-positive rate under the sized-for bound.
# ---------------------------------------------------------------------------

BLOOM_M = 1 << 18  # bits
BLOOM_K = 3  # hash functions
BLOOM_FP_BOUND = 0.05  # ~2x the theoretical (1 - e^{-kn/m})^k at sf0.1


@register(
    "orders_bloom_prefilter_bound",
    oracle=f"""
    WITH probe AS (
      SELECT DISTINCT l_orderkey FROM lineitem
    ), members AS (
      SELECT DISTINCT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    SELECT CAST((SELECT count(*) FROM probe) AS BIGINT) AS n_probe_keys,
           CAST((SELECT count(*) FROM probe JOIN members
                 ON o_orderkey = l_orderkey) AS BIGINT) AS n_member_keys,
           true AS zero_false_negatives,
           true AS fp_within_bound
    """,
    doc=f"Bloom-filter semi-join prefilter audit: a {BLOOM_K}-hash "
        f"Bloom set over URGENT orderkeys — sized FROM the member "
        f"count to hold the {BLOOM_FP_BOUND:.0%} bound at any SF "
        f"(power-of-two ceiling of -k*n/ln(1-bound^(1/k)), floored at "
        f"the legacy 2^18; r12 review fix — the pinned constant would "
        f"have flipped the audit red around sf1 on a healthy engine) — "
        f"probed by every distinct lineitem orderkey.  Checks the "
        f"admissibility "
        f"contract of runtime row-level filtering — no member key is "
        f"ever dropped (Bloom's deterministic no-false-negative "
        f"guarantee) and the false-positive pass-through stays under "
        f"{BLOOM_FP_BOUND:.0%} — before the expensive shuffle join runs "
        f"on the surviving rows.  Scale shape: the bitset is a "
        f"|members|·k-bounded distinct-position table (→ a broadcast "
        f"bitmap in production, exactly what Spark's bloom pushdown "
        f"injects); probes join it by bit position, never key-by-key "
        f"against the member set; the report is one row.  Hashes are "
        f"Spark-side xxhash64 — like the sketch bound twins, the "
        f"ORACLE pins the exact member/probe cardinalities and the "
        f"all-true outcome.",
    tags=("join", "approx", "sketch"),
)
def orders_bloom_prefilter_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    members = (
        o.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("key"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    probe = li.select(F.col("l_orderkey").alias("key")).distinct()
    # size m FROM the member count (r12 review fix): a pinned 2^18-bit
    # constant was sized for sf0.1 (~30k members, FP ~2.5%) and the
    # audit would flip red around sf1 (~300k members → FP ~90%) with
    # the Bloom code behaving exactly as designed.  Solve
    # (1 - e^{-k n/m})^k <= bound for m, round up to a power of two,
    # floor at the legacy 2^18.  The count is ONE bounded scalar
    # action on the member set the sketch is about to hash anyway; the
    # audit's output (cardinalities + bound booleans) is m-invariant
    # as long as the bound holds, so the oracle is untouched.
    import math

    n_members = members.count()
    if n_members > 0:
        m_needed = -BLOOM_K * n_members / math.log(
            1.0 - BLOOM_FP_BOUND ** (1.0 / BLOOM_K)
        )
        bloom_m = max(BLOOM_M, 1 << math.ceil(math.log2(m_needed)))
    else:
        bloom_m = BLOOM_M
    hashes = F.array(*[F.lit(i) for i in range(BLOOM_K)])
    bits = (
        members.withColumn("h", F.explode(hashes))
        .select(F.pmod(F.xxhash64("key", "h"), F.lit(bloom_m)).alias("pos"))
        .distinct()
    )
    probed = (
        probe.withColumn("h", F.explode(hashes))
        .select(
            "key",
            "h",
            F.pmod(F.xxhash64("key", "h"), F.lit(bloom_m)).alias("pos"),
        )
        .join(bits, "pos", "left_semi")
        .groupBy("key")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .where(F.col("n_hit") == BLOOM_K)
        .select("key")
    )
    is_member = members.withColumn("is_member", F.lit(True))
    audit = (
        probe.join(is_member, "key", "left")
        .join(probed.withColumn("passed", F.lit(True)), "key", "left")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probe_keys"),
            F.sum(F.when(F.col("is_member"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_member_keys"),
            F.sum(
                F.when(F.col("is_member") & F.col("passed").isNull(), 1).otherwise(0)
            ).alias("n_false_neg"),
            F.sum(
                F.when(F.col("passed") & F.col("is_member").isNull(), 1).otherwise(0)
            ).alias("n_false_pos"),
        )
    )
    return audit.select(
        "n_probe_keys",
        "n_member_keys",
        (F.col("n_false_neg") == 0).alias("zero_false_negatives"),
        (
            F.col("n_false_pos")
            <= F.lit(BLOOM_FP_BOUND)
            * (F.col("n_probe_keys") - F.col("n_member_keys"))
        ).alias("fp_within_bound"),
    )


@register(
    "lineitem_transit_overlap_by_part",
    oracle="""
    WITH iv AS (
      SELECT l.l_partkey, l.l_orderkey, l.l_linenumber,
             o.o_orderdate AS start_d, l.l_shipdate AS end_d
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      WHERE l.l_shipdate >= o.o_orderdate
    ), pairs AS (
      SELECT a.l_partkey, count(*) AS n_pairs
      FROM iv a JOIN iv b
        ON a.l_partkey = b.l_partkey
       AND (a.l_orderkey < b.l_orderkey
            OR (a.l_orderkey = b.l_orderkey AND a.l_linenumber < b.l_linenumber))
       AND a.start_d <= b.end_d
       AND b.start_d <= a.end_d
      GROUP BY a.l_partkey
    )
    SELECT p.p_brand,
           CAST(sum(pr.n_pairs) AS BIGINT)   AS n_overlap_pairs,
           CAST(count(*) AS BIGINT)          AS n_parts_with_overlap,
           CAST(max(pr.n_pairs) AS BIGINT)   AS max_pairs_one_part
    FROM pairs pr JOIN part p ON pr.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    """,
    doc="Interval-overlap RANGE JOIN with an equi-key prefix — the "
        "canonical 'range join' the DataFrame API lacks as a named "
        "operator: per part, pairs of lineitems whose FULFILLMENT "
        "windows [o_orderdate, l_shipdate] overlap (the part was on "
        "two open orders at once), rolled up per brand.  Scale shape: "
        "intervals come from ONE co-keyed lineitem-orders join on "
        "l_orderkey; the self-join is EQUI on l_partkey first — Spark "
        "plans a co-partitioned sort-merge join and the interval "
        "predicates run as join residuals inside each partkey group, "
        "so the pair blow-up is bounded by lines-per-part (~30 at "
        "every TPC-H SF, <=435 pairs), never all-pairs across the "
        "table; the (orderkey, linenumber) total order halves the "
        "pairs and dedups (a,b)/(b,a).  part is joined AFTER the "
        "per-part aggregate collapses pairs to |parts| rows.  A "
        "time-bucketed prefilter (month buckets) is deliberately NOT "
        "added: it double-counts pairs spanning bucket edges; the "
        "equi-key bound already caps the work.",
    tags=("relational", "join", "range"),
)
def lineitem_transit_overlap_by_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_orderkey", "l_linenumber", "l_shipdate"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    # non-empty-window guard (r12 review fix): ~49% of fixture lines
    # ship BEFORE their order date (measured) — an inverted window
    # [start > end] is an EMPTY interval, and counting it as overlapping
    # anything that spans it fabricated phantom pairs; the statistic is
    # "part on two OPEN orders at once", which needs a real open span
    iv = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate"))
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("o_orderdate").alias("start_d"),
            F.col("l_shipdate").alias("end_d"),
        )
    )
    a, b = iv.alias("a"), iv.alias("b")
    order_lt = (F.col("a.l_orderkey") < F.col("b.l_orderkey")) | (
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_linenumber") < F.col("b.l_linenumber"))
    )
    overlap = (F.col("a.start_d") <= F.col("b.end_d")) & (
        F.col("b.start_d") <= F.col("a.end_d")
    )
    per_part = (
        a.join(b, (F.col("a.l_partkey") == F.col("b.l_partkey")) & order_lt & overlap)
        .groupBy(F.col("a.l_partkey").alias("l_partkey"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        per_part.join(p, per_part.l_partkey == p.p_partkey)
        .groupBy("p_brand")
        .agg(
            F.sum("n_pairs").cast("bigint").alias("n_overlap_pairs"),
            F.count(F.lit(1)).cast("bigint").alias("n_parts_with_overlap"),
            F.max("n_pairs").cast("bigint").alias("max_pairs_one_part"),
        )
    )


# ---------------------------------------------------------------------------
# round 11: FIFO interval-alignment allocation
# ---------------------------------------------------------------------------

@register(
    "lineitem_fifo_allocation",
    oracle="""
    WITH supply AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS BIGINT))
                  OVER (PARTITION BY l_partkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end,
             CAST(l_quantity AS BIGINT) AS units
      FROM lineitem WHERE l_linestatus = 'F'
    ), demand AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(sum(CAST(l_quantity AS BIGINT))
                  OVER (PARTITION BY l_partkey
                        ORDER BY l_shipdate, l_orderkey, l_linenumber
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_end,
             CAST(l_quantity AS BIGINT) AS units
      FROM lineitem WHERE l_linestatus = 'O'
    )
    SELECT s.l_partkey,
           s.l_orderkey AS supply_orderkey, s.l_linenumber AS supply_line,
           d.l_orderkey AS demand_orderkey, d.l_linenumber AS demand_line,
           CAST(least(s.cum_end, d.cum_end)
                - greatest(s.cum_end - s.units, d.cum_end - d.units)
                AS BIGINT) AS alloc_units
    FROM supply s JOIN demand d
      ON d.l_partkey = s.l_partkey
     AND s.cum_end - s.units < d.cum_end
     AND d.cum_end - d.units < s.cum_end
    """,
    doc="FIFO allocation — the inventory/lot-matching operator class "
        "(Kimball FIFO, broker tax-lot matching, payment application) "
        "that has no native Spark node: within each part, completed "
        "lines ('F') form the SUPPLY sequence and open lines ('O') the "
        "DEMAND sequence, both in (shipdate, orderkey, linenumber) "
        "order; each demand unit consumes the earliest remaining "
        "supply unit.  The classical imperative queue becomes pure "
        "relational algebra via running-sum INTERVALS: supply row i "
        "covers units [cum_i - q_i, cum_i), demand row j likewise, and "
        "an allocation is exactly a non-empty interval overlap — "
        "alloc = min(ends) - max(starts).  Output is LINEAR, not "
        "quadratic: consecutive intervals tile the line, so total "
        "allocations ≤ n_supply + n_demand per part (each match "
        "advances at least one of the two frontiers).  All exact "
        "integers.  Scale shape: two per-part running-sum windows "
        "(partition-parallel across parts; per-part depth = lines per "
        "part, capacity-audited by orders_basket_size_histogram), one "
        "part-keyed equi-join with the overlap band predicate — "
        "co-partitioned on l_partkey, never all-pairs.",
    tags=("join", "window", "orders"),
)
def lineitem_fifo_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        "l_linestatus",
        F.col("l_quantity").cast("bigint").alias("units"),
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )

    def side(status: str, prefix: str) -> DataFrame:
        return (
            li.filter(F.col("l_linestatus") == status)
            .withColumn("cum_end", F.sum("units").over(w).cast("bigint"))
            .select(
                F.col("l_partkey").alias(f"{prefix}_partkey"),
                F.col("l_orderkey").alias(f"{prefix}_orderkey"),
                F.col("l_linenumber").alias(f"{prefix}_line"),
                F.col("cum_end").alias(f"{prefix}_end"),
                (F.col("cum_end") - F.col("units")).alias(f"{prefix}_start"),
            )
        )

    s = side("F", "s")
    d = side("O", "d")
    return (
        s.join(
            d,
            (F.col("s_partkey") == F.col("d_partkey"))
            & (F.col("s_start") < F.col("d_end"))
            & (F.col("d_start") < F.col("s_end")),
        )
        .select(
            F.col("s_partkey").alias("l_partkey"),
            F.col("s_orderkey").alias("supply_orderkey"),
            F.col("s_line").alias("supply_line"),
            F.col("d_orderkey").alias("demand_orderkey"),
            F.col("d_line").alias("demand_line"),
            (
                F.least(F.col("s_end"), F.col("d_end"))
                - F.greatest(F.col("s_start"), F.col("d_start"))
            )
            .cast("bigint")
            .alias("alloc_units"),
        )
    )


@register(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (
      SELECT c_custkey, nullif(c_nationkey % 5, 4) AS grp
      FROM customer WHERE c_custkey % 7 = 0
    ), b AS (
      SELECT nullif(n_nationkey % 5, 4) AS grp,
             CAST(count(*) AS BIGINT) AS n_nations
      FROM nation GROUP BY nullif(n_nationkey % 5, 4)
    )
    SELECT CAST(coalesce(a.grp, -1) AS BIGINT) AS grp_key,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(max(b.n_nations) AS BIGINT) AS n_nations
    FROM a JOIN b ON a.grp IS NOT DISTINCT FROM b.grp
    GROUP BY CAST(coalesce(a.grp, -1) AS BIGINT)
    """,
    doc="NULL-safe equality join — the join-family member plain "
        "equi-joins cannot express: `a.grp <=> b.grp` (Spark) ≡ "
        "`IS NOT DISTINCT FROM` (ANSI/DuckDB) matches NULL keys to "
        "NULL keys, where `=` silently drops every NULL-keyed row.  "
        "Both sides derive a deliberately-nullable key from the "
        "fixtures (nullif(x % 5, 4) — the %5=4 population becomes the "
        "NULL bucket), so the NULL-matches-NULL row is present in the "
        "result and the hash check fails if the join ever degrades to "
        "plain equality.  The NULL bucket is emitted as the -1 "
        "sentinel in BOTH engines (the parity harness's nullable-"
        "numeric-sort contract; -1 is outside nullif's 0-3 range so "
        "no collision).  Scale shape: "
        "Spark plans `<=>` as a hash join on the coalesced key (NULLs "
        "hash to one bucket) with the tiny grouped nation side "
        "broadcast — same physical shape as the equi-join, NOT a "
        "nested loop; a NULL-heavy population is a skew consideration "
        "exactly like any hot key (the salting playbook applies).",
    tags=("join", "null-semantics"),
)
def join_null_safe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_custkey") % 7 == 0)
    n = load_table(spark, sf_dir, "nation")
    a = c.select(
        "c_custkey", F.nullif(F.col("c_nationkey") % 5, F.lit(4)).alias("grp")
    )
    b = (
        n.select(F.nullif(F.col("n_nationkey") % 5, F.lit(4)).alias("grp"))
        .groupBy("grp")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nations"))
    )
    return (
        a.join(F.broadcast(b), a["grp"].eqNullSafe(b["grp"]))
        .groupBy(F.coalesce(a["grp"], F.lit(-1)).cast("bigint").alias("grp_key"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.max("n_nations").cast("bigint").alias("n_nations"),
        )
    )


@register(
    "orders_status_streaks",
    oracle="""
    WITH seq AS (
      SELECT o_custkey, o_orderstatus,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
             - row_number() OVER (PARTITION BY o_custkey, o_orderstatus
                                  ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
               AS island
      FROM orders
    ), streaks AS (
      SELECT o_custkey, o_orderstatus,
             CAST(count(*) AS BIGINT) AS streak_len
      FROM seq GROUP BY o_custkey, o_orderstatus, island
    )
    SELECT o_orderstatus,
           CAST(streak_len AS BIGINT)  AS streak_len,
           CAST(count(*) AS BIGINT)    AS n_streaks
    FROM streaks GROUP BY o_orderstatus, streak_len
    """,
    doc="Gaps-and-islands: runs of consecutive same-status orders per "
        "customer (in order-date sequence), summarized as a streak-"
        "length histogram per status — the canonical SQL islands "
        "pattern (island id = global row_number − per-status "
        "row_number, constant exactly within a run) the registry "
        "lacked as a named shape; sessionize is its cousin keyed on "
        "time gaps, this one is keyed on VALUE CHANGES.  The order key "
        "(date, orderkey) is a total order so runs are identical in "
        "both engines.  Scale shape: both row_numbers share ONE "
        "shuffle+sort on o_custkey (the second window's partition key "
        "is a subset refinement, computed in the same pass), then two "
        "narrowing aggregates; no self-join, no lag-cascade.",
    tags=("window", "sequence"),
)
def orders_status_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    order_cols = [F.col("o_orderdate").cast("date"), F.col("o_orderkey")]
    w_all = Window.partitionBy("o_custkey").orderBy(*order_cols)
    w_status = Window.partitionBy("o_custkey", "o_orderstatus").orderBy(*order_cols)
    seq = o.select(
        "o_custkey",
        "o_orderstatus",
        (F.row_number().over(w_all) - F.row_number().over(w_status)).alias("island"),
    )
    streaks = seq.groupBy("o_custkey", "o_orderstatus", "island").agg(
        F.count(F.lit(1)).cast("bigint").alias("streak_len")
    )
    return streaks.groupBy("o_orderstatus", "streak_len").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_streaks")
    )


@register(
    "lineitem_linenumber_gap_audit",
    oracle="""
    WITH seq AS (
      SELECT l_orderkey,
             CAST(l_linenumber AS BIGINT) AS ln,
             lag(CAST(l_linenumber AS BIGINT)) OVER (
               PARTITION BY l_orderkey ORDER BY l_linenumber) AS prev_ln,
             CAST(count(*) OVER (PARTITION BY l_orderkey) AS BIGINT) AS n_lines,
             CAST(max(l_linenumber) OVER (PARTITION BY l_orderkey)
                  AS BIGINT) AS max_ln,
             CAST(min(l_linenumber) OVER (PARTITION BY l_orderkey)
                  AS BIGINT) AS min_ln
      FROM lineitem
    ), per_order AS (
      SELECT l_orderkey, max(n_lines) AS n_lines,
             CAST(sum(CASE WHEN prev_ln IS NOT NULL AND ln - prev_ln > 1
                           THEN ln - prev_ln - 1 ELSE 0 END) AS BIGINT)
               AS missing_interior,
             max(CASE WHEN min_ln <> 1 THEN 1 ELSE 0 END) AS bad_start,
             max(max_ln) AS max_ln
      FROM seq GROUP BY l_orderkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CASE WHEN missing_interior > 0 OR bad_start = 1
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_orders_with_gaps,
           CAST(sum(missing_interior) AS BIGINT) AS total_missing_interior,
           CAST(sum(bad_start) AS BIGINT)        AS n_bad_start,
           CAST(max(max_ln) AS BIGINT)           AS max_linenumber_seen
    FROM per_order
    """,
    doc="Sequence-gap integrity audit: l_linenumber is contractually "
        "1..N dense per order — this audits the whole corpus for "
        "interior gaps (lag delta > 1) and bad starts (min ≠ 1), the "
        "ingest-corruption screen every ordered child table needs "
        "(dropped rows in a partial load show up here before any "
        "downstream join mis-counts).  On the intact fixture every "
        "violation count is 0 and the value hash PINS that zero — a "
        "fixture regen that drops rows flips the driver check red.  "
        "Scale shape: one shuffle on l_orderkey; lag and the per-order "
        "count/min/max share the single sort; then a 1-row corpus "
        "rollup.  All counts exact integers.",
    tags=("audit", "sequence", "window"),
)
def lineitem_linenumber_gap_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    wp = Window.partitionBy("l_orderkey")
    ln = F.col("l_linenumber").cast("bigint")
    seq = li.select(
        "l_orderkey",
        ln.alias("ln"),
        F.lag(ln).over(w).alias("prev_ln"),
        F.count(F.lit(1)).over(wp).cast("bigint").alias("n_lines"),
        F.max(ln).over(wp).alias("max_ln"),
        F.min(ln).over(wp).alias("min_ln"),
    )
    per_order = seq.groupBy("l_orderkey").agg(
        F.max("n_lines").alias("n_lines"),
        F.sum(
            F.when(
                F.col("prev_ln").isNotNull() & (F.col("ln") - F.col("prev_ln") > 1),
                F.col("ln") - F.col("prev_ln") - 1,
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("missing_interior"),
        F.max(F.when(F.col("min_ln") != 1, 1).otherwise(0)).alias("bad_start"),
        F.max("max_ln").alias("max_ln"),
    )
    return per_order.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(
            F.when(
                (F.col("missing_interior") > 0) | (F.col("bad_start") == 1), 1
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("n_orders_with_gaps"),
        F.sum("missing_interior").cast("bigint").alias("total_missing_interior"),
        F.sum("bad_start").cast("bigint").alias("n_bad_start"),
        F.max("max_ln").cast("bigint").alias("max_linenumber_seen"),
    )
