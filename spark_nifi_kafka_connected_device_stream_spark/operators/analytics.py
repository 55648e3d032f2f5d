"""Advanced analytics operators: as-of joins, funnels, statistical
aggregates, array/collection functions, grouping sets.

None of these exist in the reference (SURVEY.md §2.7 lists joins,
window functions, grouping sets, UDFs as its capability gaps) — they
complete the engine's batch surface alongside operators/relational.py.

Scale notes inline per operator; the as-of join deliberately avoids
the naive per-row range join (quadratic) in favor of the union+window
single-shuffle plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import duck_u32, pround, spark_u32
from ..functions.scale import bounded_window_key, int64_headroom_guard
from ..registry import register
from ..sources.catalog import load_table


def _cents(col: F.Column) -> F.Column:
    """Exact integer 100ths of a 2-decimal double column (prices,
    discounts, balances).  Money sums MUST run in integer units when a
    query emits many rounded groups: a float sum is order-dependent by
    ~1 ULP, and across hundreds of groups some group WILL land on a
    rounding boundary and flip a cent between engines (q7 did, at
    sf0.01, in exactly one of 1245 groups).  SQL mirror:
    CAST(floor(x * 100.0 + 0.5) AS BIGINT)."""
    return F.floor(col * 100.0 + 0.5).cast("bigint")


@register(
    "asof_join_last_click",
    oracle="""
    WITH purchases AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS p_us
      FROM events WHERE event_type = 'purchase'
    ), clicks AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS c_us
      FROM events WHERE event_type = 'click'
    )
    SELECT p.user_id, p.event_id,
           max(c.c_us) AS last_click_us,
           p.p_us - max(c.c_us) AS gap_us
    FROM purchases p JOIN clicks c
      ON c.user_id = p.user_id AND c.c_us <= p.p_us
    GROUP BY p.user_id, p.event_id, p.p_us
    """,
    doc="AS-OF join (purchase → most recent prior click per user), the "
        "operator Spark lacks natively. Implemented as union-tag + one "
        "window over (user_id, time): single shuffle, linear state — NOT "
        "the quadratic range join the naive SQL implies (the oracle may be "
        "quadratic; the engine plan must not be). Purchases with no prior "
        "click are dropped (inner as-of).",
    tags=("join", "asof"),
)
def asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("us", F.col("ts_us"))
    tagged = e.filter(F.col("event_type").isin("purchase", "click")).select(
        "user_id",
        "event_id",
        "us",
        (F.col("event_type") == "click").alias("is_click"),
    )
    # order clicks before purchases at identical timestamps so a
    # same-instant click counts as "prior" (matches the oracle's <=)
    w = Window.partitionBy("user_id").orderBy(
        F.asc("us"), F.desc("is_click")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    last_click = F.last(F.when(F.col("is_click"), F.col("us")), ignorenulls=True).over(w)
    return (
        tagged.withColumn("last_click_us", last_click)
        .filter(~F.col("is_click") & F.col("last_click_us").isNotNull())
        .select(
            "user_id",
            "event_id",
            "last_click_us",
            (F.col("us") - F.col("last_click_us")).alias("gap_us"),
        )
    )


@register(
    "funnel_view_click_purchase",
    oracle="""
    WITH stages AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN epoch_ns(ts) // 1000 END)     AS v_us,
             min(CASE WHEN event_type = 'click' THEN epoch_ns(ts) // 1000 END)    AS c_us,
             min(CASE WHEN event_type = 'purchase' THEN epoch_ns(ts) // 1000 END) AS p_us
      FROM events GROUP BY user_id
    )
    SELECT count(*) AS n_users,
           count(*) FILTER (WHERE v_us IS NOT NULL) AS reached_view,
           count(*) FILTER (WHERE v_us IS NOT NULL AND c_us > v_us) AS reached_click,
           count(*) FILTER (WHERE v_us IS NOT NULL AND c_us > v_us AND p_us > c_us)
             AS reached_purchase
    FROM stages
    """,
    doc="Ordered funnel (view → click → purchase, first-touch ordering): "
        "one hash-agg per user then one global roll-up — the standard "
        "product-analytics query at any scale (no joins, two shuffles, "
        "second one on a single row set).",
    tags=("events", "funnel"),
)
def funnel_view_click_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("us", F.col("ts_us"))
    first = lambda t: F.min(F.when(F.col("event_type") == t, F.col("us")))  # noqa: E731
    stages = e.groupBy("user_id").agg(
        first("view").alias("v_us"), first("click").alias("c_us"), first("purchase").alias("p_us")
    )
    v = F.col("v_us").isNotNull()
    vc = v & (F.col("c_us") > F.col("v_us"))
    vcp = vc & (F.col("p_us") > F.col("c_us"))
    return stages.agg(
        F.count("*").alias("n_users"),
        F.sum(v.cast("bigint")).alias("reached_view"),
        F.sum(vc.cast("bigint")).alias("reached_click"),
        F.sum(vcp.cast("bigint")).alias("reached_purchase"),
    )


@register(
    "stats_moments",
    oracle="""
    SELECT event_type,
           floor((avg(value)) * 1000000.0 + 0.5) / 1000000.0          AS mean_v,
           floor((stddev_samp(value)) * 1000000.0 + 0.5) / 1000000.0  AS sd_v,
           floor((var_samp(value)) * 1000000.0 + 0.5) / 1000000.0     AS var_v,
           floor((min(value)) * 1000000.0 + 0.5) / 1000000.0          AS min_v,
           floor((max(value)) * 1000000.0 + 0.5) / 1000000.0          AS max_v,
           floor((corr(value, CAST(user_id AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS corr_user,
           floor((covar_samp(value, CAST(user_id AS DOUBLE))) * 1000000.0 + 0.5) / 1000000.0 AS covar_user
    FROM events
    GROUP BY event_type
    """,
    doc="Statistical aggregate family (stddev/variance/corr/covar) — "
        "single-pass mergeable moments, scale-free.",
    tags=("agg", "stats"),
)
def stats_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uid = F.col("user_id").cast("double")
    return e.groupBy("event_type").agg(
        pround(F.avg("value"), 6).alias("mean_v"),
        pround(F.stddev_samp("value"), 6).alias("sd_v"),
        pround(F.var_samp("value"), 6).alias("var_v"),
        pround(F.min("value"), 6).alias("min_v"),
        pround(F.max("value"), 6).alias("max_v"),
        pround(F.corr(F.col("value"), uid), 6).alias("corr_user"),
        pround(F.covar_samp(F.col("value"), uid), 6).alias("covar_user"),
    )


@register(
    "stats_percentiles",
    oracle="""
    SELECT o_orderstatus,
           floor((quantile_cont(o_totalprice, 0.5)) * 10000.0 + 0.5) / 10000.0  AS p50,
           floor((quantile_cont(o_totalprice, 0.9)) * 10000.0 + 0.5) / 10000.0  AS p90,
           floor((quantile_cont(o_totalprice, 0.99)) * 10000.0 + 0.5) / 10000.0 AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Exact percentiles (linear interpolation — Spark `percentile` ≡ "
        "DuckDB `quantile_cont`). Exact percentile is a sort-based agg; "
        "the 100 TB path is percentile_approx (KLL-style rank sketch), "
        "registered as stats_percentiles_approx_bound under an "
        "envelope-contract oracle.",
    tags=("agg", "stats"),
)
def stats_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        pround(F.percentile("o_totalprice", 0.5), 4).alias("p50"),
        pround(F.percentile("o_totalprice", 0.9), 4).alias("p90"),
        pround(F.percentile("o_totalprice", 0.99), 4).alias("p99"),
    )


@register(
    "stats_percentiles_approx_bound",
    oracle="""
    SELECT DISTINCT o_orderstatus, true AS within_tolerance
    FROM orders
    """,
    doc="percentile_approx — the sketch path for percentiles at scale "
        "(bounded memory, mergeable) — under a driver-checkable "
        "accuracy contract.  This query SUBSUMES the retired r1 "
        "`stats_percentiles_approx` (deleted in r14, VERDICT r13 item "
        "3): the raw sketch estimate is engine-specific so a value "
        "oracle can never exist for it, and a permanently `no_oracle` "
        "registry entry violated the rotation invariant.  The contract "
        "(KLL-style rank sketch, accuracy=10000 → rank error ≤ 1e-4): "
        "per group, the approx p50/p90 must land inside the EXACT "
        "[p49,p51] / [p89,p91] envelope — a ±0.01-quantile window, two "
        "orders of magnitude wider than the sketch's guarantee, so the "
        "check is stable at every SF while still catching a broken "
        "sketch.  The oracle is the constant-true table (the estimate "
        "itself is engine-specific; the bound is the contract).",
    tags=("agg", "stats", "approx"),
)
def stats_percentiles_approx_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    g = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("p50_approx"),
        F.percentile_approx("o_totalprice", 0.9, 10000).alias("p90_approx"),
        F.percentile("o_totalprice", 0.49).alias("p50_lo"),
        F.percentile("o_totalprice", 0.51).alias("p50_hi"),
        F.percentile("o_totalprice", 0.89).alias("p90_lo"),
        F.percentile("o_totalprice", 0.91).alias("p90_hi"),
    )
    return g.select(
        "o_orderstatus",
        (
            F.col("p50_approx").between(F.col("p50_lo"), F.col("p50_hi"))
            & F.col("p90_approx").between(F.col("p90_lo"), F.col("p90_hi"))
        ).alias("within_tolerance"),
    )


@register(
    "array_collect_ops",
    oracle="""
    SELECT n_nationkey AS nationkey,
           array_to_string(list_sort(list(DISTINCT c_mktsegment)), ',')   AS segments,
           len(list(DISTINCT c_mktsegment))                               AS n_segments,
           array_to_string(list_sort(list(c_custkey))[1:3], ',')          AS first3_custkeys,
           CAST(len(list(c_custkey)) AS BIGINT)                           AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    doc="Collection aggregation: collect_set/collect_list with "
        "deterministic ordering (array_sort — collection order is "
        "otherwise partition-dependent), slicing, cardinality. Array "
        "outputs are serialized to ','-joined strings in BOTH engines: "
        "the driver's canonicalizer hashes rows via pandas and raw "
        "list cells are unhashable.",
    tags=("agg", "array"),
)
def array_collect_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(F.col("n_nationkey").alias("nationkey"))
        .agg(
            F.array_join(F.array_sort(F.collect_set("c_mktsegment")), ",").alias("segments"),
            F.size(F.collect_set("c_mktsegment")).alias("n_segments"),
            F.array_join(
                F.slice(F.array_sort(F.collect_list("c_custkey")), 1, 3).cast("array<string>"),
                ",",
            ).alias("first3_custkeys"),
            F.count("c_custkey").alias("n_customers"),
        )
    )


@register(
    "grouping_sets_explicit",
    oracle="""
    SELECT coalesce(l_returnflag, 'ALL')  AS returnflag,
           coalesce(l_linestatus, 'ALL')  AS linestatus,
           CAST(grouping(l_returnflag) AS BIGINT) * 2
             + CAST(grouping(l_linestatus) AS BIGINT) AS gid,
           count(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
    doc="Explicit GROUPING SETS with grouping_id disambiguation (the "
        "general form behind rollup/cube).",
    tags=("agg",),
)
def grouping_sets_explicit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.createOrReplaceTempView("_gs_lineitem")
    return spark.sql(
        """
        SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
               coalesce(l_linestatus, 'ALL') AS linestatus,
               CAST(grouping(l_returnflag) AS BIGINT) * 2
                 + CAST(grouping(l_linestatus) AS BIGINT) AS gid,
               count(*) AS n
        FROM _gs_lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "histogram_price_bins",
    oracle="""
    SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bin,
           CAST(floor(o_totalprice / 50000) AS BIGINT) * 50000 AS bin_lo,
           count(*) AS n,
           floor((avg(o_totalprice)) * 10000.0 + 0.5) / 10000.0 AS avg_in_bin
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Equi-width histogram by arithmetic binning — map-side computable, "
        "one shuffle of (bin → partial count).",
    tags=("agg",),
)
def histogram_price_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bin_col = F.floor(F.col("o_totalprice") / 50000).cast("bigint")
    return (
        o.withColumn("bin", bin_col)
        .groupBy("bin")
        .agg(F.count("*").alias("n"), pround(F.avg("o_totalprice"), 4).alias("avg_in_bin"))
        .select("bin", (F.col("bin") * 50000).alias("bin_lo"), "n", "avg_in_bin")
    )


@register(
    "q4_order_priority_exists",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    doc="TPC-H Q4 shape: correlated EXISTS → left-semi join, then count "
        "per priority.",
    tags=("join", "agg"),
)
def q4_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01") & (F.col("o_orderdate") < "1997-04-01")
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = o.join(
        li,
        (o.o_orderkey == li.l_orderkey) & (li.l_shipdate > o.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(F.count("*").alias("order_count"))


@register(
    "q12_shipmode_case_agg",
    oracle="""
    SELECT l_returnflag,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
             AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
    doc="TPC-H Q12 shape: join + conditional (CASE) aggregation.",
    tags=("join", "agg"),
)
def q12_shipmode_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1998-01-01") & (F.col("l_shipdate") < "1999-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q13_customer_order_distribution",
    oracle="""
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    )
    GROUP BY c_count
    """,
    doc="TPC-H Q13 shape: outer join with a join-condition filter (not a "
        "WHERE — null-extension must survive), double aggregation.",
    tags=("join", "agg"),
)
def q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") != "5-LOW")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


@register(
    "q14_promo_revenue_ratio",
    oracle="""
    SELECT floor((100.0 * sum(CASE WHEN p_type = 'PROMO'
                              THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
             / sum(l_extendedprice * (1 - l_discount))) * 10000.0 + 0.5) / 10000.0 AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
    doc="TPC-H Q14 shape: conditional revenue ratio over a broadcast "
        "part join.",
    tags=("join", "agg"),
)
def q14_promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-06-01") & (F.col("l_shipdate") < "1997-07-01")
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0))
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(pround(100.0 * F.sum(promo) / F.sum(rev), 4).alias("promo_revenue_pct"))
    )


@register(
    "q17_small_quantity_avg_subquery",
    oracle="""
    SELECT floor((sum(l.l_extendedprice) / 7.0) * 10000.0 + 0.5) / 10000.0 AS avg_yearly
    FROM lineitem l
    JOIN (SELECT l_partkey, 0.2 * avg(l_quantity) AS qty_threshold
          FROM lineitem GROUP BY l_partkey) t
      ON l.l_partkey = t.l_partkey
    WHERE l.l_quantity < t.qty_threshold
    """,
    doc="TPC-H Q17 shape: correlated avg subquery decorrelated into an "
        "aggregate-then-join — the decorrelation Catalyst applies to the "
        "subquery form, written explicitly.",
    tags=("join", "agg", "subquery"),
)
def q17_small_quantity_avg_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    thresholds = li.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (0.2 * F.avg("l_quantity")).alias("qty_threshold")
    )
    return (
        li.join(thresholds, li.l_partkey == thresholds.t_partkey)
        .filter(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(pround(F.sum("l_extendedprice") / 7.0, 4).alias("avg_yearly"))
    )


@register(
    "q18_large_volume_customers",
    oracle="""
    SELECT c.c_custkey, c.c_name, o.o_orderkey,
           strftime(o.o_orderdate, '%Y-%m-%d') AS orderdate,
           floor((o.o_totalprice) * 100.0 + 0.5) / 100.0 AS totalprice,
           floor((sum(l.l_quantity)) * 100.0 + 0.5) / 100.0 AS total_qty
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE o.o_orderkey IN (
      SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING sum(l_quantity) > 210
    )
    GROUP BY c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice
    ORDER BY totalprice DESC, o_orderkey ASC
    LIMIT 20
    """,
    doc="TPC-H Q18 shape: IN-subquery with HAVING → aggregate + semi "
        "join, bounded top-20.",
    tags=("join", "agg", "topk", "subquery"),
)
def q18_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    big = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("tq")).filter(F.col("tq") > 210)
    return (
        li.join(big.select("l_orderkey"), "l_orderkey", "left_semi")
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(pround(F.sum("l_quantity"), 2).alias("total_qty"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            pround("o_totalprice", 2).alias("totalprice"),
            "total_qty",
        )
        .orderBy(F.desc("totalprice"), F.asc("o_orderkey"))
        .limit(20)
    )


@register(
    "q15_top_supplier_revenue",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey, sum(l_extendedprice * (1 - l_discount)) AS total
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, floor((r.total) * 100.0 + 0.5) / 100.0 AS total_revenue
    FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
    WHERE r.total = (SELECT max(total) FROM rev)
    """,
    doc="TPC-H Q15 shape: revenue view + scalar max subquery → the "
        "supplier(s) achieving the quarter's maximum revenue (ties all "
        "returned, so the result SET is deterministic).",
    tags=("join", "agg", "subquery"),
)
def q15_top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1997-01-01") & (F.col("l_shipdate") < "1997-04-01")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("total")
    )
    max_rev = rev.agg(F.max("total").alias("m"))
    return (
        rev.join(F.broadcast(max_rev), rev.total == F.col("m"))
        .join(s, rev.l_suppkey == s.s_suppkey)
        .select("s_suppkey", "s_name", pround("total", 2).alias("total_revenue"))
    )


@register(
    "q21_late_shipments_by_supplier",
    oracle="""
    SELECT s.s_suppkey, s.s_name, count(*) AS n_late
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
    GROUP BY s.s_suppkey, s.s_name
    ORDER BY n_late DESC, s_suppkey ASC
    LIMIT 10
    """,
    doc="TPC-H Q21 shape (adapted to this schema): suppliers ranked by "
        "shipments later than order date + 90 days — fact-fact join with a "
        "cross-table date predicate, bounded top-10.",
    tags=("join", "agg", "topk"),
)
def q21_late_shipments_by_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 90 days"))
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_suppkey", "s_name")
        .agg(F.count("*").alias("n_late"))
        .orderBy(F.desc("n_late"), F.asc("s_suppkey"))
        .limit(10)
    )


@register(
    "q22_idle_rich_customers",
    oracle="""
    SELECT c_nationkey,
           count(*) AS n_customers,
           floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0 AS total_bal
    FROM customer c
    WHERE CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)
            * (SELECT count(*) FROM customer WHERE c_acctbal > 0)
          > (SELECT sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
             FROM customer WHERE c_acctbal > 0)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderdate >= TIMESTAMP '2000-01-01 00:00:00')
    GROUP BY c_nationkey
    """,
    doc="TPC-H Q22 shape: above-average-balance + NOT EXISTS, through the "
        "spark.sql entry point (the reference's own SQL surface, v1:37) to "
        "exercise Catalyst's subquery handling. The avg comparison is done "
        "in exact integer cents (cents*n > total_cents): a float avg can "
        "land exactly ON a 2-decimal balance, where a 1-ULP cross-engine "
        "difference flips membership (caught by the sf0.1 sweep).",
    tags=("join", "agg", "subquery", "sql-api"),
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_q22_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_q22_orders")
    return spark.sql(
        """
        SELECT c_nationkey,
               count(*) AS n_customers,
               -- 100D: Spark SQL parses bare 100.0 as DECIMAL, and
               -- bigint(floor)/decimal yields a Decimal output type
               floor(sum(c_acctbal) * 100D + 0.5) / 100D AS total_bal
        FROM _q22_customer c
        WHERE CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT)
                * (SELECT count(*) FROM _q22_customer WHERE c_acctbal > 0)
              > (SELECT sum(CAST(floor(c_acctbal * 100.0 + 0.5) AS BIGINT))
                 FROM _q22_customer WHERE c_acctbal > 0)
          AND NOT EXISTS (SELECT 1 FROM _q22_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderdate >= timestamp'2000-01-01 00:00:00')
        GROUP BY c_nationkey
        """
    )


@register(
    "q19_disjunctive_predicates",
    oracle="""
    SELECT floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           count(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
    """,
    doc="TPC-H Q19 shape: disjunctive multi-clause predicate over a "
        "broadcast join — exercises CNF conversion / partial pushdown.",
    tags=("join", "scan"),
)
def q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    j = li.join(p, li.l_partkey == p.p_partkey)
    clause = lambda b, s1, s2, q1, q2: (  # noqa: E731
        (F.col("p_brand") == b)
        & F.col("p_size").between(s1, s2)
        & F.col("l_quantity").between(q1, q2)
    )
    return j.filter(
        clause("Brand#1", 1, 15, 1, 20)
        | clause("Brand#2", 10, 30, 10, 30)
        | clause("Brand#3", 20, 50, 20, 40)
    ).agg(
        pround(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "q7_volume_shipping",
    oracle="""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(year(l.l_shipdate) AS INTEGER) AS l_year,
           floor((CAST(sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT))) AS DOUBLE)
                  / 10000.0) * 100.0 + 0.5) / 100.0 AS revenue
    FROM supplier s
    JOIN lineitem l ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
    JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
    WHERE l.l_shipdate >= TIMESTAMP '1995-01-01'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01'
    GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
    """,
    doc="TPC-H Q7 shape (volume shipping): supplier-nation x customer-"
        "nation x ship-year revenue over a 2-year window, generalized to "
        "ALL nation pairs (the spec's 2-nation constant fold is too "
        "selective on this synthetic corpus). Two broadcast nation dims + "
        "broadcast supplier/customer; one fact-side aggregate shuffle. "
        "Revenue is summed in EXACT integer 1e-4-dollar units (prices "
        "and discounts are 2-decimal) — 1250 output groups make a "
        "float-sum half-ULP rounding flip a near-certainty otherwise.",
    tags=("join", "agg"),
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_orderkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    n1 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    n2 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
        )
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(
            pround(
                F.sum(_cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount"))))
                .cast("double")
                / 10000.0,
                2,
            ).alias("revenue")
        )
    )


@register(
    "q8_market_share",
    oracle="""
    WITH allsales AS (
      SELECT CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
               * (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT)) AS volume,
             n2.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
      JOIN region r   ON n1.n_regionkey = r.r_regionkey
      JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'ECONOMY'
        AND o.o_orderdate >= TIMESTAMP '1995-01-01'
        AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    )
    SELECT o_year,
           floor((CAST(sum(CASE WHEN supp_nation = 'NATION_8' THEN volume ELSE 0 END) AS DOUBLE)
                  / CAST(sum(volume) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
    FROM allsales GROUP BY o_year
    """,
    doc="TPC-H Q8 shape (national market share): NATION_8 suppliers' "
        "share of ECONOMY-part revenue sold into ASIA customers, by order "
        "year. Seven-table join with every dimension broadcast; the only "
        "shuffle is the per-year aggregate; share is a conditional-sum "
        "ratio in one pass (no self-join), with both sums in exact "
        "integer 1e-4-dollar units (see _cents).",
    tags=("join", "agg"),
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_orderdate")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    n1 = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("c_regionkey"))
    n2 = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    sales = (
        li.join(p.filter(F.col("p_type") == "ECONOMY"), li.l_partkey == p.p_partkey)
        .join(
            o.filter(
                (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
            ),
            F.col("l_orderkey") == o.o_orderkey,
        )
        .join(s, F.col("l_suppkey") == s.s_suppkey)
        .join(c, F.col("o_custkey") == c.c_custkey)
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("cn_key"))
        .join(
            F.broadcast(r.filter(F.col("r_name") == "ASIA")),
            F.col("c_regionkey") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("sn_key"))
        .select(F.year("o_orderdate").alias("o_year"), vol.alias("volume"), "supp_nation")
    )
    share = F.sum(
        F.when(F.col("supp_nation") == "NATION_8", F.col("volume")).otherwise(F.lit(0))
    ).cast("double") / F.sum("volume").cast("double")
    return sales.groupBy("o_year").agg(pround(share, 6).alias("mkt_share"))


@register(
    "events_user_activity_percentiles",
    oracle="""
    WITH per_user AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY user_id, event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(min(n_events) AS BIGINT) AS min_events,
           CAST(max(n_events) AS BIGINT) AS max_events,
           floor((quantile_cont(n_events, 0.5)) * 10000.0 + 0.5) / 10000.0  AS p50,
           floor((quantile_cont(n_events, 0.9)) * 10000.0 + 0.5) / 10000.0  AS p90,
           floor((quantile_cont(n_events, 0.99)) * 10000.0 + 0.5) / 10000.0 AS p99
    FROM per_user GROUP BY event_type
    """,
    doc="Per-entity activity distribution: events per (user, type), then "
        "the exact percentile profile of that per-user count per type — "
        "the power-user / bot-detection report. Nested aggregation: the "
        "inner groupBy shuffles on (user_id, event_type) — fully "
        "partial-aggregatable; the outer exact percentile runs over the "
        "per-user counts, whose DISTINCT values are small integers, so "
        "the counts-map percentile stays memory-bounded at any corpus "
        "scale (unlike percentiles over continuous columns).",
    tags=("agg", "stats", "events"),
)
def events_user_activity_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n_events")
    )
    return per_user.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.min("n_events").alias("min_events"),
        F.max("n_events").alias("max_events"),
        pround(F.percentile("n_events", 0.5), 4).alias("p50"),
        pround(F.percentile("n_events", 0.9), 4).alias("p90"),
        pround(F.percentile("n_events", 0.99), 4).alias("p99"),
    )


# deterministic erasure cohort: pure arithmetic on user_id, mirrored
# verbatim in the oracle (same pattern as curation's EVAL_MOD/BATCH_MOD)
ERASE_MOD = 37


@register(
    "events_erasure_impact",
    oracle=f"""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(*) FILTER (WHERE user_id % {ERASE_MOD} = 0) AS BIGINT)
             AS n_events_erased,
           CAST(count(DISTINCT user_id) FILTER (WHERE user_id % {ERASE_MOD} = 0) AS BIGINT)
             AS n_users_erased,
           floor((CAST(count(*) FILTER (WHERE user_id % {ERASE_MOD} = 0) AS DOUBLE)
                  / count(*)) * 1000000.0 + 0.5) / 1000000.0 AS pct_erased
    FROM events GROUP BY event_type
    """,
    doc=f"Data-governance impact scan: given a deletion cohort (here the "
        f"deterministic user_id % {ERASE_MOD} == 0 stand-in for a "
        "right-to-be-forgotten list), report per event type how many "
        "rows and distinct users an erasure pass would remove. One scan, "
        "one partial-aggregatable groupBy; at scale the real deletion "
        "list broadcasts as a semi-join exactly like "
        "benchmark_contamination's eval side.",
    tags=("agg", "events", "governance"),
)
def events_erasure_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    erased = F.col("user_id") % ERASE_MOD == 0
    n_erased = F.sum(erased.cast("long"))
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        n_erased.alias("n_events_erased"),
        F.count_distinct(F.when(erased, F.col("user_id"))).alias("n_users_erased"),
        pround(n_erased.cast("double") / F.count(F.lit(1)), 6).alias("pct_erased"),
    )


# ---------------------------------------------------------------------------
# TPC-H decorrelation tier (round 7): q9 / q11 shapes adapted to the
# lite schema (no partsupp — p_retailprice stands in for supplycost,
# lineitem for the part-supplier stock relation).
# ---------------------------------------------------------------------------

@register(
    "q9_product_type_profit",
    oracle="""
    WITH profit AS (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
             10 * CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                * (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT))
             - CAST(floor(p.p_retailprice * 100.0 + 0.5) AS BIGINT)
                * CAST(floor(l.l_quantity * 100.0 + 0.5) AS BIGINT)
               AS amount_e5
      FROM lineitem l
      JOIN part p     ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE p.p_name LIKE '%ol%'
    )
    SELECT nation, o_year,
           floor(CAST(sum(amount_e5) AS DOUBLE) / 100000.0 * 100.0 + 0.5)
             / 100.0 AS profit
    FROM profit
    GROUP BY nation, o_year
    ORDER BY nation, o_year DESC
    """,
    doc="TPC-H Q9 shape (product-type profit): LIKE-filtered parts "
        "('%ol%' ~ 'bolt'/'old...', the Q9 '%green%' analog), profit "
        "= revenue minus a 10%%-of-retail unit-cost proxy "
        "(p_retailprice stands in for ps_supplycost), grouped by "
        "supplier nation x order year. The amount is computed in "
        "exact integer 1e-5-dollar units — revenue scaled x10 so the "
        "retail*qty cost term (cents x centi-qty = 1e-4 $ = 10%% in "
        "1e-5 $) needs no division — summation is order-independent "
        "and cross-engine exact. Scale: one lineitem->orders shuffle "
        "join (both big), part/supplier/nation broadcast, LIKE filter "
        "prunes at the part dim before the join; one final "
        "partial-aggregatable groupBy. Headroom: amount_e5 is "
        "~1e10-1e11 per row, so an int64 sum (~9.2e18) holds ~1e8 rows "
        "per (nation, o_year) group — ample through SF 10k; beyond "
        "that, accumulate as decimal(38,0) (swap the .cast at the sum). "
        "The bound is ENFORCED at runtime: int64_headroom_guard "
        "(functions/scale.py) rides the same partial aggregate and "
        "fails the query loudly past it instead of wrapping silently.",
    tags=("join", "agg"),
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey",
        "l_extendedprice", "l_discount", "l_quantity",
    )
    p = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").like("%ol%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount_e5 = (
        F.lit(10)
        * _cents(F.col("l_extendedprice"))
        * (100 - _cents(F.col("l_discount")))
        - _cents(F.col("p_retailprice")) * _cents(F.col("l_quantity"))
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("int").alias("o_year"),
            amount_e5.alias("amount_e5"),
        )
        .groupBy("nation", "o_year")
        .agg(
            F.sum("amount_e5").alias("_sum_e5"),
            # max|term| and count ride the SAME partial aggregate as the
            # sum (map-side combinable) and feed the runtime headroom
            # guard — the docstring's SF≈10k bound made loud.
            F.max(F.abs(F.col("amount_e5"))).alias("_max_abs"),
            F.count(F.lit(1)).alias("_n"),
        )
        .select(
            "nation",
            "o_year",
            int64_headroom_guard(
                pround(F.col("_sum_e5").cast("double") / F.lit(100000.0), 2),
                F.col("_max_abs"),
                F.col("_n"),
                "q9_product_type_profit",
            ).alias("profit"),
        )
        .orderBy("nation", F.col("o_year").desc())
    )


@register(
    "q11_important_part_values",
    oracle="""
    WITH vals AS (
      SELECT l.l_partkey,
             sum(CAST(floor(l.l_extendedprice * 100.0 + 0.5) AS BIGINT)
                 * (100 - CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT)))
               AS value_e4
      FROM lineitem l
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n   ON n.n_nationkey = s.s_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey
    )
    SELECT l_partkey AS p_partkey,
           floor(CAST(value_e4 AS DOUBLE) / 10000.0 * 100.0 + 0.5) / 100.0
             AS part_value
    FROM vals
    WHERE value_e4 * (SELECT count(*) FROM vals)
          > 2 * (SELECT sum(value_e4) FROM vals)
    ORDER BY part_value DESC, p_partkey
    """,
    doc="TPC-H Q11 shape (important stock, global-share HAVING): "
        "per-part revenue from NATION_3's suppliers, keeping parts "
        "whose value exceeds 2x the mean part value — the "
        "uncorrelated scalar subquery every engine must decorrelate "
        "into an aggregate + filter. TPC-H's fixed 1/1000-of-total "
        "fraction is scale-DEPENDENT (the spec divides it by SF; a "
        "fixed fraction returns 0 rows at sf0.1), so the threshold "
        "is restated relative to the mean, which is invariant under "
        "data growth. The share test runs in exact integers "
        "(value*n_parts > 2*total) so no fraction ever touches a "
        "float. Scale: supplier/nation broadcast into the lineitem "
        "scan, one per-part aggregate shuffle; the grand total is a "
        "1-row broadcast crossJoin over the (already small) per-part "
        "aggregate, never over lineitem. Headroom: value_e4 sums "
        "~1e9-1e10 per row into int64, and the share filter multiplies "
        "it by n_parts — safe to ~1e6 parts x 1e12 totals; at larger SF "
        "run the filter in decimal(38,0) to keep the exact-integer "
        "contract. The bound is ENFORCED at runtime: two "
        "int64_headroom_guard wrappers inside the share filter cover "
        "the per-part sum and the total/share products, failing loudly "
        "past the bound instead of wrapping silently.",
    tags=("agg", "subquery"),
)
def q11_important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = (
        load_table(spark, sf_dir, "nation")
        .filter(F.col("n_name") == "NATION_3")
        .select("n_nationkey")
    )
    term = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    vals = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("l_partkey")
        .agg(
            F.sum(term).alias("value_e4"),
            # same partial aggregate, feeds the runtime headroom guard
            F.max(term).alias("_max_term"),
            F.count(F.lit(1)).alias("_n_rows"),
        )
        # both the grand total and the share filter consume vals; without
        # a checkpoint the two branches each re-run the lineitem scan +
        # aggregate.  vals is parts-sized (tiny next to the fact table),
        # so materialize it once — lazy, per the dedup-tier idiom.
        .localCheckpoint(eager=False)
    )
    total = vals.agg(
        F.sum("value_e4").alias("total_e4"),
        F.count(F.lit(1)).alias("n_parts"),
        F.max("_max_term").alias("_gmax_term"),
        F.max("_n_rows").alias("_gmax_n"),
        F.max("value_e4").alias("_gmax_val"),
    )
    # the share test runs on EVERY part row, so the guard lives in the
    # filter condition itself (not a projected column a garbage filter
    # could empty out): guard 1 = no per-part sum overflowed
    # (max term x max rows-per-part), guard 2 = the total and the
    # value*n_parts / 2*total share products fit (max part value x
    # 2*n_parts — n_parts is parts-sized, the x2 never overflows).
    share_cond = F.col("value_e4") * F.col("n_parts") > 2 * F.col("total_e4")
    share_cond = int64_headroom_guard(
        share_cond,
        F.col("_gmax_term"),
        F.col("_gmax_n"),
        "q11_important_part_values per-part value_e4 sum",
    )
    share_cond = int64_headroom_guard(
        share_cond,
        F.col("_gmax_val"),
        F.col("n_parts") * 2,
        "q11_important_part_values total / share product",
    )
    return (
        vals.crossJoin(F.broadcast(total))
        .filter(share_cond)
        .select(
            F.col("l_partkey").alias("p_partkey"),
            pround(F.col("value_e4").cast("double") / F.lit(10000.0), 2).alias(
                "part_value"
            ),
        )
        .orderBy(F.col("part_value").desc(), "p_partkey")
    )


@register(
    "stats_correlation_by_group",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           floor(corr(l_quantity, l_extendedprice) * 1000000.0 + 0.5)
             / 1000000.0 AS corr_qty_price,
           floor(covar_samp(l_quantity, l_extendedprice) * 100.0 + 0.5)
             / 100.0 AS covar_qty_price,
           floor(corr(l_extendedprice, l_discount) * 1000000.0 + 0.5)
             / 1000000.0 AS corr_price_disc,
           floor(stddev_samp(l_quantity) * 1000000.0 + 0.5)
             / 1000000.0 AS std_qty,
           floor(stddev_samp(l_extendedprice) * 100.0 + 0.5)
             / 100.0 AS std_price
    FROM lineitem GROUP BY l_returnflag
    HAVING stddev_samp(l_quantity) > 0 AND stddev_samp(l_extendedprice) > 0
    """,
    doc="Per-group correlation matrix over the fact columns "
        "(corr / covar_samp / stddev_samp): the feature-relationship "
        "screen run before building quality models or samplers on a "
        "column (does quantity predict price? is the discount "
        "independent?).  Single-pass co-moment aggregation with "
        "map-side partial combine — one tiny shuffle at |groups|; "
        "covariance/price stddev rounded to cents (their magnitude) "
        "so cross-engine summation-order noise stays below the "
        "contract.  Zero-variance groups are excluded in BOTH engines "
        "(Spark corr of a constant is NaN where DuckDB gives NULL — "
        "the degenerate-group divergence class).",
    tags=("stats", "agg"),
)
def stats_correlation_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    # the zero-variance filter must test the RAW stddev (the oracle's
    # HAVING does): filtering the rounded column would drop a group
    # whose stddev rounds to 0.00 but is genuinely nonzero — a real
    # cross-engine row-set divergence (r12 review fix; the sibling
    # stats_linear_regression already filtered raw)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            pround(F.corr("l_quantity", "l_extendedprice"), 6).alias(
                "corr_qty_price"
            ),
            pround(F.covar_samp("l_quantity", "l_extendedprice"), 2).alias(
                "covar_qty_price"
            ),
            pround(F.corr("l_extendedprice", "l_discount"), 6).alias(
                "corr_price_disc"
            ),
            pround(F.stddev_samp("l_quantity"), 6).alias("std_qty"),
            pround(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
            F.stddev_samp("l_quantity").alias("_sq_raw"),
            F.stddev_samp("l_extendedprice").alias("_sp_raw"),
        )
        .filter((F.col("_sq_raw") > 0) & (F.col("_sp_raw") > 0))
        .drop("_sq_raw", "_sp_raw")
    )


# Pareto class boundaries on cumulative revenue share
_ABC_A = 0.5
_ABC_B = 0.8

_DUCK_REV_E4 = (
    "CAST(floor(l_extendedprice * 100.0 + 0.5) AS BIGINT)"
    " * (100 - CAST(floor(l_discount * 100.0 + 0.5) AS BIGINT))"
)


@register(
    "lineitem_abc_pareto",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey, CAST(sum({_DUCK_REV_E4}) AS BIGINT) AS rev_e4
      FROM lineitem GROUP BY l_partkey
    ), tot AS (
      SELECT sum(rev_e4) AS t FROM rev
    ), c AS (
      SELECT l_partkey, rev_e4,
             sum(rev_e4) OVER (ORDER BY rev_e4 DESC, l_partkey
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
    )
    SELECT c.l_partkey, c.rev_e4,
           floor((c.cum * 1.0 / t.t) * 1000000.0 + 0.5) / 1000000.0
             AS cum_share,
           CASE WHEN floor((c.cum * 1.0 / t.t) * 1000000.0 + 0.5)
                     / 1000000.0 <= {_ABC_A} THEN 'A'
                WHEN floor((c.cum * 1.0 / t.t) * 1000000.0 + 0.5)
                     / 1000000.0 <= {_ABC_B} THEN 'B'
                ELSE 'C' END AS abc_class
    FROM c CROSS JOIN tot t
    """,
    doc=f"ABC / Pareto classification of parts by cumulative revenue "
        f"share (A <= {_ABC_A}, B <= {_ABC_B}, else C) — the working-set "
        f"analysis behind caching and storage tiering.  Revenue "
        f"accumulates in EXACT integer 1e-4-dollar units so the running "
        f"sum is order-independent across engines; the global cumulative "
        f"sum runs through functions.scale.global_running_sum (range-"
        f"repartitioned parallel sort + broadcast per-partition offsets "
        f"— no single-task global window over the data; the one "
        f"unpartitioned window touches num_partitions metadata rows).  "
        f"Class is assigned on the ROUNDED share in both engines.",
    tags=("stats", "window", "scale"),
)
def lineitem_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    rev_e4 = _cents(F.col("l_extendedprice")) * (
        100 - _cents(F.col("l_discount"))
    )
    rev = li.groupBy("l_partkey").agg(F.sum(rev_e4).alias("rev_e4"))
    c = global_running_sum(
        rev,
        order_cols=[F.desc("rev_e4"), F.asc("l_partkey")],
        value_col="rev_e4",
        out_col="cum",
    )
    share = pround(F.col("cum") * F.lit(1.0) / F.col("_grand_total"), 6)
    return c.select(
        "l_partkey",
        "rev_e4",
        share.alias("cum_share"),
        F.when(share <= F.lit(_ABC_A), F.lit("A"))
        .when(share <= F.lit(_ABC_B), F.lit("B"))
        .otherwise(F.lit("C"))
        .alias("abc_class"),
    )


BASKET_MIN_SUPPORT = 2


@register(
    "orders_basket_pairs",
    oracle=f"""
    WITH li AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), pairs AS (
      SELECT a.l_orderkey, a.l_partkey AS part_a, b.l_partkey AS part_b
      FROM li a JOIN li b
        ON b.l_orderkey = a.l_orderkey AND a.l_partkey < b.l_partkey
    ), sup AS (
      SELECT part_a, part_b, CAST(count(*) AS BIGINT) AS support
      FROM pairs GROUP BY part_a, part_b
    ), item AS (
      SELECT l_partkey, CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_ord
      FROM lineitem GROUP BY l_partkey
    ), tot AS (
      SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n FROM lineitem
    )
    SELECT s.part_a, s.part_b, s.support,
           floor((s.support * 1.0 * t.n / (ia.n_ord * ib.n_ord))
                 * 1000000.0 + 0.5) / 1000000.0 AS lift
    FROM sup s
    JOIN item ia ON ia.l_partkey = s.part_a
    JOIN item ib ON ib.l_partkey = s.part_b
    CROSS JOIN tot t
    WHERE s.support >= {BASKET_MIN_SUPPORT}
    """,
    doc=f"Market-basket association pairs: co-occurrence support of part "
        f"pairs within an order (support >= {BASKET_MIN_SUPPORT}) plus "
        f"lift against the independent-purchase baseline.  The fact "
        f"table is deduped to DISTINCT (order, part) FIRST — a part on "
        f"two lines of one order is still ONE basket membership, so "
        f"support counts ORDERS (r12 review fix: the line-level join "
        f"inflated support/lift for multi-line parts, 55 live cases at "
        f"sf0.01, and mismatched the distinct-order marginals in the "
        f"lift denominator).  Scale shape: the pair generation is a "
        f"self-equi-join on the order key, so the blow-up is bounded "
        f"by basket size squared (~7 lines/order -> <=21 pairs), NEVER "
        f"all-pairs over parts; per-item order counts are a "
        f"|parts|-row table joined back (broadcastable), and the "
        f"distinct-order total is one broadcast scalar.",
    tags=("stats", "join"),
)
def orders_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("ok"), F.col("l_partkey").alias("part_a")
    )
    b = li.select(
        F.col("l_orderkey").alias("ok2"), F.col("l_partkey").alias("part_b")
    )
    sup = (
        a.join(b, (F.col("ok") == F.col("ok2")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
    )
    item = (
        li.groupBy("l_partkey")
        .agg(F.countDistinct("l_orderkey").alias("n_ord"))
        # consumed twice (both pair sides) and |parts|-sized —
        # materialize once instead of re-aggregating the fact table
        .localCheckpoint(eager=False)
    )
    tot = li.agg(F.countDistinct("l_orderkey").alias("n"))
    ia = item.select(F.col("l_partkey").alias("ka"), F.col("n_ord").alias("n_a"))
    ib = item.select(F.col("l_partkey").alias("kb"), F.col("n_ord").alias("n_b"))
    return (
        sup.join(F.broadcast(ia), F.col("part_a") == F.col("ka"))
        .join(F.broadcast(ib), F.col("part_b") == F.col("kb"))
        .crossJoin(F.broadcast(tot))
        .select(
            "part_a",
            "part_b",
            "support",
            pround(
                F.col("support") * F.lit(1.0) * F.col("n")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
    )


@register(
    "stats_linear_regression",
    oracle="""
    SELECT l_returnflag,
           CAST(count(*) AS BIGINT) AS n,
           floor(regr_slope(l_extendedprice, l_quantity) * 1000000.0 + 0.5)
             / 1000000.0 AS slope,
           floor(regr_intercept(l_extendedprice, l_quantity) * 100.0 + 0.5)
             / 100.0 AS intercept,
           floor(regr_r2(l_extendedprice, l_quantity) * 1000000.0 + 0.5)
             / 1000000.0 AS r2
    FROM lineitem GROUP BY l_returnflag
    HAVING stddev_samp(l_quantity) > 0 AND stddev_samp(l_extendedprice) > 0
    """,
    doc="Distributed per-group OLS (price ~ quantity): slope, intercept, "
        "and R² via the built-in regr_* aggregates — the trend screen "
        "behind drift detection and feature pruning, computed in the "
        "same single-pass co-moment form as stats_correlation_by_group "
        "(map-side partial combine, one |groups|-row shuffle).  "
        "Intercept is rounded to cents (its magnitude ~5e4); slope and "
        "R² to 1e-6 — both engines accumulate the identical co-moments "
        "so the rounded values agree.  Zero-variance groups (where "
        "Spark regr_*/corr return NaN but DuckDB returns NULL) are "
        "excluded in both engines.",
    tags=("stats", "agg"),
)
def stats_linear_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        pround(F.regr_slope("l_extendedprice", "l_quantity"), 6).alias("slope"),
        pround(F.regr_intercept("l_extendedprice", "l_quantity"), 2).alias(
            "intercept"
        ),
        pround(F.regr_r2("l_extendedprice", "l_quantity"), 6).alias("r2"),
        F.stddev_samp("l_quantity").alias("_sq"),
        F.stddev_samp("l_extendedprice").alias("_sp"),
    ).filter((F.col("_sq") > 0) & (F.col("_sp") > 0)).drop("_sq", "_sp")


@register(
    "supplier_hhi_concentration",
    oracle="""
    WITH rev AS (
      SELECT s.s_nationkey, l.l_suppkey,
             CAST(sum(CAST(floor(l.l_extendedprice * (1 - l.l_discount) * 100 + 0.5)
                           AS BIGINT)) AS BIGINT) AS cents
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
      GROUP BY s.s_nationkey, l.l_suppkey
    ), nat AS (
      SELECT s_nationkey, CAST(sum(cents) AS BIGINT) AS tot,
             CAST(count(*) AS BIGINT) AS n_suppliers
      FROM rev GROUP BY s_nationkey
    )
    SELECT n.n_name AS nation,
           a.n_suppliers,
           floor(sum(pow(CAST(r.cents AS DOUBLE) / a.tot, 2))
                 * 1000000.0 + 0.5) / 1000000.0 AS hhi,
           CASE WHEN sum(pow(CAST(r.cents AS DOUBLE) / a.tot, 2)) > 0.25
                  THEN 'concentrated'
                WHEN sum(pow(CAST(r.cents AS DOUBLE) / a.tot, 2)) > 0.15
                  THEN 'moderate'
                ELSE 'competitive' END AS tier
    FROM rev r
    JOIN nat a ON a.s_nationkey = r.s_nationkey
    JOIN nation n ON n.n_nationkey = r.s_nationkey
    GROUP BY n.n_name, a.n_suppliers
    """,
    doc="Herfindahl-Hirschman supply-concentration index per nation: "
        "each supplier's share of its nation's lineitem revenue, "
        "squared and summed — the standard dependence screen (DOJ "
        "bands: >0.25 concentrated, >0.15 moderate) for 'how exposed "
        "is this market to one supplier failing'.  Scale shape: ONE "
        "fact shuffle to (nation, supplier) revenue in exact integer "
        "cents, nation totals derived from that |suppliers|-row frame "
        "(corpus never rescanned), nation dim broadcast; the squared-"
        "share sum runs over the supplier frame only.  Shares are the "
        "only doubles and they derive from exact integers, so both "
        "engines square the identical values.",
    tags=("stats", "agg", "join"),
)
def supplier_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    cents = F.floor(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + F.lit(0.5)
    ).cast("bigint")
    rev = (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .groupBy("s_nationkey", "l_suppkey")
        .agg(F.sum(cents).cast("bigint").alias("cents"))
        .localCheckpoint(eager=False)
    )
    nat = rev.groupBy("s_nationkey").agg(
        F.sum("cents").cast("bigint").alias("tot"),
        F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
    )
    share2 = F.pow(F.col("cents").cast("double") / F.col("tot"), F.lit(2))
    hhi = F.sum(share2)
    return (
        rev.join(F.broadcast(nat), "s_nationkey")
        .join(F.broadcast(n), rev.s_nationkey == n.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), "n_suppliers")
        .agg(
            pround(hhi, 6).alias("hhi"),
            F.when(hhi > 0.25, F.lit("concentrated"))
            .when(hhi > 0.15, F.lit("moderate"))
            .otherwise(F.lit("competitive"))
            .alias("tier"),
        )
        .select("nation", "n_suppliers", "hhi", "tier")
    )


@register(
    "events_abtest_purchase_rate",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             CAST(((min(CAST(json_extract(props, '$.k') AS BIGINT)) % 2)
                   + 2) % 2 AS INTEGER)                          AS arm,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT)                                     AS purchases
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT arm,
             CAST(count(*) AS BIGINT) AS n_users,
             avg(CAST(purchases AS DOUBLE))      AS mean_p,
             var_samp(CAST(purchases AS DOUBLE)) AS var_p
      FROM assign GROUP BY arm
    )
    SELECT a.n_users AS n_a,
           floor(a.mean_p * 1000000.0 + 0.5) / 1000000.0 AS mean_a,
           b.n_users AS n_b,
           floor(b.mean_p * 1000000.0 + 0.5) / 1000000.0 AS mean_b,
           floor((a.mean_p - b.mean_p)
                 / sqrt(a.var_p / a.n_users + b.var_p / b.n_users)
                 * 1000000.0 + 0.5) / 1000000.0 AS tstat,
           abs((a.mean_p - b.mean_p)
               / sqrt(a.var_p / a.n_users + b.var_p / b.n_users)) > 1.96
             AS significant
    FROM (SELECT * FROM arms WHERE arm = 0) a
    CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
    """,
    doc="Welch two-sample t-test for an A/B experiment on per-user "
        "purchase counts: users assigned to arms by the parity of "
        "their first payload key (deterministic assignment stand-in), "
        "metric = purchases per user, unequal-variance t statistic "
        "and the |t|>1.96 verdict — the experimentation readout for a "
        "rate metric (a two-PROPORTION z-test degenerates when nearly "
        "every user converts, as in this corpus; Welch on the count "
        "is the robust default).  Scale shape: ONE per-user grouped "
        "agg with map-side combine, a 2-row arm rollup "
        "(avg/var_samp co-moments partial-aggregated), statistic "
        "computed on 2 rows.  Inputs are exact integer counts, so "
        "both engines derive identical doubles.",
    tags=("events", "stats", "abtest"),
)
def events_abtest_purchase_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        # pmod, not %: a negative $.k would land in arm -1 under
        # sign-following % and silently vanish from BOTH arms, while
        # the SRM/CUPED/MDE/mSPRT siblings pmod the same hash into
        # arms 0/1 — the t-test must analyze the population its SRM
        # gate validates (r12 review fix; oracle uses ((k%2)+2)%2,
        # DuckDB's % also follows sign)
        F.pmod(F.min(F.get_json_object("props", "$.k").cast("bigint")), F.lit(2))
        .cast("int")
        .alias("arm"),
        F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
        .cast("bigint")
        .alias("purchases"),
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.avg(F.col("purchases").cast("double")).alias("mean_p"),
        F.var_samp(F.col("purchases").cast("double")).alias("var_p"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n_users").alias("n_a"),
        F.col("mean_p").alias("ma"),
        F.col("var_p").alias("va"),
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n_users").alias("n_b"),
        F.col("mean_p").alias("mb"),
        F.col("var_p").alias("vb"),
    )
    t = (F.col("ma") - F.col("mb")) / F.sqrt(
        F.col("va") / F.col("n_a") + F.col("vb") / F.col("n_b")
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        pround("ma", 6).alias("mean_a"),
        "n_b",
        pround("mb", 6).alias("mean_b"),
        pround(t, 6).alias("tstat"),
        (F.abs(t) > F.lit(1.96)).alias("significant"),
    )


@register(
    "orders_open_backlog_daily",
    oracle="""
    WITH completion AS (
      SELECT l_orderkey, max(l_shipdate) AS done
      FROM lineitem GROUP BY l_orderkey
    ), deltas AS (
      SELECT o.o_orderdate AS day, 1 AS delta
      FROM orders o JOIN completion c ON c.l_orderkey = o.o_orderkey
      UNION ALL
      SELECT c.done + INTERVAL 1 DAY, -1
      FROM orders o JOIN completion c ON c.l_orderkey = o.o_orderkey
    ), daily AS (
      SELECT day, CAST(sum(delta) AS BIGINT) AS net_change
      FROM deltas GROUP BY day
    )
    SELECT strftime(day, '%Y-%m-%d') AS day,
           net_change,
           CAST(sum(net_change) OVER (ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS open_orders
    FROM daily
    """,
    doc="Open-order backlog over time via the SWEEP-LINE (event "
        "boundary) pattern: each order contributes +1 on its order "
        "date and -1 the day after its last line ships, and the "
        "running sum of boundary deltas IS the concurrent-open count "
        "— the O(n) shape for every 'how many intervals were active "
        "at time t' question (concurrent sessions, active "
        "connections, WIP inventory), versus the O(n x days) "
        "interval-stabbing join.  Scale shape: completion dates from "
        "ONE orderkey-shuffle over lineitem, co-partitioned join with "
        "orders, boundary deltas collapse to |days| rows in one "
        "small agg, and the running sum uses global_running_sum "
        "(functions/scale) — range-repartitioned parallel sort + "
        "broadcast offsets, no single-task global window even at "
        "billions of boundaries.  Exact integer deltas throughout.",
    tags=("orders", "timeseries", "scale"),
)
def orders_open_backlog_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import global_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    completion = li.groupBy("l_orderkey").agg(F.max("l_shipdate").alias("done"))
    j = o.join(completion, o.o_orderkey == completion.l_orderkey).localCheckpoint(
        eager=False
    )
    deltas = (
        j.select(F.col("o_orderdate").alias("day"), F.lit(1).alias("delta"))
        .unionByName(
            j.select(
                F.date_add(F.col("done"), 1).alias("day"),
                F.lit(-1).alias("delta"),
            )
        )
    )
    daily = deltas.groupBy("day").agg(
        F.sum("delta").cast("bigint").alias("net_change")
    )
    run = global_running_sum(
        daily, order_cols=[F.col("day")], value_col="net_change",
        out_col="open_orders",
    )
    return run.select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "net_change",
        F.col("open_orders").cast("bigint").alias("open_orders"),
    )


# Benford first-digit shares log10(1 + 1/d), pre-rounded to ONE literal
# per digit: computing log10 in-engine would hand the constant to two
# different libms (the ULP trap the MAD op documented for 3.0*1.4826)
_BENFORD = {
    1: 0.30103, 2: 0.176091, 3: 0.124939, 4: 0.09691, 5: 0.079181,
    6: 0.066947, 7: 0.057992, 8: 0.051153, 9: 0.045757,
}


@register(
    "orders_benford_screen",
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS INTEGER) AS digit
      FROM orders WHERE o_totalprice >= 1
    ), raw AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS n FROM digits GROUP BY digit
    ), dom AS (
      SELECT CAST(unnest(generate_series(1, 9)) AS INTEGER) AS digit
    ), obs AS (
      SELECT d.digit, CAST(coalesce(r.n, 0) AS BIGINT) AS n
      FROM dom d LEFT JOIN raw r ON r.digit = d.digit
    ), tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM obs)
    SELECT o.digit, o.n,
           floor(CAST(o.n AS DOUBLE) / t.t * 1000000.0 + 0.5) / 1000000.0
             AS observed_share,
           CASE o.digit {' '.join(f'WHEN {d} THEN CAST({s} AS DOUBLE)' for d, s in _BENFORD.items())} END
             AS benford_share,
           floor(pow(o.n - t.t * (CASE o.digit
                 {' '.join(f'WHEN {d} THEN CAST({s} AS DOUBLE)' for d, s in _BENFORD.items())} END), 2)
                 / (t.t * (CASE o.digit
                 {' '.join(f'WHEN {d} THEN CAST({s} AS DOUBLE)' for d, s in _BENFORD.items())} END))
                 * 1000000.0 + 0.5) / 1000000.0 AS chi2_term
    FROM obs o CROSS JOIN tot t
    """,
    doc="Benford's-law first-digit screen over order totals: observed "
        "first-significant-digit shares vs log10(1+1/d), with the "
        "per-digit chi-square contribution — the classic forensic / "
        "data-generation sanity check (fabricated or unit-mangled "
        "amounts flunk the 30%-starts-with-1 law; a synthetic uniform "
        "price generator flunks it too, which is itself a useful "
        "fixture diagnostic).  The Benford constants are pre-rounded "
        "single literals in BOTH engines — computing log10 in-engine "
        "would diverge by ULP across libms.  The observed counts are "
        "LEFT-JOINED onto the constant 1..9 domain so never-occurring "
        "digits emit n=0 rows with their full t*p_d chi-square term "
        "(r12 review fix).  Scale shape: digit extraction is map-only "
        "string math on exact integers, one 9-row aggregate, total "
        "broadcast.",
    tags=("stats", "dq", "agg"),
)
def orders_benford_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digit = F.substring(
        F.floor("o_totalprice").cast("bigint").cast("string"), 1, 1
    ).cast("int")
    raw = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    # left-join the full 1..9 domain: a digit that never occurs must
    # emit n=0 with its chi2 term t*p_d — the LARGEST possible term —
    # not vanish from the screen (r12 review fix: observed-digits-only
    # grouping understated the statistic exactly when the Benford
    # violation was most extreme)
    dom = spark.range(1, 10).select(F.col("id").cast("int").alias("digit"))
    obs = dom.join(raw, "digit", "left").select(
        "digit", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n")
    )
    tot = obs.agg(F.sum("n").cast("bigint").alias("t"))
    bshare = F.create_map(
        *[F.lit(x) for kv in _BENFORD.items() for x in kv]
    )[F.col("digit")]
    exp = F.col("t") * bshare
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        "n",
        pround(F.col("n").cast("double") / F.col("t"), 6).alias("observed_share"),
        bshare.alias("benford_share"),
        pround(F.pow(F.col("n") - exp, F.lit(2)) / exp, 6).alias("chi2_term"),
    )


# ---------------------------------------------------------------------------
# Fulfillment latency distribution (round 9): days from order to line
# shipment, as exact percentiles per order priority — the SLA report
# (does URGENT actually ship faster, and what does the tail look
# like?).  Latency is an integer day count from wall dates; exact
# percentile interpolation on identical integer multisets is
# bit-identical across engines (the stats_percentiles contract).
# ---------------------------------------------------------------------------


@register(
    "orders_ship_latency_percentiles",
    oracle="""
    WITH lat AS (
      SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS days
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lineitems,
           floor(quantile_cont(days, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50_days,
           floor(quantile_cont(days, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_days,
           floor(quantile_cont(days, 0.99) * 10000.0 + 0.5) / 10000.0 AS p99_days,
           CAST(max(days) AS BIGINT) AS max_days
    FROM lat GROUP BY o_orderpriority
    """,
    doc="Order-to-ship latency percentiles per order priority: exact "
        "p50/p90/p99 and worst case of the integer day count between "
        "order placement and line shipment — the fulfillment-SLA "
        "report.  Scale shape: ONE orderkey-keyed fact-fact shuffle "
        "join (both sides big — the q9/q18 join class), then an exact "
        "sort-based percentile agg on |priorities| groups; at 100 TB "
        "swap for approx_percentile with a recorded bound "
        "(stats_percentiles_approx_bound pattern) and the join shape "
        "is unchanged.  Day counts come from wall dates, stable "
        "across consumer session timezones.",
    tags=("analytics", "agg", "stats"),
)
def orders_ship_latency_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    lat = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate")).alias("days"),
    )
    return lat.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lineitems"),
        pround(F.percentile("days", 0.5), 4).alias("p50_days"),
        pround(F.percentile("days", 0.9), 4).alias("p90_days"),
        pround(F.percentile("days", 0.99), 4).alias("p99_days"),
        F.max("days").cast("bigint").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# Inter-purchase intervals (round 9): days between a customer's
# consecutive orders, distributed per market segment — the repeat-
# purchase cadence behind replenishment forecasting and churn cutoffs
# (a customer 2× past their segment's p90 gap is "overdue").
# ---------------------------------------------------------------------------


@register(
    "orders_interpurchase_intervals",
    oracle="""
    WITH seq AS (
      SELECT o_custkey,
             date_diff('day',
                       lag(CAST(o_orderdate AS DATE)) OVER (
                         PARTITION BY o_custkey
                         ORDER BY o_orderdate ASC, o_orderkey ASC),
                       CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    ), gaps AS (
      SELECT c.c_mktsegment, s.gap_days
      FROM seq s JOIN customer c ON c.c_custkey = s.o_custkey
      WHERE s.gap_days IS NOT NULL
    )
    SELECT c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_gaps,
           floor(avg(gap_days) * 10000.0 + 0.5) / 10000.0 AS avg_days,
           floor(quantile_cont(gap_days, 0.5) * 10000.0 + 0.5) / 10000.0 AS p50_days,
           floor(quantile_cont(gap_days, 0.9) * 10000.0 + 0.5) / 10000.0 AS p90_days,
           CAST(max(gap_days) AS BIGINT) AS max_days
    FROM gaps GROUP BY c_mktsegment
    """,
    doc="Inter-purchase cadence per market segment: integer day gaps "
        "between each customer's consecutive orders (lag over the "
        "custkey-keyed order sequence), rolled up to count / mean / "
        "exact p50 / p90 / max per segment — the replenishment-cycle "
        "report that also sets churn cutoffs ('overdue' = 2× the "
        "segment p90).  Scale shape: ONE custkey shuffle carries the "
        "sequence window, the segment lookup is a key-key join against "
        "the customer dim (AQE picks broadcast where the dim fits), "
        "final exact percentile agg on |segments| groups.  Integer day "
        "gaps from wall dates — percentile parity is the "
        "stats_percentiles bit-exact contract.",
    tags=("analytics", "window", "stats"),
)
def orders_interpurchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderkey", "o_orderdate"
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc("o_orderdate"), F.asc("o_orderkey")
    )
    seq = o.select(
        "o_custkey",
        F.datediff(
            F.to_date("o_orderdate"), F.lag(F.to_date("o_orderdate")).over(w)
        ).alias("gap_days"),
    ).where(F.col("gap_days").isNotNull())
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    gaps = seq.join(c, seq.o_custkey == c.c_custkey).select(
        "c_mktsegment", "gap_days"
    )
    return gaps.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        pround(F.avg("gap_days"), 4).alias("avg_days"),
        pround(F.percentile("gap_days", 0.5), 4).alias("p50_days"),
        pround(F.percentile("gap_days", 0.9), 4).alias("p90_days"),
        F.max("gap_days").cast("bigint").alias("max_days"),
    )


# ---------------------------------------------------------------------------
# Discount elasticity (round 9): does a deeper discount actually move
# more units, and does the answer differ by brand?  Per-brand OLS of
# quantity on discount — the pricing-team readout that decides whether
# the discount ladder is doing anything.
# ---------------------------------------------------------------------------


@register(
    "lineitem_discount_elasticity",
    oracle="""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT) AS n_lines,
           floor(avg(l.l_quantity) * 10000.0 + 0.5) / 10000.0 AS avg_qty,
           floor(regr_slope(l.l_quantity, l.l_discount) * 10000.0 + 0.5)
           / 10000.0 AS qty_per_discount,
           floor(regr_r2(l.l_quantity, l.l_discount) * 1000000.0 + 0.5)
           / 1000000.0 AS r2
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    GROUP BY p.p_brand
    HAVING regr_slope(l.l_quantity, l.l_discount) IS NOT NULL
    """,
    doc="Discount elasticity per brand: OLS slope of quantity on "
        "discount (units moved per unit of discount depth) with fit R² "
        "and the brand's volume baseline — the pricing readout that "
        "tests whether the discount ladder shifts demand at all (on "
        "uniform synthetic data R²≈0: the honest null).  Scale shape: "
        "the partkey equi-join is the q9 fact-dim class (AQE "
        "broadcasts the projected 2-column part side when it fits, "
        "shuffle-join otherwise), then single-pass regr_* co-moment "
        "folds with map-side combine into |brands| (=25) rows.",
    tags=("analytics", "stats", "join"),
)
def lineitem_discount_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_discount"
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    j = li.join(p, li.l_partkey == p.p_partkey)
    return (
        j.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
            pround(F.avg("l_quantity"), 4).alias("avg_qty"),
            pround(F.regr_slope("l_quantity", "l_discount"), 4).alias(
                "qty_per_discount"
            ),
            pround(F.regr_r2("l_quantity", "l_discount"), 6).alias("r2"),
            F.regr_slope("l_quantity", "l_discount").alias("_slope_raw"),
        )
        .where(F.col("_slope_raw").isNotNull())
        .drop("_slope_raw")
    )


# ---------------------------------------------------------------------------
# Percent-of-parent hierarchical rollup (round 9): nation revenue as a
# share of its region — the drill-down ratio every OLAP tool renders
# next to a hierarchy node.  Distinct from agg_rollup (which emits
# parent SUBTOTAL rows): here each leaf carries its parent's total as
# a denominator, which is the share-of-parent window pattern.
# ---------------------------------------------------------------------------


@register(
    "nation_revenue_share_of_region",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation, r.r_name AS region,
             sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n.n_regionkey
      GROUP BY nation, region
    )
    SELECT region, nation,
           floor(cents / 100.0 * 100.0 + 0.5) / 100.0 AS revenue,
           floor(CAST(cents AS DOUBLE)
                 / sum(cents) OVER (PARTITION BY region)
                 * 1000000.0 + 0.5) / 1000000.0 AS share_of_region
    FROM rev
    """,
    doc="Share-of-parent hierarchical rollup: each nation's order "
        "revenue as a fraction of its region's total — the drill-down "
        "ratio rendered beside every hierarchy node (and the "
        "complement of agg_rollup's subtotal rows).  Scale shape: the "
        "custkey fact-dim join carries the one corpus shuffle (AQE "
        "broadcasts the customer side where it fits; nation/region "
        "are explicit broadcasts), revenue accumulates in exact "
        "integer cents (the _cents contract), and the share window "
        "partitions over the 25-nation frame — bounded, never "
        "corpus-sized.",
    tags=("analytics", "join", "window"),
)
def nation_revenue_share_of_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey", F.col("n_name").alias("nation")
    )
    r = load_table(spark, sf_dir, "region").select(
        "r_regionkey", F.col("r_name").alias("region")
    )
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("nation", "region")
        .agg(F.sum(_cents(F.col("o_totalprice"))).alias("cents"))
    )
    w = Window.partitionBy("region")
    return rev.select(
        "region",
        "nation",
        pround(F.col("cents") / F.lit(100.0), 2).alias("revenue"),
        pround(F.col("cents").cast("double") / F.sum("cents").over(w), 6).alias(
            "share_of_region"
        ),
    )


# ---------------------------------------------------------------------------
# Mann-Whitney U rank-sum test (nonparametric two-sample comparison)
# ---------------------------------------------------------------------------

_MW_A = "purchase"
_MW_B = "view"


@register(
    "events_mann_whitney_value",
    oracle=f"""
    WITH ev AS (
      SELECT isodow(ts) AS dow, event_type, value FROM events
      WHERE event_type IN ('{_MW_A}', '{_MW_B}') AND value IS NOT NULL
    ), vc AS (
      SELECT dow, value,
             CAST(count(*) FILTER (WHERE event_type = '{_MW_A}') AS BIGINT) AS ca,
             CAST(count(*) FILTER (WHERE event_type = '{_MW_B}') AS BIGINT) AS cb
      FROM ev GROUP BY dow, value
    ), ranked AS (
      SELECT dow, ca, cb, ca + cb AS c,
             CAST(sum(ca + cb) OVER (PARTITION BY dow ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM vc
    ), agg AS (
      SELECT dow,
             CAST(sum(ca) AS BIGINT) AS na,
             CAST(sum(cb) AS BIGINT) AS nb,
             CAST(sum(ca * (2 * (cum - c + 1) + c - 1)) AS BIGINT) AS r2a,
             CAST(sum(c * c * c - c) AS BIGINT) AS tie3
      FROM ranked GROUP BY dow
    )
    SELECT CAST(dow AS INTEGER) AS dow,
           na AS n_purchase, nb AS n_view,
           (r2a - na * (na + 1)) / 2.0 AS u_stat,
           floor(((r2a - na * (na + 1)) - na * nb)
                 / (2.0 * sqrt((na * nb / 12.0)
                     * ((na + nb + 1)
                        - tie3 * 1.0 / ((na + nb) * (na + nb - 1.0)))))
                 * 1000000.0 + 0.5) / 1000000.0 AS z_score,
           floor(((r2a - na * (na + 1)) * 1.0 / (na * nb) - 1.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS rank_biserial
    FROM agg
    """,
    doc="Mann-Whitney U rank-sum test per ISO day-of-week: does the "
        "purchase `value` distribution differ from the view `value` "
        "distribution?  The NONPARAMETRIC complement to "
        "events_abtest_purchase_rate's proportion z-test and the "
        "chi2/KS drift screens: rank-based, so heavy-tailed revenue "
        "values need no normality assumption.  Tie-corrected normal "
        "approximation (Conover, Practical Nonparametric Statistics): "
        "average ranks via cumulative counts over per-(dow, value) "
        "groups, z = (U - n_a*n_b/2) / sqrt(Var_ties), plus the "
        "rank-biserial effect size 2U/(n_a*n_b) - 1.  EXACT ARITHMETIC "
        "SHAPE: rank sums are accumulated as 2x-scaled INTEGERS (2R = "
        "sum c_a*(2*rank_min + c - 1)) so both engines agree "
        "bit-for-bit until the final scalar float expression, which is "
        "an identical tree on exact int64 inputs (deterministic IEEE). "
        "Scale shape: one partial-agg shuffle to per-(dow, value) "
        "counts — cardinality bounded by |dow| x |value domain| (2-dp "
        "prices), NOT by event count; the cumulative-rank window runs "
        "over those bounded distinct-value rows (7 partitions); final "
        "agg emits 7 rows.  At a wider value domain the prefix-sum "
        "becomes the range-partitioned two-pass rank "
        "(functions/scale.global_row_number) per group.  int64 "
        "headroom: r2a <= 2n^2 overflows past ~2e9 rows PER DOW-GROUP "
        "(~1e10 events) — switch the three sums to decimal(38,0) at "
        "that scale (the warehouse.py:203 checksum pattern).",
    tags=("events", "stats"),
)
def events_mann_whitney_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # value IS NOT NULL is explicit, not data luck: the rank cumulative
    # orders by value, and the engines place NULL keys at opposite ends
    # (Spark NULLS FIRST, DuckDB NULLS LAST) — the KS-screen review
    # finding, applied to every value-ordered ECDF in the module
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_MW_A, _MW_B) & F.col("value").isNotNull()
    )
    vc = (
        e.groupBy(
            (F.weekday("ts") + 1).cast("int").alias("dow"),
            F.col("value"),
        )
        .agg(
            F.count_if(F.col("event_type") == _MW_A).cast("bigint").alias("ca"),
            F.count_if(F.col("event_type") == _MW_B).cast("bigint").alias("cb"),
        )
        .withColumn("c", F.col("ca") + F.col("cb"))
    )
    w = (
        Window.partitionBy("dow")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = vc.withColumn("cum", F.sum("c").over(w))
    agg = ranked.groupBy("dow").agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
        F.sum(
            F.col("ca")
            * (2 * (F.col("cum") - F.col("c") + 1) + F.col("c") - 1)
        )
        .cast("bigint")
        .alias("r2a"),
        F.sum(F.col("c") * F.col("c") * F.col("c") - F.col("c"))
        .cast("bigint")
        .alias("tie3"),
    )
    u2 = F.col("r2a") - F.col("na") * (F.col("na") + 1)  # = 2*U_A, exact
    n_ab = F.col("na") * F.col("nb")
    n_tot = F.col("na") + F.col("nb")
    sigma = F.sqrt(
        (n_ab / F.lit(12.0))
        * (
            (n_tot + 1)
            - F.col("tie3") * F.lit(1.0) / (n_tot * (n_tot - F.lit(1.0)))
        )
    )
    return agg.select(
        "dow",
        F.col("na").alias("n_purchase"),
        F.col("nb").alias("n_view"),
        (u2 / F.lit(2.0)).alias("u_stat"),
        pround((u2 - n_ab) / (F.lit(2.0) * sigma), 6).alias("z_score"),
        pround(u2 * F.lit(1.0) / n_ab - F.lit(1.0), 6).alias("rank_biserial"),
    )


# ---------------------------------------------------------------------------
# Spearman rank correlation (tie-corrected, via distinct-value cells)
# ---------------------------------------------------------------------------


@register(
    "events_spearman_hour_value",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(hour(ts) AS BIGINT) AS x, value AS y,
             CAST(count(*) AS BIGINT) AS c
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2, 3
    ), xm AS (
      SELECT event_type, x, CAST(sum(c) AS BIGINT) AS cx,
             CAST(sum(sum(c)) OVER (PARTITION BY event_type ORDER BY x
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumx
      FROM cells GROUP BY event_type, x
    ), ym AS (
      SELECT event_type, y, CAST(sum(c) AS BIGINT) AS cy,
             CAST(sum(sum(c)) OVER (PARTITION BY event_type ORDER BY y
                  ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumy
      FROM cells GROUP BY event_type, y
    ), rc AS (
      SELECT cells.event_type, c,
             2 * (cumx - cx) + cx + 1 AS rx2,
             2 * (cumy - cy) + cy + 1 AS ry2
      FROM cells
      JOIN xm USING (event_type, x)
      JOIN ym USING (event_type, y)
    ), agg AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_cells,
             CAST(sum(c * rx2) AS BIGINT) AS sx,
             CAST(sum(c * ry2) AS BIGINT) AS sy,
             CAST(sum(c * rx2 * rx2) AS BIGINT) AS sxx,
             CAST(sum(c * ry2 * ry2) AS BIGINT) AS syy,
             CAST(sum(c * rx2 * ry2) AS BIGINT) AS sxy
      FROM rc GROUP BY event_type
    )
    SELECT event_type, n, n_cells,
           floor(((n * 1.0 * sxy - sx * 1.0 * sy)
                  / sqrt((n * 1.0 * sxx - sx * 1.0 * sx)
                         * (n * 1.0 * syy - sy * 1.0 * sy)))
                 * 1000000.0 + 0.5) / 1000000.0 AS spearman_rho
    FROM agg
    WHERE (n * 1.0 * sxx - sx * 1.0 * sx) > 0
      AND (n * 1.0 * syy - sy * 1.0 * sy) > 0
    """,
    doc="Tie-corrected Spearman rank correlation per event type between "
        "hour-of-day and event value — the monotonic-association "
        "complement to stats_correlation_by_group's Pearson r (linear) "
        "and events_mann_whitney_value's two-sample U: same rank "
        "machinery, asking 'does value drift with time of day in ANY "
        "monotone way'.  With massive ties (24 hours x 2-dp prices) "
        "the 6*sum(d^2) shortcut is WRONG; the correct form is Pearson "
        "over AVERAGE ranks, which this computes exactly: per-(type, "
        "hour, value) cell counts, average ranks from the two marginal "
        "cumulative counts (2x-scaled to stay integer: 2r = 2*(cum-c) "
        "+ c + 1 — the x2 cancels in the correlation ratio), then "
        "integer co-moment sums and ONE identical scalar double "
        "expression per group (deterministic IEEE on exact int64 "
        "inputs; a float rank sum would be summation-order-dependent "
        "across engines).  Scale shape: one partial-agg shuffle to "
        "cells (bounded by |hours| x |value domain| per type, NOT row "
        "count); the two marginal windows run over 24 rows and "
        "|values| rows per type; the cell join keys are (type, hour) "
        "and (type, value) — no row-level shuffle after the first agg; "
        "final output |event types| rows.  Zero-variance groups are "
        "filtered with the same integer predicate in both engines "
        "(NULL rho would break downstream sorts).  int64 headroom: "
        "sum(c*rx2*ry2) <= 4n^3 per group overflows past ~1.3e6 rows "
        "PER TYPE-GROUP — switch the co-moment sums to decimal(38,0) "
        "(warehouse.py:203 pattern) at that scale.",
    tags=("events", "stats"),
)
def events_spearman_hour_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit NULL-value exclusion: the y-marginal cumulative orders by
    # value, where the engines place NULL keys at opposite ends — see
    # events_mann_whitney_value
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    # cells feed three consumers (two marginals + the rank join); a lazy
    # localCheckpoint materializes the events scan + first agg ONCE —
    # without it the plan re-scans events three times (q11 pattern)
    cells = (
        e.groupBy(
            "event_type",
            F.hour("ts").cast("bigint").alias("x"),
            F.col("value").alias("y"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )

    def marginal(key: str, cnt: str, cum: str) -> DataFrame:
        w = (
            Window.partitionBy("event_type")
            .orderBy(key)
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        return (
            cells.groupBy("event_type", key)
            .agg(F.sum("c").cast("bigint").alias(cnt))
            .withColumn(cum, F.sum(cnt).over(w).cast("bigint"))
        )

    rc = (
        cells.join(marginal("x", "cx", "cumx"), ["event_type", "x"])
        .join(marginal("y", "cy", "cumy"), ["event_type", "y"])
        .select(
            "event_type",
            "c",
            (2 * (F.col("cumx") - F.col("cx")) + F.col("cx") + 1).alias("rx2"),
            (2 * (F.col("cumy") - F.col("cy")) + F.col("cy") + 1).alias("ry2"),
        )
    )
    agg = rc.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
        F.sum(F.col("c") * F.col("rx2")).cast("bigint").alias("sx"),
        F.sum(F.col("c") * F.col("ry2")).cast("bigint").alias("sy"),
        F.sum(F.col("c") * F.col("rx2") * F.col("rx2")).cast("bigint").alias("sxx"),
        F.sum(F.col("c") * F.col("ry2") * F.col("ry2")).cast("bigint").alias("syy"),
        F.sum(F.col("c") * F.col("rx2") * F.col("ry2")).cast("bigint").alias("sxy"),
    )
    one = F.lit(1.0)
    varx = F.col("n") * one * F.col("sxx") - F.col("sx") * one * F.col("sx")
    vary = F.col("n") * one * F.col("syy") - F.col("sy") * one * F.col("sy")
    cov = F.col("n") * one * F.col("sxy") - F.col("sx") * one * F.col("sy")
    return (
        agg.filter((varx > 0) & (vary > 0))
        .select(
            "event_type",
            "n",
            "n_cells",
            pround(cov / F.sqrt(varx * vary), 6).alias("spearman_rho"),
        )
    )


# ---------------------------------------------------------------------------
# Skyline (Pareto-dominance) query over parts
# ---------------------------------------------------------------------------


@register(
    "part_skyline_price_size",
    oracle="""
    WITH pp AS (
      SELECT p_retailprice AS price, CAST(max(p_size) AS BIGINT) AS pmax
      FROM part GROUP BY 1
    ), run AS (
      SELECT price, pmax,
             max(pmax) OVER (ORDER BY price
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS prevmax
      FROM pp
    )
    SELECT p.p_partkey, p.p_retailprice, CAST(p.p_size AS BIGINT) AS p_size
    FROM part p JOIN run r ON p.p_retailprice = r.price
    WHERE CAST(p.p_size AS BIGINT) = r.pmax
      AND (r.prevmax IS NULL OR r.prevmax < p.p_size)
    """,
    doc="Skyline query (Borzsonyi/Kossmann/Stocker, ICDE'01): parts not "
        "Pareto-DOMINATED on (minimize retail price, maximize size) — "
        "no other part is at-most-as-expensive AND at-least-as-large "
        "with one strict.  The multi-objective shortlist operator "
        "(cheapest-per-capability frontiers, best-quality-per-cost "
        "corpus slices) that a plain ORDER BY ... LIMIT cannot "
        "express.  Algorithm: the classic sort-scan — a part is on the "
        "skyline iff its size strictly exceeds the running max size "
        "over all strictly cheaper parts AND equals the max size at "
        "its own price point (equal-(price,size) twins are mutual "
        "non-dominators and all survive).  Scale shape: one agg to the "
        "per-price table, then the EXCLUSIVE prefix max runs through "
        "functions/scale.global_running_max — range-repartitioned "
        "parallel sort + within-partition prefix max + broadcast "
        "per-partition offsets, NO unpartitioned data window (the "
        "events_session_paths lesson); the filter join back to part "
        "is a price-keyed equi-join.  Output is provably <= |size "
        "domain| rows (each skyline row needs a strictly larger size "
        "than every cheaper one).  Dominance tests are integer/exact-"
        "double comparisons on stored values — no arithmetic, no "
        "rounding, bit-identical across engines.",
    tags=("relational", "part"),
)
def part_skyline_price_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import global_running_max

    p = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size")
    )
    pp = p.groupBy(F.col("p_retailprice").alias("price")).agg(
        F.max("p_size").alias("pmax")
    )
    run = global_running_max(
        pp, [F.col("price")], "pmax", "prevmax", exclusive=True
    )
    return (
        p.join(run, p.p_retailprice == run.price)
        .filter(
            (F.col("p_size") == F.col("pmax"))
            & (F.col("prevmax").isNull() | (F.col("prevmax") < F.col("p_size")))
        )
        .select("p_partkey", "p_retailprice", "p_size")
    )


# ---------------------------------------------------------------------------
# Calendar seasonality of order revenue (classical seasonal indices)
# ---------------------------------------------------------------------------


@register(
    "orders_monthly_seasonality",
    oracle="""
    WITH m AS (
      SELECT year(o_orderdate) AS y, month(o_orderdate) AS mo,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders GROUP BY 1, 2
    ), tot AS (
      SELECT CAST(sum(cents) AS BIGINT) AS all_cents,
             CAST(count(*) AS BIGINT) AS n_all
      FROM m
    )
    SELECT CAST(mo AS INTEGER) AS month,
           CAST(count(*) AS BIGINT) AS n_months,
           CAST(sum(cents) AS BIGINT) AS rev_cents,
           floor((sum(cents) * 1.0 * n_all) / (count(*) * 1.0 * all_cents)
                 * 1000000.0 + 0.5) / 1000000.0 AS seasonal_index
    FROM m CROSS JOIN tot
    GROUP BY mo, n_all, all_cents
    """,
    doc="Classical multiplicative seasonal indices of order revenue by "
        "calendar month: each month-of-year's average monthly revenue "
        "over its average across ALL months (index 1.0 = no "
        "seasonality) — the month-granularity revenue complement to "
        "the events tier's hour/dow profiles (events_dow_hour_profile) "
        "and the normalization a demand forecast or capacity plan "
        "divides out first.  Months observed a different number of "
        "years are handled by comparing AVERAGES, not totals (the "
        "n_months column makes partial coverage visible).  Exact "
        "arithmetic: revenue accumulates as integer cents; the index "
        "is one identical scalar double tree on four exact ints "
        "(cross-multiplied so no intermediate average is "
        "materialized).  Scale shape: one partial-agg shuffle to "
        "(year, month) cells — bounded by the calendar, not order "
        "count; the total is a 1-row broadcast; output <= 12 rows.  "
        "int64 headroom: total cents ~2e10 at sf0.1, safe to ~1e8x "
        "growth.",
    tags=("orders", "stats", "timeseries"),
)
def orders_monthly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.select(
            F.year("o_orderdate").alias("y"),
            F.month("o_orderdate").alias("mo"),
            _cents(F.col("o_totalprice")).alias("order_cents"),
        )
        .groupBy("y", "mo")
        .agg(F.sum("order_cents").cast("bigint").alias("cents"))
        .localCheckpoint(eager=False)
    )
    tot = m.agg(
        F.sum("cents").cast("bigint").alias("all_cents"),
        F.count(F.lit(1)).cast("bigint").alias("n_all"),
    )
    one = F.lit(1.0)
    return (
        m.crossJoin(F.broadcast(tot))
        .groupBy(F.col("mo").cast("int").alias("month"), "n_all", "all_cents")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_months"),
            F.sum("cents").cast("bigint").alias("rev_cents"),
        )
        .select(
            "month",
            "n_months",
            "rev_cents",
            pround(
                (F.col("rev_cents") * one * F.col("n_all"))
                / (F.col("n_months") * one * F.col("all_cents")),
                6,
            ).alias("seasonal_index"),
        )
    )


# ---------------------------------------------------------------------------
# Statistical process control: p-chart on monthly return rates
# ---------------------------------------------------------------------------


@register(
    "lineitem_returns_pchart",
    oracle="""
    WITH m AS (
      SELECT year(l_shipdate) * 100 + month(l_shipdate) AS ym,
             CAST(count(*) AS BIGINT) AS n,
             CAST(count(*) FILTER (WHERE l_returnflag = 'R') AS BIGINT) AS r
      FROM lineitem GROUP BY 1
    ), tot AS (
      SELECT CAST(sum(n) AS BIGINT) AS nt, CAST(sum(r) AS BIGINT) AS rt
      FROM m
    )
    SELECT CAST(ym AS INTEGER) AS ym, n, r,
           floor(r * 1.0 / n * 1000000.0 + 0.5) / 1000000.0 AS p_rate,
           floor((rt * 1.0 / nt
                  + 3.0 * sqrt((rt * 1.0 / nt) * (1.0 - rt * 1.0 / nt) / n))
                 * 1000000.0 + 0.5) / 1000000.0 AS ucl,
           floor(greatest(0.0, rt * 1.0 / nt
                  - 3.0 * sqrt((rt * 1.0 / nt) * (1.0 - rt * 1.0 / nt) / n))
                 * 1000000.0 + 0.5) / 1000000.0 AS lcl,
           CAST(CASE WHEN r * 1.0 / n
                       > rt * 1.0 / nt
                         + 3.0 * sqrt((rt * 1.0 / nt) * (1.0 - rt * 1.0 / nt) / n)
                     OR r * 1.0 / n
                       < greatest(0.0, rt * 1.0 / nt
                         - 3.0 * sqrt((rt * 1.0 / nt) * (1.0 - rt * 1.0 / nt) / n))
                THEN 1 ELSE 0 END AS INTEGER) AS out_of_control
    FROM m CROSS JOIN tot
    """,
    doc="Shewhart p-chart (attribute control chart) on the monthly "
        "return-item rate with per-month 3-sigma binomial limits — the "
        "SPC complement to CUSUM (events_cusum_level_shift detects "
        "persistent small drifts; the p-chart flags months whose "
        "PROPORTION breaks the pooled-baseline band, limits widening "
        "correctly for thin months since the binomial sigma carries "
        "each month's own n).  Return-rate control is the classic "
        "supply-chain quality loop; the identical shape monitors any "
        "pass/fail gate rate in a curation pipeline month over month.  "
        "Exact arithmetic: all counts int64; every rate/limit/flag is "
        "the SAME scalar double tree in both engines (one 3.0 literal, "
        "no pre-multiplied constants to fold differently), so even the "
        "boundary COMPARISON for the flag is bit-identical.  Scale "
        "shape: one partial-agg shuffle to |months| cells (calendar-"
        "bounded), a 1-row broadcast total, <=84 output rows.",
    tags=("lineitem", "stats", "timeseries"),
)
def lineitem_returns_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy(
        (F.year("l_shipdate") * 100 + F.month("l_shipdate")).alias("ym")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.count_if(F.col("l_returnflag") == "R").cast("bigint").alias("r"),
    )
    tot = m.agg(
        F.sum("n").cast("bigint").alias("nt"),
        F.sum("r").cast("bigint").alias("rt"),
    )
    one = F.lit(1.0)
    pbar = F.col("rt") * one / F.col("nt")
    sigma3 = F.lit(3.0) * F.sqrt(pbar * (one - pbar) / F.col("n"))
    p = F.col("r") * one / F.col("n")
    ucl = pbar + sigma3
    lcl = F.greatest(F.lit(0.0), pbar - sigma3)
    return m.crossJoin(F.broadcast(tot)).select(
        F.col("ym").cast("int").alias("ym"),
        "n",
        "r",
        pround(p, 6).alias("p_rate"),
        pround(ucl, 6).alias("ucl"),
        pround(lcl, 6).alias("lcl"),
        F.when((p > ucl) | (p < lcl), 1)
        .otherwise(0)
        .cast("int")
        .alias("out_of_control"),
    )


# ---------------------------------------------------------------------------
# Relational division: customers covering ALL quarters of a year
# ---------------------------------------------------------------------------

_DIV_YEAR = 1995


@register(
    "customers_all_quarters_1995",
    oracle=f"""
    SELECT o_custkey,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                AS BIGINT) AS total_cents
    FROM orders
    WHERE year(o_orderdate) = {_DIV_YEAR}
    GROUP BY o_custkey
    HAVING count(DISTINCT quarter(o_orderdate)) = 4
    """,
    doc="RELATIONAL DIVISION (Codd's division operator — 'suppliers who "
        "supply ALL parts'): customers who placed orders in EVERY "
        f"quarter of {_DIV_YEAR} — the universal-quantifier query class "
        "(FOR ALL) that joins/filters alone cannot express and that "
        "q4/q22's EXISTS/NOT-EXISTS siblings only cover existentially.  "
        "Implemented by the count-distinct-equals-divisor-cardinality "
        "rewrite (the scale-correct form: the double-NOT-EXISTS "
        "textbook encoding runs two correlated anti-joins; this is one "
        "grouped aggregate with the year filter PUSHED to the parquet "
        "scan).  Consistent-continuity screens in pipelines are this "
        "exact shape: 'sources present in every epoch', 'devices "
        "heartbeating every day of the window'.  All-integer output "
        "(counts + cents).  Scale shape: one custkey-keyed partial agg "
        "over the filtered year; divisor cardinality (4) is a plan "
        "constant.",
    tags=("relational", "orders"),
)
def customers_all_quarters_1995(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate") == _DIV_YEAR
    )
    return (
        o.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum(_cents(F.col("o_totalprice"))).cast("bigint").alias(
                "total_cents"
            ),
            F.count_distinct(F.quarter("o_orderdate")).alias("nq"),
        )
        .filter(F.col("nq") == 4)
        .drop("nq")
    )


# ---------------------------------------------------------------------------
# Simpson's-paradox screen: pooled vs within-group slope sign reversal
# ---------------------------------------------------------------------------


@register(
    "lineitem_simpson_paradox_screen",
    oracle="""
    WITH pts AS (
      SELECT p.p_brand AS brand,
             CAST(floor(l.l_discount * 100.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(l.l_quantity + 0.5) AS BIGINT) AS y
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    ), g AS (
      SELECT brand,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
      FROM pts GROUP BY brand
    ), sg AS (
      SELECT brand, n,
             n * sxy - sx * sy AS num,
             n * sxx - sx * sx AS den
      FROM g
    ), pooled AS (
      SELECT CAST(sum(n) AS BIGINT) AS n,
             CAST(sum(sx) AS BIGINT) AS sx, CAST(sum(sy) AS BIGINT) AS sy,
             CAST(sum(sxx) AS BIGINT) AS sxx, CAST(sum(sxy) AS BIGINT) AS sxy
      FROM g
    ), ps AS (
      SELECT n * sxy - sx * sy AS pnum, n * sxx - sx * sx AS pden FROM pooled
    )
    SELECT floor((pnum * 1.0 / pden) * 1000000.0 + 0.5) / 1000000.0
             AS pooled_slope,
           CAST(sign(pnum) AS INTEGER) AS pooled_sign,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(CASE WHEN sign(num) = sign(pnum) AND num <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sign_agree,
           CAST(sum(CASE WHEN sign(num) = -sign(pnum) AND num <> 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_sign_disagree
    FROM sg CROSS JOIN ps
    WHERE den > 0
    GROUP BY pnum, pden
    """,
    doc="Simpson's-paradox screen on the discount->quantity relation: "
        "does the POOLED regression slope's sign survive inside each "
        "brand, or is the aggregate trend an artifact of how volume "
        "distributes across brands?  The aggregation-reversal audit "
        "every cross-source corpus statistic needs before anyone acts "
        "on a pooled correlation (lineitem_discount_elasticity reports "
        "per-brand slopes; this one-row screen says whether pooling "
        "them even preserves direction).  PURE INTEGER SIGNS: x is "
        "discount cents (0..10), y integer quantity, so every "
        "co-moment, every slope NUMERATOR (n*sxy - sx*sy), and every "
        "sign comparison is exact int64 — the agree/disagree counts "
        "cannot flip by a ULP in either engine; only the reported "
        "pooled slope touches a double, as one identical tree.  Scale "
        "shape: one partkey fact-dim join (part side broadcastable), "
        "one partial-agg shuffle to |brands| co-moment rows, a 1-row "
        "pooled fold broadcast back; output 1 row.  int64 headroom: "
        "n*sxy with x<=10, y<=50 overflows past ~4e15 rows — "
        "effectively unbounded.",
    tags=("lineitem", "stats", "quality"),
)
def lineitem_simpson_paradox_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_discount") * 100.0 + 0.5).cast("bigint").alias("x"),
        F.floor(F.col("l_quantity") + 0.5).cast("bigint").alias("y"),
    )
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    pts = li.join(p, li.l_partkey == p.p_partkey).select(
        F.col("p_brand").alias("brand"), "x", "y"
    )
    g = pts.groupBy("brand").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
    ).localCheckpoint(eager=False)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    sg = g.select("brand", num.alias("num"), den.alias("den"))
    pooled = g.agg(
        F.sum("n").cast("bigint").alias("n"),
        F.sum("sx").cast("bigint").alias("sx"),
        F.sum("sy").cast("bigint").alias("sy"),
        F.sum("sxx").cast("bigint").alias("sxx"),
        F.sum("sxy").cast("bigint").alias("sxy"),
    ).select(num.alias("pnum"), den.alias("pden"))
    return (
        sg.filter(F.col("den") > 0)
        .crossJoin(F.broadcast(pooled))
        .groupBy("pnum", "pden")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_groups"),
            F.sum(
                F.when(
                    (F.signum(F.col("num")) == F.signum(F.col("pnum")))
                    & (F.col("num") != 0),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_sign_agree"),
            F.sum(
                F.when(
                    (F.signum(F.col("num")) == -F.signum(F.col("pnum")))
                    & (F.col("num") != 0),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_sign_disagree"),
        )
        .select(
            pround(F.col("pnum") * F.lit(1.0) / F.col("pden"), 6).alias(
                "pooled_slope"
            ),
            F.signum(F.col("pnum")).cast("int").alias("pooled_sign"),
            "n_groups",
            "n_sign_agree",
            "n_sign_disagree",
        )
    )


# ---------------------------------------------------------------------------
# Kruskal-Wallis rank test: purchase value across ISO days of week
# ---------------------------------------------------------------------------

_KW_TYPE = "purchase"
# chi-square 95th-percentile critical values BY df (1..6), each a
# pre-rounded literal (the events_chi2_mix_drift_daily pattern).  The
# value must be SELECTED by the observed group count — r12 review fix:
# a single pinned df=6 literal under-rejects whenever fewer than 7
# weekday groups survive the filters (the same hardcoded-family-size
# class as the round-11 BH m=7 bug).
_KW_CRIT_BY_DF = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.07, 6: 12.592}
_KW_CRIT_SQL = (
    "CASE k - 1 "
    + " ".join(f"WHEN {df} THEN {v}" for df, v in sorted(_KW_CRIT_BY_DF.items()))
    + " ELSE 12.592 END"
)


@register(
    "events_kruskal_wallis_dow",
    oracle=f"""
    WITH ev AS (
      SELECT isodow(ts) AS g, value FROM events
      WHERE event_type = '{_KW_TYPE}' AND value IS NOT NULL
    ), vc AS (
      SELECT g, value, CAST(count(*) AS BIGINT) AS c
      FROM ev GROUP BY g, value
    ), marg AS (
      SELECT value, CAST(sum(c) AS BIGINT) AS cv,
             CAST(sum(sum(c)) OVER (ORDER BY value
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM vc GROUP BY value
    ), ranked AS (
      SELECT vc.g, vc.c, 2 * (m.cum - m.cv) + m.cv + 1 AS r2
      FROM vc JOIN marg m ON m.value = vc.value
    ), grp AS (
      SELECT g, CAST(sum(c) AS BIGINT) AS ng,
             CAST(sum(c * r2) AS BIGINT) AS r2g
      FROM ranked GROUP BY g
    ), ties AS (
      SELECT CAST(sum(cv * cv * cv - cv) AS BIGINT) AS t3 FROM marg
    ), tot AS (
      SELECT CAST(sum(ng) AS BIGINT) AS n,
             CAST(sum(r2g * r2g * 100 // (4 * ng)) AS BIGINT) AS sq_e2,
             CAST(count(*) AS BIGINT) AS k
      FROM grp
    )
    SELECT CAST(k AS INTEGER) AS k_groups, n,
           CAST(k - 1 AS BIGINT) AS df,
           floor(((12.0 / (n * (n + 1.0)) * (sq_e2 / 100.0)
                   - 3.0 * (n + 1.0))
                  / (1.0 - t3 * 1.0 / (n * 1.0 * n * n - n)))
                 * 1000000.0 + 0.5) / 1000000.0 AS h_stat,
           CAST(CASE WHEN (12.0 / (n * (n + 1.0)) * (sq_e2 / 100.0)
                           - 3.0 * (n + 1.0))
                          / (1.0 - t3 * 1.0 / (n * 1.0 * n * n - n))
                          > ({_KW_CRIT_SQL})
                THEN 1 ELSE 0 END AS INTEGER) AS significant_95
    FROM tot CROSS JOIN ties
    """,
    doc="Kruskal-Wallis H test of the purchase-value distribution "
        "across ISO days of week — the k-group NONPARAMETRIC cell "
        "completing the test matrix (Welch t / Mann-Whitney for two "
        "groups, ANOVA / THIS for k groups): rank-based, so the "
        "heavy-tailed revenue values the Hill estimator flags need no "
        "normality for a valid any-day-different screen.  Tie-"
        "corrected H with average ranks from the global value-domain "
        "cumulative counts (the Mann-Whitney 2x-scaled integer rank "
        "machinery, one marginal instead of two); the per-group "
        "R2_g^2/(4 n_g) terms are floor-quantized to int64 CENTS "
        "before the cross-group sum (the ANOVA device — a float fold "
        "over 7 groups is order-dependent), so H and even the "
        "significance comparison against the df-SELECTED pinned "
        "chi-square literal (k-1 observed, not a hardcoded 6 — r12 "
        "review fix) are identical scalar trees.  Scale shape: one "
        "partial-agg shuffle to (dow, value) cells bounded by the "
        "2-dp value DOMAIN, a |values|-row cumulative window, 7-row "
        "group fold, 1-row output.  int64 headroom: R2_g^2*100 "
        "overflows past ~1e5 purchase rows per dow-group — "
        "decimal(38,0) swap documented (warehouse.py:203).",
    tags=("events", "stats"),
)
def events_kruskal_wallis_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    # explicit NULL exclusion — see events_mann_whitney_value
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == _KW_TYPE) & F.col("value").isNotNull()
    )
    vc = e.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("g"), F.col("value")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    vc = vc.localCheckpoint(eager=False)
    wm = Window.partitionBy(bounded_window_key("value")).orderBy("value").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    marg = (
        vc.groupBy("value")
        .agg(F.sum("c").cast("bigint").alias("cv"))
        .withColumn("cum", F.sum("cv").over(wm).cast("bigint"))
    )
    ranked = vc.join(marg, "value").select(
        "g", "c", (2 * (F.col("cum") - F.col("cv")) + F.col("cv") + 1).alias("r2")
    )
    grp = ranked.groupBy("g").agg(
        F.sum("c").cast("bigint").alias("ng"),
        F.sum(F.col("c") * F.col("r2")).cast("bigint").alias("r2g"),
    )
    ties = marg.agg(
        F.sum(F.col("cv") * F.col("cv") * F.col("cv") - F.col("cv"))
        .cast("bigint")
        .alias("t3")
    )
    tot = grp.agg(
        F.sum("ng").cast("bigint").alias("n"),
        F.sum(F.expr("r2g * r2g * 100L div (4 * ng)")).cast("bigint").alias(
            "sq_e2"
        ),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    one = F.lit(1.0)
    n = F.col("n")
    h_raw = (
        F.lit(12.0) / (n * (n + one)) * (F.col("sq_e2") / F.lit(100.0))
        - F.lit(3.0) * (n + one)
    ) / (one - F.col("t3") * one / (n * one * n * n - n))
    crit = F.expr(_KW_CRIT_SQL)
    return tot.crossJoin(F.broadcast(ties)).select(
        F.col("k").cast("int").alias("k_groups"),
        "n",
        (F.col("k") - 1).cast("bigint").alias("df"),
        pround(h_raw, 6).alias("h_stat"),
        F.when(h_raw > crit, 1).otherwise(0).cast("int").alias(
            "significant_95"
        ),
    )


# ---------------------------------------------------------------------------
# Basket-size histogram (the distribution behind the pair-join bound)
# ---------------------------------------------------------------------------


@register(
    "orders_basket_size_histogram",
    oracle="""
    WITH sizes AS (
      SELECT l_orderkey, CAST(count(*) AS BIGINT) AS basket_size
      FROM lineitem GROUP BY l_orderkey
    ), tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n_orders FROM sizes
    )
    SELECT basket_size,
           CAST(count(*) AS BIGINT) AS n_orders,
           floor(count(*) * 1.0 / t.n_orders * 1000000.0 + 0.5)
             / 1000000.0 AS share,
           CAST(basket_size * (basket_size - 1) / 2 * count(*) AS BIGINT)
             AS pair_join_rows
    FROM sizes CROSS JOIN tot t
    GROUP BY basket_size, t.n_orders
    """,
    doc="Basket-size distribution with the induced self-join cost: for "
        "each distinct lines-per-order count, how many orders have it "
        "and how many pair rows they contribute to a basket self-join "
        "(k(k-1)/2 each).  This is the measured evidence behind "
        "orders_basket_pairs' 'blow-up bounded by basket size squared' "
        "claim — the capacity-planning table read BEFORE running any "
        "order-key self-join at 100 TB, and the skew detector for a "
        "pathological mega-basket (one 1e6-line order contributes 5e11 "
        "pair rows; this table shows it as a single damning row).  "
        "All-integer math plus one exact share division.  Scale shape: "
        "one orderkey partial agg, a 1-row broadcast total, output "
        "bounded by |distinct basket sizes| (~7 here).",
    tags=("orders", "profiling", "join"),
)
def orders_basket_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    sizes = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("basket_size")
    )
    tot = sizes.agg(F.count(F.lit(1)).cast("bigint").alias("n_orders_t"))
    return (
        sizes.crossJoin(F.broadcast(tot))
        .groupBy("basket_size", "n_orders_t")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"))
        .select(
            "basket_size",
            "n_orders",
            pround(
                F.col("n_orders") * F.lit(1.0) / F.col("n_orders_t"), 6
            ).alias("share"),
            (
                F.col("basket_size")
                * (F.col("basket_size") - 1)
                / 2
                * F.col("n_orders")
            )
            .cast("bigint")
            .alias("pair_join_rows"),
        )
    )


# chi-square(1 dof) 95% critical value, scaled by 1000 for the exact
# integer SRM comparison below
_SRM_CRIT_E3 = 3841


@register(
    "events_ab_srm_check",
    oracle=f"""
    WITH assign AS (
      SELECT user_id,
             CAST(((min(CAST(json_extract(props, '$.k') AS BIGINT)) % 2)
                   + 2) % 2 AS INTEGER) AS arm
      FROM events GROUP BY user_id
    ), arms AS (
      SELECT
        CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN arm IS NULL THEN 1 ELSE 0 END) AS BIGINT)
          AS n_unassigned
      FROM assign
    )
    SELECT n_a, n_b, n_unassigned,
           floor(((n_a - n_b) * (n_a - n_b) * 1.0 / (n_a + n_b))
                 * 1000000.0 + 0.5) / 1000000.0 AS chi2,
           (n_a - n_b) * (n_a - n_b) * 1000 > {_SRM_CRIT_E3} * (n_a + n_b)
             AS srm_flag
    FROM arms
    """,
    doc="Sample-ratio-mismatch gate for the A/B assignment feeding "
        "events_abtest_purchase_rate (same hash-parity arms): under a "
        "healthy 50/50 split, chi2 = (n_a - n_b)^2 / n ~ chi2(1); a "
        "significant imbalance means the randomization itself is "
        "broken and any downstream lift number is invalid — the "
        "standard pre-read gate of experiment platforms.  The arm is "
        "pmod(min_k, 2) — written as ((k%2)+2)%2 in the oracle since "
        "DuckDB's % follows the dividend sign — so negative keys land "
        "in a real arm instead of vanishing, and users whose $.k is "
        "absent/non-numeric are surfaced as n_unassigned rather than "
        "silently dropped (an SRM gate that undercounts the assigned "
        "population can read healthy while assignment coverage is "
        "broken).  The flag compares exact integers ((n_a-n_b)^2 * "
        "1000 vs 3841 * n, the 95% critical value scaled e3) so no "
        "float feeds the decision; chi2 itself is one double division "
        "of exact ints.  Scale shape: one user-grain partial agg, "
        "then three conditional sums to a 1-row report.",
    tags=("events", "stats", "abtest"),
)
def events_ab_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    assign = e.groupBy("user_id").agg(
        F.pmod(
            F.min(F.get_json_object("props", "$.k").cast("bigint")), F.lit(2)
        )
        .cast("int")
        .alias("arm")
    )
    arms = assign.agg(
        F.sum((F.col("arm") == 0).cast("bigint")).cast("bigint").alias("n_a"),
        F.sum((F.col("arm") == 1).cast("bigint")).cast("bigint").alias("n_b"),
        F.sum(F.col("arm").isNull().cast("bigint"))
        .cast("bigint")
        .alias("n_unassigned"),
    )
    d = F.col("n_a") - F.col("n_b")
    n = F.col("n_a") + F.col("n_b")
    return arms.select(
        "n_a",
        "n_b",
        "n_unassigned",
        pround(d * d * F.lit(1.0) / n, 6).alias("chi2"),
        (d * d * F.lit(1000) > F.lit(_SRM_CRIT_E3) * n).alias("srm_flag"),
    )


@register(
    "orders_duplicate_payment_screen",
    oracle="""
    WITH o AS (
      SELECT o_orderkey, o_custkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             o_orderdate
      FROM orders
    )
    SELECT a.o_custkey,
           a.o_orderkey AS orderkey_a,
           b.o_orderkey AS orderkey_b,
           floor((a.cents / 100.0) * 100.0 + 0.5) / 100.0 AS amount_a,
           floor((b.cents / 100.0) * 100.0 + 0.5) / 100.0 AS amount_b,
           CAST(datediff('day', a.o_orderdate, b.o_orderdate) AS INTEGER)
             AS day_gap
    FROM o a JOIN o b
      ON a.o_custkey = b.o_custkey
     AND a.o_orderkey < b.o_orderkey
     AND abs(datediff('day', a.o_orderdate, b.o_orderdate)) <= 7
     AND abs(a.cents - b.cents) * 100 <= least(a.cents, b.cents)
    """,
    doc="Duplicate-payment audit screen: pairs of orders by the SAME "
        "customer within 7 days whose amounts differ by at most 1% — "
        "the double-charge / double-submit detector of payment-ops "
        "audit (exact-amount equality alone misses resubmissions with "
        "adjusted tax/shipping, and this synthetic ledger has no exact "
        "repeats at all).  Amounts compared as exact integer cents "
        "with an integer cross-multiplied tolerance (|ca-cb|*100 <= "
        "least(ca, cb) — symmetric in the amounts; r12 review fix, "
        "the earlier a-side baseline made boundary pairs depend on "
        "which order drew the smaller key) — no float enters the "
        "predicate.  Scale shape: self-join "
        "EQUI on o_custkey — blocks are orders-per-customer (~30 at "
        "every TPC-H SF), so the pair blow-up is block-bounded and "
        "never all-pairs; date and amount tolerances run as join "
        "residuals inside each block; output is the audit worklist "
        "itself, uniquely keyed by the orderkey total order.",
    tags=("relational", "audit", "join"),
)
def orders_duplicate_payment_screen(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("bigint")
        .alias("cents"),
        "o_orderdate",
    )
    a, b = o.alias("a"), o.alias("b")
    gap = F.datediff(F.col("b.o_orderdate"), F.col("a.o_orderdate"))
    # tolerance baselined on the SMALLER amount: a function of the
    # amounts alone, symmetric in the pair — baselining on the
    # lower-ORDERKEY side made near-boundary classification depend on
    # arbitrary key assignment (r12 review fix), and least() is also
    # the stricter of the two readings
    near = (
        F.abs(F.col("a.cents") - F.col("b.cents")) * F.lit(100)
        <= F.least(F.col("a.cents"), F.col("b.cents"))
    )
    return (
        a.join(
            b,
            (F.col("a.o_custkey") == F.col("b.o_custkey"))
            & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
            & (F.abs(gap) <= F.lit(7))
            & near,
        )
        .select(
            F.col("a.o_custkey").alias("o_custkey"),
            F.col("a.o_orderkey").alias("orderkey_a"),
            F.col("b.o_orderkey").alias("orderkey_b"),
            pround(F.col("a.cents") / F.lit(100.0), 2).alias("amount_a"),
            pround(F.col("b.cents") / F.lit(100.0), 2).alias("amount_b"),
            gap.cast("int").alias("day_gap"),
        )
    )


# fixed spend-tier edges in exact cents (fixed thresholds, NOT
# quantiles: tier membership must not drift with the other year's mix)
_TIER_EDGES_CENTS = (10_000_000, 30_000_000)  # <100k low, <300k mid, else high


def _spend_tier(cents_col):
    return (
        F.when(cents_col.isNull(), "none")
        .when(cents_col < _TIER_EDGES_CENTS[0], "low")
        .when(cents_col < _TIER_EDGES_CENTS[1], "mid")
        .otherwise("high")
    )


@register(
    "orders_customer_migration_matrix",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, CAST(year(o_orderdate) AS INTEGER) AS yr,
             CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders
      WHERE year(o_orderdate) IN (1995, 1996)
      GROUP BY o_custkey, yr
    ), matrix AS (
      SELECT coalesce(a.o_custkey, b.o_custkey) AS ck,
             CASE WHEN a.cents IS NULL THEN 'none'
                  WHEN a.cents < {_TIER_EDGES_CENTS[0]} THEN 'low'
                  WHEN a.cents < {_TIER_EDGES_CENTS[1]} THEN 'mid'
                  ELSE 'high' END AS tier_1995,
             CASE WHEN b.cents IS NULL THEN 'none'
                  WHEN b.cents < {_TIER_EDGES_CENTS[0]} THEN 'low'
                  WHEN b.cents < {_TIER_EDGES_CENTS[1]} THEN 'mid'
                  ELSE 'high' END AS tier_1996
      FROM (SELECT * FROM spend WHERE yr = 1995) a
      FULL OUTER JOIN (SELECT * FROM spend WHERE yr = 1996) b
        ON a.o_custkey = b.o_custkey
    )
    SELECT tier_1995, tier_1996, CAST(count(*) AS BIGINT) AS n_customers
    FROM matrix GROUP BY tier_1995, tier_1996
    """,
    doc="Customer spend-tier migration matrix 1995 -> 1996 (the first "
        "two full fixture years): annual spend (exact integer cents) "
        "bucketed by FIXED thresholds (fixed, not quantile, so a tier "
        "means the same thing in both years), full-outer-joined across "
        "years with 'none' for customers absent in one — churn "
        "(x -> none), acquisition (none -> x) and up/down-grades read "
        "directly off the <=16 cells.  The year-over-year retention/"
        "expansion report every revenue team runs.  Scale shape: one "
        "(custkey, year) partial-agg shuffle with the year filter "
        "pushed to the scan, one co-partitioned self-join on custkey, "
        "16-cell rollup.",
    tags=("analytics", "cohorts"),
)
def orders_customer_migration_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        F.year("o_orderdate").isin(1995, 1996)
    )
    spend = o.groupBy(
        "o_custkey", F.year("o_orderdate").cast("int").alias("yr")
    ).agg(
        F.sum(
            F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
        )
        .cast("bigint")
        .alias("cents")
    )
    a = spend.filter(F.col("yr") == 1995).select(
        "o_custkey", F.col("cents").alias("c_y1")
    )
    b = spend.filter(F.col("yr") == 1996).select(
        "o_custkey", F.col("cents").alias("c_y2")
    )
    return (
        a.join(b, "o_custkey", "full_outer")
        .select(
            _spend_tier(F.col("c_y1")).alias("tier_1995"),
            _spend_tier(F.col("c_y2")).alias("tier_1996"),
        )
        .groupBy("tier_1995", "tier_1996")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_customers"))
    )


BOOTSTRAP_B = 100
# Poisson(1) inverse-CDF thresholds as exact uint32 integers
# (floor(cumP(k) * 2^32) for k = 0..5; u32 >= last -> w = 6).  The
# weight branch compares INTEGERS, so both engines draw identical
# weights from the identical md5-derived u32.
_POIS_T = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373, 4292415291)


# the md5→uint32 derivation is the SHARED cross-engine primitive in
# functions/portable (spark_u32 / duck_u32) — the bootstrap used to
# carry a byte-identical private copy of each half, which a future fix
# to the shared pair would silently miss (r12 review fix: alias, not
# copy)
_duck_bootstrap_u32 = duck_u32


def _duck_pois_w(u32: str) -> str:
    cases = " ".join(
        f"WHEN {u32} < {t} THEN {k}" for k, t in enumerate(_POIS_T)
    )
    return f"CASE {cases} ELSE 6 END"


@register(
    "events_bootstrap_mean_ci",
    oracle=f"""
    WITH v AS (
      SELECT event_id, CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ), w AS (
      SELECT b.b, v.cents,
             {_duck_pois_w(_duck_bootstrap_u32("CAST(v.event_id AS VARCHAR) || '_' || CAST(b.b AS VARCHAR)"))} AS w
      FROM v CROSS JOIN (SELECT unnest(generate_series(0, {BOOTSTRAP_B - 1})) AS b) b
    ), res AS (
      SELECT b, CAST(sum(w * cents) AS BIGINT) AS s, CAST(sum(w) AS BIGINT) AS n
      FROM w GROUP BY b HAVING sum(w) > 0
    ), means AS (
      SELECT s * 1.0 / (n * 100.0) AS m FROM res
    ), full_mean AS (
      SELECT CAST(sum(cents) AS BIGINT) AS s, CAST(count(*) AS BIGINT) AS n FROM v
    )
    SELECT f.n AS n_rows,
           CAST((SELECT count(*) FROM res) AS BIGINT) AS n_resamples,
           floor((f.s * 1.0 / (f.n * 100.0)) * 1000000.0 + 0.5) / 1000000.0
             AS mean_value,
           floor((SELECT quantile_cont(m, 0.025) FROM means) * 1000000.0 + 0.5)
             / 1000000.0 AS ci_lo,
           floor((SELECT quantile_cont(m, 0.975) FROM means) * 1000000.0 + 0.5)
             / 1000000.0 AS ci_hi
    FROM full_mean f
    """,
    doc=f"Poisson bootstrap 95% CI for the mean purchase value — THE "
        f"distributed-bootstrap formulation: instead of resampling n "
        f"rows WITH replacement (which needs global coordination), "
        f"each row independently draws a Poisson(1) weight per "
        f"resample, so the whole B={BOOTSTRAP_B}-resample bootstrap is "
        f"one stateless map over the data followed by a {BOOTSTRAP_B}-"
        f"cell aggregate.  Determinism: the weight comes from an "
        f"md5-derived u32 per (event_id, b) compared against exact "
        f"integer Poisson CDF thresholds — both engines draw "
        f"bit-identical weights, resample means are ratios of exact "
        f"int64 sums, and Spark's percentile() equals DuckDB's "
        f"quantile_cont() on identical double multisets (verified "
        f"cross-engine property).  Scale shape: the B-fold explode is "
        f"map-side and partial-aggregates into {BOOTSTRAP_B} cells "
        f"before the only shuffle; nothing global until the "
        f"{BOOTSTRAP_B}-row mean table.",
    tags=("events", "stats", "approx"),
)
def events_bootstrap_mean_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    )
    v = e.select(
        "event_id",
        F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    wdf = v.select(
        "cents",
        F.explode(F.sequence(F.lit(0), F.lit(BOOTSTRAP_B - 1))).alias("b"),
        F.col("event_id"),
    )
    u32 = spark_u32(
        F.concat(
            F.col("event_id").cast("string"), F.lit("_"), F.col("b").cast("string")
        )
    )
    w = F.when(u32 < _POIS_T[0], 0)
    for k, t in enumerate(_POIS_T[1:], start=1):
        w = w.when(u32 < t, k)
    w = w.otherwise(6)
    res = (
        wdf.select("b", "cents", w.alias("w"))
        .groupBy("b")
        .agg(
            F.sum(F.col("w") * F.col("cents")).cast("bigint").alias("s"),
            F.sum("w").cast("bigint").alias("n"),
        )
        .filter(F.col("n") > 0)
    )
    means = res.select((F.col("s") * F.lit(1.0) / (F.col("n") * F.lit(100.0))).alias("m"))
    ci = means.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_resamples"),
        pround(F.expr("percentile(m, 0.025D)"), 6).alias("ci_lo"),
        pround(F.expr("percentile(m, 0.975D)"), 6).alias("ci_hi"),
    )
    full = v.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        pround(F.sum("cents") * F.lit(1.0) / (F.count(F.lit(1)) * F.lit(100.0)), 6).alias(
            "mean_value"
        ),
    )
    return full.crossJoin(F.broadcast(ci)).select(
        "n_rows", "n_resamples", "mean_value", "ci_lo", "ci_hi"
    )


# --- round 11: experimentation-platform tier ---------------------------------
# CUPED variance reduction, power/MDE, and a multiple-testing (BH-FDR)
# screen — the three readouts that sit NEXT to the Welch t-test
# (events_abtest_purchase_rate) and SRM gate (events_ab_srm_check) on
# every experiment dashboard.

# pre/post split for CUPED's covariate: 2024-01-16 00:00:00 UTC in
# epoch micros (the events fixture spans 2024-01-01..01-30; ts_us
# comparisons are tz-free)
_CUPED_SPLIT_US = 1_705_363_200_000_000


@register(
    "events_abtest_cuped_adjusted",
    oracle=f"""
    WITH assign AS (
      SELECT * FROM (
        SELECT user_id,
               CAST(((min(CAST(json_extract(props, '$.k') AS BIGINT)) % 2)
                     + 2) % 2 AS INTEGER) AS arm,
               CAST(sum(CASE WHEN event_type = 'purchase'
                             AND epoch_ns(ts) // 1000 >= {_CUPED_SPLIT_US}
                        THEN 1 ELSE 0 END) AS BIGINT) AS y,
               CAST(sum(CASE WHEN epoch_ns(ts) // 1000 < {_CUPED_SPLIT_US}
                        THEN 1 ELSE 0 END) AS BIGINT) AS x
        FROM events GROUP BY user_id
      ) WHERE arm IS NOT NULL
    ), pooled AS (
      SELECT covar_samp(x * 1.0, y * 1.0) / var_samp(x * 1.0) AS theta,
             avg(x * 1.0) AS xbar
      FROM assign
    ), arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             avg(y * 1.0) AS my, avg(x * 1.0) AS mx,
             var_samp(y * 1.0) AS vy, var_samp(x * 1.0) AS vx,
             covar_samp(x * 1.0, y * 1.0) AS cxy
      FROM assign GROUP BY arm
    )
    SELECT a.n AS n_a, b.n AS n_b,
           floor(p.theta * 1000000.0 + 0.5) / 1000000.0 AS theta,
           floor((a.my - p.theta * (a.mx - p.xbar)) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_adj_a,
           floor((b.my - p.theta * (b.mx - p.xbar)) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_adj_b,
           floor(((a.my - b.my)
                  / sqrt(a.vy / a.n + b.vy / b.n)) * 1000000.0 + 0.5)
             / 1000000.0 AS tstat_raw,
           floor((((a.my - p.theta * (a.mx - p.xbar))
                   - (b.my - p.theta * (b.mx - p.xbar)))
                  / sqrt((a.vy - 2.0 * p.theta * a.cxy
                          + p.theta * p.theta * a.vx) / a.n
                         + (b.vy - 2.0 * p.theta * b.cxy
                            + p.theta * p.theta * b.vx) / b.n))
                 * 1000000.0 + 0.5) / 1000000.0 AS tstat_cuped,
           floor((1.0 - ((a.vy - 2.0 * p.theta * a.cxy
                          + p.theta * p.theta * a.vx)
                         + (b.vy - 2.0 * p.theta * b.cxy
                            + p.theta * p.theta * b.vx))
                        / (a.vy + b.vy)) * 1000000.0 + 0.5)
             / 1000000.0 AS var_reduction
    FROM (SELECT * FROM arms WHERE arm = 0) a
    CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
    CROSS JOIN pooled p
    """,
    doc="CUPED variance reduction (Deng et al. 2013, the industry-"
        "standard pre-experiment covariate adjustment): per assigned "
        "user, Y = post-period purchases and X = pre-period activity "
        "(all events before the split); theta = cov(X,Y)/var(X) pooled "
        "across arms (unbiased under randomization), adjusted metric "
        "Y - theta*(X - mean(X)).  Reports per-arm adjusted means, the "
        "raw and CUPED Welch t statistics, and the achieved variance "
        "reduction — all assembled in CLOSED FORM from per-arm "
        "co-moments (var_adj = vy - 2*theta*cxy + theta^2*vx), so no "
        "second pass joins theta back to user rows.  Assignment is the "
        "SRM gate's pmod parity; unassigned users are excluded (they "
        "are SURFACED by events_ab_srm_check).  Scale shape: ONE "
        "user-grain partial agg over the events scan, a 2-row arm "
        "rollup + 1-row pooled rollup, statistic on 3 broadcast rows.  "
        "Inputs are exact integer counts, so both engines derive "
        "identical doubles (the abtest/correlation precedent).",
    tags=("events", "stats", "abtest"),
)
def events_abtest_cuped_adjusted(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    assign = (
        e.groupBy("user_id")
        .agg(
            F.pmod(
                F.min(F.get_json_object("props", "$.k").cast("bigint")), F.lit(2)
            )
            .cast("int")
            .alias("arm"),
            F.sum(
                (
                    (F.col("event_type") == "purchase")
                    & (F.col("ts_us") >= _CUPED_SPLIT_US)
                ).cast("bigint")
            )
            .cast("bigint")
            .alias("y"),
            F.sum((F.col("ts_us") < _CUPED_SPLIT_US).cast("bigint"))
            .cast("bigint")
            .alias("x"),
        )
        .filter(F.col("arm").isNotNull())
        .localCheckpoint(eager=False)
    )
    xd, yd = F.col("x") * F.lit(1.0), F.col("y") * F.lit(1.0)
    pooled = assign.agg(
        (F.covar_samp(xd, yd) / F.var_samp(xd)).alias("theta"),
        F.avg(xd).alias("xbar"),
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg(yd).alias("my"),
        F.avg(xd).alias("mx"),
        F.var_samp(yd).alias("vy"),
        F.var_samp(xd).alias("vx"),
        F.covar_samp(xd, yd).alias("cxy"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("my").alias("my_a"),
        F.col("mx").alias("mx_a"), F.col("vy").alias("vy_a"),
        F.col("vx").alias("vx_a"), F.col("cxy").alias("cxy_a"),
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("my").alias("my_b"),
        F.col("mx").alias("mx_b"), F.col("vy").alias("vy_b"),
        F.col("vx").alias("vx_b"), F.col("cxy").alias("cxy_b"),
    )
    th = F.col("theta")
    adj_a = F.col("my_a") - th * (F.col("mx_a") - F.col("xbar"))
    adj_b = F.col("my_b") - th * (F.col("mx_b") - F.col("xbar"))
    vadj_a = F.col("vy_a") - 2.0 * th * F.col("cxy_a") + th * th * F.col("vx_a")
    vadj_b = F.col("vy_b") - 2.0 * th * F.col("cxy_b") + th * th * F.col("vx_b")
    return (
        a.crossJoin(F.broadcast(b))
        .crossJoin(F.broadcast(pooled))
        .select(
            "n_a",
            "n_b",
            pround(th, 6).alias("theta"),
            pround(adj_a, 6).alias("mean_adj_a"),
            pround(adj_b, 6).alias("mean_adj_b"),
            pround(
                (F.col("my_a") - F.col("my_b"))
                / F.sqrt(F.col("vy_a") / F.col("n_a") + F.col("vy_b") / F.col("n_b")),
                6,
            ).alias("tstat_raw"),
            pround(
                (adj_a - adj_b)
                / F.sqrt(vadj_a / F.col("n_a") + vadj_b / F.col("n_b")),
                6,
            ).alias("tstat_cuped"),
            pround(
                F.lit(1.0) - (vadj_a + vadj_b) / (F.col("vy_a") + F.col("vy_b")), 6
            ).alias("var_reduction"),
        )
    )


# z_{0.975} + z_{0.80} pre-folded to ONE literal (the ULP rule: never
# let the engines fold constant products differently)
_MDE_ZSUM = 2.801585


@register(
    "events_abtest_power_mde",
    oracle=f"""
    WITH assign AS (
      SELECT * FROM (
        SELECT user_id,
               CAST(((min(CAST(json_extract(props, '$.k') AS BIGINT)) % 2)
                     + 2) % 2 AS INTEGER) AS arm,
               CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                    AS BIGINT) AS y
        FROM events GROUP BY user_id
      ) WHERE arm IS NOT NULL
    ), arms AS (
      SELECT arm, CAST(count(*) AS BIGINT) AS n,
             avg(y * 1.0) AS my, var_samp(y * 1.0) AS vy
      FROM assign GROUP BY arm
    )
    SELECT a.n AS n_a, b.n AS n_b,
           floor(a.my * 1000000.0 + 0.5) / 1000000.0 AS mean_control,
           floor(sqrt(((a.n - 1) * a.vy + (b.n - 1) * b.vy)
                      / (a.n + b.n - 2)) * 1000000.0 + 0.5) / 1000000.0
             AS sd_pooled,
           floor({_MDE_ZSUM} * sqrt(((a.n - 1) * a.vy + (b.n - 1) * b.vy)
                                    / (a.n + b.n - 2))
                 * sqrt(1.0 / a.n + 1.0 / b.n) * 1000000.0 + 0.5) / 1000000.0
             AS mde_abs,
           floor(({_MDE_ZSUM} * sqrt(((a.n - 1) * a.vy + (b.n - 1) * b.vy)
                                     / (a.n + b.n - 2))
                  * sqrt(1.0 / a.n + 1.0 / b.n) / a.my) * 1000000.0 + 0.5)
             / 1000000.0 AS mde_rel
    FROM (SELECT * FROM arms WHERE arm = 0) a
    CROSS JOIN (SELECT * FROM arms WHERE arm = 1) b
    """,
    doc="Power analysis for the running experiment: the minimum "
        "detectable effect (MDE) at alpha=0.05 two-sided / 80% power, "
        "MDE = (z_0.975 + z_0.80) * sd_pooled * sqrt(1/n_a + 1/n_b), "
        "with the z-sum pre-folded to the single literal 2.801585 (the "
        "cross-engine constant-folding rule) and sd_pooled the "
        "standard two-sample pooled estimate.  This is the readout "
        "that tells an experimenter whether a null result is POWERED "
        "(could have seen the lift they care about) or just "
        "underpowered — the required companion to any 'not "
        "significant'.  Assignment and metric match the Welch t-test "
        "query so the two reports describe the same experiment.  Scale "
        "shape: one user-grain partial agg, 2-row arm rollup, "
        "statistic on a broadcast pair.",
    tags=("events", "stats", "abtest"),
)
def events_abtest_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    assign = (
        e.groupBy("user_id")
        .agg(
            F.pmod(
                F.min(F.get_json_object("props", "$.k").cast("bigint")), F.lit(2)
            )
            .cast("int")
            .alias("arm"),
            F.sum((F.col("event_type") == "purchase").cast("bigint"))
            .cast("bigint")
            .alias("y"),
        )
        .filter(F.col("arm").isNotNull())
    )
    arms = assign.groupBy("arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.avg(F.col("y") * F.lit(1.0)).alias("my"),
        F.var_samp(F.col("y") * F.lit(1.0)).alias("vy"),
    )
    a = arms.filter(F.col("arm") == 0).select(
        F.col("n").alias("n_a"), F.col("my").alias("my_a"), F.col("vy").alias("vy_a")
    )
    b = arms.filter(F.col("arm") == 1).select(
        F.col("n").alias("n_b"), F.col("my").alias("my_b"), F.col("vy").alias("vy_b")
    )
    sd_pooled = F.sqrt(
        ((F.col("n_a") - 1) * F.col("vy_a") + (F.col("n_b") - 1) * F.col("vy_b"))
        / (F.col("n_a") + F.col("n_b") - 2)
    )
    mde = (
        F.lit(_MDE_ZSUM)
        * sd_pooled
        * F.sqrt(F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return a.crossJoin(F.broadcast(b)).select(
        "n_a",
        "n_b",
        pround(F.col("my_a"), 6).alias("mean_control"),
        pround(sd_pooled, 6).alias("sd_pooled"),
        pround(mde, 6).alias("mde_abs"),
        pround(mde / F.col("my_a"), 6).alias("mde_rel"),
    )


@register(
    "events_dow_value_ks_fdr",
    oracle="""
    WITH base AS (SELECT isodow(ts) AS g, value FROM events
                  WHERE value IS NOT NULL),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n_all FROM base),
    ngt AS (SELECT g, CAST(count(*) AS BIGINT) AS n_g FROM base GROUP BY g),
    vc AS (SELECT g, value, CAST(count(*) AS BIGINT) AS c
           FROM base GROUP BY g, value),
    marg AS (SELECT value, CAST(sum(c) AS BIGINT) AS cv FROM vc GROUP BY value),
    margc AS (SELECT value,
                     CAST(sum(cv) OVER (ORDER BY value) AS BIGINT) AS cum_all
              FROM marg),
    grid AS (SELECT d.g, m.value, m.cum_all
             FROM (SELECT DISTINCT g FROM vc) d CROSS JOIN margc m),
    cg AS (SELECT grid.g, grid.value, grid.cum_all,
                  CAST(sum(COALESCE(vc.c, 0))
                       OVER (PARTITION BY grid.g ORDER BY grid.value)
                       AS BIGINT) AS cum_g
           FROM grid LEFT JOIN vc
             ON vc.g = grid.g AND vc.value = grid.value),
    dstat AS (SELECT cg.g, ngt.n_g, t.n_all,
                     CAST(max(abs(cum_g * (t.n_all - ngt.n_g)
                                  - (cum_all - cum_g) * ngt.n_g))
                          AS BIGINT) AS dnum
              FROM cg JOIN ngt ON ngt.g = cg.g CROSS JOIN tot t
              GROUP BY cg.g, ngt.n_g, t.n_all),
    pv AS (SELECT g, n_g,
                  dnum * 1.0 / ((n_g * 1.0) * ((n_all - n_g) * 1.0)) AS d,
                  least(1.0, 2.0 * exp(-2.0 * (dnum * 1.0) * (dnum * 1.0)
                                       / ((n_g * 1.0) * ((n_all - n_g) * 1.0)
                                          * (n_all * 1.0)))) AS p
           FROM dstat),
    rk AS (SELECT *, CAST(row_number() OVER (ORDER BY p, g) AS BIGINT) AS bh_rank,
                  CAST(count(*) OVER () AS BIGINT) AS m_tests
           FROM pv),
    ks AS (SELECT max(CASE WHEN p * m_tests * 20.0 <= bh_rank * 1.0
                      THEN bh_rank ELSE CAST(0 AS BIGINT) END) AS kstar
           FROM rk)
    SELECT CAST(g AS INTEGER) AS dow,
           n_g AS n_events,
           floor(d * 1000000.0 + 0.5) / 1000000.0 AS ks_d,
           floor(p * 1000000.0 + 0.5) / 1000000.0 AS p_value,
           bh_rank,
           bh_rank <= ks.kstar AS reject
    FROM rk CROSS JOIN ks
    """,
    doc="Day-of-week value-distribution drift screen with multiple-"
        "testing control: per ISO weekday, the two-sample KS statistic "
        "of that day's `value` distribution against all other days "
        "(exact-integer ECDF numerators: D = max|cum_g*n_rest - "
        "cum_rest*n_g| / (n_g*n_rest)), the asymptotic p-value "
        "2*exp(-2*m*D^2) (m = n_g*n_rest/n, the closed form that needs "
        "no erf), and Benjamini-Hochberg FDR at alpha=0.05 across the "
        "observed tests — reject p_(i) <= i*alpha/m, written as "
        "p*m*20 <= rank (m = the ACTUAL surviving group count, not a "
        "hardcoded 7: a filtered fixture with fewer weekdays must not "
        "over-correct) so the only constants are exact literals.  "
        "Running 7 (or 700) "
        "drift tests and flagging raw p<0.05 is how metric platforms "
        "generate false alarms; BH is the standard correction.  Scale "
        "shape: one (dow,value) partial agg, the pooled-ECDF "
        "cumulative over DISTINCT values (single ordered chain here — "
        "the kruskal precedent; swap in functions/scale."
        "global_running_sum past ~1e7 distinct values), a 7x-dense "
        "grid join, 7-row p table, bounded BH windows.  Exponent "
        "inputs are exact ints, so both engines exponentiate identical "
        "doubles.",
    tags=("events", "stats"),
)
def events_dow_value_ks_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # NULL values must be excluded explicitly: the engines order NULL
    # ECDF keys differently (Spark NULLS FIRST, DuckDB NULLS LAST) and
    # the grid equality join drops them from cum_g but not n_g —
    # parity on NULL-free fixtures would be data luck, not correctness
    base = e.filter(F.col("value").isNotNull()).select(
        (F.weekday("ts") + 1).cast("int").alias("g"), "value"
    )
    vc = base.groupBy("g", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    ).localCheckpoint(eager=False)
    ngt = vc.groupBy("g").agg(F.sum("c").cast("bigint").alias("n_g"))
    tot = vc.agg(F.sum("c").cast("bigint").alias("n_all"))
    wm = (
        Window.partitionBy(bounded_window_key("value"))
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    margc = (
        vc.groupBy("value")
        .agg(F.sum("c").cast("bigint").alias("cv"))
        .withColumn("cum_all", F.sum("cv").over(wm).cast("bigint"))
        .drop("cv")
    )
    dows = vc.select("g").distinct()
    grid = margc.crossJoin(F.broadcast(dows))
    wg = (
        Window.partitionBy("g")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cg = (
        grid.join(vc, ["g", "value"], "left")
        .withColumn("cum_g", F.sum(F.coalesce(F.col("c"), F.lit(0))).over(wg).cast("bigint"))
    )
    dstat = (
        cg.join(F.broadcast(ngt), "g")
        .crossJoin(F.broadcast(tot))
        .groupBy("g", "n_g", "n_all")
        .agg(
            F.max(
                F.abs(
                    F.col("cum_g") * (F.col("n_all") - F.col("n_g"))
                    - (F.col("cum_all") - F.col("cum_g")) * F.col("n_g")
                )
            )
            .cast("bigint")
            .alias("dnum")
        )
    )
    nd = F.col("dnum") * F.lit(1.0)
    ngd = F.col("n_g") * F.lit(1.0)
    nrd = (F.col("n_all") - F.col("n_g")) * F.lit(1.0)
    nad = F.col("n_all") * F.lit(1.0)
    pv = dstat.select(
        "g",
        "n_g",
        (nd / (ngd * nrd)).alias("d"),
        F.least(
            F.lit(1.0), F.lit(2.0) * F.exp(F.lit(-2.0) * nd * nd / (ngd * nrd * nad))
        ).alias("p"),
    )
    wr = Window.partitionBy(bounded_window_key("g")).orderBy("p", "g")
    wall = Window.partitionBy(bounded_window_key("g")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    rk = pv.withColumn("bh_rank", F.row_number().over(wr).cast("bigint"))
    # m = the observed test count (7 on the full fixture), NOT a literal:
    # BH's threshold i*alpha/m over-corrects if fewer groups survive the
    # NOT NULL filter than the hardcoded family size
    rk = rk.withColumn("m_tests", F.count(F.lit(1)).over(wall).cast("bigint"))
    rk = rk.withColumn(
        "kstar",
        F.max(
            F.when(
                F.col("p") * F.col("m_tests") * F.lit(20.0)
                <= F.col("bh_rank") * F.lit(1.0),
                F.col("bh_rank"),
            ).otherwise(F.lit(0).cast("bigint"))
        ).over(wall),
    )
    return rk.select(
        F.col("g").cast("int").alias("dow"),
        F.col("n_g").alias("n_events"),
        pround(F.col("d"), 6).alias("ks_d"),
        pround(F.col("p"), 6).alias("p_value"),
        "bh_rank",
        (F.col("bh_rank") <= F.col("kstar")).alias("reject"),
    )


# mixture variance for the mSPRT: the prior scale of the effect we
# care to detect (~$5 on per-user spend), one literal so both engines
# fold identically
_MSPRT_TAU2 = 25.0
_MSPRT_ALPHA_INV = 20.0  # 1 / alpha, alpha = 0.05
_EPOCH_DAY_2024_01_01 = 19723
_MSPRT_DAYS = 30  # the events fixture spans 2024-01-01 .. 01-30


@register(
    "events_abtest_msprt_scan",
    oracle=f"""
    WITH users AS (
      SELECT * FROM (
        SELECT user_id,
               CAST(((min(CAST(json_extract(props, '$.k') AS BIGINT)) % 2)
                     + 2) % 2 AS INTEGER) AS arm
        FROM events GROUP BY user_id
      ) WHERE arm IS NOT NULL
    ), p AS (
      SELECT user_id,
             CAST(((epoch_ns(ts) // 1000) // 86400000000)
                  - {_EPOCH_DAY_2024_01_01} AS INTEGER) AS day,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events
      WHERE event_type = 'purchase' AND value IS NOT NULL
      GROUP BY user_id, day
    ), grid AS (
      SELECT u.user_id, u.arm, d.day
      FROM users u CROSS JOIN
           (SELECT CAST(unnest(generate_series(0, {_MSPRT_DAYS - 1}))
                   AS INTEGER) AS day) d
    ), cum AS (
      SELECT g.user_id, g.arm, g.day,
             CAST(sum(COALESCE(p.cents, 0))
                  OVER (PARTITION BY g.user_id ORDER BY g.day
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccents
      FROM grid g LEFT JOIN p ON p.user_id = g.user_id AND p.day = g.day
    ), stats AS (
      SELECT day, arm, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(ccents) AS BIGINT) AS s,
             CAST(sum(ccents * ccents) AS BIGINT) AS ss
      FROM cum GROUP BY day, arm
    ), wide AS (
      SELECT a.day, a.n AS n_a, b.n AS n_b,
             a.s * 1.0 / (a.n * 100.0) AS m_a,
             b.s * 1.0 / (b.n * 100.0) AS m_b,
             ((a.ss * 1.0 / 10000.0
               - a.n * (a.s * 1.0 / (a.n * 100.0))
                     * (a.s * 1.0 / (a.n * 100.0))) / (a.n - 1)) / a.n
             + ((b.ss * 1.0 / 10000.0
                 - b.n * (b.s * 1.0 / (b.n * 100.0))
                       * (b.s * 1.0 / (b.n * 100.0))) / (b.n - 1)) / b.n AS v
      FROM (SELECT * FROM stats WHERE arm = 0) a
      JOIN (SELECT * FROM stats WHERE arm = 1) b USING (day)
    ), lam AS (
      SELECT day, n_a, n_b,
             floor((m_a - m_b) * 1000000.0 + 0.5) / 1000000.0 AS delta,
             sqrt(v / (v + {_MSPRT_TAU2}))
               * exp((m_a - m_b) * (m_a - m_b) * {_MSPRT_TAU2}
                     / (2.0 * v * (v + {_MSPRT_TAU2}))) AS lambda_raw
      FROM wide WHERE v > 0.0
    )
    SELECT day, n_a, n_b, delta,
           floor(lambda_raw * 1000000.0 + 0.5) / 1000000.0 AS mixture_lr,
           lambda_raw >= {_MSPRT_ALPHA_INV} AS reject_h0
    FROM lam
    """,
    doc="Always-valid sequential monitoring (mSPRT, the "
        "Johari/Koomen/Pekelis 'peeking problem' fix experimentation "
        "platforms ship), on the SAME randomization unit as the rest "
        "of the tier: users are assigned once by the SRM gate's "
        "pmod(min k) parity, and the monitored metric is each user's "
        "CUMULATIVE purchase spend to date — so per day the mixture "
        "likelihood ratio Lambda = sqrt(V/(V+tau^2)) * exp(delta^2 "
        "tau^2 / (2V(V+tau^2))) compares user-level means with "
        "V = s_a^2/n_a + s_b^2/n_b across users (a per-event unit "
        "would split one user's purchases across arms and monitor a "
        "non-randomized quantity — the review finding this rewrite "
        "closes).  Rejecting when Lambda >= 1/alpha is valid at EVERY "
        "look; tau is the ~$5 effect scale of interest.  Cents-exact "
        "cumulative moments: the user x day grid is dense (absent "
        "days coalesce to 0 spend), sums are int64, both engines "
        "exponentiate identical doubles.  Scale shape: one user-grain "
        "assignment agg, one (user, day) purchase agg, a "
        f"{_MSPRT_DAYS}x map-side day explode of the user table, "
        "per-user cumulative windows (30 rows each, user-partitioned), "
        "a 60-cell (day, arm) rollup, 30-row output.",
    tags=("events", "stats", "abtest"),
)
def events_abtest_msprt_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    users = (
        e.groupBy("user_id")
        .agg(
            F.pmod(
                F.min(F.get_json_object("props", "$.k").cast("bigint")), F.lit(2)
            )
            .cast("int")
            .alias("arm")
        )
        .filter(F.col("arm").isNotNull())
    )
    p = (
        e.filter((F.col("event_type") == "purchase") & F.col("value").isNotNull())
        .groupBy(
            "user_id",
            (
                (F.col("ts_us") / F.lit(86_400_000_000)).cast("bigint")
                - F.lit(_EPOCH_DAY_2024_01_01)
            )
            .cast("int")
            .alias("day"),
        )
        .agg(
            F.sum(F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint"))
            .cast("bigint")
            .alias("cents")
        )
    )
    grid = users.select(
        "user_id",
        "arm",
        F.explode(F.sequence(F.lit(0), F.lit(_MSPRT_DAYS - 1))).alias("day"),
    ).select("user_id", "arm", F.col("day").cast("int").alias("day"))
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.join(p, ["user_id", "day"], "left")
        .withColumn(
            "ccents",
            F.sum(F.coalesce(F.col("cents"), F.lit(0))).over(w).cast("bigint"),
        )
    )
    stats = cum.groupBy("day", "arm").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ccents").cast("bigint").alias("s"),
        # ss sums squared cumulative cents (~1e12/term holds ~1e6
        # users/arm).  The guard input is max|ccents| — NOT
        # max(ccents^2), whose per-row int64 square could itself wrap
        # before the max is taken — squared later in DOUBLE where it
        # cannot (the q9 max(abs(raw term)) pattern)
        F.sum(F.col("ccents") * F.col("ccents")).cast("bigint").alias("ss"),
        F.max(F.abs(F.col("ccents"))).cast("bigint").alias("mc"),
    )
    a = stats.filter(F.col("arm") == 0).select(
        "day", F.col("n").alias("n_a"), F.col("s").alias("s_a"),
        F.col("ss").alias("ss_a"), F.col("mc").alias("mc_a"),
    )
    b = stats.filter(F.col("arm") == 1).select(
        "day", F.col("n").alias("n_b"), F.col("s").alias("s_b"),
        F.col("ss").alias("ss_b"), F.col("mc").alias("mc_b"),
    )
    m_a = F.col("s_a") * F.lit(1.0) / (F.col("n_a") * F.lit(100.0))
    m_b = F.col("s_b") * F.lit(1.0) / (F.col("n_b") * F.lit(100.0))
    v = (
        (F.col("ss_a") * F.lit(1.0) / F.lit(10000.0) - F.col("n_a") * m_a * m_a)
        / (F.col("n_a") - 1)
    ) / F.col("n_a") + (
        (F.col("ss_b") * F.lit(1.0) / F.lit(10000.0) - F.col("n_b") * m_b * m_b)
        / (F.col("n_b") - 1)
    ) / F.col("n_b")
    delta = m_a - m_b
    lam = F.sqrt(v / (v + F.lit(_MSPRT_TAU2))) * F.exp(
        delta * delta * F.lit(_MSPRT_TAU2) / (F.lit(2.0) * v * (v + F.lit(_MSPRT_TAU2)))
    )
    # the guards live in the FILTER condition, not a projected column:
    # an overflowed ss makes v negative, and a guard placed after
    # `.filter(v > 0)` would never evaluate for the silently-dropped
    # row (the q11 share-filter rule, analytics.py q11 comment).
    # max|ccents| squares in DOUBLE inside the guard input, so the
    # bound itself cannot wrap.
    keep = v > F.lit(0.0)
    keep = int64_headroom_guard(
        keep,
        (F.col("mc_a") * F.lit(1.0)) * (F.col("mc_a") * F.lit(1.0)),
        F.col("n_a"),
        "events_abtest_msprt_scan arm-a ccents^2 sum",
    )
    keep = int64_headroom_guard(
        keep,
        (F.col("mc_b") * F.lit(1.0)) * (F.col("mc_b") * F.lit(1.0)),
        F.col("n_b"),
        "events_abtest_msprt_scan arm-b ccents^2 sum",
    )
    return (
        a.join(b, "day")
        .filter(keep)
        .select(
            "day",
            "n_a",
            "n_b",
            pround(delta, 6).alias("delta"),
            pround(lam, 6).alias("mixture_lr"),
            (lam >= F.lit(_MSPRT_ALPHA_INV)).alias("reject_h0"),
        )
    )


# --- round 14: difference-in-differences (the causal-inference gap in
# the abtest family — SRM/CUPED/power/mSPRT all assume RANDOMIZED
# assignment; DiD is the estimator for OBSERVATIONAL rollouts, where a
# cohort is exposed at a known time and the untreated cohort supplies
# the counterfactual trend) ------------------------------------------------

_DID_SPLIT_US = _CUPED_SPLIT_US  # same fixture-time split as CUPED


@register(
    "events_did_estimator",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(CASE WHEN user_id % 5 = 0 THEN 1 ELSE 0 END AS INTEGER)
               AS treated,
             CAST(sum(CASE WHEN epoch_ns(ts) // 1000 >= {_DID_SPLIT_US}
                           THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS post_cents,
             CAST(sum(CASE WHEN epoch_ns(ts) // 1000 < {_DID_SPLIT_US}
                           THEN CAST(floor(value * 100.0 + 0.5) AS BIGINT)
                           ELSE 0 END) AS BIGINT) AS pre_cents
      FROM events WHERE value IS NOT NULL
      GROUP BY user_id
    ), groups AS (
      SELECT treated,
             CAST(count(*) AS BIGINT) AS n_users,
             avg((post_cents - pre_cents) * 1.0) AS mean_delta,
             var_samp((post_cents - pre_cents) * 1.0) AS var_delta,
             avg(pre_cents * 1.0) AS mean_pre,
             avg(post_cents * 1.0) AS mean_post
      FROM per_user GROUP BY treated
    )
    SELECT t.n_users AS n_treated, c.n_users AS n_control,
           floor(t.mean_pre * 1000000.0 + 0.5) / 1000000.0  AS treated_pre,
           floor(t.mean_post * 1000000.0 + 0.5) / 1000000.0 AS treated_post,
           floor(c.mean_pre * 1000000.0 + 0.5) / 1000000.0  AS control_pre,
           floor(c.mean_post * 1000000.0 + 0.5) / 1000000.0 AS control_post,
           floor((t.mean_delta - c.mean_delta) * 1000000.0 + 0.5)
             / 1000000.0 AS did_cents,
           floor(((t.mean_delta - c.mean_delta)
                  / sqrt(t.var_delta / t.n_users + c.var_delta / c.n_users))
                 * 1000000.0 + 0.5) / 1000000.0 AS tstat
    FROM (SELECT * FROM groups WHERE treated = 1) t
    CROSS JOIN (SELECT * FROM groups WHERE treated = 0) c
    """,
    doc="Difference-in-differences — the causal estimator for "
        "OBSERVATIONAL rollouts the randomized-abtest family (SRM, "
        "CUPED, power, mSPRT) cannot serve: a cohort (user_id%5 here; "
        "a staged-rollout flag in production) is exposed at a known "
        "time, the untreated cohort supplies the counterfactual trend, "
        "and DiD = (treated_post − treated_pre) − (control_post − "
        "control_pre) nets out both the stable cohort difference and "
        "the common time shock (parallel-trends assumption).  "
        "Implemented as a two-sample Welch test on PER-USER pre→post "
        "spend deltas — the user-clustered form, immune to the serial-"
        "correlation trap of pooling event-grain observations "
        "(Bertrand-Duflo-Mullainathan 2004); the same split instant as "
        "CUPED.  Per-user deltas are exact integer cents, so variance "
        "and t derive identically in both engines (the abtest "
        "precedent).  Scale shape: ONE user-grain partial agg over the "
        "events scan, a 2-row group rollup, statistic on 2 broadcast "
        "rows.",
    tags=("events", "stats", "abtest", "causal"),
)
def events_did_estimator(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    cents = F.floor(F.col("value") * 100.0 + F.lit(0.5)).cast("bigint")
    per_user = e.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("ts_us") >= _DID_SPLIT_US, cents).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("post_cents"),
        F.sum(
            F.when(F.col("ts_us") < _DID_SPLIT_US, cents).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("pre_cents"),
    ).withColumn(
        "treated",
        F.when(F.col("user_id") % 5 == 0, F.lit(1)).otherwise(F.lit(0)).cast("int"),
    )
    delta = (F.col("post_cents") - F.col("pre_cents")) * F.lit(1.0)
    groups = per_user.groupBy("treated").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.avg(delta).alias("mean_delta"),
        F.var_samp(delta).alias("var_delta"),
        F.avg(F.col("pre_cents") * F.lit(1.0)).alias("mean_pre"),
        F.avg(F.col("post_cents") * F.lit(1.0)).alias("mean_post"),
    )
    t = groups.filter(F.col("treated") == 1).alias("t")
    c = groups.filter(F.col("treated") == 0).alias("c")
    did = F.col("t.mean_delta") - F.col("c.mean_delta")
    se = F.sqrt(
        F.col("t.var_delta") / F.col("t.n_users")
        + F.col("c.var_delta") / F.col("c.n_users")
    )
    return t.crossJoin(F.broadcast(c)).select(
        F.col("t.n_users").alias("n_treated"),
        F.col("c.n_users").alias("n_control"),
        pround(F.col("t.mean_pre"), 6).alias("treated_pre"),
        pround(F.col("t.mean_post"), 6).alias("treated_post"),
        pround(F.col("c.mean_pre"), 6).alias("control_pre"),
        pround(F.col("c.mean_post"), 6).alias("control_post"),
        pround(did, 6).alias("did_cents"),
        pround(did / se, 6).alias("tstat"),
    )
