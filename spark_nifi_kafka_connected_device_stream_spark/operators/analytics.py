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
    "join_asof_device_state",
    oracle="""
    WITH state AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS s_us,
             max(value) AS state_value
      FROM events WHERE event_type IN ('signup', 'purchase')
      GROUP BY user_id, epoch_ns(ts) // 1000
    ), probes AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS p_us
      FROM events WHERE event_type = 'error'
    )
    SELECT p.user_id, p.event_id,
           coalesce(s.s_us, -1) AS state_ts_us,
           CAST(coalesce(floor(s.state_value * 100.0 + 0.5), -1.0) AS BIGINT)
             AS state_value_cents,
           coalesce(p.p_us - s.s_us, -1) AS staleness_us
    FROM probes p ASOF LEFT JOIN state s
      ON s.user_id = p.user_id AND s.s_us <= p.p_us
    """,
    doc="Temporal AS-OF enrichment join (VERDICT r14 item 5): every "
        "error event is enriched with the user/device's most recent "
        "STATE snapshot at-or-before it (state log = signup/purchase "
        "events carrying `value`) — point-in-time enrichment, the "
        "production join for joining a fact stream to a slowly-"
        "updating registry without a range self-join.  Unlike "
        "asof_join_last_click (which only returns the matched "
        "timestamp), this is a LEFT as-of that carries the state "
        "PAYLOAD through, with sentinel -1 for never-configured "
        "devices, and the oracle is DuckDB's native ASOF LEFT JOIN.  "
        "Engine plan: the state log is pre-aggregated per (user, ts) "
        "so as-of ties are deterministic, then union-tagged with the "
        "probes and resolved by ONE last-non-null window over "
        "(user, time) — a single shuffle on user_id, linear state, no "
        "quadratic range join (DuckDB's ASOF operator does the same "
        "binary-search internally; naive SQL would be quadratic).  At "
        "100 TB both sides partition on the same user key and the "
        "probe/state filters push to the scans.  Payload emitted as "
        "exact integer cents (float-portability doctrine); both "
        "nullable outputs coalesce to -1 (harness sorts row tuples — "
        "NULL ints break cross-engine ordering).  SENTINEL CONTRACT "
        "(ADVICE r15): state_ts_us = -1 / staleness_us = -1 are the "
        "AUTHORITATIVE no-match signals — real timestamps are never "
        "negative.  state_value_cents = -1 alone is ambiguous (a "
        "matched state value in (-0.015, -0.005] also rounds to -1 "
        "cents); consumers must gate on state_ts_us, not the cents "
        "column.",
    tags=("join", "asof"),
)
def join_asof_device_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    state = (
        e.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("state_value"))
        .select(
            "user_id",
            F.col("ts_us").alias("us"),
            F.col("ts_us").alias("s_us"),
            "state_value",
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(True).alias("is_state"),
        )
    )
    probes = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts_us").alias("us"),
        F.lit(None).cast("bigint").alias("s_us"),
        F.lit(None).cast("double").alias("state_value"),
        "event_id",
        F.lit(False).alias("is_state"),
    )
    # state sorts BEFORE a probe at the identical timestamp (is_state
    # desc) so the as-of bound is <=, matching the oracle; both carried
    # columns are non-null exactly on state rows, so the two
    # last-ignorenulls pick from the SAME state row.
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc("us"), F.desc("is_state"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    resolved = state.unionByName(probes).select(
        "user_id",
        "event_id",
        "us",
        "is_state",
        F.last("s_us", ignorenulls=True).over(w).alias("last_s_us"),
        F.last("state_value", ignorenulls=True).over(w).alias("last_state_value"),
    )
    return resolved.filter(~F.col("is_state")).select(
        "user_id",
        "event_id",
        F.coalesce(F.col("last_s_us"), F.lit(-1)).alias("state_ts_us"),
        F.coalesce(
            F.floor(F.col("last_state_value") * 100.0 + 0.5).cast("bigint"),
            F.lit(-1),
        ).alias("state_value_cents"),
        F.coalesce(F.col("us") - F.col("last_s_us"), F.lit(-1)).alias("staleness_us"),
    )


@register(
    "join_asof_nearest_state",
    oracle="""
    WITH state AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS s_us,
             max(value) AS state_value
      FROM events WHERE event_type IN ('signup', 'purchase')
      GROUP BY user_id, epoch_ns(ts) // 1000
    ), probes AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS p_us
      FROM events WHERE event_type = 'error'
    ), back AS (
      SELECT p.user_id, p.event_id, p.p_us, s.s_us AS b_us
      FROM probes p ASOF LEFT JOIN state s
        ON s.user_id = p.user_id AND s.s_us <= p.p_us
    ), fwd AS (
      SELECT p.user_id, p.event_id, s.s_us AS f_us
      FROM probes p ASOF LEFT JOIN state s
        ON s.user_id = p.user_id AND s.s_us > p.p_us
    )
    SELECT b.user_id, b.event_id,
           CASE WHEN b.b_us IS NULL AND f.f_us IS NULL THEN 'none'
                WHEN f.f_us IS NULL THEN 'backward'
                WHEN b.b_us IS NULL THEN 'forward'
                WHEN b.p_us - b.b_us <= f.f_us - b.p_us THEN 'backward'
                ELSE 'forward' END AS direction,
           coalesce(CASE WHEN b.b_us IS NULL AND f.f_us IS NULL THEN NULL
                WHEN f.f_us IS NULL THEN b.b_us
                WHEN b.b_us IS NULL THEN f.f_us
                WHEN b.p_us - b.b_us <= f.f_us - b.p_us THEN b.b_us
                ELSE f.f_us END, -1) AS state_ts_us,
           coalesce(CASE WHEN b.b_us IS NULL AND f.f_us IS NULL THEN NULL
                WHEN f.f_us IS NULL THEN b.p_us - b.b_us
                WHEN b.b_us IS NULL THEN f.f_us - b.p_us
                WHEN b.p_us - b.b_us <= f.f_us - b.p_us THEN b.p_us - b.b_us
                ELSE f.f_us - b.p_us END, -1) AS gap_us
    FROM back b JOIN fwd f
      ON f.user_id = b.user_id AND f.event_id = b.event_id
    """,
    doc="Bidirectional nearest as-of join: every error event matched "
        "to the temporally NEAREST state snapshot in either direction "
        "(ties break backward, matching join_asof_device_state's <= "
        "bound) — the variant for enrichment against a registry whose "
        "snapshots may post-date the event (late-arriving reference "
        "data, sensor calibration records).  Completes the as-of "
        "family: backward payload-carrying (join_asof_device_state), "
        "backward within one log (asof_join_last_click), nearest "
        "(this).  Engine plan: both directions resolve from the SAME "
        "union + single (user, time) sort — backward via "
        "last-non-null over the preceding frame, forward via "
        "first-non-null over the following frame; one shuffle total, "
        "where the oracle needs two ASOF joins.  A state at the "
        "probe's exact timestamp sorts before it (is_state desc) so "
        "it lands in the backward frame and not the forward one — "
        "exactly the oracle's <= / > split.  Nullable outputs "
        "coalesce to sentinel -1/'none' (harness sorts row tuples).",
    tags=("join", "asof"),
)
def join_asof_nearest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    state = (
        e.filter(F.col("event_type").isin("signup", "purchase"))
        .groupBy("user_id", "ts_us")
        .agg(F.max("value").alias("state_value"))
        .select(
            "user_id",
            F.col("ts_us").alias("us"),
            F.col("ts_us").alias("s_us"),
            F.lit(None).cast("bigint").alias("event_id"),
            F.lit(True).alias("is_state"),
        )
    )
    probes = e.filter(F.col("event_type") == "error").select(
        "user_id",
        F.col("ts_us").alias("us"),
        F.lit(None).cast("bigint").alias("s_us"),
        "event_id",
        F.lit(False).alias("is_state"),
    )
    order = [F.asc("us"), F.desc("is_state")]
    w_back = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    resolved = state.unionByName(probes).select(
        "user_id",
        "event_id",
        "us",
        "is_state",
        F.last("s_us", ignorenulls=True).over(w_back).alias("b_us"),
        F.first("s_us", ignorenulls=True).over(w_fwd).alias("f_us"),
    )
    b_gap = F.col("us") - F.col("b_us")
    f_gap = F.col("f_us") - F.col("us")
    back_wins = F.col("f_us").isNull() | (
        F.col("b_us").isNotNull() & (b_gap <= f_gap)
    )
    return resolved.filter(~F.col("is_state")).select(
        "user_id",
        "event_id",
        F.when(F.col("b_us").isNull() & F.col("f_us").isNull(), F.lit("none"))
        .when(back_wins, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
        F.coalesce(
            F.when(back_wins, F.col("b_us")).otherwise(F.col("f_us")), F.lit(-1)
        ).alias("state_ts_us"),
        F.coalesce(
            F.when(back_wins, b_gap).otherwise(f_gap), F.lit(-1)
        ).alias("gap_us"),
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
