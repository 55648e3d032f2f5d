"""Analytic window functions (ranking / running / offset frames).

The reference has none of these (capability gap flagged in SURVEY.md
§2.7); its only ranking is a whole-batch sort in foreachBatch
(`nifi_spark_kafka_product_view_platform_v2.py:10`), restated here as
proper partitioned window functions.

Scale notes: every window below is `partitionBy` a high-cardinality key
(custkey / orderstatus) — one shuffle on the partition key, then
in-partition sort; never a single-partition global window, which would
serialize 100 TB through one task.  Every ORDER BY inside a window ends
with a unique tie-break column so row_number/ntile are deterministic
across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..functions.scale import bounded_window_key
from ..registry import register
from ..sources.catalog import load_table


@register(
    "window_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      FROM orders
    ) WHERE rn <= 3
    """,
    doc="Top-3 orders per customer: the canonical distributed top-k-per-group "
        "(shuffle on the group key, per-partition sort; no global sort).",
    tags=("window", "topk"),
)
def window_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           floor((sum(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_total
    FROM orders
    """,
    doc="Running (cumulative) sum per customer — explicit ROWS frame.",
    tags=("window",),
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        pround(F.sum("o_totalprice").over(w), 2).alias("running_total"),
    )


@register(
    "window_lag_delta",
    oracle="""
    SELECT o_custkey, o_orderkey,
           floor((o_totalprice - lag(o_totalprice) OVER (
             PARTITION BY o_custkey
             ORDER BY o_orderdate ASC, o_orderkey ASC)) * 100.0 + 0.5) / 100.0 AS price_delta
    FROM orders
    """,
    doc="Offset function (lag) — order-over-order price delta per customer; "
        "first row per customer yields NULL.",
    tags=("window",),
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    return o.select(
        "o_custkey",
        "o_orderkey",
        pround(F.col("o_totalprice") - F.lag("o_totalprice").over(w), 2).alias("price_delta"),
    )


@register(
    "window_rank_dense_ntile",
    oracle="""
    SELECT o_orderkey, o_orderstatus,
           rank()       OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4)     OVER (PARTITION BY o_orderstatus
                              ORDER BY o_totalprice DESC, o_orderkey ASC) AS quartile,
           floor((percent_rank() OVER w) * 1000000.0 + 0.5) / 1000000.0 AS pct_rank
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
    """,
    doc="Ranking family: rank / dense_rank (ties on raw doubles are "
        "bit-identical across engines since no arithmetic is done), ntile "
        "with unique tie-break, percent_rank rounded.",
    tags=("window",),
)
def window_rank_dense_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"))
    wt = Window.partitionBy("o_orderstatus").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return o.select(
        "o_orderkey",
        "o_orderstatus",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(wt).alias("quartile"),
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@register(
    "window_moving_avg_range",
    oracle="""
    WITH daily AS (
      SELECT o_orderstatus,
             date_diff('day', TIMESTAMP '1970-01-01 00:00:00', o_orderdate) AS day_idx,
             floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS day_total
      FROM orders GROUP BY 1, 2
    )
    SELECT o_orderstatus, day_idx, day_total,
           floor((avg(day_total) OVER (PARTITION BY o_orderstatus
                                       ORDER BY day_idx
                                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)) * 10000.0 + 0.5) / 10000.0
             AS ma7
    FROM daily
    """,
    doc="7-day moving average via a RANGE window frame over a day index "
        "(value-based frame: gaps in the calendar shrink the window, "
        "unlike a ROWS frame). Runs over the daily AGGREGATE, partitioned "
        "by status — two narrow shuffles.",
    tags=("window", "timeseries"),
)
def window_moving_avg_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        "o_orderstatus",
        F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("day_idx"),
    ).agg(pround(F.sum("o_totalprice"), 2).alias("day_total"))
    w = Window.partitionBy("o_orderstatus").orderBy("day_idx").rangeBetween(-6, 0)
    return daily.select(
        "o_orderstatus",
        "day_idx",
        "day_total",
        pround(F.avg("day_total").over(w), 4).alias("ma7"),
    )


@register(
    "window_share_of_total",
    oracle="""
    WITH rev AS (
      SELECT c_nationkey AS nationkey, floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS nation_rev
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY c_nationkey
    )
    SELECT nationkey, nation_rev,
           floor((nation_rev / sum(nation_rev) OVER ()) * 1000000.0 + 0.5) / 1000000.0 AS rev_share
    FROM rev
    """,
    doc="Share-of-total: per-group aggregate divided by an unpartitioned "
        "window sum. The global window runs over the 25-row AGGREGATE, "
        "not the fact table — the only safe use of a single-partition "
        "window at scale.",
    tags=("window", "agg"),
)
def window_share_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    # NO broadcast hint on customer (r12 review fix): it is a full
    # dimension that scales with SF — the forced hint would collect it
    # to the driver and die at the 8 GB broadcast limit at exactly the
    # scale this module's docstring claims; AQE picks broadcast on its
    # own when the measured size permits
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(pround(F.sum("o_totalprice"), 2).alias("nation_rev"))
    )
    w = Window.partitionBy(bounded_window_key("nationkey"))
    return rev.select(
        "nationkey",
        "nation_rev",
        pround(F.col("nation_rev") / F.sum("nation_rev").over(w), 6).alias("rev_share"),
    )


@register(
    "lateral_top_order_per_customer",
    oracle="""
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c,
    LATERAL (
      SELECT o_orderkey, o_totalprice
      FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey ASC
      LIMIT 1
    ) t
    WHERE c.c_custkey <= 500
    """,
    doc="Correlated LATERAL subquery (top-1 order per customer) through "
        "the SQL entry point — Catalyst rewrites it to a window top-k "
        "rather than per-row re-execution.",
    tags=("join", "subquery", "sql-api"),
)
def lateral_top_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("_lat_customer")
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_lat_orders")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM _lat_customer c,
        LATERAL (
          SELECT o_orderkey, o_totalprice
          FROM _lat_orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey ASC
          LIMIT 1
        ) t
        WHERE c.c_custkey <= 500
        """
    )


@register(
    "window_first_last",
    oracle="""
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey)  OVER (PARTITION BY o_custkey
                                         ORDER BY o_orderdate ASC, o_orderkey ASC
                                         ROWS BETWEEN UNBOUNDED PRECEDING
                                                  AND UNBOUNDED FOLLOWING) AS last_order,
           count(*) OVER (PARTITION BY o_custkey) AS n_orders
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
    doc="first_value/last_value with explicit full frame (the last_value "
        "default-frame trap handled identically in both engines) + window "
        "count; DISTINCT collapses to one row per customer.",
    tags=("window",),
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    wo = Window.partitionBy("o_custkey").orderBy(F.asc("o_orderdate"), F.asc("o_orderkey"))
    wfull = wo.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    wp = Window.partitionBy("o_custkey")
    return o.select(
        "o_custkey",
        F.first("o_orderkey").over(wo).alias("first_order"),
        F.last("o_orderkey").over(wfull).alias("last_order"),
        F.count("*").over(wp).alias("n_orders"),
    ).distinct()


@register(
    "window_percent_rank_cume_dist",
    oracle="""
    WITH rev AS (
      SELECT n.n_regionkey AS regionkey, c.c_nationkey AS nationkey,
             sum(CAST(floor(o.o_totalprice * 100.0 + 0.5) AS BIGINT)) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY regionkey, nationkey
    )
    SELECT regionkey, nationkey,
           floor(cents / 100.0 * 100.0 + 0.5) / 100.0 AS revenue,
           floor(percent_rank() OVER w * 1000000.0 + 0.5) / 1000000.0 AS pct_rank,
           floor(cume_dist() OVER w * 1000000.0 + 0.5) / 1000000.0    AS cume,
           CAST(ntile(2) OVER w AS INTEGER) AS half
    FROM rev
    WINDOW w AS (PARTITION BY regionkey ORDER BY cents ASC, nationkey ASC)
    """,
    doc="The remaining ranking-window family members — percent_rank "
        "(rank−1)/(n−1), cume_dist ≤-count/n, and ntile bucketing — "
        "exercised together over nation revenue within region "
        "(completes the rank/dense_rank/row_number coverage of "
        "window_rank_dense_ntile).  Revenue accumulates in exact "
        "integer cents; the window partitions over the bounded "
        "25-nation frame with a full deterministic sort key, so the "
        "rational-valued rank statistics are bit-identical across "
        "engines.  Scale: one fact-dim shuffle; WindowExec on ≤25 "
        "rows.",
    tags=("window",),
)
def window_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    cents = F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_regionkey").alias("regionkey"),
            F.col("c_nationkey").alias("nationkey"),
        )
        .agg(F.sum(cents).alias("cents"))
    )
    w = Window.partitionBy("regionkey").orderBy(F.asc("cents"), F.asc("nationkey"))
    return rev.select(
        "regionkey",
        "nationkey",
        pround(F.col("cents") / F.lit(100.0), 2).alias("revenue"),
        pround(F.percent_rank().over(w), 6).alias("pct_rank"),
        pround(F.cume_dist().over(w), 6).alias("cume"),
        F.ntile(2).over(w).cast("int").alias("half"),
    )


# --- round 13 additions: the RANGE-BETWEEN interval-frame family -----------
#
# A RANGE frame whose bounds are CALENDAR INTERVALS over a real DATE
# order key — the time-series frame shape the registry lacked as a
# named family (VERDICT r12 item 2).  The DataFrame API's rangeBetween
# only takes numeric long offsets, so these go through the SQL entry
# point (the reference drives config through spark.sql too, v1:37),
# which is exactly where Catalyst's SpecifiedWindowFrame with
# CalendarIntervalType bounds lives.  All money in exact integer cents.


@register(
    "window_range_interval_trailing_30d",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
             AS BIGINT) AS spend_30d_cents,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
             AS BIGINT) AS n_orders_30d
    FROM orders
    """,
    doc="Trailing-30-day customer spend via RANGE BETWEEN INTERVAL 30 "
        "DAYS PRECEDING AND CURRENT ROW over the real order DATE — the "
        "value-based interval frame: calendar gaps shrink the window "
        "(a ROWS frame would not), and same-day orders are peers, so "
        "every peer row reports the full same-day total identically in "
        "both engines.  Scale shape: one shuffle on o_custkey, "
        "in-partition sort by date; the frame is evaluated by a "
        "sliding two-pointer pass per partition, never a self-join — "
        "the 100 TB encoding of 'spend in the last 30 days' (the "
        "self-join form multiplies candidates by the average count "
        "per window).  Streaming twin (r14, VERDICT r13 item 6): a "
        "stream cannot emit per-ROW trailing frames over unbounded "
        "history — the streaming restatement samples the trailing "
        "interval at slide boundaries (watermark-bounded F.window "
        "slide per key), value-checked by stream-batch equivalence in "
        "tests/test_streaming.py::"
        "test_trailing_interval_stream_batch_equivalence.",
    tags=("window", "timeseries", "sql-api"),
)
def window_range_interval_trailing_30d(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rng_orders_trailing_30d")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS spend_30d_cents,
               CAST(count(*) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 RANGE BETWEEN INTERVAL 30 DAYS PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS n_orders_30d
        FROM _rng_orders_trailing_30d
        """
    )


@register(
    "window_range_interval_centered_week",
    oracle="""
    WITH daily AS (
      SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS d,
             sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS day_cents
      FROM orders GROUP BY o_orderstatus, d
    )
    SELECT o_orderstatus, strftime(d, '%Y-%m-%d') AS day,
           CAST(day_cents AS BIGINT) AS day_cents,
           CAST(sum(day_cents) OVER (
             PARTITION BY o_orderstatus ORDER BY d
             RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                       AND INTERVAL 3 DAY FOLLOWING) AS BIGINT) AS week_cents,
           CAST(count(*) OVER (
             PARTITION BY o_orderstatus ORDER BY d
             RANGE BETWEEN INTERVAL 3 DAY PRECEDING
                       AND INTERVAL 3 DAY FOLLOWING) AS BIGINT) AS n_days_in_week
    FROM daily
    """,
    doc="Centered calendar week (both interval bounds: 3 days PRECEDING "
        "to 3 days FOLLOWING) over the per-status daily aggregate — the "
        "two-sided interval frame, the smoothing shape used for "
        "centered moving averages.  n_days_in_week < 7 exactly where "
        "the calendar has gaps, pinning value-frame (not row-frame) "
        "semantics.  Runs over the daily AGGREGATE (two narrow "
        "shuffles), never the fact table.",
    tags=("window", "timeseries", "sql-api"),
)
def window_range_interval_centered_week(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rng_orders_centered_week")
    return spark.sql(
        """
        WITH daily AS (
          SELECT o_orderstatus, CAST(o_orderdate AS DATE) AS d,
                 sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) AS day_cents
          FROM _rng_orders_centered_week GROUP BY o_orderstatus, d
        )
        SELECT o_orderstatus, date_format(d, 'yyyy-MM-dd') AS day,
               CAST(day_cents AS BIGINT) AS day_cents,
               CAST(sum(day_cents) OVER (
                 PARTITION BY o_orderstatus ORDER BY d
                 RANGE BETWEEN INTERVAL 3 DAYS PRECEDING
                           AND INTERVAL 3 DAYS FOLLOWING) AS BIGINT) AS week_cents,
               CAST(count(*) OVER (
                 PARTITION BY o_orderstatus ORDER BY d
                 RANGE BETWEEN INTERVAL 3 DAYS PRECEDING
                           AND INTERVAL 3 DAYS FOLLOWING) AS BIGINT) AS n_days_in_week
        FROM daily
        """
    )


@register(
    "window_range_peers_running_sum",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS run_range_cents,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey
             ORDER BY CAST(o_orderdate AS DATE), o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS run_rows_cents
    FROM orders
    """,
    doc="RANGE vs ROWS running-sum contrast on one plan: the RANGE "
        "frame (the SQL-standard DEFAULT when only ORDER BY is given) "
        "includes ALL peers of the current date, so same-day orders "
        "agree on the running total, while the ROWS frame with the "
        "unique (date, orderkey) tie-break counts them one at a time — "
        "run_range_cents >= run_rows_cents, equal exactly on the last "
        "peer.  Pins the peers semantics the interval family above "
        "builds on; both frames share ONE shuffle on o_custkey "
        "(verified: executedPlan has exactly one Exchange; Spark plans "
        "a second in-partition sort for the longer ROWS key — a "
        "nearly-sorted pass over already-clustered data).",
    tags=("window", "sql-api"),
)
def window_range_peers_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rng_orders_peers_rsum")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS run_range_cents,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS run_rows_cents
        FROM _rng_orders_peers_rsum
        """
    )


@register(
    "window_range_interval_leakage_safe",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                       AND INTERVAL 1 DAY PRECEDING)
             AS BIGINT) AS prior_week_cents,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
             RANGE BETWEEN INTERVAL 7 DAY PRECEDING
                       AND INTERVAL 1 DAY PRECEDING)
             AS BIGINT) AS prior_week_orders
    FROM orders
    """,
    doc="LEAKAGE-SAFE trailing feature window: RANGE BETWEEN INTERVAL 7 "
        "DAYS PRECEDING AND INTERVAL 1 DAY PRECEDING — the frame ends "
        "STRICTLY BEFORE the current day, so same-day peers (including "
        "the row itself) are excluded.  This is the feature-engineering "
        "contract for ML training data: a 'spend in the prior week' "
        "feature computed WITH the current day leaks the label's own "
        "day into the feature (the trailing-30d query above includes "
        "peers by design; this one pins the exclusive variant).  A row "
        "with no prior-week orders gets NULL sum / 0 count — the "
        "empty-frame semantics both engines share.  Same scale shape "
        "as the other interval frames: one shuffle on the customer "
        "key, one sort, a two-pointer frame pass.",
    tags=("window", "timeseries", "sql-api", "ml-features"),
)
def window_range_interval_leakage_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_rng_orders_leakage_safe")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                           AND INTERVAL 1 DAYS PRECEDING)
                 AS BIGINT) AS prior_week_cents,
               CAST(count(*) OVER (
                 PARTITION BY o_custkey ORDER BY CAST(o_orderdate AS DATE)
                 RANGE BETWEEN INTERVAL 7 DAYS PRECEDING
                           AND INTERVAL 1 DAYS PRECEDING)
                 AS BIGINT) AS prior_week_orders
        FROM _rng_orders_leakage_safe
        """
    )


@register(
    "window_groups_frames",
    oracle="""
    WITH r AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
             dense_rank() OVER (PARTITION BY o_custkey
                                ORDER BY CAST(o_orderdate AS DATE)) AS dr
      FROM orders
    )
    SELECT o_custkey, o_orderkey,
           CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY dr
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)   AS trail2g_cents,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY dr
             RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)   AS trail2g_orders,
           CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY dr
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)   AS cent3g_cents,
           CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY dr
             RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)   AS cent3g_orders
    FROM r
    """,
    doc="GROUPS-mode window frames — completing the ROWS/RANGE/GROUPS "
        "frame family (VERDICT r13 item 4).  GROUPS BETWEEN 1 PRECEDING "
        "AND CURRENT ROW = the current peer group (same order date) plus "
        "the previous DISTINCT date's orders, however far back the "
        "calendar gap reaches — the frame neither counts physical rows "
        "(ROWS) nor calendar time (RANGE INTERVAL), but peer GROUPS; the "
        "centered 1-PRECEDING..1-FOLLOWING twin is emitted from the same "
        "sort.  Neither Spark nor DuckDB implements GROUPS mode natively "
        "(both parsers reject it — probed on Spark 4.1.2 / DuckDB 1.x), "
        "so BOTH sides express it through the same spec: dense_rank() "
        "over the ORDER BY key, then RANGE with integer offsets over the "
        "rank — exact because dense_rank is consecutive, so a rank "
        "distance of 1 is precisely one peer group.  Every peer row "
        "reports the identical frame value (peers all carry the same "
        "dense_rank), pinning GROUPS peer semantics.  Frames always "
        "include the current group, so no output column is ever NULL.  "
        "Scale shape: ONE shuffle on o_custkey; the rank pass and both "
        "frame passes share the same (o_custkey, date) sort order — the "
        "rank is monotone in the sort key, so the second sort Spark "
        "plans is a no-op pass over already-clustered runs.  Fixed-point "
        "cents (exact BIGINT), no float drift.",
    tags=("window", "sql-api"),
)
def window_groups_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_grp_orders_frames")
    return spark.sql(
        """
        WITH r AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
                 CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents,
                 dense_rank() OVER (PARTITION BY o_custkey
                                    ORDER BY CAST(o_orderdate AS DATE)) AS dr
          FROM _grp_orders_frames
        )
        SELECT o_custkey, o_orderkey,
               CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)   AS trail2g_cents,
               CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND CURRENT ROW) AS BIGINT)   AS trail2g_orders,
               CAST(sum(cents) OVER (PARTITION BY o_custkey ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)   AS cent3g_cents,
               CAST(count(*) OVER (PARTITION BY o_custkey ORDER BY dr
                 RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING) AS BIGINT)   AS cent3g_orders
        FROM r
        """
    )
