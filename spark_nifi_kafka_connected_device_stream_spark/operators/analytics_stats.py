"""Statistical inference and data-quality screens — the stats tier
split out of `operators/analytics.py` in round 14 (the events-module
treatment of VERDICT r13 item 5 applied to the next-largest file;
pure move, no semantic change).

Moments, exact/approx percentiles, per-group correlation and OLS,
Benford and Simpson screens, Kruskal-Wallis / Mann-Whitney /
Spearman / KS-FDR nonparametrics, p-chart control limits.  Every
statistic is assembled from exact-integer co-moments (the abtest
precedent) so both engines derive identical doubles; shared helpers
(`_cents`) are imported from `operators/analytics.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..functions.scale import bounded_window_key
from ..registry import register
from ..sources.catalog import load_table


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
