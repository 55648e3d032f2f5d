"""Cohort / segmentation analytics: weekly retention matrix, RFM
customer segmentation, top-k n-grams.  The product-analytics layer on
top of the event spine (operators/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..functions.scale import bounded_window_key, plan_parallelism
from ..registry import register
from ..sources.catalog import load_table


@register(
    "events_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(epoch_ns(ts) // 1000) AS first_us FROM events GROUP BY user_id
    ), activity AS (
      SELECT e.user_id,
             (epoch_ns(e.ts) // 1000 - f.first_us) // 604800000000 AS week_offset,
             f.first_us // 604800000000 AS cohort_week
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           count(DISTINCT user_id) AS active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
    doc="Weekly retention cohorts: users bucketed by first-seen week, "
        "activity counted per week offset since first touch. Two hash "
        "aggs + one equi-join on user_id; week arithmetic on exact "
        "integer micros (engine-portable).",
    tags=("events", "cohort"),
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    week_us = 604_800_000_000
    e = load_table(spark, sf_dir, "events").select("user_id", F.col("ts_us").alias("us"))
    firsts = e.groupBy("user_id").agg(F.min("us").alias("first_us"))
    return (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            ((F.col("us") - F.col("first_us")) / week_us).cast("bigint").alias("week_offset"),
            (F.col("first_us") / week_us).cast("bigint").alias("cohort_week"),
        )
        .groupBy("cohort_week", "week_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@register(
    "text_top_bigrams",
    oracle="""
    WITH toks AS (
      SELECT doc_id,
             list_filter(string_split(trim(regexp_replace(lower(text), ' +', ' ', 'g')), ' '),
                         t -> t <> '') AS tk
      FROM documents
    ), bigrams AS (
      SELECT unnest(list_transform(generate_series(1, greatest(len(tk) - 1, 0)),
                                   i -> concat(tk[i], ' ', tk[i + 1]))) AS bigram
      FROM toks
    )
    SELECT bigram, count(*) AS n
    FROM bigrams
    GROUP BY bigram
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """,
    doc="Corpus-level top-20 bigrams: ordered 2-gram explode + count + "
        "bounded top-k. The vocabulary-profiling pass of a text pipeline; "
        "map-side partial counts keep the shuffle narrow.",
    tags=("text",),
)
def text_top_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.textfns import normalize_text, shingles, tokens

    d = load_table(spark, sf_dir, "documents")
    d = d.repartition(plan_parallelism(spark), "doc_id")
    toks = d.select(tokens(normalize_text(F.col("text"))).alias("tk"))
    bigrams = toks.select(F.explode(shingles(F.col("tk"), n=2)).alias("bigram"))
    return (
        bigrams.groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("bigram"))
        .limit(20)
    )


@register(
    "customer_rfm_segments",
    oracle="""
    WITH rfm AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order,
             count(*) AS frequency,
             floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT custkey, frequency, monetary,
           ntile(4) OVER (ORDER BY last_order DESC, custkey ASC) AS r_quartile,
           ntile(4) OVER (ORDER BY frequency DESC, custkey ASC)     AS f_quartile,
           ntile(4) OVER (ORDER BY monetary DESC, custkey ASC)      AS m_quartile
    FROM rfm
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary with "
        "quartile scores. Quartiles are EXACT ntile(4) semantics computed "
        "scale-safely by functions/scale.global_ntile: range-repartition + "
        "per-partition row_number + broadcast offsets — no unpartitioned "
        "data window, so 10⁹ customers never funnel through one task. The "
        "DuckDB oracle keeps plain ntile; the tie-broken total order makes "
        "the two bit-identical.",
    tags=("agg", "cohort", "window"),
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import global_ntile

    o = load_table(spark, sf_dir, "orders")
    # checkpointed once: three independent ntile branches re-read the
    # per-customer aggregate instead of re-running it (optimization r18)
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        pround(F.sum("o_totalprice"), 2).alias("monetary"),
    ).localCheckpoint(eager=False)
    # The three quartiles were a SERIAL chain of global_ntile passes,
    # each range-repartitioning the full frame (every column riding
    # every exchange) and each gated on the previous one's checkpoint.
    # They are independent — each orders by its own key — so they now
    # run as three COLUMN-PRUNED branches (custkey + one metric per
    # range exchange, ~1/3 the bytes) that AQE schedules concurrently,
    # joined back on custkey (guide §2.6 overlap / §2.3 project before
    # the exchange).  ntile semantics are untouched: same total order
    # (metric desc, custkey asc) per branch, exact rank arithmetic.
    def branch(key: str, out: str) -> DataFrame:
        return global_ntile(
            rfm.select("custkey", key), 4,
            [F.desc(key), F.asc("custkey")], out,
        ).select("custkey", out)

    return (
        rfm.select("custkey", "frequency", "monetary")
        .join(branch("last_order", "r_quartile"), "custkey")
        .join(branch("frequency", "f_quartile"), "custkey")
        .join(branch("monetary", "m_quartile"), "custkey")
        .select(
            "custkey", "frequency", "monetary",
            "r_quartile", "f_quartile", "m_quartile",
        )
    )


# Kaplan-Meier: censoring horizon — a user whose last event is within
# this window of the corpus end is censored (still alive), not churned
KM_CENSOR_DAYS = 3

_KM_SCHEMA = (
    "lifetime_day bigint, n_at_risk bigint, n_churned bigint, survival double"
)


def _km_fold(pdf):
    # bounded input: one row per distinct lifetime day (~observation
    # span in days), NEVER per user — the sequential product is the
    # one part SQL windows can't express deterministically (exp/ln
    # are not correctly-rounded and differ across libms; plain * and
    # / are IEEE-exact, so the recursion matches the oracle bit-for-bit)
    pdf = pdf.sort_values("lifetime_day").reset_index(drop=True)
    s = 1.0
    out = []
    for _, row in pdf.iterrows():
        n, d = float(row["n_at_risk"]), float(row["n_churned"])
        s = s * (1.0 - d / n)
        out.append(s)
    pdf["survival"] = out
    return pdf[["lifetime_day", "n_at_risk", "n_churned", "survival"]]


@register(
    "events_survival_kaplan_meier",
    oracle=f"""
    WITH RECURSIVE bounds AS (
      SELECT max(epoch_ns(ts) // 1000) AS end_us FROM events
    ), per_user AS (
      SELECT user_id,
             (max(epoch_ns(ts) // 1000) - min(epoch_ns(ts) // 1000))
               // 86400000000 AS life,
             CASE WHEN max(epoch_ns(ts) // 1000)
                       < (SELECT end_us FROM bounds) - {KM_CENSOR_DAYS} * 86400000000
                  THEN 1 ELSE 0 END AS churned
      FROM events GROUP BY user_id
    ), day_counts AS (
      SELECT life, CAST(count(*) AS BIGINT) AS n_here,
             CAST(sum(churned) AS BIGINT) AS d
      FROM per_user GROUP BY life
    ), days AS (
      SELECT life, d,
             CAST((SELECT count(*) FROM per_user)
                  - coalesce(sum(n_here) OVER (ORDER BY life
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk,
             CAST(row_number() OVER (ORDER BY life) AS BIGINT) AS rn
      FROM day_counts
    ), km AS (
      SELECT life, d, n_risk, rn,
             1.0 * (1.0 - CAST(d AS DOUBLE) / n_risk) AS s
      FROM days WHERE rn = 1
      UNION ALL
      SELECT x.life, x.d, x.n_risk, x.rn,
             k.s * (1.0 - CAST(x.d AS DOUBLE) / x.n_risk)
      FROM km k JOIN days x ON x.rn = k.rn + 1
    )
    SELECT life AS lifetime_day, n_risk AS n_at_risk, d AS n_churned,
           floor(s * 1000000.0 + 0.5) / 1000000.0 AS survival
    FROM km
    """,
    doc=f"Kaplan-Meier survival curve over user lifetimes (first to "
        f"last event, in whole days): users whose last activity is "
        f"within {KM_CENSOR_DAYS} days of the corpus end are CENSORED "
        f"(still alive), everyone else churned at their last event — "
        f"the estimator that handles censoring correctly, unlike a "
        f"naive churn histogram that counts still-active users as "
        f"churned.  S(t) = prod over observed days of "
        f"(1 - deaths/at-risk).  Scale shape: ONE per-user grouped "
        f"agg collapses the corpus; lifetimes collapse again to "
        f"|distinct days| rows; the risk set derives from a "
        f"running-sum window over that bounded frame; the sequential "
        f"product runs in applyInPandas over the same ~|days| rows "
        f"(exp(sum(ln)) would be the window form, but ln/exp are not "
        f"correctly-rounded across libms — the plain-multiply "
        f"recursion is IEEE-exact and matches the recursive-CTE "
        f"oracle bit-for-bit).  All counts exact integers.",
    tags=("cohorts", "survival", "stats", "udf"),
)
def events_survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    end_us = e.agg(F.max("ts_us").alias("end_us"))
    per_user = (
        e.groupBy("user_id")
        .agg(F.min("ts_us").alias("first_us"), F.max("ts_us").alias("last_us"))
        .crossJoin(F.broadcast(end_us))
        .select(
            ((F.col("last_us") - F.col("first_us")) / F.lit(86400000000))
            .cast("bigint")
            .alias("life"),
            F.when(
                F.col("last_us")
                < F.col("end_us") - F.lit(KM_CENSOR_DAYS * 86400000000),
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
        .localCheckpoint(eager=False)
    )
    day_counts = per_user.groupBy("life").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_here"),
        F.sum("churned").cast("bigint").alias("d"),
    )
    total = per_user.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
    # bounded unpartitioned window: |distinct lifetime days| rows
    w = Window.partitionBy(bounded_window_key("life")).orderBy("life").rowsBetween(Window.unboundedPreceding, -1)
    days = (
        day_counts.crossJoin(F.broadcast(total))
        .withColumn(
            "n_at_risk",
            (
                F.col("n_total")
                - F.coalesce(F.sum("n_here").over(w), F.lit(0))
            ).cast("bigint"),
        )
        .select(
            F.col("life").alias("lifetime_day"),
            "n_at_risk",
            F.col("d").alias("n_churned"),
        )
        .withColumn("_g", F.lit(1))
    )
    out = days.groupBy("_g").applyInPandas(_km_fold, schema=_KM_SCHEMA)
    return out.select(
        "lifetime_day",
        "n_at_risk",
        "n_churned",
        pround("survival", 6).alias("survival"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV curve (round 9): cumulative revenue per customer by
# acquisition cohort and age — the lifetime-value curve next to the
# retention matrix (retention says WHO comes back; this says what the
# average acquired customer is WORTH after a months).  Exact: revenue
# accumulates in integer cents, ages/cohorts are integer month keys,
# and the single division (cents / 100 / cohort size) happens once at
# the end on exact integers.
# ---------------------------------------------------------------------------

_LTV_MAX_AGE = 12


@register(
    "orders_cohort_ltv_curve",
    oracle=f"""
    WITH o AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) - 1 AS mkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS cents
      FROM orders
    ), cohorts AS (
      SELECT o_custkey, min(mkey) AS ckey FROM o GROUP BY o_custkey
    ), sizes AS (
      SELECT ckey, CAST(count(*) AS BIGINT) AS n_customers
      FROM cohorts GROUP BY ckey
    ), rev AS (
      SELECT c.ckey, o.mkey - c.ckey AS age,
             CAST(sum(o.cents) AS BIGINT) AS cents
      FROM o JOIN cohorts c USING (o_custkey)
      WHERE o.mkey - c.ckey <= {_LTV_MAX_AGE}
      GROUP BY c.ckey, age
    ), hor AS (
      SELECT max(mkey) AS max_mkey FROM o
    ), grid AS (
      SELECT s.ckey, gs.age FROM sizes s CROSS JOIN hor,
           LATERAL (SELECT unnest(generate_series(0, {_LTV_MAX_AGE})) AS age) gs
      WHERE s.ckey + gs.age <= hor.max_mkey
    ), cum AS (
      SELECT g.ckey, g.age,
             sum(coalesce(r.cents, 0)) OVER (PARTITION BY g.ckey
                 ORDER BY g.age
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_cents
      FROM grid g LEFT JOIN rev r ON r.ckey = g.ckey AND r.age = g.age
    )
    SELECT lpad(CAST(c.ckey // 12 AS VARCHAR), 4, '0') || '-' ||
             lpad(CAST(c.ckey % 12 + 1 AS VARCHAR), 2, '0') AS cohort_month,
           CAST(c.age AS INTEGER)       AS age_months,
           s.n_customers,
           floor(CAST(c.cum_cents AS DOUBLE) / 100.0 / s.n_customers
                 * 100.0 + 0.5) / 100.0 AS ltv_per_customer
    FROM cum c JOIN sizes s USING (ckey)
    """,
    doc=f"Cohort lifetime-value curve: customers grouped by first-order "
        f"month, cumulative revenue per acquired customer tracked "
        f"through age {_LTV_MAX_AGE} months — the payback/LTV report "
        "beside events_retention_cohorts.  Scale shape: ONE customer-"
        "key shuffle covers both the first-order cohort assignment "
        "and the order→cohort join (co-partitioned); monthly revenue "
        "collapses to |cohorts|×|ages| before the cumulative window "
        f"(partitions of exactly {_LTV_MAX_AGE + 1} rows); cohort "
        "sizes broadcast.  Revenue is exact integer cents; the only "
        "division is final.",
    tags=("cohorts", "agg"),
)
def orders_cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias("mkey"),
        F.floor(F.col("o_totalprice") * 100.0 + 0.5).cast("bigint").alias("cents"),
    )
    cohorts = o.groupBy("o_custkey").agg(F.min("mkey").alias("ckey"))
    sizes = cohorts.groupBy("ckey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_customers")
    ).localCheckpoint(eager=False)
    rev = (
        o.join(cohorts, "o_custkey")
        .withColumn("age", F.col("mkey") - F.col("ckey"))
        .filter(F.col("age") <= _LTV_MAX_AGE)
        .groupBy("ckey", "age")
        .agg(F.sum("cents").cast("bigint").alias("cents"))
    )
    # grid clipped to the corpus horizon (r12 review fix): ages past
    # max(mkey) - ckey are UNOBSERVED, and zero-filling them made an
    # immature cohort's curve indistinguishable from genuine zero spend
    hor = o.agg(F.max("mkey").alias("max_mkey"))
    grid = (
        sizes.crossJoin(F.broadcast(hor))
        .select(
            "ckey",
            "max_mkey",
            F.explode(F.sequence(F.lit(0), F.lit(_LTV_MAX_AGE))).alias("age"),
        )
        .filter(F.col("ckey") + F.col("age") <= F.col("max_mkey"))
        .select("ckey", "age")
    )
    wcum = (
        Window.partitionBy("ckey")
        .orderBy("age")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = (
        grid.join(rev, ["ckey", "age"], "left")
        .withColumn("cum_cents", F.sum(F.coalesce("cents", F.lit(0))).over(wcum))
    )
    return cum.join(F.broadcast(sizes), "ckey").select(
        F.concat(
            F.lpad((F.col("ckey") / 12).cast("int").cast("string"), 4, "0"),
            F.lit("-"),
            F.lpad((F.col("ckey") % 12 + 1).cast("string"), 2, "0"),
        ).alias("cohort_month"),
        F.col("age").cast("int").alias("age_months"),
        "n_customers",
        pround(
            F.col("cum_cents").cast("double") / F.lit(100.0) / F.col("n_customers"),
            2,
        ).alias("ltv_per_customer"),
    )


# ---------------------------------------------------------------------------
# Retention half-life fit (exponential decay over pooled weekly retention)
# ---------------------------------------------------------------------------

# ln(2) pre-rounded to ONE literal shared by both engines (the Benford/
# MAD constant-pinning pattern — in-engine ln(2) is not cross-libm exact)
_LN2 = 0.693147
# ln(retention) quantized to 1e-4 int64 before the OLS sums (the
# heaps-law pattern): order-free integer co-moments, one double tree
_HL_SCALE = 10_000


@register(
    "events_retention_halflife",
    oracle=f"""
    WITH firsts AS (
      SELECT user_id, min(epoch_ns(ts) // 1000) AS first_us
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT e.user_id,
             (epoch_ns(e.ts) // 1000 - f.first_us) // 604800000000 AS w
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    ), act AS (
      SELECT w, CAST(count(DISTINCT user_id) AS BIGINT) AS a
      FROM activity GROUP BY w
    ), bounds AS (
      SELECT max(epoch_ns(ts) // 1000) AS end_us FROM events
    ), obs AS (
      SELECT ((SELECT end_us FROM bounds) - first_us) // 604800000000 AS ow
      FROM firsts
    ), owc AS (
      SELECT ow, CAST(count(*) AS BIGINT) AS c FROM obs GROUP BY ow
    ), base AS (
      SELECT a.w, CAST(sum(o.c) AS BIGINT) AS b
      FROM (SELECT DISTINCT w FROM act) a JOIN owc o ON o.ow >= a.w
      GROUP BY a.w
    ), pts AS (
      SELECT act.w,
             CAST(floor(ln(a * 1.0 / base.b) * {_HL_SCALE}.0 + 0.5) AS BIGINT)
               AS yi
      FROM act JOIN base ON base.w = act.w
      WHERE act.w >= 1 AND a > 0 AND base.b > 0
    ), fit AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(w) AS BIGINT) AS sx, CAST(sum(yi) AS BIGINT) AS sy,
             CAST(sum(w * w) AS BIGINT) AS sxx,
             CAST(sum(w * yi) AS BIGINT) AS sxy
      FROM pts
    )
    SELECT n AS n_weeks,
           floor(((n * sxy - sx * sy) * 1.0 / (n * sxx - sx * sx))
                 / {_HL_SCALE}.0 * 1000000.0 + 0.5) / 1000000.0
             AS decay_slope,
           CASE WHEN n * sxy - sx * sy < 0
                THEN floor({_LN2} / (-(((n * sxy - sx * sy) * 1.0
                                        / (n * sxx - sx * sx))
                                       / {_HL_SCALE}.0))
                           * 1000000.0 + 0.5) / 1000000.0
                ELSE -1.0 END AS halflife_weeks
    FROM fit WHERE n >= 2 AND n * sxx - sx * sx > 0
    """,
    doc="Retention HALF-LIFE: fit ln(retention) ~ week-offset by least "
        "squares over the pooled weekly retention curve and report "
        "-ln2/slope — the single-number summary of the cohort matrix "
        "(events_retention_cohorts shows the raw curve; capacity and "
        "LTV models consume this scalar).  Exponential decay is the "
        "standard first model for activity retention; a POSITIVE "
        "fitted slope (retention not decaying) emits the -1.0 sentinel "
        "decided on the EXACT INTEGER numerator sign, not a float.  "
        "Exactness: each ln(retention) point is quantized to 1e-4 "
        "int64 (cross-libm ln differs by <=1 ulp — a quantization flip "
        "needs the true value within ~1e-20 of a boundary); the OLS "
        "co-moments are then order-free integer sums and slope/half-"
        "life are identical scalar double trees; ln(2) is pinned as "
        "one pre-rounded literal (in-engine ln(2) is not correctly-"
        "rounded everywhere).  Scale shape: the cohort machinery's two "
        "aggregates + user-key join, collapsing to |week-offsets| "
        "points before any float; output 1 row.",
    tags=("events", "cohort", "stats"),
)
def events_retention_halflife(spark: SparkSession, sf_dir: str) -> DataFrame:
    week_us = 604_800_000_000
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts_us").alias("us")
    )
    firsts = e.groupBy("user_id").agg(F.min("us").alias("first_us"))
    act = (
        e.join(firsts, "user_id")
        .select(
            "user_id",
            ((F.col("us") - F.col("first_us")) / week_us)
            .cast("bigint")
            .alias("w"),
        )
        .groupBy("w")
        .agg(F.count_distinct("user_id").cast("bigint").alias("a"))
        .localCheckpoint(eager=False)
    )
    # right-censoring (r12 review fix): retention(w)'s denominator is
    # the users OBSERVABLE for >= w weeks (first seen at least w weeks
    # before corpus end) — dividing by ALL users ever acquired biased
    # the slope steep and the half-life short, because late acquirees
    # can never appear in act(w) yet sat in the denominator.  All the
    # censoring tables are |weeks|-sized metadata.
    bounds = e.agg(F.max("us").alias("end_us"))
    obs = firsts.crossJoin(F.broadcast(bounds)).select(
        ((F.col("end_us") - F.col("first_us")) / week_us)
        .cast("bigint")
        .alias("ow")
    )
    owc = obs.groupBy("ow").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    base = (
        act.select("w")
        .distinct()
        .join(F.broadcast(owc), F.col("ow") >= F.col("w"))
        .groupBy("w")
        .agg(F.sum("c").cast("bigint").alias("b"))
    )
    pts = (
        act.join(F.broadcast(base), "w")
        .filter((F.col("w") >= 1) & (F.col("a") > 0) & (F.col("b") > 0))
        .select(
            "w",
            F.floor(
                F.log(F.col("a") * F.lit(1.0) / F.col("b")) * _HL_SCALE
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("yi"),
        )
    )
    fit = pts.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("w").cast("bigint").alias("sx"),
        F.sum("yi").cast("bigint").alias("sy"),
        F.sum(F.col("w") * F.col("w")).cast("bigint").alias("sxx"),
        F.sum(F.col("w") * F.col("yi")).cast("bigint").alias("sxy"),
    )
    one = F.lit(1.0)
    num = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    slope = (num * one / den) / F.lit(float(_HL_SCALE))
    return fit.filter((F.col("n") >= 2) & (den > 0)).select(
        F.col("n").alias("n_weeks"),
        pround(slope, 6).alias("decay_slope"),
        F.when(num < 0, pround(F.lit(_LN2) / (-slope), 6))
        .otherwise(F.lit(-1.0))
        .alias("halflife_weeks"),
    )


# ---------------------------------------------------------------------------
# Audience overlap matrix (Jaccard of user sets between event types)
# ---------------------------------------------------------------------------


@register(
    "events_audience_overlap",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), sizes AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(count(*) AS BIGINT) AS n_both
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2
    )
    SELECT type_a, type_b, n_both,
           sa.n AS n_a, sb.n AS n_b,
           floor(n_both * 1.0 / (sa.n + sb.n - n_both) * 1000000.0 + 0.5)
             / 1000000.0 AS jaccard
    FROM inter
    JOIN sizes sa ON sa.event_type = type_a
    JOIN sizes sb ON sb.event_type = type_b
    """,
    doc="Audience overlap matrix: Jaccard similarity of USER SETS "
        "between event types — 'do the people who error overlap the "
        "people who purchase' — the audience-level complement to the "
        "event-level Markov transitions (sequence) and chi2 mix "
        "(composition): those count events, this counts PEOPLE.  "
        "Near-1 cells mean the types share one audience (segment "
        "together); near-0 purchase/error overlap under high volume is "
        "a routing or bot signal.  The same inverted-index shape as "
        "dedup_ngram_jaccard with users as 'shingles': dedup to "
        "distinct (user, type) pairs first, self-join on user_id — "
        "each user contributes at most |types|(|types|-1)/2 = 10 "
        "pairs, so the join output is bounded by 10x|users|, never "
        "quadratic; set sizes broadcast back onto the <=10-row pair "
        "table.  All-integer counts, one exact division per cell.  "
        "Scale: the (user, type) dedup is the only data-sized "
        "shuffle.",
    tags=("events", "cohort", "stats"),
)
def events_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ut = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "event_type")
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = ut.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, ["user_id"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_both"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    union = F.col("n_a") + F.col("n_b") - F.col("n_both")
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_both",
            "n_a",
            "n_b",
            pround(F.col("n_both") * F.lit(1.0) / union, 6).alias("jaccard"),
        )
    )


# --- round 12 additions: engagement-ratio cohort family --------------------

# exact integer day bucket (matches DuckDB's `//`, which — verified —
# TRUNCATES toward zero exactly like Spark's `div`; integer form also
# avoids double-division rounding at extreme magnitudes, unlike a
# float divide + cast)
_DAY = 'div 86400000000L'



@register(
    "events_dau_wau_stickiness",
    oracle="""
    WITH d AS (
      SELECT (epoch_ns(ts) // 1000) // 86400000000 AS day, user_id
      FROM events
    ), span AS (
      SELECT min(day) AS d0, max(day) AS d1 FROM d
    ), daily AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM d GROUP BY day
    ), weekly AS (
      SELECT day // 7 AS week, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
      FROM d GROUP BY day // 7
    ), dsum AS (
      SELECT daily.day // 7 AS week,
             CAST(sum(dau) AS BIGINT) AS dau_sum,
             CAST(least(p.d1, (daily.day // 7) * 7 + 6)
                  - greatest(p.d0, (daily.day // 7) * 7) + 1 AS BIGINT)
               AS n_days
      FROM daily CROSS JOIN span p
      GROUP BY daily.day // 7, p.d0, p.d1
    )
    SELECT CAST(w.week AS BIGINT) AS week,
           s.dau_sum, s.n_days, w.wau,
           floor((s.dau_sum * 1.0 / (s.n_days * 1.0)) * 1000000.0 + 0.5)
             / 1000000.0 AS avg_dau,
           floor((s.dau_sum * 1.0 / (s.n_days * 1.0 * w.wau)) * 1000000.0 + 0.5)
             / 1000000.0 AS stickiness
    FROM weekly w JOIN dsum s ON s.week = w.week
    """,
    doc="DAU/WAU stickiness — the engagement-depth ratio product teams "
        "track weekly (stickiness 1/7 = users touch once a week, 1.0 = "
        "every day).  The avg-DAU denominator is the number of "
        "OBSERVABLE days in the week (the week clipped to the corpus's "
        "global [min_day, max_day] span) so zero-activity days count "
        "as DAU=0 — r12 review fix: averaging over active days only "
        "inflated stickiness 3.5x for a product dark 5 of 7 days, "
        "which is the exact signal the ratio exists to expose.  Day "
        "and week are exact integer arithmetic on the stored epoch "
        "micros (day = us div 86400e6, week = day div 7), so both "
        "engines bucket identically with no calendar/timezone "
        "surface.  Scale shape: two partial-aggregated distinct counts "
        "(per-day, per-week — each one shuffle on (bucket, user)), then "
        "a |weeks|-row join; the averaging is exact ints until one "
        "final division.  At 100 TB the exact distincts swap for "
        "approx_count_distinct without changing the plan shape.",
    tags=("events", "cohort"),
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.expr(f"ts_us {_DAY}").alias("day"), "user_id"
    )
    daily = e.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    weekly = e.select(
        F.expr("day div 7L").alias("week"), "user_id"
    ).groupBy("week").agg(F.countDistinct("user_id").cast("bigint").alias("wau"))
    # n_days = OBSERVABLE days in the week (clipped to the corpus span),
    # not active days (r12 review fix): zero-DAU days must count as 0
    # in the average — a product dark 5 of 7 days otherwise reads
    # stickiness ~1.0
    span = daily.agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
    dsum = (
        daily.crossJoin(F.broadcast(span))
        .groupBy(F.expr("day div 7L").alias("week"), "d0", "d1")
        .agg(F.sum("dau").cast("bigint").alias("dau_sum"))
        .select(
            "week",
            "dau_sum",
            (
                F.least(F.col("d1"), F.col("week") * 7 + 6)
                - F.greatest(F.col("d0"), F.col("week") * 7)
                + 1
            )
            .cast("bigint")
            .alias("n_days"),
        )
    )
    avg_dau = F.col("dau_sum") * F.lit(1.0) / (F.col("n_days") * F.lit(1.0))
    return weekly.join(dsum, "week").select(
        F.col("week").cast("bigint").alias("week"),
        "dau_sum",
        "n_days",
        "wau",
        pround(avg_dau, 6).alias("avg_dau"),
        pround(
            F.col("dau_sum")
            * F.lit(1.0)
            / (F.col("n_days") * F.lit(1.0) * F.col("wau")),
            6,
        ).alias("stickiness"),
    )


@register(
    "events_rolling_retention",
    oracle="""
    WITH span AS (
      SELECT user_id,
             min((epoch_ns(ts) // 1000) // 86400000000) AS first_day,
             max((epoch_ns(ts) // 1000) // 86400000000) AS last_day
      FROM events GROUP BY user_id
    ), horizon AS (
      SELECT max(last_day) AS corpus_end FROM span
    )
    SELECT CAST(first_day AS BIGINT) AS cohort_day,
           CAST(count(*) AS BIGINT) AS n_users,
           CAST(sum(CASE WHEN last_day - first_day >= 7
                         THEN 1 ELSE 0 END) AS BIGINT) AS retained_7d,
           floor((sum(CASE WHEN last_day - first_day >= 7
                           THEN 1 ELSE 0 END) * 1.0 / count(*))
                 * 1000000.0 + 0.5) / 1000000.0 AS rolling_retention_7d
    FROM span CROSS JOIN horizon h
    WHERE first_day <= h.corpus_end - 7
    GROUP BY first_day
    """,
    doc="Rolling (unbounded) retention: a user counts as day-7-retained "
        "if they return on day 7 OR ANY LATER day — the metric that "
        "does not punish weekly-cadence products the way classic day-N "
        "retention does.  Cohorts whose 7-day window has NOT matured "
        "(first_day within 7 days of the corpus end) are EXCLUDED — "
        "r12 review fix: without the censoring cutoff the final week "
        "of cohorts mechanically read as total churn (the KM operator "
        "beside this one already censors; same principle).  Needs "
        "only each user's activity SPAN "
        "(min/max day), not the full activity matrix: one partial-agg "
        "shuffle on user_id, then a |cohort-days|-row rollup — strictly "
        "cheaper than the retention-triangle query and the right first "
        "screen at 100 TB.  Day arithmetic on exact integer micros.",
    tags=("events", "cohort"),
)
def events_rolling_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.expr(f"ts_us {_DAY}").alias("day")
    )
    span = e.groupBy("user_id").agg(
        F.min("day").alias("first_day"), F.max("day").alias("last_day")
    ).localCheckpoint(eager=False)
    # censoring cutoff (r12 review fix): cohorts whose 7-day window has
    # not matured by the corpus end would mechanically read as total
    # churn; exclude them (the KM operator's censoring principle)
    horizon = span.agg(F.max("last_day").alias("corpus_end"))
    retained = F.sum(
        F.when(F.col("last_day") - F.col("first_day") >= 7, F.lit(1)).otherwise(
            F.lit(0)
        )
    ).cast("bigint")
    return (
        span.crossJoin(F.broadcast(horizon))
        .filter(F.col("first_day") <= F.col("corpus_end") - 7)
        .groupBy(F.col("first_day").cast("bigint").alias("cohort_day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            retained.alias("retained_7d"),
            pround(retained * F.lit(1.0) / F.count(F.lit(1)), 6).alias(
                "rolling_retention_7d"
            ),
        )
    )


@register(
    "events_new_vs_returning_daily",
    oracle="""
    WITH d AS (
      SELECT DISTINCT (epoch_ns(ts) // 1000) // 86400000000 AS day, user_id
      FROM events
    ), firsts AS (
      SELECT user_id, min(day) AS first_day FROM d GROUP BY user_id
    )
    SELECT CAST(d.day AS BIGINT) AS day,
           CAST(sum(CASE WHEN d.day = f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS new_users,
           CAST(sum(CASE WHEN d.day > f.first_day THEN 1 ELSE 0 END)
                AS BIGINT) AS returning_users
    FROM d JOIN firsts f ON f.user_id = d.user_id
    GROUP BY d.day
    """,
    doc="New-vs-returning daily split: each active (day, user) pair is "
        "classified by whether that day is the user's FIRST day — the "
        "acquisition-vs-engagement decomposition of a DAU curve.  "
        "Scale shape: one distinct on (day, user) — the partial-agg "
        "dedupe — one per-user min (same user_id partitioning, no "
        "second wide shuffle), one co-partitioned equi-join back, one "
        "|days|-row rollup.  Exact integer day buckets from stored "
        "micros.",
    tags=("events", "cohort"),
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = (
        load_table(spark, sf_dir, "events")
        .select(
            F.expr(f"ts_us {_DAY}").alias("day"), "user_id"
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    firsts = d.groupBy("user_id").agg(F.min("day").alias("first_day"))
    return (
        d.join(firsts, "user_id")
        .groupBy(F.col("day").cast("bigint").alias("day"))
        .agg(
            F.sum(
                F.when(F.col("day") == F.col("first_day"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("new_users"),
            F.sum(
                F.when(F.col("day") > F.col("first_day"), F.lit(1)).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias("returning_users"),
        )
    )


@register(
    "events_last_touch_attribution",
    oracle="""
    WITH stream AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us, event_id,
             0 AS is_probe, event_type AS touch_type,
             CAST(NULL AS BIGINT) AS cents
      FROM events WHERE event_type IN ('view', 'click')
      UNION ALL
      SELECT user_id, epoch_ns(ts) // 1000, event_id,
             1, CAST(NULL AS VARCHAR),
             CAST(floor(value * 100.0 + 0.5) AS BIGINT)
      FROM events WHERE event_type = 'purchase' AND value IS NOT NULL
    ), carried AS (
      SELECT *,
             last_value(touch_type IGNORE NULLS)
               OVER (PARTITION BY user_id
                     ORDER BY us, is_probe, event_id
                     ROWS UNBOUNDED PRECEDING) AS lt
      FROM stream
    )
    SELECT coalesce(lt, 'none') AS touch_type,
           CAST((us // 3600000000) % 24 AS INTEGER) AS hour_of_day,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(cents) AS BIGINT) AS attributed_cents
    FROM carried WHERE is_probe = 1
    GROUP BY coalesce(lt, 'none'), (us // 3600000000) % 24
    """,
    doc="LAST-TOUCH ATTRIBUTION — each purchase credits the user's most "
        "recent at-or-before view/click (purchases with no prior touch "
        "report as 'none'): the marketing-attribution primitive, and "
        "the second production use of the union + ordered-window AS-OF "
        "encoding (customer_asof_balance_join is the dimension form; "
        "this is the event-stream form).  One shuffle on user_id, no "
        "touch x purchase join, no candidate multiplication; the order "
        "key (us, is_probe, event_id) is a TOTAL order so ties — a "
        "touch and a purchase in the same microsecond, or two "
        "same-instant touches — resolve identically in both engines "
        "(the reason the oracle is the windowed-SQL form rather than "
        "DuckDB's ASOF JOIN, whose tie-breaking is unspecified).  "
        "Report keyed by (touch type, purchase hour-of-day) in exact "
        "integer cents / exact integer hour buckets.",
    tags=("events", "cohort", "asof"),
)
def events_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    touches = e.filter(F.col("event_type").isin("view", "click")).select(
        "user_id",
        F.col("ts_us").alias("us"),
        "event_id",
        F.lit(0).alias("is_probe"),
        F.col("event_type").alias("touch_type"),
        F.lit(None).cast("bigint").alias("cents"),
    )
    purchases = e.filter(
        (F.col("event_type") == "purchase") & F.col("value").isNotNull()
    ).select(
        "user_id",
        F.col("ts_us").alias("us"),
        "event_id",
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("string").alias("touch_type"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "is_probe", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = touches.unionByName(purchases).withColumn(
        "lt", F.last("touch_type", ignorenulls=True).over(w)
    )
    return (
        carried.filter(F.col("is_probe") == 1)
        .groupBy(
            F.coalesce(F.col("lt"), F.lit("none")).alias("touch_type"),
            (F.expr("us div 3600000000L") % 24).cast("int").alias("hour_of_day"),
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_purchases"),
            F.sum("cents").cast("bigint").alias("attributed_cents"),
        )
    )


@register(
    "orders_repeat_purchase_latency",
    oracle="""
    WITH ranked AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS d,
             row_number() OVER w AS rn,
             lead(CAST(o_orderdate AS DATE)) OVER w AS d2
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY CAST(o_orderdate AS DATE) ASC, o_orderkey ASC)
    ), pairs AS (
      SELECT o_custkey,
             CAST(year(d) AS INTEGER) AS cohort_year,
             date_diff('day', d, d2) AS gap_days
      FROM ranked WHERE rn = 1 AND d2 IS NOT NULL
    ), per_gap AS (
      SELECT cohort_year, gap_days, CAST(count(*) AS BIGINT) AS cnt
      FROM pairs GROUP BY cohort_year, gap_days
    ), cum AS (
      SELECT cohort_year, gap_days, cnt,
             sum(cnt) OVER (PARTITION BY cohort_year ORDER BY gap_days
                            ROWS UNBOUNDED PRECEDING) AS cw,
             sum(cnt) OVER (PARTITION BY cohort_year) AS n
      FROM per_gap
    ), med AS (
      SELECT cohort_year, min(gap_days) AS median_gap_days
      FROM cum WHERE cw * 2 >= n GROUP BY cohort_year
    ), stats AS (
      SELECT cohort_year,
             CAST(count(*) AS BIGINT) AS n_repeat,
             floor(avg(gap_days) * 1000000.0 + 0.5) / 1000000.0
               AS avg_gap_days
      FROM pairs GROUP BY cohort_year
    )
    SELECT s.cohort_year,
           s.n_repeat,
           CAST(m.median_gap_days AS BIGINT) AS median_gap_days,
           s.avg_gap_days
    FROM stats s JOIN med m USING (cohort_year)
    """,
    doc="REPEAT-PURCHASE LATENCY by acquisition cohort — the "
        "time-to-second-order distribution growth teams steer by: per "
        "first-order year, how many customers ever ordered again, and "
        "the lower median + mean days between first and second order.  "
        "The lower median (smallest gap whose cumulative customer "
        "count reaches half the cohort) is computed via the grouped "
        "cumulative-count trick — exact integers end-to-end, no "
        "engine-divergent percentile interpolation.  Scale shape: the "
        "(first, second) pair is row_number + lead IN ONE WINDOW — "
        "exactly ONE fact-table shuffle on o_custkey (the "
        "filter-rn=1-join-rn=2 draft planned 3 fact shuffles; plan "
        "audit caught it); then per-(cohort, gap) aggregation — "
        "cohorts x distinct gaps rows — and a bounded window over "
        "that aggregate.  Right-censoring note: customers whose second "
        "order falls OUTSIDE the fixture's time range simply are not "
        "repeat customers in-sample; unlike rolling retention there is "
        "no per-window maturity cutoff to respect (the metric "
        "conditions on the second order existing).",
    tags=("cohorts", "events", "timeseries"),
)
def orders_repeat_purchase_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").cast("date").asc(), F.col("o_orderkey").asc()
    )
    ranked = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.row_number().over(w).alias("rn"),
        F.lead(F.col("o_orderdate").cast("date")).over(w).alias("d2"),
    )
    pairs = ranked.filter(
        (F.col("rn") == 1) & F.col("d2").isNotNull()
    ).select(
        F.year("d").cast("int").alias("cohort_year"),
        F.datediff("d2", "d").cast("bigint").alias("gap_days"),
    )
    per_gap = pairs.groupBy("cohort_year", "gap_days").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    wcum = (
        Window.partitionBy("cohort_year")
        .orderBy("gap_days")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("cohort_year")
    cum = per_gap.select(
        "cohort_year",
        "gap_days",
        F.sum("cnt").over(wcum).alias("cw"),
        F.sum("cnt").over(wall).alias("n"),
    )
    med = (
        cum.filter(F.col("cw") * 2 >= F.col("n"))
        .groupBy("cohort_year")
        .agg(F.min("gap_days").cast("bigint").alias("median_gap_days"))
    )
    stats = pairs.groupBy("cohort_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_repeat"),
        pround(F.avg("gap_days"), 6).alias("avg_gap_days"),
    )
    return stats.join(med, "cohort_year").select(
        "cohort_year", "n_repeat", "median_gap_days", "avg_gap_days"
    )


@register(
    "orders_cohort_retention_triangle",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey,
             min(year(CAST(o_orderdate AS DATE)) * 4
                 + (quarter(CAST(o_orderdate AS DATE)) - 1)) AS cohort_qi
      FROM orders GROUP BY o_custkey
    ), activity AS (
      SELECT DISTINCT o.o_custkey, f.cohort_qi,
             (year(CAST(o.o_orderdate AS DATE)) * 4
              + (quarter(CAST(o.o_orderdate AS DATE)) - 1)) - f.cohort_qi
               AS q_since
      FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
    ), sizes AS (
      SELECT cohort_qi, CAST(count(*) AS BIGINT) AS cohort_size
      FROM firsts GROUP BY cohort_qi
    ), cells AS (
      SELECT cohort_qi, q_since,
             CAST(count(*) AS BIGINT) AS n_active
      FROM activity WHERE q_since <= 8 GROUP BY cohort_qi, q_since
    )
    SELECT CAST(c.cohort_qi // 4 AS INTEGER) AS cohort_year,
           CAST(c.cohort_qi % 4 + 1 AS INTEGER) AS cohort_quarter,
           CAST(c.q_since AS INTEGER) AS q_since,
           c.n_active, s.cohort_size,
           floor((c.n_active * 1.0 / s.cohort_size) * 1000000.0 + 0.5)
             / 1000000.0 AS retention
    FROM cells c JOIN sizes s ON c.cohort_qi = s.cohort_qi
    """,
    doc="The classic cohort retention TRIANGLE on the order history: "
        "cohort = the calendar quarter of a customer's FIRST order "
        "(encoded as a linear quarter index year*4 + q-1, so "
        "quarters-since is plain integer subtraction — no cross-year "
        "date arithmetic to diverge between engines), cell (cohort, "
        "q_since) = distinct customers with ≥1 order that many "
        "quarters later, plus the retention rate against the cohort's "
        "size.  The quarterly/orders twin of the weekly/events "
        "events_retention_cohorts — product analytics reads the events "
        "triangle, finance reads this one.  q_since capped at 8 (a "
        "2-year triangle) to bound the output grid.  Scale shape: one "
        "shuffle keyed on o_custkey for first-order (the activity join "
        "reuses it), one (cohort, q_since) DISTINCT dedupe, then "
        "grid-sized aggregates; cohort sizes join the cells on the "
        "tiny grid, not the fact table.",
    tags=("cohort", "orders", "retention"),
)
def orders_cohort_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (
            F.year(F.col("o_orderdate")) * 4 + (F.quarter(F.col("o_orderdate")) - 1)
        ).alias("qi"),
    )
    firsts = o.groupBy("o_custkey").agg(F.min("qi").alias("cohort_qi"))
    activity = (
        o.join(firsts, "o_custkey")
        .select("o_custkey", "cohort_qi", (F.col("qi") - F.col("cohort_qi")).alias("q_since"))
        .filter(F.col("q_since") <= 8)
        .distinct()
    )
    sizes = firsts.groupBy("cohort_qi").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    cells = activity.groupBy("cohort_qi", "q_since").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_active")
    )
    return cells.join(sizes, "cohort_qi").select(
        (F.col("cohort_qi") / 4).cast("int").alias("cohort_year"),
        (F.col("cohort_qi") % 4 + 1).cast("int").alias("cohort_quarter"),
        F.col("q_since").cast("int").alias("q_since"),
        "n_active",
        "cohort_size",
        pround(F.col("n_active") / F.col("cohort_size"), 6).alias("retention"),
    )
