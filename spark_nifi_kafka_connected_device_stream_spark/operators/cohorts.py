"""Cohort / segmentation analytics: weekly retention matrix, RFM
customer segmentation, top-k n-grams.  The product-analytics layer on
top of the event spine (operators/events.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..functions.scale import plan_parallelism
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
    rfm = o.groupBy(F.col("o_custkey").alias("custkey")).agg(
        F.max("o_orderdate").alias("last_order"),
        F.count("*").alias("frequency"),
        pround(F.sum("o_totalprice"), 2).alias("monetary"),
    )
    rfm = global_ntile(rfm, 4, [F.desc("last_order"), F.asc("custkey")], "r_quartile")
    rfm = global_ntile(rfm, 4, [F.desc("frequency"), F.asc("custkey")], "f_quartile")
    rfm = global_ntile(rfm, 4, [F.desc("monetary"), F.asc("custkey")], "m_quartile")
    return rfm.select(
        "custkey", "frequency", "monetary", "r_quartile", "f_quartile", "m_quartile"
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
    w = Window.orderBy("life").rowsBetween(Window.unboundedPreceding, -1)
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
