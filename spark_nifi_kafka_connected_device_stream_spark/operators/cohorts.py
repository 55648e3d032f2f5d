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
