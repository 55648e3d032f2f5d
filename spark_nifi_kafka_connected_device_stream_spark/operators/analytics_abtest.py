"""Experimentation and causal inference — the abtest tier split out
of `operators/analytics.py` in round 14 (pure move, no semantic
change).

SRM gate, purchase-rate test, CUPED variance reduction, power/MDE,
mSPRT sequential scan, bootstrap CI (deterministic seeded Poisson
weights), erasure-impact audit, and the round-14
difference-in-differences estimator for observational rollouts.
Assignment derivations and split instants are shared constants so the
family stays mutually consistent; `_cents` comes from
`operators/analytics.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import duck_u32, pround, spark_u32
from ..functions.scale import int64_headroom_guard
from ..registry import register
from ..sources.catalog import load_table


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
