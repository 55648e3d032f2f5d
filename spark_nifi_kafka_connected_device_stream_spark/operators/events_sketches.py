"""Sketch-based approximate aggregation over `events` — the sketch
tier split out of `operators/events.py` in round 14 (VERDICT r13
item 5; pure move, no semantic change).

HLL partial-merge, count-min frequency bounds, KMV distinct
estimation, KLL quantile-sketch bounds, and the log2 value histogram.
Sketches are the 100 TB path for distinct/frequency/quantile questions
(bounded memory, mergeable partials); each query here pins the
estimate inside a driver-checkable accuracy envelope so the DuckDB
oracle can certify a sketch without reproducing it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..registry import register
from ..sources.catalog import load_table


@register(
    "events_hll_partial_merge_bound",
    oracle="""
    SELECT DISTINCT event_type, true AS within_tolerance
    FROM events
    """,
    doc="Mergeable-sketch workflow (Apache DataSketches HLL, the Spark "
        "3.5+ hll_* surface): build ONE HLL sketch per (day, "
        "event_type) partial, then answer the monthly distinct-user "
        "question by hll_union_agg over the 30 partials — the corpus "
        "is scanned once and the daily sketch table answers ANY "
        "date-range distinct query afterwards, which is the production "
        "incremental pattern at 100 TB (approx_count_distinct's "
        "internal HLL++ state is not storable; DataSketches partials "
        "are bytes in a table).  The estimate is engine-specific, so "
        "— like agg_approx_distinct_bound — the driver-checked "
        "contract is the BOUND: merged estimate within 5% of the "
        "exact per-type distinct count, oracle = constant-true table.  "
        "Scale shape: one grouped sketch-agg (map-side partial "
        "merge), a |days|x|types|-row union-agg; the exact reference "
        "count is a second corpus scan that exists only for this "
        "accuracy gate — production keeps just the sketch path.",
    tags=("events", "approx", "sketch"),
)
def events_hll_partial_merge_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        "event_type",
        "user_id",
    )
    # the stored daily-partial table: (day, type) -> sketch bytes
    daily = e.groupBy("day", "event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est_users")
    )
    exact = e.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        (
            F.abs(F.col("est_users") - F.col("exact_users"))
            <= F.lit(0.05) * F.col("exact_users")
        ).alias("within_tolerance"),
    )


# ---------------------------------------------------------------------------
# Count-min sketch (round 9): the point-query frequency sketch beside
# the HLL (distinct) and Misra-Gries (top-k) family members.  CMS is
# LINEAR — a sketch of a union is the cell-wise SUM of the sketches —
# so the production shape is a stored table of daily (row, col, count)
# partials that answers any date-range frequency question by cell-wise
# addition, never re-scanning the corpus.  Estimates are Spark-side
# arithmetic (xxhash64), so — like the HLL/approx bound twins — the
# driver-checked contract is the CMS guarantee itself: est ≥ true
# (always, by construction) and est − true ≤ d·N/w on the audited
# heavy keys; oracle = constant-true table over the same key set.
# ---------------------------------------------------------------------------

CMS_W = 2048
CMS_D = 4
CMS_TOP = 20


@register(
    "events_cms_frequency_bound",
    oracle=f"""
    SELECT user_id, true AS within_lower_bound, true AS within_prob_bound
    FROM (
      SELECT user_id FROM events
      GROUP BY user_id
      ORDER BY count(*) DESC, user_id ASC
      LIMIT {CMS_TOP}
    )
    """,
    doc=f"Count-min sketch frequency audit: {CMS_D}×{CMS_W} cells built "
        f"as daily (day, row, col) partials (grouped count with "
        f"map-side combine), union-merged by cell-wise sum — CMS "
        f"linearity is the 100 TB story: the daily partial table "
        f"answers any date-range point-frequency query without "
        f"re-scanning the corpus.  Point estimates (min over rows of "
        f"the hashed cell) for the {CMS_TOP} heaviest users are "
        f"audited against exact counts via the ACTUAL CMS contract "
        f"(r12 review fix — the old single check est−true ≤ d·N/w is "
        f"not a CMS guarantee at all; depth d buys confidence, not a "
        f"bound, and no deterministic sub-N error bound exists): "
        f"`within_lower_bound` pins the DETERMINISTIC half, est ≥ "
        f"true; `within_prob_bound` pins est − true ≤ e·N/w (e the "
        f"pre-rounded literal 2.718282), which each key violates with "
        f"probability ≤ e^−d ≈ 1.8% under random hashing — on this "
        f"deterministic corpus the max overestimate is 0 at both SFs, "
        f"measured, so the pinned all-true outcome is exact, and a "
        f"sketch-implementation bug inflating error past e·N/w now "
        f"FAILS the audit instead of hiding under the looser d·N/w.  "
        f"The exact-count side exists only for this gate — production "
        f"keeps the sketch path.  Probes and cells are tiny "
        f"broadcast-side tables after the one corpus aggregate.",
    tags=("events", "approx", "sketch"),
)
def events_cms_frequency_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.to_date(F.date_trunc("day", "ts")).alias("day"), "user_id"
    )
    rows = F.array(*[F.lit(i) for i in range(CMS_D)])
    pairs = e.withColumn("row", F.explode(rows)).select(
        "day",
        "row",
        F.pmod(F.xxhash64("user_id", "row"), F.lit(CMS_W)).alias("col"),
    )
    # the stored partial table: (day, row, col) -> count
    daily_cells = pairs.groupBy("day", "row", "col").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    cells = daily_cells.groupBy("row", "col").agg(F.sum("cnt").alias("cell"))
    counts = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("true_cnt"))
    heavy = counts.orderBy(F.desc("true_cnt"), F.asc("user_id")).limit(CMS_TOP)
    probes = heavy.withColumn("row", F.explode(rows)).select(
        "user_id",
        "true_cnt",
        "row",
        F.pmod(F.xxhash64("user_id", "row"), F.lit(CMS_W)).alias("col"),
    )
    est = (
        probes.join(cells, ["row", "col"])
        .groupBy("user_id", "true_cnt")
        .agg(F.min("cell").alias("est"))
    )
    total = e.agg(F.count(F.lit(1)).alias("n"))
    return est.crossJoin(F.broadcast(total)).select(
        "user_id",
        (F.col("est") >= F.col("true_cnt")).alias("within_lower_bound"),
        (
            F.col("est") - F.col("true_cnt")
            <= F.lit(2.718282) * F.col("n") / F.lit(CMS_W)
        ).alias("within_prob_bound"),
    )


@register(
    "events_value_log2_histogram",
    oracle="""
    WITH c AS (
      SELECT event_type,
             CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS cents,
             value
      FROM events
    )
    SELECT event_type,
           CAST(CASE WHEN cents <= 0 THEN 0 ELSE length(bin(cents)) END
                AS INTEGER) AS log2_bin,
           CAST(count(*) AS BIGINT) AS n_events,
           floor(min(value) * 100.0 + 0.5) / 100.0 AS min_value,
           floor(max(value) * 100.0 + 0.5) / 100.0 AS max_value
    FROM c GROUP BY event_type, log2_bin
    """,
    doc="Log2-scale value histogram per event type: bin = number of "
        "binary digits of the integer-cents value (= floor(log2)+1, "
        "computed EXACTLY as length(bin(cents)) — no cross-engine "
        "floating log at bin boundaries), the long-tail complement of "
        "the fixed-width histogram_price_bins.  Doubling buckets are "
        "what telemetry magnitudes need: a linear grid either "
        "saturates the head or loses the tail.  Scale shape: pure "
        "map-side binning folded into ONE partial aggregate; "
        "≤|types|·64 output cells.",
    tags=("events", "agg", "stats"),
)
def events_value_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cents = F.floor(F.col("value") * 100.0 + 0.5).cast("bigint")
    log2_bin = (
        F.when(cents <= 0, F.lit(0)).otherwise(F.length(F.bin(cents))).cast("int")
    )
    return e.groupBy("event_type", log2_bin.alias("log2_bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        pround(F.min("value"), 2).alias("min_value"),
        pround(F.max("value"), 2).alias("max_value"),
    )


# ---------------------------------------------------------------------------
# KMV (k-minimum-values) distinct sketch — exactly oracle-checkable
# ---------------------------------------------------------------------------

_KMV_K = 8  # fixture-sized: sf0.001 has only 15 distinct users/type;
#             production K is 256-1024 (error ~ 1/sqrt(K))

_DUCK_UH32 = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(md5(CAST(user_id AS VARCHAR)), {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    + ")"
)


@register(
    "events_kmv_distinct_users",
    oracle=f"""
    WITH uh AS (
      SELECT DISTINCT event_type, {_DUCK_UH32} AS h
      FROM events
    ), ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rk
      FROM uh
    ), kth AS (
      SELECT event_type, CAST(h AS BIGINT) AS hk
      FROM ranked WHERE rk = {_KMV_K}
    ), exact AS (
      SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
      FROM events GROUP BY event_type
    )
    SELECT e.event_type, e.n_exact,
           floor(({_KMV_K} - 1) * 4294967296.0 / k.hk * 1000000.0 + 0.5)
             / 1000000.0 AS kmv_estimate,
           floor((({_KMV_K} - 1) * 4294967296.0 / k.hk - e.n_exact)
                 / e.n_exact * 1000000.0 + 0.5) / 1000000.0 AS rel_err
    FROM exact e JOIN kth k ON k.event_type = e.event_type
    """,
    doc=f"KMV (k-minimum-values) distinct-count sketch per event type, "
        f"k={_KMV_K} (Bar-Yossef et al. 2002): keep the k smallest "
        "md5-derived 32-bit hash values of the key; estimate = "
        "(k-1) * 2^32 / h_(k).  The deliberately PORTABLE sketch "
        "beside events_hll_partial_merge_bound's DataSketches HLL: "
        "because the hash is the repo-wide md5 contract, the sketch "
        "value — not just an accuracy bound — is EXACTLY reproducible "
        "in DuckDB, so this is the one cardinality sketch whose "
        "estimate itself is oracle-checked to the last bit, with the "
        "exact count and signed relative error beside it (error ~ "
        f"1/sqrt(k); fixture k={_KMV_K} is sized to sf0.001's 15 "
        "distinct users/type — production uses 256-1024).  "
        "MERGEABILITY (the reason KMV survives 100 TB): the union of "
        "two KMV sets' k smallest is the KMV of the union — per-"
        "partition top-k then a tiny merge, never a global sort; the "
        "registered plan's per-type rank window IS that shape after "
        "the distinct (at scale: partial per-partition k-smallest "
        "aggregates, documented).  All arithmetic after the rank is "
        "one identical scalar double tree on the exact int64 h_(k).",
    tags=("events", "sketch", "stats"),
)
def events_kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    h32 = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 8),
        16,
        10,
    ).cast("bigint")
    uh = e.select("event_type", h32.alias("h")).distinct()
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        uh.select("event_type", "h", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") == _KMV_K)
        .select("event_type", F.col("h").alias("hk"))
    )
    exact = e.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("n_exact")
    )
    est = (F.lit(_KMV_K - 1) * F.lit(4294967296.0)) / F.col("hk")
    return exact.join(F.broadcast(kth), "event_type").select(
        "event_type",
        "n_exact",
        pround(est, 6).alias("kmv_estimate"),
        pround((est - F.col("n_exact")) / F.col("n_exact"), 6).alias("rel_err"),
    )


QSKETCH_PHIS = (0.25, 0.5, 0.75, 0.95)
QSKETCH_ACCURACY = 10000  # rank-error guarantee 1/accuracy
QSKETCH_TOLERANCE = 0.01  # asserted bound, slack over the guarantee


@register(
    "events_quantile_sketch_bound",
    oracle="SELECT DISTINCT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE) AS phi, "
           "true AS within_bound FROM events",
    doc=f"Accuracy-bound twin for APPROX_PERCENTILE — completes the "
        f"sketch family (HLL distinct, CMS frequency, KMV distinct, "
        f"Bloom prefilter) with the quantile sketch every 100 TB "
        f"percentile dashboard actually runs: approx_percentile's "
        f"Greenwald-Khanna state is mergeable map-side, so the corpus "
        f"never sorts.  The estimate is engine-specific, so — exactly "
        f"like events_hll_partial_merge_bound — the driver-checked "
        f"contract is the BOUND: for each phi in {QSKETCH_PHIS}, the "
        f"EXACT rank interval of the returned value (count-below, "
        f"count-at-or-below — both computed in one conditional-sum "
        f"scan) must straddle phi*n within {QSKETCH_TOLERANCE} "
        f"(guarantee is 1/{QSKETCH_ACCURACY}); oracle = constant-true "
        f"table.  Scale shape: one sketch agg (partial-merged "
        f"map-side) + one conditional-sum scan against the broadcast "
        f"1-row quantile array; no sort, no window.",
    tags=("events", "approx", "sketch"),
)
def events_quantile_sketch_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    qs = e.agg(
        F.percentile_approx(
            "value", list(QSKETCH_PHIS), QSKETCH_ACCURACY
        ).alias("qarr"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    ranks = e.crossJoin(F.broadcast(qs)).agg(
        F.first("n").alias("n"),
        *[
            F.sum((F.col("value") < F.col("qarr")[i]).cast("bigint")).alias(f"lt_{i}")
            for i in range(len(QSKETCH_PHIS))
        ],
        *[
            F.sum((F.col("value") <= F.col("qarr")[i]).cast("bigint")).alias(f"le_{i}")
            for i in range(len(QSKETCH_PHIS))
        ],
    )
    per_phi = [
        F.struct(
            F.lit(phi).alias("phi"),
            (
                # rank interval [lt+1, le] must straddle phi*n within tol:
                # lower edge not too far above, upper edge not too far below
                ((F.col(f"lt_{i}") + 1) - F.lit(phi) * F.col("n")
                 <= F.lit(QSKETCH_TOLERANCE) * F.col("n"))
                & (F.lit(phi) * F.col("n") - F.col(f"le_{i}")
                   <= F.lit(QSKETCH_TOLERANCE) * F.col("n"))
            ).alias("within_bound"),
        )
        for i, phi in enumerate(QSKETCH_PHIS)
    ]
    return ranks.select(
        F.explode(F.array(*per_phi)).alias("r")
    ).select(F.col("r.phi").alias("phi"), F.col("r.within_bound").alias("within_bound"))
