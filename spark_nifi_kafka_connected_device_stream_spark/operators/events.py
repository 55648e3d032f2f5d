"""Event-stream analytics in batch form — the reference's analytical
core (SURVEY.md §2.3 A1-A4) restated over the `events` table.

The reference's one query is: parse click events → event-time 5-minute
tumbling window → count per (source, window)
(`nifi_spark_kafka_product_view_platform.py:48-55`).  `events` is the
batch stand-in (`ts` ↔ `timestamp`, `event_type` ↔ `context.source` —
FIXTURES.md §2); the same plan runs as a stream in
`streaming/pipeline.py`, and stream-batch equivalence is asserted in
tests.

Window-start parity contract: Spark `F.window` aligns tumbling windows
to the epoch; the DuckDB oracle reproduces the bucket with
`date_trunc('minute', ts) - (minute(ts) % 5) minutes` — pure wall-time
arithmetic, valid because every real UTC offset is a multiple of the
5-minute bucket.  Window bounds are emitted as formatted strings so the
comparison is timezone-free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..registry import register
from ..sources.catalog import load_table

TS_FMT_SPARK = "yyyy-MM-dd HH:mm:ss"
TS_FMT_DUCK = "%Y-%m-%d %H:%M:%S"


def _window_cols(df: DataFrame, ts_col: str = "ts", minutes: int = 5) -> DataFrame:
    """Attach the tumbling window struct (the reference's A2 operator,
    v1:50-51) — identical expression for batch and streaming plans."""
    return df.withColumn("win", F.window(F.col(ts_col), f"{minutes} minutes"))


def _win_bounds_select() -> list:
    return [
        F.date_format("win.start", TS_FMT_SPARK).alias("window_start"),
        F.date_format("win.end", TS_FMT_SPARK).alias("window_end"),
    ]


_DUCK_BUCKET = "date_trunc('minute', ts) - to_minutes(CAST(minute(ts) % 5 AS BIGINT))"


@register(
    "product_view_counts",
    oracle=f"""
    SELECT strftime({_DUCK_BUCKET}, '{TS_FMT_DUCK}')                          AS window_start,
           strftime({_DUCK_BUCKET} + to_minutes(CAST(5 AS BIGINT)), '{TS_FMT_DUCK}') AS window_end,
           event_type AS source,
           count(*)   AS source_number
    FROM events
    GROUP BY 1, 2, 3
    """,
    doc="THE reference query (v1:48-55): event-time 5-min tumbling window × "
        "source → count, output (window_start, window_end, source, "
        "source_number) matching result1.JPG's (start, end, source, "
        "source_number). Batch form; streaming form in streaming/pipeline.py.",
    tags=("events", "window-agg", "flagship"),
)
def product_view_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        _window_cols(e)
        .groupBy("win", F.col("event_type").alias("source"))
        .agg(F.count("*").alias("source_number"))
        .select(*_win_bounds_select(), "source", "source_number")
    )


@register(
    "product_view_distinct_users",
    oracle=f"""
    SELECT strftime({_DUCK_BUCKET}, '{TS_FMT_DUCK}') AS window_start,
           event_type AS source,
           count(DISTINCT user_id) AS n_users,
           count(*)                AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    doc="The reference's *intended* distinct-user metric (comment v1:46, "
        "import v1:2 — shipped as plain count; SURVEY.md §2.3 A4) — exact "
        "variant; sketch variant is agg_approx_distinct.",
    tags=("events", "window-agg"),
)
def product_view_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        _window_cols(e)
        .groupBy("win", F.col("event_type").alias("source"))
        .agg(F.countDistinct("user_id").alias("n_users"), F.count("*").alias("n_events"))
        .select(
            F.date_format("win.start", TS_FMT_SPARK).alias("window_start"),
            "source",
            "n_users",
            "n_events",
        )
    )


@register(
    "events_json_extract",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           count(*) AS n,
           floor((sum(value)) * 100.0 + 0.5) / 100.0 AS total_value
    FROM events
    GROUP BY event_type, k_bucket
    """,
    doc="JSON payload extraction (the reference's from_json projection, "
        "v1:29-33, over the props JSON column) + aggregation on the "
        "extracted field.",
    tags=("events", "json"),
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.withColumn("k_bucket", F.get_json_object("props", "$.k").cast("bigint") % 10)
        .groupBy("event_type", "k_bucket")
        .agg(F.count("*").alias("n"), pround(F.sum("value"), 2).alias("total_value"))
    )


def _sessionized(e):
    """30-min-gap sessionization over exact integer microseconds: adds
    `session_seq` per user via the shared lag + running-sum window pair
    (ONE user-key exchange serves both).  Used by events_sessionize and
    events_bounce_rate_daily — one definition, one gap constant.

    Boundary contract: a gap of EXACTLY 30:00 starts a NEW session
    (`>=`), matching F.session_window's half-open [ts, ts+gap) — r12
    review fix: the lag-based family used `>` while the native op and
    the streaming twin split at equality, so batch-vs-streaming session
    counts could disagree on exact-gap events despite every op passing
    its own mirrored oracle."""
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(prev.isNull() | ((F.col("us") - prev) >= 1_800_000_000), 1).otherwise(0),
    )
    return flagged.withColumn(
        "session_seq", F.sum("new_session").over(wrun).cast("bigint")
    )


@register(
    "events_sessionize",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events
    ), flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN us - lag(us) OVER w >= 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id, us,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY us ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM flagged
    )
    SELECT user_id,
           CAST(session_seq AS BIGINT) AS session_seq,
           count(*) AS n_events,
           max(us) - min(us) AS duration_us
    FROM sessions
    GROUP BY user_id, session_seq
    """,
    doc="Sessionization (30-min inactivity gap) via lag + running sum — the "
        "batch analog of streaming session_window; one shuffle on user_id, "
        "both windows share the same partitioning so Catalyst plans a single "
        "exchange.",
    tags=("events", "window", "session"),
)
def events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    # gap detection on exact integer microseconds (engine-portable; float
    # epoch would differ at ns granularity between engines)
    e = load_table(spark, sf_dir, "events").withColumn("us", F.col("ts_us"))
    sessions = _sessionized(e)
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count("*").alias("n_events"),
        (F.max("us") - F.min("us")).alias("duration_us"),
    )


@register(
    "events_hourly_stats",
    oracle="""
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
           event_type,
           count(*)               AS n,
           floor((sum(value)) * 100.0 + 0.5) / 100.0   AS sum_value,
           floor((avg(value)) * 10000.0 + 0.5) / 10000.0   AS avg_value,
           floor((min(value)) * 1000000.0 + 0.5) / 1000000.0   AS min_value,
           floor((max(value)) * 1000000.0 + 0.5) / 1000000.0   AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="Hourly rollup with the full min/max/avg/sum stat family — the "
        "foreachBatch re-aggregation pattern (v2:9-14) as a batch operator.",
    tags=("events", "window-agg"),
)
def events_hourly_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), TS_FMT_SPARK).alias("hour_start"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            pround(F.sum("value"), 2).alias("sum_value"),
            pround(F.avg("value"), 4).alias("avg_value"),
            pround(F.min("value"), 6).alias("min_value"),
            pround(F.max("value"), 6).alias("max_value"),
        )
    )


@register(
    "events_gapfill_hourly",
    oracle="""
    WITH counts AS (
      SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n
      FROM events GROUP BY 1, 2
    ), buckets AS (
      SELECT unnest(generate_series((SELECT min(h) FROM counts),
                                    (SELECT max(h) FROM counts),
                                    INTERVAL 1 HOUR)) AS h
    ), types AS (
      SELECT DISTINCT event_type FROM counts
    )
    SELECT strftime(b.h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           t.event_type,
           coalesce(c.n, 0) AS n
    FROM buckets b
    CROSS JOIN types t
    LEFT JOIN counts c ON c.h = b.h AND c.event_type = t.event_type
    """,
    doc="Time-series gap filling: dense hourly grid (sequence+explode × "
        "distinct keys) left-joined with actual counts, zeros filled — the "
        "resample-with-gaps primitive. Grid bounds are DERIVED from the "
        "data's min/max hour (r12 review fix: the old hardcoded "
        "2024-01-01..31 grid silently dropped any event outside it and "
        "reported confident zeros for weeks the data never covered — "
        "fine until the fixture span moved). Grid generation is "
        "O(buckets×keys), independent of fact size; the counts side is "
        "one hash-agg feeding both the grid bounds and the join.",
    tags=("events", "timeseries"),
)
def events_gapfill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        F.date_trunc("hour", "ts").alias("h"), F.col("event_type").alias("ct")
    ).agg(F.count("*").alias("n")).localCheckpoint(eager=False)
    buckets = counts.agg(
        F.min("h").alias("h0"), F.max("h").alias("h1")
    ).select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    )
    types = counts.select("ct").distinct()
    # USING-join on the shared names: the grid derives FROM counts, so
    # column-object join conditions would be ambiguous self-join refs
    return (
        buckets.crossJoin(F.broadcast(types))
        .join(counts, ["h", "ct"], "left")
        .select(
            F.date_format("h", TS_FMT_SPARK).alias("hour_start"),
            F.col("ct").alias("event_type"),
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@register(
    "events_top_sources_per_window",
    oracle="""
    SELECT * FROM (
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
             event_type AS source,
             count(*)   AS source_number,
             row_number() OVER (PARTITION BY date_trunc('hour', ts)
                                ORDER BY count(*) DESC, event_type ASC) AS rnk
      FROM events
      GROUP BY date_trunc('hour', ts), event_type
    ) WHERE rnk <= 3
    """,
    doc="The v2 foreachBatch 'sort each epoch by count desc' emit "
        "(v2:9-14, SURVEY.md §2.4 O1) as a deterministic top-k per window "
        "— rank-in-partition instead of a global per-batch sort.",
    tags=("events", "topk"),
)
def events_top_sources_per_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        F.date_trunc("hour", "ts").alias("hour"),
        F.col("event_type").alias("source"),
    ).agg(F.count("*").alias("source_number"))
    w = Window.partitionBy("hour").orderBy(F.desc("source_number"), F.asc("source"))
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select(
            F.date_format("hour", TS_FMT_SPARK).alias("hour_start"),
            "source",
            "source_number",
            "rnk",
        )
    )


# ---------------------------------------------------------------------------
# Hot-key skew demonstration pair (functions/scale.py salted_agg at bench
# scale). ~50% of all events are remapped onto ONE group key
# (user_id % 2 = 0 → 'hot') — the skew regime where a plain groupBy
# funnels half the table into a single reducer. The two queries compute
# IDENTICAL results (same oracle), differing only in plan shape, so the
# bench rows measure the salting overhead/benefit directly and the
# driver hash-checks both. Money sums run in exact integer cents so the
# result is independent of summation order (plain vs salted vs DuckDB).

_SKEW_ORACLE = """
    SELECT CASE WHEN user_id % 2 = 0 THEN 'hot' ELSE event_type END AS source_key,
           count(*) AS n_events,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
             AS total_value,
           min(value) AS min_value,
           max(value) AS max_value
    FROM events
    GROUP BY 1
"""


def _hot_keyed_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    key = (
        F.when(F.col("user_id") % 2 == 0, F.lit("hot"))
        .otherwise(F.col("event_type"))
        .alias("source_key")
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint")
    return e.select(key, cents.alias("cents"), "value")


@register(
    "skew_hot_key_plain",
    oracle=_SKEW_ORACLE,
    doc="Baseline for the skew pair: plain groupBy on the hot-keyed "
        "events. At local scale the map-side partial aggregation "
        "already collapses the hot key to one row per task, so this "
        "WINS here; the salted twin exists for high-cardinality-"
        "accumulator aggregations (collect/distinct-heavy) and "
        "documents the crossover honestly.",
    tags=("events", "skew"),
)
def skew_hot_key_plain(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        _hot_keyed_events(spark, sf_dir)
        .groupBy("source_key")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum("cents").cast("double") / F.lit(100.0)).alias("total_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )


@register(
    "skew_hot_key_salted",
    oracle=_SKEW_ORACLE,
    doc="functions/scale.salted_agg on the hot-keyed events: phase 1 "
        "groups on (key, hash-derived salt) bounding any single "
        "reducer's input to ~1/n_salts of the hot key, phase 2 merges "
        "the ≤ n_salts partials per key. Same result set as "
        "skew_hot_key_plain (shared oracle) — only the plan differs.",
    tags=("events", "skew"),
)
def skew_hot_key_salted(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import salted_agg

    keyed = _hot_keyed_events(spark, sf_dir)
    out = salted_agg(
        keyed,
        ["source_key"],
        {
            "n_events": (F.count(F.lit(1)), "sum"),
            "total_cents": (F.sum("cents"), "sum"),
            "min_value": (F.min("value"), "min"),
            "max_value": (F.max("value"), "max"),
        },
        n_salts=32,
    )
    return out.select(
        "source_key",
        "n_events",
        (F.col("total_cents").cast("double") / F.lit(100.0)).alias("total_value"),
        "min_value",
        "max_value",
    )


# ---------------------------------------------------------------------------
# Range / interval join — the operator class Spark has no native node
# for (a non-equi time-containment join). Incident windows OVERLAP
# (each busiest 5-min window extended by a ±2-minute blast radius), so
# no single equi-key exists and an event can attribute to multiple
# incidents — a genuine range join, not a disguised window equi-join.

INCIDENT_TOP = 10
INCIDENT_PRE_MIN = 2   # blast radius before the window
INCIDENT_POST_MIN = 2  # and after (window is 5 min → hi = start + 7)


@register(
    "events_incident_window_attribution",
    oracle=f"""
    WITH w AS (
      SELECT {_DUCK_BUCKET} AS wstart, count(*) AS n
      FROM events GROUP BY 1
      ORDER BY n DESC, wstart LIMIT {INCIDENT_TOP}
    ), iv AS (
      SELECT wstart,
             wstart - to_minutes(CAST({INCIDENT_PRE_MIN} AS BIGINT))      AS lo,
             wstart + to_minutes(CAST({5 + INCIDENT_POST_MIN} AS BIGINT)) AS hi
      FROM w
    )
    SELECT strftime(iv.wstart, '{TS_FMT_DUCK}') AS window_start,
           e.event_type,
           CAST(count(*) AS BIGINT) AS n_events
    FROM iv JOIN events e ON e.ts >= iv.lo AND e.ts < iv.hi
    GROUP BY 1, 2
    """,
    doc=f"Incident attribution via a RANGE JOIN: the {INCIDENT_TOP} "
        f"busiest 5-minute windows, each widened by a ±{INCIDENT_PRE_MIN}-"
        f"minute blast radius (so intervals OVERLAP — no equi-key "
        f"rewrite exists), joined to every event whose timestamp falls "
        f"inside.  Strategy: the interval side is tiny and bounded "
        f"(top-k), so it BROADCASTS and the non-equi predicate "
        f"evaluates map-side over the streamed fact table — a "
        f"BroadcastNestedLoopJoin that scans events exactly once, no "
        f"shuffle for the join itself.  When BOTH sides are large "
        f"(interval table ~ fact-sized), the scale rewrite is interval "
        f"bucketing: explode each interval into the coarse time "
        f"buckets it covers, equi-join fact rows on their bucket, then "
        f"re-apply the exact range predicate — shuffle bounded by "
        f"bucket width instead of |fact|x|intervals|.",
    tags=("events", "range-join"),
)
def events_incident_window_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = (
        _window_cols(e)
        .groupBy(F.col("win.start").alias("wstart"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    iv = (
        counts.orderBy(F.col("n").desc(), "wstart")
        .limit(INCIDENT_TOP)
        .select(
            "wstart",
            (F.col("wstart") - F.expr(f"INTERVAL {INCIDENT_PRE_MIN} MINUTES")).alias("lo"),
            (F.col("wstart") + F.expr(f"INTERVAL {5 + INCIDENT_POST_MIN} MINUTES")).alias("hi"),
        )
    )
    return (
        e.join(F.broadcast(iv), (F.col("ts") >= F.col("lo")) & (F.col("ts") < F.col("hi")))
        .groupBy(
            F.date_format("wstart", TS_FMT_SPARK).alias("window_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


# drift-monitor parameters (compile-time, shared with the oracle):
# trailing window size in hours, minimum history to score, z threshold
ANOMALY_TRAIL_HOURS = 24
ANOMALY_MIN_HISTORY = 12
ANOMALY_Z = 3.0


@register(
    "events_rate_anomaly",
    oracle=f"""
    WITH hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS h, count(*) AS n
      FROM events GROUP BY 1, 2
    ), grid AS (
      SELECT t.event_type, g.h
      FROM (SELECT DISTINCT event_type FROM hourly) t
      CROSS JOIN (SELECT unnest(generate_series(
                    (SELECT min(h) FROM hourly),
                    (SELECT max(h) FROM hourly),
                    INTERVAL 1 HOUR)) AS h) g
    ), dense AS (
      SELECT g.event_type, g.h, CAST(coalesce(x.n, 0) AS BIGINT) AS n
      FROM grid g LEFT JOIN hourly x
        ON x.event_type = g.event_type AND x.h = g.h
    ), scored AS (
      SELECT event_type, h, n,
             count(*)        OVER trail AS n_prev,
             avg(n)          OVER trail AS trail_mean,
             stddev_samp(n)  OVER trail AS trail_std
      FROM dense
      WINDOW trail AS (PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN {ANOMALY_TRAIL_HOURS} PRECEDING
                                AND 1 PRECEDING)
    )
    SELECT event_type,
           strftime(h, '%Y-%m-%d %H:%M:%S') AS hour_start,
           CAST(n AS BIGINT) AS n,
           floor(trail_mean * 1000000.0 + 0.5) / 1000000.0 AS trail_mean,
           floor(trail_std * 1000000.0 + 0.5) / 1000000.0 AS trail_std,
           floor(((n - trail_mean) / trail_std) * 1000000.0 + 0.5)
             / 1000000.0 AS zscore,
           abs(floor(((n - trail_mean) / trail_std) * 1000000.0 + 0.5)
               / 1000000.0) > {ANOMALY_Z} AS is_anomaly
    FROM scored
    WHERE n_prev >= {ANOMALY_MIN_HISTORY} AND trail_std > 0
    """,
    doc=f"Ingest-rate drift monitor: hourly event counts per type scored "
        f"against their own trailing {ANOMALY_TRAIL_HOURS}-hour history "
        f"(mean/stddev over a ROWS frame that EXCLUDES the current hour), "
        f"|z| > {ANOMALY_Z} flagged — the pipeline-health screen that "
        f"catches a source going dark or a duplicate flood before it "
        f"poisons a training snapshot.  The hourly series is DENSIFIED "
        f"over the full min..max hour grid with zero-count rows (r12 "
        f"review fix): without the zero-fill a silent hour produced NO "
        f"scored row at all — the going-dark case could never flag — "
        f"and the ROWS frame spanned arbitrary wall time on sparse "
        f"series.  Rows with under {ANOMALY_MIN_HISTORY}h of history "
        f"are withheld (cold-start).  Scale shape: one grouped hourly "
        f"rollup (map-side combine), a broadcast grid densify, then a "
        f"window over (type, hour) — partition count = |types|, each a "
        f"bounded time series, so the window never sees a data-sized "
        f"partition.",
    tags=("events", "window-agg", "monitoring"),
)
def events_rate_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    bounds = hourly.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(
        F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h")
    ).crossJoin(F.broadcast(hourly.select("event_type").distinct()))
    dense = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("bigint").alias("n")
    )
    trail = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-ANOMALY_TRAIL_HOURS, -1)
    )
    scored = dense.select(
        "event_type",
        "h",
        "n",
        F.count(F.lit(1)).over(trail).alias("n_prev"),
        F.avg("n").over(trail).alias("trail_mean"),
        F.stddev_samp("n").over(trail).alias("trail_std"),
    ).filter(
        (F.col("n_prev") >= ANOMALY_MIN_HISTORY) & (F.col("trail_std") > 0)
    )
    z = pround((F.col("n") - F.col("trail_mean")) / F.col("trail_std"), 6)
    return scored.select(
        "event_type",
        F.date_format("h", TS_FMT_SPARK).alias("hour_start"),
        F.col("n").cast("bigint").alias("n"),
        pround("trail_mean", 6).alias("trail_mean"),
        pround("trail_std", 6).alias("trail_std"),
        z.alias("zscore"),
        (F.abs(z) > F.lit(ANOMALY_Z)).alias("is_anomaly"),
    )


@register(
    "events_session_window_native",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events
    ), flagged AS (
      SELECT user_id, us,
             CASE WHEN us - lag(us) OVER w >= 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session,
             event_id
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id, us,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY us ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                             AND CURRENT ROW) AS seq
      FROM flagged
    )
    SELECT user_id,
           CAST(min(us) AS BIGINT) AS start_us,
           CAST(max(us) + 1800000000 AS BIGINT) AS end_us,
           count(*) AS n_events
    FROM sessions
    GROUP BY user_id, seq
    """,
    doc="Built-in `F.session_window` (30-min gap) run in BATCH mode, "
        "oracle-checked against the gaps-and-islands SQL formulation — "
        "pinning that Spark's native session operator and the classic "
        "lag+running-sum rewrite (`events_sessionize`) define the SAME "
        "sessions (session_window's half-open [ts, ts+gap) means a gap "
        "of exactly 30:00 starts a new session, hence `>=` in the "
        "oracle; tied timestamps are one session in both engines, with "
        "the running sum tie-broken on event_id).  The window is built "
        "on `timestamp_micros(ts_us)` — the STORED instant — and the "
        "bounds are emitted as exact integer micros, so session "
        "grouping and output are both immune to the consumer session "
        "timezone, including DST zones where the wall-time rendering "
        "trick would shift gaps (the sibling events_sessionize made "
        "the same choice).  This is the operator the STREAMING plane "
        "uses (streaming/stateful.session_window_counts); proving it "
        "against an independent SQL oracle in batch is the strongest "
        "correctness signal available for the streaming twin.  One "
        "shuffle on the session key.",
    tags=("events", "session", "window-agg"),
)
def events_session_window_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    inst = e.select("user_id", F.timestamp_micros(F.col("ts_us")).alias("t"))
    return (
        inst.groupBy("user_id", F.session_window("t", "30 minutes").alias("sw"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros("sw.start").alias("start_us"),
            F.unix_micros("sw.end").alias("end_us"),
            "n_events",
        )
    )


@register(
    "events_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts) // 1000 ASC,
                                             event_id ASC) AS to_type
      FROM events
    ), pairs AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    )
    SELECT from_type, to_type, n,
           floor((n * 1.0 / sum(n) OVER (PARTITION BY from_type))
                 * 1000000.0 + 0.5) / 1000000.0 AS prob
    FROM pairs
    """,
    doc="First-order Markov transition matrix over per-user event "
        "sequences: P(next event type | current), the behavioral model "
        "under next-action prediction and bot/anomaly screens "
        "(impossible-transition detection).  Ordering uses exact integer "
        "microseconds + event_id so the sequence is engine-portable.  "
        "Scale shape: ONE shuffle on user_id for the lead() sequencing "
        "(each user's timeline is a bounded partition), then a "
        "|types|²-row aggregate; the row-normalization window runs over "
        "|types| rows per partition — metadata-sized at any corpus "
        "scale.",
    tags=("events", "window", "session"),
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    share = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        "n",
        pround(F.col("n") * F.lit(1.0) / F.sum("n").over(share), 6).alias("prob"),
    )


@register(
    "events_variant_props",
    oracle="""
    SELECT event_type,
           CAST(floor(CAST(json_extract(props, '$.k') AS INTEGER) / 10.0)
                AS INTEGER)                                   AS k_decade,
           CAST(count(*) AS BIGINT)                           AS n,
           CAST(min(CAST(json_extract(props, '$.k') AS INTEGER))
                AS INTEGER)                                   AS k_min,
           CAST(max(CAST(json_extract(props, '$.k') AS INTEGER))
                AS INTEGER)                                   AS k_max,
           CAST(sum(CASE WHEN json_extract(props, '$.missing') IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT)        AS n_no_extra
    FROM events
    GROUP BY event_type, k_decade
    """,
    doc="Semi-structured shredding through Spark 4's VARIANT type "
        "(parse_json -> variant_get), the engine-native path for JSON "
        "payloads at scale: VARIANT stores a parsed binary encoding, so "
        "repeated field access skips re-parsing the JSON text per "
        "expression — the successor to the reference's from_json "
        "projection (v1:29-33) for schema-flexible payloads.  "
        "try_variant_get on an absent path returns NULL (probed by "
        "n_no_extra), matching json_extract's missing-key semantics.  "
        "All-integer outputs; the aggregate is one grouped agg with "
        "map-side combine over |types| x 10 decade buckets.",
    tags=("events", "json", "variant"),
)
def events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.try_variant_get(v, "$.k", "int")
    missing = F.try_variant_get(v, "$.missing", "int")
    return (
        e.select(
            "event_type",
            k.alias("k"),
            missing.alias("extra"),
        )
        .groupBy(
            "event_type",
            F.floor(F.col("k") / F.lit(10.0)).cast("int").alias("k_decade"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").cast("int").alias("k_min"),
            F.max("k").cast("int").alias("k_max"),
            F.sum(F.when(F.col("extra").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_no_extra"),
        )
    )


_EWMA_ALPHA = 0.2
_EWMA_SCHEMA = "event_type string, hour string, x double, ewma double"


def _ewma_group(pdf):
    """Sequential EWMA recursion per key: y_t = (1-a)*y_{t-1} + a*x_t,
    y_0 = x_0.  Explicit loop (not pandas .ewm) so the per-step float
    expression `0.8*y + 0.2*x` is TEXTUALLY the oracle's recursive-CTE
    arithmetic — multiply, multiply, add, in the same order — making
    the recursion bit-identical given bit-identical inputs (which the
    integer-cents hourly average guarantees)."""
    pdf = pdf.sort_values("hour").reset_index(drop=True)
    xs = pdf["x"].to_numpy()
    out = xs.copy()
    for i in range(1, len(xs)):
        out[i] = (1.0 - _EWMA_ALPHA) * out[i - 1] + _EWMA_ALPHA * xs[i]
    pdf["ewma"] = out
    return pdf


@register(
    "events_ewma_hourly",
    oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents,
             CAST(count(*) AS BIGINT)                        AS cnt
      FROM events GROUP BY event_type, hour
    ), seq AS (
      SELECT event_type, hour, cents / cnt / 100.0 AS x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY hour) AS BIGINT) AS rn
      FROM hourly
    ), ew AS (
      SELECT event_type, hour, x, rn, x AS ewma FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.hour, s.x, s.rn,
             {1.0 - _EWMA_ALPHA} * e.ewma + {_EWMA_ALPHA} * s.x
      FROM ew e JOIN seq s
        ON s.event_type = e.event_type AND s.rn = e.rn + 1
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           floor(x * 10000.0 + 0.5) / 10000.0    AS x,
           floor(ewma * 10000.0 + 0.5) / 10000.0 AS ewma
    FROM ew
    """,
    doc=f"Exponentially-weighted moving average (alpha={_EWMA_ALPHA}) of "
        "the hourly mean event value per event type — the classic "
        "smoothing pass behind rate dashboards and drift detectors.  "
        "EWMA is inherently sequential per key, which SQL windows can't "
        "express; the engine shape is: (1) hourly pre-aggregation in "
        "integer cents (exact, order-independent — this is what makes "
        "the recursion cross-engine bit-identical AND shrinks the data "
        "from |events| to |types|x|hours| BEFORE Python), then (2) "
        "applyInPandas per event_type running the linear recursion over "
        "the bounded per-key timeline.  At 100 TB the Python boundary "
        "sees only the pre-aggregated frame — thousands of rows per "
        "key-year, not the raw stream.  Oracle: per-group recursive CTE "
        "with the identical fp expression.  Observation-indexed (gap "
        "hours skipped, not zero-filled; the gapfill op composes "
        "upstream when calendar indexing is wanted).  The hour is "
        "emitted as a formatted string: collected TimestampType values "
        "render in the Python process tz while the driver's oracle "
        "compares naive wall time — strings make the column "
        "session-tz-proof (same contract as events_hourly_stats).",
    tags=("events", "timeseries", "udf"),
)
def events_ewma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy(
            "event_type", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(
            F.sum(
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
            ).alias("cents"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "event_type",
            F.date_format("hour", TS_FMT_SPARK).alias("hour"),
            (F.col("cents") / F.col("cnt") / F.lit(100.0)).alias("x"),
        )
    )
    out = hourly.groupBy("event_type").applyInPandas(
        _ewma_group, schema=_EWMA_SCHEMA
    )
    return out.select(
        "event_type",
        "hour",
        pround("x", 4).alias("x"),
        pround("ewma", 4).alias("ewma"),
    )


@register(
    "events_rolling_distinct_users_7d",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), days AS (
      SELECT DISTINCT day FROM ud
    ), contrib AS (
      SELECT u.user_id, d.day AS window_day
      FROM ud u JOIN days d
        ON d.day BETWEEN u.day AND u.day + INTERVAL 6 DAY
    )
    SELECT strftime(window_day, '%Y-%m-%d')     AS day,
           CAST(count(DISTINCT user_id) AS BIGINT) AS users_7d
    FROM contrib GROUP BY window_day
    """,
    doc="Trailing-7-day rolling distinct users per observed day — the "
        "classic sliding-window-distinct problem (WAU over a daily "
        "grid).  Distinct is not decomposable over overlapping windows, "
        "so no window function expresses this; the naive shape is an "
        "O(|days| x corpus) range self-join.  The scale shape used "
        "here: (1) dedup to (user, active-day) pairs — one shuffle, "
        "map-side combine, output bounded by |users| x |days|; (2) "
        "EXPLODE each pair to the <= 7 window-days it contributes to — "
        "map-only, bounded x7 row expansion, no join against the "
        "corpus; (3) semi-restrict to observed days via a broadcast of "
        "the tiny day list; (4) one distinct-count per day.  At 100 TB "
        "the corpus is touched once; everything after step 1 operates "
        "on the users x days frame.  Day emitted as a formatted string "
        "(session-tz-proof, same contract as events_hourly_stats).",
    tags=("events", "window-agg", "scale"),
)
def events_rolling_distinct_users_7d(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # lazily checkpointed: the day list below derives from the deduped
    # pairs, not a second corpus scan (blocks reclaimed with the session)
    ud = (
        e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    days = ud.select("day").distinct().withColumnRenamed("day", "window_day")
    contrib = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
        ).alias("window_day"),
    )
    return (
        contrib.join(F.broadcast(days), "window_day")
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").alias("users_7d"))
        .select(
            F.date_format("window_day", "yyyy-MM-dd").alias("day"),
            "users_7d",
        )
    )


@register(
    "events_conversion_latency",
    oracle="""
    SELECT CAST(user_id AS BIGINT)                          AS user_id,
           strftime(min(ts) FILTER (WHERE event_type = 'view'),
                    '%Y-%m-%d %H:%M:%S')                    AS first_view,
           strftime(min(ts) FILTER (WHERE event_type = 'purchase'),
                    '%Y-%m-%d %H:%M:%S')                    AS first_purchase,
           CAST(date_diff('second',
                          min(ts) FILTER (WHERE event_type = 'view'),
                          min(ts) FILTER (WHERE event_type = 'purchase'))
                AS BIGINT)                                  AS latency_s
    FROM events
    GROUP BY user_id
    HAVING min(ts) FILTER (WHERE event_type = 'view') IS NOT NULL
       AND min(ts) FILTER (WHERE event_type = 'purchase')
           > min(ts) FILTER (WHERE event_type = 'view')
    """,
    doc="Time-to-convert per user: first 'view' -> first LATER "
        "'purchase', latency in whole seconds (floor-epoch difference "
        "in both engines, so the cross-engine contract is exact "
        "integers, not fp durations).  The funnel-latency complement "
        "of funnel_view_click_purchase: that query counts who "
        "converts, this one measures how long conversion takes — the "
        "standard product-analytics pair over the reference's "
        "view-event firehose (v1:15-20).  Scale shape: ONE grouped "
        "aggregate over the corpus with conditional-min partial "
        "aggregation map-side — no per-user sort, no self-join of "
        "views against purchases (the naive shape, corpus x corpus); "
        "the HAVING runs post-agg on |users| rows.",
    tags=("events", "funnel", "agg"),
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    first_view = F.min(F.when(F.col("event_type") == "view", F.col("ts")))
    first_purchase = F.min(F.when(F.col("event_type") == "purchase", F.col("ts")))
    return (
        e.groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            first_view.alias("fv"),
            first_purchase.alias("fp"),
        )
        .filter(F.col("fv").isNotNull() & (F.col("fp") > F.col("fv")))
        .select(
            "user_id",
            F.date_format("fv", TS_FMT_SPARK).alias("first_view"),
            F.date_format("fp", TS_FMT_SPARK).alias("first_purchase"),
            (F.unix_timestamp("fp") - F.unix_timestamp("fv"))
            .cast("bigint")
            .alias("latency_s"),
        )
    )


def seasonal_baseline(hourly: DataFrame) -> DataFrame:
    """hour-of-day baseline (mu, sigma) from a (day, hour_of_day,
    n_events) frame — shared by the batch query and the streaming
    enrichment job so live scoring and backfill cannot drift."""
    return hourly.groupBy("hour_of_day").agg(
        F.avg("n_events").alias("mu"),
        F.stddev_samp("n_events").alias("sigma"),
    )


def seasonal_score(hourly: DataFrame, baseline: DataFrame) -> DataFrame:
    """Score (day, hour_of_day, n_events) rows against a broadcast
    hour-of-day baseline — the SAME select for the batch query and each
    streaming micro-batch (streaming/jobs.run_seasonal_anomaly_job)."""
    return hourly.join(F.broadcast(baseline), "hour_of_day").select(
        F.date_format("day", "yyyy-MM-dd").alias("day"),
        "hour_of_day",
        "n_events",
        pround("mu", 6).alias("baseline_mu"),
        pround((F.col("n_events") - F.col("mu")) / F.col("sigma"), 6).alias(
            "zscore"
        ),
        (
            F.abs(F.col("n_events") - F.col("mu")) > F.lit(3.0) * F.col("sigma")
        ).alias("is_anomaly"),
    )


@register(
    "events_seasonal_hourly_anomaly",
    oracle="""
    WITH hourly AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(hour(ts) AS INTEGER)           AS hour_of_day,
             CAST(count(*) AS BIGINT)            AS n_events
      FROM events GROUP BY day, hour_of_day
    ), baseline AS (
      SELECT hour_of_day,
             avg(n_events)         AS mu,
             stddev_samp(n_events) AS sigma
      FROM hourly GROUP BY hour_of_day
    )
    SELECT strftime(h.day, '%Y-%m-%d') AS day,
           h.hour_of_day,
           h.n_events,
           floor(b.mu * 1000000.0 + 0.5) / 1000000.0 AS baseline_mu,
           floor((h.n_events - b.mu) / b.sigma * 1000000.0 + 0.5) / 1000000.0
             AS zscore,
           abs(h.n_events - b.mu) > 3.0 * b.sigma AS is_anomaly
    FROM hourly h JOIN baseline b USING (hour_of_day)
    """,
    doc="Seasonal (hour-of-day) ingest-volume anomaly screen: each "
        "(day, hour) bucket's event count z-scored against the "
        "baseline built from the SAME hour-of-day across all observed "
        "days — the diurnal-pattern-aware sibling of "
        "events_rate_anomaly (which uses a trailing window and so "
        "flags every morning ramp-up).  Scale shape: corpus -> hourly "
        "counts is ONE grouped agg with map-side combine (|days|x24 "
        "rows out); the baseline aggregates those to 24 rows and "
        "joins back via broadcast — the corpus is scanned once and "
        "nothing downstream exceeds |days|x24.  Buckets with zero "
        "events are absent (not zero-counted): the baseline describes "
        "observed traffic, and a silent-hour detector belongs to the "
        "rate monitor.  z/mu rounded to 6dp in both engines; the "
        "inputs are exact integer counts so the doubles agree "
        "bit-for-bit cross-engine.",
    tags=("events", "anomaly", "agg"),
)
def events_seasonal_hourly_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    # consumed twice (baseline + join back): |days|x24 rows — materialize
    # lazily so the corpus is scanned ONCE, not once per consumer
    hourly = (
        e.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.hour("ts").cast("int").alias("hour_of_day"),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .localCheckpoint(eager=False)
    )
    return seasonal_score(hourly, seasonal_baseline(hourly))


GAP_TIMEOUT_US = 3_600_000_000  # 1 hour: a device is "down" past this


@register(
    "events_time_weighted_value",
    oracle="""
    WITH seq AS (
      SELECT user_id,
             CAST(date_trunc('day', ts) AS DATE) AS day,
             CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents,
             epoch_ns(ts) // 1000 AS us,
             lead(epoch_ns(ts) // 1000) OVER (
               PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
               ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC) AS next_us
      FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           strftime(day, '%Y-%m-%d') AS day,
           CAST(count(*) AS BIGINT)  AS n_intervals,
           floor(CAST(sum(cents * (next_us - us)) AS DOUBLE)
                 / sum(next_us - us) / 100.0 * 1000000.0 + 0.5) / 1000000.0
             AS twa_value
    FROM seq
    WHERE next_us IS NOT NULL
    GROUP BY user_id, day
    """,
    doc="Time-weighted average of the reading per (device, day) — THE "
        "correct daily mean for irregularly-sampled device telemetry "
        "(the reference's connected-device stream, v1:15-20): each "
        "reading holds until the next one, so its weight is the "
        "interval length, not 1 (a plain avg over-counts burst "
        "periods).  Last-of-day readings carry no interval "
        "(left-constant hold, standard TWA convention); single-reading "
        "days drop out.  Exact arithmetic: integer cents x integer "
        "microseconds summed as bigint, ONE double division at the "
        "end (rounded 6dp in both engines).  Scale shape: one shuffle "
        "on (user, day), lead() and the grouped agg share the sort — "
        "Catalyst plans a single exchange; nothing downstream exceeds "
        "|devices| x |days|.",
    tags=("events", "timeseries", "window"),
)
def events_time_weighted_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date(F.date_trunc("day", "ts")).alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
        F.col("ts_us").alias("us"),
        "event_id",
    )
    w = Window.partitionBy("user_id", "day").orderBy(F.asc("us"), F.asc("event_id"))
    seq = e.withColumn("next_us", F.lead("us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    dt = F.col("next_us") - F.col("us")
    return (
        # group on the RAW window keys so the agg reuses the window's
        # hash partitioning (casting/formatting in the keys would force
        # a second exchange); project the display forms afterwards
        seq.groupBy("user_id", "day")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("cents") * dt).alias("wsum"),
            F.sum(dt).alias("tsum"),
        )
        .select(
            F.col("user_id").cast("bigint").alias("user_id"),
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "n_intervals",
            pround(F.col("wsum").cast("double") / F.col("tsum") / F.lit(100.0), 6)
            .alias("twa_value"),
        )
    )


@register(
    "events_device_uptime",
    oracle=f"""
    WITH seq AS (
      SELECT user_id,
             epoch_ns(ts) // 1000 AS us,
             lead(epoch_ns(ts) // 1000) OVER (
               PARTITION BY user_id
               ORDER BY epoch_ns(ts) // 1000 ASC, event_id ASC) AS next_us
      FROM events
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) + 1 AS BIGINT)            AS n_readings,
           CAST(max(next_us) - min(us) AS BIGINT)  AS span_us,
           CAST(max(next_us - us) AS BIGINT)       AS max_gap_us,
           CAST(count(*) FILTER (WHERE next_us - us > {GAP_TIMEOUT_US})
                AS BIGINT)                         AS n_outages,
           floor(CAST(sum(least(next_us - us, {GAP_TIMEOUT_US})) AS DOUBLE)
                 / (max(next_us) - min(us)) * 1000000.0 + 0.5) / 1000000.0
             AS uptime_fraction
    FROM seq
    WHERE next_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="Device uptime / outage report per device: heartbeat-style "
        "coverage where each reading keeps the device 'up' for at most "
        "1 hour (GAP_TIMEOUT_US), so uptime_fraction = covered time / "
        "observed span, plus the outage count and worst gap — the "
        "fleet-health screen for the reference's device stream.  All "
        "interval math is exact integer microseconds; one double "
        "division at the end (6dp, engine-portable).  Scale shape: "
        "ONE shuffle on user_id shared by the lead() window and the "
        "grouped agg (same partitioning), output |devices| rows.",
    tags=("events", "timeseries", "window"),
)
def events_device_uptime(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts_us").alias("us"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    seq = e.withColumn("next_us", F.lead("us").over(w)).filter(
        F.col("next_us").isNotNull()
    )
    gap = F.col("next_us") - F.col("us")
    return (
        seq.groupBy(F.col("user_id").cast("bigint").alias("user_id"))
        .agg(
            (F.count(F.lit(1)) + 1).cast("bigint").alias("n_readings"),
            (F.max("next_us") - F.min("us")).cast("bigint").alias("span_us"),
            F.max(gap).cast("bigint").alias("max_gap_us"),
            F.sum((gap > GAP_TIMEOUT_US).cast("bigint"))
            .cast("bigint")
            .alias("n_outages"),
            F.sum(F.least(gap, F.lit(GAP_TIMEOUT_US))).alias("covered_us"),
        )
        .select(
            "user_id",
            "n_readings",
            "span_us",
            "max_gap_us",
            "n_outages",
            pround(
                F.col("covered_us").cast("double") / F.col("span_us"), 6
            ).alias("uptime_fraction"),
        )
    )


ATTRIBUTION_LOOKBACK_US = 3_600_000_000  # credit clicks from the prior hour


@register(
    "events_linear_attribution",
    oracle=f"""
    WITH p AS (
      SELECT user_id, event_id AS p_event, epoch_ns(ts) // 1000 AS p_us
      FROM events WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, event_id AS c_event, epoch_ns(ts) // 1000 AS c_us,
             CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS campaign
      FROM events WHERE event_type = 'click'
    ), touches AS (
      SELECT p.p_event, c.campaign,
             count(*) OVER (PARTITION BY p.p_event) AS n_touches,
             row_number() OVER (PARTITION BY p.p_event
                                ORDER BY c.c_us, c.c_event) AS touch_rank
      FROM p JOIN c ON c.user_id = p.user_id
       AND c.c_us >= p.p_us - {ATTRIBUTION_LOOKBACK_US} AND c.c_us < p.p_us
    )
    SELECT campaign,
           CAST(count(*) AS BIGINT)                  AS n_touches,
           CAST(count(DISTINCT p_event) AS BIGINT)   AS n_purchases,
           CAST(sum(1000000 // n_touches
                    + CASE WHEN touch_rank <= 1000000 % n_touches
                           THEN 1 ELSE 0 END) AS BIGINT) AS credit_ppm
    FROM touches GROUP BY campaign
    """,
    doc="Multi-touch LINEAR attribution: every click by the purchasing "
        "user in the hour before a purchase shares that purchase's "
        "credit equally (the complement of asof_join_last_click's "
        "last-touch model).  Credit is EXACT integer parts-per-million "
        "— 1e6 div n per touch plus one extra ppm to the first "
        "(1e6 mod n) touches in (time, click-id) order, so every "
        "purchase distributes EXACTLY 1e6 ppm (r12 review fix: the "
        "plain floor leaked the remainder and campaign totals stopped "
        "reconciling) — and cross-engine sums cannot drift the way "
        "float 1/n summation order would.  Scale shape: the touch join "
        "is an equi-join on user_id with the time-range predicate "
        "applied inside the match — pair blow-up bounded per user, "
        "never |clicks| x |purchases|; per-purchase touch counts come "
        "from one window over the joined frame; the campaign roll-up "
        "aggregates |campaigns| rows.  The campaign stand-in is the "
        "props.k bucket (the reference wire's payload field, v1:15-20).",
    tags=("events", "attribution", "range-join"),
)
def events_linear_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    p = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("p_event"), F.col("ts_us").alias("p_us")
    )
    c = e.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ts_us").alias("c_us"),
        (F.get_json_object("props", "$.k").cast("bigint") % 10).alias("campaign"),
    )
    touches = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_us") >= F.col("p_us") - ATTRIBUTION_LOOKBACK_US)
        & (F.col("c_us") < F.col("p_us")),
    )
    # credit CONSERVATION (r12 review fix): floor(1e6/n) per touch
    # leaked (1e6 mod n) ppm per purchase, so campaign credit no longer
    # reconciled against 1e6 x purchases.  The remainder goes to the
    # FIRST (1e6 mod n) touches in the deterministic (c_us, click id)
    # order — every purchase now hands out exactly 1,000,000 ppm.
    w = Window.partitionBy("p_event")
    w_rank = Window.partitionBy("p_event").orderBy("c_us", "c_event")
    credited = touches.withColumn(
        "n_touches", F.count(F.lit(1)).over(w)
    ).withColumn("touch_rank", F.row_number().over(w_rank))
    credit = F.expr(
        "CAST(1000000 div n_touches AS BIGINT)"
        " + CASE WHEN touch_rank <= 1000000 % n_touches THEN 1 ELSE 0 END"
    )
    return (
        credited.groupBy("campaign")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.countDistinct("p_event").alias("n_purchases"),
            F.sum(credit).cast("bigint").alias("credit_ppm"),
        )
    )


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


# Holt double-exponential smoothing: binary-exact constants (0.5, 0.25)
# so (1-alpha)/(1-beta) are exactly representable and the cross-engine
# fp recursion cannot drift on constant rounding.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.25

_HOLT_SCHEMA = (
    "event_type string, hour string, x double, level double, trend double, "
    "forecast_next double"
)


def _holt_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("hour").reset_index(drop=True)
    xs = pdf["x"].to_numpy()
    level = xs.copy()
    trend = xs * 0.0
    for i in range(1, len(xs)):
        lp, bp = level[i - 1], trend[i - 1]
        level[i] = HOLT_ALPHA * xs[i] + (1.0 - HOLT_ALPHA) * (lp + bp)
        trend[i] = HOLT_BETA * (level[i] - lp) + (1.0 - HOLT_BETA) * bp
    pdf["level"] = level
    pdf["trend"] = trend
    pdf["forecast_next"] = level + trend
    return pdf


@register(
    "events_holt_forecast_hourly",
    oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS cents,
             CAST(count(*) AS BIGINT)                        AS cnt
      FROM events GROUP BY event_type, hour
    ), seq AS (
      SELECT event_type, hour, cents / cnt / 100.0 AS x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY hour) AS BIGINT) AS rn
      FROM hourly
    ), holt AS (
      SELECT event_type, hour, x, rn, x AS l, CAST(0.0 AS DOUBLE) AS b
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.hour, s.x, s.rn,
             {HOLT_ALPHA} * s.x + {1.0 - HOLT_ALPHA} * (h.l + h.b),
             {HOLT_BETA} * (({HOLT_ALPHA} * s.x + {1.0 - HOLT_ALPHA} * (h.l + h.b)) - h.l)
               + {1.0 - HOLT_BETA} * h.b
      FROM holt h JOIN seq s
        ON s.event_type = h.event_type AND s.rn = h.rn + 1
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           floor(x * 10000.0 + 0.5) / 10000.0       AS x,
           floor(l * 10000.0 + 0.5) / 10000.0       AS level,
           floor(b * 10000.0 + 0.5) / 10000.0       AS trend,
           floor((l + b) * 10000.0 + 0.5) / 10000.0 AS forecast_next
    FROM holt
    """,
    doc=f"Holt double-exponential smoothing (alpha={HOLT_ALPHA}, "
        f"beta={HOLT_BETA}) over the hourly mean value per event type: "
        f"level + trend state with a one-step-ahead forecast — the "
        f"capacity-planning / drift-forecast extension of "
        f"events_ewma_hourly (same engine shape: exact integer-cents "
        f"hourly pre-aggregate BEFORE Python, then applyInPandas "
        f"running the 2-state linear recursion per bounded key "
        f"timeline; the Python boundary sees |types|x|hours| rows, "
        f"never the raw stream).  Initialization l1=x1, b1=0 "
        f"(trend warms up from the second point).  Both smoothing "
        f"constants are binary-exact so the coupled recursion is "
        f"bit-identical to the oracle's recursive CTE carrying (l, b) "
        f"— the 2-state proof that the sequential-recursion pattern "
        f"generalizes beyond single-state EWMA.",
    tags=("events", "timeseries", "udf", "forecast"),
)
def events_holt_forecast_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(
            F.sum(
                F.floor(F.col("value") * F.lit(100.0) + F.lit(0.5)).cast("bigint")
            ).alias("cents"),
            F.count(F.lit(1)).alias("cnt"),
        )
        .select(
            "event_type",
            F.date_format("hour", TS_FMT_SPARK).alias("hour"),
            (F.col("cents") / F.col("cnt") / F.lit(100.0)).alias("x"),
        )
    )
    out = hourly.groupBy("event_type").applyInPandas(
        _holt_group, schema=_HOLT_SCHEMA
    )
    return out.select(
        "event_type",
        "hour",
        pround("x", 4).alias("x"),
        pround("level", 4).alias("level"),
        pround("trend", 4).alias("trend"),
        pround("forecast_next", 4).alias("forecast_next"),
    )


# chi-square 95th-percentile critical values by dof (1..6), each a
# pre-rounded single literal.  SELECTED by the observed per-day dof —
# r12 review fix, twice over: the old pinned 9.488 assumed dof=4 ("5
# event types") while the fixture alphabet has 4 types (dof=3, crit
# 7.815), and zero-observed cells were dropped from the statistic
# entirely (a type VANISHING — the strongest composition drift — only
# shrank dof instead of contributing its full exp-sized term).
_CHI2_CRIT_BY_DF = {1: 3.841, 2: 5.991, 3: 7.815, 4: 9.488, 5: 11.07, 6: 12.592}


def _chi2_crit_sql(dof_expr: str) -> str:
    return (
        f"CASE {dof_expr} "
        + " ".join(
            f"WHEN {df} THEN {v}" for df, v in sorted(_CHI2_CRIT_BY_DF.items())
        )
        + " ELSE 12.592 END"
    )


@register(
    "events_chi2_mix_drift_daily",
    oracle=f"""
    WITH cell AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
             CAST(count(*) AS BIGINT) AS obs
      FROM events GROUP BY day, event_type
    ), grid AS (
      SELECT d.day, t.event_type
      FROM (SELECT DISTINCT day FROM cell) d
      CROSS JOIN (SELECT DISTINCT event_type FROM cell) t
    ), full_cell AS (
      SELECT g.day, g.event_type, CAST(coalesce(c.obs, 0) AS BIGINT) AS obs
      FROM grid g LEFT JOIN cell c
        ON c.day = g.day AND c.event_type = g.event_type
    ), day_tot AS (
      SELECT day, CAST(sum(obs) AS BIGINT) AS n_d FROM full_cell GROUP BY day
    ), type_tot AS (
      SELECT event_type, CAST(sum(obs) AS BIGINT) AS c_t
      FROM full_cell GROUP BY event_type
    ), grand AS (
      SELECT CAST(sum(obs) AS BIGINT) AS n FROM full_cell
    ), terms AS (
      SELECT c.day,
             pow(c.obs - CAST(d.n_d AS DOUBLE) * t.c_t / g.n, 2)
               / (CAST(d.n_d AS DOUBLE) * t.c_t / g.n) AS term
      FROM full_cell c
      JOIN day_tot d ON d.day = c.day
      JOIN type_tot t ON t.event_type = c.event_type
      CROSS JOIN grand g
    )
    SELECT strftime(day, '%Y-%m-%d')           AS day,
           CAST(count(*) - 1 AS INTEGER)       AS dof,
           floor(sum(term) * 1000000.0 + 0.5) / 1000000.0 AS chi2,
           sum(term) > ({_chi2_crit_sql('CAST(count(*) - 1 AS INTEGER)')})
             AS drift_flag
    FROM terms GROUP BY day
    """,
    doc="Categorical mix-drift screen (the chi-square complement of "
        "the KS length-drift op): each day's event-type mix tested "
        "against the all-time mix over the FULL day x global-alphabet "
        "grid — a (day, type) cell with zero events still contributes "
        "its (0-exp)^2/exp = exp term, which is exactly the signal "
        "when a type vanishes for a day (r12 review fix; the old "
        "observed-cells-only grouping understated chi2 and shrank dof "
        "in that case).  Flagged past the 95th-percentile critical "
        "value SELECTED by the per-day dof (= |alphabet|-1; the old "
        "pinned dof=4 literal under-rejected on the 4-type fixture).  "
        "Catches a day where the TYPE composition shifted (error "
        "spike, signup flood) even when total volume looks normal — "
        "the companion to events_rate_anomaly, which sees volume but "
        "not composition.  Scale shape: ONE grouped agg collapses the "
        "corpus to |days|x|types| cells, densified by a broadcast "
        "cross with the tiny type alphabet; margins derive from the "
        "cells (corpus scanned once, cell table checkpointed); "
        "everything after is grid math with broadcast margins.  "
        "Exact integer counts; per-cell double terms rounded post-sum "
        "at 6dp.",
    tags=("events", "drift", "stats"),
)
def events_chi2_mix_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cell = (
        e.groupBy(
            F.to_date(F.date_trunc("day", "ts")).alias("day"), "event_type"
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("obs"))
        .localCheckpoint(eager=False)
    )
    grid = cell.select("day").distinct().crossJoin(
        F.broadcast(cell.select("event_type").distinct())
    )
    full_cell = grid.join(cell, ["day", "event_type"], "left").select(
        "day",
        "event_type",
        F.coalesce(F.col("obs"), F.lit(0)).cast("bigint").alias("obs"),
    )
    day_tot = full_cell.groupBy("day").agg(
        F.sum("obs").cast("bigint").alias("n_d")
    )
    type_tot = full_cell.groupBy("event_type").agg(
        F.sum("obs").cast("bigint").alias("c_t")
    )
    grand = full_cell.agg(F.sum("obs").cast("bigint").alias("n"))
    exp = F.col("n_d").cast("double") * F.col("c_t") / F.col("n")
    term = F.pow(F.col("obs") - exp, F.lit(2)) / exp
    dof = (F.count(F.lit(1)) - 1).cast("int")
    crit = F.lit(None).cast("double")
    for df_, v in sorted(_CHI2_CRIT_BY_DF.items(), reverse=True):
        crit = F.when(dof == df_, F.lit(v)).otherwise(crit)
    crit = F.coalesce(crit, F.lit(12.592))
    return (
        full_cell.join(F.broadcast(day_tot), "day")
        .join(F.broadcast(type_tot), "event_type")
        .crossJoin(F.broadcast(grand))
        .select("day", term.alias("term"))
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(
            dof.alias("dof"),
            pround(F.sum("term"), 6).alias("chi2"),
            (F.sum("term") > crit).alias("drift_flag"),
        )
    )


# CUSUM: binary-exact constants again (target mu learned as the global
# hourly mean would couple the oracle to a double aggregate; a fixed
# reference + slack keeps the recursion cross-engine exact)
CUSUM_K = 0.5      # slack, in units of the standardized series
CUSUM_H = 4.0      # alarm threshold

_CUSUM_SCHEMA = (
    "event_type string, hour string, x double, cusum_pos double, "
    "cusum_neg double, alarm boolean"
)


def _cusum_group(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.sort_values("hour").reset_index(drop=True)
    xs = pdf["x"].to_numpy()
    pos = xs * 0.0
    neg = xs * 0.0
    mu = pdf["mu"].iloc[0]
    sd = pdf["sd"].iloc[0]
    for i in range(len(xs)):
        z = (xs[i] - mu) / sd
        pp = pos[i - 1] if i else 0.0
        np_ = neg[i - 1] if i else 0.0
        pos[i] = max(0.0, pp + z - CUSUM_K)
        neg[i] = max(0.0, np_ - z - CUSUM_K)
    pdf["cusum_pos"] = pos
    pdf["cusum_neg"] = neg
    pdf["alarm"] = (pos > CUSUM_H) | (neg > CUSUM_H)
    return pdf[["event_type", "hour", "x", "cusum_pos", "cusum_neg", "alarm"]]


@register(
    "events_cusum_level_shift",
    oracle=f"""
    WITH RECURSIVE hourly AS (
      SELECT event_type, date_trunc('hour', ts) AS hour,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, hour
    ), ordered AS (
      SELECT event_type, hour, CAST(n AS DOUBLE) AS x,
             CAST(row_number() OVER (PARTITION BY event_type
                                     ORDER BY hour) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_obs
      FROM hourly
    ), stats AS (
      SELECT event_type, avg(x) AS mu, stddev_samp(x) AS sd
      FROM ordered WHERE rn <= n_obs // 2 GROUP BY event_type
      HAVING count(*) >= 2 AND stddev_samp(x) > 0
    ), seq AS (
      SELECT o.event_type, o.hour, o.x, s.mu, s.sd, o.rn
      FROM ordered o JOIN stats s ON s.event_type = o.event_type
    ), cs AS (
      SELECT event_type, hour, x, mu, sd, rn,
             greatest(0.0, (x - mu) / sd - {CUSUM_K}) AS cp,
             greatest(0.0, -((x - mu) / sd) - {CUSUM_K}) AS cn
      FROM seq WHERE rn = 1
      UNION ALL
      SELECT s.event_type, s.hour, s.x, s.mu, s.sd, s.rn,
             greatest(0.0, c.cp + (s.x - s.mu) / s.sd - {CUSUM_K}),
             greatest(0.0, c.cn - ((s.x - s.mu) / s.sd) - {CUSUM_K})
      FROM cs c JOIN seq s
        ON s.event_type = c.event_type AND s.rn = c.rn + 1
    )
    SELECT event_type, strftime(hour, '%Y-%m-%d %H:%M:%S') AS hour,
           floor(x * 10000.0 + 0.5) / 10000.0  AS x,
           floor(cp * 10000.0 + 0.5) / 10000.0 AS cusum_pos,
           floor(cn * 10000.0 + 0.5) / 10000.0 AS cusum_neg,
           (cp > {CUSUM_H} OR cn > {CUSUM_H})  AS alarm
    FROM cs
    """,
    doc=f"Two-sided CUSUM change-point detector over hourly event "
        f"counts per type (slack k={CUSUM_K}, alarm h={CUSUM_H}, "
        f"series standardized by IN-CONTROL mean/stddev learned from the burn-in first half of each type's timeline — whole-series stats would let a shift contaminate its own reference): "
        f"accumulates small persistent deviations that per-point "
        f"z-scores (events_rate_anomaly) never flag individually — "
        f"the fastest detector of a sustained small level shift, "
        f"completing the monitoring family (z-score for spikes, "
        f"seasonal for diurnal shape, chi2 for composition, KS for "
        f"distributions, EWMA/Holt for smoothing/trend, CUSUM for "
        f"persistent shifts).  Same engine shape as the other "
        f"sequential recursions: hourly pre-aggregate (exact integer "
        f"counts) collapses the corpus BEFORE Python, applyInPandas "
        f"runs the max(0, prev + z - k) recursion per bounded key "
        f"timeline, and the oracle's recursive CTE carries both "
        f"cusum states.  The standardization constants (mu, sd) come "
        f"from exact integer counts, so both engines derive the "
        f"identical doubles.",
    tags=("events", "anomaly", "timeseries", "udf"),
)
def events_cusum_level_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("hour"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    w_ord = Window.partitionBy("event_type").orderBy("hour")
    w_all = Window.partitionBy("event_type")
    ordered = hourly.select(
        "event_type",
        "hour",
        F.col("n").cast("double").alias("x"),
        F.row_number().over(w_ord).cast("bigint").alias("rn"),
        F.count(F.lit(1)).over(w_all).cast("bigint").alias("n_obs"),
    ).localCheckpoint(eager=False)
    # in-control parameters from the burn-in PREFIX (first half of the
    # timeline), not the whole series: a level shift inside the window
    # would otherwise contaminate its own reference and halve the
    # detector's sensitivity (the mixture-mean trap)
    # degenerate-burn-in guard (r12 review fix): a 1-row burn-in gives
    # sd NULL (NaN z silently coerced by Python max()), a constant
    # burn-in gives sd=0 (division by zero → inf cusum, permanent
    # alarms) — both must drop the type from the scored output, same
    # HAVING predicate as the oracle (the rate-anomaly trail_std > 0
    # precedent)
    stats = (
        ordered.filter(F.col("rn") <= F.expr("n_obs div 2"))
        .groupBy("event_type")
        .agg(
            F.avg("x").alias("mu"),
            F.stddev_samp("x").alias("sd"),
            F.count(F.lit(1)).alias("_bn"),
        )
        .filter((F.col("_bn") >= 2) & (F.col("sd") > 0))
        .drop("_bn")
    )
    seq = ordered.join(F.broadcast(stats), "event_type").select(
        "event_type",
        F.date_format("hour", TS_FMT_SPARK).alias("hour"),
        "x",
        "mu",
        "sd",
    )
    out = seq.groupBy("event_type").applyInPandas(_cusum_group, schema=_CUSUM_SCHEMA)
    return out.select(
        "event_type",
        "hour",
        pround("x", 4).alias("x"),
        pround("cusum_pos", 4).alias("cusum_pos"),
        pround("cusum_neg", 4).alias("cusum_neg"),
        "alarm",
    )


@register(
    "events_dau_mau_stickiness",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS day
      FROM events
    ), days AS (
      SELECT DISTINCT day FROM ud
    ), contrib AS (
      SELECT u.user_id, d.day AS window_day
      FROM ud u JOIN days d
        ON d.day BETWEEN u.day AND u.day + INTERVAL 29 DAY
    ), mau AS (
      SELECT window_day, CAST(count(DISTINCT user_id) AS BIGINT) AS mau
      FROM contrib GROUP BY window_day
    ), dau AS (
      SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
      FROM ud GROUP BY day
    )
    SELECT strftime(d.day, '%Y-%m-%d') AS day,
           d.dau,
           m.mau,
           floor(CAST(d.dau AS DOUBLE) / m.mau * 1000000.0 + 0.5) / 1000000.0
             AS stickiness
    FROM dau d JOIN mau m ON m.window_day = d.day
    """,
    doc="DAU/MAU stickiness per day: daily actives over trailing-30-day "
        "actives — the engagement ratio product teams track beside raw "
        "counts (a DAU spike with flat MAU = reactivation burst, both "
        "rising = real growth).  Same scale shape as the 7-day rolling "
        "op it extends: dedup the corpus to (user, active-day) pairs "
        "ONCE, explode each pair into the <=30 window-days it "
        "contributes to (bounded x30 map-only expansion — never a "
        "|days| x corpus range self-join), distinct-count per day; "
        "DAU falls out of the same pair frame.  The ratio is one "
        "rounded division of exact integers.",
    tags=("events", "window-agg", "scale"),
)
def events_dau_mau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ud = (
        e.select("user_id", F.to_date(F.date_trunc("day", "ts")).alias("day"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    days = ud.select("day").distinct().withColumnRenamed("day", "window_day")
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.date_add(F.col("day"), 29))).alias(
            "window_day"
        ),
    )
    mau = (
        contrib.join(F.broadcast(days), "window_day")
        .groupBy("window_day")
        .agg(F.countDistinct("user_id").cast("bigint").alias("mau"))
    )
    dau = ud.groupBy("day").agg(
        F.countDistinct("user_id").cast("bigint").alias("dau")
    )
    return (
        dau.join(mau, dau.day == mau.window_day)
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "dau",
            "mau",
            pround(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


PATH_LEN = 3  # entry-path prefix length


@register(
    "events_session_paths",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us
      FROM events
    ), flagged AS (
      SELECT user_id, event_id, event_type, us,
             CASE WHEN us - lag(us) OVER w >= 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id, event_type, us, event_id,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY us ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM flagged
    ), ranked AS (
      SELECT user_id, session_seq, event_type,
             row_number() OVER (PARTITION BY user_id, session_seq
                                ORDER BY us ASC, event_id ASC) AS rn
      FROM sessions
    ), paths AS (
      SELECT user_id, session_seq,
             string_agg(event_type, '>' ORDER BY rn) AS path
      FROM ranked WHERE rn <= {PATH_LEN}
      GROUP BY user_id, session_seq
    )
    SELECT path,
           CAST(count(*) AS BIGINT) AS n_sessions,
           floor(count(*) * 1.0 / sum(count(*)) OVER ()
                 * 1000000.0 + 0.5) / 1000000.0 AS share
    FROM paths GROUP BY path
    """,
    doc=f"Behavioral path mining: the first {PATH_LEN} event types of "
        f"every session (30-min gap sessionization, same contract as "
        f"events_sessionize) aggregated into entry-path frequencies — "
        f"the sequence-discovery complement of the Markov transition "
        f"matrix (that op models one step; this surfaces the actual "
        f"multi-step journeys users start with, the input to funnel "
        f"DESIGN rather than funnel measurement).  Scale shape: ONE "
        f"user-key shuffle carries sessionization, the within-session "
        f"ranking, and the per-session path assembly (all three "
        f"windows share the partitioning); the path table is "
        f"|sessions| rows and the final rollup is |distinct paths| "
        f"(<= |types|^{PATH_LEN}); the share window runs over that "
        f"bounded frame.  Path assembly is ORDER-PINNED ((us, "
        f"event_id) tie-break) in both engines.",
    tags=("events", "session", "sequence"),
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("us", F.col("ts_us"))
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(prev.isNull() | ((F.col("us") - prev) >= 1_800_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn("session_seq", F.sum("new_session").over(wrun))
    wses = Window.partitionBy("user_id", "session_seq").orderBy(
        F.asc("us"), F.asc("event_id")
    )
    ranked = sessions.withColumn("rn", F.row_number().over(wses)).filter(
        F.col("rn") <= PATH_LEN
    )
    paths = (
        ranked.groupBy("user_id", "session_seq")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("rn", "event_type"))
                    ),
                    lambda s: s["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    # |distinct paths| grows with data, so the global share comes from a
    # 1-row broadcast total (the chi2-drift pattern above), not an
    # unpartitioned WindowExec over the grouped table
    counted = (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_sessions"))
        .localCheckpoint(eager=False)
    )
    total = counted.agg(F.sum("n_sessions").cast("bigint").alias("total_sessions"))
    return (
        counted.crossJoin(F.broadcast(total))
        .select(
            "path",
            "n_sessions",
            pround(
                F.col("n_sessions") * F.lit(1.0) / F.col("total_sessions"), 6
            ).alias("share"),
        )
    )


# ---------------------------------------------------------------------------
# Autocorrelation (round 9): sample ACF of the zero-filled hourly
# volume series per event type — the seasonality detector that tells a
# monitoring pipeline WHICH period its baseline should use (a 24h ACF
# spike is what justifies events_seasonal_hourly_anomaly's
# hour-of-day grouping).  Exactness: with S = Σx and n the grid
# length, centered deviations are scaled to INTEGERS d = n·x − S, so
# every numerator/denominator is an integer sum (associative →
# order-free → bit-identical cross-engine) and the only float op is
# the final num/den division.  The n² scale factors cancel in the
# ratio.  Headroom: |d| ≤ n·x_max, so den ≤ T·(n·x_max)² must stay
# under 9.2e18 — n·x_max ≈ 3e6 per month-long grid at sf0.1 leaves
# ~1e5× growth before an int64 sum could wrap; beyond that accumulate
# decimal(38,0) (warehouse.py:203 pattern).
# ---------------------------------------------------------------------------

_ACF_LAGS = (1, 2, 3, 6, 12, 24)


@register(
    "events_hourly_acf",
    oracle=f"""
    WITH counts AS (
      SELECT epoch_us(ts) // 3600000000 AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM counts
    ), grid AS (
      SELECT gs.h, t.event_type
      FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) gs
      CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
    ), series AS (
      SELECT g.event_type, g.h, CAST(coalesce(c.n, 0) AS BIGINT) AS x
      FROM grid g LEFT JOIN counts c
        ON c.h = g.h AND c.event_type = g.event_type
    ), stats AS (
      SELECT event_type, CAST(sum(x) AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS t
      FROM series GROUP BY event_type
    ), dev AS (
      SELECT se.event_type, se.h, se.x * st.t - st.s AS d
      FROM series se JOIN stats st USING (event_type)
    ), lagged AS (
      SELECT event_type, d,
             {", ".join(f"lag(d, {L}) OVER w AS d{L}" for L in _ACF_LAGS)}
      FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), moments AS (
      SELECT event_type,
             CAST(sum(d * d) AS BIGINT) AS den,
             {", ".join(
                 f"CAST(sum(d * d{L}) AS BIGINT) AS num{L}, "
                 f"CAST(count(d{L}) AS BIGINT) AS np{L}"
                 for L in _ACF_LAGS)}
      FROM lagged GROUP BY event_type
    )
    SELECT event_type, CAST(lag AS INTEGER) AS lag,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           floor((CAST(num AS DOUBLE) / den) * 1000000.0 + 0.5) / 1000000.0
             AS acf
    FROM (
      {" UNION ALL ".join(
          f"SELECT event_type, {L} AS lag, np{L} AS n_pairs, num{L} AS num, den FROM moments"
          for L in _ACF_LAGS)}
    )
    """,
    doc=f"Sample autocorrelation of the zero-filled hourly event-volume "
        f"series per event type at lags {_ACF_LAGS} — the seasonality "
        "detector behind choosing a diurnal baseline.  Plan: one "
        "hash-agg to hourly counts (the only pass over the fact "
        "table); the dense grid is sequence-generated O(hours×types) "
        "independent of fact size; per-type totals broadcast back; ONE "
        "WindowExec computes all six lags in a single pass over "
        "per-type partitions bounded by the calendar span (never the "
        "fact table); the co-moments collapse to |types| rows before "
        "the lag unpivot.  All sums are exact integers (see module "
        "comment) — the division is the only float op, so the oracle "
        "match is bit-exact, not tolerance-based.",
    tags=("events", "timeseries", "stats"),
)
def events_hourly_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy(
        (F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint").alias("h"),
        "event_type",
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    counts = counts.localCheckpoint(eager=False)
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = (
        bounds.select(F.explode(F.sequence("h0", "h1")).alias("h"))
        .crossJoin(F.broadcast(counts.select("event_type").distinct()))
    )
    series = grid.join(counts, ["h", "event_type"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("bigint").alias("x")
    )
    stats = series.groupBy("event_type").agg(
        F.sum("x").cast("bigint").alias("s"),
        F.count(F.lit(1)).cast("bigint").alias("t"),
    )
    dev = series.join(F.broadcast(stats), "event_type").select(
        "event_type", "h", (F.col("x") * F.col("t") - F.col("s")).alias("d")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = dev.select(
        "event_type",
        "d",
        *[F.lag("d", L).over(w).alias(f"d{L}") for L in _ACF_LAGS],
    )
    moments = lagged.groupBy("event_type").agg(
        F.sum(F.col("d") * F.col("d")).cast("bigint").alias("den"),
        *[
            agg
            for L in _ACF_LAGS
            for agg in (
                F.sum(F.col("d") * F.col(f"d{L}")).cast("bigint").alias(f"num{L}"),
                F.count(F.col(f"d{L}")).cast("bigint").alias(f"np{L}"),
            )
        ],
    )
    unpivoted = moments.select(
        "event_type",
        "den",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(L).cast("int").alias("lag"),
                        F.col(f"np{L}").alias("n_pairs"),
                        F.col(f"num{L}").alias("num"),
                    )
                    for L in _ACF_LAGS
                ]
            )
        ).alias("m"),
    )
    return unpivoted.select(
        "event_type",
        "m.lag",
        F.col("m.n_pairs").cast("bigint").alias("n_pairs"),
        pround(F.col("m.num").cast("double") / F.col("den"), 6).alias("acf"),
    )


# ---------------------------------------------------------------------------
# Peak concurrency (round 9): the maximum number of simultaneously
# open sessions — the capacity-planning number (connection pools,
# license seats, serving replicas) the hourly volume series cannot
# give you.  Sweep-line: every session contributes (+1 at start, −1 at
# end+1µs) boundary events; the peak is the max of the global running
# sum over the boundary stream.  The running sum uses
# functions.scale.global_running_sum (range-repartitioned parallel
# sort + broadcast per-partition offsets), NEVER an unpartitioned
# window over the boundary stream.  All values are exact integers.
# ---------------------------------------------------------------------------


@register(
    "events_peak_concurrency",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events
    ), flagged AS (
      SELECT user_id, us, event_id,
             CASE WHEN us - lag(us) OVER w >= 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY us ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_seq,
             us
      FROM flagged
    ), intervals AS (
      SELECT user_id, session_seq,
             CAST(min(us) AS BIGINT) AS start_us,
             CAST(max(us) + 1 AS BIGINT) AS end_us
      FROM sessions GROUP BY user_id, session_seq
    ), bounds AS (
      SELECT start_us AS t, 1 AS delta, user_id, session_seq FROM intervals
      UNION ALL
      SELECT end_us AS t, -1 AS delta, user_id, session_seq FROM intervals
    ), run AS (
      SELECT t, sum(delta) OVER (ORDER BY t ASC, delta ASC, user_id ASC,
                                 session_seq ASC
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS conc
      FROM bounds
    ), peak AS (
      SELECT max(conc) AS peak_concurrency FROM run
    )
    SELECT CAST((SELECT count(*) FROM intervals) AS BIGINT) AS n_sessions,
           CAST(p.peak_concurrency AS BIGINT)               AS peak_concurrency,
           CAST((SELECT min(t) FROM run, peak
                 WHERE conc = peak_concurrency) AS BIGINT)  AS peak_at_us
    FROM peak p
    """,
    doc="Peak concurrent sessions (30-min-gap sessionization, the "
        "events_sessionize contract): sweep-line over ±1 boundary "
        "events with a (t, delta, user, session) total order — delta "
        "ASC releases before acquires at the same instant; a session "
        "occupies through end+1µs so back-to-back sessions at one "
        "instant do overlap.  Returns session count, the peak, and "
        "the first microsecond it was reached.  Scale shape: ONE "
        "user-key shuffle carries sessionization and the interval "
        "collapse; the boundary stream's running sum is "
        "functions/scale.global_running_sum — range-repartitioned "
        "parallel sort with broadcast per-partition offsets, the "
        "only unpartitioned window runs over |partitions| metadata "
        "rows.  Integer-exact end to end.",
    tags=("events", "session", "timeseries"),
)
def events_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import global_running_sum

    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts_us").alias("us")
    )
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    flagged = e.withColumn(
        "new_session",
        F.when(prev.isNull() | ((F.col("us") - prev) >= 1_800_000_000), 1).otherwise(0),
    )
    sessions = flagged.withColumn("session_seq", F.sum("new_session").over(wrun))
    intervals = (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.min("us").cast("bigint").alias("start_us"),
            (F.max("us") + 1).cast("bigint").alias("end_us"),
        )
        .localCheckpoint(eager=False)
    )
    bounds = intervals.select(
        F.col("start_us").alias("t"), F.lit(1).alias("delta"), "user_id", "session_seq"
    ).unionByName(
        intervals.select(
            F.col("end_us").alias("t"),
            F.lit(-1).alias("delta"),
            "user_id",
            "session_seq",
        )
    )
    run = global_running_sum(
        bounds,
        [F.asc("t"), F.asc("delta"), F.asc("user_id"), F.asc("session_seq")],
        "delta",
        "conc",
        # consumed twice (peak + first-peak-instant): materialize once
    ).localCheckpoint(eager=False)
    peak = run.agg(F.max("conc").cast("bigint").alias("peak_concurrency"))
    n_sessions = intervals.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions")
    )
    peak_at = (
        run.crossJoin(F.broadcast(peak))
        .filter(F.col("conc") == F.col("peak_concurrency"))
        .agg(F.min("t").cast("bigint").alias("peak_at_us"))
    )
    return (
        n_sessions.crossJoin(F.broadcast(peak))
        .crossJoin(F.broadcast(peak_at))
        .select("n_sessions", "peak_concurrency", "peak_at_us")
    )


# ---------------------------------------------------------------------------
# Debounce / burst collapse (round 9): rapid same-(user, event_type)
# repeats — double-clicks, retry storms, sensor chatter — collapsed to
# one event per burst (leading edge).  Bursts are 5-second
# gaps-and-islands per (user, type): a new burst starts when the gap
# from the PREVIOUS event exceeds the debounce window, and only each
# burst's first event is kept — the cleaning pass upstream of any
# count-based analytics (a retry storm otherwise reads as engagement).
# ---------------------------------------------------------------------------

_DEBOUNCE_US = 5_000_000


@register(
    "events_debounce_stats",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us
      FROM events
    ), flagged AS (
      SELECT user_id, event_type, us, event_id,
             CASE WHEN us - lag(us) OVER w > {_DEBOUNCE_US}
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_burst
      FROM ev
      WINDOW w AS (PARTITION BY user_id, event_type
                   ORDER BY us ASC, event_id ASC)
    ), bursts AS (
      SELECT user_id, event_type,
             sum(new_burst) OVER (PARTITION BY user_id, event_type
                                  ORDER BY us ASC, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS burst_seq
      FROM flagged
    ), sized AS (
      SELECT user_id, event_type, burst_seq,
             CAST(count(*) AS BIGINT) AS burst_len
      FROM bursts GROUP BY user_id, event_type, burst_seq
    )
    SELECT event_type,
           CAST(sum(burst_len) AS BIGINT)            AS n_events,
           CAST(count(*) AS BIGINT)                  AS n_kept,
           CAST(sum(burst_len) - count(*) AS BIGINT) AS n_dropped,
           CAST(max(burst_len) AS BIGINT)            AS max_burst_len
    FROM sized GROUP BY event_type
    """,
    doc="Leading-edge debounce statistics: same-(user, event_type) "
        "events within 5s of the previous one collapse into bursts "
        "(gaps-and-islands, the events_sessionize machinery at a 5s "
        "threshold); per event type, how many raw events arrived, how "
        "many survive debouncing, and the worst retry-storm length.  "
        "The cleaning pass upstream of count-based analytics.  Scale "
        "shape: ONE (user, type)-key shuffle carries the gap flag, the "
        "burst numbering and the burst collapse (all windows share the "
        "partitioning); the report is |event_types| rows.  "
        "Integer-exact end to end.",
    tags=("events", "session", "curation"),
)
def events_debounce_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.col("ts_us").alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("us"), F.asc("event_id")
    )
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    flagged = e.withColumn(
        "new_burst",
        F.when(prev.isNull() | ((F.col("us") - prev) > _DEBOUNCE_US), 1).otherwise(0),
    )
    bursts = flagged.withColumn("burst_seq", F.sum("new_burst").over(wrun))
    sized = bursts.groupBy("user_id", "event_type", "burst_seq").agg(
        F.count(F.lit(1)).cast("bigint").alias("burst_len")
    )
    return sized.groupBy("event_type").agg(
        F.sum("burst_len").cast("bigint").alias("n_events"),
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        (F.sum("burst_len") - F.count(F.lit(1))).cast("bigint").alias("n_dropped"),
        F.max("burst_len").cast("bigint").alias("max_burst_len"),
    )


@register(
    "events_dow_hour_profile",
    oracle="""
    WITH cells AS (
      SELECT isodow(ts) AS dow, hour(ts) AS hour,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY dow, hour
    ), total AS (
      SELECT CAST(sum(n_events) AS BIGINT) AS n FROM cells
    )
    SELECT CAST(dow AS INTEGER)  AS dow,
           CAST(hour AS INTEGER) AS hour,
           n_events,
           floor(n_events * 1.0 / t.n * 1000000.0 + 0.5) / 1000000.0 AS share
    FROM cells CROSS JOIN total t
    """,
    doc="Weekly activity profile: event share per (ISO day-of-week, "
        "hour-of-day) cell — the 7×24 heatmap capacity planning and "
        "anomaly baselines read (the two-dimensional refinement of "
        "events_seasonal_hourly_anomaly's hour-of-day baseline).  One "
        "partial-agg shuffle to ≤168 cells, total as a 1-row "
        "broadcast; calendar fields from stored wall time, stable "
        "across consumer session timezones.  ISO numbering (Mon=1) "
        "matches DuckDB isodow to Spark weekday()+1 exactly.",
    tags=("events", "timeseries", "agg"),
)
def events_dow_hour_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    cells = e.groupBy(
        (F.weekday("ts") + 1).cast("int").alias("dow"),
        F.hour("ts").cast("int").alias("hour"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
    total = cells.agg(F.sum("n_events").cast("bigint").alias("n"))
    return cells.crossJoin(F.broadcast(total)).select(
        "dow",
        "hour",
        "n_events",
        pround(F.col("n_events") * F.lit(1.0) / F.col("n"), 6).alias("share"),
    )


# ---------------------------------------------------------------------------
# Inter-arrival burstiness — the Goh–Barabási B = (σ−μ)/(σ+μ) of the
# per-user gap distribution, the standard scalar for "is this traffic
# Poisson-like (B≈0), regular/machine-like (B→−1), or bursty/human-like
# (B→+1)".  The connected-device framing of the reference (device
# telemetry streams) makes this the first diagnostic an ingest SRE
# asks for.
# ---------------------------------------------------------------------------

_MIN_GAPS = 30


@register(
    "events_interarrival_burstiness",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, event_type, event_id, epoch_ns(ts) // 1000 AS us
      FROM events
    ), gaps AS (
      SELECT event_type,
             CAST(us - lag(us) OVER (PARTITION BY user_id, event_type
                                     ORDER BY us ASC, event_id ASC)
                  AS DOUBLE) / 1000000 AS gap_s
      FROM ev
    ), agg AS (
      SELECT event_type, CAST(count(*) AS BIGINT) AS n_gaps,
             avg(gap_s) AS mean_raw, stddev_samp(gap_s) AS sd_raw
      FROM gaps WHERE gap_s IS NOT NULL
      GROUP BY event_type HAVING count(*) >= {_MIN_GAPS}
    )
    SELECT event_type, n_gaps,
           floor(mean_raw * 1000000.0 + 0.5) / 1000000.0 AS mean_gap_s,
           floor(sd_raw * 1000000.0 + 0.5) / 1000000.0   AS sd_gap_s,
           CASE WHEN sd_raw + mean_raw = 0 THEN 0.0
                ELSE floor((sd_raw - mean_raw) / (sd_raw + mean_raw)
                           * 1000000.0 + 0.5) / 1000000.0
           END AS burstiness
    FROM agg
    """,
    doc="Goh–Barabási burstiness B = (σ−μ)/(σ+μ) of same-(user, type) "
        "inter-arrival times, per event type: B≈0 is Poisson-like "
        "traffic, B→−1 metronomic machine traffic, B→+1 bursty human "
        "sessions — the scalar that separates telemetry heartbeats "
        "from organic clickstreams.  Scale shape: the gap extraction "
        "rides ONE (user, type)-key shuffle (same lag machinery as "
        "events_sessionize), the moment aggregation is partial "
        "(map-side) into |event_types| rows.  μ/σ via avg/stddev_samp "
        "(bit-parity proven since round 4), pround(6) on emit.",
    tags=("events", "timeseries", "stats"),
)
def events_interarrival_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "event_id", F.col("ts_us").alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.asc("us"), F.asc("event_id")
    )
    gaps = (
        e.withColumn(
            "gap_s",
            (F.col("us") - F.lag("us").over(w)).cast("double") / F.lit(1000000),
        )
        .where(F.col("gap_s").isNotNull())
        .select("event_type", "gap_s")
    )
    agg = (
        gaps.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
            F.avg("gap_s").alias("mean_raw"),
            F.stddev_samp("gap_s").alias("sd_raw"),
        )
        .where(F.col("n_gaps") >= _MIN_GAPS)
    )
    sd_plus_mean = F.col("sd_raw") + F.col("mean_raw")
    return agg.select(
        "event_type",
        "n_gaps",
        pround(F.col("mean_raw"), 6).alias("mean_gap_s"),
        pround(F.col("sd_raw"), 6).alias("sd_gap_s"),
        F.when(sd_plus_mean == 0, F.lit(0.0))
        .otherwise(pround((F.col("sd_raw") - F.col("mean_raw")) / sd_plus_mean, 6))
        .alias("burstiness"),
    )


# ---------------------------------------------------------------------------
# Activity concentration — the Gini coefficient of per-user event
# counts.  "Do 1% of devices produce 90% of the stream?" decides
# whether per-key state (sessionization, dedup stores) needs salting
# and whether a sampled corpus over-represents power users.
# ---------------------------------------------------------------------------


@register(
    "events_user_gini",
    oracle="""
    WITH counts AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY event_type, user_id
    ), ranked AS (
      SELECT event_type, cnt,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY cnt ASC, user_id ASC) AS i
      FROM counts
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT)      AS n_users,
             CAST(sum(cnt) AS BIGINT)      AS n_events,
             CAST(sum(i * cnt) AS BIGINT)  AS weighted
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n_users, n_events,
           floor((2.0 * weighted / (n_users * CAST(n_events AS DOUBLE))
                  - (n_users + 1.0) / n_users) * 1000000.0 + 0.5)
           / 1000000.0 AS gini
    FROM agg
    """,
    doc="Gini coefficient of per-user event counts, per event type "
        "(G = 2·Σ i·xᵢ / (n·Σx) − (n+1)/n over ascending-ordered "
        "counts): 0 = every device contributes equally, →1 = a handful "
        "of hot devices dominate the stream.  Drives salting decisions "
        "for per-key state and sampling weights for corpus balance.  "
        "Scale shape: one (type, user) partial-agg shuffle, one "
        "type-key window to rank (per-type cardinality = |users|, "
        "bounded by the user base, and the rank sum is exact int64 — "
        "n·max_cnt ≪ 2^63), final agg to |event_types| rows.",
    tags=("events", "stats", "curation"),
)
def events_user_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = e.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.partitionBy("event_type").orderBy(F.asc("cnt"), F.asc("user_id"))
    ranked = counts.withColumn("i", F.row_number().over(w))
    agg = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("cnt").cast("bigint").alias("n_events"),
        F.sum(F.col("i") * F.col("cnt")).cast("bigint").alias("weighted"),
    )
    gini = (
        F.lit(2.0) * F.col("weighted") / (F.col("n_users") * F.col("n_events").cast("double"))
        - (F.col("n_users") + F.lit(1.0)) / F.col("n_users")
    )
    return agg.select(
        "event_type", "n_users", "n_events", pround(gini, 6).alias("gini")
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


@register(
    "events_session_trigrams",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS us FROM events
    ), flagged AS (
      SELECT user_id, event_id, event_type, us,
             CASE WHEN us - lag(us) OVER w >= 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ), sess AS (
      SELECT user_id, event_id, event_type, us,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY us ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_seq
      FROM flagged
    ), tri AS (
      SELECT user_id, session_seq,
             event_type AS t1,
             lead(event_type, 1) OVER w2 AS t2,
             lead(event_type, 2) OVER w2 AS t3
      FROM sess
      WINDOW w2 AS (PARTITION BY user_id, session_seq ORDER BY us ASC, event_id ASC)
    )
    SELECT t1, t2, t3,
           CAST(count(DISTINCT (user_id, session_seq)) AS BIGINT) AS n_sessions,
           CAST(count(*) AS BIGINT) AS n_occurrences
    FROM tri WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY t1, t2, t3
    ORDER BY n_sessions DESC, n_occurrences DESC, t1, t2, t3
    LIMIT 20
    """,
    doc="Sequential pattern mining, order-2: the top consecutive "
        "event-type TRIGRAMS inside 30-min-gap sessions, supported by "
        "distinct-session count (the pattern's reach) and raw "
        "occurrences.  events_markov_transitions sees only order-1 "
        "pairs; trigram support is what surfaces multi-step habits "
        "(view->click->purchase vs view->click->view) that pair counts "
        "conflate.  Scale shape: sessionization and the lead() trigram "
        "window all cluster on user_id, so Catalyst plans ONE exchange "
        "for every window (hashpartitioning(user_id) satisfies the "
        "(user_id, session_seq) clustering); the trigram rollup is one "
        "grouped agg bounded by |event_types|^3 keys, and the top-20 "
        "with a full tie-break order is a TakeOrdered, never a global "
        "sort.  Same 30-min/total-order contract as events_sessionize.",
    tags=("events", "session", "window"),
)
def events_session_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("us", F.col("ts_us"))
    w = Window.partitionBy("user_id").orderBy(F.asc("us"), F.asc("event_id"))
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("us").over(w)
    sess = e.withColumn(
        "new_session",
        F.when(prev.isNull() | ((F.col("us") - prev) >= 1_800_000_000), 1).otherwise(0),
    ).withColumn("session_seq", F.sum("new_session").over(wrun).cast("bigint"))
    w2 = Window.partitionBy("user_id", "session_seq").orderBy(
        F.asc("us"), F.asc("event_id")
    )
    # the session identity is the (user_id, session_seq) PAIR, counted
    # distinct as a two-column key (r12 review fix: the old
    # user_id*1e6+seq encoding collided for >=1e6 sessions/user and
    # overflowed int64 past user_id ~9.2e12 — an unvalidated capacity
    # assumption countDistinct never needed)
    tri = sess.select(
        "user_id",
        "session_seq",
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w2).alias("t2"),
        F.lead("event_type", 2).over(w2).alias("t3"),
    ).filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
    return (
        tri.groupBy("t1", "t2", "t3")
        .agg(
            F.countDistinct("user_id", "session_seq")
            .cast("bigint")
            .alias("n_sessions"),
            F.count(F.lit(1)).cast("bigint").alias("n_occurrences"),
        )
        .orderBy(
            F.desc("n_sessions"), F.desc("n_occurrences"), "t1", "t2", "t3"
        )
        .limit(20)
    )


@register(
    "events_weekly_growth_accounting",
    oracle="""
    WITH uw AS (
      SELECT DISTINCT user_id, (epoch_ns(ts) // 1000) // 604800000000 AS week
      FROM events
    ), seq AS (
      SELECT user_id, week,
             lag(week) OVER w AS prev,
             lead(week) OVER w AS nxt
      FROM uw WINDOW w AS (PARTITION BY user_id ORDER BY week)
    ), mx AS (
      SELECT max(week) AS maxw FROM uw
    ), states AS (
      SELECT week,
             CAST(count(*) FILTER (WHERE prev IS NULL) AS BIGINT) AS n_new,
             CAST(count(*) FILTER (WHERE prev = week - 1) AS BIGINT) AS n_retained,
             CAST(count(*) FILTER (WHERE prev IS NOT NULL AND prev < week - 1)
                  AS BIGINT) AS n_resurrected
      FROM seq GROUP BY week
    ), churn AS (
      SELECT s.week + 1 AS week, CAST(count(*) AS BIGINT) AS n_churned
      FROM seq s CROSS JOIN mx
      WHERE (s.nxt IS NULL OR s.nxt > s.week + 1) AND s.week + 1 <= mx.maxw
      GROUP BY s.week + 1
    )
    SELECT CAST(COALESCE(st.week, ch.week) AS BIGINT) AS week_idx,
           CAST(COALESCE(st.n_new, 0) AS BIGINT) AS n_new,
           CAST(COALESCE(st.n_retained, 0) AS BIGINT) AS n_retained,
           CAST(COALESCE(st.n_resurrected, 0) AS BIGINT) AS n_resurrected,
           CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
    FROM states st FULL JOIN churn ch ON st.week = ch.week
    """,
    doc="Weekly growth accounting: every active user-week classified "
        "new / retained / resurrected by the lag to their previous "
        "active week, plus churned (active week w-1, absent week w, "
        "clipped at the last observed week) — the standard growth "
        "decomposition (quick ratio = (new+resurrected)/churned) that "
        "retention cohorts and DAU/MAU stickiness don't give.  Weeks "
        "are tz-free integer epoch-week indexes (ts_us div 604800e6), "
        "so the report is session-timezone-invariant.  Scale shape: "
        "the corpus collapses to distinct (user, week) in one "
        "map-side-combine shuffle; the lag/lead pass re-clusters by "
        "user (second exchange, |users x weeks| rows, far smaller "
        "than events); state and churn rollups land on |weeks| keys, "
        "and the final outer join is between two |weeks|-row tables "
        "(AQE broadcasts).  All-integer output — no float parity "
        "hazard anywhere.",
    tags=("events", "window", "cohort"),
)
def events_weekly_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    uw = e.select(
        "user_id", F.expr("ts_us div 604800000000").alias("week")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("week")
    seq = uw.select(
        "user_id",
        "week",
        F.lag("week").over(w).alias("prev"),
        F.lead("week").over(w).alias("nxt"),
    # consumed by BOTH the state and churn branches — materialize the
    # |users x weeks| rows once instead of re-running distinct+window
    ).localCheckpoint(eager=False)
    mx = uw.agg(F.max("week").alias("maxw"))
    states = seq.groupBy("week").agg(
        F.count_if(F.col("prev").isNull()).cast("bigint").alias("n_new"),
        F.count_if(F.col("prev") == F.col("week") - 1).cast("bigint").alias("n_retained"),
        F.count_if(F.col("prev").isNotNull() & (F.col("prev") < F.col("week") - 1))
        .cast("bigint")
        .alias("n_resurrected"),
    )
    churn = (
        seq.crossJoin(F.broadcast(mx))
        .filter(
            (F.col("nxt").isNull() | (F.col("nxt") > F.col("week") + 1))
            & (F.col("week") + 1 <= F.col("maxw"))
        )
        .select((F.col("week") + 1).alias("week"))
        .groupBy("week")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_churned"))
    )
    st = states.withColumnRenamed("week", "week_s")
    ch = churn.withColumnRenamed("week", "week_c")
    return st.join(ch, F.col("week_s") == F.col("week_c"), "full").select(
        F.coalesce(F.col("week_s"), F.col("week_c")).cast("bigint").alias("week_idx"),
        F.coalesce(F.col("n_new"), F.lit(0)).cast("bigint").alias("n_new"),
        F.coalesce(F.col("n_retained"), F.lit(0)).cast("bigint").alias("n_retained"),
        F.coalesce(F.col("n_resurrected"), F.lit(0)).cast("bigint").alias("n_resurrected"),
        F.coalesce(F.col("n_churned"), F.lit(0)).cast("bigint").alias("n_churned"),
    )


# ---------------------------------------------------------------------------
# Theil–Sen robust trend (round 9): median-of-pairwise-slopes over the
# hourly volume series — the trend estimator that shrugs off the
# outlier hours (incident spikes, backfill bursts) that drag an OLS
# fit; reported NEXT TO the OLS slope so the gap between the two IS
# the outlier-contamination signal.  Exactness: hours are offset to
# x = h − min(h) (small exact ints), counts y are exact ints, so each
# pairwise slope (Δy/Δx) is ONE double division of exact integers —
# bit-identical cross-engine — and the median of an identical double
# multiset is bit-identical (verified percentile/quantile_cont parity,
# see verify SKILL.md).  The OLS slope is assembled from exact integer
# sums (n·Σxy − Σx·Σy over n·Σxx − Σx², one final division);
# headroom with x ≤ |hours|: a decade-long hourly grid at 1e9
# events/hour keeps n·Σxy ≈ 7e17 < 9.2e18.
# ---------------------------------------------------------------------------


@register(
    "events_theil_sen_trend",
    oracle="""
    WITH c AS (
      SELECT epoch_us(ts) // 3600000000 AS h,
             CAST(count(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ), b AS (
      SELECT min(h) AS h0 FROM c
    ), s AS (
      SELECT CAST(c.h - b.h0 AS BIGINT) AS x, c.y FROM c, b
    ), p AS (
      SELECT CAST(j.y - i.y AS DOUBLE) / (j.x - i.x) AS sl
      FROM s i JOIN s j ON j.x > i.x
    ), m AS (
      SELECT quantile_cont(sl, 0.5) AS ts_slope,
             CAST(count(*) AS BIGINT) AS n_pairs
      FROM p
    ), r AS (
      SELECT quantile_cont(s.y - m.ts_slope * s.x, 0.5) AS ts_intercept
      FROM s, m
    ), o AS (
      SELECT CAST(count(*) AS BIGINT) AS n_hours,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM s
    )
    SELECT o.n_hours, m.n_pairs,
           floor(m.ts_slope * 1000000.0 + 0.5) / 1000000.0 AS ts_slope,
           floor(r.ts_intercept * 1000000.0 + 0.5) / 1000000.0
             AS ts_intercept,
           floor(CAST(o.n_hours * o.sxy - o.sx * o.sy AS DOUBLE)
                 / (o.n_hours * o.sxx - o.sx * o.sx) * 1000000.0 + 0.5)
             / 1000000.0 AS ols_slope
    FROM o, m, r
    """,
    doc="Theil–Sen robust trend of hourly event volume (median of all "
        "pairwise slopes, with the median-residual intercept) beside "
        "the OLS slope from exact integer sums — a large TS-vs-OLS gap "
        "means outlier hours are steering the least-squares fit and a "
        "capacity forecast should use the robust line.  Plan: ONE "
        "hash-agg collapses the fact table to hourly counts (the only "
        "pass over events); everything after runs on ≤ |calendar "
        "hours| rows — the pair join is a broadcast non-equi self-join "
        "on that collapsed table (|hours|²/2 pairs, ~260k for a "
        "30-day span: driver-trivial, fact-size-independent), and the "
        "medians are exact percentiles over those pairs.  Scale shape: "
        "cost grows with the SQUARE OF THE CALENDAR SPAN, never with "
        "data volume; for multi-year spans the standard rewrite is "
        "per-window Theil–Sen (repeated median over trailing windows) "
        "which this operator's grouped form extends to directly.  "
        "Tz-free: hours are epoch-micros integer division "
        "(ts_us // 3.6e9), immune to session-timezone shifts.",
    tags=("events", "timeseries", "stats"),
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    c = e.groupBy(
        (F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint").alias("h")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    c = c.localCheckpoint(eager=False)
    b = c.agg(F.min("h").alias("h0"))
    s = c.crossJoin(F.broadcast(b)).select(
        (F.col("h") - F.col("h0")).cast("bigint").alias("x"), "y"
    )
    s = s.localCheckpoint(eager=False)
    i = s.select(F.col("x").alias("xi"), F.col("y").alias("yi"))
    j = s.select(F.col("x").alias("xj"), F.col("y").alias("yj"))
    p = i.join(F.broadcast(j), F.col("xj") > F.col("xi")).select(
        (
            (F.col("yj") - F.col("yi")).cast("double")
            / (F.col("xj") - F.col("xi"))
        ).alias("sl")
    )
    m = p.agg(
        F.expr("percentile(sl, 0.5D)").alias("ts_slope"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    r = (
        s.crossJoin(F.broadcast(m))
        .select((F.col("y") - F.col("ts_slope") * F.col("x")).alias("res"))
        .agg(F.expr("percentile(res, 0.5D)").alias("ts_intercept"))
    )
    o = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_hours"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    return (
        o.crossJoin(F.broadcast(m))
        .crossJoin(F.broadcast(r))
        .select(
            "n_hours",
            "n_pairs",
            pround(F.col("ts_slope"), 6).alias("ts_slope"),
            pround(F.col("ts_intercept"), 6).alias("ts_intercept"),
            pround(
                (
                    F.col("n_hours") * F.col("sxy") - F.col("sx") * F.col("sy")
                ).cast("double")
                / (
                    F.col("n_hours") * F.col("sxx") - F.col("sx") * F.col("sx")
                ),
                6,
            ).alias("ols_slope"),
        )
    )


# ---------------------------------------------------------------------------
# Forecast backtest: naive vs seasonal-naive MAE / MASE per event type
# ---------------------------------------------------------------------------

_BT_SEASON = 24  # hourly series, daily season


@register(
    "events_forecast_backtest",
    oracle=f"""
    WITH counts AS (
      SELECT epoch_us(ts) // 3600000000 AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM counts
    ), grid AS (
      SELECT gs.h, t.event_type
      FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) gs
      CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
    ), series AS (
      SELECT g.event_type, g.h, CAST(coalesce(c.n, 0) AS BIGINT) AS x
      FROM grid g LEFT JOIN counts c
        ON c.h = g.h AND c.event_type = g.event_type
    ), lagged AS (
      SELECT event_type, x,
             lag(x, 1) OVER w AS l1,
             lag(x, {_BT_SEASON}) OVER w AS l24
      FROM series WINDOW w AS (PARTITION BY event_type ORDER BY h)
    ), agg AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_eval,
             CAST(sum(abs(x - l1)) AS BIGINT) AS sae_naive,
             CAST(sum(abs(x - l24)) AS BIGINT) AS sae_snaive
      FROM lagged WHERE l24 IS NOT NULL GROUP BY event_type
    )
    SELECT event_type, n_eval,
           floor(sae_naive * 1.0 / n_eval * 1000000.0 + 0.5) / 1000000.0
             AS mae_naive,
           floor(sae_snaive * 1.0 / n_eval * 1000000.0 + 0.5) / 1000000.0
             AS mae_snaive,
           CASE WHEN sae_naive > 0
                THEN floor(sae_snaive * 1.0 / sae_naive * 1000000.0 + 0.5)
                     / 1000000.0
                ELSE -1.0 END AS mase_snaive
    FROM agg
    """,
    doc="Forecast BACKTEST per event type: one-step mean absolute error "
        "of the naive forecast (y[t-1]) vs the seasonal-naive forecast "
        "(y[t-24]) over the zero-filled hourly series, plus their MASE "
        "ratio (Hyndman & Koehler 2006: scaled by the naive in-sample "
        "MAE, so < 1 means the daily season carries real signal).  The "
        "EVALUATION layer the forecasting tier was missing: "
        "events_holt_forecast_hourly produces forecasts, the seasonal "
        "baseline assumes the 24h cycle — this measures whether that "
        "assumption beats the dumbest model BEFORE anyone trusts an "
        "anomaly threshold built on it.  Exact arithmetic: absolute "
        "errors are integer count differences summed as int64 (no "
        "float accumulation); the two divisions and the ratio are "
        "identical scalar trees, zero-denominator guarded with a -1.0 "
        "sentinel in both engines.  Scale shape: same spine as "
        "events_hourly_acf — one partial-agg shuffle to (hour, type) "
        "counts (bounded by calendar x |types|, not event count), "
        "zero-fill via a broadcast sequence grid, ONE window pass "
        "computes both lags, final agg to |types| rows.",
    tags=("events", "stats", "timeseries"),
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy(
            (F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint").alias("h"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(F.explode(F.sequence("h0", "h1")).alias("h")).crossJoin(
        F.broadcast(counts.select("event_type").distinct())
    )
    series = grid.join(counts, ["h", "event_type"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("bigint").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    lagged = series.select(
        "event_type",
        "x",
        F.lag("x", 1).over(w).alias("l1"),
        F.lag("x", _BT_SEASON).over(w).alias("l24"),
    )
    agg = (
        lagged.filter(F.col("l24").isNotNull())
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_eval"),
            F.sum(F.abs(F.col("x") - F.col("l1"))).cast("bigint").alias("sae_naive"),
            F.sum(F.abs(F.col("x") - F.col("l24")))
            .cast("bigint")
            .alias("sae_snaive"),
        )
    )
    one = F.lit(1.0)
    return agg.select(
        "event_type",
        "n_eval",
        pround(F.col("sae_naive") * one / F.col("n_eval"), 6).alias("mae_naive"),
        pround(F.col("sae_snaive") * one / F.col("n_eval"), 6).alias("mae_snaive"),
        F.when(
            F.col("sae_naive") > 0,
            pround(F.col("sae_snaive") * one / F.col("sae_naive"), 6),
        )
        .otherwise(F.lit(-1.0))
        .alias("mase_snaive"),
    )


# ---------------------------------------------------------------------------
# Session bounce rate per epoch day
# ---------------------------------------------------------------------------


@register(
    "events_bounce_rate_daily",
    oracle="""
    WITH ev AS (
      SELECT user_id, event_id, epoch_ns(ts) // 1000 AS us FROM events
    ), flagged AS (
      SELECT user_id, event_id, us,
             CASE WHEN us - lag(us) OVER w >= 1800000000
                    OR lag(us) OVER w IS NULL
                  THEN 1 ELSE 0 END AS new_session
      FROM ev
      WINDOW w AS (PARTITION BY user_id ORDER BY us ASC, event_id ASC)
    ), sessions AS (
      SELECT user_id, us,
             sum(new_session) OVER (PARTITION BY user_id
                                    ORDER BY us ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS session_seq
      FROM flagged
    ), per_session AS (
      SELECT user_id, session_seq,
             CAST(count(*) AS BIGINT) AS n_events,
             min(us) // 86400000000 AS day
      FROM sessions GROUP BY user_id, session_seq
    )
    SELECT CAST(day AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounces,
           floor(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1.0
                 / count(*) * 1000000.0 + 0.5) / 1000000.0 AS bounce_rate,
           floor(sum(n_events) * 1.0 / count(*) * 1000000.0 + 0.5)
             / 1000000.0 AS avg_events_per_session
    FROM per_session GROUP BY day
    """,
    doc="Daily bounce rate: share of 30-min-gap sessions containing a "
        "single event, bucketed by the session's first-event epoch day "
        "(tz-free us // 86400e6 — no calendar field, so the report is "
        "session-tz-invariant) — the engagement-quality headline next "
        "to volume (events_hourly_stats) and stickiness "
        "(events_dau_mau_stickiness); a bounce-rate jump under flat "
        "volume is the classic broken-funnel signal.  Rides the exact "
        "integer-microsecond sessionize machinery (same lag + running-"
        "sum pair as events_sessionize, one user-key shuffle serves "
        "both windows), then one calendar-bounded day aggregate; "
        "ratios are single divisions of int64 counts.  Scale shape: "
        "user-key shuffle -> per-session rows -> |days| cells.",
    tags=("events", "session"),
)
def events_bounce_rate_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn("us", F.col("ts_us"))
    sessions = _sessionized(e)
    per_session = (
        sessions.groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.min("us").alias("min_us"),
        )
        .select(
            "n_events",
            F.expr("min_us div 86400000000L").cast("bigint").alias("day"),
        )
    )
    one = F.lit(1.0)
    return per_session.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
        F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_bounces"),
        pround(
            F.sum(F.when(F.col("n_events") == 1, 1).otherwise(0))
            * one
            / F.count(F.lit(1)),
            6,
        ).alias("bounce_rate"),
        pround(F.sum("n_events") * one / F.count(F.lit(1)), 6).alias(
            "avg_events_per_session"
        ),
    )


# ---------------------------------------------------------------------------
# Event-id integrity audit (ingestion completeness in one aggregate)
# ---------------------------------------------------------------------------


@register(
    "events_id_integrity_audit",
    oracle="""
    SELECT CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(DISTINCT event_id) AS BIGINT) AS n_distinct,
           CAST(min(event_id) AS BIGINT) AS min_id,
           CAST(max(event_id) AS BIGINT) AS max_id,
           CAST(count(*) - count(DISTINCT event_id) AS BIGINT) AS n_dup_rows,
           CAST(max(event_id) - min(event_id) + 1
                - count(DISTINCT event_id) AS BIGINT) AS n_missing_ids
    FROM events
    """,
    doc="Sequence-integrity audit of the event_id key in ONE "
        "aggregate: duplicate rows (count minus distinct) and missing "
        "ids (span minus distinct) — the at-a-glance ingestion-"
        "completeness check run before trusting any downstream count, "
        "catching both replayed batches (dups) and dropped partitions "
        "(holes) without materializing a single per-gap row.  The "
        "arithmetic identity does all the work: for a dense-by-"
        "construction id domain, |span| - |distinct| IS the missing "
        "count, so no self-join, no window, no sort.  All-integer "
        "output.  Scale shape: one exact-distinct aggregate (Spark "
        "plans count + countDistinct together via its Expand rewrite "
        "— one scan, one partially-aggregated shuffle); at 100 TB the "
        "same audit runs per ingest partition first and the partials "
        "merge, since min/max/count all decompose.",
    tags=("events", "quality", "profiling"),
)
def events_id_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return e.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.count_distinct(F.col("event_id")).cast("bigint").alias("n_distinct"),
        F.min("event_id").cast("bigint").alias("min_id"),
        F.max("event_id").cast("bigint").alias("max_id"),
        (F.count(F.lit(1)) - F.count_distinct(F.col("event_id")))
        .cast("bigint")
        .alias("n_dup_rows"),
        (
            F.max("event_id")
            - F.min("event_id")
            + 1
            - F.count_distinct(F.col("event_id"))
        )
        .cast("bigint")
        .alias("n_missing_ids"),
    )


# ---------------------------------------------------------------------------
# Median imputation repair (deterministic mask -> impute -> impact report)
# ---------------------------------------------------------------------------

# deterministic "missingness": ~1% of rows, same device as the stale-
# index perturbation in document_embedding_coverage — both engines
# compute the identical mask, so the repair is oracle-checkable
_IMPUTE_MOD = 97


@register(
    "events_value_impute_median",
    oracle=f"""
    WITH masked AS (
      SELECT event_type, value,
             CASE WHEN event_id % {_IMPUTE_MOD} = 0 THEN 1 ELSE 0 END AS miss
      FROM events
    ), obs AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_obs,
             CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
               AS cents_obs,
             quantile_cont(value, 0.5) AS med
      FROM masked WHERE miss = 0 GROUP BY event_type
    ), tot AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_events,
             CAST(sum(miss) AS BIGINT) AS n_imputed
      FROM masked GROUP BY event_type
    )
    SELECT t.event_type, t.n_events, t.n_imputed,
           floor(o.med * 1000.0 + 0.5) / 1000.0 AS imputed_value,
           floor(o.cents_obs / (o.n_obs * 100.0) * 1000000.0 + 0.5)
             / 1000000.0 AS mean_before,
           floor((o.cents_obs + t.n_imputed * (o.med * 100.0))
                 / (t.n_events * 100.0) * 1000000.0 + 0.5) / 1000000.0
             AS mean_after
    FROM tot t JOIN obs o ON o.event_type = t.event_type
    """,
    doc="Missing-value REPAIR operator: rows deterministically masked "
        f"as missing (event_id % {_IMPUTE_MOD} = 0, ~1% — the same "
        "reproducible-perturbation device document_embedding_coverage "
        "uses for its stale index) are imputed with the per-type EXACT "
        "median of the observed values, and the report shows the "
        "repair's distributional impact (observed mean vs post-impute "
        "mean).  Median imputation is the robust default for skewed "
        "telemetry (mean imputation drags toward outliers); the "
        "mean_before/mean_after gap quantifies exactly the bias the "
        "choice introduces.  Exactness: observed sums are integer "
        "cents; Spark's exact percentile() and DuckDB's quantile_cont "
        "are bit-identical on identical double multisets (verified "
        "property, see verify skill); the post-impute mean is one "
        "identical scalar tree on (int, int, exact-median) inputs.  "
        "Scale shape: two partial-agg shuffles to |types| rows (the "
        "exact median is sort-based within type partitions — swap "
        "approx_percentile at 100 TB, documented); the impact join is "
        "|types| x |types|, broadcast.",
    tags=("events", "curation", "quality"),
)
def events_value_impute_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.when(F.col("event_id") % _IMPUTE_MOD == 0, 1).otherwise(0).alias("miss"),
    )
    obs = e.filter(F.col("miss") == 0).groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_obs"),
        F.sum(F.floor(F.col("value") * 100.0 + 0.5).cast("bigint"))
        .cast("bigint")
        .alias("cents_obs"),
        F.expr("percentile(value, 0.5D)").alias("med"),
    )
    tot = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
        F.sum("miss").cast("bigint").alias("n_imputed"),
    )
    joined = tot.join(F.broadcast(obs), "event_type")
    return joined.select(
        "event_type",
        "n_events",
        "n_imputed",
        pround(F.col("med"), 3).alias("imputed_value"),
        pround(F.col("cents_obs") / (F.col("n_obs") * F.lit(100.0)), 6).alias(
            "mean_before"
        ),
        pround(
            (F.col("cents_obs") + F.col("n_imputed") * (F.col("med") * F.lit(100.0)))
            / (F.col("n_events") * F.lit(100.0)),
            6,
        ).alias("mean_after"),
    )


# ---------------------------------------------------------------------------
# Markov stationary distribution (exact integer power iteration)
# ---------------------------------------------------------------------------

_MKV_SCALE = 1_000_000_000_000  # pi held as 1e-12ths (pagerank pattern)
_MKV_ITERS = 5

_MKV_BASE = """
    seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts) // 1000 ASC,
                                             event_id ASC) AS to_type
      FROM events
    ), tr AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ), rs AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS r FROM tr GROUP BY 1
    ), types AS (
      SELECT DISTINCT from_type AS t FROM tr
    ), kk AS (
      SELECT CAST(count(*) AS BIGINT) AS k FROM types
    ), p0 AS (
      SELECT t, CAST({scale} // k AS BIGINT) AS pi FROM types CROSS JOIN kk
    )
"""

_MKV_STEP = """
    , p{i} AS (
      SELECT tr.to_type AS t, CAST(sum(p{j}.pi * tr.n // rs.r) AS BIGINT) AS pi
      FROM p{j}
      JOIN tr ON tr.from_type = p{j}.t
      JOIN rs ON rs.from_type = p{j}.t
      GROUP BY tr.to_type
    )
"""


@register(
    "events_markov_stationary",
    oracle="WITH "
    + _MKV_BASE.format(scale=_MKV_SCALE)
    + "".join(_MKV_STEP.format(i=i, j=i - 1) for i in range(1, _MKV_ITERS + 1))
    + f"""
    SELECT t AS event_type, pi AS pi_scaled,
           floor(pi / {_MKV_SCALE}.0 * 1000000.0 + 0.5) / 1000000.0 AS pi
    FROM p{_MKV_ITERS}
    """,
    doc="Stationary distribution of the empirical first-order Markov "
        "chain over event types — the long-run share of attention each "
        "event type commands if behavior keeps its current transition "
        "structure, the model-based complement to the RAW type mix "
        "(raw counts conflate burst length with reach; the stationary "
        f"vector is what the chain itself predicts).  {_MKV_ITERS} "
        "power-iteration rounds in EXACT integer fixed-point "
        "(pi x 1e12; each update term pi_i * n_ij div r_i is an int64 "
        "floor — the embedding_pagerank_centrality arithmetic "
        "contract), so every round agrees bit-for-bit with the "
        "unrolled-CTE oracle; rounding mass loss is <= |types| "
        "twelfth-decimals per round, invisible at the 6-dp output.  "
        "Defined on the strongly-connected empirical graph (every "
        "fixture type both emits and receives transitions).  Scale "
        "shape: the user-key sequencing shuffle is shared with "
        "events_markov_transitions; after the |types|^2 aggregate "
        "(localCheckpoint, read once), each round is a join+agg over "
        "25 cells x |types| rows — driver-side loop, executor-side "
        "data, bounded by the type alphabet not the event count.  "
        "int64 headroom: pi * n <= 1e12 * n_ij overflows past ~9e6 "
        "transitions per cell — decimal(38,0) swap documented.",
    tags=("events", "stats", "graph"),
)
def events_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    tr = (
        seq.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=True)
    )
    rs = tr.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("r"))
    types = tr.select(F.col("from_type").alias("t")).distinct()
    kk = types.agg(F.count(F.lit(1)).cast("bigint").alias("k"))
    pi = types.crossJoin(F.broadcast(kk)).select(
        "t", F.expr(f"{_MKV_SCALE}L div k").cast("bigint").alias("pi")
    )
    edges = tr.join(rs, "from_type").localCheckpoint(eager=True)
    for _ in range(_MKV_ITERS):
        pi = (
            edges.join(F.broadcast(pi), edges.from_type == pi.t)
            .select("to_type", F.expr("pi * n div r").alias("term"))
            .groupBy("to_type")
            .agg(F.sum("term").cast("bigint").alias("pi"))
            .select(F.col("to_type").alias("t"), "pi")
            .localCheckpoint(eager=True)
        )
    return pi.select(
        F.col("t").alias("event_type"),
        F.col("pi").alias("pi_scaled"),
        pround(F.col("pi") / F.lit(float(_MKV_SCALE)), 6).alias("pi"),
    )


# ---------------------------------------------------------------------------
# Hill tail-index estimator (how heavy is the value tail, per type)
# ---------------------------------------------------------------------------

_HILL_K = 100          # tail order statistics used
_HILL_SCALE = 10_000   # ln ratios quantized to 1e-4 int64 (heaps pattern)


@register(
    "events_hill_tail_index",
    oracle=f"""
    WITH ranked AS (
      SELECT event_type, value,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id ASC) AS rk
      FROM events WHERE value > 0
    ), thresh AS (
      SELECT event_type, value AS xk FROM ranked WHERE rk = {_HILL_K} + 1
    ), tail AS (
      SELECT r.event_type,
             CAST(floor(ln(r.value / t.xk) * {_HILL_SCALE}.0 + 0.5)
                  AS BIGINT) AS li
      FROM ranked r JOIN thresh t ON t.event_type = r.event_type
      WHERE r.rk <= {_HILL_K}
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_tail,
           floor(sum(li) * 1.0 / (count(*) * {_HILL_SCALE}.0)
                 * 1000000.0 + 0.5) / 1000000.0 AS mean_log_excess,
           CASE WHEN sum(li) > 0
                THEN floor(count(*) * {_HILL_SCALE}.0 * 1.0 / sum(li)
                           * 1000000.0 + 0.5) / 1000000.0
                ELSE -1.0 END AS hill_alpha
    FROM tail GROUP BY event_type
    """,
    doc=f"Hill estimator of the value distribution's tail index per "
        f"event type over the top-{_HILL_K} order statistics: alpha = "
        "1/mean(ln(x_i/x_k)) — the standard heavy-tail diagnostic "
        "(Hill 1975).  alpha < 2 means INFINITE VARIANCE: sample "
        "means/stddevs over such values never stabilize, the signal to "
        "switch monitoring to the quantile/MAD operators and cap "
        "values before training-weight computation; the log2 "
        "histogram SHOWS the tail, this measures it.  Exactness: each "
        "log-excess ln(x_i/x_k) is quantized to 1e-4 int64 (the "
        "heaps-law device — both engines evaluate ln on identical "
        "doubles and a 1-ulp libm skew cannot cross a quantization "
        "boundary), so the tail sum is an order-free integer and the "
        "estimator one identical scalar tree; the degenerate "
        "all-ties-at-x_k tail (sum 0) emits a -1.0 sentinel on the "
        "exact integer sign.  Scale shape: the rank is a type-keyed "
        "window (at 100 TB: per-type approx-quantile threshold + "
        f"filter replaces the full sort, documented); only {_HILL_K} "
        "rows per type survive to the float stage; output |types| "
        "rows.",
    tags=("events", "stats"),
)
def events_hill_tail_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    w = Window.partitionBy("event_type").orderBy(
        F.desc("value"), F.asc("event_id")
    )
    ranked = e.select(
        "event_type", "value", F.row_number().over(w).alias("rk")
    ).localCheckpoint(eager=False)
    thresh = ranked.filter(F.col("rk") == _HILL_K + 1).select(
        "event_type", F.col("value").alias("xk")
    )
    tail = (
        ranked.filter(F.col("rk") <= _HILL_K)
        .join(F.broadcast(thresh), "event_type")
        .select(
            "event_type",
            F.floor(
                F.log(F.col("value") / F.col("xk")) * _HILL_SCALE + F.lit(0.5)
            )
            .cast("bigint")
            .alias("li"),
        )
    )
    one = F.lit(1.0)
    return tail.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tail"),
        pround(
            F.sum("li") * one / (F.count(F.lit(1)) * F.lit(float(_HILL_SCALE))),
            6,
        ).alias("mean_log_excess"),
        F.when(
            F.sum("li") > 0,
            pround(
                F.count(F.lit(1)) * F.lit(float(_HILL_SCALE)) * one / F.sum("li"),
                6,
            ),
        )
        .otherwise(F.lit(-1.0))
        .alias("hill_alpha"),
    )


# ---------------------------------------------------------------------------
# Lorenz curve of per-user activity (the curve behind the Gini scalar)
# ---------------------------------------------------------------------------


@register(
    "events_lorenz_curve",
    oracle="""
    WITH uc AS (
      SELECT event_type, user_id, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), dec AS (
      SELECT event_type, c,
             ntile(10) OVER (PARTITION BY event_type
                             ORDER BY c, user_id) AS decile
      FROM uc
    ), cells AS (
      SELECT event_type, decile,
             CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(c) AS BIGINT) AS n_events
      FROM dec GROUP BY 1, 2
    ), tot AS (
      SELECT event_type, CAST(sum(n_events) AS BIGINT) AS t
      FROM cells GROUP BY 1
    )
    SELECT cells.event_type, CAST(decile AS INTEGER) AS decile,
           n_users, n_events,
           floor(sum(n_events) OVER (PARTITION BY cells.event_type
                                     ORDER BY decile
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW)
                 * 1.0 / t * 1000000.0 + 0.5) / 1000000.0
             AS cum_event_share
    FROM cells JOIN tot ON tot.event_type = cells.event_type
    """,
    doc="Lorenz curve of per-user event counts per type: users cut into "
        "activity deciles (quietest first), each cell reporting its "
        "population and the CUMULATIVE share of events — the curve "
        "whose area deficit is exactly the events_user_gini scalar, "
        "and the operational view for sampling design ('the top decile "
        "emits 40% of telemetry' is read straight off decile 10's "
        "predecessor).  ntile over the (count, user_id) total order is "
        "identically defined cross-engine; counts and cumulative sums "
        "are exact int64 with one share division per cell.  Scale "
        "shape: one (type, user) partial agg, a type-keyed decile "
        "window over |users| rows, a 10-row-per-type cumulative window "
        "— every window keyed, output |types| x 10 rows.",
    tags=("events", "stats", "cohort"),
)
def events_lorenz_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    uc = load_table(spark, sf_dir, "events").groupBy(
        "event_type", "user_id"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    wd = Window.partitionBy("event_type").orderBy("c", "user_id")
    dec = uc.select("event_type", "c", F.ntile(10).over(wd).alias("decile"))
    cells = dec.groupBy("event_type", "decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("c").cast("bigint").alias("n_events"),
    )
    tot = cells.groupBy("event_type").agg(
        F.sum("n_events").cast("bigint").alias("t")
    )
    wc = (
        Window.partitionBy("event_type")
        .orderBy("decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            F.col("decile").cast("int").alias("decile"),
            "n_users",
            "n_events",
            pround(
                F.sum("n_events").over(wc) * F.lit(1.0) / F.col("t"), 6
            ).alias("cum_event_share"),
        )
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


# ---------------------------------------------------------------------------
# Fano-factor dispersion: are daily counts Poisson, or bursty/regular?
# ---------------------------------------------------------------------------


@register(
    "events_fano_dispersion",
    oracle="""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // 86400000000 AS d,
             CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ), span AS (
      SELECT CAST(max(d) - min(d) + 1 AS BIGINT) AS n FROM daily
    ), agg AS (
      SELECT event_type,
             CAST(sum(c) AS BIGINT) AS s,
             CAST(sum(c * c) AS BIGINT) AS ss
      FROM daily GROUP BY event_type
    )
    SELECT event_type, p.n AS n_days, s AS n_events,
           floor((s * 1.0 / p.n) * 1000000.0 + 0.5) / 1000000.0
             AS mean_daily,
           floor(((p.n * 1.0 * ss - s * 1.0 * s) / (p.n * 1.0 * (p.n - 1.0)))
                 / (s * 1.0 / p.n) * 1000000.0 + 0.5) / 1000000.0
             AS fano_factor
    FROM agg CROSS JOIN span p WHERE p.n > 1 AND s > 0
    """,
    doc="Fano factor (variance-to-mean ratio) of DAILY event counts per "
        "type: a Poisson arrival process has F = 1 exactly, so F >> 1 "
        "is count-level overdispersion (campaign/incident bursts) and "
        "F << 1 suspicious regularity (rate-limited or synthetic "
        "traffic) — the aggregate-count complement to "
        "events_interarrival_burstiness, which asks the same question "
        "of the per-event GAPS (a feed can be gap-bursty yet "
        "day-regular, and vice versa; reading both localizes the "
        "scale of the burstiness).  Days are tz-free epoch buckets "
        "from stored micros, and n is the GLOBAL observation-span day "
        "count so a type's silent days count as zeros (r12 review "
        "fix: active-days-only n overstated the mean and understated "
        "the variance for intermittent types — the exact pattern the "
        "metric exists to flag; zeros add nothing to s/ss, so only n "
        "changes).  Exact arithmetic: daily-count sums and "
        "sums of squares are int64; the sample variance and the ratio "
        "are one identical scalar double tree; degenerate types "
        "(single day, zero events) are excluded by the same integer "
        "predicate in both engines.  Scale shape: one partial-agg "
        "shuffle to |types| x |days| calendar-bounded cells, "
        "re-aggregated to |types| rows.  int64 headroom: sum(c^2) "
        "overflows past ~3e9 events per (type, day) cell — "
        "decimal(38,0) swap documented.",
    tags=("events", "stats", "timeseries"),
)
def events_fano_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    daily = (
        e.groupBy(
            "event_type",
            F.expr("ts_us div 86400000000L").cast("bigint").alias("d"),
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    # n = the GLOBAL observation-span day count, not the per-type count
    # of ACTIVE days (r12 review fix): a type active 3 days out of 30
    # has 27 zero days whose huge variance-to-mean is the very signal;
    # zeros contribute nothing to s or ss, so only n changes — no
    # grid densify needed
    span = daily.agg(
        (F.max("d") - F.min("d") + 1).cast("bigint").alias("n")
    )
    agg = daily.groupBy("event_type").agg(
        F.sum("c").cast("bigint").alias("s"),
        F.sum(F.col("c") * F.col("c")).cast("bigint").alias("ss"),
    ).crossJoin(F.broadcast(span))
    one = F.lit(1.0)
    n, s, ss = F.col("n"), F.col("s"), F.col("ss")
    var = (n * one * ss - s * one * s) / (n * one * (n - one))
    return agg.filter((n > 1) & (s > 0)).select(
        "event_type",
        n.alias("n_days"),
        s.alias("n_events"),
        pround(s * one / n, 6).alias("mean_daily"),
        pround(var / (s * one / n), 6).alias("fano_factor"),
    )


# ---------------------------------------------------------------------------
# Pettitt rank-based changepoint (nonparametric complement to CUSUM)
# ---------------------------------------------------------------------------

# -ln(0.025) pinned as one pre-rounded literal (constant-pinning
# pattern); the 5% two-sided Pettitt threshold is
# sqrt(-ln(alpha/2) * (T^3 + T^2) / 6)
_PETTITT_NL = 3.688879


@register(
    "events_pettitt_changepoint",
    oracle=f"""
    WITH counts AS (
      SELECT epoch_us(ts) // 3600000000 AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM counts
    ), grid AS (
      SELECT gs.h, t.event_type
      FROM (SELECT unnest(generate_series(h0, h1)) AS h FROM bounds) gs
      CROSS JOIN (SELECT DISTINCT event_type FROM counts) t
    ), series AS (
      SELECT g.event_type, g.h, CAST(coalesce(c.n, 0) AS BIGINT) AS x
      FROM grid g LEFT JOIN counts c
        ON c.h = g.h AND c.event_type = g.event_type
    ), vm AS (
      SELECT event_type, x, CAST(count(*) AS BIGINT) AS cv,
             CAST(sum(count(*)) OVER (PARTITION BY event_type ORDER BY x
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum
      FROM series GROUP BY event_type, x
    ), ranked AS (
      SELECT s.event_type, s.h,
             2 * (v.cum - v.cv) + v.cv + 1 AS r2
      FROM series s JOIN vm v ON v.event_type = s.event_type AND v.x = s.x
    ), walk AS (
      SELECT event_type, h,
             CAST(sum(r2) OVER (PARTITION BY event_type ORDER BY h
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cumr2,
             CAST(row_number() OVER (PARTITION BY event_type ORDER BY h)
                  AS BIGINT) AS t,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS tt
      FROM ranked
    ), u AS (
      SELECT event_type, h, tt,
             abs(cumr2 - t * (tt + 1)) AS au
      FROM walk WHERE t < tt
    ), best AS (
      SELECT event_type, tt, max(au) AS k FROM u GROUP BY event_type, tt
    ), at AS (
      SELECT u.event_type, b.tt, b.k, min(u.h) AS change_h
      FROM u JOIN best b ON b.event_type = u.event_type AND u.au = b.k
      GROUP BY u.event_type, b.tt, b.k
    )
    SELECT event_type, CAST(tt AS BIGINT) AS n_hours,
           CAST(k AS BIGINT) AS k_stat,
           CAST(change_h AS BIGINT) AS change_at_hour,
           CAST(CASE WHEN k * 1.0
                       > sqrt({_PETTITT_NL}
                              * (tt * 1.0 * tt * tt + tt * 1.0 * tt) / 6.0)
                THEN 1 ELSE 0 END AS INTEGER) AS significant_95
    FROM at
    """,
    doc="Pettitt changepoint test per event type over the zero-filled "
        "hourly series: the rank-based (Mann-Whitney-statistic) single "
        "changepoint detector — U_t = 2*sum(ranks up to t) - t(T+1), K "
        "= max|U_t|, split at the argmax (earliest hour on ties) — the "
        "NONPARAMETRIC complement to events_cusum_level_shift, which "
        "assumes a mean shift in roughly-normal noise; Pettitt only "
        "needs ranks, so a heavy-tailed burst cannot fake or mask a "
        "level change.  Tie-corrected average ranks come from the "
        "per-type value-marginal cumulative counts (the Mann-Whitney "
        "2x-integer machinery), so U_t, K, and the argmax are EXACT "
        "int64 end to end; the only float is the significance "
        "threshold sqrt(-ln(.025)(T^3+T^2)/6) with the log constant "
        "pinned as one literal — an identical tree compared against "
        "the exact integer K identically in both engines.  Scale "
        "shape: one partial-agg shuffle to calendar-bounded (hour, "
        "type) cells, all windows keyed by type over those cells, "
        "output |types| rows.  int64 headroom: cumr2 <= 2T^2 — "
        "effectively unbounded for calendar series.",
    tags=("events", "stats", "timeseries"),
)
def events_pettitt_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    counts = (
        e.groupBy(
            (F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint").alias("h"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(F.explode(F.sequence("h0", "h1")).alias("h")).crossJoin(
        F.broadcast(counts.select("event_type").distinct())
    )
    series = grid.join(counts, ["h", "event_type"], "left").select(
        "event_type", "h", F.coalesce("n", F.lit(0)).cast("bigint").alias("x")
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    vm = (
        series.groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cv"))
        .withColumn("cum", F.sum("cv").over(wv).cast("bigint"))
    )
    ranked = series.join(vm, ["event_type", "x"]).select(
        "event_type",
        "h",
        (2 * (F.col("cum") - F.col("cv")) + F.col("cv") + 1).alias("r2"),
    )
    wh = Window.partitionBy("event_type").orderBy("h")
    whr = wh.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = Window.partitionBy("event_type")
    walk = ranked.select(
        "event_type",
        "h",
        F.sum("r2").over(whr).cast("bigint").alias("cumr2"),
        F.row_number().over(wh).cast("bigint").alias("t"),
        F.count(F.lit(1)).over(wall).cast("bigint").alias("tt"),
    )
    u = walk.filter(F.col("t") < F.col("tt")).select(
        "event_type",
        "h",
        "tt",
        F.abs(F.col("cumr2") - F.col("t") * (F.col("tt") + 1)).alias("au"),
    )
    best = u.groupBy("event_type", "tt").agg(F.max("au").alias("k"))
    at = (
        u.join(F.broadcast(best), ["event_type", "tt"])
        .filter(F.col("au") == F.col("k"))
        .groupBy("event_type", "tt", "k")
        .agg(F.min("h").alias("change_h"))
    )
    one = F.lit(1.0)
    tt = F.col("tt")
    thresh = F.sqrt(
        F.lit(_PETTITT_NL) * (tt * one * tt * tt + tt * one * tt) / F.lit(6.0)
    )
    return at.select(
        "event_type",
        tt.cast("bigint").alias("n_hours"),
        F.col("k").cast("bigint").alias("k_stat"),
        F.col("change_h").cast("bigint").alias("change_at_hour"),
        F.when(F.col("k") * one > thresh, 1)
        .otherwise(0)
        .cast("int")
        .alias("significant_95"),
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


_XCORR_X, _XCORR_Y = "view", "purchase"
_XCORR_LAGS = (-12, -6, -3, -1, 0, 1, 3, 6, 12)


@register(
    "events_xcorr_view_purchase",
    oracle=f"""
    WITH counts AS (
      SELECT epoch_us(ts) // 3600000000 AS h, event_type,
             CAST(count(*) AS BIGINT) AS n
      FROM events WHERE event_type IN ('{_XCORR_X}', '{_XCORR_Y}')
      GROUP BY 1, 2
    ), bounds AS (
      SELECT min(h) AS h0, max(h) AS h1 FROM counts
    ), grid AS (
      SELECT unnest(generate_series(h0, h1)) AS h FROM bounds
    ), series AS (
      SELECT g.h,
             CAST(coalesce(x.n, 0) AS BIGINT) AS x,
             CAST(coalesce(y.n, 0) AS BIGINT) AS y
      FROM grid g
      LEFT JOIN counts x ON x.h = g.h AND x.event_type = '{_XCORR_X}'
      LEFT JOIN counts y ON y.h = g.h AND y.event_type = '{_XCORR_Y}'
    ), stats AS (
      SELECT CAST(count(*) AS BIGINT) AS t,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy
      FROM series
    ), dev AS (
      SELECT se.h, se.x * st.t - st.sx AS dx, se.y * st.t - st.sy AS dy
      FROM series se CROSS JOIN stats st
    ), den AS (
      SELECT CAST(sum(dx * dx) AS BIGINT) AS dxx,
             CAST(sum(dy * dy) AS BIGINT) AS dyy
      FROM dev
    ), lags(lag) AS (
      VALUES {", ".join(f"({L})" for L in _XCORR_LAGS)}
    ), num AS (
      SELECT l.lag,
             CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(a.dx * b.dy) AS BIGINT) AS nxy
      FROM lags l
      JOIN dev a ON true
      JOIN dev b ON b.h = a.h + l.lag
      GROUP BY l.lag
    )
    SELECT CAST(n.lag AS INTEGER) AS lag, n.n_pairs,
           floor((n.nxy / sqrt(CAST(d.dxx AS DOUBLE) * d.dyy)) * 1000000.0 + 0.5)
             / 1000000.0 AS xcorr
    FROM num n CROSS JOIN den d
    """,
    doc=f"Lead-lag cross-correlation between the zero-filled hourly "
        f"'{_XCORR_X}' and '{_XCORR_Y}' volume series at lags "
        f"{_XCORR_LAGS} (negative lag = {_XCORR_Y} leads) — the "
        f"standard CCF normalization: full-series means and variances, "
        f"r(L) = sum dx(t)dy(t+L) / sqrt(sum dx^2 * sum dy^2), the "
        f"companion of events_hourly_acf for CROSS-series lead-lag "
        f"discovery (does viewing precede purchasing, and by how many "
        f"hours?).  Exact-integer trick shared with the ACF: "
        f"deviations scaled by T (dx = x*T - Sx) so every sum is an "
        f"order-free int64; the T^2 factors cancel in the ratio and "
        f"the only float ops are one multiply and one sqrt on exact "
        f"integers — bit-stable cross-engine.  Scale shape: ONE "
        f"hash-agg over the fact table to hourly cells; the dense "
        f"grid, deviations, lag join (|lags| x |hours| rows) and "
        f"moments are all calendar-bounded metadata; int64 headroom "
        f"matches the ACF note above.",
    tags=("events", "timeseries", "stats"),
)
def events_xcorr_view_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin(_XCORR_X, _XCORR_Y)
    )
    counts = (
        e.groupBy(
            (F.col("ts_us") / F.lit(3_600_000_000)).cast("bigint").alias("h"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .localCheckpoint(eager=False)
    )
    bounds = counts.agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = bounds.select(F.explode(F.sequence("h0", "h1")).alias("h"))
    cx = counts.filter(F.col("event_type") == _XCORR_X).select("h", F.col("n").alias("nx"))
    cy = counts.filter(F.col("event_type") == _XCORR_Y).select("h", F.col("n").alias("ny"))
    series = (
        grid.join(cx, "h", "left")
        .join(cy, "h", "left")
        .select(
            "h",
            F.coalesce("nx", F.lit(0)).cast("bigint").alias("x"),
            F.coalesce("ny", F.lit(0)).cast("bigint").alias("y"),
        )
    )
    stats = series.agg(
        F.count(F.lit(1)).cast("bigint").alias("t"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
    )
    dev = series.crossJoin(F.broadcast(stats)).select(
        "h",
        (F.col("x") * F.col("t") - F.col("sx")).alias("dx"),
        (F.col("y") * F.col("t") - F.col("sy")).alias("dy"),
    )
    dev = dev.localCheckpoint(eager=False)
    den = dev.agg(
        F.sum(F.col("dx") * F.col("dx")).cast("bigint").alias("dxx"),
        F.sum(F.col("dy") * F.col("dy")).cast("bigint").alias("dyy"),
    )
    lags = spark.createDataFrame([(L,) for L in _XCORR_LAGS], "lag int")
    b = dev.select(F.col("h").alias("hb"), F.col("dy").alias("dyb"))
    num = (
        dev.crossJoin(F.broadcast(lags))
        .join(b, F.col("hb") == F.col("h") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.sum(F.col("dx") * F.col("dyb")).cast("bigint").alias("nxy"),
        )
    )
    return num.crossJoin(F.broadcast(den)).select(
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        pround(
            F.col("nxy")
            / F.sqrt(F.col("dxx").cast("double") * F.col("dyy")),
            6,
        ).alias("xcorr"),
    )


@register(
    "events_transition_entropy",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY epoch_ns(ts) // 1000 ASC,
                                             event_id ASC) AS to_type
      FROM events
    ), pairs AS (
      SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE to_type IS NOT NULL
      GROUP BY from_type, to_type
    ), rows_tot AS (
      SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from
      FROM pairs GROUP BY from_type
    ), cond AS (
      SELECT p.from_type, r.n_from,
             CAST(-sum(CAST(floor((p.n * 1.0 / r.n_from)
                                  * log2(p.n * 1.0 / r.n_from)
                                  * 1000000000.0 + 0.5) AS BIGINT))
                  AS BIGINT) AS h_e9
      FROM pairs p JOIN rows_tot r USING (from_type)
      GROUP BY p.from_type, r.n_from
    ), tot AS (
      SELECT CAST(sum(n_from) AS BIGINT) AS c FROM rows_tot
    )
    SELECT c.from_type,
           c.n_from AS n_transitions,
           floor((c.h_e9 / 1000000000.0) * 1000000.0 + 0.5) / 1000000.0
             AS row_entropy_bits,
           floor((CAST(sum(c.n_from * c.h_e9) OVER () AS BIGINT)
                  / (t.c * 1000000000.0))
                 * 1000000.0 + 0.5) / 1000000.0 AS corpus_entropy_rate_bits
    FROM cond c CROSS JOIN tot t
    """,
    doc="Empirical transition entropy of the per-user event-type chain: "
        "per current state, H(next | current = s) = -sum_t p(t|s) "
        "log2 p(t|s) in bits, plus the corpus conditional entropy rate "
        "(the frequency-weighted average) — the predictability scalar "
        "behind bot screens (near-0 bits = scripted loops) and "
        "next-action model ceiling estimates, the scalar summary of "
        "events_markov_transitions' full matrix.  Same sequencing "
        "contract as that query (exact integer micros + event_id).  "
        "Scale shape: ONE user_id shuffle for the lead(), a "
        "|types|^2-row aggregate, and all entropy math on that "
        "metadata-sized cell table; probabilities are ratios of exact "
        "int64 counts so both engines feed log2 identical doubles.  "
        "The weighted-average window runs over |types| rows "
        "(bounded_window_key keeps it warning-free).",
    tags=("events", "session", "stats"),
)
def events_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import bounded_window_key

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc("ts_us"), F.asc("event_id"))
    seq = e.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    pairs = seq.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    pairs = pairs.localCheckpoint(eager=False)
    rows_tot = pairs.groupBy("from_type").agg(F.sum("n").cast("bigint").alias("n_from"))
    p = F.col("n") * F.lit(1.0) / F.col("n_from")
    # per-term e9 quantization BEFORE the sum (hill-tail-index pattern):
    # both engines feed log2 identical doubles, but a sum of doubles is
    # order-dependent — an int64 sum of quantized terms is not.  int64
    # headroom: sum(n_from * h_e9) <= C * log2(|types|) * 1e9, safe to
    # ~1e8 transitions per type; decimal(38,0) swap beyond
    # (warehouse.py:203 pattern).
    term_e9 = F.floor(p * F.log2(p) * F.lit(1_000_000_000.0) + F.lit(0.5)).cast(
        "bigint"
    )
    cond = (
        pairs.join(F.broadcast(rows_tot), "from_type")
        .groupBy("from_type", "n_from")
        .agg((-F.sum(term_e9)).cast("bigint").alias("h_e9"))
    )
    tot = rows_tot.agg(F.sum("n_from").cast("bigint").alias("c"))
    wall = Window.partitionBy(bounded_window_key("from_type")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return cond.crossJoin(F.broadcast(tot)).select(
        "from_type",
        F.col("n_from").alias("n_transitions"),
        pround(F.col("h_e9") / F.lit(1_000_000_000.0), 6).alias("row_entropy_bits"),
        pround(
            F.sum(F.col("n_from") * F.col("h_e9")).over(wall)
            / (F.col("c") * F.lit(1_000_000_000.0)),
            6,
        ).alias("corpus_entropy_rate_bits"),
    )


# --- round 13 addition: sliding (overlapping) event-time windows -----------


@register(
    "events_sliding_window_counts",
    oracle="""
    WITH ev AS (
      SELECT epoch_ns(ts) // 1000 AS us, event_type FROM events
    ), grid AS (
      SELECT event_type,
             (us // 300000000) * 300000000 - k.k * 300000000 AS ws_us
      FROM ev CROSS JOIN (VALUES (0), (1)) k(k)
    )
    SELECT CAST(ws_us AS BIGINT) AS ws_us,
           CAST(ws_us + 600000000 AS BIGINT) AS we_us,
           event_type,
           CAST(count(*) AS BIGINT) AS n
    FROM grid GROUP BY ws_us, we_us, event_type
    """,
    doc="SLIDING event-time windows (width 10 min, slide 5 min) per "
        "event type — F.window with a slide duration, the overlapping "
        "generalization of the reference's tumbling 5-minute window "
        "(nifi_spark_kafka_product_view_platform.py:50-54): every "
        "event lands in exactly width/slide = 2 windows, so the "
        "oracle re-derives the assignment as a 2-row grid join "
        "(window starts floor5(t) and floor5(t)-5min, both always "
        "covering t when width = 2*slide) and re-aggregates "
        "independently.  Window bounds are emitted as exact epoch "
        "MICROS of the stored instant (unix_micros of window.start on "
        "timestamp_micros(ts_us)), so the contract is session-tz-"
        "independent.  Scale shape: Spark EXPANDS each row into its 2 "
        "windows before ONE partial-agged shuffle on (window, type) — "
        "identical cost to two tumbling grids, state linear in the "
        "number of non-empty (window, type) buckets; the streaming "
        "twin (tests/test_streaming.py stream-batch sliding "
        "equivalence) runs this exact plan incrementally under a "
        "watermark.",
    tags=("events", "window", "timeseries", "streaming-twin"),
)
def events_sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select(
        F.timestamp_micros(F.col("ts_us")).alias("t"), "event_type"
    )
    win = e.groupBy(
        F.window("t", "10 minutes", "5 minutes").alias("w"), "event_type"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    return win.select(
        F.unix_micros(F.col("w.start")).alias("ws_us"),
        F.unix_micros(F.col("w.end")).alias("we_us"),
        "event_type",
        "n",
    )
