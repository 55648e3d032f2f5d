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
        "variant; sketch variant is agg_approx_distinct_bound.",
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
