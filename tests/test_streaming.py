"""Streaming golden tests (SURVEY.md §5.2): deterministic file replay
standing in for Kafka+NiFi, asserting

1. stream-batch equivalence: windowed counts from the streaming plan
   equal the batch groupBy of the same (non-late) events,
2. watermark semantics: an event > 5 min behind the max seen event
   time is dropped (A1, v1:49),
3. malformed JSON rows become nulls and are dropped (P2, v1:29),
4. the array-form payload explodes to one row per element (P9/P11),
5. the foreachBatch sorted top-k emit (K2/O1, v2:9-14).

No wall-clock dependence: all timestamps live in the data.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest
from pyspark.sql import functions as F

from spark_nifi_kafka_connected_device_stream_spark.sources.json_events import (
    json_file_batch,
    json_file_stream,
)
from spark_nifi_kafka_connected_device_stream_spark.streaming.pipeline import (
    explode_event_array,
    parse_product_views,
    stamp_processing_time,
    windowed_source_counts,
)
from spark_nifi_kafka_connected_device_stream_spark.streaming.sinks import (
    foreach_batch_topk,
    memory_sink,
)

SOURCES = ("desktop", "mobile-web", "mobile-app")


def _event(ts: str, i: int, source: str) -> str:
    return (
        f'{{"event": "ProductView", "messageid": "m-{i}", "userid": "user-{i % 7}",'
        f' "properties": {{"productid": "product-{i % 13}"}},'
        f' "context": {{"source": "{source}"}}, "timestamp": "{ts}+0000"}}'
    )


def _mk_events(base_min: int, n: int, start_i: int = 0) -> list[tuple[str, str, str]]:
    """n events starting at 2021-03-06 10:<base_min>, 1/sec, round-robin
    sources (the reference's replay shape, README.md:7)."""
    out = []
    for j in range(n):
        minute = base_min + j // 60
        sec = j % 60
        ts = f"2021-03-06 10:{minute:02d}:{sec:02d}.000"
        src = SOURCES[j % 3]
        out.append((ts, src, _event(ts, start_i + j, src)))
    return out


@pytest.fixture()
def replay_dir(tmp_path):
    return str(tmp_path / "in")


def _write_file(directory: str, name: str, lines: list[str]) -> None:
    os.makedirs(directory, exist_ok=True)
    tmp = os.path.join(directory, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(lines) + "\n")
    os.rename(tmp, os.path.join(directory, name))


def test_stream_batch_equivalence_and_late_drop(spark, replay_dir, tmp_path):
    # batch 1: windows 10:00-10:05 (90 events), 10:05-10:10 (120), plus
    # markers late in 10:10-10:15 so the post-batch-1 watermark
    # (max event time 10:10:59 - 5 min = 10:05:59) passes W1's end —
    # Spark expires a window only once watermark >= window.end
    batch1_events = _mk_events(0, 90) + _mk_events(5, 120, start_i=90) + _mk_events(
        10, 60, start_i=300
    )
    lines1 = [e[2] for e in batch1_events]
    lines1.insert(10, "{not valid json at all")  # P2: malformed → dropped
    lines1.insert(50, '{"event": "ProductView"}')  # parseable, no timestamp → dropped
    _write_file(replay_dir, "batch1.json", lines1)

    stream = json_file_stream(spark, replay_dir, max_files_per_trigger=1)
    agg = windowed_source_counts(parse_product_views(stream))
    q = memory_sink(agg, "pv_counts", output_mode="append").option(
        "checkpointLocation", str(tmp_path / "chk")
    ).start()
    try:
        q.processAllAvailable()
        # batch 2: a LATE event into the already-expired W1 (watermark
        # 10:05:59 > W1 end 10:05:00 → dropped) + flush events at 10:20
        # that push the watermark past every batch-1 window
        late = _event("2021-03-06 10:01:30.000", 999, "desktop")
        flush = [e[2] for e in _mk_events(20, 30, start_i=1000)]
        _write_file(replay_dir, "batch2.json", [late] + flush)
        q.processAllAvailable()
    finally:
        q.stop()

    got = {
        (r["start"].strftime("%H:%M"), r["source"]): r["source_number"]
        for r in spark.sql("SELECT * FROM pv_counts").collect()
    }
    expected = Counter()
    for ts, src, _ in batch1_events:  # late event NOT counted; flush window never emitted
        minute = int(ts[14:16])
        window = f"10:{(minute // 5) * 5:02d}"
        expected[(window, src)] += 1
    assert got == dict(expected)

    # cross-check: the same plan in batch mode over all files (late event
    # INCLUDED — batch has no watermark) differs in exactly the late window
    batch = windowed_source_counts(
        parse_product_views(json_file_batch(spark, replay_dir))
    )
    batch_counts = {
        (r["start"].strftime("%H:%M"), r["source"]): r["source_number"]
        for r in batch.collect()
        if r["start"].strftime("%H:%M") in ("10:00", "10:05", "10:10")
    }
    assert batch_counts[("10:00", "desktop")] == expected[("10:00", "desktop")] + 1
    del batch_counts[("10:00", "desktop")]
    rest = {k: v for k, v in expected.items() if k != ("10:00", "desktop")}
    assert batch_counts == rest


def test_distinct_users_variant(spark, replay_dir, tmp_path):
    events = _mk_events(0, 60)
    _write_file(replay_dir, "b1.json", [e[2] for e in events])
    stream = json_file_stream(spark, replay_dir)
    agg = windowed_source_counts(parse_product_views(stream), distinct_col="userid")
    q = memory_sink(agg, "pv_users", output_mode="append").option(
        "checkpointLocation", str(tmp_path / "chk2")
    ).start()
    try:
        q.processAllAvailable()
        flush = [e[2] for e in _mk_events(20, 3, start_i=100)]
        _write_file(replay_dir, "b2.json", flush)
        q.processAllAvailable()
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM pv_users").collect()
    # 60 events round-robin over 3 sources × 7 userids; each source sees
    # 20 events → all 7 users (approx_count_distinct exact at this scale)
    assert {(r["source"], r["source_number"]) for r in rows} == {(s, 7) for s in SOURCES}


def test_explode_event_array(spark):
    payload = (
        '[{"event":"ProductView","messageid":"a","userid":"u1",'
        '"properties":{"productid":"p1"},"context":{"source":"desktop"},'
        '"timestamp":"2021-03-06 10:00:00.000+0000"},'
        '{"event":"ProductView","messageid":"b","userid":"u2",'
        '"properties":{"productid":"p2"},"context":{"source":"mobile-web"},'
        '"timestamp":"2021-03-06 10:00:01.000+0000"}]'
    )
    df = spark.createDataFrame([(payload,)], ["value"])
    rows = explode_event_array(df).collect()
    assert [r["messageid"] for r in rows] == ["a", "b"]
    assert rows[1]["context"]["source"] == "mobile-web"


def test_stamp_processing_time_parseable(spark):
    df = spark.createDataFrame([("x",)], ["value"])
    stamped = stamp_processing_time(df)
    parsed = stamped.select(
        F.to_timestamp("timestamp", "yyyy-MM-dd HH:mm:ss.SSSZ").alias("ts")
    ).collect()
    assert parsed[0]["ts"] is not None


def test_rate_source_emits_wire_schema(spark, tmp_path):
    """S4/O2: the rate-source replay harness produces parseable wire
    records at the configured rate (lenient timing assert)."""
    import time

    from spark_nifi_kafka_connected_device_stream_spark.sources.json_events import (
        rate_events,
    )

    raw = rate_events(spark, rows_per_second=20)
    parsed = parse_product_views(raw)
    q = memory_sink(parsed, "rate_pv", output_mode="append").option(
        "checkpointLocation", str(tmp_path / "chkr")
    ).trigger(processingTime="250 milliseconds").start()
    try:
        deadline = time.time() + 15
        while time.time() < deadline:
            if spark.sql("SELECT * FROM rate_pv").count() >= 5:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = spark.sql("SELECT * FROM rate_pv").collect()
    assert len(rows) >= 5
    assert {r["source"] for r in rows} <= set(SOURCES)
    assert all(r["timestamp"] is not None and r["messageid"].startswith("msg-") for r in rows)


def test_complete_mode_running_totals(spark, replay_dir, tmp_path):
    """Complete output mode: the sink receives the FULL aggregate state
    every trigger (no watermark needed) — the third output-mode leg
    next to update (K1) and append (K3)."""
    _write_file(replay_dir, "b1.json", [e[2] for e in _mk_events(0, 30)])
    stream = json_file_stream(spark, replay_dir, max_files_per_trigger=1)
    totals = (
        parse_product_views(stream)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("source_number"))
    )
    q = memory_sink(totals, "pv_complete", output_mode="complete").option(
        "checkpointLocation", str(tmp_path / "chkc")
    ).start()
    try:
        q.processAllAvailable()
        _write_file(replay_dir, "b2.json", [e[2] for e in _mk_events(10, 30, start_i=100)])
        q.processAllAvailable()
    finally:
        q.stop()
    rows = {r["source"]: r["source_number"] for r in spark.sql("SELECT * FROM pv_complete").collect()}
    assert rows == {s: 20 for s in SOURCES}


def test_foreach_batch_topk(spark, replay_dir, tmp_path):
    events = _mk_events(0, 61)  # 21 desktop, 20 each others
    _write_file(replay_dir, "b1.json", [e[2] for e in events])
    stream = json_file_stream(spark, replay_dir)
    agg = windowed_source_counts(parse_product_views(stream), watermark="1 minute")
    epochs: list[list] = []

    def collect(df, epoch_id):
        rows = df.collect()
        if rows:
            epochs.append(rows)

    q = (
        foreach_batch_topk(agg, k=2, collector=collect)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "chk3"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert epochs, "no epochs captured"
    top = epochs[-1]
    assert len(top) == 2
    counts = [r["source_number"] for r in top]
    assert counts == sorted(counts, reverse=True)
    assert top[0]["source"] == "desktop" and top[0]["source_number"] == 21


def test_watermark_drop_is_observable_in_state_metrics(spark, replay_dir, tmp_path):
    """The late-drop behavior is not just output-visible: the streaming
    progress metrics must account for it (`numRowsDroppedByWatermark`),
    and the windowed aggregation must actually carry state rows — the
    observability surface an operator watches at 100 TB, where you
    detect watermark misconfiguration from metrics, not from diffing
    outputs."""
    batch1 = [e[2] for e in _mk_events(0, 30) + _mk_events(10, 10, start_i=100)]
    _write_file(replay_dir, "b1.json", batch1)
    stream = json_file_stream(spark, replay_dir, max_files_per_trigger=1)
    agg = windowed_source_counts(parse_product_views(stream))
    q = memory_sink(agg, "pv_obs", output_mode="append").option(
        "checkpointLocation", str(tmp_path / "chk_obs")
    ).start()
    try:
        q.processAllAvailable()
        # watermark is now 10:10:xx - 5min > 10:05 > window-1 end;
        # this event targets the expired 10:00-10:05 window -> dropped
        _write_file(
            replay_dir, "b2.json", [_event("2021-03-06 10:01:30.000", 999, "desktop")]
        )
        q.processAllAvailable()
        progresses = [p for p in q.recentProgress if p.get("stateOperators")]
        assert progresses, "no state-operator progress reported"
        dropped = sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in progresses
            for op in p["stateOperators"]
        )
        assert dropped >= 1
        state_rows = max(
            op.get("numRowsTotal", 0)
            for p in progresses
            for op in p["stateOperators"]
        )
        assert state_rows >= 1  # open windows held as state
    finally:
        q.stop()


def test_available_now_catch_up_exactly_once(spark, replay_dir, tmp_path):
    """Trigger.AvailableNow: process ALL pending files with streaming
    semantics (respecting maxFilesPerTrigger batching), then terminate
    on its own — the scheduled-catch-up mode a production ingest job
    runs from cron instead of a 24/7 driver.  A restart with new files
    must process ONLY the new ones (checkpointed offsets carry
    across runs — exactly-once, no reprocessing)."""
    from pyspark.sql import functions as F

    _write_file(replay_dir, "a.json", [e[2] for e in _mk_events(0, 30)])
    _write_file(replay_dir, "b.json", [e[2] for e in _mk_events(5, 40, start_i=100)])
    out_dir = str(tmp_path / "out")
    chk = str(tmp_path / "chk")

    def run_once():
        stream = parse_product_views(
            json_file_stream(spark, replay_dir, max_files_per_trigger=1)
        )
        q = (
            stream.select("userid", "productid", "timestamp")
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        assert not q.isActive, "availableNow query must self-terminate"

    run_once()
    assert spark.read.parquet(out_dir).count() == 70

    # second run: one new file; the two old files must NOT reprocess
    _write_file(replay_dir, "c.json", [e[2] for e in _mk_events(10, 25, start_i=500)])
    run_once()
    df = spark.read.parquet(out_dir)
    assert df.count() == 95
    assert df.select("userid", "productid", "timestamp").distinct().count() == 95


def test_observe_parse_quality_reports_dropped_rows(spark, tmp_path):
    """observe() piggybacks DQ counters on the parse scan: malformed
    JSON and bad timestamps are counted per micro-batch in
    observedMetrics while the output rows stay identical to
    parse_product_views — no second pass over the stream."""
    from spark_nifi_kafka_connected_device_stream_spark.streaming.pipeline import (
        observe_parse_quality,
    )

    d = str(tmp_path / "in")
    good = [e[2] for e in _mk_events(0, 3)]
    bad_json = ["{not json at all"]
    bad_ts = ['{"messageid":"m-x","userid":"user-0","properties":{"productid":"p"},'
              '"context":{"source":"desktop"},"timestamp":"not-a-date"}']
    _write_file(d, "b1.json", good + bad_json + bad_ts)
    out = observe_parse_quality(json_file_stream(spark, d))
    q = (
        out.writeStream.format("memory")
        .queryName("dq_rows")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [
            p for p in (q.recentProgress or []) if p.get("observedMetrics", {}).get("parse_dq")
        ]
    finally:
        q.stop()
    assert spark.sql("SELECT count(*) c FROM dq_rows").collect()[0]["c"] == 3
    m = [p["observedMetrics"]["parse_dq"] for p in progress]
    total = {
        k: sum(x[k] for x in m) for k in ("rows_seen", "rows_bad_json", "rows_bad_ts")
    }
    assert total == {"rows_seen": 5, "rows_bad_json": 1, "rows_bad_ts": 1}


def test_sliding_window_stream_batch_equivalence(spark, replay_dir, tmp_path):
    """Round-13 stretch (VERDICT r12 item 7): the SLIDING-window
    streaming aggregation (10-minute windows every 5 minutes) emits,
    over a drained replay, exactly the batch sliding-window counts of
    the same events — each event counted in TWO overlapping windows.
    This is the streaming twin of the registered batch query
    events_sliding_window_counts (operators/events.py)."""
    events = _mk_events(0, 90) + _mk_events(5, 120, start_i=90) + _mk_events(
        12, 45, start_i=300
    )
    _write_file(replay_dir, "b1.json", [e[2] for e in events])
    # flush events far enough ahead that the watermark passes every
    # earlier window's end, so append mode emits them all
    flush = [e[2] for e in _mk_events(40, 30, start_i=2000)]
    _write_file(replay_dir, "b2.json", flush)

    stream = json_file_stream(spark, replay_dir, max_files_per_trigger=1)
    agg = windowed_source_counts(
        parse_product_views(stream), slide="5 minutes", window_duration="10 minutes"
    )
    q = memory_sink(agg, "pv_sliding", output_mode="append").option(
        "checkpointLocation", str(tmp_path / "chk_sliding")
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["start"].strftime("%H:%M"), r["source"]): r["source_number"]
        for r in spark.sql("SELECT * FROM pv_sliding").collect()
        if r["start"].strftime("%H:%M") < "10:20"
    }

    # batch twin: every event belongs to windows floor5(t) and
    # floor5(t)-5min (width = 2 * slide)
    expected = Counter()
    for ts, src, _ in events:
        minute = int(ts[14:16])
        lo = (minute // 5) * 5
        for start in (lo, lo - 5):
            expected[(f"10:{start:02d}" if start >= 0 else "09:55", src)] += 1
    assert got == dict(expected)

    # and the SAME plan in batch mode agrees (no watermark in batch)
    batch = windowed_source_counts(
        parse_product_views(json_file_batch(spark, replay_dir)),
        slide="5 minutes",
        window_duration="10 minutes",
    )
    batch_counts = {
        (r["start"].strftime("%H:%M"), r["source"]): r["source_number"]
        for r in batch.collect()
        if r["start"].strftime("%H:%M") < "10:20"
    }
    assert batch_counts == dict(expected)


def test_trailing_interval_stream_batch_equivalence(spark, replay_dir, tmp_path):
    """Round-14 (VERDICT r13 item 6): the streaming twin of the batch
    RANGE-interval frame window_range_interval_trailing_30d
    (operators/windows.py).  A stream cannot emit a per-ROW trailing
    frame over unbounded history — the streaming restatement samples
    the trailing interval at slide boundaries: a 30-minute window
    sliding every 5 minutes per USER is exactly 'this user's activity
    in the trailing 30 minutes', evaluated at each 5-minute boundary,
    with watermark-bounded state.  Equivalence: the drained stream's
    per-(user, window) counts equal the batch plan of the same sliding
    window AND a hand-computed trailing count per boundary."""
    events = _mk_events(0, 120) + _mk_events(18, 60, start_i=500)
    _write_file(replay_dir, "t1.json", [e[2] for e in events])
    # flush far ahead so the watermark closes every earlier window
    _write_file(
        replay_dir, "t2.json", [e[2] for e in _mk_events(58, 10, start_i=3000)]
    )

    stream = json_file_stream(spark, replay_dir, max_files_per_trigger=1)
    agg = windowed_source_counts(
        parse_product_views(stream),
        key_col="userid",
        window_duration="30 minutes",
        slide="5 minutes",
    )
    q = (
        memory_sink(agg, "trail_user", output_mode="append")
        .option("checkpointLocation", str(tmp_path / "chk_trail"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {
        (r["start"].strftime("%H:%M"), r["userid"]): r["source_number"]
        for r in spark.sql("SELECT * FROM trail_user").collect()
        if r["start"].strftime("%H:%M") < "10:30"
    }

    # hand-computed trailing semantics: an event at minute m belongs to
    # every 30-minute window [s, s+30) with s in {floor5(m)-25, ..,
    # floor5(m)} — i.e. the trailing window evaluated at each boundary
    expected = Counter()
    for idx, (ts, _src, _line) in enumerate(events):
        i = idx if idx < 120 else 500 + (idx - 120)
        user = f"user-{i % 7}"
        minute = int(ts[14:16])
        lo = (minute // 5) * 5
        for start in range(lo - 25, lo + 1, 5):
            if start >= -30:
                label = f"10:{start:02d}" if start >= 0 else f"09:{60 + start:02d}"
                if label < "10:30":
                    expected[(label, user)] += 1
    assert got == dict(expected)

    # and the SAME plan in batch mode agrees
    batch = windowed_source_counts(
        parse_product_views(json_file_batch(spark, replay_dir)),
        key_col="userid",
        window_duration="30 minutes",
        slide="5 minutes",
    )
    batch_counts = {
        (r["start"].strftime("%H:%M"), r["userid"]): r["source_number"]
        for r in batch.collect()
        if r["start"].strftime("%H:%M") < "10:30"
    }
    assert batch_counts == dict(expected)


def test_cdc_foreachbatch_merge_equals_batch_rebuild(spark, tmp_path):
    """Round-14 (VERDICT r13 item 4): the STREAMING twin of
    scd2_cdc_incremental_merge — the same op log replayed as a
    foreachBatch stream, each micro-batch MERGEd into the maintained
    SCD2 state with the SHARED apply_cdc_batch function, must land on
    exactly the one-shot batch rebuild (scd2_cdc_apply_log).  Chunk
    order is forced by writing one seq-chunk file per
    processAllAvailable drain (CDC logs are ordered; the file source
    alone does not guarantee it)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.scd import (
        _cdc_ops_log,
        apply_cdc_batch,
    )
    from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import (
        load_table,
    )

    sf = "/root/testdata/sf0.001"
    ops = _cdc_ops_log(load_table(spark, sf, "customer"))
    opdir = tmp_path / "cdc_ops"
    opdir.mkdir()

    state = {"df": None}

    def merge_batch(batch_df, _bid):
        state["df"] = apply_cdc_batch(state["df"], batch_df)
        # materialize now: foreachBatch frames are only valid during
        # the micro-batch, and the K-merge lineage must not re-read them
        state["df"] = state["df"].localCheckpoint(eager=True)

    stream = (
        spark.readStream.schema(ops.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(opdir))
    )
    q = (
        stream.writeStream.foreachBatch(merge_batch)
        .option("checkpointLocation", str(tmp_path / "chk_cdc"))
        .start()
    )
    try:
        import glob as _glob
        import shutil

        for s in range(4):
            # the file stream lists FILES in opdir, not nested dirs:
            # stage the chunk, then move its single part file in flat
            chunk = ops.filter(F.col("seq") == s)
            staging = tmp_path / f"stage{s}"
            chunk.coalesce(1).write.mode("overwrite").parquet(str(staging))
            (part,) = _glob.glob(str(staging / "part-*.parquet"))
            shutil.move(part, str(opdir / f"seq{s}.parquet"))
            q.processAllAvailable()
    finally:
        q.stop()

    final = state["df"].select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "segment",
        "bal_cents",
        F.date_format("valid_from_d", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to_d", "yyyy-MM-dd").alias("valid_to"),
        F.col("valid_to_d").isNull().alias("is_current"),
    )
    from spark_nifi_kafka_connected_device_stream_spark import registry

    rebuild = registry.all_specs()["scd2_cdc_apply_log"].fn(spark, sf)
    got = sorted(map(tuple, final.collect()))
    want = sorted(map(tuple, rebuild.collect()))
    assert got == want
