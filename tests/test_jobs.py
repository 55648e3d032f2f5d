"""End-to-end v2 job: ONE aggregation lineage fanned out to TWO
concurrent sinks (foreachBatch ranking + warehouse parquet), each with
its own checkpoint — SURVEY.md §2.7 / §3.2.
"""

from __future__ import annotations

import os

from spark_nifi_kafka_connected_device_stream_spark.streaming.jobs import (
    run_product_view_job,
)

from .test_streaming import _mk_events, _write_file


def test_product_view_job_dual_sink(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "warehouse")
    chk_dir = str(tmp_path / "chk")
    # two windows of data + flush markers so the watermark finalizes them
    events = _mk_events(0, 150) + _mk_events(5, 90, start_i=150)
    _write_file(in_dir, "b1.json", [e[2] for e in events])

    epochs = []

    def collector(df, epoch_id):
        rows = df.collect()
        if rows:
            epochs.append(rows)

    ranking_q, parquet_q = run_product_view_job(
        spark, in_dir, out_dir, chk_dir, topk=3, collector=collector
    )
    try:
        ranking_q.processAllAvailable()
        parquet_q.processAllAvailable()
        _write_file(in_dir, "b2.json", [e[2] for e in _mk_events(20, 6, start_i=999)])
        ranking_q.processAllAvailable()
        parquet_q.processAllAvailable()
    finally:
        ranking_q.stop()
        parquet_q.stop()

    # sink A: per-epoch ranking emitted, sorted desc, bounded at k=3
    assert epochs
    for rows in epochs:
        counts = [r["source_number"] for r in rows]
        assert counts == sorted(counts, reverse=True) and len(rows) <= 3

    # sink B: warehouse parquet holds the finalized windows with the
    # commerce schema (source, source_number) — v2:74/dag:72-75
    back = spark.read.parquet(out_dir)
    assert set(back.columns) == {"source", "source_number"}
    got = {(r["source"], r["source_number"]) for r in back.collect()}
    # 150 events window 1 (50/source) + 90 events window 2 (30/source)
    assert got == {(s, 50) for s in ("desktop", "mobile-web", "mobile-app")} | {
        (s, 30) for s in ("desktop", "mobile-web", "mobile-app")
    }
