"""SCD2 merge emulation: change tracking, new keys, idempotency."""

from __future__ import annotations

import datetime as dt

from spark_nifi_kafka_connected_device_stream_spark.operators.scd import scd2_apply

T0 = dt.datetime(2024, 1, 1)
T1 = dt.datetime(2024, 2, 1)
T2 = dt.datetime(2024, 3, 1)

SCHEMA = "k string, segment string, valid_from timestamp, valid_to timestamp"
UP_SCHEMA = "k string, segment string, effective_ts timestamp"


def _state(spark):
    return spark.createDataFrame(
        [
            ("a", "BUILDING", T0, None),
            ("b", "MACHINERY", T0, None),
            ("c", "AUTO", T0, T1),       # already-closed historical row
            ("c", "FURNITURE", T1, None),
        ],
        SCHEMA,
    )


def test_scd2_close_insert_new(spark):
    updates = spark.createDataFrame(
        [
            ("a", "HOUSEHOLD", T2),   # changed → close + new open row
            ("b", "MACHINERY", T2),   # unchanged → untouched
            ("d", "BUILDING", T2),    # new key → first open row
        ],
        UP_SCHEMA,
    )
    out = scd2_apply(_state(spark), updates, key="k", attrs=["segment"])
    rows = {(r["k"], r["segment"], r["valid_from"], r["valid_to"]) for r in out.collect()}
    assert rows == {
        ("a", "BUILDING", T0, T2),
        ("a", "HOUSEHOLD", T2, None),
        ("b", "MACHINERY", T0, None),
        ("c", "AUTO", T0, T1),
        ("c", "FURNITURE", T1, None),
        ("d", "BUILDING", T2, None),
    }
    # exactly one open row per key
    open_per_key = {}
    for k, _, _, vt in rows:
        if vt is None:
            open_per_key[k] = open_per_key.get(k, 0) + 1
    assert all(v == 1 for v in open_per_key.values())


def test_scd2_idempotent_on_same_update(spark):
    updates = spark.createDataFrame([("a", "HOUSEHOLD", T2)], UP_SCHEMA)
    once = scd2_apply(_state(spark), updates, key="k", attrs=["segment"])
    twice = scd2_apply(once, updates, key="k", attrs=["segment"])
    assert {tuple(r) for r in once.collect()} == {tuple(r) for r in twice.collect()}


def test_scd2_latest_update_wins(spark):
    updates = spark.createDataFrame(
        [("a", "STALE", T1), ("a", "FRESH", T2)], UP_SCHEMA
    )
    out = scd2_apply(_state(spark), updates, key="k", attrs=["segment"])
    open_a = [r for r in out.collect() if r["k"] == "a" and r["valid_to"] is None]
    assert len(open_a) == 1 and open_a[0]["segment"] == "FRESH"
