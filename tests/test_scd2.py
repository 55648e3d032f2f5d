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


def test_scd2_fuzz_invariants(spark):
    """Randomized merge rounds: whatever the update batch looks like,
    the next state must keep (1) exactly one open row per live key,
    (2) every closed row immutable, (3) per-key validity intervals
    non-overlapping and ordered, (4) open-row attrs = the key's
    latest-effective update when one applied."""
    import random

    rng = random.Random(8)
    segs = ["A", "B", "C", "D"]
    for round_i in range(3):
        keys = [f"k{i}" for i in range(20)]
        cur_rows = []
        for k in keys:
            vf = T0
            if rng.random() < 0.3:  # historical closed row first
                cur_rows.append((k, rng.choice(segs), dt.datetime(2023, 1, 1), T0))
            cur_rows.append((k, rng.choice(segs), vf, None))
        current = spark.createDataFrame(cur_rows, SCHEMA)
        upd_rows = [
            (rng.choice(keys + ["new1", "new2"]), rng.choice(segs),
             rng.choice([T1, T2]))
            for _ in range(25)
        ]
        updates = spark.createDataFrame(upd_rows, UP_SCHEMA)
        out = [tuple(r) for r in scd2_apply(current, updates, key="k", attrs=["segment"]).collect()]

        # (1) exactly one open row per key that was live or got an update
        open_rows = {}
        for k, seg, vf, vt in out:
            if vt is None:
                assert k not in open_rows, f"two open rows for {k}"
                open_rows[k] = (seg, vf)
        live = set(keys) | {k for k, _, _ in upd_rows}
        assert set(open_rows) == live

        # (2) pre-existing closed rows pass through untouched
        closed_in = {r for r in cur_rows if r[3] is not None}
        closed_out = {r for r in out if r[3] is not None}
        assert closed_in <= closed_out

        # (3) per-key intervals ordered and non-overlapping
        by_key = {}
        for k, seg, vf, vt in out:
            by_key.setdefault(k, []).append((vf, vt))
        for k, ivs in by_key.items():
            ivs.sort(key=lambda t: t[0])
            for (f1, t1), (f2, t2) in zip(ivs, ivs[1:]):
                assert t1 is not None and t1 <= f2, (k, ivs)

        # (4) the open row carries the latest-effective update's attr
        # (when that update differed from the previous open segment)
        latest = {}
        for k, seg, eff in upd_rows:
            if k not in latest or eff > latest[k][1]:
                latest[k] = (seg, eff)
        prev_open = {k: seg for k, seg, vf, vt in cur_rows if vt is None}
        for k, (seg, eff) in latest.items():
            if k not in prev_open or prev_open[k] != seg:
                assert open_rows[k][0] == seg, (k, open_rows[k], seg)


def test_snapshot_diff_counts_match_construction(spark):
    """The registered reconciliation query's change classes must agree
    with the deterministic perturbation that built snapshot v2."""
    import duckdb

    from spark_nifi_kafka_connected_device_stream_spark.registry import all_specs

    from .conftest import SF_SMALL

    out = all_specs()["orders_snapshot_diff"].fn(spark, SF_SMALL)
    got = {r["change_type"]: r["n"] for r in out.groupBy("change_type").count().withColumnRenamed("count", "n").collect()}
    want = duckdb.sql(f"""
        SELECT
          sum(CASE WHEN o_orderkey % 103 = 0 THEN 1 ELSE 0 END) AS ins,
          sum(CASE WHEN o_orderkey % 101 = 0 THEN 1 ELSE 0 END) AS del,
          sum(CASE WHEN o_orderkey % 97 = 0 AND o_orderkey % 101 <> 0
                   THEN 1 ELSE 0 END) AS upd
        FROM '{SF_SMALL}/orders.parquet'
    """).fetchone()
    assert got.get("insert", 0) == want[0]
    assert got.get("delete", 0) == want[1]
    assert got.get("update", 0) == want[2]
