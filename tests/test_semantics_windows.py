"""Semantic tests for the windows tier: the oracle-parity suite
proves Spark == DuckDB on the same SQL; these prove the SQL means what
the docstrings claim, on crafted inputs with hand-computable answers.
(Consolidated from the round-numbered semantic batches — VERDICT r12
item 5: test files are tier-named to match the operator tree.)"""

from __future__ import annotations

import datetime  # noqa: F401

import pytest  # noqa: F401
from pyspark.sql import functions as F  # noqa: F401

from tests.semantics_fixtures import (  # noqa: F401
    BASE,
    DOCS_SCHEMA,
    EVENTS_SCHEMA,
    SF,
    write_docs,
    write_documents,
    write_events4,
    write_events6,
)

def test_percent_rank_cume_dist_small_frame(spark, tmp_path):
    """Three nations in one region with distinct revenues: pct_rank is
    0/0.5/1, cume_dist 1/3, 2/3, 1, ntile(2) halves = 1,1,2."""
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.windows import (
        window_percent_rank_cume_dist,
    )

    base = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(k, k, "O", 100.0 * k, base, "1-URGENT") for k in (1, 2, 3)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(k, f"c{k}", k, 0.0, "BUILDING") for k in (1, 2, 3)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(k, f"n{k}", 0) for k in (1, 2, 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    rows = sorted(
        window_percent_rank_cume_dist(spark, str(tmp_path)).collect(),
        key=lambda r: r.revenue,
    )
    assert [r.pct_rank for r in rows] == [0.0, 0.5, 1.0]
    assert [round(r.cume, 6) for r in rows] == [0.333333, 0.666667, 1.0]
    assert [r.half for r in rows] == [1, 1, 2]


_ORDERS_SCHEMA = (
    "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
    "o_totalprice double, o_orderdate timestamp, o_orderpriority string"
)


def _write_orders(spark, tmp_path, rows):
    """rows: (orderkey, custkey, date_str, price)."""
    import datetime as _dt

    data = [
        (ok, ck, "O", price, _dt.datetime.fromisoformat(d), "1-URGENT")
        for (ok, ck, d, price) in rows
    ]
    spark.createDataFrame(data, _ORDERS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    return str(tmp_path)


def test_leakage_safe_frame_excludes_same_day(spark, tmp_path):
    """One customer, two orders on the SAME day + one 3 days later: the
    PRECEDING-to-PRECEDING frame must exclude same-day peers (both
    day-1 orders see an EMPTY prior week -> NULL/0), while the later
    order sees both."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.windows import (
        window_range_interval_leakage_safe,
    )

    sf = _write_orders(
        spark,
        tmp_path,
        [
            (1, 7, "2024-01-01", 10.00),
            (2, 7, "2024-01-01", 20.00),
            (3, 7, "2024-01-04", 40.00),
        ],
    )
    got = {r.o_orderkey: (r.prior_week_cents, r.prior_week_orders)
           for r in window_range_interval_leakage_safe(spark, sf).collect()}
    assert got == {
        1: (None, 0),      # same-day peer (order 2) EXCLUDED, self excluded
        2: (None, 0),
        3: (3000, 2),      # both day-1 orders inside [d-7, d-1]
    }


def test_range_vs_rows_running_sum_peers(spark, tmp_path):
    """Two same-day orders: the RANGE frame gives both peers the full
    same-day total; the ROWS frame with the orderkey tie-break counts
    them one at a time."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.windows import (
        window_range_peers_running_sum,
    )

    sf = _write_orders(
        spark,
        tmp_path,
        [
            (1, 9, "2024-01-01", 10.00),
            (2, 9, "2024-01-01", 20.00),
            (3, 9, "2024-01-05", 5.00),
        ],
    )
    got = {r.o_orderkey: (r.run_range_cents, r.run_rows_cents)
           for r in window_range_peers_running_sum(spark, sf).collect()}
    assert got == {
        1: (3000, 1000),   # RANGE includes the same-day peer; ROWS does not yet
        2: (3000, 3000),   # last peer: the two frames agree
        3: (3500, 3500),
    }


def test_trailing_30d_calendar_gap_shrinks_window(spark, tmp_path):
    """Value-based frame: an order 31 days after the first must NOT see
    it; an order 30 days after must."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.windows import (
        window_range_interval_trailing_30d,
    )

    sf = _write_orders(
        spark,
        tmp_path,
        [
            (1, 5, "2024-01-01", 10.00),
            (2, 5, "2024-01-31", 20.00),  # day 30 after -> includes order 1
            (3, 5, "2024-02-01", 40.00),  # day 31 after 1 -> excludes order 1
        ],
    )
    got = {r.o_orderkey: (r.spend_30d_cents, r.n_orders_30d)
           for r in window_range_interval_trailing_30d(spark, sf).collect()}
    assert got == {
        1: (1000, 1),
        2: (3000, 2),
        3: (6000, 2),      # orders 2 and 3 only
    }


def test_groups_frames_peer_and_gap_semantics(spark, tmp_path):
    """Crafted one-customer history pinning what makes GROUPS a third
    frame mode: day1 has TWO peer orders (10, 20), day5 one (30 — a
    4-day calendar gap), day6 one (40).

    - trailing GROUPS 1 PRECEDING..CURRENT: both day1 peers see the
      full day1 group (30 cents-units) — peer identity; day5 sees
      day1+day5 = 60 DESPITE the gap (RANGE INTERVAL 1 DAY would see
      only 30); day6 sees day5+day6 = 70 (NOT day1 — groups, not rows:
      ROWS 2 PRECEDING from day6's row would reach into day1).
    - centered 1..1: day5 sees day1+day5+day6 = all 100.
    """
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.windows import (
        window_groups_frames,
    )

    def d(day):
        return datetime.datetime(2024, 1, day)

    rows = [
        (1, 7, "O", 0.10, d(1), "x"),
        (2, 7, "O", 0.20, d(1), "x"),
        (3, 7, "O", 0.30, d(5), "x"),
        (4, 7, "O", 0.40, d(6), "x"),
    ]
    spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))

    got = {
        r.o_orderkey: (r.trail2g_cents, r.trail2g_orders, r.cent3g_cents)
        for r in window_groups_frames(spark, str(tmp_path)).collect()
    }
    # cents: 10, 20, 30, 40
    assert got[1] == (30, 2, 60)   # day1 peers see day1 + the NEXT group
    assert got[2] == (30, 2, 60)   # identical frame value for the peer
    assert got[3] == (60, 3, 100)  # gap does not shrink a GROUPS frame
    assert got[4] == (70, 2, 70)   # exactly one prior GROUP, not 2 rows
