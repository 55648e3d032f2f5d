"""Semantic tests for the scd tier: the oracle-parity suite proves
Spark == DuckDB on the same SQL; these prove the SQL means what the
docstrings claim, on crafted inputs with hand-computable answers."""

from __future__ import annotations

import datetime


_CUSTOMER_SCHEMA = (
    "c_custkey bigint, c_name string, c_nationkey int, "
    "c_acctbal double, c_mktsegment string"
)


def _write_customers(spark, tmp_path, rows):
    """rows: (custkey, acctbal, segment)."""
    data = [(k, f"c{k}", 1, bal, seg) for (k, bal, seg) in rows]
    spark.createDataFrame(data, _CUSTOMER_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "customer.parquet"))
    return str(tmp_path)


def test_cdc_apply_log_full_lifecycle(spark, tmp_path):
    """custkey 12 exercises I-U-U-D: three versions, each closed by the
    next op, the last closed by the DELETE (no open row).  custkey 5
    has only the insert: one open row."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.scd import (
        scd2_cdc_apply_log,
    )

    sf = _write_customers(spark, tmp_path, [(12, 10.00, "AUTO"), (5, 20.00, "TOY")])
    rows = sorted(
        (r.c_custkey, r.segment, r.bal_cents, r.valid_from, r.valid_to,
         r.is_current)
        for r in scd2_cdc_apply_log(spark, sf).collect()
    )
    assert rows == [
        (5, "TOY", 2000, "2020-01-01", None, True),
        (12, "AUTO", 1000, "2020-01-01", "2021-02-01", False),
        (12, "AUTO", 1100, "2021-02-01", "2022-03-01", False),
        # deleted on 2023-04-01: the last version is CLOSED, none open
        (12, "UPGRADED", 1100, "2022-03-01", "2023-04-01", False),
    ]


def test_bitemporal_wave1_visible_in_both_views_for_1997_orders(spark, tmp_path):
    """ADVICE r12 regression: an order placed 1997-03-01 (after the
    wave-1 nominal recording day but before the 1997-06-30 report date)
    must have its +200 restatement visible in BOTH views — the
    correction's recording day is clamped UP to the order date."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.scd import (
        orders_bitemporal_correction_report,
    )

    data = [
        # orderkey 7 -> wave 1 (%7); dated INSIDE Jan-Jun 1997
        (7, 1, "O", 10.00, datetime.datetime(1997, 3, 1), "x"),
        # orderkey 3 -> no wave; pre-1997
        (3, 1, "O", 20.00, datetime.datetime(1996, 1, 1), "x"),
    ]
    spark.createDataFrame(
        data,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {r.o_year: (r.rev_as_was_cents, r.rev_as_now_cents, r.n_restated)
           for r in orders_bitemporal_correction_report(spark, str(tmp_path)).collect()}
    # 1997: the restated 1200 cents appears in BOTH views (recorded on
    # the order date, <= the report date), so the delta is zero and the
    # order does not count as a LATE restatement
    assert got[1997] == (1200, 1200, 0)
    assert got[1996] == (2000, 2000, 0)


def test_cdc_incremental_merge_equals_one_shot_rebuild(spark, tmp_path):
    """The chunked merge loop and the lead()-based rebuild must land on
    the same history for every lifecycle class: I-only (key 5),
    I-U1 (3), I-U2 (4), I-U1-D (6), and the full I-U1-U2-D (12)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.scd import (
        scd2_cdc_apply_log,
        scd2_cdc_incremental_merge,
    )

    # keys: 5 (I only), 3 (I,U1), 4 (I,U2), 6 (I,U1,D), 12 (I,U1,U2,D)
    sf = _write_customers(
        spark,
        tmp_path,
        [(5, 20.00, "TOY"), (3, 30.00, "AUTO"), (4, 40.00, "BLD"),
         (6, 60.00, "HHD"), (12, 10.00, "MCH")],
    )
    inc = sorted(map(tuple, scd2_cdc_incremental_merge(spark, sf).collect()))
    one = sorted(map(tuple, scd2_cdc_apply_log(spark, sf).collect()))
    assert inc == one
    # and the lifecycle shape is right: key 12 has 3 closed rows, key 5
    # one open row
    by_key = {}
    for r in inc:
        by_key.setdefault(r[0], []).append(r)
    assert len(by_key[12]) == 3 and all(not row[5] for row in by_key[12])
    assert len(by_key[5]) == 1 and by_key[5][0][5] is True
