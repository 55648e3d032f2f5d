"""Semantic tests for the udf_ops tier (Python-boundary surfaces): the
oracle-parity suite proves Spark == DuckDB on the same SQL; these prove
the kernels behave on crafted edge inputs with hand-computable answers.
"""

from __future__ import annotations

import datetime

from tests.semantics_fixtures import EVENTS_SCHEMA


def test_applyinarrow_all_null_and_single_row_groups(spark, tmp_path):
    """Round-13 directed-review probe, pinned: the applyInArrow grouped
    kernel must mirror SQL aggregate NULL semantics — a group whose
    `value` column is ALL NULL releases (n, n_users, NULL, NULL), a
    single-row group works (pc.max/min with min_count=1 on one value),
    and NULL rows still count toward n."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.udf_ops import (
        applyinarrow_type_stats,
    )
    from spark_nifi_kafka_connected_device_stream_spark.session import (
        ensure_workers_importable,
    )

    ensure_workers_importable(spark)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (1, base, 10, "allnull", None, "{}"),
        (2, base, 11, "allnull", None, "{}"),
        (3, base, 12, "single", 5.0, "{}"),
        (4, base, 13, "mixed", None, "{}"),
        (5, base, 14, "mixed", 7.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        map(tuple, applyinarrow_type_stats(spark, str(tmp_path)).collect())
    )
    assert got == [
        ("allnull", 2, 2, None, None),
        ("mixed", 2, 2, 700, 700),
        ("single", 1, 1, 500, 500),
    ]


def test_udtf_gap_report_single_event_user(spark, tmp_path):
    """A user with ONE event has no inter-event gap: the TABLE-arg UDTF
    must emit (user, 1, NULL), and gaps are exact micros."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.udf_ops import (
        udtf_table_gap_report,
    )
    from spark_nifi_kafka_connected_device_stream_spark.session import (
        ensure_workers_importable,
    )

    ensure_workers_importable(spark)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        # user 0 (0 % 11 == 0): events at +0s, +5s, +7s -> max gap 5s
        (1, base, 0, "view", 1.0, "{}"),
        (2, base + datetime.timedelta(seconds=5), 0, "view", 1.0, "{}"),
        (3, base + datetime.timedelta(seconds=7), 0, "view", 1.0, "{}"),
        # user 11: a single event -> NULL gap
        (4, base, 11, "view", 1.0, "{}"),
        # user 5 is NOT in the % 11 domain -> excluded before Python
        (5, base, 5, "view", 1.0, "{}"),
    ]
    spark.createDataFrame(rows, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    got = sorted(
        map(tuple, udtf_table_gap_report(spark, str(tmp_path)).collect())
    )
    assert got == [(0, 3, 5_000_000), (11, 1, None)]
