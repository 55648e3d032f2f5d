"""Semantic tests for the privacy tier: the oracle-parity suite
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

def test_l_diversity_flags_homogeneous_cell(spark, tmp_path):
    """All Monday-midnight events share one type (l=1, not diverse);
    the Monday-1am cell has three types (l=3, diverse)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.privacy import (
        privacy_l_diversity_report,
    )

    rows = [(i, i, 1, "view") for i in range(5)]  # 2024-01-01 is a Monday, hour 0
    rows += [
        (10, 3600, 1, "view"),
        (11, 3610, 2, "click"),
        (12, 3620, 3, "purchase"),
    ]
    sf = write_events4(spark, tmp_path, rows)
    out = {(r.dow, r.hour_of_day): r for r in privacy_l_diversity_report(spark, sf).collect()}
    assert out[(1, 0)].l_distinct == 1 and out[(1, 0)].diverse is False
    assert out[(1, 1)].l_distinct == 3 and out[(1, 1)].diverse is True


def test_t_closeness_homogeneous_hour_violates(spark, tmp_path):
    """Global mix 50/50 A/B.  Hour 0 is ALL A (tvd 0.5 -> violates),
    hour 2 matches the global mix exactly (tvd 0 -> clean)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.privacy import (
        privacy_t_closeness_report,
    )

    rows, eid = [], 0
    for _ in range(4):  # hour 0: 4x A
        rows.append((eid, 0 * 3600 + eid, 1, "A", 1.0, "{}"))
        eid += 1
    for _ in range(4):  # hour 1: 4x B
        rows.append((eid, 1 * 3600 + eid, 1, "B", 1.0, "{}"))
        eid += 1
    for t in ["A", "A", "B", "B"]:  # hour 2: the global mix
        rows.append((eid, 2 * 3600 + eid, 1, t, 1.0, "{}"))
        eid += 1
    sf = write_events6(spark, tmp_path, rows)
    got = {
        r.hour_of_day: (r.tvd, r.violates)
        for r in privacy_t_closeness_report(spark, sf).collect()
    }
    assert got[0] == (0.5, True)
    assert got[1] == (0.5, True)
    assert got[2] == (0.0, False)


def test_sensitivity_is_max_single_user_contribution(spark, tmp_path):
    from spark_nifi_kafka_connected_device_stream_spark.operators.privacy import (
        privacy_sensitivity_report,
    )

    rows = [(i, i, 1, "A", 1.0, "{}") for i in range(5)]  # user 1: 5 rows
    rows.append((5, 5, 2, "A", 1.0, "{}"))  # user 2: 1 row
    sf = write_events6(spark, tmp_path, rows)
    r = privacy_sensitivity_report(spark, sf).collect()[0]
    assert (r.n_rows, r.n_users, r.l1_sensitivity) == (6, 2, 5)
    assert abs(r.max_user_share - round(5 / 6, 6)) < 1e-9
