"""Semantic tests for the cohorts tier: the oracle-parity suite
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

def test_retention_halflife_constructed_decay(spark, tmp_path):
    """100 users all start week 0; 50 stay active in week 1, 25 in
    week 2: exact halving -> slope = ln(1/2) per week, half-life 1.0."""
    rows = []
    eid = 0
    week = 7 * 24 * 3600
    for u in range(100):
        eid += 1
        rows.append((eid, 0, u, "view"))
    for u in range(50):
        eid += 1
        rows.append((eid, week + 60, u, "view"))
    for u in range(25):
        eid += 1
        rows.append((eid, 2 * week + 60, u, "view"))
    sf = write_events4(spark, tmp_path, rows)
    from spark_nifi_kafka_connected_device_stream_spark.operators.cohorts import (
        events_retention_halflife,
    )

    r = events_retention_halflife(spark, sf).collect()[0]
    assert r.n_weeks == 2
    # ln(0.5) quantized to 1e-4: slope = -0.6931 / week
    assert abs(r.decay_slope - (-0.6931)) < 0.0002
    assert abs(r.halflife_weeks - 1.0) < 0.001


def test_audience_overlap_hand_computed(spark, tmp_path):
    """users {1,2} view, {2,3} click: intersection 1, union 3."""
    sf = write_events4(
        spark,
        tmp_path,
        [
            (1, 0, 1, "view"), (2, 10, 2, "view"),
            (3, 20, 2, "click"), (4, 30, 3, "click"),
            (5, 40, 2, "view"),   # duplicate (user, type) must not count twice
        ],
    )
    from spark_nifi_kafka_connected_device_stream_spark.operators.cohorts import (
        events_audience_overlap,
    )

    rows = events_audience_overlap(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.type_a, r.type_b) == ("click", "view")
    assert (r.n_both, r.n_a, r.n_b) == (1, 2, 2)
    assert r.jaccard == round(1 / 3, 6)
