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


def test_kaplan_meier_matches_python_product_limit(spark, tmp_path):
    """Independent KM cross-check: crafted lifetimes with a censored
    user — the product-limit curve recomputed in plain Python must
    match exactly.  Users: A life 0d (churned), B life 2d (churned),
    C life 2d (churned), D last-seen at the corpus end (CENSORED — at
    risk through its lifetime but contributes no death)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.cohorts import (
        KM_CENSOR_DAYS,
        events_survival_kaplan_meier,
    )

    DAY = 86400
    horizon = (KM_CENSOR_DAYS + 10) * DAY  # corpus end anchor
    rows = [
        # A: single event long ago -> life 0, churned
        (1, 0, 1, "view"),
        # B, C: life 2 days, last seen long before the censor cutoff
        (2, 0, 2, "view"), (3, 2 * DAY, 2, "view"),
        (4, 0, 3, "view"), (5, 2 * DAY, 3, "view"),
        # D: life 5 days ending AT the corpus end -> censored
        (6, horizon - 5 * DAY, 4, "view"), (7, horizon, 4, "view"),
    ]
    sf = write_events4(spark, tmp_path, rows)
    got = {
        r.lifetime_day: (r.n_at_risk, r.n_churned, r.survival)
        for r in events_survival_kaplan_meier(spark, sf).collect()
    }

    # plain-Python product limit over (life, churned):
    import math
    lives = [(0, 1), (2, 1), (2, 1), (5, 0)]
    from collections import Counter
    deaths = Counter(l for l, c in lives if c)
    here = Counter(l for l, _c in lives)
    s, expected, at_risk = 1.0, {}, len(lives)
    for life in sorted(here):
        d = deaths.get(life, 0)
        s *= 1.0 - d / at_risk
        expected[life] = (at_risk, d, math.floor(s * 1e6 + 0.5) / 1e6)
        at_risk -= here[life]
    assert got == expected
