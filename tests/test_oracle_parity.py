"""Differential correctness: every registered query vs its DuckDB oracle.

Mirrors the driver's correctness gate (SURVEY.md §5.1): row count,
column names, and order-insensitive value comparison at sf0.001.
Stricter than a hash — on mismatch it prints the first differing rows.
"""

from __future__ import annotations

import math

import pytest

from spark_nifi_kafka_connected_device_stream_spark import registry

from .conftest import SF_SMALL

SPECS = registry.all_specs()
ORACLE_SPECS = sorted(n for n, s in SPECS.items() if s.oracle is not None)
ROWS_ONLY_SPECS = sorted(n for n, s in SPECS.items() if s.oracle is None)


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # collapse -0.0 / 0.0 and FP noise below the rounding contracts
        return round(v + 0.0, 9)
    if isinstance(v, bool):
        return bool(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return round(float(v), 9)
    return v


def _rowset(rows, colnames):
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMALL)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    rel = duck.sql(spec.oracle)
    duck_cols = rel.columns
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch spark={spark_cols} duck={duck_cols}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s_set = _rowset(spark_rows, spark_cols)
    d_set = _rowset(duck_rows, duck_cols)
    if s_set != d_set:
        diffs = [(s, d) for s, d in zip(s_set, d_set) if s != d][:5]
        raise AssertionError(f"{name}: value mismatch; first diffs {diffs}")


# DuckDB output types the driver canonicalizer does not hash stably:
# HUGEINT/UHUGEINT/DECIMAL are rendered as float before hashing (so
# `1435` hashes differently from Spark's `1435`), and LIST/STRUCT crash
# it (`unhashable type: 'list'`).  sum(BIGINT) returns HUGEINT in
# DuckDB, so every integral aggregate must be CAST(sum(...) AS BIGINT)
# on the OUTSIDE.  This killed q12 (round 1) and text_token_stats
# (round 2); this test makes the class structurally impossible.
_UNSTABLE_TYPE_MARKERS = ("HUGEINT", "UHUGEINT", "DECIMAL", "[]", "STRUCT(", "MAP(")


@pytest.mark.parametrize("name", ORACLE_SPECS)
def test_oracle_output_types_hash_stable(duck, name):
    rel = duck.sql(SPECS[name].oracle)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if any(m in str(t).upper() for m in _UNSTABLE_TYPE_MARKERS)
    ]
    assert not bad, (
        f"{name}: oracle emits driver-unhashable DuckDB types {bad}; "
        "CAST the aggregate to BIGINT/DOUBLE outside the sum(), or "
        "serialize arrays with array_to_string on both sides"
    )


@pytest.mark.parametrize("name", ROWS_ONLY_SPECS)
def test_rows_only_queries_run(spark, name):
    spec = SPECS[name]
    sdf = spec.fn(spark, SF_SMALL)
    assert sdf.count() >= 0
    assert len(sdf.columns) > 0


def test_entry_smoke(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    qs, osql = e.queries(), e.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 30


def test_driver_window_contains_all_first_time_queries():
    """The driver's correctness gate checks only the FIRST 50 registry
    entries.  Steady-state invariant: any registered query that has no
    driver row in ANY recorded round (CORRECTNESS_r0*.json) must sit
    inside the current window — the _PROMOTE/_DEMOTE lists in
    registry.py exist for exactly this; this test fails if a new query
    registers outside the window or a refactor reorders one out, so a
    never-checked backlog can't silently accumulate again."""
    import glob
    import json

    checked: set[str] = set()
    for path in glob.glob("/root/repo/CORRECTNESS_r*.json"):
        with open(path) as f:
            checked.update(json.load(f).keys())
    from spark_nifi_kafka_connected_device_stream_spark.registry import DEFERRED

    window = set(list(SPECS)[:50])
    never = set(SPECS) - checked
    missing = never - window - set(DEFERRED)
    assert not missing, f"never-driver-checked queries outside the 50-entry window: {sorted(missing)}"
    # the deferred queue is for window OVERFLOW only: a deferred name
    # that is checked, unknown, or already inside the window is stale
    assert set(DEFERRED) <= never, sorted(set(DEFERRED) - never)
    assert not set(DEFERRED) & window, sorted(set(DEFERRED) & window)


def test_bad_sf_dir_raises_clean_error(spark):
    from pyspark.errors import AnalysisException

    for name in ("q1_pricing_summary", "curation_funnel_report"):
        with pytest.raises(AnalysisException):
            SPECS[name].fn(spark, "/nonexistent/sf_dir").collect()
