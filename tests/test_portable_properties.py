"""Property-based tests (hypothesis) for the cross-engine portability
contracts everything else stands on: pround, the md5 hash contract,
and the range-partitioned prefix scans.  The example-based tests pin
known-tricky points; these sweep the input space for the boundary
nobody thought of."""

from __future__ import annotations

import hashlib
import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# money-like and generic doubles; the .5 boundaries that broke Spark's
# native round() come from 2-decimal products, so bias toward those
_money = st.integers(min_value=-(10**9), max_value=10**9).map(lambda c: c / 100.0)
_double = st.floats(
    min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False
)

_PROPS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(vals=st.lists(st.one_of(_money, _double), min_size=1, max_size=40),
       n=st.integers(min_value=0, max_value=6))
@_PROPS
def test_pround_matches_duckdb_everywhere(spark, duck, vals, n):
    """pround(x, n) must be bit-identical to the DuckDB floor formula
    on ANY double — the contract every oracle comparison relies on."""
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    from spark_nifi_kafka_connected_device_stream_spark.functions.portable import (
        duck_pround,
        pround,
    )

    got = [r.r for r in df.select(pround(F.col("x"), n).alias("r")).collect()]
    # cast the VALUES literals: DuckDB parses bare decimals as DECIMAL
    # (the exact gotcha the oracles avoid with 100D-style literals) and
    # DECIMAL*scale overflows — the contract is defined on DOUBLEs
    rows = ", ".join(f"(CAST({v!r} AS DOUBLE))" for v in vals)
    want = [
        r[0]
        for r in duck.sql(
            f"SELECT {duck_pround('x', n)} FROM (VALUES {rows}) t(x)"
        ).fetchall()
    ]
    assert len(got) == len(want)
    for g, w in zip(got, want):
        # bit-identical, including signed zeros and exact boundaries
        assert (g == w and math.copysign(1, g) == math.copysign(1, w)) or (
            math.isnan(g) and math.isnan(w)
        ), (g, w, n)


@given(texts=st.lists(st.text(min_size=0, max_size=60), min_size=1, max_size=20))
@_PROPS
def test_md5_contract_across_engines(spark, duck, texts):
    """md5 hex — the only hash allowed in checked outputs — must agree
    across Spark, DuckDB, and Python on arbitrary unicode."""
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {
        r.s: r.h
        for r in df.select("s", F.md5(F.encode("s", "UTF-8")).alias("h")).collect()
    }
    for t in texts:
        py = hashlib.md5(t.encode("utf-8")).hexdigest()
        duck_h = duck.sql("SELECT md5(?)", params=[t]).fetchone()[0]
        assert got[t] == py == duck_h, t


@given(
    vals=st.lists(st.integers(min_value=-10**6, max_value=10**6),
                  min_size=1, max_size=60),
    nparts=st.integers(min_value=1, max_value=9),
)
@_PROPS
def test_global_running_scans_match_window(spark, vals, nparts):
    """global_running_sum / global_running_max must equal the
    single-task unpartitioned window for ANY sequence and partition
    count — the primitives under Pareto, backlog, skyline."""
    from pyspark.sql import Window

    from spark_nifi_kafka_connected_device_stream_spark.functions.scale import (
        global_running_max,
        global_running_sum,
    )

    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "k int, v long"
    )
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want_sum = {
        r.k: r.m for r in df.withColumn("m", F.sum("v").over(w)).collect()
    }
    want_max = {
        r.k: r.m for r in df.withColumn("m", F.max("v").over(w)).collect()
    }
    got_sum = {
        r.k: r.m
        for r in global_running_sum(
            df, [F.col("k")], "v", "m", num_partitions=nparts
        ).collect()
    }
    got_max = {
        r.k: r.m
        for r in global_running_max(
            df, [F.col("k")], "v", "m", num_partitions=nparts
        ).collect()
    }
    assert got_sum == want_sum
    assert got_max == want_max
