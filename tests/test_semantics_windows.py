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
