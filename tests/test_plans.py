"""Scale-posture assertions: the physical plans are the plans we'd
want at 100 TB — filters pushed into parquet scans, columns pruned,
dims broadcast, no gratuitous shuffles.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_nifi_kafka_connected_device_stream_spark.plans import (
    broadcast_join_count,
    pushed_filters,
    scan_columns,
    shuffle_count,
)
from spark_nifi_kafka_connected_device_stream_spark.registry import all_specs
from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import load_table

from .conftest import SF_SMALL

SPECS = all_specs()


def test_filter_pushdown_reaches_scan(spark):
    df = SPECS["scan_filter_project"].fn(spark, SF_SMALL)
    pushed = " ".join(pushed_filters(df))
    assert "l_shipdate" in pushed and "l_quantity" in pushed


def test_column_pruning(spark):
    df = SPECS["scan_filter_project"].fn(spark, SF_SMALL)
    for cols in scan_columns(df):
        # scan must not read all 11 lineitem columns for a 4-column projection
        assert len(cols) <= 6, f"scan reads too many columns: {cols}"


def test_q6_all_predicates_pushed(spark):
    df = SPECS["q6_revenue_delta"].fn(spark, SF_SMALL)
    pushed = " ".join(pushed_filters(df))
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed to scan"


def test_dim_joins_are_broadcast(spark):
    assert broadcast_join_count(SPECS["join_broadcast_dim"].fn(spark, SF_SMALL)) >= 2
    assert broadcast_join_count(SPECS["q5_local_supplier_volume"].fn(spark, SF_SMALL)) >= 4
    assert broadcast_join_count(SPECS["q10_returned_items"].fn(spark, SF_SMALL)) >= 2


def test_q1_shuffle_budget(spark):
    # one aggregation ⇒ exactly one exchange (partial/final HashAggregate)
    assert shuffle_count(SPECS["q1_pricing_summary"].fn(spark, SF_SMALL)) <= 1


def test_topk_is_take_ordered_not_global_sort(spark):
    from spark_nifi_kafka_connected_device_stream_spark.plans import explain_str

    df = SPECS["sort_topk_global"].fn(spark, SF_SMALL)
    assert "TakeOrderedAndProject" in explain_str(df)


def test_sessionize_single_exchange_for_both_windows(spark):
    # lag window + running-sum window + final groupBy all share the
    # user_id partitioning: at most 2 exchanges total
    df = SPECS["events_sessionize"].fn(spark, SF_SMALL)
    assert shuffle_count(df) <= 2


def test_broadcast_threshold_respected_for_fact_join(spark):
    # orders ⋈ lineitem (both "fact" side at real scale) — make sure the
    # deliberately-broadcast queries didn't accidentally broadcast a fact
    li = load_table(spark, SF_SMALL, "lineitem")
    o = load_table(spark, SF_SMALL, "orders")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).groupBy("o_orderstatus").count()
    # (at sf0.001 AQE may still broadcast; this documents the check, so
    # just assert the plan builds and runs)
    assert joined.count() > 0
