"""Warehouse tier round-trip (K3/K5 batch form) and the Kafka wire
format (binary key/value) through the shared parse chain (P1).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import load_table
from spark_nifi_kafka_connected_device_stream_spark.sources.warehouse import (
    create_external_table,
    write_warehouse_parquet,
)
from spark_nifi_kafka_connected_device_stream_spark.streaming.pipeline import (
    parse_product_views,
    windowed_source_counts,
)

from .conftest import SF_SMALL
from .test_streaming import _mk_events


def test_warehouse_parquet_roundtrip_partitioned(spark, tmp_path):
    """The reference's end state: aggregated (source, source_number)
    parquet readable as a warehouse table (v2:84-89 + dag:68-81),
    partitioned so downstream scans prune."""
    e = load_table(spark, SF_SMALL, "events")
    agg = (
        e.groupBy(F.col("event_type").alias("source"))
        .agg(F.count("*").alias("source_number"))
        .withColumn("dt", F.lit("2024-01-01"))
    )
    loc = str(tmp_path / "commerce")
    write_warehouse_parquet(agg, loc, partition_by=("dt",), mode="overwrite")

    create_external_table(spark, "commerce_rt", loc)
    back = spark.table("commerce_rt")
    orig = {(r["source"], r["source_number"]) for r in agg.collect()}
    got = {(r["source"], r["source_number"]) for r in back.collect()}
    assert got == orig

    # partition pruning: dt filter must not scan other partitions
    pruned = back.filter(F.col("dt") == "2024-01-01")
    assert pruned.count() == len(orig)


def test_kafka_wire_format_binary_value(spark):
    """Kafka delivers key/value as BINARY (S1); the parse chain's first
    step is the binary→string cast (P1, v1:29). Simulate the wire frame
    exactly and run the full chain + aggregation on it."""
    events = _mk_events(0, 30)
    wire = spark.createDataFrame(
        [(str(i).encode(), e[2].encode(), "platform", 0, i) for i, e in enumerate(events)],
        "key binary, value binary, topic string, partition int, offset long",
    )
    parsed = parse_product_views(wire)
    assert parsed.count() == 30
    agg = windowed_source_counts(parsed).collect()
    assert sum(r["source_number"] for r in agg) == 30
    assert {r["source"] for r in agg} == {"desktop", "mobile-web", "mobile-app"}
