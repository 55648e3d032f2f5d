"""Semantic tests for the relational tier: the oracle-parity suite
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

def test_bloom_prefilter_no_false_negatives_tiny(spark, tmp_path):
    """2 urgent orders out of 4, all probed via lineitem: member keys
    must always pass (zero false negatives) and with 4 keys in 2^18
    bits there are no collisions, so no false positives either."""
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.relational import (
        orders_bloom_prefilter_bound,
    )

    base = datetime.datetime(2024, 1, 1)
    orders = [
        (k, 1, "O", 100.0, base, "1-URGENT" if k <= 2 else "5-LOW")
        for k in (1, 2, 3, 4)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    lines = [
        (k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", base) for k in (1, 2, 3, 4)
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    row = orders_bloom_prefilter_bound(spark, str(tmp_path)).collect()[0]
    assert row.n_probe_keys == 4
    assert row.n_member_keys == 2
    assert row.zero_false_negatives is True
    assert row.fp_within_bound is True


def test_transit_overlap_counts_only_overlapping_windows(spark, tmp_path):
    """Part 1: two lineitems with overlapping [orderdate, shipdate]
    windows -> 1 pair; part 2: disjoint windows -> no row."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.relational import (
        lineitem_transit_overlap_by_part,
    )

    d = lambda days: BASE + datetime.timedelta(days=days)  # noqa: E731
    spark.createDataFrame(
        [
            (10, 1, 1, 1, d(5)),   # order 10 placed d0 (below), ships d5
            (11, 1, 1, 1, d(12)),  # order 11 placed d3, ships d12 — overlaps
            (12, 2, 1, 1, d(2)),   # order 12 placed d0, ships d2
            (13, 2, 1, 1, d(30)),  # order 13 placed d20, ships d30 — disjoint
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [
            (10, 1, "O", 1.0, d(0), "x"),
            (11, 1, "O", 1.0, d(3), "x"),
            (12, 1, "O", 1.0, d(0), "x"),
            (13, 1, "O", 1.0, d(20), "x"),
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "Brand#1"), (2, "Brand#2")],
        "p_partkey bigint, p_brand string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    rows = lineitem_transit_overlap_by_part(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.p_brand, r.n_overlap_pairs, r.n_parts_with_overlap) == ("Brand#1", 1, 1)


_LINEITEM_SCHEMA = (
    "l_orderkey bigint, l_linenumber int, l_partkey bigint, l_suppkey bigint, "
    "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
    "l_returnflag string, l_linestatus string, l_shipdate timestamp"
)


def test_fifo_allocation_matches_imperative_queue(spark, tmp_path):
    """Property cross-check: the running-sum interval-overlap encoding
    of FIFO allocation must reproduce, exactly, what an IMPERATIVE
    first-in-first-out queue simulator produces — on several seeded
    random supply/demand mixes, including parts with excess supply,
    excess demand, and one-sided parts.  (The oracle-parity suite only
    proves Spark == DuckDB on the same relational encoding; this test
    checks the ENCODING against the textbook queue semantics the
    docstring claims.)"""
    import datetime as _dt
    import random

    from spark_nifi_kafka_connected_device_stream_spark.operators.relational import (
        lineitem_fifo_allocation,
    )

    rng = random.Random(20260816)
    base = _dt.datetime(1995, 1, 1)
    rows = []
    key = 0
    for part in range(1, 7):  # parts 1..6, varied shapes
        n_f = rng.randint(0, 5)
        n_o = rng.randint(0, 5)
        for _i in range(n_f + n_o):
            key += 1
            status = "F" if _i < n_f else "O"
            rows.append(
                (
                    key,                       # l_orderkey (unique)
                    1,
                    part,
                    1,
                    float(rng.randint(1, 9)),  # quantity
                    100.0, 0.0, 0.0, "N",
                    status,
                    base + _dt.timedelta(days=rng.randint(0, 60)),
                )
            )
    spark.createDataFrame(rows, _LINEITEM_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "lineitem.parquet"))

    got = sorted(
        (r.l_partkey, r.supply_orderkey, r.supply_line,
         r.demand_orderkey, r.demand_line, r.alloc_units)
        for r in lineitem_fifo_allocation(spark, str(tmp_path)).collect()
    )

    # imperative reference: per part, walk both FIFO queues
    from collections import defaultdict

    supply, demand = defaultdict(list), defaultdict(list)
    for (ok, ln, part, _s, qty, _e, _d, _t, _rf, status, ship) in rows:
        (supply if status == "F" else demand)[part].append(
            (ship, ok, ln, int(qty))
        )
    expected = []
    for part in supply.keys() | demand.keys():
        sq = sorted(supply[part])
        dq = sorted(demand[part])
        si = di = 0
        s_left = sq[0][3] if sq else 0
        d_left = dq[0][3] if dq else 0
        while si < len(sq) and di < len(dq):
            take = min(s_left, d_left)
            expected.append(
                (part, sq[si][1], sq[si][2], dq[di][1], dq[di][2], take)
            )
            s_left -= take
            d_left -= take
            if s_left == 0:
                si += 1
                s_left = sq[si][3] if si < len(sq) else 0
            if d_left == 0:
                di += 1
                d_left = dq[di][3] if di < len(dq) else 0
    assert got == sorted(expected)


def test_dedup_clusters_match_union_find(spark):
    """Property cross-check: the min-label-propagation connected
    components must equal an independent UNION-FIND closure over the
    exact same candidate pairs."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.dedup import (
        dedup_minhash_lsh,
    )
    from spark_nifi_kafka_connected_device_stream_spark.operators.pipeline_ops import (
        dedup_clusters,
    )

    sf = "/root/testdata/sf0.001"
    pairs = [(r.doc_a, r.doc_b) for r in dedup_minhash_lsh(spark, sf).collect()]
    got = {r.doc_id: r.cluster_id for r in dedup_clusters(spark, sf).collect()}

    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {d: find(d) for d in parent}
    assert got == expected
