"""Property tests for the order-dependent pipeline operators (no SQL
oracle exists for greedy packing / iterative CC — invariants instead).
"""

from __future__ import annotations

from collections import defaultdict

from spark_nifi_kafka_connected_device_stream_spark.operators.pipeline_ops import (
    TOKEN_BUDGET,
)
from spark_nifi_kafka_connected_device_stream_spark.registry import all_specs

from .conftest import SF_SMALL

SPECS = all_specs()


def test_pack_sequences_invariants(spark):
    rows = SPECS["pack_sequences"].fn(spark, SF_SMALL).collect()
    docs = SPECS["text_quality_score"].fn(spark, SF_SMALL).collect()
    # every document assigned exactly once
    assert sorted(r["doc_id"] for r in rows) == sorted(d["doc_id"] for d in docs)
    # bin budgets respected (a bin may hold one oversized doc only)
    fill = defaultdict(list)
    for r in rows:
        fill[(r["source"], r["bin_id"])].append(r["n_tokens"])
    for (_, _), sizes in fill.items():
        if len(sizes) > 1:
            assert sum(sizes) <= TOKEN_BUDGET
    # determinism: second run identical
    again = SPECS["pack_sequences"].fn(spark, SF_SMALL).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_dedup_clusters_match_union_find(spark):
    pairs = [
        (r["doc_a"], r["doc_b"]) for r in SPECS["dedup_minhash_lsh"].fn(spark, SF_SMALL).collect()
    ]
    got = {
        r["doc_id"]: r["cluster_id"] for r in SPECS["dedup_clusters"].fn(spark, SF_SMALL).collect()
    }
    # reference union-find over the same edges
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected = {x: find(x) for x in parent}
    assert got == expected
    # exactly one canonical per cluster
    rows = SPECS["dedup_clusters"].fn(spark, SF_SMALL).collect()
    canon = defaultdict(int)
    for r in rows:
        if r["is_canonical"]:
            canon[r["cluster_id"]] += 1
    assert all(v == 1 for v in canon.values())
    assert set(canon) == set(expected.values())


def test_dataset_mix_rates_plausible(spark):
    # hash-based sampling should land near the configured rates
    sampled = {r["source"]: r["n_sampled"] for r in SPECS["dataset_mix_sample"].fn(spark, SF_SMALL).collect()}
    totals = defaultdict(int)
    for d in SPECS["text_quality_score"].fn(spark, SF_SMALL).collect():
        totals[d["source"]] += 1
    from spark_nifi_kafka_connected_device_stream_spark.operators.pipeline_ops import MIX_RATES

    for src, rate in MIX_RATES.items():
        if totals.get(src, 0) >= 20:
            frac = sampled.get(src, 0) / totals[src]
            assert abs(frac - rate) < 0.35, f"{src}: {frac} vs {rate}"
