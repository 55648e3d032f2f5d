"""Property tests for the order-dependent pipeline operators (no SQL
oracle exists for greedy packing / iterative CC — invariants instead).
"""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

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


def test_chunk_documents_invariants(spark):
    """Reconstruction properties the oracle can't express directly:
    stride-dropping each chunk's overlap re-yields the exact original
    token stream, every full chunk has CHUNK_TOKENS tokens, and chunk
    ids are dense from 0 per doc."""
    from spark_nifi_kafka_connected_device_stream_spark.functions.textfns import (
        normalize_text,
        tokens,
    )
    from spark_nifi_kafka_connected_device_stream_spark.operators.pipeline_ops import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )
    from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import (
        load_table,
    )

    rows = SPECS["text_chunk_documents"].fn(spark, SF_SMALL).collect()
    by_doc = defaultdict(dict)
    for r in rows:
        by_doc[r["doc_id"]][r["chunk_id"]] = r
    orig = {
        r["doc_id"]: r["toks"]
        for r in load_table(spark, SF_SMALL, "documents")
        .select("doc_id", tokens(normalize_text(F.col("text"))).alias("toks"))
        .collect()
    }
    assert set(by_doc) == {d for d, t in orig.items() if t}
    for doc_id, chunks in by_doc.items():
        n = len(chunks)
        assert sorted(chunks) == list(range(n)), "chunk ids not dense from 0"
        # non-final chunks are always full-size
        for cid in range(n - 1):
            assert chunks[cid]["n_tokens"] == CHUNK_TOKENS
        # first STRIDE tokens of each chunk + the final chunk's tail
        # reconstruct the original token stream exactly
        rebuilt = []
        for cid in range(n):
            toks = chunks[cid]["chunk_text"].split(" ")
            assert len(toks) == chunks[cid]["n_tokens"]
            rebuilt.extend(toks if cid == n - 1 else toks[:CHUNK_STRIDE])
        # chunk cid covers [cid*STRIDE, cid*STRIDE+CHUNK): the first
        # STRIDE tokens of the non-final chunks plus the whole final
        # chunk tile the document exactly
        assert rebuilt == orig[doc_id]
