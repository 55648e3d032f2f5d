"""Independent sequential cross-check of the distributed PageRank loop
(the join/groupBy wiring, checkpoint discipline, and left-join zero
fill — the parts the oracle shares formulas with but a sequential
replay does not)."""

from __future__ import annotations


def test_pagerank_matches_sequential_replay(spark):
    from spark_nifi_kafka_connected_device_stream_spark.operators.similarity import (
        PAGERANK_ITERS,
        PAGERANK_SCALE,
        _knn_edges,
        embedding_pagerank_centrality,
    )

    sf = "/root/testdata/sf0.001"
    edges = [
        (r.label, r.src, r.dst)
        for r in _knn_edges(spark, sf).select("label", "src", "dst").collect()
    ]
    got = {
        (r.label, r.vec_id): r.rank_e12
        for r in embedding_pagerank_centrality(spark, sf).collect()
    }

    # sequential replay of the exact integer fixed-point recursion
    from collections import defaultdict

    out = defaultdict(list)
    for lab, s, d in edges:
        out[(lab, s)].append(d)
    cells = defaultdict(set)
    for (lab, s) in out:
        cells[lab].add(s)
    expected = {}
    for lab, nodes in cells.items():
        n = len(nodes)
        r = {v: PAGERANK_SCALE // n for v in nodes}
        base = (15 * PAGERANK_SCALE) // (100 * n)
        for _ in range(PAGERANK_ITERS):
            s = defaultdict(int)
            for v in nodes:
                k = len(out[(lab, v)])
                c = (85 * r[v]) // (100 * k)
                for d in out[(lab, v)]:
                    s[d] += c
            r = {v: base + s.get(v, 0) for v in nodes}
        for v, rv in r.items():
            expected[(lab, v)] = rv
    assert got == expected
