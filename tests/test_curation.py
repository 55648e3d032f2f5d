"""Curation-tier behavior + scale-posture checks.

Value parity with DuckDB is covered by tests/test_oracle_parity.py
(these five queries all carry oracles); here we pin the semantic edges
and the physical-plan claims the 100 TB story rests on.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from spark_nifi_kafka_connected_device_stream_spark.operators.curation import (
    BATCH_MOD,
    EVAL_MOD,
    KMEANS_K,
)
from spark_nifi_kafka_connected_device_stream_spark.plans import (
    broadcast_join_count,
    explain_str,
    shuffle_count,
)
from spark_nifi_kafka_connected_device_stream_spark.registry import all_specs

from .conftest import SF_SMALL

SPECS = all_specs()


# ---------------------------------------------------------------- semantics

def test_contamination_excludes_eval_docs(spark):
    df = SPECS["benchmark_contamination"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert rows and all(r.doc_id % EVAL_MOD != 0 for r in rows)
    # ratio bounded and consistent with the flag threshold
    for r in rows:
        assert 0.0 <= r.contamination_ratio <= 1.0
        if r.is_contaminated:
            assert r.n_grams > 0 and r.contamination_ratio >= 0.3 - 1e-4


def test_incremental_statuses_partition_batch(spark):
    df = SPECS["dedup_incremental_exact"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert rows and all(r.doc_id % BATCH_MOD == 0 for r in rows)
    for r in rows:
        if r.status == "duplicate":
            assert r.match_doc is not None and r.match_doc % BATCH_MOD != 0
        else:
            assert r.status == "fresh" and r.match_doc is None


def test_kmeans_covers_all_vectors_once(spark):
    df = SPECS["embedding_kmeans_assign"].fn(spark, SF_SMALL)
    rows = df.collect()
    n_vec = (
        SPECS["embedding_norm_stats"]
        .fn(spark, SF_SMALL)
        .agg(F.sum("n_vectors"))
        .first()[0]
    )
    assert len(rows) == len({r.vec_id for r in rows})
    assert all(0 <= r.cluster < KMEANS_K and r.dist2 >= 0.0 for r in rows)
    # every vector assigned exactly once
    assert len(rows) == n_vec


def test_entropy_bounds(spark):
    df = SPECS["text_char_entropy"].fn(spark, SF_SMALL)
    import math

    for r in df.collect():
        # 0 <= H <= ln(alphabet size)
        assert -1e-9 <= r.entropy <= math.log(r.n_distinct_chars) + 1e-9


def test_quality_deciles_are_balanced_and_ordered(spark):
    df = SPECS["documents_quality_deciles"].fn(spark, SF_SMALL)
    rows = df.collect()
    by_decile = {}
    for r in rows:
        by_decile.setdefault(r.decile, []).append(r.quality_score)
    assert set(by_decile) == set(range(1, 11))
    sizes = [len(by_decile[d]) for d in range(1, 11)]
    assert max(sizes) - min(sizes) <= 1  # exact ntile balance
    # monotone: decile d's worst score >= decile d+1's best (desc order)
    for d in range(1, 10):
        assert min(by_decile[d]) >= max(by_decile[d + 1]) - 1e-9


def test_quantize_codes_roundtrip_shape(spark):
    df = SPECS["embedding_scalar_quantize"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert rows
    for r in rows[:50]:
        codes = [int(c) for c in r.codes.split(",")]
        assert len(codes) == 64
        assert all(0 <= c <= 255 for c in codes)
        assert r.sq_error >= 0.0
    # quantization error bounded by the per-dim cell size:
    # sum over dims of (cell/2)^2 where cell = range/256 — loose 4x slack
    assert max(r.sq_error for r in rows) < 1.0


def test_tfidf_topk_per_doc(spark):
    df = SPECS["text_tfidf_top_terms"].fn(spark, SF_SMALL)
    rows = df.collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r.doc_id, []).append(r)
    for doc, rs in per_doc.items():
        assert len(rs) <= 5 and sorted(r.rnk for r in rs) == list(range(1, len(rs) + 1))
        ordered = sorted(rs, key=lambda r: r.rnk)
        for a, b in zip(ordered, ordered[1:]):
            assert a.tfidf > b.tfidf or (a.tfidf == b.tfidf and a.term < b.term)


def test_bigram_logprob_in_plausible_band(spark):
    df = SPECS["text_bigram_logprob"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert rows
    for r in rows:
        # smoothed probabilities are < 1 → logprob strictly negative,
        # and bounded below by ln(1/(max_c1 + V)) >> -20 on this corpus
        assert -20.0 < r.avg_logprob < 0.0
        assert r.n_bigrams >= 1


# ------------------------------------------------------------- plan posture

def test_contamination_eval_side_is_broadcast(spark):
    df = SPECS["benchmark_contamination"].fn(spark, SF_SMALL)
    assert broadcast_join_count(df) >= 1
    text = explain_str(df)
    assert "BroadcastHashJoin" in text


def test_incremental_corpus_join_is_broadcast(spark):
    df = SPECS["dedup_incremental_exact"].fn(spark, SF_SMALL)
    # batch-keys semi-filter AND the final left join are both broadcast:
    # the corpus never shuffles in full
    assert broadcast_join_count(df) >= 2


def test_kmeans_assignment_is_map_only_kernel(spark):
    # optimization r17: the centroid assignment is the vectorized
    # bit-identical mapInArrow kernel with the k-row centroid table in
    # its closure — the corpus side neither joins nor aggregates, so
    # the final plan has NO join and NO exchange at all (the recenter
    # shuffles run inside the bounded centroid collect, not here).
    # Before the change this asserted a BroadcastNestedLoopJoin + <= 6
    # exchanges; fewer is strictly better, so pin the improvement.
    df = SPECS["embedding_kmeans_assign"].fn(spark, SF_SMALL)
    text = explain_str(df)
    assert "MapInArrow" in text
    assert "Join" not in text
    assert shuffle_count(df) == 0


def test_entropy_two_level_agg_shuffles(spark):
    df = SPECS["text_char_entropy"].fn(spark, SF_SMALL)
    # repartition + (doc,ch) agg + (doc) agg — bounded, no window
    assert shuffle_count(df) <= 3
    assert "windowspecdefinition" not in explain_str(df)


def test_deciles_no_unpartitioned_data_window(spark):
    import re

    df = SPECS["documents_quality_deciles"].fn(spark, SF_SMALL)
    text = explain_str(df)
    assert "ntile(" not in text
    starts = [m.end() for m in re.finditer(r"row_number\(\) windowspecdefinition\(", text)]
    assert starts
    for s in starts:
        frame = text.find("specifiedwindowframe", s)
        assert frame != -1
        assert "_pid" in text[s:frame].split(",")[0]


def test_repetition_stats_bounds_and_gate(spark):
    df = SPECS["text_repetition_stats"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.top_token_share <= 1.0
        assert 0.0 <= r.dup_3gram_ratio <= 1.0
        assert r.passes_repetition == (
            r.top_token_share <= 0.2 and r.dup_3gram_ratio <= 0.18
        )
        # a doc with >= 1 token has top share >= 1/n_tokens
        if r.n_tokens:
            assert r.top_token_share >= 1.0 / r.n_tokens - 1e-4


def test_repetition_stats_is_map_only(spark):
    df = SPECS["text_repetition_stats"].fn(spark, SF_SMALL)
    text = explain_str(df)
    assert "windowspecdefinition" not in text
    # the only exchange is the deliberate input-spread repartition
    assert shuffle_count(df) <= 1


def test_vocab_coverage_curve_shape(spark):
    df = SPECS["text_vocab_coverage"].fn(spark, SF_SMALL)
    rows = sorted(df.collect(), key=lambda r: r.rank)
    assert rows and [r.rank for r in rows] == list(range(1, len(rows) + 1))
    # counts nonincreasing with rank; cumulative share nondecreasing, <= 1
    for a, b in zip(rows, rows[1:]):
        assert a.n_occ >= b.n_occ
        assert a.cum_share <= b.cum_share + 1e-9
    assert rows[-1].cum_share <= 1.0 + 1e-9
    if len(rows) < 50:  # whole vocab fit: the curve must close at 1.0
        assert abs(rows[-1].cum_share - 1.0) < 1e-6


def test_vocab_coverage_topk_is_bounded_sort(spark):
    df = SPECS["text_vocab_coverage"].fn(spark, SF_SMALL)
    text = explain_str(df)
    assert "TakeOrderedAndProject" in text
    # the 1-row total joins as a broadcast cross product, not a shuffle
    assert "BroadcastNestedLoopJoin" in text


def test_mad_outliers_sane(spark):
    df = SPECS["events_value_outliers_mad"].fn(spark, SF_SMALL)
    rows = df.collect()
    assert rows
    for r in rows:
        assert r.n_events > 0
        assert 0 <= r.n_outliers <= r.n_events
        assert r.mad_value >= 0.0
        # an outlier fence at 3 robust sigmas keeps the bulk inside
        assert r.n_outliers < 0.2 * r.n_events


def test_mad_outliers_broadcasts_the_stats(spark):
    df = SPECS["events_value_outliers_mad"].fn(spark, SF_SMALL)
    # med (5 rows) and mad (5 rows) both broadcast back onto events
    assert broadcast_join_count(df) >= 2


def test_funnel_is_monotone_and_consistent(spark):
    df = SPECS["curation_funnel_report"].fn(spark, SF_SMALL)
    rows = sorted(df.collect(), key=lambda r: r.stage_idx)
    assert [r.stage for r in rows] == [
        "total", "exact_dedup", "near_dup", "quality_gate", "repetition_gate"
    ]
    total = rows[0].n_docs
    assert total > 0 and rows[0].pct_of_total == 1.0
    for a, b in zip(rows, rows[1:]):
        assert a.n_docs >= b.n_docs  # survivorship can only shrink
    for r in rows:
        assert abs(r.pct_of_total - r.n_docs / total) < 1e-6


def test_product_quantization_codes_and_seed_rows(spark):
    """PQ invariants on the real fixture: 8 codes per vector, each in
    [0, PQ_K); the PQ_K seed vectors ARE the codebook, so each codes
    itself in every subspace with zero reconstruction error; and
    every vector's chosen code has error <= coding it with any fixed
    alternative (spot-checked against code 0 via a recompute)."""
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation import (
        PQ_K,
        PQ_M,
        PQ_SUBDIM,
    )
    from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import load_table

    df = SPECS["embedding_product_quantization"].fn(spark, SF_SMALL)
    rows = {r.vec_id: r for r in df.collect()}
    assert rows
    for r in rows.values():
        codes = [int(c) for c in r.pq_codes.split(",")]
        assert len(codes) == PQ_M
        assert all(0 <= c < PQ_K for c in codes)
        assert r.sq_error_e6 >= 0
    for k in range(PQ_K):
        assert rows[k].pq_codes == ",".join([str(k)] * PQ_M)
        assert rows[k].sq_error_e6 == 0

    # independent recompute for one non-seed vector: the emitted error
    # must equal the hand-computed error of its emitted codes, and no
    # all-zeros code assignment may beat it
    emb = {
        e["vec_id"]: [float(x) for x in e["v"]]
        for e in load_table(spark, SF_SMALL, "embeddings")
        .selectExpr("vec_id", "transform(embedding, x -> cast(x as double)) AS v")
        .filter("vec_id < 10")
        .collect()
    }
    probe = 7
    codes = [int(c) for c in rows[probe].pq_codes.split(",")]

    def sub_err(vid, m, k):
        a = emb[vid][m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        b = emb[k][m * PQ_SUBDIM:(m + 1) * PQ_SUBDIM]
        s = 0.0
        for x, c in zip(a, b):
            s += (x - c) * (x - c)
        return math.floor(s * 1e6 + 0.5)

    expected = sum(sub_err(probe, m, codes[m]) for m in range(PQ_M))
    assert rows[probe].sq_error_e6 == expected
    zeros = sum(sub_err(probe, m, 0) for m in range(PQ_M))
    assert rows[probe].sq_error_e6 <= zeros
