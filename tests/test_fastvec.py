"""Bit-identity pins for the vectorized exact-fold kernels
(functions/fastvec.py, optimization round 17).

The kernels replace Catalyst HOF folds (`aggregate(zip_with(...))`)
in the similarity / ANN / k-means tier.  The swap is safe ONLY
because the numpy evaluation is bit-identical to the interpreted
fold — float32 widened exactly, per-element products as single
float64 ops, and `np.cumsum` as the same strict left-to-right
accumulation.  These tests pin that equivalence against the live HOF
expressions on the real fixture corpus, so a kernel change that
reassociates the arithmetic (e.g. switching to np.sum's pairwise
reduction or a BLAS dot) fails loudly instead of flipping a rounded
6-dp value or a tie-broken rank somewhere downstream.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from spark_nifi_kafka_connected_device_stream_spark.functions import fastvec
from spark_nifi_kafka_connected_device_stream_spark.functions.vectors import dot
from spark_nifi_kafka_connected_device_stream_spark.operators import _kmeans as _km
from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import load_table

from .conftest import SF_SMALL


def test_exact_dot_bit_identical_to_hof_fold(spark):
    """numpy cumsum dot == the Catalyst aggregate/zip_with fold, every
    fixture vector, EXACT float64 equality (no tolerance)."""
    e = load_table(spark, SF_SMALL, "embeddings")
    rows = e.select(
        "vec_id", "embedding", dot(F.col("embedding"), F.col("embedding")).alias("d")
    ).collect()
    assert rows
    for r in rows:
        v = np.array(r.embedding, dtype=np.float32).astype(np.float64)
        assert float(fastvec.exact_dot(v, v)) == r.d, f"vec {r.vec_id}"


def test_exact_dist2_bit_identical_to_hof_fold(spark):
    e = load_table(spark, SF_SMALL, "embeddings")
    first = e.filter(F.col("vec_id") == 0).select("embedding").collect()[0][0]
    c = np.array(first, dtype=np.float32).astype(np.float64)
    cl = [float(x) for x in c]
    d2 = F.aggregate(
        F.zip_with(
            F.col("embedding"),
            F.array(*[F.lit(x) for x in cl]),
            lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    rows = e.select("vec_id", "embedding", d2.alias("d2")).collect()
    for r in rows:
        v = np.array(r.embedding, dtype=np.float32).astype(np.float64)
        assert float(fastvec.exact_dist2(v, c)) == r.d2, f"vec {r.vec_id}"


def test_nearest_cell_matches_crossjoin_min_struct(spark):
    """The map-only argmin kernel == crossJoin + dist2 HOF +
    min-of-struct (dist2, cid) on the real fixture, row for row —
    including the tie-to-lowest-cid rule."""
    emb = _km.embeddings_double(spark, SF_SMALL)
    cent = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cid"), F.col("v").alias("c")
    )
    scored = emb.crossJoin(F.broadcast(cent)).select(
        "vec_id", "cid", _km.dist2(F.col("v"), F.col("c")).alias("dist2")
    )
    want = {
        (r.vec_id): (r.b.cid, r.b.dist2)
        for r in scored.groupBy("vec_id")
        .agg(F.min(F.struct("dist2", "cid")).alias("b"))
        .collect()
    }
    rows = fastvec.collect_vectors(cent, "cid", "c")
    got = {
        r.vec_id: (r.cid, r.dist2)
        for r in fastvec.nearest_cell(emb, rows).collect()
    }
    assert got == want


def test_query_sims_bit_identical_to_crossjoin_hof(spark):
    """query_sims == crossJoin(broadcast(q)) + dot/norm HOF projection,
    pair for pair, exact float64 equality."""
    from spark_nifi_kafka_connected_device_stream_spark.functions.vectors import (
        l2_norm,
    )

    e = load_table(spark, SF_SMALL, "embeddings")
    q = e.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    sim = dot(F.col("q_emb"), F.col("c_emb")) / (F.col("q_norm") * F.col("c_norm"))
    want = {
        (r.query_id, r.neighbor_id): r.s
        for r in c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", sim.alias("s"))
        .collect()
    }
    qrows = fastvec.read_vectors_driver(SF_SMALL, 3)
    got = {
        (r.query_id, r.vec_id): r.raw_sim
        for r in fastvec.query_sims(e, qrows).collect()
    }
    assert got == want


def test_read_vectors_driver_matches_spark_collect(spark):
    """The driver-side parquet read returns exactly the rows (and the
    exact widened float64 values) a Spark filter+collect returns."""
    e = load_table(spark, SF_SMALL, "embeddings")
    want = sorted(
        (r.vec_id, [float(x) for x in r.v])
        for r in _km.embeddings_double(spark, SF_SMALL)
        .filter(F.col("vec_id") < 5)
        .select("vec_id", "v")
        .collect()
    )
    got = fastvec.read_vectors_driver(SF_SMALL, 5)
    assert got == want


def test_read_vectors_driver_pushes_rowgroup_filter(tmp_path, monkeypatch):
    """The driver-side read must push `id < max_id` into the parquet
    reader (row-group pruning — the r18 scale fix: an unfiltered read
    pulls the whole embeddings table into driver memory) and still
    return exactly the seed rows."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 1000
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(
                [[float(i), float(i + 1)] for i in range(n)],
                pa.list_(pa.float32()),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"), row_group_size=100)

    seen = {}
    real_read = pq.read_table

    def spy(path, *a, **kw):
        seen["filters"] = kw.get("filters")
        return real_read(path, *a, **kw)

    monkeypatch.setattr(pq, "read_table", spy)
    got = fastvec.read_vectors_driver(str(tmp_path), 5)
    assert seen["filters"] == [("vec_id", "<", 5)]
    assert [vid for vid, _ in got] == [0, 1, 2, 3, 4]
    assert got[2][1] == [2.0, 3.0]


def test_matrix_rejects_compensating_ragged_rows():
    """Per-row length validation (r17 advice): one 1-dim plus one 3-dim
    row keeps the total divisible by n — the old aggregate modulo check
    reshaped it cleanly, shifting every row's data onto the wrong id."""
    import pyarrow as pa

    col = pa.array([[1.0], [2.0, 3.0, 4.0]], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="ragged"):
        fastvec._matrix(col, 2)


def test_matrix_rejects_null_rows_and_null_elements():
    """NULL list rows are silently dropped by flatten() (would shift
    data), and NULL elements become NaN (which wins argmin) — both must
    fail loud instead."""
    import pyarrow as pa

    null_row = pa.array([[1.0, 2.0], None], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="NULL embedding rows"):
        fastvec._matrix(null_row, 2)
    null_elem = pa.array([[1.0, 2.0], [3.0, None]], pa.list_(pa.float32()))
    with pytest.raises(ValueError, match="NULL embedding elements"):
        fastvec._matrix(null_elem, 2)


def test_nearest_code_rejects_missing_subspace(spark):
    """A subspace id absent from the codebook (partial/corrupt trained
    model dir on the streaming path) must raise, not emit uninitialized
    memory as a PQ code."""
    sub = spark.createDataFrame(
        [(0, 0, [1.0, 2.0]), (0, 7, [3.0, 4.0])],
        "vec_id bigint, m int, sv array<double>",
    )
    rows = [(0, 0, [0.0, 0.0]), (0, 1, [9.0, 9.0])]  # only m=0 present
    with pytest.raises(Exception, match="no.*codebook entries|codebook is partial"):
        fastvec.nearest_code(sub, rows).collect()


def test_collect_vectors_bound(spark):
    """collect_vectors refuses corpus-sized frames (r17 advice): the
    bounded-collect class is k-row model tables only."""
    big = spark.range(fastvec._COLLECT_BOUND + 8).select(
        F.col("id"), F.array(F.lit(1.0)).alias("v")
    )
    with pytest.raises(ValueError, match="bounded-collect"):
        fastvec.collect_vectors(big, "id", "v")


def test_adc_query_tables_bit_identical_to_distributed(spark):
    """The driver-computed qn/lut/cnorm ADC tables (r18) == the
    distributed HOF subtrees they replace, value for value, on the
    real fixture: same left-to-right fold, same e6 quantization, same
    sqrt."""
    from spark_nifi_kafka_connected_device_stream_spark.functions.vectors import (
        l2_norm,
    )
    from spark_nifi_kafka_connected_device_stream_spark.operators.similarity_ann import (
        N_QUERIES,
        _adc_query_tables,
        ivfpq_codebook,
        ivfpq_codebook_rows,
        ivfpq_subvectors,
    )

    e = _km.embeddings_double(spark, SF_SMALL)
    sub = ivfpq_subvectors(e)
    cent = ivfpq_codebook(sub)
    want_cnorm = {
        (r.m, r.k): r.cn2_e6
        for r in cent.select(
            "m",
            "k",
            F.floor(dot(F.col("cv"), F.col("cv")) * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("cn2_e6"),
        ).collect()
    }
    want_qn = {
        r.query_id: r.q_norm
        for r in e.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), l2_norm(F.col("v")).alias("q_norm"))
        .collect()
    }
    want_lut = {
        (r.query_id, r.lm, r.lk): r.pdot_e6
        for r in sub.filter(F.col("vec_id") < N_QUERIES)
        .join(F.broadcast(cent), "m")
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("m").alias("lm"),
            F.col("k").alias("lk"),
            F.floor(dot(F.col("sv"), F.col("cv")) * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("pdot_e6"),
        )
        .collect()
    }
    qn, lut, cnorm = _adc_query_tables(
        spark,
        fastvec.read_vectors_driver(SF_SMALL, N_QUERIES),
        ivfpq_codebook_rows(SF_SMALL),
    )
    got_qn = {r.query_id: r.q_norm for r in qn.collect()}
    got_lut = {(r.query_id, r.lm, r.lk): r.pdot_e6 for r in lut.collect()}
    got_cnorm = {(r.m, r.k): r.cn2_e6 for r in cnorm.collect()}
    assert got_qn == want_qn
    assert got_lut == want_lut
    assert got_cnorm == want_cnorm


def test_pairwise_reduction_guard():
    """Canary: if exact_dot ever switches to a reassociating reduction
    (np.sum pairwise / BLAS), this catches it — the vector below is
    constructed so left-to-right and pairwise sums differ in the last
    ulp."""
    v = np.array([1e16, 1.0, 1.0, 1.0, -1e16, 1.0, 1.0, 1.0], dtype=np.float64)
    ones = np.ones_like(v)
    seq = 0.0
    for x in v:
        seq = seq + x
    assert float(fastvec.exact_dot(v, ones)) == seq
