"""Semantic tests for the similarity tier: the oracle-parity suite
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

def test_kcenter_coverage_monotone_and_distinct(spark):
    """Farthest-point invariants on the real corpus: the k selected
    exemplars are distinct, ranks are 0..k-1, and coverage-at-pick is
    non-decreasing (each pick is the farthest remaining point, so the
    farthest distance can only shrink)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.similarity import (
        _KCENTER_K,
        embedding_kcenter_coreset,
    )

    rows = sorted(embedding_kcenter_coreset(spark, SF).collect(), key=lambda r: r.rank)
    assert [r.rank for r in rows] == list(range(_KCENTER_K))
    assert len({r.vec_id for r in rows}) == _KCENTER_K
    covs = [r.coverage_at_pick for r in rows[1:]]
    assert all(b >= a for a, b in zip(covs, covs[1:])), covs
    assert rows[0].coverage_at_pick == -2.0


def test_dim_correlation_known_structure(spark, tmp_path):
    """Copy/negated/independent dimension structure: corr(1,2) = 1,
    corr(1,3) = -1, corr(2,3) = -1 must head the ranking regardless of
    how many partitions the partials were merged from."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.similarity import (
        embedding_dim_correlation,
    )

    rows = [
        (i, [float(a), float(a), float(-a), float(b)], 0)
        for i, (a, b) in enumerate(
            [(1, 5), (2, 3), (3, 9), (4, 1), (5, 4), (6, 7)]
        )
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = embedding_dim_correlation(spark, str(tmp_path)).collect()
    got = {(r.dim_i, r.dim_j): r.dim_corr for r in out}
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == -1.0
    assert got[(2, 3)] == -1.0
    # the three perfect pairs outrank every dim-4 pairing
    assert {(r.dim_i, r.dim_j) for r in out[:3]} == {(1, 2), (1, 3), (2, 3)}
    assert all(r.n == 6 for r in out)


def test_silhouette_flags_mislabeled_point(spark, tmp_path):
    """Two orthogonal clusters plus one point labeled 0 but sitting in
    cluster 1's direction: that point's silhouette is negative (counted
    in n_negative); the cleanly-clustered label 1 has none."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.similarity import (
        embedding_silhouette_by_label,
    )

    rows = [
        (1, [1.0, 0.0], 0),
        (2, [1.0, 0.1], 0),
        (3, [0.0, 1.0], 0),   # mislabeled: points at cluster 1
        (4, [0.0, 1.0], 1),
        (5, [0.1, 1.0], 1),
    ]
    df = spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>, label int"
    )
    df.repartition(2).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    out = {r.label: r for r in embedding_silhouette_by_label(spark, str(tmp_path)).collect()}
    assert (out[0].n_points, out[1].n_points) == (3, 2)
    assert out[0].n_negative == 1
    assert out[1].n_negative == 0
    assert out[1].mean_silhouette > 0.5


def test_effective_dims_uniform_vs_single_axis(spark, tmp_path):
    """Equal variance on 4 dims -> PR = 4 (fraction 1); all variance on
    one axis -> PR = 1."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.similarity import (
        embedding_effective_dims,
    )

    def write(sub, rows):
        # distinct sf_dirs: the catalog caches analyzed plans per
        # (session, sf_dir, table), so overwriting one path in-session
        # would serve a stale file listing
        df = spark.createDataFrame(
            rows, "vec_id bigint, embedding array<float>, label int"
        )
        (tmp_path / sub).mkdir(exist_ok=True)
        df.coalesce(1).write.mode("overwrite").parquet(
            str(tmp_path / sub / "embeddings.parquet")
        )
        return str(tmp_path / sub)

    # alternating +-1 on every dim: identical variance per dim
    sf = write("uniform", [(i, [1.0, 1.0, 1.0, 1.0], 0) if i % 2 else
                           (i, [-1.0, -1.0, -1.0, -1.0], 0) for i in range(10)])
    r = embedding_effective_dims(spark, sf).collect()[0]
    assert r.n_dims_active == 4
    assert r.participation_ratio == 4.0
    assert r.pr_fraction == 1.0

    sf = write("single", [(i, [1.0 if i % 2 else -1.0, 0.0, 0.0, 0.0], 0)
                          for i in range(10)])
    r = embedding_effective_dims(spark, sf).collect()[0]
    assert r.n_dims_active == 1
    assert r.participation_ratio == 1.0


def test_jl_distortion_matches_python_model(spark, tmp_path):
    """The query's distortion buckets must equal a pure-Python
    reimplementation of the same LCG sign matrix and e6 fixing."""
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.similarity import (
        _RP_A,
        _RP_B,
        _RP_M,
        RP_K,
        embedding_random_projection_distortion,
    )

    vecs = [
        [0.5, -0.25, 0.125, 1.0],
        [0.5, -0.25, 0.125, 1.0],  # identical to prev: dx=0, filtered
        [1.0, 0.0, -1.0, 0.5],
        [-0.5, 0.75, 0.25, -0.125],
    ]
    spark.createDataFrame(
        [(i, v, 0) for i, v in enumerate(vecs)],
        "vec_id bigint, embedding array<float>, label int",
    ).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )

    def e6(x):
        return math.floor(x * 1e6 + 0.5)

    def sign(i, j):
        return 1 - 2 * (((j * _RP_A + i * _RP_B) // _RP_M) % 2)

    expected = {}
    for a in range(len(vecs) - 1):
        xa = [e6(x) for x in vecs[a]]
        xb = [e6(x) for x in vecs[a + 1]]
        dx = sum((p - q) ** 2 for p, q in zip(xa, xb))
        if dx == 0:
            continue
        dy = 0
        for i in range(1, RP_K + 1):
            ya = sum(sign(i, j + 1) * xa[j] for j in range(len(xa)))
            yb = sum(sign(i, j + 1) * xb[j] for j in range(len(xb)))
            dy += (ya - yb) ** 2
        b = (dy * 20) // (RP_K * dx)
        expected[b] = expected.get(b, 0) + 1
    got = {
        r.distortion_bucket: r.n_pairs
        for r in embedding_random_projection_distortion(spark, str(tmp_path)).collect()
    }
    assert got == expected
