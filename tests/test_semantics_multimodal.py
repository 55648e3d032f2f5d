"""Semantic tests for the multimodal tier: the oracle-parity suite
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

def test_aspect_ratio_buckets_match_python_model(spark, tmp_path):
    """The query's bucket assignment and padding waste must equal a
    pure-Python reimplementation over the SAME deterministic decode."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.multimodal import (
        AR_BUCKETS,
        fake_decode_rgb,
        multimodal_aspect_ratio_buckets,
    )

    texts = ["x" * n for n in (0, 7, 64, 100, 333, 500, 511, 512)]
    sf = write_docs(
        spark, tmp_path, [(i, t, "en", "s0") for i, t in enumerate(texts)]
    )
    expected: dict[str, list[int]] = {}
    for t in texts:
        w, h, _ = fake_decode_rgb(t.encode())
        best = min(
            (
                (max(w * db, h * nb) / min(w * db, h * nb), pick, name,
                 (max(w * db, h * nb) - min(w * db, h * nb)) * 1_000_000
                 // max(w * db, h * nb))
                for name, nb, db, pick in AR_BUCKETS
            )
        )
        expected.setdefault(best[2], []).append(best[3])
    import math

    got = {
        r.bucket: (r.n_docs, r.avg_padding_waste, r.max_padding_waste)
        for r in multimodal_aspect_ratio_buckets(spark, sf).collect()
    }
    assert set(got) == set(expected)
    for b, ws in expected.items():
        n, avg_w, max_w = got[b]
        assert n == len(ws)
        assert avg_w == math.floor(sum(ws) / (len(ws) * 1_000_000.0) * 1e6 + 0.5) / 1e6
        assert max_w == math.floor(max(ws) / 1_000_000.0 * 1e6 + 0.5) / 1e6
