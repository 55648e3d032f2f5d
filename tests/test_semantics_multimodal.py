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


def test_shard_pack_plan_next_fit_and_modality_isolation(spark, tmp_path):
    """Crafted corpus pinning the packing rule against a hand-computed
    plan.  doc_ids 0,3,6,9 are image-modality (id%3==0) with byte
    sizes 20000, 20000, 20000, 5000 against the 32768 budget:

    - doc 0: prev_cum 0      -> shard 0
    - doc 3: prev_cum 20000  -> shard 0 (shard 0 now 40000 bytes:
      next-fit lets the shard OVERFLOW by at most one payload)
    - doc 6: prev_cum 40000  -> shard 1
    - doc 9: prev_cum 60000  -> shard 1 (25000 bytes, under budget)

    doc 1 (audio) and doc 2 (text) must land in their own modality's
    shard 0 — never packed with images.
    """
    from spark_nifi_kafka_connected_device_stream_spark.operators.multimodal import (
        multimodal_shard_pack_plan,
    )

    docs = [
        (0, "a" * 20000, "en", "s", 20000),
        (3, "b" * 20000, "en", "s", 20000),
        (6, "c" * 20000, "en", "s", 20000),
        (9, "d" * 5000, "en", "s", 5000),
        (1, "e" * 100, "en", "s", 100),
        (2, "f" * 200, "en", "s", 200),
    ]
    sf = write_documents(spark, tmp_path, docs)
    got = {
        (r.modality, r.shard_id): (r.n_docs, r.shard_bytes, r.first_doc,
                                   r.last_doc, r.over_budget)
        for r in multimodal_shard_pack_plan(spark, sf).collect()
    }
    assert got == {
        ("image/fake", 0): (2, 40000, 0, 3, True),
        ("image/fake", 1): (2, 25000, 6, 9, False),
        ("audio/fake", 0): (1, 100, 1, 1, False),
        ("text/plain", 0): (1, 200, 2, 2, False),
    }
