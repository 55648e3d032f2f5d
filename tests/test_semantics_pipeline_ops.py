"""Semantic tests for the pipeline_ops tier: the oracle-parity suite
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

def test_split_leakage_requires_head_dup_across_splits(spark, tmp_path):
    """Two documents sharing an 8-token head, hashed into different
    splits, must surface as exactly one shared fingerprint."""
    import duckdb

    from spark_nifi_kafka_connected_device_stream_spark.operators.pipeline_ops import (
        split_leakage_report,
    )

    head = "alpha beta gamma delta epsilon zeta eta theta"
    # find two doc_ids landing in train and test under the md5 bucket
    con = duckdb.connect()
    buckets = {}
    for doc_id in range(200):
        h = con.sql(f"SELECT md5('{doc_id}')").fetchone()[0]
        b = int(h[:4], 16) % 100
        buckets[doc_id] = "train" if b < 80 else ("val" if b < 90 else "test")
    train_id = next(d for d, s in buckets.items() if s == "train")
    test_id = next(d for d, s in buckets.items() if s == "test")
    df = spark.createDataFrame(
        [
            (train_id, head + " tail one", "en", "src0", 1),
            (test_id, head + " other tail", "en", "src0", 1),
        ],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = split_leakage_report(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.eval_split, r.ref_split) == ("test", "train")
    assert r.n_shared_fingerprints == 1 and r.n_contaminated_eval_docs == 1
