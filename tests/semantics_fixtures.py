"""Shared crafted-fixture writers for the per-tier semantic test files
(test_semantics_*.py).

The oracle-parity suite proves Spark == DuckDB on the same SQL; the
semantic files prove the SQL means what the docstrings claim, on
crafted inputs with hand-computable answers.  Two event-writer shapes
exist because the earlier semantic batch wrote 4-tuples (value/props
defaulted) and the later one wrote full 6-tuples — both kept verbatim
so the moved tests stay byte-identical.
"""

from __future__ import annotations

import datetime

SF = "/root/testdata/sf0.001"

EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def write_events4(spark, tmp_path, rows):
    """rows: (event_id, ts_seconds_offset, user_id, event_type).
    Writes a minimal events.parquet a crafted sf_dir can serve."""
    data = [
        (
            eid,
            BASE + datetime.timedelta(seconds=off),
            uid,
            etype,
            1.0,
            "{}",
        )
        for (eid, off, uid, etype) in rows
    ]
    df = spark.createDataFrame(data, EVENTS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def write_events6(spark, tmp_path, rows):
    """rows: (event_id, ts_seconds_offset, user_id, event_type, value, props)."""
    data = [
        (eid, BASE + datetime.timedelta(seconds=off), uid, etype, val, props)
        for (eid, off, uid, etype, val, props) in rows
    ]
    spark.createDataFrame(data, EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def write_documents(spark, tmp_path, docs):
    """docs: full 5-tuples (doc_id, text, lang, source, n_chars)."""
    df = spark.createDataFrame(docs, DOCS_SCHEMA)
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


def write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source); n_chars derived."""
    data = [(d, t, lang, src, len(t)) for (d, t, lang, src) in rows]
    spark.createDataFrame(data, DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)
