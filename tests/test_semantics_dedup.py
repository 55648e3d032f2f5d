"""Semantic tests for the dedup tier: the oracle-parity suite
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

def test_exact_substring_finds_shared_passage(spark, tmp_path):
    """Docs A and B share a verbatim 60-char passage embedded in
    otherwise-unique text; doc C is entirely unique.  The shared
    passage must produce duplicated windows in A and B (every
    40-char window that falls fully inside the aligned passage), and
    C must report zero duplicated windows."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.dedup import (
        dedup_exact_substring,
    )

    passage = "the quick brown fox jumps over the lazy dog near the river"
    assert len(passage) >= 40
    docs = [
        (1, "alpha " * 10 + passage + " omega one", "en", "s", 0),
        (2, "beta " * 12 + passage + " omega two", "en", "s", 0),
        (3, "gamma " * 30 + "entirely unique tail here", "en", "s", 0),
    ]
    df = spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = {r.doc_id: r for r in dedup_exact_substring(spark, str(tmp_path)).collect()}
    assert rows[3].n_dup_windows == 0 and rows[3].dup_fraction == 0.0
    # the two prefixes differ in length so windows are NOT aligned on
    # the same stride offsets — only windows fully inside the shared
    # passage can match, and only if the 10-char stride happens to
    # align across the two docs; stride-aligned prefixes guarantee it:
    # "alpha "*10 is 60 chars, "beta "*12 is 60 chars, so the passage
    # starts at the same offset in both docs and every in-passage
    # window matches.
    assert rows[1].n_dup_windows > 0 and rows[2].n_dup_windows > 0
    assert 0.0 < rows[1].dup_fraction < 1.0


def test_allpairs_prefix_equals_naive_baseline(spark, tmp_path):
    """Losslessness of the prefix filter: on docs with known near-dup
    structure the prefix-filtered join must return EXACTLY the naive
    inverted-index join's pairs.  A=B-with-one-token-changed gives
    J = 27/29 ~ 0.931; D is a verbatim copy of A (J = 1.0 with both A
    and B); C shares nothing."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.dedup import (
        dedup_allpairs_prefix,
        dedup_ngram_jaccard,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    changed = " ".join(f"tok{i}" for i in range(29)) + " other"
    sf = write_documents(
        spark,
        tmp_path,
        [
            (1, base, "en", "s", 0),
            (2, changed, "en", "s", 0),
            (3, "zeta " + " ".join(f"junk{i}" for i in range(20)), "en", "s", 0),
            (4, base, "en", "s", 0),
        ],
    )
    new = sorted(
        (r.doc_a, r.doc_b, r.n_common, r.jaccard)
        for r in dedup_allpairs_prefix(spark, sf).collect()
    )
    old = sorted(
        (r.doc_a, r.doc_b, r.jaccard)
        for r in dedup_ngram_jaccard(spark, sf).collect()
    )
    assert [(a, b, j) for (a, b, _, j) in new] == old
    assert [(a, b, j) for (a, b, _, j) in new] == [
        (1, 2, 0.931),
        (1, 4, 1.0),
        (2, 4, 0.931),
    ]
    # and the copy pair really is a full-overlap pair
    assert dict(((a, b), n) for (a, b, n, _) in new)[(1, 4)] == 28


def test_lsh_recall_report_identical_pair_always_hit(spark, tmp_path):
    """On the allpairs corpus the ground truth is exactly 3 pairs; the
    verbatim-copy pair (1,4) has identical minhash signatures, so it is
    a guaranteed LSH candidate — recall can never fall below 1/3 and
    every reported ratio stays in [0, 1]."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.dedup import (
        dedup_lsh_recall_report,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    changed = " ".join(f"tok{i}" for i in range(29)) + " other"
    sf = write_documents(
        spark,
        tmp_path,
        [
            (1, base, "en", "s", 0),
            (2, changed, "en", "s", 0),
            (3, "zeta " + " ".join(f"junk{i}" for i in range(20)), "en", "s", 0),
            (4, base, "en", "s", 0),
        ],
    )
    row = dedup_lsh_recall_report(spark, sf).collect()[0]
    assert row.n_true_pairs == 3
    assert row.n_hits >= 1
    assert row.recall >= 0.333333
    assert 0.0 <= row.candidate_precision <= 1.0
    assert row.n_hits <= row.n_candidates


def test_threshold_sensitivity_cumulative(spark, tmp_path):
    """The allpairs corpus: pairs at J = 1.0 (bucket 100), 0.931
    (bucket 90, two of them) — cumulative counts must nest."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.dedup import (
        dedup_threshold_sensitivity,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    changed = " ".join(f"tok{i}" for i in range(29)) + " other"
    sf = write_documents(
        spark,
        tmp_path,
        [
            (1, base, "en", "s", 0),
            (2, changed, "en", "s", 0),
            (3, "zeta " + " ".join(f"junk{i}" for i in range(20)), "en", "s", 0),
            (4, base, "en", "s", 0),
        ],
    )
    out = {r.threshold_pct: r.n_pairs_at_or_above
           for r in dedup_threshold_sensitivity(spark, sf).collect()}
    # J=1.0 pair -> bucket20 = 20 -> pct 100; J=27/29 -> 20*27//29 = 18 -> 90
    assert out[100] == 1
    assert out[90] == 3
    vals = [v for _, v in sorted(out.items(), reverse=True)]
    assert all(b >= a for a, b in zip(vals, vals[1:]))


def test_incremental_minhash_assign_dup_and_novel(spark, tmp_path):
    """New doc 10 is a verbatim copy of existing doc 3 -> 12/12 equal
    signature components, assigned_dup, best match 3.  New doc 20 is
    entirely novel text sharing no shingle with the corpus -> zero
    candidates, sentinel row.  Existing docs never appear in the
    output (the report is batch-grain)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.dedup import (
        dedup_incremental_minhash_assign,
    )

    shared = "the quick brown fox jumps over the lazy dog again and again"
    novel = "entirely different words that overlap with nothing else here"
    filler = "some mild background corpus text about devices and streams"
    sf = write_docs(
        spark,
        tmp_path,
        [
            (1, filler, "en", "src1"),          # existing
            (3, shared, "en", "src1"),          # existing, the copy target
            (7, filler + " extra", "en", "src2"),  # existing
            (10, shared, "en", "src3"),         # NEW: exact copy of doc 3
            (20, novel, "en", "src3"),          # NEW: no shared shingles
        ],
    )
    rows = {r["doc_id"]: r for r in dedup_incremental_minhash_assign(spark, sf).collect()}
    assert set(rows) == {10, 20}
    assert rows[10]["assigned_dup"] and rows[10]["best_match_id"] == 3
    assert rows[10]["n_sig_matches"] == 12
    assert rows[20]["n_candidates"] == 0
    assert not rows[20]["assigned_dup"]
    assert rows[20]["best_match_id"] == -1 and rows[20]["n_sig_matches"] == 0
