"""Semantic tests for the curation tier: the oracle-parity suite
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

def test_mutual_info_independent_vs_confounded(spark, tmp_path):
    """A 2×2 independent layout has PMI 0 in every cell; a perfectly
    confounded layout (each source maps to one lang) has positive PMI
    ln(2) on its diagonal cells."""
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation_lm import (
        documents_source_lang_mutual_info,
    )

    def write_docs(cells, path):
        data = []
        i = 0
        for (src, lang, n) in cells:
            for _ in range(n):
                data.append((i, "t", lang, src, 1))
                i += 1
        spark.createDataFrame(
            data, "doc_id bigint, text string, lang string, source string, n_chars bigint"
        ).coalesce(1).write.mode("overwrite").parquet(str(path / "documents.parquet"))
        return str(path)

    ind = tmp_path / "ind"; ind.mkdir()
    sf = write_docs(
        [("a", "en", 2), ("a", "de", 2), ("b", "en", 2), ("b", "de", 2)], ind
    )
    for r in documents_source_lang_mutual_info(spark, sf).collect():
        assert r.pmi == 0.0 and r.mi_contribution == 0.0

    conf = tmp_path / "conf"; conf.mkdir()
    sf = write_docs([("a", "en", 2), ("b", "de", 2)], conf)
    for r in documents_source_lang_mutual_info(spark, sf).collect():
        assert math.isclose(r.pmi, math.log(2.0), abs_tol=2e-6)


def test_perplexity_buckets_partition_docs(spark):
    """Over the real fixture: every (source, bucket) count is positive,
    buckets are only head/middle/tail, and the head bucket's average
    score is >= the tail's (higher logprob = more predictable)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.curation_lm import (
        documents_perplexity_buckets,
    )

    rows = documents_perplexity_buckets(spark, SF).collect()
    assert rows and all(r.bucket in ("head", "middle", "tail") for r in rows)
    heads = [r.avg_score for r in rows if r.bucket == "head"]
    tails = [r.avg_score for r in rows if r.bucket == "tail"]
    assert min(heads) >= max(tails)


def test_column_profile_counts_nulls_and_distincts(spark, tmp_path):
    """Nulls are counted not profiled: a column with one NULL reports
    n_null=1 and min/max over the remaining values; distinct counts
    ignore NULLs (SQL COUNT(DISTINCT) semantics in both engines)."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation import (
        orders_column_profile,
    )

    d = dt.datetime(2024, 1, 15, 0, 0, 0)
    rows = [
        (1, 10, "O", 100.5, d, "1-URGENT"),
        (2, 10, "F", None, d + dt.timedelta(days=1), "2-HIGH"),
        (3, 20, "O", 50.25, d, "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    prof = {
        r.column_name: r
        for r in orders_column_profile(spark, str(tmp_path)).collect()
    }
    assert set(prof) == {
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority",
    }
    assert all(r.n_rows == 3 for r in prof.values())
    tp = prof["o_totalprice"]
    assert (tp.n_null, tp.n_distinct) == (1, 2)
    assert (tp.min_value, tp.max_value) == ("50.25", "100.5")
    ck = prof["o_custkey"]
    assert (ck.n_null, ck.n_distinct, ck.min_value, ck.max_value) == (
        0, 2, "10", "20",
    )
    od = prof["o_orderdate"]
    assert od.min_value.startswith("2024-01-15")


def test_quality_calibration_decile_cut(spark, tmp_path):
    """Ten docs with unique-token ratios 0.1..1.0 in one source: ntile
    puts exactly one per decile and each cell's mean equals its doc's
    ratio; a second source with one doc lands entirely in decile 1."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.curation import (
        documents_quality_calibration,
    )

    docs = []
    for i in range(1, 11):
        # 10 tokens, i distinct: u0..u(i-1) then pad with u0
        toks = [f"u{j}" for j in range(i)] + ["u0"] * (10 - i)
        docs.append((i, " ".join(toks), "en", "big", 0))
    docs.append((99, "one two three", "en", "tiny", 0))
    sf = write_documents(spark, tmp_path, docs)
    out = documents_quality_calibration(spark, sf).collect()
    big = {r.decile: r for r in out if r.source == "big"}
    assert sorted(big) == list(range(1, 11))
    for d, r in big.items():
        assert r.n_docs == 1
        assert r.min_ppm == r.max_ppm == d * 100_000
        assert r.mean_unique_ratio == round(d / 10, 6)
    tiny = [r for r in out if r.source == "tiny"]
    assert len(tiny) == 1 and tiny[0].decile == 1 and tiny[0].n_docs == 1


def test_holdout_perplexity_hand_computed(spark, tmp_path):
    """One train doc 'x y x5', one val doc 'x y z': the val bigram
    (x,y) is seen (lp = ln(6/7)), (y,z) is unseen (lp = ln(1/7)) —
    match a Python replication of the quantized pipeline exactly."""
    import hashlib
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation_lm import (
        documents_holdout_perplexity,
    )

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100

    train_id = next(d for d in range(500) if bucket(d) < 80)
    val_id = next(d for d in range(500) if 80 <= bucket(d) < 90)
    sf = write_documents(
        spark,
        tmp_path,
        [
            (train_id, "x y x y x y x y x y", "en", "s", 0),
            (val_id, "x y z", "en", "s", 0),
        ],
    )
    r = documents_holdout_perplexity(spark, sf).collect()[0]
    assert (r.n_val_bigrams, r.n_unseen) == (2, 1)
    lpq = lambda p: math.floor(math.log(p) * 1_000_000 + 0.5)
    want_avg = (lpq(6 / 7) + lpq(1 / 7)) / (2 * 1_000_000)
    assert r.avg_logprob == math.floor(want_avg * 1e6 + 0.5) / 1e6
    assert r.ppl_proxy == math.floor(math.exp(-want_avg) * 100 + 0.5) / 100


def test_kneser_ney_matches_textbook_reference(spark, tmp_path):
    """Independent interpolated-KN cross-check: a crafted corpus with
    known bigram/continuation structure, scored by a from-scratch
    textbook implementation — P(w2|w1) = max(c12-D,0)/c1 +
    D*N1+(w1,.)/c1 * N1+(.,w2)/|types|.  Every probability, ordering,
    and count column must match.  The crafted corpus makes the KN
    point visible: 'francisco' is frequent but follows ONLY 'san', so
    its continuation weight is minimal despite its raw count."""
    import math
    from collections import Counter

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation_lm import (
        _KN_DISCOUNT,
    )
    from spark_nifi_kafka_connected_device_stream_spark.operators.curation_lm import (
        text_bigram_kneser_ney,
    )

    texts = {
        1: "san francisco san francisco san francisco",
        2: "new york new jersey new england",
        3: "the cat and the dog and the bird",
    }
    docs = [(d, t, "en", "s", len(t)) for d, t in texts.items()]
    sf = write_documents(spark, tmp_path, docs)
    got = [
        (r.w1, r.w2, r.c_bigram, r.c_w1, r.n_follow, r.n_precede, r.p_kn)
        for r in text_bigram_kneser_ney(spark, sf).collect()
    ]

    bgc = Counter()
    for t in texts.values():
        tk = t.lower().split()
        for a, b in zip(tk, tk[1:]):
            bgc[(a, b)] += 1
    c1 = Counter(); n_follow = Counter(); n_precede = Counter()
    for (a, b), c in bgc.items():
        c1[a] += c
        n_follow[a] += 1
        n_precede[b] += 1
    n_types = len(bgc)
    D = _KN_DISCOUNT
    expected = []
    for (a, b), c in bgc.items():
        p = max(c - D, 0.0) / c1[a] + (D * n_follow[a] / c1[a]) * (
            n_precede[b] * 1.0 / n_types
        )
        expected.append(
            (a, b, c, c1[a], n_follow[a], n_precede[b],
             math.floor(p * 1e6 + 0.5) / 1e6)
        )
    expected.sort(key=lambda r: (-r[2], r[0], r[1]))
    assert got == expected[: len(got)] and len(got) == len(expected)
    # the KN point: P(francisco | san) keeps a high main term but the
    # continuation weight of 'francisco' (precede-types 1) is the
    # corpus minimum, unlike add-one which would reward its raw count
    byk = {(r[0], r[1]): r for r in got}
    assert byk[("san", "francisco")][5] == 1


def test_dsir_weights_hand_computed(spark, tmp_path):
    """Target src0 = one doc 'aa aa'; raw src9 = 'aa aa' (target-like)
    and 'bb bb' (not).  Global vocab {aa, bb} (V=2), n_all=6, n_tgt=2,
    c_all(aa)=4, c_all(bb)=2, c_tgt(aa)=2, c_tgt(bb)=0:
      lw(aa) = ln(3/4) − ln(5/8) = ln(1.2)  -> quantized  182322
      lw(bb) = ln(1/4) − ln(3/8) = ln(2/3)  -> quantized −405465
    doc 'aa aa' sums 364644 (>0), doc 'bb bb' sums −810930; the src9
    summary row is (2 docs, avg −223143, 1 target-like)."""
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation_lm import (
        documents_dsir_weights,
    )
    from tests.semantics_fixtures import write_docs

    sf = write_docs(
        spark,
        tmp_path,
        [
            (1, "aa aa", "en", "src0"),
            (2, "aa aa", "en", "src9"),
            (3, "bb bb", "en", "src9"),
        ],
    )
    lw_aa = math.floor((math.log(3 / 4) - math.log(5 / 8)) * 1e6 + 0.5)
    lw_bb = math.floor((math.log(1 / 4) - math.log(3 / 8)) * 1e6 + 0.5)
    assert (lw_aa, lw_bb) == (182322, -405465)
    rows = documents_dsir_weights(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["source"] == "src9"
    assert r["n_docs"] == 2
    assert r["avg_logweight_e6"] == math.floor((2 * lw_aa + 2 * lw_bb) / 2 + 0.5)
    assert r["n_target_like"] == 1
