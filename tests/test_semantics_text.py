"""Semantic tests for the text tier: the oracle-parity suite
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

def test_zipf_fit_matches_independent_ols(spark, tmp_path):
    """12 tokens with strictly decreasing counts: the operator's slope
    and R² must match an independent numpy least-squares fit of
    ln(count) on ln(rank) to 1e-6 (the pround grid)."""
    import math

    import numpy as np

    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        text_zipf_fit,
    )

    counts = [40, 25, 18, 13, 10, 8, 6, 5, 4, 3, 2, 1]
    words = []
    for i, c in enumerate(counts):
        words += [f"tok{i:02d}"] * c
    df = spark.createDataFrame(
        [(1, " ".join(words), "en", "src_a", len(words))],
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    row = text_zipf_fit(spark, str(tmp_path)).collect()[0]
    assert row.source == "src_a" and row.n_ranks == 12
    ln_r = np.log(np.arange(1, 13, dtype=float))
    ln_c = np.log(np.array(counts, dtype=float))
    slope, intercept = np.polyfit(ln_r, ln_c, 1)
    pred = slope * ln_r + intercept
    ss_res = float(((ln_c - pred) ** 2).sum())
    ss_tot = float(((ln_c - ln_c.mean()) ** 2).sum())
    r2 = 1.0 - ss_res / ss_tot
    assert math.isclose(row.zipf_slope, slope, abs_tol=2e-6)
    assert math.isclose(row.zipf_r2, r2, abs_tol=2e-6)
    assert row.zipf_slope < 0


def test_heaps_all_unique_vocab_is_linear(spark, tmp_path):
    """Docs whose tokens are all distinct put every point ON the line
    V = N (beta = 1, k = 1): the quantized fit must return beta 1.0
    exactly and a geometric vocab ratio of 1.0 for every source."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        documents_heaps_law,
    )

    def doc(n, tag):
        return " ".join(f"{tag}w{i}" for i in range(n))

    sf = write_documents(
        spark,
        tmp_path,
        [
            (1, doc(10, "a"), "en", "sA", 0),
            (2, doc(20, "b"), "en", "sA", 0),
            (3, doc(40, "c"), "en", "sB", 0),
            (4, doc(80, "d"), "en", "sB", 0),
        ],
    )
    rows = {r.source: r for r in documents_heaps_law(spark, sf).collect()}
    assert set(rows) == {"sA", "sB"}
    for r in rows.values():
        assert r.heaps_beta == 1.0
        assert r.geo_vocab_ratio == 1.0
    assert rows["sA"].n_tokens == 30 and rows["sB"].n_tokens == 120


def test_anova_identical_groups_zero_f(spark, tmp_path):
    """Two languages with identical length multisets: SS_between = 0,
    F = 0; within-variance is preserved in ss_within."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        documents_length_anova_by_lang,
    )

    docs = [
        (1, "x", "en", "s", 10), (2, "x", "en", "s", 20), (3, "x", "en", "s", 30),
        (4, "x", "de", "s", 10), (5, "x", "de", "s", 20), (6, "x", "de", "s", 30),
    ]
    sf = write_documents(spark, tmp_path, docs)
    r = documents_length_anova_by_lang(spark, sf).collect()[0]
    assert (r.k_groups, r.n_docs, r.df_between, r.df_within) == (2, 6, 1, 4)
    assert r.ss_between == 0.0
    assert r.f_stat == 0.0
    # total SS = sum((x - 20)^2) = 2 * (100 + 0 + 100) = 400
    assert r.ss_within == 400.0


def test_simpson_diversity_hand_computed(spark, tmp_path):
    """en: 2+2 docs over two sources -> lambda 1/3, 3 effective
    sources; fr: monoculture -> lambda 1, effective 1; de: single doc
    excluded (estimator undefined)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        documents_source_simpson_diversity,
    )

    docs = [
        (1, "x", "en", "sa", 1), (2, "x", "en", "sa", 1),
        (3, "x", "en", "sb", 1), (4, "x", "en", "sb", 1),
        (5, "x", "fr", "sa", 1), (6, "x", "fr", "sa", 1),
        (7, "x", "de", "sa", 1),
    ]
    sf = write_documents(spark, tmp_path, docs)
    out = {r.lang: r for r in documents_source_simpson_diversity(spark, sf).collect()}
    assert set(out) == {"en", "fr"}
    assert (out["en"].n_docs, out["en"].n_sources) == (4, 2)
    assert out["en"].simpson_lambda == 0.333333
    assert out["en"].effective_sources == 3.0
    assert (out["fr"].simpson_lambda, out["fr"].effective_sources) == (1.0, 1.0)


def test_tukey_pairs_separated_vs_identical(spark, tmp_path):
    """Two identical-mean languages and one far-away language: the far
    pairs are significant, the identical pair is not, and mean_diff is
    exact."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        documents_length_tukey_pairs,
    )

    docs = []
    did = 0
    for lang, lengths in (
        ("aa", [100, 102, 98, 100]),
        ("bb", [100, 98, 102, 100]),
        ("cc", [500, 502, 498, 500]),
    ):
        for ln in lengths:
            did += 1
            docs.append((did, "x", lang, "s", ln))
    sf = write_documents(spark, tmp_path, docs)
    out = {
        (r.lang_a, r.lang_b): r
        for r in documents_length_tukey_pairs(spark, sf).collect()
    }
    assert set(out) == {("aa", "bb"), ("aa", "cc"), ("bb", "cc")}
    assert out[("aa", "bb")].mean_diff == 0.0
    assert out[("aa", "bb")].significant == 0
    assert out[("aa", "cc")].mean_diff == 400.0
    assert out[("aa", "cc")].significant == 1
    assert out[("bb", "cc")].significant == 1
    assert all(r.hsd > 0 for r in out.values())


def test_term_burstiness_clumped_vs_uniform(spark, tmp_path):
    """'spam' appears 6 times inside one doc (burstiness 6), 'the'
    once in each of 4 docs (burstiness 1): the clumped term ranks
    first and its Poisson-expected df far exceeds its real df."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        text_term_burstiness,
    )

    docs = [
        (1, "the spam spam spam spam spam spam", "en", "s", 0),
        (2, "the alpha", "en", "s", 0),
        (3, "the beta", "en", "s", 0),
        (4, "the gamma", "en", "s", 0),
    ]
    sf = write_documents(spark, tmp_path, docs)
    out = text_term_burstiness(spark, sf).collect()
    top = out[0]
    assert top.term == "spam"
    assert (top.cf, top.df, top.burstiness) == (6, 1, 6.0)
    assert top.poisson_expected_df > 3.0   # 4*(1-e^-1.5) ~ 3.11
    the = next(r for r in out if r.term == "the")
    assert (the.cf, the.df, the.burstiness) == (4, 4, 1.0)


def test_fertility_hand_computed(spark, tmp_path):
    """'ab cd' (2 tokens, 5 chars, 5 bytes) + 'x' (1, 1, 1):
    chars/token = 6/3 = 2.0, tokens/doc = 1.5."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        text_token_fertility_by_lang,
    )

    sf = write_docs(
        spark, tmp_path, [(1, "ab cd", "en", "s0"), (2, "x", "en", "s0")]
    )
    r = text_token_fertility_by_lang(spark, sf).collect()[0]
    assert (r.n_docs, r.total_tokens) == (2, 3)
    assert r.chars_per_token == 2.0
    assert r.bytes_per_token == 2.0
    assert r.tokens_per_doc == 1.5


def test_flesch_hand_computed(spark, tmp_path):
    """'go on. it is fun.' -> 5 words, 2 sentences, 5 vowel groups:
    flesch = 206.835 - 1.015*2.5 - 84.6*1.0 = 119.6975."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        text_readability_flesch,
    )

    sf = write_docs(spark, tmp_path, [(1, "go on. it is fun.", "en", "s0")])
    r = text_readability_flesch(spark, sf).collect()[0]
    assert (r.n_docs, r.total_words) == (1, 5)
    assert r.words_per_sentence == 2.5
    assert r.syllables_per_word == 1.0
    assert abs(r.flesch - 119.6975) < 1e-9


def test_logodds_surfaces_the_source_specific_term(spark, tmp_path):
    """Source A over-uses 'zebra' against a shared background; zebra
    must rank #1 for A with positive z, and must not top B's list."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        source_logodds_terms,
    )

    base = "the cat sat on the mat"
    sf = write_docs(
        spark,
        tmp_path,
        [
            (1, base + " zebra zebra zebra zebra", "en", "A"),
            (2, base, "en", "A"),
            (3, base + " yak", "en", "B"),
            (4, base, "en", "B"),
        ],
    )
    rows = source_logodds_terms(spark, sf).collect()
    top = {r.source: r.token for r in rows if r.rank == 1}
    assert top["A"] == "zebra"
    assert top["B"] != "zebra"
    z_a = {r.token: r.z for r in rows if r.source == "A"}
    assert z_a["zebra"] > 0


def test_winnowing_guarantee_shared_passage(spark, tmp_path):
    """The winnowing theorem: any shared passage longer than w + k - 1
    tokens (w=4 windows over k=3-token shingles) MUST contribute at
    least one shared fingerprint; disjoint docs share none."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        text_winnowing_fingerprints,
    )

    passage = " ".join(f"shared{i}" for i in range(12))
    docs = [
        (1, f"alpha beta gamma {passage}", "en", "a", 0),
        (2, f"delta epsilon zeta eta {passage}", "en", "b", 0),
        (3, "totally different words with no overlap at all here", "en", "c", 0),
    ]
    docs = [(d, t, lang, s, len(t)) for (d, t, lang, s, _n) in docs]
    sf = write_documents(spark, tmp_path, docs)
    fp = {
        r.doc_id: set(r.fingerprints.split(",")) if r.fingerprints else set()
        for r in text_winnowing_fingerprints(spark, sf).collect()
    }
    assert fp[1] & fp[2], "shared 12-token passage must share a fingerprint"
    assert not (fp[1] & fp[3]) and not (fp[2] & fp[3])


def test_bm25_matches_textbook_reference(spark, tmp_path):
    """Independent BM25 cross-check: crafted docs with known term
    frequencies and lengths, scored by a from-scratch textbook BM25
    (Lucene idf variant ln((N-df+0.5)/(df+0.5)+1), k1=1.2, b=0.75) —
    scores and ranking must match at the shared 6-decimal rounding."""
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        text_bm25_search,
    )

    texts = {
        1: "spark join window spark spark filler one two three",
        2: "join join window other words here padding padding",
        3: "nothing relevant at all in this document text",
        4: "window",
        5: "spark " * 5 + "lots of extra tokens " * 10,
    }
    docs = [(d, t.strip(), "en", "s", len(t)) for d, t in texts.items()]
    sf = write_documents(spark, tmp_path, docs)
    got = [(r.doc_id, r.bm25) for r in text_bm25_search(spark, sf).collect()]

    TERMS, K1, B = ("spark", "join", "window"), 1.2, 0.75
    toks = {d: t.strip().lower().split() for d, t in texts.items()}
    n_docs = len(toks)
    avgdl = sum(len(v) for v in toks.values()) / n_docs
    df = {w: sum(1 for v in toks.values() if w in v) for w in TERMS}
    scores = {}
    for d, v in toks.items():
        s = 0.0
        for w in TERMS:
            tf = v.count(w)
            if tf == 0:
                continue
            idf = math.log((n_docs - df[w] + 0.5) / (df[w] + 0.5) + 1.0)
            s += idf * (tf * (K1 + 1)) / (tf + K1 * ((1 - B) + B * (len(v) / avgdl)))
        if s > 0:
            scores[d] = math.floor(s * 1e6 + 0.5) / 1e6
    expected = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    assert got == expected
