"""Semantic tests for the round-10 operators: the oracle-parity suite
proves Spark == DuckDB on the same SQL; these prove the SQL means what
the docstrings claim, on crafted inputs with hand-computable answers."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F  # noqa: F401  (fixture writers)

_EVENTS_SCHEMA = (
    "event_id bigint, ts timestamp, user_id bigint, event_type string, "
    "value double, props string"
)
_DOCS_SCHEMA = "doc_id bigint, text string, lang string, source string, n_chars bigint"
_BASE = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_seconds_offset, user_id, event_type, value, props)."""
    data = [
        (eid, _BASE + datetime.timedelta(seconds=off), uid, etype, val, props)
        for (eid, off, uid, etype, val, props) in rows
    ]
    spark.createDataFrame(data, _EVENTS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def _write_docs(spark, tmp_path, rows):
    """rows: (doc_id, text, lang, source)."""
    data = [(d, t, lang, src, len(t)) for (d, t, lang, src) in rows]
    spark.createDataFrame(data, _DOCS_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_srm_flags_imbalance_exactly_at_critical_value(spark, tmp_path):
    """10 users on arm 0, 1 on arm 1: chi2 = (10-1)^2/11 = 7.3636 >
    3.841 -> flagged.  6/5 split: chi2 = 1/11 -> healthy."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        events_ab_srm_check,
    )

    def mk(n_even, n_odd):
        rows, eid = [], 0
        for u in range(n_even):
            rows.append((eid, eid, 100 + u, "view", 1.0, '{"k": 2}'))
            eid += 1
        for u in range(n_odd):
            rows.append((eid, eid, 200 + u, "view", 1.0, '{"k": 3}'))
            eid += 1
        return rows

    # distinct sf dirs: the catalog caches analyzed plans per
    # (app, tz, sf_dir, table), so re-writing the same path would
    # serve the first file listing
    d1 = tmp_path / "imbalanced"
    d1.mkdir()
    sf = _write_events(spark, d1, mk(10, 1))
    r = events_ab_srm_check(spark, sf).collect()[0]
    assert (r.n_a, r.n_b) == (10, 1)
    assert abs(r.chi2 - round(81 / 11, 6)) < 1e-9
    assert r.srm_flag is True

    d2 = tmp_path / "balanced"
    d2.mkdir()
    sf = _write_events(spark, d2, mk(6, 5))
    r = events_ab_srm_check(spark, sf).collect()[0]
    assert r.srm_flag is False


def test_duplicate_payment_screen_tolerance_edges(spark, tmp_path):
    """Same customer: $100.00 then $100.50 three days later (0.5% ->
    pair), $95.00 (5% -> no), $100.25 but 30 days later (-> no), and a
    different customer at the same amount (-> no)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        orders_duplicate_payment_screen,
    )

    orders = [
        (1, 1, "O", 100.00, _BASE + datetime.timedelta(days=0), "x"),
        (2, 1, "O", 100.50, _BASE + datetime.timedelta(days=3), "x"),
        (3, 1, "O", 95.00, _BASE + datetime.timedelta(days=1), "x"),
        (4, 1, "O", 100.25, _BASE + datetime.timedelta(days=30), "x"),
        (5, 2, "O", 100.00, _BASE + datetime.timedelta(days=1), "x"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    rows = orders_duplicate_payment_screen(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.orderkey_a, r.orderkey_b, r.day_gap) == (1, 2, 3)
    assert (r.amount_a, r.amount_b) == (100.00, 100.50)


def test_migration_matrix_tiers_and_none_rows(spark, tmp_path):
    """cust1 low(1995)->mid(1996); cust2 high(1995)->churn; cust3
    acquired into low.  Tier edges are $100k / $300k
    (_TIER_EDGES_CENTS)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        orders_customer_migration_matrix,
    )

    d95 = datetime.datetime(1995, 6, 1)
    d96 = datetime.datetime(1996, 6, 1)
    orders = [
        (1, 1, "O", 50_000.0, d95, "x"),
        (2, 1, "O", 150_000.0, d96, "x"),
        (3, 2, "O", 400_000.0, d95, "x"),
        (4, 3, "O", 60_000.0, d96, "x"),
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    cells = {
        (r.tier_1995, r.tier_1996): r.n_customers
        for r in orders_customer_migration_matrix(spark, str(tmp_path)).collect()
    }
    assert cells == {
        ("low", "mid"): 1,
        ("high", "none"): 1,
        ("none", "low"): 1,
    }


def test_transition_entropy_deterministic_vs_coinflip(spark, tmp_path):
    """User 1 strictly alternates a->b->a->b (deterministic: 0 bits
    from each state).  User 2 goes c->a and c->b equally (1 bit from
    state c)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_transition_entropy,
    )

    rows = []
    eid = 0
    for i, t in enumerate(["a", "b", "a", "b", "a"]):
        rows.append((eid, i, 1, t, 1.0, "{}"))
        eid += 1
    # user 2: c->a, then (new arrival at c) c->b: sequence c a c b
    for i, t in enumerate(["c", "a", "c", "b"]):
        rows.append((eid, 100 + i, 2, t, 1.0, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.from_type: (r.n_transitions, r.row_entropy_bits)
        for r in events_transition_entropy(spark, sf).collect()
    }
    # a->b twice and a->c once for user2's "a c" hop: user2 seq c,a,c,b
    # gives transitions c->a, a->c, c->b; user1 gives a->b x2, b->a x2
    assert got["b"] == (2, 0.0)  # b -> a always
    assert got["c"] == (2, 1.0)  # c -> a / c -> b coin flip
    # a: a->b twice (user1), a->c once (user2): H(2/3,1/3) = 0.918296
    n, h = got["a"]
    assert n == 3 and abs(h - 0.918296) < 1e-6


def test_xcorr_peaks_at_the_planted_lag(spark, tmp_path):
    """purchase volume = view volume shifted +3 hours: the CCF must
    peak at lag +3 and dominate every other lag."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_xcorr_view_purchase,
    )

    pattern = [5, 1, 4, 2, 8, 3, 7, 1, 6, 2, 9, 4]  # 12 hourly counts
    rows, eid = [], 0
    for h, n in enumerate(pattern):
        for _ in range(n):
            rows.append((eid, h * 3600, 1, "view", 1.0, "{}"))
            eid += 1
        for _ in range(n):
            rows.append((eid, (h + 3) * 3600, 1, "purchase", 1.0, "{}"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    xc = {r.lag: r.xcorr for r in events_xcorr_view_purchase(spark, sf).collect()}
    assert xc[3] == max(xc.values())
    # full-series CCF normalization includes the zero-padded grid
    # tails, so a perfect shift lands ~0.71 here, not 1.0
    assert xc[3] > 0.6
    assert all(xc[3] > xc[lag] + 0.2 for lag in xc if lag != 3)


def test_t_closeness_homogeneous_hour_violates(spark, tmp_path):
    """Global mix 50/50 A/B.  Hour 0 is ALL A (tvd 0.5 -> violates),
    hour 2 matches the global mix exactly (tvd 0 -> clean)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.privacy import (
        privacy_t_closeness_report,
    )

    rows, eid = [], 0
    for _ in range(4):  # hour 0: 4x A
        rows.append((eid, 0 * 3600 + eid, 1, "A", 1.0, "{}"))
        eid += 1
    for _ in range(4):  # hour 1: 4x B
        rows.append((eid, 1 * 3600 + eid, 1, "B", 1.0, "{}"))
        eid += 1
    for t in ["A", "A", "B", "B"]:  # hour 2: the global mix
        rows.append((eid, 2 * 3600 + eid, 1, t, 1.0, "{}"))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {
        r.hour_of_day: (r.tvd, r.violates)
        for r in privacy_t_closeness_report(spark, sf).collect()
    }
    assert got[0] == (0.5, True)
    assert got[1] == (0.5, True)
    assert got[2] == (0.0, False)


def test_sensitivity_is_max_single_user_contribution(spark, tmp_path):
    from spark_nifi_kafka_connected_device_stream_spark.operators.privacy import (
        privacy_sensitivity_report,
    )

    rows = [(i, i, 1, "A", 1.0, "{}") for i in range(5)]  # user 1: 5 rows
    rows.append((5, 5, 2, "A", 1.0, "{}"))  # user 2: 1 row
    sf = _write_events(spark, tmp_path, rows)
    r = privacy_sensitivity_report(spark, sf).collect()[0]
    assert (r.n_rows, r.n_users, r.l1_sensitivity) == (6, 2, 5)
    assert abs(r.max_user_share - round(5 / 6, 6)) < 1e-9


def test_fertility_hand_computed(spark, tmp_path):
    """'ab cd' (2 tokens, 5 chars, 5 bytes) + 'x' (1, 1, 1):
    chars/token = 6/3 = 2.0, tokens/doc = 1.5."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        text_token_fertility_by_lang,
    )

    sf = _write_docs(
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

    sf = _write_docs(spark, tmp_path, [(1, "go on. it is fun.", "en", "s0")])
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
    sf = _write_docs(
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


def test_aspect_ratio_buckets_match_python_model(spark, tmp_path):
    """The query's bucket assignment and padding waste must equal a
    pure-Python reimplementation over the SAME deterministic decode."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.multimodal import (
        AR_BUCKETS,
        fake_decode_rgb,
        multimodal_aspect_ratio_buckets,
    )

    texts = ["x" * n for n in (0, 7, 64, 100, 333, 500, 511, 512)]
    sf = _write_docs(
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


def test_quantile_sketch_bound_holds_on_crafted_values(spark, tmp_path):
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_quantile_sketch_bound,
    )

    rows = [(i, i, 1, "view", float(i % 100), "{}") for i in range(1000)]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.phi: r.within_bound for r in events_quantile_sketch_bound(spark, sf).collect()}
    assert got == {0.25: True, 0.5: True, 0.75: True, 0.95: True}


def test_transit_overlap_counts_only_overlapping_windows(spark, tmp_path):
    """Part 1: two lineitems with overlapping [orderdate, shipdate]
    windows -> 1 pair; part 2: disjoint windows -> no row."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.relational import (
        lineitem_transit_overlap_by_part,
    )

    d = lambda days: _BASE + datetime.timedelta(days=days)  # noqa: E731
    spark.createDataFrame(
        [
            (10, 1, 1, 1, d(5)),   # order 10 placed d0 (below), ships d5
            (11, 1, 1, 1, d(12)),  # order 11 placed d3, ships d12 — overlaps
            (12, 2, 1, 1, d(2)),   # order 12 placed d0, ships d2
            (13, 2, 1, 1, d(30)),  # order 13 placed d20, ships d30 — disjoint
        ],
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, "
        "l_linenumber int, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [
            (10, 1, "O", 1.0, d(0), "x"),
            (11, 1, "O", 1.0, d(3), "x"),
            (12, 1, "O", 1.0, d(0), "x"),
            (13, 1, "O", 1.0, d(20), "x"),
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "Brand#1"), (2, "Brand#2")],
        "p_partkey bigint, p_brand string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    rows = lineitem_transit_overlap_by_part(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.p_brand, r.n_overlap_pairs, r.n_parts_with_overlap) == ("Brand#1", 1, 1)


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


def test_bootstrap_ci_brackets_the_mean_and_is_deterministic(spark, tmp_path):
    """The 95% Poisson-bootstrap CI must bracket the full-sample mean
    on a well-behaved sample, n_resamples == B, and the whole report
    must be bit-identical across runs (hash-derived weights, no RNG)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        BOOTSTRAP_B,
        events_bootstrap_mean_ci,
    )

    rows = [
        (i, i, 1 + i % 7, "purchase", float(10 + (i * 13) % 50), "{}")
        for i in range(500)
    ]
    rows.append((1000, 1000, 9, "view", 999.0, "{}"))  # non-purchase: excluded
    sf = _write_events(spark, tmp_path, rows)
    r1 = events_bootstrap_mean_ci(spark, sf).collect()[0]
    r2 = events_bootstrap_mean_ci(spark, sf).collect()[0]
    assert r1 == r2  # deterministic end to end
    assert r1.n_rows == 500
    assert r1.n_resamples == BOOTSTRAP_B
    assert r1.ci_lo <= r1.mean_value <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi  # non-degenerate interval
