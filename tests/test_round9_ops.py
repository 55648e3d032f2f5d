"""Semantic tests for the round-9 operators: the oracle-parity suite
proves Spark == DuckDB on the same SQL; these prove the SQL means what
the docstrings claim, on crafted inputs with hand-computable answers."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, ts_seconds_offset, user_id, event_type).
    Writes a minimal events.parquet a crafted sf_dir can serve."""
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    data = [
        (
            eid,
            base + datetime.timedelta(seconds=off),
            uid,
            etype,
            1.0,
            "{}",
        )
        for (eid, off, uid, etype) in rows
    ]
    df = spark.createDataFrame(
        data, "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_peak_concurrency_sweep_semantics(spark, tmp_path):
    """Three users: sessions [0s..100s], [50s..60s], [10000s..10000s].
    The first two overlap (peak 2, first reached at the 50s acquire);
    the third is alone."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_peak_concurrency,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 0, 1, "view"),
            (2, 100, 1, "view"),
            (3, 50, 2, "view"),
            (4, 60, 2, "view"),
            (5, 10_000, 3, "view"),
        ],
    )
    row = events_peak_concurrency(spark, sf).collect()[0]
    assert row.n_sessions == 3
    assert row.peak_concurrency == 2
    base_us = int(
        datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )
    # peak first reached when user 2's session opens at +50s — the
    # stored wall-instant is fixture-utc, matching ts_us
    assert row.peak_at_us == base_us + 50_000_000


def test_debounce_burst_semantics(spark, tmp_path):
    """Events at 0/1/2s then 10s for one (user, type): one 3-event
    burst plus a singleton.  A second type is untouched."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_debounce_stats,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 0, 1, "click"),
            (2, 1, 1, "click"),
            (3, 2, 1, "click"),
            (4, 10, 1, "click"),
            (5, 0, 1, "view"),
        ],
    )
    rows = {r.event_type: r for r in events_debounce_stats(spark, sf).collect()}
    c = rows["click"]
    assert (c.n_events, c.n_kept, c.n_dropped, c.max_burst_len) == (4, 2, 2, 3)
    v = rows["view"]
    assert (v.n_events, v.n_kept, v.n_dropped, v.max_burst_len) == (1, 1, 0, 1)


def test_hourly_acf_detects_period(spark, tmp_path):
    """A strict 2-hour on/off pattern (10 events in even hours, none in
    odd) must autocorrelate strongly positive at even lags and
    strongly negative at odd lags."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_hourly_acf,
    )

    rows = []
    eid = 0
    for hour in range(0, 96, 2):          # even hours on, 4 days
        for k in range(10):
            rows.append((eid, hour * 3600 + k * 60, 1, "view"))
            eid += 1
    # one lone event in the final (odd) hour so the grid spans it
    rows.append((eid, 95 * 3600, 2, "view"))
    sf = _write_events(spark, tmp_path, rows)
    acf = {
        (r.event_type, r.lag): r.acf
        for r in events_hourly_acf(spark, sf).collect()
    }
    # finite-sample ACF of the alternating series lands ~0.75 (mean
    # offset + the lone odd-hour event); the signal is the SIGN split
    assert acf[("view", 2)] > 0.6
    assert acf[("view", 1)] < -0.6
    assert acf[("view", 24)] > 0.6
    assert acf[("view", 3)] < -0.6
    assert acf[("view", 2)] - acf[("view", 1)] > 1.2


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


def test_interarrival_burstiness_metronome_is_minus_one(spark, tmp_path):
    """31 events at exactly 10s intervals: 30 gaps, sd=0, mean=10s —
    burstiness hits the machine-traffic pole B = −1 exactly."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_interarrival_burstiness,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [(i, i * 10, 1, "view") for i in range(31)],
    )
    rows = events_interarrival_burstiness(spark, sf).collect()
    assert len(rows) == 1
    row = rows[0]
    assert row.n_gaps == 30
    assert row.mean_gap_s == 10.0
    assert row.sd_gap_s == 0.0
    assert row.burstiness == -1.0


def test_interarrival_burstiness_min_gaps_filter(spark, tmp_path):
    """A type with fewer than 30 gaps is excluded from the report."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_interarrival_burstiness,
    )

    sf = _write_events(
        spark,
        tmp_path,
        [(i, i * 10, 1, "click") for i in range(5)],
    )
    assert events_interarrival_burstiness(spark, sf).count() == 0


def test_user_gini_hand_computed(spark, tmp_path):
    """user 1 → 1 event, user 2 → 3 events: ascending x = (1, 3),
    G = 2·(1·1 + 2·3)/(2·4) − 3/2 = 0.25.  A perfectly equal pair of
    users in a second type gives G = 0."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_user_gini,
    )

    rows = [(1, 0, 1, "view"), (2, 10, 2, "view"), (3, 20, 2, "view"), (4, 30, 2, "view")]
    rows += [(5, 40, 1, "click"), (6, 50, 2, "click")]
    sf = _write_events(spark, tmp_path, rows)
    out = {r.event_type: r for r in events_user_gini(spark, sf).collect()}
    assert out["view"].n_users == 2 and out["view"].n_events == 4
    assert out["view"].gini == 0.25
    assert out["click"].gini == 0.0


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


def test_interpurchase_intervals_hand_computed(spark, tmp_path):
    """One customer ordering on days 0/10/40: gaps {10, 30} —
    avg 20, p50 20, p90 = 10 + 0.9·20 = 28."""
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        orders_interpurchase_intervals,
    )

    base = datetime.datetime(2024, 1, 1)
    orders = [
        (k, 1, "O", 100.0, base + datetime.timedelta(days=d), "1-URGENT")
        for k, d in [(1, 0), (2, 10), (3, 40)]
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, "c1", 0, 0.0, "BUILDING")],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    row = orders_interpurchase_intervals(spark, str(tmp_path)).collect()[0]
    assert row.c_mktsegment == "BUILDING"
    assert row.n_gaps == 2
    assert row.avg_days == 20.0
    assert row.p50_days == 20.0
    assert row.p90_days == 28.0
    assert row.max_days == 30


def test_discount_elasticity_perfect_line(spark, tmp_path):
    """Three lines on one brand with qty = 10·discount + 1 exactly:
    slope 10, R² = 1."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        lineitem_discount_elasticity,
    )

    import datetime

    ship = datetime.datetime(2024, 1, 1)
    lines = [
        (1, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O", ship),
        (1, 1, 1, 2, 2.0, 10.0, 0.1, 0.0, "N", "O", ship),
        (1, 1, 1, 3, 3.0, 10.0, 0.2, 0.0, "N", "O", ship),
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, "part1", "Brand#11", "TYPE", 1, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    row = lineitem_discount_elasticity(spark, str(tmp_path)).collect()[0]
    assert row.p_brand == "Brand#11"
    assert row.n_lines == 3
    assert row.qty_per_discount == 10.0
    assert row.r2 == 1.0
    assert row.avg_qty == 2.0


def test_cms_bound_holds_and_pins_heavy_keys(spark, tmp_path):
    """Three users with counts 40/30/5: with 1500 users' worth of
    headroom in a 4×2048 sketch there are no collisions, so every
    estimate is exact and within_bound is uniformly true; the audited
    key set is exactly the heavy users."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_cms_frequency_bound,
    )

    rows = (
        [(i, i, 1, "view") for i in range(40)]
        + [(100 + i, i, 2, "view") for i in range(30)]
        + [(200 + i, i, 3, "view") for i in range(5)]
    )
    sf = _write_events(spark, tmp_path, rows)
    out = events_cms_frequency_bound(spark, sf).collect()
    assert sorted(r.user_id for r in out) == [1, 2, 3]
    # r12 contract split: est >= true (deterministic) AND
    # est - true <= e*N/w (the actual probabilistic CMS bound)
    assert all(r.within_lower_bound for r in out)
    assert all(r.within_prob_bound for r in out)


def test_bloom_prefilter_no_false_negatives_tiny(spark, tmp_path):
    """2 urgent orders out of 4, all probed via lineitem: member keys
    must always pass (zero false negatives) and with 4 keys in 2^18
    bits there are no collisions, so no false positives either."""
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.relational import (
        orders_bloom_prefilter_bound,
    )

    base = datetime.datetime(2024, 1, 1)
    orders = [
        (k, 1, "O", 100.0, base, "1-URGENT" if k <= 2 else "5-LOW")
        for k in (1, 2, 3, 4)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    lines = [
        (k, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", base) for k in (1, 2, 3, 4)
    ]
    spark.createDataFrame(
        lines,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    row = orders_bloom_prefilter_bound(spark, str(tmp_path)).collect()[0]
    assert row.n_probe_keys == 4
    assert row.n_member_keys == 2
    assert row.zero_false_negatives is True
    assert row.fp_within_bound is True


def test_l_diversity_flags_homogeneous_cell(spark, tmp_path):
    """All Monday-midnight events share one type (l=1, not diverse);
    the Monday-1am cell has three types (l=3, diverse)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.privacy import (
        privacy_l_diversity_report,
    )

    rows = [(i, i, 1, "view") for i in range(5)]  # 2024-01-01 is a Monday, hour 0
    rows += [
        (10, 3600, 1, "view"),
        (11, 3610, 2, "click"),
        (12, 3620, 3, "purchase"),
    ]
    sf = _write_events(spark, tmp_path, rows)
    out = {(r.dow, r.hour_of_day): r for r in privacy_l_diversity_report(spark, sf).collect()}
    assert out[(1, 0)].l_distinct == 1 and out[(1, 0)].diverse is False
    assert out[(1, 1)].l_distinct == 3 and out[(1, 1)].diverse is True


def test_mutual_info_independent_vs_confounded(spark, tmp_path):
    """A 2×2 independent layout has PMI 0 in every cell; a perfectly
    confounded layout (each source maps to one lang) has positive PMI
    ln(2) on its diagonal cells."""
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation import (
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


def test_share_of_region_sums_to_one(spark):
    """On the real fixture every region's nation shares sum to 1
    (within the pround grid) and revenue is positive."""
    from collections import defaultdict

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        nation_revenue_share_of_region,
    )

    rows = nation_revenue_share_of_region(spark, SF).collect()
    by_region = defaultdict(float)
    for r in rows:
        assert r.revenue > 0
        by_region[r.region] += r.share_of_region
    for region, s in by_region.items():
        assert abs(s - 1.0) < 1e-4, (region, s)


def test_log2_histogram_bins_are_binary_digit_counts(spark, tmp_path):
    """Values 0.01/0.02/0.04 → cents 1/2/4 → bins 1/2/3; 2.56 → 256 →
    bin 9.  Bin edges are exact powers of two with no float log."""
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_value_log2_histogram,
    )

    base = datetime.datetime(2024, 1, 1)
    data = [
        (1, base, 1, "view", 0.01, "{}"),
        (2, base, 1, "view", 0.02, "{}"),
        (3, base, 1, "view", 0.04, "{}"),
        (4, base, 1, "view", 2.56, "{}"),
    ]
    spark.createDataFrame(
        data,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {r.log2_bin: r for r in events_value_log2_histogram(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2, 3, 9}
    assert out[9].min_value == 2.56 and out[9].n_events == 1


def test_percent_rank_cume_dist_small_frame(spark, tmp_path):
    """Three nations in one region with distinct revenues: pct_rank is
    0/0.5/1, cume_dist 1/3, 2/3, 1, ntile(2) halves = 1,1,2."""
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.windows import (
        window_percent_rank_cume_dist,
    )

    base = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [(k, k, "O", 100.0 * k, base, "1-URGENT") for k in (1, 2, 3)],
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(k, f"c{k}", k, 0.0, "BUILDING") for k in (1, 2, 3)],
        "c_custkey bigint, c_name string, c_nationkey int, c_acctbal double, c_mktsegment string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(k, f"n{k}", 0) for k in (1, 2, 3)],
        "n_nationkey int, n_name string, n_regionkey int",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    rows = sorted(
        window_percent_rank_cume_dist(spark, str(tmp_path)).collect(),
        key=lambda r: r.revenue,
    )
    assert [r.pct_rank for r in rows] == [0.0, 0.5, 1.0]
    assert [round(r.cume, 6) for r in rows] == [0.333333, 0.666667, 1.0]
    assert [r.half for r in rows] == [1, 1, 2]


def test_perplexity_buckets_partition_docs(spark):
    """Over the real fixture: every (source, bucket) count is positive,
    buckets are only head/middle/tail, and the head bucket's average
    score is >= the tail's (higher logprob = more predictable)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.curation import (
        documents_perplexity_buckets,
    )

    rows = documents_perplexity_buckets(spark, SF).collect()
    assert rows and all(r.bucket in ("head", "middle", "tail") for r in rows)
    heads = [r.avg_score for r in rows if r.bucket == "head"]
    tails = [r.avg_score for r in rows if r.bucket == "tail"]
    assert min(heads) >= max(tails)


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


def test_theil_sen_shrugs_off_outlier_hour(spark, tmp_path):
    """A metronomic 2-events-per-hour series for 21 hours with ONE
    100-event outlier hour near the start: the Theil–Sen slope must be
    exactly 0 (most pairwise slopes are 0; outlier pairs are a
    minority), while the OLS slope is dragged non-zero by the spike.
    The TS-vs-OLS gap IS the outlier signal the docstring claims."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_theil_sen_trend,
    )

    rows = []
    eid = 0
    for h in range(21):
        n = 100 if h == 3 else 2
        for k in range(n):
            rows.append((eid, h * 3600 + k, 1, "view"))
            eid += 1
    sf_dir = _write_events(spark, tmp_path, rows)
    row = events_theil_sen_trend(spark, sf_dir).collect()[0]
    assert row.n_hours == 21 and row.n_pairs == 210
    assert row.ts_slope == 0.0
    assert row.ols_slope != 0.0
    assert row.ts_intercept == 2.0


def _write_documents(spark, tmp_path, docs):
    df = spark.createDataFrame(
        docs,
        "doc_id bigint, text string, lang string, source string, n_chars bigint",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "documents.parquet")
    )
    return str(tmp_path)


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
    sf = _write_documents(
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


def test_mann_whitney_hand_computed(spark, tmp_path):
    """All events on one Monday.  No-ties case: purchases {10,20,30} vs
    views {1,2} -> U = 6 (maximal), rank-biserial = 1, z = sqrt(3).
    Tie case on a second Monday: purchases {2,20,30} vs views {1,2}
    -> avg-rank 2.5 for the tied pair, U = 5.5, tie-corrected z."""
    import datetime as dt
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        events_mann_whitney_value,
    )

    day1 = dt.datetime(2024, 1, 1, 12, 0, 0)   # Monday -> dow 1
    day2 = dt.datetime(2024, 1, 8, 12, 0, 0)   # next Monday
    rows = [
        (1, day1, 1, "purchase", 10.0, "{}"),
        (2, day1, 1, "purchase", 20.0, "{}"),
        (3, day1, 1, "purchase", 30.0, "{}"),
        (4, day1, 2, "view", 1.0, "{}"),
        (5, day1, 2, "view", 2.0, "{}"),
        (6, day2, 1, "purchase", 2.0, "{}"),
        (7, day2, 1, "purchase", 20.0, "{}"),
        (8, day2, 1, "purchase", 30.0, "{}"),
        (9, day2, 2, "view", 1.0, "{}"),
        (10, day2, 2, "view", 2.0, "{}"),
    ]
    # day2 rows land on dow 1 as well -- separate the two cases by
    # putting the tie case on a Tuesday instead
    rows = [
        (eid, ts if eid <= 5 else ts + dt.timedelta(days=1), u, t, v, p)
        for (eid, ts, u, t, v, p) in rows
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.dow: r for r in events_mann_whitney_value(spark, str(tmp_path)).collect()}
    clean = out[1]
    assert (clean.n_purchase, clean.n_view) == (3, 2)
    assert clean.u_stat == 6.0
    assert clean.rank_biserial == 1.0
    assert clean.z_score == pytest.approx(math.sqrt(3.0), abs=1e-6)
    tied = out[2]
    assert tied.u_stat == 5.5
    # sigma^2 = (6/12) * (6 - 6/20) = 2.85 ; z = 2.5 / sqrt(2.85)
    assert tied.z_score == pytest.approx(2.5 / math.sqrt(2.85), abs=1e-6)


def test_heaps_all_unique_vocab_is_linear(spark, tmp_path):
    """Docs whose tokens are all distinct put every point ON the line
    V = N (beta = 1, k = 1): the quantized fit must return beta 1.0
    exactly and a geometric vocab ratio of 1.0 for every source."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.text import (
        documents_heaps_law,
    )

    def doc(n, tag):
        return " ".join(f"{tag}w{i}" for i in range(n))

    sf = _write_documents(
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


def test_spearman_hand_computed(spark, tmp_path):
    """Perfect monotone groups hit exactly +-1; a tied group matches the
    hand-worked average-rank Pearson (rho = 3/sqrt(13.5) = 0.816497);
    a zero-variance group is filtered, not emitted as NULL."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        events_spearman_hour_value,
    )

    def ev(eid, hour, typ, val):
        return (eid, dt.datetime(2024, 1, 1, hour, 0, 0), 1, typ, val, "{}")

    rows = [
        # monotone up -> rho 1
        ev(1, 1, "purchase", 10.0), ev(2, 2, "purchase", 20.0),
        ev(3, 3, "purchase", 30.0),
        # monotone down -> rho -1
        ev(4, 1, "view", 30.0), ev(5, 2, "view", 20.0), ev(6, 3, "view", 10.0),
        # ties in both marginals -> 0.816497
        ev(7, 1, "click", 5.0), ev(8, 1, "click", 5.0),
        ev(9, 2, "click", 5.0), ev(10, 3, "click", 7.0),
        # zero variance in y -> filtered out
        ev(11, 1, "signup", 1.0), ev(12, 2, "signup", 1.0),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.event_type: r for r in events_spearman_hour_value(spark, str(tmp_path)).collect()}
    assert set(out) == {"purchase", "view", "click"}
    assert out["purchase"].spearman_rho == 1.0
    assert out["view"].spearman_rho == -1.0
    assert out["click"].spearman_rho == 0.816497
    assert (out["click"].n, out["click"].n_cells) == (4, 3)


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
    sf = _write_documents(
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


def test_skyline_hand_computed(spark, tmp_path):
    """Known dominance structure: cheaper-and-bigger dominates, equal
    (price, size) twins both survive, and a same-price smaller row is
    dominated by its price twin."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        part_skyline_price_size,
    )

    rows = [
        # (key, price, size)
        (1, 10.0, 5),   # skyline (cheapest overall, size 5)
        (2, 10.0, 5),   # equal twin of 1 -> also skyline
        (3, 10.0, 3),   # dominated by 1 (same price, smaller)
        (4, 20.0, 4),   # dominated by 1 (more expensive, smaller)
        (5, 20.0, 8),   # skyline (bigger than everything cheaper)
        (6, 30.0, 8),   # dominated by 5 (same size, more expensive)
        (7, 40.0, 9),   # skyline
    ]
    df = spark.createDataFrame(
        [(k, f"part{k}", "B", "T", s, p) for (k, p, s) in rows],
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    df.repartition(3).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    got = sorted(
        (r.p_partkey, r.p_retailprice, r.p_size)
        for r in part_skyline_price_size(spark, str(tmp_path)).collect()
    )
    assert got == [(1, 10.0, 5), (2, 10.0, 5), (5, 20.0, 8), (7, 40.0, 9)]


def test_forecast_backtest_perfect_daily_cycle(spark, tmp_path):
    """A perfectly 24h-periodic hourly series: the seasonal-naive error
    is exactly 0 (MASE 0), while the naive forecast pays for the two
    spike transitions per day."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_forecast_backtest,
    )

    rows = []
    eid = 0
    t0 = dt.datetime(2024, 3, 1, 0, 0, 0)
    for h in range(48):
        n = 2 if h % 24 == 0 else 1
        for _ in range(n):
            eid += 1
            rows.append(
                (eid, t0 + dt.timedelta(hours=h), 1, "view", 1.0, "{}")
            )
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = events_forecast_backtest(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.event_type == "view"
    assert r.n_eval == 24
    # naive: |c(24)-c(23)| + |c(25)-c(24)| = 2 absolute errors of 1
    assert r.mae_naive == round(2 / 24, 6)
    assert r.mae_snaive == 0.0
    assert r.mase_snaive == 0.0


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
    sf = _write_documents(spark, tmp_path, docs)
    out = documents_quality_calibration(spark, sf).collect()
    big = {r.decile: r for r in out if r.source == "big"}
    assert sorted(big) == list(range(1, 11))
    for d, r in big.items():
        assert r.n_docs == 1
        assert r.min_ppm == r.max_ppm == d * 100_000
        assert r.mean_unique_ratio == round(d / 10, 6)
    tiny = [r for r in out if r.source == "tiny"]
    assert len(tiny) == 1 and tiny[0].decile == 1 and tiny[0].n_docs == 1


def test_monthly_seasonality_hand_computed(spark, tmp_path):
    """Jan averages 200 across two years, Feb 100 across one; overall
    monthly average is 500/3 — indices 1.2 and 0.6, with n_months
    exposing the partial coverage."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        orders_monthly_seasonality,
    )

    rows = [
        (1, 1, "O", 100.0, dt.datetime(1992, 1, 10), "1-URGENT"),
        (2, 1, "O", 300.0, dt.datetime(1993, 1, 20), "1-URGENT"),
        (3, 1, "O", 100.0, dt.datetime(1992, 2, 5), "1-URGENT"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = {r.month: r for r in orders_monthly_seasonality(spark, str(tmp_path)).collect()}
    assert set(out) == {1, 2}
    assert (out[1].n_months, out[1].rev_cents) == (2, 40000)
    assert (out[2].n_months, out[2].rev_cents) == (1, 10000)
    assert out[1].seasonal_index == 1.2
    assert out[2].seasonal_index == 0.6


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
    sf = _write_documents(spark, tmp_path, docs)
    r = documents_length_anova_by_lang(spark, sf).collect()[0]
    assert (r.k_groups, r.n_docs, r.df_between, r.df_within) == (2, 6, 1, 4)
    assert r.ss_between == 0.0
    assert r.f_stat == 0.0
    # total SS = sum((x - 20)^2) = 2 * (100 + 0 + 100) = 400
    assert r.ss_within == 400.0


def test_pchart_flags_spike_month(spark, tmp_path):
    """A month with a 100% return rate against a near-zero baseline
    must be flagged; the quiet months must not be."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        lineitem_returns_pchart,
    )

    rows = []
    k = 0
    # 3 quiet months: 100 lines each, 1 return
    for mo in (1, 2, 3):
        for i in range(100):
            k += 1
            flag = "R" if i == 0 else "N"
            rows.append((k, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, flag, "O",
                         dt.datetime(1995, mo, 10)))
    # spike month: 100 lines, 30 returns — high enough to break the
    # upper band, small enough not to drag the pooled baseline up so
    # far that the quiet months fall below the LOWER band (a real
    # p-chart effect: an extreme spike contaminates the center line)
    for i in range(100):
        k += 1
        flag = "R" if i < 30 else "N"
        rows.append((k, 1, 1, 1, 1.0, 10.0, 0.0, 0.0, flag, "O",
                     dt.datetime(1995, 4, 10)))
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {r.ym: r for r in lineitem_returns_pchart(spark, str(tmp_path)).collect()}
    assert out[199504].out_of_control == 1
    assert out[199504].p_rate == 0.3
    assert all(out[ym].out_of_control == 0 for ym in (199501, 199502, 199503))
    assert all(out[ym].lcl >= 0.0 for ym in out)


def test_relational_division_all_quarters(spark, tmp_path):
    """Only the customer covering all four 1995 quarters survives; a
    3-quarter customer and one whose 4th order fell in 1994 do not."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        customers_all_quarters_1995,
    )

    def order(k, cust, y, mo):
        return (k, cust, "O", 10.0, dt.datetime(y, mo, 15), "1-URGENT")

    rows = [
        order(1, 1, 1995, 1), order(2, 1, 1995, 4),
        order(3, 1, 1995, 7), order(4, 1, 1995, 10),
        order(5, 2, 1995, 1), order(6, 2, 1995, 5), order(7, 2, 1995, 8),
        order(8, 3, 1994, 11), order(9, 3, 1995, 2),
        order(10, 3, 1995, 6), order(11, 3, 1995, 9),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey bigint, o_custkey bigint, o_orderstatus string, o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "orders.parquet")
    )
    out = customers_all_quarters_1995(spark, str(tmp_path)).collect()
    assert [(r.o_custkey, r.n_orders, r.total_cents) for r in out] == [
        (1, 4, 4000)
    ]


def test_bounce_rate_hand_computed(spark, tmp_path):
    """One bounce session and one 3-event session on the same epoch
    day: rate 0.5, mean 2.0; a second day with only the bounce: 1.0."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_bounce_rate_daily,
    )

    t0 = dt.datetime(2024, 5, 1, 10, 0, 0)
    rows = [
        # user 1, day 0: 3 events within 30 min -> one session
        (1, t0, 1, "view", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=5), 1, "click", 1.0, "{}"),
        (3, t0 + dt.timedelta(minutes=10), 1, "purchase", 1.0, "{}"),
        # user 2, day 0: single event -> bounce
        (4, t0 + dt.timedelta(hours=1), 2, "view", 1.0, "{}"),
        # user 2, day 1: single event -> bounce
        (5, t0 + dt.timedelta(days=1), 2, "view", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {r.day: r for r in events_bounce_rate_daily(spark, str(tmp_path)).collect()}
    days = sorted(out)
    assert len(days) == 2 and days[1] == days[0] + 1
    d0, d1 = out[days[0]], out[days[1]]
    assert (d0.n_sessions, d0.n_bounces, d0.bounce_rate) == (2, 1, 0.5)
    assert d0.avg_events_per_session == 2.0
    assert (d1.n_sessions, d1.n_bounces, d1.bounce_rate) == (1, 1, 1.0)


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
    sf = _write_documents(spark, tmp_path, docs)
    out = {r.lang: r for r in documents_source_simpson_diversity(spark, sf).collect()}
    assert set(out) == {"en", "fr"}
    assert (out["en"].n_docs, out["en"].n_sources) == (4, 2)
    assert out["en"].simpson_lambda == 0.333333
    assert out["en"].effective_sources == 3.0
    assert (out["fr"].simpson_lambda, out["fr"].effective_sources) == (1.0, 1.0)


def test_id_integrity_audit_finds_dups_and_holes(spark, tmp_path):
    """ids 1..10 with 3 missing and one duplicated: the single-row
    audit reports both defect classes from pure count algebra."""
    sf = _write_events(
        spark,
        tmp_path,
        [(i, i, 1, "view") for i in (1, 2, 4, 5, 7, 8, 10)] + [(2, 99, 2, "view")],
    )
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_id_integrity_audit,
    )

    r = events_id_integrity_audit(spark, sf).collect()[0]
    assert (r.n_rows, r.n_distinct, r.min_id, r.max_id) == (8, 7, 1, 10)
    assert r.n_dup_rows == 1
    assert r.n_missing_ids == 3  # ids 3, 6, 9


def test_impute_median_hand_computed(spark, tmp_path):
    """event_id 97 is masked; observed values {10, 20, 40} impute their
    median 20, and the post-impute mean moves from 70/3 to 90/4."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_value_impute_median,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "view", 10.0, "{}"),
        (2, t0, 1, "view", 20.0, "{}"),
        (3, t0, 1, "view", 40.0, "{}"),
        (97, t0, 1, "view", 999.0, "{}"),   # masked: value ignored
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = events_value_impute_median(spark, str(tmp_path)).collect()[0]
    assert (r.n_events, r.n_imputed) == (4, 1)
    assert r.imputed_value == 20.0
    assert r.mean_before == round(70 / 3, 6)
    assert r.mean_after == 22.5


def test_markov_stationary_two_state_chain(spark, tmp_path):
    """Repeating A A A B per user: P(A->A)=2/3, P(B->A)=1 — true
    stationary (0.75, 0.25); five power rounds from uniform land within
    the |lambda_2|^5 = 3^-5 convergence envelope and conserve mass."""
    rows = []
    eid = 0
    for rep in range(10):
        for t in ("view", "view", "view", "click"):
            rows.append((eid, eid * 10, 7, t))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_markov_stationary,
    )

    out = {r.event_type: r for r in events_markov_stationary(spark, sf).collect()}
    assert set(out) == {"view", "click"}
    assert abs(out["view"].pi - 0.75) < 0.002
    assert abs(out["click"].pi - 0.25) < 0.002
    total = out["view"].pi_scaled + out["click"].pi_scaled
    assert 0 <= 1_000_000_000_000 - total <= 50  # floor losses only


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
    sf = _write_documents(spark, tmp_path, docs)
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


def test_simpson_paradox_constructed_reversal(spark, tmp_path):
    """Textbook reversal: within each brand quantity FALLS with
    discount, but the high-discount brand sells bigger quantities, so
    the pooled slope is positive — both groups must disagree with the
    pooled sign."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        lineitem_simpson_paradox_screen,
    )

    parts = spark.createDataFrame(
        [(1, "p1", "BrandA", "T", 1, 1.0), (2, "p2", "BrandB", "T", 1, 1.0)],
        "p_partkey bigint, p_name string, p_brand string, p_type string, p_size int, p_retailprice double",
    )
    parts.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "part.parquet")
    )
    d = dt.datetime(1995, 1, 1)
    li = [
        # BrandA: low discounts, small quantities, negative within-slope
        (1, 1, 1, 1, 12.0, 1.0, 0.00, 0.0, "N", "O", d),
        (2, 1, 1, 2, 10.0, 1.0, 0.02, 0.0, "N", "O", d),
        # BrandB: high discounts, big quantities, negative within-slope
        (3, 2, 1, 1, 42.0, 1.0, 0.08, 0.0, "N", "O", d),
        (4, 2, 1, 2, 40.0, 1.0, 0.10, 0.0, "N", "O", d),
    ]
    df = spark.createDataFrame(
        li,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    r = lineitem_simpson_paradox_screen(spark, str(tmp_path)).collect()[0]
    assert r.pooled_sign == 1          # pooled trend looks positive...
    assert r.n_groups == 2
    assert r.n_sign_agree == 0         # ...but NO brand agrees
    assert r.n_sign_disagree == 2      # both reverse: the paradox
    assert r.pooled_slope > 0


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


def test_retention_halflife_constructed_decay(spark, tmp_path):
    """100 users all start week 0; 50 stay active in week 1, 25 in
    week 2: exact halving -> slope = ln(1/2) per week, half-life 1.0."""
    rows = []
    eid = 0
    week = 7 * 24 * 3600
    for u in range(100):
        eid += 1
        rows.append((eid, 0, u, "view"))
    for u in range(50):
        eid += 1
        rows.append((eid, week + 60, u, "view"))
    for u in range(25):
        eid += 1
        rows.append((eid, 2 * week + 60, u, "view"))
    sf = _write_events(spark, tmp_path, rows)
    from spark_nifi_kafka_connected_device_stream_spark.operators.cohorts import (
        events_retention_halflife,
    )

    r = events_retention_halflife(spark, sf).collect()[0]
    assert r.n_weeks == 2
    # ln(0.5) quantized to 1e-4: slope = -0.6931 / week
    assert abs(r.decay_slope - (-0.6931)) < 0.0002
    assert abs(r.halflife_weeks - 1.0) < 0.001


def test_audience_overlap_hand_computed(spark, tmp_path):
    """users {1,2} view, {2,3} click: intersection 1, union 3."""
    sf = _write_events(
        spark,
        tmp_path,
        [
            (1, 0, 1, "view"), (2, 10, 2, "view"),
            (3, 20, 2, "click"), (4, 30, 3, "click"),
            (5, 40, 2, "view"),   # duplicate (user, type) must not count twice
        ],
    )
    from spark_nifi_kafka_connected_device_stream_spark.operators.cohorts import (
        events_audience_overlap,
    )

    rows = events_audience_overlap(spark, sf).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r.type_a, r.type_b) == ("click", "view")
    assert (r.n_both, r.n_a, r.n_b) == (1, 2, 2)
    assert r.jaccard == round(1 / 3, 6)


def test_hill_tail_index_constructed(spark, tmp_path):
    """100 tail values at e times the 101st order statistic: every
    log-excess is exactly 1, so alpha = 1 (the pathologically heavy
    pole) and mean_log_excess = 1."""
    import datetime as dt
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_hill_tail_index,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = [(i, t0, 1, "view", math.e, "{}") for i in range(100)]
    rows.append((100, t0, 1, "view", 1.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = events_hill_tail_index(spark, str(tmp_path)).collect()[0]
    assert r.n_tail == 100
    assert r.mean_log_excess == 1.0
    assert r.hill_alpha == 1.0


def test_kruskal_wallis_hand_computed(spark, tmp_path):
    """Two dow groups {1,2} vs {3,4}, no ties: R = 3 and 7, H =
    12/20 * (9/2 + 49/2) - 15 = 2.4 exactly; not significant at the
    pinned df=6 95% cut."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        events_kruskal_wallis_dow,
    )

    mon = dt.datetime(2024, 1, 1, 12)   # Monday
    tue = dt.datetime(2024, 1, 2, 12)
    rows = [
        (1, mon, 1, "purchase", 1.0, "{}"),
        (2, mon, 1, "purchase", 2.0, "{}"),
        (3, tue, 1, "purchase", 3.0, "{}"),
        (4, tue, 1, "purchase", 4.0, "{}"),
        (5, mon, 1, "view", 99.0, "{}"),   # other types excluded
    ]
    df = spark.createDataFrame(
        rows,
        "event_id bigint, ts timestamp, user_id bigint, event_type string, value double, props string",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    r = events_kruskal_wallis_dow(spark, str(tmp_path)).collect()[0]
    assert (r.k_groups, r.n, r.df) == (2, 4, 1)
    assert r.h_stat == 2.4
    assert r.significant_95 == 0


def test_basket_histogram_pair_rows(spark, tmp_path):
    """Two 1-line orders, one 3-line order: the 3-basket contributes
    exactly 3 pair rows, singletons none."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        orders_basket_size_histogram,
    )

    d = dt.datetime(1995, 1, 1)
    rows = [
        (1, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (2, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (3, 1, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (3, 2, 1, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
        (3, 3, 1, 3, 1.0, 1.0, 0.0, 0.0, "N", "O", d),
    ]
    df = spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_partkey bigint, l_suppkey bigint, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "lineitem.parquet")
    )
    out = {r.basket_size: r for r in orders_basket_size_histogram(spark, str(tmp_path)).collect()}
    assert (out[1].n_orders, out[1].pair_join_rows) == (2, 0)
    assert (out[3].n_orders, out[3].pair_join_rows) == (1, 3)
    assert out[1].share == round(2 / 3, 6)


def test_lorenz_curve_monotone_and_sums(spark, tmp_path):
    """20 users with counts 1..20 for one type: decile cells hold 2
    users each, cumulative share is monotone and ends at exactly 1."""
    rows = []
    eid = 0
    for u in range(1, 21):
        for _ in range(u):
            rows.append((eid, eid, u, "view"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_lorenz_curve,
    )

    out = sorted(events_lorenz_curve(spark, sf).collect(), key=lambda r: r.decile)
    assert [r.n_users for r in out] == [2] * 10
    shares = [r.cum_event_share for r in out]
    assert all(b > a for a, b in zip(shares, shares[1:]))
    assert shares[-1] == 1.0
    # decile 1 holds users 1+2 of 210 total events
    assert out[0].n_events == 3
    assert shares[0] == round(3 / 210, 6)


def test_kmv_exact_when_k_equals_cardinality_region(spark, tmp_path):
    """Sanity on crafted users: estimate is (k-1)*2^32/h_k by
    definition; verify against a Python replication of the same md5
    pipeline, and that rel_err is the exact signed error."""
    import hashlib

    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        _KMV_K,
        events_kmv_distinct_users,
    )

    users = list(range(1, 40))
    sf = _write_events(
        spark, tmp_path, [(u, u, u, "view") for u in users]
    )
    hashes = sorted(
        int(hashlib.md5(str(u).encode()).hexdigest()[:8], 16) for u in users
    )
    hk = hashes[_KMV_K - 1]
    want = (_KMV_K - 1) * 4294967296.0 / hk
    r = events_kmv_distinct_users(spark, sf).collect()[0]
    assert r.n_exact == len(users)
    assert abs(r.kmv_estimate - want) < 1e-5
    assert abs(r.rel_err - (want - len(users)) / len(users)) < 1e-5


def test_threshold_sensitivity_cumulative(spark, tmp_path):
    """The allpairs corpus: pairs at J = 1.0 (bucket 100), 0.931
    (bucket 90, two of them) — cumulative counts must nest."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.dedup import (
        dedup_threshold_sensitivity,
    )

    base = " ".join(f"tok{i}" for i in range(30))
    changed = " ".join(f"tok{i}" for i in range(29)) + " other"
    sf = _write_documents(
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


def test_holdout_perplexity_hand_computed(spark, tmp_path):
    """One train doc 'x y x5', one val doc 'x y z': the val bigram
    (x,y) is seen (lp = ln(6/7)), (y,z) is unseen (lp = ln(1/7)) —
    match a Python replication of the quantized pipeline exactly."""
    import hashlib
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.curation import (
        documents_holdout_perplexity,
    )

    def bucket(doc_id):
        return int(hashlib.md5(str(doc_id).encode()).hexdigest()[:4], 16) % 100

    train_id = next(d for d in range(500) if bucket(d) < 80)
    val_id = next(d for d in range(500) if 80 <= bucket(d) < 90)
    sf = _write_documents(
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


def test_fano_dispersion_hand_computed(spark, tmp_path):
    """Daily counts 2, 4, 6: mean 4, sample variance 4, Fano = 1.0; a
    constant series has Fano 0."""
    rows = []
    eid = 0
    day = 86_400
    for d, c in ((0, 2), (1, 4), (2, 6)):
        for _ in range(c):
            rows.append((eid, d * day + 60, 1, "view"))
            eid += 1
    for d in range(3):
        for _ in range(5):
            rows.append((eid, d * day + 120, 1, "click"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_fano_dispersion,
    )

    out = {r.event_type: r for r in events_fano_dispersion(spark, sf).collect()}
    v = out["view"]
    assert (v.n_days, v.n_events, v.mean_daily) == (3, 12, 4.0)
    assert v.fano_factor == 1.0
    c = out["click"]
    assert c.fano_factor == 0.0


def test_pettitt_finds_constructed_level_shift(spark, tmp_path):
    """Hourly counts 1/hour for 48h then 20/hour for 48h: the split
    must land at the boundary hour and clear the 95% threshold."""
    rows = []
    eid = 0
    for h in range(96):
        n = 1 if h < 48 else 20
        for k in range(n):
            rows.append((eid, h * 3600 + k, 1, "view"))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    from spark_nifi_kafka_connected_device_stream_spark.operators.events import (
        events_pettitt_changepoint,
    )

    r = events_pettitt_changepoint(spark, sf).collect()[0]
    assert r.n_hours == 96
    assert r.significant_95 == 1
    # argmax of |U_t| sits at the last pre-shift hour (t = 48), whose
    # epoch hour is the series start + 47
    base_h = 473352  # epoch hours of 2024-01-01 (= _write_events base)
    assert r.change_at_hour == base_h + 47


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
    sf = _write_documents(spark, tmp_path, docs)
    out = text_term_burstiness(spark, sf).collect()
    top = out[0]
    assert top.term == "spam"
    assert (top.cf, top.df, top.burstiness) == (6, 1, 6.0)
    assert top.poisson_expected_df > 3.0   # 4*(1-e^-1.5) ~ 3.11
    the = next(r for r in out if r.term == "the")
    assert (the.cf, the.df, the.burstiness) == (4, 4, 1.0)


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
