"""Semantic tests for the analytics tier: the oracle-parity suite
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

def test_interpurchase_intervals_hand_computed(spark, tmp_path):
    """One customer ordering on days 0/10/40: gaps {10, 30} —
    avg 20, p50 20, p90 = 10 + 0.9·20 = 28."""
    import datetime

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders import (
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
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders import (
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


def test_mann_whitney_hand_computed(spark, tmp_path):
    """All events on one Monday.  No-ties case: purchases {10,20,30} vs
    views {1,2} -> U = 6 (maximal), rank-biserial = 1, z = sqrt(3).
    Tie case on a second Monday: purchases {2,20,30} vs views {1,2}
    -> avg-rank 2.5 for the tied pair, U = 5.5, tie-corrected z."""
    import datetime as dt
    import math

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_stats import (
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


def test_spearman_hand_computed(spark, tmp_path):
    """Perfect monotone groups hit exactly +-1; a tied group matches the
    hand-worked average-rank Pearson (rho = 3/sqrt(13.5) = 0.816497);
    a zero-variance group is filtered, not emitted as NULL."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_stats import (
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


def test_skyline_hand_computed(spark, tmp_path):
    """Known dominance structure: cheaper-and-bigger dominates, equal
    (price, size) twins both survive, and a same-price smaller row is
    dominated by its price twin."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders import (
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


def test_monthly_seasonality_hand_computed(spark, tmp_path):
    """Jan averages 200 across two years, Feb 100 across one; overall
    monthly average is 500/3 — indices 1.2 and 0.6, with n_months
    exposing the partial coverage."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders import (
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


def test_pchart_flags_spike_month(spark, tmp_path):
    """A month with a 100% return rate against a near-zero baseline
    must be flagged; the quiet months must not be."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_stats import (
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


def test_simpson_paradox_constructed_reversal(spark, tmp_path):
    """Textbook reversal: within each brand quantity FALLS with
    discount, but the high-discount brand sells bigger quantities, so
    the pooled slope is positive — both groups must disagree with the
    pooled sign."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_stats import (
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


def test_kruskal_wallis_hand_computed(spark, tmp_path):
    """Two dow groups {1,2} vs {3,4}, no ties: R = 3 and 7, H =
    12/20 * (9/2 + 49/2) - 15 = 2.4 exactly; not significant at the
    pinned df=6 95% cut."""
    import datetime as dt

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_stats import (
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

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders import (
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


def test_srm_flags_imbalance_exactly_at_critical_value(spark, tmp_path):
    """10 users on arm 0, 1 on arm 1: chi2 = (10-1)^2/11 = 7.3636 >
    3.841 -> flagged.  6/5 split: chi2 = 1/11 -> healthy."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_abtest import (
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
    sf = write_events6(spark, d1, mk(10, 1))
    r = events_ab_srm_check(spark, sf).collect()[0]
    assert (r.n_a, r.n_b) == (10, 1)
    assert abs(r.chi2 - round(81 / 11, 6)) < 1e-9
    assert r.srm_flag is True

    d2 = tmp_path / "balanced"
    d2.mkdir()
    sf = write_events6(spark, d2, mk(6, 5))
    r = events_ab_srm_check(spark, sf).collect()[0]
    assert r.srm_flag is False


def test_duplicate_payment_screen_tolerance_edges(spark, tmp_path):
    """Same customer: $100.00 then $100.50 three days later (0.5% ->
    pair), $95.00 (5% -> no), $100.25 but 30 days later (-> no), and a
    different customer at the same amount (-> no)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders import (
        orders_duplicate_payment_screen,
    )

    orders = [
        (1, 1, "O", 100.00, BASE + datetime.timedelta(days=0), "x"),
        (2, 1, "O", 100.50, BASE + datetime.timedelta(days=3), "x"),
        (3, 1, "O", 95.00, BASE + datetime.timedelta(days=1), "x"),
        (4, 1, "O", 100.25, BASE + datetime.timedelta(days=30), "x"),
        (5, 2, "O", 100.00, BASE + datetime.timedelta(days=1), "x"),
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
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders import (
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


def test_bootstrap_ci_brackets_the_mean_and_is_deterministic(spark, tmp_path):
    """The 95% Poisson-bootstrap CI must bracket the full-sample mean
    on a well-behaved sample, n_resamples == B, and the whole report
    must be bit-identical across runs (hash-derived weights, no RNG)."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_abtest import (
        BOOTSTRAP_B,
        events_bootstrap_mean_ci,
    )

    rows = [
        (i, i, 1 + i % 7, "purchase", float(10 + (i * 13) % 50), "{}")
        for i in range(500)
    ]
    rows.append((1000, 1000, 9, "view", 999.0, "{}"))  # non-purchase: excluded
    sf = write_events6(spark, tmp_path, rows)
    r1 = events_bootstrap_mean_ci(spark, sf).collect()[0]
    r2 = events_bootstrap_mean_ci(spark, sf).collect()[0]
    assert r1 == r2  # deterministic end to end
    assert r1.n_rows == 500
    assert r1.n_resamples == BOOTSTRAP_B
    assert r1.ci_lo <= r1.mean_value <= r1.ci_hi
    assert r1.ci_lo < r1.ci_hi  # non-degenerate interval


def test_linear_regression_matches_numpy(spark, tmp_path):
    """Independent OLS cross-check: regr_slope/intercept/r2 on a
    crafted noisy line must equal numpy's closed-form least squares at
    the shared rounding."""
    import datetime as _dt
    import math

    import numpy as np

    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_stats import (
        stats_linear_regression,
    )

    base = _dt.datetime(1995, 1, 1)
    # y = 3x + 10 with deterministic pseudo-noise; x spread over 1..20
    pts = [(float(x), 3.0 * x + 10.0 + ((x * 7) % 5 - 2)) for x in range(1, 21)]
    rows = [
        (i + 1, 1, i + 1, 1, x, y, 0.0, 0.0, "N", "O", base)
        for i, (x, y) in enumerate(pts)
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey bigint, l_linenumber int, l_partkey bigint, l_suppkey bigint, "
        "l_quantity double, l_extendedprice double, l_discount double, l_tax double, "
        "l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))

    row = stats_linear_regression(spark, str(tmp_path)).collect()[0]
    xs = np.array([p[0] for p in pts]); ys = np.array([p[1] for p in pts])
    slope, intercept = np.polyfit(xs, ys, 1)
    r = np.corrcoef(xs, ys)[0, 1]
    def rnd(v, n):
        return math.floor(v * 10**n + 0.5) / 10**n
    assert row.n == 20
    assert row.slope == rnd(float(slope), 6)
    assert row.intercept == rnd(float(intercept), 2)
    assert row.r2 == rnd(float(r * r), 6)


def test_did_estimator_hand_computed(spark, tmp_path):
    """Crafted two-users-per-arm corpus with hand-computed DiD: treated
    (user_id%5==0) deltas 2000/3000 cents, control deltas 500/700 —
    DiD = 2500-600 = 1900 cents, Welch t = 1900/sqrt(500000/2+20000/2)
    = 3.726207 at the shared 6-decimal rounding."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics_abtest import (
        events_did_estimator,
    )

    pre, post = 3_600, 1_382_400  # Jan 1 (pre-split) vs Jan 17 (post)
    rows = [
        (1, pre, 5, "view", 10.00, "{}"),
        (2, post, 5, "view", 30.00, "{}"),
        (3, pre, 10, "view", 20.00, "{}"),
        (4, post, 10, "view", 50.00, "{}"),
        (5, pre, 1, "view", 10.00, "{}"),
        (6, post, 1, "view", 15.00, "{}"),
        (7, pre, 2, "view", 20.00, "{}"),
        (8, post, 2, "view", 27.00, "{}"),
    ]
    sf = write_events6(spark, tmp_path, rows)
    [r] = events_did_estimator(spark, sf).collect()
    assert (r.n_treated, r.n_control) == (2, 2)
    assert (r.treated_pre, r.treated_post) == (1500.0, 4000.0)
    assert (r.control_pre, r.control_post) == (1500.0, 2100.0)
    assert r.did_cents == 1900.0
    assert r.tstat == 3.726207


def test_asof_device_state_hand_computed(spark, tmp_path):
    """User 1: states at t=10 (value 2.00) and t=100 (value 5.00);
    errors at t=5 (before any state -> sentinel), t=10 (same instant ->
    <= matches the t=10 state), t=50 (latest prior is t=10), t=200
    (latest prior is t=100).  User 2 has errors but never a state."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        join_asof_device_state,
    )

    rows = [
        (1, 10, 1, "signup", 2.0, "{}"),
        (2, 100, 1, "purchase", 5.0, "{}"),
        (10, 5, 1, "error", 0.0, "{}"),
        (11, 10, 1, "error", 0.0, "{}"),
        (12, 50, 1, "error", 0.0, "{}"),
        (13, 200, 1, "error", 0.0, "{}"),
        (20, 30, 2, "error", 0.0, "{}"),
    ]
    sf = write_events6(spark, tmp_path, rows)
    got = {
        r["event_id"]: (r["state_ts_us"], r["state_value_cents"], r["staleness_us"])
        for r in join_asof_device_state(spark, sf).collect()
    }
    from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import (
        load_table,
    )

    us = 1_000_000
    base = (
        load_table(spark, sf, "events")
        .filter(F.col("event_id") == 1)
        .select("ts_us")
        .head()[0]
        - 10 * us
    )
    assert got[10] == (-1, -1, -1)
    assert got[11] == (base + 10 * us, 200, 0)
    assert got[12] == (base + 10 * us, 200, 40 * us)
    assert got[13] == (base + 100 * us, 500, 100 * us)
    assert got[20] == (-1, -1, -1)


def test_asof_nearest_state_hand_computed(spark, tmp_path):
    """States at t=10 and t=100; errors at t=5 (forward to 10), t=54
    (44 back vs 46 fwd -> backward), t=55 (45 == 45 tie -> backward),
    t=56 (forward), t=200 (backward); a stateless user -> 'none'."""
    from spark_nifi_kafka_connected_device_stream_spark.operators.analytics import (
        join_asof_nearest_state,
    )

    rows = [
        (1, 10, 1, "signup", 2.0, "{}"),
        (2, 100, 1, "purchase", 5.0, "{}"),
        (10, 5, 1, "error", 0.0, "{}"),
        (11, 54, 1, "error", 0.0, "{}"),
        (12, 55, 1, "error", 0.0, "{}"),
        (13, 56, 1, "error", 0.0, "{}"),
        (14, 200, 1, "error", 0.0, "{}"),
        (20, 30, 2, "error", 0.0, "{}"),
    ]
    sf = write_events6(spark, tmp_path, rows)
    got = {
        r["event_id"]: (r["direction"], r["state_ts_us"], r["gap_us"])
        for r in join_asof_nearest_state(spark, sf).collect()
    }
    from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import (
        load_table,
    )

    us = 1_000_000
    base = (
        load_table(spark, sf, "events")
        .filter(F.col("event_id") == 1)
        .select("ts_us")
        .head()[0]
        - 10 * us
    )
    t10, t100 = base + 10 * us, base + 100 * us
    assert got[10] == ("forward", t10, 5 * us)
    assert got[11] == ("backward", t10, 44 * us)
    assert got[12] == ("backward", t10, 45 * us)
    assert got[13] == ("forward", t100, 44 * us)
    assert got[14] == ("backward", t100, 100 * us)
    assert got[20] == ("none", -1, -1)
