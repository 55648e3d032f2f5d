"""Regression: oracle parity must hold when the CONSUMER's SparkSession
uses a non-UTC timezone (the driver's session config is not ours to
set).  Caught live: `from_utc_timestamp` vs `to_utc_timestamp` in
catalog.load_table double-shifted events.ts under Asia/Kolkata.

Runs the timestamp-sensitive queries in a dedicated +05:30 session and
compares with DuckDB exactly like test_oracle_parity.
"""

from __future__ import annotations

import pytest

from spark_nifi_kafka_connected_device_stream_spark import registry

from .conftest import SF_SMALL
from .test_oracle_parity import _rowset

TZ_SENSITIVE = [
    "product_view_counts",
    "events_hourly_stats",
    "events_sessionize",
    "scalar_date_funcs",
    # absolute-micros outputs: must come from ts_us, not unix_micros
    # (the catalog's wall-time shift moves instants with session tz)
    "asof_join_last_click",
    "funnel_view_click_purchase",
    "events_gapfill_hourly",
    # round-7 shapes with year() extraction over timestamp columns —
    # calendar fields must come from the stored wall time, not shift
    # with the consumer session tz
    "q9_product_type_profit",
    "q20_concentrated_suppliers",
    # round-8: session_window over timestamp_micros(ts_us) + integer
    # bounds, hourly z-scores, per-user sequences, k-anonymity hours
    "events_session_window_native",
    "events_rate_anomaly",
    "events_markov_transitions",
    "privacy_k_anonymity_report",
    # round-8 fourth wave+: day/hour bucketing and second-granularity
    # timestamp strings — every one emits formatted wall time and must
    # not shift with the consumer session tz
    "events_seasonal_hourly_anomaly",
    "events_conversion_latency",
    "events_time_weighted_value",
    "events_device_uptime",
    "events_linear_attribution",
    "events_chi2_mix_drift_daily",
    "events_holt_forecast_hourly",
    "events_rolling_distinct_users_7d",
    "events_cusum_level_shift",
    "events_dau_mau_stickiness",
    "orders_open_backlog_daily",
    # round-9: hour-index buckets from ts_us (acf), session sweep-line
    # micros (peak), 5s burst micros (debounce), year/month calendar
    # fields over order wall time (ltv), sessionized entry paths
    "events_hourly_acf",
    "events_peak_concurrency",
    "events_debounce_stats",
    "orders_cohort_ltv_curve",
    "events_session_paths",
    # round-9 late: epoch-hour buckets from ts_us (theil-sen trend,
    # naive/seasonal-naive backtest)
    "events_theil_sen_trend",
    "events_forecast_backtest",
    # round-9 late: isodow calendar field over stored wall time
    "events_mann_whitney_value",
    "events_kruskal_wallis_dow",
    # round-9 late: hour-of-day calendar field over stored wall time
    "events_spearman_hour_value",
    # round-9 late: ntz wall-time min/max rendered as strings
    "orders_column_profile",
    # round-9 late: year/month calendar fields over ntz wall time
    "orders_monthly_seasonality",
    "lineitem_returns_pchart",
    # round-9 late: 1995-quarter calendar fields over ntz wall time
    "customers_all_quarters_1995",
    # round-9 late: epoch-day buckets from ts_us session starts
    "events_bounce_rate_daily",
    # round-9 late: epoch-day buckets from ts_us daily counts
    "events_fano_dispersion",
    # round-9 late: epoch-hour rank walk from ts_us
    "events_pettitt_changepoint",
    # round-10: isodow/hour calendar fields over stored wall time
    "privacy_t_closeness_report",
    # round-10: epoch-hour buckets from ts_us (cross-correlation),
    # ts_us sequence ordering (transition entropy)
    "events_xcorr_view_purchase",
    "events_transition_entropy",
    # round-10: year/datediff calendar fields over ntz order wall time
    "orders_customer_migration_matrix",
    "orders_duplicate_payment_screen",
    "lineitem_transit_overlap_by_part",
]


# Asia/Kolkata: fixed odd offset (+05:30, catches instant-vs-wall
# confusion); America/New_York: DST zone (catches per-timestamp-offset
# divergence in gap/window arithmetic — the session_window class)
@pytest.fixture(scope="module", params=["Asia/Kolkata", "America/New_York"])
def spark_tz(request, spark):
    # reuse the shared JVM; session timezone is a runtime conf
    prev = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", request.param)
    yield spark
    spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("name", TZ_SENSITIVE)
def test_parity_under_non_utc_session(spark_tz, duck, name):
    spec = registry.all_specs()[name]
    sdf = spec.fn(spark_tz, SF_SMALL)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(spec.oracle)
    drows = rel.fetchall()
    assert len(srows) == len(drows)
    assert _rowset(srows, sdf.columns) == _rowset(drows, rel.columns), (
        f"{name}: mismatch under non-UTC session timezone"
    )
