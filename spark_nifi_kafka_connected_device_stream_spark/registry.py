"""Query registry — the single source of truth exported by
`__spark_entry__.py`.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a `(spark, sf_dir) -> DataFrame` callable plus (when the
semantics are ANSI-SQL-expressible) a DuckDB oracle string over the
same parquet tables.  The driver's correctness gate compares the two
(row count + schema + order-insensitive value hash), so:

- every computed column is aliased IDENTICALLY in both,
- float aggregates are rounded in both (summation order differs between
  engines; the rounded value is the contract),
- timestamps are emitted as formatted strings (engine-neutral),
- any LIMIT has a total-order tie-break so the result SET is unique.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# operator modules that self-register on import.
#
# ORDER MATTERS: the driver's per-round correctness gate checks only the
# FIRST 50 registry entries.  Since round 3 the fine-grained _PROMOTE
# list below (not module order) decides which 50 land in the window —
# each round's rotation is pinned by the previous round's verdict so
# every query's driver stamp stays fresh and the never-driver-checked
# backlog stays zero.  Module order still fixes the BASE ordering that
# everything not promoted/demoted keeps.
_OPERATOR_MODULES = (
    "spark_nifi_kafka_connected_device_stream_spark.operators.windows",
    "spark_nifi_kafka_connected_device_stream_spark.operators.text",
    "spark_nifi_kafka_connected_device_stream_spark.operators.similarity",
    "spark_nifi_kafka_connected_device_stream_spark.operators.pipeline_ops",
    "spark_nifi_kafka_connected_device_stream_spark.operators.dedup",
    "spark_nifi_kafka_connected_device_stream_spark.operators.events",
    "spark_nifi_kafka_connected_device_stream_spark.operators.multimodal",
    "spark_nifi_kafka_connected_device_stream_spark.operators.privacy",
    "spark_nifi_kafka_connected_device_stream_spark.operators.curation",
    # udf_ops after curation: both its queries have green r2 driver rows,
    # while curation is all round-3 additions that need first rows — this
    # ordering puts the full curation tier inside the 50-entry window
    # (pandas_udf_charge still lands at 49 for a re-check).
    "spark_nifi_kafka_connected_device_stream_spark.operators.udf_ops",
    "spark_nifi_kafka_connected_device_stream_spark.operators.cohorts",
    "spark_nifi_kafka_connected_device_stream_spark.operators.analytics",
    "spark_nifi_kafka_connected_device_stream_spark.operators.relational",
    "spark_nifi_kafka_connected_device_stream_spark.operators.scd",
    "spark_nifi_kafka_connected_device_stream_spark.sources.pydatasource",
)


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


_REGISTRY: dict[str, QuerySpec] = {}
_LOADED = False


def register(
    name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register a query under `name` with an optional DuckDB
    oracle. Used by every operator module."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""), tags=tags)
        return fn

    return deco


# Fine-grained window control on top of module order: names in _PROMOTE
# are moved to the FRONT of the registry (in this order), names in
# _DEMOTE to the BACK — everything else keeps registration order.  This
# lets a round put specific never-driver-checked queries inside the
# driver's 50-entry correctness window without reshuffling whole
# modules.  Round 13 executes the rotation pinned at end of round 12
# (VERDICT r12 item 1), which is fully determined with zero slack: the
# first 14 slots are ALL of round 12's DEFERRED queue (keeping the
# never-driver-checked backlog at ZERO), and the remaining 36 are the
# ENTIRE residual cohort whose freshest green row is round 7 (computed
# fresh from CORRECTNESS_r01..r12 — after this window no query's
# freshest stamp is older than round 8).
_PROMOTE: tuple[str, ...] = (
    # ex-DEFERRED: round-12 additions never driver-checked (14)
    "customer_asof_balance_join",
    "scd2_interval_integrity_audit",
    "scd2_compact_versions",
    "privacy_dp_histogram",
    "privacy_k_anonymity_generalization",
    "events_dau_wau_stickiness",
    "events_rolling_retention",
    "events_new_vs_returning_daily",
    "mapinarrow_value_cents_sum",
    "cogrouped_applyinpandas_spend",
    "events_last_touch_attribution",
    "privacy_dp_mean_release",
    "orders_bitemporal_correction_report",
    "dedup_short_doc_coverage",
    # stale re-checks: the full remaining r7 cohort (36)
    "q14_promo_revenue_ratio",
    "q15_top_supplier_revenue",
    "q16_supplier_part_counts",
    "q17_small_quantity_avg_subquery",
    "q18_large_volume_customers",
    "q19_disjunctive_predicates",
    "q1_pricing_summary",
    "q20_concentrated_suppliers",
    "q21_late_shipments_by_supplier",
    "q22_idle_rich_customers",
    "q2_min_cost_supplier",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_delta",
    "q9_product_type_profit",
    "scalar_date_arith",
    "scalar_date_funcs",
    "scalar_math_case",
    "scalar_null_handling",
    "scalar_string_distance",
    "scalar_string_funcs",
    "scan_filter_project",
    "set_except",
    "set_intersect",
    "set_union",
    "sort_topk_global",
    "source_ngram_overlap",
    "text_shingle_novelty",
    "text_token_freq_spectrum",
    "text_token_heavy_hitters",
    "unpivot_status_counts",
    "window_lag_delta",
    "window_moving_avg_range",
    "window_rank_dense_ntile",
    "window_running_sum",
    "window_share_of_total",
)
_DEMOTE: tuple[str, ...] = ()

# Queries registered AFTER this round's 50-entry driver window filled.
# Round 13's window is FULLY consumed by the pinned rotation (14
# ex-DEFERRED + 36 r7-stale re-checks — VERDICT r12 items 1-2), so
# this queue restarts empty and collects ONLY round-13 additions —
# capped at 14 so round 14's window keeps 36 slots for stale
# re-checks.  Every name here must be oracle-parity-green locally on
# every pytest run; tests/test_oracle_parity.py asserts that any
# never-driver-checked query is either inside the window or on this
# explicit queue — a silent backlog stays impossible.
# Round-14 rotation, pre-computed (zero slack, same construction as
# r13): _PROMOTE = these 12 DEFERRED names + the alphabetically-first
# 38 of the 50-query cohort whose freshest green row is round 8
# (compute fresh from CORRECTNESS_r01..r13 — as of r13 end that cohort
# starts agg_approx_distinct_bound, array_collect_ops,
# cluster_topic_terms, ... and the remaining 12 rotate in round 15).
DEFERRED: tuple[str, ...] = (
    # round-13 additions, first wave (7 of the 14-slot cap)
    "window_range_interval_trailing_30d",
    "window_range_interval_centered_week",
    "window_range_peers_running_sum",
    "scd2_cdc_apply_log",
    "applyinarrow_type_stats",
    "udtf_table_gap_report",
    "events_sliding_window_counts",
    # round-13 additions, second wave (12 of 14)
    "window_range_interval_leakage_safe",
    "pandas_udf_iter_charge",
    "scd2_type1_type2_divergence",
    "privacy_dp_quantile_release",
    "orders_repeat_purchase_latency",
)


def _load() -> None:
    global _LOADED
    if not _LOADED:
        for mod in _OPERATOR_MODULES:
            importlib.import_module(mod)
        _LOADED = True


def all_specs() -> dict[str, QuerySpec]:
    _load()
    ordered: dict[str, QuerySpec] = {}
    for name in _PROMOTE:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    for name, spec in _REGISTRY.items():
        if name not in ordered and name not in _DEMOTE:
            ordered[name] = spec
    for name in _DEMOTE:
        if name in _REGISTRY:
            ordered[name] = _REGISTRY[name]
    return ordered


def _worker_safe(fn: QueryFn) -> QueryFn:
    """Exported query callables ship the package to Python workers on
    first use: the driver harness imports `__spark_entry__` by absolute
    path from an arbitrary cwd, so nothing guarantees the workers can
    re-import this package when unpickling a pandas UDF / mapInPandas
    function — addPyFile (session.ensure_workers_importable) does."""
    import functools

    from .session import ensure_workers_importable

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        ensure_workers_importable(spark)
        return fn(spark, sf_dir)

    return wrapped


def queries() -> dict[str, QueryFn]:
    return {name: _worker_safe(spec.fn) for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
