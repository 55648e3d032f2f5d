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
# FIRST 50 registry entries.  Round 1 verified relational/analytics/
# windows (its first 50); round 2 led with events + the LLM-pipeline
# extension surface.  Round 3 leads with windows (its last two queries,
# lateral_top_order_per_customer / window_first_last, sat at indices
# 59-60 and were never inside any round's window), then text (re-check
# of the fixed text_token_stats oracle), then the modules that gained
# new round-3 queries (similarity / pipeline_ops), then the rest of the
# extension surface for continuity.
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
# modules.  Round 8 (VERDICT r7 top-next): this closes the driver
# re-verification sweep started in round 7 — after this round every
# registered query has a driver-green row on the CURRENT (post-round-5)
# fixtures.  The list = the last 13 queries whose freshest green row is
# r2/r3 (pre-regen) plus every round-8 addition needing a first driver
# row: the two sketch accuracy-bound queries (replacing the registry's
# only `err: no_oracle` rows), the multimodal corruption scan /
# modality routing / payload chunker, the skew-demonstration pair, the
# BPE pair counter, kNN-graph stats, the incident-window range join,
# the SemDeDup keep-list, the logistic quality classifier, the privacy
# tier, mix planning, rate-drift monitoring, the co-moment correlation
# and OLS aggregates, ABC/Pareto tiering, basket pairs, the native
# session-window parity query, the expectations audit, and the Markov
# transition matrix.  The remaining ~14 window slots fall to module
# order (windows/text/... — all r5+-green), a free same-fixture
# re-check.
_PROMOTE: tuple[str, ...] = (
    # last green row = r2 (pre-regen fixtures)
    "histogram_price_bins",
    "q13_customer_order_distribution",
    "stats_percentiles",
    "stats_moments",
    "array_collect_ops",
    "grouping_sets_explicit",
    "q4_order_priority_exists",
    # last green row = r3 (pre-regen fixtures)
    "q7_volume_shipping",
    "q8_market_share",
    "text_language_id",
    "text_quality_score",
    "text_token_positions",
    "text_winnowing_fingerprints",
    # round-8 additions — never driver-checked
    "agg_approx_distinct_bound",
    "stats_percentiles_approx_bound",
    "multimodal_byte_stats",
    "skew_hot_key_plain",
    "skew_hot_key_salted",
    "text_bpe_pair_counts",
    "embedding_knn_graph_stats",
    "multimodal_modality_routing",
    "events_incident_window_attribution",
    # round-8 second wave — never driver-checked (SemDeDup keep-list,
    # logistic quality classifier, the privacy tier, mix planning)
    "semantic_dedup_keep_list",
    "text_quality_classifier",
    "privacy_pseudonymize_events",
    "privacy_k_anonymity_report",
    "dataset_token_budget_plan",
    "multimodal_chunk_payloads",
    "events_rate_anomaly",
    "stats_correlation_by_group",
    "lineitem_abc_pareto",
    "orders_basket_pairs",
    "events_session_window_native",
    "dataset_quality_expectations",
    "events_markov_transitions",
    "stats_linear_regression",
    "cluster_topic_terms",
    # round-8 third wave — never driver-checked (VARIANT shredding,
    # sequential EWMA, document PII gate, grouped-agg pandas UDF)
    "events_variant_props",
    "events_ewma_hourly",
    "privacy_pii_scan_documents",
    "grouped_agg_weighted_median",
    "events_rolling_distinct_users_7d",
    # round-8 fourth wave — never driver-checked (SCD2 merge, snapshot
    # reconciliation, kNN PageRank, multimodal dedup/caption audit,
    # Z-order layout, priority sampling, seasonal anomaly).  This list
    # is now 51 long: the last entry falls OUTSIDE the driver's
    # 50-entry window and rides to the next round's rotation.
    "scd2_customer_batch",
    "orders_snapshot_diff",
    "embedding_pagerank_centrality",
    "multimodal_payload_dedup",
    "multimodal_caption_audit",
    "lineitem_zorder_layout",
    "dataset_weighted_sample",
    "events_seasonal_hourly_anomaly",
    "events_conversion_latency",
)
_DEMOTE: tuple[str, ...] = ()

# Queries registered AFTER this round's 50-entry driver window filled
# (the window must carry the 13 stale re-verification rows — the r7
# verdict's top ask — plus the round-8 waves 1-4, which together take
# all 50 slots).  Every name here is oracle-parity-green locally every
# pytest run; they are FIRST in line for the next round's _PROMOTE
# rotation, and tests/test_oracle_parity.py asserts that any
# never-driver-checked query is either inside the window or on this
# explicit queue — a silent backlog stays impossible.
DEFERRED: tuple[str, ...] = (
    "events_conversion_latency",
    "events_time_weighted_value",
    "events_device_uptime",
    "events_linear_attribution",
    "events_hll_partial_merge_bound",
    "device_registry_models",
    "orders_pointintime_segment",
    "text_sentences_udtf",
    "events_holt_forecast_hourly",
    "documents_ks_drift_by_source",
    "events_chi2_mix_drift_daily",
    "events_cusum_level_shift",
    "supplier_hhi_concentration",
    "events_abtest_purchase_rate",
    "events_survival_kaplan_meier",
    "multimodal_payload_stats_arrow",
    "orders_open_backlog_daily",
    "text_langid_confusion",
    "events_dau_mau_stickiness",
    "embedding_knn_triangles",
    "orders_benford_screen",
    "document_embedding_coverage",
    "part_bom_explosion",
    "events_session_paths",
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
