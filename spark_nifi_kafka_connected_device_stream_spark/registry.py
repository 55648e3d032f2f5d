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
    # the r14 split of the 4.2k-LoC events module (VERDICT r13 item 5):
    # pure move into the tier files its registry tags already implied
    "spark_nifi_kafka_connected_device_stream_spark.operators.events_sessions",
    "spark_nifi_kafka_connected_device_stream_spark.operators.events_timeseries",
    "spark_nifi_kafka_connected_device_stream_spark.operators.events_engagement",
    "spark_nifi_kafka_connected_device_stream_spark.operators.events_sketches",
    "spark_nifi_kafka_connected_device_stream_spark.operators.multimodal",
    "spark_nifi_kafka_connected_device_stream_spark.operators.privacy",
    "spark_nifi_kafka_connected_device_stream_spark.operators.curation",
    # the r15 split of the 2.4k-LoC curation module (VERDICT r14 item
    # 6): pure move of the LM/perplexity tier into its own file
    "spark_nifi_kafka_connected_device_stream_spark.operators.curation_lm",
    # udf_ops after curation: both its queries have green r2 driver rows,
    # while curation is all round-3 additions that need first rows — this
    # ordering puts the full curation tier inside the 50-entry window
    # (pandas_udf_charge still lands at 49 for a re-check).
    "spark_nifi_kafka_connected_device_stream_spark.operators.udf_ops",
    "spark_nifi_kafka_connected_device_stream_spark.operators.cohorts",
    "spark_nifi_kafka_connected_device_stream_spark.operators.analytics",
    # the r14 split of the 3.9k-LoC analytics module (same treatment as
    # events — VERDICT r13 item 5's no-file->2.5k-LoC criterion):
    # pure move into the tier files its registry tags already implied
    "spark_nifi_kafka_connected_device_stream_spark.operators.analytics_stats",
    "spark_nifi_kafka_connected_device_stream_spark.operators.analytics_abtest",
    "spark_nifi_kafka_connected_device_stream_spark.operators.analytics_orders",
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
# modules.  Round 15 executes the rotation pinned at end of round 14
# (VERDICT r14 item 1), fully determined with zero slack: the first 11
# slots are ALL of round 14's DEFERRED queue (never-driver-checked
# backlog → ZERO), the next 12 are the residual of the cohort whose
# freshest green row is round 8 (after this round no stamp is older
# than round 9), and the remaining 27 are the alphabetically-first 27
# of the 50-query r9 cohort (computed fresh from CORRECTNESS_r01..r14).
_PROMOTE: tuple[str, ...] = (
    # ex-DEFERRED: round-14 additions never driver-checked (11)
    "window_groups_frames",
    "udtf_arrow_installments",
    "scd2_cdc_incremental_merge",
    "privacy_dp_topk_release",
    "orders_cohort_retention_triangle",
    "device_registry_firmware_lag",
    "multimodal_shard_pack_plan",
    "events_did_estimator",
    "join_null_safe_eq",
    "orders_status_streaks",
    "lineitem_linenumber_gap_audit",
    # stale re-checks: the residual 12 of the r8 cohort (retires r8)
    "skew_hot_key_salted",
    "stats_correlation_by_group",
    "stats_linear_regression",
    "stats_moments",
    "stats_percentiles",
    "stats_percentiles_approx_bound",
    "text_bpe_pair_counts",
    "text_language_id",
    "text_quality_classifier",
    "text_quality_score",
    "text_token_positions",
    "text_winnowing_fingerprints",
    # stale re-checks: alphabetically-first 27 of the r9 cohort
    "applyinpandas_zscore",
    "asof_join_last_click",
    "benchmark_contamination",
    "curation_funnel_report",
    "dataset_mix_sample",
    "dedup_cluster_stats",
    "dedup_clusters",
    "dedup_containment",
    "dedup_exact",
    "dedup_incremental_exact",
    "dedup_minhash_lsh",
    "dedup_minhash_signatures",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "device_registry_models",
    "document_embedding_coverage",
    "documents_ks_drift_by_source",
    "documents_quality_deciles",
    "embedding_dim_stats",
    "embedding_kmeans_assign",
    "embedding_knn_triangles",
    "embedding_near_dup_bucketed",
    "events_abtest_purchase_rate",
    "events_chi2_mix_drift_daily",
    "events_conversion_latency",
    "events_cusum_level_shift",
    "events_dau_mau_stickiness",
)
_DEMOTE: tuple[str, ...] = ()

# Queries registered AFTER this round's 50-entry driver window filled.
# Round 15's window is FULLY consumed by the pinned rotation (11
# ex-DEFERRED + 12 r8-residual + 27 r9-stale re-checks — VERDICT r14
# item 1), so this queue restarts empty and collects ONLY round-15
# additions — capped at 12 so round 16's window keeps 38 slots for
# stale re-checks.  Every name here must be oracle-parity-green
# locally on every pytest run; tests/test_oracle_parity.py asserts
# that any never-driver-checked query is either inside the window or
# on this explicit queue — a silent backlog stays impossible.
# Round-16 rotation, pre-computed (same construction): _PROMOTE =
# this DEFERRED queue + the residual 23 of the r9 cohort
# (events_device_uptime .. text_vocab_coverage, alphabetical) +
# enough of the alphabetically-first r10 cohort to fill 50 (compute
# fresh from CORRECTNESS_r01..r15).
DEFERRED: tuple[str, ...] = (
    # round-15 additions (VERDICT r14 items 4/5 + widening)
    "join_asof_device_state",
    "join_asof_nearest_state",
    "documents_dsir_weights",
    "embedding_product_quantization",
    "events_watermark_lateness_audit",
    "dedup_incremental_minhash_assign",
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
