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
    "spark_nifi_kafka_connected_device_stream_spark.operators.curation",
    # udf_ops after curation: both its queries have green r2 driver rows,
    # while curation is all round-3 additions that need first rows — this
    # ordering puts the full curation tier inside the 50-entry window
    # (pandas_udf_charge still lands at 49 for a re-check).
    "spark_nifi_kafka_connected_device_stream_spark.operators.udf_ops",
    "spark_nifi_kafka_connected_device_stream_spark.operators.cohorts",
    "spark_nifi_kafka_connected_device_stream_spark.operators.analytics",
    "spark_nifi_kafka_connected_device_stream_spark.operators.relational",
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
# modules.  Round 7 (VERDICT r6 top-next): 47 queries' freshest
# driver-green rows predate the round-5 fixture regeneration — the
# local sf0.001 parity suite re-validates them every pytest run, but
# driver re-verification against the CURRENT fixtures is the contract.
# This promote list is exactly 50 names = the whole driver window:
# the 11 round-7 additions (first driver rows) + the 33 queries whose
# only green row is r1 + 6 of the 13 r2-green ones.  Still queued for
# round 8: histogram_price_bins / q13_customer_order_distribution /
# stats_percentiles / stats_moments / array_collect_ops /
# grouping_sets_explicit / q4_order_priority_exists (r2) and the r3
# cohort
# (q7_volume_shipping, q8_market_share, text_language_id,
# text_quality_score, text_token_positions,
# text_winnowing_fingerprints).
_PROMOTE: tuple[str, ...] = (
    # round-7 additions — never driver-checked
    "q2_min_cost_supplier",
    "q9_product_type_profit",
    "q11_important_part_values",
    "q16_supplier_part_counts",
    "q20_concentrated_suppliers",
    "text_token_freq_spectrum",
    "text_shingle_novelty",
    "embedding_label_centroids",
    "dataset_split_assign",
    "source_ngram_overlap",
    "text_token_heavy_hitters",
    # last green row = r1 (pre-regen fixtures)
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "q6_revenue_delta",
    "q10_returned_items",
    "q19_disjunctive_predicates",
    "q21_late_shipments_by_supplier",
    "q22_idle_rich_customers",
    "scan_filter_project",
    "agg_cube",
    "agg_distinct_exact",
    "agg_pivot_status",
    "agg_rollup",
    "join_anti",
    "join_broadcast_dim",
    "join_outer_null_fill",
    "join_semi",
    "scalar_date_arith",
    "scalar_date_funcs",
    "scalar_math_case",
    "scalar_null_handling",
    "scalar_string_distance",
    "scalar_string_funcs",
    "set_except",
    "set_intersect",
    "set_union",
    "sort_topk_global",
    "unpivot_status_counts",
    "window_lag_delta",
    "window_moving_avg_range",
    "window_rank_dense_ntile",
    "window_running_sum",
    "window_share_of_total",
    # last green row = r2
    "customer_rfm_segments",
    "q12_shipmode_case_agg",
    "q14_promo_revenue_ratio",
    "q15_top_supplier_revenue",
    "q17_small_quantity_avg_subquery",
    "q18_large_volume_customers",
)
# With the promote list filling the whole 50-entry window, demotion
# order is irrelevant this round.
_DEMOTE: tuple[str, ...] = ()


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


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in all_specs().items() if spec.oracle is not None}
