"""A/B harness for SESSION-CONF experiments (optimization round 17).

Times a sample of registered queries under the current session factory
vs. a candidate extra-conf dict, each in its OWN fresh SparkSession
(sequentially — same box, same warmup protocol as bench.py), min-of-N.
Used to validate global conf changes (AQE coalescing targets, join
strategy prefs) before they land in session.py.

    python tools/conf_ab.py --runs 3 --out artifacts/conf_ab_X.json \
        --conf spark.sql.adaptive.coalescePartitions.parallelismFirst=false \
        -- q1_pricing_summary events_sessionize ...

With no query names: a pinned 24-query sample spanning the overhead-
dominated majority and the heavy tail.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT_SAMPLE = [
    # overhead-dominated fast queries (median ~0.2-0.5 s)
    "q1_pricing_summary",
    "q18_large_volume_orders",
    "events_sessionize",
    "events_hourly_stats",
    "product_view_counts",
    "scan_filter_project",
    "sort_topk_global",
    "grouping_sets_explicit",
    "window_share_of_total",
    "text_quality_classifier",
    "dataset_split_assign",
    "events_gapfill_hourly",
    # mid-tier
    "orders_column_profile",
    "curation_funnel_report",
    "documents_perplexity_buckets",
    "orders_basket_pairs",
    "dedup_minhash_lsh",
    "text_token_heavy_hitters",
    # heavy tail
    "embedding_near_dup_bucketed",
    "cogrouped_applyinpandas_spend",
    "similarity_topk_ivfpq",
    "embedding_pagerank_centrality",
    "dedup_clusters",
    "scd2_customer_batch",
]


def run_side(tag: str, extra: dict[str, str], names: list[str], sf: str, runs: int):
    from spark_nifi_kafka_connected_device_stream_spark.registry import all_specs
    from spark_nifi_kafka_connected_device_stream_spark.session import get_session
    from spark_nifi_kafka_connected_device_stream_spark.sources.catalog import (
        TABLES,
        load_table,
    )

    spark = get_session(app_name=f"conf_ab_{tag}", extra_conf=extra or None)
    spark.range(1000).count()
    for t in TABLES:
        load_table(spark, sf, t).count()
    specs = all_specs()
    out: dict[str, list[float]] = {}
    for name in names:
        fn = specs[name].fn
        samples = []
        for _ in range(runs):
            t0 = time.perf_counter()
            fn(spark, sf).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
        out[name] = samples
        print(f"  [{tag}] {name}: min {min(samples):.3f}s  {samples}", file=sys.stderr)
    spark.stop()
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", required=True)
    ap.add_argument("--conf", action="append", default=[], help="k=v, repeatable")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    names = args.queries or DEFAULT_SAMPLE
    extra = dict(kv.split("=", 1) for kv in args.conf)

    # candidate FIRST, then baseline: if the box degrades mid-experiment
    # it biases AGAINST the candidate, not for it
    b = run_side("cand", extra, names, args.sf, args.runs)
    a = run_side("base", {}, names, args.sf, args.runs)

    rows = {}
    ta = tb = 0.0
    for n in names:
        ma, mb = min(a[n]), min(b[n])
        ta += ma
        tb += mb
        rows[n] = {"base": ma, "cand": mb, "speedup": round(ma / mb, 3) if mb else None}
    result = {
        "conf": extra,
        "sf": args.sf,
        "runs": args.runs,
        "total_base": round(ta, 3),
        "total_cand": round(tb, 3),
        "total_speedup": round(ta / tb, 3) if tb else None,
        "queries": rows,
        "raw": {"base": a, "cand": b},
    }
    with open(args.out, "w") as f:
        json.dump(result, f, indent=1, sort_keys=True)
    print(json.dumps({k: result[k] for k in ("total_base", "total_cand", "total_speedup")}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
