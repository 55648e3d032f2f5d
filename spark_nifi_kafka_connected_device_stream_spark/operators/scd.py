"""Slowly-changing-dimension type 2 merge, without a lakehouse MERGE.

The guide's emulation recipe (anti-join + union + window) made
concrete: given the current SCD2 table (open rows have
`valid_to IS NULL`) and a batch of updates, produce the next SCD2
state — changed keys get their open row closed at the update's
effective timestamp and a new open row appended; unchanged keys pass
through untouched; brand-new keys open their first row.

Plan shape: one shuffle on the business key (dedupe-updates window +
full-outer join share the partitioning), then unions — no driver-side
loops, scales with the dimension.  With Delta/Iceberg present
(sources/warehouse.py docstring) the same logic is a single MERGE INTO.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ..sources.catalog import load_table


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key: str,
    attrs: Sequence[str],
    effective_col: str = "effective_ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Return the next SCD2 state.

    `current`: key, *attrs, valid_from, valid_to (null = open row)
    `updates`: key, *attrs, effective_col (latest per key wins)
    """
    closed = current.filter(F.col(valid_to).isNotNull())
    open_rows = current.filter(F.col(valid_to).isNull())

    w = Window.partitionBy(key).orderBy(F.desc(effective_col))
    latest = (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    o = open_rows.alias("o")
    u = latest.alias("u")
    joined = o.join(u, F.col(f"o.{key}") == F.col(f"u.{key}"), "full_outer")

    # null-safe per-attribute comparison (a concat-based compare would
    # collide across attribute boundaries and on NULL vs empty string)
    any_attr_diff = None
    for a in attrs:
        diff = ~F.col(f"o.{a}").eqNullSafe(F.col(f"u.{a}"))
        any_attr_diff = diff if any_attr_diff is None else (any_attr_diff | diff)
    changed = F.col(f"u.{key}").isNotNull() & F.col(f"o.{key}").isNotNull() & any_attr_diff

    # open rows with no (effective) change: keep
    unchanged = joined.filter(
        F.col(f"o.{key}").isNotNull() & (F.col(f"u.{key}").isNull() | ~changed)
    ).select([F.col(f"o.{c}").alias(c) for c in open_rows.columns])

    # changed keys: close the old open row at the update's effective ts
    closed_now = joined.filter(changed).select(
        *[F.col(f"o.{c}").alias(c) for c in open_rows.columns if c != valid_to],
        F.col(f"u.{effective_col}").alias(valid_to),
    ).select([F.col(c) for c in open_rows.columns])

    # changed or brand-new keys: append a fresh open row
    fresh = joined.filter(
        changed | (F.col(f"o.{key}").isNull() & F.col(f"u.{key}").isNotNull())
    ).select(
        F.col(f"u.{key}").alias(key),
        *[F.col(f"u.{a}").alias(a) for a in attrs],
        F.col(f"u.{effective_col}").alias(valid_from),
        F.lit(None).cast(open_rows.schema[valid_to].dataType).alias(valid_to),
    ).select([F.col(c) for c in open_rows.columns])

    return closed.unionByName(unchanged).unionByName(closed_now).unionByName(fresh)


# ---------------------------------------------------------------------------
# registered change-data queries: SCD2 merge + snapshot reconciliation
# ---------------------------------------------------------------------------
#
# Both derive their "before/after" inputs DETERMINISTICALLY from the
# fixture tables (modulo tests on the key), so the oracle can rebuild
# the identical inputs and the full merge/diff semantics are
# value-checked cross-engine — the same trick the dedup tier uses for
# its synthetic duplicates.

_CENTS = "CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)"


@register(
    "scd2_customer_batch",
    oracle=f"""
    WITH cur_open AS (
      SELECT c_custkey, c_mktsegment AS segment, {_CENTS} AS bal_cents,
             DATE '2023-01-01' AS valid_from, CAST(NULL AS DATE) AS valid_to
      FROM customer
    ), cur_closed AS (
      SELECT c_custkey, 'LEGACY' AS segment, {_CENTS} - 5000 AS bal_cents,
             DATE '2022-01-01' AS valid_from, DATE '2023-01-01' AS valid_to
      FROM customer WHERE c_custkey % 11 = 0
    ), upd AS (
      SELECT c_custkey, 'MOVED' AS segment, {_CENTS} + 777 AS bal_cents,
             DATE '2024-06-01' AS eff
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, c_mktsegment, {_CENTS}, DATE '2024-03-01'
      FROM customer WHERE c_custkey % 5 = 0
      UNION ALL
      SELECT c_custkey + 1000000, 'NEW', {_CENTS}, DATE '2024-06-01'
      FROM customer WHERE c_custkey % 13 = 0
    ), latest AS (
      SELECT c_custkey, segment, bal_cents, eff FROM (
        SELECT *, row_number() OVER (PARTITION BY c_custkey
                                     ORDER BY eff DESC) AS rn
        FROM upd
      ) WHERE rn = 1
    ), joined AS (
      SELECT o.c_custkey AS o_key, o.segment AS o_seg, o.bal_cents AS o_bal,
             o.valid_from AS o_vf,
             u.c_custkey AS u_key, u.segment AS u_seg, u.bal_cents AS u_bal,
             u.eff AS u_eff,
             (o.c_custkey IS NOT NULL AND u.c_custkey IS NOT NULL
              AND (o.segment IS DISTINCT FROM u.segment
                   OR o.bal_cents IS DISTINCT FROM u.bal_cents)) AS changed
      FROM cur_open o FULL OUTER JOIN latest u USING (c_custkey)
    ), next_state AS (
      SELECT c_custkey, segment, bal_cents, valid_from, valid_to
      FROM cur_closed
      UNION ALL
      SELECT o_key, o_seg, o_bal, o_vf, CAST(NULL AS DATE)
      FROM joined WHERE o_key IS NOT NULL AND (u_key IS NULL OR NOT changed)
      UNION ALL
      SELECT o_key, o_seg, o_bal, o_vf, u_eff
      FROM joined WHERE changed
      UNION ALL
      SELECT u_key, u_seg, u_bal, u_eff, CAST(NULL AS DATE)
      FROM joined WHERE changed OR (o_key IS NULL AND u_key IS NOT NULL)
    )
    SELECT CAST(c_custkey AS BIGINT)       AS c_custkey,
           segment, bal_cents,
           strftime(valid_from, '%Y-%m-%d') AS valid_from,
           strftime(valid_to, '%Y-%m-%d')   AS valid_to
    FROM next_state
    """,
    doc="The SCD2 merge (scd2_apply above) registered as a value-checked "
        "query: current state = one open row per customer (+ a closed "
        "LEGACY row for custkey%11), update batch = a changed row "
        "(custkey%7: new segment + balance), a no-op row (custkey%5: "
        "identical attrs — must NOT close anything), and brand-new keys "
        "(custkey%13, re-keyed +1e6); custkey%35 keys get BOTH update "
        "rows, pinning the latest-effective-wins dedupe window.  The "
        "oracle re-derives the same inputs and re-implements the merge "
        "independently in SQL — closed passthrough, unchanged-open, "
        "close-at-effective-ts, and fresh-open rows all value-checked.  "
        "Scale shape: ONE shuffle on the business key (the update-dedupe "
        "window and the full-outer join share it), then unions — the "
        "dimension is never driver-collected and with Delta/Iceberg "
        "jars the identical logic is a single MERGE INTO "
        "(sources/warehouse.py docstring).  Balances in exact integer cents.",
    tags=("scd", "change-data", "join"),
)
def scd2_customer_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    cur_open = c.select(
        "c_custkey",
        F.col("c_mktsegment").alias("segment"),
        cents.alias("bal_cents"),
        F.lit("2023-01-01").cast("date").alias("valid_from"),
        F.lit(None).cast("date").alias("valid_to"),
    )
    cur_closed = c.filter(F.col("c_custkey") % 11 == 0).select(
        "c_custkey",
        F.lit("LEGACY").alias("segment"),
        (cents - 5000).alias("bal_cents"),
        F.lit("2022-01-01").cast("date").alias("valid_from"),
        F.lit("2023-01-01").cast("date").alias("valid_to"),
    )
    current = cur_closed.unionByName(cur_open)
    updates = (
        c.filter(F.col("c_custkey") % 7 == 0)
        .select(
            "c_custkey",
            F.lit("MOVED").alias("segment"),
            (cents + 777).alias("bal_cents"),
            F.lit("2024-06-01").cast("date").alias("effective_ts"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 5 == 0).select(
                "c_custkey",
                F.col("c_mktsegment").alias("segment"),
                cents.alias("bal_cents"),
                F.lit("2024-03-01").cast("date").alias("effective_ts"),
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 13 == 0).select(
                (F.col("c_custkey") + 1000000).alias("c_custkey"),
                F.lit("NEW").alias("segment"),
                cents.alias("bal_cents"),
                F.lit("2024-06-01").cast("date").alias("effective_ts"),
            )
        )
    )
    nxt = scd2_apply(
        current, updates, key="c_custkey", attrs=["segment", "bal_cents"]
    )
    return nxt.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "segment",
        "bal_cents",
        F.date_format("valid_from", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to", "yyyy-MM-dd").alias("valid_to"),
    )


_OCENTS = "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)"


@register(
    "orders_snapshot_diff",
    oracle=f"""
    WITH v1 AS (
      SELECT o_orderkey, {_OCENTS} AS price_cents FROM orders
    ), v2 AS (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 97 = 0 THEN {_OCENTS} + 1000
                  ELSE {_OCENTS} END AS price_cents
      FROM orders WHERE o_orderkey % 101 <> 0
      UNION ALL
      SELECT o_orderkey + 10000000, {_OCENTS}
      FROM orders WHERE o_orderkey % 103 = 0
    )
    SELECT CASE WHEN v1.o_orderkey IS NULL THEN 'insert'
                WHEN v2.o_orderkey IS NULL THEN 'delete'
                ELSE 'update' END          AS change_type,
           CAST(coalesce(v1.o_orderkey, v2.o_orderkey) AS BIGINT)
                                            AS o_orderkey,
           v1.price_cents                   AS old_price_cents,
           v2.price_cents                   AS new_price_cents
    FROM v1 FULL OUTER JOIN v2 USING (o_orderkey)
    WHERE v1.o_orderkey IS NULL OR v2.o_orderkey IS NULL
       OR v1.price_cents <> v2.price_cents
    """,
    doc="Snapshot reconciliation (table diff): compare two versions of "
        "the orders table and emit ONLY the changed keys, classified "
        "insert/delete/update with before/after values — the CDC-"
        "backfill-audit / data-regression-test primitive every pipeline "
        "needs before promoting a rebuilt 100 TB table.  v2 is derived "
        "deterministically (key%101 deleted, key%97 repriced +10.00, "
        "key%103 re-keyed inserts) so the oracle rebuilds it exactly.  "
        "Scale shape: ONE co-partitioned full-outer sort-merge join on "
        "the primary key — each snapshot shuffled once on its PK; with "
        "both snapshots bucketed on the key (functions/scale.py "
        "write_bucketed) the exchange disappears entirely.  The WHERE "
        "prunes unchanged rows BEFORE anything downstream, so the "
        "output is |changes|, not |table|; prices compared in exact "
        "integer cents (no fp-equality trap).",
    tags=("scd", "change-data", "join"),
)
def orders_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    v1 = o.select("o_orderkey", cents.alias("price_cents"))
    v2 = (
        o.filter(F.col("o_orderkey") % 101 != 0)
        .select(
            "o_orderkey",
            F.when(F.col("o_orderkey") % 97 == 0, cents + 1000)
            .otherwise(cents)
            .alias("price_cents"),
        )
        .unionByName(
            o.filter(F.col("o_orderkey") % 103 == 0).select(
                (F.col("o_orderkey") + 10000000).alias("o_orderkey"),
                cents.alias("price_cents"),
            )
        )
    )
    a = v1.alias("a")
    b = v2.alias("b")
    j = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    return j.filter(
        F.col("a.o_orderkey").isNull()
        | F.col("b.o_orderkey").isNull()
        | (F.col("a.price_cents") != F.col("b.price_cents"))
    ).select(
        F.when(F.col("a.o_orderkey").isNull(), F.lit("insert"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("delete"))
        .otherwise(F.lit("update"))
        .alias("change_type"),
        F.coalesce(F.col("a.o_orderkey"), F.col("b.o_orderkey"))
        .cast("bigint")
        .alias("o_orderkey"),
        F.col("a.price_cents").alias("old_price_cents"),
        F.col("b.price_cents").alias("new_price_cents"),
    )


@register(
    "orders_pointintime_segment",
    oracle="""
    WITH dim AS (
      SELECT c_custkey, c_mktsegment AS segment,
             DATE '1995-01-01' AS valid_from,
             CASE WHEN c_custkey % 7 = 0 THEN DATE '1997-01-01' END AS valid_to
      FROM customer
      UNION ALL
      SELECT c_custkey, 'MOVED', DATE '1997-01-01', CAST(NULL AS DATE)
      FROM customer WHERE c_custkey % 7 = 0
    )
    SELECT d.segment,
           CAST(year(o.o_orderdate) AS INTEGER) AS o_year,
           CAST(count(*) AS BIGINT)             AS n_orders,
           CAST(sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT))
                AS BIGINT)                      AS revenue_cents
    FROM orders o
    JOIN dim d ON d.c_custkey = o.o_custkey
     AND o.o_orderdate >= d.valid_from
     AND (d.valid_to IS NULL OR o.o_orderdate < d.valid_to)
    GROUP BY d.segment, o_year
    """,
    doc="Point-in-time (temporal) join — HOW an SCD2 dimension is "
        "consumed: every order joins to the customer-segment row that "
        "was VALID ON the order date (custkey%7 customers switch to "
        "'MOVED' on 1997-01-01, so the same customer's 1996 and 1997 "
        "orders land in different segments — the as-was report a "
        "current-state join silently gets wrong).  The match is an "
        "equi-join on the business key with the validity-range "
        "predicate inside the join condition: per-key candidates = "
        "that key's version count (~1-2), so the non-equi part never "
        "multiplies — the standard warehouse shape at any scale, and "
        "with both sides bucketed on the key the exchange disappears.  "
        "Revenue in exact integer cents.",
    tags=("scd", "change-data", "join", "temporal"),
)
def orders_pointintime_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    dim = (
        c.select(
            "c_custkey",
            F.col("c_mktsegment").alias("segment"),
            F.lit("1995-01-01").cast("date").alias("valid_from"),
            F.when(
                F.col("c_custkey") % 7 == 0, F.lit("1997-01-01").cast("date")
            ).alias("valid_to"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 7 == 0).select(
                "c_custkey",
                F.lit("MOVED").alias("segment"),
                F.lit("1997-01-01").cast("date").alias("valid_from"),
                F.lit(None).cast("date").alias("valid_to"),
            )
        )
    )
    j = o.join(
        dim,
        (F.col("c_custkey") == F.col("o_custkey"))
        & (F.col("o_orderdate") >= F.col("valid_from"))
        & (F.col("valid_to").isNull() | (F.col("o_orderdate") < F.col("valid_to"))),
    )
    return (
        j.groupBy(
            "segment", F.year("o_orderdate").cast("int").alias("o_year")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
            )
            .cast("bigint")
            .alias("revenue_cents"),
        )
    )


# --- round 12 additions: the as-of family + store maintenance --------------
#
# Epoch-day constants for the deterministic version store (exact
# integers on both engines; datediff from 1970-01-01):
_D1995 = 9131   # 1995-01-01
_D1997H = 10043  # 1997-07-01
_D1999 = 10623  # 1999-02-01


@register(
    "customer_asof_balance_join",
    oracle=f"""
    WITH dim AS (
      SELECT c_custkey AS custkey, {_D1995} AS vday, {_CENTS} AS bal_cents
      FROM customer
      UNION ALL
      SELECT c_custkey, {_D1997H}, {_CENTS} + 10000
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, {_D1999}, {_CENTS} + 25000
      FROM customer WHERE c_custkey % 4 = 0
    ), probes AS (
      SELECT o_custkey AS custkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS oday,
             CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_cents
      FROM orders
    )
    SELECT p.o_year,
           CAST(count(*) AS BIGINT)        AS n_orders,
           CAST(sum(d.bal_cents) AS BIGINT) AS asof_bal_cents,
           CAST(sum(p.price_cents) AS BIGINT) AS price_cents
    FROM probes p ASOF JOIN dim d
      ON p.custkey = d.custkey AND p.oday >= d.vday
    GROUP BY p.o_year
    """,
    doc="AS-OF join — the temporal-join primitive Spark lacks as a "
        "keyword, re-expressed at scale as UNION + ORDERED WINDOW "
        "instead of a range join: dimension versions (3 deterministic "
        "balance versions per customer) and order probes are unioned "
        "into one stream, sorted per key by (day, is_probe) so a "
        "version sorts before probes on its effective day, and "
        "last(bal, ignorenulls) carries each version forward to every "
        "probe until the next version — EXACTLY one pass, one shuffle "
        "on the key, no candidate multiplication, no theta-join (the "
        "BroadcastNestedLoop trap the r11 nProbe sweep hit).  The "
        "oracle runs DuckDB's NATIVE `ASOF JOIN` — the engine-level "
        "cross-check that the window encoding implements the textbook "
        "semantics (latest version with vday <= order day).  Output "
        "aggregated per calendar year as a checksum over all ~150k "
        "asof matches at sf0.1.  Asof keys are exact epoch-day ints; "
        "balances in exact cents.",
    tags=("scd", "temporal", "join", "asof"),
)
def customer_asof_balance_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    dim = (
        c.select(
            F.col("c_custkey").alias("custkey"),
            F.lit(_D1995).alias("day"),
            cents.alias("bal"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0).select(
                F.col("c_custkey").alias("custkey"),
                F.lit(_D1997H).alias("day"),
                (cents + 10000).alias("bal"),
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 4 == 0).select(
                F.col("c_custkey").alias("custkey"),
                F.lit(_D1999).alias("day"),
                (cents + 25000).alias("bal"),
            )
        )
        .select("custkey", "day", F.lit(0).alias("is_probe"), "bal",
                F.lit(None).cast("int").alias("o_year"),
                F.lit(None).cast("bigint").alias("price_cents"))
    )
    probes = o.select(
        F.col("o_custkey").alias("custkey"),
        F.unix_date(F.col("o_orderdate").cast("date")).alias("day"),
        F.lit(1).alias("is_probe"),
        F.lit(None).cast("bigint").alias("bal"),
        F.year(F.col("o_orderdate")).cast("int").alias("o_year"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("bigint")
        .alias("price_cents"),
    )
    # the asof carry-forward: versions sort before probes on the same
    # day (is_probe tiebreak), last(ignorenulls) fills each probe with
    # the newest version at-or-before it
    w = (
        Window.partitionBy("custkey")
        .orderBy("day", "is_probe")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        dim.unionByName(probes)
        .withColumn("bal_asof", F.last("bal", ignorenulls=True).over(w))
        .filter((F.col("is_probe") == 1) & F.col("bal_asof").isNotNull())
    )
    return (
        matched.select("o_year", "bal_asof", "price_cents")
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("bal_asof").cast("bigint").alias("asof_bal_cents"),
            F.sum("price_cents").cast("bigint").alias("price_cents"),
        )
    )


@register(
    "scd2_interval_integrity_audit",
    oracle="""
    WITH store AS (
      SELECT c_custkey AS k, DATE '2023-01-01' AS vf, CAST(NULL AS DATE) AS vt
      FROM customer
      UNION ALL
      SELECT c_custkey, DATE '2022-01-01', DATE '2023-01-01'
      FROM customer WHERE c_custkey % 7 = 0
      UNION ALL
      SELECT c_custkey, DATE '2022-06-01', DATE '2023-06-01'
      FROM customer WHERE c_custkey % 17 = 0
      UNION ALL
      SELECT c_custkey, DATE '2021-01-01', DATE '2021-06-01'
      FROM customer WHERE c_custkey % 19 = 0
      UNION ALL
      SELECT c_custkey, DATE '2024-01-01', CAST(NULL AS DATE)
      FROM customer WHERE c_custkey % 23 = 0
    ), seq AS (
      SELECT k, vf, vt,
             lead(vf) OVER (PARTITION BY k ORDER BY vf) AS next_vf
      FROM store
    ), per_key AS (
      SELECT k,
             CAST(sum(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_open,
             max(CASE WHEN next_vf IS NOT NULL
                       AND (vt IS NULL OR next_vf < vt)
                      THEN 1 ELSE 0 END) AS has_overlap,
             max(CASE WHEN next_vf IS NOT NULL AND vt IS NOT NULL
                       AND next_vf > vt
                      THEN 1 ELSE 0 END) AS has_gap
      FROM seq GROUP BY k
    )
    SELECT CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN n_open <> 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS keys_bad_open_count,
           CAST(sum(has_overlap) AS BIGINT) AS keys_with_overlap,
           CAST(sum(has_gap) AS BIGINT)     AS keys_with_gap,
           CAST(sum(CASE WHEN n_open = 1 AND has_overlap = 0 AND has_gap = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS keys_clean
    FROM per_key
    """,
    doc="SCD2 store INTEGRITY AUDIT — the invariant check every "
        "dimension pipeline runs before trusting point-in-time joins: "
        "per business key, exactly ONE open row (valid_to IS NULL), no "
        "overlapping validity intervals (next valid_from < valid_to, "
        "or any row AFTER an open row), no coverage gaps (next "
        "valid_from > valid_to).  The store under audit is derived "
        "deterministically with INJECTED violations (key%17 overlap, "
        "key%19 gap, key%23 second open row, key%7 a clean closed "
        "chain) so both engines agree on the expected counts and the "
        "classifier provably fires on each class.  Scale shape: one "
        "shuffle on the key for the lead() window, one per-key "
        "partial agg, one single-row rollup — |store| rows in, 1 row "
        "out, no joins.",
    tags=("scd", "change-data", "audit"),
)
def scd2_interval_integrity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")

    def rows(pred, vf, vt):
        base = c.filter(pred) if pred is not None else c
        return base.select(
            F.col("c_custkey").alias("k"),
            F.lit(vf).cast("date").alias("vf"),
            (F.lit(vt).cast("date") if vt else F.lit(None).cast("date")).alias("vt"),
        )

    store = (
        rows(None, "2023-01-01", None)
        .unionByName(rows(F.col("c_custkey") % 7 == 0, "2022-01-01", "2023-01-01"))
        .unionByName(rows(F.col("c_custkey") % 17 == 0, "2022-06-01", "2023-06-01"))
        .unionByName(rows(F.col("c_custkey") % 19 == 0, "2021-01-01", "2021-06-01"))
        .unionByName(rows(F.col("c_custkey") % 23 == 0, "2024-01-01", None))
    )
    seq = store.withColumn(
        "next_vf", F.lead("vf").over(Window.partitionBy("k").orderBy("vf"))
    )
    per_key = seq.groupBy("k").agg(
        F.sum(F.when(F.col("vt").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_open"),
        F.max(
            F.when(
                F.col("next_vf").isNotNull()
                & (F.col("vt").isNull() | (F.col("next_vf") < F.col("vt"))),
                1,
            ).otherwise(0)
        ).alias("has_overlap"),
        F.max(
            F.when(
                F.col("next_vf").isNotNull()
                & F.col("vt").isNotNull()
                & (F.col("next_vf") > F.col("vt")),
                1,
            ).otherwise(0)
        ).alias("has_gap"),
    )
    return per_key.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum(F.when(F.col("n_open") != 1, 1).otherwise(0))
        .cast("bigint")
        .alias("keys_bad_open_count"),
        F.sum("has_overlap").cast("bigint").alias("keys_with_overlap"),
        F.sum("has_gap").cast("bigint").alias("keys_with_gap"),
        F.sum(
            F.when(
                (F.col("n_open") == 1)
                & (F.col("has_overlap") == 0)
                & (F.col("has_gap") == 0),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("keys_clean"),
    )


@register(
    "scd2_compact_versions",
    oracle="""
    WITH store AS (
      SELECT c_custkey AS k, DATE '1995-01-01' AS vf, DATE '1997-01-01' AS vt,
             c_mktsegment AS seg
      FROM customer
      UNION ALL
      SELECT c_custkey, DATE '1997-01-01', DATE '1999-01-01',
             CASE WHEN c_custkey % 2 = 0 THEN c_mktsegment ELSE 'SHIFTED' END
      FROM customer
      UNION ALL
      SELECT c_custkey, DATE '1999-01-01', CAST(NULL AS DATE),
             CASE WHEN c_custkey % 3 = 0 THEN 'MOVED'
                  WHEN c_custkey % 2 = 0 THEN c_mktsegment
                  ELSE 'SHIFTED' END
      FROM customer
    ), runs AS (
      SELECT k, vf, vt, seg,
             CASE WHEN lag(seg) OVER w IS NULL
                       OR seg <> lag(seg) OVER w THEN 1 ELSE 0 END AS is_new
      FROM store WINDOW w AS (PARTITION BY k ORDER BY vf)
    ), numbered AS (
      SELECT *, CAST(sum(is_new) OVER (PARTITION BY k ORDER BY vf
                                       ROWS UNBOUNDED PRECEDING) AS BIGINT)
                  AS run_id
      FROM runs
    )
    SELECT CAST(k AS BIGINT) AS c_custkey, seg,
           strftime(min(vf), '%Y-%m-%d') AS valid_from,
           CASE WHEN max(CASE WHEN vt IS NULL THEN 1 ELSE 0 END) = 1
                THEN NULL ELSE strftime(max(vt), '%Y-%m-%d') END AS valid_to
    FROM numbered
    GROUP BY k, run_id, seg
    """,
    doc="SCD2 store COMPACTION: collapse runs of consecutive versions "
        "with identical attributes into one interval (first valid_from, "
        "last valid_to; a run containing the open row stays open).  "
        "No-op updates leak redundant versions into every real SCD2 "
        "store (the scd2_customer_batch dedupe prevents same-batch "
        "no-ops, not cross-batch ones); compaction is the periodic "
        "maintenance that keeps version counts - and every downstream "
        "point-in-time join's candidate set - from growing without "
        "bound.  The store is derived deterministically (3 versions "
        "per key; key%2 repeats its segment in v2, key%6 in {0,4} "
        "carries it through v3, so run lengths 1-3 all occur) and the "
        "FULL compacted store is value-checked row-for-row.  Scale "
        "shape: one shuffle on the key shared by the lag window, the "
        "running-sum run numbering, and the final (k, run) group-by - "
        "classic island detection, no joins.",
    tags=("scd", "change-data"),
)
def scd2_compact_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    seg2 = F.when(F.col("c_custkey") % 2 == 0, F.col("c_mktsegment")).otherwise(
        F.lit("SHIFTED")
    )
    seg3 = (
        F.when(F.col("c_custkey") % 3 == 0, F.lit("MOVED"))
        .when(F.col("c_custkey") % 2 == 0, F.col("c_mktsegment"))
        .otherwise(F.lit("SHIFTED"))
    )

    def ver(vf, vt, seg):
        return c.select(
            F.col("c_custkey").alias("k"),
            F.lit(vf).cast("date").alias("vf"),
            (F.lit(vt).cast("date") if vt else F.lit(None).cast("date")).alias("vt"),
            seg.alias("seg"),
        )

    store = (
        ver("1995-01-01", "1997-01-01", F.col("c_mktsegment"))
        .unionByName(ver("1997-01-01", "1999-01-01", seg2))
        .unionByName(ver("1999-01-01", None, seg3))
    )
    wk = Window.partitionBy("k").orderBy("vf")
    runs = store.withColumn(
        "is_new",
        F.when(
            F.lag("seg").over(wk).isNull() | (F.col("seg") != F.lag("seg").over(wk)),
            1,
        ).otherwise(0),
    )
    numbered = runs.withColumn(
        "run_id",
        F.sum("is_new")
        .over(wk.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"),
    )
    return (
        numbered.groupBy("k", "run_id", "seg")
        .agg(
            F.min("vf").alias("min_vf"),
            F.max(F.when(F.col("vt").isNull(), 1).otherwise(0)).alias("has_open"),
            F.max("vt").alias("max_vt"),
        )
        .select(
            F.col("k").cast("bigint").alias("c_custkey"),
            "seg",
            F.date_format("min_vf", "yyyy-MM-dd").alias("valid_from"),
            F.when(F.col("has_open") == 1, F.lit(None).cast("string"))
            .otherwise(F.date_format("max_vt", "yyyy-MM-dd"))
            .alias("valid_to"),
        )
    )


# bitemporal constants: correction-wave transaction days and the as-was
# report date, as epoch days (exact ints both engines)
_TX_WAVE1 = 9862   # 1997-01-01: +200-cent restatement for orderkey%7
_TX_WAVE2 = 10227  # 1998-01-01: +500-cent restatement for orderkey%13
_REPORT_DAY = 10042  # 1997-06-30: the as-was report date


@register(
    "orders_bitemporal_correction_report",
    oracle=f"""
    WITH facts AS (
      SELECT o_orderkey,
             date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE))
               AS vday,
             CAST(year(CAST(o_orderdate AS DATE)) AS INTEGER) AS o_year,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders
      WHERE CAST(o_orderdate AS DATE) <= DATE '1997-06-30'
    ), versions AS (
      SELECT o_orderkey, o_year, vday AS tx_day, 0 AS seq, cents FROM facts
      UNION ALL
      SELECT o_orderkey, o_year, greatest(vday, {_TX_WAVE1}), 1, cents + 200
      FROM facts WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT o_orderkey, o_year, greatest(vday, {_TX_WAVE2}), 2, cents + 500
      FROM facts WHERE o_orderkey % 13 = 0
    ), picked AS (
      SELECT o_orderkey, o_year,
             max_by(cents, tx_day * 4 + seq)
               FILTER (tx_day <= {_REPORT_DAY}) AS cents_was,
             max_by(cents, tx_day * 4 + seq) AS cents_now
      FROM versions GROUP BY o_orderkey, o_year
    )
    SELECT o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents_was) AS BIGINT) AS rev_as_was_cents,
           CAST(sum(cents_now) AS BIGINT) AS rev_as_now_cents,
           CAST(sum(cents_now - cents_was) AS BIGINT) AS restatement_cents,
           CAST(sum(CASE WHEN cents_now <> cents_was THEN 1 ELSE 0 END)
                AS BIGINT) AS n_restated
    FROM picked GROUP BY o_year
    """,
    doc="BITEMPORAL correction report — valid time x transaction time: "
        "orders are restated by two correction waves (orderkey%7 "
        "+2.00 recorded 1997-01-01, orderkey%13 +5.00 recorded "
        "1998-01-01; a correction's recording day is clamped up to "
        "the fact's own valid day, since a restatement cannot precede "
        "the fact it restates — ADVICE r12), and the report answers "
        "'what did the books say ON 1997-06-30 vs what do they say "
        "NOW' for every order year — wave 1 is visible in BOTH views "
        "(recorded on or before the report date for every order in "
        "scope), wave 2 only as-now, so the delta column "
        "isolates exactly the late-arriving restatements; the audit "
        "regulators actually ask for.  Both temporal picks are ONE "
        "grouped max_by over the (order, year) key with the as-was "
        "pick as a FILTERed aggregate — Spark and DuckDB each evaluate "
        "the same (tx_day, seq) lexicographic argmax, no window, no "
        "self-join, one shuffle.  Money in exact integer cents; days "
        "as exact epoch-day ints.",
    tags=("scd", "temporal", "change-data", "audit"),
)
def orders_bitemporal_correction_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    facts = o.filter(
        F.col("o_orderdate").cast("date") <= F.lit("1997-06-30").cast("date")
    ).select(
        "o_orderkey",
        F.unix_date(F.col("o_orderdate").cast("date")).alias("vday"),
        F.year(F.col("o_orderdate")).cast("int").alias("o_year"),
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint").alias("cents"),
    )
    versions = (
        facts.select(
            "o_orderkey", "o_year",
            F.col("vday").alias("tx_day"), F.lit(0).alias("seq"), "cents",
        )
        .unionByName(
            facts.filter(F.col("o_orderkey") % 7 == 0).select(
                "o_orderkey", "o_year",
                # a correction cannot be recorded BEFORE its fact exists
                # (ADVICE r12): wave-1's nominal 1997-01-01 recording day
                # is clamped up to the fact's own valid day, so orders
                # placed Jan-Jun 1997 get their restatement recorded on
                # the order date itself — still <= the 1997-06-30 report
                # date, so wave 1 stays visible in BOTH views, as the
                # docstring promises.  seq breaks the (tx_day) tie in
                # favour of the correction.
                F.greatest(F.col("vday"), F.lit(_TX_WAVE1)).alias("tx_day"),
                F.lit(1).alias("seq"),
                (F.col("cents") + 200).alias("cents"),
            )
        )
        .unionByName(
            facts.filter(F.col("o_orderkey") % 13 == 0).select(
                "o_orderkey", "o_year",
                F.greatest(F.col("vday"), F.lit(_TX_WAVE2)).alias("tx_day"),
                F.lit(2).alias("seq"),
                (F.col("cents") + 500).alias("cents"),
            )
        )
    )
    # lexicographic (tx_day, seq) argmax, encoded as ONE exact integer
    # (seq < 4, so tx_day*4 + seq orders identically to the tuple) —
    # DuckDB's max_by accepts only scalar ordering keys
    key = F.col("tx_day") * 4 + F.col("seq")
    asof = versions.groupBy("o_orderkey", "o_year").agg(
        F.max_by(
            F.col("cents"),
            F.when(F.col("tx_day") <= _REPORT_DAY, key),
        ).alias("cents_was"),
        F.max_by(F.col("cents"), key).alias("cents_now"),
    )
    return asof.groupBy("o_year").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum("cents_was").cast("bigint").alias("rev_as_was_cents"),
        F.sum("cents_now").cast("bigint").alias("rev_as_now_cents"),
        F.sum(F.col("cents_now") - F.col("cents_was"))
        .cast("bigint")
        .alias("restatement_cents"),
        F.sum(
            F.when(F.col("cents_now") != F.col("cents_was"), 1).otherwise(0)
        )
        .cast("bigint")
        .alias("n_restated"),
    )


# --- round 13 addition: CDC apply-log -> SCD2 history replay ---------------


def _cdc_ops_log(c: DataFrame) -> DataFrame:
    """The deterministic Debezium-style change log both CDC queries
    replay (custkey%3 rebalances, %4 upgrades segment, %6 is deleted;
    %12 exercises the full I-U-U-D lifecycle) — one op per (key, seq),
    every op carrying the full attribute image."""
    cents = F.floor(F.col("c_acctbal") * 100 + F.lit(0.5)).cast("bigint")
    return (
        c.select(
            "c_custkey",
            F.lit(0).alias("seq"),
            F.lit("I").alias("op"),
            F.lit("2020-01-01").cast("date").alias("op_date"),
            F.col("c_mktsegment").alias("segment"),
            cents.alias("bal_cents"),
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 3 == 0).select(
                "c_custkey",
                F.lit(1).alias("seq"),
                F.lit("U").alias("op"),
                F.lit("2021-02-01").cast("date").alias("op_date"),
                F.col("c_mktsegment").alias("segment"),
                (cents + 100).alias("bal_cents"),
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 4 == 0).select(
                "c_custkey",
                F.lit(2).alias("seq"),
                F.lit("U").alias("op"),
                F.lit("2022-03-01").cast("date").alias("op_date"),
                F.lit("UPGRADED").alias("segment"),
                F.when(F.col("c_custkey") % 3 == 0, cents + 100)
                .otherwise(cents)
                .alias("bal_cents"),
            )
        )
        .unionByName(
            c.filter(F.col("c_custkey") % 6 == 0).select(
                "c_custkey",
                F.lit(3).alias("seq"),
                F.lit("D").alias("op"),
                F.lit("2023-04-01").cast("date").alias("op_date"),
                F.lit(None).cast("string").alias("segment"),
                F.lit(None).cast("bigint").alias("bal_cents"),
            )
        )
    )


@register(
    "scd2_cdc_apply_log",
    oracle=f"""
    WITH ops AS (
      SELECT c_custkey, 0 AS seq, 'I' AS op, DATE '2020-01-01' AS op_date,
             c_mktsegment AS segment, {_CENTS} AS bal_cents
      FROM customer
      UNION ALL
      SELECT c_custkey, 1, 'U', DATE '2021-02-01',
             c_mktsegment, {_CENTS} + 100
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, 2, 'U', DATE '2022-03-01', 'UPGRADED',
             CASE WHEN c_custkey % 3 = 0 THEN {_CENTS} + 100
                  ELSE {_CENTS} END
      FROM customer WHERE c_custkey % 4 = 0
      UNION ALL
      SELECT c_custkey, 3, 'D', DATE '2023-04-01',
             CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
      FROM customer WHERE c_custkey % 6 = 0
    ), seq AS (
      SELECT *, lead(op_date) OVER (PARTITION BY c_custkey
                                    ORDER BY seq) AS next_date
      FROM ops
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, segment, bal_cents,
           strftime(op_date, '%Y-%m-%d')  AS valid_from,
           strftime(next_date, '%Y-%m-%d') AS valid_to,
           (next_date IS NULL) AS is_current
    FROM seq WHERE op <> 'D'
    """,
    doc="CDC apply-log replay — the WRITE side of the r12 read-side "
        "interval audits: a Debezium-style ordered change log (I / U / "
        "U / D per business key; every op carries the full attribute "
        "image) is replayed into the complete SCD2 version history in "
        "ONE pass — valid_from = the op's date, valid_to = the NEXT "
        "op's date via lead() (a delete closes the last version "
        "without opening one), open rows are is_current.  The log is "
        "derived deterministically from the customer fixture "
        "(custkey%3 rebalances, %4 upgrades segment, %6 is deleted; "
        "%12 exercises the full I-U-U-D lifecycle) so the oracle "
        "rebuilds the identical log and replays it independently.  "
        "Scale shape: ONE shuffle on the business key + in-partition "
        "sort by op sequence — the 100 TB encoding of 'rebuild the "
        "dimension from its change stream' (the per-op MERGE loop "
        "would be one pass PER OP); contrast scd2_customer_batch, "
        "which applies one latest-wins batch to an existing state.  "
        "Balances in exact integer cents.",
    tags=("scd", "change-data", "temporal"),
)
def scd2_cdc_apply_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = _cdc_ops_log(load_table(spark, sf_dir, "customer"))
    w = Window.partitionBy("c_custkey").orderBy("seq")
    return (
        ops.withColumn("next_date", F.lead("op_date").over(w))
        .filter(F.col("op") != "D")
        .select(
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            "segment",
            "bal_cents",
            F.date_format("op_date", "yyyy-MM-dd").alias("valid_from"),
            F.date_format("next_date", "yyyy-MM-dd").alias("valid_to"),
            F.col("next_date").isNull().alias("is_current"),
        )
    )


@register(
    "scd2_type1_type2_divergence",
    oracle="""
    WITH joined AS (
      SELECT CAST(year(CAST(o.o_orderdate AS DATE)) AS INTEGER) AS o_year,
             CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)  AS cents,
             CASE WHEN c.c_custkey % 7 = 0 THEN 'MOVED'
                  ELSE c.c_mktsegment END AS seg_type1,
             CASE WHEN c.c_custkey % 7 = 0
                       AND CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
                  THEN 'MOVED' ELSE c.c_mktsegment END AS seg_type2
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    )
    SELECT o_year,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(sum(cents) AS BIGINT) AS revenue_cents,
           CAST(sum(CASE WHEN seg_type1 <> seg_type2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_misattributed,
           CAST(sum(CASE WHEN seg_type1 <> seg_type2 THEN cents ELSE 0 END)
                AS BIGINT) AS misattributed_cents
    FROM joined GROUP BY o_year
    """,
    doc="Type-1 vs Type-2 DIVERGENCE audit — the number that justifies "
        "keeping SCD2 history at all: the same dimension change "
        "(custkey%7 customers re-segmented to 'MOVED' effective "
        "1997-01-01, the scenario of orders_pointintime_segment) "
        "consumed two ways — Type-1 (overwrite: every order joins the "
        "CURRENT segment) vs Type-2 (as-was: orders join the segment "
        "valid on the order date) — and the per-year report counts the "
        "orders and revenue the Type-1 shortcut MISATTRIBUTES (every "
        "pre-1997 order of a moved customer).  Both attributions are "
        "computed in one pass from the change rule itself, so the plan "
        "is ONE fact-dim equi-join + one rollup: no second join, no "
        "window — the audit costs no more than the report it audits.  "
        "Revenue in exact integer cents.",
    tags=("scd", "temporal", "audit"),
)
def scd2_type1_type2_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load_table(spark, sf_dir, "orders")
    j = o.join(c, F.col("c_custkey") == F.col("o_custkey"))
    moved = F.col("c_custkey") % 7 == 0
    seg1 = F.when(moved, F.lit("MOVED")).otherwise(F.col("c_mktsegment"))
    seg2 = F.when(
        moved & (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date")),
        F.lit("MOVED"),
    ).otherwise(F.col("c_mktsegment"))
    cents = F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
    mis = seg1 != seg2
    return (
        j.select(
            F.year(F.col("o_orderdate")).cast("int").alias("o_year"),
            cents.alias("cents"),
            mis.alias("mis"),
        )
        .groupBy("o_year")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("revenue_cents"),
            F.sum(F.when(F.col("mis"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_misattributed"),
            F.sum(F.when(F.col("mis"), F.col("cents")).otherwise(0))
            .cast("bigint")
            .alias("misattributed_cents"),
        )
    )


@register(
    "scd2_cdc_incremental_merge",
    oracle=f"""
    WITH ops AS (
      SELECT c_custkey, 0 AS seq, 'I' AS op, DATE '2020-01-01' AS op_date,
             c_mktsegment AS segment, {_CENTS} AS bal_cents
      FROM customer
      UNION ALL
      SELECT c_custkey, 1, 'U', DATE '2021-02-01',
             c_mktsegment, {_CENTS} + 100
      FROM customer WHERE c_custkey % 3 = 0
      UNION ALL
      SELECT c_custkey, 2, 'U', DATE '2022-03-01', 'UPGRADED',
             CASE WHEN c_custkey % 3 = 0 THEN {_CENTS} + 100
                  ELSE {_CENTS} END
      FROM customer WHERE c_custkey % 4 = 0
      UNION ALL
      SELECT c_custkey, 3, 'D', DATE '2023-04-01',
             CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
      FROM customer WHERE c_custkey % 6 = 0
    ), seq AS (
      SELECT *, lead(op_date) OVER (PARTITION BY c_custkey
                                    ORDER BY seq) AS next_date
      FROM ops
    )
    SELECT CAST(c_custkey AS BIGINT) AS c_custkey, segment, bal_cents,
           strftime(op_date, '%Y-%m-%d')  AS valid_from,
           strftime(next_date, '%Y-%m-%d') AS valid_to,
           (next_date IS NULL) AS is_current
    FROM seq WHERE op <> 'D'
    """,
    doc="Incremental CDC MERGE — the foreachBatch-shaped WRITE path "
        "paired with scd2_cdc_apply_log's one-pass rebuild (VERDICT "
        "r13 item 4).  The SAME change log is applied in CHRONOLOGICAL "
        "CHUNKS (one per CDC batch / op sequence number) against a "
        "maintained SCD2 state table: each chunk closes the arriving "
        "keys' open versions (valid_to = the op's date) and inserts "
        "the new open versions (a delete closes without inserting) — "
        "exactly what a foreachBatch MERGE does against a warehouse "
        "dimension, batch after batch.  The ORACLE is the one-shot "
        "full-log rebuild, so the driver check IS the incremental-"
        "equals-batch equivalence proof: any drift between the merge "
        "loop and the lead()-based rebuild flips the value hash red. "
        "The streaming twin (the same per-chunk merge function driven "
        "by a foreachBatch stream over the op log) is asserted "
        "equivalent in tests/test_streaming.py.  Scale shape: K "
        "batch-sized passes, each ONE key-partitioned join of the "
        "state against the (much smaller) chunk — the realistic cost "
        "model of continuous dimension maintenance, vs the rebuild's "
        "single full-log shuffle; lineage across the K merges is "
        "truncated with lazy localCheckpoint so the final plan does "
        "not re-execute every chunk join.  No driver-side data "
        "movement: the chunk loop is control flow only, K=4 is the "
        "log's op-sequence count, not a data-dependent loop.",
    tags=("scd", "change-data", "temporal", "incremental"),
)
def scd2_cdc_incremental_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    ops = _cdc_ops_log(load_table(spark, sf_dir, "customer"))
    state = apply_cdc_batch(None, ops.filter(F.col("seq") == 0))
    for s in (1, 2, 3):
        state = apply_cdc_batch(state, ops.filter(F.col("seq") == s))
        state = state.localCheckpoint(eager=False)
    return state.select(
        F.col("c_custkey").cast("bigint").alias("c_custkey"),
        "segment",
        "bal_cents",
        F.date_format("valid_from_d", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("valid_to_d", "yyyy-MM-dd").alias("valid_to"),
        F.col("valid_to_d").isNull().alias("is_current"),
    )


def apply_cdc_batch(state: DataFrame | None, batch: DataFrame) -> DataFrame:
    """One MERGE step: close the open version of every key in `batch`
    (valid_to = the op's date) and open a new version for each non-
    delete op.  The exact function the streaming foreachBatch twin
    applies per micro-batch (tests/test_streaming.py) — shared so the
    batch and streaming paths cannot drift apart.  Assumes ≤1 op per
    key per batch (one CDC transaction per key per commit window);
    state schema: c_custkey, segment, bal_cents, valid_from_d,
    valid_to_d."""
    inserts = batch.filter(F.col("op") != "D").select(
        "c_custkey",
        "segment",
        "bal_cents",
        F.col("op_date").alias("valid_from_d"),
        F.lit(None).cast("date").alias("valid_to_d"),
    )
    if state is None:
        return inserts
    closes = batch.select("c_custkey", F.col("op_date").alias("close_date"))
    closed = (
        state.join(closes, "c_custkey", "left")
        .withColumn(
            "valid_to_d",
            F.when(
                F.col("valid_to_d").isNull() & F.col("close_date").isNotNull(),
                F.col("close_date"),
            ).otherwise(F.col("valid_to_d")),
        )
        .drop("close_date")
    )
    return closed.unionByName(inserts)
