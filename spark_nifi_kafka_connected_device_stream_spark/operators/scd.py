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
