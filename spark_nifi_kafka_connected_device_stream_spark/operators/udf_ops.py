"""Python-boundary operators: vectorized Pandas UDFs and grouped
applyInPandas (SURVEY.md §2.7 lists UDF/UDAF as reference capability
gaps; the guide's rule applies — Arrow-batched vectorized UDFs only,
never row-at-a-time Python in the hot path).

Both operators here are deliberately ALSO expressible in SQL so the
Python boundary itself is oracle-checked: the test is that shipping
the computation through Arrow batches produces bit-identical results
to the JVM expression path.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.portable import pround
from ..registry import register
from ..sources.catalog import load_table


@F.pandas_udf(T.DoubleType())
def _charge_udf(ext: pd.Series, disc: pd.Series, tax: pd.Series) -> pd.Series:
    """Vectorized charge computation — one Arrow batch per call,
    numpy arithmetic (double ops identical to the JVM's)."""
    return ext * (1.0 - disc) * (1.0 + tax)


@register(
    "pandas_udf_charge",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100.0 + 0.5) / 100.0 AS charge
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
    doc="Scalar Pandas UDF (Arrow-vectorized): the slow-path surface, "
        "value-checked against the pure-SQL form — proves the Python "
        "boundary is numerically transparent.",
    tags=("udf",),
)
def pandas_udf_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(_charge_udf("l_extendedprice", "l_discount", "l_tax"), 2).alias("charge"),
    )


_ZSCORE_SCHEMA = "event_id bigint, event_type string, z double"


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Per-group standardization. pandas std() is ddof=1 == stddev_samp."""
    mean = pdf["value"].mean()
    std = pdf["value"].std()
    return pd.DataFrame(
        {
            "event_id": pdf["event_id"],
            "event_type": pdf["event_type"],
            "z": (pdf["value"] - mean) / std,
        }
    )


@register(
    "applyinpandas_zscore",
    oracle="""
    SELECT event_id, event_type,
           floor(((value - avg(value) OVER w) / stddev_samp(value) OVER w) * 1000000.0 + 0.5) / 1000000.0 AS z
    FROM events
    WINDOW w AS (PARTITION BY event_type)
    """,
    doc="Grouped-map applyInPandas (per-group pandas frame in/out): "
        "z-score normalization per event_type, oracle-checked against the "
        "window-function form. The grouped-map pattern is the template for "
        "per-group model scoring at scale (one shuffle on the group key; "
        "each group must fit in one task's memory — groups here are "
        "~n/5 rows; skewed groups would need salting+two-pass).",
    tags=("udf",),
)
def applyinpandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    out = e.groupBy("event_type").applyInPandas(_zscore_group, schema=_ZSCORE_SCHEMA)
    return out.select("event_id", "event_type", pround("z", 6).alias("z"))


@F.pandas_udf(T.DoubleType())
def _weighted_median_udf(price: pd.Series, qty: pd.Series) -> float:
    """Grouped-agg Pandas UDF (Series -> scalar): lower weighted median.
    Weights for duplicate prices are merged first so the cumulative walk
    is deterministic; quantities are integral doubles, so the cumsum is
    exact (< 2^53) and the >= comparison has no fp knife-edge."""
    per = qty.groupby(price).sum().sort_index()
    cum = per.cumsum()
    total = cum.iloc[-1]
    return float(cum.index[(cum * 2 >= total).argmax()])


@register(
    "grouped_agg_weighted_median",
    oracle="""
    WITH per AS (
      SELECT l_returnflag AS flag, l_extendedprice AS price,
             sum(l_quantity) AS w
      FROM lineitem GROUP BY flag, price
    ), cum AS (
      SELECT flag, price,
             sum(w) OVER (PARTITION BY flag ORDER BY price) AS cw,
             sum(w) OVER (PARTITION BY flag)                AS tot
      FROM per
    )
    SELECT flag, min(price) AS wmedian
    FROM cum WHERE cw * 2 >= tot GROUP BY flag
    """,
    doc="Grouped-aggregate Pandas UDF (pandas Series in, scalar out, "
        "used directly inside .agg()) — the third Python-boundary "
        "surface after scalar pandas_udf and grouped-map applyInPandas: "
        "quantity-weighted lower median of extended price per return "
        "flag.  The lower weighted median (smallest x whose cumulative "
        "weight reaches half the total) is exactly expressible as a "
        "cumulative-window SQL query, so the Arrow aggregate is "
        "value-checked end-to-end.  Scale: one shuffle on the group key; "
        "per-group state is the (price -> weight) map, bounded by "
        "distinct prices per group — for unbounded-cardinality keys the "
        "two-pass window form (the oracle's own shape) is the fallback.",
    tags=("udf", "stats", "agg"),
)
def grouped_agg_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("flag"))
        .agg(
            _weighted_median_udf("l_extendedprice", "l_quantity").alias("wmedian")
        )
    )


@register(
    "text_sentences_udtf",
    oracle="""
    WITH parts AS (
      SELECT doc_id,
             trim(u.part) AS sentence,
             u.i
      FROM documents,
           UNNEST(list_transform(split(text, '.'),
                                 (x, i) -> struct_pack(part := x, i := i))) AS t(u)
      WHERE doc_id < 50
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(row_number() OVER (PARTITION BY doc_id ORDER BY i) - 1
                AS INTEGER)       AS sentence_id,
           sentence,
           CAST(length(sentence) AS INTEGER) AS n_chars
    FROM parts WHERE sentence <> ''
    """,
    doc="Python UDTF (Spark 4 user-defined TABLE function) applied via "
        "LATERAL: one document row expands to one row per non-empty "
        "'.'-delimited sentence with a per-doc ordinal — the fourth "
        "and last Python-boundary surface (after scalar pandas_udf, "
        "grouped-agg pandas UDF, and applyInPandas/mapInPandas), "
        "value-checked against a pure-SQL unnest.  HONEST perf note: "
        "a Python UDTF evals row-at-a-time, the documented slow path "
        "— the JVM-native form of this exact expansion is "
        "text_token_positions / text_chunk_documents "
        "(explode(split(...))), which is what the hot path uses; this "
        "op exists to pin the UDTF API surface and is bounded to 50 "
        "docs.  The predicate doc_id < 50 is pushed to the scan "
        "BEFORE the Python stage, so the UDTF only ever sees "
        "surviving rows — the filter-before-Python rule.",
    tags=("udf", "udtf", "text"),
)
def text_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_id int, sentence string, n_chars int")
    class _SplitSentences:
        def eval(self, text: str):  # noqa: ANN001
            sid = 0
            for raw in (text or "").split("."):
                s = raw.strip()
                if s:
                    yield (sid, s, len(s))
                    sid += 1

    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    d.createOrReplaceTempView("_udtf_docs")
    spark.udtf.register("split_sentences", _SplitSentences)
    return spark.sql(
        """
        SELECT CAST(d.doc_id AS BIGINT) AS doc_id,
               s.sentence_id, s.sentence, s.n_chars
        FROM _udtf_docs d, LATERAL split_sentences(d.text) s
        """
    )


# --- round 12 additions: the remaining Python-boundary surfaces ------------


def _cents_batches(it):
    """mapInArrow kernel: pure pyarrow.compute per RecordBatch — no
    pandas materialization at all, the cheapest Python boundary Spark
    offers.  floor(value*100 + 0.5) in exact double→int64, NULL values
    dropped BEFORE Python would pay for them (mask pushed into the
    batch filter)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in it:
        tbl = pa.Table.from_batches([batch])
        tbl = tbl.filter(pc.is_valid(tbl["value"]))
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(tbl["value"], pa.scalar(100.0)), pa.scalar(0.5))),
            pa.int64(),
        )
        out = pa.table(
            {"event_type": tbl["event_type"], "cents": cents}
        )
        for ob in out.to_batches():
            yield ob


@register(
    "mapinarrow_value_cents_sum",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_sum
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
    doc="mapInArrow (RecordBatch in / RecordBatch out, NO pandas "
        "conversion) — the fifth and lowest-overhead Python boundary, "
        "value-checked end-to-end: per-batch pyarrow.compute converts "
        "`value` to exact integer cents, the JVM aggregates.  Compared "
        "to mapInPandas this skips the Arrow→pandas→Arrow copy, which "
        "is the boundary cost that dominates when the kernel itself is "
        "trivial — the right surface for byte-level/columnar kernels "
        "(the multimodal tier uses it for payload scans).  Scale "
        "shape: map-only Python stage (NULLs filtered inside the "
        "batch), then one partial-agg shuffle on event_type; the "
        "Python stage parallelizes per input partition.",
    tags=("udf", "arrow"),
)
def mapinarrow_value_cents_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "value")
    cents = e.mapInArrow(_cents_batches, schema="event_type string, cents bigint")
    return cents.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("cents_sum"),
    )


_SPEND_SCHEMA = (
    "custkey bigint, bal_cents bigint, n_orders bigint, revenue_cents bigint"
)


def _spend_cogroup(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
    """Cogrouped applyInPandas kernel: one customer row (left) joined
    in Python with that customer's orders (right).  All money columns
    arrive as exact int64 cents (computed JVM-side) so the pandas sum
    is integer-exact; a customer with no orders gets n_orders=0, and
    orders whose key vanished from the dimension contribute nothing
    (the kernel emits only dimension-backed keys — left-join
    semantics, pinned by the oracle)."""
    if left.empty:
        return pd.DataFrame(
            {c: pd.Series(dtype="int64") for c in
             ("custkey", "bal_cents", "n_orders", "revenue_cents")}
        )
    return pd.DataFrame(
        {
            "custkey": [int(left["c_custkey"].iloc[0])],
            "bal_cents": [int(left["bal_cents"].iloc[0])],
            "n_orders": [int(len(right))],
            "revenue_cents": [int(right["price_cents"].sum()) if len(right) else 0],
        }
    )


@register(
    "cogrouped_applyinpandas_spend",
    oracle="""
    WITH o AS (
      SELECT o_custkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS pc
      FROM orders WHERE o_custkey <= 2000
    )
    SELECT CAST(c.c_custkey AS BIGINT) AS custkey,
           CAST(floor(c.c_acctbal * 100.0 + 0.5) AS BIGINT) AS bal_cents,
           CAST(count(o.pc) AS BIGINT) AS n_orders,
           CAST(coalesce(sum(o.pc), 0) AS BIGINT) AS revenue_cents
    FROM customer c LEFT JOIN o ON o.o_custkey = c.c_custkey
    WHERE c.c_custkey <= 2000
    GROUP BY c.c_custkey, bal_cents
    """,
    doc="Cogrouped applyInPandas (groupBy().cogroup().applyInPandas — "
        "the two-sided grouped-map surface): customer and that "
        "customer's orders arrive as two aligned pandas frames per "
        "key; the kernel computes the per-customer order rollup, "
        "value-checked against the pure-SQL left join.  This is the "
        "template for Python-side feature joins (per-entity model "
        "features from two tables) when the combine logic outgrows "
        "SQL.  HONEST perf note: one Python call PER KEY — the "
        "documented slow path for high-cardinality keys (bounded here "
        "to custkey <= 2000, pushed to both scans before the Python "
        "stage); the JVM join+agg (the oracle's own shape) is what the "
        "hot path uses.  Scale shape: both sides shuffle once on the "
        "key (co-partitioned), kernel state is one customer's rows.",
    tags=("udf", "join"),
)
def cogrouped_applyinpandas_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 2000)
        .select(
            "c_custkey",
            F.floor(F.col("c_acctbal") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("bal_cents"),
        )
    )
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") <= 2000)
        .select(
            "o_custkey",
            F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
            .cast("bigint")
            .alias("price_cents"),
        )
    )
    return (
        c.groupBy("c_custkey")
        .cogroup(o.groupBy("o_custkey"))
        .applyInPandas(_spend_cogroup, schema=_SPEND_SCHEMA)
    )
