"""ANN serving tier over `array<float>` embeddings — the IVF / PQ /
IVFADC stack and its tuning sweep, split out of
`operators/similarity.py` in round 17 (VERDICT r16 item 4; the split
follows the same pure-move protocol as the r14 events/analytics and
r15 curation splits).

Round 17 also closes VERDICT r16 item 2 here: the IVF coarse
quantizer is now REAL GEOMETRY.  Previous rounds used the synthetic
`label` column as the cell id — a stand-in that does not correlate
with cosine proximity, which capped serving recall at 0.08–0.16
(artifacts/ivfpq_recall_r16.json).  The cells now come from the
repo's own deterministic one-Lloyd-round k-means
(`operators/_kmeans`, the SAME machinery behind
`embedding_kmeans_assign`) with k=IVF_NCELLS, and the serving path
probes the IVF_NPROBE nearest cells per query (the
`similarity_ivf_nprobe_sweep` probe-ranking composition).  Measured
recall vs exact brute force: artifacts/ivfpq_recall_r17.json.

Scale shape (unchanged by the quantizer swap): the corpus at rest is
codes only — (cell, m, code) rows for IVFADC, uint8-dequantized
vectors for the scalar-quantized path; the per-query LUT / probe
tables are constant-size broadcasts; full-precision vectors are
touched only in the k-bounded exact re-rank.  At 100 TB the coarse
quantizer would be fit on a driver-side sample (k·dims floats) and
the one-Lloyd-round assignment here IS the per-iteration plan such a
fit generates.

Reference scope: the reference pipeline
(`nifi_spark_kafka_product_view_platform.py`) has no vector tier;
this is SURVEY.md §2.8 extension surface (Jégou et al. 2011 for
IVFADC, cited in PAPERS.md).

Floating-point contract: identical to `operators/similarity.py` —
elements cast to double before arithmetic, similarities rounded to 6
dp in both engines, ranks use a unique (similarity DESC, neighbor
ASC) order, and the nonzero-norm data contract applies (see the
similarity module docstring).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import fastvec
from ..functions.vectors import dot, l2_norm
from ..functions.portable import pround
from ..functions.scale import plan_parallelism
from ..registry import _REGISTRY as _REG
from ..registry import register
from ..sources.catalog import load_table
from . import _kmeans as _km
from .similarity import N_QUERIES, TOP_K, similarity_topk_bruteforce

# ---------------------------------------------------------------------------
# the IVF coarse quantizer: deterministic k-means cells + nprobe ranking
# ---------------------------------------------------------------------------

# 16 cells / probe 2: measured on the fixture corpus (unit-norm,
# near-isotropic — artifacts/ivfpq_recall_r17.json) this scans ~12% of
# the corpus per query at candidate-recall ~0.9+; the label-as-cell
# stand-in it replaces scanned ~10% for recall 0.08–0.16.  At 100 TB
# the cell count scales toward sqrt(N) and nprobe stays the measured
# recall/latency knob (similarity_ivf_nprobe_sweep is that curve).
IVF_NCELLS = 16
IVF_NPROBE = 2
IVF_DECIMALS = 9  # centroid rounding, same protocol as embedding_kmeans_assign

# DuckDB prefix: the shared k-means chain (e, …, cent1, d2) + the two
# consumer CTEs — `cells` (corpus assignment) and `qprobe` (the
# IVF_NPROBE nearest cells per query, ranked by exact dist2 with ties
# to the lowest cid, exactly the Spark row_number contract below).
_IVF_SQL_CELLS = f"""{_km.sql_ctes(IVF_NCELLS, IVF_DECIMALS)}, cells AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM d2
      ) WHERE rn = 1
    ), qprobe AS (
      SELECT vec_id AS query_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS cell_rank
        FROM d2 WHERE vec_id < {N_QUERIES}
      ) WHERE cell_rank <= {IVF_NPROBE}
    )"""


def _ivf_cells_and_probe(
    spark: SparkSession, sf_dir: str, emb: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """(cells, probed): the corpus cell assignment (vec_id, cid) and
    the per-query probe list (query_id, p_cid) of the IVF_NPROBE
    nearest cells.  The k-row centroid table is collected ONCE
    (bounded by construction) and shipped to the bit-identical
    vectorized scoring kernel for both consumers (optimization r17 —
    the crossJoin+HOF form re-ran the two-pass Lloyd build per
    consumer and paid an interpreted lambda per element); the corpus
    side never shuffles for the assignment.  Callers that already hold
    the (vec_id, v) corpus frame pass it via `emb` so the assignment
    shares their repartition exchange instead of building a
    plan-distinct twin of the same scan (optimization r18)."""
    if emb is None:
        emb = _km.embeddings_double(spark, sf_dir).repartition(
            plan_parallelism(spark), "vec_id"
        )
    crows = _km.final_centroid_rows(spark, sf_dir, IVF_NCELLS, IVF_DECIMALS)
    cells = _km.assign_rows(emb, crows).select("vec_id", "cid")
    scored = _km.scored_rows(
        emb.filter(F.col("vec_id") < N_QUERIES), crows
    ).select(F.col("vec_id").alias("query_id"), "cid", "dist2")
    w = Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cid"))
    probed = (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= IVF_NPROBE)
        .select("query_id", F.col("cid").alias("p_cid"))
    )
    return cells, probed


# ---------------------------------------------------------------------------
# IVF + scalar-quantized codes + exact re-rank (the production ANN stack)
# ---------------------------------------------------------------------------

N_CAND = 2 * TOP_K  # approximate candidates carried into the exact re-rank

_DUCK_DQ_DOT = (
    "list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
)


def _duck_dq_cos(a: str, b: str) -> str:
    d = _DUCK_DQ_DOT
    return (
        f"{d.format(a=a, b=b)} / "
        f"(sqrt({d.format(a=a, b=a)}) * sqrt({d.format(a=b, b=b)}))"
    )


@register(
    "similarity_topk_ivf_quantized",
    oracle=f"""
    {_IVF_SQL_CELLS}, el AS (
      SELECT vec_id, gs.j, v[gs.j] AS x
      FROM e, LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS j) gs
    ), dims AS (
      SELECT j, min(x) AS mn, max(x) AS mx FROM el GROUP BY j
    ), dq AS (
      SELECT vec_id,
             list(d.mn + (CAST(CASE WHEN d.mx > d.mn
                    THEN least(floor((el.x - d.mn) / (d.mx - d.mn) * 255.0), 255.0)
                    ELSE 0.0 END AS INTEGER) + 0.5) * (d.mx - d.mn) / 255.0
                  ORDER BY el.j) AS dv
      FROM el JOIN dims d USING (j) GROUP BY vec_id
    ), sides AS (
      SELECT e.vec_id, cl.cid, e.v, dq.dv
      FROM e JOIN dq USING (vec_id) JOIN cells cl USING (vec_id)
    ), approx AS (
      SELECT * FROM (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               {_duck_dq_cos("q.dv", "c.dv")} AS approx_raw,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_duck_dq_cos("q.dv", "c.dv")} DESC,
                                           c.vec_id ASC) AS arnk
        FROM sides q
        JOIN qprobe p ON p.query_id = q.vec_id
        JOIN sides c ON c.cid = p.cid AND c.vec_id <> q.vec_id
        WHERE q.vec_id < {N_QUERIES}
      ) WHERE arnk <= {N_CAND}
    )
    SELECT query_id, neighbor_id,
           floor(exact_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
           floor(approx_raw * 1000000.0 + 0.5) / 1000000.0 AS approx_sim,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT a.query_id, a.neighbor_id, a.approx_raw,
             {_duck_dq_cos("q.v", "c.v")} AS exact_raw,
             row_number() OVER (PARTITION BY a.query_id
                                ORDER BY {_duck_dq_cos("q.v", "c.v")} DESC,
                                         a.neighbor_id ASC) AS rnk
      FROM approx a
      JOIN sides q ON q.vec_id = a.query_id
      JOIN sides c ON c.vec_id = a.neighbor_id
    ) WHERE rnk <= {TOP_K}
    """,
    doc=f"The production ANN stack end-to-end: k-means IVF cell "
        f"restriction (IVF_NCELLS={IVF_NCELLS} cells from the shared "
        f"deterministic one-Lloyd-round k-means, nprobe={IVF_NPROBE} "
        f"nearest cells probed per query — real geometry since round "
        f"17, replacing the label-as-cell stand-in whose recall the "
        f"r16 artifact measured at 0.08–0.16) + uint8 scalar-quantized "
        f"codes for the approximate scan + exact re-rank of the top "
        f"{N_CAND} candidates down to k={TOP_K}. The approximate pass "
        "touches only dequantized codes (4x smaller at rest — what "
        "actually fits in memory at 100 TB); full-precision vectors "
        "are fetched for the candidate set only, which is k-bounded "
        "per query regardless of corpus size. Per-dim stats and the "
        "probe table broadcast; candidate fetch is an equi-join on "
        "vec_id; the cell restriction is an equi-join on the cell id.",
    tags=("similarity", "ann"),
)
def similarity_topk_ivf_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    e = e.repartition(plan_parallelism(spark), "vec_id")
    cells, probed = _ivf_cells_and_probe(spark, sf_dir, emb=e)
    el = e.select("vec_id", F.posexplode("v").alias("j", "x"))
    dims = el.groupBy("j").agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
    qv = (
        F.when(
            F.col("mx") > F.col("mn"),
            F.least(
                F.floor((F.col("x") - F.col("mn")) / (F.col("mx") - F.col("mn")) * 255.0),
                F.lit(255.0),
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("int")
    )
    dqv = F.col("mn") + (qv + F.lit(0.5)) * (F.col("mx") - F.col("mn")) / 255.0
    dq = (
        el.join(F.broadcast(dims), "j")
        .select("vec_id", "j", dqv.alias("dqv"))
        .groupBy("vec_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("j", "dqv"))), lambda s: s["dqv"]
            ).alias("dv")
        )
    )
    sides = e.join(dq, "vec_id").join(cells, "vec_id")
    # the query side of the approximate scan: codes + probe list —
    # |queries| x nprobe rows, broadcast
    qp = (
        sides.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("dv").alias("q_dv"))
        .join(F.broadcast(probed), "query_id")
    )
    c = sides.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cid").alias("c_cid"),
        F.col("dv").alias("c_dv"),
    )
    approx_sim = dot(F.col("q_dv"), F.col("c_dv")) / (
        l2_norm(F.col("q_dv")) * l2_norm(F.col("c_dv"))
    )
    aw = Window.partitionBy("query_id").orderBy(F.desc("approx_raw"), F.asc("neighbor_id"))
    approx = (
        c.join(
            F.broadcast(qp),
            (F.col("c_cid") == F.col("p_cid"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .withColumn("approx_raw", approx_sim)
        .withColumn("arnk", F.row_number().over(aw))
        .filter(F.col("arnk") <= N_CAND)
        .select("query_id", "neighbor_id", "approx_raw")
    )
    # exact re-rank: fetch full-precision vectors for the k-bounded
    # candidate set only.  The QUERY-side broadcast is filtered to the
    # N_QUERIES rows FIRST (r12 review fix: broadcasting the unfiltered
    # per-row table shipped the whole full-precision corpus to every
    # executor — the unbounded-broadcast class, an OOM at the scale
    # this op's own doc claims); the candidate side stays a plain join.
    qv_full = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_v")
    )
    cv_full = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("c_v"))
    exact_sim = dot(F.col("q_v"), F.col("c_v")) / (
        l2_norm(F.col("q_v")) * l2_norm(F.col("c_v"))
    )
    rw = Window.partitionBy("query_id").orderBy(F.desc("exact_raw"), F.asc("neighbor_id"))
    return (
        approx.join(F.broadcast(qv_full), "query_id")
        .join(cv_full, "neighbor_id")
        .withColumn("exact_raw", exact_sim)
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            pround("exact_raw", 6).alias("cos_sim"),
            pround("approx_raw", 6).alias("approx_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )
# --- round 11: IVF nProbe sweep (recall/cost tuning curve) -------------------

NPROBES = (1, 2, 4)

# centroid dims and query dims quantized to e6 ints BEFORE the
# query→cell ranking, so the probe order is exact integer arithmetic in
# both engines (a raw avg() differs by ULP between engines and could
# flip which cell ranks nprobe-th)
_DUCK_QCELL_SCORE = """
  (SELECT sum(qd.q_e6 * cd.c_e6) * 1.0
          / (sqrt(sum(qd.q_e6 * qd.q_e6) * 1.0)
             * sqrt(sum(cd.c_e6 * cd.c_e6) * 1.0))
   FROM qdims qd JOIN cdims cd ON cd.i = qd.i AND cd.label = l.label
   WHERE qd.query_id = q.vec_id)
"""


@register(
    "similarity_ivf_nprobe_sweep",
    oracle=f"""
    WITH bf AS ({_REG["similarity_topk_bruteforce"].oracle}),
    cdims AS (
      SELECT label, i,
             CAST(floor((2 * sum(CAST(floor(CAST(embedding[i] AS DOUBLE)
                                             * 1000000.0 + 0.5) AS BIGINT))
                         + count(*)) * 1.0 / (2 * count(*))) AS BIGINT) AS c_e6
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
      GROUP BY label, i
    ),
    qdims AS (
      SELECT vec_id AS query_id, i,
             CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000.0 + 0.5)
                  AS BIGINT) AS q_e6
      FROM embeddings,
           LATERAL (SELECT unnest(generate_series(1, len(embedding))) AS i) g
      WHERE vec_id < {N_QUERIES}
    ),
    qcell AS (
      SELECT q.vec_id AS query_id, l.label,
             row_number() OVER (PARTITION BY q.vec_id
                                ORDER BY {_DUCK_QCELL_SCORE} DESC, l.label ASC)
               AS cell_rank
      FROM (SELECT DISTINCT vec_id FROM embeddings WHERE vec_id < {N_QUERIES}) q(vec_id)
      CROSS JOIN (SELECT DISTINCT label FROM embeddings) l(label)
    ),
    np AS (SELECT CAST(unnest([{", ".join(str(p) for p in NPROBES)}]) AS INTEGER) AS nprobe),
    cand AS (
      SELECT np.nprobe, qc.query_id, c.vec_id AS neighbor_id, c.embedding
      FROM np
      JOIN qcell qc ON qc.cell_rank <= np.nprobe
      JOIN embeddings c ON c.label = qc.label AND c.vec_id <> qc.query_id
    ),
    ranked AS (
      SELECT * FROM (
        SELECT cand.nprobe, cand.query_id, cand.neighbor_id,
               row_number() OVER (
                 PARTITION BY cand.nprobe, cand.query_id
                 ORDER BY
                   list_sum(list_transform(generate_series(1, len(q.embedding)),
                     i -> CAST(q.embedding[i] AS DOUBLE) * CAST(cand.embedding[i] AS DOUBLE)))
                   / (sqrt(list_sum(list_transform(generate_series(1, len(q.embedding)),
                        i -> CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE))))
                    * sqrt(list_sum(list_transform(generate_series(1, len(cand.embedding)),
                        i -> CAST(cand.embedding[i] AS DOUBLE) * CAST(cand.embedding[i] AS DOUBLE)))))
                   DESC, cand.neighbor_id ASC) AS rnk
        FROM cand JOIN embeddings q ON q.vec_id = cand.query_id
      ) WHERE rnk <= {TOP_K}
    ),
    cost AS (
      SELECT nprobe, query_id, CAST(count(*) AS BIGINT) AS n_cand
      FROM cand GROUP BY nprobe, query_id
    ),
    hits AS (
      SELECT np.nprobe, bf.query_id,
             CAST(count(r.neighbor_id) AS BIGINT) AS n_hits
      FROM np CROSS JOIN bf
      LEFT JOIN ranked r ON r.nprobe = np.nprobe
                        AND r.query_id = bf.query_id
                        AND r.neighbor_id = bf.neighbor_id
      GROUP BY np.nprobe, bf.query_id
    )
    SELECT h.nprobe,
           CAST(count(*) AS BIGINT) AS n_queries,
           floor(avg(h.n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
             AS mean_recall,
           floor(min(h.n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
             AS min_recall,
           floor(avg(coalesce(c.n_cand, 0) * 1.0) * 1000000.0 + 0.5) / 1000000.0
             AS avg_candidates
    FROM hits h LEFT JOIN cost c ON c.nprobe = h.nprobe AND c.query_id = h.query_id
    GROUP BY h.nprobe
    """,
    doc=f"IVF tuning curve: recall@{TOP_K} AND candidates-scanned cost "
        f"for nProbe in {NPROBES} — the table an ANN deployment reads "
        "to pick its recall/latency point (the recall report flags the "
        "1-cell search as low-recall; this quantifies what each extra "
        "probed cell buys).  Cells are ranked per query by cosine to "
        "the cell CENTROID — centroid and query dims quantized to e6 "
        "ints first, so the probe order is exact cross-engine integer "
        "arithmetic (a raw avg() ULP could flip the nprobe-th cell); "
        "within-cell ranking reuses the exact brute-force cosine, and "
        "ground truth composes the registered brute-force SQL.  Scale "
        "shape: centroids = one (label, dim) partial agg; the "
        "query×cell ranking is |queries|×|cells| (broadcast); "
        "candidates stay cell-confined (nprobe× the IVF query's "
        "candidates, never all-pairs); recall join on k·|queries| "
        "rows.",
    tags=("similarity", "ann", "quality"),
)
def similarity_ivf_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    e = e.repartition(plan_parallelism(spark), "vec_id")
    dims = e.select(
        "vec_id", "label", F.posexplode("embedding").alias("i0", "x")
    ).select(
        "vec_id",
        "label",
        (F.col("i0") + 1).alias("i"),
        F.floor(F.col("x").cast("double") * F.lit(1000000.0) + F.lit(0.5))
        .cast("bigint")
        .alias("x_e6"),
    )
    # centroid dim = round(mean of the QUANTIZED dims) computed as the
    # pure-integer identity floor(s/n + 1/2) = floor((2s+n)/(2n)) over
    # exact int64 sums — order-free AND byte-identical to the oracle
    # (a raw avg() of doubles differs by summation-order ULP between
    # engines and re-rounding a pre-rounded mean rounds a DIFFERENT
    # quantity than the oracle's round-of-raw-mean; both failure modes
    # found by review, both eliminated by rounding the same exact ints)
    cdims = dims.groupBy("label", "i").agg(
        F.floor(
            (2 * F.sum("x_e6") + F.count(F.lit(1)))
            * F.lit(1.0)
            / (2 * F.count(F.lit(1)))
        )
        .cast("bigint")
        .alias("c_e6")
    )
    # query dims from the 10 filtered rows directly — not by re-running
    # the full-corpus explode a second time
    qdims = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .select("vec_id", F.posexplode("embedding").alias("i0", "x"))
        .select(
            F.col("vec_id").alias("query_id"),
            (F.col("i0") + 1).alias("i"),
            F.floor(F.col("x").cast("double") * F.lit(1000000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("q_e6"),
        )
    )
    qc = (
        # cdims is |cells|·|dims| rows (~640) — broadcast kills the
        # dim-key exchange on both sides
        qdims.join(F.broadcast(cdims), "i")
        .groupBy("query_id", "label")
        .agg(
            F.sum(F.col("q_e6") * F.col("c_e6")).cast("bigint").alias("dot_e"),
            F.sum(F.col("q_e6") * F.col("q_e6")).cast("bigint").alias("qq"),
            F.sum(F.col("c_e6") * F.col("c_e6")).cast("bigint").alias("cc"),
        )
        .select(
            "query_id",
            "label",
            (
                F.col("dot_e") * F.lit(1.0)
                / (
                    F.sqrt(F.col("qq") * F.lit(1.0))
                    * F.sqrt(F.col("cc") * F.lit(1.0))
                )
            ).alias("score"),
        )
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("label"))
    qcell = qc.withColumn("cell_rank", F.row_number().over(wq)).select(
        "query_id", "label", "cell_rank"
    )
    nps = spark.createDataFrame([(p,) for p in NPROBES], "nprobe int")
    # ONE scoring pass for all probe depths (optimization r18, VERDICT
    # r17 item 4): a candidate reaches depth d iff the cell that admits
    # it ranks <= d, and its cosine does not depend on d — so the
    # per-(query, neighbor) score is computed ONCE against the
    # max(NPROBES) probe list with the admitting cell's rank carried,
    # and the (nprobe >= cell_rank) fan-out happens AFTER the expensive
    # dot as a map-side explode of already-scored rows.  The old shape
    # exploded the probe list FIRST, so every candidate paid the
    # interpreted 64-dim dot once per depth that admits it (up to
    # |NPROBES|x).  Same rows, same values: the explode emits exactly
    # the depths the old per-depth join produced.
    probe_arr = F.array(*[F.lit(p) for p in NPROBES])
    probed = qcell.filter(F.col("cell_rank") <= max(NPROBES)).select(
        "query_id", "label", "cell_rank"
    )
    c = e.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("c_label"),
        F.col("embedding").alias("c_emb"),
        l2_norm(F.col("embedding")).alias("c_norm"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        l2_norm(F.col("embedding")).alias("q_norm"),
    )
    cand = (
        c.join(
            F.broadcast(probed),
            (c.c_label == probed.label) & (F.col("neighbor_id") != probed.query_id),
        )
        .join(F.broadcast(q), F.col("query_id") == F.col("q_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell_rank",
            (
                dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("raw_sim"),
        )
        .select(
            F.explode(
                F.filter(probe_arr, lambda p: F.col("cell_rank") <= p)
            ).alias("nprobe"),
            "query_id",
            "neighbor_id",
            "raw_sim",
        )
    )
    wr = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("raw_sim"), F.asc("neighbor_id")
    )
    # the candidates-scanned cost rides the SAME window pass as the
    # ranking (count over the whole group), so the candidate set is
    # generated exactly once — no checkpoint, no second scan branch
    wall = Window.partitionBy("nprobe", "query_id")
    ranked = (
        cand.withColumn("n_cand", F.count(F.lit(1)).over(wall).cast("bigint"))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            F.col("nprobe").alias("r_np"),
            F.col("query_id").alias("r_qid"),
            F.col("neighbor_id").alias("r_nid"),
            "n_cand",
        )
        .localCheckpoint(eager=False)
    )
    cost = ranked.groupBy("r_np", "r_qid").agg(
        F.max("n_cand").cast("bigint").alias("n_cand")
    ).select(
        F.col("r_np").alias("c_np"),
        F.col("r_qid").alias("c_qid"),
        "n_cand",
    )
    bf = similarity_topk_bruteforce(spark, sf_dir).select(
        F.col("query_id").alias("bf_qid"), F.col("neighbor_id").alias("bf_neighbor")
    )
    hits = (
        bf.crossJoin(F.broadcast(nps.select(F.col("nprobe").alias("np"))))
        .join(
            # k·|queries|·|nprobes| rows — broadcast, no exchange
            F.broadcast(ranked),
            (F.col("bf_qid") == F.col("r_qid"))
            & (F.col("bf_neighbor") == F.col("r_nid"))
            & (F.col("np") == F.col("r_np")),
            "left",
        )
        .groupBy(F.col("np"), F.col("bf_qid"))
        .agg(F.count(F.col("r_nid")).cast("bigint").alias("n_hits"))
    )
    return (
        # LEFT join + coalesce (r12 review fix): cost rows exist only
        # for (nprobe, query) groups with >= 1 candidate, so an inner
        # join DROPPED queries whose probed cells held nothing —
        # inflating mean/min recall exactly when probing fails; a
        # failed query must count with recall 0 and 0 candidates
        hits.join(
            F.broadcast(cost),  # |nprobes|·|queries| rows
            (F.col("np") == F.col("c_np")) & (F.col("bf_qid") == F.col("c_qid")),
            "left",
        )
        .withColumn("n_cand", F.coalesce(F.col("n_cand"), F.lit(0)))
        .groupBy(F.col("np").cast("int").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            pround(F.avg(F.col("n_hits") * F.lit(1.0) / F.lit(TOP_K)), 6).alias(
                "mean_recall"
            ),
            pround(F.min(F.col("n_hits") * F.lit(1.0) / F.lit(TOP_K)), 6).alias(
                "min_recall"
            ),
            pround(F.avg(F.col("n_cand") * F.lit(1.0)), 6).alias("avg_candidates"),
        )
    )




# ---------------------------------------------------------------------------
# IVF + PQ composed: the billion-scale ANN serving layout (round 16,
# VERDICT r15 item 3; coarse quantizer made real geometry in round 17,
# VERDICT r16 item 2).  The pieces built in earlier rounds — the
# k-means cell machinery (operators/_kmeans), the nprobe probe ranking
# (similarity_ivf_nprobe_sweep above) and the product-quantization
# codebook (curation.embedding_product_quantization) — compose here
# into the standard IVFADC plan of Jégou et al. 2011.
# ---------------------------------------------------------------------------

# PQ geometry — MUST match operators/curation.py's
# embedding_product_quantization (tests/test_quality.py pins the
# equality so the two files cannot drift apart; a module-level import
# from curation would reorder registry base positions, so the three
# ints are mirrored instead).
IVFPQ_M = 8        # subspaces (64-dim embeddings -> 8 x 8-dim subvectors)
IVFPQ_SUBDIM = 8
IVFPQ_K = 4        # codebook entries per subspace (seed rows vec_id < 4)
# PQ codes are far coarser than uint8 scalar quantization (2 bits vs 8
# per subdim), so the exact re-rank gets a wider candidate budget than
# the scalar-quantized path — still k-bounded per query, independent
# of corpus size.  12·k (vs r16's 4·k): with real k-means cells the
# probed candidate pool is genuinely proximate, so a wider ADC short-
# list converts directly into recall (measured in
# artifacts/ivfpq_recall_r17.json: 0.44 at 4·k -> ~0.8 at 12·k, sf0.1).
IVFPQ_NCAND = 12 * TOP_K

_DUCK_IVFPQ_SUB = f"""
      SELECT vec_id, gs.m,
             list_slice(v, gs.m * {IVFPQ_SUBDIM} + 1,
                        gs.m * {IVFPQ_SUBDIM} + {IVFPQ_SUBDIM}) AS sv
      FROM e, LATERAL (SELECT unnest(generate_series(0, {IVFPQ_M - 1})) AS m) gs
"""


def ivfpq_subvectors(e: DataFrame) -> DataFrame:
    """(vec_id, m, sv): each vector split into the M per-subspace
    subvectors — the shared first step of training, encoding and the
    query-side LUT build (one definition, so the streaming index sink
    and the batch query cannot drift)."""
    return e.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(IVFPQ_M - 1))).alias("m"),
        "v",
    ).select(
        "vec_id",
        "m",
        F.slice(F.col("v"), F.col("m") * IVFPQ_SUBDIM + 1, IVFPQ_SUBDIM).alias("sv"),
    )


def ivfpq_codebook(sub: DataFrame) -> DataFrame:
    """(m, k, cv) PQ codebook: IVFPQ_M x IVFPQ_K rows from the
    deterministic seed protocol (subvectors of vec_id < IVFPQ_K) —
    constant-size by construction, so its broadcast is justified."""
    return sub.filter(F.col("vec_id") < IVFPQ_K).select(
        "m", F.col("vec_id").alias("k"), F.col("sv").alias("cv")
    )


def ivfpq_codebook_rows(sf_dir: str) -> list[tuple[int, int, list[float]]]:
    """The (m, k, cv) codebook rows read DRIVER-SIDE from the parquet
    input (barrier-free bounded read, optimization r17): subvector
    slices of the IVFPQ_K seed rows — element-for-element what
    `ivfpq_codebook(ivfpq_subvectors(e))` computes, without paying a
    Spark collect barrier for M·K constant rows."""
    seeds = fastvec.read_vectors_driver(sf_dir, IVFPQ_K)
    return [
        (m, vid, coords[m * IVFPQ_SUBDIM : (m + 1) * IVFPQ_SUBDIM])
        for vid, coords in seeds
        for m in range(IVFPQ_M)
    ]


def ivfpq_codes(
    sub: DataFrame,
    cent: DataFrame,
    cent_rows: list[tuple[int, int, list[float]]] | None = None,
) -> DataFrame:
    """(vec_id, m, k): nearest codebook entry per (vector, subspace).
    The squared distances are the same left-to-right double fold as
    the PQ operator (bit-identical cross-engine) with ties to the
    lowest k — evaluated MAP-ONLY by the vectorized encode kernel
    (optimization r17: the broadcast-join + HOF + min-of-struct form
    paid one exchange plus an interpreted lambda per element).  The
    M·K-row codebook ships in the kernel closure: from `cent_rows`
    when the caller already has it (the registered queries read the
    seed rows driver-side), else via a bounded collect of `cent` (the
    streaming index path, whose codebook is a trained model frame)."""
    if cent_rows is None:
        cent_rows = [
            (row[0], row[1], list(row[2]))
            for row in cent.select("m", "k", "cv").collect()
        ]
    return fastvec.nearest_code(sub, cent_rows)


def _adc_query_tables(
    spark: SparkSession,
    query_rows: list[tuple[int, list[float]]],
    cent_rows: list[tuple[int, int, list[float]]],
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """(qn, lut, cnorm) for the ADC serving plan, computed DRIVER-SIDE
    from the bounded query/codebook rows (optimization r18): the three
    tables are |queries|, |queries|·M·K and M·K rows of pure arithmetic
    on already-driver-read vectors — building them as distributed
    subtrees cost a corpus-scan + filter + explode + broadcast-join
    chain (and two broadcast barrier jobs) per consumer, for a few
    hundred constant rows.  Bit-identity with the HOF forms
    (tests/test_fastvec.py + test_semantics_similarity pins): the dot
    is the same left-to-right float64 fold (`fastvec.exact_dot`), the
    e6 quantization the same IEEE multiply/add/floor, and sqrt is
    correctly rounded on both sides."""
    import math

    lut_rows = []
    qn_rows = []
    for qid, v in query_rows:
        vv = np.array(v, dtype=np.float64)
        qn_rows.append((qid, float(np.sqrt(fastvec.exact_dot(vv, vv)))))
        for m, k, cv in cent_rows:
            sv = vv[m * IVFPQ_SUBDIM : (m + 1) * IVFPQ_SUBDIM]
            pd = float(fastvec.exact_dot(sv, np.array(cv, dtype=np.float64)))
            lut_rows.append((qid, m, k, int(math.floor(pd * 1e6 + 0.5))))
    cnorm_rows = []
    for m, k, cv in cent_rows:
        cvv = np.array(cv, dtype=np.float64)
        cn2 = float(fastvec.exact_dot(cvv, cvv))
        cnorm_rows.append((m, k, int(math.floor(cn2 * 1e6 + 0.5))))
    qn = spark.createDataFrame(qn_rows, "query_id bigint, q_norm double")
    lut = spark.createDataFrame(
        lut_rows, "query_id bigint, lm int, lk bigint, pdot_e6 bigint"
    )
    cnorm = spark.createDataFrame(cnorm_rows, "m int, k bigint, cn2_e6 bigint")
    return qn, lut, cnorm


def ivfpq_adc_topk(
    e: DataFrame,
    sub: DataFrame,
    cent: DataFrame,
    codes: DataFrame,
    probed: DataFrame,
    model_rows: tuple[list, list] | None = None,
) -> DataFrame:
    """The IVFADC serving plan given an encoded corpus: ADC scoring of
    `codes` (neighbor_id, c_cid, m, k) against the per-query broadcast
    LUT, then the k-bounded exact re-rank from full-precision vectors
    in `e`.  Shared verbatim between the registered batch query and
    the streaming code-store search (`streaming/sinks.py`), so the two
    serving paths cannot drift.

    `model_rows=(query_rows, cent_rows)`: when the caller already holds
    the bounded query vectors and codebook rows driver-side (the
    registered batch queries read both from the parquet seed rows), the
    qn/lut/cnorm tables are built by `_adc_query_tables` instead of as
    distributed subtrees — same values (bit-identity pinned by tests),
    several plan subtrees and broadcast barriers fewer.  The streaming
    path keeps the frame-based form (its codebook is a trained model
    frame)."""
    if model_rows is not None:
        qrows, crows = model_rows
        qn, lut, cnorm = _adc_query_tables(e.sparkSession, qrows, crows)
    else:
        cnorm = cent.select(
            "m",
            "k",
            F.floor(dot(F.col("cv"), F.col("cv")) * F.lit(1e6) + F.lit(0.5))
            .cast("bigint")
            .alias("cn2_e6"),
        )
        qn = e.filter(F.col("vec_id") < N_QUERIES).select(
            F.col("vec_id").alias("query_id"),
            l2_norm(F.col("v")).alias("q_norm"),
        )
        # the ADC lookup table: |queries| x M x K exact-int partial dots
        lut = (
            sub.filter(F.col("vec_id") < N_QUERIES)
            .join(F.broadcast(cent), "m")
            .select(
                F.col("vec_id").alias("query_id"),
                F.col("m").alias("lm"),
                F.col("k").alias("lk"),
                F.floor(dot(F.col("sv"), F.col("cv")) * F.lit(1e6) + F.lit(0.5))
                .cast("bigint")
                .alias("pdot_e6"),
            )
        )
    # LUT x probe list: |queries| x nprobe x M x K rows — constant per
    # query, broadcast; the corpus side never rehydrates a float vector
    plq = lut.join(F.broadcast(qn), "query_id").join(F.broadcast(probed), "query_id")
    adc = (
        codes.join(F.broadcast(cnorm), ["m", "k"])
        .join(
            F.broadcast(plq),
            (F.col("c_cid") == F.col("p_cid"))
            & (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("m") == F.col("lm"))
            & (F.col("k") == F.col("lk")),
        )
        .groupBy("query_id", "neighbor_id", "q_norm")
        .agg(
            F.sum("pdot_e6").cast("bigint").alias("adot_e6"),
            F.sum("cn2_e6").cast("bigint").alias("cn2s_e6"),
        )
    )
    approx_raw = (F.col("adot_e6") * F.lit(1.0) / F.lit(1e6)) / (
        F.col("q_norm") * F.sqrt(F.col("cn2s_e6") * F.lit(1.0) / F.lit(1e6))
    )
    aw = Window.partitionBy("query_id").orderBy(
        F.desc("approx_raw"), F.asc("neighbor_id")
    )
    approx = (
        adc.withColumn("approx_raw", approx_raw)
        .withColumn("arnk", F.row_number().over(aw))
        .filter(F.col("arnk") <= IVFPQ_NCAND)
        .select("query_id", "neighbor_id", "approx_raw")
    )
    # exact re-rank: full-precision vectors for the k-bounded candidate
    # set only; query side filtered BEFORE broadcast (the r12 rule)
    qv_full = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_v")
    )
    cv_full = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("c_v"))
    exact_sim = dot(F.col("q_v"), F.col("c_v")) / (
        l2_norm(F.col("q_v")) * l2_norm(F.col("c_v"))
    )
    rw = Window.partitionBy("query_id").orderBy(
        F.desc("exact_raw"), F.asc("neighbor_id")
    )
    return (
        approx.join(F.broadcast(qv_full), "query_id")
        .join(cv_full, "neighbor_id")
        .withColumn("exact_raw", exact_sim)
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            "query_id",
            "neighbor_id",
            pround("exact_raw", 6).alias("cos_sim"),
            pround("approx_raw", 6).alias("approx_sim"),
            F.col("rnk").cast("int").alias("rnk"),
        )
    )


@register(
    "similarity_topk_ivfpq",
    oracle=f"""
    {_IVF_SQL_CELLS}, sub AS ({_DUCK_IVFPQ_SUB}
    ), cent AS (
      SELECT m, vec_id AS k, sv AS cv FROM sub WHERE vec_id < {IVFPQ_K}
    ), cnorm AS (
      SELECT m, k,
             CAST(floor(list_sum(list_transform(generate_series(1, {IVFPQ_SUBDIM}),
                  j -> cv[j] * cv[j])) * 1000000.0 + 0.5) AS BIGINT) AS cn2_e6
      FROM cent
    ), dists AS (
      SELECT s.vec_id, s.m, c.k,
             list_sum(list_transform(generate_series(1, {IVFPQ_SUBDIM}),
                 j -> (s.sv[j] - c.cv[j]) * (s.sv[j] - c.cv[j]))) AS dist2
      FROM sub s JOIN cent c USING (m)
    ), codes AS (
      SELECT r.vec_id AS neighbor_id, cl.cid, r.m, r.k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist2, k) AS rn
        FROM dists
      ) r JOIN cells cl USING (vec_id)
      WHERE r.rn = 1
    ), qn AS (
      SELECT vec_id AS query_id,
             sqrt(list_sum(list_transform(generate_series(1, len(v)),
                  i -> v[i] * v[i]))) AS q_norm
      FROM e WHERE vec_id < {N_QUERIES}
    ), lut AS (
      SELECT s.vec_id AS query_id, s.m, c.k,
             CAST(floor(list_sum(list_transform(generate_series(1, {IVFPQ_SUBDIM}),
                  j -> s.sv[j] * c.cv[j])) * 1000000.0 + 0.5) AS BIGINT) AS pdot_e6
      FROM sub s JOIN cent c USING (m)
      WHERE s.vec_id < {N_QUERIES}
    ), adc AS (
      SELECT q.query_id, co.neighbor_id, q.q_norm,
             CAST(sum(l.pdot_e6) AS BIGINT) AS adot_e6,
             CAST(sum(cn.cn2_e6) AS BIGINT) AS cn2s_e6
      FROM codes co
      JOIN qprobe p ON p.cid = co.cid
      JOIN qn q ON q.query_id = p.query_id AND co.neighbor_id <> q.query_id
      JOIN lut l ON l.query_id = q.query_id AND l.m = co.m AND l.k = co.k
      JOIN cnorm cn ON cn.m = co.m AND cn.k = co.k
      GROUP BY q.query_id, co.neighbor_id, q.q_norm
    ), approx AS (
      SELECT * FROM (
        SELECT query_id, neighbor_id,
               (adot_e6 * 1.0 / 1000000.0)
                 / (q_norm * sqrt(cn2s_e6 * 1.0 / 1000000.0)) AS approx_raw,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY (adot_e6 * 1.0 / 1000000.0)
                   / (q_norm * sqrt(cn2s_e6 * 1.0 / 1000000.0)) DESC,
                   neighbor_id ASC) AS arnk
        FROM adc
      ) WHERE arnk <= {IVFPQ_NCAND}
    )
    SELECT query_id, neighbor_id,
           floor(exact_raw * 1000000.0 + 0.5) / 1000000.0 AS cos_sim,
           floor(approx_raw * 1000000.0 + 0.5) / 1000000.0 AS approx_sim,
           CAST(rnk AS INTEGER) AS rnk
    FROM (
      SELECT a.query_id, a.neighbor_id, a.approx_raw,
             {_duck_dq_cos("q.v", "c.v")} AS exact_raw,
             row_number() OVER (PARTITION BY a.query_id
                                ORDER BY {_duck_dq_cos("q.v", "c.v")} DESC,
                                         a.neighbor_id ASC) AS rnk
      FROM approx a
      JOIN e q ON q.vec_id = a.query_id
      JOIN e c ON c.vec_id = a.neighbor_id
    ) WHERE rnk <= {TOP_K}
    """,
    doc=f"IVFADC — the production billion-scale ANN layout (Jégou et "
        f"al. 2011), composing the k-means IVF coarse quantizer "
        f"(IVF_NCELLS={IVF_NCELLS} cells, nprobe={IVF_NPROBE} — real "
        f"geometry since round 17, replacing the label-as-cell "
        f"stand-in that capped recall at 0.08–0.16) with the PQ "
        f"codebook of embedding_product_quantization: the corpus at "
        f"rest is ONLY (cell, m, code) rows — log2({IVFPQ_K})·{IVFPQ_M} "
        f"bits per vector, the ~100 TB -> ~1 TB compression rung that "
        f"makes a full-corpus resident index possible at all.  Per "
        f"query, an asymmetric-distance lookup table (full-precision "
        f"query subvector · every codebook entry = {IVFPQ_M}x{IVFPQ_K} "
        f"partial dots) is built and BROADCAST "
        f"(|queries|·{IVFPQ_M * IVFPQ_K} rows — constant per query, "
        f"never corpus-sized); scoring a candidate is then {IVFPQ_M} "
        f"LUT additions via an equi-join on (cell, m, code) — no "
        f"float vector is touched until the exact re-rank fetches "
        f"full precision for the top-{IVFPQ_NCAND} candidates per "
        f"query (k-bounded regardless of corpus size).  Cross-engine "
        f"determinism: LUT partial dots and codebook-entry norms are "
        f"quantized to e6 int64 BEFORE the per-candidate sums, so the "
        f"approximate ORDER is exact integer arithmetic and the "
        f"emitted approx_sim is bit-identical; the exact re-rank "
        f"reuses the proven left-to-right double fold.  Recall vs "
        f"brute force is recorded in artifacts/ivfpq_recall_r17.json "
        f"(same sweep style as similarity_ivf_nprobe_sweep).",
    tags=("similarity", "ann"),
)
def similarity_topk_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    e = e.repartition(plan_parallelism(spark), "vec_id")
    cells, probed = _ivf_cells_and_probe(spark, sf_dir, emb=e)
    sub = ivfpq_subvectors(e)
    # encode the corpus, then tag each code row with its IVF cell.
    # Codebook AND query rows ride driver-side bounded reads
    # (optimization r18): the qn/lut/cnorm subtrees disappear from the
    # plan — see _adc_query_tables
    crows = ivfpq_codebook_rows(sf_dir)
    codes = ivfpq_codes(sub, None, cent_rows=crows).join(cells, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cid").alias("c_cid"),
        "m",
        "k",
    )
    qrows = fastvec.read_vectors_driver(sf_dir, N_QUERIES)
    return ivfpq_adc_topk(e, sub, None, codes, probed, model_rows=(qrows, crows))


# ---------------------------------------------------------------------------
# round-17 additions: diagnostics for the REAL coarse quantizer — the
# tuning curve and the cell-balance profile an IVF deployment reads
# before committing to (ncells, nprobe).
# ---------------------------------------------------------------------------


@register(
    "similarity_cell_balance_report",
    oracle=f"""
    {_IVF_SQL_CELLS}
    SELECT CAST(c1.cid AS INTEGER) AS cid,
           CAST(count(cl.vec_id) AS BIGINT) AS n_vectors,
           floor(count(cl.vec_id) * 1000000.0 / (SELECT count(*) FROM e) + 0.5)
             / 1000000.0 AS share,
           floor(count(cl.vec_id) * {IVF_NCELLS} * 1000000.0
                 / (SELECT count(*) FROM e) + 0.5) / 1000000.0 AS balance
    FROM cent1 c1 LEFT JOIN cells cl ON cl.cid = c1.cid
    GROUP BY c1.cid
    """,
    doc=f"IVF cell-balance profile of the k-means coarse quantizer "
        f"({IVF_NCELLS} cells): per-cell vector count, corpus share, "
        "and balance factor (count x ncells / N — 1.0 is perfectly "
        "uniform).  THE operational skew diagnostic for an IVF "
        "deployment: a hot cell (balance >> 1) makes every probe that "
        "ranks it scan a corpus-scale partition, and empty cells "
        "(balance 0, possible because duplicate seed vectors retain "
        "their init centroid) waste list slots — this table is what "
        "decides a re-fit.  Emitted from the CENTROID list left-joined "
        "to the assignment so empty cells appear as explicit zero "
        "rows.  Scale shape: one broadcast-NLJ assignment pass + a "
        f"{IVF_NCELLS}-row aggregate; the total-count scalar rides a "
        "1-row broadcast, nothing corpus-sized shuffles.",
    tags=("similarity", "ann", "quality"),
)
def similarity_cell_balance_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _km.embeddings_double(spark, sf_dir).repartition(
        plan_parallelism(spark), "vec_id"
    )
    crows = _km.final_centroid_rows(spark, sf_dir, IVF_NCELLS, IVF_DECIMALS)
    cells = _km.assign_rows(emb, crows).select("vec_id", "cid")
    total = emb.agg(F.count(F.lit(1)).alias("n_total"))
    cid_frame = spark.createDataFrame(
        [(cid,) for cid, _ in crows], "cid bigint"
    )
    per_cell = (
        cid_frame
        .join(cells, "cid", "left")
        .groupBy("cid")
        .agg(F.count("vec_id").cast("bigint").alias("n_vectors"))
    )
    # the rounded divisions mirror the oracle's operand order EXACTLY
    # (one double division each, scaled-int numerator first): a
    # pround-of-quotient would round a twice-rounded double instead
    return (
        per_cell.crossJoin(F.broadcast(total))
        .select(
            F.col("cid").cast("int").alias("cid"),
            "n_vectors",
            (
                F.floor(
                    F.col("n_vectors") * F.lit(1000000.0) / F.col("n_total")
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("share"),
            (
                F.floor(
                    F.col("n_vectors") * F.lit(IVF_NCELLS) * F.lit(1000000.0)
                    / F.col("n_total")
                    + F.lit(0.5)
                )
                / F.lit(1000000.0)
            ).alias("balance"),
        )
    )


@register(
    "similarity_kmeans_nprobe_sweep",
    oracle=f"""
    WITH bf AS ({_REG["similarity_topk_bruteforce"].oracle}),
    {_km.sql_ctes(IVF_NCELLS, IVF_DECIMALS, leading_with=False)}, cells AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM d2
      ) WHERE rn = 1
    ), qcell AS (
      SELECT vec_id AS query_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid)
               AS cell_rank
      FROM d2 WHERE vec_id < {N_QUERIES}
    ), np AS (SELECT CAST(unnest([{", ".join(str(p) for p in NPROBES)}]) AS INTEGER) AS nprobe),
    cand AS (
      SELECT np.nprobe, qc.query_id, cl.vec_id AS neighbor_id
      FROM np
      JOIN qcell qc ON qc.cell_rank <= np.nprobe
      JOIN cells cl ON cl.cid = qc.cid AND cl.vec_id <> qc.query_id
    ),
    ranked AS (
      SELECT * FROM (
        SELECT cand.nprobe, cand.query_id, cand.neighbor_id,
               row_number() OVER (
                 PARTITION BY cand.nprobe, cand.query_id
                 ORDER BY {_duck_dq_cos("q.v", "c.v")} DESC,
                          cand.neighbor_id ASC) AS rnk
        FROM cand
        JOIN e q ON q.vec_id = cand.query_id
        JOIN e c ON c.vec_id = cand.neighbor_id
      ) WHERE rnk <= {TOP_K}
    ),
    cost AS (
      SELECT nprobe, query_id, CAST(count(*) AS BIGINT) AS n_cand
      FROM cand GROUP BY nprobe, query_id
    ),
    hits AS (
      SELECT np.nprobe, bf.query_id,
             CAST(count(r.neighbor_id) AS BIGINT) AS n_hits
      FROM np CROSS JOIN bf
      LEFT JOIN ranked r ON r.nprobe = np.nprobe
                        AND r.query_id = bf.query_id
                        AND r.neighbor_id = bf.neighbor_id
      GROUP BY np.nprobe, bf.query_id
    )
    SELECT h.nprobe,
           CAST(count(*) AS BIGINT) AS n_queries,
           floor(avg(h.n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
             AS mean_recall,
           floor(min(h.n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
             AS min_recall,
           floor(avg(coalesce(c.n_cand, 0) * 1.0) * 1000000.0 + 0.5) / 1000000.0
             AS avg_candidates
    FROM hits h LEFT JOIN cost c ON c.nprobe = h.nprobe AND c.query_id = h.query_id
    GROUP BY h.nprobe
    """,
    doc=f"The IVF tuning curve over the REAL coarse quantizer: "
        f"recall@{TOP_K} and candidates-scanned cost for nProbe in "
        f"{NPROBES} against the {IVF_NCELLS} k-means cells the serving "
        "path (similarity_topk_ivf_quantized / similarity_topk_ivfpq) "
        "actually probes — the sibling of similarity_ivf_nprobe_sweep, "
        "which sweeps the label-cell stand-in and exists to show what "
        "a geometry-blind partition costs.  Probe order ranks cells "
        "by exact squared-L2 to the centroid (dist2 asc, cid asc — "
        "the serving path's contract), within-cell ranking is the "
        "exact brute-force cosine, ground truth composes the "
        "registered brute-force SQL.  Scale shape: centroids are a "
        "K-row lazily-checkpointed broadcast shared by the corpus "
        "assignment and the probe ranking; candidates stay "
        "cell-confined (never all-pairs); the recall join runs on "
        "k-bounded rows.",
    tags=("similarity", "ann", "quality"),
)
def similarity_kmeans_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _km.embeddings_double(spark, sf_dir).repartition(
        plan_parallelism(spark), "vec_id"
    )
    crows = _km.final_centroid_rows(spark, sf_dir, IVF_NCELLS, IVF_DECIMALS)
    cells = _km.assign_rows(e, crows).select("vec_id", "cid")
    qscore = _km.scored_rows(
        e.filter(F.col("vec_id") < N_QUERIES), crows
    ).select(F.col("vec_id").alias("query_id"), "cid", "dist2")
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cid"))
    qcell = qscore.withColumn("cell_rank", F.row_number().over(wq)).select(
        "query_id", "cid", "cell_rank"
    )
    # ONE scoring pass for all probe depths (optimization r18, same
    # restructure as similarity_ivf_nprobe_sweep): the admitting cell's
    # rank rides the probe list, the exact cosine is computed once per
    # (query, neighbor), and the (nprobe >= cell_rank) fan-out explodes
    # already-scored rows — the old shape paid the interpreted 64-dim
    # dot once per depth that admits the candidate.
    probe_arr = F.array(*[F.lit(p) for p in NPROBES])
    probed = qcell.filter(F.col("cell_rank") <= max(NPROBES)).select(
        "query_id",
        F.col("cid").alias("p_cid"),
        "cell_rank",
    )
    c = e.join(cells, "vec_id").select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cid").alias("c_cid"),
        F.col("v").alias("c_emb"),
        l2_norm(F.col("v")).alias("c_norm"),
    )
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("q_id"),
        F.col("v").alias("q_emb"),
        l2_norm(F.col("v")).alias("q_norm"),
    )
    cand = (
        c.join(
            F.broadcast(probed),
            (F.col("c_cid") == F.col("p_cid"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .join(F.broadcast(q), F.col("query_id") == F.col("q_id"))
        .select(
            "query_id",
            "neighbor_id",
            "cell_rank",
            (
                dot(F.col("q_emb"), F.col("c_emb"))
                / (F.col("q_norm") * F.col("c_norm"))
            ).alias("raw_sim"),
        )
        .select(
            F.explode(
                F.filter(probe_arr, lambda p: F.col("cell_rank") <= p)
            ).alias("nprobe"),
            "query_id",
            "neighbor_id",
            "raw_sim",
        )
    )
    wr = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("raw_sim"), F.asc("neighbor_id")
    )
    wall = Window.partitionBy("nprobe", "query_id")
    ranked = (
        cand.withColumn("n_cand", F.count(F.lit(1)).over(wall).cast("bigint"))
        .withColumn("rnk", F.row_number().over(wr))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            F.col("nprobe").alias("r_np"),
            F.col("query_id").alias("r_qid"),
            F.col("neighbor_id").alias("r_nid"),
            "n_cand",
        )
        .localCheckpoint(eager=False)
    )
    cost = (
        ranked.groupBy("r_np", "r_qid")
        .agg(F.max("n_cand").cast("bigint").alias("n_cand"))
        .select(
            F.col("r_np").alias("c_np"),
            F.col("r_qid").alias("c_qid"),
            "n_cand",
        )
    )
    nps = spark.createDataFrame([(p,) for p in NPROBES], "nprobe int")
    bf = similarity_topk_bruteforce(spark, sf_dir).select(
        F.col("query_id").alias("bf_qid"), F.col("neighbor_id").alias("bf_neighbor")
    )
    hits = (
        bf.crossJoin(F.broadcast(nps.select(F.col("nprobe").alias("np"))))
        .join(
            F.broadcast(ranked),
            (F.col("bf_qid") == F.col("r_qid"))
            & (F.col("bf_neighbor") == F.col("r_nid"))
            & (F.col("np") == F.col("r_np")),
            "left",
        )
        .groupBy(F.col("np"), F.col("bf_qid"))
        .agg(F.count(F.col("r_nid")).cast("bigint").alias("n_hits"))
    )
    return (
        # LEFT join + coalesce: a query whose probed cells hold nothing
        # must count with recall 0 and 0 candidates (the label sweep's
        # r12 lesson)
        hits.join(
            F.broadcast(cost),
            (F.col("np") == F.col("c_np")) & (F.col("bf_qid") == F.col("c_qid")),
            "left",
        )
        .withColumn("n_cand", F.coalesce(F.col("n_cand"), F.lit(0)))
        .groupBy(F.col("np").cast("int").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            pround(F.avg(F.col("n_hits") * F.lit(1.0) / F.lit(TOP_K)), 6).alias(
                "mean_recall"
            ),
            pround(F.min(F.col("n_hits") * F.lit(1.0) / F.lit(TOP_K)), 6).alias(
                "min_recall"
            ),
            pround(F.avg(F.col("n_cand") * F.lit(1.0)), 6).alias("avg_candidates"),
        )
    )


@register(
    "similarity_pq_code_histogram",
    oracle=f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), sub AS ({_DUCK_IVFPQ_SUB}
    ), cent AS (
      SELECT m, vec_id AS k, sv AS cv FROM sub WHERE vec_id < {IVFPQ_K}
    ), dists AS (
      SELECT s.vec_id, s.m, c.k,
             list_sum(list_transform(generate_series(1, {IVFPQ_SUBDIM}),
                 j -> (s.sv[j] - c.cv[j]) * (s.sv[j] - c.cv[j]))) AS dist2
      FROM sub s JOIN cent c USING (m)
    ), codes AS (
      SELECT vec_id, m, k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist2, k) AS rn
        FROM dists
      ) WHERE rn = 1
    )
    SELECT CAST(c.m AS INTEGER) AS m, CAST(c.k AS INTEGER) AS k,
           CAST(count(co.vec_id) AS BIGINT) AS n_vectors,
           floor(count(co.vec_id) * 1000000.0 / (SELECT count(*) FROM e) + 0.5)
             / 1000000.0 AS share
    FROM cent c LEFT JOIN codes co ON co.m = c.m AND co.k = c.k
    GROUP BY c.m, c.k
    """,
    doc=f"PQ codebook utilization: per (subspace, code) assignment "
        f"counts and corpus share over the {IVFPQ_M}x{IVFPQ_K} "
        "codebook — the code-side twin of "
        "similarity_cell_balance_report.  A PQ deployment reads this "
        "before trusting its index: a dead codebook entry (share 0, "
        "emitted as an explicit zero row via the centroid-list left "
        "join) wastes a quantization cell and halves the effective "
        "bits of its subspace, and a dominant entry means the "
        "subspace's distances carry almost no signal — both are "
        "re-train triggers.  Encoding is the LITERALLY shared "
        "ivfpq_subvectors/ivfpq_codes helpers, so the histogram "
        "describes exactly the codes similarity_topk_ivfpq and the "
        "streaming index sink store.  Scale shape: one broadcast "
        "codebook encode pass + a 32-row aggregate; the total-count "
        "scalar rides a 1-row broadcast.",
    tags=("similarity", "ann", "quality"),
)
def similarity_pq_code_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _km.embeddings_double(spark, sf_dir).repartition(
        plan_parallelism(spark), "vec_id"
    )
    sub = ivfpq_subvectors(e)
    # ONE codebook source (VERDICT r17 item 4): the (m, k) key grid and
    # the encode kernel's closure both come from the same driver-side
    # ivfpq_codebook_rows read — the old distributed ivfpq_codebook(sub)
    # frame for the grid was a second derivation of the same constant
    # table inside one query, a drift hazard (and a whole extra scan +
    # filter subtree in the plan for M·K constant rows)
    crows = ivfpq_codebook_rows(sf_dir)
    codes = ivfpq_codes(sub, None, cent_rows=crows)
    grid = spark.createDataFrame(
        sorted({(m, k) for m, k, _ in crows}), "m int, k bigint"
    )
    total = e.agg(F.count(F.lit(1)).alias("n_total"))
    per_code = (
        grid
        .join(codes, ["m", "k"], "left")
        .groupBy("m", "k")
        .agg(F.count("vec_id").cast("bigint").alias("n_vectors"))
    )
    # share mirrors the oracle's operand order exactly (scaled-int
    # numerator, ONE double division) — the cell-balance precedent
    return per_code.crossJoin(F.broadcast(total)).select(
        F.col("m").cast("int").alias("m"),
        F.col("k").cast("int").alias("k"),
        "n_vectors",
        (
            F.floor(
                F.col("n_vectors") * F.lit(1000000.0) / F.col("n_total") + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("share"),
    )


@register(
    "similarity_ivfpq_recall_report",
    oracle=f"""
    WITH bf AS ({_REG["similarity_topk_bruteforce"].oracle}),
    pq AS ({_REG["similarity_topk_ivfpq"].oracle}),
    hits AS (
      SELECT bf.query_id,
             CAST(count(pq.neighbor_id) AS BIGINT) AS n_hits
      FROM bf LEFT JOIN pq
        ON pq.query_id = bf.query_id AND pq.neighbor_id = bf.neighbor_id
      GROUP BY bf.query_id
    )
    SELECT CAST({TOP_K} AS INTEGER)            AS k,
           CAST(count(*) AS BIGINT)            AS n_queries,
           floor(avg(n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
                                               AS mean_recall,
           floor(min(n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
                                               AS min_recall
    FROM hits
    """,
    doc=f"recall@{TOP_K} of the FULL IVFADC serving path "
        "(similarity_topk_ivfpq: k-means coarse quantizer, "
        f"nprobe={IVF_NPROBE}, PQ-coded ADC short-list, exact re-rank) "
        "against the exact brute-force ranking — the headline quality "
        "number of the round-17 quantizer rework, REGISTERED so the "
        "driver re-verifies it every rotation instead of trusting a "
        "point-in-time artifact (artifacts/ivfpq_recall_r17.json is "
        "the sweep twin; the label-cell era this replaced measured "
        "0.08–0.16 here).  Same composition discipline as "
        "similarity_recall_report: the oracle embeds the two queries' "
        "own SQL, so the report cannot drift from what they return.  "
        "Scale: both rankings are the registered queries' plans; the "
        "comparison joins k·|queries|-row result sets.",
    tags=("similarity", "ann", "quality"),
)
def similarity_ivfpq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    bf = similarity_topk_bruteforce(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("bf_neighbor")
    )
    pq = similarity_topk_ivfpq(spark, sf_dir).select(
        "query_id", F.col("neighbor_id").alias("pq_neighbor")
    )
    hits = (
        bf.join(
            pq,
            (bf.query_id == pq.query_id)
            & (F.col("bf_neighbor") == F.col("pq_neighbor")),
            "left",
        )
        .select(bf.query_id, "pq_neighbor")
        .groupBy("query_id")
        .agg(F.count("pq_neighbor").cast("bigint").alias("n_hits"))
    )
    recall = F.col("n_hits") * F.lit(1.0) / F.lit(TOP_K)
    return hits.agg(
        F.lit(TOP_K).cast("int").alias("k"),
        F.count(F.lit(1)).cast("bigint").alias("n_queries"),
        pround(F.avg(recall), 6).alias("mean_recall"),
        pround(F.min(recall), 6).alias("min_recall"),
    )


@register(
    "similarity_ivfpq_nprobe_sweep",
    oracle=f"""
    WITH bf AS ({_REG["similarity_topk_bruteforce"].oracle}),
    {_km.sql_ctes(IVF_NCELLS, IVF_DECIMALS, leading_with=False)}, cells AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM d2
      ) WHERE rn = 1
    ), qcell AS (
      SELECT vec_id AS query_id, cid,
             row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid)
               AS cell_rank
      FROM d2 WHERE vec_id < {N_QUERIES}
    ), np AS (SELECT CAST(unnest([{", ".join(str(p) for p in NPROBES)}]) AS INTEGER) AS nprobe),
    sub AS ({_DUCK_IVFPQ_SUB}
    ), cent AS (
      SELECT m, vec_id AS k, sv AS cv FROM sub WHERE vec_id < {IVFPQ_K}
    ), cnorm AS (
      SELECT m, k,
             CAST(floor(list_sum(list_transform(generate_series(1, {IVFPQ_SUBDIM}),
                  j -> cv[j] * cv[j])) * 1000000.0 + 0.5) AS BIGINT) AS cn2_e6
      FROM cent
    ), dists AS (
      SELECT s.vec_id, s.m, c.k,
             list_sum(list_transform(generate_series(1, {IVFPQ_SUBDIM}),
                 j -> (s.sv[j] - c.cv[j]) * (s.sv[j] - c.cv[j]))) AS dist2
      FROM sub s JOIN cent c USING (m)
    ), codes AS (
      SELECT r.vec_id AS neighbor_id, cl.cid, r.m, r.k FROM (
        SELECT vec_id, m, k,
               row_number() OVER (PARTITION BY vec_id, m
                                  ORDER BY dist2, k) AS rn
        FROM dists
      ) r JOIN cells cl USING (vec_id)
      WHERE r.rn = 1
    ), qn AS (
      SELECT vec_id AS query_id,
             sqrt(list_sum(list_transform(generate_series(1, len(v)),
                  i -> v[i] * v[i]))) AS q_norm
      FROM e WHERE vec_id < {N_QUERIES}
    ), lut AS (
      SELECT s.vec_id AS query_id, s.m, c.k,
             CAST(floor(list_sum(list_transform(generate_series(1, {IVFPQ_SUBDIM}),
                  j -> s.sv[j] * c.cv[j])) * 1000000.0 + 0.5) AS BIGINT) AS pdot_e6
      FROM sub s JOIN cent c USING (m)
      WHERE s.vec_id < {N_QUERIES}
    ), adc AS (
      SELECT np.nprobe, qc.query_id, co.neighbor_id, q.q_norm,
             CAST(sum(l.pdot_e6) AS BIGINT) AS adot_e6,
             CAST(sum(cn.cn2_e6) AS BIGINT) AS cn2s_e6
      FROM np
      JOIN qcell qc ON qc.cell_rank <= np.nprobe
      JOIN codes co ON co.cid = qc.cid AND co.neighbor_id <> qc.query_id
      JOIN qn q ON q.query_id = qc.query_id
      JOIN lut l ON l.query_id = qc.query_id AND l.m = co.m AND l.k = co.k
      JOIN cnorm cn ON cn.m = co.m AND cn.k = co.k
      GROUP BY np.nprobe, qc.query_id, co.neighbor_id, q.q_norm
    ), approx AS (
      SELECT * FROM (
        SELECT nprobe, query_id, neighbor_id,
               row_number() OVER (PARTITION BY nprobe, query_id
                 ORDER BY (adot_e6 * 1.0 / 1000000.0)
                   / (q_norm * sqrt(cn2s_e6 * 1.0 / 1000000.0)) DESC,
                   neighbor_id ASC) AS arnk
        FROM adc
      ) WHERE arnk <= {IVFPQ_NCAND}
    ), reranked AS (
      SELECT * FROM (
        SELECT a.nprobe, a.query_id, a.neighbor_id,
               row_number() OVER (PARTITION BY a.nprobe, a.query_id
                                  ORDER BY {_duck_dq_cos("q.v", "c.v")} DESC,
                                           a.neighbor_id ASC) AS rnk
        FROM approx a
        JOIN e q ON q.vec_id = a.query_id
        JOIN e c ON c.vec_id = a.neighbor_id
      ) WHERE rnk <= {TOP_K}
    ), cost AS (
      SELECT nprobe, query_id, CAST(count(*) AS BIGINT) AS n_cand
      FROM adc GROUP BY nprobe, query_id
    ), hits AS (
      SELECT np.nprobe, bf.query_id,
             CAST(count(r.neighbor_id) AS BIGINT) AS n_hits
      FROM np CROSS JOIN bf
      LEFT JOIN reranked r ON r.nprobe = np.nprobe
                          AND r.query_id = bf.query_id
                          AND r.neighbor_id = bf.neighbor_id
      GROUP BY np.nprobe, bf.query_id
    )
    SELECT h.nprobe,
           CAST(count(*) AS BIGINT) AS n_queries,
           floor(avg(h.n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
             AS mean_recall,
           floor(min(h.n_hits * 1.0 / {TOP_K}) * 1000000.0 + 0.5) / 1000000.0
             AS min_recall,
           floor(avg(coalesce(c.n_cand, 0) * 1.0) * 1000000.0 + 0.5) / 1000000.0
             AS avg_candidates
    FROM hits h LEFT JOIN cost c ON c.nprobe = h.nprobe AND c.query_id = h.query_id
    GROUP BY h.nprobe
    """,
    doc=f"The END-TO-END IVFADC tuning curve: recall@{TOP_K} vs exact "
        f"brute force and ADC-candidates-scored cost for nProbe in "
        f"{NPROBES} through the FULL serving path — PQ-coded ADC "
        "short-list then exact re-rank — unlike "
        "similarity_kmeans_nprobe_sweep, which ranks probed candidates "
        "with exact cosine and therefore measures what the CELLS cost; "
        "the gap between the two curves is what 2-bit PQ coding costs "
        "at each probe depth, and together they are the table that "
        "picks the deployment's (nprobe, rerank-budget) point.  Same "
        "exact-int ADC determinism contract as similarity_topk_ivfpq "
        "(the nprobe={IVF_NPROBE} row of this sweep IS that query's "
        "configuration).  Scale shape: codes scored via the broadcast "
        "LUT equi-join per probe depth (candidates stay cell-confined, "
        "never all-pairs), full-precision vectors only in the "
        "k-bounded re-rank, recall join on k-bounded rows.",
    tags=("similarity", "ann", "quality"),
)
def similarity_ivfpq_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )
    e = e.repartition(plan_parallelism(spark), "vec_id")
    crows = _km.final_centroid_rows(spark, sf_dir, IVF_NCELLS, IVF_DECIMALS)
    # one corpus frame for assignment, codes and re-rank (r18: the old
    # second `emb` frame was plan-identical to `e` but a separate
    # subtree, so the corpus repartition exchange ran twice)
    cells = _km.assign_rows(e, crows).select("vec_id", "cid")
    qscore = _km.scored_rows(
        e.filter(F.col("vec_id") < N_QUERIES), crows
    ).select(F.col("vec_id").alias("query_id"), "cid", "dist2")
    wq = Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cid"))
    # ONE ADC pass for all probe depths (optimization r18, VERDICT r17
    # item 4): a candidate's ADC sums do not depend on the probe depth
    # — only on its (query, neighbor) pair — and it reaches depth d iff
    # the cell that admits it ranks <= d.  So the probe list carries
    # the admitting cell's rank, the ADC join + aggregation run once
    # per (query, neighbor), and the (nprobe >= cell_rank) fan-out
    # explodes the already-summed rows.  The old shape exploded depths
    # FIRST, so every candidate paid the M-row LUT join and the ADC
    # aggregation once per depth that admits it (up to |NPROBES|x).
    probe_arr = F.array(*[F.lit(p) for p in NPROBES])
    probed = (
        qscore.withColumn("cell_rank", F.row_number().over(wq))
        .filter(F.col("cell_rank") <= max(NPROBES))
        .select("query_id", F.col("cid").alias("p_cid"), "cell_rank")
    )
    sub = ivfpq_subvectors(e)
    cb_rows = ivfpq_codebook_rows(sf_dir)
    # qn/lut/cnorm driver-computed from the bounded seed rows — the
    # distributed subtrees (scan+filter+explode+broadcast-join per
    # table) disappear from the plan (see _adc_query_tables)
    qn, lut, cnorm = _adc_query_tables(
        spark, fastvec.read_vectors_driver(sf_dir, N_QUERIES), cb_rows
    )
    codes = (
        ivfpq_codes(sub, None, cent_rows=cb_rows)
        .join(cells, "vec_id")
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cid").alias("c_cid"),
            "m",
            "k",
        )
    )
    # |queries| x max(NPROBES) x M x K rows — constant per query, broadcast
    plq = lut.join(F.broadcast(qn), "query_id").join(F.broadcast(probed), "query_id")
    adc = (
        codes.join(F.broadcast(cnorm), ["m", "k"])
        .join(
            F.broadcast(plq),
            (F.col("c_cid") == F.col("p_cid"))
            & (F.col("neighbor_id") != F.col("query_id"))
            & (F.col("m") == F.col("lm"))
            & (F.col("k") == F.col("lk")),
        )
        .groupBy("query_id", "neighbor_id", "q_norm", "cell_rank")
        .agg(
            F.sum("pdot_e6").cast("bigint").alias("adot_e6"),
            F.sum("cn2_e6").cast("bigint").alias("cn2s_e6"),
        )
        .select(
            F.explode(
                F.filter(probe_arr, lambda p: F.col("cell_rank") <= p)
            ).alias("nprobe"),
            "query_id",
            "neighbor_id",
            "q_norm",
            "adot_e6",
            "cn2s_e6",
        )
    )
    approx_raw = (F.col("adot_e6") * F.lit(1.0) / F.lit(1e6)) / (
        F.col("q_norm") * F.sqrt(F.col("cn2s_e6") * F.lit(1.0) / F.lit(1e6))
    )
    aw = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("approx_raw"), F.asc("neighbor_id")
    )
    wall = Window.partitionBy("nprobe", "query_id")
    # the candidates-scored cost rides the SAME pass as the ADC ranking
    approx = (
        adc.withColumn("approx_raw", approx_raw)
        .withColumn("n_cand", F.count(F.lit(1)).over(wall).cast("bigint"))
        .withColumn("arnk", F.row_number().over(aw))
        .filter(F.col("arnk") <= IVFPQ_NCAND)
        .select("nprobe", "query_id", "neighbor_id", "n_cand")
        .localCheckpoint(eager=False)
    )
    qv_full = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("q_v")
    )
    cv_full = e.select(F.col("vec_id").alias("neighbor_id"), F.col("v").alias("c_v"))
    exact_sim = dot(F.col("q_v"), F.col("c_v")) / (
        l2_norm(F.col("q_v")) * l2_norm(F.col("c_v"))
    )
    rw = Window.partitionBy("nprobe", "query_id").orderBy(
        F.desc("exact_raw"), F.asc("neighbor_id")
    )
    reranked = (
        approx.join(F.broadcast(qv_full), "query_id")
        .join(cv_full, "neighbor_id")
        .withColumn("exact_raw", exact_sim)
        .withColumn("rnk", F.row_number().over(rw))
        .filter(F.col("rnk") <= TOP_K)
        .select(
            F.col("nprobe").alias("r_np"),
            F.col("query_id").alias("r_qid"),
            F.col("neighbor_id").alias("r_nid"),
        )
    )
    cost = (
        approx.groupBy("nprobe", "query_id")
        .agg(F.max("n_cand").cast("bigint").alias("n_cand"))
        .select(
            F.col("nprobe").alias("c_np"),
            F.col("query_id").alias("c_qid"),
            "n_cand",
        )
    )
    nps = spark.createDataFrame([(p,) for p in NPROBES], "nprobe int")
    bf = similarity_topk_bruteforce(spark, sf_dir).select(
        F.col("query_id").alias("bf_qid"), F.col("neighbor_id").alias("bf_neighbor")
    )
    hits = (
        bf.crossJoin(F.broadcast(nps.select(F.col("nprobe").alias("np"))))
        .join(
            F.broadcast(reranked),
            (F.col("bf_qid") == F.col("r_qid"))
            & (F.col("bf_neighbor") == F.col("r_nid"))
            & (F.col("np") == F.col("r_np")),
            "left",
        )
        .groupBy(F.col("np"), F.col("bf_qid"))
        .agg(F.count(F.col("r_nid")).cast("bigint").alias("n_hits"))
    )
    return (
        hits.join(
            F.broadcast(cost),
            (F.col("np") == F.col("c_np")) & (F.col("bf_qid") == F.col("c_qid")),
            "left",
        )
        .withColumn("n_cand", F.coalesce(F.col("n_cand"), F.lit(0)))
        .groupBy(F.col("np").cast("int").alias("nprobe"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_queries"),
            pround(F.avg(F.col("n_hits") * F.lit(1.0) / F.lit(TOP_K)), 6).alias(
                "mean_recall"
            ),
            pround(F.min(F.col("n_hits") * F.lit(1.0) / F.lit(TOP_K)), 6).alias(
                "min_recall"
            ),
            pround(F.avg(F.col("n_cand") * F.lit(1.0)), 6).alias("avg_candidates"),
        )
    )
