"""Shared deterministic one-Lloyd-round k-means over `embeddings` —
the single clustering definition used by BOTH the curation tier
(`embedding_kmeans_assign`, `cluster_topic_terms`, k=KMEANS_K) and the
ANN serving tier (`similarity_ann`'s IVF coarse quantizer, k=IVF_NCELLS).

This module registers NOTHING — it is a pure helper, importable from
any operator module without perturbing registry order (the constraint
that previously forced the PQ geometry constants to be mirrored
between files instead of shared).

Protocol (unchanged from the round-3 curation implementation, which
has been driver-green at every SF since):

- init centroids = the vectors with ``vec_id < k`` (deterministic seed
  rows, no RNG),
- one full Lloyd round: assign -> recenter -> reassign, squared-L2,
- recentered coordinates round to ``decimals`` decimals BEFORE the
  final assignment so cross-engine float-sum noise cannot flip an
  assignment,
- empty clusters keep their init centroid (standard Lloyd practice;
  r12 review fix — a duplicated seed vector must not silently shrink
  the advertised k),
- ties go to the lowest cid via min-of-struct / (dist2, cid) ordering.

Scale shape: centroids are k rows -> broadcast nested-loop assignment
(the big side never shuffles); recentering is ONE (cluster, dim)
partial agg — per-Lloyd-round cost linear in corpus size, which is
exactly what a driver-loop k-means at 100 TB generates per iteration.

Reference scope: the reference pipeline
(`nifi_spark_kafka_product_view_platform.py`) has no vector tier; this
is SURVEY.md §2.8 extension surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import fastvec
from ..functions.portable import pround
from ..sources.catalog import load_table


def dist2(vec_col: F.Column, cent_col: F.Column) -> F.Column:
    """Σ (x - c)² over two double arrays, accumulated left-to-right.

    The HOF form, kept for metadata-sized operands (centroid-pair
    grids, bounded probes).  Corpus-sized scoring goes through the
    bit-identical vectorized `scored` / `fastvec.scored_cells` path
    (optimization r17): the interpreted per-element lambda was the
    dominant cost of every k-means consumer."""
    return F.aggregate(
        F.zip_with(vec_col, cent_col, lambda x, c: (x - c) * (x - c)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def scored(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cid, dist2) of EVERY (vector, centroid) pair — the
    vectorized, bit-identical form of
    ``emb.crossJoin(broadcast(centroids)).select(dist2(v, c))``.
    Collects the k-row centroid table (bounded by construction) into
    the kernel closure; the corpus side stays a map-only pass."""
    return fastvec.scored_cells(
        emb, fastvec.collect_vectors(centroids, "cid", "c")
    )


def assign(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, cid, dist2): nearest centroid per vector, ties to the
    lowest cid (the min-of-struct rule, evaluated by argmin over the
    cid-ascending score matrix inside the kernel).  centroids is k
    rows → shipped to the scoring kernel's closure; MAP-ONLY — the big
    side neither shuffles nor aggregates (optimization r17: the
    crossJoin+min-of-struct form paid one exchange plus an interpreted
    lambda per element)."""
    return assign_rows(emb, fastvec.collect_vectors(centroids, "cid", "c"))


def embeddings_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(vec_id, v): the embeddings table with elements cast to double —
    the shared input frame of every k-means consumer."""
    return load_table(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("v"),
    )


def final_centroids(
    spark: SparkSession, sf_dir: str, k: int, decimals: int
) -> DataFrame:
    """(cid, c): the post-one-Lloyd-round centroids — coordinates
    rounded to `decimals`, empty clusters retaining their init vector.
    Exactly the `cent1` CTE of sql_ctes().  Built as a k-row local
    frame over `final_centroid_rows` — the bounded-model-table shape
    every consumer (assignment kernels, the streaming fit's parquet
    write) wants anyway."""
    return spark.createDataFrame(
        [(cid, c) for cid, c in final_centroid_rows(spark, sf_dir, k, decimals)],
        "cid bigint, c array<double>",
    )


def final_centroid_rows(
    spark: SparkSession, sf_dir: str, k: int, decimals: int
) -> list[tuple[int, list[float]]]:
    """The post-Lloyd centroids COLLECTED to k bounded rows [(cid,
    coords)] — one collect shared by every consumer of the clustering
    inside a query (cells assignment + query probe ranking), instead
    of re-materializing the centroid frame per consumer.

    Optimization r18 (the Lloyd round is re-run by every ANN-family
    query, so its job count is the family's floor): the assignment
    kernel passes the vector through (`keep_vec`) instead of joining
    its output back to the corpus on vec_id — the recenter is now
    scan -> kernel -> posexplode -> one (cid, j) agg, no corpus
    self-join — and the empty-cluster retention happens HERE on the
    collected k rows instead of as a broadcast join job (labels can
    only come from init cids, so a cid absent from the recenter output
    has an empty cluster and keeps its init vector — the same
    coalesce, driver-side)."""
    emb = embeddings_double(spark, sf_dir)
    init_rows = fastvec.read_vectors_driver(sf_dir, k)
    a1v = fastvec.nearest_cell(emb, init_rows, keep_vec=True)
    dims = a1v.select("cid", F.posexplode(F.col("v")).alias("j", "x"))
    mean1 = dims.groupBy("cid", "j").agg(
        pround(F.avg("x"), decimals).alias("m")
    )
    cent_means = mean1.groupBy("cid").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("j", "m"))), lambda s: s["m"]
        ).alias("cm")
    )
    recentered = {
        row[0]: list(row[1]) for row in cent_means.collect()
    }
    return [
        (cid, recentered.get(cid, c0)) for cid, c0 in init_rows
    ]


def final_assign(
    spark: SparkSession, sf_dir: str, k: int, decimals: int
) -> DataFrame:
    """(vec_id, cid, dist2) after the shared one-Lloyd-round k-means —
    the Spark twin of sql_ctes()."""
    emb = embeddings_double(spark, sf_dir)
    return assign_rows(emb, final_centroid_rows(spark, sf_dir, k, decimals))


def scored_rows(
    emb: DataFrame, cent_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """(vec_id, cid, dist2) over a pre-collected centroid row set."""
    return fastvec.scored_cells(emb, cent_rows)


def assign_rows(
    emb: DataFrame, cent_rows: list[tuple[int, list[float]]]
) -> DataFrame:
    """`assign` over a pre-collected centroid row set (shared collect)."""
    return fastvec.nearest_cell(emb, cent_rows)


def sql_ctes(k: int, decimals: int, leading_with: bool = True) -> str:
    """The deterministic one-Lloyd-round k-means CTE chain (DuckDB) —
    shared between every oracle that consumes the clustering so no two
    queries can disagree about what "the clustering" is.  Exposes CTEs
    `e` (vec_id, v), `cent1` (cid, c) and `d2` (vec_id, cid, dist2);
    the caller derives the final assignment as the rn=1 row of d2
    ordered by (dist2, cid).  `leading_with=False` drops the WITH
    keyword so a caller can prepend its own CTEs (e.g. the brute-force
    ground truth) before the chain."""
    kw = "WITH " if leading_with else ""
    return f"""
    {kw}e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings
    ), init AS (
      SELECT vec_id AS cid, v AS c FROM e WHERE vec_id < {k}
    ), d1 AS (
      SELECT e.vec_id, i.cid,
             list_sum(list_transform(generate_series(1, len(e.v)),
                                     j -> (e.v[j] - i.c[j]) * (e.v[j] - i.c[j]))) AS dist2
      FROM e CROSS JOIN init i
    ), a1 AS (
      SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
        FROM d1
      ) WHERE rn = 1
    ), mean1 AS (
      SELECT a1.cid, gs.j,
             floor(avg(e.v[gs.j]) * 1e{decimals} + 0.5) / 1e{decimals} AS m
      FROM a1 JOIN e USING (vec_id),
           LATERAL (SELECT unnest(generate_series(1, len(e.v))) AS j) gs
      GROUP BY a1.cid, gs.j
    ), cent_means AS (
      SELECT cid, list(m ORDER BY j) AS c FROM mean1 GROUP BY cid
    ), cent1 AS (
      SELECT i.cid, coalesce(cm.c, i.c) AS c
      FROM init i LEFT JOIN cent_means cm USING (cid)
    ), d2 AS (
      SELECT e.vec_id, c1.cid,
             list_sum(list_transform(generate_series(1, len(e.v)),
                                     j -> (e.v[j] - c1.c[j]) * (e.v[j] - c1.c[j]))) AS dist2
      FROM e CROSS JOIN cent1 c1
    )"""
