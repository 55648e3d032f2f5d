"""Language-model curation tier (split from curation.py, round 15 —
VERDICT r14 item 6, pure move): the n-gram LM operators behind
perplexity-style corpus curation — add-one bigram log-probability,
cross-source cross-entropy, source×lang mutual information,
perplexity bucketing, held-out train/val perplexity, and the
interpolated Kneser-Ney bigram table.

All queries keep their original names, oracles, and registry
semantics; nothing in this file is new code.  The reference has no
LM tier (its core is a Kafka streaming pipeline, README.md:1-20) —
this is §2.8 extension surface for training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..functions.textfns import bigram_pairs, normalize_text, tokens
from ..registry import register
from ..sources.catalog import load_table
from .dedup import _DUCK_TOKENS, _documents_parallel

# ---------------------------------------------------------------------------
# bigram language-model log-probability (perplexity-proxy filter)
# ---------------------------------------------------------------------------

@register(
    "text_bigram_logprob",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
    ), bg AS (
      SELECT doc_id, tk[gs.i] AS w1, tk[gs.i + 1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) gs
    ), uni AS (
      SELECT doc_id, tk[gs.i] AS w
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) gs
    ), uni_counts AS (
      SELECT w AS w1, count(*) AS c1 FROM uni GROUP BY w
    ), vocab AS (
      SELECT count(*) AS v FROM uni_counts
    ), bg_counts AS (
      SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), doc_bg AS (
      SELECT doc_id, w1, w2, count(*) AS n_occ FROM bg GROUP BY doc_id, w1, w2
    ), scored AS (
      SELECT d.doc_id, d.n_occ,
             ln((CAST(bc.c2 AS DOUBLE) + 1.0) / (uc.c1 + v.v)) AS lp
      FROM doc_bg d
      JOIN bg_counts bc USING (w1, w2)
      JOIN uni_counts uc USING (w1)
      CROSS JOIN vocab v
    )
    SELECT doc_id,
           CAST(sum(n_occ) AS BIGINT) AS n_bigrams,
           floor((sum(n_occ * lp) / sum(n_occ)) * 1000000.0 + 0.5) / 1000000.0
             AS avg_logprob
    FROM scored GROUP BY doc_id
    """,
    doc="Perplexity-proxy quality score: average add-one-smoothed bigram "
        "log-probability ln((c(w1,w2)+1)/(c(w1)+V)) of each document "
        "under the LM induced by the corpus itself — the KenLM-filter "
        "shape without an external model. Docs far below the corpus band "
        "are gibberish; far above are boilerplate. All counts are "
        "partial-agg shuffles on term keys; the per-doc pass joins its "
        "DISTINCT bigrams (not every occurrence) against the count "
        "tables, and the vocabulary size broadcasts as one row.",
    tags=("curation", "text"),
)
def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents_parallel(spark, sf_dir)
    # `toks` feeds three branches (unigrams + two bigram aggregates), so
    # the regex tokenizer runs three times.  A tokenize-once checkpoint
    # was TRIED and REVERTED in optimization r18: interleaved A/B
    # (min-of-12 runs per variant, sf0.1) read 1.66 s checkpointed vs
    # 1.15 s recomputed — the checkpoint serializes the materialization
    # where the three branches' redundant tokenizes run concurrently on
    # otherwise-idle cores, and AQE overlaps them.  The
    # holdout-perplexity twin keeps its checkpoint because its branches
    # FILTER the same token table by split (recompute there would scan
    # documents twice per split side, not just re-run a projection).
    toks = docs.select(
        "doc_id", tokens(normalize_text(F.col("text"))).alias("tk")
    )
    tk = F.col("tk")
    pairs = bigram_pairs(tk)
    bg = toks.select("doc_id", F.explode(pairs).alias("p")).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    uni = toks.select("doc_id", F.explode(tk).alias("w1"))
    uni_counts = uni.groupBy("w1").agg(F.count("*").alias("c1"))
    vocab = uni_counts.agg(F.count("*").alias("v"))
    bg_counts = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    doc_bg = bg.groupBy("doc_id", "w1", "w2").agg(F.count("*").alias("n_occ"))
    lp = F.log((F.col("c2").cast("double") + 1.0) / (F.col("c1") + F.col("v")))
    scored = (
        doc_bg.join(bg_counts, ["w1", "w2"])
        .join(uni_counts, "w1")
        .crossJoin(F.broadcast(vocab))
        .select("doc_id", "n_occ", lp.alias("lp"))
    )
    return scored.groupBy("doc_id").agg(
        F.sum("n_occ").cast("bigint").alias("n_bigrams"),
        pround(F.sum(F.col("n_occ") * F.col("lp")) / F.sum("n_occ"), 6).alias(
            "avg_logprob"
        ),
    )


# ---------------------------------------------------------------------------
# Cross-source LM cross-entropy matrix (round 9): how well does the
# bigram language model induced by source B predict the text of source
# A?  The domain-shift / distribution-distance detector behind
# data-mixing decisions (a source whose text is poorly predicted by
# every other source's LM is novel; one perfectly predicted is
# redundant) — the pairwise generalization of text_bigram_logprob's
# self-scoring, CCNet-style.  Cross-entropy is computed from AGGREGATED
# bigram counts, never by scoring documents: ce(A‖B) =
# −Σ_b c_A(b)·ln P̂_B(b) / Σ_b c_A(b) with add-one smoothing over the
# GLOBAL vocabulary (shared smoothing floor keeps the matrix
# comparable across B).
# ---------------------------------------------------------------------------


@register(
    "source_crossentropy_matrix",
    oracle=f"""
    WITH toks AS (
      SELECT source, {_DUCK_TOKENS} AS tk FROM documents
    ), bg AS (
      SELECT source, tk[gs.i] AS w1, tk[gs.i + 1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) gs
    ), bgc AS (
      SELECT source, w1, w2, CAST(count(*) AS BIGINT) AS c
      FROM bg GROUP BY source, w1, w2
    ), unic AS (
      SELECT source, w1, CAST(sum(c) AS BIGINT) AS c1
      FROM bgc GROUP BY source, w1
    ), vocab AS (
      SELECT CAST(count(DISTINCT w) AS BIGINT) AS v
      FROM (SELECT w1 AS w FROM bgc UNION SELECT w2 AS w FROM bgc)
    ), pairs AS (
      SELECT a.source AS src_a, b.src_b, a.w1, a.w2, a.c AS c_a,
             coalesce(bb.c, 0) AS c_b, coalesce(ub.c1, 0) AS c1_b
      FROM bgc a
      CROSS JOIN (SELECT DISTINCT source AS src_b FROM documents) b
      LEFT JOIN bgc bb ON bb.source = b.src_b AND bb.w1 = a.w1 AND bb.w2 = a.w2
      LEFT JOIN unic ub ON ub.source = b.src_b AND ub.w1 = a.w1
    )
    SELECT src_a, src_b,
           CAST(sum(c_a) AS BIGINT) AS n_bigrams,
           floor(-(sum(c_a * ln((c_b + 1.0) / (c1_b + v.v)))
                   / sum(c_a)) * 1000000.0 + 0.5) / 1000000.0
             AS cross_entropy
    FROM pairs CROSS JOIN vocab v
    GROUP BY src_a, src_b
    """,
    doc="Pairwise source-level cross-entropy under add-one-smoothed "
        "bigram LMs: ce(A‖B) = −Σ c_A(b)·ln((c_B(b)+1)/(c1_B(w1)+V)) "
        "/ Σ c_A(b) — the domain-shift matrix data-mixing decisions "
        "read (novel vs redundant sources), generalizing "
        "text_bigram_logprob's self-score to all source pairs.  "
        "Scale: the corpus is scanned ONCE into per-source bigram "
        "counts (vocabulary-sized, partial-agg); everything after "
        "operates on count tables ~|sources|·|vocab²∩seen| — the "
        "pair expansion multiplies the COUNT table by |sources|, "
        "never the corpus; V broadcasts as one row.  ln takes "
        "identical exact-rational arguments in both engines (the "
        "text_bigram_logprob precedent), and the weighted mean is "
        "rounded in both.",
    tags=("curation", "text", "stats"),
)
def source_crossentropy_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents_parallel(spark, sf_dir)
    tk = d.select("source", tokens(normalize_text(F.col("text"))).alias("tk"))
    # shared guarded pair expression (r12 review fix: the hand-rolled
    # transform(sequence(1, size-1)) here skipped the short-array guard
    # and crashed under ANSI on any doc with <2 tokens — Spark's
    # sequence(1, 0) DESCENDS)
    bg = tk.select(
        "source", F.explode(bigram_pairs(F.col("tk"))).alias("b")
    ).select("source", "b.w1", "b.w2")
    bgc = (
        bg.groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
        .localCheckpoint(eager=False)
    )
    unic = bgc.groupBy("source", "w1").agg(F.sum("c").cast("bigint").alias("c1"))
    vocab = (
        bgc.select(F.col("w1").alias("w"))
        .union(bgc.select(F.col("w2").alias("w")))
        .agg(F.countDistinct("w").cast("bigint").alias("v"))
    )
    sources = d.select(F.col("source").alias("src_b")).distinct()
    a = bgc.select(
        F.col("source").alias("src_a"), "w1", "w2", F.col("c").alias("c_a")
    )
    bb = bgc.select(
        F.col("source").alias("src_b"),
        "w1",
        "w2",
        F.col("c").alias("c_b"),
    )
    ub = unic.select(
        F.col("source").alias("src_b"), "w1", F.col("c1").alias("c1_b")
    )
    pairs = (
        a.crossJoin(F.broadcast(sources))
        .join(bb, ["src_b", "w1", "w2"], "left")
        .join(ub, ["src_b", "w1"], "left")
        .select(
            "src_a",
            "src_b",
            "c_a",
            F.coalesce("c_b", F.lit(0)).alias("c_b"),
            F.coalesce("c1_b", F.lit(0)).alias("c1_b"),
        )
    )
    term = F.col("c_a") * F.log(
        (F.col("c_b") + F.lit(1.0)) / (F.col("c1_b") + F.col("v"))
    )
    return (
        pairs.crossJoin(F.broadcast(vocab))
        .groupBy("src_a", "src_b")
        .agg(
            F.sum("c_a").cast("bigint").alias("n_bigrams"),
            pround(-(F.sum(term) / F.sum("c_a")), 6).alias("cross_entropy"),
        )
    )


@register(
    "documents_source_lang_mutual_info",
    oracle="""
    WITH cells AS (
      SELECT source, lang, CAST(count(*) AS BIGINT) AS n_xy
      FROM documents GROUP BY source, lang
    ), sx AS (
      SELECT source, CAST(sum(n_xy) AS BIGINT) AS n_x FROM cells GROUP BY source
    ), sy AS (
      SELECT lang, CAST(sum(n_xy) AS BIGINT) AS n_y FROM cells GROUP BY lang
    ), tot AS (
      SELECT CAST(sum(n_xy) AS BIGINT) AS n FROM cells
    )
    SELECT c.source, c.lang, c.n_xy,
           floor(ln(CAST(c.n_xy AS DOUBLE) * t.n
                    / (CAST(x.n_x AS DOUBLE) * y.n_y))
                 * 1000000.0 + 0.5) / 1000000.0 AS pmi,
           floor(CAST(c.n_xy AS DOUBLE) / t.n
                 * ln(CAST(c.n_xy AS DOUBLE) * t.n
                      / (CAST(x.n_x AS DOUBLE) * y.n_y))
                 * 1000000.0 + 0.5) / 1000000.0 AS mi_contribution
    FROM cells c
    JOIN sx x ON x.source = c.source
    JOIN sy y ON y.lang = c.lang
    CROSS JOIN tot t
    """,
    doc="Source×language association audit: pointwise mutual "
        "information per observed (source, lang) cell and its "
        "contribution to the total mutual information Σ p·ln(p_xy/"
        "(p_x·p_y)) — the confounding screen a mix designer reads "
        "before treating 'source' and 'language' as independent "
        "sampling axes (MI≈0 means balancing one cannot skew the "
        "other; a high-PMI cell is a source that IS a language).  "
        "Scale shape: ONE corpus aggregate to |sources|×|langs| "
        "cells; margins re-aggregate the cell table, never the "
        "corpus, and join back on the bounded cell frame (broadcast); "
        "ln in double with pround(6).",
    tags=("curation", "stats"),
)
def documents_source_lang_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_xy")
    )
    sx = cells.groupBy("source").agg(F.sum("n_xy").cast("bigint").alias("n_x"))
    sy = cells.groupBy("lang").agg(F.sum("n_xy").cast("bigint").alias("n_y"))
    tot = cells.agg(F.sum("n_xy").cast("bigint").alias("n"))
    ratio = (
        F.col("n_xy").cast("double")
        * F.col("n")
        / (F.col("n_x").cast("double") * F.col("n_y"))
    )
    return (
        cells.join(F.broadcast(sx), "source")
        .join(F.broadcast(sy), "lang")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            "lang",
            "n_xy",
            pround(F.log(ratio), 6).alias("pmi"),
            pround(
                F.col("n_xy").cast("double") / F.col("n") * F.log(ratio), 6
            ).alias("mi_contribution"),
        )
    )

@register(
    "documents_perplexity_buckets",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
    ), bg AS (
      SELECT doc_id, tk[gs.i] AS w1, tk[gs.i + 1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) gs
    ), uni AS (
      SELECT doc_id, tk[gs.i] AS w
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) gs
    ), uni_counts AS (
      SELECT w AS w1, count(*) AS c1 FROM uni GROUP BY w
    ), vocab AS (
      SELECT count(*) AS v FROM uni_counts
    ), bg_counts AS (
      SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY w1, w2
    ), doc_bg AS (
      SELECT doc_id, w1, w2, count(*) AS n_occ FROM bg GROUP BY doc_id, w1, w2
    ), scored AS (
      SELECT d.doc_id,
             floor((sum(d.n_occ * ln((CAST(bc.c2 AS DOUBLE) + 1.0) / (uc.c1 + v.v)))
                    / sum(d.n_occ)) * 1000000.0 + 0.5) / 1000000.0 AS score
      FROM doc_bg d
      JOIN bg_counts bc USING (w1, w2)
      JOIN uni_counts uc USING (w1)
      CROSS JOIN vocab v
      GROUP BY d.doc_id
    ), th AS (
      SELECT quantile_cont(score, 0.3333333) AS t1,
             quantile_cont(score, 0.6666667) AS t2
      FROM scored
    ), bucketed AS (
      SELECT doc.source,
             CASE WHEN s.score >= th.t2 THEN 'head'
                  WHEN s.score >= th.t1 THEN 'middle'
                  ELSE 'tail' END AS bucket,
             s.score
      FROM scored s
      JOIN documents doc USING (doc_id)
      CROSS JOIN th
    )
    SELECT source, bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           floor((CAST(sum(CAST(floor(score * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                  / count(*) / 1000000.0) * 1000000.0 + 0.5) / 1000000.0 AS avg_score
    FROM bucketed GROUP BY source, bucket
    """,
    doc="CCNet-style perplexity bucketing: each document's "
        "bigram-LM score (the text_bigram_logprob machinery, same "
        "add-one smoothing) is cut at the global terciles into "
        "head / middle / tail, reported as per-(source, bucket) "
        "counts — the stage CCNet uses to keep head+middle and audit "
        "which sources the tail eats.  Terciles are computed over the "
        "pround(6)-ROUNDED scores so the threshold comparison is "
        "cross-engine exact (raw double sums differ by summation "
        "order at the boundary).  Scale shape: the LM joins ride "
        "term-key shuffles (see text_bigram_logprob); the tercile is "
        "one exact global percentile over |docs| scores (swap for "
        "approx_percentile at 100 TB — the documented "
        "stats_percentiles_approx_bound trade), broadcast back as one "
        "row; report is |sources|×3 cells.",
    tags=("curation", "text"),
)
def documents_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    # materialize the bigram-LM scores once (optimization r17): the
    # threshold agg below is a BROADCAST subtree, so without the lazy
    # checkpoint the whole text_bigram_logprob pipeline — the expensive
    # part of this query — executed twice, once under the broadcast and
    # once in the main plan.
    scored = text_bigram_logprob(spark, sf_dir).select(
        "doc_id", F.col("avg_logprob").alias("score")
    ).localCheckpoint(eager=False)
    th = scored.agg(
        F.percentile("score", 0.3333333).alias("t1"),
        F.percentile("score", 0.6666667).alias("t2"),
    )
    src = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    bucketed = (
        scored.crossJoin(F.broadcast(th))
        .join(src, "doc_id")
        .select(
            "source",
            F.when(F.col("score") >= F.col("t2"), F.lit("head"))
            .when(F.col("score") >= F.col("t1"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("bucket"),
            "score",
        )
    )
    # avg over the ROUNDED scores as an exact scaled-integer sum: a
    # plain double avg differs by 1 ULP between engines (summation
    # order) and can straddle the final 6-decimal rounding boundary —
    # the integer sum is bit-identical, so the division and round are.
    score_e6 = F.floor(F.col("score") * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")
    return bucketed.groupBy("source", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        pround(
            F.sum(score_e6).cast("double") / F.count(F.lit(1)) / F.lit(1000000.0), 6
        ).alias("avg_score"),
    )



# ---------------------------------------------------------------------------
# Held-out LM perplexity: train-split bigram LM scored on the val split
# ---------------------------------------------------------------------------

from .pipeline_ops import _DUCK_U16  # noqa: E402  (shared split contract)

# logprobs quantized to 1e-6 int64 before any cross-row sum (the
# perplexity-buckets lesson: a float sum of lp terms is fold-order-
# dependent between engines); perplexity quantized to 1e-2
_HO_LP_SCALE = 1_000_000


@register(
    "documents_holdout_perplexity",
    oracle=f"""
    WITH assigned AS (
      SELECT doc_id, source, text,
             CASE WHEN {_DUCK_U16} % 100 < 80 THEN 'train'
                  WHEN {_DUCK_U16} % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    ), toks AS (
      SELECT doc_id, source, split, {_DUCK_TOKENS} AS tk FROM assigned
    ), tr_uni AS (
      SELECT tk[gs.i] AS w1, CAST(count(*) AS BIGINT) AS c1
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk))) AS i) gs
      WHERE split = 'train' GROUP BY 1
    ), vocab AS (
      SELECT CAST(count(*) AS BIGINT) AS v FROM tr_uni
    ), tr_bg AS (
      SELECT tk[gs.i] AS w1, tk[gs.i + 1] AS w2,
             CAST(count(*) AS BIGINT) AS c2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) gs
      WHERE split = 'train' GROUP BY 1, 2
    ), val_bg AS (
      SELECT source, tk[gs.i] AS w1, tk[gs.i + 1] AS w2,
             CAST(count(*) AS BIGINT) AS n_occ
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) gs
      WHERE split = 'val' GROUP BY 1, 2, 3
    ), scored AS (
      SELECT vb.source, vb.n_occ,
             CASE WHEN tb.c2 IS NULL THEN 1 ELSE 0 END AS unseen,
             CAST(floor(ln((coalesce(tb.c2, 0) + 1.0)
                           / (coalesce(tu.c1, 0) + v.v))
                        * {_HO_LP_SCALE}.0 + 0.5) AS BIGINT) AS lpq
      FROM val_bg vb
      LEFT JOIN tr_bg tb ON tb.w1 = vb.w1 AND tb.w2 = vb.w2
      LEFT JOIN tr_uni tu ON tu.w1 = vb.w1
      CROSS JOIN vocab v
    )
    SELECT source,
           CAST(sum(n_occ) AS BIGINT) AS n_val_bigrams,
           CAST(sum(n_occ * unseen) AS BIGINT) AS n_unseen,
           floor(sum(n_occ * lpq) * 1.0
                 / (sum(n_occ) * {_HO_LP_SCALE}.0) * 1000000.0 + 0.5)
             / 1000000.0 AS avg_logprob,
           floor(exp(-(sum(n_occ * lpq) * 1.0
                       / (sum(n_occ) * {_HO_LP_SCALE}.0))) * 100.0 + 0.5)
             / 100.0 AS ppl_proxy
    FROM scored GROUP BY source
    """,
    doc="HELD-OUT perplexity per source: the add-one bigram LM is "
        "trained on the md5-deterministic TRAIN split only and scored "
        "on the VAL split — the evaluation-hygiene twin of "
        "text_bigram_logprob / documents_perplexity_buckets, which "
        "score the corpus under a model trained on itself and so "
        "systematically flatter memorized boilerplate.  The train/val "
        "cut reuses dataset_split_assign's exact bucket contract, so "
        "this composes with the split audit and the leakage report; "
        "n_unseen (val bigram occurrences never seen in train) is the "
        "generalization-gap denominator.  Exact arithmetic: each "
        "smoothed logprob is quantized to 1e-6 int64 BEFORE the "
        "cross-row sum (a float lp sum is fold-order-dependent — the "
        "perplexity-buckets lesson), weighted by integer occurrence "
        "counts; the per-source mean is one division and the "
        "perplexity one exp() on an identical double, 1e-2-quantized.  "
        "Scale shape: count tables are term-keyed partial-agg "
        "shuffles over the train split; the val side joins its "
        "DISTINCT (source, bigram) cells — never per-occurrence rows "
        "— against them (broadcastable at |vocab| scale or bucketed "
        "beyond); vocabulary size is a 1-row broadcast; output "
        "|sources| rows.",
    tags=("curation", "text", "quality"),
)
def documents_holdout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents_parallel(spark, sf_dir)
    u16 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 4),
        16,
        10,
    ).cast("bigint")
    split = (
        F.when(u16 % 100 < 80, F.lit("train"))
        .when(u16 % 100 < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    toks = d.select(
        "source",
        split.alias("split"),
        tokens(normalize_text(F.col("text"))).alias("tk"),
    ).localCheckpoint(eager=False)
    tk = F.col("tk")
    pairs = bigram_pairs(tk)
    tr = toks.filter(F.col("split") == "train")
    tr_uni = (
        tr.select(F.explode(tk).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
        .localCheckpoint(eager=False)
    )
    vocab = tr_uni.agg(F.count(F.lit(1)).cast("bigint").alias("v"))
    tr_bg = (
        tr.select(F.explode(pairs).alias("p"))
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("c2"))
    )
    val_bg = (
        toks.filter(F.col("split") == "val")
        .select("source", F.explode(pairs).alias("p"))
        .select("source", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("source", "w1", "w2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_occ"))
    )
    scored = (
        val_bg.join(tr_bg, ["w1", "w2"], "left")
        .join(tr_uni, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            "source",
            "n_occ",
            F.when(F.col("c2").isNull(), 1).otherwise(0).alias("unseen"),
            F.floor(
                F.log(
                    (F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1.0))
                    / (F.coalesce(F.col("c1"), F.lit(0)) + F.col("v"))
                )
                * _HO_LP_SCALE
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lpq"),
        )
    )
    one = F.lit(1.0)
    avg = F.sum(F.col("n_occ") * F.col("lpq")) * one / (
        F.sum("n_occ") * F.lit(float(_HO_LP_SCALE))
    )
    return scored.groupBy("source").agg(
        F.sum("n_occ").cast("bigint").alias("n_val_bigrams"),
        F.sum(F.col("n_occ") * F.col("unseen")).cast("bigint").alias("n_unseen"),
        pround(avg, 6).alias("avg_logprob"),
        pround(F.exp(-avg), 2).alias("ppl_proxy"),
    )


# ---------------------------------------------------------------------------
# round 11: interpolated Kneser-Ney bigram table (the standard n-gram
# smoothing, next to the add-one LM above)
# ---------------------------------------------------------------------------

_KN_DISCOUNT = 0.75
_KN_TOP = 50


@register(
    "text_bigram_kneser_ney",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, {_DUCK_TOKENS} AS tk FROM documents
    ), bg AS (
      SELECT tk[gs.i] AS w1, tk[gs.i + 1] AS w2
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) gs
    ), bgc AS (
      SELECT w1, w2, CAST(count(*) AS BIGINT) AS c2 FROM bg GROUP BY w1, w2
    ), w1c AS (
      SELECT w1, CAST(sum(c2) AS BIGINT) AS c1,
             CAST(count(*) AS BIGINT) AS n_follow
      FROM bgc GROUP BY w1
    ), contc AS (
      SELECT w2, CAST(count(*) AS BIGINT) AS n_precede FROM bgc GROUP BY w2
    ), types AS (
      SELECT CAST(count(*) AS BIGINT) AS n_types FROM bgc
    )
    SELECT w1, w2, c2 AS c_bigram, c1 AS c_w1, n_follow, n_precede,
           floor((greatest(c2 - {_KN_DISCOUNT}, 0.0) / c1
                  + ({_KN_DISCOUNT} * n_follow / c1)
                    * (n_precede * 1.0 / t.n_types))
                 * 1000000.0 + 0.5) / 1000000.0 AS p_kn
    FROM bgc JOIN w1c USING (w1) JOIN contc USING (w2) CROSS JOIN types t
    ORDER BY c2 DESC, w1, w2
    LIMIT {_KN_TOP}
    """,
    doc=f"Interpolated Kneser-Ney bigram probabilities (discount "
        f"{_KN_DISCOUNT}) for the corpus's {_KN_TOP} most frequent "
        "bigrams: P(w2|w1) = max(c12-D,0)/c1 + (D*N1+(w1,.)/c1) * "
        "(N1+(.,w2)/|bigram types|) — the smoothing KenLM actually "
        "ships (vs the add-one LM in text_bigram_logprob), where the "
        "backoff weights CONTINUATION counts (in how many contexts a "
        "word appears), the fix for add-one's overestimate of frequent-"
        "but-context-bound words.  All inputs are exact integer counts "
        "derived from ONE bigram-count aggregate (c1 and the follower-"
        "type count fold over bgc, not the raw corpus), so both "
        f"engines derive identical doubles; the top-{_KN_TOP} cut is "
        "totally ordered (count desc, then the bigram itself).  Scale "
        "shape: one bigram-key partial-agg shuffle, two linear rollups "
        "of the count table, a 1-row broadcast type count, "
        "TakeOrdered for the cut.",
    tags=("curation", "text"),
)
def text_bigram_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _documents_parallel(spark, sf_dir)
    toks = docs.select("doc_id", tokens(normalize_text(F.col("text"))).alias("tk"))
    tk = F.col("tk")
    pairs = bigram_pairs(tk)
    bg = toks.select(F.explode(pairs).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    bgc = bg.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    ).localCheckpoint(eager=False)
    w1c = bgc.groupBy("w1").agg(
        F.sum("c2").cast("bigint").alias("c1"),
        F.count(F.lit(1)).cast("bigint").alias("n_follow"),
    )
    contc = bgc.groupBy("w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_precede")
    )
    types = bgc.agg(F.count(F.lit(1)).cast("bigint").alias("n_types"))
    p_kn = (
        F.greatest(F.col("c2") - F.lit(_KN_DISCOUNT), F.lit(0.0)) / F.col("c1")
        + (F.lit(_KN_DISCOUNT) * F.col("n_follow") / F.col("c1"))
        * (F.col("n_precede") * F.lit(1.0) / F.col("n_types"))
    )
    return (
        bgc.join(w1c, "w1")
        .join(contc, "w2")
        .crossJoin(F.broadcast(types))
        .select(
            "w1",
            "w2",
            F.col("c2").alias("c_bigram"),
            F.col("c1").alias("c_w1"),
            "n_follow",
            "n_precede",
            pround(p_kn, 6).alias("p_kn"),
        )
        .orderBy(F.desc("c_bigram"), "w1", "w2")
        .limit(_KN_TOP)
    )


# ---------------------------------------------------------------------------
# round 15: DSIR-style importance weights (data selection for LM training)
# ---------------------------------------------------------------------------

_DSIR_TARGET = "src0"   # the fixture's stand-in "target domain" corpus
_DSIR_LW_SCALE = 1_000_000


@register(
    "documents_dsir_weights",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, source, unnest({_DUCK_TOKENS}) AS token FROM documents
    ), vocab AS (
      SELECT token, CAST(count(*) AS BIGINT) AS c_all,
             CAST(count(*) FILTER (WHERE source = '{_DSIR_TARGET}') AS BIGINT)
               AS c_tgt
      FROM toks GROUP BY token
    ), sizes AS (
      SELECT CAST(sum(c_all) AS BIGINT) AS n_all,
             CAST(sum(c_tgt) AS BIGINT) AS n_tgt,
             CAST(count(*) AS BIGINT) AS v
      FROM vocab
    ), lm AS (
      SELECT v.token,
             CAST(floor((ln((v.c_tgt + 1.0) / (s.n_tgt + s.v))
                         - ln((v.c_all + 1.0) / (s.n_all + s.v)))
                        * {_DSIR_LW_SCALE}.0 + 0.5) AS BIGINT) AS lwq
      FROM vocab v CROSS JOIN sizes s
    ), per_doc AS (
      SELECT tk.doc_id, tk.source,
             CAST(sum(lm.lwq) AS BIGINT) AS doc_lwq
      FROM toks tk JOIN lm USING (token)
      WHERE tk.source <> '{_DSIR_TARGET}'
      GROUP BY tk.doc_id, tk.source
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(floor(CAST(sum(doc_lwq) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
             AS avg_logweight_e6,
           CAST(sum(CASE WHEN doc_lwq > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_target_like
    FROM per_doc GROUP BY source
    """,
    doc=f"DSIR-style importance weights (Xie et al. 2023, 'Data "
        f"Selection for Language Models via Importance Resampling'): "
        f"each non-target document is weighted by its log importance "
        f"ratio  Σ_t [ln p_target(t) − ln p_corpus(t)]  under add-one "
        f"unigram LMs sharing the GLOBAL vocabulary smoothing base — "
        f"the standard recipe for up-sampling web data that looks like "
        f"a curated target domain (target = '{_DSIR_TARGET}' here).  "
        f"Emitted as a per-source summary (avg weight + count of "
        f"target-like docs), not per-doc rows.  Scale shape: BOTH LMs "
        f"come from ONE token-grain aggregate (c_all + conditional "
        f"c_tgt in the same partial-combining pass — not separate "
        f"corpus scans), and the corpus/vocab sizes roll up from that "
        f"|vocab|-row table, so the corpus is tokenized exactly twice "
        f"(LM build + scoring); the per-token log-ratio table is "
        f"|vocab| rows joined back on "
        f"token WITHOUT a broadcast hint (same Heaps'-law reasoning as "
        f"cluster_topic_terms — AQE broadcasts it only when measured "
        f"small); per-doc then per-source aggregates narrow.  Each "
        f"per-token log-ratio is quantized to 1e-6 int64 BEFORE the "
        f"cross-row sum (fold-order doctrine), so every emitted value "
        f"is an exact integer.",
    tags=("curation", "text", "lm"),
)
def documents_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _documents_parallel(spark, sf_dir)
    toks = d.select(
        "doc_id", "source", F.explode(tokens(normalize_text(F.col("text")))).alias("token")
    )
    # ONE token-grain pass builds both LMs: total count + conditional
    # target count share the same partial-combining aggregate, and the
    # corpus/vocab sizes roll up from the |vocab|-row result instead of
    # re-scanning (and re-tokenizing) the corpus.
    vocab = toks.groupBy("token").agg(
        F.count(F.lit(1)).cast("bigint").alias("c_all"),
        F.sum((F.col("source") == _DSIR_TARGET).cast("bigint")).alias("c_tgt"),
    )
    sizes = vocab.agg(
        F.sum("c_all").cast("bigint").alias("n_all"),
        F.sum("c_tgt").cast("bigint").alias("n_tgt"),
        F.count(F.lit(1)).cast("bigint").alias("v"),
    )
    # |vocab|-row LM table: NO broadcast hint (web-scale vocabularies
    # must be allowed to shuffle-join; AQE picks broadcast when small)
    lm = vocab.crossJoin(F.broadcast(sizes)).select(
        "token",
        F.floor(
            (
                F.log((F.col("c_tgt") + 1.0) / (F.col("n_tgt") + F.col("v")))
                - F.log((F.col("c_all") + 1.0) / (F.col("n_all") + F.col("v")))
            )
            * F.lit(float(_DSIR_LW_SCALE))
            + 0.5
        )
        .cast("bigint")
        .alias("lwq"),
    )
    per_doc = (
        toks.filter(F.col("source") != _DSIR_TARGET)
        .join(lm, "token")
        .groupBy("doc_id", "source")
        .agg(F.sum("lwq").cast("bigint").alias("doc_lwq"))
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.floor(F.sum("doc_lwq").cast("double") / F.count(F.lit(1)) + 0.5)
        .cast("bigint")
        .alias("avg_logweight_e6"),
        F.sum((F.col("doc_lwq") > 0).cast("bigint")).alias("n_target_like"),
    )
