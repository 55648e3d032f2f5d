"""Multimodal column handling (SURVEY.md §2.8).

Images / audio / video are carried as opaque `binary` columns plus a
typed metadata struct.  The container has no image/audio codecs, so the
DECODE step is a clearly-marked deterministic stub
(`fake_decode_rgb`) — but the Spark-side plumbing is real and is the
thing under test: binary column construction, Arrow-batched
`mapInPandas` with an explicit output schema, per-batch (not per-row)
processing, and partition-count preservation.

At 100 TB the pattern is exactly this shape: blobs stay in parquet
binary columns (or pointers to object storage), decode/feature-extract
runs as `mapInPandas` over Arrow batches sized by
`spark.sql.execution.arrow.maxRecordsPerBatch`, and all filtering on
metadata happens BEFORE the expensive Python stage so the decoder only
sees surviving rows.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.portable import pround
from ..registry import register
from ..sources.catalog import load_table

_FEATURE_SCHEMA = (
    "doc_id bigint, n_bytes bigint, fake_width bigint, fake_height bigint, "
    "fake_mean_luma double"
)


def binary_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text re-materialized as an opaque binary payload column +
    typed metadata — the multimodal at-rest layout (blob + metadata
    struct), built with JVM-side `encode`."""
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.struct(
            F.lit("text/plain").alias("mime"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("bigint").alias("n_bytes"),
            F.md5(F.encode(F.col("text"), "UTF-8")).alias("content_md5"),
        ).alias("meta"),
    )


def fake_decode_rgb(payload: bytes) -> tuple[int, int, float]:
    """STUB decoder — the real image decode (PIL/opencv) is not available
    in this container.  Deterministic fake derived only from the payload
    bytes so tests and oracles can check the plumbing end-to-end.
    Replace the body with a real codec in production; the mapInPandas
    contract (bytes in → features out) stays identical."""
    n = len(payload)
    width = 64 + n % 512
    height = 64 + (n * 7) % 512
    mean_luma = float(sum(payload[:64]) % 256)
    return width, height, mean_luma


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        decoded = pdf["payload"].map(fake_decode_rgb)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len),
                "fake_width": decoded.map(lambda t: t[0]),
                "fake_height": decoded.map(lambda t: t[1]),
                "fake_mean_luma": decoded.map(lambda t: t[2]),
            }
        )


@register(
    "multimodal_metadata",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           md5(text)                  AS content_md5,
           'text/plain'               AS mime
    FROM documents
    """,
    doc="Binary payload column + typed metadata struct (flattened for the "
        "oracle): the at-rest multimodal layout. All JVM-side (encode / "
        "length / md5), no Python.",
    tags=("multimodal",),
)
def multimodal_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir)
    return b.select(
        "doc_id",
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.content_md5").alias("content_md5"),
        F.col("meta.mime").alias("mime"),
    )


_FRAME_STRIDE = 16
_N_FRAMES = 8
_FRAME_SCHEMA = "doc_id bigint, n_bytes bigint, frames array<bigint>"


def _frame_sample_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    def sample(payload: bytes) -> list[int]:
        out = []
        for i in range(_N_FRAMES):
            pos = i * _FRAME_STRIDE
            out.append(int(payload[pos]) if pos < len(payload) else -1)
        return out

    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": pdf["payload"].map(len),
                "frames": pdf["payload"].map(sample),
            }
        )


@register(
    "multimodal_frame_sample",
    oracle=f"""
    SELECT doc_id,
           octet_length(encode(text)) AS n_bytes,
           array_to_string(list_transform(generate_series(1, {_N_FRAMES}),
             i -> CASE WHEN (i - 1) * {_FRAME_STRIDE} + 1 <= length(text)
                       THEN CAST(ascii(substr(text, (i - 1) * {_FRAME_STRIDE} + 1, 1)) AS BIGINT)
                       ELSE CAST(-1 AS BIGINT) END), ',') AS frames
    FROM documents
    """,
    doc="Audio/video frame-sampling stub over the binary payload: every "
        "16th byte, first 8 'frames' (a real decoder would seek keyframes; "
        "the mapInPandas batch plumbing and output shape are the real "
        "part). Value-checked: the payload is ASCII text, so byte k == "
        "ascii(char k) lets SQL mirror the byte indexing.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    frames = b.mapInPandas(_frame_sample_batches, schema=_FRAME_SCHEMA)
    # the Arrow batch boundary carries a real array<bigint>; the registered
    # output serializes it (driver canonicalizer can't hash list cells)
    return frames.select(
        "doc_id",
        "n_bytes",
        F.array_join(F.col("frames").cast("array<string>"), ",").alias("frames"),
    )


_ROUTING_SCHEMA = "doc_id bigint, mime string, f_a bigint, f_b bigint"
_MIMES = ("image/fake", "audio/fake", "text/plain")


def _route_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    # one Arrow pass, per-modality dispatch INSIDE the batch: the point
    # is one corpus scan for all modalities, not one scan per decoder
    def feats(doc_id: int, mime: str, payload: bytes) -> tuple[int, int]:
        n = len(payload)
        b0 = int(payload[0]) if n else -1
        if mime == "image/fake":     # stub decode: dims from byte count
            return 64 + n % 512, b0
        if mime == "audio/fake":     # stub: 16 bytes/ms "sample rate"
            return n // 16, n % 256
        return n, b0                 # text/plain: raw length + first byte

    for pdf in batches:
        mimes = pdf["doc_id"].map(lambda d: _MIMES[int(d) % 3])
        out = [
            feats(d, m, p)
            for d, m, p in zip(pdf["doc_id"], mimes, pdf["payload"], strict=True)
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "mime": mimes,
                "f_a": [t[0] for t in out],
                "f_b": [t[1] for t in out],
            }
        )


@register(
    "multimodal_modality_routing",
    oracle="""
    SELECT doc_id,
           CASE doc_id % 3 WHEN 0 THEN 'image/fake'
                           WHEN 1 THEN 'audio/fake'
                           ELSE 'text/plain' END AS mime,
           CASE doc_id % 3
             WHEN 0 THEN 64 + octet_length(encode(text)) % 512
             WHEN 1 THEN octet_length(encode(text)) // 16
             ELSE octet_length(encode(text)) END AS f_a,
           CASE doc_id % 3
             WHEN 0 THEN CASE WHEN length(text) = 0 THEN -1
                              ELSE CAST(ascii(substr(text, 1, 1)) AS BIGINT) END
             WHEN 1 THEN octet_length(encode(text)) % 256
             ELSE CASE WHEN length(text) = 0 THEN -1
                       ELSE CAST(ascii(substr(text, 1, 1)) AS BIGINT) END
           END AS f_b
    FROM documents
    """,
    doc="Modality routing: a mixed-modality corpus (modality derived "
        "deterministically from doc_id here; a mime column in "
        "production) decoded in ONE mapInPandas pass that dispatches "
        "per-modality stub decoders inside each Arrow batch — one "
        "corpus scan serves every decoder, instead of one filtered "
        "scan per modality.  Decoders are the documented deterministic "
        "stubs (no codecs in-container); the oracle replays their "
        "arithmetic per modality branch — including the empty-payload "
        "branch, where the stub's first-byte feature is -1 and DuckDB's "
        "ascii('') would otherwise read 0 (r12 review fix) — "
        "value-checking the routing end-to-end.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_modality_routing(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    return b.mapInPandas(_route_batches, schema=_ROUTING_SCHEMA)


_BYTE_STATS_SCHEMA = (
    "doc_id bigint, n_bytes bigint, n_distinct_bytes bigint, "
    "byte_entropy double, content_md5 string, has_control_bytes boolean"
)


def _byte_stats_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    import hashlib
    import math

    import numpy as np

    def stats(payload: bytes):
        arr = np.frombuffer(payload, dtype=np.uint8)
        counts = np.bincount(arr, minlength=256)
        n = int(arr.size)
        if n:
            p = counts[counts > 0] / n
            # same portable rounding as pround (floor(x*1e6+0.5)/1e6) so
            # the double matches DuckDB's entropy() bit-for-bit
            ent = math.floor(float(-(p * np.log2(p)).sum()) * 1e6 + 0.5) / 1e6
        else:
            ent = 0.0
        # control bytes other than \t \n \r signal a corrupt/binary-in-
        # text payload — the cheap validity screen before any decode
        ctrl = int(counts[:32].sum()) - int(counts[9] + counts[10] + counts[13])
        return (
            n,
            int((counts > 0).sum()),
            ent,
            hashlib.md5(payload).hexdigest(),
            bool(ctrl > 0),
        )

    for pdf in batches:
        s = pdf["payload"].map(stats)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": s.map(lambda t: t[0]),
                "n_distinct_bytes": s.map(lambda t: t[1]),
                "byte_entropy": s.map(lambda t: t[2]),
                "content_md5": s.map(lambda t: t[3]),
                "has_control_bytes": s.map(lambda t: t[4]),
            }
        )


@register(
    "multimodal_byte_stats",
    oracle="""
    WITH ch AS (
      SELECT doc_id, unnest(split(text, '')) AS c FROM documents
      WHERE length(text) > 0
    ), st AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT)          AS n_bytes,
             CAST(count(DISTINCT c) AS BIGINT) AS n_distinct_bytes,
             floor(entropy(c) * 1000000.0 + 0.5) / 1000000.0 AS byte_entropy,
             bool_or(ascii(c) < 32 AND ascii(c) NOT IN (9, 10, 13))
               AS has_control_bytes
      FROM ch GROUP BY doc_id
    )
    SELECT st.doc_id, st.n_bytes, st.n_distinct_bytes, st.byte_entropy,
           md5(d.text) AS content_md5, st.has_control_bytes
    FROM st JOIN documents d ON d.doc_id = st.doc_id
    """,
    doc="Corruption / byte-entropy scan over the binary payload — the "
        "validity screen a multimodal pipeline runs BEFORE any decode: "
        "byte count, distinct-byte cardinality, Shannon entropy of the "
        "byte histogram (log2; truncated text ~4 bits, compressed/"
        "encrypted blobs ~8, constant padding ~0), md5 checksum, and a "
        "control-byte flag (any byte <32 except tab/newline/CR).  Map-"
        "only mapInPandas with a bounded 256-bin histogram per row — no "
        "shuffle at any scale.  Value-checked end-to-end: the payload "
        "is ASCII text, so DuckDB's char-level entropy()/md5 mirror the "
        "byte-level numpy path exactly (both engines round entropy with "
        "the shared portable formula).",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # zero-length guard (r12 review fix): DuckDB's split('', '') is
    # [''] so an empty payload would read as 1 phantom byte with a
    # control-byte flag on the oracle side while the numpy path
    # returns zeros — filter empties on BOTH sides, the established
    # sibling guard (chunk_payloads n_bytes>0, payload_stats_arrow
    # CASE length>0); an empty payload has no byte stats to report
    b = (
        binary_documents(spark, sf_dir)
        .filter(F.length("payload") > 0)
        .select("doc_id", "payload")
    )
    return b.mapInPandas(_byte_stats_batches, schema=_BYTE_STATS_SCHEMA)


@register(
    "multimodal_decode_features",
    oracle="""
    SELECT doc_id,
           octet_length(encode(text))                    AS n_bytes,
           64 + octet_length(encode(text)) % 512         AS fake_width,
           64 + (octet_length(encode(text)) * 7) % 512   AS fake_height
    FROM documents
    """,
    doc="Arrow-batched mapInPandas decode stage over the binary payload "
        "(decode itself is the documented deterministic stub — no codecs in "
        "this container). The oracle checks the deterministic width/height "
        "features; mean-luma (bytes-content-derived) is covered by pytest.",
    tags=("multimodal", "pandas-udf"),
)
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    feats = b.mapInPandas(_decode_batches, schema=_FEATURE_SCHEMA)
    # luma is bytes-derived; excluded here so the remaining columns are
    # SQL-oracle-checkable (luma asserted in tests/test_multimodal.py)
    return feats.select("doc_id", "n_bytes", "fake_width", "fake_height")


# byte window for payload segmentation (audio frame / video GOP /
# image tile stand-in) — compile-time constant shared with the oracle
PAYLOAD_CHUNK_BYTES = 256


@register(
    "multimodal_chunk_payloads",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n_bytes
      FROM documents
    )
    SELECT s.doc_id,
           CAST(gs.i AS INTEGER)                          AS chunk_idx,
           CAST(gs.i * {PAYLOAD_CHUNK_BYTES} AS BIGINT)   AS byte_offset,
           CAST(least({PAYLOAD_CHUNK_BYTES},
                      s.n_bytes - gs.i * {PAYLOAD_CHUNK_BYTES}) AS BIGINT)
             AS chunk_bytes,
           md5(substring(s.text, gs.i * {PAYLOAD_CHUNK_BYTES} + 1,
                         {PAYLOAD_CHUNK_BYTES}))          AS chunk_md5
    FROM sized s,
         LATERAL (SELECT unnest(generate_series(
             0, CAST(ceil(s.n_bytes / {PAYLOAD_CHUNK_BYTES}.0) AS BIGINT) - 1))
             AS i) gs
    """,
    doc=f"Payload segmentation: split each binary blob into "
        f"{PAYLOAD_CHUNK_BYTES}-byte windows with (offset, length, md5) "
        f"per chunk — the audio-frame / video-GOP / image-tile cutting "
        f"step that turns one large blob row into decoder-sized work "
        f"units, and the checksums that make per-chunk retries "
        f"idempotent.  Pure JVM expressions (sequence+explode over the "
        f"binary column, substring/md5 on bytes): map-only, no Python, "
        f"no shuffle at any scale — row count grows by blob_size/"
        f"{PAYLOAD_CHUNK_BYTES} so at 100 TB this is emitted straight "
        f"into a partitioned write, never aggregated.  Value-checked "
        f"end-to-end: the fixture payload is ASCII so DuckDB's char-"
        f"level substring/md5 equal Spark's byte-level ones.",
    tags=("multimodal",),
)
def multimodal_chunk_payloads(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir).select(
        "doc_id", "payload", F.col("meta.n_bytes").alias("n_bytes")
    )
    # zero-byte payloads produce ZERO chunks (as the oracle's
    # generate_series(0, -1) does) — without this filter
    # F.sequence(0, -1) would default to step -1 and emit [0, -1]
    b = b.filter(F.col("n_bytes") > 0)
    n_chunks = F.ceil(F.col("n_bytes") / F.lit(float(PAYLOAD_CHUNK_BYTES)))
    e = b.select(
        "doc_id",
        "payload",
        "n_bytes",
        F.explode(F.sequence(F.lit(0), (n_chunks - 1).cast("int"))).alias(
            "chunk_idx"
        ),
    )
    chunk = F.substring(
        F.col("payload"),
        (F.col("chunk_idx") * PAYLOAD_CHUNK_BYTES + 1).cast("int"),
        PAYLOAD_CHUNK_BYTES,
    )
    return e.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        (F.col("chunk_idx").cast("bigint") * PAYLOAD_CHUNK_BYTES).alias(
            "byte_offset"
        ),
        F.least(
            F.lit(PAYLOAD_CHUNK_BYTES).cast("bigint"),
            F.col("n_bytes") - F.col("chunk_idx") * PAYLOAD_CHUNK_BYTES,
        ).alias("chunk_bytes"),
        F.md5(chunk).alias("chunk_md5"),
    )


@register(
    "multimodal_payload_dedup",
    oracle="""
    SELECT md5(text)                          AS content_md5,
           CAST(count(*) AS BIGINT)           AS n_copies,
           CAST(min(doc_id) AS BIGINT)        AS keeper_doc_id,
           CAST(min(octet_length(encode(text))) AS BIGINT) AS payload_bytes,
           CAST((count(*) - 1) * min(octet_length(encode(text))) AS BIGINT)
             AS wasted_bytes
    FROM documents
    GROUP BY md5(text)
    HAVING count(*) > 1
    """,
    doc="Exact BINARY dedup over the payload column: group by raw-byte "
        "md5, keep the lowest doc_id, account the storage the copies "
        "waste.  The multimodal sibling of dedup_exact — that op "
        "normalizes TEXT before hashing; media blobs have no "
        "normalization, so the checksum is over the raw bytes (the "
        "same content_md5 the at-rest metadata struct already carries, "
        "so at 100 TB this never re-reads the blobs: it aggregates the "
        "metadata column).  ONE grouped agg on the checksum with "
        "map-side combine; the HAVING keeps only duplicate groups, so "
        "output is bounded by the dup count, not the corpus.",
    tags=("multimodal", "dedup", "agg"),
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir)
    return (
        b.select(
            F.col("meta.content_md5").alias("content_md5"),
            "doc_id",
            F.col("meta.n_bytes").alias("n_bytes"),
        )
        .groupBy("content_md5")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").cast("bigint").alias("keeper_doc_id"),
            F.min("n_bytes").cast("bigint").alias("payload_bytes"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "content_md5",
            "n_copies",
            "keeper_doc_id",
            "payload_bytes",
            ((F.col("n_copies") - 1) * F.col("payload_bytes"))
            .cast("bigint")
            .alias("wasted_bytes"),
        )
    )


@register(
    "multimodal_caption_audit",
    oracle="""
    WITH pairs AS (
      SELECT doc_id, source,
             trim(split_part(text, '.', 1)) AS caption
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT)                  AS n_pairs,
           CAST(count(DISTINCT caption) AS BIGINT)   AS n_distinct_captions,
           floor((1.0 - count(DISTINCT caption) * 1.0 / count(*))
                 * 1000000.0 + 0.5) / 1000000.0      AS dup_caption_rate,
           floor(avg(length(caption)) * 1000000.0 + 0.5) / 1000000.0
                                                     AS mean_caption_chars,
           (1.0 - count(DISTINCT caption) * 1.0 / count(*)) > 0.5
                                                     AS boilerplate_flag
    FROM pairs GROUP BY source
    """,
    doc="Caption-pair quality audit for (media payload, caption) "
        "training pairs, CLIP-style: the caption is the payload's "
        "leading sentence (first '.'-delimited span — the alt-text "
        "stand-in), and the audit flags SOURCES whose captions are "
        "mostly duplicated — boilerplate alt-text ('image', 'photo') "
        "is the dominant failure mode of web-scraped image-text data "
        "and poisons contrastive training.  Per-source: pair count, "
        "distinct captions, duplication rate, mean caption length, "
        "boilerplate flag (>50% dup).  Scale shape: caption extraction "
        "is map-only string math fused into the scan; then ONE grouped "
        "agg per source (count_distinct partial-aggregated map-side).  "
        "Both engines trim the identical first-span expression "
        "(substring_index == split_part on the no-separator edge: both "
        "return the whole string).",
    tags=("multimodal", "text", "agg"),
)
def multimodal_caption_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    caption = F.trim(F.substring_index(F.col("text"), ".", 1))
    pairs = d.select("doc_id", "source", caption.alias("caption"))
    dup_rate = F.lit(1.0) - F.countDistinct("caption") / F.count(F.lit(1))
    return (
        pairs.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.countDistinct("caption").alias("n_distinct_captions"),
            pround(dup_rate, 6).alias("dup_caption_rate"),
            pround(F.avg(F.length("caption")), 6).alias("mean_caption_chars"),
            (dup_rate > F.lit(0.5)).alias("boilerplate_flag"),
        )
    )


def _arrow_payload_stats(batches):
    """pyarrow.compute over raw Arrow RecordBatches — no pandas
    materialization at all (mapInPandas converts every batch to/from
    pandas; for fixed-width byte math that conversion IS the cost)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    for batch in batches:
        payload = batch.column(1)
        n_bytes = pc.binary_length(payload)
        first_byte = pc.if_else(
            pc.greater(n_bytes, 0),
            pc.utf8_slice_codeunits(pc.cast(payload, pa.string()), 0, 1),
            pa.scalar(None, pa.string()),
        )
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(0),
                pc.cast(n_bytes, pa.int64()),
                first_byte,
            ],
            ["doc_id", "n_bytes", "first_char"],
        )


@register(
    "multimodal_payload_stats_arrow",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CASE WHEN length(text) > 0 THEN substr(text, 1, 1) END AS first_char
    FROM documents
    """,
    doc="mapInArrow over the binary payload column — the FIFTH and "
        "lowest-level Python boundary (after scalar pandas_udf, "
        "grouped-agg pandas UDF, applyInPandas/mapInPandas, and the "
        "UDTF): the generator receives raw Arrow RecordBatches and "
        "answers with pyarrow.compute kernels, skipping the "
        "pandas conversion entirely — for fixed-width byte math on "
        "blobs the conversion IS most of mapInPandas' cost, so this "
        "is the shape a production byte-screen uses.  Map-only, "
        "value-checked cross-engine (the payload is UTF-8 text, so "
        "DuckDB's octet_length/substr mirror the Arrow kernels).",
    tags=("multimodal", "pandas-udf", "arrow"),
)
def multimodal_payload_stats_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    return b.mapInArrow(
        _arrow_payload_stats, schema="doc_id bigint, n_bytes bigint, first_char string"
    )


@register(
    "document_embedding_coverage",
    oracle="""
    WITH off AS (
      SELECT CAST(max(doc_id) + 1 AS BIGINT) AS o FROM documents
    ), idx AS (
      SELECT vec_id FROM embeddings WHERE vec_id % 17 <> 0
      UNION ALL
      SELECT vec_id + off.o FROM embeddings CROSS JOIN off
      WHERE vec_id % 19 = 0
    ), joined AS (
      SELECT d.doc_id, d.source, i.vec_id
      FROM documents d FULL OUTER JOIN idx i ON i.vec_id = d.doc_id
    )
    SELECT coalesce(source, '_dangling_vectors') AS source,
           CAST(count(doc_id) AS BIGINT)  AS n_docs,
           CAST(count(*) FILTER (WHERE doc_id IS NOT NULL AND vec_id IS NOT NULL)
                AS BIGINT)                AS n_indexed,
           CAST(count(*) FILTER (WHERE doc_id IS NOT NULL AND vec_id IS NULL)
                AS BIGINT)                AS n_missing_embedding,
           CAST(count(*) FILTER (WHERE doc_id IS NULL) AS BIGINT) AS n_dangling
    FROM joined GROUP BY 1
    """,
    doc="Corpus-to-vector-store referential audit: which documents "
        "lack an embedding (index lag — they silently drop out of "
        "semantic dedup and retrieval) and which vectors have no "
        "backing document (stale index entries that resurrect deleted "
        "docs — a right-to-be-forgotten liability).  The index side "
        "is a deterministic perturbation of the embeddings table "
        "(every 17th id unindexed, every 19th shifted to a dangling "
        "key) so both orphan classes are actually exercised and the "
        "oracle rebuilds the same inputs — the snapshot_diff trick.  "
        "Scale shape: ONE co-partitioned full-outer join on the id "
        "(embedding PAYLOADS never move — only ids), grouped to "
        "|sources|+1 rows.  This is the nightly sync gate between a "
        "100 TB corpus and its vector index.",
    tags=("multimodal", "dq", "join"),
)
def document_embedding_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    e = load_table(spark, sf_dir, "embeddings")
    # the synthetic dangling ids start at max(doc_id)+1, DERIVED from
    # the data (r12 review fix: a hardcoded +100000 offset stops being
    # dangling once the corpus passes 100001 docs — the fabricated ids
    # then collide with real doc_ids, the audit's two orphan classes
    # report wrong numbers, and the oracle mirrors the same constant so
    # parity can't catch it).  The 1-row max broadcasts for free.
    off = d.agg((F.max("doc_id") + 1).cast("bigint").alias("o"))
    idx = (
        e.filter(F.col("vec_id") % 17 != 0)
        .select("vec_id")
        .unionByName(
            e.filter(F.col("vec_id") % 19 == 0)
            .crossJoin(F.broadcast(off))
            .select((F.col("vec_id") + F.col("o")).alias("vec_id"))
        )
    )
    j = d.join(idx, d.doc_id == idx.vec_id, "full_outer")
    return (
        j.groupBy(
            F.coalesce(F.col("source"), F.lit("_dangling_vectors")).alias("source")
        )
        .agg(
            F.count("doc_id").cast("bigint").alias("n_docs"),
            F.sum(
                (F.col("doc_id").isNotNull() & F.col("vec_id").isNotNull()).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("n_indexed"),
            F.sum(
                (F.col("doc_id").isNotNull() & F.col("vec_id").isNull()).cast(
                    "bigint"
                )
            )
            .cast("bigint")
            .alias("n_missing_embedding"),
            F.sum(F.col("doc_id").isNull().cast("bigint"))
            .cast("bigint")
            .alias("n_dangling"),
        )
    )


# Standard training-batch aspect-ratio buckets (name, ratio w:h, pick order)
AR_BUCKETS: tuple[tuple[str, int, int, int], ...] = (
    ("square_1_1", 1, 1, 1),
    ("landscape_4_3", 4, 3, 2),
    ("wide_16_9", 16, 9, 3),
    ("portrait_3_4", 3, 4, 4),
    ("tall_9_16", 9, 16, 5),
)


def _duck_ar_buckets_values() -> str:
    return ", ".join(f"('{n}', {nb}, {db}, {r})" for n, nb, db, r in AR_BUCKETS)


@register(
    "multimodal_aspect_ratio_buckets",
    oracle=f"""
    WITH dims AS (
      SELECT doc_id,
             CAST(64 + octet_length(encode(text)) % 512 AS BIGINT)       AS w,
             CAST(64 + (octet_length(encode(text)) * 7) % 512 AS BIGINT) AS h
      FROM documents
    ), b(bucket, nb, db, pick) AS (
      VALUES {_duck_ar_buckets_values()}
    ), scored AS (
      SELECT d.doc_id, b.bucket,
             greatest(d.w * b.db, d.h * b.nb) AS num,
             least(d.w * b.db, d.h * b.nb)    AS den,
             b.pick
      FROM dims d CROSS JOIN b
    ), best AS (
      SELECT doc_id, bucket,
             (num - den) * 1000000 // num AS waste_e6
      FROM scored
      QUALIFY row_number() OVER (PARTITION BY doc_id
              ORDER BY num * 1.0 / den, pick) = 1
    )
    SELECT bucket,
           CAST(count(*) AS BIGINT) AS n_docs,
           floor((CAST(sum(waste_e6) AS BIGINT) * 1.0
                  / (count(*) * 1000000.0)) * 1000000.0 + 0.5) / 1000000.0
             AS avg_padding_waste,
           floor((CAST(max(waste_e6) AS BIGINT) / 1000000.0) * 1000000.0 + 0.5)
             / 1000000.0 AS max_padding_waste
    FROM best
    GROUP BY bucket
    """,
    doc="Aspect-ratio bucketing for multimodal training batches: every "
        "image is assigned to the nearest of five standard ratios "
        "(1:1, 4:3, 16:9, 3:4, 9:16) so batches group same-shape "
        "samples and padding waste is measured per bucket — the "
        "standard fixed-shape-batch preprocessing step.  Dimensions "
        "come from the container's documented deterministic decode "
        "stub (fake_decode_rgb) via the same Arrow-batched mapInPandas "
        "stage as multimodal_decode_features.  Nearest-ratio choice is "
        "EXACT integer arithmetic: for bucket nb:db the misfit is the "
        "ratio max(w*db, h*nb)/min(w*db, h*nb); the argmin over the "
        "FIVE candidates is computed per row with array_min over "
        "(misfit, pick_order) structs — zero shuffle, no per-doc "
        "window — and per-doc padding waste ((num-den)*1e6 div num) "
        "is integer division, so both engines agree bit-for-bit.  "
        "Scale shape: one mapInPandas decode pass + per-row constant "
        "array math + ONE partial-agg shuffle to 5 bucket cells.",
    tags=("multimodal", "pandas-udf", "pipeline"),
)
def multimodal_aspect_ratio_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    feats = b.mapInPandas(_decode_batches, schema=_FEATURE_SCHEMA).select(
        "doc_id",
        F.col("fake_width").alias("w"),
        F.col("fake_height").alias("h"),
    )
    cands = []
    for name, nb, db, pick in AR_BUCKETS:
        num = F.greatest(F.col("w") * F.lit(db), F.col("h") * F.lit(nb))
        den = F.least(F.col("w") * F.lit(db), F.col("h") * F.lit(nb))
        # exact integer floor division end-to-end (no double path): the
        # oracle's `//` and this `div` agree bit-for-bit at ANY dims,
        # not just while quotients stay clear of integer boundaries.
        numi = f"greatest(CAST(w AS BIGINT) * {db}, CAST(h AS BIGINT) * {nb})"
        deni = f"least(CAST(w AS BIGINT) * {db}, CAST(h AS BIGINT) * {nb})"
        cands.append(
            F.struct(
                (num * F.lit(1.0) / den).alias("misfit"),
                F.lit(pick).alias("pick"),
                F.lit(name).alias("bucket"),
                F.expr(f"(({numi} - {deni}) * 1000000) div {numi}").alias("waste_e6"),
            )
        )
    best = feats.select(F.array_min(F.array(*cands)).alias("best"))
    return (
        best.groupBy(F.col("best.bucket").alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            pround(
                F.sum("best.waste_e6") * F.lit(1.0)
                / (F.count(F.lit(1)) * F.lit(1000000.0)),
                6,
            ).alias("avg_padding_waste"),
            pround(F.max("best.waste_e6") / F.lit(1000000.0), 6).alias(
                "max_padding_waste"
            ),
        )
    )


# ---------------------------------------------------------------------------
# round 11: declared-mime vs payload magic-byte audit
# ---------------------------------------------------------------------------

_FMT_SCHEMA = "declared_mime string, detected string"

# byte signatures: the binary-only ones (png/jpeg) can never occur in a
# UTF-8 payload, so they are unreachable on THIS corpus (the oracle
# mirrors only the ASCII-representable ones) — but the detector ships
# the full production set so a real image/audio blob routes correctly.
_FMT_SIGS = (
    (b"\x89PNG", "png"),
    (b"\xff\xd8\xff", "jpeg"),
    (b"%PDF", "pdf"),
    (b"GIF8", "gif"),
    (b"RIFF", "riff"),
    (b"PK\x03\x04", "zip"),
)
_FMT_PRINTABLE = frozenset(range(32, 127)) | {9, 10, 13}
# what each declared mime is allowed to contain
_FMT_EXPECTED = {
    "text/plain": ("ascii-text",),
    "image/fake": ("png", "jpeg", "gif", "riff"),
    "audio/fake": ("riff",),
}


def _detect_format(payload: bytes) -> str:
    if not payload:
        return "empty"
    for sig, name in _FMT_SIGS:
        if payload.startswith(sig):
            return name
    head = payload[: min(4, len(payload))]
    if all(b in _FMT_PRINTABLE for b in head):
        return "ascii-text"
    return "binary-unknown"


def _format_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        yield pd.DataFrame(
            {
                "declared_mime": pdf["doc_id"].map(lambda d: _MIMES[int(d) % 3]),
                "detected": pdf["payload"].map(_detect_format),
            }
        )


@register(
    "multimodal_format_magic_mismatch",
    oracle="""
    WITH det AS (
      SELECT CASE doc_id % 3 WHEN 0 THEN 'image/fake'
                             WHEN 1 THEN 'audio/fake'
                             ELSE 'text/plain' END AS declared_mime,
             CASE
               WHEN octet_length(encode(text)) = 0 THEN 'empty'
               WHEN starts_with(text, '%PDF') THEN 'pdf'
               WHEN starts_with(text, 'GIF8') THEN 'gif'
               WHEN starts_with(text, 'RIFF') THEN 'riff'
               WHEN starts_with(text, 'PK' || chr(3) || chr(4)) THEN 'zip'
               WHEN regexp_matches(substr(text, 1, 4),
                                   '^[ -~\t\r\n]+$') THEN 'ascii-text'
               ELSE 'binary-unknown'
             END AS detected
      FROM documents
    )
    SELECT declared_mime, detected,
           CAST(count(*) AS BIGINT) AS n_docs,
           detected NOT IN (CASE declared_mime
                              WHEN 'text/plain' THEN 'ascii-text'
                              ELSE '' END)
             AND NOT (declared_mime = 'image/fake'
                      AND detected IN ('png', 'jpeg', 'gif', 'riff'))
             AND NOT (declared_mime = 'audio/fake' AND detected = 'riff')
             AS mismatch
    FROM det
    GROUP BY declared_mime, detected
    """,
    doc="Declared-mime vs magic-byte audit: every payload's leading "
        "bytes are classified against the standard format signatures "
        "(PNG/JPEG/PDF/GIF/RIFF/ZIP, else printable-ASCII text, else "
        "unknown binary) in one Arrow-vectorized mapInPandas pass, and "
        "cross-tabulated against the mime the catalog DECLARES (the "
        "modality-routing convention) — the corrupted-upload / "
        "mislabeled-modality screen a multimodal ingest runs before "
        "wasting GPU decode time.  On this synthetic corpus every "
        "payload is UTF-8 text, so the image/- and audio/-declared "
        "rows are flagged mismatch=true — the audit CORRECTLY calls "
        "the fixture's declared modalities fake.  The binary-only "
        "signatures (PNG/JPEG) cannot occur in UTF-8 payloads, so the "
        "char-level oracle mirrors only the ASCII-representable ones; "
        "verdict parity is exact.  Scale shape: map-only detection, "
        "one partial agg to a |mimes x formats| cell table.",
    tags=("multimodal", "pandas-udf", "quality"),
)
def multimodal_format_magic_mismatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    b = binary_documents(spark, sf_dir).select("doc_id", "payload")
    det = b.mapInPandas(_format_batches, schema=_FMT_SCHEMA)
    expected = F.create_map(
        *[
            x
            for mime, fmts in _FMT_EXPECTED.items()
            for x in (F.lit(mime), F.array(*[F.lit(f) for f in fmts]))
        ]
    )
    return det.groupBy("declared_mime", "detected").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    ).select(
        "declared_mime",
        "detected",
        "n_docs",
        (
            ~F.array_contains(
                F.coalesce(expected[F.col("declared_mime")], F.array()),
                F.col("detected"),
            )
        ).alias("mismatch"),
    )


_SHARD_BUDGET_BYTES = 32_768  # 32 KB per training shard (fixture-scale)


@register(
    "multimodal_shard_pack_plan",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id,
             CASE doc_id % 3 WHEN 0 THEN 'image/fake'
                             WHEN 1 THEN 'audio/fake'
                             ELSE 'text/plain' END AS modality,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
    ), cum AS (
      SELECT doc_id, modality, n_bytes,
             sum(n_bytes) OVER (PARTITION BY modality ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_bytes
               AS prev_cum
      FROM docs
    ), placed AS (
      SELECT modality, doc_id, n_bytes,
             CAST(prev_cum // {_SHARD_BUDGET_BYTES} AS BIGINT) AS shard_id
      FROM cum
    )
    SELECT modality, shard_id,
           CAST(count(*) AS BIGINT)      AS n_docs,
           CAST(sum(n_bytes) AS BIGINT)  AS shard_bytes,
           CAST(min(doc_id) AS BIGINT)   AS first_doc,
           CAST(max(doc_id) AS BIGINT)   AS last_doc,
           (sum(n_bytes) > {_SHARD_BUDGET_BYTES}) AS over_budget
    FROM placed GROUP BY modality, shard_id
    """,
    doc=f"Training-shard PACKING PLAN for a mixed-modality corpus: "
        f"within each modality (images with images — a training shard "
        f"mixes badly across decoders), payloads are packed "
        f"doc_id-sequentially into ~{_SHARD_BUDGET_BYTES}-byte shards "
        f"by the streaming next-fit rule shard = floor(bytes-before-me "
        f"/ budget) — a shard may overflow by at most one payload "
        f"(over_budget flags those), never underflow-fragment.  The "
        f"complement of write_training_shards (which hash-buckets "
        f"DOCUMENTS for determinism): this plans BYTE-budgeted media "
        f"shards, the layout GPU dataloaders stream.  Scale shape: the "
        f"per-modality prefix sum is NOT a 3-partition window over the "
        f"corpus (that serializes 100 TB through 3 tasks) — it is "
        f"functions/scale.global_running_sum range-partitioned on "
        f"(modality, doc_id), a parallel sort + broadcast offsets, "
        f"with the per-modality reset recovered by subtracting each "
        f"modality's broadcast prior-modality byte total: prefix-within"
        f"-modality = global-prefix − bytes-of-earlier-modalities, "
        f"exact integers throughout.  The final rollup is "
        f"|shards|-sized.",
    tags=("multimodal", "pipeline", "scale"),
)
def multimodal_shard_pack_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..functions.scale import global_running_sum

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, F.lit("image/fake"))
        .when(F.col("doc_id") % 3 == 1, F.lit("audio/fake"))
        .otherwise(F.lit("text/plain"))
        .alias("modality"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
    )
    g = global_running_sum(
        d, [F.asc("modality"), F.asc("doc_id")], "n_bytes", "gcum"
    )
    # bytes of all modalities ordered BEFORE each one: a 3-row
    # aggregate, broadcast both ways
    totals = d.groupBy("modality").agg(F.sum("n_bytes").cast("bigint").alias("mb"))
    prior = (
        totals.alias("a")
        .join(
            F.broadcast(totals.alias("b")),
            F.col("b.modality") < F.col("a.modality"),
            "left",
        )
        .groupBy(F.col("a.modality").alias("modality"))
        .agg(F.coalesce(F.sum("b.mb"), F.lit(0)).cast("bigint").alias("prior_bytes"))
    )
    placed = (
        g.join(F.broadcast(prior), "modality")
        .withColumn(
            "prev_cum", F.col("gcum") - F.col("prior_bytes") - F.col("n_bytes")
        )
        .withColumn(
            "shard_id",
            F.expr(f"prev_cum div {_SHARD_BUDGET_BYTES}L").cast("bigint"),
        )
    )
    return placed.groupBy("modality", "shard_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_bytes").cast("bigint").alias("shard_bytes"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.max("doc_id").cast("bigint").alias("last_doc"),
        (F.sum("n_bytes") > F.lit(_SHARD_BUDGET_BYTES)).alias("over_budget"),
    )
