"""Streaming sinks (SURVEY.md §2.5 K1-K7).

Each helper returns a configured `DataStreamWriter` (caller invokes
`.start()`), mirroring the reference sink-for-sink:

- console (K1, v1:60-65)               → console_sink
- foreachBatch sorted emit (K2, v2:9-14,77-81) → foreach_batch_topk
- parquet append (K3, v2:84-89)        → parquet_sink
- Kafka publish (K4, NiFi XML:996-1073) → kafka_sink
- warehouse DDL (K5, dag:68-81)        → warehouse.create_external_table
- JDBC export (K6, dag:83-90)          → warehouse.jdbc_export
- memory (test harness, SURVEY.md §5)  → memory_sink
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def console_sink(
    df: DataFrame,
    output_mode: str = "update",
    checkpoint: str | None = None,
    trigger: str | None = None,
) -> DataStreamWriter:
    """K1 (v1:60-65): update-mode console emit with checkpoint +
    processing-time trigger."""
    w = df.writeStream.format("console").outputMode(output_mode)
    if checkpoint:
        w = w.option("checkpointLocation", checkpoint)
    if trigger:
        w = w.trigger(processingTime=trigger)
    return w


def memory_sink(
    df: DataFrame, name: str, output_mode: str = "append", trigger: str | None = None
) -> DataStreamWriter:
    """Test-harness sink: accumulate into an in-memory table readable as
    `spark.sql(f"SELECT * FROM {name}")` (SURVEY.md §5 streaming golden
    tests)."""
    w = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if trigger:
        w = w.trigger(processingTime=trigger)
    return w


def parquet_sink(
    df: DataFrame,
    path: str,
    checkpoint: str,
    trigger: str | None = None,
) -> DataStreamWriter:
    """K3 (v2:84-89): append-mode parquet. Legal on a watermarked
    aggregation — windows are emitted once finalized.  At scale, add
    `.partitionBy("dt")` on a date column derived from the window start
    so downstream scans partition-prune."""
    w = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger:
        w = w.trigger(processingTime=trigger)
    return w


def kafka_payload(df: DataFrame) -> DataFrame:
    """The exact serialization kafka_sink publishes: every column of
    `df` folded into one JSON document, cast to the binary `value`
    Kafka's wire format carries.  Factored out of the sink so the
    payload↔parse identity is testable WITHOUT a broker — the
    round-trip test (tests/test_warehouse_and_wire.py) proves
    parse_product_views(kafka_payload(wire_rows)) reproduces the rows,
    which is the serialization level this engine owns; broker
    connectivity is config (bootstrap.servers/topic) on top."""
    return df.select(F.to_json(F.struct(*df.columns)).cast("binary").alias("value"))


def kafka_sink(
    df: DataFrame,
    bootstrap_servers: str,
    topic: str,
    checkpoint: str,
) -> DataStreamWriter:
    """K4 (NiFi PublishKafka, XML:996-1073: topic `active`, acks=all,
    transactional): Spark's Kafka sink + checkpointing gives the same
    effective guarantee for idempotent downstreams.  Payload must be a
    `value` column (string/binary); kafka_payload builds it.  Publish
    against a live broker is untestable in this container — the
    payload half is covered by the round-trip test."""
    payload = kafka_payload(df)
    return (
        payload.writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )


def foreach_batch_topk(
    df: DataFrame,
    k: int | None = None,
    order_col: str = "source_number",
    collector: Callable[[DataFrame, int], None] | None = None,
) -> DataStreamWriter:
    """K2/A5/O1 (v2:9-14,77-81): per-epoch re-aggregation — each
    micro-batch arrives as a *batch* DataFrame, globally sorted by
    count desc.  The reference's unbounded `sort(desc(...))` is kept
    but bounded with `limit(k)` when k is given (an unbounded global
    sort per epoch is the part that would not survive scale; top-k
    compiles to TakeOrdered).  `collector` overrides the console write
    (used by tests to capture per-epoch frames)."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        ranked = batch_df.sort(F.desc(order_col))
        if k is not None:
            ranked = ranked.limit(k)
        if collector is not None:
            collector(ranked, epoch_id)
        else:
            ranked.write.format("console").save()

    return df.writeStream.foreachBatch(fn)


def _read_store_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    """Read a persistent sink store, or None when it holds no data yet
    (round-16 review: ONE helper for every store-read site, so the
    tolerance rules cannot drift between sinks).  Two conditions mean
    'no store': PATH_NOT_FOUND (first epoch ever) and
    UNABLE_TO_INFER_SCHEMA (an epoch wrote a PARTITIONED dir with no
    data files — partitioned writes of an empty frame emit only
    _SUCCESS, unlike plain parquet writes which emit a schema-bearing
    empty file).  Any OTHER analysis error (schema drift, mistyped
    column) must propagate — swallowing it would silently disable the
    store probe and corrupt the stream's output permanently."""
    from pyspark.errors import AnalysisException

    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        condition = (
            exc.getCondition() if hasattr(exc, "getCondition") else exc.getErrorClass()
        )
        if condition not in ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA"):
            raise
        return None


def foreach_batch_corpus_dedup(
    df: DataFrame,
    corpus_dir: str,
    out_dir: str,
    fingerprint_col: str = "fingerprint",
) -> DataStreamWriter:
    """Ingest-time dedup against a PERSISTENT corpus fingerprint store —
    the streaming front door of the batch `dedup_incremental_exact`
    tier: each micro-batch keeps only fingerprints never seen in ANY
    earlier batch (across restarts, beyond any watermark horizon,
    where `streaming_dedup_exact`'s in-state dedup ends).

    Per epoch: (1) in-batch dedup; (2) probe the store with the batch
    fingerprints — the corpus side is scanned map-side with the SMALL
    batch side broadcast twice (semi to find collisions, anti to drop
    them), never hashed whole, exactly like dedup_incremental_exact,
    so the pass scales to a 100 TB store; (3) survivors append as the
    store's `epoch=N` partition.

    Exactly-once: foreachBatch may re-run an epoch after a crash.  Both
    writes go to `epoch=<id>` partition directories with overwrite
    mode, and the probe reads only partitions with epoch < current
    (partition-pruned), so a re-run neither double-writes nor drops
    its own rows against its own half-written store partition.
    """

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        corpus_dedup_epoch(batch_df, epoch_id, corpus_dir, out_dir, fingerprint_col)

    return df.writeStream.foreachBatch(fn)


def corpus_dedup_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    corpus_dir: str,
    out_dir: str,
    fingerprint_col: str = "fingerprint",
) -> None:
    """One epoch of foreach_batch_corpus_dedup, module-level so the
    crashed-epoch re-run path is unit-testable: calling this twice
    with the same epoch_id must leave the store and output byte-for-
    byte equivalent (partition overwrite + epoch < N probe)."""
    spark = batch_df.sparkSession
    batch = batch_df.dropDuplicates([fingerprint_col])
    store = _read_store_or_none(spark, corpus_dir)
    if store is None:
        fresh = batch
    else:
        corpus = store.filter(F.col("epoch") < epoch_id)
        seen = corpus.join(
            F.broadcast(batch.select(fingerprint_col)), fingerprint_col, "left_semi"
        ).select(fingerprint_col)
        fresh = batch.join(F.broadcast(seen), fingerprint_col, "left_anti")
    # materialize BEFORE overwriting the store partition: `fresh` must
    # not be re-planned against a store state this write changes
    fresh = fresh.localCheckpoint(eager=True)
    fresh.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
    fresh.select(fingerprint_col).write.mode("overwrite").parquet(
        f"{corpus_dir}/epoch={epoch_id}"
    )


# Bloom summary sizing for the accelerated ingest-dedup path.  Matches
# the batch audit (operators/relational.orders_bloom_prefilter_bound):
# 2^18 bits / 3 hashes holds ~30k keys at <5% FP — re-size per corpus.
BLOOM_DEDUP_M = 1 << 18
BLOOM_DEDUP_K = 3


def _bloom_positions(df: DataFrame, col: str) -> DataFrame:
    """k xxhash64 bit positions per key — one `pos` column."""
    hashes = F.array(*[F.lit(i) for i in range(BLOOM_DEDUP_K)])
    return df.withColumn("_h", F.explode(hashes)).select(
        F.col(col).alias("_key"),
        F.pmod(F.xxhash64(col, "_h"), F.lit(BLOOM_DEDUP_M)).alias("pos"),
    )


def foreach_batch_corpus_dedup_bloom(
    df: DataFrame,
    corpus_dir: str,
    out_dir: str,
    bloom_dir: str,
    fingerprint_col: str = "fingerprint",
) -> DataStreamWriter:
    """`foreach_batch_corpus_dedup` accelerated by a persistent Bloom
    summary of the store — the streaming twin of the
    `orders_bloom_prefilter_bound` admissibility argument.

    The exact path probes the full corpus store every epoch.  Here a
    bounded bit-position table (`bloom_dir/epoch=N` partitions, the
    cell-wise-union of per-epoch bits — Bloom filters are unioned by
    bit OR, i.e. a distinct-position table) screens the batch first:

    - Bloom has NO false negatives, so a key whose bits are not all
      set is PROVABLY new — the store probe runs only on the
      surviving candidates (false positives + true dups).
    - An all-new batch (the append-mostly common case) skips the
      corpus scan entirely: the screen runs against the small bit
      table, never the 100 TB store.

    Output is therefore byte-equivalent to the exact path —
    `test_streaming.py` asserts it — while the per-epoch store-side
    cost drops from |store| to |bits| + |candidates|-bounded probes.
    Exactly-once follows the same epoch-partition overwrite contract
    as the exact path (bloom bits included: epoch < N reads,
    overwrite-on-rerun).
    """

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        corpus_dedup_bloom_epoch(
            batch_df, epoch_id, corpus_dir, out_dir, bloom_dir, fingerprint_col
        )

    return df.writeStream.foreachBatch(fn)


def corpus_dedup_bloom_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    corpus_dir: str,
    out_dir: str,
    bloom_dir: str,
    fingerprint_col: str = "fingerprint",
) -> None:
    """One epoch of the Bloom-screened corpus dedup (module-level for
    the re-run idempotence and exact-equivalence tests)."""
    spark = batch_df.sparkSession
    batch = batch_df.dropDuplicates([fingerprint_col])
    bloom_store = _read_store_or_none(spark, bloom_dir)
    first_epoch = False
    if bloom_store is not None:
        bits = bloom_store.filter(F.col("epoch") < epoch_id).select("pos").distinct()
    else:
        # the bits are DERIVED state: a missing bloom_dir does NOT mean
        # an empty corpus (a pipeline may have run the exact path
        # before, or the bits were retention-cleaned).  Rebuild from
        # the corpus store when it exists — treating this as "first
        # epoch" would skip the probe and write duplicates permanently.
        corpus_store = _read_store_or_none(spark, corpus_dir)
        if corpus_store is not None:
            corpus_prev = corpus_store.filter(F.col("epoch") < epoch_id)
            bits = (
                _bloom_positions(corpus_prev, fingerprint_col)
                .select("pos")
                .distinct()
                .localCheckpoint(eager=True)
            )
        else:
            first_epoch = True
    if first_epoch:
        fresh = batch
    else:
        candidates = (
            _bloom_positions(batch, fingerprint_col)
            .join(F.broadcast(bits), "pos", "left_semi")
            .groupBy("_key")
            .agg(F.count(F.lit(1)).alias("_n_hit"))
            .where(F.col("_n_hit") == BLOOM_DEDUP_K)
            .select(F.col("_key").alias(fingerprint_col))
        ).localCheckpoint(eager=True)
        if candidates.isEmpty():
            # every batch key is provably unseen: no store scan at all
            fresh = batch
        else:
            corpus_store = _read_store_or_none(spark, corpus_dir)
            if corpus_store is None:
                # bloom bits without a corpus (retention-cleaned):
                # every candidate was a false positive
                corpus_store = spark.createDataFrame(
                    [], batch.select(fingerprint_col).withColumn(
                        "epoch", F.lit(0)
                    ).schema
                )
            corpus = corpus_store.filter(F.col("epoch") < epoch_id)
            seen = corpus.join(
                F.broadcast(candidates), fingerprint_col, "left_semi"
            ).select(fingerprint_col)
            fresh = batch.join(F.broadcast(seen), fingerprint_col, "left_anti")
    fresh = fresh.localCheckpoint(eager=True)
    fresh.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
    fresh.select(fingerprint_col).write.mode("overwrite").parquet(
        f"{corpus_dir}/epoch={epoch_id}"
    )
    (
        _bloom_positions(fresh, fingerprint_col)
        .select("pos")
        .distinct()
        .write.mode("overwrite")
        .parquet(f"{bloom_dir}/epoch={epoch_id}")
    )


def foreach_batch_scd2_upsert(
    df: DataFrame,
    store_dir: str,
    key: str,
    attrs: tuple[str, ...],
    effective_col: str = "effective_ts",
) -> DataStreamWriter:
    """Streaming SCD2 dimension maintenance — the CDC-consumer twin of
    the batch `scd2_customer_batch` operator: each micro-batch of
    change records is merged into a versioned dimension store with the
    SAME `operators.scd.scd2_apply` merge (latest-effective-wins
    in-batch dedupe, close-at-effective-ts, null-safe attribute
    compare), so a streaming-maintained dimension and a batch rebuild
    can never disagree.

    Store layout: `v=<epoch>` parquet partitions, each the FULL SCD2
    state after that epoch.  Epoch N reads the latest version `< N`
    (partition-pruned), merges, and overwrites `v=N` — so a crashed
    epoch's re-run reads the same input and rewrites the same output
    (exactly-once, the corpus_dedup_epoch contract).  Full-snapshot
    versions are the plain-parquet price of file-level atomicity; in
    production the same merge lands behind Delta/Iceberg MERGE
    (sources/warehouse.py docstring) and old versions are vacuumed.  The
    snapshot write is dimension-sized, not fact-sized — the standard
    SCD2 cost model.
    """

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        scd2_upsert_epoch(batch_df, epoch_id, store_dir, key, attrs, effective_col)

    return df.writeStream.foreachBatch(fn)


def scd2_upsert_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    store_dir: str,
    key: str,
    attrs: tuple[str, ...],
    effective_col: str = "effective_ts",
) -> None:
    """One epoch of foreach_batch_scd2_upsert, module-level so the
    crashed-epoch re-run path is unit-testable: calling this twice with
    the same epoch_id must leave the store byte-for-byte equivalent."""
    from pyspark.sql.types import StructField, StructType

    from ..operators.scd import scd2_apply

    spark = batch_df.sparkSession
    eff_field = batch_df.schema[effective_col]
    store = _read_store_or_none(spark, store_dir)
    prev = (
        store.filter(F.col("v") < epoch_id).agg(F.max("v")).first()[0]
        if store is not None
        else None
    )
    if prev is None:
        state_schema = StructType(
            [batch_df.schema[key]]
            + [batch_df.schema[a] for a in attrs]
            + [
                StructField("valid_from", eff_field.dataType, True),
                StructField("valid_to", eff_field.dataType, True),
            ]
        )
        current = spark.createDataFrame([], state_schema)
    else:
        current = (
            spark.read.parquet(store_dir).filter(F.col("v") == prev).drop("v")
        )
    nxt = scd2_apply(current, batch_df, key, list(attrs), effective_col)
    nxt.write.mode("overwrite").parquet(f"{store_dir}/v={epoch_id}")


def foreach_batch_agg_upsert(
    df: DataFrame,
    store_dir: str,
    keys: tuple[str, ...],
    value_col: str,
) -> DataStreamWriter:
    """Incremental aggregate materialized view — per-key running
    sum/count maintained from the stream into a versioned parquet
    store.  The lambda-architecture MV: unlike the in-state running
    totals (`stateful.running_totals`, applyInPandasWithState), the
    result here lives as PLAIN PARQUET any batch reader can scan.

    Epoch N: partial-aggregate the batch (map-side combinable), read
    the latest store version `< N` (partition-pruned), union +
    re-aggregate (NULL keys merge as one group), overwrite `v=N` — the
    `scd2_upsert_epoch` exactly-once contract: a crashed epoch's
    re-run reads the same input and rewrites the same output.  Store
    size is |distinct keys|, dimension-sized; the per-epoch cost is
    one key shuffle, never a rescan of history.

    Durability contract, stated precisely: exactly-once across ANY
    crash/replay within one checkpoint lineage (the `v < N` probe is
    what makes a replayed epoch idempotent).  The ACCUMULATED data
    outlives a lost checkpoint as plain parquet, but a restart with a
    FRESH checkpoint restarts epoch numbering at 0 and the `v < 0`
    probe treats the store as empty — to resume accumulation after
    checkpoint loss, re-base by copying the latest `v=K` partition to
    a new store_dir (or seed it as `v=-1`); continuing blindly
    overwrites low-numbered versions and abandons the prior totals.
    """

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        agg_upsert_epoch(batch_df, epoch_id, store_dir, keys, value_col)

    return df.writeStream.foreachBatch(fn)


def agg_upsert_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    store_dir: str,
    keys: tuple[str, ...],
    value_col: str,
) -> None:
    """One epoch of foreach_batch_agg_upsert, module-level so the
    crashed-epoch re-run path is unit-testable."""
    spark = batch_df.sparkSession
    part = (
        batch_df.groupBy(*keys)
        .agg(
            F.sum(value_col).cast("double").alias("total"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        )
    )
    store = _read_store_or_none(spark, store_dir)
    prev = (
        store.filter(F.col("v") < epoch_id).agg(F.max("v")).first()[0]
        if store is not None
        else None
    )
    if prev is None:
        merged = part
    else:
        # union + re-aggregate, NOT a full-outer join on key names: the
        # join's null-UNSAFE equality can never match a NULL-key batch
        # row to the store's NULL-key row, so that group fragments into
        # one more row every epoch and its total never sums.  groupBy
        # treats NULL as one group — the correct upsert semantics —
        # and costs the same single keys-shuffle.
        cur = (
            spark.read.parquet(store_dir)
            .filter(F.col("v") == prev)
            .select(*keys, "total", F.col("n_rows").cast("bigint").alias("n_rows"))
        )
        merged = (
            part.unionByName(cur)
            .groupBy(*keys)
            .agg(
                F.sum("total").cast("double").alias("total"),
                F.sum("n_rows").cast("bigint").alias("n_rows"),
            )
        )
    # reads come from v=prev, the write targets v=epoch_id — distinct
    # partition dirs, so no self-overwrite hazard (the corpus-dedup
    # store needed a checkpoint; this one does not)
    merged.write.mode("overwrite").parquet(f"{store_dir}/v={epoch_id}")


# ---------------------------------------------------------------------------
# round 15: fuzzy (MinHash) ingest-time corpus dedup
# ---------------------------------------------------------------------------

FUZZY_DEDUP_MIN_MATCHES = 8  # >= 8 of 12 equal signature components
# The signature store is laid out as BANDED rows partitioned by `bpfx`
# (band_id x first-hex-digit-of-bucket -> 64 dirs per epoch) so the
# per-epoch probe PARTITION-PRUNES to the buckets the batch actually
# touches — O(batch) files read per epoch instead of O(store), the
# difference that matters when the store holds a 100 TB corpus's
# signatures (VERDICT r15 item 4).  Cost: each signature is stored
# N_BANDS(=4)x, ~400 B/doc instead of ~100 B — still 5 orders of
# magnitude under the text it indexes.
FUZZY_STORE_BPFX = 16  # hex digits -> 16 prefixes per band
# self-driving compaction cadence: every N-th epoch folds the store's
# history into one consolidated base (epoch-dir count stays <= N + 1).
# 8 balances file-count growth against compaction-write amplification
# at a 5-minute trigger (~40 min between folds).
FUZZY_COMPACT_EVERY = 8


def foreach_batch_corpus_dedup_fuzzy(
    df: DataFrame,
    sig_store_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = FUZZY_COMPACT_EVERY,
) -> DataStreamWriter:
    """Ingest-time NEAR-duplicate dedup against a persistent MinHash
    signature store — the streaming front door of the batch
    `dedup_incremental_minhash_assign` tier, exactly as
    `foreach_batch_corpus_dedup` fronts `dedup_incremental_exact`.
    Each micro-batch's documents are signature-hashed once; the
    persistent store's band buckets are probed with the (small,
    broadcast) batch bands; any batch doc whose best store candidate
    matches >= FUZZY_DEDUP_MIN_MATCHES of 12 signature components is
    dropped as a near-duplicate, and the survivors' banded SIGNATURES
    are appended as the store's `epoch=N` partition, sub-partitioned
    by band-bucket prefix (`bpfx`) so the next epoch's probe
    partition-prunes to the touched buckets (~400 bytes/doc of
    signature rows; nothing text-sized is ever persisted or re-read).

    Within-batch near-dups are ALSO caught (ADVICE r15): the batch's
    bands self-probe with a keep-first (lowest doc_id) policy before
    the store append, mirroring the exact sink's in-batch
    dropDuplicates.  The policy is transitive-free: a doc is dropped
    when any lower-id doc in the same batch near-matches it, whether
    or not that doc was itself dropped — standard LSH keep-first.

    Documents too short to shingle (< 3 tokens) emit a sentinel report
    row (assigned_dup=false, best_match_id=-1) instead of silently
    vanishing (ADVICE r15); they have no signature, so nothing of
    theirs is stored and they can never be fuzzy-matched — route them
    through the EXACT sink's fingerprint store if short-doc dedup
    matters.

    Exactly-once: both writes go to `epoch=<id>` partition directories
    with overwrite mode and the probe reads only `epoch < current`
    (partition-pruned), so a crashed-epoch re-run is idempotent —
    pinned by the rerun test, same contract as the exact sink.

    Store maintenance is SELF-DRIVING (round 17, VERDICT r16 item 3):
    every `compact_every` epochs the sink folds the per-batch epoch
    dirs with `compact_fuzzy_signature_store` (below) — one dir per
    micro-batch is the small-files trap at ingest cadence, and a
    long-running ingest must bound its own file count rather than
    rely on an operator remembering a manual maintenance call.  The
    cadence honors the newest-epoch guard (`upto = epoch - 1`, driver-
    side, after the epoch's own append), so crash re-delivery of the
    latest epoch stays safe; pass compact_every=None to disable and
    manage compaction externally.
    """

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        fuzzy_corpus_dedup_epoch(
            batch_df,
            epoch_id,
            sig_store_dir,
            out_dir,
            id_col,
            text_col,
            compact_every=compact_every,
        )

    return df.writeStream.foreachBatch(fn)


def fuzzy_corpus_dedup_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    sig_store_dir: str,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    compact_every: int | None = None,
) -> None:
    """One epoch of foreach_batch_corpus_dedup_fuzzy, module-level so
    the crashed-epoch re-run path is unit-testable (same doctrine as
    corpus_dedup_epoch).  With `compact_every=N`, every N-th epoch
    additionally folds the store's history into `epoch=epoch_id-1`
    AFTER this epoch's append (the newest epoch — this one — stays
    un-compacted per the crash-re-delivery guard), keeping the store's
    epoch-dir count <= N + 1 over any run length."""
    from pyspark.sql import Window

    from ..functions.textfns import normalize_text, shingles, tokens
    from ..operators.dedup import (
        N_BANDS,
        N_PERM,
        _band_expr,
        _minhash_signatures,
        cap_hot_buckets,
    )

    spark = batch_df.sparkSession
    sig_cols = [f"s{i}" for i in range(N_PERM)]
    sh = batch_df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(shingles(tokens(normalize_text(F.col(text_col))))).alias("shingle"),
    )
    sigs = _minhash_signatures(spark, "", sh)

    def to_bands(s: DataFrame) -> DataFrame:
        band_structs = F.array(
            *[
                F.struct(F.lit(b).alias("band_id"), _band_expr(b).alias("bucket"))
                for b in range(N_BANDS)
            ]
        )
        return s.select("doc_id", *sig_cols, F.explode(band_structs).alias("bb")).select(
            "doc_id", *sig_cols, F.col("bb.band_id"), F.col("bb.bucket")
        )

    # materialize the banded signatures once: they feed the self-probe,
    # the store probe, the report, and the store append — and must not
    # be re-planned after this epoch's own store write changes what a
    # re-read would see
    batch_bands = to_bands(sigs).localCheckpoint(eager=True)
    matches = sum(
        F.when(F.col(f"e.s{i}") == F.col(f"n.s{i}"), 1).otherwise(0)
        for i in range(N_PERM)
    )

    # within-batch self-probe (ADVICE r15): keep-first — the lowest
    # doc_id in a colliding bucket is the survivor candidate for every
    # higher id.  The batch side is micro-batch-sized, so the self-join
    # is broadcast on one side and bounded by the batch's own buckets.
    scored = (
        batch_bands.alias("e")
        .join(
            F.broadcast(batch_bands).alias("n"),
            (F.col("e.band_id") == F.col("n.band_id"))
            & (F.col("e.bucket") == F.col("n.bucket"))
            & (F.col("e.doc_id") < F.col("n.doc_id")),
        )
        .select(
            F.col("n.doc_id").alias("doc_id"),
            F.col("e.doc_id").alias("ex_id"),
            matches.alias("n_sig_matches"),
        )
    )

    touched = _touched_bpfx(batch_bands)
    store = _pruned_store_probe(spark, sig_store_dir, epoch_id, touched)
    if store is not None:
        # batch side is the small one: broadcast it against the
        # (partition-pruned, hot-capped) store scan
        cand = (
            cap_hot_buckets(store, distinct=True)
            .alias("e")
            .join(
                F.broadcast(batch_bands).alias("n"),
                (F.col("e.band_id") == F.col("n.band_id"))
                & (F.col("e.bucket") == F.col("n.bucket")),
            )
        )
        scored = scored.unionByName(
            cand.select(
                F.col("n.doc_id").alias("doc_id"),
                F.col("e.doc_id").alias("ex_id"),
                matches.alias("n_sig_matches"),
            )
        )
    w = Window.partitionBy("doc_id").orderBy(F.desc("n_sig_matches"), F.asc("ex_id"))
    best = (
        scored.distinct()
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

    # report from the BATCH's doc ids, not the signature table, so
    # docs too short to shingle still emit a sentinel row (ADVICE r15)
    report = (
        batch_df.select(F.col(id_col).alias("doc_id"))
        .distinct()
        .join(best, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("ex_id"), F.lit(-1)).cast("bigint").alias("best_match_id"),
            F.coalesce(F.col("n_sig_matches"), F.lit(0)).cast("int").alias("n_sig_matches"),
            (
                F.coalesce(F.col("n_sig_matches"), F.lit(0))
                >= FUZZY_DEDUP_MIN_MATCHES
            ).alias("assigned_dup"),
        )
    )
    report = report.localCheckpoint(eager=True)
    report.write.mode("overwrite").parquet(f"{out_dir}/epoch={epoch_id}")
    fresh = batch_bands.join(
        F.broadcast(report.filter(F.col("assigned_dup")).select("doc_id")),
        "doc_id",
        "left_anti",
    )
    fresh.withColumn("bpfx", _bpfx_col()).write.mode("overwrite").partitionBy(
        "bpfx"
    ).parquet(f"{sig_store_dir}/epoch={epoch_id}")

    # self-driving store maintenance (VERDICT r16 item 3): after the
    # append, every compact_every-th epoch folds `epoch < epoch_id-1`
    # into `epoch=epoch_id-1`.  This epoch's dir (the store's newest)
    # is never absorbed, so a crash re-delivery of epoch_id still sees
    # the full `epoch < epoch_id` history and its idempotent overwrite
    # touches only its own dir.
    if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
        compact_fuzzy_signature_store(
            batch_df.sparkSession, sig_store_dir, upto_epoch=epoch_id - 1
        )


def _bpfx_col() -> F.Column:
    """Store partition key: band_id x first hex digit of the md5 band
    bucket -> N_BANDS * FUZZY_STORE_BPFX directories per epoch."""
    return (
        F.col("band_id") * FUZZY_STORE_BPFX
        + F.conv(F.substring("bucket", 1, 1), 16, 10).cast("int")
    ).cast("int")


def _touched_bpfx(batch_bands: DataFrame) -> list[int]:
    """The bucket-prefix partitions this batch can match.  BOUNDED
    driver collect: at most N_BANDS * FUZZY_STORE_BPFX (= 64) ints,
    independent of batch or store size."""
    return [
        r[0]
        for r in batch_bands.select(_bpfx_col().alias("bpfx")).distinct().collect()
    ]


def _pruned_store_probe(
    spark: SparkSession, sig_store_dir: str, epoch_id: int, touched: list[int]
) -> DataFrame | None:
    """The store scan for one epoch's probe: epoch < current AND bpfx
    in the batch's touched prefixes — BOTH are partition columns, so
    the scan reads only prior-epoch files in buckets the batch can
    actually hit (tests assert this on inputFiles()).  None when the
    store does not exist yet (first epoch) OR holds no data files —
    an epoch whose batch had nothing to sign writes a partitioned dir
    with only _SUCCESS, and the next epoch's read then fails schema
    inference instead of PATH_NOT_FOUND (round-16 review)."""
    store = _read_store_or_none(spark, sig_store_dir)
    if store is None:
        return None
    return (
        store.filter(F.col("epoch") < epoch_id)
        .filter(F.col("bpfx").isin(touched))
        .drop("epoch", "bpfx")
    )


def compact_fuzzy_signature_store(
    spark: SparkSession, sig_store_dir: str, upto_epoch: int, part_col: str = "bpfx"
) -> int:
    """Maintenance compaction for the fuzzy-dedup signature store: fold
    every `epoch < upto_epoch` partition into `epoch=upto_epoch` (bpfx
    sub-partitioning preserved, so probe pruning is unchanged) and
    drop the absorbed dirs.  Returns the number of epoch directories
    removed.

    WHY: the sink writes one epoch dir per micro-batch — at a
    100 TB-corpus ingest cadence that is millions of small parquet
    files within weeks, and the probe's planning cost becomes
    file-listing-bound long before it is IO-bound.  Periodic
    compaction keeps the store at O(bpfx) files plus a short tail of
    recent epochs.

    Crash-safe, SELF-HEALING protocol (round-16 review, two passes):

    1. finish any interrupted compaction left by a crash (see below);
    2. write the absorbed rows to a dot-prefixed temp dir
       (`.compact_tmp_epoch=N` — invisible to every store read, and
       mode=overwrite so a half-written temp from a crash is simply
       rewritten);  the write's _SUCCESS marker is the commit point;
    3. move the temp's data files into `epoch=N` (FS renames —
       filenames carry the writer's UUID so they cannot collide);
    4. delete the absorbed epoch dirs;
    5. drop the temp dir.

    Move-BEFORE-delete ordering (second review pass): from _SUCCESS
    onward the consolidated rows are always VISIBLE somewhere —
    first duplicated (absorbed dirs + moved copies, which the probe
    tolerates by construction), never hidden-only (the temp is
    invisible to readers, so a delete-first window would make every
    probe miss the compacted history until recovery ran).  No
    directory being READ is ever overwritten, and a crash at ANY
    step is repaired by the next call's step 1: a temp without
    _SUCCESS is discarded (its source dirs are intact), a temp with
    _SUCCESS is rolled FORWARD (remaining files moved — renames are
    consumed, so no re-run can duplicate rows — then the absorbed
    dirs deleted).  `upto_epoch` must be strictly below
    the newest epoch in the store: foreachBatch can re-deliver its
    LATEST epoch after a crash, and that re-run's probe reads
    `epoch < latest`, so the latest epoch must never absorb history
    (the re-delivered epoch would otherwise see nothing and wipe the
    consolidated base with its own overwrite).  Passing the newest
    epoch raises ValueError."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(sig_store_dir)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(root):
        return 0
    _finish_pending_compactions(fs, jvm, sig_store_dir, part_col)
    store = _read_store_or_none(spark, sig_store_dir)
    epochs = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("epoch="):
            epochs.append(int(name.split("=", 1)[1]))
    if epochs and upto_epoch >= max(epochs):
        raise ValueError(
            f"compact target epoch={upto_epoch} is the store's newest epoch "
            f"(max={max(epochs)}): the latest epoch must stay un-compacted "
            "because foreachBatch may re-deliver it after a crash; pass at "
            "most max-1"
        )
    absorbed = sorted(e for e in epochs if e < upto_epoch)
    if not absorbed:
        return 0
    if store is not None:
        tmp = f"{sig_store_dir}/.compact_tmp_epoch={upto_epoch}"
        store.filter(F.col("epoch") < upto_epoch).drop("epoch").write.mode(
            "overwrite"
        ).partitionBy(part_col).parquet(tmp)
        _move_compaction_tmp(fs, jvm, tmp, f"{sig_store_dir}/epoch={upto_epoch}", part_col)
    # store is None <=> no data file exists in ANY epoch dir (all-empty
    # batches so far): nothing to consolidate, but the data-less dirs
    # still cost a file-listing per probe — drop them (second review
    # pass)
    for e in absorbed:
        fs.delete(jvm.org.apache.hadoop.fs.Path(f"{sig_store_dir}/epoch={e}"), True)
    if store is not None:
        fs.delete(jvm.org.apache.hadoop.fs.Path(tmp), True)
    return len(absorbed)


def _finish_pending_compactions(fs, jvm, sig_store_dir: str, part_col: str) -> None:
    """Step 1 of the compaction protocol: repair any crash leftovers.
    A temp dir WITHOUT _SUCCESS is a failed write — its source epoch
    dirs are still intact, so it is discarded.  A temp WITH _SUCCESS
    is a committed-but-unfinished compaction — roll it forward
    exactly as the original call would have (delete remaining
    absorbed dirs, move remaining files, drop the temp)."""
    root = jvm.org.apache.hadoop.fs.Path(sig_store_dir)
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith(".compact_tmp_epoch="):
            continue
        tmp = f"{sig_store_dir}/{name}"
        target_epoch = int(name.split("=", 1)[1])
        if not fs.exists(jvm.org.apache.hadoop.fs.Path(f"{tmp}/_SUCCESS")):
            fs.delete(st.getPath(), True)
            continue
        _move_compaction_tmp(fs, jvm, tmp, f"{sig_store_dir}/epoch={target_epoch}", part_col)
        for est in fs.listStatus(root):
            ename = est.getPath().getName()
            if ename.startswith("epoch=") and int(ename.split("=", 1)[1]) < target_epoch:
                fs.delete(est.getPath(), True)
        fs.delete(st.getPath(), True)


def _move_compaction_tmp(fs, jvm, tmp: str, target: str, part_col: str) -> None:
    """Move the temp write's data files into the target epoch dir with
    per-file FS renames (a rename consumes its source, so re-running
    after a crash moves only the remainder — never a duplicate).
    Marker/_SUCCESS files are skipped."""
    Path = jvm.org.apache.hadoop.fs.Path
    for pst in fs.listStatus(Path(tmp)):
        pname = pst.getPath().getName()
        if not pname.startswith(f"{part_col}="):
            continue
        dst_dir = Path(f"{target}/{pname}")
        fs.mkdirs(dst_dir)
        for fst in fs.listStatus(pst.getPath()):
            fname = fst.getPath().getName()
            if fname.startswith(("_", ".")):
                continue
            if not fs.rename(fst.getPath(), Path(f"{target}/{pname}/{fname}")):
                raise IOError(
                    f"compaction file move failed: {fst.getPath()} -> "
                    f"{target}/{pname}/{fname}"
                )


# ---------------------------------------------------------------------------
# streaming IVFPQ ingest (round 17, VERDICT r16 stretch): the vector-
# index twin of the fuzzy signature store — incoming embeddings are
# encoded to (cell, m, code) rows against a FIXED trained model and
# appended to an epoch-partitioned code store with the same
# exactly-once / compaction discipline.
# ---------------------------------------------------------------------------


def train_ivfpq_index_model(spark: SparkSession, sf_dir: str, model_dir: str) -> None:
    """Fit-once training for the streaming IVFPQ index: persist the IVF
    coarse centroids (the shared deterministic one-Lloyd k-means over
    the training corpus) and the PQ codebook (the seed-row protocol of
    embedding_product_quantization) as two tiny parquet tables.  A
    streaming encoder MUST encode every batch against a frozen model —
    re-fitting per batch would silently re-key the whole store — so
    the model lives on disk, versioned by overwrite, exactly one
    broadcast-sized read per epoch.  At 100 TB the fit runs on a
    sample; the artifact is k·dims + M·K·subdim floats either way."""
    from ..operators import _kmeans as _km
    from ..operators.similarity_ann import (
        IVF_DECIMALS,
        IVF_NCELLS,
        ivfpq_codebook,
        ivfpq_subvectors,
    )

    cent = _km.final_centroids(spark, sf_dir, IVF_NCELLS, IVF_DECIMALS)
    cent.write.mode("overwrite").parquet(f"{model_dir}/centroids")
    e = _km.embeddings_double(spark, sf_dir)
    ivfpq_codebook(ivfpq_subvectors(e)).write.mode("overwrite").parquet(
        f"{model_dir}/codebook"
    )


def foreach_batch_embedding_index_ivfpq(
    df: DataFrame,
    index_dir: str,
    model_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = FUZZY_COMPACT_EVERY,
) -> DataStreamWriter:
    """Streaming IVFPQ index ingest: each micro-batch's embeddings are
    encoded to (vec_id, cid, m, k) code rows — the IVFADC at-rest
    layout of similarity_topk_ivfpq, via the LITERALLY shared encode
    helpers (operators/similarity_ann.ivfpq_subvectors/codes), so the
    store can never drift from what the batch query would compute —
    and land as the store's `epoch=N` partition, sub-partitioned by
    the IVF cell id so a serving probe partition-prunes to its
    nprobe cells.

    Exactly-once: the epoch dir is overwritten on re-delivery (the
    fuzzy-store contract); nothing reads the store during encode, so
    a crashed-epoch re-run is trivially idempotent.  Store maintenance
    is self-driving on the same cadence as the fuzzy sink
    (compact_every epochs, newest epoch never absorbed)."""

    def fn(batch_df: DataFrame, epoch_id: int) -> None:
        ivfpq_index_epoch(
            batch_df, epoch_id, index_dir, model_dir, id_col, vec_col, compact_every
        )

    return df.writeStream.foreachBatch(fn)


def ivfpq_index_epoch(
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    model_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    compact_every: int | None = None,
) -> None:
    """One epoch of foreach_batch_embedding_index_ivfpq, module-level
    so the crashed-epoch re-run path is unit-testable (the fuzzy-sink
    doctrine).  Per epoch: one broadcast-sized model read, a
    broadcast-NLJ cell assignment, a broadcast codebook encode, one
    partitioned write — the corpus store is never read."""
    from ..operators import _kmeans as _km
    from ..operators.similarity_ann import ivfpq_codes, ivfpq_subvectors

    spark = batch_df.sparkSession
    cent = spark.read.parquet(f"{model_dir}/centroids")
    cb = spark.read.parquet(f"{model_dir}/codebook")
    e = batch_df.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    cells = _km.assign(e, cent).select("vec_id", "cid")
    codes = (
        ivfpq_codes(ivfpq_subvectors(e), cb)
        .join(cells, "vec_id")
        .select("vec_id", "cid", "m", "k")
    )
    codes.write.mode("overwrite").partitionBy("cid").parquet(
        f"{index_dir}/epoch={epoch_id}"
    )
    if compact_every and epoch_id > 0 and epoch_id % compact_every == 0:
        compact_fuzzy_signature_store(
            spark, index_dir, upto_epoch=epoch_id - 1, part_col="cid"
        )


def ivfpq_search_code_store(
    spark: SparkSession, index_dir: str, model_dir: str, sf_dir: str
) -> DataFrame:
    """Serve top-k from the STREAMED code store: rank the model's
    centroids per query (same dist2/tie contract as the batch coarse
    quantizer), collect the probed cell ids (bounded:
    |queries| x nprobe ints — the touched-bpfx precedent), scan ONLY
    those cid partitions of the store (partition-pruned, asserted by
    test on inputFiles), and run the SAME ADC + exact-re-rank plan as
    similarity_topk_ivfpq (shared ivfpq_adc_topk — the two serving
    paths cannot drift).  Queries and the full-precision re-rank
    vectors come from the embeddings table; the store contributes
    codes only.  dropDuplicates on the code key tolerates the
    duplicate rows a crashed compaction can leave (the fuzzy-probe
    doctrine) — duplicates would otherwise double-count ADC sums."""
    from pyspark.sql import Window

    from ..operators import _kmeans as _km
    from ..operators.similarity_ann import (
        IVF_NPROBE,
        N_QUERIES,
        ivfpq_adc_topk,
        ivfpq_subvectors,
    )

    e = _km.embeddings_double(spark, sf_dir)
    cent = spark.read.parquet(f"{model_dir}/centroids")
    cb = spark.read.parquet(f"{model_dir}/codebook")
    scored = (
        e.filter(F.col("vec_id") < N_QUERIES)
        .crossJoin(F.broadcast(cent))
        .select(
            F.col("vec_id").alias("query_id"),
            "cid",
            _km.dist2(F.col("v"), F.col("c")).alias("dist2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist2"), F.asc("cid"))
    probed = (
        scored.withColumn("cell_rank", F.row_number().over(w))
        .filter(F.col("cell_rank") <= IVF_NPROBE)
        .select("query_id", F.col("cid").alias("p_cid"))
        .localCheckpoint(eager=False)
    )
    # bounded collect (<= |queries| x nprobe ints): literal cids make
    # the store scan PARTITION-pruned, which a join could not
    probe_cids = sorted({r[0] for r in probed.select("p_cid").collect()})
    store = spark.read.parquet(index_dir)
    codes = (
        store.filter(F.col("cid").isin(probe_cids))
        .select(
            F.col("vec_id").alias("neighbor_id"),
            F.col("cid").alias("c_cid"),
            "m",
            "k",
        )
        .dropDuplicates(["neighbor_id", "m"])
    )
    return ivfpq_adc_topk(e, ivfpq_subvectors(e), cb, codes, probed)
