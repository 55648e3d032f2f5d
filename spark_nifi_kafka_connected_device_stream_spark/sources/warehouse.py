"""Warehouse tier (SURVEY.md §2.5 K5-K6, §3.3).

The reference's Airflow DAG creates a Hive external table over the
parquet dir Spark wrote (`dag_file.py:68-81`) and Sqoop-exports it to
MySQL (`dag_file.py:83-90`).  Natively that is: `spark.sql(DDL)` /
`saveAsTable`, and `df.write.jdbc` — one engine, no MapReduce hop.

Lakehouse table formats (Delta Lake / Iceberg / Hudi): this container
ships no lakehouse jars, so there is deliberately NO stub module for
them — the parquet external-table path below is the in-container
equivalent of every operation this engine needs (append, partition
pruning, read-back).  On a cluster with the jars present, the drop-in
upgrades are one-line format swaps, not new code paths:

- Delta: ``spark.jars.packages=io.delta:delta-spark_2.13:<ver>`` +
  the DeltaCatalog SQL extensions, then
  ``df.write.format("delta").mode(mode).save(path)`` replaces
  `write_warehouse_parquet`, and `operators/scd.py`'s SCD2 union
  collapses into a single ``MERGE INTO``.
- Iceberg: ``org.apache.iceberg:iceberg-spark-runtime`` + a
  ``spark.sql.catalog.<name>`` conf, then ``df.writeTo(table)
  .append()`` replaces the append path and the streaming compaction
  sink (`streaming/sinks.py`) becomes Iceberg's own rewrite-data-files
  maintenance.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# the reference's exact warehouse schema (dag_file.py:72-75; hive.JPG)
COMMERCE_DDL = """
CREATE EXTERNAL TABLE IF NOT EXISTS {table} (
  source STRING,
  source_number BIGINT
)
STORED AS PARQUET
LOCATION '{location}'
"""


def create_external_table(
    spark: SparkSession, table: str, location: str, ddl: str = COMMERCE_DDL
) -> None:
    """K5 (dag:68-81): register an external parquet table.  Requires a
    Hive-enabled session (`enableHiveSupport`, v2:24); on a plain
    in-memory-catalog session falls back to a parquet-backed view —
    same read path, no metastore.

    The fallback is gated on the CATALOG IMPLEMENTATION, not a bare
    except: on a Hive session a genuine DDL failure (caller-supplied
    ddl typo, unreachable location, metastore permissions) must
    propagate — swallowing it would report success while no table
    exists for any other session."""
    sql = ddl.format(table=table, location=location)
    try:
        spark.sql(sql)
    except Exception:
        if spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "hive":
            raise
        spark.read.parquet(location).createOrReplaceTempView(table)


def write_warehouse_parquet(
    df: DataFrame, location: str, partition_by: tuple[str, ...] = (), mode: str = "append"
) -> None:
    """The batch form of the reference's parquet sink (v2:84-89).
    `partition_by` enables partition pruning for downstream scans —
    at 100 TB an unpartitioned event dump is unqueryable."""
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(location)


def jdbc_export(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    batch_size: int = 10_000,
    num_partitions: int | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """K6 (dag:83-90 Sqoop → MySQL): direct JDBC export.  `batchsize`
    controls insert batching; `numPartitions` bounds parallel
    connections (a 1000-executor cluster must not open 1000 DB
    connections).  Executed live in tests against the embedded Derby
    engine Spark ships (tests/test_warehouse_and_wire.py: export,
    append, read-back equality) — the same JDBC code path a MySQL URL
    takes, minus the network."""
    opts = dict(properties or {})
    # Spark JDBC options are CASE-INSENSITIVE and last-write-wins: a
    # plain setdefault("batchsize") would silently override a caller's
    # 'batchSize' (round-16 review) — default only when no case
    # variant is present
    if not any(k.lower() == "batchsize" for k in opts):
        opts["batchsize"] = str(batch_size)
    w = df.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table)
    if num_partitions:
        w = w.option("numPartitions", str(num_partitions))
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()


def jdbc_create_table_ddl(df: DataFrame, table: str, url: str) -> str:
    """The exact CREATE TABLE statement the JDBC export path emits for
    `df`'s schema against `url`'s database — rendered through Spark's
    own per-database dialect registry (JdbcDialects.get(url) →
    getJDBCType, falling back to the common JDBC mapping), so this IS
    the writer's mapping, not a re-implementation that can drift.

    Closes the K6 MySQL residual (dag_file.py:83-90 Sqoop-exports to
    MySQL; the live Derby round-trip proves the writer, this pins the
    MySQL-specific type mapping without a MySQL server): for a
    jdbc:mysql URL, string→LONGTEXT, boolean→BIT(1), binary→BLOB,
    double→DOUBLE PRECISION, identifiers backtick-quoted — asserted in
    tests/test_warehouse_and_wire.py against both the MySQL and Derby
    dialects so a silent dialect-dispatch regression cannot pass."""
    spark = df.sparkSession
    jvm = spark._jvm  # noqa: SLF001
    dialect = jvm.org.apache.spark.sql.jdbc.JdbcDialects.get(url)
    jdbc_utils = jvm.org.apache.spark.sql.execution.datasources.jdbc.JdbcUtils
    cols = []
    for field in df.schema.fields:
        jdt = jvm.org.apache.spark.sql.types.DataType.fromJson(field.dataType.json())
        opt = dialect.getJDBCType(jdt)
        if not opt.isDefined():
            opt = jdbc_utils.getCommonJDBCType(jdt)
        if not opt.isDefined():
            raise ValueError(
                f"no JDBC type for column {field.name!r} ({field.dataType.simpleString()}) "
                f"under dialect {dialect.toString()}"
            )
        name = dialect.quoteIdentifier(field.name)
        null = "" if field.nullable else " NOT NULL"
        cols.append(f"{name} {opt.get().databaseTypeDefinition()}{null}")
    return f"CREATE TABLE {table} ({', '.join(cols)})"


def compact_parquet(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_col: str | None = None,
    partition_by: tuple[str, ...] = (),
) -> tuple[int, int]:
    """Small-files compaction: rewrite a parquet directory into files
    sized for the scan path.  Streaming sinks emit one file per
    micro-batch per partition — at a 5-minute trigger that is ~10⁵
    files/year, and at 100 TB the NameNode/driver pays per-file costs
    while scans pay per-file open overhead.  Standard maintenance:
    periodically rewrite the closed portion of the directory into
    ~`target_file_bytes` files (the parquet row-group sweet spot).

    Output partition count is sized from the ACTUAL input bytes (not
    file count), optionally sorted by `sort_col` so downstream range
    predicates prune row groups via min/max stats.  Writes to
    `dst_dir` (never in place — readers of `src_dir` are unaffected;
    the caller swaps directories or updates the table location).
    Returns (files_before, files_after).

    Hive-partitioned input: partition-discovery columns arrive as data
    columns, so compacting a key=value layout WITHOUT `partition_by`
    would flatten it and destroy partition pruning for the swapped-in
    table — pass the partition columns to preserve the layout (the
    function refuses to guess and raises if the input looks
    partitioned but partition_by is empty).
    """
    import glob
    import math
    import os

    # recursive: streaming sinks and hive-partitioned layouts nest files
    # under key=value subdirectories — a flat glob would size them as 0
    # bytes and collapse the whole dataset into one file
    def _parquet_files(d: str) -> list[str]:
        return glob.glob(os.path.join(d, "**", "*.parquet"), recursive=True)

    # size/count from the files Spark will ACTUALLY read — on a
    # streaming-sink dir the read resolves through _spark_metadata and
    # excludes uncommitted orphans a raw glob would count (round-16
    # review: the glob inflated n_out and reported orphan bytes as
    # compacted when they were dropped)
    from pyspark.errors import AnalysisException

    try:
        df = spark.read.parquet(src_dir)
    except AnalysisException as exc:
        raise FileNotFoundError(
            f"compact_parquet: no parquet files under {src_dir!r}"
        ) from exc
    # inputFiles() returns URIs — percent-encoded characters (spaces,
    # '%', non-ASCII partition values) must be unquoted before any
    # os.path call, or getsize raises FileNotFoundError on paths the
    # old raw glob handled (round-17 review)
    from urllib.parse import unquote, urlparse

    src_files = [
        unquote(urlparse(f).path) if f.startswith("file:") else f
        for f in df.inputFiles()
    ]
    if not src_files:
        raise FileNotFoundError(f"compact_parquet: no parquet files under {src_dir!r}")
    if not partition_by:
        # key=value subdirectories mean hive partitioning: refuse to
        # silently flatten the layout
        parted = sorted(
            {
                seg.split("=", 1)[0]
                for f in src_files
                for seg in os.path.relpath(f, src_dir).split(os.sep)[:-1]
                if "=" in seg
            }
        )
        if parted:
            raise ValueError(
                f"compact_parquet: {src_dir!r} is hive-partitioned on "
                f"{parted}; pass partition_by={tuple(parted)} (or compact "
                "one partition directory at a time) — compacting without "
                "it would flatten the layout and break partition pruning"
            )
    files_before = len(src_files)
    total_bytes = sum(os.path.getsize(p) for p in src_files)
    n_out = max(1, math.ceil(total_bytes / target_file_bytes))
    if sort_col is not None:
        # repartitionByRange + sortWithinPartitions = globally ordered
        # files with tight per-file min/max stats.  With partition_by
        # the range key LEADS with the partition columns so each output
        # task holds contiguous slices of few partition values — without
        # that, every task spans every partition value and the writer
        # emits up to n_out x |partitions| small files, defeating
        # target_file_bytes (the exact disease this function cures)
        range_cols = [*partition_by, sort_col]
        df = df.repartitionByRange(n_out, *range_cols).sortWithinPartitions(
            *range_cols
        )
    elif partition_by:
        # co-locate whole partition values per task, salted so a huge
        # partition still splits across ~ceil(n_out/|values|) files:
        # total output files ~ n_out (+ one per partition value), never
        # the n_out x |partitions| a value-blind repartition produces.
        # The distinct-count is a tiny aggregate (one row per partition
        # VALUE, the same cardinality the writer creates directories
        # for) — acceptable for an offline maintenance pass.
        n_values = max(1, df.select(*partition_by).distinct().count())
        per_value = max(1, math.ceil(n_out / n_values))
        data_cols = [c for c in df.columns if c not in partition_by]
        from pyspark.sql import functions as F

        # every column can be a partition column (pure-dimension
        # layouts): F.hash() with zero args raises, so fall back to
        # hashing the partition columns themselves.  DETERMINISTIC by
        # construction (round-16 review: spark_partition_id changes
        # across shuffle-retry recomputations, the classic
        # nondeterministic-repartition row-dup/row-loss hazard at
        # exactly the cluster scale this function targets); the cost
        # is that a pure-dimension layout's identical rows share one
        # salt and stay in one file per value — correct, just unsplit.
        salt = F.pmod(
            F.hash(*data_cols) if data_cols else F.hash(*partition_by),
            F.lit(per_value),
        )
        df = df.repartition(n_out, *partition_by, salt)
    else:
        df = df.repartition(n_out)
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(dst_dir)
    files_after = len(_parquet_files(dst_dir))
    return files_before, files_after


def read_evolving_parquet(
    spark: SparkSession,
    location: str,
    contract_ddl: str | None = None,
) -> DataFrame:
    """Schema-evolution read for long-lived datasets: a 100 TB parquet
    directory written over months mixes file schemas (columns added,
    columns absent in old files).  `mergeSchema=true` unions the file
    footers (default reads sample ONE footer and silently drop newer
    columns); rows from files lacking a column read as NULL.

    `contract_ddl` additionally enforces a declared schema contract —
    the consumer-side pin that makes readers independent of write
    order: every contract column is selected with an explicit cast
    (type widening like int→bigint included), a column missing from
    EVERY file materializes as typed NULL, and columns outside the
    contract are dropped (accidental writer additions don't leak into
    downstream jobs until the contract says so)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    df = spark.read.option("mergeSchema", "true").parquet(location)
    if contract_ddl is None:
        return df
    target = T.StructType.fromDDL(contract_ddl)
    # map lowered -> ACTUAL file column name and resolve through it:
    # deciding presence case-insensitively but resolving with the
    # contract's casing would crash under spark.sql.caseSensitive=true
    # (round-16 review)
    actual = {c.lower(): c for c in df.columns}
    cols = [
        (
            F.col(actual[f.name.lower()])
            if f.name.lower() in actual
            else F.lit(None)
        )
        .cast(f.dataType)
        .alias(f.name)
        for f in target.fields
    ]
    return df.select(cols)


def write_training_shards(
    df: DataFrame,
    out_dir: str,
    key_col: str,
    n_shards: int = 16,
) -> list[dict]:
    """Final export stage: write the curated dataset as `n_shards`
    deterministic shards plus a verification manifest — the handoff
    artifact a training job consumes (shard = md5-bucket of the key,
    so re-running the export after an append only changes the shards
    whose keys changed, and a given row always lands in the same
    shard regardless of cluster size or input order).

    The manifest carries per-shard row counts and an ORDER-INDEPENDENT
    content checksum (sum of xxhash64 over the key column, exact
    integer arithmetic) so the consumer can verify every shard it
    downloaded without re-reading the source — the 100 TB equivalent
    of a checksum file next to a tarball.  Returns the manifest
    (also written as `_manifest.json` in `out_dir` — the leading underscore keeps parquet readers from treating it as data, like `_SUCCESS`)."""
    import json
    import os

    from pyspark.sql import functions as F

    # NULL keys bucket deterministically via a sentinel instead of
    # landing in shard=__HIVE_DEFAULT_PARTITION__ outside the
    # 0..n_shards-1 contract (round-16 review)
    key_str = F.coalesce(F.col(key_col).cast("string"), F.lit("__NULL_KEY__"))
    shard = F.pmod(
        F.conv(
            F.substring(F.md5(key_str.cast("binary")), 1, 8),
            16,
            10,
        ).cast("bigint"),
        F.lit(n_shards),
    ).cast("int")
    tagged = df.withColumn("shard", shard)
    (
        tagged.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(out_dir)
    )
    # manifest from the WRITTEN shards, not a re-execution of df's
    # lineage (round-16 review: a second run of a non-deterministic
    # upstream could checksum data that was never written, and even
    # the deterministic case paid the whole upstream twice) — this
    # reads back only the key column of the final artifact
    stats = (
        spark_read_back(df.sparkSession, out_dir)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            # decimal(38,0) accumulator: a bigint sum of 64-bit hashes
            # overflows under ANSI after ~2^31 rows
            F.sum(
                F.xxhash64(
                    F.coalesce(F.col(key_col).cast("string"), F.lit("__NULL_KEY__"))
                ).cast("decimal(38,0)")
            ).alias("key_checksum"),
        )
        .orderBy("shard")
        .collect()
    )
    manifest = [
        {
            "shard": r["shard"],
            "n_rows": r["n_rows"],
            "key_checksum": int(r["key_checksum"]),
        }
        for r in stats
    ]
    with open(os.path.join(out_dir, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def spark_read_back(spark: SparkSession, out_dir: str) -> DataFrame:
    """The shard read-back used for manifest verification — one place
    so the writer's manifest and a consumer's re-verification read the
    artifact identically (shard arrives as the discovered partition
    column, cast to int for the 0..n_shards-1 contract)."""
    from pyspark.sql import functions as F

    back = spark.read.parquet(out_dir)
    return back.withColumn("shard", F.col("shard").cast("int"))
