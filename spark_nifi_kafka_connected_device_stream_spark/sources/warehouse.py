"""Warehouse tier (SURVEY.md §2.5 K5-K6, §3.3).

The reference's Airflow DAG creates a Hive external table over the
parquet dir Spark wrote (`dag_file.py:68-81`) and Sqoop-exports it to
MySQL (`dag_file.py:83-90`).  Natively that is: `spark.sql(DDL)` /
`saveAsTable`, and `df.write.jdbc` — one engine, no MapReduce hop.
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
    session falls back to a parquet-backed view — same read path,
    no metastore."""
    try:
        spark.sql(ddl.format(table=table, location=location))
    except Exception:
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
    connections).  Untestable in this container (no database) — the
    writer configuration is the contract."""
    opts = dict(properties or {})
    opts.setdefault("batchsize", str(batch_size))
    w = df.write.mode(mode).format("jdbc").option("url", url).option("dbtable", table)
    if num_partitions:
        w = w.option("numPartitions", str(num_partitions))
    for k, v in opts.items():
        w = w.option(k, v)
    w.save()
