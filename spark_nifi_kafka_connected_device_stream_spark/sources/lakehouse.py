"""Lakehouse table-format connectors (Delta Lake / Iceberg / Hudi) —
gated stubs.

The container ships no lakehouse jars (the guide's instruction: stub
connectors behind an import-try).  The functions resolve the real
integration when the package + jars are present and raise a clear,
actionable error otherwise; the parquet + external-table path
(sources/warehouse.py) is the in-container equivalent of each
operation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_DELTA_HINT = (
    "Delta Lake requires the 'delta-spark' package and its jars on the session "
    "classpath (spark.jars.packages=io.delta:delta-spark_2.13:<ver>, plus the "
    "DeltaCatalog sql extensions). In this container use "
    "sources.warehouse.write_warehouse_parquet + create_external_table."
)
_ICEBERG_HINT = (
    "Iceberg requires org.apache.iceberg:iceberg-spark-runtime on the session "
    "classpath and a catalog conf (spark.sql.catalog.<name>). In this container "
    "use sources.warehouse.write_warehouse_parquet + create_external_table."
)


def delta_available() -> bool:
    try:
        import delta  # noqa: F401, PLC0415

        return True
    except ImportError:
        return False


def write_delta(df: DataFrame, path: str, mode: str = "append") -> None:
    """Delta write (ACID, MERGE-capable). Stub-gated."""
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    df.write.format("delta").mode(mode).save(path)  # pragma: no cover


def read_delta(spark: SparkSession, path: str) -> DataFrame:
    if not delta_available():
        raise NotImplementedError(_DELTA_HINT)
    return spark.read.format("delta").load(path)  # pragma: no cover


def iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.org.apache.iceberg.Table  # noqa: B018, SLF001
        return True
    except Exception:
        return False


def write_iceberg(df: DataFrame, table: str, mode: str = "append") -> None:
    """Iceberg table write. Stub-gated."""
    spark = df.sparkSession
    if not iceberg_available(spark):
        raise NotImplementedError(_ICEBERG_HINT)
    df.writeTo(table).append() if mode == "append" else df.writeTo(table).createOrReplace()  # pragma: no cover
