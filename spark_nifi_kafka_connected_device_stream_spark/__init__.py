"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference pipeline
(euguroglu/Spark_Nifi_Kafka_Connected_Device_Stream — NiFi → Kafka →
Spark Structured Streaming → Hive/HDFS/MySQL), re-expressed Spark-first.

The reference is a streaming product-view counting pipeline
(`nifi_spark_kafka_product_view_platform.py` v1/v2) plus NiFi ingest
(`Active_Users_Pipeline.xml`) and Airflow warehouse orchestration
(`dag_file.py`).  This engine restates every operator in that pipeline
as idiomatic DataFrame / SQL / Structured Streaming code (SURVEY.md §2),
adds the full batch relational surface an analytics engine needs, and
the large-scale training-data operators (dedup, similarity search,
text analysis, multimodal columns) mandated for 100 TB-scale use.

Layout:
    session.py      — SparkSession factory (scale-aware conf)
    sources/        — parquet catalog, JSON/Kafka event ingest, JDBC
    operators/      — batch operators, each registered with a DuckDB oracle
    functions/      — portable scalar helpers (hashing, tokens, vectors)
    streaming/      — the streaming spine (watermark + window + sinks)
    plans/          — plan-inspection utilities (pushdown/broadcast asserts)
    registry.py     — the query registry exported via __spark_entry__.py
"""

__version__ = "0.1.0"
