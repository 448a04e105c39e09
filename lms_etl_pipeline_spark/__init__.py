"""lms_etl_pipeline_spark — a PySpark-native analytics/ETL engine.

A brand-new engine with the query and data-processing capabilities of the
reference pipeline (``huynhhoachung/lms-etl-pipeline``), re-expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, Structured
Streaming for incremental ingest, and MLlib/array-native implementations of
the LLM-data-pipeline operators (dedup, similarity search, text analysis,
multimodal columns).

Layout:
    session     SparkSession factory tuned for large-scale execution
    sources     connectors: parquet table catalog, CSV read/write, REST source
    sinks       JDBC upsert (staging+MERGE / ON CONFLICT batches), error channel
    etl         reference-parity transformations (flatten, rename, schema align)
    operators   LLM-pipeline operators (dedup, vectors, text, multimodal)
    functions   reusable column-expression helpers
    plans       named analytical queries (the ``queries()`` catalog)
    streaming   Structured Streaming ingest (file source -> foreachBatch upsert)
    pipeline    the reference's extract/load handlers end-to-end
"""

from lms_etl_pipeline_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
