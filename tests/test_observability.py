"""Pipeline telemetry via DataFrame.observe: row counts / quality metrics
collected as a side effect of the job's own action — no second scan, the
way a 100 TB load reports its health (the Spark-native replacement for the
reference's CloudWatch print-and-hope monitoring)."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F


def test_observe_collects_metrics_without_extra_scan(spark):
    obs = Observation("load_metrics")
    df = spark.createDataFrame(
        [(1, 10.0), (2, None), (3, 30.0)], "id INT, score DOUBLE"
    ).observe(
        obs,
        F.count("*").alias("n_rows"),
        F.sum(F.when(F.col("score").isNull(), 1).otherwise(0)).alias("n_null_scores"),
    )
    out = df.filter(F.col("id") > 0).collect()  # the job's real action
    assert len(out) == 3
    got = obs.get
    assert got["n_rows"] == 3 and got["n_null_scores"] == 1


def test_observe_on_streaming_batch(spark, tmp_path):
    """observe() composes with foreachBatch sinks: per-micro-batch metrics
    ride the batch plan."""
    from pyspark.sql.types import StructType

    from lms_etl_pipeline_spark import streaming

    landing = str(tmp_path / "obs")
    spark.createDataFrame([(1, 5.0), (2, None)], "id INT, v DOUBLE").coalesce(1).write.mode(
        "append"
    ).parquet(landing)
    schema = StructType.fromDDL("id INT, v DOUBLE")
    seen: list = []

    def sink(batch_df, batch_id):
        agg = batch_df.agg(
            F.count("*").alias("n"),
            F.sum(F.when(F.col("v").isNull(), 1).otherwise(0)).alias("nulls"),
        ).collect()[0]
        seen.append((agg.n, agg.nulls))

    streaming.run_available_now(
        streaming.file_stream(spark, landing, schema), sink, str(tmp_path / "ck")
    )
    assert seen == [(2, 1)]
