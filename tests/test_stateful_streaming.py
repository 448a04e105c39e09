"""applyInPandasWithState: first-seen dedup across micro-batches.

State must persist BETWEEN AvailableNow runs (checkpointed) — a key seen in
run 1 stays deduped in run 2.
"""

from __future__ import annotations

from lms_etl_pipeline_spark import streaming
from lms_etl_pipeline_spark.streaming.stateful import streaming_first_seen

DDL = "user STRING, ts TIMESTAMP"


def _land(spark, path, rows):
    spark.createDataFrame(rows, "user STRING, ts_s STRING").selectExpr(
        "user", "CAST(ts_s AS TIMESTAMP) AS ts"
    ).coalesce(1).write.mode("append").parquet(path)


def test_first_seen_across_runs(spark, tmp_path):
    landing = str(tmp_path / "in")
    ckpt = str(tmp_path / "ck")
    got: list[tuple] = []

    def sink(batch_df, batch_id):
        got.extend((r.key, str(r.first_ts)) for r in batch_df.collect())

    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(DDL)

    # run 1: u1 twice, u2 once -> two first-seen rows
    _land(spark, landing, [("u1", "2024-01-01 00:00:05"), ("u1", "2024-01-01 00:00:09"),
                           ("u2", "2024-01-01 00:01:00")])
    stream = streaming_first_seen(
        streaming.file_stream(spark, landing, schema), "user", "ts"
    )
    streaming.run_available_now(stream, sink, ckpt, output_mode="append")
    assert sorted(got) == [("u1", "2024-01-01 00:00:05"), ("u2", "2024-01-01 00:01:00")]

    # run 2: u1 again (stateful drop) + new u3 (emitted)
    got.clear()
    _land(spark, landing, [("u1", "2024-01-01 02:00:00"), ("u3", "2024-01-01 02:00:01")])
    stream = streaming_first_seen(
        streaming.file_stream(spark, landing, schema), "user", "ts"
    )
    streaming.run_available_now(stream, sink, ckpt, output_mode="append")
    assert sorted(got) == [("u3", "2024-01-01 02:00:01")]
