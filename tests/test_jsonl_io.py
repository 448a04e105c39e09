"""JSONL source/sink: round trip, gzip transparency, corrupt-line capture,
and parquet schema evolution (mergeSchema)."""

from __future__ import annotations

import glob
import gzip
import json

from pyspark.sql import types as T

from lms_etl_pipeline_spark.sources import jsonl_io

SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
    ]
)


def test_jsonl_roundtrip_with_nested(spark, tmp_path):
    rows = [(1, "hello", {"lang": "en"}), (2, None, {})]
    df = spark.createDataFrame(rows, SCHEMA)
    path = str(tmp_path / "corpus")
    jsonl_io.write_jsonl(df, path)
    back = {r.doc_id: r for r in jsonl_io.read_jsonl(spark, path, SCHEMA).collect()}
    assert back[1].meta == {"lang": "en"}
    assert back[2].text is None


def test_jsonl_gzip_transparent(spark, tmp_path):
    path = str(tmp_path / "gz")
    df = spark.createDataFrame([(i, f"doc {i}", {}) for i in range(20)], SCHEMA)
    jsonl_io.write_jsonl(df, path, compression="gzip")
    assert glob.glob(f"{path}/part-*.json.gz")  # really compressed on disk
    assert jsonl_io.read_jsonl(spark, path, SCHEMA).count() == 20


def test_jsonl_corrupt_lines_quarantined(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text(
        json.dumps({"doc_id": 1, "text": "ok", "meta": {}})
        + "\n{not json at all\n"
        + json.dumps({"doc_id": 2, "text": "also ok", "meta": {}})
        + "\n"
    )
    out = jsonl_io.read_jsonl(spark, str(p), SCHEMA, keep_corrupt=True).collect()
    corrupt = [r for r in out if r["_corrupt_record"] is not None]
    good = [r for r in out if r["_corrupt_record"] is None]
    assert len(out) == 3  # nothing dropped, nothing aborted
    assert len(corrupt) == 1 and "{not json" in corrupt[0]["_corrupt_record"]
    assert {r.doc_id for r in good} == {1, 2}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Corpus batches gain columns over time; mergeSchema unions them."""
    path = str(tmp_path / "evolving")
    spark.createDataFrame([(1, "a")], "doc_id BIGINT, text STRING").write.mode(
        "append"
    ).parquet(path)
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id BIGINT, text STRING, lang STRING"
    ).write.mode("append").parquet(path)
    merged = spark.read.option("mergeSchema", "true").parquet(path)
    assert set(merged.columns) == {"doc_id", "text", "lang"}
    rows = {r.doc_id: r for r in merged.collect()}
    assert rows[1].lang is None  # old batch: evolved column backfills NULL
    assert rows[2].lang == "en"