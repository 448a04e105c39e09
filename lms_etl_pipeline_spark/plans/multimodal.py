"""Multimodal-pipeline queries: binary payload decode / frame sampling via
Arrow-batched ``mapInPandas`` (operators.multimodal), differentially tested.

The fake decode is deliberately SQL-expressible (byte length, md5, modular
pseudo-dimensions), so these queries verify the *plumbing* that matters at
scale — explicit mapInPandas schemas, Arrow batch transfer, fan-out row
emission — against DuckDB computing the same features relationally.  The
fixture ``documents.text`` is pure ASCII (verified), so byte offsets and
character offsets coincide in the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from lms_etl_pipeline_spark.operators import multimodal as mm
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.sources.tables import load_table


@query(
    "multimodal_image_decode",
    oracle="""
    SELECT doc_id AS id,
           OCTET_LENGTH(ENCODE(text)) AS payload_bytes,
           MD5(text) AS payload_md5,
           CAST(OCTET_LENGTH(ENCODE(text)) % 509 AS INTEGER) AS pseudo_width,
           CAST(OCTET_LENGTH(ENCODE(text)) % 293 AS INTEGER) AS pseudo_height
    FROM documents
    """,
)
def multimodal_image_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image-decode stub over binary payloads: one mapInPandas pass,
    vectorized per Arrow batch.  ``mean_byte`` (the pandas-only feature) is
    covered by unit tests; the oracle checks the SQL-expressible features,
    i.e. that every byte made it across the Arrow boundary intact."""
    d = load_table(spark, sf_dir, "documents")
    feats = mm.decode_image_features(mm.with_payload(d))
    return feats.select("id", "payload_bytes", "payload_md5", "pseudo_width", "pseudo_height")


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id AS id,
             UNNEST(RANGE(0, LEAST(CAST(CEIL(LENGTH(text) / 256.0) AS BIGINT), 8))) AS frame_idx
      FROM documents
      WHERE LENGTH(text) > 0
    )
    SELECT f.id,
           CAST(f.frame_idx AS INTEGER) AS frame_idx,
           OCTET_LENGTH(ENCODE(SUBSTRING(d.text, CAST(f.frame_idx * 256 + 1 AS BIGINT), 256)))
               AS frame_bytes,
           MD5(SUBSTRING(d.text, CAST(f.frame_idx * 256 + 1 AS BIGINT), 256)) AS frame_md5
    FROM frames f JOIN documents d ON d.doc_id = f.id
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-frame-sampling stub: fan-out one row per 256-byte frame (max 8)
    of each payload, emitted incrementally per Arrow batch — the shape a
    real frame sampler has (bounded memory under fan-out)."""
    d = load_table(spark, sf_dir, "documents")
    return mm.sample_frames(mm.with_payload(d), frame_size=256, max_frames=8)


@query(
    "multimodal_audio_decode",
    oracle="""
    SELECT doc_id AS id,
           OCTET_LENGTH(ENCODE(text)) AS payload_bytes,
           OCTET_LENGTH(ENCODE(text)) / 32000.0 AS pseudo_duration_s
    FROM documents
    """,
)
def multimodal_audio_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-decode stub: duration from byte length at a pretend sample
    rate.  ``rms_byte`` (pandas-only) is unit-tested."""
    d = load_table(spark, sf_dir, "documents")
    feats = mm.decode_audio_features(mm.with_payload(d))
    return feats.select("id", "payload_bytes", "pseudo_duration_s")
