"""Sinks: JDBC upsert (reference S7) and the error-channel publisher (S8)."""

from lms_etl_pipeline_spark.sinks.jdbc_upsert import (
    upsert_via_foreach_partition,
    upsert_via_staging,
)

__all__ = ["upsert_via_staging", "upsert_via_foreach_partition"]
