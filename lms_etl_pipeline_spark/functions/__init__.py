"""Reusable column-expression helpers (JVM-side, codegen-friendly)."""

from lms_etl_pipeline_spark.functions.numeric import dec, dec_avg, dec_sum

__all__ = ["dec", "dec_sum", "dec_avg"]
