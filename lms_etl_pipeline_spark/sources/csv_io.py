"""CSV source/sink (reference S4/S5: the pipeline's interchange format).

The reference writes one CSV object per run and re-infers types on read —
losing all type information in the hop (SURVEY.md §1.1).  Here the sink
writes header'd CSV (partitioned by default; ``single_file`` coalesces to
one object when the reference's single-key layout must be preserved) and
the scan requires an explicit schema: inference is a full extra pass over
the data and silently mis-types at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_CSV_OPTS = {
    "header": "true",
    # Distinguish NULL from empty string both directions — pandas' read/write
    # default conflates them (reference hazard, SURVEY §1.2 T3).  NULL is
    # written as \N; empty strings keep the writer's quoted-"" default
    # (overriding emptyValue to '' would write them unquoted, which the
    # reader maps back to NULL).
    "nullValue": "\\N",
    "timestampFormat": "yyyy-MM-dd HH:mm:ss.SSSSSS",
}


def write_csv(df: DataFrame, path: str, mode: str = "overwrite", single_file: bool = False) -> None:
    """CSV sink.  ``single_file=True`` mirrors the reference's one-object
    snapshot (S4) — a deliberate anti-scale choice, so default is off and
    writes stay partitioned/parallel."""
    out = df.coalesce(1) if single_file else df
    writer = out.write.mode(mode)
    for k, v in _CSV_OPTS.items():
        writer = writer.option(k, v)
    writer.csv(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """CSV scan with a mandatory explicit schema (S5, minus inference).

    PERMISSIVE mode: malformed rows yield NULLs, never a job abort —
    the 100 TB posture (a single bad row must not kill the batch).
    """
    reader = spark.read.schema(schema).option("mode", "PERMISSIVE")
    for k, v in _CSV_OPTS.items():
        reader = reader.option(k, v)
    return reader.csv(path)
