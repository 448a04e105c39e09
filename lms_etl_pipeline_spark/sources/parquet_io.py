"""Partitioned parquet sink + pruning-aware scans.

Hive-style directory partitioning (``partitionBy``) is the batch layout
lever at 100 TB: a predicate on the partition column prunes entire
directories at planning time — the scan never opens the files.  The test
suite pins that ``PartitionFilters`` (not just ``PushedFilters``) carries
the predicate.

Partition-column choice rules (documented because they're the common
failure): low-to-medium cardinality (dates, regions — never ids), and
append workloads should write one partition per batch so small-file
accretion stays bounded per directory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
    max_records_per_file: int | None = None,
) -> None:
    """Parquet sink partitioned by ``partition_cols``.

    ``max_records_per_file`` caps file size without an extra repartition
    (Spark splits at write time) — the knob against giant-file stragglers.
    """
    writer = df.write.mode(mode)
    if max_records_per_file is not None:
        writer = writer.option("maxRecordsPerFile", max_records_per_file)
    writer.partitionBy(*partition_cols).parquet(path)


def read_partitioned(
    spark: SparkSession, path: str, schema: T.StructType | None = None
) -> DataFrame:
    """Scan a partitioned layout.  Partition columns come back typed from
    directory names; pass ``schema`` to pin data-column types explicitly."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)
