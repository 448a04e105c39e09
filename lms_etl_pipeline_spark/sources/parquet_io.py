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


def compact_small_files(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> int:
    """Compact a small-file parquet layout in place; returns the new file
    count.

    Streaming/incremental sinks accrete many tiny files (one per micro-batch
    per partition), which poisons scans twice at 100 TB: per-file open cost,
    and one-row-group files that cap scan parallelism and defeat min/max
    pruning (see the q1 measured-floor note).  Compaction = read → coalesce
    to ceil(bytes / target) files → atomic-ish rewrite (write to a sibling
    temp dir, then swap) — the engine-level equivalent of a lakehouse
    OPTIMIZE.

    ``sort_cols`` additionally sorts *within* output files so row-group
    min/max statistics become selective (clustered layout → rowgroup skips
    on range predicates), the poor man's Z-ORDER for one dimension.

    Refuses hive-partitioned roots (``col=value`` subdirectories): a flat
    rewrite would collapse the partition layout — compact each partition
    directory instead.
    """
    import math

    sc = spark.sparkContext
    hconf = sc._jsc.hadoopConfiguration()
    jpath = sc._jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(hconf)
    for st in fs.listStatus(jpath):
        if st.isDirectory() and "=" in st.getPath().getName():
            raise ValueError(
                f"{path} is hive-partitioned ({st.getPath().getName()}); "
                "compact each partition directory, not the root"
            )
    total_bytes = fs.getContentSummary(jpath).getLength()
    n_files = max(1, math.ceil(total_bytes / target_file_bytes))

    df = spark.read.parquet(path)
    compacted = df.repartition(n_files)
    if sort_cols:
        compacted = compacted.sortWithinPartitions(*sort_cols)

    tmp = path.rstrip("/") + "__compacting"
    compacted.write.mode("overwrite").parquet(tmp)
    # swap: remove original, move temp into place (fs-atomic per rename on
    # HDFS/local; on object stores use a manifest-committing table format)
    fs.delete(jpath, True)
    fs.rename(sc._jvm.org.apache.hadoop.fs.Path(tmp), jpath)
    return len(
        [f for f in fs.listStatus(jpath) if f.getPath().getName().endswith(".parquet")]
    )
