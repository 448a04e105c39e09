"""JSON-Lines source/sink — the LLM-corpus interchange format.

One JSON object per line, newline-delimited, optionally gzip-compressed
(Spark's text sources decompress ``.gz`` transparently and split plain
files by line).  Same contract as the CSV pair: explicit schema on read
(inference is an extra full pass and nondeterministic on heterogeneous
corpora), PERMISSIVE parse (a malformed line yields a NULL row captured in
``_corrupt_record`` when requested — never a job abort at 100 TB).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_jsonl(
    df: DataFrame, path: str, mode: str = "overwrite", compression: str | None = None
) -> None:
    """JSONL sink; ``compression='gzip'`` for archival corpora (trade:
    gzip'd files are unsplittable — one task per file on read, so cap
    file sizes at write time via partition count)."""
    writer = df.write.mode(mode)
    if compression:
        writer = writer.option("compression", compression)
    writer.json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """JSONL scan with mandatory explicit schema.

    ``keep_corrupt=True`` appends a ``_corrupt_record`` string column
    capturing unparseable lines for a quarantine sink instead of dropping
    them silently.
    """
    if keep_corrupt:
        schema = T.StructType(
            [*schema.fields, T.StructField("_corrupt_record", T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
