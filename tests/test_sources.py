"""Tests for sources/sinks: parquet catalog, CSV round trip."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import types as T

from lms_etl_pipeline_spark.sources import csv_io, tables
from tests.conftest import SF_SMOKE


def test_load_table_known(spark):
    df = tables.load_table(spark, SF_SMOKE, "nation")
    assert df.count() == 25


def test_load_table_unknown_raises(spark):
    with pytest.raises(KeyError):
        tables.load_table(spark, SF_SMOKE, "not_a_table")


def test_events_ts_normalized_to_timestamp(spark):
    df = tables.load_table(spark, SF_SMOKE, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp"


def test_load_tables_skips_missing(spark, tmp_path):
    # empty dir: no tables, no crash (lazy probe, not os.path.exists)
    assert tables.load_tables(spark, str(tmp_path)) == {}


def test_register_views(spark):
    tables.register_views(spark, SF_SMOKE)
    assert spark.sql("SELECT COUNT(*) AS n FROM region").collect()[0].n == 5


def test_csv_roundtrip_preserves_nulls_and_empty_strings(spark, tmp_path):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("s", T.StringType()),
        ]
    )
    df = spark.createDataFrame([(1, None), (2, ""), (3, "x")], schema)
    path = str(tmp_path / "csv")
    csv_io.write_csv(df, path)
    back = {r.id: r.s for r in csv_io.read_csv(spark, path, schema).collect()}
    assert back[1] is None  # NULL round-trips as NULL, not ''
    assert back[2] == ""  # empty string stays a string
    assert back[3] == "x"


def test_csv_single_file_mode(spark, tmp_path):
    df = spark.createDataFrame([Row(a=i) for i in range(10)]).repartition(4)
    path = str(tmp_path / "one")
    csv_io.write_csv(df, path, single_file=True)
    import glob

    assert len(glob.glob(f"{path}/part-*.csv")) == 1
