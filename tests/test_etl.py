"""Unit tests for the reference-parity ETL transforms (SURVEY.md §2.2–§2.3),
covering the documented edge cases: NaN→NULL ints, ' ' string fill, bad-format
dates → NULL, null-dropped custom_fields."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import types as T

from lms_etl_pipeline_spark import etl


def test_flatten_struct_nested(spark):
    df = spark.createDataFrame(
        [Row(id=1, user=Row(name="ann", geo=Row(city="x", zip="1")))]
    )
    flat = etl.flatten_struct(df)
    assert flat.columns == ["id", "user.name", "user.geo.city", "user.geo.zip"]
    row = flat.collect()[0]
    assert row["user.geo.city"] == "x"


def test_rename_columns_unknown_keys_ignored(spark):
    df = spark.createDataFrame([Row(a=1, b=2)])
    out = etl.rename_columns(df, {"a": "x", "nope": "y"})
    assert out.columns == ["x", "b"]


def test_pack_custom_fields_drops_nulls(spark):
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("customFields.a", T.StringType()),
            T.StructField("customFields.b", T.LongType()),
        ]
    )
    df = spark.createDataFrame([(1, "v", None), (2, None, 7)], schema)
    out = {r["id"]: r["custom_fields"] for r in etl.pack_custom_fields(df, "customFields.").collect()}
    # to_json omits NULL fields — the reference's dropna().to_dict() contract.
    assert out[1] == '{"a":"v"}'
    assert out[2] == '{"b":7}'


def test_align_to_schema_try_cast_and_fill(spark):
    df = spark.createDataFrame(
        [Row(n="12", s=None, extra="drop-me"), Row(n="not-a-number", s="x", extra="y")]
    )
    target = T.StructType(
        [
            T.StructField("n", T.LongType()),
            T.StructField("s", T.StringType()),
            T.StructField("missing", T.DoubleType()),
        ]
    )
    out = etl.align_to_schema(df, target, strict_strings=True).collect()
    assert out[0].n == 12 and out[1].n is None  # NULL-on-bad-cast, never abort
    assert out[0].s == " "  # reference T3: 'nan' -> ' ' single-space fill
    assert out[1].s == "x"
    assert all(r.missing is None for r in out)  # missing target col -> typed NULL
    assert "extra" not in etl.align_to_schema(df, target).columns


def test_align_to_schema_json_target(spark):
    df = spark.createDataFrame([Row(m=Row(k="v")), Row(m=None)])
    target = T.StructType([T.StructField("m", df.schema["m"].dataType)])
    out = etl.align_to_schema(df, target).collect()
    assert out[0].m == '{"k":"v"}'
    assert out[1].m is None  # NULL stays NULL, not the string 'null'


def test_parse_datetime_strict_format(spark):
    df = spark.createDataFrame(
        [Row(d="03-15-2024 10:30:00"), Row(d="2024-03-15 10:30:00"), Row(d="garbage")]
    )
    out = etl.parse_datetime_columns(df, ["d"]).collect()
    assert out[0].d is not None and out[0].d.month == 3
    assert out[1].d is None  # ISO input coerces to NULL under the US format
    assert out[2].d is None


def test_scd2_intervals_chain_without_gaps(spark):
    import __spark_entry__ as entrymod
    from pyspark.sql import functions as F
    from tests.conftest import SF_SMOKE

    df = entrymod.queries()["scd2_history_build"](spark, SF_SMOKE)
    # exactly one current row per entity
    cur = df.filter(F.col("is_current")).groupBy("user_id").count()
    assert cur.filter(F.col("count") != 1).count() == 0
    # each non-current version's valid_to equals the next version's valid_from
    a = df.select("user_id", "version", "valid_to", "is_current")
    b = df.select(
        "user_id",
        (F.col("version") - 1).alias("version"),
        F.col("valid_from").alias("next_from"),
    )
    j = a.filter(~F.col("is_current")).join(b, ["user_id", "version"])
    assert j.filter(F.col("valid_to") != F.col("next_from")).count() == 0
