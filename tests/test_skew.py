"""Salted join / salted agg: result-equivalence with the unsalted plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from lms_etl_pipeline_spark.operators import skew


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_matches_plain_inner(spark):
    # skewed fact: 80% of rows share key 1
    fact = spark.createDataFrame(
        [(1, i) for i in range(80)] + [(k, 100 + k) for k in range(2, 22)], "k INT, v INT"
    )
    dim = spark.createDataFrame([(k, f"d{k}") for k in range(0, 22)], "k INT, name STRING")
    plain = fact.join(dim, ["k"])
    salted = skew.salted_join(fact, dim, ["k"], n=4)
    assert _rows(salted) == _rows(plain)


def test_salted_join_left_keeps_unmatched(spark):
    fact = spark.createDataFrame([(1, 10), (99, 20)], "k INT, v INT")
    dim = spark.createDataFrame([(1, "one")], "k INT, name STRING")
    out = _rows(skew.salted_join(fact, dim, ["k"], n=3, how="left"))
    assert out == [(1, 10, "one"), (99, 20, None)]


def test_salted_join_rejects_fanout_types(spark):
    df = spark.createDataFrame([(1, 1)], "k INT, v INT")
    import pytest

    with pytest.raises(ValueError):
        skew.salted_join(df, df, ["k"], how="full")


def test_salted_agg_matches_plain(spark):
    df = spark.createDataFrame(
        [(1, float(i)) for i in range(100)] + [(2, 5.0), (3, 7.0)], "k INT, v DOUBLE"
    )
    plain = df.groupBy("k").agg(
        F.sum("v").alias("s"), F.count("*").alias("n"), F.max("v").alias("mx")
    )
    salted = skew.salted_agg(
        df,
        ["k"],
        {
            "s": (F.sum("v"), "sum"),
            "n": (F.count("*"), "sum"),
            "mx": (F.max("v"), "max"),
        },
        n=4,
    )
    assert _rows(salted) == _rows(plain)


def test_salted_agg_rejects_bad_combiner(spark):
    df = spark.createDataFrame([(1, 1.0)], "k INT, v DOUBLE")
    import pytest

    with pytest.raises(ValueError):
        skew.salted_agg(df, ["k"], {"a": (F.avg("v"), "avg")})


def test_salt_is_deterministic(spark):
    df = spark.createDataFrame([(i, f"v{i}") for i in range(50)], "k INT, v STRING")
    s1 = df.withColumn("s", skew._stable_salt(df, ["k"], 8))
    s2 = df.withColumn("s", skew._stable_salt(df, ["k"], 8))
    assert _rows(s1) == _rows(s2)
    vals = {r.s for r in s1.collect()}
    assert vals <= set(range(8)) and len(vals) > 1
