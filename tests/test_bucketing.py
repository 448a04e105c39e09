"""Bucketed co-located join: the Exchange must disappear.

Writes orders and customer bucketed on the join key with the same bucket
count, then asserts the join plan has NO shuffle on either side — the disk
layout replaced it.  This is invisible in result-correctness tests and the
whole point at 100 TB.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.sources import bucketed
from lms_etl_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    bucketed.write_bucketed(o, "orders_b", ["o_custkey"], n_buckets=8, sort_cols=["o_custkey"])
    bucketed.write_bucketed(c, "cust_b", ["c_custkey"], n_buckets=8, sort_cols=["c_custkey"])
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS cust_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    # disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = bucketed.read_table(spark, "orders_b")
        c = bucketed.read_table(spark, "cust_b")
        joined = o.join(c, o.o_custkey == c.c_custkey).select("o_orderkey", "c_name")
        plan = joined._jdf.queryExecution().sparkPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan  # bucket layout replaced the shuffle
        # sortBy'd buckets: the merge join reads pre-sorted files — at most
        # trivial in-partition sorts remain, never a ShuffleExchange
        assert plan.count("Exchange") == 0
        # and the result is still right
        plain = load_table(spark, SF_SMOKE, "orders").join(
            load_table(spark, SF_SMOKE, "customer"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_bucketed_agg_has_no_exchange(spark, bucketed_tables):
    o = bucketed.read_table(spark, "orders_b")
    agg = o.groupBy("o_custkey").agg(F.count("*").alias("n"))
    plan = agg._jdf.queryExecution().sparkPlan().toString()
    assert "Exchange" not in plan  # grouping key == bucket key
    assert agg.count() > 0