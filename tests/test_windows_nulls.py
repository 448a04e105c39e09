"""NULL order keys through the range-join-binned rewrite (ADVICE r7).

window_range_between replaced the single-partition Window.rangeBetween with
a covering-bin equi-join; a plain final equi-join silently dropped
NULL-balance rows, whereas the window emits them with their NULL peer-group
count.  Pin the rewrite against Spark's own rangeBetween window on nullable
data (the differential oracle can't see this: TPC-H c_acctbal is non-null).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def nullable_customers(spark, tmp_path_factory):
    """A customer fixture with NULL, duplicate, and negative balances."""
    rows = []
    for i in range(300):
        if i % 7 == 0:
            bal = None
        else:
            bal = float(((i * 48271) % 4001) - 2000) / 2.0
        rows.append((i, bal))
    df = spark.createDataFrame(rows, "c_custkey long, c_acctbal double")
    out = str(tmp_path_factory.mktemp("nullbal"))
    df.write.parquet(f"{out}/customer.parquet")
    return out


def test_range_between_matches_window_on_nulls(spark, nullable_customers):
    from lms_etl_pipeline_spark.plans.windows import window_range_between

    got = window_range_between(spark, nullable_customers)
    w = Window.orderBy("c_acctbal").rangeBetween(-100, 100)
    want = (
        spark.read.parquet(f"{nullable_customers}/customer.parquet")
        .select("c_custkey", "c_acctbal", F.count("*").over(w).alias("peers_within_100"))
    )
    assert got.count() == want.count()  # NULL rows are NOT dropped
    assert got.subtract(want).count() == 0 and want.subtract(got).count() == 0


def test_null_rows_carry_null_group_count(spark, nullable_customers):
    from lms_etl_pipeline_spark.plans.windows import window_range_between

    got = window_range_between(spark, nullable_customers)
    nulls = got.filter(F.col("c_acctbal").isNull())
    n_null = nulls.count()
    assert n_null > 0
    assert nulls.filter(F.col("peers_within_100") != n_null).count() == 0
