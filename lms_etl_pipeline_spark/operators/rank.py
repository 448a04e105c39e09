"""Scalable EXACT global rank / NTILE / running sum over a total order.

A corpus-wide ``Window.orderBy(...)`` (no partitionBy) is the classic
Spark scale killer: every row funnels through ONE task via an Exchange
SinglePartition, so the stage is sequential no matter how many executors
exist.  Yet exact global ordering semantics (NTILE phases, running-total
budgets, Z-order range splits) are real requirements of a training-data
pipeline.  This module implements them exactly, with bounded parallelism
loss, using the classic distributed total-order decomposition:

1. the caller supplies a **coarse bucket expression** — any pure,
   deterministic function of the order key that is MONOTONE
   NON-DECREASING in the total order (e.g. the high bits of an integer
   sort key, ``floor(score * g)`` for a float key).  Rows are hash-
   shuffled once on that bucket;
2. within each bucket, a *partitioned* window computes ``row_number()``
   (parallelism = number of buckets, one ordinary shuffle);
3. a per-bucket aggregate (<= #buckets rows, report-sized) is prefix-
   summed with a tiny global window and broadcast-joined back, turning
   local ranks into exact global ranks:
   ``global_rank = rows_before_bucket + rank_within_bucket``.

Correctness does NOT depend on partitioner sampling or exchange reuse —
the bucket is a pure function of the row, so every consumer of the
tagged frame agrees on the assignment by construction (unlike
``repartitionByRange`` + ``spark_partition_id()``, whose range bounds
are sampled per-RDD-instance and only consistent under ReuseExchange).
The only remaining unpartitioned window in the plan runs over the
per-bucket aggregate, bounded by the bucket count and machine-checked
by tools/audit_plans.py's ALLOW_GLOBAL_WINDOW small-bound class.

Skew is the caller's dial: more buckets = more parallelism and a
(slightly) larger offset table.  64-4096 buckets covers everything from
local[32] to a 1000-executor cluster; the offset table stays far under
any broadcast threshold either way.

Reference parity: the reference pipeline has no distributed ordering at
all (388-LoC pandas Lambda, single process); these operators exist for
the engine's own 100 TB scale story, not reference parity.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GB = "_gb"  # coarse bucket
_RN = "_rn"  # rank within bucket


def attach_global_rank(
    df: DataFrame,
    order_cols: list[Column | str],
    coarse_bucket: Column,
    rank_col: str = "grank",
    total_col: str | None = None,
) -> DataFrame:
    """Exact 1-based global rank of every row in the total order given by
    ``order_cols`` (which must be a unique key for deterministic output),
    computed without a corpus-sized single-partition stage.

    ``coarse_bucket``: pure monotone-non-decreasing function of the order
    key (see module docstring).  ``total_col``: optionally also attach
    the grand total row count (NTILE needs it).
    """
    tagged = df.withColumn(_GB, coarse_bucket)
    w_in = Window.partitionBy(_GB).orderBy(*order_cols)
    tagged = tagged.withColumn(_RN, F.row_number().over(w_in))

    per_bucket = tagged.groupBy(_GB).agg(F.count("*").alias("_cnt"))
    w_pfx = Window.orderBy(_GB).rowsBetween(Window.unboundedPreceding, -1)
    w_tot = Window.orderBy(_GB).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = per_bucket.select(
        _GB,
        F.coalesce(F.sum("_cnt").over(w_pfx), F.lit(0)).alias("_before"),
        F.sum("_cnt").over(w_tot).alias("_total"),
    )
    out = tagged.join(F.broadcast(offsets), _GB).withColumn(
        rank_col, (F.col("_before") + F.col(_RN)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col("_total").cast("long"))
    return out.drop(_GB, _RN, "_before", "_total")


def global_ntile(
    df: DataFrame,
    n_buckets: int,
    order_cols: list[Column | str],
    coarse_bucket: Column,
    bucket_col: str = "ntile",
) -> DataFrame:
    """Exact ``NTILE(n_buckets) OVER (ORDER BY order_cols)`` without the
    single-partition window: derive each row's global rank (see
    :func:`attach_global_rank`), then apply NTILE's arithmetic — with
    ``n`` rows, the first ``n % k`` buckets hold ``n div k + 1`` rows
    and the rest ``n div k`` (SQL-standard semantics, identical in Spark
    and DuckDB).
    """
    ranked = attach_global_rank(
        df, order_cols, coarse_bucket, rank_col="_gr", total_col="_n"
    )
    base = F.floor(F.col("_n") / n_buckets)  # small-bucket size (0 if n < k)
    rem = F.col("_n") % n_buckets
    big = base + 1  # size of each of the first `rem` buckets
    cut = big * rem  # ranks 1..cut live in the big buckets
    bucket = F.when(
        F.col("_gr") <= cut, F.floor((F.col("_gr") - 1) / big) + 1
    ).otherwise(rem + F.floor((F.col("_gr") - cut - 1) / base) + 1)
    return ranked.withColumn(bucket_col, bucket.cast("long")).drop("_gr", "_n")


def global_running_sum(
    df: DataFrame,
    value_col: Column | str,
    order_cols: list[Column | str],
    coarse_bucket: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Exact ``SUM(value) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` without the single-partition window: a partitioned
    within-bucket running sum plus the broadcast exclusive prefix of
    per-bucket sums.
    """
    tagged = df.withColumn(_GB, coarse_bucket)
    w_in = (
        Window.partitionBy(_GB)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tagged = tagged.withColumn("_rs", F.sum(value_col).over(w_in))

    per_bucket = tagged.groupBy(_GB).agg(F.sum(value_col).alias("_bsum"))
    w_pfx = Window.orderBy(_GB).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        _GB, F.coalesce(F.sum("_bsum").over(w_pfx), F.lit(0)).alias("_before")
    )
    return (
        tagged.join(F.broadcast(offsets), _GB)
        .withColumn(out_col, F.col("_before") + F.col("_rs"))
        .drop(_GB, "_rs", "_before")
    )
