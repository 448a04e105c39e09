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
    return ranked.withColumn(
        bucket_col, ntile_of(F.col("_gr"), F.col("_n"), n_buckets)
    ).drop("_gr", "_n")


def ntile_of(rank: Column, total: Column, n_buckets: int) -> Column:
    """SQL-standard NTILE arithmetic from a 1-based rank and total count:
    the first ``total % k`` buckets hold ``total div k + 1`` rows, the
    rest ``total div k``."""
    base = F.floor(total / n_buckets)  # small-bucket size (0 if n < k)
    rem = total % n_buckets
    big = base + 1  # size of each of the first `rem` buckets
    cut = big * rem  # ranks 1..cut live in the big buckets
    return (
        F.when(rank <= cut, F.floor((rank - 1) / big) + 1)
        .otherwise(rem + F.floor((rank - cut - 1) / base) + 1)
        .cast("long")
    )


_RUN_AGGS = {"sum": F.sum, "max": F.max, "min": F.min}


def global_running_agg(
    df: DataFrame,
    value_col: Column | str,
    order_cols: list[Column | str],
    coarse_bucket: Column,
    out_col: str = "running",
    agg: str = "sum",
    inclusive: bool = True,
) -> DataFrame:
    """Exact ``AGG(value) OVER (ORDER BY order_cols ROWS BETWEEN UNBOUNDED
    PRECEDING AND {CURRENT ROW | 1 PRECEDING})`` for a decomposable AGG
    (sum/max/min), without the single-partition window: a partitioned
    within-bucket running aggregate plus the broadcast exclusive prefix
    of per-bucket totals, combined per AGG's own merge (sum adds, max/min
    take the extremum).  An empty frame (first row, exclusive) yields
    NULL, matching SQL window semantics.
    """
    fagg = _RUN_AGGS[agg]
    end = 0 if inclusive else -1
    tagged = df.withColumn(_GB, coarse_bucket)
    w_in = (
        Window.partitionBy(_GB)
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, end)
    )
    tagged = tagged.withColumn("_rs", fagg(value_col).over(w_in))

    per_bucket = tagged.groupBy(_GB).agg(fagg(value_col).alias("_bagg"))
    w_pfx = Window.orderBy(_GB).rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        _GB, fagg("_bagg").over(w_pfx).alias("_before")
    )
    if agg == "sum":
        combined = F.when(
            F.col("_rs").isNull() & F.col("_before").isNull(), F.lit(None)
        ).otherwise(
            F.coalesce(F.col("_rs"), F.lit(0)) + F.coalesce(F.col("_before"), F.lit(0))
        )
    elif agg == "max":
        combined = F.greatest(F.col("_rs"), F.col("_before"))
    else:
        combined = F.least(F.col("_rs"), F.col("_before"))
    return (
        tagged.join(F.broadcast(offsets), _GB)
        .withColumn(out_col, combined)
        .drop(_GB, "_rs", "_before")
    )


def global_running_sum(
    df: DataFrame,
    value_col: Column | str,
    order_cols: list[Column | str],
    coarse_bucket: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Exact ``SUM(value) OVER (ORDER BY order_cols ROWS UNBOUNDED
    PRECEDING)`` — see :func:`global_running_agg`."""
    return global_running_agg(
        df, value_col, order_cols, coarse_bucket, out_col, agg="sum"
    )


def with_uniform_key_buckets(
    df: DataFrame,
    key: Column | str,
    n_buckets: int = 64,
    bucket_col: str = "_gbk",
    nulls: str = "first",
) -> DataFrame:
    """Attach a DATA-DEPENDENT monotone coarse bucket for keys with no
    statically-known domain: broadcast the key's exact (min, max) — a
    1-row deterministic aggregate, the catalog's standard ALLOW_CROSS
    scalar-broadcast shape — and assign ``width_bucket(key, lo, hi,
    n_buckets)``.

    Monotone non-decreasing in ``key`` by arithmetic, so the result
    column is a valid ``coarse_bucket`` for every operator in this
    module.  DETERMINISM MATTERS here: the tagged frame is consumed by
    two plan branches (the partitioned window and the offset aggregate),
    and min/max are order-insensitive aggregates, so both branches agree
    on every row's bucket even if the subtree is recomputed — the
    property that rules out sampled alternatives (repartitionByRange
    bounds, approx_percentile sketches, both merge-order-sensitive).

    Uniform-width buckets trade skew for determinism: a pathological
    value distribution concentrates rows in few buckets, degrading
    PARALLELISM but never correctness — and never below the
    single-partition floor this helper exists to replace.

    TOTAL over the double line, matching Spark's ascending sort order
    (NULL < -Inf < finite < +Inf < NaN): NULL keys land in bucket -2,
    -Inf in -1, +Inf in n+2, NaN in n+3, and the finite midrange in
    ``width_bucket`` over the (min, max) of the FINITE values only —
    naive min/max would absorb an infinity and turn every finite
    bucket into NaN->NULL, silently breaking monotonicity.  Float data
    carries NaN/Inf in practice (scores, norms, embedding artifacts),
    so the helper must not corrupt global order when they appear.

    NULL/NaN PLACEMENT CONTRACT (``nulls``): ``nulls="first"`` (default)
    matches ``ASC NULLS FIRST`` — Spark's ascending default — on the key
    as given: NULL bucket -2, NaN bucket n+3 (NaN is the LARGEST double
    in Spark's ascending order).  ``nulls="last"`` is the marker for the
    NEGATED-KEY idiom (``-score`` to get a descending global order) and
    makes the buckets match ``DESC NULLS LAST`` on the ORIGINAL key:
    NULL moves to bucket n+4 (descending default is NULLS LAST; the
    ascending placement would rank every NULL before the data instead
    of after it) and NaN moves to bucket -3 (negation does NOT flip NaN
    — ``-NaN`` is still NaN, still the largest value — so under DESC on
    the original key a NaN score ranks FIRST while its negated key
    sorts last; isolating NaN rows in a leading bucket restores the
    intended order, with ties inside the bucket broken by the
    order-key tiebreakers).  Both are no-ops for finite non-null keys,
    so every negating site sets ``nulls="last"`` even when the current
    column is non-nullable and NaN-free.
    """
    if nulls not in ("first", "last"):
        raise ValueError(f"nulls must be 'first' or 'last', got {nulls!r}")
    null_bucket = -2 if nulls == "first" else n_buckets + 4
    nan_bucket = n_buckets + 3 if nulls == "first" else -3
    key = F.col(key) if isinstance(key, str) else key
    # Canonical double view: monotone for every numeric type (a >53-bit
    # decimal may collapse ties, which only merges adjacent buckets) and
    # gives isnan/infinity predicates a legal input type.
    kd = key.cast("double")
    inf, ninf = F.lit(float("inf")), F.lit(float("-inf"))
    finite = kd.isNotNull() & ~F.isnan(kd) & (kd != inf) & (kd != ninf)
    stats = df.agg(
        F.min(F.when(finite, kd)).alias("_lo"),
        F.max(F.when(finite, kd)).alias("_hi"),
    )
    tagged = df.crossJoin(F.broadcast(stats))
    kdt = key.cast("double")  # re-derive on the tagged frame's columns
    bucket = (
        F.when(key.isNull(), F.lit(null_bucket))
        .when(F.isnan(kdt), F.lit(nan_bucket))
        .when(kdt == ninf, F.lit(-1))
        .when(kdt == inf, F.lit(n_buckets + 2))
        .when(F.col("_lo").isNull() | (F.col("_lo") == F.col("_hi")), F.lit(0))
        .otherwise(F.width_bucket(kdt, F.col("_lo"), F.col("_hi"), F.lit(n_buckets)))
    )
    return tagged.withColumn(bucket_col, bucket.cast("long")).drop("_lo", "_hi")
