"""Temporal joins Spark lacks as built-ins: as-of join and interval/range
join helpers (SURVEY.md §2.12 "joins: theta/range").

**As-of join** (``left`` row matched to the single most recent ``right``
row with ``right.ts <= left.ts`` per key) is implemented with the
union–sort–window idiom rather than a range join:

    union both sides tagged by origin
    -> one shuffle on key + per-key sort on (ts, side-tag)
    -> last_value(right payload) over rowsBetween(unbounded, current)
    -> keep left rows

Cost is ONE shuffle + sort of |left| + |right| rows — the same as a single
sort-merge join — with no candidate-pair explosion, no inequality-join
nested loop, and bounded memory per key.  This is the scale-correct shape
for "latest dimension state as of event time" (slowly-changing joins,
tick-to-quote, attribution).

**Interval join** keeps an equi component (the key) so Catalyst plans a
hash/sort-merge join and evaluates the time-band predicate as a residual —
never a cartesian product (pinned by tests/test_plan_shapes.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__side"  # 0 = right (state), 1 = left (probe): sort puts state first


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str] | None = None,
    tolerance: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the single nearest right row on the same
    key: ``direction='backward'`` (default) takes the latest right row with
    ``right_ts <= left_ts``; ``direction='forward'`` takes the EARLIEST
    right row with ``right_ts >= left_ts`` (NULLs when none) — the same
    two directions pandas ``merge_asof`` exposes.  Forward is the
    "next scheduled event / next state change" lookup (time-to-next-action,
    next-maintenance-window), backward the "latest state as of" lookup.

    ``value_cols`` are the right-side payload columns to carry (default:
    all non-key, non-ts right columns).  ``tolerance`` (an INTERVAL string,
    e.g. ``'30 days'``) drops matches farther than ``tolerance`` from
    ``left_ts`` in the match direction — the pandas ``merge_asof``
    contract.  A payload column whose name collides with a left column is
    emitted as ``{name}_right`` (pandas ``merge_asof`` suffix behavior);
    payloads are aliased to ``__r_`` names *at select time* so the
    schema-alignment NULL padding below can never clobber them.

    Both directions are the same union–sort–window idiom (one shuffle on
    the key); forward simply scans the per-key timeline in DESCENDING
    order so "last state seen" means "nearest future state".
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    if value_cols is None:
        value_cols = [c for c in right.columns if c not in (on, right_ts)]

    l_tagged = left.withColumn(_SIDE, F.lit(1)).withColumn("__ts", F.col(left_ts))
    # payload goes straight to its reserved __r_ name: a value_col that
    # shares a name with a left column must survive the left-schema padding
    r_tagged = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
    ).withColumn(_SIDE, F.lit(0))
    # align schemas for the union: left keeps its columns, right contributes
    # the payload; missing columns are NULL on the other side
    r_types = dict(r_tagged.dtypes)
    for c in left.columns:
        if c not in (on,):
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    for c in value_cols:
        l_tagged = l_tagged.withColumn(f"__r_{c}", F.lit(None).cast(r_types[f"__r_{c}"]))
    r_tagged = r_tagged.select(
        *[F.col(c) for c in left.columns],
        F.col("__ts"),
        F.col(_SIDE),
        *[F.col(f"__r_{c}") for c in value_cols],
    )
    l_tagged = l_tagged.select(
        *[F.col(c) for c in left.columns],
        F.col("__ts"),
        F.col(_SIDE),
        *[F.col(f"__r_{c}") for c in value_cols],
    )
    unioned = r_tagged.unionByName(l_tagged)

    # state rows sort before probe rows at equal ts => a right row at
    # exactly left_ts matches (<=/>= inclusive semantics in either direction)
    ts_order = (
        F.col("__ts").asc() if direction == "backward" else F.col("__ts").desc()
    )
    w = (
        Window.partitionBy(on)
        .orderBy(ts_order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn("__match_ts", F.last(F.when(F.col(_SIDE) == 0, F.col("__ts")), ignorenulls=True).over(w))
    for c in value_cols:
        filled = filled.withColumn(
            f"__r_{c}",
            F.last(F.when(F.col(_SIDE) == 0, F.col(f"__r_{c}")), ignorenulls=True).over(w),
        )

    out = filled.filter(F.col(_SIDE) == 1)
    if tolerance is not None:
        within = (
            F.col("__match_ts") >= F.col("__ts") - F.expr(f"INTERVAL {tolerance}")
            if direction == "backward"
            else F.col("__match_ts") <= F.col("__ts") + F.expr(f"INTERVAL {tolerance}")
        )
        for c in value_cols:
            out = out.withColumn(f"__r_{c}", F.when(within, F.col(f"__r_{c}")))
        out = out.withColumn("__match_ts", F.when(within, F.col("__match_ts")))
    # merge_asof-style suffix on collision so output names stay unique
    out_name = {c: (f"{c}_right" if c in left.columns else c) for c in value_cols}
    return out.select(
        *[F.col(c) for c in left.columns],
        F.col("__match_ts").alias(f"asof_{right_ts}"),
        *[F.col(f"__r_{c}").alias(out_name[c]) for c in value_cols],
    )


def interval_join_condition(
    left_key: Column, right_key: Column, left_ts: Column, right_ts: Column, band: str
) -> Column:
    """Equi key + |ts diff| <= band: the join condition shape that keeps
    Catalyst on a hash join with a residual (never a nested loop)."""
    return (
        (left_key == right_key)
        & (right_ts >= left_ts - F.expr(f"INTERVAL {band}"))
        & (right_ts <= left_ts + F.expr(f"INTERVAL {band}"))
    )
