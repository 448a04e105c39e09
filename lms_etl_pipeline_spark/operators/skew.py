"""Skew mitigation: salted joins and salted aggregation.

AQE's skew-join splitting (on in ``session.get_spark``) handles most skew at
runtime by splitting oversized shuffle partitions.  Salting is the *static*
complement for the cases AQE can't fix — e.g. one hot key whose rows must
all meet the same build-side row (splitting the partition still sends every
probe row to tasks that need that build row), or skewed groupBy keys where
partial aggregation alone doesn't help because the hot key's partials all
converge on one reducer.

Scheme (classic n-way replicate-and-split):

- fact side: deterministic salt in [0, n) derived by hashing the row's
  *other* columns (``xxhash64`` of all non-key columns) — uniform, stable
  across retries (no ``rand()``: a nondeterministic salt breaks task-retry
  correctness under shuffle replay);
- dimension side: each row replicated n times via ``explode(sequence)``;
- join on (key, salt): the hot key's rows now spread over n reducers.

Cost: n× replication of the dimension side — use for genuinely hot keys
with a small-ish build side, after AQE proved insufficient.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def _stable_salt(df: DataFrame, key_cols: list[str], n: int) -> Column:
    """Deterministic uniform salt in [0, n): hash of the non-key columns
    (falls back to the key itself for key-only frames)."""
    others = [c for c in df.columns if c not in key_cols] or key_cols
    return F.pmod(F.xxhash64(*[F.col(c) for c in others]), F.lit(n)).cast("int")


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    n: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with n-way key salting.

    Result is identical to ``fact.join(dim, on, how)`` (verified by test);
    only the shuffle distribution changes.  Supported ``how``: inner/left
    (the fact side keeps exactly one salt per row, so no duplication).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salted_fact = fact.withColumn(SALT_COL, _stable_salt(fact, on, n))
    salted_dim = dim.withColumn(
        SALT_COL, F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )
    return salted_fact.join(salted_dim, [*on, SALT_COL], how).drop(SALT_COL)


#: combiner name -> how n salted partials merge into the group total
_COMBINERS = {"sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(
    df: DataFrame,
    group_cols: list[str],
    aggs: dict[str, tuple[Column, str]],
    n: int = 8,
) -> DataFrame:
    """Two-stage aggregation through a salted pre-aggregate.

    ``aggs`` maps output name -> (partial aggregate expression, combiner),
    where combiner is ``"sum"`` (for sum/count partials), ``"min"`` or
    ``"max"`` — the decomposable aggregates skew mitigation applies to.
    Stage 1 aggregates on (group, salt), spreading a hot group over n
    reducers; stage 2 combines the ≤n partials per group (tiny).
    """
    for name, (_, comb) in aggs.items():
        if comb not in _COMBINERS:
            raise ValueError(f"{name}: combiner must be one of {sorted(_COMBINERS)}")
    salted = df.withColumn(SALT_COL, _stable_salt(df, group_cols, n))
    stage1 = salted.groupBy(*group_cols, SALT_COL).agg(
        *[expr.alias(name) for name, (expr, _) in aggs.items()]
    )
    return stage1.groupBy(*group_cols).agg(
        *[_COMBINERS[comb](name).alias(name) for name, (_, comb) in aggs.items()]
    )
