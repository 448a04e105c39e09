"""Exact distributed order statistics by radix selection.

``kth_smallest`` finds the exact k-th smallest value of a BIGINT column in
at most 8 bounded aggregate passes — the classic answer to "median of a
100 TB column" that a global sort cannot give you:

- a full sort is O(n log n) ACROSS THE CLUSTER with an all-to-all range
  shuffle of every row; the approx sketches (``approx_percentile``) give
  up exactness for one pass;
- radix selection is EXACT in ceil(64/8)=8 passes, each ONE map-side-
  combining 256-bucket count over the (monotonically shrinking) candidate
  set, with a 256-row bounded collect per pass — the same bounded-driver-
  loop class as the engine's GD trainer and IVF centroid fetch.  No
  shuffle ever carries data rows; only 256 counts move.

Order-preserving unsigned mapping: ``u = v XOR LONG_MIN`` flips the sign
bit, making signed int64 order agree with lexicographic order of the 8
unsigned bytes (the standard radix-sort trick).  Bytes are extracted with
``shiftrightunsigned`` so each pass partitions candidates by one byte,
narrowing k into the matching bucket.

At 100 TB: pass 1 scans the full column (narrow, column-pruned parquet
read); pass p>=2 scans with a pushed prefix filter over an ever-smaller
byte prefix — callers looping many quantiles should materialize the
mapped column once via the session seam.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LONG_MIN = -(1 << 63)


def _unsigned(col: Column) -> Column:
    """Sign-bit flip: signed int64 order == unsigned byte-lexicographic."""
    return col.bitwiseXOR(F.lit(LONG_MIN))


def kth_smallest(df: DataFrame, column: str, k: int) -> int:
    """Exact 1-indexed k-th smallest among the column's non-null values.

    Raises ``ValueError`` when k is out of range (including empty input).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    base = df.filter(F.col(column).isNotNull()).select(
        _unsigned(F.col(column)).alias("_u")
    )
    prefix = 0  # unsigned value of the bytes fixed so far
    for i in range(8):
        shift = 8 * (7 - i)
        cand = (
            base
            if i == 0
            else base.filter(F.shiftrightunsigned("_u", shift + 8) == prefix)
        )
        counts = (
            cand.groupBy(
                (F.shiftrightunsigned("_u", shift).bitwiseAND(F.lit(255))).alias("_b")
            )
            .count()
            .collect()  # bounded: <= 256 rows per pass
        )
        remaining = k
        bucket = None
        for b, n in sorted((r["_b"], r["count"]) for r in counts):
            if remaining <= n:
                bucket = b
                break
            remaining -= n
        if bucket is None:
            total = sum(n for _, n in ((r["_b"], r["count"]) for r in counts))
            raise ValueError(
                f"k={k} exceeds the non-null count "
                f"(remaining {remaining} past the last bucket at pass {i}; "
                f"pass-local total {total})"
            )
        k = remaining
        prefix = (prefix << 8) | bucket
    value = prefix ^ (1 << 63)
    return value - (1 << 64) if value >= 1 << 63 else value


def _narrow(counts: list[tuple[int, int]], k: int, q: float) -> tuple[int, int]:
    """Walk a digit histogram: return (digit holding rank k, residual k)."""
    remaining = k
    for d, n in counts:
        if remaining <= n:
            return d, remaining
        remaining -= n
    raise ValueError(f"rank {k} for q={q} exceeds the candidate count")


#: direct-resolve budget: once the exact surviving candidate count is at or
#: below this, fetch the candidate VALUES in one filtered collect instead of
#: running further counting passes (<= 512 KB of longs on the driver — the
#: same bounded-collect class as the per-pass histograms).
_DIRECT_BUDGET = 65536


def quantiles_by_radix(
    df: DataFrame,
    column: str,
    qs: tuple[float, ...],
    direct_budget: int = _DIRECT_BUDGET,
) -> list[tuple[float, int]]:
    """ALL requested exact quantiles of a BIGINT column in FOUR aggregate
    passes total — the batched form of ``kth_smallest`` for the common
    "give me p25/p50/p90/p99 of this 100 TB column" call:

    - 16-bit digits instead of 8-bit: ceil(64/16) = 4 passes, each one
      map-side-combining count with a <= 65536-row bounded collect — the
      collect grows 256x but stays KB-scale, while full-column scans halve;
    - pass 1 has no prefix yet, so its histogram is SHARED by every
      quantile AND its total is n — the separate COUNT(*) job folds away
      (ranks ``1 + floor(q*(n-1))`` are derived from the same histogram
      that then narrows them);
    - passes 2..4 compute one conditional count per DISTINCT surviving
      prefix inside a single aggregate (``sum(when(prefix match, 1))``
      per prefix, grouped by the pass's digit), pre-filtered to rows
      matching any prefix — one job per pass no matter how many quantiles;
    - every pass's histogram gives the EXACT surviving candidate count, so
      once it is <= ``_DIRECT_BUDGET`` the loop short-circuits: ONE
      filtered collect fetches the candidate values and the ranks resolve
      driver-side — at small SF that makes the whole call 2 jobs, and at
      100 TB (n=1e12: ~1.5e7 candidates after pass 1, ~230 after pass 2)
      it caps the tail passes at 3 jobs without ever guessing.

    Returns ``[(q, value)]`` in input order (empty when the column has no
    non-null rows).  Data movement: <= 65536 * (1 + #distinct prefixes)
    exact counts per pass, independent of n — vs. ``len(qs) * 8`` full
    aggregate jobs for the one-k-at-a-time loop (33 Spark jobs -> <=4 for
    the four-quantile plan; measured 5.9 s -> see plans/order_stats.py).
    """
    import math

    base = df.filter(F.col(column).isNotNull()).select(
        _unsigned(F.col(column)).alias("_u")
    )
    hist = base.groupBy(F.shiftrightunsigned("_u", 48).alias("_d")).count().collect()
    counts = sorted((r["_d"], r["count"]) for r in hist)
    n = sum(c for _, c in counts)
    if n == 0:
        return []
    sizes = dict(counts)
    # state per quantile: (rank within current candidate set, fixed prefix)
    state: list[tuple[int, int]] = []
    for q in qs:
        k = 1 + math.floor(q * (n - 1))
        d, k = _narrow(counts, k, q)
        state.append((k, d))

    def resolve_direct(shift: int) -> list[tuple[float, int]]:
        """One filtered collect of every surviving candidate value."""
        prefixes = sorted({p for _, p in state})
        vals = (
            base.filter(F.shiftrightunsigned("_u", shift).isin(prefixes))
            .collect()  # bounded: caller checked exact count <= budget
        )
        by_prefix: dict[int, list[int]] = {p: [] for p in prefixes}
        for r in vals:
            # _u collects as SIGNED int64; reinterpret unsigned so the
            # driver-side shift and sort agree with shiftrightunsigned
            u = r["_u"] & ((1 << 64) - 1)
            by_prefix[u >> shift].append(u)
        for p in prefixes:
            by_prefix[p].sort()
        out = []
        for (k, p), q in zip(state, qs):
            value = by_prefix[p][k - 1] ^ (1 << 63)
            out.append((q, value - (1 << 64) if value >= 1 << 63 else value))
        return out

    for shift in (32, 16, 0):
        if sum(sizes[p] for p in {p for _, p in state}) <= direct_budget:
            return resolve_direct(shift + 16)
        prefixes = sorted({p for _, p in state})
        upper = F.shiftrightunsigned("_u", shift + 16)
        cand = base.filter(upper.isin(prefixes))
        agg = (
            cand.groupBy(
                (F.shiftrightunsigned("_u", shift).bitwiseAND(F.lit(0xFFFF))).alias("_d")
            )
            .agg(
                *(
                    F.sum(
                        F.when(upper == F.lit(p), F.lit(1)).otherwise(F.lit(0))
                    ).alias(f"_c{p}")
                    for p in prefixes
                )
            )
            .collect()  # bounded: <= 65536 rows x len(prefixes) counts
        )
        by_prefix = {
            p: sorted((r["_d"], r[f"_c{p}"]) for r in agg if r[f"_c{p}"]) for p in prefixes
        }
        nxt = []
        sizes = {}
        for (k, p), q in zip(state, qs):
            d, k = _narrow(by_prefix[p], k, q)
            child = (p << 16) | d
            sizes[child] = dict(by_prefix[p])[d]
            nxt.append((k, child))
        state = nxt
    out = []
    for (_, prefix), q in zip(state, qs):
        value = prefix ^ (1 << 63)
        out.append((q, value - (1 << 64) if value >= 1 << 63 else value))
    return out
