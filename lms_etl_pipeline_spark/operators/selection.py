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
