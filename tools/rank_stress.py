"""Measured global-order stress: single-partition window vs the bucketed
prefix decomposition (operators/rank.py).

Round 7 rewrote every corpus-proportional global window (NTILE, exact
rank, running sum/max) onto the two-stage decomposition: a partitioned
within-bucket window over a monotone coarse key + a tiny broadcast
per-bucket prefix table.  SCALING.md asserts that this removes the
single-task sort stage; this tool measures it, so the claim rests on
numbers, not assertion.

Fixture (synthesized in-memory, deterministic, no files): ``N`` rows with
a value key drawn from a large integer domain via xxhash64 (uniform — the
friendly case for the single-partition sort and the neutral case for the
uniform-width buckets; skew is skew_stress.py's department) plus a
monotone id tie-break.  Measured cells (min-of-REPS, full-column
hash-sum sink):

- NTILE(10) over (key, id):       ``F.ntile`` single-partition window vs
  ``global_ntile`` over ``with_uniform_key_buckets`` (the
  equidepth_histogram / model_gains_table / rfm_segmentation shape);
- exact global rank:              ``F.row_number`` vs ``attach_global_rank``
  (the gini_concentration / abc_pareto shape);
- running sum, exclusive frame:   ``F.sum`` single-partition window vs
  ``global_running_agg`` (the quality_ranker_auc / watermark_loss_curve
  shape).

Every decomposed result is verified equal to its single-partition twin
(count + order-insensitive hash) BEFORE its timing is reported — a fast
wrong answer is not a speedup.

The single-partition cells are exactly what `tools/audit_plans.py` now
forbids outside SF-independent bounds; the measured gap is why.

Usage: python tools/rank_stress.py [N_rows]   (default 10_000_000)
Output: a Markdown section for SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
REPS = 2
NTILE_K = 10


def result_hash(df):
    from pyspark.sql import functions as F

    # Cast to string before hashing: xxhash64 is type-sensitive, and the
    # twins legitimately differ in integer width (ntile returns INT, the
    # decomposition LONG) while agreeing in value.  All compared columns
    # are integral, so the string form is canonical.
    row = (
        df.select(
            F.xxhash64(
                *[F.col(c).cast("string") for c in sorted(df.columns)]
            ).alias("h")
        )
        .agg(F.bit_xor("h").alias("x"), F.count("*").alias("n"))
        .collect()[0]
    )
    return (row["x"], row["n"])


def timed(label: str, build, sink) -> float:
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        sink(build())
        best = min(best, time.perf_counter() - t0)
    print(f"  {label:44s} {best:7.2f} s", flush=True)
    return best


def main() -> int:
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.operators.rank import (
        attach_global_rank,
        global_ntile,
        global_running_agg,
        with_uniform_key_buckets,
    )
    from lms_etl_pipeline_spark.session import get_spark
    from bench import force_eval

    spark = get_spark("rank-stress")
    spark.sparkContext.setLogLevel("ERROR")

    fact = (
        spark.range(N)
        .select(
            F.col("id"),
            F.pmod(F.xxhash64("id"), F.lit(1 << 40)).alias("key"),
            (F.col("id") % 1000).alias("v"),
        )
        .localCheckpoint()  # freeze the fixture: measure the rank, not range()
    )
    order = [F.col("key").asc(), F.col("id").asc()]

    def sp_ntile():
        w = Window.orderBy(*order)
        return fact.select("id", F.ntile(NTILE_K).over(w).alias("b"))

    def bk_ntile():
        return global_ntile(
            with_uniform_key_buckets(fact, "key"),
            NTILE_K,
            order,
            F.col("_gbk"),
            bucket_col="b",
        ).select("id", "b")

    def sp_rank():
        w = Window.orderBy(*order)
        return fact.select("id", F.row_number().over(w).alias("r"))

    def bk_rank():
        return attach_global_rank(
            with_uniform_key_buckets(fact, "key"), order, F.col("_gbk"),
            rank_col="r",
        ).select("id", "r")

    def sp_runsum():
        w = Window.orderBy(*order).rowsBetween(Window.unboundedPreceding, -1)
        return fact.select("id", F.sum("v").over(w).alias("s"))

    def bk_runsum():
        return global_running_agg(
            with_uniform_key_buckets(fact, "key"), "v", order, F.col("_gbk"),
            out_col="s", agg="sum", inclusive=False,
        ).select("id", "s")

    pairs = [
        (f"NTILE({NTILE_K})", sp_ntile, bk_ntile),
        ("exact global rank", sp_rank, bk_rank),
        ("running sum (exclusive)", sp_runsum, bk_runsum),
    ]
    print(f"fixture: N={N:,} rows, 2^40 key domain, 64 uniform buckets")
    for name, sp, bk in pairs:
        assert result_hash(sp()) == result_hash(bk()), f"{name}: decomposed != window"
    print("decomposed results verified equal to single-partition twins (hash + count)\n")

    results: dict[str, tuple[float, float]] = {}
    for name, sp, bk in pairs:
        t_sp = timed(f"{name}, single-partition window", sp, force_eval)
        t_bk = timed(f"{name}, bucketed decomposition", bk, force_eval)
        results[name] = (t_sp, t_bk)

    print("\n## Measured: global-order decomposition (tools/rank_stress.py)\n")
    print(
        f"| op (N={N:,}, uniform 2^40 key domain) | single-partition window (s) "
        "| bucketed decomposition (s) | speedup |"
    )
    print("|---|---|---|---|")
    for name, (t_sp, t_bk) in results.items():
        print(f"| {name} | {t_sp:.2f} | {t_bk:.2f} | {t_sp / t_bk:.1f}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
