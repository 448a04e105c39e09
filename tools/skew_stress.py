"""Measured skew stress: one hot key vs AQE skew-join vs static salting.

SCALING.md's four decades measure *uniform* growth; this tool measures the
orthogonal failure mode — KEY SKEW — under controlled conditions, so the
AQE/salting story (operators/skew.py) rests on numbers, not assertion.

Fixture (synthesized in-memory, deterministic, no files): a fact table of
``N`` rows where ``HOT_FRAC`` of all rows carry ONE key and the rest are
uniform over ``N_KEYS``, joined/aggregated against a uniform dimension.
At the default N=10M / 20% hot, the hot key's shuffle partition holds 2M
rows while the median holds ~100 — the shape that turns a 32-way stage
into a 1-task straggler.

Measured cells (min-of-REPS, full-column hash-sum sink, broadcast joins
disabled so the shuffle actually happens):

- join, AQE skew-split OFF  — the straggler baseline;
- join, AQE skew-split ON   — runtime mitigation (thresholds lowered to
  fire at this fixture's MBs, stated inline: production defaults are
  256 MB / factor 5, this is the same mechanism at demo scale);
- join, static salting      — operators/skew.py `salted_join` (n=32);
- groupBy, plain            — partial aggregation already collapses the
  hot key map-side, so this is expected to be FINE (stated, measured);
- groupBy, salted           — `salted_agg`, the two-stage spread.

Every mitigated result is verified equal to its unmitigated twin (count
+ order-insensitive hash) before its timing is reported.

Usage: python tools/skew_stress.py [N_rows] [hot_frac]
       (defaults 10_000_000 rows, 0.20 hot; SCALING.md also records the
       40_000_000 / 0.50 cell)
Output: a Markdown section for SCALING.md.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

N = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
N_KEYS = 100_000
HOT_FRAC = float(sys.argv[2]) if len(sys.argv) > 2 else 0.20
SALT_N = 32
REPS = 2


def result_hash(df) -> int:
    from pyspark.sql import functions as F

    row = (
        df.select(F.xxhash64(*df.columns).alias("h"))
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
    print(f"  {label:34s} {best:7.2f} s", flush=True)
    return best


def main() -> int:
    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.operators.skew import salted_agg, salted_join
    from lms_etl_pipeline_spark.session import get_spark
    from bench import force_eval

    spark = get_spark("skew-stress")
    spark.sparkContext.setLogLevel("ERROR")
    # Force real shuffle joins: the whole point is shuffle distribution.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    hot_rows = int(N * HOT_FRAC)
    fact = (
        spark.range(N)
        .select(
            F.when(F.col("id") < hot_rows, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id"), F.lit(N_KEYS)))
            .alias("k"),
            (F.col("id") % 1000).alias("v"),
        )
        .localCheckpoint()  # freeze the fixture: measure the join, not range()
    )
    dim = (
        spark.range(N_KEYS)
        .select(F.col("id").alias("k"), F.xxhash64("id").alias("attr"))
        .localCheckpoint()
    )

    def plain_join():
        return fact.join(dim, "k").select("k", "v", "attr")

    def salt_join():
        return salted_join(fact, dim, ["k"], n=SALT_N).select("k", "v", "attr")

    def plain_agg():
        return fact.groupBy("k").agg(F.sum("v").alias("s"), F.count("*").alias("n"))

    def salt_agg():
        return salted_agg(
            fact, ["k"], {"s": (F.sum("v"), "sum"), "n": (F.count("*"), "sum")},
            n=SALT_N,
        )

    # Equality first: a fast wrong answer is not a mitigation.
    assert result_hash(plain_join()) == result_hash(salt_join()), "salted_join != join"
    assert result_hash(plain_agg()) == result_hash(salt_agg()), "salted_agg != groupBy"
    print(f"fixture: N={N:,} rows, {N_KEYS:,} keys, hot key = {HOT_FRAC:.0%} of rows")
    print("mitigated results verified equal to unmitigated (hash + count)\n")

    def set_skew(enabled: bool) -> None:
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(enabled).lower())
        # Production defaults (256 MB / factor 5) never fire at demo MBs;
        # same mechanism, thresholds scaled to the fixture.
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m"
        )
        spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
        spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")

    results: dict[str, float] = {}
    set_skew(False)
    results["join, AQE skew-split OFF"] = timed(
        "join, AQE skew-split OFF", plain_join, force_eval
    )
    set_skew(True)
    results["join, AQE skew-split ON"] = timed(
        "join, AQE skew-split ON", plain_join, force_eval
    )
    results["join, salted (n=32)"] = timed(
        "join, salted (n=32)", salt_join, force_eval
    )
    set_skew(False)
    results["groupBy, plain"] = timed("groupBy, plain", plain_agg, force_eval)
    results["groupBy, salted (n=32)"] = timed(
        "groupBy, salted (n=32)", salt_agg, force_eval
    )

    base = results["join, AQE skew-split OFF"]
    print("\n| cell | s | vs straggler baseline |")
    print("|---|---|---|")
    for k, v in results.items():
        print(f"| {k} | {v:.2f} | {v / base:.2f}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
