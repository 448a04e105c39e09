"""Fourth-decade scaling measurement for the heaviest headline plans.

The sf0.001→sf0.1 range in SCALING.md is fixed-cost-dominated on this
box (slopes ≤0.5), which makes the sublinearity claim easy; this tool
adds one more decade for the five most expensive plans by synthesizing a
~sf1 fixture (10× sf0.1) for exactly the tables those plans read:

- ``lineitem``  — 10 key-shifted copies (q1's scan-bound aggregate);
- ``documents`` — 10 doc_id-shifted copies, each copy's text tagged with
  a distinct trailing token so duplicate GROUPS stay within-copy and the
  pair count scales linearly (identical copies would make the near-dup
  pair count grow quadratically BY DATA SEMANTICS and contaminate the
  plan-scaling measurement);
- ``embeddings`` — 10 vec_id-shifted copies (query/anchor id ranges are
  below the shift, so probe sets stay fixed while the corpus scales).

The fixture lives under ``.scratch/sf1`` (gitignored, rebuilt on
demand); timings follow bench.py discipline (full-column hash-sum sink,
min-of-REPS).  Output: a Markdown section for SCALING.md.

Usage: python tools/scaling_extend.py [--rebuild]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BASE = "/root/testdata/sf0.1"
BIG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "sf1")
COPIES = 10
REPS = 2
SLOPE_RED_FLAG = 1.3

HEAVY = (
    "q1_pricing_summary",
    "tf_idf_top_terms",
    "near_dup_pairs_lsh",
    "dedup_embedding_cosine",
    "corpus_curation_pipeline",
)


def build_fixture(spark) -> None:
    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.sources.tables import load_table

    os.makedirs(BIG, exist_ok=True)
    copies = F.explode(F.sequence(F.lit(0), F.lit(COPIES - 1))).alias("_c")

    li = load_table(spark, BASE, "lineitem")
    shift = li.agg(F.max("l_orderkey")).collect()[0][0] + 1
    (
        li.select("*", copies)
        .withColumn("l_orderkey", F.col("l_orderkey") + F.col("_c") * shift)
        .drop("_c")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(BIG, "lineitem.parquet"))
    )

    d = load_table(spark, BASE, "documents")
    dshift = d.agg(F.max("doc_id")).collect()[0][0] + 1
    (
        d.select("*", copies)
        .withColumn("doc_id", F.col("doc_id") + F.col("_c") * dshift)
        # distinct per-copy tag token keeps dup groups within-copy
        .withColumn(
            "text",
            F.when(F.col("_c") == 0, F.col("text")).otherwise(
                F.concat(F.col("text"), F.lit(" copytag"), F.col("_c"))
            ),
        )
        .drop("_c")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(BIG, "documents.parquet"))
    )

    e = load_table(spark, BASE, "embeddings")
    eshift = e.agg(F.max("vec_id")).collect()[0][0] + 1
    (
        e.select("*", copies)
        .withColumn("vec_id", F.col("vec_id") + F.col("_c") * eshift)
        .drop("_c")
        .repartition(32)
        .write.mode("overwrite")
        .parquet(os.path.join(BIG, "embeddings.parquet"))
    )


def main() -> int:
    import __spark_entry__ as entrymod
    from bench import force_eval
    from lms_etl_pipeline_spark.session import get_spark

    spark = get_spark("scaling-extend")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    if "--rebuild" in sys.argv or not os.path.isdir(
        os.path.join(BIG, "documents.parquet")
    ):
        print("building ~sf1 fixture ...", flush=True)
        build_fixture(spark)

    scales = [("/root/testdata/sf0.01", 0.01), (BASE, 0.1), (BIG, 1.0)]
    # Warm JVM + parquet footers at every scale.
    for sf_dir, _ in scales:
        force_eval(qs["q1_pricing_summary"](spark, sf_dir))

    print("| query | sf0.01 s | sf0.1 s | ~sf1 s | slope (0.1→1) |")
    print("|---|---|---|---|---|")
    worst = 0.0
    for name in HEAVY:
        times = []
        for sf_dir, _ in scales:
            best = math.inf
            for _ in range(REPS):
                t0 = time.perf_counter()
                force_eval(qs[name](spark, sf_dir))
                best = min(best, time.perf_counter() - t0)
            times.append(best)
        top = math.log10(times[2] / times[1])
        worst = max(worst, top)
        print(
            f"| {name} | {times[0]:.2f} | {times[1]:.2f} | {times[2]:.2f} "
            f"| {top:.2f} |"
        )
    print(f"\nworst top-decade slope: {worst:.2f} (red flag at {SLOPE_RED_FLAG})")
    return 1 if worst >= SLOPE_RED_FLAG else 0


if __name__ == "__main__":
    raise SystemExit(main())
