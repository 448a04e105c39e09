"""Synthesize the HOSTILE-VALUES fixture: real-world dirty data.

Third degenerate axis beside tools/make_sf0.py (zero rows) and
tools/make_sf_one.py (one row): the VALUES are hostile rather than the
cardinality.  Injected, on top of a normal sf0.001 copy:

- ``events.value``: NaN, +Inf, -Inf, 1e308, and -0.0 (every float metric
  column in production eventually carries all five);
- ``documents.text``: empty string, whitespace-only, single token,
  unicode NBSP (U+00A0) / NEL (U+0085) INSIDE tokens (the tokenizer's
  documented ASCII-``\\s`` semantics must hold identically in Spark's
  Java regex and DuckDB's RE2), regex metacharacters, and tabs/newlines
  as separators;
- ``embeddings.embedding``: the all-zero vector (norm 0), an all-NaN
  vector, an all-+Inf vector, and the untouched rest.

TPC-H money columns are deliberately NOT poisoned: they are DOMAIN-GUARDED
— tools/audit_plans.py's units() precondition check rejects a fixture
whose money columns are not <=scale-dp values, by design (wrong-domain
data fails preflight loudly rather than being silently quantized).

Usage:
    python tools/make_sf_hostile.py [out_dir]       (default .scratch/sf_hostile)
    python tools/check_oracle.py .scratch/sf_hostile

tests/test_hostile_fixture.py pins the formerly-failing queries and the
expected sweep tally.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "sf_hostile",
)

NBSP = " "
NEL = ""


def build(
    spark,
    out_dir: str = DEFAULT_OUT,
    src: str = "/root/testdata/sf0.001",
    *,
    text: bool = True,
    metrics: bool = True,
) -> str:
    """``text`` poisons documents.text (edge strings — the differential
    sweep must stay green against these); ``metrics`` poisons events.value
    and embeddings.embedding with non-finite floats (OUT OF DOMAIN by
    declaration — tools/audit_plans.py's finite-metric gate must REJECT
    such a fixture with named columns; both engines rightly refuse
    NaN->DECIMAL mid-query, and the gate turns that crash into a preflight
    message)."""
    from pyspark.sql import functions as F

    for t in "region nation customer supplier part orders lineitem".split():
        spark.read.parquet(f"{src}/{t}.parquet").coalesce(1).write.mode(
            "overwrite"
        ).parquet(f"{out_dir}/{t}.parquet")

    e = spark.read.parquet(f"{src}/events.parquet")
    if metrics:
        v = (
            F.when(F.col("event_id") % 101 == 0, float("nan"))
            .when(F.col("event_id") % 101 == 1, float("inf"))
            .when(F.col("event_id") % 101 == 2, float("-inf"))
            .when(F.col("event_id") % 101 == 3, 1e308)
            .when(F.col("event_id") % 101 == 4, -0.0)
            .otherwise(F.col("value"))
        )
        e = e.withColumn("value", v)
    e.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    d = spark.read.parquet(f"{src}/documents.parquet")
    meta = "x .*+?[]() {} | \\ $ ^"
    tabnl = "tab\tand\nnewline line"
    txt = (
        F.when(F.col("doc_id") % 97 == 0, F.lit(""))
        .when(F.col("doc_id") % 97 == 1, F.lit("   "))
        .when(F.col("doc_id") % 97 == 2, F.lit("one"))
        .when(F.col("doc_id") % 97 == 3, F.lit(f"a{NBSP}b{NEL}c d"))
        .when(F.col("doc_id") % 97 == 4, F.lit(meta))
        .when(F.col("doc_id") % 97 == 5, F.lit(tabnl))
        .otherwise(F.col("text"))
    )
    if text:
        d = d.withColumn("text", txt).withColumn(
            "n_chars", F.length(txt).cast(d.schema["n_chars"].dataType)
        )
    d.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    em = spark.read.parquet(f"{src}/embeddings.parquet")
    if text:
        # the all-ZERO vector is FINITE — a legitimate edge (failed encoder
        # output, padding row) the engine must handle exactly, so it rides
        # the differential axis, not the domain-gated one
        em = em.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 103 == 17,
                F.transform(F.col("embedding"), lambda x: F.lit(0.0).cast("float")),
            ).otherwise(F.col("embedding")),
        )
    if metrics:
        em = em.withColumn(
            "embedding",
            F.when(
                F.col("vec_id") % 103 == 1,
                F.transform(
                    F.col("embedding"), lambda x: F.lit(float("nan")).cast("float")
                ),
            )
            .when(
                F.col("vec_id") % 103 == 2,
                F.transform(
                    F.col("embedding"), lambda x: F.lit(float("inf")).cast("float")
                ),
            )
            .otherwise(F.col("embedding")),
        )
    em.coalesce(1).write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")
    return out_dir


def main() -> int:
    from lms_etl_pipeline_spark.session import get_spark

    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    spark = get_spark("make-sf-hostile")
    spark.sparkContext.setLogLevel("ERROR")
    build(spark, out)
    print(f"hostile fixture written to {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
