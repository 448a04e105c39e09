"""Semantic tests for plans/data_selection.py (DSIR importance selection).

Value-level cross-engine equality is covered by tools/check_oracle.py; these
pin the *semantics* the selector promises (invariants that would survive an
oracle that was wrong in the same way as the engine).
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from lms_etl_pipeline_spark.plans.data_selection import (
    _DSIR_B,
    _DSIR_TOPK,
    _feature_buckets,
    dsir_hashed_ngram_model,
    dsir_importance_selection,
)
from lms_etl_pipeline_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_model_is_bucket_bounded_and_counts_are_consistent(spark):
    rows = dsir_hashed_ngram_model(spark, SF_SMOKE).collect()
    # the model is vocabulary-bounded: never more rows than buckets
    assert 0 < len(rows) <= _DSIR_B
    assert len({r.bucket for r in rows}) == len(rows)
    for r in rows:
        assert 0 <= r.bucket < _DSIR_B
        # the target subset's occurrences are a subset of the pool's
        assert 0 <= r.n_target <= r.n_source
        assert math.isfinite(r.log_ratio)
    # total feature occurrences reconcile with an independent count of the
    # exploded feature stream
    fb = _feature_buckets(spark, SF_SMOKE)
    assert sum(r.n_source for r in rows) == fb.count()
    assert sum(r.n_target for r in rows) == fb.filter("is_t").count()


def test_feature_stream_is_unigrams_plus_bigrams(spark):
    # a doc with T >= 2 whitespace tokens contributes exactly 2T-1 features
    d = load_table(spark, SF_SMOKE, "documents")
    t_counts = {
        r.doc_id: r.t
        for r in d.select(
            "doc_id",
            F.size(F.filter(F.split("text", r"\s+"), lambda x: x != F.lit(""))).alias(
                "t"
            ),
        ).collect()
    }
    fb_counts = {
        r.doc_id: r.c
        for r in _feature_buckets(spark, SF_SMOKE)
        .groupBy("doc_id")
        .agg(F.count("*").alias("c"))
        .collect()
    }
    for doc_id, t in t_counts.items():
        expect = 2 * t - 1 if t >= 2 else t
        assert fb_counts.get(doc_id, 0) == expect, doc_id


def test_selection_prefers_target_language_docs(spark):
    """The whole point of DSIR: selecting by log p_target - log p_raw must
    tilt the selected set toward the target distribution (English docs)
    relative to the base rate of the pool."""
    sel = dsir_importance_selection(spark, SF_SMOKE)
    rows = sel.collect()
    assert len(rows) == _DSIR_TOPK
    assert len({r.doc_id for r in rows}) == _DSIR_TOPK
    # weights emitted are finite doubles, descending by construction
    assert all(math.isfinite(r.dsir_logweight) for r in rows)
    d = load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", (F.col("lang") == "en").alias("is_en")
    )
    en = {r.doc_id for r in d.filter("is_en").collect()}
    base_rate = len(en) / d.count()
    sel_rate = sum(1 for r in rows if r.doc_id in en) / len(rows)
    assert sel_rate > base_rate, (sel_rate, base_rate)
    # and the top of the ranking should be essentially all-target
    top8 = [
        r.doc_id
        for r in sorted(rows, key=lambda r: (-r.dsir_logweight, r.doc_id))[:8]
    ]
    assert sum(1 for i in top8 if i in en) >= 6


def test_selection_is_deterministic_across_partitionings(spark):
    """Exact DECIMAL weight sums make the top-k boundary partitioning-
    independent: re-running under a different shuffle width must select the
    identical set with identical emitted weights."""
    a = {(r.doc_id, r.dsir_logweight) for r in dsir_importance_selection(spark, SF_SMOKE).collect()}
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "7")
        b = {(r.doc_id, r.dsir_logweight) for r in dsir_importance_selection(spark, SF_SMOKE).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    assert a == b
