"""Physical-plan regression tests: the 100 TB posture, asserted.

Correctness tests prove the right ANSWER; these prove the right PLAN —
pushdown reaching the parquet scan, dimensions broadcasting, partial
aggregation, top-k never global-sorting.  A regression here is invisible
at sf0.01 and fatal at 100 TB, which is exactly why it's pinned in CI.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.conftest import SF_SMOKE

QUERIES = entrymod.queries()


def _spark_plan(df) -> str:
    # pre-AQE physical plan: join/scan choices are visible and stable
    return df._jdf.queryExecution().sparkPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def plans(spark):
    return {
        name: _spark_plan(QUERIES[name](spark, SF_SMOKE))
        for name in (
            "flagship_regional_revenue",
            "filter_project_casts",
            "q1_pricing_summary",
            "sort_topk_orders",
            "window_topk_per_group",
            "join_broadcast_dim_agg",
            "join_nonequi_range",
            "near_dup_pairs_lsh",
        )
    }


def test_filters_push_into_parquet_scan(plans):
    # date predicates must reach the scan, not evaluate post-read
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plans["filter_project_casts"].replace(
        "\n", " "
    ) or "LessThan(l_shipdate" in plans["filter_project_casts"]
    assert "PushedFilters" in plans["q1_pricing_summary"]
    assert "LessThanOrEqual(l_shipdate" in plans["q1_pricing_summary"]


def test_column_pruning_reaches_scan(plans):
    # Q1 reads 7 of 16 lineitem columns; the scan schema must not contain
    # the unused comment/address-ish columns
    scan_lines = [l for l in plans["q1_pricing_summary"].splitlines() if "ReadSchema" in l]
    assert scan_lines, "no ReadSchema in plan"
    assert "l_orderkey" not in scan_lines[0]  # unused by Q1
    assert "l_quantity" in scan_lines[0]


def test_dimension_joins_broadcast(plans):
    # customer/nation/region sides must be BroadcastHashJoin, and the
    # fact-fact join must NOT broadcast the big side at scale (it may at
    # sf0.001 — so assert presence of broadcasts, not absence of shuffle)
    assert plans["flagship_regional_revenue"].count("BroadcastHashJoin") >= 3
    assert "BroadcastHashJoin" in plans["join_broadcast_dim_agg"]


def test_nonequi_join_stays_hash_not_nested_loop(plans):
    p = plans["join_nonequi_range"]
    assert "BroadcastHashJoin" in p or "SortMergeJoin" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_partial_aggregation_before_shuffle(plans):
    # partial+final hash agg: two HashAggregate nodes around the exchange
    assert plans["q1_pricing_summary"].count("HashAggregate") >= 2


def test_topk_is_take_ordered_not_global_sort(plans):
    assert "TakeOrderedAndProject" in plans["sort_topk_orders"]


def test_window_topk_uses_group_limit(plans):
    # Spark 3.5+/4.x rewrites rank<=k filters into WindowGroupLimit:
    # per-partition top-k heaps instead of full group sorts
    assert "WindowGroupLimit" in plans["window_topk_per_group"]


def test_lsh_self_join_is_equi(plans):
    p = plans["near_dup_pairs_lsh"]
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_codegen_covers_relational_core(spark):
    df = QUERIES["q1_pricing_summary"](spark, SF_SMOKE)
    df.collect()  # AQE finalizes (and codegen-stages) THIS plan at execution
    executed = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed
    # '*(n)' node prefixes mark whole-stage-codegen spans in simpleString
    import re

    assert re.search(r"\*\(\d+\)\s*HashAggregate", executed)


def test_runtime_bloom_filter_injected(spark):
    """Runtime row-level filtering: a selective filter on the orders side
    of a shuffle join should inject a bloom filter onto the lineitem scan
    side (rows that can't join are dropped before the shuffle).  At 100 TB
    this is the difference between shuffling the full fact table and
    shuffling the ~matching slice."""
    from pyspark.sql import functions as F

    from lms_etl_pipeline_spark.sources.tables import load_table

    def _get(k):
        try:
            return spark.conf.get(k)
        except Exception:  # noqa: BLE001 - unset conf
            return None

    keys = (
        "spark.sql.optimizer.runtime.bloomFilter.enabled",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
        # default 10GB: tiny fixture scans would never qualify without this
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        "spark.sql.autoBroadcastJoinThreshold",
    )
    saved = {k: _get(k) for k in keys}
    try:
        spark.conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "100MB"
        )
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        # force a shuffle join so the runtime filter (not a broadcast) applies
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        o = load_table(spark, SF_SMOKE, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        li = load_table(spark, SF_SMOKE, "lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = _optimized(joined).lower()
        assert "bloom" in plan or "might_contain" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_strategy_hints_respected(spark):
    """Join-strategy hints: the physical strategy is controllable per-join
    when the optimizer's default is wrong for a known workload (the
    cluster-tuning escape hatch)."""
    from lms_etl_pipeline_spark.sources.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders")
    c = load_table(spark, SF_SMOKE, "customer")
    merged = _spark_plan(o.join(c.hint("merge"), o.o_custkey == c.c_custkey))
    assert "SortMergeJoin" in merged
    hashed = _spark_plan(o.join(c.hint("shuffle_hash"), o.o_custkey == c.c_custkey))
    assert "ShuffledHashJoin" in hashed
    bcast = _spark_plan(o.join(c.hint("broadcast"), o.o_custkey == c.c_custkey))
    assert "BroadcastHashJoin" in bcast


def test_repartition_by_range_plans_range_partitioning(spark):
    """repartitionByRange: the ordered-layout writer's partitioner (range
    partitioning + in-partition sort = globally ordered files, selective
    min/max stats)."""
    from lms_etl_pipeline_spark.sources.tables import load_table

    o = load_table(spark, SF_SMOKE, "orders").repartitionByRange(8, "o_orderdate")
    assert "rangepartitioning" in _spark_plan(o).lower()


def test_keyless_range_join_is_equi_on_bins_not_nested_loop(spark):
    from lms_etl_pipeline_spark.plans.relational_deep import range_join_binned
    from tests.conftest import SF_SMOKE

    df = range_join_binned(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().sparkPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan, (
        "keyless range join must not fall back to a nested loop"
    )
    assert "bin" in plan and ("SortMergeJoin" in plan or "ShuffledHashJoin" in plan
                              or "BroadcastHashJoin" in plan)
