"""Query registry.

Every operator the engine claims (SURVEY.md §2) registers here as a named
plan builder ``(spark, sf_dir) -> DataFrame`` plus, when SQL-expressible, an
ANSI-SQL oracle string the DuckDB differential harness runs on the same
parquet fixtures. Column names/aliases MUST match between the two — the
driver's comparator sorts columns by name before hashing values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}

# The driver's differential-correctness budget covers the FIRST 50 entries of
# ``queries()`` in iteration order.  Registration order is import order, which
# front-loads one family and starves the rest; this explicit priority list
# curates the first 50 to span every operator family (relational/TPC-H,
# windows, streaming, text/dedup/ANN, Python compute surface, multimodal,
# ETL parity, sources, scalar).  Everything not listed follows in
# registration order, so the full catalog is still exposed.
_PRIORITY: tuple[str, ...] = (
    # Round-9 rotation — RE-CERT ECONOMY (the policy recorded in round 8,
    # commit 3bdbbec): never-certified debt hit ZERO in r8, so every slot
    # after the two smoke anchors now re-certifies, prioritized by
    #   (1) PLAN CHANGED since the query's last driver-green row:
    #       r8 re-plans that missed the r8 window — q9 (signed hi/lo
    #       rounding), fifo_returns_allocation, corpus_curation_pipeline
    #       (tokenize-once), near_dup_pairs_lsh (shared exchange),
    #       minhash_signatures — plus the r9 NaN-bucket contract change
    #       (operators/rank.py nulls='last'): model_gains_table,
    #       abc_pareto_classification, rfm_segmentation;
    #   (2) LONGEST-STALE certificates, oldest last-green round first
    #       (r02 greens, then r03), name-ordered within a round so the
    #       selection is reproducible from the artifacts alone.
    # Invariants (unchanged since r5): the two smoke anchors stay
    # in-window every round; rotated-out queries remain covered by the
    # full-catalog local gate (tools/check_oracle.py) which the driver
    # check is a same-engine, same-fixture subset of; all 50 are
    # exact-oracle-backed.  tests/test_catalog.py re-derives this window
    # from the policy and the r1-r8 artifacts, so drift fails CI.
    "flagship_regional_revenue",
    "events_session_window",
    # fresh debt (round-9 addition, never certified): fresh-first per the
    # standing slot-economy rule
    "bpe_train_merges",
    "q9_product_profit",
    "fifo_returns_allocation",
    "corpus_curation_pipeline",
    "near_dup_pairs_lsh",
    "minhash_signatures",
    "model_gains_table",
    "abc_pareto_classification",
    "rfm_segmentation",
    # + the r9 fuzz-seed-11 double-round-tie fix (unrounded quotient)
    "timeseries_seasonal_profile",
    "pinball_loss_eval",
    "agg_cube",
    "agg_distinct_counts",
    "agg_grouping_sets",
    "agg_min_max_by",
    "agg_rollup",
    "agg_stats_exact",
    "distinct_projection",
    "events_cohort_retention",
    "explode_outer_arrays",
    "join_broadcast_dim_agg",
    "join_full_outer",
    "join_inner_orders_customer",
    "join_interval_events",
    "join_left_outer_counts",
    "join_nonequi_range",
    "join_null_safe",
    "join_semi",
    "null_handling",
    "q10_returned_items",
    "q14_promo_share",
    "q15_top_supplier",
    "q16_supplier_cnt_excluding",
    "q19_disjunctive_predicates",
    "q2_min_cost_supplier",
    "scalar_array_funcs",
    "scalar_date_funcs",
    "scalar_math_funcs",
    "scalar_string_funcs",
    "scd2_order_status_history",
    "set_intersect",
    "set_union_all",
    "sort_multi_key",
    "sort_topk_orders",
    "timeseries_gap_fill",
    "unpivot_measures",
    "agg_collect_sorted",
    "csv_roundtrip_nation",
)


def _ordered(names: dict[str, object]) -> list[str]:
    """Priority names first (those registered), then the rest in registration order."""
    prioritized = [n for n in _PRIORITY if n in names]
    return prioritized + [n for n in names if n not in set(prioritized)]


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named plan; ``oracle`` is the equivalent DuckDB SQL.

    ``oracle=None`` marks a genuinely non-SQL-expressible operator (approx
    sketches, LSH, stateful streaming); the driver then records a weaker
    rows-only check.
    """

    def register(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle.strip()
        return fn

    return register


def all_queries() -> dict[str, QueryFn]:
    return {n: _QUERIES[n] for n in _ordered(_QUERIES)}


def all_oracles() -> dict[str, str]:
    return {n: _ORACLES[n] for n in _ordered(_ORACLES)}
