"""Physical-plan audit across the whole query catalog.

Flags the plan shapes that are fine at sf0.01 and fatal at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin (unless the query is an
  intentional bounded cross join, declared in ALLOW_CROSS)
- for every ALLOW_CROSS query, the boundedness claim is MACHINE-CHECKED:
  the query is executed and each cartesian/nested-loop join's small side
  (BroadcastExchange output rows, or the smaller child for a true
  CartesianProduct) must be <= the declared row bound.  Deliberately
  unbounding one side therefore fails preflight, not just the comment.

Usage: python tools/audit_plans.py [sf_dir]
Exit 1 if any unallowed red flag is found or any declared bound is exceeded.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

# Queries whose cross join is the algorithm.  Value = the DECLARED upper
# bound on the rows of every cartesian/nested-loop small side in the plan,
# derived from the algorithm (a 1-row scalar broadcast, a k-row centroid
# table, an n-query probe set, a fixed id-range anchor) — NOT fitted to a
# fixture.  Bounds are SF-independent: each small side is a constant-size
# artifact of the query, which is exactly the claim being checked.
ALLOW_CROSS: dict[str, int] = {
    "knn_cosine_exact": 8,       # 5-row query set x corpus: linear scan
    "knn_filtered_exact": 8,     # same shape over the metadata-filtered corpus
    "dedup_embedding_cosine": 512,  # bounded id-range all-pairs oracle anchor
    "tf_idf_top_terms": 4,       # 1-row corpus-count broadcast
    "contrastive_triplets": 4,   # 1-row corpus-size broadcast (negative sampling bound)
    "text_token_stats": 4,       # same corpus-count pattern via tx.tf_idf
    "tfidf_cosine_pairs": 4,     # same 1-row corpus-count broadcast via tx.tf_idf
    "q11_important_values": 4,   # 1-row global-threshold broadcast (scalar subquery)
    "q22_dormant_balances": 4,   # 1-row global-average broadcast (scalar subquery)
    "domain_mixture_sampling": 4,  # 1-row min-domain-count broadcast
    "lsh_recall_eval": 4,        # 1-row count x 1-row count broadcast (recall ratio)
    "bm25_retrieval_topk": 4,    # 1-row corpus-stats (N, avgdl) broadcast
    "kmeans_lloyd": 16,          # k-row (k=8) centroid broadcast x linear scan
    "pagerank_graph": 4,         # 1-row node-count broadcast per iteration
    "hybrid_retrieval_rrf": 8,   # 3-row query-set broadcast x linear scan (dense leg)
    "cooccurrence_pmi": 4,       # 1-row corpus-totals broadcast
    "ann_recall_eval": 32,       # 20-row query-set broadcast x linear scan (exact leg)
    "corpus_datasheet": 4,       # 1-row corpus-totals broadcast
    "semdedup_kmeans": 16,       # k-row centroid broadcast via the kmeans trainer
    "psi_drift_report": 4,       # 1-row population-totals broadcast
    "triangle_count_cooccur": 4,  # 1-row x 1-row x 1-row stat-combine broadcast
    "assoc_rules_confidence": 4,  # 1-row distinct-user-count broadcast (lift denominator)
    "pca_power_iteration": 4,    # 1-row norm broadcast per unrolled iteration
    "rfm_segmentation": 4,       # 1-row anchor-date (max order date) broadcast
    "key_skew_profile": 4,       # 1-row totals (row count, n_keys) broadcast
    "hits_hubs_authorities": 4,  # 1-row L1-normalizer broadcast per iteration
    "cusum_changepoints": 4,     # 1-row (mu, sigma) broadcast onto the hourly series
    "benford_digit_test": 4,     # 1-row digit-count total broadcast
    "watermark_loss_curve": 4,   # 1-row event-total broadcast (drop-rate denominator)
    "gdpr_erasure_cascade": 8,   # small cohort broadcast onto 1-row per-table counts
    "knn_dot_product_mips": 8,   # 5-row query-set broadcast x linear scan
    "embedding_pairwise_stats": 512,  # bounded 200-row id-range all-pairs anchor
    "semdedup_threshold_sweep": 512,  # same bounded pair anchor + 1-row total broadcast
    "survival_kaplan_meier": 4,  # 1-row horizon + 1-row population-total broadcasts
    "model_gains_table": 4,      # 1-row (total_pos, total_n) broadcast
    "ks_test_drift": 4,          # 1-row sample-size broadcast onto the value-domain CDF
    "cramers_v_association": 4,  # 1-row N broadcast onto the bounded contingency table
    "period_delta_contribution": 4,  # 1-row first-year + 1-row total-delta broadcasts
    "attribution_window_sensitivity": 4,  # 1-row purchase-total broadcast
    "retrieval_mrr_ndcg": 16,    # 10-row query-set broadcast x linear scan
    "scd2_snapshot_asof": 4,     # 1-row as-of-instant broadcast onto the history
    "llr_collocations": 4,       # 1-row bigram-total broadcast (contingency denominator)
    "sax_symbolization": 4,      # 1-row calendar-origin broadcast (frame index base)
    "pinball_loss_eval": 4,      # 1-row calendar-origin broadcast (train/test split base)
    "matryoshka_truncation_eval": 16,  # 10-row query-set broadcast x linear scan
    "price_volume_mix_decomposition": 4,  # 1-row first-year broadcast (period anchor)
    "wasserstein_drift_1d": 4,   # 1-row population-totals broadcast (CDF denominators)
    "ab_quantile_treatment_effect": 4,  # 1-row x 1-row per-arm quantile combine
    "diff_in_differences": 8,    # 1-row midpoint broadcast + 4x 1-row cell combine
    "stump_split_gain": 4,       # 1-row class-totals broadcast onto the value-domain CDF
    "weekday_hour_heatmap": 4,   # 1-row traffic-total broadcast onto <=168 cells
}

_JOIN_NODES = ("CartesianProductExec", "BroadcastNestedLoopJoinExec")


def _children(node) -> list:
    """Real children of an executed-plan node, descending through the
    adaptive / query-stage / reused wrappers that hide subtrees."""
    cls = node.getClass().getSimpleName()
    if cls == "AdaptiveSparkPlanExec":
        return [node.executedPlan()]
    if cls.endswith("QueryStageExec"):
        return [node.plan()]
    if cls == "ReusedExchangeExec":
        return [node.child()]
    cs = node.children()
    return [cs.apply(i) for i in range(cs.length())]


def _num_output_rows(node) -> int | None:
    """First numOutputRows metric found in this subtree (pre-order)."""
    mets = node.metrics()
    if mets.contains("numOutputRows"):
        return int(mets.apply("numOutputRows").value())
    for c in _children(node):
        v = _num_output_rows(c)
        if v is not None:
            return v
    return None


def _small_side_rows(node) -> list[tuple[str, int]]:
    """(node name, small-side rows) for every cartesian / nested-loop join
    in the executed plan.  For BNLJ the small side is the broadcast child;
    for a true CartesianProduct it is the smaller child."""
    out: list[tuple[str, int]] = []
    cls = node.getClass().getSimpleName()
    if cls in _JOIN_NODES:
        sides = []
        for c in _children(node):
            rows = _num_output_rows(c)
            if rows is not None:
                sides.append(rows)
        if sides:
            out.append((cls, min(sides)))
        else:  # metrics absent: treat as unbounded -> caller fails loudly
            out.append((cls, 1 << 62))
    for c in _children(node):
        out.extend(_small_side_rows(c))
    return out


def check_bounds(spark, entrymod, sf_dir: str) -> list[str]:
    """Execute every ALLOW_CROSS query and verify each declared bound."""
    failures: list[str] = []
    queries = entrymod.queries()
    for name, bound in sorted(ALLOW_CROSS.items()):
        fn = queries.get(name)
        if fn is None:
            failures.append(f"{name}: in ALLOW_CROSS but not registered")
            continue
        try:
            df = fn(spark, sf_dir)
            # collect() (not a write/count wrapper) so the metrics land on
            # THIS DataFrame's queryExecution — a writer or count() builds
            # a separate execution whose metrics we couldn't traverse.
            # Every ALLOW_CROSS query is report-sized by construction.
            df.collect()
            plan = df._jdf.queryExecution().executedPlan()
            sides = _small_side_rows(plan)
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: BOUND CHECK FAILED {type(exc).__name__}: {exc}")
            continue
        if not sides:
            # The allowlisted cross join optimized away at this SF — fine
            # for the shape audit, but there is nothing to measure.
            print(f"  bound {'n/a':10s} {name}: no cross/NL join in executed plan")
            continue
        worst = max(r for _, r in sides)
        status = "ok" if worst <= bound else "OVER BOUND"
        print(f"  bound {status:10s} {name}: worst small side {worst} <= {bound}"
              f" ({len(sides)} cross/NL joins)")
        if worst > bound:
            failures.append(
                f"{name}: cross-join small side {worst} rows exceeds the "
                f"declared bound {bound} — the boundedness claim is false"
            )
    return failures


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from lms_etl_pipeline_spark.session import get_spark

    spark = get_spark("plan-audit")
    spark.sparkContext.setLogLevel("ERROR")

    failures: list[str] = []
    for name, fn in sorted(entrymod.queries().items()):
        try:
            df = fn(spark, sf_dir)
            plan = df._jdf.queryExecution().sparkPlan().toString()
        except Exception as exc:  # noqa: BLE001
            failures.append(f"{name}: PLAN FAILED {type(exc).__name__}: {exc}")
            continue
        flags: list[str] = []
        if "CartesianProduct" in plan and name not in ALLOW_CROSS:
            flags.append("CartesianProduct")
        if "BroadcastNestedLoopJoin" in plan and name not in ALLOW_CROSS:
            flags.append("BroadcastNestedLoopJoin")
        status = "⚠ " + ",".join(flags) if flags else "ok"
        print(f"  {status:28s} {name}")
        if flags:
            failures.append(f"{name}: {flags}")

    print("\n== ALLOW_CROSS declared-bound verification ==")
    failures.extend(check_bounds(spark, entrymod, sf_dir))

    if failures:
        print("\nRED FLAGS:")
        for f in failures:
            print(" -", f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
