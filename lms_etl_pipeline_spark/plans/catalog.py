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
    # Round-10 rotation — RE-CERT ECONOMY (policy recorded in round 8):
    # slots after the two smoke anchors go to
    #   (1) FRESH DEBT: bpe_train_merges_deep (round-10 addition, never
    #       certified);
    #   (2) CHANGED since last driver-green: pinball_loss_eval (r10
    #       DECIMAL(38,0) widening closes the int64-wrap hazard) and the
    #       three iterative-operator consumers (dedup_clusters,
    #       kmeans_lloyd, pagerank_graph) whose loop internals gained the
    #       release()/cut_lineage discipline — behavior-identical in the
    #       driver's local session, re-certified out of caution;
    #       kmeans_lloyd ADDITIONALLY re-planned late in r10 (fuzz seed
    #       37: float32->decimal cast class — exact-integer centroid
    #       quantization, unrounded bit-identical distances);
    #   (3) LONGEST-STALE certificates from the r1-r9 artifacts, oldest
    #       last-green round first, name-ordered within a round so the
    #       selection is reproducible from the artifacts alone (r3 greens,
    #       then r4).
    # Invariants (unchanged since r5): the two smoke anchors stay
    # in-window every round; rotated-out queries remain covered by the
    # full-catalog local gate (tools/check_oracle.py) which the driver
    # check is a same-engine, same-fixture subset of; all 50 are
    # exact-oracle-backed.  tests/test_catalog.py re-derives this window
    # from the policy and the r1-r9 artifacts, so drift fails CI.
    "flagship_regional_revenue",
    "events_session_window",
    "bpe_train_merges_deep",
    "quality_classifier_train",
    "quality_classifier_predict",
    "eval_pass_at_k",
    "pinball_loss_eval",
    "dedup_clusters",
    "kmeans_lloyd",
    "pagerank_graph",
    # longest-stale re-certs (mechanical derivation)
    "dataset_split_assign",
    "dedup_embedding_cosine",
    "dedup_exact_text",
    "doc_chunk_sliding",
    "domain_mixture_sampling",
    "etl_flatten_json_props",
    "events_funnel_conversion",
    "events_sliding_window",
    "events_tumbling_window",
    "join_asof_last_click",
    "knn_cosine_exact",
    "multimodal_frame_sample",
    "ngram_jaccard_pairs",
    "q12_shipmode_priority",
    "q8_market_share",
    "subquery_correlated",
    "text_language_id",
    "text_token_stats",
    "tfidf_cosine_pairs",
    "udtf_sentence_split",
    "window_row_number_rank",
    "agg_salted_skew",
    "applyinpandas_group_rank",
    "bm25_retrieval_topk",
    "cooccurrence_pmi",
    "corpus_shuffle_deterministic",
    "decontaminate_ngram_overlap",
    "doc_quality_filter",
    "embedding_int8_quantize",
    "etl_align_to_schema",
    "etl_pack_custom_fields",
    "etl_users_pipeline_shape",
    "events_rolling_anomaly",
    "events_type_pivot",
    "filter_project_casts",
    "gopher_quality_rules",
    "hybrid_retrieval_rrf",
    "incremental_corpus_dedup",
    "join_anti",
    "k_anonymity_profile",
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
