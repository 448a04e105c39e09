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
    # Round-4 rotation: the Spark-4.1 NTZ-regression trio (fixed this round)
    # enters for driver-visible certification of that regression class; five
    # locally-certified queries get their first driver rows
    # (agg_percentiles_exact, lateral_topk, split_leakage_safe,
    # tokenize_to_vocab_ids, quality_ranker_auc); and the six operators NEW
    # this round (corpus_shuffle_deterministic, bm25_retrieval_topk,
    # semdedup_embedding, kmeans_lloyd, pagerank_graph, orc_roundtrip_orders)
    # are driver-certified in their first round, as are the five late-round
    # additions (hybrid_retrieval_rrf, cooccurrence_pmi,
    # incremental_corpus_dedup, gopher_quality_rules,
    # k_anonymity_profile).  Nineteen multi-certified
    # entries yield their slots (q3/q8/q12, window_row_number_rank,
    # events_sliding_window, events_tumbling_window, tfidf_cosine_pairs,
    # multimodal_frame_sample, etl_flatten_json_props, text_token_stats,
    # tf_idf_top_terms, minhash_signatures, dedup_exact_text,
    # udtf_sentence_split) — all remain in the catalog and the local
    # full-catalog gate; every operator family stays represented.
    #
    # relational / TPC-H composite shapes
    "flagship_regional_revenue",
    "q1_pricing_summary",
    "filter_project_casts",
    "agg_percentiles_exact",
    "set_except",
    "join_anti",
    "lateral_topk",
    "range_join_binned",
    "weighted_sample_es",
    # window functions (incl. the fixed NTZ trio)
    "window_topk_per_group",
    "window_time_rolling",
    "decontaminate_ngram_overlap",
    # streaming-shaped windows + event analytics
    "events_session_window",
    "corpus_shuffle_deterministic",
    "events_type_pivot",
    "events_rolling_anomaly",
    "timeseries_interpolate_linear",
    # text analysis + LLM-training-data ops
    "doc_quality_filter",
    "split_leakage_safe",
    "gopher_quality_rules",
    "tokenize_to_vocab_ids",
    "quality_ranker_auc",
    "bm25_retrieval_topk",
    "hybrid_retrieval_rrf",
    "cooccurrence_pmi",
    "countmin_heavy_hitters",
    "lang_id_confusion",
    # deduplication (ngram_jaccard_pairs = lossless prefix-filtered set join;
    # agg_salted_skew = skew-path aggregation proven ≡ plain GROUP BY)
    "near_dup_pairs_lsh",
    "dedup_clusters",
    "corpus_curation_pipeline",
    "agg_salted_skew",
    "incremental_corpus_dedup",
    # similarity search / embeddings
    "semdedup_embedding",
    "kmeans_lloyd",
    "embedding_int8_quantize",
    "ann_recall_eval",
    "semdedup_kmeans",
    "pagerank_graph",
    # scalar function families past last round's cut
    "scalar_json_funcs",
    # Python compute surface (UDTF / grouped-agg / grouped-map)
    "pandas_udaf_geomean",
    "applyinpandas_group_rank",
    # multimodal plumbing
    "multimodal_image_decode",
    "multimodal_join_features",
    # reference ETL parity chain
    "etl_pack_custom_fields",
    "etl_align_to_schema",
    "etl_users_pipeline_shape",
    "k_anonymity_profile",
    "psi_drift_report",
    "corpus_datasheet",
    # sources / sinks (CSV snapshot + ORC round trips)
    "orc_roundtrip_orders",
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
