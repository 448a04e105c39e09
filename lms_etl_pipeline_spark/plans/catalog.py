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
    # Round-11 rotation — RE-CERT ECONOMY (policy recorded in round 8):
    # slots after the two smoke anchors go to
    #   (1) CHANGED since last driver row: quality_classifier_train (the
    #       r10 red row — loss output re-emitted as two BIGINT limbs, no
    #       decimal-class column; MUST be re-presented) and
    #       quality_classifier_predict (now scores a freshly derived
    #       feature plan instead of pinning the training cache);
    #   (2) ROWS-ONLY DEBT (VERDICT r10 next-round #5): the ten genuinely
    #       non-SQL-expressible queries have never had a green driver row
    #       (two err'd no_oracle in r02, none re-presented since) — the
    #       driver's rows-only check is free validation of their anchor
    #       chains, so all ten get their first window this round,
    #       name-ordered;
    #   (3) LONGEST-STALE certificates from the r1-r10 artifacts, oldest
    #       last-green round first, name-ordered within a round so the
    #       selection is reproducible from the artifacts alone.
    # Invariants (unchanged since r5): the two smoke anchors stay
    # in-window every round; rotated-out queries remain covered by the
    # full-catalog local gate (tools/check_oracle.py) which the driver
    # check is a same-engine, same-fixture subset of; every windowed query
    # is exact-oracle-backed EXCEPT the ten explicitly-named rows-only
    # entries (each chained to a named driver-green exact anchor in
    # tools/cert_ledger.py).  tests/test_catalog.py re-derives this window
    # from the policy and the r1-r10 artifacts, so drift fails CI.
    "flagship_regional_revenue",
    "events_session_window",
    "quality_classifier_train",
    "quality_classifier_predict",
    # fresh debt: the round-11 real-codec certificates, the exact
    # radix-selection quantile, and the DSIR importance-selection pair
    # (all exact oracles)
    "multimodal_wav_decode_real",
    "multimodal_ppm_decode_real",
    "multimodal_y4m_frames_real",
    "join_bucketed_colocated",
    "quantile_exact_selection",
    "dsir_hashed_ngram_model",
    "dsir_importance_selection",
    "dup_span_removal",
    "bpe_encode_corpus",
    # rows-only debt (first driver window for each)
    "agg_approx_count_distinct",
    "agg_approx_percentiles",
    "dedup_simhash",
    "knn_cosine_ivf",
    "knn_cosine_lsh",
    "knn_mllib_brp",
    "near_dup_pairs_mllib",
    "sample_fraction",
    "sample_stratified_by_priority",
    "sketch_hll_partial_merge",
    # longest-stale re-certs (mechanical derivation)
    "lang_id_confusion",
    "lateral_topk",
    "multimodal_image_decode",
    "multimodal_join_features",
    "orc_roundtrip_orders",
    "pandas_udaf_geomean",
    "quality_ranker_auc",
    "range_join_binned",
    "scalar_json_funcs",
    "semdedup_embedding",
    "semdedup_kmeans",
    "set_except",
    "split_leakage_safe",
    "timeseries_interpolate_linear",
    "tokenize_to_vocab_ids",
    "weighted_sample_es",
    "window_time_rolling",
    "window_topk_per_group",
    "agg_incremental_merge",
    "ann_recall_eval",
    "bpe_pair_merges",
    "cogroup_pandas_asof",
    "corpus_datasheet",
    "corpus_pack_sequences",
    "countmin_heavy_hitters",
    "curated_corpus_partitioned_write",
    "dataset_mix_allocation",
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
