"""Training-mix assembly operators (round 5): the curriculum/mixing layer
that sits between a curated corpus and a training run.

Six ops a large-scale LLM-data pipeline runs after curation and before
tokenization — BPE merge-table seeding, per-domain caps, scorer
calibration, curriculum phasing, temperature-scaled mixture weights, and
intra-document dedup.  All are native-DataFrame plans (no UDFs), each with
an exact DuckDB oracle twin; cross-engine float determinism follows the
repo convention (fixed-scale DECIMAL sums, ROUND at a fixed scale on
emitted floats).

Reference parity note: the reference pipeline
(/root/reference/src/lms_to_s3_lambda.py, s3_to_rds_lambda.py) has no
corpus layer at all; these extend the engine along SURVEY.md §2's
"LLM-training-data pipeline" axis the way rounds 2-4 did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.operators import text as tx
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.plans.llm import _TOKS
from lms_etl_pipeline_spark.sources.tables import load_table

_MERGE_TOPK = 32
_DOMAIN_CAP = 20
_CAL_BINS = 10
_PHASES = 4
_MIX_ALPHA = 0.7


@query(
    "bpe_pair_merges",
    oracle=f"""
    WITH t AS (SELECT {_TOKS} AS toks FROM documents),
    pairs AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)),
                                   i -> toks[i] || ' ' || toks[i + 1])) AS pair
      FROM t WHERE LEN(toks) >= 2)
    SELECT pair, COUNT(*) AS n
    FROM pairs GROUP BY pair
    ORDER BY n DESC, pair LIMIT {_MERGE_TOPK}
    """,
)
def bpe_pair_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide adjacent-token-pair frequencies, top-{32}: the first
    merge table a BPE/WordPiece vocabulary induction computes each round
    (the merge loop re-runs this count after every merge; one round is the
    oracle-checkable anchor of that loop).

    Scale: pairing is a zip of two array slices — a map-only projection,
    no join, no explode of the full token stream until AFTER per-doc
    pairing — then one map-side-combining count and a
    TakeOrderedAndProject top-k (never a global sort of all pairs).
    Deterministic tie-break (count desc, pair asc)."""
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens("text")
    base = d.select(toks.alias("_toks")).filter(F.size("_toks") >= 2)
    n = F.size("_toks")
    pairs = F.zip_with(
        F.slice("_toks", 1, n - 1),
        F.slice("_toks", 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return (
        base.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(_MERGE_TOPK)
    )


@query(
    "domain_cap_filter",
    oracle=f"""
    SELECT doc_id, source, rk FROM (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents)
    WHERE rk <= {_DOMAIN_CAP}
    """,
)
def domain_cap_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap: keep at most {20} documents per source,
    ranked by length then doc_id — the anti-domination guard every web
    corpus applies so one crawl host can't swamp the mix (C4/RefinedWeb
    style per-domain limits).

    Scale: one window partitioned BY THE CAP KEY — shuffle on source,
    rank, filter; no global ordering anywhere.  Skewed mega-domains are
    exactly the rows the rank-filter truncates, so the skew self-heals
    after one pass."""
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= _DOMAIN_CAP)
    )


# The fixed-weight logistic quality scorer (shared shape with
# doc_quality_score_logistic — weights are versioned constants).
_CAL_SCORE_SQL = f"""
    SELECT doc_id, n_chars,
           ROUND(1.0 / (1.0 + EXP(-(-1.5 + 0.004 * LEN(toks)
                 + 2.0 * CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks)
                 - 3.0 * CAST(LEN(LIST_FILTER(toks, x -> x IN
                     ('the','a','an','and','of','to','in','is','on')))
                       AS DOUBLE) / LEN(toks)))), 6) AS score
    FROM (SELECT doc_id, n_chars, {_TOKS} AS toks FROM documents)
    WHERE LEN(toks) > 0
"""


@query(
    "score_calibration_bins",
    oracle=f"""
    WITH s AS ({_CAL_SCORE_SQL})
    SELECT CAST(LEAST(FLOOR(score * {_CAL_BINS}), {_CAL_BINS - 1}) AS BIGINT)
               AS bin,
           COUNT(*) AS n,
           ROUND(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_score,
           ROUND(CAST(SUM(CASE WHEN n_chars > 600 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS frac_pos
    FROM s GROUP BY bin
    """,
)
def score_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the quality scorer: bucket predictions into
    {10} bins and compare each bin's mean score against its observed
    positive rate (kept-by-length proxy label) — the calibration table every
    classifier-based corpus filter publishes before its threshold is trusted
    (a well-calibrated bin has mean_score ≈ frac_pos).

    Scale: scoring is a map-only projection; the report is one {10}-group
    hash aggregate with map-side combine.  Mean-of-scores goes through a
    fixed-scale DECIMAL sum (order-independent, repo convention)."""
    d = load_table(spark, sf_dir, "documents")
    base = d.select("doc_id", "n_chars", tx.tokens("text").alias("_toks")).filter(
        F.size("_toks") > 0
    )
    n_tokens = F.size("_toks")
    ttr = F.size(F.array_distinct("_toks")).cast("double") / n_tokens
    stop_ratio = (
        F.size(F.filter("_toks", lambda t: t.isin(*tx.STOPWORDS_EN))).cast("double")
        / n_tokens
    )
    logit = F.lit(-1.5) + 0.004 * n_tokens + 2.0 * ttr - 3.0 * stop_ratio
    scored = base.select(
        "n_chars",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("score"),
    )
    return (
        scored.groupBy(
            F.least(F.floor(F.col("score") * _CAL_BINS), F.lit(_CAL_BINS - 1))
            .cast("long")
            .alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            F.round(
                F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
                / F.count("*"),
                6,
            ).alias("mean_score"),
            F.round(
                F.sum(F.when(F.col("n_chars") > 600, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("frac_pos"),
        )
    )


@query(
    "curriculum_phases",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             ROUND(CAST(n_chars AS DOUBLE) / (LEN({_TOKS}) + 1), 6)
                 AS difficulty
      FROM documents)
    SELECT doc_id, difficulty,
           CAST(NTILE({_PHASES}) OVER (ORDER BY difficulty, doc_id) AS BIGINT)
               AS phase
    FROM t
    """,
)
def curriculum_phases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering: split the corpus into {4} difficulty phases
    (mean-word-length proxy — longer words ≈ harder text), easiest first —
    the phase column a curriculum-learning scheduler feeds from, and the
    oracle-checkable anchor of any staged data schedule.

    Scale: one projection + one NTILE window.  The global ordering is
    single-partition at the window — at 100 TB you run the same plan per
    (domain, shard) with a partitionBy (the token_budget_selection
    precedent); the global form is the exactly-checkable anchor.
    Determinism: the (difficulty, doc_id) order key is unique."""
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        F.round(
            F.col("n_chars").cast("double") / (F.size(tx.tokens("text")) + 1), 6
        ).alias("difficulty"),
    )
    w = Window.orderBy("difficulty", "doc_id")
    return t.select(
        "doc_id", "difficulty", F.ntile(_PHASES).over(w).cast("long").alias("phase")
    )


@query(
    "mixture_temperature_weights",
    oracle=f"""
    WITH l AS (
      SELECT lang, CAST(SUM(LEN({_TOKS})) AS BIGINT) AS n_toks
      FROM documents GROUP BY lang),
    s AS (
      SELECT lang, n_toks,
             ROUND(CAST(n_toks AS DOUBLE)
                   / SUM(n_toks) OVER (), 8) AS share
      FROM l),
    p AS (
      SELECT lang, n_toks, share,
             CAST(ROUND(POWER(share, {_MIX_ALPHA}), 12)
                  AS DECIMAL(28,12)) AS pw
      FROM s)
    SELECT lang, n_toks, ROUND(share, 6) AS share,
           ROUND(CAST(pw AS DOUBLE) / CAST(SUM(pw) OVER () AS DOUBLE), 6)
               AS weight
    FROM p
    """,
)
def mixture_temperature_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled sampling weights per language: w_l ∝ share_l^α
    (α={0.7}), the standard multilingual rebalance (mT5/XLM-R style) that
    upsamples tail languages without letting them dominate.  Emits the
    audit row per language: token count, raw share, final weight.

    Scale: one |langs|-group aggregate over a linear scan, then arithmetic
    on a |langs|-row frame (window-summed — never a driver collect).
    Determinism: pow() outputs rounded to a fixed scale and summed as
    DECIMAL (order-independent), final floats rounded at 6 per repo
    convention."""
    d = load_table(spark, sf_dir, "documents")
    l = d.groupBy("lang").agg(
        F.sum(F.size(tx.tokens("text"))).cast("long").alias("n_toks")
    )
    w_all = Window.partitionBy()
    s = l.select(
        "lang",
        "n_toks",
        F.round(
            F.col("n_toks").cast("double") / F.sum("n_toks").over(w_all), 8
        ).alias("share"),
    )
    p = s.select(
        "lang",
        "n_toks",
        "share",
        F.round(F.pow("share", F.lit(_MIX_ALPHA)), 12)
        .cast("decimal(28,12)")
        .alias("pw"),
    )
    return p.select(
        "lang",
        "n_toks",
        F.round("share", 6).alias("share"),
        F.round(
            F.col("pw").cast("double") / F.sum("pw").over(w_all).cast("double"), 6
        ).alias("weight"),
    )


@query(
    "intra_doc_dedup",
    oracle=r"""
    WITH t AS (
      SELECT doc_id,
             LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\. '), s -> s != '')
                 AS sents
      FROM documents)
    SELECT doc_id,
           CAST(LEN(sents) AS BIGINT) AS n_sents,
           CAST(LEN(LIST_DISTINCT(sents)) AS BIGINT) AS n_uniq,
           ROUND(1.0 - CAST(LEN(LIST_DISTINCT(sents)) AS DOUBLE) / LEN(sents), 6)
               AS dup_ratio
    FROM t WHERE LEN(sents) > 0
    """,
)
def intra_doc_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition profile: sentence count, unique-sentence
    count, and duplicate ratio per document — the WITHIN-document half of
    dedup (RefinedWeb/Gopher drop or trim docs whose own lines repeat;
    cross-document dedup is the LSH family elsewhere in this repo).  The
    dup_ratio column is the filter key; the counts make the decision
    auditable.

    Scale: entirely map-only — split, distinct, and count are per-row array
    expressions inside whole-stage codegen; no explode, no shuffle, no
    state.  The cheapest possible 100 TB pass."""
    d = load_table(spark, sf_dir, "documents")
    sents = F.filter(F.split("text", r"\. "), lambda s: s != F.lit(""))
    t = d.select("doc_id", sents.alias("_s")).filter(F.size("_s") > 0)
    n_sents = F.size("_s").cast("long")
    n_uniq = F.size(F.array_distinct("_s")).cast("long")
    return t.select(
        "doc_id",
        n_sents.alias("n_sents"),
        n_uniq.alias("n_uniq"),
        F.round(F.lit(1.0) - n_uniq.cast("double") / n_sents, 6).alias("dup_ratio"),
    )
