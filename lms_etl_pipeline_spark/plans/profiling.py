"""Distribution profiling, probabilistic membership, and OLAP-composite
plans (round 5b widening).

Operators a production data platform runs for corpus QA, membership
indexing, statistics, and profiling that were not yet first-class.
The first wave:

- **Bloom-filter membership probe** (``bloom_filter_probe``) — the mergeable
  bitmap sketch every incremental-ingest pipeline consults before paying for
  a full dedup pass; built with BIT_OR word aggregation, probed with a
  broadcast join, and audited against exact membership truth;
- **duplicated-span detection** (``dup_ngram_spans``) — the Lee et al. 2022
  "Deduplicating Training Data Makes Language Models Better" signal:
  per-document fraction of token positions covered by a corpus-repeated
  8-gram (substring-level dedup, where doc-level fingerprints are blind);
- **token-entropy filter** (``token_entropy_filter``) — Shannon entropy of
  the per-document token distribution, the cheap spam/keyword-stuffing gate
  (low entropy = repeated-token boilerplate);
- **Zipf fit** (``zipf_slope_fit``) — closed-form least-squares slope of
  log-frequency vs log-rank over the top vocabulary, the classic
  natural-language sanity check on a crawled corpus (natural text ≈ -1);
- **PCA power iteration** (``pca_power_iteration``) — top principal
  direction of the mean-centered embedding cloud via two unrolled power
  iterations, the whitening/dimensionality step vector platforms run before
  quantization (and the eigenvector twin of the k-means trainer);
- **association rules** (``assoc_rules_confidence``) — confidence + lift
  over per-user behavior-type pairs (completes ``event_type_itemsets``'s
  support counts into actual rules);
- **equi-depth histogram** (``equidepth_histogram``) — decile-binned
  distribution profile of order totals (the optimizer-statistics /
  data-profiling shape, NTILE-exact rather than interpolated-edge);
- **MAD robust outliers** (``mad_robust_outliers``) — median-absolute-
  deviation outlier rates per event type (the robust twin of the z-score
  filter: immune to the outliers it hunts);
- **ABC / Pareto classification** (``abc_pareto_classification``) — parts
  tiered A/B/C by cumulative revenue share with exact-decimal thresholds;
- **RFM segmentation** (``rfm_segmentation``) — recency/frequency/monetary
  quartile codes per customer, the standard behavioral-cohort cut.

Later waves in this module: cross-source overlap matrix, dedup-savings
histogram, seasonal profile, quantile normalization, distribution-matching
resample, n-gram novelty, CUSUM changepoints, column profiler, exact
SimHash pairs, Flesch readability, correlation matrix, grouped OLS,
Benford audit, Gini coefficient, token run-length QA, tokenizer fertility,
MIPS retrieval, pairwise-cosine calibration, exact weighted median, and
SymSpell typo mining — each with its own scale note and DuckDB oracle.

Reference parity note: the reference (`/root/reference/src/lms_to_s3_lambda.py`,
`src/s3_to_rds_lambda.py` — a 2-file pandas ETL) has no analytics layer;
these extend the engine along the driver-mandated SURVEY.md §2.12 + LLM
training-data axis like rounds 2-5a.

Determinism / oracle strategy (repo convention, ``functions/numeric.py``):
cross-row double sums go through fixed-scale DECIMAL casts (exact,
order-independent); per-row derived doubles are IEEE-deterministic given
identical inputs; every emitted float is ROUNDed at a fixed scale; flags
and thresholds compare the ROUNDed value so both engines branch on
identical doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.functions.numeric import dec_sum
from lms_etl_pipeline_spark.plans import anchors
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.plans.curation import _BUCKET_SQL, _G3, _bucket
from lms_etl_pipeline_spark.plans.llm import _TOKS, EMB_DIM
from lms_etl_pipeline_spark.operators import text as tx
from lms_etl_pipeline_spark.operators.rank import (
    attach_global_rank,
    global_ntile,
    global_running_agg,
    global_running_sum,
    with_uniform_key_buckets,
)
from lms_etl_pipeline_spark.sources.tables import load_table

#: DuckDB twin of tx.fingerprint (md5 of the sorted distinct-token set).
_FP_SQL = f"MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT({_TOKS})), ' '))"

#: delta-batch convention shared with corpus_ml (doc_id % 10 == 7 = newest).
_BATCH_MOD = 7

# --------------------------------------------------------------------------
# Bloom-filter membership probe
# --------------------------------------------------------------------------

_BLOOM_M = 8192          # bits
_BLOOM_K = 4             # hash functions
_BLOOM_WORD = 32         # bits per bitmap word (masks stay positive int64)

# Engine-portable position j for a text: md5-prefix bucket of a salted key.
_BLOOM_POS_SQL = (
    "TRY_CAST(CONCAT('0x', SUBSTRING(MD5(CONCAT('bloom{j}|', text)), 1, 15))"
    f" AS BIGINT) % {_BLOOM_M}"
)


def _bloom_pos(j: int) -> F.Column:
    key = F.concat(F.lit(f"bloom{j}|"), F.col("text"))
    return (
        F.conv(F.substring(F.md5(key), 1, 15), 16, 10).cast("bigint")
        % _BLOOM_M
    )


@query(
    "bloom_filter_probe",
    oracle=f"""
    WITH idx AS (SELECT text FROM documents WHERE doc_id % 10 != {_BATCH_MOD}),
    delta AS (SELECT doc_id, text FROM documents
              WHERE doc_id % 10 = {_BATCH_MOD}),
    idx_pos AS (
      SELECT DISTINCT pos FROM idx, (
        SELECT UNNEST(RANGE(0, {_BLOOM_K})) AS j) h,
      LATERAL (SELECT CASE h.j
        {"".join(f"WHEN {j} THEN ({_BLOOM_POS_SQL.format(j=j)}) " for j in range(_BLOOM_K))}
        END AS pos) p),
    bitmap AS (
      SELECT pos // {_BLOOM_WORD} AS word,
             BIT_OR(CAST(POWER(2, pos % {_BLOOM_WORD}) AS BIGINT)) AS bm
      FROM idx_pos GROUP BY 1),
    probe AS (
      SELECT d.doc_id, d.text, CASE h.j
        {"".join(f"WHEN {j} THEN ({_BLOOM_POS_SQL.format(j=j)}) " for j in range(_BLOOM_K))}
        END AS pos
      FROM delta d, (SELECT UNNEST(RANGE(0, {_BLOOM_K})) AS j) h),
    hits AS (
      SELECT p.doc_id,
             CAST(SUM(CASE WHEN b.bm IS NOT NULL
                        AND (b.bm & CAST(POWER(2, p.pos % {_BLOOM_WORD}) AS BIGINT))
                            != 0
                      THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
      FROM probe p LEFT JOIN bitmap b ON p.pos // {_BLOOM_WORD} = b.word
      GROUP BY p.doc_id)
    SELECT h.doc_id, h.n_hit,
           h.n_hit = {_BLOOM_K} AS bloom_member,
           EXISTS (SELECT 1 FROM idx i
                   JOIN delta dd ON dd.doc_id = h.doc_id AND i.text = dd.text)
               AS exact_member
    FROM hits h
    """,
)
def bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe of the delta batch against the index
    corpus: build an m={8192}-bit, k={4}-hash Bloom bitmap over index
    document texts, probe every delta document, and audit the sketch's
    answer against exact membership (``bloom_member`` may false-positive,
    never false-negative — the audit column makes that checkable).

    The salted-md5 positions are the same engine-portable hash family as
    the Count-Min/minhash plans, so bitmap and probe are bit-identical
    across engines and the whole sketch is exactly differential-testable.

    Scale: the bitmap is ≤ m/{32} = {256} words NO MATTER the corpus size —
    built with one map-side-combining BIT_OR aggregate (mergeable across
    partitions/shards by construction: OR is associative+commutative) and
    broadcast to the probe join.  Probing is k narrow projections + a
    broadcast hash join; the index corpus is scanned once, never shuffled.
    The exact-membership audit column is the only part that joins the full
    index (broadcast semi-join on the delta side, delta-sized output);
    at 100 TB you ship only the 256-word bitmap.

    Reference parity: the reference's load side re-reads its whole target
    table to decide inserts vs updates (/root/reference/src/s3_to_rds_lambda.py
    ON CONFLICT upsert); a Bloom pre-filter is the sketch that makes that
    membership question O(1)-sized at scale.
    """
    docs = load_table(spark, sf_dir, "documents")
    idx = docs.filter(F.col("doc_id") % 10 != _BATCH_MOD).select("text")
    delta = docs.filter(F.col("doc_id") % 10 == _BATCH_MOD).select(
        "doc_id", "text"
    )
    positions = F.array(*[_bloom_pos(j) for j in range(_BLOOM_K)])
    mask = F.pow(F.lit(2.0), (F.col("pos") % _BLOOM_WORD).cast("double")).cast(
        "bigint"
    )
    bitmap = (
        idx.select(F.explode(positions).alias("pos"))
        .select((F.col("pos") / _BLOOM_WORD).cast("bigint").alias("word"),
                mask.alias("mask"))
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bm"))
    )
    probe = delta.select(
        "doc_id", F.explode(positions).alias("pos")
    ).select(
        "doc_id",
        (F.col("pos") / _BLOOM_WORD).cast("bigint").alias("word"),
        mask.alias("mask"),
    )
    hits = (
        probe.join(F.broadcast(bitmap), "word", "left")
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("bm").isNotNull()
                    & (F.col("bm").bitwiseAND(F.col("mask")) != 0),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_hit")
        )
    )
    exact = delta.join(
        idx.distinct().withColumn("exact_member", F.lit(True)),
        "text",
        "left",
    ).select("doc_id", F.coalesce("exact_member", F.lit(False)).alias("exact_member"))
    return (
        hits.join(exact, "doc_id")
        .select(
            "doc_id",
            "n_hit",
            (F.col("n_hit") == _BLOOM_K).alias("bloom_member"),
            "exact_member",
        )
    )


# --------------------------------------------------------------------------
# Duplicated-span detection (substring-level dedup signal)
# --------------------------------------------------------------------------

_SPAN_N = 8  # tokens per gram


@query(
    "dup_ngram_spans",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    grams AS (
      SELECT doc_id, UNNEST(g.i) AS pos,
             ARRAY_TO_STRING(LIST_SLICE(toks, UNNEST(g.i),
                                        UNNEST(g.i) + {_SPAN_N - 1}), ' ') AS gram
      FROM t, LATERAL (SELECT RANGE(1, GREATEST(LEN(toks) - {_SPAN_N - 2}, 1))
                       AS i) g),
    dup AS (SELECT gram FROM grams GROUP BY gram HAVING COUNT(*) >= 2),
    covered AS (
      SELECT DISTINCT g.doc_id, UNNEST(RANGE(g.pos, g.pos + {_SPAN_N})) AS p
      FROM grams g JOIN dup USING (gram))
    SELECT t.doc_id, CAST(LEN(t.toks) AS BIGINT) AS n_toks,
           CAST(COALESCE(c.n_dup, 0) AS BIGINT) AS n_dup_pos,
           ROUND(CAST(COALESCE(c.n_dup, 0) AS DOUBLE)
                 / GREATEST(LEN(t.toks), 1), 6) AS dup_frac
    FROM t LEFT JOIN (SELECT doc_id, COUNT(*) AS n_dup FROM covered
                      GROUP BY doc_id) c USING (doc_id)
    """,
)
def dup_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication signal (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): for every document, the
    number and fraction of token positions covered by an {8}-gram that
    occurs at least twice corpus-wide (including within one document).
    Doc-level fingerprints are blind to these partial overlaps; this is the
    per-position view an exact-substring dedup pass removes.

    Scale: grams are a map-only zip-of-slices projection; the repeat test
    is one map-side-combining COUNT per gram (term-keyed, uniformly
    hash-distributed); cover-back is an equi-join on the gram string
    followed by a bounded position explode ({8} rows per duplicated gram)
    and a distinct — no self-join of documents, no suffix array, work
    linear in corpus grams + duplicated-gram hits.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tx.tokens("text").alias("toks"))
    n = F.size("toks")
    starts = F.sequence(F.lit(1), F.greatest(n - (_SPAN_N - 1), F.lit(0)))
    grams = t.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: F.struct(
                    i.alias("pos"),
                    F.array_join(F.slice("toks", i, _SPAN_N), " ").alias("gram"),
                ),
            )
        ).alias("g"),
    ).select("doc_id", "g.pos", "g.gram")
    dup = grams.groupBy("gram").count().filter(F.col("count") >= 2).select("gram")
    covered = (
        grams.join(dup, "gram")
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (_SPAN_N - 1))
            ).alias("p"),
        )
        .distinct()
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup"))
    )
    return (
        t.join(covered, "doc_id", "left")
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_toks"),
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup_pos"),
            F.round(
                F.coalesce("n_dup", F.lit(0)).cast("double")
                / F.greatest(F.size("toks"), F.lit(1)),
                6,
            ).alias("dup_frac"),
        )
    )


# --------------------------------------------------------------------------
# Token-entropy quality filter
# --------------------------------------------------------------------------

_ENTROPY_MIN = 2.5  # bits; below = repeated-token boilerplate


@query(
    "token_entropy_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    counts AS (
      SELECT doc_id, tok, COUNT(*) AS c
      FROM (SELECT doc_id, UNNEST(toks) AS tok FROM t) x
      GROUP BY doc_id, tok),
    ent AS (
      SELECT c.doc_id,
             CAST(SUM(CAST(c.c * LOG2(c.c) AS DECIMAL(38,12))) AS DOUBLE)
                 AS s_clog
      FROM counts c GROUP BY c.doc_id)
    SELECT t.doc_id, CAST(LEN(t.toks) AS BIGINT) AS n_toks,
           ROUND(LOG2(LEN(t.toks)) - e.s_clog / LEN(t.toks), 6) AS entropy_bits,
           ROUND(LOG2(LEN(t.toks)) - e.s_clog / LEN(t.toks), 6)
               < {_ENTROPY_MIN} AS low_entropy
    FROM t JOIN ent e USING (doc_id) WHERE LEN(t.toks) > 0
    """,
)
def token_entropy_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of each document's token distribution, in bits:
    H = log2(N) - (Σ c·log2 c)/N over per-token counts c.  Low entropy
    means a few tokens dominate — the cheap spam/keyword-stuffing/
    template-page gate run before any model-based scorer (CCNet and C4
    both ship entropy-family heuristics).

    Determinism: each c·log2(c) term is computed once in double (IEEE-
    deterministic), cast to DECIMAL(38,12) and summed exactly, so the
    cross-row sum is order-independent; the final H is rounded and the
    ``low_entropy`` flag compares the ROUNDed value — both engines branch
    on identical doubles.

    Scale: one explode + two map-side-combining aggregates keyed by
    (doc_id[, token]) — uniformly distributed, no joins wider than the
    per-doc count table, no Python.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", tx.tokens("text").alias("toks")).filter(
        F.size("toks") > 0
    )
    counts = (
        t.select("doc_id", F.explode("toks").alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    ent = counts.groupBy("doc_id").agg(
        F.sum(
            (F.col("c") * F.log2("c")).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("s_clog")
    )
    h = F.round(F.log2(F.size("toks")) - F.col("s_clog") / F.size("toks"), 6)
    return (
        t.join(ent, "doc_id")
        .select(
            "doc_id",
            F.size("toks").cast("bigint").alias("n_toks"),
            h.alias("entropy_bits"),
            (h < _ENTROPY_MIN).alias("low_entropy"),
        )
    )


# --------------------------------------------------------------------------
# Zipf's-law fit over the top vocabulary
# --------------------------------------------------------------------------

_ZIPF_TOPN = 100


@query(
    "zipf_slope_fit",
    oracle=f"""
    WITH counts AS (
      SELECT tok, COUNT(*) AS n
      FROM (SELECT UNNEST({_TOKS}) AS tok FROM documents) x
      GROUP BY tok),
    top AS (
      SELECT tok, n, ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS rk
      FROM counts ORDER BY n DESC, tok LIMIT {_ZIPF_TOPN}),
    terms AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(CAST(LN(rk) AS DECIMAL(38,12))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(LN(n) AS DECIMAL(38,12))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(LN(rk) * LN(rk) AS DECIMAL(38,12))) AS DOUBLE) AS sxx,
             CAST(SUM(CAST(LN(rk) * LN(n) AS DECIMAL(38,12))) AS DOUBLE) AS sxy
      FROM top)
    SELECT m AS n_terms,
           ROUND((sxy - sx * sy / m) / (sxx - sx * sx / m), 6) AS slope,
           ROUND(sy / m - (sxy - sx * sy / m) / (sxx - sx * sx / m) * sx / m, 6)
               AS intercept
    FROM terms
    """,
)
def zipf_slope_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law check: closed-form least-squares fit of ln(frequency)
    against ln(rank) over the top-{100} vocabulary.  Natural language sits
    near slope -1; a synthetic or boilerplate-heavy corpus drifts off —
    the one-number distributional sanity gate on any new crawl source.

    Determinism: ranks come from an exact count with a deterministic
    tie-break (count desc, token asc); each regression term is one IEEE
    double product cast to DECIMAL(38,12) and summed exactly; the final
    slope/intercept arithmetic is identical double math on both engines.

    Scale: one map-side-combining token count, a top-{100}
    TakeOrderedAndProject (never a global sort of the vocabulary), and a
    {100}-row aggregate.  Output is one row.
    """
    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "tok")
        .limit(_ZIPF_TOPN)
    )
    w = Window.orderBy(F.col("n").desc(), "tok")
    top = counts.select("tok", "n", F.row_number().over(w).alias("rk"))
    lx, ly = F.log(F.col("rk").cast("double")), F.log(F.col("n").cast("double"))
    terms = top.agg(
        F.count("*").cast("bigint").alias("m"),
        F.sum(lx.cast("decimal(38,12)")).cast("double").alias("sx"),
        F.sum(ly.cast("decimal(38,12)")).cast("double").alias("sy"),
        F.sum((lx * lx).cast("decimal(38,12)")).cast("double").alias("sxx"),
        F.sum((lx * ly).cast("decimal(38,12)")).cast("double").alias("sxy"),
    )
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / F.col("m")) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / F.col("m")
    )
    return terms.select(
        F.col("m").alias("n_terms"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("sy") / F.col("m") - slope * F.col("sx") / F.col("m"), 6)
        .alias("intercept"),
    )


# --------------------------------------------------------------------------
# PCA top principal direction via unrolled power iteration
# --------------------------------------------------------------------------


@query(
    "pca_power_iteration",
    oracle=f"""
    WITH x AS (
      SELECT e.vec_id, d.i, CAST(e.embedding[d.i] AS DOUBLE) AS x
      FROM embeddings e, (SELECT UNNEST(RANGE(1, {EMB_DIM} + 1)) AS i) d),
    mu AS (
      SELECT i, CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) / COUNT(*) AS mu
      FROM x GROUP BY i),
    c AS (SELECT x.vec_id, x.i, x.x - mu.mu AS cx FROM x JOIN mu USING (i)),
    s1 AS (
      SELECT vec_id,
             CAST(SUM(CAST(cx * 0.125 AS DECIMAL(38,12))) AS DOUBLE) AS s
      FROM c GROUP BY vec_id),
    w1 AS (
      SELECT c.i,
             CAST(SUM(CAST(c.cx * s1.s AS DECIMAL(38,12))) AS DOUBLE) AS w
      FROM c JOIN s1 USING (vec_id) GROUP BY c.i),
    n1 AS (SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE))
               AS nrm FROM w1),
    v1 AS (SELECT i, w / (SELECT nrm FROM n1) AS v FROM w1),
    s2 AS (
      SELECT c.vec_id,
             CAST(SUM(CAST(c.cx * v1.v AS DECIMAL(38,12))) AS DOUBLE) AS s
      FROM c JOIN v1 USING (i) GROUP BY c.vec_id),
    w2 AS (
      SELECT c.i,
             CAST(SUM(CAST(c.cx * s2.s AS DECIMAL(38,12))) AS DOUBLE) AS w
      FROM c JOIN s2 USING (vec_id) GROUP BY c.i),
    n2 AS (SELECT SQRT(CAST(SUM(CAST(w * w AS DECIMAL(38,12))) AS DOUBLE))
               AS nrm FROM w2)
    SELECT CAST(i AS BIGINT) AS dim,
           ROUND(w / (SELECT nrm FROM n2), 6) AS loading,
           ROUND((SELECT nrm FROM n2), 4) AS eigval_est
    FROM w2
    """,
)
def pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction of the mean-centered embedding cloud via two
    unrolled power iterations (v0 = uniform 1/8 vector, exactly
    representable): v_{{t+1}} ∝ Σ_r (x_r-μ)·⟨x_r-μ, v_t⟩.  This is the
    whitening / dominant-direction step vector platforms run before
    quantization or anisotropic-similarity correction, and the eigen-twin
    of the k-means trainer (``kmeans_lloyd``).  ``eigval_est`` is the
    Rayleigh-quotient estimate ‖A v₁‖ of the top covariance eigenvalue.

    Never materializes the d×d covariance: each iteration is two linear
    passes in long (row, dim, value) form — per-row projections ⟨x_r-μ, v⟩
    (group by vec_id), then the weighted recombination (group by dim).
    Cross-row sums are DECIMAL(38,12)-cast (order-independent); all
    per-term products are IEEE doubles identical on both engines.

    Scale: work is O(N·d) per iteration with only equi-joins on vec_id/dim
    (the μ and v tables are d = {EMB_DIM} rows, broadcast); no collect, no
    d² blow-up, partitioning-invariant by the decimal-sum convention.
    """
    e = load_table(spark, sf_dir, "embeddings")
    x = e.select(
        "vec_id", F.posexplode("embedding").alias("i0", "xf")
    ).select(
        "vec_id",
        (F.col("i0") + 1).alias("i"),
        F.col("xf").cast("double").alias("x"),
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    mu = x.groupBy("i").agg(
        (dec(F.col("x")) / F.count("*")).alias("mu")
    )
    c = x.join(F.broadcast(mu), "i").select(
        "vec_id", "i", (F.col("x") - F.col("mu")).alias("cx")
    )
    s1 = c.groupBy("vec_id").agg(dec(F.col("cx") * F.lit(0.125)).alias("s"))
    w1 = (
        c.join(s1, "vec_id")
        .groupBy("i")
        .agg(dec(F.col("cx") * F.col("s")).alias("w"))
    )
    n1 = w1.agg(F.sqrt(dec(F.col("w") * F.col("w"))).alias("nrm"))
    v1 = w1.crossJoin(F.broadcast(n1)).select(
        "i", (F.col("w") / F.col("nrm")).alias("v")
    )
    s2 = (
        c.join(F.broadcast(v1), "i")
        .groupBy("vec_id")
        .agg(dec(F.col("cx") * F.col("v")).alias("s"))
    )
    w2 = (
        c.join(s2, "vec_id")
        .groupBy("i")
        .agg(dec(F.col("cx") * F.col("s")).alias("w"))
    )
    n2 = w2.agg(F.sqrt(dec(F.col("w") * F.col("w"))).alias("nrm"))
    return w2.crossJoin(F.broadcast(n2)).select(
        F.col("i").cast("bigint").alias("dim"),
        F.round(F.col("w") / F.col("nrm"), 6).alias("loading"),
        F.round(F.col("nrm"), 4).alias("eigval_est"),
    )


# --------------------------------------------------------------------------
# Association rules over per-user behavior types
# --------------------------------------------------------------------------

_RULE_MIN_SUPPORT = 5


@query(
    "assoc_rules_confidence",
    oracle=f"""
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    n_users AS (SELECT COUNT(DISTINCT user_id) AS nu FROM ut),
    singles AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
    pairs AS (
      SELECT a.event_type AS antecedent, b.event_type AS consequent,
             COUNT(*) AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type != b.event_type
      GROUP BY 1, 2)
    SELECT p.antecedent, p.consequent,
           CAST(p.n_ab AS BIGINT) AS n_ab,
           CAST(sa.n AS BIGINT) AS n_ante,
           CAST(sb.n AS BIGINT) AS n_cons,
           ROUND(CAST(p.n_ab AS DOUBLE) / sa.n, 6) AS confidence,
           ROUND(CAST(p.n_ab AS DOUBLE) * (SELECT nu FROM n_users)
                 / (CAST(sa.n AS DOUBLE) * sb.n), 6) AS lift
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.antecedent
    JOIN singles sb ON sb.event_type = p.consequent
    WHERE p.n_ab >= {_RULE_MIN_SUPPORT}
    """,
)
def assoc_rules_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules antecedent→consequent over per-user behavior-type
    sets: exact support, confidence n_ab/n_a, and lift
    n_ab·N/(n_a·n_b) for every directed type pair above min-support —
    the rule-emission half of market-basket mining
    (``event_type_itemsets`` is the support-counting half).

    Determinism: all counts exact integers; confidence/lift are single
    double divisions of identical integers, rounded.

    Scale: the distinct collapse shrinks events to ≤ |users|·|types| rows;
    the pair join is keyed on user_id (equi-join on the natural
    partitioning); the singles table and the 1-row user count are
    broadcast.  |types| is small and bounded, so output is ≤ |types|².
    """
    ev = load_table(spark, sf_dir, "events")
    ut = ev.select("user_id", "event_type").distinct()
    nu = ut.agg(F.countDistinct("user_id").alias("nu"))
    singles = ut.groupBy("event_type").agg(F.count("*").alias("n"))
    pairs = (
        ut.alias("a")
        .join(ut.alias("b"), "user_id")
        .filter(F.col("a.event_type") != F.col("b.event_type"))
        .groupBy(
            F.col("a.event_type").alias("antecedent"),
            F.col("b.event_type").alias("consequent"),
        )
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _RULE_MIN_SUPPORT)
    )
    sa = singles.select(
        F.col("event_type").alias("antecedent"), F.col("n").alias("n_ante")
    )
    sb = singles.select(
        F.col("event_type").alias("consequent"), F.col("n").alias("n_cons")
    )
    return (
        pairs.join(F.broadcast(sa), "antecedent")
        .join(F.broadcast(sb), "consequent")
        .crossJoin(F.broadcast(nu))
        .select(
            "antecedent",
            "consequent",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.col("n_ante").cast("bigint").alias("n_ante"),
            F.col("n_cons").cast("bigint").alias("n_cons"),
            F.round(F.col("n_ab").cast("double") / F.col("n_ante"), 6).alias(
                "confidence"
            ),
            F.round(
                F.col("n_ab").cast("double")
                * F.col("nu")
                / (F.col("n_ante").cast("double") * F.col("n_cons")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Equi-depth histogram of order totals
# --------------------------------------------------------------------------

_HIST_BINS = 10


@query(
    "equidepth_histogram",
    oracle=f"""
    WITH b AS (
      SELECT o_totalprice,
             NTILE({_HIST_BINS}) OVER (ORDER BY o_totalprice, o_orderkey)
                 AS bin
      FROM orders)
    SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_orders,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
               AS sum_total
    FROM b GROUP BY bin
    """,
)
def equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (equal-height) histogram of order totals in {10} bins —
    the distribution profile optimizers and data-profiling jobs keep per
    column.  NTILE over a deterministic total order makes the bin
    boundaries EXACT (no interpolated edges, no knife-edge float
    comparisons), so the whole profile is bit-checkable.

    Scale: the NTILE spans ALL of orders, so a naive global window would
    single-partition the fact table.  Instead the exact bin comes from
    operators/rank.py's ``global_ntile`` over a data-dependent monotone
    coarse key — ``width_bucket(o_totalprice, min, max, 64)`` from a
    1-row broadcast of the exact (min, max) (``with_uniform_key_buckets``;
    deterministic, so every plan branch agrees on the assignment): one
    ordinary hash shuffle + a <=66-row broadcast prefix table.  The
    aggregate itself is map-side combining on {10} keys; min/max/sum are
    raw-value passthroughs + exact decimal.
    """
    o = load_table(spark, sf_dir, "orders")
    tagged = with_uniform_key_buckets(
        o.select("o_totalprice", "o_orderkey"), "o_totalprice"
    )
    return (
        global_ntile(
            tagged,
            _HIST_BINS,
            [F.col("o_totalprice").asc(), F.col("o_orderkey").asc()],
            F.col("_gbk"),
            bucket_col="bin",
        )
        .groupBy("bin")
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
            dec_sum("o_totalprice", "sum_total"),
        )
    )


# --------------------------------------------------------------------------
# MAD (median-absolute-deviation) robust outlier rates
# --------------------------------------------------------------------------


@query(
    "mad_robust_outliers",
    oracle="""
    WITH med AS (
      SELECT event_type,
             ROUND(QUANTILE_CONT(value, 0.5), 6) AS med
      FROM events GROUP BY event_type),
    dev AS (
      SELECT e.event_type, e.value, m.med,
             ROUND(ABS(e.value - m.med), 6) AS adev
      FROM events e JOIN med m USING (event_type)),
    mad AS (
      SELECT event_type, ROUND(QUANTILE_CONT(adev, 0.5), 6) AS mad
      FROM dev GROUP BY event_type)
    SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ANY_VALUE(d.med) AS med, ANY_VALUE(m.mad) AS mad,
           CAST(SUM(CASE WHEN d.adev > ROUND(3 * 1.4826 * m.mad, 6)
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad m USING (event_type)
    GROUP BY d.event_type
    """,
)
def mad_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier rates per event type via median absolute deviation:
    flag |x - median| > 3·1.4826·MAD (the normal-consistent robust sigma).
    Unlike the z-score filter (``doc_zscore_normalize``), the threshold
    itself is immune to the outliers it hunts — the robust-statistics twin
    every metrics pipeline keeps next to the mean/σ one.

    Determinism: medians are exact PERCENTILE_CONT values ROUNDed at scale
    6 before any downstream arithmetic, so deviations, the MAD, and the
    threshold are identical doubles on both engines and the outlier
    comparison is never a cross-engine knife edge.

    Scale: two aggregate passes keyed by event_type (bounded key count,
    map-side combining) with the k-row median table broadcast back —
    no windows, no sort of the full relation.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type",
        "value",
        "med",
        F.round(F.abs(F.col("value") - F.col("med")), 6).alias("adev"),
    )
    mad = dev.groupBy("event_type").agg(
        F.round(F.expr("percentile(adev, 0.5)"), 6).alias("mad")
    )
    thr = F.round(F.lit(3 * 1.4826) * F.col("mad"), 6)
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.any_value("med").alias("med"),
            F.any_value("mad").alias("mad"),
            F.sum(F.when(F.col("adev") > thr, 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# ABC / Pareto classification of parts by revenue
# --------------------------------------------------------------------------

_REV_DEC = "CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))"


@query(
    "abc_pareto_classification",
    oracle=f"""
    WITH rev AS (
      SELECT l_partkey, SUM({_REV_DEC}) AS rev
      FROM lineitem GROUP BY l_partkey),
    ranked AS (
      SELECT l_partkey, rev,
             ROW_NUMBER() OVER (ORDER BY rev DESC, l_partkey) AS rk,
             SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                            ROWS UNBOUNDED PRECEDING) AS cum_rev,
             SUM(rev) OVER () AS total_rev
      FROM rev)
    SELECT l_partkey, CAST(ROUND(rev, 4) AS DOUBLE) AS revenue, rk,
           CASE WHEN cum_rev * 100 <= total_rev * 70 THEN 'A'
                WHEN cum_rev * 100 <= total_rev * 90 THEN 'B'
                ELSE 'C' END AS abc_class
    FROM ranked
    """,
)
def abc_pareto_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification: rank parts by total revenue and tier
    them A/B/C at 70% / 90% cumulative revenue share — the classic
    inventory-analytics composite (rank + running total + share threshold
    in one pass).

    Determinism: revenue, the running total, and the class thresholds all
    stay in EXACT decimal arithmetic (``cum·100 ≤ total·70`` instead of a
    float share), so the tier boundary is never a floating knife edge;
    only the emitted ``revenue`` column is rounded out to double.

    Scale: the per-part aggregate is map-side combining on l_partkey; the
    global rank and running revenue total run over the |part|-sized
    AGGREGATE through operators/rank.py (uniform buckets on the negated
    revenue — the order is rev DESC — then partitioned rank + prefix
    offsets), so even a part catalog that grows with the corpus never
    single-partitions; the grand total is the standard 1-row broadcast
    (ALLOW_CROSS).
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev_expr = F.col("l_extendedprice").cast("decimal(12,2)") * (
        F.lit(1) - F.col("l_discount")
    ).cast("decimal(12,2)")
    rev = li.groupBy("l_partkey").agg(F.sum(rev_expr).alias("rev"))
    order = [F.col("rev").desc(), F.col("l_partkey").asc()]
    tagged = with_uniform_key_buckets(
        rev.withColumn("_negrev", (-F.col("rev")).cast("double")),
        "_negrev",
        nulls="last",
    )
    ranked = global_running_agg(
        attach_global_rank(tagged, order, F.col("_gbk"), rank_col="rk"),
        "rev",
        order,
        F.col("_gbk"),
        out_col="cum_rev",
        agg="sum",
    ).crossJoin(
        F.broadcast(rev.agg(F.sum("rev").alias("total_rev")))
    )
    return ranked.select(
        "l_partkey",
        F.round("rev", 4).cast("double").alias("revenue"),
        "rk",
        F.when(F.col("cum_rev") * 100 <= F.col("total_rev") * 70, "A")
        .when(F.col("cum_rev") * 100 <= F.col("total_rev") * 90, "B")
        .otherwise("C")
        .alias("abc_class"),
    )


# --------------------------------------------------------------------------
# RFM customer segmentation
# --------------------------------------------------------------------------


@query(
    "rfm_segmentation",
    oracle="""
    WITH anchor AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
    base AS (
      SELECT o_custkey,
             DATE_DIFF('day', MAX(CAST(o_orderdate AS DATE)),
                       (SELECT d0 FROM anchor)) AS recency_days,
             CAST(COUNT(*) AS BIGINT) AS n_orders,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary_dec
      FROM orders GROUP BY o_custkey),
    scored AS (
      SELECT o_custkey, recency_days, n_orders,
             CAST(monetary_dec AS DOUBLE) AS monetary,
             NTILE(4) OVER (ORDER BY recency_days, o_custkey) AS r_q,
             NTILE(4) OVER (ORDER BY n_orders DESC, o_custkey) AS f_q,
             NTILE(4) OVER (ORDER BY monetary_dec DESC, o_custkey) AS m_q
      FROM base)
    SELECT o_custkey, recency_days, n_orders, monetary, r_q, f_q, m_q,
           CONCAT(r_q, f_q, m_q) AS segment
    FROM scored
    """,
)
def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: per customer, days since last order (vs the
    corpus max order date), order count, and exact-decimal monetary total,
    each cut into quartiles (1 = best) and concatenated into the classic
    3-digit segment code — the standard behavioral-cohort composite.

    Determinism: recency/frequency are exact integers, monetary quartiles
    are ordered on the EXACT decimal (ties broken by custkey), and NTILE
    over a deterministic total order is exact — no float anywhere until
    the emitted monetary column.

    Scale: one map-side-combining aggregate on o_custkey, then three
    exact quartile cuts over the CUSTOMER-sized aggregate via
    operators/rank.py ``global_ntile`` (uniform buckets on each cut key,
    negated for the DESC cuts) — three ordinary hash shuffles, no
    single-partition window even as the customer base scales with the
    corpus; the 1-row anchor date is a broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    anchor = o.agg(F.max(F.to_date("o_orderdate")).alias("d0"))
    base = (
        o.groupBy("o_custkey")
        .agg(
            F.max(F.to_date("o_orderdate")).alias("last_d"),
            F.count("*").cast("bigint").alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
                "monetary_dec"
            ),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            "o_custkey",
            F.datediff("d0", "last_d").alias("recency_days"),
            "n_orders",
            "monetary_dec",
        )
    )
    t1 = global_ntile(
        with_uniform_key_buckets(base, "recency_days"),
        4,
        [F.col("recency_days").asc(), F.col("o_custkey").asc()],
        F.col("_gbk"),
        bucket_col="r_q",
    ).drop("_gbk")
    t2 = global_ntile(
        with_uniform_key_buckets(
            t1.withColumn("_negn", -F.col("n_orders")), "_negn", nulls="last"
        ),
        4,
        [F.col("n_orders").desc(), F.col("o_custkey").asc()],
        F.col("_gbk"),
        bucket_col="f_q",
    ).drop("_gbk", "_negn")
    t3 = global_ntile(
        with_uniform_key_buckets(
            t2.withColumn("_negm", (-F.col("monetary_dec")).cast("double")),
            "_negm",
            nulls="last",
        ),
        4,
        [F.col("monetary_dec").desc(), F.col("o_custkey").asc()],
        F.col("_gbk"),
        bucket_col="m_q",
    ).drop("_gbk", "_negm")
    scored = t3.select(
        "o_custkey",
        "recency_days",
        "n_orders",
        F.col("monetary_dec").cast("double").alias("monetary"),
        "r_q",
        "f_q",
        "m_q",
    )
    return scored.select(
        "o_custkey",
        "recency_days",
        "n_orders",
        "monetary",
        "r_q",
        "f_q",
        "m_q",
        F.concat("r_q", "f_q", "m_q").alias("segment"),
    )


# --------------------------------------------------------------------------
# Cross-source duplicate overlap matrix
# --------------------------------------------------------------------------


@query(
    "source_overlap_matrix",
    oracle=f"""
    WITH fp AS (SELECT DISTINCT source, {_FP_SQL} AS f FROM documents)
    SELECT a.source AS src_a, b.source AS src_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fp
    FROM fp a JOIN fp b ON a.f = b.f AND a.source < b.source
    GROUP BY 1, 2
    """,
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source contamination matrix: for every source pair, how many
    exact-duplicate content fingerprints they share — the signal that tells
    a curation team two crawls/feeds are mirroring each other (and that
    per-source dedup alone is insufficient).  Uses the same content
    fingerprint as ``dedup_fingerprint``, so the matrix is the pairwise
    roll-up of those duplicate groups.

    Scale: the distinct (source, fingerprint) projection collapses the
    corpus before any join; the self-join is an EQUI-join on the
    fingerprint (uniform 128-bit key, no skew); output is bounded by
    |sources|².  A fingerprint shared by s sources contributes C(s,2)
    pairs — bounded by the square of the replication factor, not corpus
    size.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "source", tx.fingerprint("text").alias("f")
    ).distinct()
    a = fp.select(F.col("source").alias("src_a"), "f")
    b = fp.select(F.col("source").alias("src_b"), "f")
    return (
        a.join(b, "f")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").cast("bigint").alias("n_shared_fp"))
    )


# --------------------------------------------------------------------------
# Duplicate-cluster size histogram (count-of-counts over dup groups)
# --------------------------------------------------------------------------


@query(
    "dedup_cluster_size_histogram",
    oracle=f"""
    WITH g AS (SELECT {_FP_SQL} AS f, COUNT(*) AS sz FROM documents GROUP BY 1)
    SELECT sz AS cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
           CAST(SUM(sz) AS BIGINT) AS n_docs,
           CAST(SUM(sz) - COUNT(*) AS BIGINT) AS n_removable
    FROM g GROUP BY sz
    """,
)
def dedup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size distribution of exact-duplicate groups (count-of-counts over
    content fingerprints) with the per-size removable-row count — the
    one-page answer to "how much does dedup save us, and is it a few huge
    clusters or a long tail?"  ``n_removable = n_docs - n_clusters`` is the
    rows a keep-one-per-cluster pass deletes.

    Scale: two map-side-combining hash aggregates (fingerprint, then
    size) — the second input is already collapsed to one row per distinct
    fingerprint; no joins, no windows.  The same shape as TPC-H Q13's
    count-of-counts, pointed at the dedup ledger.
    """
    d = load_table(spark, sf_dir, "documents")
    g = (
        d.select(tx.fingerprint("text").alias("f"))
        .groupBy("f")
        .agg(F.count("*").alias("sz"))
    )
    return g.groupBy(F.col("sz").alias("cluster_size")).agg(
        F.count("*").cast("bigint").alias("n_clusters"),
        F.sum("sz").cast("bigint").alias("n_docs"),
        (F.sum("sz") - F.count("*")).cast("bigint").alias("n_removable"),
    )


# --------------------------------------------------------------------------
# Seasonal (hour-of-day) profile + residuals
# --------------------------------------------------------------------------


@query(
    "timeseries_seasonal_profile",
    oracle="""
    WITH e AS (
      SELECT event_id, event_type, value,
             EXTRACT(HOUR FROM ts) AS hod
      FROM events),
    prof AS (
      SELECT event_type, hod,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*)
                 AS raw_mean
      FROM e GROUP BY event_type, hod)
    SELECT e.event_id, e.event_type, CAST(e.hod AS BIGINT) AS hod, e.value,
           ROUND(p.raw_mean, 6) AS seasonal_mean,
           ROUND(e.value - ROUND(p.raw_mean, 6), 6) AS residual
    FROM e JOIN prof p USING (event_type, hod)
    """,
)
def timeseries_seasonal_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal decomposition, additive hour-of-day model: per (event_type,
    hour) seasonal mean and per-event residual value − seasonal(type, hour)
    — the de-seasonalization step before any anomaly threshold is applied
    to diurnal metrics (the calendar twin of ``events_rolling_anomaly``'s
    rolling window).

    Determinism: the seasonal mean is an exact DECIMAL sum / count rounded
    at scale 6 BEFORE the residual subtraction, so residuals are identical
    doubles on both engines.

    Scale: one map-side-combining aggregate on the bounded
    (type × 24-hour) key, broadcast back onto the events in a map-only
    join — events are scanned twice, shuffled never.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select(
        "event_id", "event_type", "value", F.hour("ts").alias("hod")
    )
    prof = e.groupBy("event_type", "hod").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("seasonal_mean")
    )
    return e.join(F.broadcast(prof), ["event_type", "hod"]).select(
        "event_id",
        "event_type",
        F.col("hod").cast("bigint").alias("hod"),
        "value",
        "seasonal_mean",
        F.round(F.col("value") - F.col("seasonal_mean"), 6).alias("residual"),
    )


# --------------------------------------------------------------------------
# Per-source quantile normalization of a score column
# --------------------------------------------------------------------------


@query(
    "score_quantile_normalize",
    oracle="""
    SELECT doc_id, source, n_chars,
           ROUND(PERCENT_RANK() OVER (PARTITION BY source
                                      ORDER BY n_chars, doc_id), 6) AS pr
    FROM documents
    """,
)
def score_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile (rank) normalization of a per-document score WITHIN each
    source: PERCENT_RANK over (source, score) — the transform that makes
    quality scores comparable ACROSS sources whose raw score scales differ
    (a prerequisite for any global quality threshold on a mixed corpus;
    CCNet normalizes per-language the same way).

    Determinism: PERCENT_RANK over a deterministic total order (score,
    doc_id) is exact rational (rank-1)/(n-1) — the single emitted double
    is rounded.

    Scale: one window partitioned BY THE NORMALIZATION KEY (source) —
    a single shuffle on a bounded-cardinality key; no global ordering.
    Skewed mega-sources sort within their partition only.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    return d.select(
        "doc_id",
        "source",
        "n_chars",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


# --------------------------------------------------------------------------
# Length-distribution-matching resample
# --------------------------------------------------------------------------

_MATCH_BINS = 10


@query(
    "length_match_resample",
    oracle=f"""
    WITH binned AS (
      SELECT doc_id, source,
             NTILE({_MATCH_BINS}) OVER (ORDER BY n_chars, doc_id) AS decile
      FROM documents),
    src_n AS (SELECT source, COUNT(*) AS ns FROM binned GROUP BY source),
    ranked AS (
      SELECT b.doc_id, b.source, b.decile, s.ns,
             ROW_NUMBER() OVER (
               PARTITION BY b.source, b.decile
               ORDER BY {_BUCKET_SQL.format(c="b.doc_id")}, b.doc_id) AS rk
      FROM binned b JOIN src_n s USING (source))
    SELECT doc_id, source, decile
    FROM ranked
    WHERE rk * {_MATCH_BINS} <= ns + {_MATCH_BINS} - 1
    """,
)
def length_match_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-matching resample: cap every source's contribution to
    each corpus-wide length decile at ceil(|source| / {10}) documents,
    chosen in deterministic hash order — flattening each source's length
    profile toward the corpus deciles (the covariate-balancing trick used
    when one feed is all-tweets and another all-books).  The keep rule
    ``rk·B ≤ ns+B-1`` is exact-integer ceil(ns/B) — no float rates, no
    seeded sampling, retry-safe.

    Scale: the decile assignment is a corpus-wide exact NTILE via
    operators/rank.py ``global_ntile`` (uniform n_chars buckets —
    one hash shuffle, no single-partition stage even over the full
    corpus).  Everything else is one aggregate + one window partitioned
    by (source, decile) — the selection key itself, so skew self-heals
    at the rank filter exactly like ``domain_cap_filter``.
    """
    d = load_table(spark, sf_dir, "documents")
    binned = global_ntile(
        with_uniform_key_buckets(
            d.select("doc_id", "source", "n_chars"), "n_chars"
        ),
        _MATCH_BINS,
        [F.col("n_chars").asc(), F.col("doc_id").asc()],
        F.col("_gbk"),
        bucket_col="decile",
    ).select("doc_id", "source", "decile")
    src_n = binned.groupBy("source").agg(F.count("*").alias("ns"))
    w = Window.partitionBy("source", "decile").orderBy(
        _bucket(F.col("doc_id")), "doc_id"
    )
    return (
        binned.join(F.broadcast(src_n), "source")
        .select(
            "doc_id", "source", "decile", "ns",
            F.row_number().over(w).alias("rk"),
        )
        .filter(F.col("rk") * _MATCH_BINS <= F.col("ns") + (_MATCH_BINS - 1))
        .select("doc_id", "source", "decile")
    )


# --------------------------------------------------------------------------
# N-gram novelty rate (corpus redundancy growth curve)
# --------------------------------------------------------------------------


@query(
    "ngram_novelty_rate",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_G3} AS g FROM documents),
    sh AS (SELECT doc_id, UNNEST(g) AS s FROM t),
    first_seen AS (SELECT s, MIN(doc_id) AS first_doc FROM sh GROUP BY s)
    SELECT sh.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(CASE WHEN f.first_doc < sh.doc_id THEN 0 ELSE 1 END)
                AS BIGINT) AS n_novel,
           ROUND(CAST(SUM(CASE WHEN f.first_doc < sh.doc_id THEN 0 ELSE 1 END)
                      AS DOUBLE) / COUNT(*), 6) AS novelty
    FROM sh JOIN first_seen f USING (s)
    GROUP BY sh.doc_id
    """,
)
def ngram_novelty_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty: the fraction of a document's distinct
    3-gram shingles whose FIRST corpus occurrence (by doc_id order) is this
    document — the redundancy-growth curve data engineers plot to decide
    when additional crawl of a source stops adding information (novelty
    decays toward 0 as a source saturates).

    Scale: one explode to (doc, shingle), a map-side-combining MIN per
    shingle (term-keyed, uniform), and an equi-join back on the shingle —
    the same linear inverted-index shape as the dedup family; no pairwise
    comparisons anywhere.  Streaming twin: keep ``first_seen`` as the
    persisted state store and the novelty of each new batch is
    batch-sized work (the ``incremental_corpus_dedup`` posture).
    """
    d = load_table(spark, sf_dir, "documents")
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(tx.shingles(tx.tokens("text"), 3))).alias("s"),
    )
    first_seen = sh.groupBy("s").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") < F.col("doc_id"), 0).otherwise(1)
    return (
        sh.join(first_seen, "s")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_shingles"),
            F.sum(novel).cast("bigint").alias("n_novel"),
            F.round(
                F.sum(novel).cast("double") / F.count("*"), 6
            ).alias("novelty"),
        )
    )


# --------------------------------------------------------------------------
# Join-key skew diagnostic
# --------------------------------------------------------------------------

_SKEW_TOPN = 20


@query(
    "key_skew_profile",
    oracle=f"""
    WITH k AS (SELECT l_orderkey, COUNT(*) AS n FROM lineitem GROUP BY 1),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total,
                   CAST(COUNT(*) AS BIGINT) AS n_keys FROM k),
    top AS (
      SELECT l_orderkey, n, ROW_NUMBER() OVER (ORDER BY n DESC, l_orderkey)
                 AS rk
      FROM k ORDER BY n DESC, l_orderkey LIMIT {_SKEW_TOPN})
    SELECT t.l_orderkey, CAST(t.n AS BIGINT) AS n, t.rk,
           tot.total, tot.n_keys,
           ROUND(CAST(t.n AS DOUBLE) / tot.total, 6) AS share
    FROM top t, tot
    """,
)
def key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew diagnostic: the top-{20} heaviest l_orderkey values
    with their row share of the table, plus total rows and distinct-key
    count — the pre-join audit that decides whether a key needs salting
    (``operators/skew.py``) or AQE skew-join before the shuffle is paid.
    A healthy uniform key shows share ≈ total/n_keys/total; a hot key
    shows up immediately.

    Scale: one map-side-combining count per key, a top-{20}
    TakeOrderedAndProject (never a global sort), and a 1-row totals
    broadcast — the diagnostic costs one linear scan regardless of table
    size, which is the point: it must be cheap enough to run BEFORE every
    expensive join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    k = li.groupBy("l_orderkey").agg(F.count("*").alias("n"))
    tot = k.agg(
        F.sum("n").cast("bigint").alias("total"),
        F.count("*").cast("bigint").alias("n_keys"),
    )
    top = (
        k.orderBy(F.col("n").desc(), "l_orderkey")
        .limit(_SKEW_TOPN)
        .select(
            "l_orderkey",
            F.col("n").cast("bigint").alias("n"),
            F.row_number()
            .over(Window.orderBy(F.col("n").desc(), "l_orderkey"))
            .alias("rk"),
        )
    )
    return top.crossJoin(F.broadcast(tot)).select(
        "l_orderkey",
        "n",
        "rk",
        "total",
        "n_keys",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
    )


# --------------------------------------------------------------------------
# CUSUM changepoint detection on the hourly event-rate series
# --------------------------------------------------------------------------

_CUSUM_H = 3.0  # alarm threshold in global-sigma units


@query(
    "cusum_changepoints",
    oracle=f"""
    WITH hourly AS (
      SELECT DATE_TRUNC('hour', ts) AS hour, COUNT(*) AS n_events
      FROM events GROUP BY 1),
    stats AS (
      SELECT CAST(SUM(CAST(n_events AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(n_events * n_events AS DECIMAL(28,4))) AS DOUBLE)
                 AS s2,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM hourly),
    params AS (
      SELECT ROUND(s1 / m, 6) AS mu,
             ROUND(SQRT((s2 - s1 * s1 / m) / (m - 1)), 6) AS sigma
      FROM stats),
    cusum AS (
      SELECT h.hour, CAST(h.n_events AS BIGINT) AS n_events,
             CAST(ROUND(SUM(CAST(h.n_events - p.mu AS DECIMAL(28,6)))
                        OVER (ORDER BY h.hour ROWS UNBOUNDED PRECEDING), 4)
                  AS DOUBLE) AS s,
             p.mu, p.sigma
      FROM hourly h, params p)
    SELECT hour, n_events, s AS cusum, mu, sigma,
           ABS(s) > {_CUSUM_H} * sigma AS alarm
    FROM cusum
    """,
)
def cusum_changepoints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the hourly event-rate series: the
    cumulative sum of deviations from the global mean rate, alarmed when
    it drifts beyond {3}·sigma — the classic sequential drift detector
    (Page 1954) that catches slow rate shifts a per-point z-score misses
    (the level-shift complement of ``events_rolling_anomaly``).

    Determinism: hourly counts are exact integers; mu/sigma are rounded at
    scale 6 BEFORE the deviations, each deviation is one identical double
    cast to DECIMAL(28,6), and the running sum is an exact decimal window
    over a deterministic hour order — order-fixed on both engines; the
    alarm compares the ROUNDed cusum against sigma-derived threshold built
    from identical doubles.

    Scale: events collapse to the HOURLY aggregate first (map-side
    combining on the hour key); stats are a 1-row broadcast; the running
    sum windows over the hour-count table (calendar-sized, not
    event-sized).  For multi-year series, partition the window by
    (series, year) with carried offsets — the documented two-stage
    prefix-sum pattern.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.date_trunc("hour", "ts").alias("hour")).agg(
        F.count("*").alias("n_events")
    )
    stats = hourly.agg(
        F.sum(F.col("n_events").cast("decimal(18,4)")).cast("double").alias("s1"),
        F.sum((F.col("n_events") * F.col("n_events")).cast("decimal(28,4)"))
        .cast("double")
        .alias("s2"),
        F.count("*").cast("bigint").alias("m"),
    )
    params = stats.select(
        F.round(F.col("s1") / F.col("m"), 6).alias("mu"),
        F.round(
            F.sqrt(
                (F.col("s2") - F.col("s1") * F.col("s1") / F.col("m"))
                / (F.col("m") - 1)
            ),
            6,
        ).alias("sigma"),
    )
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    # ROUND in the DECIMAL domain, then one exact cast out: decimal→double
    # conversion of a scale-4 value is a single exact-int divide on both
    # engines, whereas rounding after the double cast can straddle a
    # half-tie by one ulp across engines.
    cusum = (
        hourly.crossJoin(F.broadcast(params))
        .select(
            "hour",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(
                F.sum(
                    (F.col("n_events") - F.col("mu")).cast("decimal(28,6)")
                ).over(w),
                4,
            )
            .cast("double")
            .alias("s"),
            "mu",
            "sigma",
        )
    )
    return cusum.select(
        "hour",
        "n_events",
        F.col("s").alias("cusum"),
        "mu",
        "sigma",
        (F.abs("s") > F.lit(_CUSUM_H) * F.col("sigma")).alias("alarm"),
    )


# --------------------------------------------------------------------------
# Generic column profiler (df.describe as a first-class relational op)
# --------------------------------------------------------------------------

#: (column, numeric-projection SQL or None) — timestamps profile as epoch-µs.
_PROFILE_COLS = (
    ("o_orderkey", "o_orderkey"),
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", None),
    ("o_totalprice", "o_totalprice"),
    ("o_orderdate", "EPOCH_US(o_orderdate)"),
    ("o_orderpriority", None),
)


@query(
    "table_profile_orders",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{c}' AS col_name, CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {f"CAST(MIN({num}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"}
               AS min_num,
           {f"CAST(MAX({num}) AS DOUBLE)" if num else "CAST(NULL AS DOUBLE)"}
               AS max_num
    FROM orders"""
        for c, num in _PROFILE_COLS
    ),
)
def table_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiler over the orders table: per column, row count, null
    count, exact distinct count, and numeric min/max (timestamps as epoch
    microseconds; free-text columns profile counts only) — the
    data-profiling primitive behind catalog statistics, DQ baselines, and
    schema-drift monitors, long-form so it unions across tables.

    Scale: one scan; per-column aggregates are map-side combining and the
    exact COUNT(DISTINCT) per column expands rows |cols|-fold in one
    hash aggregate (Spark's multi-distinct expand) — at 100 TB swap exact
    distinct for HLL (``agg_approx_count_distinct`` anchor) column by
    column; min/max/null-counts stay exact either way.
    """
    o = load_table(spark, sf_dir, "orders")
    parts = []
    for c, num in _PROFILE_COLS:
        # fixtures store TIMESTAMP_NTZ; session TZ is UTC, so the cast to
        # TIMESTAMP reads the same wall-clock instant DuckDB's EPOCH_US sees
        num_col = (
            F.unix_micros(F.col(c).cast("timestamp")) if num and "EPOCH" in num
            else (F.col(c).cast("double") if num else F.lit(None).cast("double"))
        )
        parts.append(
            o.agg(
                F.lit(c).alias("col_name"),
                F.count("*").cast("bigint").alias("n_rows"),
                (F.count("*") - F.count(c)).cast("bigint").alias("n_null"),
                F.countDistinct(c).cast("bigint").alias("n_distinct"),
                F.min(num_col).cast("double").alias("min_num"),
                F.max(num_col).cast("double").alias("max_num"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# --------------------------------------------------------------------------
# Exactly-checkable SimHash near-dup pairs (md5 hash family)
# --------------------------------------------------------------------------

_SH_BITS = 16
_SH_HAM = 2  # near-dup threshold; 3 blocks guarantee recall by pigeonhole
# CONTRACT anchor slice (plans/anchors.py, active in every mode).  The pair
# count of a lossless near-dup query is inherently quadratic in duplicate
# density, and a 16-bit signature space saturates on corpus-sized inputs
# (at sf0.1 the TRUE result exceeds the harness's 2M-row comparator bound).
# Bounding the anchor to a fixed id range caps the worst case at
# n(n-1)/2 = 1,999,000 rows <= the bound even on an all-duplicate
# adversarial corpus, while leaving driver-scale results bit-identical
# (sf0.001/sf0.01 have 500 docs, all < 2000).  The corpus-scale SimHash
# path is ``dedup_simhash`` (rows-only, 64-bit space, UNBOUNDED).
_SH_MAX_DOCS = 2000
_SH_SLICE = anchors.AnchorSlice("doc_id", _SH_MAX_DOCS, kind="contract")

_SH_H = "TRY_CAST(CONCAT('0x', SUBSTRING(MD5(tok), 1, 15)) AS BIGINT)"
_SH_SIG = " + ".join(
    f"CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END" for b in range(_SH_BITS)
)
_SH_SUMS = ",\n             ".join(
    f"SUM(CASE WHEN ({_SH_H} >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
    for b in range(_SH_BITS)
)


@query(
    "simhash_exact_pairs",
    oracle=f"""
    WITH tok_t AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT({_TOKS})) AS tok FROM documents
      WHERE {_SH_SLICE.sql}),
    sums AS (
      SELECT doc_id,
             {_SH_SUMS}
      FROM tok_t GROUP BY doc_id),
    sig_t AS (SELECT doc_id, {_SH_SIG} AS sig FROM sums),
    blocks AS (
      SELECT doc_id, 0 AS blk, sig & 63 AS v FROM sig_t
      UNION ALL SELECT doc_id, 1, (sig >> 6) & 31 FROM sig_t
      UNION ALL SELECT doc_id, 2, (sig >> 11) & 31 FROM sig_t),
    cands AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM blocks l JOIN blocks r ON l.blk = r.blk AND l.v = r.v
      WHERE l.doc_id < r.doc_id)
    SELECT c.a, c.b,
           CAST(BIT_COUNT(XOR(sa.sig, sb.sig)) AS BIGINT) AS hamming
    FROM cands c
    JOIN sig_t sa ON sa.doc_id = c.a
    JOIN sig_t sb ON sb.doc_id = c.b
    WHERE BIT_COUNT(XOR(sa.sig, sb.sig)) <= {_SH_HAM}
    """,
)
def simhash_exact_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-duplicate pairs with an ENGINE-PORTABLE hash family:
    {16}-bit signatures from per-token md5 bit votes (weight 1 per distinct
    token), candidate pairs from 3-block banding (pigeonhole: any pair at
    Hamming ≤ {2} shares a block — lossless recall), verified with
    BIT_COUNT(XOR).  This is the exactly-differential-testable twin of the
    xxhash64-based ``dedup_simhash`` (rows-only by hash family): same
    algorithm, oracle-checkable end to end, so the SimHash family gets a
    value-level anchor the way minhash has ``near_dup_pairs_lsh``.  The
    anchor reads an SF-independent ``doc_id < {_SH_MAX_DOCS}`` CONTRACT
    slice (``plans/anchors.py``, active in every mode — an exact all-pairs
    ground truth is quadratic by definition) so its worst-case output stays
    under the harness comparator bound at every scale; see ``_SH_MAX_DOCS``.
    Corpus-scale SimHash semantics live in the unbounded ``dedup_simhash``.

    Scale: signature build is one explode + a {16}-way conditional
    map-side-combining sum per doc (one pass, no joins); candidate
    generation is an EQUI-join on (block, value) — never all-pairs; the
    verify join touches candidates only.  Identical posture to the LSH
    band join, with a 3-block banding guarantee instead of probabilistic
    recall.
    """
    d = _SH_SLICE.apply(load_table(spark, sf_dir, "documents"))
    toks = d.select(
        "doc_id", F.explode(F.array_distinct(tx.tokens("text"))).alias("tok")
    )
    h = _bucket(F.col("tok"))
    sums = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(_SH_BITS)
        ]
    )
    sig = sums.select(
        "doc_id",
        sum(
            [
                F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
                for b in range(_SH_BITS)
            ],
            F.lit(0),
        ).alias("sig"),
    )
    blocks = (
        sig.select("doc_id", F.lit(0).alias("blk"), F.col("sig").bitwiseAND(F.lit(63)).alias("v"))
        .unionByName(
            sig.select(
                "doc_id",
                F.lit(1).alias("blk"),
                F.shiftright("sig", 6).bitwiseAND(F.lit(31)).alias("v"),
            )
        )
        .unionByName(
            sig.select(
                "doc_id",
                F.lit(2).alias("blk"),
                F.shiftright("sig", 11).bitwiseAND(F.lit(31)).alias("v"),
            )
        )
    )
    l = blocks.select(F.col("doc_id").alias("a"), "blk", "v")
    r = blocks.select(F.col("doc_id").alias("b"), "blk", "v")
    cands = (
        l.join(r, ["blk", "v"]).filter(F.col("a") < F.col("b")).select("a", "b").distinct()
    )
    sa = sig.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"))
    sb = sig.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"))
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        cands.join(sa, "a")
        .join(sb, "b")
        .filter(ham <= _SH_HAM)
        .select("a", "b", ham.cast("bigint").alias("hamming"))
    )


# --------------------------------------------------------------------------
# Flesch reading-ease scoring
# --------------------------------------------------------------------------


@query(
    "text_readability_flesch",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             LEN({_TOKS}) AS words,
             GREATEST(LEN(REGEXP_EXTRACT_ALL(text, '[.!?]+')), 1) AS sents,
             LEN(REGEXP_EXTRACT_ALL(text, '[aeiouyAEIOUY]+')) AS sylls
      FROM documents)
    SELECT doc_id, CAST(words AS BIGINT) AS words,
           CAST(sents AS BIGINT) AS sents, CAST(sylls AS BIGINT) AS sylls,
           ROUND(206.835 - 1.015 * (CAST(words AS DOUBLE) / sents)
                 - 84.6 * (CAST(sylls AS DOUBLE) / words), 4) AS flesch
    FROM t WHERE words > 0
    """,
)
def text_readability_flesch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease score per document: 206.835 − 1.015·(words/
    sentences) − 84.6·(syllables/words), with sentences counted as
    terminal-punctuation runs and syllables approximated as vowel groups
    (the standard regex surrogate; documented heuristic, deterministic).
    The readability gate curation teams run next to the Gopher rules —
    kids-content filters, textbook-style selection, "too-hard" triage.

    Determinism: all three counts are exact integers from identical RE2-
    compatible regexes; the score is three IEEE ops on identical doubles,
    rounded.  Scale: shuffle-free map-only projection, whole-stage
    codegen'd — the cheapest possible per-doc op.
    """
    d = load_table(spark, sf_dir, "documents")
    words = F.size(tx.tokens("text"))
    sents = F.greatest(F.regexp_count("text", F.lit(r"[.!?]+")), F.lit(1))
    sylls = F.regexp_count("text", F.lit("[aeiouyAEIOUY]+"))
    return d.filter(words > 0).select(
        "doc_id",
        words.cast("bigint").alias("words"),
        sents.cast("bigint").alias("sents"),
        sylls.cast("bigint").alias("sylls"),
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words.cast("double") / sents)
            - F.lit(84.6) * (sylls.cast("double") / words),
            4,
        ).alias("flesch"),
    )


# --------------------------------------------------------------------------
# Pearson correlation matrix (exact-decimal moment sums)
# --------------------------------------------------------------------------

_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_sql(a: str, b: str) -> str:
    return f"""
    SELECT '{a}' AS col_a, '{b}' AS col_b,
           ROUND((n * s_{a}_{b} - s_{a} * s_{b})
                 / SQRT((n * s_{a}_{a} - s_{a} * s_{a})
                        * (n * s_{b}_{b} - s_{b} * s_{b})), 6) AS corr
    FROM moments"""


@query(
    "correlation_matrix",
    oracle=(
        "WITH moments AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n, "
        + ", ".join(
            f"CAST(SUM(CAST({c} AS DECIMAL(28,6))) AS DOUBLE) AS s_{c}"
            for c in _CORR_COLS
        )
        + ", "
        + ", ".join(
            f"CAST(SUM(CAST({a} * {b} AS DECIMAL(38,8))) AS DOUBLE) AS s_{a}_{b}"
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i:]
        )
        + " FROM lineitem)"
        + "\nUNION ALL".join(
            _corr_sql(a, b)
            for i, a in enumerate(_CORR_COLS)
            for b in _CORR_COLS[i + 1 :]
        )
    ),
)
def correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the lineitem numeric measures, via
    the closed-form moment sums (n·Sxy − SxSy)/√((n·Sxx−Sx²)(n·Syy−Sy²)) —
    the feature-redundancy screen every modeling pipeline runs before
    training (and the statistic engines expose as CORR, here made
    cross-engine-exact instead of float-order-dependent).

    Determinism: every moment is an exact DECIMAL sum of per-row IEEE
    products (order-independent); each correlation is identical double
    arithmetic rounded at scale 6 — unlike built-in CORR, whose streaming
    accumulation is partition-order-dependent.

    Scale: ONE map-side-combining aggregate computes all {4 + 10} moments
    in a single scan; the matrix assembly is row construction over a 1-row
    frame.  No shuffle beyond the scalar aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(
            F.sum(F.col(c).cast("decimal(28,6)")).cast("double").alias(f"s_{c}")
        )
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum((F.col(a) * F.col(b)).cast("decimal(38,8)"))
                .cast("double")
                .alias(f"s_{a}_{b}")
            )
    m = li.agg(*aggs)
    outs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            num = F.col("n") * F.col(f"s_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            den = F.sqrt(
                (F.col("n") * F.col(f"s_{a}_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * (F.col("n") * F.col(f"s_{b}_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            )
            outs.append(
                m.select(
                    F.lit(a).alias("col_a"),
                    F.lit(b).alias("col_b"),
                    F.round(num / den, 6).alias("corr"),
                )
            )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


# --------------------------------------------------------------------------
# Grouped OLS regression (closed form)
# --------------------------------------------------------------------------


@query(
    "ols_regression_by_group",
    oracle="""
    WITH m AS (
      SELECT l_returnflag,
             CAST(COUNT(*) AS DOUBLE) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sx,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sy,
             CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,8))) AS DOUBLE)
                 AS sxx,
             CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,8)))
                  AS DOUBLE) AS syy,
             CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,8)))
                  AS DOUBLE) AS sxy
      FROM lineitem GROUP BY l_returnflag)
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
           ROUND(sy / n - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx / n, 6)
               AS intercept,
           ROUND(((n * sxy - sx * sy) * (n * sxy - sx * sy))
                 / ((n * sxx - sx * sx) * (n * syy - sy * sy)), 6) AS r2
    FROM m
    """,
)
def ols_regression_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group ordinary-least-squares fit of extended price against
    quantity (slope, intercept, R²) from closed-form moment sums — the
    grouped-regression primitive engines expose as REGR_SLOPE /
    REGR_INTERCEPT / REGR_R2, here cross-engine-exact via DECIMAL moments
    instead of order-dependent streaming accumulators.

    Scale: one map-side-combining aggregate per group key computes all six
    moments in a single scan; the fit is per-group scalar arithmetic.
    The same shape fits millions of group keys — moments are mergeable, so
    partial aggregation and AQE skew handling apply as to any hash agg.
    """
    li = load_table(spark, sf_dir, "lineitem")
    m = li.groupBy("l_returnflag").agg(
        F.count("*").cast("double").alias("n"),
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("sx"),
        F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double").alias("sy"),
        F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(38,8)"))
        .cast("double")
        .alias("sxx"),
        F.sum(
            (F.col("l_extendedprice") * F.col("l_extendedprice")).cast(
                "decimal(38,8)"
            )
        )
        .cast("double")
        .alias("syy"),
        F.sum(
            (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(38,8)")
        )
        .cast("double")
        .alias("sxy"),
    )
    cov = F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")
    varx = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    vary = F.col("n") * F.col("syy") - F.col("sy") * F.col("sy")
    slope = cov / varx
    return m.select(
        "l_returnflag",
        F.col("n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(F.col("sy") / F.col("n") - slope * F.col("sx") / F.col("n"), 6)
        .alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )


# --------------------------------------------------------------------------
# Benford first-digit audit
# --------------------------------------------------------------------------


@query(
    "benford_digit_test",
    oracle="""
    WITH cents AS (
      SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
      FROM orders WHERE o_totalprice > 0),
    digits AS (
      SELECT CAST(SUBSTRING(CAST(c AS VARCHAR), 1, 1) AS INT) AS digit
      FROM cents),
    obs AS (SELECT digit, COUNT(*) AS n FROM digits GROUP BY digit),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM obs)
    SELECT o.digit, CAST(o.n AS BIGINT) AS n,
           ROUND(CAST(o.n AS DOUBLE) / t.total, 6) AS obs_share,
           ROUND(LOG10(1.0 + 1.0 / o.digit), 6) AS exp_share,
           ROUND(POWER(CAST(o.n AS DOUBLE) / t.total
                       - ROUND(LOG10(1.0 + 1.0 / o.digit), 6), 2)
                 / ROUND(LOG10(1.0 + 1.0 / o.digit), 6), 6) AS chi2_term
    FROM obs o, tot t
    """,
)
def benford_digit_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals: observed vs
    expected log10(1+1/d) share per leading digit plus the per-digit χ²
    contribution — the classic fraud/fabrication screen on financial
    columns (synthetic or tampered values drift from the Benford curve).

    Determinism: the leading digit goes through exact integer cents and
    INTEGER→string (never double formatting); shares divide exact counts;
    the expected share is rounded at scale 6 BEFORE the χ² arithmetic so
    a last-ulp libm LOG10 difference can never surface.

    Scale: one map-only digit projection + a 9-key map-side-combining
    count + a 1-row total broadcast.
    """
    o = load_table(spark, sf_dir, "orders")
    cents = o.filter(F.col("o_totalprice") > 0).select(
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("c")
    )
    digits = cents.select(
        F.substring(F.col("c").cast("string"), 1, 1).cast("int").alias("digit")
    )
    obs = digits.groupBy("digit").agg(F.count("*").alias("n"))
    tot = obs.agg(F.sum("n").cast("bigint").alias("total"))
    exp_share = F.round(F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit")), 6)
    obs_share = F.col("n").cast("double") / F.col("total")
    return obs.crossJoin(F.broadcast(tot)).select(
        "digit",
        F.col("n").cast("bigint").alias("n"),
        F.round(obs_share, 6).alias("obs_share"),
        exp_share.alias("exp_share"),
        F.round(F.pow(obs_share - exp_share, 2) / exp_share, 6).alias(
            "chi2_term"
        ),
    )


# --------------------------------------------------------------------------
# Gini concentration coefficient
# --------------------------------------------------------------------------


@query(
    "gini_concentration",
    oracle="""
    WITH rev AS (
      SELECT l_suppkey,
             SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                 * CAST(1 - l_discount AS DECIMAL(12,2))) AS r
      FROM lineitem GROUP BY l_suppkey),
    ranked AS (
      SELECT r, ROW_NUMBER() OVER (ORDER BY r, l_suppkey) AS i FROM rev),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(r) AS DOUBLE) AS total,
             CAST(SUM(i * r) AS DOUBLE) AS weighted
      FROM ranked)
    SELECT n AS n_suppliers,
           CAST(ROUND(SUM(r), 4) AS DOUBLE) AS total_rev,
           ROUND(2.0 * (SELECT weighted FROM s)
                 / ((SELECT n FROM s) * (SELECT total FROM s))
                 - (CAST((SELECT n FROM s) AS DOUBLE) + 1)
                   / (SELECT n FROM s), 6) AS gini
    FROM rev, s
    GROUP BY n
    """,
)
def gini_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of supplier revenue concentration:
    G = 2·Σᵢ i·xᵢ / (n·Σ xᵢ) − (n+1)/n over ascending-sorted revenues —
    the one-number inequality metric platform teams track for marketplace
    concentration and corpus teams for source-domination (0 = uniform,
    →1 = winner-take-all; complements `source_reputation`/
    `domain_cap_filter` with a headline number).

    Determinism: revenues and the rank-weighted sum stay in EXACT decimal
    (rank is an exact integer; i·xᵢ is a decimal product), ordering has a
    total tie-break, and the final G is one rounded double expression.

    Scale: the sort/rank runs over the SUPPLIER-sized aggregate, not
    lineitem — and uses the two-stage prefix-rank FOR REAL
    (operators/rank.py ``attach_global_rank`` over uniform revenue
    buckets), so a supplier catalog that grows with the corpus never
    single-partitions.  Output is one row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
        ).alias("r")
    )
    ranked = attach_global_rank(
        with_uniform_key_buckets(
            rev.withColumn("_rd", F.col("r").cast("double")), "_rd"
        ),
        [F.col("r").asc(), F.col("l_suppkey").asc()],
        F.col("_gbk"),
        rank_col="i",
    ).select("r", "i")
    s = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("r").cast("double").alias("total"),
        F.sum(F.col("i") * F.col("r")).cast("double").alias("weighted"),
        F.round(F.sum("r"), 4).cast("double").alias("total_rev"),
    )
    return s.select(
        F.col("n").alias("n_suppliers"),
        "total_rev",
        F.round(
            F.lit(2.0) * F.col("weighted") / (F.col("n") * F.col("total"))
            - (F.col("n").cast("double") + 1) / F.col("n"),
            6,
        ).alias("gini"),
    )


# --------------------------------------------------------------------------
# Max token run-length (degenerate-repetition QA)
# --------------------------------------------------------------------------


@query(
    "max_token_runlength",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    pos AS (
      SELECT doc_id, UNNEST(g.i) AS i,
             toks[UNNEST(g.i)] AS tok
      FROM t, LATERAL (SELECT RANGE(1, LEN(toks) + 1) AS i) g),
    runs AS (
      SELECT doc_id, i, tok,
             CASE WHEN LAG(tok) OVER (PARTITION BY doc_id ORDER BY i) = tok
                  THEN 0 ELSE 1 END AS brk
      FROM pos),
    segs AS (
      SELECT doc_id, tok,
             SUM(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS seg
      FROM runs),
    seg_len AS (
      SELECT doc_id, COUNT(*) AS run_len FROM segs GROUP BY doc_id, seg)
    SELECT t.doc_id, CAST(LEN(t.toks) AS BIGINT) AS n_toks,
           CAST(COALESCE(m.max_run, 0) AS BIGINT) AS max_run,
           COALESCE(m.max_run, 0) >= 8 AS degenerate
    FROM t LEFT JOIN (SELECT doc_id, MAX(run_len) AS max_run
                      FROM seg_len GROUP BY doc_id) m USING (doc_id)
    """,
)
def max_token_runlength(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest consecutive same-token run per document — the degenerate-
    repetition detector ("the the the the …") that catches both broken
    scrapers and model-generated loop text; flagged at run ≥ 8 (the
    synthetic-data QA gate next to ``doc_repetition_signals``'s n-gram
    fractions, which normalize away exactly this adjacency structure).

    Implementation is a single shuffle-free ``aggregate`` fold over the
    token array (state = (prev, run, best) carried left-to-right), so the
    whole operator is a map-only projection — the oracle computes the
    identical quantity with the LAG/running-sum segmentation idiom,
    pinning that the fold equals the relational formulation.

    Scale: no explode, no window, no shuffle — per-row array fold in the
    JVM; the cheapest shape for a per-doc sequence statistic.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens("text")
    init = F.struct(
        F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
    )
    def step(acc, tok):
        run = F.when(tok == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            tok.alias("prev"),
            run.alias("run"),
            F.greatest(acc["best"], run).alias("best"),
        )
    max_run = F.aggregate(toks, init, step, lambda acc: acc["best"])
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_toks"),
        max_run.cast("bigint").alias("max_run"),
        (max_run >= 8).alias("degenerate"),
    )


# --------------------------------------------------------------------------
# Tokenizer fertility by language
# --------------------------------------------------------------------------

_BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@query(
    "tokenizer_fertility",
    oracle=f"""
    WITH t AS (
      SELECT lang,
             LEN({_TOKS}) AS words,
             LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_RE}')) AS bpe_toks,
             n_chars
      FROM documents)
    SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(words) AS BIGINT) AS n_words,
           CAST(SUM(bpe_toks) AS BIGINT) AS n_bpe_tokens,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           ROUND(CAST(SUM(bpe_toks) AS DOUBLE) / SUM(words), 6) AS fertility,
           ROUND(CAST(SUM(n_chars) AS DOUBLE) / SUM(bpe_toks), 6)
               AS chars_per_token
    FROM t GROUP BY lang
    """,
)
def tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility card per language: BPE-ish tokens per whitespace
    word and characters per token — the efficiency metric (mT5/XLM-R
    papers) that tells a training team which languages pay a token tax
    under the current tokenizer and need vocab rebalancing (reads straight
    into ``mixture_temperature_weights`` decisions).

    Determinism: all counts exact integers from identical RE2-compatible
    regexes; two rounded divisions.  Scale: shuffle-free per-doc counting
    folded into one map-side-combining aggregate on the bounded lang key.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "lang",
        F.size(tx.tokens("text")).alias("words"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_RE), F.lit(0))).alias(
            "bpe_toks"
        ),
        "n_chars",
    )
    return t.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("words").cast("bigint").alias("n_words"),
        F.sum("bpe_toks").cast("bigint").alias("n_bpe_tokens"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
        F.round(
            F.sum("bpe_toks").cast("double") / F.sum("words"), 6
        ).alias("fertility"),
        F.round(
            F.sum("n_chars").cast("double") / F.sum("bpe_toks"), 6
        ).alias("chars_per_token"),
    )


# --------------------------------------------------------------------------
# Maximum inner-product search (MIPS) and pairwise-cosine calibration
# --------------------------------------------------------------------------

from lms_etl_pipeline_spark.operators import vectors as vec  # noqa: E402

_MIPS_QUERIES = 5
_MIPS_K = 5


@query(
    "knn_dot_product_mips",
    oracle=f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {_MIPS_QUERIES}),
    pairs AS (
      SELECT q.vec_id AS q_id, e.vec_id AS n_id,
             ROUND({vec.dot_sql('e.embedding', 'q.embedding', EMB_DIM)}, 6)
                 AS dot
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != q.vec_id),
    ranked AS (
      SELECT q_id, n_id, dot,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY dot DESC, n_id ASC) AS rk
      FROM pairs)
    SELECT q_id, n_id, rk, dot FROM ranked WHERE rk <= {_MIPS_K}
    """,
)
def knn_dot_product_mips(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum inner-product search (MIPS): exact top-{5} by RAW dot
    product per query vector — the retrieval metric recommendation scorers
    and learned-sparse models use (unlike cosine, magnitude matters, so
    high-norm items rank up; the metric twin of ``knn_cosine_exact`` that
    norm-normalization would erase).

    Determinism: the left-assoc double fold equals the oracle's explicit
    left-assoc sum chain bit-for-bit (the ``operators.vectors`` contract);
    ranking ties break on the id.

    Scale: bounded {5}-row query-set broadcast × one linear corpus scan —
    embarrassingly parallel, no N²; the approximate path at scale is the
    same IVF/LSH bucketing as cosine after the standard MIPS-to-cosine
    augmentation (append sqrt(M²-‖x‖²) as an extra dim), documented here
    as the composition route.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _MIPS_QUERIES).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_emb")
    )
    pairs = (
        e.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            F.col("vec_id").alias("n_id"),
            F.round(vec.dot(F.col("embedding"), F.col("q_emb")), 6).alias("dot"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("dot").desc(), F.col("n_id").asc())
    return pairs.select(
        "q_id", "n_id", F.row_number().over(w).alias("rk"), "dot"
    ).filter(F.col("rk") <= _MIPS_K)


_PAIR_BOUND = 200
_PAIR_THRESH = 0.4


@query(
    "embedding_pairwise_stats",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id < {_PAIR_BOUND}),
    pairs AS (
      SELECT ROUND(({vec.dot_sql('a.embedding', 'b.embedding', EMB_DIM)})
                 / (SQRT({vec.dot_sql('a.embedding', 'a.embedding', EMB_DIM)})
                    * SQRT({vec.dot_sql('b.embedding', 'b.embedding', EMB_DIM)})),
                 6) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
           ROUND(CAST(SUM(CAST(cosine AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_cos,
           MIN(cosine) AS min_cos, MAX(cosine) AS max_cos,
           CAST(SUM(CASE WHEN cosine >= {_PAIR_THRESH} THEN 1 ELSE 0 END)
                AS BIGINT) AS n_above_thresh,
           ROUND(CAST(SUM(CASE WHEN cosine >= {_PAIR_THRESH} THEN 1 ELSE 0 END)
                      AS DOUBLE) / COUNT(*), 6) AS frac_above_thresh
    FROM pairs
    """,
)
def embedding_pairwise_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise-cosine distribution card over a bounded id-range sample:
    mean/min/max cosine and the fraction of pairs above the SemDeDup
    threshold — the calibration read a team takes BEFORE picking a
    semantic-dedup cutoff (if 30% of random pairs exceed your threshold,
    the threshold deletes the corpus).  Same bounded-anchor discipline as
    ``dedup_embedding_cosine``: the quadratic compare is an explicit
    {200}-row sample, never corpus-wide; the production estimator samples
    pairs per IVF cell.

    Determinism: each rounded cosine is DECIMAL-cast before the cross-row
    mean sum; counts exact; min/max compare identical rounded doubles.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _PAIR_BOUND
    )
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    cos = F.round(
        vec.dot(F.col("ea"), F.col("eb"))
        / (vec.norm(F.col("ea")) * vec.norm(F.col("eb"))),
        6,
    )
    pairs = (
        a.crossJoin(b).filter(F.col("a") < F.col("b")).select(cos.alias("cosine"))
    )
    above = F.when(F.col("cosine") >= _PAIR_THRESH, 1).otherwise(0)
    return pairs.agg(
        F.count("*").cast("bigint").alias("n_pairs"),
        F.round(
            F.sum(F.col("cosine").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("mean_cos"),
        F.min("cosine").alias("min_cos"),
        F.max("cosine").alias("max_cos"),
        F.sum(above).cast("bigint").alias("n_above_thresh"),
        F.round(F.sum(above).cast("double") / F.count("*"), 6).alias(
            "frac_above_thresh"
        ),
    )


# --------------------------------------------------------------------------
# Exact weighted median
# --------------------------------------------------------------------------


@query(
    "weighted_median_price",
    oracle="""
    WITH w AS (
      SELECT l_returnflag, l_extendedprice, l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(18,4)) AS wt,
             SUM(CAST(l_quantity AS DECIMAL(18,4)))
               OVER (PARTITION BY l_returnflag
                     ORDER BY l_extendedprice, l_orderkey, l_linenumber
                     ROWS UNBOUNDED PRECEDING) AS cumw,
             SUM(CAST(l_quantity AS DECIMAL(18,4)))
               OVER (PARTITION BY l_returnflag) AS total_w
      FROM lineitem),
    hit AS (
      SELECT l_returnflag, l_extendedprice, total_w,
             ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                ORDER BY cumw, l_orderkey, l_linenumber) AS rk
      FROM w WHERE cumw * 2 >= total_w)
    SELECT l_returnflag, l_extendedprice AS weighted_median,
           CAST(ROUND(total_w, 4) AS DOUBLE) AS total_weight
    FROM hit WHERE rk = 1
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median: per return flag, the price at which half the
    total QUANTITY mass sits at-or-below — the volume-weighted central
    price (a different and usually more honest answer than the row-median
    ``agg_percentiles_exact`` gives, since a 50-unit line should count 50
    times).  The "first row where 2·cum ≥ total" rule is the textbook
    lower weighted median.

    Determinism: weights and running totals stay in exact DECIMAL with a
    total sort order (price, orderkey, linenumber), and the halfway test
    is an exact decimal comparison — no interpolation, no float knife
    edge; the median itself is a raw value passthrough.

    Scale: one window partitioned BY THE GROUP KEY (single shuffle, sort
    within group); the group count bounds output.  For extreme groups the
    two-pass quantile (histogram bins then exact within the hit bin)
    drops in — same discipline as the equi-depth profiler.
    """
    li = load_table(spark, sf_dir, "lineitem")
    wt = F.col("l_quantity").cast("decimal(18,4)")
    order = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("l_returnflag")
    w = li.select(
        "l_returnflag",
        "l_extendedprice",
        "l_orderkey",
        "l_linenumber",
        F.sum(wt).over(wcum).alias("cumw"),
        F.sum(wt).over(wall).alias("total_w"),
    )
    hit_w = Window.partitionBy("l_returnflag").orderBy(
        "cumw", "l_orderkey", "l_linenumber"
    )
    return (
        w.filter(F.col("cumw") * 2 >= F.col("total_w"))
        .select(
            "l_returnflag",
            F.col("l_extendedprice").alias("weighted_median"),
            F.round("total_w", 4).cast("double").alias("total_weight"),
            F.row_number().over(hit_w).alias("rk"),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )


# --------------------------------------------------------------------------
# SymSpell spelling-variant pairs (deletion-neighborhood equi-join)
# --------------------------------------------------------------------------

_SYM_MIN_LEN = 4  # skip ultra-short tokens (1-deletes collide trivially)


@query(
    "spelling_variants_symspell",
    oracle=f"""
    WITH vocab AS (
      SELECT tok, COUNT(*) AS freq
      FROM (SELECT UNNEST({_TOKS}) AS tok FROM documents) x
      GROUP BY tok HAVING LENGTH(tok) >= {_SYM_MIN_LEN}),
    dels AS (
      SELECT tok, freq,
             UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(tok) + 1),
                    i -> SUBSTRING(tok, 1, i - 1)
                         || SUBSTRING(tok, i + 1, LENGTH(tok)))) AS variant
      FROM vocab),
    keys AS (
      SELECT tok, freq, variant AS k FROM dels
      UNION ALL SELECT tok, freq, tok FROM vocab),
    cands AS (
      SELECT DISTINCT l.tok AS a, r.tok AS b,
             ANY_VALUE(l.freq) AS freq_a, ANY_VALUE(r.freq) AS freq_b
      FROM keys l JOIN keys r ON l.k = r.k AND l.tok < r.tok
      GROUP BY l.tok, r.tok)
    SELECT a, b, CAST(freq_a AS BIGINT) AS freq_a,
           CAST(freq_b AS BIGINT) AS freq_b
    FROM cands WHERE LEVENSHTEIN(a, b) = 1
    """,
)
def spelling_variants_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spelling-variant pairs at edit distance exactly 1, found with the
    SymSpell deletion-neighborhood trick: every vocab token emits its
    1-deletion variants plus itself as join keys, tokens sharing a key
    are candidates, and a Levenshtein check confirms — the vocab-
    normalization / typo-mining pass that runs over a crawl before
    frequency thresholds (a rare token one edit from a frequent one is a
    typo; the freq columns give the correction direction).

    Scale: candidate generation is an EQUI-join on the deletion key —
    never all-pairs over the vocabulary (the SymSpell insight: distance-1
    pairs must share a deletion key, so recall is lossless); the key fan
    is Σ token-length per DISTINCT token, corpus-size-independent once
    the vocab aggregate collapses.  Levenshtein runs on candidates only.
    """
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(tx.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").alias("freq"))
        .filter(F.length("tok") >= _SYM_MIN_LEN)
    )
    i = F.explode(F.sequence(F.lit(1), F.length("tok")))
    dels = vocab.select(
        "tok",
        "freq",
        i.alias("i"),
    ).select(
        "tok",
        "freq",
        F.concat(
            F.expr("substring(tok, 1, i - 1)"),
            F.expr("substring(tok, i + 1, length(tok))"),
        ).alias("k"),
    )
    keys = dels.unionByName(
        vocab.select("tok", "freq", F.col("tok").alias("k"))
    )
    l = keys.select(F.col("tok").alias("a"), F.col("freq").alias("freq_a"), "k")
    r = keys.select(F.col("tok").alias("b"), F.col("freq").alias("freq_b"), "k")
    cands = (
        l.join(r, "k")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.any_value("freq_a").alias("freq_a"),
            F.any_value("freq_b").alias("freq_b"),
        )
    )
    return cands.filter(F.levenshtein("a", "b") == 1).select(
        "a",
        "b",
        F.col("freq_a").cast("bigint").alias("freq_a"),
        F.col("freq_b").cast("bigint").alias("freq_b"),
    )


# --------------------------------------------------------------------------
# SemDeDup threshold sweep (yield curve)
# --------------------------------------------------------------------------

_SWEEP_THRESHOLDS = (0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)


@query(
    "semdedup_threshold_sweep",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings
               WHERE vec_id < {_PAIR_BOUND}),
    pairs AS (
      SELECT ROUND(({vec.dot_sql('a.embedding', 'b.embedding', EMB_DIM)})
                 / (SQRT({vec.dot_sql('a.embedding', 'a.embedding', EMB_DIM)})
                    * SQRT({vec.dot_sql('b.embedding', 'b.embedding', EMB_DIM)})),
                 6) AS cosine
      FROM e a JOIN e b ON a.vec_id < b.vec_id),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM pairs),
    thr AS (SELECT UNNEST(ARRAY[{", ".join(f"CAST({t} AS DOUBLE)" for t in _SWEEP_THRESHOLDS)}])
                AS threshold)
    SELECT t.threshold,
           CAST(SUM(CASE WHEN p.cosine >= t.threshold THEN 1 ELSE 0 END)
                AS BIGINT) AS n_pairs_above,
           ROUND(CAST(SUM(CASE WHEN p.cosine >= t.threshold THEN 1 ELSE 0 END)
                      AS DOUBLE) / (SELECT n FROM tot), 6) AS frac_above
    FROM pairs p, thr t
    GROUP BY t.threshold
    """,
)
def semdedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic-dedup yield curve: for each candidate cosine threshold,
    the count and fraction of sampled pairs that would be flagged — the
    sweep a curation team reads BEFORE fixing the SemDeDup cutoff
    (completes ``embedding_pairwise_stats``' single-threshold card into
    the full tradeoff curve; pick the knee, not a folk constant).

    Determinism: the rounded cosines are identical doubles on both
    engines, threshold comparisons are exact literal compares, counts
    exact.

    Scale: the pair sample is the same bounded {200}-row id-range anchor
    (production sweeps sample within IVF cells); the sweep itself is a
    constant {7}-way explode of the pair table + one map-side-combining
    count per threshold — reading 7 thresholds costs one pass, not 7.
    """
    e = load_table(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _PAIR_BOUND
    )
    a = e.select(F.col("vec_id").alias("a"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("b"), F.col("embedding").alias("eb"))
    cos = F.round(
        vec.dot(F.col("ea"), F.col("eb"))
        / (vec.norm(F.col("ea")) * vec.norm(F.col("eb"))),
        6,
    )
    pairs = (
        a.crossJoin(b).filter(F.col("a") < F.col("b")).select(cos.alias("cosine"))
    )
    tot = pairs.agg(F.count("*").cast("bigint").alias("n"))
    thr = F.explode(
        F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS])
    ).alias("threshold")
    return (
        pairs.select("cosine", thr)
        .groupBy("threshold")
        .agg(
            F.sum(F.when(F.col("cosine") >= F.col("threshold"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_pairs_above")
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "threshold",
            "n_pairs_above",
            F.round(
                F.col("n_pairs_above").cast("double") / F.col("n"), 6
            ).alias("frac_above"),
        )
    )


# --------------------------------------------------------------------------
# Forecast backtest evaluation (seasonal-naive model)
# --------------------------------------------------------------------------


@query(
    "forecast_backtest_eval",
    oracle="""
    WITH e AS (
      SELECT event_type, value, EXTRACT(HOUR FROM ts) AS hod FROM events),
    prof AS (
      SELECT event_type, hod,
             ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / COUNT(*), 6) AS pred
      FROM e GROUP BY event_type, hod),
    scored AS (
      SELECT e.event_type, e.value, p.pred,
             ROUND(ABS(e.value - p.pred), 6) AS abs_err,
             ROUND(e.value - p.pred, 6) AS err
      FROM e JOIN prof p USING (event_type, hod))
    SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(CAST(SUM(CAST(abs_err AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mae,
           ROUND(CAST(SUM(CAST(err AS DECIMAL(18,6))) AS DOUBLE)
                 / COUNT(*), 6) + 0.0 AS bias,
           ROUND(CAST(SUM(CAST(abs_err AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(SUM(CAST(ABS(value) AS DECIMAL(18,6))) AS DOUBLE), 6)
               AS wape
    FROM scored GROUP BY event_type
    """,
)
def forecast_backtest_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast backtest: score the seasonal-naive model (per-(type, hour)
    mean — ``timeseries_seasonal_profile``'s predictor) against the actual
    values and report per-type MAE, signed bias, and WAPE (weighted
    absolute percentage error — the scale-free accuracy number planners
    quote; plain MAPE explodes on near-zero actuals, WAPE doesn't).
    Completes the forecasting loop: model → residuals → accuracy gate.

    Determinism: the prediction is rounded BEFORE residuals (identical
    doubles both engines); every cross-row error sum is DECIMAL-cast;
    final metrics are rounded divisions of identical operands.

    Scale: the profile is a bounded-key aggregate broadcast back onto one
    event scan; the metric rollup is a second map-side-combining
    aggregate on event_type — two scans, zero wide shuffles.
    """
    ev = load_table(spark, sf_dir, "events")
    e = ev.select("event_type", "value", F.hour("ts").alias("hod"))
    prof = e.groupBy("event_type", "hod").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count("*"),
            6,
        ).alias("pred")
    )
    scored = e.join(F.broadcast(prof), ["event_type", "hod"]).select(
        "event_type",
        "value",
        F.round(F.abs(F.col("value") - F.col("pred")), 6).alias("abs_err"),
        F.round(F.col("value") - F.col("pred"), 6).alias("err"),
    )
    dsum = lambda c: F.sum(F.col(c).cast("decimal(18,6)")).cast("double")  # noqa: E731
    return scored.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("n"),
        F.round(dsum("abs_err") / F.count("*"), 6).alias("mae"),
        # + 0.0 collapses IEEE -0.0 to +0.0 (engines disagree on which
        # side of zero a rounded tiny bias lands)
        (F.round(dsum("err") / F.count("*"), 6) + F.lit(0.0)).alias("bias"),
        F.round(
            dsum("abs_err")
            / F.sum(F.abs("value").cast("decimal(18,6)")).cast("double"),
            6,
        ).alias("wape"),
    )


# --------------------------------------------------------------------------
# MDM golden-record survivorship
# --------------------------------------------------------------------------


@query(
    "mdm_golden_record",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id, source, n_chars, {_FP_SQL} AS f FROM documents),
    ranked AS (
      SELECT doc_id, source, n_chars, f,
             ROW_NUMBER() OVER (PARTITION BY f
                                ORDER BY n_chars DESC, doc_id) AS rk,
             CAST(COUNT(*) OVER (PARTITION BY f) AS BIGINT) AS n_members,
             CAST(MAX(n_chars) OVER (PARTITION BY f) AS BIGINT) AS max_chars,
             CAST(MIN(doc_id) OVER (PARTITION BY f) AS BIGINT) AS first_id
      FROM fp)
    SELECT f AS fingerprint, doc_id AS survivor_id, source AS survivor_source,
           n_members, max_chars, first_id
    FROM ranked WHERE rk = 1 AND n_members > 1
    """,
)
def mdm_golden_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Golden-record survivorship (MDM): within each exact-duplicate
    cluster, elect the survivor by an explicit POLICY — longest content
    first, then lowest id — and carry merged attributes (member count,
    best length, earliest id) onto the golden row.  This is the
    master-data step AFTER matching: ``dedup_fingerprint`` answers "which
    rows are the same entity"; survivorship answers "which values win"
    (the reference's upsert keeps whichever row arrived last —
    last-write-wins by accident; this makes the policy explicit).

    Determinism: policy keys are exact integers with a total tie-break;
    no floats.

    Scale: one window partitioned by the cluster fingerprint (uniform
    128-bit key) computes the election and every merged attribute in a
    single pass — no self-join of members, no collect.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = d.select(
        "doc_id", "source", "n_chars", tx.fingerprint("text").alias("f")
    )
    wp = Window.partitionBy("f")
    wr = wp.orderBy(F.col("n_chars").desc(), "doc_id")
    ranked = fp.select(
        "doc_id",
        "source",
        "f",
        F.row_number().over(wr).alias("rk"),
        F.count("*").over(wp).cast("bigint").alias("n_members"),
        F.max("n_chars").over(wp).cast("bigint").alias("max_chars"),
        F.min("doc_id").over(wp).cast("bigint").alias("first_id"),
    )
    return ranked.filter((F.col("rk") == 1) & (F.col("n_members") > 1)).select(
        F.col("f").alias("fingerprint"),
        F.col("doc_id").alias("survivor_id"),
        F.col("source").alias("survivor_source"),
        "n_members",
        "max_chars",
        "first_id",
    )


# --------------------------------------------------------------------------
# Two-sample Kolmogorov-Smirnov drift test
# --------------------------------------------------------------------------


@query(
    "ks_test_drift",
    oracle=f"""
    WITH t AS (
      SELECT n_chars AS v, doc_id % 10 = {_BATCH_MOD} AS in_delta
      FROM documents),
    counts AS (
      SELECT v,
             CAST(SUM(CASE WHEN in_delta THEN 0 ELSE 1 END) AS BIGINT) AS ca,
             CAST(SUM(CASE WHEN in_delta THEN 1 ELSE 0 END) AS BIGINT) AS cb
      FROM t GROUP BY v),
    tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                   CAST(SUM(cb) AS BIGINT) AS nb FROM counts),
    cdf AS (
      SELECT v,
             SUM(ca) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_a,
             SUM(cb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum_b
      FROM counts),
    d AS (
      SELECT MAX(ABS(ROUND(CAST(cum_a AS DOUBLE) / (SELECT na FROM tot)
                           - CAST(cum_b AS DOUBLE) / (SELECT nb FROM tot), 9)))
                 AS d_stat
      FROM cdf)
    SELECT (SELECT na FROM tot) AS n_index, (SELECT nb FROM tot) AS n_delta,
           ROUND(d_stat, 6) AS d_stat,
           ROUND(1.358 * SQRT(CAST((SELECT na FROM tot) + (SELECT nb FROM tot)
                                   AS DOUBLE)
                              / ((SELECT na FROM tot)
                                 * CAST((SELECT nb FROM tot) AS DOUBLE))), 6)
               AS crit_05,
           ROUND(d_stat, 6)
             > ROUND(1.358 * SQRT(CAST((SELECT na FROM tot)
                                       + (SELECT nb FROM tot) AS DOUBLE)
                                  / ((SELECT na FROM tot)
                                     * CAST((SELECT nb FROM tot) AS DOUBLE))), 6)
               AS drifted
    FROM d
    """,
)
def ks_test_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov test on the delta batch vs the index
    corpus over document length: D = max |CDF_index − CDF_delta| plus the
    α=0.05 critical value 1.358·√((n+m)/(n·m)) and the drift verdict —
    the NONPARAMETRIC drift gate beside ``psi_drift_report`` (PSI needs
    binning choices; KS reads the full empirical CDFs and is the
    statistic monitoring suites quote).

    Determinism: per-value counts and cumulative sums are exact integers
    over a deterministic value order; each CDF gap is rounded at scale 9
    before the MAX (identical doubles both engines), and the verdict
    compares scale-6 roundings of identical expressions.

    Scale: one conditional count per distinct value (map-side combining),
    a cumulative window over the VALUE DOMAIN (not the corpus), and a
    1-row total broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        F.col("n_chars").alias("v"),
        (F.col("doc_id") % 10 == _BATCH_MOD).alias("in_delta"),
    )
    counts = t.groupBy("v").agg(
        F.sum(F.when(F.col("in_delta"), 0).otherwise(1))
        .cast("bigint")
        .alias("ca"),
        F.sum(F.when(F.col("in_delta"), 1).otherwise(0))
        .cast("bigint")
        .alias("cb"),
    )
    tot = counts.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum("cb").cast("bigint").alias("nb"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cdf = counts.select(
        "v",
        F.sum("ca").over(w).alias("cum_a"),
        F.sum("cb").over(w).alias("cum_b"),
    )
    gap = F.abs(
        F.round(
            F.col("cum_a").cast("double") / F.col("na")
            - F.col("cum_b").cast("double") / F.col("nb"),
            9,
        )
    )
    dstat = (
        cdf.crossJoin(F.broadcast(tot)).agg(F.max(gap).alias("d_stat"))
    )
    crit = F.round(
        F.lit(1.358)
        * F.sqrt(
            (F.col("na") + F.col("nb")).cast("double")
            / (F.col("na") * F.col("nb").cast("double"))
        ),
        6,
    )
    return dstat.crossJoin(F.broadcast(tot)).select(
        F.col("na").alias("n_index"),
        F.col("nb").alias("n_delta"),
        F.round("d_stat", 6).alias("d_stat"),
        crit.alias("crit_05"),
        (F.round("d_stat", 6) > crit).alias("drifted"),
    )


# --------------------------------------------------------------------------
# Cramér's V categorical association
# --------------------------------------------------------------------------


@query(
    "cramers_v_association",
    oracle="""
    WITH obs AS (
      SELECT event_type, EXTRACT(DOW FROM ts) AS dow,
             CAST(COUNT(*) AS BIGINT) AS o
      FROM events GROUP BY event_type, dow),
    rt AS (SELECT event_type, SUM(o) AS r FROM obs GROUP BY event_type),
    ct AS (SELECT dow, SUM(o) AS c FROM obs GROUP BY dow),
    n AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS nr,
                 CAST(COUNT(DISTINCT dow) AS BIGINT) AS nc FROM obs),
    chi AS (
      SELECT CAST(SUM(CAST(
               POWER(obs.o - CAST(rt.r AS DOUBLE) * ct.c / (SELECT n FROM n), 2)
               / (CAST(rt.r AS DOUBLE) * ct.c / (SELECT n FROM n))
             AS DECIMAL(28,10))) AS DOUBLE) AS chi2
      FROM obs JOIN rt USING (event_type) JOIN ct USING (dow))
    SELECT (SELECT n FROM n) AS n,
           ROUND(chi2, 4) AS chi2,
           CAST(((SELECT nr FROM n) - 1) * ((SELECT nc FROM n) - 1) AS BIGINT)
               AS dof,
           ROUND(SQRT(chi2 / ((SELECT n FROM n)
                 * (LEAST((SELECT nr FROM n), (SELECT nc FROM n)) - 1))), 6)
               AS cramers_v
    FROM chi
    """,
)
def cramers_v_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cramér's V association between event type and day-of-week: the χ²
    statistic over the contingency table normalized to [0, 1] — the
    CATEGORICAL counterpart of ``correlation_matrix`` (is behavior mix a
    function of weekday?  V ≈ 0 on these uniform fixtures — the null
    read a sanity check should give).

    Determinism: observed and marginal counts are exact integers; each
    cell's χ² term is one IEEE double from identical integers,
    DECIMAL(28,10)-cast before the cross-cell sum (order-free); χ² and V
    are rounded once.

    Scale: one |types×7|-bounded contingency aggregate, marginal
    broadcasts, and a cell-count-sized χ² sum — events scanned once.
    """
    e = load_table(spark, sf_dir, "events")
    obs = e.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").cast("bigint").alias("o"))
    rt = obs.groupBy("event_type").agg(F.sum("o").alias("r"))
    ct = obs.groupBy("dow").agg(F.sum("o").alias("c"))
    n = obs.agg(
        F.sum("o").cast("bigint").alias("n"),
        F.countDistinct("event_type").cast("bigint").alias("nr"),
        F.countDistinct("dow").cast("bigint").alias("nc"),
    )
    ex = F.col("r").cast("double") * F.col("c") / F.col("n")
    chi = (
        obs.join(F.broadcast(rt), "event_type")
        .join(F.broadcast(ct), "dow")
        .crossJoin(F.broadcast(n))
        .agg(
            F.sum(
                (F.pow(F.col("o") - ex, 2) / ex).cast("decimal(28,10)")
            )
            .cast("double")
            .alias("chi2"),
            F.any_value("n").alias("n"),
            F.any_value("nr").alias("nr"),
            F.any_value("nc").alias("nc"),
        )
    )
    return chi.select(
        "n",
        F.round("chi2", 4).alias("chi2"),
        ((F.col("nr") - 1) * (F.col("nc") - 1)).cast("bigint").alias("dof"),
        F.round(
            F.sqrt(
                F.col("chi2")
                / (F.col("n") * (F.least("nr", "nc") - 1))
            ),
            6,
        ).alias("cramers_v"),
    )


# --------------------------------------------------------------------------
# Duplicate rate by source
# --------------------------------------------------------------------------


@query(
    "dup_rate_by_source",
    oracle=f"""
    WITH fp AS (SELECT doc_id, source, {_FP_SQL} AS f FROM documents),
    csize AS (SELECT f, COUNT(*) AS sz FROM fp GROUP BY f)
    SELECT fp.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN c.sz > 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_in_dup_cluster,
           ROUND(CAST(SUM(CASE WHEN c.sz > 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / COUNT(*), 6) AS dup_rate
    FROM fp JOIN csize c USING (f)
    GROUP BY fp.source
    """,
)
def dup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate rate per source: the fraction of each feed's documents
    that belong to a multi-member exact-duplicate cluster — the
    per-supplier quality signal that turns the corpus-wide dedup ledger
    into an actionable feed scorecard (pairs with `source_overlap_matrix`
    for WHO mirrors WHOM and `source_reputation` for the composite card).

    Scale: fingerprint once (map-only), one cluster-size aggregate on the
    uniform 128-bit key, an equi-join back on that key, and a source-keyed
    conditional count — no pairwise work anywhere.
    """
    d = load_table(spark, sf_dir, "documents")
    fp = d.select("doc_id", "source", tx.fingerprint("text").alias("f"))
    csize = fp.groupBy("f").agg(F.count("*").alias("sz"))
    return (
        fp.join(csize, "f")
        .groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum(F.when(F.col("sz") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_in_dup_cluster"),
            F.round(
                F.sum(F.when(F.col("sz") > 1, 1).otherwise(0)).cast("double")
                / F.count("*"),
                6,
            ).alias("dup_rate"),
        )
    )
