"""LLM-training-data pipeline queries: dedup (exact / MinHash-LSH / SimHash),
similarity search (exact cosine top-k + hyperplane-LSH), text analysis
(token stats, quality scoring, language-ID, TF-IDF, n-grams), and multimodal
column handling over the ``documents`` / ``embeddings`` fixtures.

Oracle strategy: everything deterministic is differentially tested against
DuckDB — including MinHash (the md5-based universal-hash family is
engine-portable, so the oracle computes *identical* signatures) and the
connected-components clustering (recursive-CTE transitive closure).  Only
the intrinsically approximate paths are rows-only — SimHash (xxhash64),
hyperplane-LSH / IVF / MLlib-LSH recall, HLL sketches, seeded sampling —
each anchored by an exact oracle-checked twin.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.operators import dedup as dd
from lms_etl_pipeline_spark.operators import text as tx
from lms_etl_pipeline_spark.operators import vectors as vec
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.session import default_parallelism, materialize
from lms_etl_pipeline_spark.sources.tables import load_table

EMB_DIM = 64

# DuckDB fragment: whitespace tokens with empties removed (mirrors tx.tokens).
_TOKS = r"LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), t -> t != '')"
# DuckDB fragment: distinct word-3-gram shingle set (mirrors tx.shingles, n=3).
_SHINGLES = (
    "LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN({t}) - 1, 1)), "
    "i -> ARRAY_TO_STRING(LIST_SLICE({t}, i, i + 2), ' ')))"
).format(t=_TOKS)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@query(
    "text_token_stats",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           LEN(toks) AS n_tokens,
           LEN(LIST_DISTINCT(toks)) AS n_distinct,
           CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS ttr,
           CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks)
               AS mean_token_len,
           CAST(LEN(LIST_FILTER(toks, x -> x IN
               ('the','a','an','and','of','to','in','is','on'))) AS DOUBLE) / LEN(toks)
               AS stop_ratio
    FROM t
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document quality features (length, diversity, stopword ratio) —
    one narrow projection, no shuffle, linear at any corpus size."""
    d = load_table(spark, sf_dir, "documents")
    return tx.quality_features(d, "text").select(
        "doc_id", "n_tokens", "n_distinct", "ttr", "mean_token_len", "stop_ratio"
    )


@query(
    "doc_quality_filter",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
    SELECT doc_id, lang,
           LEN(toks) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS ttr
    FROM t
    WHERE LEN(toks) BETWEEN 20 AND 1000
      AND CAST(LEN(LIST_FILTER(toks, x -> x IN
            ('the','a','an','and','of','to','in','is','on'))) AS DOUBLE) / LEN(toks) <= 0.5
      AND CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) > 0.05
    """,
)
def doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus filtering: keep documents passing the quality gates — the
    bread-and-butter pretraining-data cleaning step."""
    d = load_table(spark, sf_dir, "documents")
    q = tx.quality_features(d, "text")
    return q.filter(
        F.col("n_tokens").between(20, 1000)
        & (F.col("stop_ratio") <= 0.5)
        & (F.col("ttr") > 0.05)
    ).select("doc_id", "lang", "n_tokens", "ttr")


@query(
    "curated_corpus_partitioned_write",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_TOKS} AS toks FROM documents)
    SELECT doc_id, lang, LEN(toks) AS n_tokens
    FROM t
    WHERE LEN(toks) BETWEEN 20 AND 1000
      AND lang IN ('en', 'es')
    """,
)
def curated_corpus_partitioned_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curated-corpus delivery: quality-gate, write parquet partitioned by
    ``lang``, read back with a partition-pruned scan — the layout a 100 TB
    corpus ships in (per-language consumers touch only their directories;
    `tests/test_parquet_partitioning.py` pins PartitionFilters + measured
    scan-bytes).  The differential check proves the partitioned hop is
    lossless: lang comes back from directory names, data columns from the
    files, and the pruned read returns exactly the oracle's rows.
    """
    from lms_etl_pipeline_spark.sources.parquet_io import read_partitioned, write_partitioned

    d = load_table(spark, sf_dir, "documents")
    gated = d.select(
        "doc_id", "lang", F.size(tx.tokens("text")).alias("n_tokens")
    ).filter(F.col("n_tokens").between(20, 1000))
    path = "/root/repo/.scratch/curated_by_lang"
    write_partitioned(gated, path, ["lang"])
    # Explicit schema on the read-back: when the gate matched ZERO rows the
    # layout holds no files and schema inference would raise
    # UNABLE_TO_INFER_SCHEMA — an empty delivery must round-trip as an
    # empty frame, not a crash (tests/test_empty_fixture.py).
    back = read_partitioned(spark, path, schema=gated.schema)
    return back.filter(F.col("lang").isin("en", "es")).select(
        "doc_id", "lang", F.col("n_tokens").cast("long").alias("n_tokens")
    )


@query(
    "text_language_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    hits AS (
      SELECT doc_id,
             LEN(LIST_FILTER(toks, x -> x IN ('the','a','an','and','of','to','is'))) AS en_hits,
             LEN(LIST_FILTER(toks, x -> x IN ('el','la','de','que','y','los'))) AS es_hits
      FROM t)
    SELECT doc_id, en_hits, es_hits,
           CASE WHEN en_hits > es_hits THEN 'en'
                WHEN es_hits > en_hits THEN 'es'
                WHEN en_hits > 0 THEN 'en'
                ELSE 'und' END AS pred_lang
    FROM hits
    """,
)
def text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Marker-word language-ID heuristic (embedded wordlists, no downloads).
    A real system swaps the lists for per-language n-gram profiles; the
    dataflow — one narrow projection — is identical."""
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens("text")
    en = F.size(F.filter(toks, lambda t: t.isin("the", "a", "an", "and", "of", "to", "is")))
    es = F.size(F.filter(toks, lambda t: t.isin("el", "la", "de", "que", "y", "los")))
    return d.select("doc_id", en.alias("en_hits"), es.alias("es_hits")).withColumn(
        "pred_lang",
        F.when(F.col("en_hits") > F.col("es_hits"), "en")
        .when(F.col("es_hits") > F.col("en_hits"), "es")
        .when(F.col("en_hits") > 0, "en")
        .otherwise("und"),
    )


@query(
    "token_count_bpe",
    oracle=r"""
    SELECT doc_id,
           LEN(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS n_bpe_tokens,
           LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')))
               AS n_bpe_distinct,
           LENGTH(text) AS n_chars_exact
    FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish pre-tokenizer counts (letter runs / digit runs / punctuation)
    via one regexp_extract_all — the cheap token-budget estimator."""
    d = load_table(spark, sf_dir, "documents")
    pat = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    toks = F.regexp_extract_all("text", F.lit(pat), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_bpe_distinct"),
        F.length("text").alias("n_chars_exact"),
    )


@query(
    "tfidf_cosine_pairs",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents WHERE doc_id < 150
    ),
    tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2),
    dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
    nd AS (SELECT COUNT(*) AS n_docs FROM documents WHERE doc_id < 150),
    w AS (
      SELECT tf.doc_id, tf.term,
             tf.tf * (LN((nd.n_docs + 1.0) / (dfreq.df + 1.0)) + 1) AS wt
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    ),
    norms AS (SELECT doc_id, SQRT(SUM(wt * wt)) AS nrm FROM w GROUP BY 1),
    dots AS (
      SELECT a.doc_id AS a, b.doc_id AS b, SUM(a.wt * b.wt) AS dot
      FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT d.a, d.b, ROUND(d.dot / (na.nrm * nb.nrm), 6) AS cosine
    FROM dots d JOIN norms na ON na.doc_id = d.a JOIN norms nb ON nb.doc_id = d.b
    WHERE d.dot / (na.nrm * nb.nrm) >= 0.35
    """,
)
def tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse TF-IDF cosine similarity pairs (classic IR near-dup): docs
    joined ONLY where they share a term — the sparse-vector trick that
    replaces a dense all-pairs cross join with a term-keyed equi-join whose
    cost is sum over terms of df² (bounded by stopword removal / df caps
    at scale).  Bounded id range keeps the oracle's self-join small.

    Float note: per-pair dot sums a handful of weight products in SQL-join
    order on both engines; scores round to 6 decimals for the hash."""
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    w = tx.tf_idf(d, "doc_id", "text").select(
        "doc_id", "term", F.col("tf_idf").alias("wt")
    )
    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("wt") * F.col("wt"))).alias("nrm"))
    a = w.select(F.col("doc_id").alias("a"), "term", F.col("wt").alias("wa"))
    b = w.select(F.col("doc_id").alias("b"), "term", F.col("wt").alias("wb"))
    dots = (
        a.join(b, "term")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.sum(F.col("wa") * F.col("wb")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("a"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("doc_id").alias("b"), F.col("nrm").alias("nb"))
    cos = F.col("dot") / (F.col("na") * F.col("nb"))
    return (
        dots.join(na, "a")
        .join(nb, "b")
        .filter(cos >= 0.35)
        .select("a", "b", F.round(cos, 6).alias("cosine"))
    )


@query(
    "tf_idf_top_terms",
    oracle=f"""
    WITH terms AS (
      SELECT doc_id, UNNEST({_TOKS}) AS term FROM documents
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM terms GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM terms GROUP BY 1
    ), nd AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, dfreq.df,
             ROUND(tf.tf * (LN((nd.n_docs + 1) / (dfreq.df + 1)) + 1), 6) AS tf_idf,
             ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                                ORDER BY tf.tf DESC, dfreq.df ASC, tf.term ASC) AS rk
      FROM tf JOIN dfreq USING (term) CROSS JOIN nd
    )
    SELECT doc_id, term, tf, df, tf_idf FROM scored WHERE rk <= 3
    """,
)
def tf_idf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document.  Ranking keys on the integer (tf,
    df) pair so ordering never depends on float rounding; the float score is
    rounded for cross-engine hashing."""
    d = load_table(spark, sf_dir, "documents")
    scored = tx.tf_idf(d, "doc_id", "text")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tf").desc(), F.col("df").asc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "term", "tf", "df", F.round("tf_idf", 6).alias("tf_idf"))
    )


@query(
    "stopword_removal_bigrams",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             LIST_FILTER({_TOKS}, x -> x NOT IN
               ('the','a','an','and','of','to','in','is','on')) AS toks
      FROM documents
    ), grams AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks), 1)),
                    i -> ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 1), ' '))) AS bigram
      FROM t WHERE LEN(toks) >= 2
    )
    SELECT bigram, COUNT(*) AS n
    FROM grams GROUP BY 1
    ORDER BY n DESC, bigram ASC
    LIMIT 20
    """,
)
def stopword_removal_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """StopWordsRemover + NGram(2) + count, as pure column expressions:
    the top-20 content bigrams of the corpus."""
    d = load_table(spark, sf_dir, "documents")
    # Tokenize into a materialized column first: shingles() must read an
    # attribute, not an inlined subtree (element_at re-evaluates subtrees
    # per position in interpreted higher-order eval).
    toked = d.select(
        F.filter(tx.tokens("text"), lambda t: ~t.isin(*tx.STOPWORDS_EN)).alias("_toks")
    ).filter(F.size("_toks") >= 2)
    return (
        toked.select(F.explode(tx.shingles(F.col("_toks"), n=2)).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(20)
    )


_POS_SQL = "('good','great','excellent','love','best','happy','nice','well')"
_NEG_SQL = "('bad','terrible','awful','hate','worst','sad','poor','wrong')"


@query(
    "text_sentiment_lexicon",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)
    SELECT doc_id,
           LEN(LIST_FILTER(toks, x -> x IN {_POS_SQL})) AS pos_hits,
           LEN(LIST_FILTER(toks, x -> x IN {_NEG_SQL})) AS neg_hits,
           CAST(LEN(LIST_FILTER(toks, x -> x IN {_POS_SQL}))
                - LEN(LIST_FILTER(toks, x -> x IN {_NEG_SQL})) AS DOUBLE)
             / NULLIF(LEN(toks), 0) AS sentiment
    FROM t
    """,
)
def text_sentiment_lexicon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lexicon sentiment scoring (SURVEY §2.12 text row): embedded pos/neg
    wordlists, one narrow projection, no shuffle."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tx.tokens("text").alias("_toks"))
    pos = F.size(F.filter(F.col("_toks"), lambda t: t.isin(*tx.SENTIMENT_POS)))
    neg = F.size(F.filter(F.col("_toks"), lambda t: t.isin(*tx.SENTIMENT_NEG)))
    return toked.select(
        "doc_id",
        pos.alias("pos_hits"),
        neg.alias("neg_hits"),
        tx.sentiment_score(F.col("_toks")).alias("sentiment"),
    )


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------


@query(
    "dedup_exact_text",
    oracle="""
    SELECT MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies, MD5(text) AS text_md5
    FROM documents GROUP BY text
    """,
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on full content; keep the lowest id as
    canonical.  One shuffle on a uniform 128-bit key — flat at 100 TB."""
    d = load_table(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count("*").alias("n_copies"),
        F.md5(F.first("text")).alias("text_md5"),
    ).drop("text")


@query(
    "dedup_fingerprint",
    oracle=f"""
    WITH fp AS (
      SELECT doc_id,
             MD5(COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT({_TOKS})), ' '), '')) AS fingerprint
      FROM documents
    )
    SELECT fingerprint, MIN(doc_id) AS canonical_id, COUNT(*) AS n_docs
    FROM fp GROUP BY fingerprint
    """,
)
def dedup_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-form dedup: md5 of the sorted distinct token set — catches
    word-order / duplication variants that exact hashing misses."""
    d = load_table(spark, sf_dir, "documents")
    return (
        d.select("doc_id", tx.fingerprint("text").alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("canonical_id"), F.count("*").alias("n_docs"))
    )


# DuckDB twins of operators.dedup.minhash_signature: one md5-derived base
# hash per shingle (reduced below MH_P), then k affine transforms mod MH_P.
_BASE_HASHES = (
    "LIST_TRANSFORM(sh, s -> TRY_CAST(CONCAT('0x', SUBSTRING(MD5(s), 1, 15)) AS BIGINT)"
    f" % {dd.MH_P})"
)


def _minhash_slots_sql(k: int) -> str:
    return ",\n             ".join(
        f"LIST_MIN(LIST_TRANSFORM(hs, h -> ({dd.MH_A[i]} * h + {dd.MH_B[i]}) % {dd.MH_P})) AS h{i}"
        for i in range(k)
    )


@query(
    "minhash_signatures",
    oracle=f"""
    WITH sh_t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    hs_t AS (SELECT doc_id, {_BASE_HASHES} AS hs FROM sh_t WHERE LEN(sh) > 0)
    SELECT doc_id,
             {_minhash_slots_sql(8)}
    FROM hs_t
    """,
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """8-slot MinHash signatures over 3-gram shingle sets.  The salted-md5
    hash family is engine-portable, so these exact signatures are
    differentially verified against DuckDB."""
    d = load_table(spark, sf_dir, "documents")
    return dd.with_minhash(d, "doc_id", "text", k=8)


@query(
    "near_dup_pairs_lsh",
    oracle=f"""
    WITH sh_t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    hs_t AS (SELECT doc_id, sh, {_BASE_HASHES} AS hs FROM sh_t WHERE LEN(sh) > 0),
    sigs AS (
      SELECT doc_id,
             {_minhash_slots_sql(8)}
      FROM hs_t
    ),
    bands AS (
      SELECT doc_id, 0 AS band,
             MD5(CAST(h0 AS VARCHAR) || '|' || CAST(h1 AS VARCHAR)) AS band_hash FROM sigs
      UNION ALL SELECT doc_id, 1, MD5(CAST(h2 AS VARCHAR) || '|' || CAST(h3 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 2, MD5(CAST(h4 AS VARCHAR) || '|' || CAST(h5 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 3, MD5(CAST(h6 AS VARCHAR) || '|' || CAST(h7 AS VARCHAR)) FROM sigs
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM bands l JOIN bands r ON l.band = r.band AND l.band_hash = r.band_hash
      WHERE l.doc_id < r.doc_id
    )
    SELECT c.a, c.b,
           CAST(LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))) AS DOUBLE)
             / (LEN(sa.sh) + LEN(sb.sh) - LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))))
             AS jaccard
    FROM cands c
    JOIN sh_t sa ON sa.doc_id = c.a
    JOIN sh_t sb ON sb.doc_id = c.b
    WHERE CAST(LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))) AS DOUBLE)
             / (LEN(sa.sh) + LEN(sb.sh) - LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))))
             >= 0.5
    """,
)
def near_dup_pairs_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-duplicate pairs (4 bands x 2 rows) verified by exact
    shingle Jaccard >= 0.5.  Candidate generation is an equi-join on the
    band hash — cost is |candidates|, never N²."""
    d = load_table(spark, sf_dir, "documents")
    return dd.near_dup_pairs(d, "doc_id", "text", k=8, bands=4, threshold=0.5)


@query(
    "doc_repetition_signals",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    bg AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)),
                    i -> ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 1), ' '))) AS bigram
      FROM t WHERE LEN(toks) >= 2
    ),
    cnt AS (SELECT doc_id, bigram, COUNT(*) AS c FROM bg GROUP BY doc_id, bigram)
    SELECT doc_id,
           CAST(MAX(c) AS DOUBLE) / SUM(c) AS top_bigram_frac,
           CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / SUM(c)
               AS dup_bigram_frac
    FROM cnt GROUP BY doc_id
    """,
)
def doc_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021,
    arXiv:2112.11446 §A1.1): the fraction of all bigrams taken by the single
    most frequent bigram, and the fraction covered by any repeated bigram —
    the standard filters for template/boilerplate text that length and
    stopword ratios miss.

    Relational plan, not a per-row array search: ONE explode to long form,
    count per (doc, bigram), then a per-doc max/sum — two partial-aggregated
    shuffles on uniformly distributed keys, linear at corpus scale.  Ratios
    are exact-integer divides (bit-identical across engines).
    """
    d = load_table(spark, sf_dir, "documents")
    # Materialize tokens + repartition before the shingle lambda (interpreted
    # higher-order eval re-inlines subtrees; single input split serializes
    # the CPU work — see operators.dedup plan-shape notes).
    toked = d.select("doc_id", tx.tokens("text").alias("_toks"))
    part = toked.repartition(default_parallelism(spark), "doc_id")
    bg = part.select("doc_id", F.explode(tx.shingles(F.col("_toks"), 2)).alias("bigram"))
    cnt = bg.groupBy("doc_id", "bigram").agg(F.count("*").alias("c"))
    return cnt.groupBy("doc_id").agg(
        (F.max("c").cast("double") / F.sum("c")).alias("top_bigram_frac"),
        (
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).cast("double")
            / F.sum("c")
        ).alias("dup_bigram_frac"),
    )


# Engine-portable regex subset (Java regex == RE2 here: ASCII classes, no
# backrefs/lookaround) so Spark and the DuckDB oracle redact identically.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_URL_RE = r"https?://[^\s]+"


@query(
    "text_redact_pii",
    oracle=f"""
    WITH raw AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or see https://example.com/u/'
                  || CAST(doc_id AS VARCHAR) AS raw_text
      FROM documents
    )
    SELECT doc_id,
           REGEXP_REPLACE(REGEXP_REPLACE(raw_text, '{_EMAIL_RE}', '<EMAIL>', 'g'),
                          '{_URL_RE}', '<URL>', 'g') AS redacted,
           LEN(REGEXP_EXTRACT_ALL(raw_text, '{_EMAIL_RE}')) AS n_emails,
           LEN(REGEXP_EXTRACT_ALL(raw_text, '{_URL_RE}')) AS n_urls
    FROM raw
    """,
)
def text_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing — redact emails/URLs and count what was removed, the
    standard pretraining-corpus hygiene pass.

    The synthetic fixture corpus contains no PII, so the query plants a
    deterministic email+URL per document (derived from ``doc_id``, built
    identically in the oracle) — the differential check then proves the
    redaction itself, not a no-op pass-through.  Pure codegen'd regex
    column expressions: no UDF, no shuffle, linear scan at any scale.
    """
    d = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or see https://example.com/u/"),
        F.col("doc_id").cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(raw, _EMAIL_RE, "<EMAIL>"), _URL_RE, "<URL>"
    )
    return d.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(raw, F.lit(_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(_URL_RE), F.lit(0))).alias("n_urls"),
    )


@query(
    "contrastive_triplets",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, LIST_SORT({_SHINGLES}) AS sh FROM documents
    ),
    nz AS (SELECT doc_id, sh, LEN(sh) AS n FROM sh_t WHERE LEN(sh) > 0),
    pref AS (
      SELECT doc_id,
             UNNEST(LIST_SLICE(sh, 1, n - CAST(CEIL(0.5 * n) AS BIGINT) + 1)) AS g
      FROM nz
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM pref l JOIN pref r ON l.g = r.g AND l.doc_id < r.doc_id
    ),
    pos AS (
      SELECT c.a AS anchor, c.b AS positive
      FROM cands c
      JOIN nz sa ON sa.doc_id = c.a
      JOIN nz sb ON sb.doc_id = c.b
      WHERE CAST(LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))) AS DOUBLE)
               / (sa.n + sb.n - LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))))
               >= 0.5
    ),
    bound AS (SELECT MAX(doc_id) + 1 AS nd FROM documents),
    step0 AS (
      SELECT anchor, positive, nd, (anchor * 7919 + 31) % nd AS r0
      FROM pos CROSS JOIN bound
    ),
    step1 AS (
      SELECT anchor, positive, nd,
             CASE WHEN r0 IN (anchor, positive) THEN (r0 + 1) % nd ELSE r0 END AS r1
      FROM step0
    )
    SELECT anchor, positive,
           CASE WHEN r1 IN (anchor, positive) THEN (r1 + 1) % nd ELSE r1 END AS negative
    FROM step1
    """,
)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive training triplets (anchor, positive, negative): positives
    are verified near-duplicates (the lossless prefix-filtered Jaccard
    join); negatives are drawn by a deterministic affine hash of the anchor
    id — retry-safe and reproducible, unlike ``rand()`` sampling, and biased
    toward *random* (easy) negatives exactly like standard in-batch
    negatives.  The collision guard keeps negative ∉ {{anchor, positive}}.

    Scale: positives cost what `ngram_jaccard_pairs` costs; negatives are a
    projection plus one 1-row broadcast (corpus-size bound).
    """
    pos = dd.jaccard_pairs_prefix(
        load_table(spark, sf_dir, "documents"), "doc_id", "text", n=3, threshold=0.5,
        num_partitions=default_parallelism(spark),
    ).select(F.col("a").alias("anchor"), F.col("b").alias("positive"))
    nd = load_table(spark, sf_dir, "documents").agg(
        (F.max("doc_id") + 1).alias("nd")
    )
    def bump(r):
        hit = (r == F.col("anchor")) | (r == F.col("positive"))
        return F.when(hit, (r + 1) % F.col("nd")).otherwise(r)

    raw = (F.col("anchor") * 7919 + 31) % F.col("nd")
    neg = bump(bump(raw))  # two passes: the +1 step can itself land on the pair
    return pos.crossJoin(F.broadcast(nd)).select(
        "anchor", "positive", neg.alias("negative")
    )


@query(
    "ngram_jaccard_pairs",
    oracle=f"""
    WITH sh_t AS (
      SELECT doc_id, LIST_SORT({_SHINGLES}) AS sh FROM documents
    ),
    nz AS (SELECT doc_id, sh, LEN(sh) AS n FROM sh_t WHERE LEN(sh) > 0),
    pref AS (
      SELECT doc_id,
             UNNEST(LIST_SLICE(sh, 1, n - CAST(CEIL(0.5 * n) AS BIGINT) + 1)) AS g
      FROM nz
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM pref l JOIN pref r ON l.g = r.g AND l.doc_id < r.doc_id
    )
    SELECT c.a, c.b,
           CAST(LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))) AS DOUBLE)
             / (sa.n + sb.n - LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))))
             AS jaccard
    FROM cands c
    JOIN nz sa ON sa.doc_id = c.a
    JOIN nz sb ON sb.doc_id = c.b
    WHERE CAST(LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))) AS DOUBLE)
             / (sa.n + sb.n - LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))))
             >= 0.5
    """,
)
def ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram-Jaccard near-duplicate pairs via prefix filtering
    (PPJoin-style): two 3-gram shingle *sets* with Jaccard >= t must share
    at least one element in the first ``n - ceil(t*n) + 1`` elements of any
    consistent total order — so candidate generation is an equi-join on the
    exploded *prefix* only (lossless, unlike LSH, and far cheaper than the
    full inverted index).  Verification recomputes exact Jaccard on the
    candidate pairs alone.

    Scale path: the prefix join shuffles |prefix| ≈ (1-t)·|shingles| rows
    per doc on the shingle key — never N².  Ordering is lexicographic here
    (the fixtures' shingle frequencies are flat — measured no candidate
    win from df-ordering, see the operator docstring); Zipfian corpora
    should pass ``order='df'`` for the PPJoin rarest-first prefix.
    """
    d = load_table(spark, sf_dir, "documents")
    return dd.jaccard_pairs_prefix(
        d, "doc_id", "text", n=3, threshold=0.5,
        num_partitions=default_parallelism(spark),
    )


@query(
    "doc_outlier_filter_iqr",
    oracle="""
    WITH q AS (
      SELECT lang,
             FLOOR(QUANTILE_CONT(n_chars, 0.25)) AS q1,
             FLOOR(QUANTILE_CONT(n_chars, 0.75)) AS q3
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN q ON d.lang = q.lang
    WHERE d.n_chars >= q.q1 - 2 * (q.q3 - q.q1)
      AND d.n_chars <= q.q3 + 2 * (q.q3 - q.q1)
    """,
)
def doc_outlier_filter_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language IQR outlier gate on document length — the robust
    (quantile-based) sibling of the z-score filter, standard for trimming
    truncated/concatenated documents before training.

    Thresholds are FLOOR'd to integers in both engines so an integer
    length can never sit within float-ulp of the cut line (knife-edge-free
    differential comparison).  Plan: one exact-percentile aggregate per
    language (tiny) broadcast back onto the corpus scan — two passes total,
    no sort of the full table.
    """
    d = load_table(spark, sf_dir, "documents")
    q = d.groupBy("lang").agg(
        F.floor(F.expr("percentile(n_chars, 0.25)")).alias("q1"),
        F.floor(F.expr("percentile(n_chars, 0.75)")).alias("q3"),
    )
    iqr = F.col("q3") - F.col("q1")
    return (
        d.join(F.broadcast(q), "lang")
        .filter(
            (F.col("n_chars") >= F.col("q1") - 2 * iqr)
            & (F.col("n_chars") <= F.col("q3") + 2 * iqr)
        )
        .select("doc_id", "lang", "n_chars")
    )


@query(
    "doc_zscore_normalize",
    oracle="""
    WITH m AS (
      SELECT lang,
             COUNT(*) AS n,
             CAST(SUM(CAST(n_chars AS DECIMAL(18,4))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(n_chars AS DECIMAL(18,4)) * CAST(n_chars AS DECIMAL(18,4)))
                  AS DOUBLE) AS s2
      FROM documents GROUP BY lang
    )
    SELECT d.doc_id, d.lang,
           ROUND((d.n_chars - s1 / n) / SQRT((s2 - s1 * s1 / n) / (n - 1)), 6)
               AS len_z
    FROM documents d JOIN m ON d.lang = m.lang
    WHERE m.n > 1
    """,
)
def doc_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature normalization: z-score of document length within
    its language — the broadcast-the-moments pattern (group stats are tiny;
    the corpus streams once).  Moments are exact decimal sums
    (order-free, the `agg_stats_exact` discipline) so mean/std — and hence
    every z — are bit-stable; one ROUND(6) on the final z absorbs the
    division/sqrt ulp.
    """
    d = load_table(spark, sf_dir, "documents")
    m = d.groupBy("lang").agg(
        F.count("*").alias("n"),
        F.sum(F.col("n_chars").cast("decimal(18,4)")).cast("double").alias("s1"),
        F.sum(
            F.col("n_chars").cast("decimal(18,4)") * F.col("n_chars").cast("decimal(18,4)")
        )
        .cast("double")
        .alias("s2"),
    )
    mean = F.col("s1") / F.col("n")
    std = F.sqrt((F.col("s2") - F.col("s1") * F.col("s1") / F.col("n")) / (F.col("n") - 1))
    return (
        d.join(F.broadcast(m), "lang")
        .filter(F.col("n") > 1)
        .select(
            "doc_id",
            "lang",
            F.round((F.col("n_chars") - mean) / std, 6).alias("len_z"),
        )
    )


@query(
    "doc_quality_score_logistic",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    feats AS (
      SELECT doc_id,
             LEN(toks) AS n_tokens,
             CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS ttr,
             CAST(LEN(LIST_FILTER(toks, x -> x IN
                 ('the','a','an','and','of','to','in','is','on'))) AS DOUBLE) / LEN(toks)
                 AS stop_ratio
      FROM t WHERE LEN(toks) > 0
    )
    SELECT doc_id,
           ROUND(1.0 / (1.0 + EXP(-(-1.5 + 0.004 * n_tokens + 2.0 * ttr
                                    - 3.0 * stop_ratio))), 6) AS quality_score
    FROM feats
    """,
)
def doc_quality_score_logistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference as a projection: a fixed-weight logistic scorer
    over the deterministic quality features — the shape of every
    classifier-based corpus filter (fastText-style quality models, toxicity
    gates) once the model is exported to columnar math.  No UDF, no model
    server round-trips: scoring 100 TB is one codegen'd scan.  Weights are
    versioned constants; ROUND(6) absorbs libm exp() ulp differences
    between engines.
    """
    d = load_table(spark, sf_dir, "documents")
    toks = tx.tokens("text")
    base = d.select("doc_id", toks.alias("_toks")).filter(F.size("_toks") > 0)
    n_tokens = F.size("_toks")
    ttr = F.size(F.array_distinct("_toks")).cast("double") / n_tokens
    stop_ratio = (
        F.size(F.filter("_toks", lambda t: t.isin(*tx.STOPWORDS_EN))).cast("double")
        / n_tokens
    )
    logit = F.lit(-1.5) + 0.004 * n_tokens + 2.0 * ttr - 3.0 * stop_ratio
    return base.select(
        "doc_id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-logit)), 6).alias("quality_score"),
    )


@query(
    "doc_chunk_sliding",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    nz AS (SELECT doc_id, toks, LEN(toks) AS n FROM t WHERE LEN(toks) > 0),
    idx AS (
      SELECT doc_id, toks, n,
             UNNEST(RANGE(0, GREATEST((n - 64 + 47) // 48, 0) + 1)) AS chunk_idx
      FROM nz
    )
    SELECT doc_id,
           CAST(chunk_idx AS INTEGER) AS chunk_idx,
           ARRAY_TO_STRING(LIST_SLICE(toks, chunk_idx * 48 + 1,
                                      LEAST(chunk_idx * 48 + 64, n)), ' ') AS chunk_text,
           CAST(LEAST(chunk_idx * 48 + 64, n) - chunk_idx * 48 AS INTEGER) AS n_tokens
    FROM idx
    """,
)
def doc_chunk_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (64-token windows, stride 48 — 16
    tokens of overlap): the retrieval/RAG preprocessing step that turns a
    corpus into embeddable passages.  Chunk count per doc is
    ``ceil(max(n-64, 0) / 48) + 1`` so the tail is always covered and a
    short doc yields exactly one chunk.

    One generate (posexplode of the chunk-index range) over a materialized
    token array — no Python, no shuffle; the chunk rows are what feeds an
    embedding UDF downstream (`multimodal` shows that plumbing).
    """
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tx.tokens("text").alias("_toks")).filter(
        F.size("_toks") > 0
    )
    n = F.size("_toks")
    n_chunks = F.greatest(F.floor((n - 64 + 47) / 48), F.lit(0)) + 1
    idx = toked.select(
        "doc_id",
        "_toks",
        n.alias("_n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * 48
    length = F.least(start + 64, F.col("_n")) - start
    return idx.select(
        "doc_id",
        F.col("chunk_idx").cast("int").alias("chunk_idx"),
        F.concat_ws(" ", F.slice("_toks", start + 1, length)).alias("chunk_text"),
        length.cast("int").alias("n_tokens"),
    )


@query(
    "corpus_pack_sequences",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, LEN({_TOKS}) AS n_tokens FROM documents),
    runs AS (
      SELECT doc_id, lang, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                 ROWS UNBOUNDED PRECEDING) AS cum
      FROM t
    )
    SELECT doc_id, lang, n_tokens,
           CAST((cum - n_tokens) // 4096 AS BIGINT) AS pack_id
    FROM runs
    """,
)
def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window packing: assign documents to fixed-token-budget packs
    (4096 here) for LLM training — the streaming first-fit approximation:
    docs in stable (lang, doc_id) order, pack = floor(preceding-tokens /
    budget).  One window (running sum) per language partition; no shuffle
    beyond the partitionBy, deterministic because the order key is unique.

    A pack can overflow the budget by at most one document (first-fit
    semantics — the downstream tokenizer truncates or splits); exact
    bin-packing is NP-hard and needs no more fidelity than this at corpus
    scale.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select("doc_id", "lang", F.size(tx.tokens("text")).alias("n_tokens"))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return t.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.floor((cum - F.col("n_tokens")) / 4096).alias("pack_id"),
    )


@query(
    "dataset_split_assign",
    oracle="""
    WITH h AS (
      SELECT doc_id, lang,
             TRY_CAST(CONCAT('0x', SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 15))
                      AS BIGINT) % 100 AS bucket
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM h
    """,
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test assignment (80/10/10) by hashing the
    stable document id — the scale-correct split: no ``rand()`` (task
    retries would reassign rows), no global sort, reproducible across runs,
    engines, and partitionings, and any late-arriving document lands in a
    stable split.  The md5-prefix hash is the engine-portable family used
    by MinHash (`operators.dedup.base_hash`), so the oracle computes the
    identical buckets.
    """
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return d.select("doc_id", "lang", split.alias("split"))


@query(
    "fuzzy_match_names",
    oracle="""
    WITH clean AS (SELECT DISTINCT p_name AS name FROM part),
    dirty AS (
      SELECT SUBSTRING(name, 1, LENGTH(name) - 1) AS dirty_name,
             SPLIT_PART(name, ' ', 1) AS blk
      FROM clean
    ),
    master AS (SELECT name, SPLIT_PART(name, ' ', 1) AS blk FROM clean)
    SELECT d.dirty_name, m.name AS matched_name,
           CAST(LEVENSHTEIN(d.dirty_name, m.name) AS INTEGER) AS dist
    FROM dirty d JOIN master m ON d.blk = m.blk
    WHERE LEVENSHTEIN(d.dirty_name, m.name) BETWEEN 1 AND 2
    """,
)
def fuzzy_match_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy string matching (entity resolution): a dirty feed matched
    against a master list by edit distance, with equi-join *blocking* so the
    comparison count is |block pairs|, never |dirty|x|master|.  Blocking is
    on the first token here; real deployments block on q-grams/phonetic
    keys — same plan shape, and recall is set by the blocking key (the
    standard ER trade, stated rather than hidden).

    The fixture names are synthetic with no natural near-misses, so the
    dirty feed is derived deterministically (last character dropped) in
    both engines — the differential check then proves the blocked
    edit-distance join itself, matching each corrupted name back to its
    source at distance 1-2.
    """
    p = load_table(spark, sf_dir, "part")
    clean = p.select(F.col("p_name").alias("name")).distinct()
    blk = F.split(F.col("name"), " ").getItem(0)
    dirty = clean.select(
        F.expr("substring(name, 1, length(name) - 1)").alias("dirty_name"),
        blk.alias("blk"),
    )
    master = clean.select("name", blk.alias("blk"))
    dist = F.levenshtein("dirty_name", "name")
    return (
        dirty.join(master, "blk")
        .filter(dist.between(1, 2))
        .select("dirty_name", F.col("name").alias("matched_name"), dist.cast("int").alias("dist"))
    )


@query(
    "dedup_winnowing",
    oracle=f"""
    WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
      SELECT doc_id,
             LIST_TRANSFORM(
               CASE WHEN LEN(toks) >= 3
                    THEN LIST_TRANSFORM(RANGE(1, LEN(toks) - 1),
                         i -> ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 2), ' '))
                    ELSE [] END,
               gr -> TRY_CAST(CONCAT('0x', SUBSTRING(MD5(gr), 1, 15)) AS BIGINT)) AS hs
      FROM t
    ),
    fp AS (
      SELECT doc_id,
             CASE WHEN LEN(hs) >= 4 THEN
                    LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, LEN(hs) - 2),
                                  i -> LIST_MIN(LIST_SLICE(hs, i, i + 3))))
                  WHEN LEN(hs) > 0 THEN [LIST_MIN(hs)]
                  ELSE [] END AS fps
      FROM g
    )
    SELECT doc_id, UNNEST(fps) AS fingerprint FROM fp
    """,
)
def dedup_winnowing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (rolling-hash window minima) fingerprints, exploded to the
    (doc_id, fingerprint) long form — join two docs on ``fingerprint`` and
    any shared token run of >= 6 tokens surfaces as a candidate pair.
    Tokens materialize as a column before the array math (perf: see
    operators.dedup docstring)."""
    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tx.tokens("text").alias("_toks"))
    part = toked.repartition(default_parallelism(spark), "doc_id")
    hashed = part.select("doc_id", tx.kgram_hashes(F.col("_toks"), k=3).alias("_hs"))
    return hashed.select(
        "doc_id",
        F.explode(tx.winnow_hashes(F.col("_hs"), w=4)).alias("fingerprint"),
    )


@query(
    "dedup_clusters",
    oracle=f"""
    WITH RECURSIVE sh_t AS (SELECT doc_id, {_SHINGLES} AS sh FROM documents),
    hs_t AS (SELECT doc_id, sh, {_BASE_HASHES} AS hs FROM sh_t WHERE LEN(sh) > 0),
    sigs AS (
      SELECT doc_id,
             {_minhash_slots_sql(8)}
      FROM hs_t
    ),
    bands AS (
      SELECT doc_id, 0 AS band,
             MD5(CAST(h0 AS VARCHAR) || '|' || CAST(h1 AS VARCHAR)) AS band_hash FROM sigs
      UNION ALL SELECT doc_id, 1, MD5(CAST(h2 AS VARCHAR) || '|' || CAST(h3 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 2, MD5(CAST(h4 AS VARCHAR) || '|' || CAST(h5 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 3, MD5(CAST(h6 AS VARCHAR) || '|' || CAST(h7 AS VARCHAR)) FROM sigs
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM bands l JOIN bands r ON l.band = r.band AND l.band_hash = r.band_hash
      WHERE l.doc_id < r.doc_id
    ),
    pairs AS (
      SELECT c.a, c.b
      FROM cands c
      JOIN sh_t sa ON sa.doc_id = c.a
      JOIN sh_t sb ON sb.doc_id = c.b
      WHERE CAST(LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))) AS DOUBLE)
              / (LEN(sa.sh) + LEN(sb.sh) - LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))))
              >= 0.5
    ),
    sym AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
    reach AS (
      SELECT u AS node, u AS r FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT reach.node, sym.v
      FROM reach JOIN sym ON reach.r = sym.u
    )
    SELECT node, MIN(r) AS component FROM reach GROUP BY node
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate GROUPS from near-dup pairs: connected components (min-label
    propagation, operators.graph) over the MinHash-LSH similarity graph —
    the step that turns pairwise matches into keep-one-per-cluster dedup.
    The oracle computes the same components via a recursive-CTE transitive
    closure + MIN(reachable)."""
    from lms_etl_pipeline_spark.operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = dd.near_dup_pairs(docs, "doc_id", "text")
    return connected_components(pairs.select("a", "b"))


@query(
    "corpus_curation_pipeline",
    oracle=f"""
    WITH RECURSIVE toks_t AS (
      SELECT doc_id, lang, {_TOKS} AS toks FROM documents
    ),
    quality AS (
      SELECT doc_id, lang, toks FROM toks_t
      WHERE LEN(toks) BETWEEN 10 AND 1000
        AND CAST(LEN(LIST_FILTER(toks, x -> x IN
              ('the','a','an','and','of','to','in','is','on'))) AS DOUBLE)
            / LEN(toks) <= 0.5
    ),
    exact_kept AS (
      SELECT MIN(doc_id) AS doc_id
      FROM quality
      GROUP BY MD5(COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(toks)), ' '), ''))
    ),
    survivors AS (
      SELECT q.doc_id, q.lang, q.toks FROM quality q
      JOIN exact_kept k ON q.doc_id = k.doc_id
    ),
    sh_t AS (
      SELECT doc_id, LIST_DISTINCT(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 1, 1)),
             i -> ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 2), ' '))) AS sh
      FROM survivors
    ),
    hs_t AS (SELECT doc_id, sh, {_BASE_HASHES} AS hs FROM sh_t WHERE LEN(sh) > 0),
    sigs AS (
      SELECT doc_id,
             {_minhash_slots_sql(8)}
      FROM hs_t
    ),
    bands AS (
      SELECT doc_id, 0 AS band,
             MD5(CAST(h0 AS VARCHAR) || '|' || CAST(h1 AS VARCHAR)) AS band_hash FROM sigs
      UNION ALL SELECT doc_id, 1, MD5(CAST(h2 AS VARCHAR) || '|' || CAST(h3 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 2, MD5(CAST(h4 AS VARCHAR) || '|' || CAST(h5 AS VARCHAR)) FROM sigs
      UNION ALL SELECT doc_id, 3, MD5(CAST(h6 AS VARCHAR) || '|' || CAST(h7 AS VARCHAR)) FROM sigs
    ),
    cands AS (
      SELECT DISTINCT l.doc_id AS a, r.doc_id AS b
      FROM bands l JOIN bands r ON l.band = r.band AND l.band_hash = r.band_hash
      WHERE l.doc_id < r.doc_id
    ),
    pairs AS (
      SELECT c.a, c.b
      FROM cands c
      JOIN sh_t sa ON sa.doc_id = c.a
      JOIN sh_t sb ON sb.doc_id = c.b
      WHERE CAST(LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))) AS DOUBLE)
              / (LEN(sa.sh) + LEN(sb.sh) - LEN(LIST_FILTER(sa.sh, s -> LIST_CONTAINS(sb.sh, s))))
              >= 0.5
    ),
    sym AS (SELECT a AS u, b AS v FROM pairs UNION ALL SELECT b, a FROM pairs),
    reach AS (
      SELECT u AS node, u AS r FROM (SELECT DISTINCT u FROM sym)
      UNION
      SELECT reach.node, sym.v FROM reach JOIN sym ON reach.r = sym.u
    ),
    comps AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node),
    dropped AS (SELECT node FROM comps WHERE node != component)
    SELECT s.doc_id, s.lang, LEN(s.toks) AS n_tokens
    FROM survivors s
    WHERE s.doc_id NOT IN (SELECT node FROM dropped)
    """,
)
def corpus_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The whole training-corpus curation story as ONE differential-tested
    pipeline: quality gates -> exact (canonical-fingerprint) dedup ->
    MinHash-LSH near-dup clustering -> keep the minimum-id doc per cluster.

    Every stage reuses the independently-verified operators (quality
    features, fingerprint, LSH pairs, connected components); the oracle
    replays the full chain in SQL, recursive closure included.  Scale: the
    chain is (narrow projections + three hash shuffles + the LSH equi-join
    + diameter-bounded label iterations) — no stage is quadratic.

    Tokenize-ONCE discipline (round 8): the corpus regex split is the
    chain's dominant per-row cost, and the naive composition pays it four
    times (quality features, fingerprint, and the minhash + verification
    legs of the LSH stage).  The pipeline now materializes the token array
    in the quality stage, fingerprints FROM it (``tx.fingerprint_of``),
    checkpoints the gated frame once — so the quality subtree itself runs
    once, not once per consumer — and hands the array to the LSH stage
    (``tokens_col=``), which skips both of its re-tokenizations.  Measured
    matched min-of-3 at sf0.1: 3.40 -> 2.87 s wall, identical results."""
    from lms_etl_pipeline_spark.operators.graph import connected_components

    d = load_table(spark, sf_dir, "documents")
    qf = materialize(
        tx.quality_features(d, "text", keep_tokens=True)
        .filter(F.col("n_tokens").between(10, 1000) & (F.col("stop_ratio") <= 0.5))
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            "_toks",
            tx.fingerprint_of(F.col("_toks")).alias("fp"),
        )
    )
    exact_kept = (
        qf.groupBy("fp").agg(F.min("doc_id").alias("doc_id")).select("doc_id")
    )
    survivors = qf.join(exact_kept, "doc_id").select(
        "doc_id", "lang", "n_tokens", "_toks"
    )
    pairs = dd.near_dup_pairs(survivors, "doc_id", "text", tokens_col="_toks")
    comps = connected_components(pairs.select("a", "b"))
    dropped = comps.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    return survivors.join(dropped, "doc_id", "left_anti").select(
        "doc_id", "lang", "n_tokens"
    )


@query("dedup_simhash", oracle=None)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash per doc + bucket by the top-16-bit prefix — the cheap
    near-dup prefilter (xxhash64 is engine-specific => rows-only check)."""
    d = load_table(spark, sf_dir, "documents")
    sh = dd.simhash64("text")
    return d.select(
        "doc_id",
        sh.alias("simhash"),
        F.substring(sh, 1, 16).alias("bucket16"),
    )


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------


def _knn_oracle(k: int = 5, n_queries: int = 5) -> str:
    d_qe = vec.dot_sql("e.embedding", "q.embedding", EMB_DIM)
    d_qq = vec.dot_sql("q.embedding", "q.embedding", EMB_DIM)
    d_ee = vec.dot_sql("e.embedding", "e.embedding", EMB_DIM)
    return f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {n_queries}),
    pairs AS (
      SELECT q.vec_id AS q_id, e.vec_id AS n_id,
             ({d_qe}) / (SQRT({d_qq}) * SQRT({d_ee})) AS cosine
      FROM q CROSS JOIN embeddings e
      WHERE e.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT q_id, n_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS rk
      FROM pairs
    )
    SELECT q_id, n_id, rk, cosine FROM ranked WHERE rk <= {k}
    """


@query("knn_cosine_exact", oracle=_knn_oracle())
def knn_cosine_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-5 cosine neighbors for the first 5 query vectors.

    Scale: the query set broadcasts; the corpus streams through once
    (linear scan).  Bit-identical to the oracle because the dot product is
    a left-assoc double fold on both engines."""
    e = load_table(spark, sf_dir, "embeddings")
    # Norms are computed ONCE PER ROW on each side below the join, not per
    # pair above it: this third of the interpreted fold work is O(|Q|+|N|)
    # instead of O(|Q|·|N|), and the emitted float is bit-identical (same
    # ops in the same order — sqrt evaluated earlier, not differently).
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        vec.norm(F.col("embedding")).alias("_nq"),
    )
    n = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        vec.norm(F.col("embedding")).alias("_nn"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(n)
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            F.try_divide(
                vec.dot(F.col("q_emb"), F.col("n_emb")),
                F.col("_nq") * F.col("_nn"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "n_id", "rk", "cosine")
    )


def _knn_filtered_oracle(k: int = 5, n_queries: int = 5) -> str:
    d_qe = vec.dot_sql("e.embedding", "q.embedding", EMB_DIM)
    d_qq = vec.dot_sql("q.embedding", "q.embedding", EMB_DIM)
    d_ee = vec.dot_sql("e.embedding", "e.embedding", EMB_DIM)
    return f"""
    WITH q AS (SELECT * FROM embeddings WHERE vec_id < {n_queries}),
    corpus AS (
      SELECT e.vec_id, e.embedding FROM embeddings e
      JOIN documents d ON d.doc_id = e.vec_id
      WHERE d.lang = 'en'
    ),
    pairs AS (
      SELECT q.vec_id AS q_id, e.vec_id AS n_id,
             ({d_qe}) / (SQRT({d_qq}) * SQRT({d_ee})) AS cosine
      FROM q CROSS JOIN corpus e
      WHERE e.vec_id != q.vec_id
    ),
    ranked AS (
      SELECT q_id, n_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cosine DESC, n_id ASC) AS rk
      FROM pairs
    )
    SELECT q_id, n_id, rk, cosine FROM ranked WHERE rk <= {k}
    """


@query("knn_filtered_exact", oracle=_knn_filtered_oracle())
def knn_filtered_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid (filtered) vector search: metadata predicate first, top-k
    cosine over the survivors — pre-filtering, the semantics every vector
    store struggles to bolt on.  In a relational engine it is just a join:
    the lang predicate prunes the corpus BEFORE any distance math, so
    selectivity directly cuts compute — and the filtered result is exact,
    not a post-filtered approximation that can return < k rows.

    Scale: same broadcast-queries × linear-corpus-scan shape as
    ``knn_cosine_exact``; the metadata join rides the same scan.
    """
    e = load_table(spark, sf_dir, "embeddings")
    d = load_table(spark, sf_dir, "documents")
    corpus = (
        e.join(d.filter(F.col("lang") == "en"), e.vec_id == d.doc_id)
        .select(
            F.col("vec_id").alias("n_id"),
            F.col("embedding").alias("n_emb"),
            vec.norm(F.col("embedding")).alias("_nn"),
        )
    )
    q = e.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        vec.norm(F.col("embedding")).alias("_nq"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(corpus)
        .filter(F.col("n_id") != F.col("q_id"))
        # per-row norms below the join (1 fold per pair, not 3)
        .select(
            "q_id",
            "n_id",
            F.try_divide(
                vec.dot(F.col("q_emb"), F.col("n_emb")), F.col("_nq") * F.col("_nn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("q_id", "n_id", "rk", "cosine")
    )


# Fixed literal hyperplanes (versioned constants — reproducible bucketing).
_RNG = random.Random(7)
HYPERPLANES: list[list[float]] = [
    [_RNG.uniform(-1.0, 1.0) for _ in range(EMB_DIM)] for _ in range(8)
]


@query("knn_cosine_lsh", oracle=None)
def knn_cosine_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via random-hyperplane LSH: bucket on the
    8-bit sign signature, then exact cosine *within* the bucket.

    The 100 TB path: candidate generation is an equi-join on ``bucket``
    (256 uniform keys) instead of a corpus cross join.  Approximate recall
    => rows-only check; the exact twin above is the correctness anchor."""
    e = load_table(spark, sf_dir, "embeddings")
    bucketed = e.select(
        "vec_id", "embedding", vec.hyperplane_bucket(F.col("embedding"), HYPERPLANES).alias("bucket")
    )
    q = bucketed.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        vec.norm(F.col("embedding")).alias("_nq"),
        "bucket",
    )
    n = bucketed.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        vec.norm(F.col("embedding")).alias("_nn"),
        "bucket",
    )
    pairs = (
        q.join(n, "bucket")
        .filter(F.col("n_id") != F.col("q_id"))
        # per-row norms below the join (1 fold per pair, not 3)
        .select(
            "q_id",
            "n_id",
            F.try_divide(
                vec.dot(F.col("q_emb"), F.col("n_emb")), F.col("_nq") * F.col("_nn")
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("q_id", "n_id", "rk", "cosine")
    )


@query("near_dup_pairs_mllib", oracle=None)
def near_dup_pairs_mllib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ``MinHashLSH`` twin of ``near_dup_pairs_lsh`` (SURVEY §2.12
    names the MLlib primitive; the native-expression pipeline above is the
    oracle-parity path).  3-gram shingles -> HashingTF -> MinHashLSH ->
    approxSimilarityJoin on Jaccard distance <= 0.5.  Shingles, not raw
    tokens: token-set Jaccard conflates docs that merely share common
    vocabulary (measured: 88k of 125k possible pairs 'similar' at sf0.01).
    Random hash family => rows-only check."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    d = load_table(spark, sf_dir, "documents")
    toked = d.select("doc_id", tx.tokens("text").alias("_toks")).filter(F.size("_toks") >= 3)
    shingled = toked.repartition(
        default_parallelism(spark), "doc_id"
    ).select("doc_id", F.array_distinct(tx.shingles(F.col("_toks"), n=3)).alias("toks"))
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=1 << 18, binary=True)
    # localCheckpoint as a plan BARRIER, not (only) a cache: inside
    # approxSimilarityJoin's self-join rewrite Catalyst re-collapses the
    # projections and evaluates the MinHash UDF BEFORE this size filter,
    # so a zero-token document (empty/whitespace text) aborts the join
    # with "Must have at least 1 non zero entry" even though the filter
    # excludes it (hostile-text fixture sweep).  Freezing the filtered
    # frame keeps the UDF strictly after the filter.
    # (materialize()'s persist path is an equivalent barrier: a cached
    # frame plans as InMemoryRelation, which projection collapse cannot
    # cross.)
    feats = materialize(tf.transform(shingled).filter(F.size("toks") > 0))
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=42)
    model = mh.fit(feats)
    pairs = model.approxSimilarityJoin(feats, feats, 0.5, distCol="jaccard_dist")
    return (
        pairs.filter(F.col("datasetA.doc_id") < F.col("datasetB.doc_id"))
        .select(
            F.col("datasetA.doc_id").alias("a"),
            F.col("datasetB.doc_id").alias("b"),
            F.round(F.lit(1.0) - F.col("jaccard_dist"), 6).alias("jaccard"),
        )
    )


@query("knn_mllib_brp", oracle=None)
def knn_mllib_brp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib ``BucketedRandomProjectionLSH`` ANN over the embeddings —
    the Euclidean-distance scale path (SURVEY §2.12 similarity row);
    ``knn_cosine_exact`` stays the oracle-checked anchor."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=42
    )
    if e.isEmpty():
        # MLlib's fit() crashes on a zero-row frame ("head of empty
        # array"); an empty corpus must yield an empty result.  The probe
        # is a LIMIT-1 scan — negligible against the fit it gates.
        return spark.createDataFrame(
            [], "q_id BIGINT, n_id BIGINT, dist DOUBLE, rk INT"
        )
    model = brp.fit(e)
    q = e.filter(F.col("vec_id") < 5)
    pairs = model.approxSimilarityJoin(q, e, 10.0, distCol="dist")
    w = Window.partitionBy("q_id").orderBy(F.col("dist").asc(), F.col("n_id").asc())
    return (
        pairs.filter(F.col("datasetA.vec_id") != F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("q_id"),
            F.col("datasetB.vec_id").alias("n_id"),
            F.round("dist", 6).alias("dist"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
    )


@query("knn_cosine_ivf", oracle=None)
def knn_cosine_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate top-3 neighbors via an IVF (inverted-file) index:
    partition the corpus into cells around fixed coarse centroids, probe
    only the 2 cells nearest each query.

    Centroids here are the first 16 corpus vectors (deterministic; a real
    build runs k-means once and versions the centroids).  Cell assignment
    is one broadcast-join pass — ``argmax_j cos(v, c_j)`` as a codegen'd
    expression over a 16-element struct array.  The probe join is an
    equi-join on ``cell``: at 100 TB the corpus scan is replaced by
    reading ~nprobe/nlist of the data — the classic IVF trade.
    Approximate recall => rows-only check; ``knn_cosine_exact`` anchors
    correctness."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = [
        [float(x) for x in r["embedding"]]
        for r in e.filter(F.col("vec_id") < 16).orderBy("vec_id").collect()
    ]
    if not cents:
        # an empty corpus has no centroids and no neighbors — return the
        # empty result with the contract schema instead of feeding a
        # zero-row centroid matrix to the scoring UDF (numpy AxisError)
        return spark.createDataFrame(
            [], "q_id BIGINT, n_id BIGINT, rk INT, cosine DOUBLE"
        )

    def best_cells(df: DataFrame, nprobe: int) -> DataFrame:
        # one Arrow-batched numpy matmul per batch scores all 16 cells;
        # argsort top-nprobe cells via array_sort over (score, cell) structs
        scored = df.withColumn("_scores", vec.cosines_to_centroids(F.col("embedding"), cents))
        ranked = F.slice(
            F.reverse(
                F.array_sort(
                    F.transform(
                        F.col("_scores"),
                        lambda s, i: F.struct(s.alias("cos"), i.alias("cell")),
                    )
                )
            ),
            1,
            nprobe,
        )
        return scored.withColumn("cell", F.explode(F.transform(ranked, lambda s: s["cell"]))).drop(
            "_scores"
        )

    corpus = (
        best_cells(e.select(F.col("vec_id").alias("n_id"), F.col("embedding")), 1)
        .withColumnRenamed("embedding", "n_emb")
        .withColumn("_nn", vec.norm(F.col("n_emb")))
    )
    qset = (
        best_cells(
            e.filter(F.col("vec_id") < 20).select(F.col("vec_id").alias("q_id"), F.col("embedding")), 2
        )
        .withColumnRenamed("embedding", "q_emb")
        .withColumn("_nq", vec.norm(F.col("q_emb")))
    )
    pairs = (
        corpus.join(F.broadcast(qset), "cell")
        .filter(F.col("n_id") != F.col("q_id"))
        # norms precomputed per row below the join (1 fold per pair, not 3)
        .select(
            "q_id",
            "n_id",
            F.try_divide(
                vec.dot(F.col("q_emb"), F.col("n_emb")), F.col("_nq") * F.col("_nn")
            ).alias("cosine"),
        )
        # a (q, n) pair can appear via both probed cells
        .dropDuplicates(["q_id", "n_id"])
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cosine").desc(), F.col("n_id").asc())
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("q_id", "n_id", "rk", "cosine")
    )


@query(
    "dedup_embedding_cosine",
    oracle=f"""
    WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 300)
    SELECT a.vec_id AS a, b.vec_id AS b,
           ROUND(({vec.dot_sql('a.embedding', 'b.embedding', EMB_DIM)})
                 / (SQRT({vec.dot_sql('a.embedding', 'a.embedding', EMB_DIM)})
                    * SQRT({vec.dot_sql('b.embedding', 'b.embedding', EMB_DIM)})), 6) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE ({vec.dot_sql('a.embedding', 'b.embedding', EMB_DIM)})
          / (SQRT({vec.dot_sql('a.embedding', 'a.embedding', EMB_DIM)})
             * SQRT({vec.dot_sql('b.embedding', 'b.embedding', EMB_DIM)})) >= 0.4
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs, exact mode (oracle anchor).

    All-pairs on a bounded id range so the oracle stays O(n²)-small; the
    production path is the same cosine filter after hyperplane-LSH
    bucketing (``knn_cosine_lsh``) or IVF cells (``knn_cosine_ivf``) —
    candidate generation by equi-join, never a corpus cross join."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 300)
    # Per-side norms below the join: one interpreted fold per PAIR instead
    # of three (the dot); measured ~1.6x on the warm sf0.1 bench run,
    # bit-identical output (same float ops, evaluated once per row).
    a = e.select(
        F.col("vec_id").alias("a"),
        F.col("embedding").alias("ea"),
        vec.norm(F.col("embedding")).alias("_na"),
    )
    b = e.select(
        F.col("vec_id").alias("b"),
        F.col("embedding").alias("eb"),
        vec.norm(F.col("embedding")).alias("_nb"),
    )
    return (
        a.crossJoin(b)
        .filter(F.col("a") < F.col("b"))
        .withColumn(
            "cosine",
            F.try_divide(
                vec.dot(F.col("ea"), F.col("eb")), F.col("_na") * F.col("_nb")
            ),
        )
        .filter(F.col("cosine") >= 0.4)
        .select("a", "b", F.round("cosine", 6).alias("cosine"))
    )


@query(
    "embedding_norm_stats",
    oracle=f"""
    SELECT label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CAST(FLOOR(SQRT({vec.dot_sql('embeddings.embedding', 'embeddings.embedding', EMB_DIM)})
                * 1000000000) AS BIGINT)) AS DOUBLE) / 1000000000.0 / COUNT(*)
             AS avg_norm
    FROM embeddings
    GROUP BY label
    """,
)
def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label vector-norm statistics.  Norms are quantized by
    FLOOR(norm*1e9) — identical IEEE multiply + floor in both engines, no
    rounding tie possible — then summed as exact integers (order-free)."""
    e = load_table(spark, sf_dir, "embeddings")
    n_u = F.floor(vec.norm(F.col("embedding")) * 1_000_000_000).cast("bigint")
    return (
        e.groupBy("label")
        .agg(
            F.count("*").alias("n_vectors"),
            (F.sum(n_u).cast("double") / 1_000_000_000.0 / F.count("*"))
            .alias("avg_norm"),
        )
    )


@query(
    "embedding_centroids",
    oracle="""
    WITH ex AS (
      SELECT label,
             CAST(UNNEST(RANGE(0, LEN(embedding))) AS INTEGER) AS dim,
             UNNEST(embedding) AS x
      FROM embeddings
    )
    SELECT label, dim,
           CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * 1000000000) AS BIGINT))
                AS DOUBLE) / 1000000000.0 / COUNT(*) AS mean_val
    FROM ex GROUP BY label, dim
    """,
)
def embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors in long form (label, dim, mean) — the
    k-means/IVF training step (`knn_cosine_ivf` consumes exactly these cell
    centroids) made oracle-exact: each value is quantized by FLOOR(x*1e9)
    — the same IEEE multiply then the same floor in both engines, so no
    rounding TIE can ever split them (a float that is an odd multiple of
    2^-10, e.g. 0.1494140625, lands exactly on a .5 nano boundary, where
    Spark's HALF_UP decimal cast and DuckDB's multiply-and-round disagree
    — found live at sf0.1, pinned in tests/test_numeric_conventions.py)
    — then summed as exact integers (order-free distributed reduction).

    Plan: ONE posexplode to (label, dim, x) long form — 64 rows per vector —
    then a partial+final hash agg on (label, dim); both keys are uniform, no
    skew, linear at any corpus size.  The long form IS the scale trick:
    no per-row array state survives the shuffle, only per-(group, dim)
    partials.
    """
    e = load_table(spark, sf_dir, "embeddings")
    ex = e.select("label", F.posexplode("embedding").alias("dim", "x"))
    x_u = F.floor(F.col("x").cast("double") * 1_000_000_000).cast("bigint")
    return ex.groupBy("label", "dim").agg(
        (F.sum(x_u).cast("double") / 1_000_000_000.0 / F.count("*"))
        .alias("mean_val")
    )


@query(
    "udtf_sentence_split",
    oracle=r"""
    WITH s AS (
      SELECT doc_id,
             LIST_FILTER(LIST_TRANSFORM(STRING_SPLIT_REGEX(text, '[.!?]+'),
                                        x -> TRIM(x)), x -> x != '') AS sents
      FROM documents
    )
    SELECT doc_id,
           CAST(UNNEST(RANGE(1, LEN(sents) + 1)) AS INTEGER) AS sentence_idx,
           UNNEST(sents) AS sentence
    FROM s
    """,
)
def udtf_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function): one input doc -> N sentence rows.

    The UDTF is the row-generating escape hatch when explode over a single
    array expression can't express the logic (stateful parsers, multi-column
    emission).  This one IS regex-expressible — deliberately, so the UDTF
    machinery itself (arrow transfer, lateral join planning) gets an oracle
    check.  Scale: evaluated per-partition, no shuffle added."""
    import re as _re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx INT, sentence STRING")
    class SentenceSplitDense:
        def eval(self, text: str):
            if text is None:
                return
            idx = 0
            for raw in _re.split(r"[.!?]+", text):
                s = raw.strip()
                if s:
                    idx += 1
                    yield idx, s

    spark.udtf.register("sentence_split", SentenceSplitDense)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("docs_udtf")
    return spark.sql(
        """
        SELECT d.doc_id, s.sentence_idx, s.sentence
        FROM docs_udtf d, LATERAL sentence_split(d.text) s
        """
    )


@query(
    "pandas_udaf_geomean",
    oracle="""
    SELECT c_mktsegment,
           ROUND(EXP(SUM(LN(c_acctbal)) / COUNT(*)), 4) AS geomean_bal,
           COUNT(*) AS n
    FROM customer WHERE c_acctbal > 0
    GROUP BY c_mktsegment
    """,
)
def pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas UDAF (grouped-aggregate pandas_udf): per-segment geometric
    mean — a custom aggregate Spark lacks natively, Arrow-batched per
    group.  Rounded to 4 decimals: the log-sum is an order-dependent float
    reduction, and 1e-4 absorbs the cross-engine ulp drift the exact
    decimal trick can't fix for transcendental functions."""
    from lms_etl_pipeline_spark.functions.pandas_aggs import geomean, pd_count

    c = load_table(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    return c.groupBy("c_mktsegment").agg(
        F.round(geomean("c_acctbal"), 4).alias("geomean_bal"),
        pd_count("c_acctbal").alias("n"),
    )


@query(
    "applyinpandas_group_rank",
    oracle="""
    SELECT c_mktsegment, c_custkey, c_acctbal,
           CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                   ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT) AS bal_rank
    FROM customer
    """,
)
def applyinpandas_group_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas``: per-segment pandas computation (here a
    deterministic in-group rank) — the escape hatch for group-local logic
    Spark expressions can't state (model scoring per group, per-entity
    curve fitting).  Integer outputs with a total tiebreak keep it
    oracle-checkable.

    Scale: one shuffle on the group key; each group must fit one executor's
    memory — use only for bounded groups (segments, entities), never for
    whole-table 'groups'."""
    import pandas as pd

    def rank_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["c_acctbal", "c_custkey"], ascending=[False, True])
        pdf["bal_rank"] = range(1, len(pdf) + 1)
        return pdf

    c = load_table(spark, sf_dir, "customer").select("c_mktsegment", "c_custkey", "c_acctbal")
    return c.groupBy("c_mktsegment").applyInPandas(
        rank_group,
        "c_mktsegment STRING, c_custkey BIGINT, c_acctbal DOUBLE, bal_rank BIGINT",
    )


@query(
    "cogroup_pandas_asof",
    oracle="""
    WITH clicks AS (
      SELECT user_id, ts FROM events WHERE event_type = 'click' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id,
           CAST(DATEDIFF('microsecond', c.ts, p.ts) AS BIGINT) AS micros_since_click
    FROM purchases p ASOF LEFT JOIN clicks c
      ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def cogroup_pandas_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cogrouped ``applyInPandas`` — the fourth Python-compute shape (after
    grouped-map, grouped-agg, UDTF): two frames cogrouped on a key, each
    pair of per-key pandas frames merged with ``pd.merge_asof``.  Semantics
    mirror the native as-of join (``join_asof_last_click``), which is the
    point: the same oracle checks Spark's JVM path and the Arrow-batched
    pandas path, and the time-since-last-click delta is exact integer
    microseconds on both engines.

    Scale: one shuffle per side on user_id; each user's event history must
    fit in one task's memory — the cogroup contract (bounded per-entity
    history), never whole-table groups.
    """
    import pandas as pd

    def asof_merge(purchases: pd.DataFrame, clicks: pd.DataFrame) -> pd.DataFrame:
        if len(purchases) == 0:
            return pd.DataFrame(
                {"event_id": pd.Series(dtype="int64"),
                 "user_id": pd.Series(dtype="int64"),
                 "micros_since_click": pd.Series(dtype="Int64")}
            )
        p = purchases.sort_values("ts")
        c = clicks.sort_values("ts").assign(click_ts=lambda d: d["ts"])
        merged = pd.merge_asof(p, c[["ts", "click_ts"]], on="ts", direction="backward")
        micros = (merged["ts"] - merged["click_ts"]) // pd.Timedelta(microseconds=1)
        return pd.DataFrame(
            {"event_id": merged["event_id"],
             "user_id": merged["user_id"],
             "micros_since_click": micros.astype("Int64")}
        )

    e = load_table(spark, sf_dir, "events")
    clicks = (
        e.filter(F.col("event_type") == "click").select("user_id", "ts").distinct()
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    return (
        purchases.groupBy("user_id")
        .cogroup(clicks.groupBy("user_id"))
        .applyInPandas(
            asof_merge, "event_id BIGINT, user_id BIGINT, micros_since_click BIGINT"
        )
    )


# ---------------------------------------------------------------------------
# Multimodal columns
# ---------------------------------------------------------------------------


@query(
    "multimodal_join_features",
    oracle=f"""
    SELECT d.doc_id, d.lang, d.source, e.label,
           OCTET_LENGTH(ENCODE(d.text)) AS payload_bytes,
           MD5(d.text) AS payload_md5,
           ROUND(SQRT({vec.dot_sql('e.embedding', 'e.embedding', EMB_DIM)}), 6) AS emb_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    """,
)
def multimodal_join_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One multimodal row per document: text payload treated as opaque
    binary (length + content hash) + typed metadata + its embedding — the
    canonical multimodal-table shape (binary column, array<float> column,
    scalar metadata) joined on the shared id."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    payload = F.encode(F.col("text"), "UTF-8")
    return (
        d.join(e, d.doc_id == e.vec_id)
        .select(
            "doc_id",
            "lang",
            "source",
            "label",
            F.octet_length(payload).alias("payload_bytes"),
            F.md5(payload).alias("payload_md5"),
            F.round(vec.norm(F.col("embedding")), 6).alias("emb_norm"),
        )
    )
