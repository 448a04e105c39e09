"""Graph-traversal, retrieval-eval, and dedup-calibration plans (split
from the round-5c sequences wave).

Bounded BFS over the customer→supplier order graph, common-neighbor node
similarity, MRR/NDCG ranking metrics, Matryoshka truncation eval,
shingle-containment pairs, B-cubed blocking quality, embedding centroid
drift, LSH s-curve calibration, and the MinHash estimator error profile
— the measurements that certify the engine's approximate similarity
paths with exactly-checkable numbers.

Scale shapes: every hop/probe is an equi-join (frontier x edges, band x
band); all-pairs shapes exist only as bounded id-range calibration
anchors whose row bounds are DECLARED and machine-checked by
tools/audit_plans.py.  Numeric discipline as in plans/timeseries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.operators import dedup as dd
from lms_etl_pipeline_spark.operators import vectors as vec
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.plans.llm import EMB_DIM
from lms_etl_pipeline_spark.sources.tables import load_table

# --------------------------------------------------------------------------
# k-hop reachability over the order graph
# --------------------------------------------------------------------------


@query(
    "khop_reachability",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    src AS (SELECT DISTINCT cust FROM edges WHERE cust < 25),
    hop1 AS (
      SELECT s.cust, e.supp FROM src s JOIN edges e ON e.cust = s.cust),
    hop2 AS (
      SELECT DISTINCT h.cust, e2.cust AS cocust
      FROM hop1 h JOIN edges e2 ON e2.supp = h.supp
      WHERE e2.cust <> h.cust),
    hop3 AS (
      SELECT DISTINCT h2.cust, e3.supp
      FROM hop2 h2 JOIN edges e3 ON e3.cust = h2.cocust),
    a1 AS (SELECT cust, COUNT(*) AS n1 FROM hop1 GROUP BY 1),
    a2 AS (SELECT cust, COUNT(*) AS n2 FROM hop2 GROUP BY 1),
    a3 AS (SELECT cust, COUNT(*) AS n3 FROM hop3 GROUP BY 1)
    SELECT s.cust AS src_custkey,
           CAST(COALESCE(a1.n1, 0) AS BIGINT) AS n_direct_suppliers,
           CAST(COALESCE(a2.n2, 0) AS BIGINT) AS n_cocustomers_2hop,
           CAST(COALESCE(a3.n3, 0) AS BIGINT) AS n_suppliers_3hop
    FROM src s
    LEFT JOIN a1 ON a1.cust = s.cust
    LEFT JOIN a2 ON a2.cust = s.cust
    LEFT JOIN a3 ON a3.cust = s.cust
    """,
)
def khop_reachability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded breadth-first expansion over the bipartite customer→supplier
    order graph (the same edge set as ``pagerank_graph``): per source
    customer, the count of directly-used suppliers, of 2-hop co-customers
    (share a supplier), and of suppliers in the 3-hop closure — the
    neighborhood-size features fraud/recommendation graph pipelines attach
    to every node.

    Each hop is an EQUI-join of the current frontier against the edge
    list, with DISTINCT collapsing the frontier between hops so fan-out
    never compounds — the standard distributed BFS layout.  All outputs
    are exact integers.

    Scale: edges partition by join key per hop; frontiers stay bounded by
    |nodes|, not paths, because of the per-hop DISTINCT.  The source set
    here is a fixed key-range slice; an open-ended variant iterates
    frontier joins under localCheckpoint like ``operators/graph.py``.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    src = edges.filter(F.col("cust") < 25).select("cust").distinct()
    hop1 = src.join(edges, "cust")  # (cust, supp)
    h1 = hop1.groupBy("cust").agg(
        F.count("*").cast("bigint").alias("n_direct_suppliers")
    )
    e2 = edges.select(F.col("cust").alias("cocust"), "supp")
    hop2 = (
        hop1.join(e2, "supp")
        .filter(F.col("cocust") != F.col("cust"))
        .select("cust", "cocust")
        .distinct()
    )
    h2 = hop2.groupBy("cust").agg(
        F.count("*").cast("bigint").alias("n_cocustomers_2hop")
    )
    e3 = edges.select(F.col("cust").alias("cocust"), F.col("supp").alias("supp3"))
    hop3 = hop2.join(e3, "cocust").select("cust", "supp3").distinct()
    h3 = hop3.groupBy("cust").agg(
        F.count("*").cast("bigint").alias("n_suppliers_3hop")
    )
    return (
        src.select(F.col("cust").alias("src_custkey"))
        .join(h1, F.col("src_custkey") == h1.cust, "left")
        .drop("cust")
        .join(h2, F.col("src_custkey") == h2.cust, "left")
        .drop("cust")
        .join(h3, F.col("src_custkey") == h3.cust, "left")
        .drop("cust")
        .select(
            "src_custkey",
            F.coalesce("n_direct_suppliers", F.lit(0)).alias("n_direct_suppliers"),
            F.coalesce("n_cocustomers_2hop", F.lit(0)).alias("n_cocustomers_2hop"),
            F.coalesce("n_suppliers_3hop", F.lit(0)).alias("n_suppliers_3hop"),
        )
    )

# --------------------------------------------------------------------------
# Retrieval ranking metrics: MRR + NDCG@10
# --------------------------------------------------------------------------

_NDCG_K = 10
_N_RETRIEVAL_Q = 10
#: Discount weights 1/log2(rank+1), rank 1..10, and their prefix sums —
#: injected as IDENTICAL Python double literals into both engines so no
#: cross-libm log2 enters the differential surface.
_DCG_W = [1.0 / __import__("math").log2(r + 1) for r in range(1, _NDCG_K + 1)]
_DCG_W_R = [round(w, 9) for w in _DCG_W]
_IDCG_PREFIX = [round(sum(_DCG_W_R[: i + 1]), 9) for i in range(_NDCG_K)]


def _retrieval_oracle() -> str:
    d_qn = vec.dot_sql("q.embedding", "n.embedding", EMB_DIM)
    d_qq = vec.dot_sql("q.embedding", "q.embedding", EMB_DIM)
    d_nn = vec.dot_sql("n.embedding", "n.embedding", EMB_DIM)
    w_case = " ".join(
        f"WHEN {r} THEN {_DCG_W_R[r - 1]!r}" for r in range(1, _NDCG_K + 1)
    )
    idcg_case = " ".join(
        f"WHEN {i + 1} THEN {_IDCG_PREFIX[i]!r}" for i in range(_NDCG_K)
    )
    return f"""
    WITH q AS (SELECT vec_id, embedding, label FROM embeddings
               WHERE vec_id < {_N_RETRIEVAL_Q}),
    ranked AS (
      SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             (n.label = q.label) AS rel,
             ROW_NUMBER() OVER (
               PARTITION BY q.vec_id
               ORDER BY ({d_qn}) / (SQRT({d_qq}) * SQRT({d_nn})) DESC,
                        n.vec_id ASC) AS rk
      FROM q, embeddings n WHERE n.vec_id <> q.vec_id),
    top AS (SELECT * FROM ranked WHERE rk <= {_NDCG_K}),
    lc AS (SELECT label, COUNT(*) AS cnt FROM embeddings GROUP BY 1),
    nrel AS (
      SELECT q.vec_id AS q_id,
             LEAST(CAST(lc.cnt - 1 AS BIGINT), {_NDCG_K}) AS r_total
      FROM q JOIN lc ON lc.label = q.label),
    per_q AS (
      SELECT q_id,
             CAST(COALESCE(MIN(rk) FILTER (WHERE rel), 0) AS BIGINT)
               AS first_rel_rank,
             SUM(CASE WHEN rel THEN
                   CAST(CASE rk {w_case} END AS DECIMAL(18,9))
                 ELSE CAST(0 AS DECIMAL(18,9)) END) AS dcg
      FROM top GROUP BY q_id)
    SELECT p.q_id, p.first_rel_rank,
           ROUND(CASE WHEN p.first_rel_rank = 0 THEN CAST(0 AS DOUBLE)
                      ELSE CAST(1 AS DOUBLE) / p.first_rel_rank END, 6) AS rr,
           ROUND(CAST(p.dcg AS DOUBLE)
                 / CAST((CASE n.r_total {idcg_case} ELSE NULL END) AS DOUBLE),
                 6) AS ndcg10
    FROM per_q p JOIN nrel n ON n.q_id = p.q_id
    """


@query("retrieval_mrr_ndcg", oracle=_retrieval_oracle())
def retrieval_mrr_ndcg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal rank and NDCG@10 per query for exact cosine retrieval
    with label-match relevance — the two metrics every embedding-retrieval
    stack reports (MRR for "where is the first hit", NDCG for graded list
    quality), closing the eval suite next to ``ann_recall_eval`` (recall)
    and ``quality_ranker_auc`` (classification).

    Determinism: ranks come from the bit-stable cosine (same left-assoc
    fold both engines) with vec_id tiebreak; DCG discount weights are the
    SAME Python double literals injected into both engines, per-term
    rounded then DECIMAL-summed (order-independent); IDCG is a prefix-sum
    lookup on the capped relevant count.  One final rounded division.

    Scale: the {_N_RETRIEVAL_Q}-query set broadcasts and the corpus
    streams through once (linear scan), the `knn_cosine_exact` layout; the
    per-query relevant-count is the same broadcast against a hash
    aggregate.  Metrics aggregate over top-k rows only.
    """
    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < _N_RETRIEVAL_Q).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        F.col("label").alias("q_label"),
        vec.norm(F.col("embedding")).alias("_nq"),
    )
    n = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        F.col("label").alias("n_label"),
        vec.norm(F.col("embedding")).alias("_nn"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(n)
        .filter(F.col("n_id") != F.col("q_id"))
        .select(
            "q_id",
            "n_id",
            (F.col("n_label") == F.col("q_label")).alias("rel"),
            # try_divide: zero-norm vectors => NULL cosine (hostile sweep)
            F.try_divide(
                vec.dot(F.col("q_emb"), F.col("n_emb")),
                F.col("_nq") * F.col("_nn"),
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(
        F.col("cosine").desc(), F.col("n_id").asc()
    )
    top = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _NDCG_K)
    )
    # CASE rank -> literal weight, identical literal set as the oracle.
    weight = F.when(
        F.col("rk") == 1, F.lit(_DCG_W_R[0]).cast("decimal(18,9)")
    )
    for r in range(2, _NDCG_K + 1):
        weight = weight.when(
            F.col("rk") == r, F.lit(_DCG_W_R[r - 1]).cast("decimal(18,9)")
        )
    per_q = top.groupBy("q_id").agg(
        F.coalesce(
            F.min(F.when(F.col("rel"), F.col("rk"))), F.lit(0)
        ).cast("bigint").alias("first_rel_rank"),
        F.sum(
            F.when(F.col("rel"), weight).otherwise(
                F.lit(0).cast("decimal(18,9)")
            )
        ).alias("dcg"),
    )
    lc = e.groupBy(F.col("label")).agg(F.count("*").alias("cnt"))
    nrel = (
        q.select("q_id", "q_label")
        .join(F.broadcast(lc), F.col("q_label") == F.col("label"))
        .select(
            "q_id",
            F.least(F.col("cnt") - 1, F.lit(_NDCG_K))
            .cast("bigint")
            .alias("r_total"),
        )
    )
    idcg = None
    for i in range(_NDCG_K):
        if idcg is None:
            idcg = F.when(F.col("r_total") == i + 1, F.lit(_IDCG_PREFIX[i]))
        else:
            idcg = idcg.when(F.col("r_total") == i + 1, F.lit(_IDCG_PREFIX[i]))
    rr = F.when(F.col("first_rel_rank") == 0, F.lit(0.0)).otherwise(
        F.lit(1.0) / F.col("first_rel_rank")
    )
    return per_q.join(nrel, "q_id").select(
        "q_id",
        "first_rel_rank",
        F.round(rr, 6).alias("rr"),
        F.round(F.col("dcg").cast("double") / idcg, 6).alias("ndcg10"),
    )

# --------------------------------------------------------------------------
# Common-neighbor (Jaccard) node similarity
# --------------------------------------------------------------------------

_CN_MIN_SHARED = 20


@query(
    "supplier_common_neighbors",
    oracle=f"""
    WITH edges AS (
      SELECT DISTINCT o_custkey AS cust, l_suppkey AS supp
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    deg AS (SELECT supp, COUNT(*) AS d FROM edges GROUP BY 1),
    shared AS (
      SELECT a.supp AS s1, b.supp AS s2, COUNT(*) AS n_shared
      FROM edges a JOIN edges b ON a.cust = b.cust AND a.supp < b.supp
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_CN_MIN_SHARED})
    SELECT s.s1, s.s2, CAST(s.n_shared AS BIGINT) AS n_shared,
           ROUND(CAST(s.n_shared AS DOUBLE)
                 / (d1.d + d2.d - s.n_shared), 6) AS jaccard
    FROM shared s
    JOIN deg d1 ON d1.supp = s.s1
    JOIN deg d2 ON d2.supp = s.s2
    """,
)
def supplier_common_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Common-neighbor Jaccard similarity between suppliers over the
    shared-customer graph — the link-prediction / entity-similarity
    primitive ("suppliers with overlapping demand") behind substitution
    analysis and graph-based recommendations, and the node-level analogue
    of ``item_cooccurrence_cf``.

    Candidate pairs are generated per customer (equi-join on cust with
    s1 < s2 orientation), so the work is sum(per-customer degree
    choose 2) — never |suppliers|² against the raw graph; the min-shared
    floor then bounds the output.  Jaccard = shared / (d1 + d2 - shared)
    from exact integer counts, rounded once.

    Scale: a power-law hot customer would quadratically inflate its
    contribution; the documented mitigation is the basket cap used by
    ``item_cooccurrence_cf`` (drop or sample mega-degree nodes before
    pairing), standard in production co-occurrence mining.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("cust"), F.col("l_suppkey").alias("supp"))
        .distinct()
    )
    deg = edges.groupBy("supp").agg(F.count("*").alias("d"))
    a = edges.select("cust", F.col("supp").alias("s1"))
    b = edges.select("cust", F.col("supp").alias("s2"))
    shared = (
        a.join(b, "cust")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= _CN_MIN_SHARED)
    )
    d1 = deg.select(F.col("supp").alias("s1"), F.col("d").alias("d1"))
    d2 = deg.select(F.col("supp").alias("s2"), F.col("d").alias("d2"))
    return (
        shared.join(d1, "s1")
        .join(d2, "s2")
        .select(
            "s1",
            "s2",
            F.col("n_shared").cast("bigint").alias("n_shared"),
            F.round(
                F.col("n_shared").cast("double")
                / (F.col("d1") + F.col("d2") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )

# --------------------------------------------------------------------------
# First-in-window dedup (batch twin of dropDuplicatesWithinWatermark)
# --------------------------------------------------------------------------


@query(
    "dedup_first_in_window",
    oracle="""
    WITH b AS (
      SELECT event_id, user_id, event_type, ts,
             ROW_NUMBER() OVER (
               PARTITION BY user_id, event_type,
                            CAST(FLOOR(epoch_us(ts) / 600000000) AS BIGINT)
               ORDER BY ts ASC, event_id ASC) AS rn
      FROM events)
    SELECT event_id, user_id, event_type, ts FROM b WHERE rn = 1
    """,
)
def dedup_first_in_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep only the FIRST event per (user, type) within each 10-minute
    tumbling window — the batch-checkable twin of streaming
    ``dropDuplicatesWithinWatermark`` (runtime-tested in
    `tests/test_streaming.py`): retries/at-least-once delivery collapse to
    one effect per key per window.

    Window identity is exact integer µs arithmetic (epoch div 600e6), the
    survivor is the (ts, event_id) minimum — total order, engine-stable.

    Scale: ONE window shuffle keyed by (user, type, window) — high
    cardinality, no hot key; in streaming the same key set is the state
    store key and the watermark bounds its size.
    """
    e = load_table(spark, sf_dir, "events")
    win = F.floor(F.unix_micros(F.col("ts")) / 600_000_000).cast("bigint")
    w = Window.partitionBy("user_id", "event_type", win).orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return (
        e.select(
            "event_id", "user_id", "event_type", "ts",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )

# --------------------------------------------------------------------------
# Matryoshka truncation eval (retrieval overlap at reduced dimension)
# --------------------------------------------------------------------------

_MRL_DIM = 16


def _mrl_oracle() -> str:
    full_qn = vec.dot_sql("q.embedding", "n.embedding", EMB_DIM)
    full_qq = vec.dot_sql("q.embedding", "q.embedding", EMB_DIM)
    full_nn = vec.dot_sql("n.embedding", "n.embedding", EMB_DIM)
    tr_qn = vec.dot_sql("q.embedding", "n.embedding", _MRL_DIM)
    tr_qq = vec.dot_sql("q.embedding", "q.embedding", _MRL_DIM)
    tr_nn = vec.dot_sql("n.embedding", "n.embedding", _MRL_DIM)
    return f"""
    WITH q AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
    pairs AS (
      SELECT q.vec_id AS q_id, n.vec_id AS n_id,
             ({full_qn}) / (SQRT({full_qq}) * SQRT({full_nn})) AS cos_full,
             ({tr_qn}) / (SQRT({tr_qq}) * SQRT({tr_nn})) AS cos_tr
      FROM q, embeddings n WHERE n.vec_id <> q.vec_id),
    rk AS (
      SELECT q_id, n_id,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_full DESC, n_id ASC) AS r_full,
             ROW_NUMBER() OVER (PARTITION BY q_id
                                ORDER BY cos_tr DESC, n_id ASC) AS r_tr
      FROM pairs)
    SELECT q_id,
           CAST(COUNT(*) FILTER (WHERE r_full <= 10 AND r_tr <= 10) AS BIGINT)
             AS n_overlap_at_10,
           ROUND(CAST(COUNT(*) FILTER (WHERE r_full <= 10 AND r_tr <= 10)
                      AS DOUBLE) / 10, 6) AS overlap_frac
    FROM rk GROUP BY q_id
    """


@query("matryoshka_truncation_eval", oracle=_mrl_oracle())
def matryoshka_truncation_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style truncation eval: how much of each query's exact
    cosine top-10 survives when embeddings are truncated to the first
    {_MRL_DIM} of {EMB_DIM} dims — the cost/quality readout behind
    MRL-truncated vector serving (store/search the prefix, rerank with
    the full vector), measured as top-10 overlap per query.

    Both rankings come from bit-stable cosines (same left-assoc fold both
    engines, vec_id tiebreak); the overlap count is exact.

    Scale: the 10-query set broadcasts; ONE corpus linear scan computes
    both similarity columns; two windows over the per-query candidate
    rows.  The production path truncates at WRITE time, halving scan
    bytes — this query quantifies what that costs in recall.
    """
    e = load_table(spark, sf_dir, "embeddings")
    trunc = F.slice(F.col("embedding"), 1, _MRL_DIM)
    q = e.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"),
        F.col("embedding").alias("q_emb"),
        vec.norm(F.col("embedding")).alias("_nq"),
        trunc.alias("q_tr"),
        vec.norm(trunc).alias("_nq_tr"),
    )
    n = e.select(
        F.col("vec_id").alias("n_id"),
        F.col("embedding").alias("n_emb"),
        vec.norm(F.col("embedding")).alias("_nn"),
        trunc.alias("n_tr"),
        vec.norm(trunc).alias("_nn_tr"),
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
            ).alias("cos_full"),
            F.try_divide(
                vec.dot(F.col("q_tr"), F.col("n_tr")),
                F.col("_nq_tr") * F.col("_nn_tr"),
            ).alias("cos_tr"),
        )
    )
    wf = Window.partitionBy("q_id").orderBy(
        F.col("cos_full").desc(), F.col("n_id").asc()
    )
    wt = Window.partitionBy("q_id").orderBy(
        F.col("cos_tr").desc(), F.col("n_id").asc()
    )
    rk = pairs.select(
        "q_id",
        F.row_number().over(wf).alias("r_full"),
        F.row_number().over(wt).alias("r_tr"),
    )
    both = (F.col("r_full") <= 10) & (F.col("r_tr") <= 10)
    return rk.groupBy("q_id").agg(
        F.sum(F.when(both, 1).otherwise(0)).cast("bigint").alias("n_overlap_at_10"),
        F.round(
            F.sum(F.when(both, 1).otherwise(0)).cast("double") / 10, 6
        ).alias("overlap_frac"),
    )

# --------------------------------------------------------------------------
# Shingle containment pairs (asymmetric near-dup: subset detection)
# --------------------------------------------------------------------------

_CONT_ID_CAP = 400
_CONT_THRESHOLD = 0.5


@query(
    "ngram_containment_pairs",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), x -> x != '')
               AS toks
      FROM documents WHERE doc_id < {_CONT_ID_CAP}),
    sh AS (
      SELECT doc_id,
             UNNEST(LIST_DISTINCT(LIST_TRANSFORM(
               RANGE(1, GREATEST(LEN(toks) - 1, 1)),
               i -> ARRAY_TO_STRING(LIST_SLICE(toks, i, i + 2), ' '))))
               AS s
      FROM t),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS n_inter
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2)
    SELECT i.id_a, i.id_b,
           CAST(i.n_inter AS BIGINT) AS n_shared,
           ROUND(GREATEST(CAST(i.n_inter AS DOUBLE) / sa.n,
                          CAST(i.n_inter AS DOUBLE) / sb.n), 6)
             AS max_containment
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.id_a
    JOIN sz sb ON sb.doc_id = i.id_b
    WHERE GREATEST(CAST(i.n_inter AS DOUBLE) / sa.n,
                   CAST(i.n_inter AS DOUBLE) / sb.n) >= {_CONT_THRESHOLD}
    """,
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT (|A∩B| / min-side size as the max of
    the two directions) over word-3-gram sets — the subset-duplicate
    detector symmetric Jaccard is blind to: a document quoted whole inside
    a longer page has low Jaccard but containment ≈ 1.  This is the
    signal behind quote/boilerplate-wrap dedup in crawl pipelines
    (complements ``ngram_jaccard_pairs`` / ``dup_ngram_spans``).

    Intersections come from the inverted shingle equi-join on a bounded
    id slice (the calibration-anchor discipline of
    ``embedding_pairwise_stats``); set sizes join back by doc.  Counts
    exact; one rounded ratio.

    Scale: the production path prunes candidates with the PPJoin prefix
    or LSH first (both implemented) — containment is then scored on
    candidate pairs only; the shingle join here shuffles on the shingle
    key, never docs².
    """
    from lms_etl_pipeline_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _CONT_ID_CAP
    )
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(tx.shingles(tx.tokens("text"), n=3))).alias(
            "s"
        ),
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("id_a"), "s")
    b = sh.select(F.col("doc_id").alias("id_b"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_inter"))
    )
    sa = sz.select(F.col("doc_id").alias("id_a"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("id_b"), F.col("n").alias("nb"))
    cont = F.greatest(
        F.col("n_inter").cast("double") / F.col("na"),
        F.col("n_inter").cast("double") / F.col("nb"),
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .filter(cont >= _CONT_THRESHOLD)
        .select(
            "id_a",
            "id_b",
            F.col("n_inter").cast("bigint").alias("n_shared"),
            F.round(cont, 6).alias("max_containment"),
        )
    )

# --------------------------------------------------------------------------
# B-cubed blocking-quality evaluation
# --------------------------------------------------------------------------


@query(
    "b3_blocking_eval",
    oracle=r"""
    WITH lab AS (
      SELECT doc_id,
             SUBSTRING(text, 1, 64) AS pred,
             MD5(COALESCE(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), t -> t != ''))),
               ' '), '')) AS gold
      FROM documents),
    np AS (SELECT pred, COUNT(*) AS n_p FROM lab GROUP BY 1),
    ng AS (SELECT gold, COUNT(*) AS n_g FROM lab GROUP BY 1),
    npg AS (SELECT pred, gold, COUNT(*) AS n_pg FROM lab GROUP BY 1, 2),
    per_doc AS (
      SELECT l.doc_id,
             (CAST(c.n_pg AS HUGEINT) * 1000000) // p.n_p AS p_micro,
             (CAST(c.n_pg AS HUGEINT) * 1000000) // g.n_g AS r_micro
      FROM lab l
      JOIN np p ON p.pred = l.pred
      JOIN ng g ON g.gold = l.gold
      JOIN npg c ON c.pred = l.pred AND c.gold = l.gold),
    sums AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(p_micro) // COUNT(*) AS BIGINT) AS pm,
             CAST(SUM(r_micro) // COUNT(*) AS BIGINT) AS rm
      FROM per_doc)
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(pm AS DOUBLE) / 1000000.0 AS b3_precision,
           CAST(rm AS DOUBLE) / 1000000.0 AS b3_recall,
           2.0 * (CAST(pm AS DOUBLE) / 1000000.0)
               * (CAST(rm AS DOUBLE) / 1000000.0)
             / (CAST(pm AS DOUBLE) / 1000000.0
                + CAST(rm AS DOUBLE) / 1000000.0) AS b3_f1
    FROM sums
    """,
)
def b3_blocking_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """B-cubed precision/recall/F1 (Bagga & Baldwin 1998) of a cheap
    blocking scheme — 64-char-prefix groups — against the gold exact-dup
    clustering (sorted-token-set fingerprint): per doc, precision is the
    fraction of its PREDICTED cluster that shares its GOLD cluster,
    recall the converse, averaged over docs.  This is THE standard
    entity-resolution / dedup-clustering quality readout (B³ punishes
    both over-merging and over-splitting, unlike pairwise F1 which
    over-weights big clusters) — it closes the loop on the blocking
    stages (`prefix_dup_candidates`) by SCORING them.

    Numerics: all cluster sizes and intersections are exact integers;
    per-doc ratios are floored integer divisions to micro precision, the
    averages floored again — NO round call anywhere, so no .5-repr
    divergence can exist; F1 is one pure double expression of identical
    integers.

    Scale: three hash aggregates (pred, gold, pred x gold) + equi-joins
    back on the labels — never doc x doc; the label tables are
    cluster-count-sized.
    """
    from lms_etl_pipeline_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    lab = d.select(
        "doc_id",
        F.substring("text", 1, 64).alias("pred"),
        F.md5(
            F.concat_ws(
                " ", F.array_sort(F.array_distinct(tx.tokens("text")))
            )
        ).alias("gold"),
    )
    np_ = lab.groupBy("pred").agg(F.count("*").alias("n_p"))
    ng = lab.groupBy("gold").agg(F.count("*").alias("n_g"))
    npg = lab.groupBy("pred", "gold").agg(F.count("*").alias("n_pg"))
    per_doc = (
        lab.join(np_, "pred")
        .join(ng, "gold")
        .join(npg, ["pred", "gold"])
        .select(
            F.expr(
                "CAST((CAST(n_pg AS DECIMAL(38,0)) * 1000000) div n_p AS BIGINT)"
            ).alias("p_micro"),
            F.expr(
                "CAST((CAST(n_pg AS DECIMAL(38,0)) * 1000000) div n_g AS BIGINT)"
            ).alias("r_micro"),
        )
    )
    sums = per_doc.agg(
        F.count("*").alias("n"),
        F.sum("p_micro").alias("sp"),
        F.sum("r_micro").alias("sr"),
    ).select(
        "n",
        F.expr("CAST(sp div n AS BIGINT)").alias("pm"),
        F.expr("CAST(sr div n AS BIGINT)").alias("rm"),
    )
    p = F.col("pm").cast("double") / 1_000_000.0
    r = F.col("rm").cast("double") / 1_000_000.0
    return sums.select(
        F.col("n").cast("bigint").alias("n_docs"),
        p.alias("b3_precision"),
        r.alias("b3_recall"),
        (F.lit(2.0) * p * r / (p + r)).alias("b3_f1"),
    )

# --------------------------------------------------------------------------
# Embedding centroid drift
# --------------------------------------------------------------------------


def _centroid_sql(pred: str, alias: str) -> str:
    """Per-dimension tie-free centroid of a filtered embedding set:
    FLOOR(val*1e9) quantization (identical IEEE multiply + floor in both
    engines — no rounding tie, unlike a decimal cast) then exact integer
    sum."""
    return f"""
    {alias} AS (
      SELECT dim,
             CAST(SUM(CAST(FLOOR(CAST(val AS DOUBLE) * 1000000000) AS BIGINT))
                  AS DOUBLE) / 1000000000.0 / COUNT(*) AS c
      FROM (SELECT UNNEST(embedding) AS val,
                   GENERATE_SUBSCRIPTS(embedding, 1) AS dim
            FROM embeddings WHERE {pred})
      GROUP BY dim)"""


@query(
    "embedding_centroid_drift",
    oracle=f"""
    WITH {_centroid_sql("vec_id % 10 <> 7", "ci")},
    {_centroid_sql("vec_id % 10 = 7", "cd")}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
           ROUND(SQRT(SUM(CAST(ROUND((ci.c - cd.c) * (ci.c - cd.c), 12)
                               AS DECIMAL(28,12)))), 8) AS l2_drift,
           ROUND(SUM(CAST(ROUND(ci.c * cd.c, 12) AS DECIMAL(28,12)))
                 / (SQRT(SUM(CAST(ROUND(ci.c * ci.c, 12) AS DECIMAL(28,12))))
                    * SQRT(SUM(CAST(ROUND(cd.c * cd.c, 12) AS DECIMAL(28,12))))),
                 8) AS centroid_cosine
    FROM ci JOIN cd ON cd.dim = ci.dim
    """,
)
def embedding_centroid_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift between the delta batch and the index corpus
    (the scalar-drift split of ``psi_drift_report``/``ks_test_drift``
    applied to VECTORS): per-dimension exact-decimal centroids for each
    split, then the L2 distance and cosine between the two centroid
    vectors — the embedding-distribution monitor vector platforms run to
    catch encoder regressions and upstream-content shifts that no scalar
    column would show.

    Numerics: centroids follow the ``embedding_centroids`` idiom —
    FLOOR(val*1e9) integer quantization (tie-free in both engines) and
    exact integer sums closed by double division; the cross-dimension
    L2/cosine reductions round each product term at 1e-12 then
    DECIMAL-sum (order-independent), with one final rounding per output.

    Scale: ONE corpus scan explodes to (dim, val) pairs aggregated
    map-side per dimension — state is 2×{EMB_DIM} cells regardless of
    corpus size; mergeable across any partitioning, streamable as an
    incremental aggregate.
    """
    e = load_table(spark, sf_dir, "embeddings")
    pairs = e.select(
        (F.col("vec_id") % 10 == 7).alias("in_delta"),
        F.posexplode("embedding").alias("dim0", "val"),
    ).select("in_delta", (F.col("dim0") + 1).alias("dim"), "val")
    # the embedding_centroids idiom: FLOOR(val*1e9) integer quantization
    # (identical IEEE multiply + floor in both engines — a decimal cast
    # has rounding TIES on odd multiples of 2^-10, found live at sf0.1),
    # exact integer sum, then double division — no decimal-division path
    # (whose scale handling differs between engines) ever runs
    val_u = F.floor(F.col("val").cast("double") * 1_000_000_000).cast("bigint")
    cent = pairs.groupBy("dim").agg(
        (
            F.sum(F.when(~F.col("in_delta"), val_u)).cast("double")
            / 1_000_000_000.0
            / F.sum(F.when(~F.col("in_delta"), 1).otherwise(0))
        ).alias("ci"),
        (
            F.sum(F.when(F.col("in_delta"), val_u)).cast("double")
            / 1_000_000_000.0
            / F.sum(F.when(F.col("in_delta"), 1).otherwise(0))
        ).alias("cd"),
    )
    d12 = lambda c: F.round(c, 12).cast("decimal(28,12)")  # noqa: E731
    diff2 = d12((F.col("ci") - F.col("cd")) * (F.col("ci") - F.col("cd")))
    # drop dims missing from either split: when a split is EMPTY (no delta
    # batch yet) the oracle's inner join emits zero dims — drift over
    # nothing is n_dims=0 + NULL metrics, not a 64-dim NULL comparison
    # (n=1 fixture sweep)
    cent = cent.filter(F.col("ci").isNotNull() & F.col("cd").isNotNull())
    return cent.agg(
        F.count("*").cast("bigint").alias("n_dims"),
        F.round(F.sqrt(F.sum(diff2)), 8).alias("l2_drift"),
        F.round(
            F.sum(d12(F.col("ci") * F.col("cd")))
            / (
                F.sqrt(F.sum(d12(F.col("ci") * F.col("ci"))))
                * F.sqrt(F.sum(d12(F.col("cd") * F.col("cd"))))
            ),
            8,
        ).alias("centroid_cosine"),
    )

# --------------------------------------------------------------------------
# LSH s-curve calibration (empirical vs theoretical candidate rate)
# --------------------------------------------------------------------------

_SC_ID_CAP = 400
#: theoretical banded-MinHash candidate probability 1-(1-s^r)^b at each
#: jaccard-decile midpoint, for r=2 rows x b=4 bands — injected as the
#: SAME Python double literals into both engines.
_SC_THEORY = tuple(
    1.0 - (1.0 - ((b + 0.5) / 10.0) ** 2) ** 4 for b in range(10)
)


def _sc_oracle() -> str:
    from lms_etl_pipeline_spark.plans.llm import (
        _BASE_HASHES,
        _SHINGLES,
        _minhash_slots_sql,
    )

    # CAST('<repr>' AS DOUBLE): a bare float literal parses via DECIMAL in
    # DuckDB and double-rounds one ulp off the double Spark injects (the
    # wilson hazard class; fuzz seed 2 hit it on theory bucket values)
    theory_case = " ".join(
        f"WHEN {b} THEN CAST('{_SC_THEORY[b]!r}' AS DOUBLE)" for b in range(10)
    )
    return f"""
    WITH sh_t AS (
      SELECT doc_id, {_SHINGLES} AS sh FROM documents
      WHERE doc_id < {_SC_ID_CAP}),
    hs_t AS (SELECT doc_id, sh, {_BASE_HASHES} AS hs FROM sh_t WHERE LEN(sh) >= 1),
    sigs AS (
      SELECT doc_id,
             {_minhash_slots_sql(8)}
      FROM hs_t),
    ex AS (SELECT doc_id, UNNEST(sh) AS s FROM sh_t),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS ni
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    scored AS (
      SELECT i.ia, i.ib,
             CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS j,
             ((x.h0 = y.h0 AND x.h1 = y.h1) OR (x.h2 = y.h2 AND x.h3 = y.h3)
              OR (x.h4 = y.h4 AND x.h5 = y.h5)
              OR (x.h6 = y.h6 AND x.h7 = y.h7)) AS cand
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.ia
      JOIN sz sb ON sb.doc_id = i.ib
      JOIN sigs x ON x.doc_id = i.ia
      JOIN sigs y ON y.doc_id = i.ib),
    bucketed AS (
      SELECT LEAST(CAST(FLOOR(j * 10) AS INTEGER), 9) AS bucket, cand
      FROM scored)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(*) FILTER (WHERE cand) AS BIGINT) AS n_candidates,
           CAST((COUNT(*) FILTER (WHERE cand)) * 1000000 // COUNT(*)
                AS DOUBLE) / 1000000.0 AS empirical_rate,
           CAST(CASE bucket {theory_case} END AS DOUBLE)
             AS theoretical_rate
    FROM bucketed GROUP BY bucket
    """


@query("lsh_s_curve_calibration", oracle=_sc_oracle())
def lsh_s_curve_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH parameter calibration: for a bounded anchor slice, the
    EMPIRICAL candidate rate of the production 4-band x 2-row MinHash
    banding per exact-Jaccard decile, next to the THEORETICAL s-curve
    1-(1-s²)⁴ at each decile midpoint — the read that tells you whether
    the deployed (b, r) matches the dedup threshold before a corpus-wide
    run (pairs with ``lsh_recall_eval``'s single-threshold recall and
    ``semdedup_threshold_sweep``'s cosine analogue).

    Determinism: exact integer shingle intersections; jaccard is one
    double division (identical bits); bucketing floors that double the
    same way in both engines; the empirical rate is a floored fixed-point
    division; theory values are injected literals.

    Scale: the anchor's inverted-shingle equi-join bounds candidate
    generation (never docs²); signatures come from the verified
    `with_minhash` path.  In production the curve is computed on a
    sampled slice exactly like this one.
    """
    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _SC_ID_CAP
    )
    from lms_etl_pipeline_spark.operators import text as tx

    sigs = dd.with_minhash(d, "doc_id", "text", k=8)
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(tx.shingles(tx.tokens("text"), n=3))).alias("s"),
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("ia"), "s")
    b = sh.select(F.col("doc_id").alias("ib"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("ni"))
    )
    sa = sz.select(F.col("doc_id").alias("ia"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("ib"), F.col("n").alias("nb"))
    x = sigs.select(
        F.col("doc_id").alias("ia"), *[F.col(f"h{i}").alias(f"xa{i}") for i in range(8)]
    )
    y = sigs.select(
        F.col("doc_id").alias("ib"), *[F.col(f"h{i}").alias(f"yb{i}") for i in range(8)]
    )
    cand = (
        ((F.col("xa0") == F.col("yb0")) & (F.col("xa1") == F.col("yb1")))
        | ((F.col("xa2") == F.col("yb2")) & (F.col("xa3") == F.col("yb3")))
        | ((F.col("xa4") == F.col("yb4")) & (F.col("xa5") == F.col("yb5")))
        | ((F.col("xa6") == F.col("yb6")) & (F.col("xa7") == F.col("yb7")))
    )
    j = F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))
    scored = (
        inter.join(sa, "ia")
        .join(sb, "ib")
        .join(x, "ia")
        .join(y, "ib")
        .select(
            F.least(F.floor(j * 10).cast("int"), F.lit(9)).alias("bucket"),
            cand.alias("cand"),
        )
    )
    theory = F.element_at(
        F.array(*[F.lit(v) for v in _SC_THEORY]), F.col("bucket") + 1
    )
    return (
        scored.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum(F.when(F.col("cand"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_candidates"),
        )
        .select(
            "bucket",
            "n_pairs",
            "n_candidates",
            (
                F.expr(
                    "CAST((n_candidates * 1000000) div n_pairs AS BIGINT)"
                ).cast("double")
                / 1_000_000.0
            ).alias("empirical_rate"),
            theory.alias("theoretical_rate"),
        )
    )

# --------------------------------------------------------------------------
# MinHash Jaccard-estimator error profile
# --------------------------------------------------------------------------


def _mh_err_oracle() -> str:
    from lms_etl_pipeline_spark.plans.llm import (
        _BASE_HASHES,
        _SHINGLES,
        _minhash_slots_sql,
    )

    match_sum = " + ".join(
        f"CASE WHEN x.h{i} = y.h{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    return f"""
    WITH sh_t AS (
      SELECT doc_id, {_SHINGLES} AS sh FROM documents
      WHERE doc_id < {_SC_ID_CAP}),
    hs_t AS (SELECT doc_id, sh, {_BASE_HASHES} AS hs FROM sh_t WHERE LEN(sh) >= 1),
    sigs AS (
      SELECT doc_id,
             {_minhash_slots_sql(8)}
      FROM hs_t),
    ex AS (SELECT doc_id, UNNEST(sh) AS s FROM sh_t),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS ia, b.doc_id AS ib, COUNT(*) AS ni
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2),
    scored AS (
      SELECT CAST(i.ni AS DOUBLE) / (sa.n + sb.n - i.ni) AS j,
             ({match_sum}) AS n_match
      FROM inter i
      JOIN sz sa ON sa.doc_id = i.ia
      JOIN sz sb ON sb.doc_id = i.ib
      JOIN sigs x ON x.doc_id = i.ia
      JOIN sigs y ON y.doc_id = i.ib),
    err AS (
      SELECT LEAST(CAST(FLOOR(j * 10) AS INTEGER), 9) AS bucket,
             CAST(ROUND(ABS(CAST(n_match AS DOUBLE) / 8 - j), 9)
                  AS DECIMAL(18,9)) AS abs_err
      FROM scored)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(CAST(SUM(abs_err) * 1000000000 AS HUGEINT) // COUNT(*)
                AS DOUBLE) / 1000000000.0 AS mean_abs_err_floor9
    FROM err GROUP BY bucket
    """


@query("minhash_estimator_error", oracle=_mh_err_oracle())
def minhash_estimator_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash Jaccard-ESTIMATOR quality on the bounded anchor slice: per
    exact-Jaccard decile, the mean |matching-slots/8 − exact J| — the
    estimator-variance read (expected ≈ √(J(1−J)/8)) that tells you
    whether 8 slots is enough BEFORE trusting signature-level dedup
    decisions; the estimator-side complement of
    ``lsh_s_curve_calibration``'s banding-side read.

    Determinism: slot matches and intersections are exact integers; the
    per-pair error is one double expression rounded at 1e-9 then
    DECIMAL-summed; the bucket mean uses floored integer division of the
    exact decimal sum (scale-9 fixed point — no ROUND at a boundary).

    Scale: same anchor layout as the s-curve — inverted-shingle
    equi-join, signatures from the verified `with_minhash` path.
    """
    from lms_etl_pipeline_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents").filter(
        F.col("doc_id") < _SC_ID_CAP
    )
    sigs = dd.with_minhash(d, "doc_id", "text", k=8)
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(tx.shingles(tx.tokens("text"), n=3))).alias("s"),
    )
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("ia"), "s")
    b = sh.select(F.col("doc_id").alias("ib"), "s")
    inter = (
        a.join(b, "s")
        .filter(F.col("ia") < F.col("ib"))
        .groupBy("ia", "ib")
        .agg(F.count("*").alias("ni"))
    )
    sa = sz.select(F.col("doc_id").alias("ia"), F.col("n").alias("na"))
    sb = sz.select(F.col("doc_id").alias("ib"), F.col("n").alias("nb"))
    x = sigs.select(
        F.col("doc_id").alias("ia"), *[F.col(f"h{i}").alias(f"xa{i}") for i in range(8)]
    )
    y = sigs.select(
        F.col("doc_id").alias("ib"), *[F.col(f"h{i}").alias(f"yb{i}") for i in range(8)]
    )
    n_match = None
    for i in range(8):
        t = F.when(F.col(f"xa{i}") == F.col(f"yb{i}"), 1).otherwise(0)
        n_match = t if n_match is None else n_match + t
    j = F.col("ni").cast("double") / (F.col("na") + F.col("nb") - F.col("ni"))
    scored = (
        inter.join(sa, "ia")
        .join(sb, "ib")
        .join(x, "ia")
        .join(y, "ib")
        .select(
            F.least(F.floor(j * 10).cast("int"), F.lit(9)).alias("bucket"),
            F.round(F.abs(n_match.cast("double") / 8 - j), 9)
            .cast("decimal(18,9)")
            .alias("abs_err"),
        )
    )
    return (
        scored.groupBy("bucket")
        .agg(
            F.count("*").cast("bigint").alias("n_pairs"),
            F.sum("abs_err").alias("_s"),
        )
        .select(
            "bucket",
            "n_pairs",
            # exact-nano fixed point: scale the decimal sum to integers,
            # floor-divide, then one power-of-ten double division
            (
                F.expr(
                    "CAST(CAST(_s * 1000000000 AS DECIMAL(38,0)) div n_pairs"
                    " AS BIGINT)"
                ).cast("double")
                / 1_000_000_000.0
            ).alias("mean_abs_err_floor9"),
        )
    )
