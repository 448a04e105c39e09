"""Sequence, time-series-model, graph-traversal, and retrieval-eval plans
(round 5c widening).

Operators a production analytics platform runs over ordered event/metric
series and derived graphs that were not yet first-class in the catalog:

- **EWMA smoothing** (``ewma_smoothing``) — exponentially-weighted moving
  average of the daily metric series, the standard dashboard smoother and
  the state update inside every EWMA-based alerting rule;
- **autocorrelation** (``acf_lags``) — ACF of the daily event-count series
  at lags 1 and 7, the seasonality detector (daily/weekly rhythm) every
  forecasting pipeline checks before picking a model;
- **activity streaks** (``activity_streaks``) — gaps-and-islands over each
  user's active days: longest consecutive-day run, island count — the
  canonical retention/engagement cut (and the classic SQL interview shape,
  done as one window pass);
- **k-hop reachability** (``khop_reachability``) — bounded breadth
  expansion over the customer→supplier order graph: direct suppliers,
  2-hop co-customers, 3-hop supplier closure per source node;
- **retrieval MRR / NDCG** (``retrieval_mrr_ndcg``) — the two ranking
  metrics every embedding-retrieval stack reports, computed over exact
  cosine top-10 lists with label-match relevance;
- **SCD2 point-in-time snapshot** (``scd2_snapshot_asof``) — "the table as
  it was at time T": reconstructs the as-of state from SCD-type-2 validity
  windows, the time-travel read every warehouse dimension serves.

Later waves in this module: FIFO returns allocation, Dunning-LLR
collocations, systematic stratified sampling, common-neighbor node
similarity, surrogate-key audit, weekly churn, order-to-ship latency,
cumulative unique users, PAA/SAX symbolization, first-in-window dedup,
pinball-loss eval, Matryoshka truncation eval, shingle containment,
fixed-point price-volume-mix bridge, A/B sample-size planning, 1-D
Wasserstein drift, weekly multiplicative seasonal index, B-cubed blocking
eval, repeat-purchase cycle, peer-vs-median benchmarking, A/B quantile
treatment effects, embedding centroid drift, top-N+other rollup,
state-machine compliance audit, business-days SLA latency, XOR-integrity
export manifests, and LSH s-curve calibration — each with its own scale
note and DuckDB oracle.  A recurring numeric discipline here: wherever a
ROUND of a derived double could land on an exact .5 boundary (where Spark
rounds the shortest decimal repr and DuckDB the binary value), the
computation moves to exact integer fixed point with truncated ``div``
(Spark ``div`` ≡ DuckDB integer ``//``, both toward zero — empirically
pinned by tests/test_numeric_conventions.py) — no round call, no
boundary, sign-safe.

Reference parity note: the reference (`/root/reference/src/lms_to_s3_lambda.py`,
`src/s3_to_rds_lambda.py` — a 2-file pandas ETL) has no analytics layer;
these extend the engine along the driver-mandated SURVEY.md §2.12 + LLM
training-data axis like the earlier round-5 waves.

Determinism / oracle strategy (repo convention, ``functions/numeric.py``):
cross-row double sums go through fixed-scale DECIMAL casts (exact,
order-independent); EWMA weights are powers of 1/2 (exact binary scaling,
bit-stable products); ACF moments are exact DECIMAL sums of integers with
one final double expression; NDCG discount weights are injected as
identical Python double literals into BOTH engines and per-term rounded
before the order-independent DECIMAL sum; every emitted float is ROUNDed
at a fixed scale.
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
# EWMA smoothing
# --------------------------------------------------------------------------

#: EWMA truncation depth: alpha = 1/2, truncated at 8 lags.  The 2^-k
#: weights are carried as the exact INTEGERS 2^(LAGS-k) over a common
#: 2^LAGS denominator, so the whole weighted sum is integer arithmetic.
_EWMA_LAGS = 8


def _ewma_oracle() -> str:
    # Integer fixed point: weight 2^-k scaled by 2^LAGS becomes the exact
    # integer 2^(LAGS-k); the whole weighted sum stays in integer micro
    # units and ONE truncated integer division emits the smoothed value
    # (Spark `div` and DuckDB `//` both truncate toward zero — pinned by
    # tests/test_numeric_conventions.py — so no rounding boundary exists).
    num = f"x_u * {2 ** _EWMA_LAGS} + " + " + ".join(
        f"COALESCE(LAG(x_u, {k}) OVER w, 0) * {2 ** (_EWMA_LAGS - k)}"
        for k in range(1, _EWMA_LAGS + 1)
    )
    den = f"{2 ** _EWMA_LAGS} + " + " + ".join(
        f"CASE WHEN LAG(x_u, {k}) OVER w IS NOT NULL"
        f" THEN {2 ** (_EWMA_LAGS - k)} ELSE 0 END"
        for k in range(1, _EWMA_LAGS + 1)
    )
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) * 1000000
                  AS HUGEINT) AS x_u
      FROM events GROUP BY 1, 2)
    SELECT event_type, day,
           CAST(x_u AS DOUBLE) / 1000000.0 AS x,
           CAST(CAST(({num}) // ({den}) AS BIGINT) AS DOUBLE) / 1000000.0
             AS ewma
    FROM daily
    WINDOW w AS (PARTITION BY event_type ORDER BY day ASC)
    """


@query("ewma_smoothing", oracle=_ewma_oracle())
def ewma_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average (alpha = 1/2, truncated at 8
    lags, adjusted weights) of each event type's daily value total — the
    smoother behind "smoothed DAU" dashboard lines and EWMA alert rules.

    The recursive definition is unrolled into 9 explicit LAG terms, which
    keeps the whole thing ONE window pass (no recursion, no UDF).  With
    alpha = 1/2 the truncation error is bounded by 2^-9 of the oldest
    mass.  Numerics: the daily series moves to exact integer micro-units;
    scaling each 2^-k weight by 2^8 makes every weighted term an exact
    integer product, and the single closing truncated integer division
    (Spark ``div`` ≡ DuckDB ``//``, both toward zero — pinned by
    tests/test_numeric_conventions.py) emits micro-precision — no double
    ratio is ever ROUNDed, so no .5 boundary can split the engines.

    Scale: events collapse to the (type x day) aggregate first (map-side
    combine); the window runs over that calendar-sized summary.  Nine lags
    per row is O(1) state per partition — at any fleet size the window
    input is |types| x |days|, never the raw event count.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        (F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("x_u")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    num = F.col("x_u") * F.lit(2**_EWMA_LAGS)
    den = F.lit(2**_EWMA_LAGS)
    for k in range(1, _EWMA_LAGS + 1):
        xk = F.lag("x_u", k).over(w)
        num = num + F.coalesce(xk, F.lit(0)) * F.lit(2 ** (_EWMA_LAGS - k))
        den = den + F.when(
            xk.isNotNull(), F.lit(2 ** (_EWMA_LAGS - k))
        ).otherwise(F.lit(0))
    return daily.select(
        "event_type",
        "day",
        (F.col("x_u").cast("double") / 1_000_000.0).alias("x"),
        num.alias("_num"),
        den.alias("_den"),
    ).select(
        "event_type",
        "day",
        "x",
        (F.expr("CAST(_num div _den AS BIGINT)").cast("double") / 1_000_000.0)
        .alias("ewma"),
    )


# --------------------------------------------------------------------------
# Autocorrelation (ACF) of the daily count series
# --------------------------------------------------------------------------

_ACF_LAGS = (1, 7)


def _acf_oracle() -> str:
    arms = []
    for lag in _ACF_LAGS:
        arms.append(f"""
    SELECT event_type, CAST({lag} AS INTEGER) AS lag,
           CAST(nn AS BIGINT) AS n_pairs,
           ROUND(
             (CAST(nn AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / SQRT(
                 (CAST(nn AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * (CAST(nn AS DOUBLE) * CAST(syy AS DOUBLE)
                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))),
             6) AS acf
    FROM (
      SELECT event_type,
             COUNT(*) AS nn,
             SUM(x) AS sx,
             SUM(y) AS sy,
             SUM(x * y) AS sxy,
             SUM(x * x) AS sxx,
             SUM(y * y) AS syy
      FROM (
        SELECT event_type, x,
               LAG(x, {lag}) OVER (PARTITION BY event_type ORDER BY day ASC) AS y
        FROM (SELECT event_type, CAST(ts AS DATE) AS day,
                     CAST(COUNT(*) AS DECIMAL(18,0)) AS x
              FROM events GROUP BY 1, 2))
      WHERE y IS NOT NULL
      GROUP BY event_type)""")
    return " UNION ALL ".join(arms)


@query("acf_lags", oracle=_acf_oracle())
def acf_lags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Autocorrelation of each event type's daily-count series at lags 1
    and 7 — the seasonality probe (strong lag-7 ACF = weekly rhythm) run
    before every forecasting-model choice, and the statistical twin of
    ``timeseries_seasonal_profile``'s calendar cut.

    Determinism: the series is integer daily counts; all five moments
    (sums, squares, cross products) are exact DECIMAL(38,0) integer sums,
    so the single closing double expression — Pearson r of (x_t, x_{t-k})
    — sees identical inputs on both engines and is rounded once.

    Scale: raw events collapse to the (type x day) count first; the lag
    window and moment aggregation run over that calendar-sized series.
    The UNION over lags re-reads only the aggregate, and each arm is one
    window pass + one hash aggregate keyed by event_type.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").alias("x")
    )
    out = None
    for lag in _ACF_LAGS:
        w = Window.partitionBy("event_type").orderBy(F.col("day").asc())
        paired = daily.select(
            "event_type",
            F.col("x").cast("decimal(18,0)").alias("x"),
            F.lag("x", lag).over(w).cast("decimal(18,0)").alias("y"),
        ).filter(F.col("y").isNotNull())
        m = paired.groupBy("event_type").agg(
            F.count("*").alias("nn"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x") * F.col("y")).alias("sxy"),
            F.sum(F.col("x") * F.col("x")).alias("sxx"),
            F.sum(F.col("y") * F.col("y")).alias("syy"),
        )
        nn_d = F.col("nn").cast("double")
        sx_d = F.col("sx").cast("double")
        sy_d = F.col("sy").cast("double")
        r = (
            nn_d * F.col("sxy").cast("double") - sx_d * sy_d
        ) / F.sqrt(
            (nn_d * F.col("sxx").cast("double") - sx_d * sx_d)
            * (nn_d * F.col("syy").cast("double") - sy_d * sy_d)
        )
        arm = m.select(
            "event_type",
            F.lit(lag).cast("int").alias("lag"),
            F.col("nn").cast("bigint").alias("n_pairs"),
            F.round(r, 6).alias("acf"),
        )
        out = arm if out is None else out.unionByName(arm)
    return out


# --------------------------------------------------------------------------
# Activity streaks (gaps-and-islands)
# --------------------------------------------------------------------------


@query(
    "activity_streaks",
    oracle="""
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
    grp AS (
      SELECT user_id, day,
             day - CAST(ROW_NUMBER() OVER (PARTITION BY user_id
                                           ORDER BY day ASC) AS INTEGER) AS g
      FROM active),
    islands AS (
      SELECT user_id, g, CAST(COUNT(*) AS BIGINT) AS len
      FROM grp GROUP BY 1, 2)
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM islands GROUP BY user_id
    """,
)
def activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands over each user's active days: total active days,
    longest consecutive-day streak, and number of distinct streaks — the
    engagement cut behind "7-day streak" product mechanics and retention
    scoring.

    The island key is the classic constant-difference trick: day minus the
    per-user row number is constant exactly within a consecutive run, so
    ONE window pass + two hash aggregates replace any self-join or
    per-user iteration.  All outputs are exact integers.

    Scale: events first collapse to distinct (user, day) — bounded by
    users x calendar, far below raw event count; the window partitions by
    user_id (naturally high-cardinality, no skew hot key) and both
    aggregates are map-side combinable.
    """
    e = load_table(spark, sf_dir, "events")
    active = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("user_id").orderBy(F.col("day").asc())
    grp = active.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("g"),
    )
    islands = grp.groupBy("user_id", "g").agg(
        F.count("*").cast("bigint").alias("len")
    )
    return islands.groupBy("user_id").agg(
        F.sum("len").cast("bigint").alias("n_active_days"),
        F.max("len").cast("bigint").alias("longest_streak"),
        F.count("*").cast("bigint").alias("n_streaks"),
    )


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
            (
                vec.dot(F.col("q_emb"), F.col("n_emb"))
                / (F.col("_nq") * F.col("_nn"))
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
# SCD2 point-in-time snapshot ("time travel" read)
# --------------------------------------------------------------------------


@query(
    "scd2_snapshot_asof",
    oracle="""
    WITH h AS (
      SELECT o_custkey, o_orderstatus, o_totalprice,
             o_orderdate AS valid_from,
             LEAD(o_orderdate) OVER (PARTITION BY o_custkey
                                     ORDER BY o_orderdate ASC, o_orderkey ASC)
               AS valid_to
      FROM orders),
    t AS (SELECT MIN(o_orderdate) + INTERVAL 365 DAY AS asof FROM orders)
    SELECT h.o_custkey,
           h.o_orderstatus AS status_asof,
           CAST(ROUND(CAST(h.o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE)
             AS last_price_asof,
           CAST(h.valid_from AS DATE) AS since
    FROM h, t
    WHERE h.valid_from <= t.asof
      AND (h.valid_to IS NULL OR h.valid_to > t.asof)
      AND h.o_custkey < 200
    """,
)
def scd2_snapshot_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time reconstruction from SCD-type-2 validity windows: the
    per-customer order status AS OF one year into the dataset — the
    time-travel read (`FOR SYSTEM_TIME AS OF`) every warehouse dimension
    serves, built on the same one-window-pass history as
    ``scd2_order_status_history``.

    Exactly one row per customer key survives, because [valid_from,
    valid_to) windows partition each key's timeline — the filter IS the
    snapshot.  The as-of instant derives from the data (min order date +
    365d) as a 1-row broadcast, not a hardcoded constant.

    Scale: the history build is one window shuffle on the natural key; the
    snapshot filter is applied per row with a broadcast 1-row timestamp —
    no second shuffle.  A partitioned-store variant would prune history
    segments on valid_from before the scan.
    """
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    h = o.select(
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        F.col("o_orderdate").alias("valid_from"),
        F.lead("o_orderdate").over(w).alias("valid_to"),
    )
    t = o.agg(
        F.date_add(F.to_date(F.min("o_orderdate")), 365)
        .cast("timestamp")
        .alias("asof")
    )
    return (
        h.crossJoin(F.broadcast(t))
        .filter(
            (F.col("valid_from") <= F.col("asof"))
            & (F.col("valid_to").isNull() | (F.col("valid_to") > F.col("asof")))
            & (F.col("o_custkey") < 200)
        )
        .select(
            "o_custkey",
            F.col("o_orderstatus").alias("status_asof"),
            F.round(F.col("o_totalprice").cast("decimal(18,4)"), 2)
            .cast("double")
            .alias("last_price_asof"),
            F.col("valid_from").cast("date").alias("since"),
        )
    )


# --------------------------------------------------------------------------
# FIFO returns allocation
# --------------------------------------------------------------------------


@query(
    "fifo_returns_allocation",
    oracle="""
    WITH ret AS (
      SELECT l_partkey, SUM(CAST(l_quantity AS DECIMAL(18,2))) AS r_qty
      FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1),
    rec AS (
      SELECT l_partkey, l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(18,2)) AS qty,
             COALESCE(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
               PARTITION BY l_partkey
               ORDER BY l_shipdate ASC, l_orderkey ASC, l_linenumber ASC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
               CAST(0 AS DECIMAL(18,2))) AS cum_prev
      FROM lineitem WHERE l_returnflag <> 'R')
    SELECT rec.l_partkey, rec.l_orderkey, rec.l_linenumber,
           CAST(rec.qty AS DOUBLE) AS qty,
           CAST(LEAST(GREATEST(ret.r_qty - rec.cum_prev,
                               CAST(0 AS DECIMAL(18,2))), rec.qty) AS DOUBLE)
             AS consumed_qty
    FROM rec JOIN ret ON ret.l_partkey = rec.l_partkey
    WHERE ret.r_qty - rec.cum_prev > 0
    """,
)
def fifo_returns_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIFO allocation: per part, returned quantity (flag 'R') is consumed
    against the non-returned shipments in ship-date order — the classic
    inventory/cost-layer matching (FIFO costing, lot depletion, refund
    netting) expressed WITHOUT iteration: each receipt's consumed share is
    `clamp(total_returns - cum_prev, 0, qty)`, one running-sum window plus
    one aggregate join instead of a row-by-row loop.

    Only rows that absorb any allocation survive (the depletion frontier).
    All quantities are exact DECIMAL(18,2); the clamp is decimal min/max —
    no float knife edges.

    Scale: one window shuffle on l_partkey (natural key, high cardinality)
    + a co-keyed aggregate join that AQE plans as broadcast when the
    per-part return table is small.  No self-join: the interval-overlap
    formulation is O(n) per part.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d2 = F.col("l_quantity").cast("decimal(18,2)")
    ret = li.filter(F.col("l_returnflag") == "R").groupBy("l_partkey").agg(
        F.sum(d2).alias("r_qty")
    )
    w = (
        Window.partitionBy("l_partkey")
        .orderBy(
            F.col("l_shipdate").asc(),
            F.col("l_orderkey").asc(),
            F.col("l_linenumber").asc(),
        )
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    rec = li.filter(F.col("l_returnflag") != "R").select(
        "l_partkey",
        "l_orderkey",
        "l_linenumber",
        d2.alias("qty"),
        F.coalesce(F.sum(d2).over(w), F.lit(0).cast("decimal(18,2)")).alias(
            "cum_prev"
        ),
    )
    consumed = F.least(
        F.greatest(F.col("r_qty") - F.col("cum_prev"), F.lit(0).cast("decimal(18,2)")),
        F.col("qty"),
    )
    return (
        rec.join(ret, "l_partkey")
        .filter(F.col("r_qty") - F.col("cum_prev") > 0)
        .select(
            "l_partkey",
            "l_orderkey",
            "l_linenumber",
            F.col("qty").cast("double").alias("qty"),
            consumed.cast("double").alias("consumed_qty"),
        )
    )


# --------------------------------------------------------------------------
# Dunning log-likelihood-ratio collocations
# --------------------------------------------------------------------------

_LLR_MIN_PAIR = 8


@query(
    "llr_collocations",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id,
             LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), t -> t != '')
               AS t
      FROM documents),
    bg AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(t), 1)),
                    i -> ARRAY_TO_STRING(LIST_SLICE(t, i, i + 1), ' ')))
               AS bigram
      FROM toks),
    pc AS (SELECT bigram, COUNT(*) AS k11 FROM bg GROUP BY 1),
    parts AS (
      SELECT bigram, k11,
             SPLIT_PART(bigram, ' ', 1) AS w1,
             SUBSTRING(bigram, LENGTH(SPLIT_PART(bigram, ' ', 1)) + 2) AS w2
      FROM pc),
    r AS (SELECT w1, SUM(k11) AS rsum FROM parts GROUP BY 1),
    c AS (SELECT w2, SUM(k11) AS csum FROM parts GROUP BY 1),
    n AS (SELECT SUM(k11) AS total FROM pc),
    cells AS (
      SELECT p.bigram, p.k11,
             CAST(p.k11 AS DOUBLE) AS o11,
             CAST(r.rsum - p.k11 AS DOUBLE) AS o12,
             CAST(c.csum - p.k11 AS DOUBLE) AS o21,
             CAST(n.total - r.rsum - c.csum + p.k11 AS DOUBLE) AS o22,
             CAST(r.rsum AS DOUBLE) AS rs,
             CAST(c.csum AS DOUBLE) AS cs,
             CAST(n.total AS DOUBLE) AS nt
      FROM parts p CROSS JOIN n JOIN r ON r.w1 = p.w1 JOIN c ON c.w2 = p.w2
      WHERE p.k11 >= {_LLR_MIN_PAIR})
    SELECT bigram, CAST(k11 AS BIGINT) AS k11,
           CAST(ROUND(2 * (
             CAST(CASE WHEN o11 > 0 THEN ROUND(o11 * LN(o11 * nt / (rs * cs)), 6) ELSE 0 END AS DECIMAL(18,6))
           + CAST(CASE WHEN o12 > 0 THEN ROUND(o12 * LN(o12 * nt / (rs * (nt - cs))), 6) ELSE 0 END AS DECIMAL(18,6))
           + CAST(CASE WHEN o21 > 0 THEN ROUND(o21 * LN(o21 * nt / ((nt - rs) * cs)), 6) ELSE 0 END AS DECIMAL(18,6))
           + CAST(CASE WHEN o22 > 0 THEN ROUND(o22 * LN(o22 * nt / ((nt - rs) * (nt - cs))), 6) ELSE 0 END AS DECIMAL(18,6))
             ), 4) AS DOUBLE) AS llr
    FROM cells
    """,
)
def llr_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dunning (1993) log-likelihood-ratio collocation mining over corpus
    bigrams — the statistically-sound replacement for raw PMI on sparse
    counts (``cooccurrence_pmi``'s known failure mode), used to harvest
    multi-word expressions for tokenizer vocab and quality lexicons.

    G2 = 2 * sum O_ij * ln(O_ij / E_ij) over the 2x2 (w1, w2) contingency
    table.  Bigrams come from a shuffle-free per-row array transform (no
    position self-join); marginals are two hash aggregates over the bigram
    counts, joined back by word.  Determinism: counts are exact ints, each
    of the four LN terms is rounded at 1e-6 then DECIMAL-summed
    (order-independent), one final rounded double.

    Scale: |bigram-vocab|-sized tables after the first aggregate; the
    corpus is scanned once.  The w1/w2 marginal joins are equi-joins on
    word — the same layout as the TF-IDF family.
    """
    from lms_etl_pipeline_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    toks = d.select(tx.tokens("text").alias("t"))
    bigrams = toks.select(
        F.explode(
            F.when(
                F.size("t") >= 2,
                F.expr(
                    "transform(sequence(1, size(t) - 1), "
                    "i -> concat(t[i-1], ' ', t[i]))"
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bigram")
    )
    pc = bigrams.groupBy("bigram").agg(F.count("*").alias("k11"))
    parts = pc.select(
        "bigram",
        "k11",
        F.substring_index("bigram", " ", 1).alias("w1"),
        F.expr(
            "substring(bigram, length(substring_index(bigram, ' ', 1)) + 2)"
        ).alias("w2"),
    )
    r = parts.groupBy("w1").agg(F.sum("k11").alias("rsum"))
    c = parts.groupBy("w2").agg(F.sum("k11").alias("csum"))
    n = pc.agg(F.sum("k11").alias("total"))
    cells = (
        parts.filter(F.col("k11") >= _LLR_MIN_PAIR)
        .join(r, "w1")
        .join(c, "w2")
        .crossJoin(F.broadcast(n))
        .select(
            "bigram",
            "k11",
            F.col("k11").cast("double").alias("o11"),
            (F.col("rsum") - F.col("k11")).cast("double").alias("o12"),
            (F.col("csum") - F.col("k11")).cast("double").alias("o21"),
            (F.col("total") - F.col("rsum") - F.col("csum") + F.col("k11"))
            .cast("double")
            .alias("o22"),
            F.col("rsum").cast("double").alias("rs"),
            F.col("csum").cast("double").alias("cs"),
            F.col("total").cast("double").alias("nt"),
        )
    )

    def term(o, e_num, e_den):
        return F.when(
            o > 0, F.round(o * F.log(o * F.col("nt") / (e_num * e_den)), 6)
        ).otherwise(F.lit(0.0)).cast("decimal(18,6)")

    rs, cs, nt = F.col("rs"), F.col("cs"), F.col("nt")
    g2 = (
        term(F.col("o11"), rs, cs)
        + term(F.col("o12"), rs, (nt - cs))
        + term(F.col("o21"), (nt - rs), cs)
        + term(F.col("o22"), (nt - rs), (nt - cs))
    )
    return cells.select(
        "bigram",
        F.col("k11").cast("bigint").alias("k11"),
        F.round(F.lit(2) * g2, 4).cast("double").alias("llr"),
    )


# --------------------------------------------------------------------------
# Systematic (every-k-th) stratified sampling
# --------------------------------------------------------------------------


@query(
    "systematic_sample_stratified",
    oracle="""
    WITH ordered AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY MD5(CAST(doc_id AS VARCHAR)) ASC,
                                         doc_id ASC) AS rn
      FROM documents)
    SELECT doc_id, source, CAST(rn AS BIGINT) AS rn
    FROM ordered WHERE rn % 10 = 1
    """,
)
def systematic_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Systematic 1-in-10 sampling per source stratum: order each stratum
    by a content-free stable hash (md5 of the key — a deterministic
    pseudo-random permutation, the repo's no-rand() discipline) and keep
    every 10th row — the evenly-spaced design survey methodology prefers
    over Bernoulli sampling for variance, made retry-safe and
    engine-portable.

    Scale: the window partitions by stratum; a skewed mega-stratum would
    serialize, so the documented scale path is the two-level variant
    (per-shard systematic pass, then thin) or hash-bucket approximation
    (``sample_fraction``).  Exact: rank arithmetic on a deterministic
    order; no floats at all.
    """
    d = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")).asc(), F.col("doc_id").asc()
    )
    return (
        d.select("doc_id", "source", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") % 10 == 1)
        .select("doc_id", "source", F.col("rn").cast("bigint").alias("rn"))
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
# Surrogate-key audit
# --------------------------------------------------------------------------


def _sk_arm(table: str, key: str) -> str:
    h = (
        f"TRY_CAST(CONCAT('0x', SUBSTRING(MD5(CAST({key} AS VARCHAR)), 1, 15))"
        " AS BIGINT)"
    )
    return f"""
    SELECT '{table}' AS table_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT {key}) AS BIGINT) AS n_keys,
           CAST(COUNT(DISTINCT {h}) AS BIGINT) AS n_surrogates,
           CAST(COUNT(DISTINCT {key}) - COUNT(DISTINCT {h}) AS BIGINT)
             AS n_collisions
    FROM {table}"""


@query(
    "surrogate_key_audit",
    oracle=" UNION ALL ".join(
        _sk_arm(t, k)
        for t, k in (
            ("orders", "o_orderkey"),
            ("customer", "c_custkey"),
            ("part", "p_partkey"),
        )
    ),
)
def surrogate_key_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic surrogate-key generation + collision audit: each
    natural key maps to a stable 60-bit md5-prefix surrogate (the data-
    vault / dimension-key idiom — content-derived, so retries and
    re-partitions can NEVER mint a different key, unlike
    monotonically_increasing_id), and the audit counts rows, distinct
    natural keys, distinct surrogates, and collisions per table.

    Scale: one scan + distinct-count aggregate per table; at 100 TB the
    exact COUNT(DISTINCT) swaps to HLL per the ``table_profile_orders``
    note while collision checking moves to a groupBy-surrogate HAVING>1
    probe.  60 bits ≈ no birthday collisions until ~2^30 keys; the audit
    is the evidence.
    """
    import functools

    arms = []
    for table, key in (
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("part", "p_partkey"),
    ):
        t = load_table(spark, sf_dir, table)
        h = F.conv(F.substring(F.md5(F.col(key).cast("string")), 1, 15), 16, 10).cast(
            "bigint"
        )
        arms.append(
            t.agg(
                F.count("*").cast("bigint").alias("n_rows"),
                F.countDistinct(F.col(key)).cast("bigint").alias("n_keys"),
                F.countDistinct(h).cast("bigint").alias("n_surrogates"),
                (F.countDistinct(F.col(key)) - F.countDistinct(h))
                .cast("bigint")
                .alias("n_collisions"),
            ).select(F.lit(table).alias("table_name"), "*")
        )
    return functools.reduce(lambda x, y: x.unionByName(y), arms)


# --------------------------------------------------------------------------
# Weekly churn (active last week, absent this week)
# --------------------------------------------------------------------------


@query(
    "churned_users_weekly",
    oracle="""
    WITH wk AS (
      SELECT DISTINCT user_id, DATE_TRUNC('week', CAST(ts AS DATE)) AS week
      FROM events),
    weeks AS (SELECT DISTINCT week FROM wk),
    nxt AS (
      SELECT week, LEAD(week) OVER (ORDER BY week) AS next_week FROM weeks)
    SELECT n.week,
           CAST(COUNT(*) AS BIGINT) AS n_active,
           CAST(COUNT(*) FILTER (WHERE b.user_id IS NULL) AS BIGINT)
             AS n_churned,
           ROUND(CAST(COUNT(*) FILTER (WHERE b.user_id IS NULL) AS DOUBLE)
                 / COUNT(*), 6) AS churn_rate
    FROM nxt n
    JOIN wk a ON a.week = n.week
    LEFT JOIN wk b ON b.user_id = a.user_id AND b.week = n.next_week
    WHERE n.next_week IS NOT NULL
    GROUP BY n.week
    """,
)
def churned_users_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly churn: of the users active in week w, how many are absent in
    week w+1 — the BI retention headline (the inverse of
    ``events_cohort_retention``'s comeback view) computed as an
    anti-join-shaped LEFT JOIN on the (user x week) activity grid.

    The calendar of observed weeks comes from the data (LEAD over the
    distinct week list), so a trailing partial week is never scored
    against a missing future.  Counts exact; one rounded rate.

    Scale: events collapse to distinct (user, week) first; the
    presence probe is an equi-join on (user, week) — shuffle bounded by
    the activity grid, not the event stream.  The weeks spine is tiny and
    broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    wk = e.select(
        "user_id", F.date_trunc("week", F.to_date("ts")).alias("week")
    ).distinct()
    weeks = wk.select("week").distinct()
    wspec = Window.orderBy("week")
    nxt = weeks.select(
        "week", F.lead("week").over(wspec).alias("next_week")
    ).filter(F.col("next_week").isNotNull())
    a = wk.select("user_id", "week")
    b = wk.select(
        F.col("user_id").alias("b_user"), F.col("week").alias("b_week")
    )
    joined = (
        F.broadcast(nxt)
        .join(a, "week")
        .join(
            b,
            (F.col("b_user") == F.col("user_id"))
            & (F.col("b_week") == F.col("next_week")),
            "left",
        )
    )
    return joined.groupBy(F.to_date("week").alias("week")).agg(
        F.count("*").cast("bigint").alias("n_active"),
        F.sum(F.when(F.col("b_user").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_churned"),
        F.round(
            F.sum(F.when(F.col("b_user").isNull(), 1).otherwise(0)).cast("double")
            / F.count("*"),
            6,
        ).alias("churn_rate"),
    )


# --------------------------------------------------------------------------
# Order-to-ship latency profile
# --------------------------------------------------------------------------


@query(
    "order_to_ship_latency",
    oracle="""
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE))) AS BIGINT) AS min_days,
           CAST(MEDIAN(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                                CAST(l.l_shipdate AS DATE))) AS DOUBLE) AS p50_days,
           CAST(QUANTILE_CONT(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                                       CAST(l.l_shipdate AS DATE)), 0.95)
                AS DOUBLE) AS p95_days,
           CAST(MAX(DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                             CAST(l.l_shipdate AS DATE))) AS BIGINT) AS max_days
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def order_to_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship cycle time per order priority: exact day-count gaps
    between order placement and each line's ship date, profiled as
    min/p50/p95/max — the fulfillment-SLA report every ops dashboard
    leads with (and the cross-table latency twin of
    ``interarrival_time_stats``).

    Determinism: gaps are exact integer day diffs; p50/p95 use exact
    linear-interpolated percentiles (`percentile`/QUANTILE_CONT) over
    integers — both engines interpolate identically on sorted integer
    multisets.

    Scale: fact-fact equi-join on the natural key then one hash aggregate
    over a 5-row group-by; exact percentiles per bounded group are fine,
    the 100 TB swap is approx_percentile per the repo's sketch notes.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    gap = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    j = o.join(li, o.o_orderkey == li.l_orderkey).select(
        "o_orderpriority", gap.alias("gap")
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.min("gap").cast("bigint").alias("min_days"),
        F.expr("percentile(gap, 0.5)").cast("double").alias("p50_days"),
        F.expr("percentile(gap, 0.95)").cast("double").alias("p95_days"),
        F.max("gap").cast("bigint").alias("max_days"),
    )


# --------------------------------------------------------------------------
# Cumulative unique users (running distinct count)
# --------------------------------------------------------------------------


@query(
    "cumulative_unique_users",
    oracle="""
    WITH fs AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day
      FROM events GROUP BY 1),
    days AS (SELECT DISTINCT CAST(ts AS DATE) AS day FROM events),
    news AS (
      SELECT first_day AS day, COUNT(*) AS n_new FROM fs GROUP BY 1)
    SELECT d.day,
           CAST(COALESCE(n.n_new, 0) AS BIGINT) AS n_new,
           CAST(SUM(COALESCE(n.n_new, 0))
                  OVER (ORDER BY d.day ASC) AS BIGINT) AS cum_unique
    FROM days d LEFT JOIN news n ON n.day = d.day
    """,
)
def cumulative_unique_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running count of distinct users ever seen, by day — the "total
    audience" growth curve.  A windowed COUNT(DISTINCT) is
    unsupported/unscalable, so the standard rewrite: distinct collapses to
    each user's FIRST day (one aggregate), and the cumulative unique count
    is just the running sum of first-appearance counts — turning an
    O(days x users) distinct problem into a calendar-sized prefix sum.

    Scale: one user-keyed aggregate (map-side combinable) + a
    calendar-sized window.  This is the same bounded-fanout discipline as
    ``active_users_rolling``; all outputs exact integers.
    """
    e = load_table(spark, sf_dir, "events")
    fs = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("first_day"))
    days = e.select(F.to_date("ts").alias("day")).distinct()
    news = fs.groupBy(F.col("first_day").alias("day")).agg(
        F.count("*").alias("n_new")
    )
    w = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        days.join(news, "day", "left")
        .select("day", F.coalesce("n_new", F.lit(0)).alias("n_new"))
        .select(
            "day",
            F.col("n_new").cast("bigint").alias("n_new"),
            F.sum("n_new").over(w).cast("bigint").alias("cum_unique"),
        )
    )


# --------------------------------------------------------------------------
# PAA + SAX symbolization of the daily series
# --------------------------------------------------------------------------

_PAA_DAYS = 4
_SAX_ALPHABET = 4


@query(
    "sax_symbolization",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
               AS x_u
      FROM events GROUP BY 1, 2),
    origin AS (SELECT MIN(day) AS d0 FROM daily),
    paa AS (
      SELECT event_type,
             CAST(FLOOR(DATEDIFF('day', o.d0, day) / {_PAA_DAYS})
                  AS INTEGER) AS win_idx,
             CAST(CAST(SUM(x_u) // COUNT(*) AS BIGINT) AS DOUBLE)
               / 1000000.0 AS paa
      FROM daily CROSS JOIN origin o
      GROUP BY 1, 2),
    sym AS (
      SELECT event_type, win_idx, paa,
             NTILE({_SAX_ALPHABET}) OVER (
               PARTITION BY event_type
               ORDER BY paa ASC, win_idx ASC) AS q
      FROM paa)
    SELECT event_type, win_idx, paa,
           CHR(CAST(96 + q AS INTEGER)) AS symbol
    FROM sym
    """,
)
def sax_symbolization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Piecewise Aggregate Approximation + SAX symbolization (Lin et al.
    2003) of each event type's daily value series: the calendar is cut
    into {_PAA_DAYS}-day frames, each frame becomes its mean (PAA), and
    frames map to a {_SAX_ALPHABET}-letter alphabet by within-series
    empirical quartile (NTILE with a deterministic tiebreak) — the
    dimensionality-reduction step behind time-series motif/anomaly mining
    at scale (symbols, not floats, feed the downstream index).

    Determinism: the daily series moves to exact integer micro-units and
    each frame mean is ONE truncated integer division (Spark ``div`` ≡
    DuckDB ``//``, pinned by tests/test_numeric_conventions.py) — no
    double ratio is ROUNDed, so no .5 boundary can split the engines.
    The quartile cut is NTILE over (paa, win_idx) — total order, no ties
    left to the engine.  Classic SAX uses Gaussian breakpoints on a
    z-normalized series; empirical quartiles keep the differential check
    exact while preserving the equal-occupancy property.

    Scale: events collapse to (type x day), then to (type x frame) —
    report-sized; the NTILE window partitions per series.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        (F.sum(F.col("value").cast("decimal(18,6)")) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("x_u")
    )
    origin = daily.agg(F.min("day").alias("d0"))
    paa = (
        daily.crossJoin(F.broadcast(origin))
        .groupBy(
            "event_type",
            F.floor(F.datediff(F.col("day"), F.col("d0")) / _PAA_DAYS)
            .cast("int")
            .alias("win_idx"),
        )
        .agg(
            F.sum("x_u").alias("_s"),
            F.count("*").alias("_n"),
        )
        .select(
            "event_type",
            "win_idx",
            (F.expr("CAST(_s div _n AS BIGINT)").cast("double") / 1_000_000.0)
            .alias("paa"),
        )
    )
    w = Window.partitionBy("event_type").orderBy(
        F.col("paa").asc(), F.col("win_idx").asc()
    )
    return paa.select(
        "event_type",
        "win_idx",
        "paa",
        F.char(F.lit(96) + F.ntile(_SAX_ALPHABET).over(w)).alias("symbol"),
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
# Pinball (quantile) loss evaluation of a quantile forecaster
# --------------------------------------------------------------------------

_PINBALL_QS = (0.5, 0.9)
_TRAIN_DAYS = 21


def _pinball_oracle() -> str:
    arms = []
    for q in _PINBALL_QS:
        arms.append(f"""
    SELECT t.event_type, CAST({q} AS DOUBLE) AS q,
           CAST(COUNT(*) AS BIGINT) AS n_test_days,
           CAST(CAST(CAST(SUM(CAST(ROUND(
             CASE WHEN t.x >= f.yhat THEN {q!r} * (t.x - f.yhat)
                  ELSE {q - 1!r} * (t.x - f.yhat) END, 6) AS DECIMAL(18,6)))
             * 1000000 AS HUGEINT) // COUNT(*) AS BIGINT) AS DOUBLE)
             / 1000000.0 AS pinball_loss
    FROM test t JOIN (
      SELECT event_type, QUANTILE_CONT(x, {q}) AS yhat
      FROM train GROUP BY 1) f
    ON f.event_type = t.event_type
    GROUP BY t.event_type""")
    prefix = f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2),
    origin AS (SELECT MIN(day) AS d0 FROM daily),
    lab AS (
      SELECT d.*, DATEDIFF('day', o.d0, d.day) < {_TRAIN_DAYS} AS is_train
      FROM daily d CROSS JOIN origin o),
    train AS (SELECT event_type, x FROM lab WHERE is_train),
    test AS (SELECT event_type, x FROM lab WHERE NOT is_train)
    """
    return prefix + " UNION ALL ".join(arms)


@query("pinball_loss_eval", oracle=_pinball_oracle())
def pinball_loss_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pinball (quantile) loss of a constant-quantile forecaster: train on
    the first {_TRAIN_DAYS} calendar days, predict each type's daily value
    at q=0.5 and q=0.9 as the train-window quantile, score on the held-out
    tail — the accuracy metric for QUANTILE forecasts (P50/P90 capacity
    planning), completing the eval suite beside ``forecast_backtest_eval``
    (point forecasts) and ``retrieval_mrr_ndcg`` (rankings).

    Determinism: the daily series is decimal-summed then rounded once;
    the train quantile interpolates the same sorted doubles in both
    engines; per-day losses are rounded then DECIMAL-summed, and the
    closing mean is a truncated integer division of exact micro-units
    (Spark ``div`` ≡ DuckDB ``//``) — no ROUND of a derived double ratio
    remains, so no .5 boundary can split the engines.

    Scale: events collapse to (type x day); everything after is
    report-sized.  The per-type quantile table is a broadcast join.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("x")
    )
    origin = daily.agg(F.min("day").alias("d0"))
    lab = daily.crossJoin(F.broadcast(origin)).withColumn(
        "is_train", F.datediff(F.col("day"), F.col("d0")) < _TRAIN_DAYS
    )
    train = lab.filter("is_train")
    test = lab.filter("NOT is_train")
    out = None
    for q in _PINBALL_QS:
        f = train.groupBy("event_type").agg(
            F.expr(f"percentile(x, {q})").alias("yhat")
        )
        err = F.col("x") - F.col("yhat")
        loss = F.when(err >= 0, F.lit(q) * err).otherwise(F.lit(q - 1) * err)
        arm = (
            test.join(F.broadcast(f), "event_type")
            .groupBy("event_type")
            .agg(
                F.count("*").cast("bigint").alias("n_test_days"),
                (F.sum(F.round(loss, 6).cast("decimal(18,6)")) * 1_000_000)
                .cast("decimal(38,0)")
                .alias("_s"),
            )
            .select(
                "event_type",
                "n_test_days",
                (
                    F.expr("CAST(_s div n_test_days AS BIGINT)")
                    .cast("double")
                    / 1_000_000.0
                ).alias("pinball_loss"),
            )
            .select(
                "event_type",
                F.lit(float(q)).alias("q"),
                "n_test_days",
                "pinball_loss",
            )
        )
        out = arm if out is None else out.unionByName(arm)
    return out


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
            (
                vec.dot(F.col("q_emb"), F.col("n_emb"))
                / (F.col("_nq") * F.col("_nn"))
            ).alias("cos_full"),
            (
                vec.dot(F.col("q_tr"), F.col("n_tr"))
                / (F.col("_nq_tr") * F.col("_nn_tr"))
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
# Price-volume-mix decomposition
# --------------------------------------------------------------------------


@query(
    "price_volume_mix_decomposition",
    oracle="""
    WITH base AS (
      SELECT l_partkey, EXTRACT(MONTH FROM l_shipdate) AS m,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) * 10000
                  AS HUGEINT) AS rev_t,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) * 100
                  AS HUGEINT) AS qty_h
      FROM lineitem
      WHERE EXTRACT(YEAR FROM l_shipdate)
              = (SELECT MIN(EXTRACT(YEAR FROM l_shipdate)) FROM lineitem)
        AND EXTRACT(MONTH FROM l_shipdate) IN (1, 2)
      GROUP BY 1, 2),
    px AS (
      SELECT l_partkey, m,
             CAST((rev_t * 1000000) // qty_h AS BIGINT) AS p_micro,
             CAST(qty_h AS BIGINT) AS q_h
      FROM base),
    both_m AS (
      SELECT a.l_partkey,
             a.p_micro AS p1, a.q_h AS q1, b.p_micro AS p2, b.q_h AS q2
      FROM px a JOIN px b ON a.l_partkey = b.l_partkey
      WHERE a.m = 1 AND b.m = 2)
    SELECT l_partkey,
           CAST(p2 AS BIGINT) - p1 AS delta_p_micro,
           CAST(q2 AS BIGINT) - q1 AS delta_q_h,
           CAST((CAST(p2 AS HUGEINT) * q2 - CAST(p1 AS HUGEINT) * q1)
                AS BIGINT) AS delta_rev_fp,
           CAST((CAST(p2 - p1 AS HUGEINT) * q1) AS BIGINT) AS price_effect_fp,
           CAST((CAST(p1 AS HUGEINT) * (q2 - q1)) AS BIGINT)
             AS volume_effect_fp,
           CAST((CAST(p2 - p1 AS HUGEINT) * (q2 - q1)) AS BIGINT)
             AS mix_effect_fp
    FROM both_m
    """,
)
def price_volume_mix_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Price-volume-mix bridge in EXACT fixed point: for parts shipped in
    both month 1 and month 2 of the first year, the revenue move
    decomposes as Δrev = Δp·q1 + p1·Δq + Δp·Δq (price, volume, joint
    effect) — the FP&A explanation of WHY revenue moved, the per-entity
    drilldown behind ``period_delta_contribution``'s who-moved-it table.

    Numerics: unit price is an exact integer division in micro-units
    (floored; ``div`` / ``//`` — identical positive-operand semantics
    both engines), quantities in hundredths; every effect is then an
    exact INTEGER product in fixed-point units (µ¤·q/100 — divide by 1e8
    for currency).  The decomposition identity holds bit-exactly by
    construction (pinned in tests) — no double ever enters, so no
    rounding boundary exists to straddle.

    Scale: one hash aggregate keyed by (part, month), then a self-join on
    part over the two month slices — aggregate-sized, not fact-sized.
    The 128-bit intermediates bound the products at any revenue scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    y0 = li.agg(F.min(F.year("l_shipdate")).alias("y0"))
    base = (
        li.crossJoin(F.broadcast(y0))
        .filter(
            (F.year("l_shipdate") == F.col("y0"))
            & F.month("l_shipdate").isin(1, 2)
        )
        .groupBy("l_partkey", F.month("l_shipdate").alias("m"))
        .agg(
            (F.sum(F.col("l_extendedprice").cast("decimal(18,4)")) * 10000)
            .cast("decimal(38,0)")
            .alias("rev_t"),
            (F.sum(F.col("l_quantity").cast("decimal(18,2)")) * 100)
            .cast("decimal(38,0)")
            .alias("qty_h"),
        )
    )
    px = base.select(
        "l_partkey",
        "m",
        F.expr("CAST((rev_t * 1000000) div qty_h AS BIGINT)").alias("p_micro"),
        F.col("qty_h").cast("bigint").alias("q_h"),
    )
    a = px.filter(F.col("m") == 1).select(
        "l_partkey", F.col("p_micro").alias("p1"), F.col("q_h").alias("q1")
    )
    b = px.filter(F.col("m") == 2).select(
        "l_partkey", F.col("p_micro").alias("p2"), F.col("q_h").alias("q2")
    )
    j = a.join(b, "l_partkey")
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    return j.select(
        "l_partkey",
        (F.col("p2") - F.col("p1")).cast("bigint").alias("delta_p_micro"),
        (F.col("q2") - F.col("q1")).cast("bigint").alias("delta_q_h"),
        (d38("p2") * d38("q2") - d38("p1") * d38("q1"))
        .cast("bigint")
        .alias("delta_rev_fp"),
        ((d38("p2") - d38("p1")) * d38("q1"))
        .cast("bigint")
        .alias("price_effect_fp"),
        (d38("p1") * (d38("q2") - d38("q1")))
        .cast("bigint")
        .alias("volume_effect_fp"),
        ((d38("p2") - d38("p1")) * (d38("q2") - d38("q1")))
        .cast("bigint")
        .alias("mix_effect_fp"),
    )


# --------------------------------------------------------------------------
# A/B sample-size planning
# --------------------------------------------------------------------------

#: Two-sided alpha=0.05 and power=0.80 normal quantiles, injected as the
#: SAME Python double literals into both engines (no cross-libm erf).
_Z_ALPHA = 1.959963984540054
_Z_BETA = 0.8416212335729143
#: (z_a + z_b)^2 * 2, folded to ONE literal so no cross-engine
#: decimal-vs-double addition order can differ.
_SS_K = (_Z_ALPHA + _Z_BETA) ** 2 * 2
_MDE_FRAC = 0.05


@query(
    "ab_sample_size_planning",
    oracle=f"""
    WITH m AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s1,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS s2
      FROM events GROUP BY 1),
    stats AS (
      SELECT event_type, n,
             CAST(s1 AS DOUBLE) / n AS mu,
             (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)
               / (n - 1) AS var
      FROM m WHERE n > 1)
    SELECT event_type,
           ROUND(mu, 6) AS baseline_mean,
           ROUND(var, 6) AS variance,
           ROUND({_MDE_FRAC!r} * mu, 6) AS mde,
           CAST(CEIL({_SS_K!r} * var
                     / (({_MDE_FRAC!r} * mu) * ({_MDE_FRAC!r} * mu)))
                AS BIGINT) AS n_per_arm
    FROM stats WHERE mu > 0
    """,
)
def ab_sample_size_planning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B test sample-size planner: per event type, the users-per-arm
    needed to detect a {_MDE_FRAC:.0%} lift in mean value at two-sided
    alpha=0.05 with 80% power — n = (z_a + z_b)^2 * 2*sigma^2 / delta^2 —
    the experiment-design front end to ``ab_test_lift_report``'s readout.

    The normal quantiles are injected as IDENTICAL double literals into
    both engines (no cross-libm inverse-erf); mean and variance come from
    exact decimal moments, so every derived double is the same bits on
    both sides and CEIL can't straddle.

    Scale: one map-side-combining moment aggregate keyed by type; the
    report is |types| rows.
    """
    e = load_table(spark, sf_dir, "events")
    d6 = F.col("value").cast("decimal(18,6)")
    m = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d6).alias("s1"),
        F.sum(d6 * d6).alias("s2"),
    )
    mu = F.col("s1").cast("double") / F.col("n")
    var = (
        F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double") / F.col("n")
    ) / (F.col("n") - 1)
    mde = F.lit(_MDE_FRAC) * mu
    return (
        m.filter(F.col("n") > 1)
        .select(
            "event_type",
            F.round(mu, 6).alias("baseline_mean"),
            F.round(var, 6).alias("variance"),
            F.round(mde, 6).alias("mde"),
            F.ceil(F.lit(_SS_K) * var / (mde * mde))
            .cast("bigint")
            .alias("n_per_arm"),
            mu.alias("_mu"),
        )
        .filter(F.col("_mu") > 0)
        .drop("_mu")
    )


# --------------------------------------------------------------------------
# 1-D Wasserstein (earth mover's) drift
# --------------------------------------------------------------------------


@query(
    "wasserstein_drift_1d",
    oracle="""
    WITH t AS (
      SELECT n_chars AS v, (doc_id % 10 = 7) AS in_delta FROM documents),
    tot AS (
      SELECT COUNT(*) FILTER (WHERE NOT in_delta) AS n_idx,
             COUNT(*) FILTER (WHERE in_delta) AS n_del
      FROM t),
    pv AS (
      SELECT v,
             COUNT(*) FILTER (WHERE NOT in_delta) AS c_idx,
             COUNT(*) FILTER (WHERE in_delta) AS c_del
      FROM t GROUP BY v),
    cdf AS (
      SELECT v,
             SUM(c_idx) OVER (ORDER BY v ASC) AS cum_idx,
             SUM(c_del) OVER (ORDER BY v ASC) AS cum_del,
             LEAD(v) OVER (ORDER BY v ASC) AS next_v
      FROM pv)
    SELECT CAST(ROUND(SUM(CAST(ROUND(
             ABS(CAST(c.cum_idx AS DOUBLE) / t.n_idx
                 - CAST(c.cum_del AS DOUBLE) / t.n_del)
             * (c.next_v - c.v), 9) AS DECIMAL(28,9))), 6) AS DOUBLE)
             AS w1_distance,
           CAST(MAX(t.n_idx) AS BIGINT) AS n_index,
           CAST(MAX(t.n_del) AS BIGINT) AS n_delta
    FROM cdf c CROSS JOIN tot t
    WHERE c.next_v IS NOT NULL
    """,
)
def wasserstein_drift_1d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-D Wasserstein-1 (earth mover's) distance between the delta batch
    and the index corpus over document length: W1 = integral of
    |CDF_idx - CDF_delta| — the INTEGRAL drift metric that, unlike KS's
    sup-norm (``ks_test_drift``, same split), scores HOW FAR mass moved,
    not just the worst point; the metric of choice for monitoring skewed
    numeric features.

    Determinism: step CDFs are exact integer cumulative counts over the
    sorted value domain; each trapezoid-free step term
    |F_a - F_b| * (v_next - v) is rounded at 1e-9 then DECIMAL-summed
    (order-independent); one final rounding.

    Scale: aggregates collapse to the distinct VALUE DOMAIN first (same
    discipline as KS); the cumulative window runs over that domain, and
    the totals are a 1-row broadcast.
    """
    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        F.col("n_chars").alias("v"), (F.col("doc_id") % 10 == 7).alias("in_delta")
    )
    tot = t.agg(
        F.sum(F.when(~F.col("in_delta"), 1).otherwise(0)).alias("n_idx"),
        F.sum(F.when(F.col("in_delta"), 1).otherwise(0)).alias("n_del"),
    )
    pv = t.groupBy("v").agg(
        F.sum(F.when(~F.col("in_delta"), 1).otherwise(0)).alias("c_idx"),
        F.sum(F.when(F.col("in_delta"), 1).otherwise(0)).alias("c_del"),
    )
    w = Window.orderBy(F.col("v").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    wl = Window.orderBy(F.col("v").asc())
    cdf = pv.select(
        "v",
        F.sum("c_idx").over(w).alias("cum_idx"),
        F.sum("c_del").over(w).alias("cum_del"),
        F.lead("v").over(wl).alias("next_v"),
    )
    term = F.round(
        F.abs(
            F.col("cum_idx").cast("double") / F.col("n_idx")
            - F.col("cum_del").cast("double") / F.col("n_del")
        )
        * (F.col("next_v") - F.col("v")),
        9,
    ).cast("decimal(28,9)")
    return (
        cdf.filter(F.col("next_v").isNotNull())
        .crossJoin(F.broadcast(tot))
        .agg(
            F.round(F.sum(term), 6).cast("double").alias("w1_distance"),
            F.max("n_idx").cast("bigint").alias("n_index"),
            F.max("n_del").cast("bigint").alias("n_delta"),
        )
    )


# --------------------------------------------------------------------------
# Weekly multiplicative seasonal index (ratio-to-moving-average)
# --------------------------------------------------------------------------


@query(
    "seasonal_index_weekly",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) * 1000000
                  AS HUGEINT) AS x_u
      FROM events GROUP BY 1, 2),
    ma AS (
      SELECT event_type, day, x_u,
             COUNT(*) OVER w AS n_win,
             SUM(x_u) OVER w AS s_u
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY day ASC
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    ratio AS (
      SELECT event_type, ISODOW(day) AS weekday,
             CAST((x_u * 7000000) // s_u AS BIGINT) AS r_micro
      FROM ma WHERE n_win = 7 AND s_u > 0)
    SELECT event_type, CAST(weekday AS INTEGER) AS weekday,
           CAST(COUNT(*) AS BIGINT) AS n_obs,
           CAST(SUM(r_micro) // COUNT(*) AS DOUBLE) / 1000000.0
             AS seasonal_index
    FROM ratio GROUP BY 1, 2
    """,
)
def seasonal_index_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical ratio-to-moving-average seasonal index by ISO weekday:
    each day's value over its centered 7-day moving average, averaged per
    (type, weekday) — the MULTIPLICATIVE decomposition ("Mondays run at
    0.8x trend") complementing the additive hour-of-day model in
    ``timeseries_seasonal_profile``; only complete 7-day windows rate.

    Numerics: the daily series moves to exact integer micro-units, the MA
    frame sum stays integer, and each day/trend ratio is an exact
    TRUNCATED integer division to micro precision (Spark ``div`` and
    DuckDB ``//`` both truncate toward zero — measured and pinned by
    tests/test_numeric_conventions.py, so the idiom is sign-safe) — no
    double ratio exists, so no rounding boundary can straddle engines.
    One final truncated division of exact integers emits the index.

    Scale: calendar-sized after the first collapse; the centered frame is
    O(1) state per series; 128-bit intermediates bound the scaled
    numerators at any volume.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        (F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6) * 1_000_000)
        .cast("decimal(38,0)")
        .alias("x_u")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-3, 3)
    )
    ma = daily.select(
        "event_type",
        "day",
        "x_u",
        F.count("*").over(w).alias("n_win"),
        F.sum("x_u").over(w).alias("s_u"),
    )
    ratio = ma.filter((F.col("n_win") == 7) & (F.col("s_u") > 0)).select(
        "event_type",
        (F.weekday("day") + 1).alias("weekday"),
        F.expr("CAST((x_u * 1000000 * 7) div s_u AS BIGINT)").alias("r_micro"),
    )
    agg = ratio.groupBy(
        "event_type", F.col("weekday").cast("int").alias("weekday")
    ).agg(
        F.count("*").cast("bigint").alias("n_obs"),
        F.sum("r_micro").alias("_s"),
    )
    # mean truncated to exact integer micro-units (div — identical to
    # DuckDB's integer // toward zero, sign included), then ONE pure
    # double division by 1e6 — no ROUND call exists to straddle a .5
    # boundary (Spark rounds the shortest decimal repr, DuckDB the
    # binary value; an exact x.xxxxxx5 rational would split them).
    return agg.select(
        "event_type",
        "weekday",
        "n_obs",
        (F.expr("CAST(_s div n_obs AS BIGINT)").cast("double") / 1_000_000.0)
        .alias("seasonal_index"),
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
             MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(
               LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\s+'), t -> t != ''))),
               ' ')) AS gold
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
# Repeat-purchase cycle
# --------------------------------------------------------------------------


@query(
    "repeat_purchase_cycle",
    oracle="""
    WITH gaps AS (
      SELECT c.c_nationkey,
             DATEDIFF('day',
               CAST(LAG(o.o_orderdate) OVER (
                 PARTITION BY o.o_custkey
                 ORDER BY o.o_orderdate ASC, o.o_orderkey ASC) AS DATE),
               CAST(o.o_orderdate AS DATE)) AS gap
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
    SELECT c_nationkey,
           CAST(COUNT(gap) AS BIGINT) AS n_gaps,
           CAST(MEDIAN(gap) AS DOUBLE) AS p50_days,
           CAST(QUANTILE_CONT(gap, 0.9) AS DOUBLE) AS p90_days
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY c_nationkey
    """,
)
def repeat_purchase_cycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cycle time: per-customer gaps between consecutive
    orders, profiled per nation as median / p90 days — the
    replenishment-rhythm metric behind reorder reminders and demand
    forecasting (the ORDER-level sibling of ``interarrival_time_stats``'s
    event-level burstiness).

    Determinism: gaps are exact integer day diffs off one per-customer
    LAG; percentiles interpolate identical sorted integers in both
    engines (the `order_to_ship_latency` discipline).

    Scale: one window shuffle on the natural customer key, then a
    bounded-key (|nations|) aggregate; exact percentiles swap to
    approx_percentile at fleet scale per the repo's sketch notes.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    gaps = (
        o.select(
            "o_custkey",
            F.datediff(
                F.to_date("o_orderdate"),
                F.to_date(F.lag("o_orderdate").over(w)),
            ).alias("gap"),
        )
        .filter(F.col("gap").isNotNull())
        .join(
            F.broadcast(c.select("c_custkey", "c_nationkey")),
            F.col("o_custkey") == F.col("c_custkey"),
        )
    )
    return gaps.groupBy("c_nationkey").agg(
        F.count("gap").cast("bigint").alias("n_gaps"),
        F.expr("percentile(gap, 0.5)").cast("double").alias("p50_days"),
        F.expr("percentile(gap, 0.9)").cast("double").alias("p90_days"),
    )


# --------------------------------------------------------------------------
# Peer benchmarking vs group median
# --------------------------------------------------------------------------


@query(
    "peer_benchmark_vs_median",
    oracle="""
    WITH rev AS (
      SELECT s.s_suppkey, s.s_nationkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS r
      FROM supplier s JOIN lineitem l ON l.l_suppkey = s.s_suppkey
      GROUP BY 1, 2),
    med AS (
      SELECT s_nationkey, MEDIAN(CAST(r AS HUGEINT)) AS m
      FROM (SELECT s_nationkey, r * 10000 AS r FROM rev) GROUP BY 1)
    SELECT rev.s_suppkey, rev.s_nationkey,
           CAST(ROUND(rev.r, 2) AS DOUBLE) AS revenue,
           CAST(CAST(rev.r * 20000 AS HUGEINT) - CAST(med.m * 2 AS HUGEINT)
                AS BIGINT) AS delta2_vs_median_fp,
           (rev.r * 10000 > med.m) AS above_median
    FROM rev JOIN med ON med.s_nationkey = rev.s_nationkey
    """,
)
def peer_benchmark_vs_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peer benchmarking: each supplier's revenue against the MEDIAN of
    its nation peer group — the "you vs similar accounts" readout every
    seller/ops dashboard ships, robust to the one whale the mean would
    follow.

    Numerics: revenues are exact decimals scaled to integer fixed point
    (×1e4) BEFORE the median; the delta is emitted in DOUBLED fixed-point
    units so an even-count interpolated median (k + 0.5) becomes the
    exact integer 2k+1 before any cast — no rounding-mode divergence can
    enter; the above/below flag compares exact-magnitude doubles.

    Scale: supplier-keyed aggregate, then a |nations|-group exact median
    over supplier-count-sized groups broadcast back.  At fleet scale the
    median swaps to approx_percentile per the repo's sketch notes.
    """
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    rev = (
        s.join(li, s.s_suppkey == li.l_suppkey)
        .groupBy("s_suppkey", "s_nationkey")
        .agg(F.sum(F.col("l_extendedprice").cast("decimal(18,4)")).alias("r"))
    )
    scaled = rev.withColumn("r_fp", (F.col("r") * 10000).cast("decimal(38,0)"))
    med = scaled.groupBy(F.col("s_nationkey").alias("m_nat")).agg(
        F.expr("percentile(r_fp, 0.5)").alias("m")
    )
    return (
        scaled.join(F.broadcast(med), F.col("s_nationkey") == F.col("m_nat"))
        .select(
            "s_suppkey",
            "s_nationkey",
            F.round(F.col("r"), 2).cast("double").alias("revenue"),
            # doubled fixed-point units: 2*median = the sum of the two
            # middle integers, exact — no .5 interpolation survives to a
            # cast whose rounding mode could differ between engines
            (
                (F.col("r_fp") * 2).cast("decimal(38,0)")
                - (F.col("m") * 2).cast("decimal(38,0)")
            )
            .cast("bigint")
            .alias("delta2_vs_median_fp"),
            (F.col("r_fp").cast("double") > F.col("m")).alias("above_median"),
        )
    )


# --------------------------------------------------------------------------
# Quantile treatment effects (A/B)
# --------------------------------------------------------------------------


@query(
    "ab_quantile_treatment_effect",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             TRY_CAST(CONCAT('0x', SUBSTRING(
               MD5(CONCAT('ab1|', CAST(user_id AS VARCHAR))), 1, 15))
               AS BIGINT) % 2 AS arm,
             SUM(CAST(value AS DECIMAL(18,6))) AS spend
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1),
    fp AS (SELECT arm, CAST(spend * 1000000 AS HUGEINT) AS s_fp FROM assign),
    q AS (
      SELECT arm,
             MEDIAN(s_fp) AS p50,
             QUANTILE_CONT(s_fp, 0.25) AS p25,
             QUANTILE_CONT(s_fp, 0.75) AS p75
      FROM fp GROUP BY arm)
    SELECT a.p25 / 1000000.0 - b.p25 / 1000000.0 AS qte_p25,
           a.p50 / 1000000.0 - b.p50 / 1000000.0 AS qte_p50,
           a.p75 / 1000000.0 - b.p75 / 1000000.0 AS qte_p75,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM assign WHERE arm = 1)
             AS n_treat,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM assign WHERE arm = 0)
             AS n_control
    FROM (SELECT * FROM q WHERE arm = 1) a, (SELECT * FROM q WHERE arm = 0) b
    """,
)
def ab_quantile_treatment_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile treatment effects for the hash-assigned A/B split: the
    p25/p50/p75 spend difference between arms — the DISTRIBUTIONAL
    experiment readout (did the treatment move the median user or only
    the tail?) that mean-lift reports (`ab_test_lift_report`, same
    salted-md5 assignment) cannot see.

    Numerics: per-user spend is an exact decimal scaled to integer fixed
    point before the quantiles, so quantile interpolation runs on exact
    integers (identical in both engines); each QTE is a difference of two
    such quantiles scaled back by a pure power-of-ten double division —
    no ROUND call.  A/A split here, so all QTEs ≈ 0 (pinned).

    Scale: user-keyed aggregate + per-arm exact quantiles (two groups);
    approx_percentile at fleet scale.
    """
    e = load_table(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1|"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    assign = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("spend"))
        .select(
            bucket.alias("arm"),
            (F.col("spend") * 1_000_000).cast("decimal(38,0)").alias("s_fp"),
        )
    )
    q = assign.groupBy("arm").agg(
        F.expr("percentile(s_fp, 0.25)").alias("p25"),
        F.expr("percentile(s_fp, 0.5)").alias("p50"),
        F.expr("percentile(s_fp, 0.75)").alias("p75"),
        F.count("*").alias("n"),
    )
    a = q.filter(F.col("arm") == 1).select(
        F.col("p25").alias("a25"), F.col("p50").alias("a50"),
        F.col("p75").alias("a75"), F.col("n").alias("n_treat"),
    )
    b = q.filter(F.col("arm") == 0).select(
        F.col("p25").alias("b25"), F.col("p50").alias("b50"),
        F.col("p75").alias("b75"), F.col("n").alias("n_control"),
    )
    return a.crossJoin(b).select(
        (F.col("a25") / 1_000_000.0 - F.col("b25") / 1_000_000.0).alias("qte_p25"),
        (F.col("a50") / 1_000_000.0 - F.col("b50") / 1_000_000.0).alias("qte_p50"),
        (F.col("a75") / 1_000_000.0 - F.col("b75") / 1_000_000.0).alias("qte_p75"),
        F.col("n_treat").cast("bigint").alias("n_treat"),
        F.col("n_control").cast("bigint").alias("n_control"),
    )


# --------------------------------------------------------------------------
# Embedding centroid drift
# --------------------------------------------------------------------------


def _centroid_sql(pred: str, alias: str) -> str:
    """Per-dimension decimal-exact centroid of a filtered embedding set."""
    return f"""
    {alias} AS (
      SELECT dim,
             CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(18,9)))
                  AS DOUBLE) / COUNT(*) AS c
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

    Numerics: centroids follow the ``embedding_centroids`` idiom (decimal
    sum cast to double, ONE double division, no decimal-division path);
    the cross-dimension L2/cosine reductions round each
    product term at 1e-12 then DECIMAL-sum (order-independent), with one
    final rounding per output.

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
    # the embedding_centroids idiom: decimal sum cast to double FIRST,
    # then one double division — no decimal-division path (whose scale
    # handling differs between engines) ever runs
    cent = pairs.groupBy("dim").agg(
        (
            F.sum(
                F.when(
                    ~F.col("in_delta"),
                    F.col("val").cast("double").cast("decimal(18,9)"),
                )
            ).cast("double")
            / F.sum(F.when(~F.col("in_delta"), 1).otherwise(0))
        ).alias("ci"),
        (
            F.sum(
                F.when(
                    F.col("in_delta"),
                    F.col("val").cast("double").cast("decimal(18,9)"),
                )
            ).cast("double")
            / F.sum(F.when(F.col("in_delta"), 1).otherwise(0))
        ).alias("cd"),
    )
    d12 = lambda c: F.round(c, 12).cast("decimal(28,12)")  # noqa: E731
    diff2 = d12((F.col("ci") - F.col("cd")) * (F.col("ci") - F.col("cd")))
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
# Top-N + "other" rollup
# --------------------------------------------------------------------------


@query(
    "topn_plus_other_rollup",
    oracle="""
    WITH per_src AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars
      FROM documents GROUP BY 1),
    ranked AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY n_docs DESC, source ASC) AS rk
      FROM per_src)
    SELECT CASE WHEN rk <= 3 THEN source ELSE '(other)' END AS bucket,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars,
           CAST(MIN(rk) AS BIGINT) AS rank_order
    FROM ranked
    GROUP BY 1
    """,
)
def topn_plus_other_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 sources by volume with everything else folded into one
    "(other)" bucket — the long-tail presentation rule every report uses
    (pie charts, budget tables) and the complement of plain top-k: the
    tail is ACCOUNTED FOR, not dropped, so bucket totals reconcile to the
    corpus total (pinned).

    Determinism: counts are exact; the rank tiebreak is total (count
    desc, name asc).  Scale: the rollup runs over the |sources|-sized
    aggregate, never the corpus; the window is report-sized.
    """
    d = load_table(spark, sf_dir, "documents")
    per_src = d.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    w = Window.orderBy(F.col("n_docs").desc(), F.col("source").asc())
    ranked = per_src.withColumn("rk", F.row_number().over(w))
    return (
        ranked.select(
            F.when(F.col("rk") <= 3, F.col("source"))
            .otherwise(F.lit("(other)"))
            .alias("bucket"),
            "n_docs",
            "n_chars",
            "rk",
        )
        .groupBy("bucket")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
            F.min("rk").cast("bigint").alias("rank_order"),
        )
    )


# --------------------------------------------------------------------------
# State-machine compliance audit
# --------------------------------------------------------------------------

#: Allowed event-type transitions per user journey (the product's funnel
#: contract): anything else is a compliance violation to investigate.
_ALLOWED_TRANSITIONS = (
    ("view", "view"),
    ("view", "click"),
    ("click", "view"),
    ("click", "click"),
    ("click", "purchase"),
    ("purchase", "view"),
)


def _sm_allowed_sql() -> str:
    return ", ".join(f"('{a}','{b}')" for a, b in _ALLOWED_TRANSITIONS)


@query(
    "state_machine_audit",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS curr,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS prev
      FROM events),
    pairs AS (SELECT prev, curr FROM seq WHERE prev IS NOT NULL),
    allowed(a, b) AS (VALUES __SM_VALUES__)
    SELECT p.prev, p.curr,
           CAST(COUNT(*) AS BIGINT) AS n,
           (al.a IS NULL) AS is_violation
    FROM pairs p
    LEFT JOIN allowed al ON al.a = p.prev AND al.b = p.curr
    GROUP BY p.prev, p.curr, al.a IS NULL
    """.replace("__SM_VALUES__", _sm_allowed_sql()),
)
def state_machine_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-machine compliance audit: per-user event sequences checked
    against the product's ALLOWED transition contract — observed
    transitions counted and flagged when outside the allowlist.  This is
    the governance twin of ``event_transition_matrix`` (which measures
    what IS; this judges it against what SHOULD be) — the order-status /
    workflow-integrity check every operational datastore audits after an
    incident.

    Determinism: the sequence order is total ((ts, event_id)); counts
    exact; the flag is a broadcast-allowlist anti-membership.

    Scale: one window shuffle on user_id, then a |types|²-bounded
    aggregate joined against a literal allowlist (broadcast by size).
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("curr"),
    ).filter(F.col("prev").isNotNull())
    allowed = F.broadcast(
        sparkdf_from_pairs(spark, _ALLOWED_TRANSITIONS)
    )
    return (
        seq.join(
            allowed,
            (F.col("prev") == F.col("a")) & (F.col("curr") == F.col("b")),
            "left",
        )
        .groupBy("prev", "curr", F.col("a").isNull().alias("is_violation"))
        .agg(F.count("*").cast("bigint").alias("n"))
        .select("prev", "curr", "n", "is_violation")
    )


def sparkdf_from_pairs(spark: SparkSession, pairs) -> DataFrame:
    """Tiny literal lookup table (broadcast side of contract joins)."""
    return spark.createDataFrame(list(pairs), "a string, b string")


# --------------------------------------------------------------------------
# Business-days latency
# --------------------------------------------------------------------------

#: extra-business-days lookup: index (isodow(start)-1)*7 + (gap % 7),
#: precomputed once and injected into BOTH engines as the same literals.
_BD_EXTRA = (
    0, 1, 2, 3, 4, 4, 4,
    0, 1, 2, 3, 3, 3, 4,
    0, 1, 2, 2, 2, 3, 4,
    0, 1, 1, 1, 2, 3, 4,
    0, 0, 0, 1, 2, 3, 4,
    0, 0, 1, 2, 3, 4, 5,
    0, 1, 2, 3, 4, 5, 5,
)


@query(
    "business_days_latency",
    oracle=f"""
    WITH g AS (
      SELECT o.o_orderpriority,
             DATEDIFF('day', CAST(o.o_orderdate AS DATE),
                      CAST(l.l_shipdate AS DATE)) AS gap,
             ISODOW(CAST(o.o_orderdate AS DATE)) AS k
      FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey),
    bd AS (
      SELECT o_orderpriority,
             (gap // 7) * 5
               + [{", ".join(str(x) for x in _BD_EXTRA)}]
                 [(k - 1) * 7 + (gap % 7) + 1] AS bdays
      FROM g WHERE gap >= 0)
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MEDIAN(bdays) AS DOUBLE) AS p50_bdays,
           CAST(QUANTILE_CONT(bdays, 0.95) AS DOUBLE) AS p95_bdays,
           CAST(SUM(CASE WHEN bdays > 60 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_sla_breach
    FROM bd GROUP BY o_orderpriority
    """,
)
def business_days_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship latency in BUSINESS days (weekends excluded) with a
    60-business-day SLA breach count — the calendar arithmetic ops teams
    actually contract on, computed CLOSED-FORM: full weeks contribute 5
    days and the remainder comes from a 49-entry (start-weekday × gap%7)
    lookup injected identically into both engines — no per-day explode,
    no calendar table scan (property-verified against day-by-day
    iteration in tests).

    Scale: the lookup is O(1) per row on the fact join; the percentile
    aggregate is 5-group-bounded.  A holiday calendar would swap the
    literal lookup for a broadcast dim — same shape.
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    gap = F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
    k = F.weekday(F.to_date("o_orderdate")) + 1  # ISO: Mon=1..Sun=7
    extra = F.element_at(
        F.array(*[F.lit(x) for x in _BD_EXTRA]),
        ((k - 1) * 7 + (gap % 7) + 1).cast("int"),
    )
    j = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            "o_orderpriority",
            gap.alias("gap"),
            extra.alias("extra"),
        )
        .filter(F.col("gap") >= 0)
        .select(
            "o_orderpriority",
            (F.floor(F.col("gap") / 7) * 5 + F.col("extra")).alias("bdays"),
        )
    )
    return j.groupBy("o_orderpriority").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("percentile(bdays, 0.5)").cast("double").alias("p50_bdays"),
        F.expr("percentile(bdays, 0.95)").cast("double").alias("p95_bdays"),
        F.sum(F.when(F.col("bdays") > 60, 1).otherwise(0))
        .cast("bigint")
        .alias("n_sla_breach"),
    )


# --------------------------------------------------------------------------
# Export shard manifest (integrity-hashed shard stats)
# --------------------------------------------------------------------------

_N_SHARDS = 8


@query(
    "export_shard_manifest",
    oracle=f"""
    WITH d AS (
      SELECT TRY_CAST(CONCAT('0x', SUBSTRING(
               MD5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % {_N_SHARDS}
               AS shard,
             LEN(LIST_FILTER(REGEXP_SPLIT_TO_ARRAY(text, '\\s+'),
                             t -> t != '')) AS n_toks,
             TRY_CAST(CONCAT('0x', SUBSTRING(MD5(text), 1, 15)) AS BIGINT)
               AS h
      FROM documents)
    SELECT shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens,
           CAST(BIT_XOR(h) AS BIGINT) AS content_hash
    FROM d GROUP BY shard
    """,
)
def export_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Export-shard manifest: docs assigned to {_N_SHARDS} shards by a
    content-free stable hash, each shard summarized as (doc count, token
    count, ORDER-INDEPENDENT content hash = XOR of per-doc 60-bit md5
    prefixes) — the integrity manifest a training-data export writes next
    to its shards so any reader (or a later re-export) can verify
    completeness and bit-level content equality WITHOUT re-reading in a
    fixed order.

    XOR is the point: commutative/associative, so the manifest hash is
    identical under any partitioning, any retry order, and any engine —
    the same property `dec_sum` gives money columns, applied to content
    identity.  Pairs with ``corpus_shuffle_deterministic`` (ordering) and
    ``curated_corpus_partitioned_write`` (layout).

    Scale: one scan, map-side-combining aggregate, {_N_SHARDS} output
    rows; the hash combine is mergeable across any shard/executor split.
    """
    d = load_table(spark, sf_dir, "documents")
    shard = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % _N_SHARDS
    )
    h = F.conv(F.substring(F.md5(F.col("text")), 1, 15), 16, 10).cast("bigint")
    from lms_etl_pipeline_spark.operators import text as tx

    return (
        d.select(
            shard.alias("shard"),
            F.size(tx.tokens("text")).alias("n_toks"),
            h.alias("h"),
        )
        .groupBy("shard")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.expr("bit_xor(h)").cast("bigint").alias("content_hash"),
        )
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

    theory_case = " ".join(
        f"WHEN {b} THEN {_SC_THEORY[b]!r}" for b in range(10)
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
# Wilson confidence intervals for conversion rates
# --------------------------------------------------------------------------

#: z for a 95% two-sided interval — ONE injected literal (no cross-libm
#: inverse-erf), and its square, folded in Python like _SS_K.
_WILSON_Z = 1.959963984540054
_WILSON_Z2 = _WILSON_Z * _WILSON_Z


@query(
    "wilson_conversion_ci",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS converted
      FROM events GROUP BY 1),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS k
      FROM per_user)
    , raw AS (
    SELECT n, k,
           CAST(k AS DOUBLE) / n AS rate,
           (CAST(k AS DOUBLE) / n + {_WILSON_Z2!r} / (2 * n)
            - {_WILSON_Z!r} * SQRT(
                (CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                + {_WILSON_Z2!r} / (4.0 * n * n)))
             / (1 + {_WILSON_Z2!r} / n) AS ci_low_raw,
           (CAST(k AS DOUBLE) / n + {_WILSON_Z2!r} / (2 * n)
            + {_WILSON_Z!r} * SQRT(
                (CAST(k AS DOUBLE) / n) * (1 - CAST(k AS DOUBLE) / n) / n
                + {_WILSON_Z2!r} / (4.0 * n * n)))
             / (1 + {_WILSON_Z2!r} / n) AS ci_high_raw
    FROM agg)
    SELECT n, k, rate,
           GREATEST(ci_low_raw, CAST(0 AS DOUBLE)) AS ci_low,
           LEAST(ci_high_raw, CAST(1 AS DOUBLE)) AS ci_high
    FROM raw
    """,
)
def wilson_conversion_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-level purchase-conversion rate with its Wilson 95% interval —
    the binomial CI dashboards should quote instead of the Wald interval
    (Wilson stays inside [0,1] and behaves at small n / extreme rates);
    the uncertainty companion to ``funnel_conversion``'s point rates and
    ``ab_test_lift_report``'s comparisons.

    Determinism: n and k are exact integers; z and z² are injected
    literals (z² folded in Python so no decimal-vs-double addition
    differs); every emitted double is the same closed-form expression of
    identical inputs on both engines — emitted RAW, no rounding call.

    Scale: one user-keyed aggregate (map-side combinable) + a 1-row
    reduction.
    """
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("user_id").agg(
        F.max(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0)
        ).alias("converted")
    )
    agg = per_user.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("converted").cast("bigint").alias("k"),
    )
    n = F.col("n")
    p = F.col("k").cast("double") / n
    half = F.lit(_WILSON_Z) * F.sqrt(
        p * (F.lit(1) - p) / n + F.lit(_WILSON_Z2) / (F.lit(4.0) * n * n)
    )
    center = p + F.lit(_WILSON_Z2) / (F.lit(2) * n)
    denom = F.lit(1) + F.lit(_WILSON_Z2) / n
    # clamp: the closed form can overshoot [0,1] by an ulp at k=0 / k=n
    return agg.select(
        "n",
        "k",
        p.alias("rate"),
        F.greatest((center - half) / denom, F.lit(0.0)).alias("ci_low"),
        F.least((center + half) / denom, F.lit(1.0)).alias("ci_high"),
    )


# --------------------------------------------------------------------------
# Peak concurrency (sweep line over sessions)
# --------------------------------------------------------------------------


@query(
    "peak_concurrency_daily",
    oracle="""
    WITH marks AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER w IS NULL
                       OR epoch_us(ts) - epoch_us(LAG(ts) OVER w)
                          > 1800000000
                  THEN 1 ELSE 0 END AS is_start
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)),
    sess AS (
      SELECT user_id,
             MIN(ts) AS s_start,
             MAX(ts) AS s_end
      FROM (SELECT user_id, ts,
                   SUM(is_start) OVER (PARTITION BY user_id
                                       ORDER BY ts ASC) AS sid
            FROM marks)
      GROUP BY user_id, sid),
    pts AS (
      SELECT s_start AS t, 1 AS delta FROM sess
      UNION ALL
      SELECT s_end + INTERVAL 1 MICROSECOND, -1 FROM sess),
    sweep AS (
      SELECT CAST(t AS DATE) AS day,
             SUM(delta) OVER (ORDER BY t ASC, delta DESC) AS live
      FROM pts)
    SELECT day, CAST(MAX(live) AS BIGINT) AS peak_concurrent_sessions
    FROM sweep GROUP BY day
    """,
)
def peak_concurrency_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per day via the classic SWEEP LINE:
    sessions (30-min gap rule, as `events_sessionize_gap`) become
    +1/-1 boundary marks, a single running sum over the time-ordered
    marks IS the live-session count, and the daily max is the capacity-
    planning headline ("size for peak, not average") that no
    per-interval GROUP BY can produce.

    Determinism: boundaries are exact µs instants; the sweep order is
    total ((t, delta desc) — a start and an end at the same instant count
    the session as live, matching the closed interval); counts exact.
    The end mark sits 1 µs after s_end so a session's final event
    instant is still covered.

    Scale: the sweep's global window runs over SESSION boundaries (two
    rows per session, far below event count); for fleet scale the same
    sweep shards by coarse time range with per-shard offsets carried
    forward — the standard distributed prefix-sum layout.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gap_us = F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
    marks = e.select(
        "user_id",
        "ts",
        F.when(
            F.lag("ts").over(w).isNull() | (gap_us > 1_800_000_000), 1
        )
        .otherwise(0)
        .alias("is_start"),
    )
    wsid = Window.partitionBy("user_id").orderBy(F.col("ts").asc())
    sess = (
        marks.withColumn("sid", F.sum("is_start").over(wsid))
        .groupBy("user_id", "sid")
        .agg(F.min("ts").alias("s_start"), F.max("ts").alias("s_end"))
    )
    pts = sess.select(
        F.col("s_start").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sess.select(
            (F.col("s_end") + F.expr("INTERVAL 1 MICROSECOND")).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    sweep = pts.select(
        F.col("t").cast("date").alias("day"),
        F.sum("delta")
        .over(Window.orderBy(F.col("t").asc(), F.col("delta").desc()))
        .alias("live"),
    )
    return sweep.groupBy("day").agg(
        F.max("live").cast("bigint").alias("peak_concurrent_sessions")
    )


# --------------------------------------------------------------------------
# Difference-in-differences readout
# --------------------------------------------------------------------------


@query(
    "diff_in_differences",
    oracle="""
    WITH mid AS (
      SELECT MIN(CAST(ts AS DATE)) + CAST(FLOOR(
               DATEDIFF('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
               / 2) AS INTEGER) AS m
      FROM events),
    cell AS (
      SELECT TRY_CAST(CONCAT('0x', SUBSTRING(
               MD5(CONCAT('ab1|', CAST(e.user_id AS VARCHAR))), 1, 15))
               AS BIGINT) % 2 AS arm,
             CAST(CAST(e.ts AS DATE) >= mid.m AS INTEGER) AS period,
             CAST(e.value AS DECIMAL(18,6)) AS v
      FROM events e CROSS JOIN mid
      WHERE e.event_type = 'purchase'),
    m AS (
      SELECT arm, period,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(v) AS DOUBLE) / COUNT(*) AS mu
      FROM cell GROUP BY 1, 2)
    SELECT t1.mu - t0.mu AS treat_delta,
           c1.mu - c0.mu AS control_delta,
           (t1.mu - t0.mu) - (c1.mu - c0.mu) AS did_estimate,
           t0.n AS n_t0, t1.n AS n_t1, c0.n AS n_c0, c1.n AS n_c1
    FROM (SELECT * FROM m WHERE arm = 1 AND period = 0) t0,
         (SELECT * FROM m WHERE arm = 1 AND period = 1) t1,
         (SELECT * FROM m WHERE arm = 0 AND period = 0) c0,
         (SELECT * FROM m WHERE arm = 0 AND period = 1) c1
    """,
)
def diff_in_differences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Difference-in-differences: mean purchase value change from the
    first to the second calendar half, treatment arm minus control arm
    (salted-md5 assignment, `ab_test_lift_report`'s split) — the
    quasi-experimental estimator used when randomization happens at
    rollout time and both groups share a trend; on this A/A split the
    estimate ≈ 0 (pinned), exactly what a placebo DiD should read.

    Determinism: cell means are decimal sums cast to double then ONE
    division (the `embedding_centroids` idiom); the estimate is raw
    arithmetic of identical doubles — no round call.  The period split
    derives from the data (calendar midpoint) as a 1-row broadcast.

    Scale: one scan into a 4-cell aggregate; everything downstream is
    4 rows.
    """
    e = load_table(spark, sf_dir, "events")
    mid = e.agg(
        F.date_add(
            F.min(F.to_date("ts")),
            F.floor(
                F.datediff(F.max(F.to_date("ts")), F.min(F.to_date("ts"))) / 2
            ).cast("int"),
        ).alias("m")
    )
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1|"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    cell = (
        e.filter(F.col("event_type") == "purchase")
        .crossJoin(F.broadcast(mid))
        .select(
            arm.alias("arm"),
            (F.to_date("ts") >= F.col("m")).cast("int").alias("period"),
            F.col("value").cast("decimal(18,6)").alias("v"),
        )
    )
    m = cell.groupBy("arm", "period").agg(
        F.count("*").cast("bigint").alias("n"),
        (F.sum("v").cast("double") / F.count("*")).alias("mu"),
    )

    def slot(a, p, tag):
        return m.filter((F.col("arm") == a) & (F.col("period") == p)).select(
            F.col("mu").alias(f"mu_{tag}"), F.col("n").alias(f"n_{tag}")
        )

    j = (
        slot(1, 0, "t0")
        .crossJoin(slot(1, 1, "t1"))
        .crossJoin(slot(0, 0, "c0"))
        .crossJoin(slot(0, 1, "c1"))
    )
    return j.select(
        (F.col("mu_t1") - F.col("mu_t0")).alias("treat_delta"),
        (F.col("mu_c1") - F.col("mu_c0")).alias("control_delta"),
        (
            (F.col("mu_t1") - F.col("mu_t0"))
            - (F.col("mu_c1") - F.col("mu_c0"))
        ).alias("did_estimate"),
        F.col("n_t0").alias("n_t0"),
        F.col("n_t1").alias("n_t1"),
        F.col("n_c0").alias("n_c0"),
        F.col("n_c1").alias("n_c1"),
    )


# --------------------------------------------------------------------------
# Bayesian-smoothed rates (Beta prior shrinkage)
# --------------------------------------------------------------------------

#: Beta(2, 8) prior — a 20% pseudo-rate over 10 pseudo-observations,
#: injected as integer literals (exact in every numeric system).
_BETA_A = 2
_BETA_B = 8


@query(
    "bayes_smoothed_return_rate",
    oracle=f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                  AS BIGINT) AS k
      FROM lineitem GROUP BY 1)
    SELECT l_partkey, n, k,
           CAST(k AS DOUBLE) / n AS raw_rate,
           CAST(k + {_BETA_A} AS DOUBLE) / (n + {_BETA_A + _BETA_B})
             AS smoothed_rate
    FROM per_part
    """,
)
def bayes_smoothed_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-part return rate with Beta({_BETA_A}, {_BETA_B}) posterior-mean
    smoothing — the empirical-Bayes shrinkage every ranking-by-rate
    system applies so a 1-of-1 return doesn't outrank 20-of-100
    (smoothed CTR, review scores, defect rates).  Low-n parts shrink
    toward the prior rate {_BETA_A / (_BETA_A + _BETA_B):.0%}; high-n
    parts keep their data (shrinkage-ordering pinned in tests).

    Determinism: counts exact; both rates are ONE double division of
    exact integers (prior folded as integer literals), emitted raw.

    Scale: one map-side-combining aggregate keyed by part.
    """
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0))
        .cast("bigint")
        .alias("k"),
    )
    return per_part.select(
        "l_partkey",
        "n",
        "k",
        (F.col("k").cast("double") / F.col("n")).alias("raw_rate"),
        (
            (F.col("k") + F.lit(_BETA_A)).cast("double")
            / (F.col("n") + F.lit(_BETA_A + _BETA_B))
        ).alias("smoothed_rate"),
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


# --------------------------------------------------------------------------
# Conditional path entropy (next-event predictability)
# --------------------------------------------------------------------------


@query(
    "path_conditional_entropy",
    oracle="""
    WITH seq AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS prev,
             event_type AS curr
      FROM events),
    c AS (
      SELECT prev, curr, COUNT(*) AS n
      FROM seq WHERE prev IS NOT NULL GROUP BY 1, 2),
    r AS (SELECT prev, SUM(n) AS rn FROM c GROUP BY 1)
    SELECT c.prev,
           CAST(r.rn AS BIGINT) AS n_transitions,
           CAST(SUM(CAST(ROUND(
             -(CAST(c.n AS DOUBLE) / r.rn)
               * LN(CAST(c.n AS DOUBLE) / r.rn) / LN(2), 9)
             AS DECIMAL(18,9))) AS DOUBLE) AS h_bits
    FROM c JOIN r ON r.prev = c.prev
    GROUP BY c.prev, r.rn
    """,
)
def path_conditional_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional next-event entropy H(next | prev) in bits per prior
    state — the predictability read on user journeys (low entropy after
    'click' = a deterministic funnel; high = exploratory behavior) that
    turns ``event_transition_matrix``'s probabilities into ONE comparable
    number per state, the same way ``token_entropy_filter`` scores
    documents.

    Determinism: transition counts are exact; each -p·log2(p) term is one
    double expression of identical integers (log2 via LN/LN(2) on both
    engines), rounded at 1e-9 then DECIMAL-summed — the repo's LN-term
    discipline (`survival_kaplan_meier`).

    Scale: one user-partitioned window, then everything is
    |types|²-bounded.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = e.select(
        F.lag("event_type").over(w).alias("prev"),
        F.col("event_type").alias("curr"),
    ).filter(F.col("prev").isNotNull())
    c = seq.groupBy("prev", "curr").agg(F.count("*").alias("n"))
    r = c.groupBy(F.col("prev").alias("r_prev")).agg(F.sum("n").alias("rn"))
    p = F.col("n").cast("double") / F.col("rn")
    term = F.round(-p * F.log(p) / F.log(F.lit(2.0)), 9).cast("decimal(18,9)")
    return (
        c.join(F.broadcast(r), F.col("prev") == F.col("r_prev"))
        .groupBy("prev", "rn")
        .agg(F.sum(term).cast("double").alias("h_bits"))
        .select(
            "prev",
            F.col("rn").cast("bigint").alias("n_transitions"),
            "h_bits",
        )
    )


# --------------------------------------------------------------------------
# Term burstiness (Church-Gale)
# --------------------------------------------------------------------------

_BURST_MIN_DF = 20


@query(
    "term_burstiness",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, UNNEST(LIST_FILTER(
               REGEXP_SPLIT_TO_ARRAY(text, '\\s+'), t -> t != '')) AS w
      FROM documents),
    per_doc AS (
      SELECT w, doc_id, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    stats AS (
      SELECT w,
             CAST(COUNT(*) AS BIGINT) AS df,
             CAST(SUM(tf) AS BIGINT) AS cf
      FROM per_doc GROUP BY 1
      HAVING COUNT(*) >= {_BURST_MIN_DF})
    SELECT w, df, cf,
           CAST(cf AS DOUBLE) / df AS burstiness
    FROM stats
    """,
)
def term_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Church-Gale term burstiness: collection frequency over document
    frequency per term — the mean occurrences WITHIN documents that
    contain the term.  Function words sit near 1x-per-mention-rate;
    topical/bursty terms repeat heavily once they appear — the signal IR
    models (and keyword-stuffing detectors) use beyond raw frequency,
    completing the term-statistics family around TF-IDF and
    ``cooccurrence_pmi``.

    Determinism: df/cf are exact integers; burstiness is one raw double
    division (no round call).  The df floor bounds the output to the
    shared vocabulary.

    Scale: explode → (term, doc) aggregate → term aggregate, all
    map-side combinable on uniform hash keys; never materializes a
    docs x vocab matrix.
    """
    from lms_etl_pipeline_spark.operators import text as tx

    d = load_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tx.tokens("text")).alias("w"))
    per_doc = tok.groupBy("w", "doc_id").agg(F.count("*").alias("tf"))
    stats = (
        per_doc.groupBy("w")
        .agg(
            F.count("*").cast("bigint").alias("df"),
            F.sum("tf").cast("bigint").alias("cf"),
        )
        .filter(F.col("df") >= _BURST_MIN_DF)
    )
    return stats.select(
        "w", "df", "cf", (F.col("cf").cast("double") / F.col("df")).alias("burstiness")
    )


# --------------------------------------------------------------------------
# Jackknife standard error of the daily mean
# --------------------------------------------------------------------------


@query(
    "jackknife_se_daily_mean",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(CAST(value AS DECIMAL(18,6))), 6) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2),
    tot AS (
      SELECT event_type,
             COUNT(*) AS n,
             CAST(SUM(CAST(x AS DECIMAL(18,6))) AS DOUBLE) AS s
      FROM daily GROUP BY 1),
    loo AS (
      SELECT d.event_type, t.n, t.s,
             (t.s - d.x) / (t.n - 1) AS mean_i
      FROM daily d JOIN tot t ON t.event_type = d.event_type
      WHERE t.n > 1)
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           MAX(s) / MAX(n) AS mean_daily,
           SQRT((CAST(MAX(n) - 1 AS DOUBLE) / MAX(n))
                * SUM(CAST(ROUND(
                    (mean_i - s / n) * (mean_i - s / n), 12)
                    AS DECIMAL(28,12)))) AS jackknife_se
    FROM loo GROUP BY event_type
    """,
)
def jackknife_se_daily_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jackknife standard error of each type's mean daily value —
    leave-one-day-out resampling made DETERMINISTIC and closed-form
    (mean_i = (S - x_i)/(n-1) needs only the total, no N re-aggregations)
    — the uncertainty bar dashboards should attach to "avg daily revenue"
    without bootstrap randomness; completes the inference family with
    `wilson_conversion_ci` (rates) and `ab_test_lift_report` (contrasts).

    Determinism: daily values and their total are exact decimals cast to
    double once; each squared deviation is one double expression rounded
    at 1e-12 then DECIMAL-summed; one final sqrt.

    Scale: calendar-sized after the first collapse; the leave-one-out
    terms come from a broadcast-join of the 1-row-per-type totals — n
    loo means from ONE pass, not n passes.
    """
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum(F.col("value").cast("decimal(18,6)")), 6)
        .cast("double")
        .alias("x")
    )
    tot = daily.groupBy(F.col("event_type").alias("t_et")).agg(
        F.count("*").alias("n"),
        F.sum(F.col("x").cast("decimal(18,6)")).cast("double").alias("s"),
    )
    loo = (
        daily.join(F.broadcast(tot), F.col("event_type") == F.col("t_et"))
        .filter(F.col("n") > 1)
        .select(
            "event_type",
            "n",
            "s",
            ((F.col("s") - F.col("x")) / (F.col("n") - 1)).alias("mean_i"),
        )
    )
    dev2 = F.round(
        (F.col("mean_i") - F.col("s") / F.col("n"))
        * (F.col("mean_i") - F.col("s") / F.col("n")),
        12,
    ).cast("decimal(28,12)")
    return loo.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        (F.max("s") / F.max("n")).alias("mean_daily"),
        F.sqrt(
            ((F.max("n") - 1).cast("double") / F.max("n")) * F.sum(dev2)
        ).alias("jackknife_se"),
    )


# --------------------------------------------------------------------------
# Mann-Whitney U (rank-sum) test between the A/B arms
# --------------------------------------------------------------------------


@query(
    "mann_whitney_arms",
    oracle="""
    WITH assign AS (
      SELECT user_id,
             TRY_CAST(CONCAT('0x', SUBSTRING(
               MD5(CONCAT('ab1|', CAST(user_id AS VARCHAR))), 1, 15))
               AS BIGINT) % 2 AS arm,
             CAST(SUM(CAST(value AS DECIMAL(18,6))) * 1000000 AS HUGEINT)
               AS s_fp
      FROM events WHERE event_type = 'purchase'
      GROUP BY 1),
    ranked AS (
      SELECT arm,
             -- average rank over ties: (min_rank + max_rank) / 2, exact
             -- half-integers via RANK + COUNT over the tie group
             CAST(RANK() OVER (ORDER BY s_fp ASC) AS DOUBLE)
               + (CAST(COUNT(*) OVER (PARTITION BY s_fp) AS DOUBLE) - 1) / 2
               AS r
      FROM assign),
    agg AS (
      SELECT
        CAST(SUM(CASE WHEN arm = 1 THEN CAST(r * 2 AS BIGINT) ELSE 0 END)
             AS BIGINT) AS r1_x2,
        CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
        CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0
      FROM ranked)
    SELECT n1, n0,
           CAST(r1_x2 AS DOUBLE) / 2 - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
             AS u_stat,
           (CAST(r1_x2 AS DOUBLE) / 2
              - CAST(n1 AS DOUBLE) * (n1 + 1) / 2
              - CAST(n1 AS DOUBLE) * n0 / 2)
             / SQRT(CAST(n1 AS DOUBLE) * n0 * (n1 + n0 + 1) / 12) AS z_approx
    FROM agg
    """,
)
def mann_whitney_arms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U (Wilcoxon rank-sum) between the salted-md5 A/B arms
    on per-user purchase spend — the NONPARAMETRIC two-sample test teams
    reach for when spend is skewed and t/Welch assumptions wobble;
    completes the experiment toolkit beside `ab_test_lift_report`
    (parametric), `ab_quantile_treatment_effect` (distributional), and
    `ks_test_drift` (the unpaired-distribution cousin).

    Determinism: spends are integer fixed point, so ranking is over exact
    integers; tie-averaged ranks are exact half-integers carried DOUBLED
    as integers through the sum (no .5 accumulates in float); U and the
    normal approximation z are raw closed-form doubles of exact integers
    (A/A split here, so z ≈ 0 — pinned).

    Scale: one user aggregate, one global sort-rank over users (the same
    shape as `quality_ranker_auc`'s rank layout), a 1-row reduction.
    """
    e = load_table(spark, sf_dir, "events")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("ab1|"), F.col("user_id").cast("string"))),
                1,
                15,
            ),
            16,
            10,
        ).cast("bigint")
        % 2
    )
    assign = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("spend"))
        .select(
            arm.alias("arm"),
            (F.col("spend") * 1_000_000).cast("decimal(38,0)").alias("s_fp"),
        )
    )
    wr = Window.orderBy(F.col("s_fp").asc())
    wt = Window.partitionBy("s_fp")
    ranked = assign.select(
        "arm",
        (
            F.rank().over(wr).cast("double")
            + (F.count("*").over(wt).cast("double") - F.lit(1)) / 2
        ).alias("r"),
    )
    agg = ranked.agg(
        F.sum(
            F.when(F.col("arm") == 1, (F.col("r") * 2).cast("bigint")).otherwise(
                F.lit(0)
            )
        )
        .cast("bigint")
        .alias("r1_x2"),
        F.sum(F.when(F.col("arm") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n1"),
        F.sum(F.when(F.col("arm") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n0"),
    )
    n1d = F.col("n1").cast("double")
    n0d = F.col("n0").cast("double")
    u = F.col("r1_x2").cast("double") / 2 - n1d * (F.col("n1") + 1) / 2
    z = (
        F.col("r1_x2").cast("double") / 2
        - n1d * (F.col("n1") + 1) / 2
        - n1d * n0d / 2
    ) / F.sqrt(n1d * n0d * (F.col("n1") + F.col("n0") + 1) / 12)
    return agg.select("n1", "n0", u.alias("u_stat"), z.alias("z_approx"))


# --------------------------------------------------------------------------
# One-way ANOVA across event types
# --------------------------------------------------------------------------


@query(
    "anova_f_event_types",
    oracle="""
    WITH g AS (
      SELECT event_type,
             COUNT(*) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS s1,
             SUM(CAST(value AS DECIMAL(18,6)) * CAST(value AS DECIMAL(18,6)))
               AS s2
      FROM events GROUP BY 1),
    tot AS (
      SELECT CAST(SUM(n) AS BIGINT) AS n_total,
             CAST(COUNT(*) AS BIGINT) AS k,
             CAST(ROUND(SUM(s1), 4) AS DOUBLE) AS st1,
             CAST(ROUND(SUM(s2), 4) AS DOUBLE) AS st2,
             CAST(SUM(CAST(ROUND(
               CAST(ROUND(s1, 4) AS DOUBLE) * CAST(ROUND(s1, 4) AS DOUBLE)
                 / n, 6)
               AS DECIMAL(28,6))) AS DOUBLE) AS sum_gsq
      FROM g)
    SELECT n_total, k,
           sum_gsq - st1 * st1 / n_total AS ss_between,
           st2 - sum_gsq AS ss_within,
           ((sum_gsq - st1 * st1 / n_total) / (k - 1))
             / ((st2 - sum_gsq) / (n_total - k)) AS f_stat
    FROM tot
    """,
)
def anova_f_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA: does mean event value differ across event types?
    F = (SS_between/(k-1)) / (SS_within/(n-k)) from per-group exact
    decimal moments — the k-group generalization of
    ``ab_test_lift_report``'s two-sample contrast, and the screening test
    run before per-pair drilldowns.

    Determinism: group moments are exact decimals rounded at scale 4
    before any double cast (the `dec_sum_of` 2^53 discipline — the
    scale-12 squared sums overflow the exactly-convertible range
    otherwise); the one non-mergeable
    term (sum of squared-group-total/n) rounds each group's double at
    1e-6 then DECIMAL-sums (order-independent over k groups); F is raw
    closed-form arithmetic of those identical doubles.

    Scale: one map-side-combining aggregate keyed by type, then a k-row
    reduction — no second scan.
    """
    e = load_table(spark, sf_dir, "events")
    d6 = F.col("value").cast("decimal(18,6)")
    g = e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(d6).alias("s1"),
        F.sum(d6 * d6).alias("s2"),
    )
    s1d = F.round(F.col("s1"), 4).cast("double")
    gsq = F.round(s1d * s1d / F.col("n"), 6).cast("decimal(28,6)")
    tot = g.agg(
        F.sum("n").cast("bigint").alias("n_total"),
        F.count("*").cast("bigint").alias("k"),
        F.round(F.sum("s1"), 4).cast("double").alias("st1"),
        F.round(F.sum("s2"), 4).cast("double").alias("st2"),
        F.sum(gsq).cast("double").alias("sum_gsq"),
    )
    ssb = F.col("sum_gsq") - F.col("st1") * F.col("st1") / F.col("n_total")
    ssw = F.col("st2") - F.col("sum_gsq")
    f = (ssb / (F.col("k") - 1)) / (ssw / (F.col("n_total") - F.col("k")))
    return tot.select(
        "n_total",
        "k",
        ssb.alias("ss_between"),
        ssw.alias("ss_within"),
        f.alias("f_stat"),
    )


# --------------------------------------------------------------------------
# Decision-stump split gain (Gini impurity screening)
# --------------------------------------------------------------------------


@query(
    "stump_split_gain",
    oracle="""
    WITH pts AS (
      SELECT CAST(l_quantity AS BIGINT) AS q,
             CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
      FROM lineitem),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS pos
      FROM pts),
    per_q AS (
      SELECT q, COUNT(*) AS cn, SUM(y) AS cpos FROM pts GROUP BY q),
    cum AS (
      SELECT q,
             SUM(cn) OVER (ORDER BY q ASC) AS ln,
             SUM(cpos) OVER (ORDER BY q ASC) AS lpos
      FROM per_q),
    gains AS (
      SELECT c.q AS split_le, t.n, t.pos, c.ln, c.lpos,
             -- gini(parent) - weighted gini(children), all raw doubles
             (1 - (CAST(t.pos AS DOUBLE) / t.n) * (CAST(t.pos AS DOUBLE) / t.n)
                - (1 - CAST(t.pos AS DOUBLE) / t.n)
                  * (1 - CAST(t.pos AS DOUBLE) / t.n))
             - (CAST(c.ln AS DOUBLE) / t.n)
               * (1 - (CAST(c.lpos AS DOUBLE) / c.ln) * (CAST(c.lpos AS DOUBLE) / c.ln)
                    - (1 - CAST(c.lpos AS DOUBLE) / c.ln)
                      * (1 - CAST(c.lpos AS DOUBLE) / c.ln))
             - (CAST(t.n - c.ln AS DOUBLE) / t.n)
               * (1 - (CAST(t.pos - c.lpos AS DOUBLE) / (t.n - c.ln))
                      * (CAST(t.pos - c.lpos AS DOUBLE) / (t.n - c.ln))
                    - (1 - CAST(t.pos - c.lpos AS DOUBLE) / (t.n - c.ln))
                      * (1 - CAST(t.pos - c.lpos AS DOUBLE) / (t.n - c.ln)))
               AS gain
      FROM cum c CROSS JOIN tot t
      WHERE c.ln < t.n)
    SELECT split_le,
           CAST(ln AS BIGINT) AS n_left,
           CAST(lpos AS BIGINT) AS pos_left,
           gain
    FROM gains
    """,
)
def stump_split_gain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decision-stump screening: Gini-impurity gain of every candidate
    split "quantity <= q" for predicting a return — the single-feature
    split scan inside every tree learner, and the cheap feature-
    importance probe analysts run before modeling ("does quantity
    predict returns at all?").  All candidate splits come from ONE
    cumulative pass over the value domain (the `ks_test_drift` CDF
    layout), not one scan per threshold.

    Determinism: class counts are exact integers; each gain is one raw
    closed-form double expression of identical integers (no rounding
    call).  Gain nonnegativity at the argmax and the
    no-information-split=0 case are pinned in tests.

    Scale: the fact table collapses to the (value, class) histogram
    first; the cumulative window runs over the |distinct values| domain
    with a 1-row totals broadcast.
    """
    li = load_table(spark, sf_dir, "lineitem")
    pts = li.select(
        F.col("l_quantity").cast("bigint").alias("q"),
        F.when(F.col("l_returnflag") == "R", 1).otherwise(0).alias("y"),
    )
    tot = pts.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("pos"),
    )
    per_q = pts.groupBy("q").agg(
        F.count("*").alias("cn"), F.sum("y").alias("cpos")
    )
    w = Window.orderBy(F.col("q").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = per_q.select(
        "q",
        F.sum("cn").over(w).alias("ln"),
        F.sum("cpos").over(w).alias("lpos"),
    )

    def gini(p):
        return F.lit(1) - p * p - (F.lit(1) - p) * (F.lit(1) - p)

    c = cum.crossJoin(F.broadcast(tot)).filter(F.col("ln") < F.col("n"))
    p_parent = F.col("pos").cast("double") / F.col("n")
    p_left = F.col("lpos").cast("double") / F.col("ln")
    p_right = (F.col("pos") - F.col("lpos")).cast("double") / (
        F.col("n") - F.col("ln")
    )
    gain = (
        gini(p_parent)
        - (F.col("ln").cast("double") / F.col("n")) * gini(p_left)
        - ((F.col("n") - F.col("ln")).cast("double") / F.col("n")) * gini(p_right)
    )
    return c.select(
        F.col("q").alias("split_le"),
        F.col("ln").cast("bigint").alias("n_left"),
        F.col("lpos").cast("bigint").alias("pos_left"),
        gain.alias("gain"),
    )


# --------------------------------------------------------------------------
# Weekday x hour activity heatmap
# --------------------------------------------------------------------------


@query(
    "weekday_hour_heatmap",
    oracle="""
    WITH cell AS (
      SELECT ISODOW(CAST(ts AS DATE)) AS weekday,
             EXTRACT(HOUR FROM ts) AS hour,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    tot AS (SELECT SUM(n) AS t FROM cell)
    SELECT CAST(c.weekday AS INTEGER) AS weekday,
           CAST(c.hour AS INTEGER) AS hour,
           CAST(c.n AS BIGINT) AS n_events,
           CAST(CAST(c.n AS HUGEINT) * 1000000 // t.t AS DOUBLE) / 1000000.0
             AS share
    FROM cell c CROSS JOIN tot t
    """,
)
def weekday_hour_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (ISO weekday x hour) activity heatmap with each cell's share of
    total traffic — the ops "when are we busy" front page, combining the
    two calendar axes `timeseries_seasonal_profile` (hour) and
    `seasonal_index_weekly` (weekday) read separately; at most 168 cells
    at any fleet size.

    Determinism: counts exact; shares are floored micro fixed point (the
    repo's no-ROUND `div` discipline) with one power-of-ten double
    division.

    Scale: one map-side-combining aggregate on a bounded key + a 1-row
    total broadcast.
    """
    e = load_table(spark, sf_dir, "events")
    cell = e.groupBy(
        (F.weekday(F.to_date("ts")) + 1).alias("weekday"),
        F.hour("ts").alias("hour"),
    ).agg(F.count("*").alias("n"))
    tot = cell.agg(F.sum("n").alias("t"))
    return cell.crossJoin(F.broadcast(tot)).select(
        F.col("weekday").cast("int").alias("weekday"),
        F.col("hour").cast("int").alias("hour"),
        F.col("n").cast("bigint").alias("n_events"),
        (
            F.expr(
                "CAST((CAST(n AS DECIMAL(38,0)) * 1000000) div t AS BIGINT)"
            ).cast("double")
            / 1_000_000.0
        ).alias("share"),
    )
