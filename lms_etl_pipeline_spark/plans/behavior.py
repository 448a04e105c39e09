"""Behavioral / recommender analytics plans (round 5b widening).

Composites product-analytics and recommendation teams run daily that
were not yet first-class.  The first wave:

- **item-item collaborative filtering** (``item_cooccurrence_cf``) — parts
  scored similar by customer co-purchase cosine, top-k per item: the
  classic "customers who bought X also bought" candidate generator
  (Amazon-style item-based CF over binary incidence vectors);
- **Markov transition matrix** (``event_transition_matrix``) — per-user
  event-type transition counts + row-normalized probabilities: the
  behavioral flow map behind path analysis and next-action prediction;
- **cohort LTV curve** (``cohort_ltv_curve``) — cumulative purchase value
  by acquisition cohort and day offset, with per-user LTV: the
  growth-finance twin of the retention triangle;
- **funnel time-to-convert** (``funnel_time_to_convert``) — per-user
  stage-gap durations for the strict view→click→purchase funnel, in exact
  epoch-microsecond integers.

Later waves in this module: HITS hubs/authorities, forward as-of join,
2-D Pareto front, A/B experiment readout, share-of-parent rollup,
DAU/WAU/MAU rolling counters, and top event-trigram paths.

Reference parity note: the reference (`/root/reference/src/lms_to_s3_lambda.py`,
`src/s3_to_rds_lambda.py`) is a 2-file pandas ETL with no analytics layer;
these extend the driver-mandated SURVEY.md §2.12 engine surface.

Determinism: counts/durations are exact integers, money goes through
exact DECIMAL sums (``functions/numeric.py``), emitted ratios are single
rounded double divisions of identical exact operands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from lms_etl_pipeline_spark.operators.rank import (
    global_ntile,
    global_running_agg,
    with_uniform_key_buckets,
)
from lms_etl_pipeline_spark.plans import anchors
from lms_etl_pipeline_spark.plans.catalog import query
from lms_etl_pipeline_spark.sources.tables import load_table

_CF_BASKET_CAP = 50   # drop power-customers above this many distinct parts
_CF_MIN_COOC = 3      # minimum co-purchase support for a candidate pair
_CF_TOPK = 5


@query(
    "item_cooccurrence_cf",
    oracle=f"""
    WITH cp AS (
      SELECT DISTINCT o.o_custkey, l.l_partkey
      FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
    sz AS (SELECT o_custkey, COUNT(*) AS basket FROM cp GROUP BY o_custkey),
    kept AS (
      SELECT cp.o_custkey, cp.l_partkey FROM cp
      JOIN sz ON sz.o_custkey = cp.o_custkey AND sz.basket <= {_CF_BASKET_CAP}),
    item_n AS (SELECT l_partkey, COUNT(*) AS n FROM kept GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_ab
      FROM kept a JOIN kept b
        ON a.o_custkey = b.o_custkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2 HAVING COUNT(*) >= {_CF_MIN_COOC}),
    directed AS (
      SELECT p1 AS item, p2 AS other, n_ab FROM pairs
      UNION ALL SELECT p2, p1, n_ab FROM pairs),
    scored AS (
      SELECT d.item, d.other, CAST(d.n_ab AS BIGINT) AS n_ab,
             ROUND(CAST(d.n_ab AS DOUBLE) / SQRT(CAST(na.n AS DOUBLE) * nb.n), 6)
                 AS cosine
      FROM directed d
      JOIN item_n na ON na.l_partkey = d.item
      JOIN item_n nb ON nb.l_partkey = d.other),
    ranked AS (
      SELECT item, other, n_ab, cosine,
             ROW_NUMBER() OVER (PARTITION BY item
                                ORDER BY cosine DESC, other) AS rk
      FROM scored)
    SELECT item, other, n_ab, cosine, rk FROM ranked WHERE rk <= {_CF_TOPK}
    """,
)
def item_cooccurrence_cf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-based collaborative filtering: for every part, the top-{5}
    most-similar parts by customer co-purchase cosine
    n_ab / sqrt(n_a·n_b) over binary customer-incidence vectors — the
    "customers who bought X also bought" candidate generator
    (Linden et al. 2003, item-to-item CF).

    Scale: pairing is an EQUI-join of baskets on the customer key, so work
    is Σ basket², not catalog²; the basket cap (≤ {50} distinct parts,
    power-customers dropped — the standard CF hygiene rule, documented
    semantics not an approximation) makes per-key work O(cap²)-bounded so
    no customer can quadratically dominate a partition.  Min-support
    prunes the pair table before the similarity join; per-item top-k is a
    window on the ITEM key.  The item_n side joins are broadcastable
    (catalog-sized).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    cp = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select("o_custkey", "l_partkey")
        .distinct()
    )
    sz = cp.groupBy("o_custkey").agg(F.count("*").alias("basket"))
    kept = cp.join(
        sz.filter(F.col("basket") <= _CF_BASKET_CAP).select("o_custkey"),
        "o_custkey",
    )
    item_n = kept.groupBy("l_partkey").agg(F.count("*").alias("n"))
    a = kept.select("o_custkey", F.col("l_partkey").alias("p1"))
    b = kept.select("o_custkey", F.col("l_partkey").alias("p2"))
    pairs = (
        a.join(b, "o_custkey")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count("*").alias("n_ab"))
        .filter(F.col("n_ab") >= _CF_MIN_COOC)
    )
    directed = pairs.select(
        F.col("p1").alias("item"), F.col("p2").alias("other"), "n_ab"
    ).unionByName(
        pairs.select(
            F.col("p2").alias("item"), F.col("p1").alias("other"), "n_ab"
        )
    )
    na = item_n.select(F.col("l_partkey").alias("item"), F.col("n").alias("na"))
    nb = item_n.select(F.col("l_partkey").alias("other"), F.col("n").alias("nb"))
    scored = (
        directed.join(F.broadcast(na), "item")
        .join(F.broadcast(nb), "other")
        .select(
            "item",
            "other",
            F.col("n_ab").cast("bigint").alias("n_ab"),
            F.round(
                F.col("n_ab").cast("double")
                / F.sqrt(F.col("na").cast("double") * F.col("nb")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(F.col("cosine").desc(), "other")
    return scored.select(
        "item", "other", "n_ab", "cosine", F.row_number().over(w).alias("rk")
    ).filter(F.col("rk") <= _CF_TOPK)


@query(
    "event_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS prev_type
      FROM events),
    trans AS (
      SELECT prev_type, event_type AS next_type, COUNT(*) AS n
      FROM seq WHERE prev_type IS NOT NULL
      GROUP BY prev_type, next_type),
    totals AS (SELECT prev_type, SUM(n) AS row_n FROM trans GROUP BY prev_type)
    SELECT t.prev_type, t.next_type, CAST(t.n AS BIGINT) AS n,
           ROUND(CAST(t.n AS DOUBLE) / tt.row_n, 6) AS p
    FROM trans t JOIN totals tt USING (prev_type)
    """,
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    ordered (previous event type → next event type) pair, the transition
    count and row-normalized probability — the behavioral flow map behind
    path analysis, "next best action" features, and anomaly detection on
    session shape.

    Determinism: the sequence order is (ts, event_id) — a total order —
    so LAG is deterministic; counts exact; p is one rounded division.

    Scale: one window partitioned on user_id (the natural event-stream
    partitioning — single shuffle), a map-side-combining count on the
    bounded |types|² key space, and a broadcast row-total join.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    ).filter(F.col("prev_type").isNotNull())
    trans = seq.groupBy(
        "prev_type", F.col("event_type").alias("next_type")
    ).agg(F.count("*").alias("n"))
    totals = trans.groupBy("prev_type").agg(F.sum("n").alias("row_n"))
    return trans.join(F.broadcast(totals), "prev_type").select(
        "prev_type",
        "next_type",
        F.col("n").cast("bigint").alias("n"),
        F.round(F.col("n").cast("double") / F.col("row_n"), 6).alias("p"),
    )


@query(
    "cohort_ltv_curve",
    oracle="""
    WITH f AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    csize AS (SELECT cohort_day, COUNT(*) AS cohort_users
              FROM f GROUP BY cohort_day),
    pur AS (
      SELECT f.cohort_day,
             DATEDIFF('day', f.cohort_day, CAST(e.ts AS DATE)) AS day_offset,
             COUNT(*) AS n_purchases,
             SUM(CAST(e.value AS DECIMAL(18,6))) AS rev_dec
      FROM events e JOIN f ON f.user_id = e.user_id
      WHERE e.event_type = 'purchase'
      GROUP BY 1, 2),
    cum AS (
      SELECT cohort_day, day_offset, n_purchases,
             SUM(rev_dec) OVER (PARTITION BY cohort_day ORDER BY day_offset
                                ROWS UNBOUNDED PRECEDING) AS cum_dec,
             rev_dec
      FROM pur)
    SELECT c.cohort_day, CAST(c.day_offset AS BIGINT) AS day_offset,
           CAST(c.n_purchases AS BIGINT) AS n_purchases,
           CAST(ROUND(c.rev_dec, 4) AS DOUBLE) AS revenue,
           CAST(ROUND(c.cum_dec, 4) AS DOUBLE) AS cum_revenue,
           CAST(s.cohort_users AS BIGINT) AS cohort_users,
           ROUND(CAST(ROUND(c.cum_dec, 4) AS DOUBLE) / s.cohort_users, 6)
               AS ltv_per_user
    FROM cum c JOIN csize s USING (cohort_day)
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: users bucketed by first-activity day,
    then per (cohort, day-offset) purchase count, revenue, running
    cumulative revenue, and cumulative LTV per cohort member — the
    growth-finance table payback-period decisions read from (the money
    twin of ``retention_cohorts``).

    Determinism: revenue is summed in exact DECIMAL, the running total is
    a window over the exact decimal, and both are rounded once at scale 4
    before the double cast; ltv divides that identical double by an exact
    integer.

    Scale: cohort assignment is one user-keyed min-aggregate joined back
    on the same key (partitioning reused); the curve aggregate is keyed by
    (cohort_day, offset) — bounded by days², not events; the running sum
    windows over the CURVE table (report-sized), not the event stream.
    """
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    csize = f.groupBy("cohort_day").agg(F.count("*").alias("cohort_users"))
    pur = (
        e.filter(F.col("event_type") == "purchase")
        .join(f, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), "cohort_day").alias("day_offset"),
        )
        .agg(
            F.count("*").alias("n_purchases"),
            F.sum(F.col("value").cast("decimal(18,6)")).alias("rev_dec"),
        )
    )
    w = (
        Window.partitionBy("cohort_day")
        .orderBy("day_offset")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = pur.select(
        "cohort_day",
        "day_offset",
        "n_purchases",
        "rev_dec",
        F.sum("rev_dec").over(w).alias("cum_dec"),
    )
    return cum.join(F.broadcast(csize), "cohort_day").select(
        "cohort_day",
        F.col("day_offset").cast("bigint").alias("day_offset"),
        F.col("n_purchases").cast("bigint").alias("n_purchases"),
        F.round("rev_dec", 4).cast("double").alias("revenue"),
        F.round("cum_dec", 4).cast("double").alias("cum_revenue"),
        F.col("cohort_users").cast("bigint").alias("cohort_users"),
        F.round(
            F.round("cum_dec", 4).cast("double") / F.col("cohort_users"), 6
        ).alias("ltv_per_user"),
    )


@query(
    "funnel_time_to_convert",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t1 FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t2
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t3
      FROM events e JOIN c ON c.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
    SELECT p.user_id,
           EPOCH_US(c.t2) - EPOCH_US(v.t1) AS us_view_to_click,
           EPOCH_US(p.t3) - EPOCH_US(c.t2) AS us_click_to_purchase,
           EPOCH_US(p.t3) - EPOCH_US(v.t1) AS us_total
    FROM p JOIN c ON c.user_id = p.user_id JOIN v ON v.user_id = p.user_id
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert for full-funnel users: per user completing the
    strict view→click→purchase sequence, the stage-gap durations in exact
    epoch microseconds — the latency distribution behind "how long does
    conversion take" and funnel-SLA dashboards (detail-table complement of
    ``funnel_conversion``'s stage counts).

    Determinism: all columns are integer microsecond differences of
    exact MIN timestamps — no floats anywhere.

    Scale: identical chained user-keyed aggregate shape as
    ``funnel_conversion`` (one partitioning reused end-to-end); the final
    three-way join is on the same user key and frames only shrink.
    """
    e = load_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    return (
        p.join(c, "user_id")
        .join(v, "user_id")
        .select(
            "user_id",
            (F.unix_micros("t2") - F.unix_micros("t1")).alias(
                "us_view_to_click"
            ),
            (F.unix_micros("t3") - F.unix_micros("t2")).alias(
                "us_click_to_purchase"
            ),
            (F.unix_micros("t3") - F.unix_micros("t1")).alias("us_total"),
        )
    )


# --------------------------------------------------------------------------
# HITS hubs & authorities (2 unrolled iterations)
# --------------------------------------------------------------------------


@query(
    "hits_hubs_authorities",
    oracle="""
    WITH edges AS (
      SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS src,
                      's' || CAST(l_suppkey AS VARCHAR) AS dst
      FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
    a1 AS (SELECT dst AS node, CAST(COUNT(*) AS DOUBLE) AS a FROM edges
           GROUP BY dst),
    a1n AS (SELECT node, a / (SELECT SUM(CAST(a AS DECIMAL(38,12))) FROM a1)
                AS a FROM a1),
    h1 AS (
      SELECT e.src AS node,
             CAST(SUM(CAST(a1n.a AS DECIMAL(38,12))) AS DOUBLE) AS h
      FROM edges e JOIN a1n ON a1n.node = e.dst GROUP BY e.src),
    h1n AS (SELECT node, h / (SELECT CAST(SUM(CAST(h AS DECIMAL(38,12)))
                                     AS DOUBLE) FROM h1) AS h FROM h1),
    a2 AS (
      SELECT e.dst AS node,
             CAST(SUM(CAST(h1n.h AS DECIMAL(38,12))) AS DOUBLE) AS a
      FROM edges e JOIN h1n ON h1n.node = e.src GROUP BY e.dst),
    a2n AS (SELECT node, a / (SELECT CAST(SUM(CAST(a AS DECIMAL(38,12)))
                                     AS DOUBLE) FROM a2) AS a FROM a2)
    SELECT node, 'hub' AS role, ROUND(h, 8) AS score FROM h1n
    UNION ALL
    SELECT node, 'authority', ROUND(a, 8) FROM a2n
    """,
)
def hits_hubs_authorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HITS (Kleinberg) hubs-and-authorities over the bipartite
    customer→supplier order-flow graph, two unrolled iterations with L1
    normalization: authority ← Σ hub over in-edges, hub ← Σ authority over
    out-edges.  The mutually-reinforcing-centrality complement of
    ``pagerank_graph`` (same edge table, different fixpoint) — the signal
    web-curation stacks compute next to PageRank for spam/quality triage.

    Determinism: iteration sums and the L1 normalizers are DECIMAL(38,12)-
    cast (order-independent); each normalization is one double division of
    identical operands; emitted scores rounded at scale 8.

    Scale: one iteration = edges ⋈ scores equi-join on one endpoint +
    map-side-combining sum on the other — edges partition once per
    direction and iterations reuse it; normalizers are 1-row broadcasts.
    Unrolled fixed iterations keep it a single declarative plan (the
    open-ended variant would localCheckpoint per iteration like
    ``operators/ml.py``).
    """
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
        )
        .distinct()
    )
    dec = lambda c: F.sum(c.cast("decimal(38,12)")).cast("double")  # noqa: E731
    a1 = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").cast("double").alias("a")
    )
    s_a1 = a1.agg(F.sum(F.col("a").cast("decimal(38,12)")).alias("s"))
    a1n = a1.crossJoin(F.broadcast(s_a1)).select(
        "node", (F.col("a") / F.col("s")).alias("a")
    )
    h1 = (
        edges.join(a1n.withColumnRenamed("node", "dst"), "dst")
        .groupBy(F.col("src").alias("node"))
        .agg(dec(F.col("a")).alias("h"))
    )
    s_h1 = h1.agg(dec(F.col("h")).alias("s"))
    h1n = h1.crossJoin(F.broadcast(s_h1)).select(
        "node", (F.col("h") / F.col("s")).alias("h")
    )
    a2 = (
        edges.join(h1n.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(dec(F.col("h")).alias("a"))
    )
    s_a2 = a2.agg(dec(F.col("a")).alias("s"))
    a2n = a2.crossJoin(F.broadcast(s_a2)).select(
        "node", (F.col("a") / F.col("s")).alias("a")
    )
    hubs = h1n.select(
        "node", F.lit("hub").alias("role"), F.round("h", 8).alias("score")
    )
    auths = a2n.select(
        "node", F.lit("authority").alias("role"), F.round("a", 8).alias("score")
    )
    return hubs.unionByName(auths)


# --------------------------------------------------------------------------
# Forward as-of join: time to next action
# --------------------------------------------------------------------------


@query(
    "join_asof_next_purchase",
    oracle="""
    WITH purchases AS (
      SELECT user_id, ts, MIN(event_id) AS purchase_id
      FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts),
    clicks AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
    SELECT c.event_id, c.user_id, c.ts,
           p.ts AS asof_ts, p.purchase_id
    FROM clicks c ASOF LEFT JOIN purchases p
      ON c.user_id = p.user_id AND c.ts <= p.ts
    """,
)
def join_asof_next_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each click matched to the same user's EARLIEST
    purchase at-or-after it — the "time to next action" primitive
    (conversion-latency attribution, next-maintenance-window lookup),
    completing the as-of family next to the backward
    ``join_asof_last_click``.

    Implementation is the same union–sort–window idiom
    (``operators.temporal.asof_join``) scanning the per-key timeline
    DESCENDING: one shuffle on user_id, no range-candidate explosion.
    The right side is deduped on (key, ts) with MIN(event_id) so ties are
    deterministic on both engines.
    """
    from lms_etl_pipeline_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("purchase_id"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts"
    )
    return asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["purchase_id"],
        direction="forward",
    )


# --------------------------------------------------------------------------
# 2-D Pareto front (skyline)
# --------------------------------------------------------------------------


@query(
    "pareto_front_2d",
    oracle="""
    WITH per_price AS (
      SELECT o_totalprice, MAX(o_orderdate) AS dmax
      FROM orders GROUP BY o_totalprice),
    ranked AS (
      SELECT o_totalprice, dmax,
             MAX(dmax) OVER (ORDER BY o_totalprice
                             ROWS BETWEEN UNBOUNDED PRECEDING
                                      AND 1 PRECEDING) AS mprev
      FROM per_price)
    SELECT o.o_orderkey, o.o_totalprice, o.o_orderdate
    FROM orders o JOIN ranked r ON r.o_totalprice = o.o_totalprice
    WHERE NOT (COALESCE(r.mprev >= o.o_orderdate, FALSE)
               OR r.dmax > o.o_orderdate)
    """,
)
def pareto_front_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D Pareto front (skyline operator): the non-dominated orders under
    (minimize price, maximize recency) — an order is dominated if another
    is at most as expensive AND at least as recent, strictly better in one.
    The classic multi-criteria shortlist ("cheapest-and-freshest") that
    SQL engines without a SKYLINE keyword express exactly this way.

    Implementation: collapse to one row per distinct price (MAX date),
    one running-max window over the price-ordered summary gives the best
    date among STRICTLY cheaper rows, and dominance is two exact
    comparisons — O(n log n) total, versus the naive quadratic
    self-join.  Determinism: raw-value comparisons only, no arithmetic.

    Scale: the window runs over the DISTINCT-PRICE summary, not the order
    table — but that summary still grows with the value domain, so the
    running max uses the two-stage prefix pattern FOR REAL
    (operators/rank.py ``global_running_agg`` with max over
    ``with_uniform_key_buckets(o_totalprice)``): partitioned within-bucket
    prefix maxima + a <=66-row broadcast bucket-prefix table, no
    single-partition stage.
    """
    o = load_table(spark, sf_dir, "orders")
    per_price = with_uniform_key_buckets(
        o.groupBy("o_totalprice").agg(F.max("o_orderdate").alias("dmax")),
        "o_totalprice",
    )
    ranked = global_running_agg(
        per_price,
        "dmax",
        [F.col("o_totalprice").asc()],
        F.col("_gbk"),
        out_col="mprev",
        agg="max",
        inclusive=False,
    ).select("o_totalprice", "dmax", "mprev")
    dominated = F.coalesce(
        F.col("mprev") >= F.col("o_orderdate"), F.lit(False)
    ) | (F.col("dmax") > F.col("o_orderdate"))
    return (
        o.join(ranked, "o_totalprice")
        .filter(~dominated)
        .select("o_orderkey", "o_totalprice", "o_orderdate")
    )


# --------------------------------------------------------------------------
# A/B test lift report
# --------------------------------------------------------------------------


@query(
    "ab_test_lift_report",
    oracle="""
    WITH assign AS (
      SELECT DISTINCT user_id,
             CASE WHEN TRY_CAST(CONCAT('0x',
                    SUBSTRING(MD5(CONCAT('ab1|', CAST(user_id AS VARCHAR))),
                              1, 15)) AS BIGINT) % 2 = 0
                  THEN 'A' ELSE 'B' END AS variant
      FROM events),
    per_user AS (
      SELECT a.user_id, a.variant,
             COALESCE(p.spend, CAST(0 AS DECIMAL(18,6))) AS spend
      FROM assign a LEFT JOIN (
        SELECT user_id, SUM(CAST(value AS DECIMAL(18,6))) AS spend
        FROM events WHERE event_type = 'purchase' GROUP BY user_id) p
      ON a.user_id = p.user_id),
    cells AS (
      SELECT variant,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(spend) AS DOUBLE) AS s1,
             CAST(SUM(spend * spend) AS DOUBLE) AS s2
      FROM per_user GROUP BY variant),
    wide AS (
      SELECT
        MAX(CASE WHEN variant = 'A' THEN n END) AS n_a,
        MAX(CASE WHEN variant = 'A' THEN s1 END) AS s1_a,
        MAX(CASE WHEN variant = 'A' THEN s2 END) AS s2_a,
        MAX(CASE WHEN variant = 'B' THEN n END) AS n_b,
        MAX(CASE WHEN variant = 'B' THEN s1 END) AS s1_b,
        MAX(CASE WHEN variant = 'B' THEN s2 END) AS s2_b
      FROM wide_src),
    wide_src AS (SELECT * FROM cells)
    SELECT n_a, n_b,
           ROUND(s1_a / n_a, 6) AS mean_a,
           ROUND(s1_b / n_b, 6) AS mean_b,
           ROUND(s1_b / n_b / (s1_a / n_a) - 1, 6) AS lift,
           ROUND((s1_b / n_b - s1_a / n_a)
                 / SQRT(((s2_a - s1_a * s1_a / n_a) / (n_a - 1)) / n_a
                        + ((s2_b - s1_b * s1_b / n_b) / (n_b - 1)) / n_b), 4)
               AS z_stat
    FROM wide
    """,
)
def ab_test_lift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout on a CONTINUOUS metric: users
    deterministically hash-assigned to two arms (salted md5 — the
    reproducible, engine-portable bucketing experimentation platforms use
    instead of rand()), per-arm mean purchase spend per user, relative
    lift, and the Welch two-sample z statistic — the growth-team
    experiment report (here a synthetic A/A split, so lift ≈ 0 and |z|
    small, exactly what an A/A sanity run should show; a binary
    conversion readout is degenerate on these fixtures because every
    user purchases).

    Determinism: per-user spend and both moment sums are exact DECIMAL;
    means/variances/z are IEEE arithmetic over identical doubles, rounded.

    Scale: one user-keyed aggregate + a 2-key rollup of decimal moments
    (mergeable, map-side combining) — no windows, no skew exposure
    beyond the user key.
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
    assign = e.select("user_id").distinct().select(
        "user_id", F.when(bucket == 0, "A").otherwise("B").alias("variant")
    )
    spend = (
        e.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.col("value").cast("decimal(18,6)")).alias("spend"))
    )
    per_user = assign.join(spend, "user_id", "left").select(
        "variant",
        F.coalesce("spend", F.lit(0).cast("decimal(18,6)")).alias("spend"),
    )
    cells = per_user.groupBy("variant").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("spend").cast("double").alias("s1"),
        F.sum(F.col("spend") * F.col("spend")).cast("double").alias("s2"),
    )
    wide = cells.agg(
        F.max(F.when(F.col("variant") == "A", F.col("n"))).alias("n_a"),
        F.max(F.when(F.col("variant") == "A", F.col("s1"))).alias("s1_a"),
        F.max(F.when(F.col("variant") == "A", F.col("s2"))).alias("s2_a"),
        F.max(F.when(F.col("variant") == "B", F.col("n"))).alias("n_b"),
        F.max(F.when(F.col("variant") == "B", F.col("s1"))).alias("s1_b"),
        F.max(F.when(F.col("variant") == "B", F.col("s2"))).alias("s2_b"),
    )
    # try_divide throughout: a single-user arm (n=1) zeroes the n-1
    # variance denominator, and a missing arm NULLs its count — degenerate
    # experiments must report NULL statistics, not ANSI-abort the job
    # (found by the n=1 fixture sweep; tests/test_degenerate_fixture.py).
    ma = F.try_divide(F.col("s1_a"), F.col("n_a"))
    mb = F.try_divide(F.col("s1_b"), F.col("n_b"))
    va = F.try_divide(
        F.col("s2_a") - F.try_divide(F.col("s1_a") * F.col("s1_a"), F.col("n_a")),
        F.col("n_a") - 1,
    )
    vb = F.try_divide(
        F.col("s2_b") - F.try_divide(F.col("s1_b") * F.col("s1_b"), F.col("n_b")),
        F.col("n_b") - 1,
    )
    return wide.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        F.round(F.try_divide(mb, ma) - 1, 6).alias("lift"),
        F.round(
            F.try_divide(
                mb - ma,
                F.sqrt(
                    F.try_divide(va, F.col("n_a")) + F.try_divide(vb, F.col("n_b"))
                ),
            ),
            4,
        ).alias("z_stat"),
    )


# --------------------------------------------------------------------------
# Share-of-parent rollup (ratio_to_report)
# --------------------------------------------------------------------------


@query(
    "share_of_parent_rollup",
    oracle="""
    WITH rev AS (
      SELECT r.r_name AS region_name, n.n_name AS nation_name,
             SUM(CAST(o.o_totalprice AS DECIMAL(18,4))) AS rev_dec
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY 1, 2)
    SELECT region_name, nation_name,
           CAST(ROUND(rev_dec, 4) AS DOUBLE) AS revenue,
           ROUND(CAST(rev_dec AS DOUBLE)
                 / CAST(SUM(rev_dec) OVER (PARTITION BY region_name)
                        AS DOUBLE), 6) AS share_of_region
    FROM rev
    """,
)
def share_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent contribution analysis (the RATIO_TO_REPORT idiom):
    each nation's revenue as a fraction of its region's total — the
    hierarchy-percentage view every BI drill-down renders next to the raw
    rollup (`agg_rollup` gives the totals; this gives the mix).

    Determinism: revenue stays in exact DECIMAL through the group AND the
    window sum; the share is one double division of exact operands.

    Scale: dimension joins broadcast (customer→nation→region);
    the window partitions BY THE PARENT KEY over the nation-sized
    aggregate — bounded rows, bounded partitions, one fact shuffle total.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    rev = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region_name"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("rev_dec"))
    )
    w = Window.partitionBy("region_name")
    return rev.select(
        "region_name",
        "nation_name",
        F.round("rev_dec", 4).cast("double").alias("revenue"),
        F.round(
            F.col("rev_dec").cast("double")
            / F.sum("rev_dec").over(w).cast("double"),
            6,
        ).alias("share_of_region"),
    )


# --------------------------------------------------------------------------
# Rolling active users (DAU / WAU / MAU)
# --------------------------------------------------------------------------


@query(
    "active_users_rolling",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    days AS (SELECT DISTINCT d FROM ud),
    wau AS (
      SELECT dd.d, COUNT(DISTINCT ud.user_id) AS wau
      FROM days dd JOIN ud
        ON ud.d <= dd.d AND ud.d > dd.d - 7
      GROUP BY dd.d),
    mau AS (
      SELECT dd.d, COUNT(DISTINCT ud.user_id) AS mau
      FROM days dd JOIN ud
        ON ud.d <= dd.d AND ud.d > dd.d - 30
      GROUP BY dd.d),
    dau AS (SELECT d, COUNT(*) AS dau FROM ud GROUP BY d)
    SELECT d AS day, CAST(dau.dau AS BIGINT) AS dau,
           CAST(wau.wau AS BIGINT) AS wau, CAST(mau.mau AS BIGINT) AS mau,
           ROUND(CAST(dau.dau AS DOUBLE) / mau.mau, 6) AS stickiness
    FROM dau JOIN wau USING (d) JOIN mau USING (d)
    """,
)
def active_users_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling engagement counters: per calendar day, the distinct active
    users that day (DAU), over the trailing 7 days (WAU), the trailing 30
    (MAU), and DAU/MAU stickiness — THE growth dashboard row.  Windowed
    COUNT(DISTINCT) has no native frame form, so each (user, day)
    activity row is exploded to the bounded set of trailing windows it
    feeds — the standard distributed rewrite.

    Determinism: all counts exact integers over date arithmetic;
    stickiness is one rounded division.

    Scale: the distinct collapse shrinks events to (user, day); the
    explode fans that by ≤ 7 and ≤ 30 (constant factors, NOT data-sized);
    the per-day distinct is a map-side-combining aggregate on the day
    key.  Events themselves are scanned once.
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    dau = ud.groupBy(F.col("d").alias("day")).agg(
        F.count("*").cast("bigint").alias("dau")
    )
    def trailing(n: int, name: str) -> DataFrame:
        fan = ud.select(
            "user_id",
            F.explode(
                F.sequence(F.col("d"), F.date_add(F.col("d"), n - 1))
            ).alias("day"),
        ).distinct()
        days = ud.select(F.col("d").alias("day")).distinct()
        return (
            fan.join(days, "day")
            .groupBy("day")
            .agg(F.countDistinct("user_id").cast("bigint").alias(name))
        )
    wau = trailing(7, "wau")
    mau = trailing(30, "mau")
    return (
        dau.join(wau, "day")
        .join(mau, "day")
        .select(
            "day",
            "dau",
            "wau",
            "mau",
            F.round(F.col("dau").cast("double") / F.col("mau"), 6).alias(
                "stickiness"
            ),
        )
    )


# --------------------------------------------------------------------------
# Top event trigram paths
# --------------------------------------------------------------------------

_PATH_TOPN = 15


@query(
    "event_trigram_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type,
             LEAD(event_type, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t2,
             LEAD(event_type, 2) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS t3
      FROM events)
    SELECT event_type || ' > ' || t2 || ' > ' || t3 AS path,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t3 IS NOT NULL
    GROUP BY path
    ORDER BY n DESC, path LIMIT {_PATH_TOPN}
    """,
)
def event_trigram_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-{15} three-step behavior paths (event-type trigrams along each
    user's timeline) — the path-analysis view behind "what do users do
    right before purchasing", one level deeper than
    ``event_transition_matrix``'s first-order pairs.

    Determinism: the timeline order (ts, event_id) is total; counts exact;
    deterministic tie-break (count desc, path asc).

    Scale: one window partitioned on user_id (two LEADs share the single
    sort), a map-side-combining count on the bounded |types|³ key space,
    and a TakeOrderedAndProject top-k — never a global sort of paths.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(F.col("t3").isNotNull())
    return (
        seq.select(
            F.concat_ws(" > ", "event_type", "t2", "t3").alias("path")
        )
        .groupBy("path")
        .agg(F.count("*").cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(_PATH_TOPN)
    )


# --------------------------------------------------------------------------
# Recursive hierarchy rollup (ancestor-chain rewrite of a recursive CTE)
# --------------------------------------------------------------------------

_TREE_MAX_DEPTH = 13  # covers suppkey < 2^13; guarded by a depth assertion


@query(
    "hierarchy_rollup_tree",
    oracle="""
    WITH RECURSIVE anc AS (
      SELECT s_suppkey AS node, s_suppkey AS a FROM supplier
      UNION ALL
      SELECT node, a // 2 FROM anc WHERE a > 1),
    rev AS (
      SELECT l_suppkey, SUM(CAST(l_extendedprice AS DECIMAL(18,4))
                            * CAST(1 - l_discount AS DECIMAL(12,2))) AS r
      FROM lineitem GROUP BY l_suppkey),
    depth AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS depth
              FROM anc GROUP BY node)
    SELECT anc.a AS suppkey, ANY_VALUE(d.depth) AS depth,
           CAST(COUNT(*) AS BIGINT) AS n_subtree,
           CAST(ROUND(SUM(COALESCE(rev.r, 0)), 4) AS DOUBLE) AS subtree_rev
    FROM anc
    JOIN depth d ON d.node = anc.a
    LEFT JOIN rev ON rev.l_suppkey = anc.node
    GROUP BY anc.a
    """,
)
def hierarchy_rollup_tree(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive-hierarchy rollup: treating supplier keys as a binary
    management tree (parent(k) = k//2, root 1), compute every node's
    depth, subtree size, and subtree revenue total — the org-chart /
    bill-of-materials explosion query.  Spark has NO recursive CTE; the
    engine rewrite materializes each node's ancestor CHAIN as a bounded
    array (floor(k/2^i) for i = 0..{13}) in one map-only projection, so
    the transitive closure is an explode + equi-join-free aggregate,
    differentially tested against DuckDB's genuinely RECURSIVE closure.

    Determinism: the chain is exact integer arithmetic; revenue is exact
    decimal; output rounding is the only float step.

    Scale: the closure is |nodes|·depth rows with depth ≤ log2(maxkey) —
    logarithmic fan, not quadratic; the rollup is one map-side-combining
    aggregate on the ancestor key.  Unbounded-depth hierarchies swap the
    closed-form chain for the iterative-doubling join loop
    (localCheckpoint-bounded, ``operators/ml.py`` discipline).
    """
    s = load_table(spark, sf_dir, "supplier")
    li = load_table(spark, sf_dir, "lineitem")
    # the node itself is always its own first ancestor (keys 0 and 1 are
    # both roots — matches the recursive CTE's WHERE a > 1 stop rule)
    chain = F.concat(
        F.array(F.col("s_suppkey").cast("bigint")),
        F.filter(
            F.transform(
                F.sequence(F.lit(1), F.lit(_TREE_MAX_DEPTH)),
                lambda i: F.floor(
                    F.col("s_suppkey") / F.pow(F.lit(2.0), i.cast("double"))
                ).cast("bigint"),
            ),
            lambda a: a >= 1,
        ),
    )
    anc = s.select(
        F.col("s_suppkey").alias("node"), F.explode(chain).alias("a")
    )
    depth = anc.groupBy("node").agg(F.count("*").cast("bigint").alias("depth"))
    rev = li.groupBy("l_suppkey").agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1) - F.col("l_discount")).cast("decimal(12,2)")
        ).alias("r")
    )
    return (
        anc.join(depth.withColumnRenamed("node", "a"), "a")
        .join(rev, anc.node == rev.l_suppkey, "left")
        .groupBy(F.col("a").alias("suppkey"))
        .agg(
            F.any_value("depth").alias("depth"),
            F.count("*").cast("bigint").alias("n_subtree"),
            F.round(F.sum(F.coalesce("r", F.lit(0).cast("decimal(18,4)"))), 4)
            .cast("double")
            .alias("subtree_rev"),
        )
    )


# --------------------------------------------------------------------------
# Linear multi-touch attribution
# --------------------------------------------------------------------------

_ATTR_WINDOW_DAYS = 3
# Corpus-wide by default; the adversarial ~sf1 sweep bounds the (by
# construction quadratic-in-density) touch output explicitly via
# SPARK_GRAFT_ANCHOR_SLICES=bounded.  See plans/anchors.py.
_ATTR_SLICE = anchors.AnchorSlice("event_id", 100000, kind="gate")


@query(
    "attribution_linear_multitouch",
    oracle=f"""
    WITH ev AS (
      SELECT * FROM events WHERE {_ATTR_SLICE.sql}),
    purchases AS (
      SELECT event_id AS purchase_id, user_id, ts, value
      FROM ev WHERE event_type = 'purchase'),
    clicks AS (
      SELECT event_id AS click_id, user_id, ts FROM ev
      WHERE event_type = 'click'),
    touches AS (
      SELECT p.purchase_id, p.value, c.click_id
      FROM purchases p JOIN clicks c
        ON p.user_id = c.user_id
       AND c.ts <= p.ts
       AND c.ts > p.ts - TO_DAYS({_ATTR_WINDOW_DAYS})),
    counted AS (
      SELECT purchase_id, CAST(COUNT(*) AS BIGINT) AS n_touch
      FROM touches GROUP BY purchase_id)
    SELECT t.purchase_id, t.click_id, n.n_touch,
           ROUND(t.value / n.n_touch, 6) AS credit
    FROM touches t JOIN counted n USING (purchase_id)
    """,
)
def attribution_linear_multitouch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear multi-touch attribution: every click in the {3} days before
    a purchase shares the purchase value equally — the marketing-science
    counterpart of the last-touch as-of join (``join_asof_last_click``
    gives 100% to one click; this splits credit across the touchpath).

    Determinism: touch membership is exact timestamp comparisons; credit
    is one double division of a raw value by an exact count, rounded.

    Scale: the touch join keeps the EQUI component (user_id) with the
    time band as a residual predicate — hash join, never a nested loop
    (the ``interval_join_condition`` discipline, plan-pinned for the
    interval family); the per-purchase count joins back on the purchase
    key, reusing the partitioning.

    Default semantics are CORPUS-WIDE.  The adversarial ~sf1 deep sweep
    (whose 10x duplicate amplification makes the touch output — quadratic
    in per-user event density by construction — exceed the comparator row
    cap) applies an explicit ``event_id < 100000`` slice via
    ``SPARK_GRAFT_ANCHOR_SLICES=bounded``; at every driver fixture scale
    that slice is a superset of the data, so both modes agree there.  See
    ``plans/anchors.py``.
    """
    e = _ATTR_SLICE.apply(load_table(spark, sf_dir, "events"))
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id"),
        F.col("ts").alias("c_ts"),
    )
    touches = purchases.join(clicks, "user_id").filter(
        (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            > F.col("p_ts") - F.expr(f"INTERVAL {_ATTR_WINDOW_DAYS} DAYS")
        )
    )
    counted = touches.groupBy("purchase_id").agg(
        F.count("*").cast("bigint").alias("n_touch")
    )
    return (
        touches.join(counted, "purchase_id")
        .select(
            "purchase_id",
            "click_id",
            "n_touch",
            F.round(F.col("value") / F.col("n_touch"), 6).alias("credit"),
        )
    )


# --------------------------------------------------------------------------
# Kaplan-Meier survival curve (time to churn)
# --------------------------------------------------------------------------

_CHURN_GAP_HOURS = 24
_US_PER_HOUR = 3_600_000_000


@query(
    "survival_kaplan_meier",
    oracle=f"""
    WITH span AS (
      SELECT user_id,
             CAST(FLOOR((EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)))
                        / {_US_PER_HOUR}.0) AS BIGINT) AS duration,
             MAX(ts) AS last_t
      FROM events GROUP BY user_id),
    horizon AS (SELECT MAX(ts) AS h FROM events),
    obs AS (
      SELECT duration,
             CASE WHEN last_t < (SELECT h FROM horizon)
                              - TO_HOURS({_CHURN_GAP_HOURS})
                  THEN 1 ELSE 0 END AS churned
      FROM span),
    n_tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM obs),
    ev AS (
      SELECT duration AS t,
             CAST(SUM(churned) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS leaving
      FROM obs GROUP BY duration),
    risk AS (
      SELECT t, d,
             (SELECT n FROM n_tot)
               - COALESCE(SUM(leaving) OVER (ORDER BY t
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS n_risk
      FROM ev),
    km AS (
      -- total-churn guard (fuzz seed 2): when the LAST at-risk group all
      -- churns, 1 - d/n_risk = 0 and LN(0) errors (DuckDB) / NULLs
      -- (Spark).  That step can only be the final event time (nobody is
      -- left at risk after it), so it splits off exactly: S(t) = 0 there,
      -- and the LN-sum branch runs over the strictly-positive factors.
      SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk,
             ROUND(EXP(CAST(SUM(CAST(LN(1.0 - CAST(d AS DOUBLE) / n_risk)
                                 AS DECIMAL(28,12)))
                        OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
                        AS DOUBLE)), 6) AS survival
      FROM risk WHERE d > 0 AND d < n_risk

      UNION ALL

      SELECT t, d, CAST(n_risk AS BIGINT) AS n_risk, CAST(0 AS DOUBLE)
      FROM risk WHERE d > 0 AND d = n_risk)
    SELECT t AS hour, d AS n_churned, n_risk, survival FROM km
    """,
)
def survival_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kaplan-Meier survival curve for user lifetime: duration = active
    span in HOURS, churn = no activity within {24} hours of the corpus
    horizon (others right-censored), S(t) = Π (1 - d_i/n_i) over churn
    hours — THE retention-survival estimator (handles censoring
    correctly, which naive "percent still active" curves do not).  Hours,
    not days, because the fixtures span one month with intra-day churn.

    Determinism: durations are exact integer hour floors of epoch-µs
    differences; the KM product is EXP of a cumulative sum of per-step LN
    terms — each term one IEEE double from identical integers, the
    cumulative sum DECIMAL(28,12)-cast (order-fixed by the hour window),
    final S(t) rounded once.

    Scale: events collapse to per-user spans (one user-keyed aggregate);
    the KM table is |distinct durations|-sized — windows run over that
    summary, never the event stream; horizon/total are 1-row broadcasts.
    """
    e = load_table(spark, sf_dir, "events")
    span = e.groupBy("user_id").agg(
        F.floor(
            (F.unix_micros(F.max("ts").cast("timestamp"))
             - F.unix_micros(F.min("ts").cast("timestamp")))
            / F.lit(float(_US_PER_HOUR))
        ).cast("bigint").alias("duration"),
        F.max("ts").alias("last_t"),
    )
    horizon = e.agg(F.max("ts").alias("h"))
    obs = span.crossJoin(F.broadcast(horizon)).select(
        "duration",
        F.when(
            F.col("last_t")
            < F.col("h") - F.expr(f"INTERVAL {_CHURN_GAP_HOURS} HOURS"),
            1,
        )
        .otherwise(0)
        .alias("churned"),
    )
    n_tot = obs.agg(F.count("*").cast("bigint").alias("n"))
    ev = obs.groupBy(F.col("duration").alias("t")).agg(
        F.sum("churned").cast("bigint").alias("d"),
        F.count("*").cast("bigint").alias("leaving"),
    )
    w_prev = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, -1)
    risk = ev.crossJoin(F.broadcast(n_tot)).select(
        "t",
        "d",
        (
            F.col("n")
            - F.coalesce(F.sum("leaving").over(w_prev), F.lit(0))
        ).alias("n_risk"),
    )
    w_cum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    # total-churn guard (fuzz seed 2): the step where EVERYONE at risk
    # churns has factor 0 — LN would NULL/error; it can only be the final
    # event time, so it splits off exactly with S(t) = 0 while the LN-sum
    # branch keeps strictly-positive factors (mirrors the oracle).
    ln_term = F.log(F.lit(1.0) - F.col("d").cast("double") / F.col("n_risk"))
    km = risk.filter((F.col("d") > 0) & (F.col("d") < F.col("n_risk"))).select(
        F.col("t").alias("hour"),
        F.col("d").alias("n_churned"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.round(
            F.exp(
                F.sum(ln_term.cast("decimal(28,12)")).over(w_cum).cast("double")
            ),
            6,
        ).alias("survival"),
    )
    km_zero = risk.filter((F.col("d") > 0) & (F.col("d") == F.col("n_risk"))).select(
        F.col("t").alias("hour"),
        F.col("d").alias("n_churned"),
        F.col("n_risk").cast("bigint").alias("n_risk"),
        F.lit(0.0).alias("survival"),
    )
    return km.unionByName(km_zero)


# --------------------------------------------------------------------------
# Model gains / lift table
# --------------------------------------------------------------------------


@query(
    "model_gains_table",
    oracle="""
    WITH scored AS (
      SELECT doc_id,
             CAST(n_chars AS DOUBLE) AS score,
             CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS y
      FROM documents),
    deciled AS (
      SELECT y, NTILE(10) OVER (ORDER BY score DESC, doc_id) AS decile
      FROM scored),
    agg AS (
      SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(y) AS BIGINT) AS n_pos
      FROM deciled GROUP BY decile),
    tot AS (SELECT CAST(SUM(n_pos) AS BIGINT) AS total_pos,
                   CAST(SUM(n) AS BIGINT) AS total_n FROM agg)
    SELECT a.decile, a.n, a.n_pos,
           CAST(SUM(a.n_pos) OVER (ORDER BY a.decile
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_pos,
           ROUND(CAST(SUM(a.n_pos) OVER (ORDER BY a.decile
                      ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / (SELECT total_pos FROM tot), 6) AS capture_rate,
           ROUND((CAST(a.n_pos AS DOUBLE) / a.n)
                 / (CAST((SELECT total_pos FROM tot) AS DOUBLE)
                    / (SELECT total_n FROM tot)), 6) AS lift
    FROM agg a
    """,
)
def model_gains_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gains / lift table: rank rows by model score (the length proxy
    plays the scorer, parity with `quality_ranker_auc`'s label rule
    doc_id%3), cut into score deciles, and report per-decile positives,
    cumulative capture rate, and lift over the base rate — the
    targeting-efficiency readout every campaign/filter model ships with
    (AUC says "can it rank"; the gains table says "what do the top 20%
    buy you").

    Determinism: NTILE over a deterministic total order; counts exact;
    the two ratios are rounded divisions of identical integers.

    Scale: the decile cut is a global NTILE over the scored relation, so
    it runs through operators/rank.py's ``global_ntile`` with a
    NEGATED-score uniform bucket (the order is score DESC, so the
    monotone coarse key is ``width_bucket(-score, ...)``): one hash
    shuffle, no single-partition stage; everything after is a 10-key
    aggregate plus a 10-row window.
    """
    d = load_table(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.col("n_chars").cast("double").alias("score"),
        F.when(F.col("doc_id") % 3 == 0, 1).otherwise(0).alias("y"),
        (-F.col("n_chars").cast("double")).alias("_negscore"),
    )
    deciled = global_ntile(
        with_uniform_key_buckets(scored, "_negscore", nulls="last"),
        10,
        [F.col("score").desc(), F.col("doc_id").asc()],
        F.col("_gbk"),
        bucket_col="decile",
    ).select("y", "decile")
    agg = deciled.groupBy("decile").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("y").cast("bigint").alias("n_pos"),
    )
    tot = agg.agg(
        F.sum("n_pos").cast("bigint").alias("total_pos"),
        F.sum("n").cast("bigint").alias("total_n"),
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        agg.crossJoin(F.broadcast(tot))
        .select(
            "decile",
            "n",
            "n_pos",
            F.sum("n_pos").over(w).cast("bigint").alias("cum_pos"),
            F.round(
                F.sum("n_pos").over(w).cast("double") / F.col("total_pos"), 6
            ).alias("capture_rate"),
            F.round(
                (F.col("n_pos").cast("double") / F.col("n"))
                / (F.col("total_pos").cast("double") / F.col("total_n")),
                6,
            ).alias("lift"),
        )
    )


# --------------------------------------------------------------------------
# Week-over-week change
# --------------------------------------------------------------------------


@query(
    "weekly_wow_change",
    oracle="""
    WITH weekly AS (
      SELECT event_type, DATE_TRUNC('week', CAST(ts AS DATE)) AS week,
             CAST(COUNT(*) AS BIGINT) AS n,
             SUM(CAST(value AS DECIMAL(18,6))) AS val_dec
      FROM events GROUP BY 1, 2),
    seq AS (
      SELECT event_type, week, n,
             CAST(ROUND(val_dec, 4) AS DOUBLE) AS total_value,
             LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
      FROM weekly)
    SELECT event_type, week, n, total_value,
           CAST(prev_n AS BIGINT) AS prev_n,
           ROUND(CAST(n - prev_n AS DOUBLE) / prev_n, 6) AS wow_change
    FROM seq WHERE prev_n IS NOT NULL
    """,
)
def weekly_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week growth per event type: weekly counts and exact-
    decimal value totals with the relative change vs the prior week — the
    first derivative every metrics dashboard renders next to the raw
    series (and the alert input "signups down 30% WoW").

    Determinism: week truncation on dates, exact counts, decimal value
    sums rounded once; the change is a single division of exact integers.

    Scale: events collapse to the (type × week) aggregate first; the LAG
    window runs over that calendar-sized summary partitioned by type.
    """
    e = load_table(spark, sf_dir, "events")
    weekly = e.groupBy(
        "event_type", F.date_trunc("week", F.to_date("ts")).alias("week")
    ).agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col("value").cast("decimal(18,6)")).alias("val_dec"),
    )
    w = Window.partitionBy("event_type").orderBy("week")
    seq = weekly.select(
        "event_type",
        F.to_date("week").alias("week"),
        "n",
        F.round("val_dec", 4).cast("double").alias("total_value"),
        F.lag("n").over(w).alias("prev_n"),
    )
    return seq.filter(F.col("prev_n").isNotNull()).select(
        "event_type",
        "week",
        "n",
        "total_value",
        F.col("prev_n").cast("bigint").alias("prev_n"),
        F.round(
            (F.col("n") - F.col("prev_n")).cast("double") / F.col("prev_n"), 6
        ).alias("wow_change"),
    )


# --------------------------------------------------------------------------
# Period-over-period delta contribution
# --------------------------------------------------------------------------


@query(
    "period_delta_contribution",
    oracle="""
    WITH rev AS (
      SELECT n.n_name AS nation_name,
             SUM(CASE WHEN EXTRACT(MONTH FROM o.o_orderdate) = 1
                      THEN CAST(o.o_totalprice AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS rev_p1,
             SUM(CASE WHEN EXTRACT(MONTH FROM o.o_orderdate) = 2
                      THEN CAST(o.o_totalprice AS DECIMAL(18,4))
                      ELSE CAST(0 AS DECIMAL(18,4)) END) AS rev_p2
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      WHERE EXTRACT(MONTH FROM o.o_orderdate) IN (1, 2)
        AND EXTRACT(YEAR FROM o.o_orderdate)
            = (SELECT MIN(EXTRACT(YEAR FROM o_orderdate)) FROM orders)
      GROUP BY 1),
    tot AS (SELECT SUM(rev_p2 - rev_p1) AS total_delta FROM rev)
    SELECT nation_name,
           CAST(ROUND(rev_p1, 4) AS DOUBLE) AS rev_p1,
           CAST(ROUND(rev_p2, 4) AS DOUBLE) AS rev_p2,
           CAST(ROUND(rev_p2 - rev_p1, 4) AS DOUBLE) AS delta,
           ROUND(CAST(rev_p2 - rev_p1 AS DOUBLE)
                 / CAST((SELECT total_delta FROM tot) AS DOUBLE), 6)
               AS share_of_delta
    FROM rev
    """,
)
def period_delta_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period delta decomposition: each nation's January vs
    February revenue (first fixture year), the change, and its share of
    the TOTAL company change — the waterfall/bridge table FP&A builds to
    answer "which segment drove the move" (shares sum to 1 by
    construction, sign-aware).

    Determinism: both period totals are exact conditional DECIMAL sums in
    ONE pass (no two-scan diff); delta stays decimal until the rounded
    emission; the share divides exact decimals cast to double once.

    Scale: one conditional aggregate on the nation key (dimension joins
    broadcast), a 1-row total-delta broadcast — the fact table is scanned
    once, shuffled once.
    """
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    year0 = o.agg(F.min(F.year("o_orderdate")).alias("y0"))
    base = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .crossJoin(F.broadcast(year0))
        .filter(
            (F.year("o_orderdate") == F.col("y0"))
            & F.month("o_orderdate").isin(1, 2)
        )
    )
    dec0 = F.lit(0).cast("decimal(18,4)")
    rev = base.groupBy(F.col("n_name").alias("nation_name")).agg(
        F.sum(
            F.when(
                F.month("o_orderdate") == 1,
                F.col("o_totalprice").cast("decimal(18,4)"),
            ).otherwise(dec0)
        ).alias("rev_p1"),
        F.sum(
            F.when(
                F.month("o_orderdate") == 2,
                F.col("o_totalprice").cast("decimal(18,4)"),
            ).otherwise(dec0)
        ).alias("rev_p2"),
    )
    tot = rev.agg(F.sum(F.col("rev_p2") - F.col("rev_p1")).alias("total_delta"))
    return rev.crossJoin(F.broadcast(tot)).select(
        "nation_name",
        F.round("rev_p1", 4).cast("double").alias("rev_p1"),
        F.round("rev_p2", 4).cast("double").alias("rev_p2"),
        F.round(F.col("rev_p2") - F.col("rev_p1"), 4)
        .cast("double")
        .alias("delta"),
        # try_divide: the two periods can net to EXACTLY zero total delta
        # (fuzz seed 3: tie-heavy fixture prices) — the share of nothing is
        # NULL, not an ANSI abort; DuckDB's x/0 is NULL on the oracle side
        F.round(
            F.try_divide(
                (F.col("rev_p2") - F.col("rev_p1")).cast("double"),
                F.col("total_delta").cast("double"),
            ),
            6,
        ).alias("share_of_delta"),
    )


# --------------------------------------------------------------------------
# New vs returning users per day
# --------------------------------------------------------------------------


@query(
    "new_vs_returning_daily",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
    f AS (SELECT user_id, MIN(d) AS first_d FROM ud GROUP BY user_id)
    SELECT ud.d AS day,
           CAST(SUM(CASE WHEN ud.d = f.first_d THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(SUM(CASE WHEN ud.d > f.first_d THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users
    FROM ud JOIN f USING (user_id)
    GROUP BY ud.d
    """,
)
def new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """New vs returning active users per day: a user's first-activity day
    counts them as new, every later active day as returning — the growth
    split every DAU chart is stacked by (acquisition vs engagement).

    Scale: the distinct (user, day) collapse, one user-keyed min, an
    equi-join back on the same user key (partitioning reused), and a
    day-keyed conditional count — no windows, all map-side combining.
    """
    e = load_table(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("d")).distinct()
    f = ud.groupBy("user_id").agg(F.min("d").alias("first_d"))
    return (
        ud.join(f, "user_id")
        .groupBy(F.col("d").alias("day"))
        .agg(
            F.sum(F.when(F.col("d") == F.col("first_d"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("d") > F.col("first_d"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
    )


# --------------------------------------------------------------------------
# Attribution-window sensitivity sweep
# --------------------------------------------------------------------------

_ATTR_WINDOWS_H = (1, 6, 24, 72)


@query(
    "attribution_window_sensitivity",
    oracle=f"""
    WITH purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
    clicks AS (
      SELECT user_id, ts, MAX(event_id) AS click_id
      FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
    matched AS (
      SELECT p.event_id, p.ts, c.ts AS click_ts
      FROM purchases p ASOF LEFT JOIN clicks c
        ON p.user_id = c.user_id AND p.ts >= c.ts),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM purchases),
    w AS (SELECT UNNEST(ARRAY{list(_ATTR_WINDOWS_H)}) AS window_h)
    SELECT w.window_h,
           CAST(SUM(CASE WHEN m.click_ts IS NOT NULL
                     AND m.click_ts > m.ts - TO_HOURS(w.window_h)
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           ROUND(CAST(SUM(CASE WHEN m.click_ts IS NOT NULL
                          AND m.click_ts > m.ts - TO_HOURS(w.window_h)
                          THEN 1 ELSE 0 END) AS DOUBLE)
                 / (SELECT n FROM tot), 6) AS attribution_rate
    FROM matched m, w
    GROUP BY w.window_h
    """,
)
def attribution_window_sensitivity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attribution-window sensitivity: for each candidate lookback window,
    how many purchases get click-attributed and at what rate — the sweep
    marketing runs BEFORE fixing the attribution window (the policy twin
    of ``watermark_loss_curve``: both turn "pick a constant" into a
    measured curve).  Because last-touch attribution only needs the
    NEAREST preceding click, one as-of join answers every window — the
    gap is compared against each candidate, so 4 windows cost one pass.

    Determinism: the as-of match is the deduped-latest-click convention
    of ``join_asof_last_click``; lateness per window is an exact
    timestamp comparison; counts exact, one rounded rate.

    Scale: one union-sort-window as-of join (single user-keyed shuffle),
    a constant 4-way explode of the purchase-sized match table, and a
    1-row total broadcast.
    """
    from lms_etl_pipeline_spark.operators.temporal import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        e.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    matched = asof_join(
        purchases, clicks, on="user_id", left_ts="ts", right_ts="ts",
        value_cols=["click_id"],
    )
    tot = purchases.agg(F.count("*").cast("bigint").alias("n"))
    windows = F.explode(
        F.array(*[F.lit(h) for h in _ATTR_WINDOWS_H])
    ).alias("window_h")
    sweep = matched.select("ts", F.col("asof_ts").alias("click_ts"), windows)
    hit = F.when(
        F.col("click_ts").isNotNull()
        & (
            F.col("click_ts")
            > F.col("ts") - F.col("window_h") * F.expr("INTERVAL 1 HOUR")
        ),
        1,
    ).otherwise(0)
    return (
        sweep.groupBy("window_h")
        .agg(F.sum(hit).cast("bigint").alias("n_attributed"))
        .crossJoin(F.broadcast(tot))
        .select(
            "window_h",
            "n_attributed",
            F.round(
                F.col("n_attributed").cast("double") / F.col("n"), 6
            ).alias("attribution_rate"),
        )
    )


# --------------------------------------------------------------------------
# Session bounce / dwell metrics
# --------------------------------------------------------------------------

_SESS_GAP_US = 30 * 60 * 1_000_000


@query(
    "session_bounce_dwell",
    oracle=f"""
    WITH o AS (
      SELECT user_id, ts, event_id,
             CASE WHEN LAG(ts) OVER w IS NULL
                    OR EPOCH_US(ts) - LAG(EPOCH_US(ts)) OVER w > {_SESS_GAP_US}
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    s AS (
      SELECT user_id, ts,
             CAST(SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS BIGINT)
                 AS session_id
      FROM o)
    SELECT user_id, session_id,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           EPOCH_US(MAX(ts)) - EPOCH_US(MIN(ts)) AS dwell_us,
           COUNT(*) = 1 AS is_bounce
    FROM s GROUP BY user_id, session_id
    """,
)
def session_bounce_dwell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-session engagement metrics over the 30-minute gap-rule
    sessions: event count, dwell time in exact epoch microseconds, and
    the bounce flag (single-event session) — the bounce-rate / dwell-time
    table every web-analytics report aggregates from
    (``events_sessionize_gap`` assigns the ids; this is the metric layer
    on the same single-shuffle window pair).

    Determinism: integer microsecond arithmetic only; the bounce flag is
    an exact count comparison.

    Scale: identical plan shape to the sessionizer — two windows on one
    user_id partitioning, then a (user, session) hash aggregate.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w)
    marked = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(F.lag("ts").over(w).isNull() | (gap > _SESS_GAP_US), 1)
        .otherwise(0)
        .alias("new_s"),
    )
    wc = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = marked.select(
        "user_id", "ts", F.sum("new_s").over(wc).cast("long").alias("session_id")
    )
    return sess.groupBy("user_id", "session_id").agg(
        F.count("*").cast("bigint").alias("n_events"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias(
            "dwell_us"
        ),
        (F.count("*") == 1).alias("is_bounce"),
    )


# --------------------------------------------------------------------------
# Inter-arrival time statistics
# --------------------------------------------------------------------------


@query(
    "interarrival_time_stats",
    oracle="""
    WITH seq AS (
      SELECT event_type,
             EPOCH_US(ts) - LAG(EPOCH_US(ts))
               OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events),
    g AS (
      SELECT event_type, gap_us,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY gap_us, event_type) - 1 AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM seq WHERE gap_us IS NOT NULL),
    br AS (
      SELECT event_type, n,
             MAX(CASE WHEN rn = ((n-1) * 5) // 10 THEN gap_us END) AS lo5,
             MAX(CASE WHEN rn = ((n-1) * 5 + 9) // 10 THEN gap_us END) AS hi5,
             MAX(CASE WHEN rn = ((n-1) * 9) // 10 THEN gap_us END) AS lo9,
             MAX(CASE WHEN rn = ((n-1) * 9 + 9) // 10 THEN gap_us END) AS hi9,
             MIN(gap_us) AS mn, MAX(gap_us) AS mx
      FROM g GROUP BY event_type, n)
    SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
           CAST(mn AS BIGINT) AS min_us,
           CAST(CAST(lo5 * (10 - ((n-1) * 5) % 10)
                     + hi5 * (((n-1) * 5) % 10) AS DECIMAL(38,0))
                / 10 AS DOUBLE) AS p50_us,
           CAST(CAST(lo9 * (10 - ((n-1) * 9) % 10)
                     + hi9 * (((n-1) * 9) % 10) AS DECIMAL(38,0))
                / 10 AS DOUBLE) AS p90_us,
           CAST(mx AS BIGINT) AS max_us
    FROM br
    """,
)
def interarrival_time_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival time distribution per event type: consecutive-event
    gaps in exact epoch microseconds with min/median/p90/max — the
    capacity-planning and rate-limit input ("how bursty is this stream"),
    and the empirical base for any Poisson-rate assumption a streaming
    watermark choice rests on (pairs with ``watermark_loss_curve``).

    Determinism (round-8 fuzz finding): engine-native PERCENTILE_CONT
    interpolates in DOUBLE, and at microsecond-gap magnitudes (~1e12) the
    double ulp (~2.4e-4) EXCEEDS the 4-dp rounding the repo convention
    relies on — seed-0 of tools/fuzz_fixture.py produced a last-ulp
    cross-engine mismatch.  Both sides now compute the PERCENTILE_CONT
    definition exactly: bracketing order statistics at floor/ceil of
    (n-1)q via row_number (q in tenths, so the interpolation weight is
    an integer 0..9), interpolated in EXACT integer/decimal arithmetic
    — (lo*(10-w) + hi*w) / 10 — with one exact decimal->double cast.

    Scale: one window partitioned on the bounded event_type key (sorts
    within type), then a second type-partitioned rank window over the
    gaps and a map-side-combining aggregate per type.
    """
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        (
            F.unix_micros(F.col("ts"))
            - F.lag(F.unix_micros(F.col("ts"))).over(w)
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    wr = Window.partitionBy("event_type").orderBy("gap_us", "event_type")
    wn = Window.partitionBy("event_type")
    g = seq.select(
        "event_type",
        "gap_us",
        (F.row_number().over(wr) - 1).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )
    def _pick(expr):
        return F.max(F.when(expr, F.col("gap_us")))
    br = g.groupBy("event_type", "n").agg(
        _pick(F.col("rn") == F.expr("((n-1) * 5) DIV 10")).alias("lo5"),
        _pick(F.col("rn") == F.expr("((n-1) * 5 + 9) DIV 10")).alias("hi5"),
        _pick(F.col("rn") == F.expr("((n-1) * 9) DIV 10")).alias("lo9"),
        _pick(F.col("rn") == F.expr("((n-1) * 9 + 9) DIV 10")).alias("hi9"),
        F.min("gap_us").alias("mn"),
        F.max("gap_us").alias("mx"),
    )
    return br.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_gaps"),
        F.col("mn").cast("bigint").alias("min_us"),
        F.expr(
            "CAST(CAST(lo5 * (10 - ((n-1) * 5) % 10) + hi5 * (((n-1) * 5) % 10)"
            " AS DECIMAL(38,0)) / 10 AS DOUBLE)"
        ).alias("p50_us"),
        F.expr(
            "CAST(CAST(lo9 * (10 - ((n-1) * 9) % 10) + hi9 * (((n-1) * 9) % 10)"
            " AS DECIMAL(38,0)) / 10 AS DOUBLE)"
        ).alias("p90_us"),
        F.col("mx").cast("bigint").alias("max_us"),
    )
