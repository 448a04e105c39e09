"""Tests for operators/ml.py: generalized k-means and PageRank (the reusable
library APIs behind the unrolled oracle-checked plans)."""

from __future__ import annotations

from pyspark.sql import functions as F

from lms_etl_pipeline_spark.operators.ml import kmeans_assign, kmeans_fit, pagerank


def test_kmeans_fit_converges_on_separated_clusters(spark):
    # ids ordered so the deterministic first-k init spans both true
    # clusters (Lloyd cannot escape a same-cluster init — that's the
    # algorithm, not a bug)
    pts = spark.createDataFrame(
        [
            (0, [10.0, 10.0]), (1, [-10.0, -10.0]), (2, [9.5, 10.5]),
            (3, [11.0, 9.0]), (4, [-9.0, -11.0]), (5, [-10.5, -9.5]),
        ],
        "id LONG, vec ARRAY<DOUBLE>",
    )
    assign, cent = kmeans_fit(pts, k=2, max_iter=10)
    got = {r.id: r.cluster for r in assign.collect()}
    pos = {i for i, c in got.items() if c == got[0]}
    assert pos == {0, 2, 3}, got
    assert set(got) - pos == {1, 4, 5}
    cents = {r.cid: r.cvec for r in cent.collect()}
    assert len(cents) == 2
    # converged centroids are the cluster means (rounded at 1e-6)
    means = sorted(tuple(v) for v in cents.values())
    assert means[0][0] < 0 < means[1][0]


def test_kmeans_fit_is_partitioning_invariant(spark):
    import random

    rng = random.Random(3)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(40)]
    df1 = spark.createDataFrame(rows, "id LONG, vec ARRAY<DOUBLE>").repartition(1)
    df8 = spark.createDataFrame(rows, "id LONG, vec ARRAY<DOUBLE>").repartition(8)
    a1, _ = kmeans_fit(df1, k=4, max_iter=5)
    a8, _ = kmeans_fit(df8, k=4, max_iter=5)
    r1 = {(r.id, r.cluster) for r in a1.collect()}
    r8 = {(r.id, r.cluster) for r in a8.collect()}
    assert r1 == r8, "decimal-sum means must make results layout-independent"


@pytest.mark.slow  # >14 s: gated from the default run (round 13)
def test_pagerank_converges_and_ranks_hub_highest(spark):
    # star graph: everyone links to node h; h links to one spoke
    edges = spark.createDataFrame(
        [("a", "h"), ("b", "h"), ("c", "h"), ("d", "h"), ("h", "a")],
        "src STRING, dst STRING",
    )
    pr = {r.node: r.pagerank for r in pagerank(edges, max_iter=50).collect()}
    assert max(pr, key=pr.get) == "h", pr
    # a receives h's whole rank, so it must out-rank the floor spokes
    assert pr["a"] > pr["b"] == pr["c"] == pr["d"]


def test_kmeans_assign_empty_centroid_set_is_rejected_gracefully(spark):
    pts = spark.createDataFrame([(0, [1.0])], "id LONG, vec ARRAY<DOUBLE>")
    cent = spark.createDataFrame([], "cid LONG, cvec ARRAY<DOUBLE>")
    assert kmeans_assign(pts, cent).count() == 0


@pytest.mark.slow  # >14 s: gated from the default run (round 13)
def test_iterative_operators_scale_evidence_sf01(spark):
    """Convergence-at-scale evidence (round-4 verdict #7): at sf0.1 both
    general-iteration operators (a) converge strictly before max_iter,
    (b) finish inside a wall-clock bound, and (c) return results whose
    lineage is checkpoint-bounded — the optimized plan is a handful of
    lines over a LogicalRDD leaf, not max_iter chained joins — so the
    open-ended loops are certified plannable at depth, not only at
    sf-tiny."""
    import time

    from lms_etl_pipeline_spark.sources.tables import load_table

    sf_dir = "/root/testdata/sf0.1"

    def plan_lines(df):
        return df._jdf.queryExecution().optimizedPlan().toString().splitlines()

    t0 = time.time()
    emb = load_table(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("id"), F.col("embedding").cast("array<double>").alias("vec")
    )
    kstats: dict = {}
    # empirically converges at iteration ~31 on this fixture; 45 leaves
    # headroom while still proving strictly-before-max_iter convergence
    assign, cent = kmeans_fit(emb, k=8, max_iter=45, stats=kstats)
    assert kstats["converged"], kstats
    assert kstats["iterations"] < 45, kstats
    assert assign.count() == emb.count()
    assert cent.count() == 8  # empty-cluster guard keeps k stable
    # checkpoint-bounded lineage: the result plan must not embed the loop
    assert len(plan_lines(assign)) <= 5, "\n".join(plan_lines(assign))

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    edges = o.join(li, o.o_orderkey == li.l_orderkey).select(
        F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias("src"),
        F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias("dst"),
    )
    pstats: dict = {}
    pr = pagerank(edges, max_iter=40, tol_scale=9, stats=pstats)
    assert pstats["converged"], pstats
    assert pstats["iterations"] < 40, pstats
    assert abs(pr.agg(F.sum("pagerank")).collect()[0][0]) > 0
    assert len(plan_lines(pr)) <= 5, "\n".join(plan_lines(pr))

    elapsed = time.time() - t0
    assert elapsed < 300, f"iterative ops took {elapsed:.0f}s at sf0.1"
