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
