"""k-member constrained k-means invariants (SURVEY.md §7 phase 4):
every cluster >= k members, full coverage, cost sanity."""

import random

import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.kmember import (
    kmember_anonymize,
    kmember_kmeans,
    kmember_search,
)


@pytest.fixture(scope="module")
def blob_points(spark):
    rng = random.Random(31)
    pts = []
    i = 0
    for cx, cy in [(0, 0), (30, 5), (10, 40)]:
        for _ in range(40):
            pts.append((i, [cx + rng.uniform(-3, 3), cy + rng.uniform(-3, 3)]))
            i += 1
    return spark.createDataFrame(pts, ["id", "features"]).repartition(4)


def test_kmember_invariants(spark, blob_points):
    n = blob_points.count()
    res = kmember_kmeans(blob_points, k=10, n_clusters=5, max_iter=8)

    sizes = res.assignments.groupBy("cluster_id").count().collect()
    assert sum(r["count"] for r in sizes) == n  # full coverage
    assert all(r["count"] >= 10 for r in sizes)  # k-member constraint
    assert len(sizes) == 5
    assert res.cost >= 0
    # each point assigned exactly once
    assert res.assignments.select("id").distinct().count() == n


def test_kmember_tight_feasibility(spark):
    # n == k * n_clusters: every cluster must end up with exactly k
    pts = [(i, [float(i % 7), float(i // 7)]) for i in range(30)]
    df = spark.createDataFrame(pts, ["id", "features"])
    res = kmember_kmeans(df, k=10, n_clusters=3, max_iter=5)
    sizes = [r["count"] for r in res.assignments.groupBy("cluster_id").count().collect()]
    assert sorted(sizes) == [10, 10, 10]


def test_kmember_infeasible_raises(spark):
    df = spark.createDataFrame([(i, [float(i)]) for i in range(5)], ["id", "features"])
    with pytest.raises(ValueError, match="infeasible"):
        kmember_kmeans(df, k=10, n_clusters=3)


def test_kmember_anonymize_shape(spark, blob_points):
    res = kmember_kmeans(blob_points, k=12, n_clusters=4, max_iter=5)
    out = kmember_anonymize(blob_points, res)
    assert out.count() == blob_points.count()
    # every output row's an_features is its cluster's centroid
    cents = {r["cluster_id"]: r["centroid"] for r in res.centroids.collect()}
    for r in out.collect():
        assert r["an_features"] == cents[r["cluster_id"]]


def test_kmember_search_picks_feasible_best(spark, blob_points):
    res = kmember_search(blob_points, k=15, candidates=[3, 6], restarts=1, max_iter=4)
    sizes = [r["count"] for r in res.assignments.groupBy("cluster_id").count().collect()]
    assert all(s >= 15 for s in sizes)
