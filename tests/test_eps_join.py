"""Grid ε-join vs brute-force oracle on random points (seeded)."""

import random

import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators import (
    core_points,
    eps_self_join,
    neighbor_counts,
)


def _brute_pairs(pts, eps, metric="l1"):
    out = set()
    for i, a in pts:
        for j, b in pts:
            if metric == "l1":
                d = sum(abs(x - y) for x, y in zip(a, b))
            else:
                d = sum((x - y) ** 2 for x, y in zip(a, b)) ** 0.5
            if d < eps:
                out.add((i, j))
    return out


@pytest.fixture(scope="module")
def small_points(spark):
    rng = random.Random(7)
    pts = [(i, [float(rng.randint(0, 30)), float(rng.randint(0, 30))]) for i in range(120)]
    # duplicates are semantically meaningful (FIXTURES.md §1)
    pts += [(200 + i, pts[i][1]) for i in range(5)]
    df = spark.createDataFrame(pts, ["id", "features"]).repartition(4)
    return pts, df


@pytest.mark.parametrize("metric", ["l1", "l2"])
@pytest.mark.parametrize("eps", [2.0, 5.0])
def test_eps_self_join_matches_bruteforce(spark, small_points, metric, eps):
    pts, df = small_points
    expected = _brute_pairs(pts, eps, metric)
    got = {
        (r["a_id"], r["b_id"])
        for r in eps_self_join(df, eps, metric=metric).collect()
    }
    assert got == expected


def test_unique_pairs_and_no_self(spark, small_points):
    pts, df = small_points
    expected = {(i, j) for (i, j) in _brute_pairs(pts, 3.0) if i < j}
    got = {
        (r["a_id"], r["b_id"])
        for r in eps_self_join(df, 3.0, unique_pairs=True).collect()
    }
    assert got == expected


def test_neighbor_counts_include_self(spark, small_points):
    pts, df = small_points
    expected = _brute_pairs(pts, 4.0)
    cnt = {}
    for i, j in expected:
        cnt[i] = cnt.get(i, 0) + 1
    got = {r["id"]: r["n_neighbors"] for r in neighbor_counts(df, 4.0).collect()}
    assert got == cnt
    # every point is its own neighbor at any eps > 0
    assert all(v >= 1 for v in got.values())


def test_core_points(spark, small_points):
    pts, df = small_points
    counts = {}
    for i, j in _brute_pairs(pts, 4.0):
        counts[i] = counts.get(i, 0) + 1
    expected = {i for i, c in counts.items() if c >= 4}
    got = {r["id"] for r in core_points(df, 4.0, 4).collect()}
    assert got == expected


def test_distance_column(spark):
    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 1.0]), (3, [10.0, 10.0])], ["id", "features"]
    )
    rows = {
        (r["a_id"], r["b_id"]): r["distance"]
        for r in eps_self_join(df, 3.0).collect()
    }
    assert rows[(1, 2)] == 2.0
    assert rows[(1, 1)] == 0.0
    assert (1, 3) not in rows


def test_k_distance_exact_tiny(spark):
    from dbscan_pyspark_spark.operators.eps_join import k_distance

    # 1-D points at 0, 1, 3, 7: kth (k=2) nearest incl. self is the
    # nearest other point: 1, 1, 2, 4.
    pts = spark.createDataFrame(
        [(i, [float(v)]) for i, v in enumerate([0, 1, 3, 7])],
        "id long, features array<double>",
    )
    got = {
        r["sample_id"]: r["kth_dist"]
        for r in k_distance(pts, k=2, n_samples=4).collect()
    }
    assert got == {0: 1.0, 1: 1.0, 2: 2.0, 3: 4.0}


def test_k_distance_pool_mode_bounds_candidates(spark):
    from dbscan_pyspark_spark.operators.eps_join import k_distance

    pts = spark.createDataFrame(
        [(i, [float(i)]) for i in range(100)],
        "id long, features array<double>",
    )
    exact = k_distance(pts, k=3, n_samples=8)
    pooled = k_distance(pts, k=3, n_samples=8, pool_size=40)
    assert exact.count() == 8 and pooled.count() == 8
    # pooled kth distance can only be >= the exact one (fewer candidates)
    j = exact.withColumnRenamed("kth_dist", "d_exact").join(
        pooled.withColumnRenamed("kth_dist", "d_pool"), "sample_id"
    )
    assert j.where(F.col("d_pool") < F.col("d_exact")).count() == 0
