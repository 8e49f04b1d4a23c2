"""DBSCAN vs a driver-side oracle implementing the reference semantics:

neighbors via cartesian incl. self; cores = count >= min_pts; edges
core->neighbor; undirected CC; components >= k are clusters, rest noise
(DBSCAN.py:161-181).
"""

import random

from dbscan_pyspark_spark.operators import dbscan


def _oracle(pts, eps, min_pts, k):
    ids = [i for i, _ in pts]
    coords = dict(pts)

    def d(a, b):
        return sum(abs(x - y) for x, y in zip(coords[a], coords[b]))

    nbrs = {i: [j for j in ids if d(i, j) < eps] for i in ids}
    cores = {i for i in ids if len(nbrs[i]) >= min_pts}
    # union-find over core->neighbor edges
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for c in cores:
        for nb in nbrs[c]:
            union(c, nb)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), set()).add(i)
    out = {}
    for members in comp.values():
        is_cluster = len(members) >= k
        label = min(members) if is_cluster else None
        for m in members:
            out[m] = label
    return out


def test_dbscan_two_blobs_and_noise(spark):
    rng = random.Random(3)
    pts = []
    for i in range(40):  # blob at (0,0)
        pts.append((i, [float(rng.uniform(0, 4)), float(rng.uniform(0, 4))]))
    for i in range(40, 80):  # blob at (100,100)
        pts.append((i, [float(rng.uniform(100, 104)), float(rng.uniform(100, 104))]))
    pts.append((900, [50.0, 50.0]))  # lone noise point
    df = spark.createDataFrame(pts, ["id", "features"]).repartition(4)

    expected = _oracle(pts, eps=3.0, min_pts=5, k=5)
    got = {r["id"]: r["cluster_id"] for r in dbscan(df, 3.0, 5, 5).collect()}
    assert got == expected
    assert got[900] is None  # the lone point is noise
    assert got[0] is not None and got[40] is not None
    assert got[0] != got[40]  # blobs are distinct clusters


def test_dbscan_random_matches_oracle(spark):
    rng = random.Random(17)
    pts = [
        (i, [float(rng.randint(0, 25)), float(rng.randint(0, 25))])
        for i in range(150)
    ]
    df = spark.createDataFrame(pts, ["id", "features"]).repartition(4)
    for eps, min_pts, k in [(3.0, 6, 6), (2.0, 4, 8)]:
        expected = _oracle(pts, eps, min_pts, k)
        got = {r["id"]: r["cluster_id"] for r in dbscan(df, eps, min_pts, k).collect()}
        assert got == expected


def test_dbscan_pair_strategies_identical(spark):
    """'half' (unique-pairs + mirror) and 'symmetric' produce
    bit-identical labels — and both match the brute-force oracle —
    so the auto crossover can never change results."""
    rng = random.Random(23)
    pts = [
        (i, [float(rng.randint(0, 20)), float(rng.randint(0, 20))])
        for i in range(120)
    ] + [(1000 + i, [5.0, 5.0]) for i in range(10)]  # duplicate group
    df = spark.createDataFrame(pts, ["id", "features"]).repartition(4)
    expected = _oracle(pts, 3.0, 6, 6)
    for strategy in ("symmetric", "half"):
        got = {
            r["id"]: r["cluster_id"]
            for r in dbscan(df, 3.0, 6, 6, pair_strategy=strategy).collect()
        }
        assert got == expected, strategy


def test_dbscan_scc_variant_smaller_clusters(spark):
    # core-core mutual edges only: border points fall out as noise
    rng = random.Random(5)
    pts = [(i, [float(rng.uniform(0, 5)), float(rng.uniform(0, 5))]) for i in range(60)]
    df = spark.createDataFrame(pts, ["id", "features"])
    cc = {r["id"]: r["cluster_id"] for r in dbscan(df, 2.0, 8, 8, variant="cc").collect()}
    scc = {r["id"]: r["cluster_id"] for r in dbscan(df, 2.0, 8, 8, variant="scc").collect()}
    cc_members = {i for i, c in cc.items() if c is not None}
    scc_members = {i for i, c in scc.items() if c is not None}
    assert scc_members <= cc_members
