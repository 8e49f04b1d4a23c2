"""Connected components vs a driver-side union-find oracle."""

import random

from dbscan_pyspark_spark.operators import connected_components


def _uf_components(n_vertices, edges):
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # label = min id in component
    comp = {}
    for x in range(n_vertices):
        comp.setdefault(find(x), []).append(x)
    return {x: min(members) for members in comp.values() for x in members}


def test_simple_chain(spark):
    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 3), (5, 6)], ["src", "dst"])
    verts = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 4, 5: 5, 6: 5, 7: 7}


def test_random_graph_matches_union_find(spark):
    rng = random.Random(13)
    n = 300
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(220)]
    expected = _uf_components(n, edges)
    edf = spark.createDataFrame(edges, ["src", "dst"]).repartition(4)
    vdf = spark.createDataFrame([(i,) for i in range(n)], ["id"])
    # both physical strategies must agree with the oracle
    for thr in (5_000_000, 0):  # driver union-find / distributed star-contraction
        got = {
            r["id"]: r["component"]
            for r in connected_components(
                edf, vertices=vdf, driver_threshold=thr
            ).collect()
        }
        assert got == expected, f"strategy threshold={thr}"


def test_self_loops_and_duplicates(spark):
    edges = spark.createDataFrame(
        [(1, 1), (1, 2), (2, 1), (1, 2), (3, 3)], ["src", "dst"]
    )
    verts = spark.createDataFrame([(1,), (2,), (3,)], ["id"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {1: 1, 2: 1, 3: 3}


def test_empty_edges(spark):
    edges = spark.createDataFrame([], "src long, dst long")
    verts = spark.createDataFrame([(1,), (2,)], ["id"])
    got = {
        r["id"]: r["component"]
        for r in connected_components(edges, vertices=verts).collect()
    }
    assert got == {1: 1, 2: 2}


def test_hybrid_early_exit_matches_other_strategies(spark):
    """A threshold between 0 and the edge count triggers >=1 distributed
    round followed by the driver union-find finish; labels must equal
    both pure strategies (min member id per component)."""
    import random

    rng = random.Random(11)
    n = 400
    edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(600)]
    edf = spark.createDataFrame(edges, ["src", "dst"])
    baseline = {
        r["id"]: r["component"]
        for r in connected_components(edf, driver_threshold=10_000_000).collect()
    }
    for thr in (50, 200, 500):
        got = {
            r["id"]: r["component"]
            for r in connected_components(edf, driver_threshold=thr).collect()
        }
        assert got == baseline, f"hybrid threshold={thr}"
