import math
import random

from dbscan_pyspark_spark.operators.similarity import cosine_topk, ivf_cosine_topk


def _cos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(x * x for x in b))
    return d / (na * nb)


def _make_vectors(n=80, dim=8, seed=19):
    rng = random.Random(seed)
    return [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]


def test_cosine_topk_matches_bruteforce(spark):
    vecs = _make_vectors()
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"]).repartition(4)
    queries = df.where(df.vec_id < 3)
    got = cosine_topk(df, queries, k=4).collect()

    by_query = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"], r["score"]))

    coords = dict(vecs)
    for qid in (0, 1, 2):
        scored = sorted(
            ((round(_cos(coords[qid], coords[i]), 6), i) for i in coords if i != qid),
            key=lambda t: (-t[0], t[1]),
        )
        expected = [(rank + 1, i, s) for rank, (s, i) in enumerate(scored[:4])]
        assert sorted(by_query[qid]) == expected


def test_ivf_recall_reasonable(spark):
    vecs = _make_vectors(n=200, dim=6, seed=23)
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"]).repartition(4)
    queries = df.where(df.vec_id < 5)
    exact = cosine_topk(df, queries, k=5).collect()
    approx = ivf_cosine_topk(df, queries, k=5, n_cells=8, nprobe=4).collect()

    exact_sets = {}
    for r in exact:
        exact_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])

    recalls = [
        len(exact_sets[q] & approx_sets.get(q, set())) / len(exact_sets[q])
        for q in exact_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5  # probing half the cells
    # every query answered with k results
    assert all(len(s) == 5 for s in approx_sets.values())
