"""MLlib-backed alternates agree (in recall terms) with the first-party
DataFrame operators."""

import random

import pytest

from dbscan_pyspark_spark.operators.mllib_variants import (
    HAS_MLLIB,
    brp_lsh_topk,
    kmeans_fit_predict,
    minhash_lsh_near_dups,
)

pytestmark = pytest.mark.skipif(not HAS_MLLIB, reason="pyspark.ml unavailable")

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (2, "the quick brown fox jumps over the lazy dog near the river bank"),
    (3, "the quick brown fox jumps over the lazy dog near the river delta"),
    (4, "completely different words about spark dataframes and shuffles here"),
]


def test_minhash_lsh_near_dups(spark):
    df = spark.createDataFrame(DOCS, ["doc_id", "text"])
    pairs = {
        (r["a_id"], r["b_id"]): r["jaccard_distance"]
        for r in minhash_lsh_near_dups(df, threshold=0.8).collect()
    }
    assert pairs[(1, 2)] == 0.0  # identical docs
    assert (1, 4) not in pairs
    if (1, 3) in pairs:
        assert 0.0 < pairs[(1, 3)] <= 0.8


def test_brp_lsh_topk_recall(spark):
    rng = random.Random(41)
    vecs = [(i, [rng.uniform(-1, 1) for _ in range(6)]) for i in range(150)]
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"])
    queries = df.where(df.vec_id < 3)
    got = brp_lsh_topk(df, queries, k=3, bucket_length=4.0, num_hash_tables=6)
    rows = got.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], set()).add(r["vec_id"])
    # exact euclidean top-3 per query
    coords = dict(vecs)
    import math

    hits = 0
    for q in (0, 1, 2):
        d = sorted(
            (math.dist(coords[q], coords[i]), i) for i in coords if i != q
        )
        exact = {i for _, i in d[:3]}
        hits += len(exact & by_q.get(q, set()))
    assert hits >= 5  # >= 55% recall with generous buckets


def test_kmeans_fit_predict(spark):
    rng = random.Random(43)
    pts = []
    i = 0
    for cx in (0.0, 50.0):
        for _ in range(30):
            pts.append((i, [cx + rng.uniform(-2, 2), cx + rng.uniform(-2, 2)]))
            i += 1
    df = spark.createDataFrame(pts, ["id", "features"])
    assignments, centroids = kmeans_fit_predict(df, 2, max_iter=10)
    assert assignments.count() == 60
    assert centroids.count() == 2
    # the two blobs separate perfectly
    labels = {r["id"]: r["cluster_id"] for r in assignments.collect()}
    blob_a = {labels[i] for i in range(30)}
    blob_b = {labels[i] for i in range(30, 60)}
    assert len(blob_a) == 1 and len(blob_b) == 1 and blob_a != blob_b
