"""kmeans_quantized: deterministic Lloyd's over embedding arrays.

Reference parity target: k-means.ipynb cell0 (random-restart RDD
Lloyd's). This variant trades restarts for determinism (lowest-id
init, grid-snapped centroids) so it is exactly reproducible — the
invariants below pin the semantics the DuckDB oracle replays.
"""

from __future__ import annotations

import numpy as np
import pytest

from dbscan_pyspark_spark.operators.kmeans import kmeans_quantized


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def _numpy_reference(vecs, k, n_iter, scale=1000):
    """Independent driver-side replica of the exact algorithm."""
    q = np.round(np.asarray(vecs, dtype=float) * scale).astype(np.int64)
    cents = [(i, q[i].copy()) for i in range(min(k, len(q)))]

    def assign(cents):
        out = np.empty(len(q), dtype=int)
        for j, v in enumerate(q):
            best = min(
                (int(((v - c) ** 2).sum()), cid) for cid, c in cents
            )
            out[j] = best[1]
        return out

    for _ in range(n_iter):
        a = assign(cents)
        new = []
        for cid in sorted(set(a)):
            members = q[a == cid]
            new.append(
                (cid, np.floor_divide(members.sum(axis=0), len(members)))
            )
        cents = new
    return assign(cents)


def test_separated_blobs_recovered(spark):
    rng = np.random.default_rng(7)
    blobs = np.concatenate(
        [rng.normal(loc=c, scale=0.05, size=(20, 4)) for c in (0.0, 5.0, -5.0)]
    )
    out = kmeans_quantized(_df(spark, blobs), k=3, n_iter=4).collect()
    labels = {r["vec_id"]: r["cluster"] for r in out}
    assert len(labels) == 60
    for blob in range(3):
        ids = range(blob * 20, blob * 20 + 20)
        assert len({labels[i] for i in ids}) == 1, "blob split across clusters"
    assert len({labels[i * 20] for i in range(3)}) == 3, "blobs merged"


@pytest.mark.parametrize("k,n_iter", [(2, 1), (3, 3), (5, 2)])
def test_matches_numpy_reference(spark, k, n_iter):
    rng = np.random.default_rng(k * 10 + n_iter)
    vecs = rng.normal(size=(40, 6))
    out = kmeans_quantized(_df(spark, vecs), k=k, n_iter=n_iter).collect()
    got = {r["vec_id"]: r["cluster"] for r in out}
    want = _numpy_reference(vecs, k, n_iter)
    assert got == {i: int(want[i]) for i in range(len(vecs))}


def test_deterministic_across_runs(spark):
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(30, 5))
    df = _df(spark, vecs)
    a = sorted(map(tuple, kmeans_quantized(df, k=4, n_iter=2).collect()))
    b = sorted(map(tuple, kmeans_quantized(df, k=4, n_iter=2).collect()))
    assert a == b


def test_fewer_rows_than_k(spark):
    vecs = [[0.0, 0.0], [10.0, 10.0]]
    out = kmeans_quantized(_df(spark, vecs), k=5, n_iter=2).collect()
    assert {r["vec_id"]: r["cluster"] for r in out} == {0: 0, 1: 1}


def test_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert kmeans_quantized(df, k=3, n_iter=2).count() == 0


def test_assignment_is_map_side_only(spark):
    """The final assignment pass must not shuffle: centroids live in the
    plan as literals, so the explained plan has no Exchange after the
    scan (the whole point of the argmin-as-expression design)."""
    rng = np.random.default_rng(1)
    df = _df(spark, rng.normal(size=(20, 3)))
    out = kmeans_quantized(df, k=2, n_iter=1)
    # out = one projection over the input; re-deriving it must be a
    # single stage. The iteration shuffles happen during the call (the
    # groupBy updates); the returned frame itself is exchange-free.
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_model_save_load_roundtrip_and_assign(spark, tmp_path):
    import numpy as np

    from dbscan_pyspark_spark.operators.kmeans import (
        assign_with_model,
        kmeans_fit,
        load_kmeans_model,
        save_kmeans_model,
    )

    rng = np.random.default_rng(17)
    blobs = np.concatenate(
        [rng.normal(loc=c, scale=0.05, size=(15, 4)) for c in (0.0, 8.0)]
    )
    df = _df(spark, blobs)
    assign, cents = kmeans_fit(df, k=2, n_iter=2)
    p = str(tmp_path / "model.json")
    save_kmeans_model(cents, p, scale=1000)
    loaded, scale = load_kmeans_model(p)
    assert loaded == cents and scale == 1000

    # assignment with the loaded model == the training assignment
    re_assigned = assign_with_model(df, loaded, scale=scale)
    a = sorted(map(tuple, assign.collect()))
    b = sorted(map(tuple, re_assigned.collect()))
    assert a == b
    # and the plan stays exchange-free (pure map-side inference)
    plan = re_assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_load_model_rejects_wrong_format(spark, tmp_path):
    import json

    import pytest

    from dbscan_pyspark_spark.operators.kmeans import load_kmeans_model

    p = tmp_path / "bad.json"
    p.write_text(json.dumps({"format": "other"}))
    with pytest.raises(ValueError, match="not a kmeans_quantized model"):
        load_kmeans_model(str(p))
