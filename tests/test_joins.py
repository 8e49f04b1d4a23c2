from datetime import datetime

from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.joins import asof_join, range_join


def _ts(minute, second=0, micro=0):
    return datetime(2024, 1, 1, 10, minute, second, micro)


def test_asof_backward_basic(spark):
    left = spark.createDataFrame(
        [(1, 1, _ts(5)), (2, 1, _ts(10)), (3, 2, _ts(5)), (4, 3, _ts(1))],
        ["event_id", "user_id", "ts"],
    )
    right = spark.createDataFrame(
        [(1, _ts(4), 40.0), (1, _ts(9), 90.0), (2, _ts(5), 55.0)],
        ["user_id", "ts", "v"],
    )
    out = {
        r["event_id"]: (r["ts_r"], r["v_r"])
        for r in asof_join(left, right, on=["user_id"], value_cols=["v"]).collect()
    }
    assert out[1] == (_ts(4), 40.0)
    assert out[2] == (_ts(9), 90.0)
    # exact timestamp match is visible (inclusive <=)
    assert out[3] == (_ts(5), 55.0)
    # user with no prior right row -> NULLs (left outer)
    assert out[4] == (None, None)


def test_asof_forward(spark):
    left = spark.createDataFrame([(1, 1, _ts(5))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        [(1, _ts(3), 30.0), (1, _ts(7), 70.0)], ["user_id", "ts", "v"]
    )
    out = asof_join(
        left, right, on=["user_id"], value_cols=["v"], direction="forward"
    ).collect()
    assert out[0]["ts_r"] == _ts(7) and out[0]["v_r"] == 70.0


def test_range_join_matches_bruteforce(spark):
    import random

    rng = random.Random(7)
    lrows = [(i, i % 3, _ts(rng.randrange(0, 50), rng.randrange(60))) for i in range(40)]
    rrows = [(100 + i, i % 3, _ts(rng.randrange(0, 50), rng.randrange(60))) for i in range(120)]
    left = spark.createDataFrame(lrows, ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(rrows, ["event_id", "user_id", "ts"])

    got = {
        (r["l_event_id"], r["r_event_id"])
        for r in range_join(
            left, right, on=["user_id"], lower_seconds=-300.0, upper_seconds=0.0
        ).collect()
    }
    expected = {
        (li, ri)
        for (li, lu, lt) in lrows
        for (ri, ru, rt) in rrows
        if lu == ru and 0 < (lt - rt).total_seconds() <= 300
    }
    assert got == expected


def test_range_join_window_is_half_open(spark):
    left = spark.createDataFrame([(1, 1, _ts(10))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame(
        # exactly -300s (included), exactly 0s (excluded), -301s (excluded)
        [(2, 1, _ts(5)), (3, 1, _ts(10)), (4, 1, _ts(4, 59))],
        ["event_id", "user_id", "ts"],
    )
    got = {
        r["r_event_id"]
        for r in range_join(
            left, right, on=["user_id"], lower_seconds=-300.0, upper_seconds=0.0
        ).collect()
    }
    assert got == {2}


def test_cosine_near_dup_exact_vs_lsh_subset(spark):
    from dbscan_pyspark_spark.operators.similarity import (
        cosine_near_dup_pairs,
        rp_lsh_near_dup_pairs,
    )
    import random

    rng = random.Random(3)
    base = [[rng.uniform(-1, 1) for _ in range(16)] for _ in range(20)]
    vecs = []
    for i, b in enumerate(base):
        vecs.append((2 * i, b))
        # a jittered near-duplicate of every base vector
        vecs.append((2 * i + 1, [x + rng.uniform(-0.01, 0.01) for x in b]))
    df = spark.createDataFrame(vecs, ["vec_id", "embedding"]).repartition(4)

    exact = {
        (r["a_id"], r["b_id"])
        for r in cosine_near_dup_pairs(df, threshold=0.98).collect()
    }
    # every planted near-dup pair is found
    assert {(2 * i, 2 * i + 1) for i in range(20)} <= exact

    lsh = {
        (r["a_id"], r["b_id"])
        for r in rp_lsh_near_dup_pairs(
            df, threshold=0.98, n_planes=16, rows_per_band=4
        ).collect()
    }
    # LSH output is a subset of exact, with decent recall on near-identical pairs
    assert lsh <= exact
    assert len(lsh) >= len(exact) * 0.5


def test_range_join_no_cartesian(spark):
    left = spark.createDataFrame([(1, 1, _ts(1))], ["event_id", "user_id", "ts"])
    right = spark.createDataFrame([(2, 1, _ts(1))], ["event_id", "user_id", "ts"])
    plan = range_join(left, right, on=["user_id"])._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoop" not in plan
