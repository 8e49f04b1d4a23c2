"""Approximate-aggregate (sketch) error bounds vs exact answers.

The contract query ``approx_event_stats`` is rows-only (estimator
outputs differ across engines); these tests pin its accuracy: HLL++
(`approx_count_distinct`), the DataSketches HLL pair
(`hll_sketch_agg`/`hll_sketch_estimate`), and `percentile_approx`
against exact distinct counts and exact percentiles on the sf0.001
events table.
"""

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events(spark):
    return spark.read.parquet(f"{SF_DIR}/events.parquet").persist()


def test_hll_distinct_within_bounds(spark, events):
    rows = (
        events.groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact"),
            F.approx_count_distinct("user_id", rsd=0.02).alias("hllpp"),
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("ds_hll"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rsd=0.02 -> 2% relative standard deviation; allow 5 sigma
        assert abs(r["hllpp"] - r["exact"]) <= max(2, 0.10 * r["exact"])
        assert abs(r["ds_hll"] - r["exact"]) <= max(2, 0.10 * r["exact"])


def test_percentile_approx_within_rank_error(spark, events):
    exact, approx = (
        events.agg(
            F.expr("percentile(value, array(0.5, 0.95, 0.99))").alias("e"),
            F.percentile_approx(
                F.col("value").cast("double"), [0.5, 0.95, 0.99], 10_000
            ).alias("a"),
        )
        .first()
    )
    n = events.count()
    values = sorted(r["value"] for r in events.select("value").collect())
    for q, a in zip([0.5, 0.95, 0.99], approx):
        # percentile_approx guarantees rank error <= n/accuracy; assert the
        # returned value sits within that rank window of the exact quantile
        rank = q * (n - 1)
        tol = max(2.0, n / 10_000)
        lo = values[max(0, int(rank - tol))]
        hi = values[min(n - 1, int(rank + tol) + 1)]
        assert lo <= a <= hi


def test_sketches_merge_map_side(spark, events):
    # the plan must show a partial (map-side) aggregate carrying sketch
    # buffers -- i.e. two HashAggregate/ObjectHashAggregate levels around
    # the exchange, not a single post-shuffle aggregate over raw rows
    df = events.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("u"),
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("h"),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    n_aggs = plan.count("HashAggregate") + plan.count("ObjectHashAggregate")
    # two aggregate levels (partial + final) around the exchange; a
    # single post-shuffle aggregate over raw rows would show one
    assert "Exchange" in plan, plan
    assert n_aggs >= 2, plan


# ------------------------------------------- Misra-Gries heavy hitters


def test_mg_summary_state_bounded():
    """The per-partition MG generator never holds more than k counters
    and its total undercount stays within n/(k+1) — pure pandas, no
    Spark."""
    import pandas as pd

    from dbscan_pyspark_spark.operators.pipeline import _mg_summarize

    k = 5
    # 40 distinct keys, one planted heavy hitter at ~1/3 of the mass
    rows = ["hh"] * 200 + [f"k{i}" for i in range(40)] * 10
    batches = [
        pd.DataFrame({"x": rows[i : i + 50]}) for i in range(0, len(rows), 50)
    ]
    (out,) = list(_mg_summarize(iter(batches), "x", k))
    total_row = out[out["x"].isnull()]
    counters = out[out["x"].notnull()]
    n = int(total_row["_mg_c"].iloc[0])
    assert n == len(rows)
    assert len(counters) <= k
    est = dict(zip(counters["x"], counters["_mg_c"]))
    # lower bound within n/(k+1) of the truth for the heavy hitter
    assert 0 < est["hh"] <= 200
    assert 200 - est["hh"] <= n / (k + 1)


def test_approx_top_k_error_bound(spark, events):
    """Sketch mode: every estimate is a lower bound within
    n/(k+1) of the exact count, under adversarial partitioning."""
    from dbscan_pyspark_spark.operators.pipeline import approx_top_k

    df = events.select("event_type").repartition(16)
    got = {
        r["value"]: (r["est_count"], r["n_rows"])
        for r in approx_top_k(df, "event_type", k=10).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in df.groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    n = sum(exact.values())
    assert got, "no candidates returned"
    for v, (est, n_rows) in got.items():
        assert n_rows == n
        assert 0 < est <= exact[v]
        assert exact[v] - est <= n / 11


def test_approx_top_k_exact_recount_is_deterministic(spark):
    """Recount mode equals the SQL threshold set HAVING count*(k+1) > n
    regardless of partitioning — the MG guarantee (true > n/(k+1) =>
    candidate survives) made exact."""
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.pipeline import approx_top_k

    # 3 heavy keys above n/(k+1), a long tail below it, plus nulls
    data = (
        [("a",)] * 400 + [("b",)] * 300 + [("c",)] * 250
        + [(f"t{i}",) for i in range(60)] * 2 + [(None,)] * 5
    )
    df = spark.createDataFrame(data, "x string")
    want = {
        (r["x"] if r["x"] is not None else "__null__", r["n"])
        for r in df.groupBy("x")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") * 11 > len(data))
        .collect()
    }
    assert len(want) >= 3
    for parts in (1, 7, 32):
        got = {
            (r["value"], r["n_occurrences"])
            for r in approx_top_k(
                df.repartition(parts), "x", k=10, exact_recount=True
            ).collect()
        }
        assert got == want, parts


def test_approx_top_k_shuffles_summaries_not_rows(spark, events):
    """Only MG summary rows reach the merge shuffle — the raw relation
    stays inside the Arrow mapInPandas stage, which emits at most k+1
    rows per partition regardless of key cardinality: the property that
    makes the first-pass diagnostic affordable at 100 TB."""
    from dbscan_pyspark_spark.operators.pipeline import _mg_partials

    k, parts = 10, 8
    df = events.select("event_id").repartition(parts)
    _, partials = _mg_partials(df, "event_id", k)
    plan = partials._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan
    assert "Exchange hashpartitioning" not in plan, plan
    # bounded summary volume: <= (k+1) rows per partition, with far
    # more distinct event_ids than that in the raw relation
    assert df.distinct().count() > k * parts
    assert partials.count() <= (k + 1) * parts


def test_approx_top_k_validates_k(spark, events):
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import approx_top_k

    with _pytest.raises(ValueError):
        approx_top_k(events, "event_type", k=0)


def test_approx_top_k_weighted_recount_matches_sql(spark):
    """Weighted recount mode equals HAVING sum(w)*(k+1) > total_mass on
    every partitioning; nulls weigh 0."""
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.pipeline import approx_top_k

    data = (
        [("big", 100)] * 20 + [("mid", 30)] * 20
        + [(f"t{i}", 2) for i in range(50)] * 4
        + [("big", None)]  # null weight contributes 0 mass
    )
    df = spark.createDataFrame(data, "x string, w int")
    total = sum(w for _, w in data if w is not None)
    want = {
        (r["x"], r["m"])
        for r in df.groupBy("x")
        .agg(F.sum(F.coalesce("w", F.lit(0))).alias("m"))
        .where(F.col("m") * 5 > total)
        .collect()
    }
    assert want  # 'big' (2000) and 'mid' (600) vs total 3000, k=4
    for parts in (1, 5, 32):
        got = {
            (r["value"], r["n_occurrences"])
            for r in approx_top_k(
                df.repartition(parts), "x", k=4,
                exact_recount=True, weight_col="w",
            ).collect()
        }
        assert got == want, parts


def test_approx_top_k_weighted_bound_and_bad_weights(spark):
    """Weighted sketch mode: n_rows carries total MASS, the lower
    bound is within total_mass/(k+1), zero-mass keys never surface as
    candidates, and out-of-contract weights (negative, fractional,
    non-numeric) raise instead of silently flooring/zeroing."""
    import pytest as _pytest
    from pyspark.errors import PythonException, SparkRuntimeException

    from dbscan_pyspark_spark.operators.pipeline import approx_top_k

    data = [("hh", 50)] * 10 + [(f"t{i}", 1) for i in range(30)]
    data += [("ghost", None), ("ghost", 0)]  # zero observed mass
    df = spark.createDataFrame(data, "x string, w int").repartition(6)
    total = 500 + 30
    got = {
        r["value"]: (r["est_count"], r["n_rows"])
        for r in approx_top_k(df, "x", k=5, weight_col="w").collect()
    }
    est, mass = got["hh"]
    assert mass == total
    assert 0 < est <= 500 and 500 - est <= total / 6
    assert "ghost" not in got  # zero-mass key is not a candidate
    for bad_rows, schema in [
        ([("a", -1)], "x string, w int"),
        ([("a", 0.5)], "x string, w double"),
        ([("a", "many")], "x string, w string"),
        # over long range: try_cast('long') nulls on overflow — must
        # raise, not silently assign the key 0 mass (r5 advice)
        ([("a", float(2**64))], "x string, w double"),
        ([("a", str(2**70))], "x string, w string"),
    ]:
        bad = spark.createDataFrame(bad_rows, schema)
        with _pytest.raises((PythonException, SparkRuntimeException)):
            approx_top_k(bad, "x", k=2, weight_col="w").collect()
    # integral doubles are in-contract (50.0 weighs 50)
    okd = spark.createDataFrame([("a", 50.0)], "x string, w double")
    row = approx_top_k(okd, "x", k=2, weight_col="w").collect()[0]
    assert (row["value"], row["est_count"], row["n_rows"]) == ("a", 50, 50)
    # long weights above 2^53 keep exact precision: the double probe
    # only validates, the mass comes from the long cast
    big = spark.createDataFrame([("x", 2**53 + 1)], "x string, w long")
    row = approx_top_k(
        big, "x", k=2, exact_recount=True, weight_col="w"
    ).collect()[0]
    assert row["n_occurrences"] == 2**53 + 1


def test_mg_guarantee_property():
    """Hypothesis: for ANY multiset and ANY batch split, every key with
    count > n/(k+1) appears in the MG summary with a positive
    lower-bound estimate <= its true count, and the summary never
    exceeds k counters."""
    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dbscan_pyspark_spark.operators.pipeline import _mg_summarize

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(st.integers(0, 12), min_size=1, max_size=300),
        st.integers(1, 8),
        st.integers(1, 40),
    )
    def check(vals, k, batch_size):
        rows = [f"v{v}" for v in vals]
        batches = [
            pd.DataFrame({"x": rows[i : i + batch_size]})
            for i in range(0, len(rows), batch_size)
        ]
        (out,) = list(_mg_summarize(iter(batches), "x", k))
        counters = out[out["x"].notnull()]
        assert len(counters) <= k
        n = int(out[out["x"].isnull()]["_mg_c"].iloc[0])
        assert n == len(rows)
        est = dict(zip(counters["x"], counters["_mg_c"]))
        from collections import Counter

        true = Counter(rows)
        for key, cnt in true.items():
            if cnt * (k + 1) > n:
                assert key in est and 0 < est[key] <= cnt, (key, k)
            if key in est:
                assert est[key] <= cnt and cnt - est[key] <= n / (k + 1)

    check()
