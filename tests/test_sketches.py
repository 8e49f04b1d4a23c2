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
