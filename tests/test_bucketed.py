"""Bucketed-table co-located joins and the salted skew join.

The 100 TB posture pieces SURVEY.md §4 calls out beyond AQE: pay the
fact-table shuffle once at write time (bucketing), and spread a hot key
over many tasks when AQE's size-based skew split can't apply (salting).
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from dbscan_pyspark_spark.operators.joins import salted_join
from dbscan_pyspark_spark.plans.inspect import shuffle_count
from dbscan_pyspark_spark.sources.io import write_bucketed
from dbscan_pyspark_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "t_lineitem_b", ["l_orderkey"], num_buckets=8)
    write_bucketed(o, "t_orders_b", ["o_orderkey"], num_buckets=8)
    yield "t_lineitem_b", "t_orders_b"
    spark.sql("DROP TABLE IF EXISTS t_lineitem_b")
    spark.sql("DROP TABLE IF EXISTS t_orders_b")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    li = spark.table(li_t)
    o = spark.table(o_t)
    # both the join and the follow-on agg reuse the write-time bucketing:
    # zero exchanges anywhere in the plan. Auto-broadcast is disabled so
    # the small test input exercises the same sort-merge path a 100 TB
    # fact-to-fact join would take.
    with _no_broadcast(spark):
        joined = li.join(o, li["l_orderkey"] == o["o_orderkey"]).groupBy(
            "l_orderkey"
        ).agg(F.sum("l_quantity").alias("q"))
        assert shuffle_count(joined) == 0
        n = joined.count()
    assert n > 0


def test_bucketed_join_matches_plain_join(spark, sf_dir, bucketed_tables):
    li_t, o_t = bucketed_tables
    bucketed = (
        spark.table(li_t)
        .join(spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey"))
        .count()
    )
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    plain = li.join(o, li["l_orderkey"] == o["o_orderkey"]).count()
    assert bucketed == plain


class _no_broadcast:
    def __init__(self, spark):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        return self

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.autoBroadcastJoinThreshold", self.prev)


def test_salted_join_matches_plain_inner(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    salted = salted_join(li, o, ["l_orderkey"], n_salts=4)
    plain = li.join(o, ["l_orderkey"])
    assert salted.count() == plain.count()
    # value-level spot check: per-key totals agree
    a = {
        r["l_orderkey"]: r["s"]
        for r in salted.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .limit(50)
        .collect()
    }
    b = {
        r["l_orderkey"]: r["s"]
        for r in plain.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("s"))
        .where(F.col("l_orderkey").isin(*a.keys()))
        .collect()
    }
    assert a == b


def test_salted_join_left_keeps_unmatched(spark):
    left = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    right = spark.createDataFrame([(1, 10.0), (2, 20.0)], ["k", "w"])
    out = salted_join(left, right, ["k"], n_salts=3, how="left").collect()
    assert len(out) == 3
    by_k = {r["k"]: r["w"] for r in out}
    assert by_k[3] is None and by_k[1] == 10.0
