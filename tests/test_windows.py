from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.windows import (
    anti_top_k_per_group,
    argmin_row,
    top_k_per_group,
)

ROWS = [
    ("a", 1, 10.0),
    ("a", 2, 5.0),
    ("a", 3, 7.0),
    ("b", 4, 1.0),
    ("b", 5, 2.0),
]


def test_top_k(spark):
    df = spark.createDataFrame(ROWS, ["g", "id", "d"])
    got = {
        (r["g"], r["id"])
        for r in top_k_per_group(df, ["g"], [F.col("d"), F.col("id")], 2).collect()
    }
    assert got == {("a", 2), ("a", 3), ("b", 4), ("b", 5)}


def test_anti_top_k(spark):
    df = spark.createDataFrame(ROWS, ["g", "id", "d"])
    got = {
        (r["g"], r["id"])
        for r in anti_top_k_per_group(df, ["g"], [F.col("d"), F.col("id")], 2).collect()
    }
    assert got == {("a", 1)}


def test_argmin_row(spark):
    df = spark.createDataFrame(ROWS, ["g", "id", "d"])
    assert argmin_row(df, [F.col("d"), F.col("id")]).first()["id"] == 4
