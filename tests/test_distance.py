import math

from pyspark.sql import functions as F

from dbscan_pyspark_spark.functions import (
    cosine_similarity,
    dot,
    l1_distance,
    l2_distance,
)


def test_distances(spark):
    df = spark.createDataFrame(
        [([1.0, 2.0, 3.0], [4.0, 0.0, 3.0])], ["a", "b"]
    )
    row = df.select(
        l1_distance("a", "b").alias("l1"),
        l2_distance("a", "b").alias("l2"),
        dot("a", "b").alias("dp"),
        cosine_similarity("a", "b").alias("cos"),
    ).first()
    assert row["l1"] == 5.0
    assert abs(row["l2"] - math.sqrt(13)) < 1e-12
    assert row["dp"] == 13.0
    expected_cos = 13.0 / (math.sqrt(14) * math.sqrt(25))
    assert abs(row["cos"] - expected_cos) < 1e-12


def test_cosine_zero_vector_is_null(spark):
    df = spark.createDataFrame([([0.0, 0.0], [1.0, 1.0])], ["a", "b"])
    assert df.select(cosine_similarity("a", "b").alias("c")).first()["c"] is None
