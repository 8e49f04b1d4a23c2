from dbscan_pyspark_spark.functions.distance import (  # noqa: F401
    cosine_similarity,
    dot,
    l1_distance,
    l2_distance,
    l2_distance_sq,
    norm2,
)
