from dbscan_pyspark_spark.operators.eps_join import (  # noqa: F401
    eps_join,
    eps_self_join,
    neighbor_counts,
    core_points,
)
from dbscan_pyspark_spark.operators.components import connected_components  # noqa: F401
from dbscan_pyspark_spark.operators.dbscan import dbscan  # noqa: F401
from dbscan_pyspark_spark.operators.anonymize import (  # noqa: F401
    anonymize,
    cluster_centroids,
    eps_sweep,
    information_loss,
)
