"""MLlib-backed alternates for the dedup / similarity / clustering
operators (BASELINE.json approach: "Spark DataFrame + MLlib pipeline").

The first-party implementations (dedup.py, similarity.py, kmember.py)
are pure DataFrame compositions whose results are engine-independent
and DuckDB-oracle-able. These variants trade that portability for
MLlib's tuned implementations:

- :func:`minhash_lsh_near_dups` — ``HashingTF`` + ``MinHashLSH``
  ``approxSimilarityJoin`` over shingle sets (Jaccard distance);
- :func:`brp_lsh_topk` — ``BucketedRandomProjectionLSH`` bucketed
  euclidean ANN (the LSH analogue of similarity.py's IVF path);
- :func:`kmeans_fit_predict` — ``pyspark.ml.clustering.KMeans``
  (the Lloyd core the reference hand-rolled, ``k-means.ipynb:cell0``).

All take/return plain DataFrames with array columns; Vector conversion
is internal. Seeds fixed -> deterministic given partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbscan_pyspark_spark.functions.text import normalized, shingles_from_tokens

try:  # MLlib ships with pyspark; guard anyway for minimal builds
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.feature import BucketedRandomProjectionLSH, HashingTF, MinHashLSH
    from pyspark.ml.functions import array_to_vector, vector_to_array

    HAS_MLLIB = True
except ImportError:  # pragma: no cover
    HAS_MLLIB = False


def _require_mllib() -> None:
    if not HAS_MLLIB:  # pragma: no cover
        raise ImportError("pyspark.ml is not available in this build")


def minhash_lsh_near_dups(
    df: DataFrame,
    threshold: float = 0.7,
    num_hash_tables: int = 8,
    n: int = 3,
    num_features: int = 1 << 18,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-dup pairs via MLlib MinHashLSH.

    Returns (a_id, b_id, jaccard_distance) with a_id < b_id where
    jaccard_distance (1 - Jaccard) <= threshold. HashingTF maps each
    distinct shingle to a sparse binary feature; MinHashLSH buckets by
    signature and ``approxSimilarityJoin`` verifies candidates.
    """
    _require_mllib()
    sh = df.select(
        F.col(id_col), F.split(normalized(text_col), " ").alias("_toks")
    ).select(F.col(id_col), shingles_from_tokens("_toks", n).alias("shingles"))
    sh = sh.where(F.size("shingles") > 0)

    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=num_features, binary=True
    )
    feats = tf.transform(sh)
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hash_tables, seed=42)
    model = mh.fit(feats)
    joined = model.approxSimilarityJoin(feats, feats, threshold, distCol="jaccard_distance")
    return (
        joined.where(F.col(f"datasetA.{id_col}") < F.col(f"datasetB.{id_col}"))
        .select(
            F.col(f"datasetA.{id_col}").alias("a_id"),
            F.col(f"datasetB.{id_col}").alias("b_id"),
            F.round("jaccard_distance", 6).alias("jaccard_distance"),
        )
    )


def brp_lsh_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 5,
    bucket_length: float = 2.0,
    num_hash_tables: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate euclidean top-k via BucketedRandomProjectionLSH
    ``approxSimilarityJoin`` + per-query window ranking.

    Returns (query_id, vec_id, distance, rank). Distance is euclidean —
    MLlib's BRP-LSH does not support cosine; for normalized embeddings
    the rankings coincide.
    """
    _require_mllib()
    from pyspark.sql import Window

    vec = vectors.select(
        F.col(id_col), array_to_vector(F.col(vec_col).cast("array<double>")).alias("v")
    )
    qs = queries.select(
        F.col(id_col).alias("query_id"),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("v"),
    )
    brp = BucketedRandomProjectionLSH(
        inputCol="v", outputCol="hashes", bucketLength=bucket_length,
        numHashTables=num_hash_tables, seed=42,
    )
    model = brp.fit(vec)
    # inf threshold: LSH buckets prune, the join returns candidates only
    joined = model.approxSimilarityJoin(qs, vec, float("inf"), distCol="distance")
    scored = joined.select(
        F.col("datasetA.query_id").alias("query_id"),
        F.col(f"datasetB.{id_col}").alias(id_col),
        F.round("distance", 6).alias("distance"),
    ).where(F.col("query_id") != F.col(id_col))
    w = Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def kmeans_fit_predict(
    points: DataFrame,
    n_clusters: int,
    max_iter: int = 20,
    seed: int = 42,
    features: str = "features",
    id_col: str = "id",
) -> tuple[DataFrame, DataFrame]:
    """MLlib KMeans over an array<double> feature column.

    Returns (assignments(id, cluster_id), centroids(cluster_id, centroid)).
    This is the unconstrained Lloyd core; kmember.py's repair pass can
    run on top of it for the k-member guarantee (init quality from
    kmeans|| beats the reference's uniform takeSample).
    """
    _require_mllib()
    vec = points.select(
        F.col(id_col), array_to_vector(F.col(features).cast("array<double>")).alias("v")
    )
    km = KMeans(k=n_clusters, maxIter=max_iter, seed=seed, featuresCol="v", predictionCol="cluster_id")
    model = km.fit(vec)
    assignments = model.transform(vec).select(id_col, "cluster_id")
    spark = points.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cluster_id int, centroid array<double>",
    )
    return assignments, centroids
