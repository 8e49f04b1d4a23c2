"""Scale stress runs beyond the driver's sf0.1: synthetic data generated
in-memory (spark.range + deterministic hashes, no files), sized by CLI.

Usage: python tools/stress.py [n_points] [n_vectors]

- DBSCAN on n_points quantized 3-d integer points (the anonymization
  shape: low-cardinality quasi-identifiers). Duplicate contraction is
  the load-bearing scale path: the grid/CC graph runs over distinct
  vectors (bounded by the value-grid cardinality, here 21*21*11 per
  cluster pattern), not rows — which is exactly how a 100 TB run of
  the reference's use case behaves.
- IVF cosine ANN: n_vectors 16-d unit-ish vectors, 64 queries, top-5,
  8 cells, nprobe 3 — the bucketed scale path of similarity search.

Prints one JSON line per stage with wall seconds and result stats.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

N_POINTS = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
N_VECS = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000


def main() -> None:
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.dbscan import dbscan
    from dbscan_pyspark_spark.operators.similarity import ivf_cosine_topk
    from dbscan_pyspark_spark.session import get_session

    spark = get_session("stress")
    spark.range(1000).count()  # warm the JVM

    # --- DBSCAN at N_POINTS ---
    # Deterministic pseudo-random integer features: two dense blobs plus
    # a sparse background, quantized to an integer grid.
    base = spark.range(N_POINTS)
    h = F.abs(F.xxhash64("id"))
    pts = base.select(
        F.col("id"),
        F.array(
            (
                F.when(h % 3 < 2, (h % 21).cast("double"))  # blob at 0..20
                # sparse background: ~2M distinct cells -> real noise
                .otherwise(((h % 9973) + 40).cast("double"))
            ),
            ((h / F.lit(7)).cast("long") % 21).cast("double"),
            ((h / F.lit(149)).cast("long") % 11).cast("double"),
        ).alias("features"),
    )
    t0 = time.time()
    labels = dbscan(pts, eps=2.0, min_pts=64, min_cluster_size=64)
    stats = (
        labels.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("is_noise").cast("long")).alias("noise"),
            F.countDistinct("cluster_id").alias("clusters"),
        )
    ).first()
    print(
        json.dumps(
            {
                "stage": "dbscan",
                "n_points": N_POINTS,
                "wall_s": round(time.time() - t0, 1),
                "rows": stats["n"],
                "noise": stats["noise"],
                "clusters": stats["clusters"],
            }
        ),
        flush=True,
    )
    assert stats["n"] == N_POINTS

    # --- IVF ANN at N_VECS ---
    dim = 16
    vecs = spark.range(N_VECS).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[
                ((F.abs(F.xxhash64("id", F.lit(i))) % 1000) / 500.0 - 1.0)
                for i in range(dim)
            ]
        ).alias("embedding"),
    )
    queries = vecs.where(F.col("vec_id") % (N_VECS // 64) == 0)
    t0 = time.time()
    nn = ivf_cosine_topk(vecs, queries, k=5, n_cells=8, nprobe=3)
    n_nn = nn.count()
    print(
        json.dumps(
            {
                "stage": "ivf_ann",
                "n_vectors": N_VECS,
                "wall_s": round(time.time() - t0, 1),
                "result_rows": n_nn,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
