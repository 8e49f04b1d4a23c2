"""Phase-level wall-clock profile of the dbscan_lineitem bench query.

Mirrors the CURRENT dbscan() internals step by step at
$SPARK_GRAFT_SF_DIR with a timestamp after each materializing action,
so the stage budget (pair join vs CC vs expansion vs checkpoint) is
measured, not guessed. Keep in sync with operators/dbscan.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dbscan_pyspark_spark.operators.components import (  # noqa: E402
    _driver_union_find,
)
from dbscan_pyspark_spark.operators.eps_join import eps_join  # noqa: E402
from dbscan_pyspark_spark.session import get_session  # noqa: E402
from dbscan_pyspark_spark.sources.tables import (  # noqa: E402
    load_table,
    points_from_lineitem,
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    eps, min_pts = 2.0, 16
    spark = get_session("profile-dbscan")
    warm = load_table(spark, sf_dir, "region")
    warm.join(F.broadcast(warm.select("r_regionkey")), "r_regionkey").count()

    marks: list[tuple[str, float]] = []
    t0 = time.time()

    def mark(name: str) -> None:
        marks.append((name, round(time.time() - t0, 3)))

    points = points_from_lineitem(spark, sf_dir).persist()
    reps = points.groupBy("features").agg(
        F.min("id").alias("id"), F.count(F.lit(1)).alias("_mult")
    ).persist()
    n_reps = reps.count()
    mark(f"contract+count ({n_reps} reps)")

    pairs = eps_join(
        reps, reps, eps, metric="l1", features="features", id_col="id",
        keep_distance=False, payload_b=["_mult"],
    ).withColumnRenamed("b__mult", "_mult_b").persist()

    counts = pairs.groupBy("a_id").agg(F.sum("_mult_b").alias("n_neighbors"))
    cores = F.broadcast(
        counts.where(F.col("n_neighbors") >= min_pts).select(
            F.col("a_id").alias("core_id")
        )
    )
    edges = pairs.join(cores, pairs["a_id"] == cores["core_id"]).select(
        F.col("a_id").alias("src"), F.col("b_id").alias("dst")
    ).persist()

    raw = edges.select(
        F.col("src").cast("long").alias("u"), F.col("dst").cast("long").alias("v")
    )
    n_raw = raw.count()
    mark(f"pairs->edges->raw.count cascade ({n_raw} edges)")

    lab = _driver_union_find(raw, "id")  # returns pandas since round 2
    mark("union-find (toPandas+solve)")
    mult = reps.select("id", "_mult").toPandas()
    m = lab.merge(mult, on="id", how="left")
    mass = m.groupby("component")["_mult"].transform("sum")
    cluster = m["component"].astype("Int64").where(mass >= min_pts)
    rep_labels_pdf = pd.DataFrame(
        {"_rep_id": m["id"].astype("int64"), "cluster_id": cluster, "_in_graph": True}
    )
    rep_labels = F.broadcast(
        spark.createDataFrame(
            rep_labels_pdf, "_rep_id long, cluster_id long, _in_graph boolean"
        )
    )
    mark("driver finish (2 pulls + pandas)")

    rep_map = reps.select(
        F.col("features").alias("_rep_features"), F.col("id").alias("_rep_id")
    ).join(rep_labels, "_rep_id", "left").withColumn(
        "_rep_h", F.xxhash64("_rep_features")
    )
    rep_map = F.broadcast(rep_map)
    pts_h = points.withColumn("_h", F.xxhash64(F.col("features")))
    out = pts_h.join(
        rep_map,
        (pts_h["_h"] == rep_map["_rep_h"])
        & (pts_h["features"] == rep_map["_rep_features"]),
        "left",
    ).select(
        pts_h["id"], F.col("cluster_id")
    ).withColumn("is_noise", F.col("cluster_id").isNull())
    out = out.localCheckpoint(eager=True)
    mark("expand+localCheckpoint")
    out.count()
    mark("final count")

    prev = 0.0
    for name, t in marks:
        print(f"{t:8.3f}  (+{t - prev:6.3f})  {name}")
        prev = t
    spark.stop()


if __name__ == "__main__":
    main()
