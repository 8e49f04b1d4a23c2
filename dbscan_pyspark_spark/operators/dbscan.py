"""Distributed DBSCAN with the reference's exact cluster semantics.

Pipeline (all DataFrame ops — SURVEY.md §3.1 rebuilt declaratively):

1. ε-pairs via the grid-bucketed self-join (not cartesian);
2. core points: neighbor count (incl. self) >= min_pts
   (``DBSCAN.py:161``, HAVING semantics — P3);
3. edges core -> every ε-neighbor (``flattenPair``, ``DBSCAN.py:119-124,162``);
4. undirected connected components over those edges, vertices = all
   points (``DBSCAN.py:157,169-172``) — or, with ``variant='scc'``,
   only mutual core-core edges survive, reproducing the directed
   strongly-connected-components variant
   (``DBSCAN-strongly-connected-component.py:174``): clusters are sets
   of mutually-reachable core points, border points fall out;
5. components with >= min_cluster_size members are clusters, everything
   else is noise (``DBSCAN.py:176-181`` — the anonymity k, not min_pts).

Note the reference quirk, preserved on purpose: because edges run core ->
*all* neighbors, two cores farther than ε apart can merge through a
shared border point. That is its documented behavior (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.components import connected_components
from dbscan_pyspark_spark.operators.eps_join import eps_self_join


def dbscan(
    points: DataFrame,
    eps: float,
    min_pts: int,
    min_cluster_size: int | None = None,
    metric: str = "l1",
    features: str = "features",
    id_col: str = "id",
    dim: int | None = None,
    variant: str = "cc",
) -> DataFrame:
    """Cluster ``points`` -> DataFrame(id, cluster_id, is_noise).

    ``cluster_id`` is the minimum member id of the cluster (stable,
    deterministic — unlike GraphFrames' internal component numbering);
    NULL for noise. ``min_cluster_size`` defaults to ``min_pts`` and is
    the reference's k-anonymity threshold (``DBSCAN.py:47,176``).
    """
    if min_cluster_size is None:
        min_cluster_size = min_pts
    if variant not in ("cc", "scc"):
        raise ValueError(f"variant must be 'cc' or 'scc', got {variant!r}")

    pairs = eps_self_join(
        points, eps, metric=metric, features=features, id_col=id_col, dim=dim,
        keep_distance=False,
    )
    # Reused by both the core-count agg and the edge build: one shuffle.
    pairs = pairs.persist()
    try:
        counts = pairs.groupBy("a_id").agg(F.count(F.lit(1)).alias("n_neighbors"))
        cores = counts.where(F.col("n_neighbors") >= F.lit(int(min_pts))).select(
            F.col("a_id").alias("core_id")
        )

        # Edges: core -> neighbor. Broadcast-friendly only when cores are few;
        # in general this is an equi-join on a_id — same partitioning as the
        # groupBy above, so AQE reuses the shuffle.
        edges = pairs.join(cores, pairs["a_id"] == cores["core_id"]).select(
            F.col("a_id").alias("src"), F.col("b_id").alias("dst")
        )
        if variant == "scc":
            # Directed mutual reachability == both orientations present ==
            # core-core ε-pairs. Equivalent to edges ∩ reverse(edges).
            rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            edges = edges.intersect(rev)

        labels = connected_components(
            edges, vertices=points.select(id_col), id_col=id_col
        )

        sizes = labels.groupBy("component").agg(F.count(F.lit(1)).alias("_n"))
        out = (
            labels.join(sizes, "component")
            .select(
                F.col(id_col),
                F.when(F.col("_n") >= F.lit(int(min_cluster_size)), F.col("component"))
                .alias("cluster_id"),
            )
            .withColumn("is_noise", F.col("cluster_id").isNull())
        )
        # Materialize before unpersisting the pair set feeding the CC loop.
        out = out.localCheckpoint(eager=True)
    finally:
        pairs.unpersist()
    return out
