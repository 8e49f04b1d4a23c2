"""Distributed DBSCAN with the reference's exact cluster semantics.

Pipeline (all DataFrame ops — SURVEY.md §3.1 rebuilt declaratively):

1. ε-pairs via the grid-bucketed self-join (not cartesian);
2. core points: neighbor count (incl. self and duplicate rows) >=
   min_pts (``DBSCAN.py:161``, HAVING semantics — P3);
3. edges core -> every ε-neighbor (``flattenPair``, ``DBSCAN.py:119-124,162``);
4. undirected connected components over those edges, vertices = all
   points (``DBSCAN.py:157,169-172``) — or, with ``variant='scc'``,
   only mutual core-core edges survive, reproducing the directed
   strongly-connected-components variant
   (``DBSCAN-strongly-connected-component.py:174``): clusters are sets
   of mutually-reachable core points, border points fall out;
5. components with >= min_cluster_size members are clusters, everything
   else is noise (``DBSCAN.py:176-181`` — the anonymity k, not min_pts).

Scale design — duplicate contraction (on by default): points sharing a
feature vector are interchangeable (same neighbors, same core status,
same component), so the join/CC graph runs over *distinct* vectors
weighted by multiplicity and labels are broadcast back by vector
equality. Low-cardinality/quantized data (the anonymization use case —
integer quasi-identifiers) contracts orders of magnitude; continuous
data contracts to ~n and costs one extra groupBy. All counts use
multiplicities, so the result is bit-identical to the uncontracted run:
neighbor counts still include self and duplicate rows, and an edgeless
duplicate group is still |group| singleton components, not one
component of size |group|.

Note the reference quirk, preserved on purpose: because edges run core ->
*all* neighbors, two cores farther than ε apart can merge through a
shared border point. That is its documented behavior (SURVEY.md §7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.components import connected_components
from dbscan_pyspark_spark.operators.eps_join import eps_join

# pair_strategy='auto' crossover: below this rep count the join is cheap
# and stage overhead dominates (symmetric measured faster at 58k reps,
# sf0.1); above it per-pair distance compute dominates and the half-pair
# join's 2x saving wins. A judgment call between the measured regimes —
# revisit with a cluster-scale measurement.
_HALF_PAIR_THRESHOLD = 500_000

# Below this rep count the label map (rep features + cluster id) is
# broadcast for the final expansion join, so the original points are
# never shuffled at all: measured 1.7s -> <0.1s at 600k points / 58k
# reps. ~1M reps * ~100B/row ≈ 100 MB broadcast — acceptable on any
# executor sizing we'd deploy; above it the expansion falls back to a
# shuffle join keyed by the feature hash (cheap long key, exact
# feature-equality residual).
_BROADCAST_EXPAND_THRESHOLD = 1_000_000


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
    contract_duplicates: bool = True,
    pair_strategy: str = "auto",
) -> DataFrame:
    """Cluster ``points`` -> DataFrame(id, cluster_id, is_noise).

    ``cluster_id`` is the minimum member id of the cluster (stable,
    deterministic — unlike GraphFrames' internal component numbering);
    NULL for noise. ``min_cluster_size`` defaults to ``min_pts`` and is
    the reference's k-anonymity threshold (``DBSCAN.py:47,176``).

    ``pair_strategy`` — how the ε-pair relation is built (AQE-style
    size-adaptive choice, measured not guessed):

    - ``'symmetric'``: one join emitting both pair orientations. Fewer
      stages; wins when duplicate contraction has already shrunk the
      graph so the join is cheap and the CC fixpoint dominates
      (A/B at sf0.1, 600k rows -> 58k reps: ~11.6s vs ~17.7s).
    - ``'half'``: unique-pairs join (half the candidate build, half the
      distance evaluations, (3^d+1)/2 probe-cell explode instead of
      3^d) + narrow mirror maps. Wins when the rep set stays large —
      continuous features at cluster scale — and per-pair compute, not
      stage count, is the bottleneck.
    - ``'auto'``: symmetric below ``_HALF_PAIR_THRESHOLD`` reps, half
      above; the rep count is one cheap job over the already-persisted
      contraction.
    """
    if min_cluster_size is None:
        min_cluster_size = min_pts
    if variant not in ("cc", "scc"):
        raise ValueError(f"variant must be 'cc' or 'scc', got {variant!r}")
    if pair_strategy not in ("auto", "symmetric", "half"):
        raise ValueError(
            f"pair_strategy must be 'auto', 'symmetric' or 'half', got {pair_strategy!r}"
        )

    # The input lineage (often a window/exchange-bearing view) feeds both
    # the contraction and the final expansion join — cache it once.
    points = points.persist()
    if dim is None:
        from dbscan_pyspark_spark.operators.eps_join import _dim_of

        dim = _dim_of(points, features)

    if contract_duplicates:
        # Group by one SCALAR double column per dimension, not by the
        # array: the array key runs an interpreted normalize lambda per
        # row per aggregation pass, scalar keys stay in codegen. Same
        # equivalence classes (per-element NaN/-0.0 normalization both
        # ways; feature arrays are non-null fixed-dim by construction
        # at every call site) and the rebuilt array carries the same
        # normalized element values the array key emitted.
        from dbscan_pyspark_spark.operators.eps_join import _contract_key_cols

        key_cols = [f"_f{i}" for i in range(dim)]
        reps = (
            points.select(F.col(id_col), *_contract_key_cols(features, dim))
            .groupBy(*key_cols)
            .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("_mult"))
            .select(
                F.array(*[F.col(k) for k in key_cols]).alias(features),
                F.col(id_col),
                F.col("_mult"),
            )
        )
    else:
        reps = points.select(features, id_col).withColumn("_mult", F.lit(1))
    reps = reps.persist()

    # One cheap job over the persisted contraction sizes BOTH adaptive
    # choices: the pair-join shape and the expansion-join strategy.
    n_reps = reps.count()
    if pair_strategy == "auto":
        pair_strategy = "half" if n_reps >= _HALF_PAIR_THRESHOLD else "symmetric"

    # Multiplicities (how many original rows each rep stands for) ride
    # through the cell join as payload — joining them onto the pair set
    # afterwards would shuffle the pairs a second time.
    pairs = edges = None
    try:
        if pair_strategy == "half":
            pairs = eps_join(
                reps, reps, eps, metric=metric, features=features,
                id_col=id_col, dim=dim, keep_distance=False,
                payload_a=["_mult"], payload_b=["_mult"], unique_pairs=True,
            ).persist()
            # each a<b pair feeds both endpoints' counts; every rep also
            # counts its own rows (the reference's self-pairs).
            legs = pairs.select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("a_id").alias("pid"), F.col("b__mult").alias("m")
                        ),
                        F.struct(
                            F.col("b_id").alias("pid"), F.col("a__mult").alias("m")
                        ),
                    )
                ).alias("e")
            ).select("e.pid", "e.m")
            counts = (
                legs.unionAll(
                    reps.select(F.col(id_col).alias("pid"), F.col("_mult").alias("m"))
                )
                .groupBy("pid")
                .agg(F.sum("m").alias("n_neighbors"))
            )
            cores = counts.where(
                F.col("n_neighbors") >= F.lit(int(min_pts))
            ).select(F.col("pid").alias("core_id"))
            if n_reps <= _BROADCAST_EXPAND_THRESHOLD:
                # <= n_reps single-long rows: broadcasting turns the
                # core-filter join into a map-side probe of the cached
                # pairs instead of shuffling the whole pair relation.
                cores = F.broadcast(cores)
            # reference edges run core -> every ε-neighbor incl. itself:
            # mirror the cached half pairs and add core self-loops.
            sym = pairs.select(
                F.col("a_id").alias("src"), F.col("b_id").alias("dst")
            ).unionAll(
                pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
            )
            edges = sym.join(cores, sym["src"] == cores["core_id"]).select(
                "src", "dst"
            ).unionAll(
                cores.select(
                    F.col("core_id").alias("src"), F.col("core_id").alias("dst")
                )
            )
        else:
            pairs = eps_join(
                reps, reps, eps, metric=metric, features=features, id_col=id_col,
                dim=dim, keep_distance=False, payload_b=["_mult"],
            ).withColumnRenamed("b__mult", "_mult_b").persist()
            counts = pairs.groupBy("a_id").agg(
                F.sum("_mult_b").alias("n_neighbors")
            )
            cores = counts.where(
                F.col("n_neighbors") >= F.lit(int(min_pts))
            ).select(F.col("a_id").alias("core_id"))
            if n_reps <= _BROADCAST_EXPAND_THRESHOLD:
                cores = F.broadcast(cores)
            edges = pairs.join(cores, pairs["a_id"] == cores["core_id"]).select(
                F.col("a_id").alias("src"), F.col("b_id").alias("dst")
            )
        if variant == "scc":
            # Directed mutual reachability == both orientations present ==
            # core-core ε-pairs.
            rev = edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            edges = edges.intersect(rev)
        edges = edges.persist()

        # Reps that appear in no edge expand to singleton components per
        # ORIGINAL row (an edgeless duplicate group is |group| singletons).
        # connected_components labels every edge participant, including
        # cores whose only edge is their self-loop (a duplicate group
        # dense enough to be its own cluster), so no vertex list — and
        # no distinct over the full edge relation — is needed here.
        labels = connected_components(edges, id_col=id_col, as_pandas=True)
        import pandas as pd

        labels_is_pdf = isinstance(labels, pd.DataFrame)
        if labels_is_pdf and not (
            n_reps <= _BROADCAST_EXPAND_THRESHOLD
            or len(labels) <= _BROADCAST_EXPAND_THRESHOLD
        ):
            # Graph small enough for driver union-find but the label set
            # is too big to broadcast back — rehydrate and take the
            # distributed finish.
            labels = points.sparkSession.createDataFrame(
                labels, f"{id_col} long, component long"
            )
            labels_is_pdf = False
        if labels_is_pdf or n_reps <= _BROADCAST_EXPAND_THRESHOLD:
            # Driver-side finish. Every structure here — graph labels,
            # rep multiplicities, the per-component mass — is bounded by
            # n_reps, the same bound that makes rep_map broadcastable
            # below, so this adds no scale risk the broadcast didn't
            # already accept. It replaces a chain of four small shuffle
            # joins (sizes, rep_labels, and their recomputed branches)
            # with two Arrow pulls and vectorized pandas: measured ~8 s
            # -> ~2 s on the sf0.1 lineitem cloud (58k reps).
            lab = labels if labels_is_pdf else labels.toPandas()
            mult = reps.select(id_col, "_mult").toPandas()
            m = lab.merge(mult, on=id_col, how="left")
            mass = m.groupby("component")["_mult"].transform("sum")
            cluster = m["component"].astype("Int64").where(
                mass >= int(min_cluster_size)
            )
            rep_labels_pdf = pd.DataFrame(
                {
                    "_rep_id": m[id_col].astype("int64"),
                    "cluster_id": cluster,
                    "_in_graph": True,
                }
            )
            rep_labels = F.broadcast(
                points.sparkSession.createDataFrame(
                    rep_labels_pdf,
                    "_rep_id long, cluster_id long, _in_graph boolean",
                )
            )
        else:
            # component mass = sum of member multiplicities (original rows)
            sizes = (
                labels.join(reps.select(id_col, "_mult"), id_col)
                .groupBy("component")
                .agg(F.sum("_mult").alias("_n"))
            )
            rep_labels = labels.join(sizes, "component").select(
                F.col(id_col).alias("_rep_id"),
                F.when(
                    F.col("_n") >= F.lit(int(min_cluster_size)), F.col("component")
                ).alias("cluster_id"),
                F.lit(True).alias("_in_graph"),
            )

        # Expand back to original rows by feature equality, equi-keyed on
        # the 64-bit feature hash (cheap to shuffle/compare; the exact
        # array equality stays as a residual so hash collisions cannot
        # mislabel). Small rep sets broadcast — the points side is then
        # never shuffled.
        rep_map = reps.select(
            F.col(features).alias("_rep_features"), F.col(id_col).alias("_rep_id")
        ).join(rep_labels, "_rep_id", "left").withColumn(
            "_rep_h", F.xxhash64("_rep_features")
        )
        if n_reps <= _BROADCAST_EXPAND_THRESHOLD:
            rep_map = F.broadcast(rep_map)
        pts_h = points.withColumn("_h", F.xxhash64(F.col(features)))
        out = pts_h.join(
            rep_map,
            (pts_h["_h"] == rep_map["_rep_h"])
            & (pts_h[features] == rep_map["_rep_features"]),
            "left",
        ).select(
            pts_h[id_col],
            # edgeless rep (no CC row): every original row is a singleton
            # component -> cluster of itself iff min_cluster_size <= 1
            F.when(
                F.col("_in_graph").isNull() & F.lit(min_cluster_size <= 1),
                pts_h[id_col],
            )
            .otherwise(F.col("cluster_id"))
            .alias("cluster_id"),
        ).withColumn("is_noise", F.col("cluster_id").isNull())
        out = out.localCheckpoint(eager=True)
    finally:
        for df in (pairs, edges):
            if df is not None:
                try:
                    df.unpersist()
                except Exception:
                    pass
        reps.unpersist()
        points.unpersist()
    return out


def dbscan_assign(
    new_points: DataFrame,
    trained_points: DataFrame,
    labels: DataFrame,
    eps: float,
    metric: str = "l1",
    features: str = "features",
    id_col: str = "id",
    dim: int | None = None,
) -> DataFrame:
    """Classify NEW points against a trained clustering (DBSCAN
    inference): a new point takes the cluster of its nearest labeled
    (non-noise) trained point within ``eps``; no such neighbor → noise.

    ``labels`` is :func:`dbscan`'s output for ``trained_points``.
    Ties break deterministically on (distance, cluster_id, member id).
    Nearest-MEMBER semantics (not nearest-core): every non-noise
    trained point attracts, which is the anonymization use case's
    contract (each labeled point already belongs to exactly one
    k-anonymous cell); classical core-only prediction is recoverable by
    passing a core-filtered ``labels``.

    Scale shape: the same grid-bucketed ε-join as training (no
    cartesian), cluster ids riding the join as payload; one groupBy on
    the new-point id for the argmin; the trained side shuffles once.
    Returns DataFrame(id, cluster_id, is_noise) for the new points.
    """
    members = trained_points.join(
        labels.where(~F.col("is_noise")).select(id_col, "cluster_id"),
        id_col,
    ).select(id_col, features, "cluster_id")
    pairs = eps_join(
        new_points,
        members,
        eps,
        metric=metric,
        features=features,
        id_col=id_col,
        dim=dim,
        keep_distance=True,
        payload_b=["cluster_id"],
    )
    best = (
        pairs.groupBy("a_id")
        .agg(
            F.min(
                F.struct(
                    F.col("distance"), F.col("b_cluster_id"), F.col("b_id")
                )
            ).alias("_best")
        )
        .select(
            F.col("a_id").alias(id_col),
            F.col("_best.b_cluster_id").alias("cluster_id"),
        )
    )
    return (
        new_points.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            "cluster_id",
            F.col("cluster_id").isNull().alias("is_noise"),
        )
    )
