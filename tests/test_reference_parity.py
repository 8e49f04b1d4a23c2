"""End-to-end parity against the reference's own committed artifacts
(SURVEY.md §5.3-5.5): its input fixtures (`data.csv`, 1000x3;
`data10k_6attr.csv`, 10000x7) and its golden output
(`output/combine.json`, 10k anonymized rows from `DBSCAN.py:80-84`).

Cluster ids and float formatting are nondeterministic across engines,
so parity is checked as *semantics*: sensitive-attribute passthrough,
centroid-substitution invariants, and exact cluster/noise structure via
the driver-side oracle on the real 1000-point dataset with the real
parameters (`DBSCAN.py:29-34`: dimension=2, eps in [6,7), k=minPts=10).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators import (
    anonymize,
    dbscan,
    eps_sweep,
    information_loss,
)
from dbscan_pyspark_spark.sources import read_csv_points

REF = "/root/reference"
needs_reference = pytest.mark.skipif(
    not os.path.exists(f"{REF}/data.csv"), reason="reference checkout not present"
)


@needs_reference
def test_golden_output_sensitive_passthrough(spark):
    """The golden JSON rows carry the original sensitive attribute
    (pt._7) verbatim into an_pt._7 (`DBSCAN.py:84`), while the six QI
    slots become float centroids. Our anonymize() keeps that contract,
    so first pin down that the golden artifact really has it."""
    golden = spark.read.json(f"{REF}/output/combine.json")
    n = golden.count()
    assert n == 10000
    assert golden.where(F.col("an_pt._7") != F.col("pt._7")).count() == 0
    # QI slots are replaced: some centroid is non-integral (means of
    # int coordinates), and the distinct centroid count is the number
    # of clusters -- far below the row count.
    n_centroids = golden.select("an_pt._1", "an_pt._2", "an_pt._3").distinct().count()
    assert n_centroids < n / 5


@needs_reference
def test_data_csv_full_pipeline_matches_oracle(spark):
    """Run the real 1000-row fixture through dbscan with the reference's
    local parameters and compare the cluster/noise partition against a
    driver-side brute-force oracle of the reference semantics
    (cartesian neighbors incl. self, core >= minPts, CC over
    core->neighbor edges, component >= k is a cluster)."""
    pts = read_csv_points(spark, f"{REF}/data.csv", dimension=2)
    rows = [(r["id"], tuple(r["features"])) for r in pts.collect()]
    assert len(rows) == 1000

    eps, min_pts, k = 6.0, 10, 10  # DBSCAN.py:29-34,47 (local config)
    coords = dict(rows)
    ids = [i for i, _ in rows]
    nbrs = {
        i: [
            j
            for j in ids
            if abs(coords[i][0] - coords[j][0]) + abs(coords[i][1] - coords[j][1])
            < eps
        ]
        for i in ids
    }
    cores = {i for i in ids if len(nbrs[i]) >= min_pts}
    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for c in cores:
        for nb in nbrs[c]:
            ra, rb = find(c), find(nb)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in ids:
        comp.setdefault(find(i), set()).add(i)
    expected = {}
    for members in comp.values():
        label = min(members) if len(members) >= k else None
        for m in members:
            expected[m] = label

    got = {
        r["id"]: r["cluster_id"]
        for r in dbscan(pts, eps=eps, min_pts=min_pts, min_cluster_size=k).collect()
    }
    assert got == expected


@needs_reference
def test_data_csv_anonymization_invariants(spark):
    """Anonymized output on the real fixture satisfies the golden-file
    semantics: one row per input point, sensitive passthrough, every
    clustered point's an_features == its cluster's member mean, every
    cluster >= k members, noise assigned to the nearest centroid."""
    pts = read_csv_points(spark, f"{REF}/data.csv", dimension=2).persist()
    labels = dbscan(pts, eps=6.0, min_pts=10, min_cluster_size=10)
    an = anonymize(pts, labels).persist()

    assert an.count() == 1000
    assert an.select("id").distinct().count() == 1000
    # sensitive attribute rides through untouched
    orig = pts.select("id", F.col("sensitive").alias("s0"))
    assert an.join(orig, "id").where(F.col("sensitive") != F.col("s0")).count() == 0

    # clustered rows: an_features is exactly the mean of cluster members
    clustered = an.where(~F.col("is_noise"))
    recomputed = (
        clustered.groupBy("cluster_id")
        .agg(
            F.array(
                F.avg(F.col("features")[0]), F.avg(F.col("features")[1])
            ).alias("mean_f"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    bad = (
        clustered.join(recomputed, "cluster_id")
        .where(
            (F.abs(F.col("an_features")[0] - F.col("mean_f")[0]) > 1e-9)
            | (F.abs(F.col("an_features")[1] - F.col("mean_f")[1]) > 1e-9)
        )
        .count()
    )
    assert bad == 0
    assert recomputed.where(F.col("sz") < 10).count() == 0

    # noise rows carry some cluster's centroid (nearest assignment)
    cents = {
        tuple(r["mean_f"]) for r in recomputed.collect()
    }
    for r in an.where(F.col("is_noise")).collect():
        assert tuple(r["an_features"]) in cents
    an.unpersist()
    pts.unpersist()


@needs_reference
def test_data_csv_eps_sweep_metrics(spark):
    """eps_sweep on the real fixture over the reference's local range
    (eps in [6,7) -> the single value 6.0): metrics row matches an
    independent recomputation via information_loss, and best_eps is
    that value."""
    pts = read_csv_points(spark, f"{REF}/data.csv", dimension=2)
    metrics, best = eps_sweep(pts, [6.0], min_pts=10)
    rows = metrics.collect()
    assert best == 6.0 and len(rows) == 1
    m = rows[0]

    labels = dbscan(pts, eps=6.0, min_pts=10, min_cluster_size=10)
    ref = information_loss(pts, labels).collect()[0]
    assert m["n_clusters"] == ref["n_clusters"]
    assert m["n_noise"] == ref["n_noise"]
    assert abs(m["total_error"] - ref["total_error"]) < 1e-6


@needs_reference
@pytest.mark.slow
def test_data10k_6attr_scale_run(spark):
    """The 10k x 6-dim dataset is the one whose cartesian pair join
    crashed the reference's JVM (hs_err_pid*.log, BASELINE.md). The
    grid eps-join must handle it routinely at the reference's S3
    parameters (dimension=6, eps in [10,20), k=minPts=10,
    DBSCAN.py:39-47); eps=19 is the densest sweep point (at eps=10 the
    data has no core points at all — max 6 neighbors). One row per
    point, clusters all >= k."""
    pts = read_csv_points(spark, f"{REF}/data10k_6attr.csv", dimension=6)
    labels = dbscan(pts, eps=19.0, min_pts=10, min_cluster_size=10).persist()
    assert labels.count() == 10000
    sizes = (
        labels.where(F.col("cluster_id").isNotNull())
        .groupBy("cluster_id")
        .count()
    )
    assert sizes.where(F.col("count") < 10).count() == 0
    # the run must find real structure: at least one cluster, and not
    # everything collapsed into one
    n_clusters = sizes.count()
    assert n_clusters >= 1
    labels.unpersist()


@needs_reference
def test_golden_parquet_schema_and_payload_invariants(spark):
    """The k-means pipeline's committed parquet output
    (`output.txt/part-r-0000*.parquet`, written at
    `k-means.ipynb:cell0:L69-71`) read DIRECTLY: the schema is the six
    header-named nullable doubles, one row per input point carrying
    its cluster centroid. Cluster ids are nondeterministic, but the
    artifact's structure is exact and pinnable:

    - 10000 rows, 527 distinct centroids, multiplicities in [9, 32]
      (k=10 with the leftover-merge tail — a fixed artifact, so the
      observed stats ARE the contract);
    - centroid x multiplicity is integral per attribute (each centroid
      is the mean of its members' integer attributes, so the product
      recovers the integer member sum — any payload mis-read breaks
      this at the 1e-9 level);
    - per-attribute means equal the input fixture's means exactly
      (centroid substitution preserves attribute sums).
    """
    g = spark.read.parquet(f"{REF}/output.txt")
    headers = [
        "age", "height", "weight", "blood_sugar_level", "child",
        "exercise_hours",
    ]
    assert [
        (f.name, f.dataType.simpleString(), f.nullable)
        for f in g.schema.fields
    ] == [(h, "double", True) for h in headers]
    assert g.count() == 10000

    cents = g.groupBy(*headers).agg(F.count(F.lit(1)).alias("m"))
    stats = cents.agg(
        F.count(F.lit(1)).alias("n_cents"),
        F.min("m").alias("min_m"),
        F.max("m").alias("max_m"),
        *[
            F.max(
                F.abs(F.col(h) * F.col("m") - F.round(F.col(h) * F.col("m")))
            ).alias(f"_i{i}")
            for i, h in enumerate(headers)
        ],
    ).first()
    assert (stats["n_cents"], stats["min_m"], stats["max_m"]) == (527, 9, 32)
    assert all(stats[f"_i{i}"] < 1e-9 for i in range(len(headers)))

    src = read_csv_points(spark, f"{REF}/data10k_6attr.csv", dimension=6)
    src_means = src.select(
        *[
            F.avg(F.element_at("features", i + 1)).alias(f"a{i}")
            for i in range(6)
        ]
    ).first()
    out_means = g.agg(*[F.avg(h).alias(f"a{i}") for i, h in enumerate(headers)]).first()
    for i in range(6):
        assert abs(src_means[f"a{i}"] - out_means[f"a{i}"]) < 1e-9, headers[i]


@needs_reference
@pytest.mark.slow
def test_kmember_anonymize_matches_golden_semantics(spark):
    """Our kmember pipeline's parquet-output twin (kmember_anonymize)
    exhibits the SAME centroid-substitution invariants as the golden
    artifact, on a prefix of the same fixture: one row per point,
    every cluster >= k members, centroid x size integral per
    attribute, per-attribute sums preserved."""
    from dbscan_pyspark_spark.operators.kmember import (
        kmember_anonymize,
        kmember_kmeans,
    )

    pts = (
        read_csv_points(spark, f"{REF}/data10k_6attr.csv", dimension=6)
        .where(F.col("id") < 1000)
        .persist()
    )
    res = kmember_kmeans(pts, k=10, n_clusters=75, max_iter=5)
    out = kmember_anonymize(pts, res).persist()
    assert out.count() == 1000
    cents = out.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("m"),
        F.first("an_features").alias("c"),
    )
    stats = cents.agg(
        F.min("m").alias("min_m"),
        *[
            F.max(
                F.abs(
                    F.element_at("c", i + 1) * F.col("m")
                    - F.round(F.element_at("c", i + 1) * F.col("m"))
                )
            ).alias(f"_i{i}")
            for i in range(6)
        ],
    ).first()
    assert stats["min_m"] >= 10
    assert all(stats[f"_i{i}"] < 1e-6 for i in range(6))
    for i in range(6):
        src = pts.agg(F.sum(F.element_at("features", i + 1))).first()[0]
        sub = out.agg(F.sum(F.element_at("an_features", i + 1))).first()[0]
        assert abs(src - sub) < 1e-5, i
    out.unpersist()
    pts.unpersist()
