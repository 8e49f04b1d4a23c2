"""Custom Python Data Source (Spark 4 DataSource API): the synthetic
events generator must behave like a real table — partition-planned,
parallelism-invariant, and streamable with reproducible batches."""

from __future__ import annotations

from dbscan_pyspark_spark.sources.synthetic import register_synthetic_source


def _read(spark, **opts):
    register_synthetic_source(spark)
    r = spark.read.format("synthetic_events")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_schema_and_count(spark):
    df = _read(spark, n_rows=300, numPartitions=4)
    assert df.count() == 300
    assert df.columns == ["event_id", "ts", "user_id", "event_type", "value"]
    assert df.rdd.getNumPartitions() == 4
    assert df.select("event_id").distinct().count() == 300


def test_batch_read_parallelism_invariant(spark):
    a = sorted(map(tuple, _read(spark, n_rows=250, numPartitions=2).collect()))
    b = sorted(map(tuple, _read(spark, n_rows=250, numPartitions=9).collect()))
    assert a == b


def test_batch_read_seed_changes_data(spark):
    a = sorted(map(tuple, _read(spark, n_rows=100, seed=1).collect()))
    b = sorted(map(tuple, _read(spark, n_rows=100, seed=2).collect()))
    assert a != b


def test_stream_read_matches_batch(spark, tmp_path):
    register_synthetic_source(spark)
    stream = (
        spark.readStream.format("synthetic_events")
        .option("n_rows", 200)
        .option("rows_per_batch", 50)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("t_synth")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM t_synth").collect()))
    want = sorted(map(tuple, _read(spark, n_rows=200).collect()))
    assert got == want


def test_reader_pushes_event_id_range(spark):
    from pyspark.sql import functions as F

    df = _read(spark, n_rows=10_000, numPartitions=4)
    filtered = df.where((F.col("event_id") >= 100) & (F.col("event_id") < 120))
    rows = filtered.collect()
    assert sorted(r["event_id"] for r in rows) == list(range(100, 120))
    # the pushed range also shrinks partition planning: one narrow slice
    assert filtered.rdd.getNumPartitions() <= 4


def test_audit_sink_manifest(spark, tmp_path):
    import json

    register_synthetic_source(spark)
    path = str(tmp_path / "manifest.json")
    df = _read(spark, n_rows=500, numPartitions=5)
    df.write.format("audit_sink").option("path", path).mode("append").save()
    m = json.load(open(path))
    assert m["total_rows"] == 500
    assert m["n_partitions"] >= 1
    assert sum(n for n, _ in m["partition_checksums"]) == 500
