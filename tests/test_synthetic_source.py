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
