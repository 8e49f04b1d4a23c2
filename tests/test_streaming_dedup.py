import json
import os

import pytest

from dbscan_pyspark_spark.streaming.events import read_event_stream, streaming_exact_dedup


@pytest.fixture(scope="module")
def dup_stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("dup_stream")
    rows = [
        {"event_id": 1, "ts": "2024-01-01T00:05:00.000Z", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 1, "ts": "2024-01-01T00:05:00.000Z", "user_id": 1, "event_type": "a", "value": 1.0, "props": "{}"},
        {"event_id": 2, "ts": "2024-01-01T00:06:00.000Z", "user_id": 1, "event_type": "b", "value": 2.0, "props": "{}"},
    ]
    with open(os.path.join(d, "p1.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    # the same event_id arrives again in a later file (within watermark)
    with open(os.path.join(d, "p2.json"), "w") as f:
        f.write(json.dumps(rows[0]) + "\n")
        f.write(json.dumps({"event_id": 3, "ts": "2024-01-01T00:07:00.000Z", "user_id": 2, "event_type": "c", "value": 3.0, "props": "{}"}) + "\n")
    return str(d)


def test_streaming_dedup_keeps_first_arrival(spark, dup_stream_dir):
    stream = read_event_stream(spark, dup_stream_dir, max_files_per_trigger=1)
    deduped = streaming_exact_dedup(stream, ["event_id"], watermark="1 hour")
    q = (
        deduped.writeStream.format("memory")
        .queryName("t_dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT event_id FROM t_dedup").collect()
    ids = sorted(r["event_id"] for r in rows)
    assert ids == [1, 2, 3]  # duplicates across files and within a file dropped


BASE = "the quick brown fox jumps over the lazy dog again and again today fine"


def _doc(doc_id, text):
    return {"doc_id": doc_id, "text": text}


def test_near_dup_batch_filter_across_batches(spark, tmp_path):
    from dbscan_pyspark_spark.streaming.dedup import process_near_dup_batch

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    b1 = spark.createDataFrame(
        [(1, BASE + " version one"), (2, "entirely different words about engines and planners")],
        "doc_id long, text string",
    )
    # doc 3 near-dups doc 1 (accepted in batch 0) -> dropped by the store;
    # doc 4 is new -> kept
    b2 = spark.createDataFrame(
        [(3, BASE + " version one bis"), (4, "yet another unrelated corpus entry with novel content")],
        "doc_id long, text string",
    )
    process_near_dup_batch(b1, 0, store, out, threshold=0.4)
    process_near_dup_batch(b2, 1, store, out, threshold=0.4)
    kept = sorted(
        r["doc_id"] for r in spark.read.parquet(out).select("doc_id").collect()
    )
    assert kept == [1, 2, 4]
    # store holds one signature row per accepted doc
    assert spark.read.parquet(store).count() == 3


def test_near_dup_batch_replay_is_idempotent(spark, tmp_path):
    from dbscan_pyspark_spark.streaming.dedup import process_near_dup_batch

    store, out = str(tmp_path / "store"), str(tmp_path / "out")
    b1 = spark.createDataFrame([(1, BASE)], "doc_id long, text string")
    process_near_dup_batch(b1, 0, store, out, threshold=0.4)
    # replay of the same micro-batch (foreachBatch failure semantics):
    # must not drop doc 1 against its own stored signature, nor duplicate
    process_near_dup_batch(b1, 0, store, out, threshold=0.4)
    assert [r["doc_id"] for r in spark.read.parquet(out).collect()] == [1]
    assert spark.read.parquet(store).count() == 1


def test_streaming_near_dup_filter_end_to_end(spark, tmp_path):
    from dbscan_pyspark_spark.streaming.dedup import streaming_near_dup_filter

    src = tmp_path / "src"
    src.mkdir()
    with open(src / "f0.json", "w") as f:
        f.write(json.dumps(_doc(1, BASE + " version one")) + "\n")
        f.write(json.dumps(_doc(2, "entirely different words about engines and planners")) + "\n")
    with open(src / "f1.json", "w") as f:
        f.write(json.dumps(_doc(3, BASE + " version one bis")) + "\n")
        f.write(json.dumps(_doc(4, "yet another unrelated corpus entry with novel content")) + "\n")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    q = streaming_near_dup_filter(
        stream,
        str(tmp_path / "store"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
        threshold=0.4,
    )
    q.awaitTermination(180)
    kept = sorted(
        r["doc_id"]
        for r in spark.read.parquet(str(tmp_path / "out")).select("doc_id").collect()
    )
    # doc 3 is dropped whether it shares a micro-batch with doc 1 (batch
    # dedup) or arrives later (store match); either batching yields 1,2,4
    assert kept == [1, 2, 4]
