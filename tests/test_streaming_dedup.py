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
