"""Structured Streaming wrappers: file source -> memory sink, results
must match the batch operators on the same data."""

import json
import os
import tempfile

import pytest

from dbscan_pyspark_spark.operators.events import tumbling_agg
from dbscan_pyspark_spark.streaming.events import (
    read_event_stream,
    streaming_session_agg,
    streaming_tumbling_agg,
)

ROWS = [
    {"event_id": 1, "ts": "2024-01-01T00:05:00.000Z", "user_id": 10, "event_type": "click", "value": 1.0, "props": "{}"},
    {"event_id": 2, "ts": "2024-01-01T00:20:00.000Z", "user_id": 10, "event_type": "click", "value": 2.0, "props": "{}"},
    {"event_id": 3, "ts": "2024-01-01T01:05:00.000Z", "user_id": 10, "event_type": "view", "value": 3.0, "props": "{}"},
    {"event_id": 4, "ts": "2024-01-01T00:10:00.000Z", "user_id": 20, "event_type": "click", "value": 4.0, "props": "{}"},
]


@pytest.fixture(scope="module")
def stream_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("events_stream")
    with open(os.path.join(d, "part1.json"), "w") as f:
        for r in ROWS[:2]:
            f.write(json.dumps(r) + "\n")
    with open(os.path.join(d, "part2.json"), "w") as f:
        for r in ROWS[2:]:
            f.write(json.dumps(r) + "\n")
    return str(d)


def _run_stream(spark, sdf, name):
    q = (
        sdf.writeStream.format("memory")
        .queryName(name)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"SELECT * FROM {name}")


def test_streaming_tumbling_matches_batch(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = _run_stream(
        spark, streaming_tumbling_agg(stream, "1 hour", "2 hours"), "t_tumble"
    ).collect()
    batch_df = spark.read.json(stream_dir)
    from pyspark.sql import functions as F

    batch_df = batch_df.withColumn("ts", F.to_timestamp("ts"))
    batch = tumbling_agg(batch_df, "1 hour").collect()

    def key(rows):
        return sorted((r["window_start"], r["n_events"], float(r["sum_value"])) for r in rows)

    assert key(got) == key(batch)


def test_streaming_sessions(spark, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    got = _run_stream(
        spark, streaming_session_agg(stream, "30 minutes", "2 hours"), "t_sess"
    ).collect()
    by_user = {}
    for r in got:
        by_user.setdefault(r["user_id"], []).append(r["n_events"])
    assert sorted(by_user[10]) == [1, 2]  # 00:05+00:20 merged; 01:05 alone
    assert by_user[20] == [1]
