"""Streaming banned-phrase ingest filter (streaming/search.py)."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark.streaming.search import (
    process_phrase_filter_batch,
    streaming_phrase_filter,
)

PROBES = [(0, "forbidden phrase"), (1, "alpha bravo charlie")]

DOCS = [
    (1, "a clean document with nothing wrong"),
    (2, "contains the Forbidden, phrase right here"),
    (3, "alpha bravo charlie then alpha bravo charlie again"),
    (4, "alpha bravo delta is fine (prefix only)"),
    (5, None),
    (6, "forbidden phrase AND alpha bravo charlie"),
]


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # two files -> two micro-batches at maxFilesPerTrigger=1
    for fname, rows in (("p1.json", DOCS[:3]), ("p2.json", DOCS[3:])):
        with open(d / fname, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    return str(d)


def _run(spark, stream_dir, tmp_path):
    out, flag, ck = (
        str(tmp_path / "out"),
        str(tmp_path / "flag"),
        str(tmp_path / "ck"),
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
    )
    q = streaming_phrase_filter(stream, PROBES, out, flag, ck)
    q.awaitTermination(180)
    return out, flag, ck


def test_streaming_phrase_filter_partitions_the_input(
    spark, stream_dir, tmp_path
):
    out, flag, _ = _run(spark, stream_dir, tmp_path)
    kept = spark.read.parquet(out)
    flagged = spark.read.parquet(flag)
    kept_ids = {r.doc_id for r in kept.collect()}
    flag_rows = {r.doc_id: r for r in flagged.collect()}
    # exact partition of the input: matches quarantined, rest kept
    # (incl. the NULL-text and prefix-only docs)
    assert kept_ids == {1, 4, 5}
    assert set(flag_rows) == {2, 3, 6}
    # evidence: smallest matching probe + total occurrences
    assert flag_rows[2].first_phrase_id == 0 and flag_rows[2].n_phrase_hits == 1
    assert flag_rows[3].first_phrase_id == 1 and flag_rows[3].n_phrase_hits == 2
    assert flag_rows[6].first_phrase_id == 0 and flag_rows[6].n_phrase_hits == 2


def test_streaming_phrase_filter_matches_batch_operator(
    spark, stream_dir, tmp_path
):
    from dbscan_pyspark_spark.operators.search import phrase_search

    out, flag, _ = _run(spark, stream_dir, tmp_path)
    flagged_ids = {r.doc_id for r in spark.read.parquet(flag).collect()}
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    probes = spark.createDataFrame(PROBES, "phrase_id int, phrase_text string")
    batch_ids = {
        r.doc_id for r in phrase_search(docs, probes).select("doc_id").distinct().collect()
    }
    assert flagged_ids == batch_ids  # stream == batch (filter is stateless)


def test_phrase_filter_batch_replay_is_idempotent(spark, tmp_path):
    out, flag = str(tmp_path / "o"), str(tmp_path / "f")
    batch = spark.createDataFrame(DOCS, "doc_id long, text string")
    process_phrase_filter_batch(batch, 7, PROBES, out, flag)
    first = sorted(
        (r.doc_id, r.first_phrase_id)
        for r in spark.read.parquet(flag).collect()
    )
    # replay the same batch id: partition overwritten, not duplicated
    process_phrase_filter_batch(batch, 7, PROBES, out, flag)
    again = sorted(
        (r.doc_id, r.first_phrase_id)
        for r in spark.read.parquet(flag).collect()
    )
    assert first == again
    kept = spark.read.parquet(out)
    assert {r.doc_id for r in kept.collect()} == {1, 4, 5}
    # all-clean batch: flagged side still writes (empty partition with
    # no data files) — the overwrite is what clears stale rows on
    # replay, so it must run unconditionally
    clean = spark.createDataFrame(
        [(9, "totally fine")], "doc_id long, text string"
    )
    process_phrase_filter_batch(clean, 8, PROBES, out, flag)
    assert os.path.exists(f"{flag}/ingest_batch=8")
    assert sorted(
        (r.doc_id, r.first_phrase_id)
        for r in spark.read.parquet(flag).collect()
    ) == first  # no rows added by the empty overwrite
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 4, 5, 9}


def test_phrase_filter_replay_with_changed_probes_clears_stale(
    spark, tmp_path
):
    """A replayed batch whose split CHANGED (probe set edited between
    runs) must not leave the earlier run's rows in either sink: both
    partition dirs are overwritten unconditionally, so a doc can never
    appear in both sinks after a replay (review finding)."""
    out, flag = str(tmp_path / "o"), str(tmp_path / "f")
    batch = spark.createDataFrame(DOCS, "doc_id long, text string")
    process_phrase_filter_batch(batch, 3, PROBES, out, flag)
    flagged_before = {r.doc_id for r in spark.read.parquet(flag).collect()}
    assert flagged_before  # the probes flag something
    # replay batch 3 with a probe set that matches NOTHING
    process_phrase_filter_batch(
        batch, 3, [(0, "zzz qqq xxx never present")], out, flag
    )
    flagged_after = spark.read.parquet(flag)
    assert flagged_after.count() == 0  # stale flagged rows cleared
    kept_after = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept_after == {d for d, _ in DOCS}  # everything kept now
