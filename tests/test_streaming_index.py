"""Incremental inverted-index maintenance (streaming/index.py)."""

from __future__ import annotations

import json

import pytest

from dbscan_pyspark_spark.operators.search import (
    bm25_topk,
    inverted_postings,
)
from dbscan_pyspark_spark.streaming.index import (
    bm25_serve,
    process_index_batch,
    read_index,
    streaming_postings_index,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a quick survey of brown bears and foxes"),
    (3, "lazy summer days with the dog by the river"),
    (4, "quick quick quick repetition weights the term"),
    (5, None),
    (6, "completely unrelated vocabulary entirely"),
]

QUERIES = [(0, "quick brown"), (1, "lazy dog"), (2, "missing-term")]


@pytest.fixture()
def stream_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    # three files -> three micro-batches at maxFilesPerTrigger=1
    for fname, rows in (
        ("p1.json", DOCS[:2]),
        ("p2.json", DOCS[2:4]),
        ("p3.json", DOCS[4:]),
    ):
        with open(d / fname, "w") as f:
            for doc_id, text in rows:
                f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    return str(d)


def _postings_set(df):
    return {(r["term"], r["doc_id"], r["tf"]) for r in df.collect()}


def test_stream_index_equals_batch_reindex(spark, stream_dir, tmp_path):
    """The union of per-batch postings partitions IS the batch
    operator's postings over the full ingested corpus, and BM25 served
    from the maintained index equals bm25_topk on the raw text."""
    idx, ck = str(tmp_path / "idx"), str(tmp_path / "ck")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .json(stream_dir)
    )
    q = streaming_postings_index(stream, idx, ck)
    q.awaitTermination(180)

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    postings, doclens = read_index(spark, idx)
    assert _postings_set(postings) == _postings_set(inverted_postings(docs))
    assert {(r["doc_id"], r["dl"]) for r in doclens.collect()} == {
        (1, 9), (2, 8), (3, 9), (4, 7), (6, 4),
    }  # doc 5 (NULL text) has no length row, exactly like the batch op

    queries = spark.createDataFrame(QUERIES, "query_id int, query_text string")
    served = sorted(
        tuple(r) for r in bm25_serve(spark, idx, queries, k=3).collect()
    )
    direct = sorted(tuple(r) for r in bm25_topk(docs, queries, k=3).collect())
    assert served == direct


def test_index_batch_replay_is_idempotent(spark, tmp_path):
    """Replaying a batch id rewrites only its own partitions — and a
    replay whose content CHANGED (doc edited between runs) leaves no
    stale postings behind."""
    idx = str(tmp_path / "idx")
    b0 = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    process_index_batch(b0, 0, idx)
    b1 = spark.createDataFrame(DOCS[3:], "doc_id long, text string")
    process_index_batch(b1, 1, idx)
    first = _postings_set(read_index(spark, idx)[0])

    # replay batch 1 unchanged: no duplication
    process_index_batch(b1, 1, idx)
    assert _postings_set(read_index(spark, idx)[0]) == first

    # replay batch 1 with doc 4's text changed: its old terms vanish
    b1_edited = spark.createDataFrame(
        [(4, "revised text now"), (5, None), (6, DOCS[5][1])],
        "doc_id long, text string",
    )
    process_index_batch(b1_edited, 1, idx)
    postings, doclens = read_index(spark, idx)
    got = _postings_set(postings)
    assert ("repetition", 4, 1) not in got  # stale posting cleared
    assert ("revised", 4, 1) in got
    assert {r["dl"] for r in doclens.where("doc_id = 4").collect()} == {3}


@pytest.mark.slow
def test_served_bm25_tracks_corpus_growth(spark, tmp_path):
    """df/N/avgdl are derived at query time, so a new batch shifts the
    global statistics without touching earlier partitions: serving
    after each ingest equals batch BM25 over the corpus-so-far."""
    idx = str(tmp_path / "idx")
    queries = spark.createDataFrame(QUERIES, "query_id int, query_text string")
    so_far = []
    for i, chunk in enumerate((DOCS[:2], DOCS[2:4], DOCS[4:])):
        so_far += chunk
        process_index_batch(
            spark.createDataFrame(chunk, "doc_id long, text string"), i, idx
        )
        served = sorted(
            tuple(r) for r in bm25_serve(spark, idx, queries, k=3).collect()
        )
        direct = sorted(
            tuple(r)
            for r in bm25_topk(
                spark.createDataFrame(so_far, "doc_id long, text string"),
                queries,
                k=3,
            ).collect()
        )
        assert served == direct, f"diverged after batch {i}"


def test_read_index_validate_detects_cross_batch_reingest(spark, tmp_path):
    """validate=True raises when a doc_id appears under two different
    ingest_batch ids (it would double-count in tf/df/N/avgdl); a clean
    index passes the same gate (ADVICE r9)."""
    import pytest as _pytest

    idx = str(tmp_path / "idx")
    b0 = spark.createDataFrame(DOCS[:3], "doc_id long, text string")
    process_index_batch(b0, 0, idx)
    b1 = spark.createDataFrame(DOCS[3:], "doc_id long, text string")
    process_index_batch(b1, 1, idx)
    read_index(spark, idx, validate=True)  # clean: no raise

    # re-ingest doc 1 under a NEW batch id — the invariant breach
    dup = spark.createDataFrame(DOCS[:1], "doc_id long, text string")
    process_index_batch(dup, 2, idx)
    with _pytest.raises(ValueError, match="more than one ingest_batch"):
        read_index(spark, idx, validate=True)
    # the default (serving) path still reads without the extra agg
    postings, _ = read_index(spark, idx)
    assert postings.count() > 0
