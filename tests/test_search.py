"""Ranked retrieval (operators/search.py): inverted postings + BM25."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.search import bm25_topk, inverted_postings


DOCS = [
    (1, "spark join filter join"),
    (2, "window merge sort"),
    (3, "spark spark spark window"),
    (4, "filter filter join window merge"),
    (5, "the quick brown fox"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _py_bm25(query_terms, k1=1.2, b=0.75):
    """Row-at-a-time reference scorer over DOCS."""
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    dfreq = {}
    for t in toks.values():
        for term in set(t):
            dfreq[term] = dfreq.get(term, 0) + 1
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for term in set(query_terms):
            tf = t.count(term)
            if not tf:
                continue
            idf = math.log(1 + (n - dfreq[term] + 0.5) / (dfreq[term] + 0.5))
            s += round(
                idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl)),
                9,
            )
        if s:
            scores[d] = round(s, 4)
    return scores


def test_bm25_matches_reference_scorer(spark, docs):
    probes = spark.createDataFrame(
        [(0, "spark join"), (1, "merge")], "query_id int, query_text string"
    )
    rows = bm25_topk(docs, probes, k=10).collect()
    got0 = {r.doc_id: r.score for r in rows if r.query_id == 0}
    got1 = {r.doc_id: r.score for r in rows if r.query_id == 1}
    assert got0 == pytest.approx(_py_bm25(["spark", "join"]))
    assert got1 == pytest.approx(_py_bm25(["merge"]))


def test_bm25_rank_order_and_k(spark, docs):
    probes = spark.createDataFrame(
        [(0, "spark join")], "query_id int, query_text string"
    )
    rows = bm25_topk(docs, probes, k=2).orderBy("rank").collect()
    assert len(rows) == 2
    assert [r.rank for r in rows] == [1, 2]
    assert rows[0].score >= rows[1].score


def test_bm25_unseen_terms_and_dup_query_terms(spark, docs):
    probes = spark.createDataFrame(
        [(0, "zzzz qqqq"), (1, "merge merge merge")],
        "query_id int, query_text string",
    )
    rows = bm25_topk(docs, probes, k=5).collect()
    # all-OOV query: no rows at all; repeated query term: weighted once
    assert not [r for r in rows if r.query_id == 0]
    got1 = {r.doc_id: r.score for r in rows if r.query_id == 1}
    assert got1 == pytest.approx(_py_bm25(["merge"]))


def test_bm25_validates_k(spark, docs):
    probes = spark.createDataFrame(
        [(0, "spark")], "query_id int, query_text string"
    )
    with pytest.raises(ValueError, match="k must be"):
        bm25_topk(docs, probes, k=0)


def test_inverted_postings_tf_and_positions(spark, docs):
    rows = inverted_postings(docs, with_positions=True).collect()
    by = {(r.term, r.doc_id): r for r in rows}
    assert by[("join", 1)].tf == 2
    assert by[("join", 1)].positions == [1, 3]
    assert by[("spark", 3)].positions == [0, 1, 2]
    # df(term) = number of postings rows for it
    assert sum(1 for (t, _), _r in by.items() if t == "window") == 3


def test_inverted_postings_without_positions(spark, docs):
    p = inverted_postings(docs)
    assert p.columns == ["term", "doc_id", "tf"]
    assert p.where((F.col("term") == "filter") & (F.col("doc_id") == 4)).first().tf == 2


def test_inverted_postings_junk_doc_contributes_nothing(spark):
    docs = spark.createDataFrame(
        [(1, "!!! ... ???"), (2, "real words")], "doc_id long, text string"
    )
    rows = inverted_postings(docs).collect()
    assert {r.doc_id for r in rows} == {2}


# ---------------------------------------------------------------------------
# phrase search


def test_phrase_search_semantics(spark):
    from dbscan_pyspark_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "aaa aaa aaa bbb"),
            (2, "the Quick, brown-fox! the quick"),
            (3, "nothing here"),
        ],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [
            (0, "aaa aaa"),       # overlapping occurrences
            (1, "the quick"),     # normalization strips punctuation
            (2, "quick brown fox"),
            (3, "zzz qqq"),       # absent
            (4, "aaa"),           # single token: occurrences == tf
        ],
        "phrase_id int, phrase_text string",
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in phrase_search(docs, phrases).collect()
    }
    assert got == {(0, 1): 2, (1, 2): 2, (2, 2): 1, (4, 1): 3}


def test_phrase_search_no_vacuous_match_and_boundaries(spark):
    from dbscan_pyspark_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [(1, "start middle end")], "doc_id long, text string"
    )
    phrases = spark.createDataFrame(
        [
            (0, "!!! ..."),        # normalizes to nothing: no match rows
            (1, "end start"),      # not contiguous in this order
            (2, "middle end"),     # suffix match
            (3, "start middle end extra"),  # longer than the doc
        ],
        "phrase_id int, phrase_text string",
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in phrase_search(docs, phrases).collect()
    }
    assert got == {(2, 1): 1}


def test_phrase_search_duplicate_doc_rows(spark):
    # a doc_id arriving on duplicate rows must still match (votes are
    # counted per distinct slot, not per row) — the streaming filter's
    # false-negative regression
    from dbscan_pyspark_spark.operators.search import phrase_search

    docs = spark.createDataFrame(
        [(1, "contains the forbidden phrase here")] * 2
        + [(2, "clean text")],
        "doc_id long, text string",
    )
    phrases = spark.createDataFrame(
        [(0, "forbidden phrase")], "phrase_id int, phrase_text string"
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in phrase_search(docs, phrases).collect()
    }
    assert got == {(0, 1): 1}


def test_phrase_search_randomized_python_crosscheck(spark):
    # 60 random docs x 12 random phrases over a 4-letter vocab in ONE
    # Spark job, verified against a row-at-a-time overlap counter —
    # dense enough that single/repeated-token phrases, overlaps, and
    # absences all occur
    import random

    from dbscan_pyspark_spark.operators.search import phrase_search

    rng = random.Random(11)
    vocab = ["aa", "bb", "cc", "dd"]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 12))))
        for i in range(60)
    ]
    phrases = [
        (j, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 3))))
        for j in range(12)
    ]

    def py_count(doc_toks, ph_toks):
        m = len(ph_toks)
        return sum(
            1
            for a in range(len(doc_toks) - m + 1)
            if doc_toks[a : a + m] == ph_toks
        )

    expected = {}
    for i, d in docs:
        dt = d.split()
        for j, p in phrases:
            n = py_count(dt, p.split())
            if n:
                expected[(j, i)] = n

    got = {
        (r.phrase_id, r.doc_id): r.n_occurrences
        for r in phrase_search(
            spark.createDataFrame(docs, "doc_id long, text string"),
            spark.createDataFrame(phrases, "phrase_id int, phrase_text string"),
        ).collect()
    }
    assert got == expected
