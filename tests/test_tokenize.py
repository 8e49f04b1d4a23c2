"""BPE tokenizer induction/application (operators/tokenize.py)."""

from __future__ import annotations

from collections import Counter

import pytest

from dbscan_pyspark_spark.operators.tokenize import (
    bpe_apply,
    bpe_learn,
    word_frequencies,
)


def _py_bpe(texts, n_merges, min_count=2):
    """Row-at-a-time reference learner: max count, ties to the
    lexicographically smallest (left, right)."""
    wc = Counter(w for t in texts for w in t.split())
    words = {w: list(w) for w in wc}
    merges = []
    for i in range(n_merges):
        pc: Counter = Counter()
        for w, syms in words.items():
            for a, b in zip(syms, syms[1:]):
                pc[(a, b)] += wc[w]
        cands = [(c, a, b) for (a, b), c in pc.items() if c >= min_count]
        if not cands:
            break
        c, a, b = sorted(cands, key=lambda t: (-t[0], t[1], t[2]))[0]
        merges.append((i, a, b, c))
        for w, syms in words.items():
            out = [syms[0]]
            for x in syms[1:]:
                if out[-1] == a and x == b:
                    out[-1] = a + b
                else:
                    out.append(x)
            words[w] = out
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new",
    "low new lower newer",
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )


def test_bpe_learn_matches_python_reference(spark, docs):
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(docs, n_merges=6).orderBy("rank").collect()
    ]
    assert got == _py_bpe(TEXTS, 6)


def test_bpe_learn_early_stop(spark):
    # every pair unique -> nothing reaches min_pair_count=2 after the
    # shared "ab" merge is exhausted
    docs = spark.createDataFrame(
        [(1, "abc abd")], "doc_id long, text string"
    )
    got = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(docs, n_merges=10).orderBy("rank").collect()
    ]
    assert got == _py_bpe(["abc abd"], 10)
    assert len(got) < 10  # stopped early, not padded


def test_bpe_learn_overlap_is_leftmost_greedy(spark):
    # "aaaa" x2: merge (a,a) counts 3 per word (adjacent positions),
    # then re-segmentation gives [aa, aa], NOT [a, aa, a]
    docs = spark.createDataFrame(
        [(1, "aaaa aaaa")], "doc_id long, text string"
    )
    merges = bpe_learn(docs, n_merges=2).orderBy("rank").collect()
    assert (merges[0].left, merges[0].right, merges[0].pair_count) == ("a", "a", 6)
    assert (merges[1].left, merges[1].right) == ("aa", "aa")
    assert _py_bpe(["aaaa aaaa"], 2) == [
        (r.rank, r.left, r.right, r.pair_count) for r in merges
    ]


def test_bpe_learn_validates_params(spark, docs):
    with pytest.raises(ValueError, match="n_merges"):
        bpe_learn(docs, n_merges=0)
    with pytest.raises(ValueError, match="min_pair_count"):
        bpe_learn(docs, n_merges=1, min_pair_count=0)


def test_bpe_apply_learned_merges_and_chunking(spark, docs):
    merges = bpe_learn(docs, n_merges=6)
    toks_df = bpe_apply(docs, merges, chunk=2)
    toks1 = {r.doc_id: r.bpe_tokens for r in toks_df.collect()}
    # chunk boundary must not change the result
    toks_big = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(docs, merges, chunk=100).collect()
    }
    assert toks1 == toks_big
    # doc 0: "low lower lowest low low" under the learned merges
    assert toks1[0] == [
        "low", "low", "er", "low", "es", "t", "low", "low",
    ]
    # round-trip: concatenating tokens recovers the normalized words
    assert "".join(toks1[1]) == "newnewernewestnew"


def test_bpe_apply_plain_list_and_junk_doc(spark):
    docs = spark.createDataFrame(
        [(1, "the then"), (2, "!!! ...")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(docs, [("t", "h"), ("th", "e")]).collect()
    }
    assert got[1] == ["the", "the", "n"]
    assert got[2] == []  # all-junk doc keeps its row, zero tokens
    with pytest.raises(ValueError, match="chunk"):
        bpe_apply(docs, [("t", "h")], chunk=0)


def test_word_frequencies(spark, docs):
    wf = {r.w: r["count"] for r in word_frequencies(docs).collect()}
    assert wf["low"] == 4 and wf["newer"] == 2 and wf["lowest"] == 1


def test_merge_table_save_load_roundtrip(spark, docs, tmp_path):
    from dbscan_pyspark_spark.operators.tokenize import (
        load_merges,
        save_merges,
    )

    merges = bpe_learn(docs, n_merges=5)
    p = str(tmp_path / "merges.json")
    save_merges(merges, p)
    loaded = load_merges(p)
    assert loaded == [(r.left, r.right) for r in merges.orderBy("rank").collect()]
    # applying the loaded table reproduces the DataFrame-driven apply
    a = {r.doc_id: r.bpe_tokens for r in bpe_apply(docs, merges).collect()}
    b = {r.doc_id: r.bpe_tokens for r in bpe_apply(docs, loaded).collect()}
    assert a == b
    # plain pair-list save path + format guard
    save_merges(loaded, p)
    assert load_merges(p) == loaded
    import json
    import pytest as _pytest

    with open(p, "w") as f:
        json.dump({"format": "other"}, f)
    with _pytest.raises(ValueError, match="bpe_merges"):
        load_merges(p)


def test_bpe_apply_null_text(spark):
    # NULL text segments to ZERO tokens (like all-junk text), never to
    # NULL — the oracle's LEFT-JOIN zero depends on it
    docs = spark.createDataFrame(
        [(1, None), (2, "the")], "doc_id long, text string"
    )
    got = {
        r.doc_id: r.bpe_tokens
        for r in bpe_apply(docs, [("t", "h")]).collect()
    }
    assert got[1] == [] and got[2] == ["th", "e"]


def test_bpe_learn_from_word_counts_equivalent(spark, docs):
    from_docs = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(docs, n_merges=6).orderBy("rank").collect()
    ]
    wc = word_frequencies(docs)
    from_counts = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(None, n_merges=6, word_counts=wc)
        .orderBy("rank")
        .collect()
    ]
    assert from_docs == from_counts
    with pytest.raises(ValueError, match="exactly one"):
        bpe_learn(docs, n_merges=1, word_counts=wc)
    with pytest.raises(ValueError, match="exactly one"):
        bpe_learn(None, n_merges=1)
