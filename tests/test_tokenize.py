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


def test_bpe_learn_driver_equals_distributed(spark, docs):
    """The driver-local merge loop (incremental pair counts + lazy
    argmax heap) replays the distributed per-round loop exactly —
    same merges, same tie order, same counts."""
    drv = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(docs, n_merges=12, mode="driver")
        .orderBy("rank")
        .collect()
    ]
    dist = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(docs, n_merges=12, mode="distributed")
        .orderBy("rank")
        .collect()
    ]
    assert drv == dist
    assert drv == _py_bpe(TEXTS, 12)


def test_bpe_learn_driver_equals_distributed_deep_and_early_stop(spark):
    """min_pair_count=1 drives merging until no pair is left; both
    paths must stop at the same rank with identical tables."""
    texts = ["abcabd xyzxy abab", "abab xyzzy mnopq", "abcabd abab"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    drv = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(docs, n_merges=64, min_pair_count=1, mode="driver")
        .orderBy("rank")
        .collect()
    ]
    dist = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(
            docs, n_merges=64, min_pair_count=1, mode="distributed"
        )
        .orderBy("rank")
        .collect()
    ]
    assert drv == dist
    assert drv == _py_bpe(texts, 64, min_count=1)
    assert 0 < len(drv) < 64  # real early stop exercised on both paths


def test_bpe_learn_auto_mode_threshold(spark, docs):
    """auto with driver_max_words=0 must fall back to the distributed
    loop and still produce the identical table."""
    forced_dist = [
        (r.rank, r.left, r.right, r.pair_count)
        for r in bpe_learn(docs, n_merges=6, driver_max_words=0)
        .orderBy("rank")
        .collect()
    ]
    assert forced_dist == _py_bpe(TEXTS, 6)
    with pytest.raises(ValueError, match="mode"):
        bpe_learn(docs, n_merges=1, mode="turbo")


def test_bpe_learn_rejects_nonpositive_word_counts(spark):
    """A corrupt pre-aggregated relation (zero/negative counts) must
    fail fast, not silently skew the pair-count argmax."""
    bad = spark.createDataFrame(
        [("low", 3), ("lower", 0)], "w string, count long"
    )
    with pytest.raises(ValueError, match="count <= 0"):
        bpe_learn(None, n_merges=2, word_counts=bad)
    neg = spark.createDataFrame(
        [("low", 3), ("lower", -1)], "w string, count long"
    )
    with pytest.raises(ValueError, match="count <= 0"):
        bpe_learn(None, n_merges=2, word_counts=neg)
