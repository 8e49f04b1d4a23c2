"""End-to-end pretraining-export pipeline: filter -> dedup -> BPE
tokenize -> pack -> shard export, with conservation asserted at every
stage boundary — the composition a user of the engine actually runs,
exercised as one flow rather than per-operator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.pipeline import (
    corpus_filter,
    pack_documents,
)
from dbscan_pyspark_spark.operators.tokenize import bpe_apply, bpe_learn
from dbscan_pyspark_spark.sources.io import export_training_shards, read_shard
from dbscan_pyspark_spark.sources.tables import load_table


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    return load_table(spark, sf_dir, "documents")


def test_pretraining_export_pipeline(spark, corpus, tmp_path_factory):
    n_in = corpus.count()

    # 1. filter: every input doc is accounted for exactly once
    labeled = corpus_filter(corpus, min_tokens=10, min_quality=0.0)
    labeled.persist()
    by_reason = {
        r["reason"]: r["count"]
        for r in labeled.groupBy("reason").count().collect()
    }
    assert sum(by_reason.values()) == n_in
    kept_ids = labeled.where(F.col("keep")).select("doc_id")
    n_kept = kept_ids.count()
    assert 0 < n_kept <= n_in

    kept = corpus.join(kept_ids, "doc_id")

    # 2. tokenize with a corpus-learned BPE table
    merges = bpe_learn(kept, n_merges=6)
    toks = bpe_apply(kept, merges).select(
        "doc_id", F.col("bpe_tokens"), F.size("bpe_tokens").alias("n_bpe")
    )
    toks.persist()
    assert toks.count() == n_kept
    # merging never creates or destroys characters: per-doc token
    # concatenation length == normalized char count minus spaces
    from dbscan_pyspark_spark.functions.text import normalized

    mismatch = (
        toks.join(corpus, "doc_id")
        .withColumn(
            "_chars",
            F.length(F.regexp_replace(normalized("text"), " ", "")),
        )
        .withColumn(
            "_tok_chars",
            F.aggregate(
                "bpe_tokens",
                F.lit(0),
                lambda acc, t: acc + F.length(t),
            ),
        )
        .where(F.col("_chars") != F.col("_tok_chars"))
        .count()
    )
    assert mismatch == 0

    # 3. pack into fixed-capacity bins: token mass conserved, no bin
    # except possibly each shard's LAST overflows capacity by less
    # than its final doc
    packed = pack_documents(
        toks, capacity=256, token_col="n_bpe", n_shards=4
    )
    total_tokens = toks.agg(F.sum("n_bpe")).first()[0]
    assert packed.agg(F.sum("n_tokens")).first()[0] == total_tokens
    bins = packed.groupBy("shard", "bin").agg(
        F.sum("n_tokens").alias("bin_tokens")
    )
    max_bin = bins.agg(F.max("bin_tokens")).first()[0]
    max_doc = toks.agg(F.max("n_bpe")).first()[0]
    assert max_bin < 256 + max_doc

    # 4. shard export: manifest row counts match, a pruned single-shard
    # read returns exactly its manifest count, and the union of all
    # shards is the packed corpus
    out_dir = str(tmp_path_factory.mktemp("e2e") / "shards")
    manifest = export_training_shards(
        packed.drop("bpe_tokens"), out_dir, n_shards=4
    )
    man = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    assert sum(man.values()) == n_kept
    s0 = read_shard(spark, out_dir, 0)
    assert s0.count() == man[0]
    assert s0.select("doc_id").distinct().count() == man[0]

    labeled.unpersist()
    toks.unpersist()
