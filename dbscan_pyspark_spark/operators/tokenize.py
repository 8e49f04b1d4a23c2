"""Distributed BPE tokenizer induction and application.

Byte-pair encoding (Sennrich et al., ACL 2016) is the standard
subword-tokenizer construction for LLM training corpora; learning one
IS a corpus-scale aggregation problem, so it belongs in the engine:
the learner never materializes more than the word-frequency relation
(vocabulary-bounded, not corpus-bounded) plus one adjacent-pair
aggregate per merge round.

Everything is deterministic: integer pair counts, argmax with the
(count desc, left asc, right asc) total tie order, and a left-to-right
greedy re-segmentation fold — so a fixed-round run replays exactly on
any engine (the pagerank/k-means discipline; `doc_bpe_merges` carries
an unrolled-CTE DuckDB oracle built on the same list fold).

Character-level symbols over the engine's ``normalized`` text (ASCII
[a-z0-9 ]), merges never cross word boundaries — the textbook setup.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dbscan_pyspark_spark.functions.text import normalized


def _adjacent_pairs(syms: Column) -> Column:
    """Array of (left, right) structs for adjacent symbol pairs; empty
    for 1-symbol words. NOTE ``sequence(1, 0)`` DESCENDS in Spark, so
    the <2-symbol case must be guarded, not relied on to be empty."""
    return F.when(
        F.size(syms) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(syms) - 1),
            lambda j: F.struct(
                F.element_at(syms, j).alias("left"),
                F.element_at(syms, j + 1).alias("right"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<left:string,right:string>>"))


def _merge_fold(syms: Column, left: str, right: str) -> Column:
    """One greedy left-to-right merge pass: every adjacent (left, right)
    occurrence becomes the concatenated symbol; overlaps resolve
    leftmost-first (['a','a','b'] with (a,b) -> ['a','ab'], and
    ['a','a','a'] with (a,a) -> ['aa','a']) — the classic BPE rule.
    Expressed as a JVM-side ``aggregate`` fold, identical semantics to
    the oracle's DuckDB ``list_reduce``."""
    merged = F.lit(left + right)
    return F.when(F.size(syms) < 2, syms).otherwise(
        F.aggregate(
            F.slice(syms, 2, F.size(syms) - 1),
            F.array(F.element_at(syms, 1)),
            lambda acc, x: F.when(
                (F.element_at(acc, -1) == F.lit(left)) & (x == F.lit(right)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(merged)
                ),
            ).otherwise(F.concat(acc, F.array(x))),
        )
    )


def word_frequencies(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """The (word, count) relation of the normalized corpus — the
    vocabulary-bounded working set every BPE round re-segments.
    One tokenization pass + one word-keyed aggregate with map-side
    partials; at 100 TB this is the only corpus-wide pass the learner
    ever makes."""
    return (
        docs.select(
            F.explode(F.split(normalized(text_col), " ")).alias("w")
        )
        .where(F.col("w") != "")
        .groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("count"))
    )


def bpe_learn(
    docs: DataFrame | None,
    n_merges: int = 16,
    text_col: str = "text",
    min_pair_count: int = 2,
    word_counts: DataFrame | None = None,
) -> DataFrame:
    """Learn a BPE merge table from the corpus: ``n_merges`` rounds of
    (most frequent adjacent symbol pair -> new symbol), stopping early
    when no pair reaches ``min_pair_count``.

    Returns DataFrame(rank int, left string, right string, pair_count
    long) — rank is the merge order (0-based), exactly the artifact a
    tokenizer loads. Deterministic: integer counts, argmax tie-broken
    by (count desc, left, right).

    ``word_counts``: pass a pre-aggregated (w, count) relation (the
    :func:`word_frequencies` shape) instead of ``docs`` — large-corpus
    pipelines usually already maintain word counts, and starting from
    them skips the one corpus-wide pass entirely. Exactly equivalent
    to learning from the documents that produced the counts (pinned by
    test); exactly one of ``docs`` / ``word_counts`` must be given.

    Scale shape: ONE corpus pass builds the word-frequency relation
    (vocabulary-bounded — the 100 TB corpus collapses to |V| rows
    before any iteration starts); each round is one adjacent-pair
    explode + sum aggregate over that relation, one 1-row argmax pull
    to the driver (A7-bounded, the HITS per-round-max discipline —
    the pair must become a literal in the next round's fold
    expression), and one re-segmentation fold (no shuffle). The word
    relation is localCheckpointed per round: flat lineage, and the
    fold chain never deepens past one merge per plan. The driver loop
    bounds n_merges to the thousands in practice — each round is one
    small job over |V| rows, the same regime as every iterative
    operator here.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}"
        )
    if (docs is None) == (word_counts is None):
        raise ValueError(
            "bpe_learn: pass exactly one of docs / word_counts"
        )
    if word_counts is not None:
        spark = word_counts.sparkSession
        wf = word_counts.select(
            F.col("w").cast("string").alias("w"),
            F.col("count").cast("long").alias("count"),
        ).where(F.col("w").isNotNull() & (F.col("w") != ""))
    else:
        spark = docs.sparkSession
        wf = word_frequencies(docs, text_col)
    words = wf.select("count", F.split("w", "").alias("syms"))
    words = words.localCheckpoint(eager=True)
    merges: list[tuple[int, str, str, int]] = []
    try:
        for i in range(n_merges):
            best = (
                words.select(
                    "count", F.explode(_adjacent_pairs(F.col("syms"))).alias("p")
                )
                .groupBy("p.left", "p.right")
                .agg(F.sum("count").alias("cnt"))
                .where(F.col("cnt") >= min_pair_count)
                .orderBy(F.col("cnt").desc(), "left", "right")
                .first()
            )
            if best is None:
                break
            merges.append((i, best["left"], best["right"], int(best["cnt"])))
            prev = words
            words = words.select(
                "count",
                _merge_fold(F.col("syms"), best["left"], best["right"]).alias(
                    "syms"
                ),
            ).localCheckpoint(eager=True)
            prev.unpersist()
    finally:
        words.unpersist()
    return spark.createDataFrame(
        merges, "rank int, left string, right string, pair_count long"
    )


def bpe_apply(
    docs: DataFrame,
    merges: DataFrame | list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "bpe_tokens",
    chunk: int = 16,
) -> DataFrame:
    """Segment each document with a learned merge table: split the
    normalized text into words, each word into character symbols, then
    apply every merge in rank order (the standard BPE encode); the
    output column is the per-document token array with word-boundary
    flattening.

    ``merges`` is the :func:`bpe_learn` output (or a plain
    [(left, right), ...] list in rank order). A DataFrame is pulled to
    the driver — it is n_merges rows, the same bounded-artifact class
    as a centroid set.

    Scale shape: zero shuffles — every merge is a per-row array fold.
    Folds are applied ``chunk`` merges per projection with a
    localCheckpoint between chunks, so the codegen expression tree
    stays bounded however long the merge table is (one giant nested
    expression would fall back to interpreted evaluation and
    re-evaluate the whole chain per output row).
    """
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    if isinstance(merges, DataFrame):
        pulled = [
            (r["left"], r["right"])
            for r in merges.orderBy("rank").collect()
        ]
    else:
        pulled = list(merges)
    out = docs.withColumn(
        out_col,
        # coalesce: NULL text must segment to ZERO tokens like junk
        # text does (split/transform propagate NULL, and a NULL
        # n_tokens/tokens_str would diverge from the oracle's
        # LEFT-JOIN zero — review finding, pinned by
        # test_bpe_apply_null_text)
        F.coalesce(
            F.transform(
                F.filter(
                    F.split(normalized(text_col), " "),
                    lambda w: w != F.lit(""),
                ),
                lambda w: F.split(w, ""),
            ),
            F.array().cast("array<array<string>>"),
        ),
    )
    for start in range(0, len(pulled), chunk):
        for left, right in pulled[start : start + chunk]:
            out = out.withColumn(
                out_col,
                F.transform(
                    F.col(out_col), lambda s: _merge_fold(s, left, right)
                ),
            )
        if start + chunk < len(pulled):
            out = out.localCheckpoint(eager=True)
    return out.withColumn(out_col, F.flatten(F.col(out_col)))


def save_merges(
    merges: DataFrame | list[tuple], path: str
) -> None:
    """Persist a learned merge table as a single JSON file — the
    tokenizer artifact (n_merges rows, driver-small by construction;
    JSON round-trips the strings exactly). Accepts the
    :func:`bpe_learn` DataFrame or an already-pulled
    [(rank, left, right, pair_count), ...] / [(left, right), ...]
    list."""
    import json

    if isinstance(merges, DataFrame):
        rows = [
            (int(r["rank"]), r["left"], r["right"], int(r["pair_count"]))
            for r in merges.orderBy("rank").collect()
        ]
    else:
        rows = [
            (
                (i, m[0], m[1], None)
                if len(m) == 2
                else (int(m[0]), m[1], m[2], int(m[3]))
            )
            for i, m in enumerate(merges)
        ]
    with open(path, "w") as f:
        json.dump({"format": "bpe_merges.v1", "merges": rows}, f)


def load_merges(path: str) -> list[tuple[str, str]]:
    """Load a merge table saved by :func:`save_merges`; returns the
    rank-ordered [(left, right), ...] list :func:`bpe_apply` takes."""
    import json

    with open(path) as f:
        m = json.load(f)
    if m.get("format") != "bpe_merges.v1":
        raise ValueError(f"not a bpe_merges table: {path}")
    return [
        (r[1], r[2]) for r in sorted(m["merges"], key=lambda r: int(r[0]))
    ]
