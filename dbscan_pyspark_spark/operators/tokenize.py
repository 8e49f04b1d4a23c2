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


def _fold_py(syms: list[str], left: str, right: str) -> list[str]:
    """Driver twin of :func:`_merge_fold`: one greedy left-to-right
    merge pass over a symbol list, leftmost-first overlap resolution.
    Kept byte-identical in semantics to the Spark fold (and the
    oracle's DuckDB ``list_reduce``) so driver-mode and
    distributed-mode learning replay the same merges."""
    if len(syms) < 2:
        return syms
    merged = left + right
    out = [syms[0]]
    for x in syms[1:]:
        if out[-1] == left and x == right:
            out[-1] = merged
        else:
            out.append(x)
    return out


def _bpe_learn_driver(
    items: list[tuple[str, int]], n_merges: int, min_pair_count: int
) -> list[tuple[int, str, str, int]]:
    """Driver-local BPE induction over a pulled (word, count) relation.

    The classic fast-BPE structure: exact pair counts maintained
    incrementally (only words containing the merged pair are
    re-segmented per round) plus a lazy-deletion max-heap for the
    argmax, so a 32k-merge vocabulary costs O(total updates · log P)
    instead of 32k full recounts — and instead of 32k sequential Spark
    jobs.  Tie order is the same total order as the distributed loop:
    (count desc, left asc, right asc); symbols are ASCII (the engine's
    ``normalized`` alphabet), where Python and Spark/DuckDB string
    comparison coincide code-unit-for-code-unit.
    """
    import heapq
    from collections import Counter

    words: list[tuple[list[str], int]] = [
        (list(w), c) for w, c in items
    ]
    pair_counts: dict[tuple[str, str], int] = {}
    occ: dict[tuple[str, str], set[int]] = {}
    for idx, (syms, c) in enumerate(words):
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + c
            occ.setdefault(p, set()).add(idx)
    # Lazy heap: an entry is valid iff its count matches the live dict;
    # every count change pushes a fresh entry, so the top valid entry
    # is always the true argmax under (-count, left, right) order.
    heap = [(-cnt, l, r) for (l, r), cnt in pair_counts.items()]
    heapq.heapify(heap)
    merges: list[tuple[int, str, str, int]] = []
    for rank in range(n_merges):
        best = None
        while heap:
            negc, l, r = heap[0]
            cur = pair_counts.get((l, r), 0)
            if cur == -negc and cur > 0:
                best = (l, r, cur)
                break
            heapq.heappop(heap)
        if best is None or best[2] < min_pair_count:
            break
        l, r, cnt = best
        merges.append((rank, l, r, cnt))
        affected = occ.pop((l, r), set())
        changed: set[tuple[str, str]] = set()
        for idx in affected:
            syms, c = words[idx]
            new_syms = _fold_py(syms, l, r)
            words[idx] = (new_syms, c)
            old_p = Counter(zip(syms, syms[1:]))
            new_p = Counter(zip(new_syms, new_syms[1:]))
            for p, k in old_p.items():
                nk = pair_counts.get(p, 0) - k * c
                if nk > 0:
                    pair_counts[p] = nk
                else:
                    pair_counts.pop(p, None)
                changed.add(p)
                if p not in new_p and p != (l, r):
                    s = occ.get(p)
                    if s is not None:
                        s.discard(idx)
            for p, k in new_p.items():
                pair_counts[p] = pair_counts.get(p, 0) + k * c
                changed.add(p)
                occ.setdefault(p, set()).add(idx)
        # The greedy fold removes every (l, r) adjacency, so its count
        # lands at exactly zero; drop it rather than re-heap it.
        changed.discard((l, r))
        pair_counts.pop((l, r), None)
        for p in changed:
            c2 = pair_counts.get(p, 0)
            if c2 > 0:
                heapq.heappush(heap, (-c2, p[0], p[1]))
    return merges


def bpe_learn(
    docs: DataFrame | None,
    n_merges: int = 16,
    text_col: str = "text",
    min_pair_count: int = 2,
    word_counts: DataFrame | None = None,
    mode: str = "auto",
    driver_max_words: int = 2_000_000,
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

    ``mode``: ``"driver"`` pulls the vocabulary-bounded (word, count)
    relation to the driver and runs the merge loop locally with
    incremental pair counts + a lazy argmax heap — one Spark pass
    total, then pure-local rounds, the only shape that survives a
    production 32k-merge vocabulary (32k *distributed* rounds = 32k
    sequential Spark jobs).  ``"distributed"`` keeps every round on
    the cluster (one pair-agg + 1-row argmax + fold per merge) for
    vocabularies too large to pull.  ``"auto"`` (default) counts the
    word relation once and picks driver iff |V| <= driver_max_words.
    Both paths replay the identical (count desc, left, right) tie
    order and greedy fold, pinned equivalent by test.

    Scale shape: ONE corpus pass builds the word-frequency relation
    (vocabulary-bounded — the 100 TB corpus collapses to |V| rows
    before any iteration starts).  Driver mode then iterates locally
    over that A7-bounded artifact (a web-scale corpus's word relation
    at sensible min counts is single-digit-millions of rows — the
    centroid-set class, not the corpus class).  Distributed mode runs
    each round as one adjacent-pair explode + sum aggregate, one 1-row
    argmax pull (the HITS per-round-max discipline — the pair must
    become a literal in the next round's fold expression), and one
    re-segmentation fold (no shuffle), localCheckpointed per round so
    lineage stays flat.
    """
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    if min_pair_count < 1:
        raise ValueError(
            f"min_pair_count must be >= 1, got {min_pair_count}"
        )
    if mode not in ("auto", "driver", "distributed"):
        raise ValueError(f"bpe_learn: unknown mode {mode!r}")
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
        # Fail fast on a corrupt pre-aggregated relation: zero/negative
        # counts would silently skew the pair-count argmax (review
        # finding).  One cheap aggregate over the |V|-bounded relation;
        # its n_words also feeds the auto-mode decision.
        stats = wf.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(F.col("count") <= 0, F.lit(1)).otherwise(F.lit(0))
            ).alias("bad"),
        ).first()
        if (stats["bad"] or 0) > 0:
            raise ValueError(
                f"bpe_learn: word_counts has {stats['bad']} rows with "
                "count <= 0 — pre-aggregated counts must be positive"
            )
        n_words = int(stats["n"])
    else:
        spark = docs.sparkSession
        wf = word_frequencies(docs, text_col)
        n_words = None  # counted below only if auto mode needs it
    if mode == "auto":
        if n_words is None:
            wf = wf.localCheckpoint(eager=True)
            n_words = wf.count()
        use_driver = n_words <= driver_max_words
    else:
        use_driver = mode == "driver"
    if use_driver:
        items = [
            (r["w"], int(r["count"]))
            for r in wf.select("w", "count").collect()
        ]
        merges = _bpe_learn_driver(items, n_merges, min_pair_count)
        return spark.createDataFrame(
            merges, "rank int, left string, right string, pair_count long"
        )
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
