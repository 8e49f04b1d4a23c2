"""Full-text retrieval over a document corpus: inverted-index postings,
BM25 top-k keyword search, and exact token-phrase search.

Not in the reference (its corpus is numeric points), but a training-data
pipeline's standard text-retrieval primitive — finding the corpus
documents most relevant to a probe set (eval-leakage hunting, targeted
curation, dataset search). Built entirely from JVM-side expressions:
one tokenization pass, two map-side-combined aggregates, a broadcast of
the (tiny) query relation, and a partial top-k — no Python on the data
path.

Cross-engine exactness follows the ``doc_tfidf_top_terms`` precedent
(__spark_entry__.py): rank by the RAW double score with a unique
tie-break so rounding can't reorder, round only the emitted score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dbscan_pyspark_spark.functions.text import normalized
from dbscan_pyspark_spark.operators.windows import partial_top_k_per_group


def _terms(df: DataFrame, text_col: str, *keep: str) -> DataFrame:
    """One row per (keep..., term) token occurrence of the normalized
    text — the single tokenization pass every downstream relation
    derives from."""
    return df.select(
        *keep, F.explode(F.split(normalized(text_col), " ")).alias("term")
    ).where(F.col("term") != "")


def inverted_postings(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    with_positions: bool = False,
) -> DataFrame:
    """The inverted-index postings relation: one row per (term, doc)
    with the term frequency, optionally the sorted 0-based token
    positions (phrase/proximity queries need them; plain BM25 does
    not — default off, the positions array inflates the relation by
    the corpus token count).

    Returns DataFrame(term, <id_col>, tf [, positions array<int>]).

    Scale shape: one tokenization pass, one (term, doc) groupBy with
    map-side partial aggregation — the relation is hash-partitioned by
    term, exactly the layout a term-keyed retrieval join wants.
    Positions are collected inside the same aggregate (sorted for
    determinism), never a second shuffle.
    """
    if with_positions:
        tok = df.select(
            F.col(id_col),
            F.posexplode(F.split(normalized(text_col), " ")).alias(
                "pos", "term"
            ),
        ).where(F.col("term") != "")
        # pos indexes the split of the NORMALIZED text, which contains
        # no interior empty tokens (the only possible empty is the
        # all-junk document's single "", filtered above) — so pos IS
        # the 0-based token position, no re-rank needed
        return (
            tok.groupBy("term", id_col)
            .agg(
                F.count(F.lit(1)).cast("long").alias("tf"),
                F.sort_array(F.collect_list("pos")).alias("positions"),
            )
        )
    return (
        _terms(df, text_col, id_col)
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
    )


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    round_to: int = 4,
) -> DataFrame:
    """BM25 ranked retrieval (Robertson & Zaragoza, FnTIR 2009): for
    each query, the top-``k`` corpus documents by

        score(q, d) = Σ_{t ∈ q∩d}  idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    with the non-negative smoothed ``idf(t) = ln(1 + (N − df + 0.5) /
    (df + 0.5))``. Query terms are deduplicated (standard bag-of-words
    probe; repeating a term in the query does not double its weight).

    Returns DataFrame(query_id, <id_col>, score double, rank int) —
    rank by (score desc, doc id asc), score rounded to ``round_to``
    AFTER ranking so rounding cannot reorder (the doc_tfidf_top_terms
    discipline). Per-term weights are quantized to a 1e-9 grid and
    summed as DECIMAL — a float sum of 3+ addends is association-
    order-dependent (engines aggregate in different row orders), a
    decimal sum is exact, so the score and therefore the ranking
    replay bit-for-bit on any engine (the header contract's
    decimal-cast-before-summing rule; the 1e-9 quantization is far
    below any meaningful BM25 score difference).

    Scale shape: tf rides one (doc, term)-keyed shuffle and dl one
    doc-keyed shuffle, both map-side combined directly off the token
    stream — the corpus tokenizes twice, but each pass reduces before
    its exchange (dl ships doc-count partials, not tokens). The
    alternative (dl = per-doc sum of tf, serving every consumer from
    the single postings exchange via AQE ReusedExchange) was paired-
    A/B'd at 2M docs / 60M tokens: equal within host variance (26-39 s
    both shapes, 3 interleaved reps) — re-reading the 60M-row postings
    exchange costs about what the second codegen explode does, so the
    simpler direct shape stays. df derives from tf (never the raw
    stream). N and avgdl ride a 1-row aggregate broadcast onto the
    scored relation (no driver pull, stays lazy). The query
    relation is explicitly broadcast — retrieval probes are human-sized
    while the postings side is corpus-sized — so the only corpus-wide
    exchanges are the two index-build shuffles and the (query, doc)
    score aggregate, whose input is already pruned to postings of query
    terms. Top-k uses the partial-reduction ranker: each partition
    yields at most k·|queries| rows to the final per-query exchange, so
    a hot query cannot single-task the ranking.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tok = _terms(docs, text_col, id_col)
    tf = tok.groupBy(id_col, "term").agg(F.count(F.lit(1)).cast("long").alias("tf"))
    dl = tok.groupBy(id_col).agg(F.count(F.lit(1)).cast("long").alias("dl"))
    return bm25_topk_from_postings(
        tf,
        dl,
        queries,
        k=k,
        k1=k1,
        b=b,
        id_col=id_col,
        query_id_col=query_id_col,
        query_text_col=query_text_col,
        round_to=round_to,
    )


def bm25_topk_from_postings(
    postings: DataFrame,
    doclens: DataFrame,
    queries: DataFrame,
    k: int = 5,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    query_id_col: str = "query_id",
    query_text_col: str = "query_text",
    round_to: int = 4,
) -> DataFrame:
    """BM25 served from a MAINTAINED index instead of raw text: the
    (term, doc, tf) postings relation plus the (doc, dl) length
    relation — exactly what :func:`inverted_postings` emits and what
    the streaming index maintainer (``streaming/index.py``) accretes
    per ingest batch. The corpus-global quantities (df, N, avgdl) are
    derived here at query time — they are one map-side-combined
    aggregate over the (already term-partitioned) postings, NOT a
    re-tokenization of the corpus. :func:`bm25_topk` delegates to this
    after building tf/dl from text, so the two paths share the scoring
    math by construction: stream-maintained index ≡ batch re-index is
    pinned by test."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tf = postings.select(id_col, "term", F.col("tf").cast("long").alias("tf"))
    dl = doclens.select(id_col, F.col("dl").cast("long").alias("dl"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("long").alias("df"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    qterms = (
        queries.select(
            query_id_col,
            F.explode(
                F.array_distinct(F.split(normalized(query_text_col), " "))
            ).alias("term"),
        )
        .where(F.col("term") != "")
    )
    scored = (
        F.broadcast(qterms)
        .join(tf, "term")
        .join(dl, id_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "_w",
            F.log(
                1.0
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            )
            * (F.col("tf") * (k1 + 1.0))
            / (
                F.col("tf")
                + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
    )
    per_doc = scored.groupBy(query_id_col, id_col).agg(
        F.sum(F.round(F.col("_w"), 9).cast("decimal(28,9)")).alias("_score")
    )
    ranked = partial_top_k_per_group(
        per_doc,
        [query_id_col],
        [("_score", False), (id_col, True)],
        k,
        rank_col="rank",
    )
    return ranked.select(
        query_id_col,
        id_col,
        F.round(F.col("_score").cast("double"), round_to).alias("score"),
        F.col("rank").cast("int").alias("rank"),
    )


def phrase_search(
    docs: DataFrame,
    phrases: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    phrase_id_col: str = "phrase_id",
    phrase_text_col: str = "phrase_text",
) -> DataFrame:
    """Exact token-phrase search over the positional postings: for each
    probe phrase, every document containing its normalized token
    sequence contiguously, with the occurrence count.

    Returns DataFrame(phrase_id, <id_col>, n_occurrences long) — one
    row per (phrase, matching doc); docs without a match are absent.
    Phrases that normalize to nothing are absent too (no vacuous
    all-docs match).

    The match uses the anchor trick: a phrase slot row (doc, token
    position ``pos``, phrase index ``i``) votes for anchor ``pos - i``;
    an anchor collecting votes from ALL m distinct phrase slots is one
    contiguous occurrence starting there. Repeated tokens in the phrase
    are handled by slot identity (each slot votes separately, even when
    two slots share the same term), and a position matching two
    different slots votes once per slot — exactly the semantics of
    sliding the phrase window.

    Scale shape: ONE corpus tokenization; the (slot, term) relation —
    phrase length × phrase count rows, human-sized — is broadcast onto
    the token stream, so only positions of phrase terms survive into
    the anchor aggregate (two shuffles: anchor-vote count keyed
    (phrase, doc, anchor) with map-side partials, then the per-doc
    occurrence count). No positions arrays are materialized; the token
    stream stays flat and codegen-friendly.
    """
    tok = docs.select(
        F.col(id_col),
        F.posexplode(F.split(normalized(text_col), " ")).alias("pos", "term"),
    ).where(F.col("term") != "")
    slots = (
        phrases.select(
            phrase_id_col,
            F.posexplode(
                F.split(normalized(phrase_text_col), " ")
            ).alias("slot", "term"),
        )
        .where(F.col("term") != "")
    )
    n_slots = slots.groupBy(phrase_id_col).agg(
        F.count(F.lit(1)).alias("_m")
    )
    votes = (
        F.broadcast(slots)
        .join(tok, "term")
        .select(
            phrase_id_col,
            id_col,
            (F.col("pos") - F.col("slot")).alias("_anchor"),
            "slot",
        )
    )
    anchors = (
        votes.groupBy(phrase_id_col, id_col, "_anchor")
        # DISTINCT slots, not rows: a doc_id arriving on duplicate rows
        # doubles every slot's row count, and a raw count would then
        # never equal m — a silent false NEGATIVE in the banned-phrase
        # filter built on this (review finding, pinned by
        # test_phrase_search_duplicate_doc_rows)
        .agg(F.countDistinct("slot").alias("_votes"))
        .join(F.broadcast(n_slots), phrase_id_col)
        .where((F.col("_votes") == F.col("_m")) & (F.col("_anchor") >= 0))
    )
    return anchors.groupBy(phrase_id_col, id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_occurrences")
    )
