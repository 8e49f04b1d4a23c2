"""Training-data pipeline operators (north-star extensions, SURVEY.md §2.10).

The ops a large-scale pretraining-data pipeline runs after dedup/quality
scoring, expressed as pure DataFrame compositions so Catalyst keeps them
JVM-side and shuffle-minimal:

- ``hash_split`` — deterministic train/val/test assignment from an
  engine-portable md5-derived hash of the document id. No shuffle at
  all: a projection over the scan. The same document lands in the same
  split on any cluster size, any engine, any run.
- ``pack_documents`` — contiguous token-budget packing ("sequence
  packing"): shard documents by id-hash, order each shard, and cut bins
  where the running token count crosses the context-window capacity.
  One window per shard — the shards exist precisely so the sort/window
  is per-partition parallel instead of a global total order (the 100 TB
  posture: a global ORDER BY over all documents is the anti-pattern).
- ``dedup_keep_best`` — exact dedup that keeps the *best* row of each
  duplicate group (by an integer score, default content length) rather
  than an arbitrary one: fingerprint groupBy + per-group top-1 window.

All three are SQL-expressible and carry DuckDB oracles in
``__spark_entry__.py``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from dbscan_pyspark_spark.functions.text import fingerprint, token_count


def portable_hash(value: Column | str, salt: str = "") -> Column:
    """Engine-portable nonnegative 60-bit hash: first 15 hex chars of
    ``md5(salt || ':' || value)`` parsed as an integer. DuckDB computes
    the identical value via ``CAST(concat('0x', substring(md5(..),1,15))
    AS BIGINT)`` (same trick as dedup.shingle_base_hash)."""
    c = F.col(value) if isinstance(value, str) else value
    keyed = F.concat(F.lit(salt), F.lit(":"), c.cast("string"))
    return F.conv(F.substring(F.md5(keyed), 1, 15), 16, 10).cast("long")


def hash_split(
    df: DataFrame,
    id_col: str = "doc_id",
    splits: list[tuple[str, int]] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Assign each row a deterministic split label by hashed id.

    ``splits`` is ``[(name, weight), ...]``; weights are integer
    percents of the hash space (bucket = hash mod total_weight, ranges
    assigned in list order). Pure projection — no shuffle, no RNG, so
    re-runs and incremental loads agree row-by-row.
    """
    splits = splits or [("train", 98), ("val", 1), ("test", 1)]
    total = sum(w for _, w in splits)
    bucket = portable_hash(id_col, salt=salt) % F.lit(total)
    expr = None
    lo = 0
    for name, w in splits:
        cond = bucket < F.lit(lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def pack_documents(
    df: DataFrame,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    token_col: str | None = None,
    n_shards: int = 8,
) -> DataFrame:
    """Contiguous greedy packing of documents into fixed-token bins.

    Within each of ``n_shards`` id-keyed shards, documents are taken in
    id order and a bin boundary is cut whenever the *exclusive* running
    token count crosses a multiple of ``capacity`` — the streaming
    concat-and-chunk strategy production packers use (a true bin-packing
    argmin is neither deterministic under parallelism nor needed).

    Returns ``df`` + ``n_tokens, shard, bin`` where ``(shard, bin)``
    identifies the pack. The window sort is per-shard (id hash), so the
    physical plan is a hash-partitioned sort, not a global order — each
    executor packs its shards independently at any scale.
    """
    toks = (
        F.col(token_col) if token_col else token_count(text_col)
    ).alias("n_tokens")
    out = df.withColumn("n_tokens", toks).withColumn(
        "shard", (F.col(id_col) % F.lit(n_shards)).cast("int")
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return out.withColumn(
        "bin", F.floor(prev / F.lit(capacity)).cast("long")
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    stratum_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: int = 0,
    salt: str = "sample",
) -> DataFrame:
    """Deterministic per-stratum downsampling by hashed id.

    ``rates`` maps stratum value -> integer percent kept (e.g.
    ``{"en": 50, "de": 100}``); strata not listed keep ``default_rate``
    percent. The keep decision is ``portable_hash(id) % 100 < rate`` —
    a pure projection + filter (no RNG, no shuffle, no sort), so the
    sample is reproducible row-by-row across runs, engines, and cluster
    sizes, and composable with ``hash_split`` (different salt ->
    independent hash). This is how a training-data pipeline rebalances
    language/source mixes at 100 TB: the filter rides the scan.
    """
    bucket = portable_hash(id_col, salt=salt) % F.lit(100)
    rate = None
    for value, pct in rates.items():
        cond = F.col(stratum_col) == F.lit(value)
        rate = F.when(cond, pct) if rate is None else rate.when(cond, pct)
    rate = rate.otherwise(F.lit(default_rate)) if rate is not None else F.lit(default_rate)
    return df.where(bucket < rate)


def shard_order(
    df: DataFrame,
    n_shards: int = 8,
    id_col: str = "doc_id",
    salt: str = "shard",
) -> DataFrame:
    """Deterministic global shuffle + sharding for training export.

    Adds ``shard`` (``portable_hash(id) % n_shards``) and ``pos`` (the
    row's rank within its shard, ordered by the same hash then id) —
    the final step of a training-data pipeline: a reproducible
    pseudo-random read order, split into shards a data loader can
    consume independently. No RNG: re-runs, incremental rebuilds, and
    different cluster sizes produce the identical order.

    Scale: one hash projection (rides the scan) + one window per
    shard — the sort is per-shard (corpus/n_shards rows each),
    parallel across shards, never a single global sort. At 100 TB pick
    n_shards in the thousands so each shard sort fits an executor
    spill budget.
    """
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    h = portable_hash(id_col, salt=salt)
    out = df.withColumn("_h", h).withColumn(
        "shard", (F.col("_h") % F.lit(n_shards)).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(F.col("_h"), F.col(id_col))
    return out.withColumn("pos", F.row_number().over(w).cast("long")).drop("_h")


def source_cap(
    df: DataFrame,
    cap: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    score_col: str | None = None,
    salt: str = "srccap",
    salt_buckets: int = 1,
) -> DataFrame:
    """Keep at most ``cap`` documents per source (C4/RefinedWeb-style
    domain caps): the mix-rebalancing step that stops a handful of
    mega-domains from dominating the training corpus.

    Selection is deterministic: rows rank per source by
    (``score_col`` DESC if given, then portable id-hash, then id) and
    the top ``cap`` survive — "keep the best N per domain" with a
    reproducible pseudo-random tie-break, no RNG. Output = input
    columns + ``src_rank`` (1-based rank among the survivors).

    Scale: a per-source ``row_number() <= cap`` window is NOT the
    naive one-task-sorts-the-mega-domain plan it looks like — Catalyst
    inserts a partial ``WindowGroupLimit`` BEFORE the exchange, so
    every map task prunes to its local top-``cap`` per source and the
    reduce side sorts at most ``cap x map_tasks`` rows per source.
    Measured on a 41M-row corpus with a 40M-doc mega-domain
    (local[32]): single window 5.0 s vs a hand-rolled two-phase top-k
    17.8 s — the optimizer's plan wins, so it is the default.
    ``salt_buckets > 1`` enables the two-phase variant (phase 1 ranks
    within (source, hash-bucket), phase 2 over <= cap*buckets rows per
    source) for the extreme regime where ``cap x map_tasks`` itself
    overwhelms one reduce task (very large caps on very large
    clusters). The strict total order makes both plans return exactly
    the single-window answer, so the DuckDB oracle stays a one-window
    SQL either way.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    out = df.withColumn("_h", portable_hash(id_col, salt=salt))
    order = [F.col("_h"), F.col(id_col)]
    if score_col is not None:
        order = [F.col(score_col).desc()] + order
    if salt_buckets > 1:
        w1 = Window.partitionBy(
            F.col(source_col), F.pmod(F.col("_h"), F.lit(salt_buckets))
        ).orderBy(*order)
        out = (
            out.withColumn("_r1", F.row_number().over(w1))
            .where(F.col("_r1") <= cap)
            .drop("_r1")
        )
    w2 = Window.partitionBy(source_col).orderBy(*order)
    return (
        out.withColumn("src_rank", F.row_number().over(w2).cast("long"))
        .where(F.col("src_rank") <= cap)
        .drop("_h")
    )


def temperature_sample(
    df: DataFrame,
    per_source_target: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Temperature-flattened source mixing: downsample each source by
    ``rate = min(1, sqrt(target / n_source))``, so kept counts grow
    ~sqrt(target * n) — the sub-linear (alpha = 0.5) mixing law used to
    stop head sources from drowning tail ones while still letting big
    sources contribute more than small ones. Sources at or under
    ``per_source_target`` docs keep everything.

    Unlike ``stratified_sample`` (caller supplies rates), the rates are
    DERIVED from the corpus: one tiny per-source count agg, broadcast
    back, then a deterministic hash filter that rides the scan — no
    second shuffle, no RNG, reproducible row-by-row.

    Exactness: the rate chain is division -> sqrt -> least -> multiply,
    every step IEEE-754 correctly rounded, so Spark and any other
    engine compute bit-identical doubles (this is why the law is a
    sqrt, not a general pow, whose last-ulp rounding is
    implementation-defined — and why there is no cross-source
    normalizing sum, whose float result would depend on aggregation
    order).
    """
    if per_source_target < 1:
        raise ValueError(
            f"per_source_target must be >= 1, got {per_source_target}"
        )
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("_n"))
    rates = counts.withColumn(
        "_rate",
        F.least(
            F.lit(1.0),
            F.sqrt(F.lit(float(per_source_target)) / F.col("_n").cast("double")),
        ),
    ).drop("_n")
    keyed = df.join(F.broadcast(rates), source_col)
    keep = F.pmod(portable_hash(id_col, salt=salt), F.lit(1_000_000)) < (
        F.col("_rate") * F.lit(1_000_000.0)
    )
    return keyed.where(keep).drop("_rate")


def source_ngram_overlap(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    max_sources: int | None = None,
) -> DataFrame:
    """Inter-source content-overlap matrix: shared n-gram shingles per
    source pair. DataFrame(source_a, source_b, n_shared), one row per
    unordered pair with >= 1 shared shingle.

    The corpus-level twin of per-document near-dup: which crawl
    sources/dumps duplicate each other's content (mirror sites, CC
    snapshot overlap, dataset re-publication) — the diagnostic that
    decides which sources to drop before per-doc dedup pays to find
    the same text n times.

    Scale: distinct (source, shingle) then a shingle-keyed equi-join —
    never all-pairs of documents. ``max_sources`` drops shingles
    present in more than that many sources BEFORE the join: boilerplate
    n-grams ("all rights reserved") would otherwise fan out ~S² per
    shingle, and carry no duplication signal anyway.
    """
    from dbscan_pyspark_spark.operators.dedup import _doc_shingles

    sh = _doc_shingles(df.select(id_col, text_col), text_col, id_col, n)
    ss = (
        sh.join(df.select(id_col, source_col), id_col)
        .select(source_col, "shingle")
        .distinct()
        # lineage truncation: ss is referenced by the df-cap groupBy AND
        # both self-join sides — without this the physical plan
        # replicates the whole shingle subtree (4 text scans, 13
        # shuffles at sf0.01; the triangle_counts plan hazard)
        .localCheckpoint(eager=False)
    )
    if max_sources is not None:
        keep = (
            ss.groupBy("shingle")
            .agg(F.count(F.lit(1)).alias("_df"))
            .where(F.col("_df") <= max_sources)
            .select("shingle")
        )
        ss = ss.join(keep, "shingle", "left_semi").localCheckpoint(eager=False)
    a = ss.select(F.col(source_col).alias("source_a"), "shingle")
    b = ss.select(F.col(source_col).alias("source_b"), "shingle")
    return (
        a.join(b, "shingle")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )


def _surrogate_node_ids(distinct_nodes: DataFrame, id_col: str, hash_fn=None):
    """Assign long surrogate vertex ids to a distinct node set.

    Fully distributed: ``xxhash64(id)`` per row, no global sort. On web
    corpora, dup participants are routinely within an order of magnitude
    of corpus size, so the former
    ``row_number().over(Window.orderBy(id))`` (a single-partition global
    sort) was the one scale hazard in this path. A 64-bit hash collides
    with probability ~n²/2⁶⁵ (~3e-7 at n=10⁹); the audit catches the
    event exactly (distinct surrogates vs node count) and only then
    falls back to sorted dense ids — an undetected collision would
    silently merge two unrelated dup clusters. Returns a PERSISTED
    ``(id_col, _sid)`` DataFrame; the caller unpersists."""
    hash_fn = hash_fn if hash_fn is not None else F.xxhash64
    nodes = distinct_nodes.withColumn("_sid", hash_fn(F.col(id_col))).persist()
    audit = nodes.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("_sid").alias("d"),
    ).first()
    if audit["n"] != audit["d"]:
        nodes.unpersist()
        nodes = distinct_nodes.withColumn(
            "_sid",
            F.row_number().over(Window.orderBy(F.col(id_col))).cast("long"),
        ).persist()
    return nodes


def dup_components(pairs: DataFrame, df: DataFrame, id_col: str) -> DataFrame:
    """Connected components of a duplicate-pair graph (columns
    ``a_id``/``b_id``), labeled ``dup_group`` = min original id —
    shared by :func:`near_dup_dedup` (text MinHash pairs) and
    ``similarity.semantic_dedup`` (embedding LSH pairs).

    Numeric ids go straight to ``connected_components``; non-numeric
    ids (URLs, content hashes) are mapped to xxhash64 surrogates first
    (collision-audited, no global sort — see ``_surrogate_node_ids``)
    because connected_components needs long vertex ids and a silent
    cast would null every edge out and turn the dedup into a no-op.
    Returns DataFrame(id_col, dup_group)."""
    from dbscan_pyspark_spark.operators.components import connected_components

    id_type = dict(df.dtypes)[id_col]
    if id_type in ("tinyint", "smallint", "int", "bigint"):
        comp = connected_components(pairs, src="a_id", dst="b_id", id_col=id_col)
        return comp.withColumnRenamed("component", "dup_group")
    distinct_nodes = (
        pairs.select(F.col("a_id").alias(id_col))
        .union(pairs.select(F.col("b_id").alias(id_col)))
        .distinct()
    )
    nodes = _surrogate_node_ids(distinct_nodes, id_col)
    e = (
        pairs.join(nodes.select(F.col(id_col).alias("a_id"), F.col("_sid").alias("_sa")), "a_id")
        .join(nodes.select(F.col(id_col).alias("b_id"), F.col("_sid").alias("_sb")), "b_id")
    )
    comp_s = connected_components(e, src="_sa", dst="_sb", id_col="_sid")
    comp = (
        comp_s.join(nodes, "_sid")
        .withColumn(
            "dup_group", F.min(F.col(id_col)).over(Window.partitionBy("component"))
        )
        .select(id_col, "dup_group")
        .localCheckpoint(eager=True)  # materialize before releasing nodes
    )
    nodes.unpersist()
    return comp


def near_dup_dedup(
    df: DataFrame,
    threshold: float = 0.5,
    num_hashes: int = 16,
    rows_per_band: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    score: Column | None = None,
) -> DataFrame:
    """Full near-duplicate dedup: MinHash-LSH pairs -> connected
    components -> keep the best document per duplicate cluster.

    Near-duplication is transitive in practice (A~B, B~C usually means
    one crawl family), so survivors are chosen per *component* of the
    near-dup graph, not per pair — the standard shape of a corpus dedup
    stage. Returns the surviving rows with two extra columns:
    ``dup_group`` (min doc id of the component) and ``dup_group_size``.

    ``score`` picks the representative (default text length — longest
    wins), ties by lowest id. Scale: the pair graph is tiny relative to
    the corpus (near-dups only), so components run on the contracted
    graph, and the survivors filter is a broadcast-friendly semi join.
    """
    from dbscan_pyspark_spark.operators.dedup import minhash_near_dup_pairs

    pairs = minhash_near_dup_pairs(
        df, threshold, num_hashes, rows_per_band, n, text_col, id_col
    )
    comp = dup_components(pairs, df, id_col)
    labeled = df.join(comp, id_col, "left").withColumn(
        "dup_group", F.coalesce(F.col("dup_group"), F.col(id_col))
    )
    score = score if score is not None else F.length(F.col(text_col))
    w = Window.partitionBy("dup_group").orderBy(
        score.desc(), F.col(id_col).asc()
    )
    return (
        labeled.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            "dup_group_size", F.count(F.lit(1)).over(Window.partitionBy("dup_group"))
        )
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def dedup_keep_best(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    score: Column | None = None,
) -> DataFrame:
    """Exact near-identical dedup keeping the best representative.

    Groups rows by normalized-content fingerprint and keeps the one with
    the highest ``score`` (default: raw text length — "longest version
    wins", the common choice for crawl snapshots), ties broken by lowest
    id for determinism. One shuffle on the fingerprint; the window top-1
    avoids materializing duplicate groups as arrays.
    """
    score = score if score is not None else F.length(F.col(text_col))
    fp = df.withColumn("_fp", fingerprint(text_col)).withColumn("_score", score)
    w = Window.partitionBy("_fp").orderBy(
        F.col("_score").desc(), F.col(id_col).asc()
    )
    return (
        fp.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_fp", "_score", "_rn")
    )


def profile_columns(
    df: DataFrame, cols: list[str], approx: bool = False
) -> DataFrame:
    """Single-pass numeric column profiler (schema/quality audit step).

    Computes per-column row count, null count, distinct count, min, max,
    and mean in ONE scan: every statistic is a partially-aggregatable
    expression, so the whole profile is a map-side combine followed by a
    single-row final merge — at 100 TB this costs one pass over the
    table and shuffles a handful of bytes. The unpivot to long format
    (one output row per column) happens on that single aggregated row
    via array+explode, never on the data.

    ``approx=True`` swaps exact ``count_distinct`` for HLL
    ``approx_count_distinct`` — the at-scale default; exact is the
    oracle-parity mode. The mean is computed as an exact decimal sum
    divided by the non-null count, so it is order-independent and
    engine-portable (plain double ``avg`` is summation-order-dependent).
    """
    distinct = F.approx_count_distinct if approx else F.count_distinct
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"{c}__nn"),
            distinct(col).alias(f"{c}__nd"),
            F.min(col.cast("double")).alias(f"{c}__min"),
            F.max(col.cast("double")).alias(f"{c}__max"),
            F.sum(col.cast("decimal(28,6)")).alias(f"{c}__sum"),
        ]
    row = df.agg(*aggs)
    entries = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("_n").alias("n_rows"),
                (F.col("_n") - F.col(f"{c}__nn")).alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_val"),
                F.col(f"{c}__max").alias("max_val"),
                F.round(
                    F.col(f"{c}__sum").cast("double") / F.col(f"{c}__nn"), 4
                ).alias("avg_val"),
            )
            for c in cols
        ]
    )
    return row.select(F.explode(entries).alias("p")).select("p.*")


def _mg_summarize(batches, key: str, k: int, weight: str | None = None):
    """Per-partition Misra-Gries summary over a stream of pandas
    batches: at most ``k`` (key, lower-bound-count) counters, plus ONE
    null-key row carrying the partition's total mass (so callers get n
    without a second scan). With ``weight`` the update adds that
    column's nonnegative integer mass instead of 1 per row (weighted
    heavy hitters — Misra-Gries is update-weight-agnostic: the
    guarantee bounds undercount by total_mass/(k+1) either way).
    Decrement rule per batch merge: subtract the (k+1)-th largest
    counter and drop non-positives — the mergeable-summaries form
    (Agarwal et al., PODS'12)."""
    import pandas as pd

    counters: dict[str, int] = {}
    total = 0
    for pdf in batches:
        if weight is None:
            updates = pdf[key].value_counts()
        else:
            updates = pdf.groupby(key, sort=False)[weight].sum()
        for val, cnt in updates.items():
            c = int(cnt)
            total += c
            # zero-mass keys (all-null / all-zero weights) must not
            # enter the summary: a 0-valued counter would surface as a
            # bogus top-k candidate in sketch mode
            if c > 0:
                counters[val] = counters.get(val, 0) + c
        if len(counters) > k:
            vals = sorted(counters.values(), reverse=True)
            d = vals[k]  # the (k+1)-th largest
            counters = {x: c - d for x, c in counters.items() if c > d}
    yield pd.DataFrame(
        {
            key: list(counters.keys()) + [None],
            "_mg_c": list(counters.values()) + [total],
        }
    )


def _mg_partials(
    df: DataFrame, key_col: str, k: int, weight_col: str | None = None
) -> tuple[DataFrame, DataFrame]:
    """The sketch stage of :func:`approx_top_k`, factored out so tests
    can assert its plan (the downstream merge is localCheckpointed,
    which hides this stage behind a Scan ExistingRDD): (keyed
    projection, per-partition MG summaries of <= k+1 rows each)."""
    cols = [
        F.coalesce(F.col(key_col).cast("string"), F.lit("__null__")).alias(
            "_mg_key"
        )
    ]
    if weight_col is not None:
        # negative or fractional mass breaks the MG integer-counter
        # invariant, and a failed numeric cast silently weighing 0
        # would hide a schema bug: clamp genuine nulls to 0, reject
        # everything else out-of-contract hard
        raw = F.col(weight_col)
        # the double probe only VALIDATES (try_cast: under ANSI a plain
        # cast would raise its own NumberFormatException mid-scan;
        # null-on-malformed lets the contract predicate own the error);
        # the MASS itself comes from try_cast('long') so integer
        # weights above 2^53 keep exact precision — routing them
        # through double would silently round them
        wd = raw.try_cast("double")
        wl = raw.try_cast("long")
        bad = (
            (raw.isNotNull() & wd.isNull())  # non-numeric string etc.
            | F.isnan(wd)
            | (wd < 0)
            | (wd != F.floor(wd))  # fractional would floor silently
            # beyond long range the mass cast nulls out — without this
            # predicate the coalesce below would silently weigh the
            # row 0 instead of raising like every other contract break
            | (wd.isNotNull() & wl.isNull())
        )
        cols.append(
            F.coalesce(
                F.when(
                    bad,
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "approx_top_k: weight must be a "
                                "nonnegative integer, got "
                            ),
                            raw.cast("string"),
                        )
                    ).cast("long"),
                ).otherwise(wl),
                F.lit(0),
            ).alias("_mg_w")
        )
    keyed = df.select(*cols)
    partials = keyed.mapInPandas(
        lambda batches: _mg_summarize(
            batches, "_mg_key", k, "_mg_w" if weight_col is not None else None
        ),
        schema="_mg_key string, _mg_c long",
    )
    return keyed, partials


def approx_top_k(
    df: DataFrame,
    key_col: str,
    k: int = 100,
    exact_recount: bool = False,
    weight_col: str | None = None,
) -> DataFrame:
    """Heavy hitters via a map-side-mergeable Misra-Gries sketch — the
    100 TB first-pass diagnostic ``key_skew_stats`` can't be: that one
    shuffles EVERY distinct key's count; this one shuffles at most
    ``(k+1) * num_partitions`` summary rows regardless of key
    cardinality.

    Two modes:

    - ``exact_recount=False`` (the pure sketch): DataFrame(value
      string, est_count long, n_rows long) — the top-``k`` candidates
      by estimated count. ``est_count`` is a LOWER bound with
      ``true - est <= n_rows/(k+1)`` (each partition's MG undercount is
      <= n_p/(k+1); summing partials sums the bounds). Candidate
      membership depends on partitioning — rows-only under the driver
      contract, like every estimator.
    - ``exact_recount=True``: a second pass counts the candidate keys
      exactly (broadcast semi-join — only candidate rows reach the
      groupBy) and keeps keys with ``count * (k+1) > n``. The MG
      guarantee makes this DETERMINISTIC: any key with true count
      > n/(k+1) has a positive merged estimate on EVERY partitioning,
      so the output is exactly the SQL set ``HAVING count(*) * (k+1) >
      (SELECT count(*) FROM t)`` — integer-exact, oracle-able.
      DataFrame(value string, n_occurrences long).

    ``weight_col`` switches both modes from row counts to MASS: each
    row contributes its nonnegative integer weight (token/byte budgets —
    "which sources dominate the corpus by n_chars"), nulls weigh 0,
    negatives raise. Column names stay IDENTICAL (the triangle_counts
    lesson); ``est_count``/``n_occurrences``/``n_rows`` then measure
    summed weight, and the recount threshold becomes ``mass*(k+1) >
    total_mass`` — still integer-exact and oracle-able (``HAVING
    sum(w)*(k+1) > (SELECT sum(w) FROM t)``).

    Nulls count as the literal '__null__' (the category_drift
    convention). Scale shape: one Arrow ``mapInPandas`` pass emitting
    <= k+1 rows per partition (state bounded by k + the distinct keys
    of ONE Arrow batch — the decrement runs after each batch merge, so
    the dict transiently holds up to k + maxRecordsPerBatch entries;
    the EMITTED summary never exceeds k counters, pinned by
    ``test_mg_summary_state_bounded``), a tiny groupBy over the
    summaries, and (recount mode) one candidate-pruned exact count.

    When to use (measured, BASELINE.md round 5): on a NEAR-UNIQUE key
    domain (map-side combine compresses nothing) the sketch beats the
    exact groupBy 1.6× at 40M rows locally and shuffles O(k·partitions)
    instead of O(rows) on a cluster; on a compressible domain (<= ~10^7
    distinct keys) partial aggregation already wins — use
    :func:`key_skew_stats` there. On a near-uniform domain wider than
    ``k`` the sketch can legitimately return EMPTY: no key exceeds the
    n/(k+1) mass bar, i.e. there are no heavy hitters to report."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    keyed, partials = _mg_partials(df, key_col, int(k), weight_col)
    # totals, cand (and recount's broadcast) all read the merged
    # summary — truncate so the sketch scan runs once, not per branch
    merged = (
        partials.groupBy("_mg_key")
        .agg(F.sum("_mg_c").alias("_c"))
        .localCheckpoint(eager=False)
    )
    totals = merged.where(F.col("_mg_key").isNull()).select(
        F.col("_c").alias("_n")
    )
    cand = merged.where(F.col("_mg_key").isNotNull())
    if not exact_recount:
        return (
            cand.crossJoin(F.broadcast(totals))
            .orderBy(F.col("_c").desc(), F.col("_mg_key"))
            .limit(int(k))
            .select(
                F.col("_mg_key").alias("value"),
                F.col("_c").alias("est_count"),
                F.col("_n").alias("n_rows"),
            )
        )
    mass = (
        F.count(F.lit(1))
        if weight_col is None
        else F.sum("_mg_w").cast("long")
    )
    exact = (
        keyed.join(
            F.broadcast(cand.select(F.col("_mg_key").alias("_ck"))),
            F.col("_mg_key") == F.col("_ck"),
            "left_semi",
        )
        .groupBy("_mg_key")
        .agg(mass.alias("n_occurrences"))
    )
    return (
        exact.crossJoin(F.broadcast(totals))
        .where(F.col("n_occurrences") * (int(k) + 1) > F.col("_n"))
        .select(F.col("_mg_key").alias("value"), "n_occurrences")
    )


def key_skew_stats(
    df: DataFrame, key_col: str, top_n: int = 10
) -> DataFrame:
    """Heavy-hitter diagnostic for join/agg key skew.

    Returns the ``top_n`` most frequent keys with their row count,
    share of all rows, and skew factor (count / mean rows-per-key) —
    the numbers that decide whether a key needs salting or an AQE
    skew-join hint before a 100 TB shuffle. One groupBy plus a
    broadcast single-row total; the top-N is a sort-limit over the
    (already aggregated) key counts, not the data.
    """
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("_total"), F.count(F.lit(1)).alias("_n_keys")
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(key_col),
            "cnt",
            F.round(F.col("cnt") / F.col("_total"), 6).alias("share"),
            F.round(
                F.col("cnt") / (F.col("_total") / F.col("_n_keys")), 4
            ).alias("skew"),
        )
        .orderBy(F.col("cnt").desc(), F.col(key_col).asc())
        .limit(int(top_n))
    )


def histogram(
    df: DataFrame,
    col: str,
    n_bins: int = 10,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Fixed-width histogram of a numeric column.

    Returns DataFrame(bin int, bin_lo, bin_hi, cnt) with ``n_bins``
    equal-width bins over [lo, hi] (min/max from one bounded agg job
    when not given). With explicit bounds, out-of-range values are
    CLAMPED into the edge bins (nulls are excluded — a missing value
    is not a hi-edge observation) — the max (and anything above hi) lands
    in the last bin, anything below lo in bin 0 — so every row is
    counted and bin indices stay in [0, n_bins). A groupBy over a
    derived integer — fully partial-aggregatable, one scan, ``n_bins``
    rows shuffled.
    """
    if lo is None or hi is None:
        r = df.agg(
            F.min(F.col(col).cast("double")).alias("_lo"),
            F.max(F.col(col).cast("double")).alias("_hi"),
        ).collect()[0]
        lo = r["_lo"] if lo is None else lo
        hi = r["_hi"] if hi is None else hi
    if lo is None or hi is None:  # empty (or all-null) input
        lo, hi = 0.0, 1.0
    span = (hi - lo) or 1.0
    width = span / n_bins
    bin_ = F.greatest(
        F.lit(0).cast("bigint"),
        F.least(
            F.lit(n_bins - 1).cast("bigint"),
            F.floor(
                (F.col(col).cast("double") - F.lit(lo)) / F.lit(span) * n_bins
            ),
        ),
    ).cast("int")
    return (
        # nulls are MISSING, not hi-edge values: floor(NULL)->NULL would
        # otherwise ride least/greatest's null-skipping into the top bin
        df.where(F.col(col).isNotNull())
        .groupBy(bin_.alias("bin"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bin",
            F.round(F.lit(lo) + F.col("bin") * F.lit(width), 6).alias("bin_lo"),
            F.round(F.lit(lo) + (F.col("bin") + 1) * F.lit(width), 6).alias("bin_hi"),
            "cnt",
        )
    )


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 256,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Split documents into (optionally overlapping) token-window chunks.

    Returns DataFrame(id, chunk int, n_tokens, chunk_text): chunk i
    covers tokens ``[i*stride, i*stride + chunk_tokens)`` on the
    whitespace tokenization; the last window is the final partial one
    (no empty windows, every token covered). ``stride`` defaults to
    ``chunk_tokens`` (disjoint); a smaller stride gives the overlapping
    windows RAG indexing uses. Array slice + explode on the bound token
    column — one narrow shuffle-free projection then an explode whose
    output rows are exactly the chunks.
    """
    stride = chunk_tokens if stride is None else int(stride)
    if stride <= 0 or chunk_tokens <= 0:
        raise ValueError("chunk_tokens and stride must be positive")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    # number of windows: 1 + ceil(max(n - chunk, 0) / stride)
    n_win = 1 + F.ceil(
        F.greatest(n - F.lit(chunk_tokens), F.lit(0)) / F.lit(stride)
    ).cast("int")
    chunks = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.explode(F.sequence(F.lit(0), n_win - 1)).alias("chunk"),
    )
    sliced = F.slice(
        F.col("_toks"), F.col("chunk") * stride + 1, chunk_tokens
    )
    return chunks.select(
        id_col,
        "chunk",
        F.size(sliced).alias("n_tokens"),
        F.concat_ws(" ", sliced).alias("chunk_text"),
    )


def group_sample(
    df: DataFrame,
    group_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "gsample",
) -> DataFrame:
    """Deterministic fixed-size per-group sample: exactly ``min(k, |g|)``
    rows from every group, chosen by portable id-hash order.

    The balanced-subset builder (k examples per class/language/source)
    complementing rate-based :func:`stratified_sample`. Hash order makes
    the choice uniform-ish, reproducible on any engine or cluster size,
    and stable under re-runs and appends of non-sampled rows. One
    group-keyed window over (hash, id); no RNG, no global sort.
    """
    w = Window.partitionBy(group_col).orderBy(
        portable_hash(id_col, salt=salt), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= int(k))
        .drop("_rn")
    )


def equi_depth_histogram(
    df: DataFrame, col: str, n_bins: int = 10, exact: bool = True
) -> DataFrame:
    """Equi-depth (quantile) histogram: bins holding ~equal row counts.

    Returns DataFrame(bin int, cnt) where bin i is bounded by the
    i/n..(i+1)/n quantiles; a row lands in bin = #boundaries <= value
    (so boundary ties go to the higher bin in BOTH engines — the closed
    form the DuckDB oracle mirrors). ``exact=True`` computes exact
    interpolated percentiles (one sort-based agg — fine to oracle
    scale); ``exact=False`` uses ``approx_percentile`` (KLL-style
    sketch, one pass, mergeable) — the 100 TB default, where the exact
    global sort is the anti-pattern. Either way the binning itself is a
    broadcast of n-1 doubles against the scan.
    """
    x = F.col(col).cast("double")
    probs = [i / n_bins for i in range(1, n_bins)]
    pct = F.percentile(x, F.array(*[F.lit(p) for p in probs])) if exact else (
        F.percentile_approx(x, F.array(*[F.lit(p) for p in probs]))
    )
    bounds = df.agg(pct.alias("_b"))
    return (
        df.crossJoin(F.broadcast(bounds))
        .select(
            F.size(F.filter(F.col("_b"), lambda b: b <= x)).alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def token_entropy_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document token-distribution Shannon entropy — the classic
    repetition / degenerate-text quality proxy (low entropy = the doc
    keeps repeating the same few tokens; see also
    ``text.repetition_ratio`` for the n-gram variant).

    Returns DataFrame(doc_id, n_tokens, n_distinct, entropy) with
    entropy in nats, rounded to 6 digits.

    Engine portability: H = ln(n) - (1/n) * sum(c_i * ln(c_i)) over
    the token counts c_i. Each per-token term is rounded onto a 1e-9
    grid and summed as exact integers, so the cross-engine result does
    not depend on float summation order; only a per-term ln() ulp
    difference landing exactly on a grid boundary could diverge
    (probability ~1e-8 per distinct token).

    Scale shape: explode to (doc, token) → two partial-aggregatable
    groupBys on the same doc key; nothing wider than the token pairs
    ever shuffles.
    """
    from dbscan_pyspark_spark.functions.text import tokens

    toks = df.select(
        F.col(id_col), F.explode(tokens(text_col)).alias("_tok")
    ).where(F.col("_tok") != "")
    counts = toks.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_c")
    )
    term = F.round(
        F.col("_c") * F.log(F.col("_c")) * F.lit(1e9), 0
    ).cast("long")
    per_doc = counts.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum(term).alias("_s"),
    )
    entropy = F.round(
        F.log(F.col("n_tokens"))
        - (F.col("_s") / F.lit(1e9)) / F.col("n_tokens"),
        6,
    )
    return per_doc.select(
        id_col,
        "n_tokens",
        "n_distinct",
        entropy.alias("entropy"),
    )


def integrity_check(
    child: DataFrame,
    parent: DataFrame,
    child_keys: list[str],
    parent_keys: list[str] | None = None,
) -> DataFrame:
    """Referential-integrity audit: how many child rows point at a
    parent key that does not exist (the batch data-quality gate every
    ingest pipeline runs before publishing a snapshot).

    Returns a single row: (n_child, n_orphans, orphan_ratio) —
    orphan_ratio rounded to 6 digits. Null child keys count as orphans
    (they reference nothing).

    Scale shape: a left-anti join on the key (Catalyst picks broadcast
    when the parent's key projection is small — the usual case for
    dimension parents) plus one count; the child is scanned once, only
    key columns move.
    """
    parent_keys = parent_keys or child_keys
    if len(child_keys) != len(parent_keys):
        raise ValueError("child_keys and parent_keys must align")
    pk = parent.select(
        *[F.col(p).alias(c) for c, p in zip(child_keys, parent_keys)]
    ).distinct()
    ck = child.select(*child_keys)
    orphans = ck.join(pk, on=child_keys, how="left_anti")
    totals = ck.agg(F.count(F.lit(1)).alias("n_child")).crossJoin(
        orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    )
    return totals.select(
        "n_child",
        "n_orphans",
        F.round(F.col("n_orphans") / F.col("n_child"), 6).alias(
            "orphan_ratio"
        ),
    )


def validate(df: DataFrame, rules: list[tuple]) -> DataFrame:
    """Declarative data-quality expectations (the Deequ/dbt-test shape):
    evaluate a rule suite against a snapshot in as few passes as the
    rules allow and return one row per rule.

    Returns DataFrame(rule string, violations long, passed boolean).
    ``rule`` is ``kind:column`` (e.g. ``not_null:o_custkey``).

    Supported rules:
      ("not_null", col)                  — null rows violate
      ("in_range", col, lo, hi)          — nulls and out-of-bounds violate
      ("accepted_values", col, [v, ..])  — nulls and unlisted values violate
      ("matches", col, regex)            — nulls and non-matching violate
      ("unique", col | [cols])           — violations = rows - distinct keys
                                           (a shared null key counts once,
                                           like GROUP BY)

    Scale shape: every row-predicate rule compiles to one conditional
    sum in a SINGLE aggregation over a SINGLE scan — adding rules adds
    columns to the agg, not passes over the data. Each ``unique`` rule
    needs its own distinct count (one extra shuffle per keyset); the
    tiny per-rule scalars are then stacked driver-free.
    """
    preds: list[tuple[str, Column]] = []
    uniques: list[tuple[str, list[str]]] = []
    for r in rules:
        kind = r[0]
        if kind == "not_null":
            preds.append((f"not_null:{r[1]}", F.col(r[1]).isNull()))
        elif kind == "in_range":
            _, c, lo, hi = r
            col = F.col(c)
            preds.append(
                (f"in_range:{c}", col.isNull() | (col < lo) | (col > hi))
            )
        elif kind == "accepted_values":
            _, c, vals = r
            preds.append(
                # explicit isNull: a NULL three-valued ~isin would fall
                # through when() and silently NOT count as a violation
                (
                    f"accepted_values:{c}",
                    F.col(c).isNull() | ~F.col(c).isin(list(vals)),
                )
            )
        elif kind == "matches":
            _, c, pattern = r
            preds.append(
                # regexp_extract_all-based containment instead of rlike:
                # RLike executes class patterns ~50x slower than
                # RegExpExtractAll in this Spark build (measured in
                # functions/text.py::normalized) — same truth table,
                # NULL input handled by the explicit isNull branch
                (
                    f"matches:{c}",
                    F.col(c).isNull()
                    | (
                        F.size(
                            F.regexp_extract_all(
                                F.col(c), F.lit(pattern), 0
                            )
                        )
                        == 0
                    ),
                )
            )
        elif kind == "unique":
            cols = [r[1]] if isinstance(r[1], str) else list(r[1])
            uniques.append((f"unique:{','.join(cols)}", cols))
        else:
            raise ValueError(f"unknown rule kind: {kind}")

    if not preds and not uniques:
        raise ValueError("validate needs at least one rule")

    parts: list[DataFrame] = []
    total = None  # one count(*) shared by every unique rule
    if preds:
        # coalesce: sum over zero rows is NULL — an empty (trivially
        # clean) snapshot must report 0 violations / passed, not NULL
        agg_cols = [
            F.coalesce(F.sum(F.when(p, 1).otherwise(0)), F.lit(0))
            .cast("long")
            .alias(f"_v{i}")
            for i, (_, p) in enumerate(preds)
        ]
        if uniques:
            agg_cols.append(F.count(F.lit(1)).alias("_n"))
        agg = df.agg(*agg_cols)
        stack = ", ".join(
            f"'{name}', _v{i}" for i, (name, _) in enumerate(preds)
        )
        parts.append(
            agg.selectExpr(
                f"stack({len(preds)}, {stack}) AS (rule, violations)"
            )
        )
        if uniques:
            total = agg.select("_n")
    if uniques and total is None:
        total = df.agg(F.count(F.lit(1)).alias("_n"))
    for name, cols in uniques:
        nkeys = (
            df.select(*cols).distinct().agg(F.count(F.lit(1)).alias("_k"))
        )
        parts.append(
            total.crossJoin(nkeys).select(
                F.lit(name).alias("rule"),
                (F.col("_n") - F.col("_k")).cast("long").alias("violations"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("passed", F.col("violations") == 0)


def _side_tagged_counts(
    side_a: DataFrame, side_b: DataFrame, key: str
) -> DataFrame:
    """Shared drift core: union two (key, _side)-tagged relations into
    ONE key-keyed conditional-sum groupBy -> (key, n_a, n_b). The tiny
    result is lineage-truncated because both drift ops reference it
    twice (output + totals agg) — without truncation the plan re-scans
    BOTH inputs twice."""
    return (
        side_a.unionByName(side_b)
        .groupBy(key)
        .agg(
            F.sum(F.when(F.col("_side") == 0, 1).otherwise(0))
            .cast("long")
            .alias("n_a"),
            F.sum(F.when(F.col("_side") == 1, 1).otherwise(0))
            .cast("long")
            .alias("n_b"),
        )
        .localCheckpoint(eager=False)
    )


def _rates_and_tvd(counts: DataFrame, key: str) -> DataFrame:
    """Shared drift tail: per-key rates + total-variation terms from a
    (key, n_a, n_b) relation; totals broadcast back, everything rounded
    to 6 digits (division+abs only — engine-exact)."""
    totals = counts.agg(F.sum("n_a").alias("_ta"), F.sum("n_b").alias("_tb"))
    rate_a = F.col("n_a") / F.col("_ta")
    rate_b = F.col("n_b") / F.col("_tb")
    return counts.crossJoin(F.broadcast(totals)).select(
        key,
        "n_a",
        "n_b",
        F.round(rate_a, 6).alias("rate_a"),
        F.round(rate_b, 6).alias("rate_b"),
        F.round(F.abs(rate_a - rate_b), 6).alias("tvd_term"),
    )


def column_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    lo: float,
    hi: float,
    n_bins: int = 10,
) -> DataFrame:
    """Distribution drift between two snapshots of a column (train/serve
    skew, crawl-to-crawl shift): fixed-width histograms on shared edges
    plus the per-bin total-variation term.

    Returns DataFrame(bin int, n_a, n_b, rate_a, rate_b, tvd_term) for
    every bin with >= 1 row on either side; rates and terms rounded to
    6 digits (``sum(tvd_term)/2`` is the total variation distance).
    Rows below ``lo`` clamp into bin 0, above ``hi`` into the last bin
    (nulls are dropped), so both sides always share edges.

    Engine-parity note: TVD over equal-width bins needs only division
    and abs — both IEEE correctly rounded, so any engine computes
    bit-identical terms from identical counts. PSI/KL need a log whose
    last-ulp rounding is libm-specific; that is why the drift score
    here is total variation, not PSI.

    Scale shape: both sides union into ONE scan with a side tag, bin is
    a projection, and a single n_bins-row conditional-sum groupBy does
    the rest — no join of two histogram relations.
    """
    if n_bins < 1 or not (hi > lo):
        raise ValueError("need n_bins >= 1 and hi > lo")
    width = (float(hi) - float(lo)) / n_bins

    def side(df: DataFrame, tag: int) -> DataFrame:
        x = F.col(col).cast("double")
        b = F.floor((x - F.lit(float(lo))) / F.lit(width)).cast("int")
        return df.where(x.isNotNull()).select(
            F.least(F.greatest(b, F.lit(0)), F.lit(n_bins - 1)).alias("bin"),
            F.lit(tag).alias("_side"),
        )

    counts = _side_tagged_counts(side(df_a, 0), side(df_b, 1), "bin")
    return _rates_and_tvd(counts, "bin")


def ks_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov distance between two
    snapshots of an integral column — the CDF-shaped complement to
    :func:`column_drift`'s binned TVD (KS sees a pure location shift
    inside one bin that equal-width histograms miss, and it needs no
    lo/hi/n_bins tuning).

    Returns ONE row ``(ks_num long, n_a long, n_b long, ks_stat
    double)`` where ``D = ks_num / (n_a * n_b)`` — the max is taken
    over the merged value grid of ``|csum_a * n_b - csum_b * n_a|``,
    so the statistic is INTEGER-exact (no float CDF subtraction;
    ``ks_stat`` is the rounded convenience ratio). Requires
    ``csum * n <= 2^63``, i.e. both sides under ~3e9 rows; beyond
    that, pre-aggregate or sample.

    ``col`` must be integral (quantize money to cents first — the
    :func:`global_cumsums` contract); nulls are excluded from both
    samples (a null has no place on a CDF); an empty side raises
    (D is undefined).

    Scale shape: one union scan with a side tag -> groupBy value
    (map-side combine collapses 100 TB to |distinct values| rows) ->
    ONE range-partitioned distributed prefix-sum pass for BOTH sides'
    CDFs (:func:`global_cumsums` — never an unpartitioned window) ->
    a final 1-row max agg."""
    from dbscan_pyspark_spark.operators.windows import global_cumsums

    def side(df: DataFrame, tag: int) -> DataFrame:
        v = F.col(col).cast("long")
        return df.where(F.col(col).isNotNull()).select(
            v.alias("_v"), F.lit(tag).alias("_side")
        )

    counts = (
        side(df_a, 0)
        .unionByName(side(df_b, 1))
        .groupBy("_v")
        .agg(
            F.sum(F.when(F.col("_side") == 0, 1).otherwise(0))
            .cast("long")
            .alias("_ca"),
            F.sum(F.when(F.col("_side") == 1, 1).otherwise(0))
            .cast("long")
            .alias("_cb"),
        )
    )
    cum, _, (n_a, n_b) = global_cumsums(
        counts,
        ["_v"],
        ["_ca", "_cb"],
        out_cols=["_sa", "_sb"],
        num_partitions=num_partitions,
    )
    if n_a == 0 or n_b == 0:
        raise ValueError(
            f"ks_drift: both sides need rows (n_a={n_a}, n_b={n_b})"
        )
    return cum.agg(
        F.max(
            F.abs(
                F.col("_sa") * F.lit(n_b) - F.col("_sb") * F.lit(n_a)
            )
        ).alias("ks_num")
    ).select(
        "ks_num",
        F.lit(n_a).cast("long").alias("n_a"),
        F.lit(n_b).cast("long").alias("n_b"),
        F.round(F.col("ks_num") / F.lit(float(n_a) * float(n_b)), 6).alias(
            "ks_stat"
        ),
    )


def welch_t_test(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
) -> DataFrame:
    """Two-sample Welch t-test on an integral column — the experiment/
    A/B gate ("did the treatment shift the mean?") next to the
    distribution-shaped drift tests. Returns ONE row ``(n_a, n_b,
    mean_a, mean_b, t_stat, dof)`` (means/t/dof rounded to 6).

    Engine parity: Σx and Σx² accumulate as DECIMAL(38,0) — exact and
    addition-order-independent where a double sum is neither and a
    BIGINT Σx² overflows at corpus scale (cents² × 10⁹ rows). The
    exact integers then feed a FIXED IEEE expression tree (/, -, *,
    sqrt are all correctly rounded — the column_drift TVD-not-PSI
    argument), so any engine reproduces the statistic bit-for-bit.

    Nulls are excluded; a side with < 2 rows or a zero pooled standard
    error (both sides constant) raises — plan-side, on the 1-row
    aggregate, where it cannot be pruned."""

    def side(df: DataFrame, tag: int) -> DataFrame:
        return df.where(F.col(col).isNotNull()).select(
            F.col(col).cast("decimal(38,0)").alias("_v"),
            F.lit(tag).alias("_side"),
        )

    is_a, is_b = F.col("_side") == 0, F.col("_side") == 1
    agg = (
        side(df_a, 0)
        .unionByName(side(df_b, 1))
        .agg(
            F.count(F.when(is_a, 1)).alias("n_a"),
            F.count(F.when(is_b, 1)).alias("n_b"),
            F.sum(F.when(is_a, F.col("_v"))).alias("_sa"),
            F.sum(F.when(is_b, F.col("_v"))).alias("_sb"),
            F.sum(F.when(is_a, F.col("_v") * F.col("_v"))).alias("_qa"),
            F.sum(F.when(is_b, F.col("_v") * F.col("_v"))).alias("_qb"),
        )
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    sa, sb = F.col("_sa").cast("double"), F.col("_sb").cast("double")
    qa, qb = F.col("_qa").cast("double"), F.col("_qb").cast("double")
    ma, mb = sa / na, sb / nb
    # the n >= 2 condition lives INSIDE the expressions (null below),
    # not only in the `bad` disjunction: codegen's common-subexpression
    # elimination hoists the shared se2 past the Or's short-circuit,
    # and an unconditional (n-1) denominator then divides by zero
    # under ANSI while merely EVALUATING the guard
    se2a = F.when(
        F.col("n_a") >= 2, (qa - sa * ma) / (na - 1) / na
    )
    se2b = F.when(
        F.col("n_b") >= 2, (qb - sb * mb) / (nb - 1) / nb
    )
    se2 = se2a + se2b
    bad = (
        (F.col("n_a") < 2)
        | (F.col("n_b") < 2)
        # a null Σ with n >= 2 is decimal(38,0) overflow under
        # ansi=false (ANSI raises upstream) — raise, never treat the
        # lost mass as 0 (the approx_top_k weighted-overflow lesson)
        | F.col("_sa").isNull()
        | F.col("_sb").isNull()
        | F.col("_qa").isNull()
        | F.col("_qb").isNull()
        # se2 <= 0 covers both genuinely-constant sides AND the
        # >2^53 double-rounding cancellation that can leave a tiny
        # NEGATIVE residue (sqrt -> NaN) — NaN itself sorts ABOVE
        # every number in Spark, so test isnan explicitly too
        | ~(se2 > 0)
        | F.isnan(se2)
    )
    guard = lambda expr: F.when(  # noqa: E731
        bad,
        F.raise_error(
            F.concat(
                F.lit("welch_t_test: need >= 2 rows per side and a "),
                F.lit("nonzero pooled se; got n_a="),
                F.col("n_a").cast("string"),
                F.lit(" n_b="),
                F.col("n_b").cast("string"),
            )
        ).cast("double"),
    ).otherwise(expr)
    return agg.select(
        "n_a",
        "n_b",
        F.round(ma, 6).alias("mean_a"),
        F.round(mb, 6).alias("mean_b"),
        guard(F.round((ma - mb) / F.sqrt(se2), 6)).alias("t_stat"),
        guard(
            F.round(
                (se2 * se2)
                / (se2a * se2a / (na - 1) + se2b * se2b / (nb - 1)),
                6,
            )
        ).alias("dof"),
    )


def exact_percentiles(
    df: DataFrame,
    col: str,
    percents: list[int],
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact distributed order statistics on an integral column —
    discrete (lower) percentile semantics: the p-th percentile is the
    SMALLEST value whose at-or-below count reaches ``ceil(n*p/100)``,
    always an actual data value, so the output is integer-exact and
    engine-portable (interpolating percentiles average two neighbors
    in float — parity-hostile and physically meaningless for counts).

    ``percents`` are INTEGER percents (50, 90, 99): the rank threshold
    ``(n*p + 99) // 100`` stays in integer arithmetic end-to-end —
    ``ceil(0.9 * n)`` in a double can land one rank off when ``0.9 * n``
    rounds above the integer. Returns DataFrame(pct int, value long),
    one row per percent. Nulls excluded; empty input raises.

    Scale shape: value-keyed count groupBy (map-side combine), ONE
    range-partitioned prefix-sum pass (:func:`~dbscan_pyspark_spark.
    operators.windows.global_cumsum`), then a single agg computes ALL
    requested percentiles from the same CDF — never one sort per
    percentile, never an unpartitioned window."""
    from dbscan_pyspark_spark.operators.windows import global_cumsum

    if (
        not percents
        or any(
            not isinstance(p, int) or not 0 < p <= 100 for p in percents
        )
        or len(set(percents)) != len(percents)
    ):
        raise ValueError(
            "exact_percentiles: percents must be distinct ints in (0, 100]"
        )
    counts = (
        df.where(F.col(col).isNotNull())
        .select(F.col(col).cast("long").alias("_v"))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    cum, _, n = global_cumsum(
        counts, ["_v"], "_c", out_col="_cs", num_partitions=num_partitions
    )
    if n == 0:
        raise ValueError("exact_percentiles: no non-null rows")
    row = cum.agg(
        *[
            F.min(
                F.when(F.col("_cs") >= F.lit((n * p + 99) // 100), F.col("_v"))
            ).alias(f"_p{p}")
            for p in percents
        ]
    )
    pairs = F.array(
        *[
            F.struct(
                F.lit(p).alias("pct"), F.col(f"_p{p}").alias("value")
            )
            for p in percents
        ]
    )
    return row.select(F.explode(pairs).alias("_s")).select(
        "_s.pct", "_s.value"
    )


def quantile_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    percents: list[int] = [50, 90, 99],  # noqa: B006 (read-only)
    num_partitions: int | None = None,
) -> DataFrame:
    """Named-quantile drift between two snapshots — the readable
    companion to :func:`ks_drift` (KS says THAT the distribution
    moved; this says WHERE: "p99 latency grew 40ms"). One row per
    percent: DataFrame(pct, val_a, val_b, shift), all integer-exact
    (:func:`exact_percentiles` on each side, broadcast-joined on the
    tiny percent key)."""
    pa = exact_percentiles(df_a, col, percents, num_partitions)
    pb = exact_percentiles(df_b, col, percents, num_partitions)
    return (
        pa.withColumnRenamed("value", "val_a")
        .join(pb.withColumnRenamed("value", "val_b"), "pct")
        .select(
            "pct",
            "val_a",
            "val_b",
            (F.col("val_b") - F.col("val_a")).alias("shift"),
        )
    )


def ks_drift_by_group(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    group_col: str,
) -> DataFrame:
    """Per-group :func:`ks_drift`: one integer-exact two-sample KS row
    per group (did THIS language's / THIS source's value distribution
    shift?) — the stratified version of the corpus-level statistic.

    Returns DataFrame(group, ks_num, n_a, n_b, ks_stat) for every
    group with rows on BOTH sides (one-sided groups are dropped — D is
    undefined there, and a NULL statistic row would poison downstream
    ``max(ks_stat)`` alerting).

    Scale shape: unlike the global statistic (which needs
    :func:`~dbscan_pyspark_spark.operators.windows.global_cumsums` to
    avoid a single-task sort), the per-group CDFs use windows
    PARTITIONED by the group — distributed across groups by
    construction. One union scan, one (group, value) groupBy, one
    window pass, one per-group max agg. A single mega-group degrades
    to that group's distinct-value count in one task — for that regime
    run the global ``ks_drift`` on the group's rows instead."""

    def side(df: DataFrame, tag: int) -> DataFrame:
        return df.where(
            F.col(col).isNotNull() & F.col(group_col).isNotNull()
        ).select(
            F.col(group_col).alias("_g"),
            F.col(col).cast("long").alias("_v"),
            F.lit(tag).alias("_side"),
        )

    counts = (
        side(df_a, 0)
        .unionByName(side(df_b, 1))
        .groupBy("_g", "_v")
        .agg(
            F.sum(F.when(F.col("_side") == 0, 1).otherwise(0))
            .cast("long")
            .alias("_ca"),
            F.sum(F.when(F.col("_side") == 1, 1).otherwise(0))
            .cast("long")
            .alias("_cb"),
        )
    )
    w_cdf = (
        Window.partitionBy("_g")
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_grp = Window.partitionBy("_g")
    cum = counts.select(
        "_g",
        F.sum("_ca").over(w_cdf).alias("_sa"),
        F.sum("_cb").over(w_cdf).alias("_sb"),
        F.sum("_ca").over(w_grp).alias("_na"),
        F.sum("_cb").over(w_grp).alias("_nb"),
    )
    return (
        cum.where((F.col("_na") > 0) & (F.col("_nb") > 0))
        .groupBy(F.col("_g").alias(group_col))
        .agg(
            F.max(
                F.abs(F.col("_sa") * F.col("_nb") - F.col("_sb") * F.col("_na"))
            ).alias("ks_num"),
            F.max("_na").alias("n_a"),
            F.max("_nb").alias("n_b"),
            F.round(
                F.max(
                    F.abs(
                        F.col("_sa") * F.col("_nb")
                        - F.col("_sb") * F.col("_na")
                    )
                )
                / (
                    F.max("_na").cast("double")
                    * F.max("_nb").cast("double")
                ),
                6,
            ).alias("ks_stat"),
        )
    )


def category_drift(
    df_a: DataFrame,
    df_b: DataFrame,
    col: str,
    top_n: int | None = None,
) -> DataFrame:
    """Categorical twin of :func:`column_drift`: per-value share shift
    between two snapshots (language mix, source mix, label balance).

    Returns DataFrame(value string, n_a, n_b, rate_a, rate_b,
    tvd_term); nulls count as the literal value '__null__', and with
    ``top_n`` set, values outside the top N by combined count collapse
    into '__other__' (ties broken by value — deterministic). Rates and
    terms rounded to 6 digits; ``sum(tvd_term)/2`` is the total
    variation distance. Division+abs only — engine-exact, same
    rationale as column_drift.

    Scale shape: union with a side tag -> ONE value-keyed groupBy; the
    top-N cut is the build_vocab TakeOrdered shape — orderBy().limit()
    plans as per-partition top-N + driver merge, and the kept head
    (<= top_n rows) broadcasts back onto the count relation to label
    the tail '__other__'. No unpartitioned window: pointed at a
    high-cardinality column (URL domains at corpus scale) the old
    row_number rank single-partition-sorted the whole count relation.
    """
    def side(df: DataFrame, tag: int) -> DataFrame:
        return df.select(
            F.coalesce(F.col(col).cast("string"), F.lit("__null__")).alias(
                "value"
            ),
            F.lit(tag).alias("_side"),
        )

    counts = _side_tagged_counts(side(df_a, 0), side(df_b, 1), "value")
    if top_n is not None:
        # counts is already lineage-truncated by _side_tagged_counts,
        # so the head selection and the relabel join share one
        # materialization of the union+groupBy
        head = (
            counts.orderBy(
                (F.col("n_a") + F.col("n_b")).desc(), F.col("value")
            )
            .limit(top_n)
            .select(F.col("value").alias("_kept"))
        )
        counts = (
            counts.join(
                F.broadcast(head),
                F.col("value") == F.col("_kept"),
                "left",
            )
            .withColumn(
                "value",
                F.when(
                    F.col("_kept").isNotNull(), F.col("value")
                ).otherwise(F.lit("__other__")),
            )
            .groupBy("value")
            .agg(F.sum("n_a").alias("n_a"), F.sum("n_b").alias("n_b"))
        )
    return _rates_and_tvd(counts, "value")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: list[str],
    compare_cols: list[str],
) -> DataFrame:
    """Row-level diff between two snapshots of a keyed table — the CDC
    primitive behind incremental recrawls and table replication audits:
    which keys were added, removed, changed, or are unchanged.

    Returns DataFrame(keys..., change string) with change in
    {'added','removed','changed','same'}. 'changed' compares
    ``compare_cols`` null-safely (<=> semantics: null == null).

    Scale shape: ONE full-outer equi-join on the key (both sides
    project keys + compared columns only — column pruning reaches the
    scans), change classification is a projection. No second pass, no
    window. Duplicate keys within a side are the caller's problem —
    run a ``validate`` unique rule first.
    """
    o = old.select(
        *[F.col(k).alias(f"_ok_{k}") for k in keys],
        *[F.col(c).alias(f"_o_{c}") for c in compare_cols],
    )
    n = new.select(
        *[F.col(k).alias(f"_nk_{k}") for k in keys],
        *[F.col(c).alias(f"_n_{c}") for c in compare_cols],
    )
    # explicit presence markers: inferring side membership from key
    # nullness misclassifies NULL-keyed rows (a removed NULL-key row
    # would read as 'added')
    o = o.withColumn("_o_present", F.lit(True))
    n = n.withColumn("_n_present", F.lit(True))
    cond = None
    for k in keys:
        eq = F.col(f"_ok_{k}") == F.col(f"_nk_{k}")
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    same = None
    for c in compare_cols:
        eq = F.col(f"_o_{c}").eqNullSafe(F.col(f"_n_{c}"))
        same = eq if same is None else same & eq
    change = (
        F.when(F.col("_o_present").isNull(), "added")
        .when(F.col("_n_present").isNull(), "removed")
        .when(same, "same")
        .otherwise("changed")
    )
    return joined.select(
        *[
            F.coalesce(F.col(f"_ok_{k}"), F.col(f"_nk_{k}")).alias(k)
            for k in keys
        ],
        change.alias("change"),
    )


def corpus_filter(
    df: DataFrame,
    min_tokens: int = 10,
    min_quality: float = 0.5,
    max_repetition: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """C4-style composite corpus filter: the keep/reject decision every
    pretraining pipeline runs, composed from this repo's quality
    primitives with a FIRST-FAILING-RULE reason label.

    Rule order (fixed, so the reason is deterministic):
    ``too_short`` (token count) → ``low_quality`` (quality_score) →
    ``repetitive`` (repeated-3-gram ratio on normalized tokens) →
    ``duplicate`` (exact-dup loser: lowest id per fingerprint wins) →
    ``kept``. Returns DataFrame(id, n_tokens, quality, rep_ratio,
    keep boolean, reason).

    Scale shape: all signals are projections over one scan; the only
    exchange is the fingerprint window for the dup rule (16-byte key).
    """
    from pyspark.sql import Window

    from dbscan_pyspark_spark.functions.text import (
        fingerprint,
        normalized,
        quality_score,
        repetition_ratio,
        token_count,
    )

    base = df.select(
        F.col(id_col),
        token_count(text_col).alias("n_tokens"),
        quality_score(text_col).alias("quality"),
        F.split(normalized(text_col), " ").alias("_toks"),
        fingerprint(text_col).alias("_fp"),
    ).select(
        id_col,
        "n_tokens",
        "quality",
        F.round(repetition_ratio("_toks", 3), 6).alias("rep_ratio"),
        "_fp",
    )
    w = Window.partitionBy("_fp").orderBy(id_col)
    marked = base.withColumn("_dup", F.row_number().over(w) > 1)
    reason = (
        F.when(F.col("n_tokens") < min_tokens, "too_short")
        .when(F.col("quality") < min_quality, "low_quality")
        .when(F.col("rep_ratio") > max_repetition, "repetitive")
        .when(F.col("_dup"), "duplicate")
        .otherwise("kept")
    )
    return marked.select(
        id_col,
        "n_tokens",
        "quality",
        "rep_ratio",
        reason.alias("reason"),
    ).withColumn("keep", F.col("reason") == "kept")


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis-
    Spirakis A-Res): each row gets key ln(u)/w for a uniform u derived
    from a PORTABLE hash of its id (not an RNG), and the k largest keys
    win — inclusion probability proportional to weight, but the draw is
    a pure function of (id, salt), so re-runs, incremental loads, and
    the DuckDB oracle all agree row-for-row.

    Scale shape: one projection + a global top-k (orderBy + limit — at
    100 TB Spark's TakeOrdered keeps only k rows per partition before
    the single-reducer merge). Zero-or-negative weights are excluded
    (they would never win anyway as ln(u)/w flips sign).
    """
    u = (portable_hash(id_col, salt=salt) + 1) / F.lit(float(1 << 60))
    key = F.log(u) / F.col(weight_col)
    return (
        df.where(F.col(weight_col) > 0)
        .withColumn("_wkey", key)
        .orderBy(F.col("_wkey").desc(), F.col(id_col))
        .limit(k)
        .drop("_wkey")
    )


def impute_group_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Median imputation per group: null values of ``value_col`` are
    replaced with their group's exact median (non-null rows pass
    through). The group medians are one partial-aggregatable
    ``percentile`` pass joined back on the group key — when the median
    relation is broadcast-sized (group cardinality ≪ rows, the usual
    case) Catalyst plans a map-side join and the data rows never
    reshuffle; high-cardinality groups fall back to a shuffle join
    rather than forcing an unbounded broadcast.
    """
    out_col = out_col or value_col
    med = df.groupBy(*group_cols).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("_med")
    )
    return (
        # no forced broadcast: group cardinality is unbounded in
        # general (e.g. per-user medians); Catalyst broadcasts when the
        # median relation is actually small
        df.join(med, group_cols, "left")
        .withColumn(
            out_col, F.coalesce(F.col(value_col), F.col("_med"))
        )
        .drop("_med")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo_q: float = 0.01,
    hi_q: float = 0.99,
    group_cols: list[str] | None = None,
    out_col: str | None = None,
) -> DataFrame:
    """Winsorization (outlier clipping): values below the ``lo_q``
    quantile or above ``hi_q`` are clamped to those quantiles —
    per group when ``group_cols`` is given, else globally. Exact
    ``percentile`` (deterministic, oracle-matched interpolation); the
    bounds relation broadcasts back against the scan.
    """
    out_col = out_col or value_col
    keys = group_cols or []
    agg = [
        F.expr(f"percentile({value_col}, {lo_q})").alias("_lo"),
        F.expr(f"percentile({value_col}, {hi_q})").alias("_hi"),
    ]
    bounds = df.groupBy(*keys).agg(*agg) if keys else df.agg(*agg)
    joined = (
        # no forced broadcast on the grouped path: group cardinality is
        # unbounded in general (same reasoning as impute_group_median);
        # Catalyst broadcasts when the bounds relation is actually
        # small. The global path is a single-row relation — broadcast
        # unconditionally.
        df.join(bounds, keys, "left")
        if keys
        else df.crossJoin(F.broadcast(bounds))
    )
    clamped = F.least(F.greatest(F.col(value_col), F.col("_lo")), F.col("_hi"))
    return joined.withColumn(
        out_col,
        # greatest/least skip nulls, which would fabricate the clip
        # floor for missing values — nulls must stay null
        F.when(F.col(value_col).isNull(), F.lit(None)).otherwise(clamped),
    ).drop("_lo", "_hi")


def gopher_quality(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_distinct_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style quality rule flags (Rae et al. 2021, §A1.1): word
    count bounds, mean word length in [3, 10], and presence of at least
    two distinct stopwords. Appends boolean ``pass_word_count``,
    ``pass_mean_word_len``, ``pass_stopwords``, ``pass_gopher`` (AND of
    all three).

    Pure single-scan projection (no shuffle); the word list is bound to
    a column first so the normalize/split runs once, not per-rule. The
    mean is an exact int/int division — the same IEEE double in every
    engine, so boundary comparisons are portable."""
    from dbscan_pyspark_spark.functions.text import STOPWORDS, normalized

    words = F.filter(
        F.split(normalized(F.col(text_col)), " "), lambda x: x != ""
    )
    out = df.withColumn("_w", words)
    n = F.size("_w")
    sum_len = F.aggregate(
        "_w", F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    n_stop = F.size(
        F.array_intersect(
            F.array_distinct("_w"),
            F.array(*[F.lit(s) for s in STOPWORDS]),
        )
    )
    out = (
        out.withColumn(
            "pass_word_count", (n >= min_words) & (n <= max_words)
        )
        .withColumn(
            # cross-multiplied, division-free: mean ∈ [lo, hi] iff
            # lo*n <= Σlen <= hi*n (n > 0) — no float division, no
            # div-by-zero branch, identical arithmetic in any engine
            "pass_mean_word_len",
            (n > 0)
            & (sum_len >= F.lit(min_mean_word_len) * n)
            & (sum_len <= F.lit(max_mean_word_len) * n),
        )
        .withColumn("pass_stopwords", n_stop >= min_distinct_stopwords)
    )
    return out.withColumn(
        "pass_gopher",
        F.col("pass_word_count")
        & F.col("pass_mean_word_len")
        & F.col("pass_stopwords"),
    ).drop("_w")


def bigram_fluency(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-frequency fluency score — the log-free stand-in for an
    n-gram LM perplexity filter (the KenLM role in C4/Gopher-style
    pipelines): score each document by how common its word bigrams are
    in the corpus.

    Per bigram occurrence the signal is the MAGNITUDE of the corpus
    count — ``length(bin(count))`` = floor(log2)+1, an exact integer in
    any engine (a float ``ln`` differs by 1 ulp between libm
    implementations, which would break oracle parity at grid
    boundaries). DataFrame(id_col, n_bigrams, fluency) where fluency =
    round(avg bit-length, 4); fluent/common text scores high, rare or
    garbled n-grams drag it down.

    Scale shape: one count shuffle on the bigram, one shuffle joining
    counts back to occurrences (both partial-aggregatable), one doc
    agg — no global sort (a percentile/ntile bucketing would need one,
    which is why magnitude buckets are the 100 TB formulation).
    """
    from dbscan_pyspark_spark.functions.text import normalized

    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(normalized(F.col(text_col)), " "), lambda x: x != ""
        ).alias("_t"),
    ).where(F.size("_t") >= 2)
    # occurrences, NOT distinct: a doc repeating a rare bigram should
    # feel it each time
    occ = toks.select(
        F.col(id_col),
        F.explode(
            F.expr("transform(sequence(1, size(_t) - 1), "
                   "i -> concat(_t[i-1], ' ', _t[i]))")
        ).alias("bg"),
    )
    # the occurrence relation feeds BOTH the count aggregate and the
    # join probe side; without lineage truncation the normalize/split/
    # explode over every document runs twice (non-eager localCheckpoint:
    # materialized by the first action, shared by both subplans)
    occ = occ.localCheckpoint(eager=False)
    counts = occ.groupBy("bg").agg(F.count(F.lit(1)).alias("_c"))
    mag = F.length(F.bin(F.col("_c")))
    return (
        occ.join(counts, "bg")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(
                F.sum(mag).cast("double") / F.count(F.lit(1)), 4
            ).alias("fluency"),
        )
    )


def _cms_hash(col: Column, row: int, width: int) -> Column:
    """Portable Count-Min hash for row ``row``: the first 15 md5 hex
    digits of ``row || ':' || value`` as an integer, mod width —
    engine-independent (DuckDB replays it bit-for-bit), the
    shingle_base_hash discipline."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{row}:"), col.cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("long")
        % F.lit(width)
    )


def count_min_sketch(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min Sketch (Cormode & Muthukrishnan, J.Alg 2005)
    over a key column: ``depth`` hash rows x ``width`` buckets of
    counter sums. Returns DataFrame(row int, bucket long, cnt long) —
    at most depth x width rows, the mergeable fixed-size summary
    (union two sketches by summing matching cells; estimates stay
    upper bounds).

    Deterministic md5-derived hashes make the sketch — and therefore
    every estimate — EXACTLY reproducible across engines, so unlike
    the engine-native HLL/KLL sketches (rows-only checks) the CMS
    carries a value-hash oracle. Scale shape: one projection explodes
    each input row into its ``depth`` (row, bucket) cells, then one
    map-side-combined groupBy over a key space of depth x width — the
    exchange carries at most depth x width x n_partitions partial
    rows regardless of input size. NULL keys are dropped (they have
    no identity to count).
    """
    if depth < 1 or width < 1:
        raise ValueError(
            f"count_min_sketch: need depth/width >= 1, got {depth}/{width}"
        )
    w = (
        F.col(weight_col).cast("long")
        if weight_col is not None
        else F.lit(1).cast("long")
    )
    keyed = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("_k"), w.alias("_w")
    )
    cells = keyed.select(
        "_w",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_hash(F.col("_k"), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    )
    return (
        cells.groupBy(
            F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket")
        )
        .agg(F.sum("_w").alias("cnt"))
    )


def cms_estimates(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 64,
    sketch: DataFrame | None = None,
) -> DataFrame:
    """Point-query every distinct key of ``df`` against a Count-Min
    Sketch (built here from the same relation unless a pre-built
    ``sketch`` is passed): estimate = min over rows of the key's
    bucket counter. Returns DataFrame(<key_col>, true_n, cms_estimate,
    overestimate) — ``overestimate = cms_estimate - true_n`` is >= 0
    by construction (the CMS guarantee; the test and the oracle pin
    it), and equals the collision mass the key absorbed.

    The probe side joins the (depth x width)-row sketch broadcast on
    (row, bucket) — estimates cost one small join however large the
    keyed corpus is.

    A pre-built ``sketch`` must have been built with the SAME
    depth/width as the probe parameters — otherwise the probe hashes
    land in different buckets and the inner (row, bucket) join
    silently drops rows or reads foreign counters. The sketch relation
    is bounded (<= depth x width rows), so a cheap bounds agg
    validates what it can observe and raises instead (ADVICE r9); a
    same-shaped sketch over different data is indistinguishable and
    remains the caller's contract."""
    if sketch is not None:
        b = sketch.agg(
            F.max("row").alias("_mr"), F.max("bucket").alias("_mb")
        ).first()
        if b["_mr"] is not None and (
            b["_mr"] >= depth or b["_mb"] >= width
        ):
            raise ValueError(
                f"cms_estimates: sketch cells (max row {b['_mr']}, max "
                f"bucket {b['_mb']}) exceed probe depth/width "
                f"{depth}/{width} — the sketch was built with different "
                "parameters"
            )
    cms = (
        sketch
        if sketch is not None
        else count_min_sketch(df, key_col, depth, width)
    )
    truth = (
        df.where(F.col(key_col).isNotNull())
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).cast("long").alias("true_n"))
    )
    probes = truth.select(
        key_col,
        "true_n",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        _cms_hash(F.col(key_col), r, width).alias("bucket"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("c"),
    ).select(key_col, "true_n", F.col("c.row").alias("row"), F.col("c.bucket").alias("bucket"))
    est = (
        probes.join(F.broadcast(cms), ["row", "bucket"])
        .groupBy(key_col, "true_n")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        key_col,
        "true_n",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("true_n")).alias("overestimate"),
    )


def linear_count_distinct(
    df: DataFrame,
    key_col: str,
    group_cols: list[str] | None = None,
    m: int = 1024,
    round_to: int = 4,
) -> DataFrame:
    """Distinct-count estimation by linear (probabilistic) counting
    (Whang, Vander-Zanden & Taylor, TODS 1990): hash every value into
    an ``m``-bit bitmap; with ``z`` bits still zero the estimate is
    ``-m·ln(z/m)``. Returns DataFrame([group_cols,] n_zero_bits,
    lpc_estimate double, true_distinct) — the estimate sits next to
    the exact count so the relation doubles as its own calibration.

    The portable md5 bit assignment makes the bitmap — and the
    estimate — EXACTLY reproducible cross-engine (the CMS discipline),
    so unlike the engine-native HLL this sketch carries a value-hash
    oracle. Scale shape: the bitmap is a ``count_distinct`` over
    (group, bit) — at most m values per group survive the map-side
    partial, so the exchange is group-cardinality x m regardless of
    input rows; the sketch state per group is m BITS (128 bytes at
    m=1024), the cheapest distinct summary short of HLL. Saturated
    bitmaps (z = 0: >> m distinct values) are emitted with a NULL
    estimate rather than infinity — size m to the expected
    cardinality. NULL keys are dropped."""
    if m < 1:
        raise ValueError(f"linear_count_distinct: need m >= 1, got {m}")
    groups = list(group_cols or [])
    keyed = df.where(F.col(key_col).isNotNull()).select(
        *groups, F.col(key_col).alias("_k")
    )
    bits = keyed.select(
        *groups, _cms_hash(F.col("_k"), 0, m).alias("_bit"), "_k"
    )
    agg = bits.groupBy(*groups).agg(
        F.count_distinct("_bit").alias("_n_set"),
        F.count_distinct("_k").alias("true_distinct"),
    )
    z = F.lit(m) - F.col("_n_set")
    est = F.when(
        z > 0, F.round(-F.lit(float(m)) * F.log(z / F.lit(float(m))), round_to)
    )
    return agg.select(
        *groups,
        z.cast("long").alias("n_zero_bits"),
        est.alias("lpc_estimate"),
        "true_distinct",
    )


def bloom_filter_bits(
    df: DataFrame, key_col: str, m: int = 4096, k: int = 4
) -> DataFrame:
    """Build a Bloom filter over a key column as its SET-BIT relation:
    DataFrame(bit long) with at most ``m`` rows — the portable,
    engine-exact representation (md5 bit assignment, the CMS
    discipline; a packed bitset would be an opaque blob no oracle
    could replay). ``k`` hash functions per key; one projection + one
    distinct over a key space capped at m."""
    if m < 1 or k < 1:
        raise ValueError(f"bloom_filter_bits: need m/k >= 1, got {m}/{k}")
    keyed = df.where(F.col(key_col).isNotNull()).select(
        F.col(key_col).alias("_k")
    )
    return (
        keyed.select(
            F.explode(
                F.array(*[_cms_hash(F.col("_k"), r, m) for r in range(k)])
            ).alias("bit")
        )
        .distinct()
    )


def bloom_probe(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m: int = 4096,
    k: int = 4,
    bits: DataFrame | None = None,
) -> DataFrame:
    """Probe every distinct ``probe_key`` against a Bloom filter built
    over ``build_key`` (or a pre-built :func:`bloom_filter_bits`
    relation): DataFrame(<probe_key>, bloom_maybe, actually_present) —
    ``bloom_maybe`` is true iff all k bits are set. The Bloom
    guarantee — NO false negatives, i.e. ``actually_present`` implies
    ``bloom_maybe`` — is pinned by the oracle and the test; the false-
    positive surplus is the filter's documented price.

    This is the join-pruning primitive at 100 TB: ship the <= m-row
    bit relation (a few KB) to the fact side as a broadcast semi-join
    pre-filter and the fact scan drops non-matching rows BEFORE the
    real join's exchange — the DataFrame-level analogue of the
    runtime bloom pushdown Spark applies inside AQE."""
    fbits = (
        bits if bits is not None else bloom_filter_bits(build, build_key, m, k)
    )
    probes = (
        probe.where(F.col(probe_key).isNotNull())
        .select(probe_key)
        .distinct()
    )
    exploded = probes.select(
        probe_key,
        F.explode(
            F.array(*[_cms_hash(F.col(probe_key), r, m) for r in range(k)])
        ).alias("bit"),
    )
    hit_counts = (
        exploded.join(F.broadcast(fbits), "bit", "left_semi")
        .groupBy(probe_key)
        .agg(F.count(F.lit(1)).alias("_hits"))
    )
    truth = build.where(F.col(build_key).isNotNull()).select(
        F.col(build_key).alias(probe_key)
    ).distinct().withColumn("_present", F.lit(True))
    return (
        probes.join(hit_counts, probe_key, "left")
        .join(truth, probe_key, "left")
        .select(
            probe_key,
            (F.coalesce(F.col("_hits"), F.lit(0)) == k).alias("bloom_maybe"),
            F.coalesce(F.col("_present"), F.lit(False)).alias(
                "actually_present"
            ),
        )
    )


def lm_perplexity(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    round_to: int = 4,
) -> DataFrame:
    """Per-document perplexity under an add-1-smoothed corpus bigram
    LM — the classic KenLM-style quality-filter signal, self-scored
    (the LM is trained on the same corpus it scores, the standard
    in-pipeline formulation):

        P(y | x) = (c(x,y) + 1) / (c(x) + V)
        ppl(doc) = exp( -(Σ ln P) / n_bigrams )

    with V the corpus unigram vocabulary size. Returns
    DataFrame(<id_col>, n_bigrams, ppl double) for documents with at
    least one bigram; fluent/common text scores LOW.

    Exactness discipline: each ln P is quantized to a 1e-9 decimal
    grid and summed as DECIMAL (a float sum of many addends is
    association-order-dependent across engines — the bm25 rule), the
    final exp/divide is a fixed-shape scalar expression, and the
    emitted ppl is round-``round_to``. The magnitude-bucket
    :func:`bigram_fluency` stays the ln-free alternative; this is the
    real smoothed-LM score for pipelines that accept the (rounded)
    libm dependency. Scale shape: identical to bigram_fluency — one
    bigram count shuffle, one unigram count shuffle, one occurrence
    join back, one per-doc aggregate; the 1-row V total is broadcast.
    """
    from dbscan_pyspark_spark.functions.text import normalized

    toks = df.select(
        F.col(id_col),
        F.filter(
            F.split(normalized(F.col(text_col)), " "), lambda x: x != ""
        ).alias("_t"),
    ).where(F.size("_t") >= 2)
    occ = toks.select(
        F.col(id_col),
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), "
                "i -> struct(_t[i-1] AS x, _t[i] AS y))"
            )
        ).alias("p"),
    ).select(id_col, F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    occ = occ.localCheckpoint(eager=False)
    bg = occ.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("_cxy")
    )
    uni_src = df.select(
        F.explode(
            F.filter(
                F.split(normalized(F.col(text_col)), " "), lambda x: x != ""
            )
        ).alias("term")
    )
    uni = uni_src.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("_cx")
    )
    vocab = uni.agg(F.count(F.lit(1)).cast("long").alias("_V"))
    lnp = (
        occ.join(bg, ["x", "y"])
        .join(uni.select(F.col("term").alias("x"), "_cx"), "x")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "_lnp",
            F.round(
                F.log((F.col("_cxy") + 1.0) / (F.col("_cx") + F.col("_V"))),
                9,
            ).cast("decimal(28,9)"),
        )
    )
    return (
        lnp.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum("_lnp").alias("_s"),
        )
        .select(
            id_col,
            "n_bigrams",
            F.round(
                F.exp(-(F.col("_s").cast("double")) / F.col("n_bigrams")),
                round_to,
            ).alias("ppl"),
        )
    )


def pmi_collocations(
    df: DataFrame,
    k: int = 20,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` collocations by pointwise mutual information
    (Church & Hanks, CL 1990): adjacent word pairs whose joint
    probability most exceeds independence,

        pmi(x, y) = ln( (n_xy / M) / ((n_x / N) · (n_y / N)) )

    over corpus unigram counts n (N total tokens) and adjacent-bigram
    counts (M total bigrams), with ``min_count`` pruning the unstable
    low-frequency tail — the standard phrase-mining / tokenizer-seeding
    primitive. Returns DataFrame(x, y, n_xy, pmi double, rnk int).

    Exactness discipline (the bm25 precedent): the only cross-engine
    FP hazard is ``ln`` itself (1-ulp libm differences), so the ratio
    is built as ONE log of an identically-structured expression in
    both engines, ranking uses the value quantized to a 1e-9 grid with
    (x, y) tie-break, and the emitted score is round-4. Scale shape:
    two partial-aggregatable count shuffles (unigrams, bigrams), a
    1-row totals aggregate broadcast on, two term-keyed joins of the
    min_count-pruned bigram relation against the unigram counts (AQE
    broadcasts the small side; a giant vocabulary falls back to a
    shuffle join on the term key),
    then TakeOrdered for the top-k slice — the rank window runs over
    the k-row head, never the full pair relation (the build_vocab
    pattern)."""
    from dbscan_pyspark_spark.functions.text import normalized

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    toks = df.select(
        F.filter(
            F.split(normalized(F.col(text_col)), " "), lambda t: t != ""
        ).alias("_t")
    ).localCheckpoint(eager=False)
    uni = (
        toks.select(F.explode("_t").alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("long").alias("n_term"))
    ).localCheckpoint(eager=False)
    bg = (
        toks.where(F.size("_t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(_t) - 1), "
                    "i -> struct(_t[i-1] AS x, _t[i] AS y))"
                )
            ).alias("p")
        )
        .groupBy(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_xy"))
    ).localCheckpoint(eager=False)
    totals = uni.agg(F.sum("n_term").cast("double").alias("_N")).crossJoin(
        bg.agg(F.sum("n_xy").cast("double").alias("_M"))
    )
    scored = (
        bg.where(F.col("n_xy") >= min_count)
        .join(
            uni.select(
                F.col("term").alias("x"), F.col("n_term").alias("_nx")
            ),
            "x",
        )
        .join(
            uni.select(
                F.col("term").alias("y"), F.col("n_term").alias("_ny")
            ),
            "y",
        )
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "_pmi",
            F.log(
                (F.col("n_xy") / F.col("_M"))
                / ((F.col("_nx") / F.col("_N")) * (F.col("_ny") / F.col("_N")))
            ),
        )
        .withColumn("_q", F.round(F.col("_pmi"), 9))
    )
    order = [F.col("_q").desc(), F.col("x"), F.col("y")]
    top = scored.orderBy(*order).limit(k)
    from pyspark.sql import Window

    return top.withColumn(
        "rnk", F.row_number().over(Window.orderBy(*order))
    ).select(
        "x", "y", "n_xy", F.round("_pmi", 4).alias("pmi"), "rnk"
    )


def build_vocab(
    df: DataFrame,
    size: int = 1000,
    text_col: str = "text",
    min_count: int = 1,
) -> DataFrame:
    """Deterministic vocabulary induction: the ``size`` most frequent
    normalized tokens, assigned dense ids by (count DESC, token) —
    ties broken lexically so the id assignment is reproducible across
    runs, engines, and cluster sizes (the word-level tokenizer-training
    step of a text pipeline; BPE merges would iterate on top of this
    count relation).

    DataFrame(token_id, token, n_occurrences). Scale shape: one
    partial-aggregatable count shuffle over token occurrences, then
    TakeOrdered for the top-``size`` slice — no global sort of the
    full vocabulary domain ever materializes (orderBy().limit() plans
    as a per-partition top-N + driver merge).
    """
    from dbscan_pyspark_spark.functions.text import normalized

    toks = df.select(
        F.explode(
            F.filter(
                F.split(normalized(F.col(text_col)), " "),
                lambda x: x != "",
            )
        ).alias("token")
    )
    counts = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
        .where(F.col("n_occurrences") >= min_count)
    )
    top = counts.orderBy(
        F.col("n_occurrences").desc(), F.col("token")
    ).limit(size)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("token"))
    # the window runs over the already-limited `size`-row relation, so
    # the single-partition sort it implies is bounded by the vocab
    # size, never the corpus
    return top.select(
        F.row_number().over(w).alias("token_id"),
        "token",
        "n_occurrences",
    )


def budget_waterfill(
    sources: DataFrame,
    budget: int,
    group_col: str = "source",
    avail_col: str = "avail",
) -> DataFrame:
    """Fair-share (max-min / waterfilling) token-budget allocation
    across sources — the data-mixing planner's core split: given each
    source's available token count and a total training budget,
    allocate ``min(avail, theta)`` per source where the water level
    ``theta`` is the largest level the budget affords. Small sources
    are taken whole; the budget left over is divided EQUALLY among the
    rest — the allocation that maximizes the minimum share (the
    flattening step behind mixture tuning, cf. temperature_sample's
    alpha=0.5 law; this is the alpha->0 limit with exact conservation).

    Closed form, no iteration: sort sources by (avail, group), prefix-
    sum, pick the largest j* with ``S_j + a_j * (n - j) <= budget``
    (sources 1..j* fit under their own level and are taken whole),
    then the remainder R = budget - S_{j*} spreads over the m = n - j*
    larger sources as ``theta = R // m`` with the first ``R % m`` of
    them (in sort order) getting one extra unit — every remaining
    source has ``avail >= theta + 1`` by the maximality of j*, so the
    +1 never overshoots a cap. All integer arithmetic -> exactly
    SQL-replayable.

    Returns DataFrame(group, avail long, alloc long) with
    ``sum(alloc) = min(budget, sum(avail))`` and ``alloc <= avail``
    everywhere. The unpartitioned windows run over the SOURCES
    relation — domain-bounded (languages, crawls, registries), never
    the corpus — the bounded-by-construction WindowExec class.
    """
    if budget < 0:
        raise ValueError(f"budget_waterfill: budget must be >= 0, got {budget}")
    internal = {"_a", "_j", "_s", "_n", "_jstar", "_sstar", "_m", "_r"}
    if group_col in internal:
        raise ValueError(
            f"budget_waterfill: group_col {group_col!r} collides with "
            "internal columns"
        )
    # windows sort the RENAMED projection (the input avail_col is cast
    # and re-aliased to _a first)
    w = Window.orderBy(F.col("_a").asc(), F.col(group_col).asc())
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    b = F.lit(int(budget)).cast("long")
    # NULL avail cannot waterfill (the two engines even SORT nulls to
    # opposite ends, so it is an oracle-parity break on top of a
    # nonsense allocation) and a negative avail would flow through as
    # a negative 'allocation' — raise plan-side, the global_cumsums
    # null-contract pattern
    a_checked = (
        F.when(
            F.col(avail_col).isNull() | (F.col(avail_col) < 0),
            F.raise_error(
                F.lit(
                    "budget_waterfill: avail must be non-null and >= 0"
                )
            ).cast("long"),
        )
        .otherwise(F.col(avail_col).cast("long"))
        .alias("_a")
    )
    # duplicate group values would make the row_number tie-break
    # arbitrary across (avail, group) ties, so the +1 remainder
    # placement — and hence the whole allocation — would be run-
    # dependent, silently voiding the determinism/oracle-parity
    # contract. Raise plan-side, same device as the avail check.
    w_grp = Window.partitionBy(group_col)
    g_checked = F.when(
        F.count(F.lit(1)).over(w_grp) > 1,
        F.raise_error(
            F.concat(
                F.lit(
                    "budget_waterfill: duplicate group value "
                ),
                F.col(group_col).cast("string"),
                F.lit(
                    " — sources must be keyed by group_col (one row "
                    "per source, e.g. a groupBy output)"
                ),
            )
        ).cast(sources.schema[group_col].dataType),
    ).otherwise(F.col(group_col))
    ranked = sources.select(
        g_checked.alias(group_col),
        a_checked,
    ).select(
        group_col,
        "_a",
        F.row_number().over(w).cast("long").alias("_j"),
        F.sum("_a").over(w_run).cast("long").alias("_s"),
        F.count(F.lit(1)).over(w_all).cast("long").alias("_n"),
    )
    fits = F.col("_s") + F.col("_a") * (F.col("_n") - F.col("_j")) <= b
    lev = ranked.select(
        "*",
        F.coalesce(
            F.max(F.when(fits, F.col("_j"))).over(w_all), F.lit(0).cast("long")
        ).alias("_jstar"),
        F.coalesce(
            F.max(F.when(fits, F.col("_s"))).over(w_all), F.lit(0).cast("long")
        ).alias("_sstar"),
    )
    lev = lev.select(
        "*",
        (F.col("_n") - F.col("_jstar")).alias("_m"),
        (b - F.col("_sstar")).alias("_r"),
    )
    # `div`, not `/`: long / long is DOUBLE division in Spark and goes
    # inexact past 2^53 — integer division keeps the whole allocation
    # exact at any budget (and lets the DuckDB oracle's // mirror it)
    theta = F.when(
        F.col("_m") > 0, F.expr("_r div _m").cast("long")
    ).otherwise(F.lit(0).cast("long"))
    extra = F.when(
        (F.col("_m") > 0)
        & (F.col("_j") - F.col("_jstar") <= F.pmod("_r", F.col("_m"))),
        F.lit(1),
    ).otherwise(F.lit(0)).cast("long")
    alloc = F.when(F.col("_j") <= F.col("_jstar"), F.col("_a")).otherwise(
        theta + extra
    )
    return lev.select(
        group_col,
        F.col("_a").alias("avail"),
        alloc.alias("alloc"),
    )


def apply_allocation(
    df: DataFrame,
    alloc: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    token_count_col: Column | str | None = None,
    salt: str = "waterfill",
    chunked: bool | None = None,
    hot_source_avail: int = 100_000_000,
    n_chunks: int = 64,
) -> DataFrame:
    """The APPLY step of :func:`budget_waterfill`: deterministically
    select documents per source until each source's allocated token
    budget is filled. Within a source, docs rank by
    ``(portable_hash(id), id)`` — a reproducible unbiased shuffle
    order, the same device as every hash sampler here — and a doc is
    kept while the source's RUNNING token sum stays within its
    allocation (greedy prefix; the kept total undershoots ``alloc`` by
    less than one document, never overshoots). No RNG, no collect —
    replayable row-by-row and exactly SQL-expressible.

    ``token_count_col``: a Column (or column name) with each doc's
    integer token count; defaults to the whitespace
    :func:`~dbscan_pyspark_spark.functions.text.token_count` of
    ``text``. ``alloc`` is DataFrame(source, ..., alloc) as returned
    by :func:`budget_waterfill` (broadcast — it is domain-bounded).

    Returns the kept rows as DataFrame(id, source, n_tokens,
    cum_tokens) with ``cum_tokens`` the source's running total
    INCLUDING the row (so ``max(cum_tokens) <= alloc`` per source).

    Scale shape: one broadcast join on the bounded alloc relation,
    then per-source running sums. A single ``partitionBy(source)``
    window sorts each source in ONE task — unlike ``source_cap``'s
    top-k window there is no ``WindowGroupLimit`` map-side prune for
    a running sum, so a mega source (one crawl = 80% of corpus, the
    common regime) would funnel through a single task at 100 TB.
    Sources whose mass crosses ``hot_source_avail`` therefore switch
    AUTOMATICALLY to a chunked two-phase plan: the 60-bit portable
    hash is range-bucketed into ``n_chunks`` contiguous chunks
    (order-preserving — ``hash div chunk_width`` is monotone in the
    sort key), phase 1 runs the running sum within (source, chunk)
    in parallel, and phase 2 adds each chunk's offset — the summed
    totals of its predecessor chunks, a sources x n_chunks relation
    computed with one tiny window and broadcast back. The result is
    bit-identical to the single window (the DuckDB oracle stays the
    one-window SQL), with per-task memory bounded by source/n_chunks.

    The switch reads the ``avail`` column of ``alloc`` — present on
    every :func:`budget_waterfill` output, already the per-source
    token mass, so detection costs nothing. If ``alloc`` carries no
    ``avail``, auto mode keeps the plain window (pass
    ``chunked=True`` to force the two-phase for every source;
    ``chunked=False`` forces the single window).
    """
    if token_count_col is None:
        from dbscan_pyspark_spark.functions.text import token_count

        tok = token_count("text")
    elif isinstance(token_count_col, str):
        tok = F.col(token_count_col)
    else:
        tok = token_count_col
    # a NULL token count (e.g. NULL text) is skipped by the window sum,
    # so the doc would be kept 'for free' with NULL n_tokens; a negative
    # count breaks the monotone running sum and voids the never-
    # overshoot guarantee. Raise plan-side — the budget_waterfill avail
    # contract, applied to the per-doc side.
    tok = (
        F.when(
            tok.isNull() | (tok < 0),
            F.raise_error(
                F.lit(
                    "apply_allocation: token count must be non-null "
                    "and >= 0 for every document"
                )
            ).cast("long"),
        )
        .otherwise(tok.cast("long"))
    )
    if n_chunks < 2:
        raise ValueError(f"apply_allocation: n_chunks must be >= 2, got {n_chunks}")
    if chunked is None:
        hot = (
            F.col("avail").cast("long") >= F.lit(int(hot_source_avail))
            if "avail" in alloc.columns
            else F.lit(False)
        )
    else:
        hot = F.lit(bool(chunked))
    base = df.select(
        F.col(id_col),
        F.col(source_col),
        tok.alias("n_tokens"),
        portable_hash(id_col, salt=salt).alias("_h"),
    ).join(
        F.broadcast(alloc.select(source_col, "alloc", hot.alias("_hot"))),
        source_col,
    )

    w_cold = (
        Window.partitionBy(source_col)
        .orderBy("_h", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out_cold = base.where(~F.col("_hot")).select(
        id_col,
        source_col,
        "n_tokens",
        F.sum("n_tokens").over(w_cold).cast("long").alias("cum_tokens"),
        "alloc",
    )

    # hot path: contiguous hash-range chunks, running sum per
    # (source, chunk), then the broadcast chunk-offset join
    chunk_width = ((1 << 60) + n_chunks - 1) // n_chunks
    hot_rows = base.where(F.col("_hot")).withColumn(
        "_c", F.expr(f"_h div {chunk_width}")
    )
    w_local = (
        Window.partitionBy(source_col, "_c")
        .orderBy("_h", F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = hot_rows.withColumn(
        "_ls", F.sum("n_tokens").over(w_local).cast("long")
    )
    w_off = (
        Window.partitionBy(source_col)
        .orderBy("_c")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = (
        hot_rows.groupBy(source_col, "_c")
        .agg(F.sum("n_tokens").cast("long").alias("_ct"))
        .select(
            source_col,
            "_c",
            F.coalesce(F.sum("_ct").over(w_off), F.lit(0).cast("long")).alias(
                "_off"
            ),
        )
    )
    out_hot = local.join(
        F.broadcast(offsets), [source_col, "_c"]
    ).select(
        id_col,
        source_col,
        "n_tokens",
        (F.col("_ls") + F.col("_off")).cast("long").alias("cum_tokens"),
        "alloc",
    )
    ranked = out_cold.unionByName(out_hot)
    return ranked.where(F.col("cum_tokens") <= F.col("alloc")).drop("alloc")


def normalize_unicode(
    df: "DataFrame",
    text_col: str = "text",
    out_col: str = "norm_text",
    form: str = "NFC",
) -> "DataFrame":
    """Unicode canonicalization (NFC/NFKC/NFD/NFKD) of a text column —
    the normalization every dedup/fingerprint family assumes upstream:
    without it, ``'é'`` (U+00E9) and ``'e'+U+0301`` hash apart and the
    same document escapes exact dedup, MinHash banding, and substring
    spans. Appends ``out_col`` next to the input columns.

    Spark has no JVM-side Unicode normalizer (collations compare, they
    don't transform), so this is the one place the text family uses an
    Arrow-vectorized scalar ``pandas_udf`` (pandas ``Series.str
    .normalize`` — batched columnar transfer, NOT a row-at-a-time
    Python UDF; the §2.9 discipline is about the latter). Exactly
    oracle-able: DuckDB's ``nfc_normalize`` implements the same
    Unicode normal form, pinned by the ``doc_unicode_nfc`` contract
    query. Zero shuffle — a pure projection.
    """
    if form not in ("NFC", "NFKC", "NFD", "NFKD"):
        raise ValueError(
            f"normalize_unicode: form must be NFC/NFKC/NFD/NFKD, got "
            f"{form!r}"
        )
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(s):  # pd.Series -> pd.Series
        return s.str.normalize(form)

    return df.withColumn(out_col, _norm(F.col(text_col)))
