"""Per-group top-k keep / release (SURVEY.md §2.5 W1/W2).

The reference sorts each cluster's members by distance driver-side and
slices (``keep_pts`` / ``popup_available_pts``,
``k-means.ipynb:cell0:L43-50``). Here both are one window function —
rank within group, filter — which shuffles once on the group key and
never materializes a group in memory.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ranked(df: DataFrame, group_by: list[str], order_by: list[Column | str]) -> DataFrame:
    w = Window.partitionBy(*group_by).orderBy(*order_by)
    return df.withColumn("_rn", F.row_number().over(w))


def top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Keep the k first rows of each group under ``order_by`` (W1).

    Give a deterministic total order (include a unique id as the last
    sort key) when exact oracle matching matters.
    """
    out = _ranked(df, group_by, order_by).where(F.col("_rn") <= k)
    return out.withColumnRenamed("_rn", rank_col) if rank_col else out.drop("_rn")


def anti_top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_by: list[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Rows ranked **after** the first k of their group (W2) — the
    'released back to the pool' set of the k-member repair loop."""
    out = _ranked(df, group_by, order_by).where(F.col("_rn") > k)
    return out.withColumnRenamed("_rn", rank_col) if rank_col else out.drop("_rn")


def partial_top_k_per_group(
    df: DataFrame,
    group_by: list[str],
    order_spec: list[tuple[str, bool]],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Exact per-group top-k with a pre-exchange partial reduction.

    A plain window top-k shuffles EVERY candidate row to the group's
    reducer before ranking — at n rows x q groups that exchange is the
    scale bottleneck (the ``cosine_topk`` watch item). Here each input
    partition first reduces locally to its own top-k per group
    (Arrow-batched ``mapInPandas``; batches are pruned as they stream,
    so memory is bounded by k x groups-seen + one batch), and only
    k x groups x partitions rows reach the exchange; the exact window
    then ranks that small set. The local winners of every partition are
    a superset of the global winners, so the result is identical to the
    window-only plan.

    ``order_spec``: [(column_name, ascending), ...] — plain column
    names, not expressions (project them first). Nulls sort LAST in
    both directions (pandas and window sides agree on that here; note
    Spark's bare ``asc()`` default is nulls-first).
    """
    names = [c for c, _ in order_spec]
    asc = [a for _, a in order_spec]
    sort_cols = list(group_by) + names
    sort_asc = [True] * len(group_by) + asc

    def reduce_batches(batches):
        import pandas as pd

        acc: pd.DataFrame | None = None
        for pdf in batches:
            if not len(pdf):
                continue
            both = pdf if acc is None else pd.concat((acc, pdf))
            acc = (
                both.sort_values(sort_cols, ascending=sort_asc, na_position="last")
                .groupby(group_by, sort=False, dropna=False)
                .head(k)
            )
        if acc is not None:
            yield acc

    local = df.mapInPandas(reduce_batches, df.schema)
    order = [
        (F.col(c).asc_nulls_last() if a else F.col(c).desc_nulls_last())
        for c, a in order_spec
    ]
    w = Window.partitionBy(*group_by).orderBy(*order)
    out = local.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k)
    return out.withColumnRenamed("_rn", rank_col) if rank_col else out.drop("_rn")


def argmin_row(df: DataFrame, order_by: list[Column | str]) -> DataFrame:
    """Global argmin row (W3: the reference's driver-side best-ε /
    min-cost tracking, ``DBSCAN.py:148-151``) as orderBy().limit(1)."""
    return df.orderBy(*order_by).limit(1)


def mode_per_group(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    out_col: str | None = None,
) -> DataFrame:
    """Deterministic per-group mode: the most frequent ``value_col``
    per group, smallest value winning ties (Spark's built-in ``mode``
    is tie-nondeterministic, so it can never hash-match an oracle).

    DataFrame(group_cols..., out_col, n) where ``n`` is the winning
    frequency. Scale shape: one partial-aggregatable count shuffle on
    (group, value) + a rank window partitioned by group — partition
    cardinality is the (group, value) domain, never the row count."""
    out_col = out_col or f"mode_{value_col}"
    counts = df.groupBy(*group_cols, value_col).agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.col("n").desc(), F.col(value_col)
    )
    return (
        counts.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") == 1)
        .select(*group_cols, F.col(value_col).alias(out_col), "n")
    )


def _shuffle_partitions(spark) -> int:
    """``spark.sql.shuffle.partitions`` as an int, tolerating platforms
    where the conf is not a plain integer (Databricks AQE
    auto-optimized shuffle sets it to ``'auto'``) — fall back to the
    cluster's default parallelism rather than breaking every
    global-rank query whose caller relied on the default."""
    raw = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        return int(raw)
    except (TypeError, ValueError):
        from ..compat import default_parallelism

        return default_parallelism(spark)


def global_row_number(
    df: DataFrame,
    order_by: list[Column | str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> tuple[DataFrame, int]:
    """Distributed global ``row_number`` over a TOTAL order — the
    scale-safe replacement for ``Window.orderBy(...)``, whose
    WindowExec single-partition-sorts the entire relation (Spark logs
    `WindowExec: No Partition Defined`; at 10^9 per-customer rows that
    is one task sorting everything).

    Shape: range-repartition on the order key (the same distributed
    sort a global ``orderBy`` does), rank WITHIN each physical
    partition (the window's partition key is the partition id, so no
    reducer ever holds more than one range), then add each partition's
    prefix offset — offsets come from ONE bounded collect of
    ``num_partitions`` counts, the same driver-scalar class as
    centroid pulls. Returns ``(df_with_out_col, total_row_count)``;
    the count is free (sum of the collected sizes) and callers need it
    for ntile/cume_dist arithmetic.

    REQUIRES a total order: the range partitioner may split EQUAL keys
    across partition boundaries, so ``order_by`` must include a unique
    tiebreaker (same rule the oracle queries already follow). The
    ranked relation is eagerly localCheckpointed so the size collect
    and the returned plan share one materialization (and partition ids
    cannot drift between the two).

    Implemented as the prefix sum of a constant 1 — ONE skeleton for
    the whole ranking family lives in :func:`global_cumsum`."""
    out, n, _ = global_cumsum(
        df.withColumn("_gone", F.lit(1).cast("long")),
        order_by,
        "_gone",
        out_col=out_col,
        num_partitions=num_partitions,
    )
    return out.drop("_gone"), n


def _ntile_from_rn(rn: Column, n: int, k: int) -> Column:
    """SQL-standard NTILE(k) as a closed-form expression over a global
    row number: the first n%k tiles hold ceil(n/k) rows, the rest
    floor(n/k) — bit-identical to ``F.ntile(k)`` under the same total
    order (pinned by test_global_ntile_matches_window)."""
    q, r = divmod(int(n), int(k))
    if q == 0:
        return rn.cast("int")  # n < k: one row per tile, tile = rn
    head = r * (q + 1)
    return (
        F.when(rn <= head, F.floor((rn - 1) / (q + 1)) + 1)
        .otherwise(F.lit(r) + F.floor((rn - head - 1) / q) + 1)
        .cast("int")
    )


def global_ntile(
    df: DataFrame,
    k: int,
    order_by: list[Column | str],
    out_col: str = "tile",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``NTILE(k)`` over a total order — ``F.ntile`` forced
    through :func:`global_row_number` instead of an unpartitioned
    window. Same output, no single-partition sort."""
    if k < 1:
        raise ValueError(f"ntile k must be >= 1, got {k}")
    ranked, n = global_row_number(
        df, order_by, out_col="_gnt_rn", num_partitions=num_partitions
    )
    return ranked.withColumn(
        out_col, _ntile_from_rn(F.col("_gnt_rn"), n, k)
    ).drop("_gnt_rn")


def global_cumsums(
    df: DataFrame,
    order_by: list[Column | str],
    value_cols: list[str],
    out_cols: list[str] | None = None,
    rn_col: str | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, list[int]]:
    """Distributed prefix sums over a TOTAL order — the Lorenz-curve /
    cumulative-share / CDF primitive (``SUM(x) OVER (ORDER BY ...)``,
    one per value column, all sharing ONE sort) without the
    unpartitioned window's single-task sort. Same skeleton as
    :func:`global_row_number`: range repartition, per-partition-id
    running sums, broadcast-joined per-partition prefix offsets from
    one bounded collect (this time of (count, sum...) tuples).

    Every value column must be integral (long) and NON-NULL for
    exactness — float prefix sums are addition-order-dependent in ANY
    engine (quantize money to cents first, the oracle-parity grid
    trick), and a NULL value cannot reproduce the window's
    null-propagation semantics from per-partition pieces, so it raises
    (coalesce to 0 upstream if that is the intent). Optionally also
    emits the global row number as ``rn_col`` (same order, zero extra
    cost). Returns ``(df, total_rows, [total_sum per value col])``.
    ``out_cols[i] == value_cols[i]`` is safe (the running sums read
    internal copies of the values), and so is an output name that
    shadows an order_by sort key — every window expression is computed
    in ONE projection against the pre-rename plan, so later
    expressions can never re-resolve a sort key to a prefix sum. The
    shadowed input column is replaced in the output, as with any
    ``withColumn`` overwrite.

    Multiple columns cost ONE extra running-sum expression each inside
    the same window — the two-sample KS statistic (:func:`ks_drift`)
    needs both sides' CDFs on the same value grid, which two separate
    cumsum calls would pay a second range shuffle for.

    Equivalence note: a position-based prefix sum equals SQL's default
    RANGE frame only under a total order (no peers) — same requirement
    the rank carries, for the same range-partitioner reason."""
    if not value_cols:
        raise ValueError("global_cumsums: value_cols must be non-empty")
    out_cols = out_cols or [f"csum_{c}" for c in value_cols]
    if len(out_cols) != len(value_cols):
        raise ValueError("global_cumsums: out_cols/value_cols mismatch")
    if len(set(out_cols)) != len(out_cols):
        raise ValueError(f"global_cumsums: duplicate out_cols {out_cols}")
    reserved = {"_gpid", "_gnoff"} | {
        f"_gval{i}" for i in range(len(value_cols))
    } | {f"_gsoff{i}" for i in range(len(value_cols))}
    bad = reserved.intersection(out_cols) | (
        {rn_col} & reserved if rn_col else set()
    )
    if bad:
        raise ValueError(
            f"global_cumsums: output name(s) {sorted(bad)} collide with "
            "internal columns"
        )
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    n_parts = int(num_partitions) if num_partitions else _shuffle_partitions(
        df.sparkSession
    )
    # internal value copies: (a) the null contract raise, (b) make
    # out_col == value_col collisions safe — the stats agg reads the
    # copies, never the (possibly overwritten) caller columns
    k = len(value_cols)
    gvals = [
        F.when(
            F.col(vc).isNull(),
            F.raise_error(
                F.lit(f"global_cumsum: {vc} must be non-null")
            ).cast("long"),
        )
        .otherwise(F.col(vc).cast("long"))
        .alias(f"_gval{i}")
        for i, vc in enumerate(value_cols)
    ]
    w_order = Window.partitionBy("_gpid").orderBy(*cols)
    w_sum = w_order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    local = (
        df.select("*", *gvals)
        .repartitionByRange(n_parts, *cols)
        .withColumn("_gpid", F.spark_partition_id())
    )
    # ALL window expressions in ONE projection against the same child
    # plan: an out_col (or rn_col) may freely shadow an order_by sort
    # key or a value column, because every sort key resolves against
    # the pre-projection plan — a sequential withColumn chain instead
    # re-resolves lazily and silently sorts the LATER expressions by
    # the already-written prefix sum (the round-7 review hazard; this
    # also covers Column-typed order_by entries, which no name-based
    # guard can inspect)
    win = {
        oc: F.sum(f"_gval{i}").over(w_sum).cast("long").alias(oc)
        for i, oc in enumerate(out_cols)
    }
    if rn_col is not None:
        if rn_col in win:
            raise ValueError(
                f"global_cumsums: rn_col {rn_col!r} collides with an out_col"
            )
        win[rn_col] = F.row_number().over(w_order).cast("long").alias(rn_col)
    replaced = [win.pop(c) if c in win else F.col(c) for c in local.columns]
    local = local.select(*replaced, *win.values()).localCheckpoint(eager=True)
    stats = sorted(
        tuple(r[c] for c in ["_gpid", "_n", *(f"_s{i}" for i in range(k))])
        for r in local.groupBy("_gpid")
        .agg(
            F.count(F.lit(1)).alias("_n"),
            *(
                F.sum(f"_gval{i}").cast("long").alias(f"_s{i}")
                for i in range(k)
            ),
        )
        .collect()
    )
    offsets: list[tuple] = []
    total_n = 0
    total_s = [0] * k
    for pid, n, *sums in stats:
        offsets.append((pid, total_n, *total_s))
        total_n += n
        for i, s in enumerate(sums):
            total_s[i] += int(s or 0)
    gval_names = [f"_gval{i}" for i in range(k)]
    if not offsets:
        return local.drop("_gpid", *gval_names), 0, [0] * k
    # broadcast JOIN, not a literal create_map lookup: Catalyst
    # evaluates GetMapValue on a literal map as a per-row linear scan
    # over all entries — O(num_partitions) per row, real money at the
    # scale this operator exists for. The hash join is O(1) per row.
    off_schema = "_gpid int, _gnoff long, " + ", ".join(
        f"_gsoff{i} long" for i in range(k)
    )
    off_df = df.sparkSession.createDataFrame(offsets, off_schema)
    out = local.join(F.broadcast(off_df), "_gpid", "left")
    for i, oc in enumerate(out_cols):
        out = out.withColumn(
            oc, F.col(oc) + F.coalesce(F.col(f"_gsoff{i}"), F.lit(0))
        )
    if rn_col is not None:
        out = out.withColumn(
            rn_col, F.col(rn_col) + F.coalesce(F.col("_gnoff"), F.lit(0))
        )
    out = out.drop(
        "_gpid", "_gnoff", *(f"_gsoff{i}" for i in range(k)), *gval_names
    )
    return out, total_n, total_s


def global_cumsum(
    df: DataFrame,
    order_by: list[Column | str],
    value_col: str,
    out_col: str = "csum",
    rn_col: str | None = None,
    num_partitions: int | None = None,
) -> tuple[DataFrame, int, int]:
    """Single-column :func:`global_cumsums` — see there for the
    contract (integral non-null values, total order, returns
    ``(df, total_rows, total_sum)``)."""
    out, total_n, totals = global_cumsums(
        df,
        order_by,
        [value_col],
        out_cols=[out_col],
        rn_col=rn_col,
        num_partitions=num_partitions,
    )
    return out, total_n, totals[0]
