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
