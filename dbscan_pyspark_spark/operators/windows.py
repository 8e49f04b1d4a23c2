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


def argmin_row(df: DataFrame, order_by: list[Column | str]) -> DataFrame:
    """Global argmin row (W3: the reference's driver-side best-ε /
    min-cost tracking, ``DBSCAN.py:148-151``) as orderBy().limit(1)."""
    return df.orderBy(*order_by).limit(1)
