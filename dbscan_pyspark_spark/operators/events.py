"""Event-time window aggregations over the ``events`` table (batch).

The reference has no streaming surface (SURVEY.md §2.8); these are the
batch forms — tumbling / sliding via ``F.window``, sessionization via
``F.session_window`` — with Structured Streaming wrappers in
``dbscan_pyspark_spark.streaming``. All aggregation is built-in windowed
groupBy: map-side partial aggs, event-time partitioning, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_agg(
    events: DataFrame,
    duration: str = "1 hour",
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-window (and optional per-key) count + value sum.

    DataFrame(window_start, [group_cols...], n_events, sum_value).
    sum_value is decimal-cast before the sum so it is exact and
    order-independent (float sums are neither).
    """
    keys = [F.window(ts_col, duration)] + [F.col(c) for c in (group_cols or [])]
    return (
        events.groupBy(*keys)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            *(group_cols or []),
            "n_events",
            "sum_value",
        )
    )


def sliding_agg(
    events: DataFrame,
    duration: str = "1 hour",
    slide: str = "30 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Sliding-window count/sum: each event lands in duration/slide windows."""
    return (
        events.groupBy(F.window(ts_col, duration, slide))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


def session_agg(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    user_col: str = "user_id",
) -> DataFrame:
    """Per-user sessions with the given inactivity gap.

    DataFrame(user_id, session_start, n_events, sum_value). Built on
    ``session_window`` (merging windowed state), the same operator the
    streaming wrapper uses with a watermark.
    """
    return (
        events.groupBy(F.session_window(ts_col, gap), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sum_value"),
        )
        .select(
            user_col,
            F.col("session_window.start").alias("session_start"),
            "n_events",
            "sum_value",
        )
    )
