"""Streaming data-quality monitors (north-star §2.8 surface — the
reference has no streaming at all).

The ingestion-time twins of the batch quality gates in
``operators/pipeline.py``: every micro-batch is scored against a
static reference — categorical mix drift (``category_drift``) and a
declarative expectation suite (``validate``) — and the per-batch
verdict rows land in ``monitor_batch=<id>`` partition directories.

State/idempotency design (same discipline as the streaming near-dup
filter's signature store): the monitors keep NO streaming state — the
reference side is a static relation, each batch is scored alone, and a
replayed micro-batch overwrites its own partition bit-for-bit instead
of appending duplicate verdicts. Monitor output is a plain parquet
table any dashboard can read.

Scale: the reference histogram / rule thresholds are tiny relations
(values × counts, rules × scalars) — the per-batch cost is one pass
over the batch, reference recomputation is a broadcast-sized groupBy.
For a very large reference corpus, pre-aggregate it once and pass the
(value, count) relation as ``reference``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def process_drift_batch(
    batch: DataFrame,
    batch_id: int,
    reference: DataFrame,
    col: str,
    output_dir: str,
    top_n: int | None = None,
) -> None:
    """One micro-batch of the drift monitor (pure batch code,
    unit-testable without a stream; ``streaming_drift_monitor`` wraps
    it in ``foreachBatch``). Writes category_drift(reference, batch)
    rows + batch_id to the batch's own partition (replay-idempotent)."""
    if batch.isEmpty():
        return
    from dbscan_pyspark_spark.operators.pipeline import category_drift

    # persist: isEmpty + the drift agg each re-read the source
    # otherwise (the process_near_dup_batch discipline)
    batch = batch.persist()
    try:
        drift = category_drift(reference, batch, col, top_n=top_n).withColumn(
            "batch_id", F.lit(batch_id)
        )
        drift.write.mode("overwrite").parquet(
            f"{output_dir}/monitor_batch={batch_id}"
        )
    finally:
        batch.unpersist()


def streaming_drift_monitor(
    stream: DataFrame,
    reference: DataFrame,
    col: str,
    output_dir: str,
    checkpoint_dir: str,
    top_n: int | None = None,
):
    """Per-micro-batch categorical drift vs a static reference: the
    streaming deployment of the batch ``category_drift`` gate (is this
    hour's event/language/source mix still the training mix?).

    Returns the started StreamingQuery (availableNow trigger)."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        process_drift_batch(
            batch_df, batch_id, reference, col, output_dir, top_n
        )

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def process_expectations_batch(
    batch: DataFrame,
    batch_id: int,
    rules: list[tuple],
    output_dir: str,
) -> None:
    """One micro-batch of the expectations monitor: run the
    ``validate`` rule suite on the batch, write (rule, violations,
    passed, batch_id) to the batch's own partition."""
    if batch.isEmpty():
        return
    from dbscan_pyspark_spark.operators.pipeline import validate

    # persist: isEmpty + the predicate agg + each unique rule's
    # distinct count would otherwise re-read the source per trigger
    batch = batch.persist()
    try:
        report = validate(batch, rules).withColumn(
            "batch_id", F.lit(batch_id)
        )
        report.write.mode("overwrite").parquet(
            f"{output_dir}/monitor_batch={batch_id}"
        )
    finally:
        batch.unpersist()


def streaming_expectations(
    stream: DataFrame,
    rules: list[tuple],
    output_dir: str,
    checkpoint_dir: str,
):
    """Per-micro-batch data-quality gate: the streaming deployment of
    the batch ``validate`` suite (did this batch ship nulls, range
    breaks, duplicate keys?). Returns the started StreamingQuery."""

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        process_expectations_batch(batch_df, batch_id, rules, output_dir)

    return (
        stream.writeStream.outputMode("append")
        .foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
