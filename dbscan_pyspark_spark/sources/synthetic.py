"""Custom Python Data Source (Spark 4 DataSource API): deterministic
synthetic event streams for benchmarking and soak tests.

``spark.read.format("synthetic_events")`` after
:func:`register_synthetic_source` — the newest Spark extension surface
(SPARK-44076, Python Data Source API), used here to generate the
events-table shape at any row count WITHOUT files or RNG state:

- every value derives from a splittable counter hash (xxhash-style mix
  of the row index), so any (n_rows, seed) pair reproduces the same
  relation on any cluster, at any parallelism,
- partition planning is real: ``numPartitions`` InputPartitions, each
  generating its contiguous index range independently — the source
  scales out like a parquet scan, no driver materialization,
- batch and micro-batch (``readStream``) readers share one generator.
  By default the stream reader exposes everything up to ``n_rows`` at
  once (the availableNow/trigger-once shape; ``rows_per_batch`` then
  only shards partitions WITHIN the batch); with
  ``advance_per_trigger=true`` the offset instead advances by
  ``rows_per_batch`` per committed trigger, so ProcessingTime soak
  tests get an incremental, reproducible batch sequence (in-process
  only: the cursor is driver memory, not checkpoint state — use the
  default mode when restart recovery matters).

The reference hard-coded its inputs as committed CSVs; an engine needs
a load generator that behaves like a table.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

SCHEMA_DDL = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double"
)

_EVENT_TYPES = ["view", "click", "purchase", "error", "signup"]
_EPOCH = 1704067200  # 2024-01-01T00:00:00Z


def _mix(x: int) -> int:
    """Deterministic 64-bit mix (splitmix64 finalizer)."""
    x = (x + 0x9E3779B97F4A7C15) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    return x ^ (x >> 31)


def _row(i: int, seed: int, n_users: int):
    import datetime as dt

    h = _mix(i * 2654435761 + seed)
    ts = dt.datetime.fromtimestamp(
        _EPOCH + i * 7 + h % 5, tz=dt.timezone.utc
    ).replace(tzinfo=None)
    return (
        i,
        ts,
        h % n_users,
        _EVENT_TYPES[(h >> 20) % len(_EVENT_TYPES)],
        round(((h >> 32) % 10_000) / 100.0, 2),
    )


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class _SyntheticReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 100))
        self.lo = 0
        self.hi = self.n_rows

    def pushFilters(self, filters):
        """Real predicate pushdown: range predicates on event_id (the
        generation counter) narrow the index range BEFORE partition
        planning, so filtered reads generate — and ship — only the
        matching slice. Anything else is returned for Spark to apply."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        for f in filters:
            attr = getattr(f, "attribute", None)
            if attr != ("event_id",):
                yield f
                continue
            if isinstance(f, EqualTo):
                self.lo = max(self.lo, int(f.value))
                self.hi = min(self.hi, int(f.value) + 1)
            elif isinstance(f, GreaterThan):
                self.lo = max(self.lo, int(f.value) + 1)
            elif isinstance(f, GreaterThanOrEqual):
                self.lo = max(self.lo, int(f.value))
            elif isinstance(f, LessThan):
                self.hi = min(self.hi, int(f.value))
            elif isinstance(f, LessThanOrEqual):
                self.hi = min(self.hi, int(f.value) + 1)
            else:
                yield f

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        n = hi - lo
        if n <= 0:
            return [_RangePartition(0, 0)]
        step = max(1, (n + self.n_parts - 1) // self.n_parts)
        return [
            _RangePartition(s, min(s + step, hi))
            for s in range(lo, hi, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed, self.n_users)


class _SyntheticStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))  # total to emit
        self.rows_per_batch = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))
        self.n_users = int(options.get("n_users", 100))
        self.advance_per_trigger = (
            str(options.get("advance_per_trigger", "false")).lower()
            == "true"
        )
        self._cursor = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        if self.advance_per_trigger:
            # incremental mode: one rows_per_batch step beyond the last
            # COMMITTED batch — idempotent within a trigger (repeated
            # latestOffset calls return the same value, no skipped
            # rows). In-process soak mode only: the cursor is driver
            # memory, so a checkpoint RESTART would regress offsets —
            # the default (expose-everything) mode is the restart-safe
            # one.
            return {
                "index": min(
                    self._cursor + self.rows_per_batch, self.n_rows
                )
            }
        # default: expose everything (availableNow / trigger-once shape)
        return {"index": self.n_rows}

    def partitions(self, start, end):
        s, e = int(start["index"]), int(end["index"])
        step = max(1, self.rows_per_batch)
        return [
            _RangePartition(i, min(i + step, e)) for i in range(s, e, step)
        ]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i, self.seed, self.n_users)

    def commit(self, end):
        # advance the incremental cursor only on commit (exactly-once
        # bookkeeping for the in-process soak mode)
        self._cursor = max(self._cursor, int(end["index"]))


class SyntheticEventsDataSource(DataSource):
    """``format("synthetic_events")`` — options: n_rows, numPartitions,
    seed, n_users, rows_per_batch (stream)."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return SCHEMA_DDL

    def reader(self, schema: StructType) -> DataSourceReader:
        return _SyntheticReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _SyntheticStreamReader(self.options)


class _AuditMsg(WriterCommitMessage):
    def __init__(self, n: int, crc: int):
        self.n = n
        self.crc = crc


class _AuditWriter(DataSourceWriter):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("audit_sink requires .option('path', ...)")
        self.path = path

    def write(self, iterator):
        import zlib

        n = 0
        crc = 0
        for row in iterator:
            n += 1
            crc = zlib.crc32(repr(tuple(row)).encode(), crc)
        return _AuditMsg(n, crc)

    def commit(self, messages):
        import json

        manifest = {
            "total_rows": sum(m.n for m in messages),
            "n_partitions": len(messages),
            "partition_checksums": [[m.n, m.crc] for m in messages],
        }
        with open(self.path, "w") as f:
            json.dump(manifest, f)

    def abort(self, messages):
        pass


class AuditSinkDataSource(DataSource):
    """``format("audit_sink")`` writer: executors stream rows into
    per-task (count, crc32) commit messages; the driver-side commit
    writes one JSON manifest — the two-phase task-commit/job-commit
    protocol every real sink implements, in its smallest honest form
    (an audit/row-accounting sink for pipeline validation)."""

    @classmethod
    def name(cls) -> str:
        return "audit_sink"

    def writer(self, schema: StructType, overwrite: bool):
        return _AuditWriter(self.options)


def register_synthetic_source(spark) -> None:
    """Idempotently register the synthetic source and audit sink."""
    try:
        # needed for pushFilters; a no-op where already set (session.py
        # sets it at build time — this covers foreign sessions)
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    except Exception:
        pass
    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(AuditSinkDataSource)
