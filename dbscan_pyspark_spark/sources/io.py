"""Sources & sinks (SURVEY.md §2.1, S1-S6).

The reference reads headerless int CSVs via ``sc.textFile(...).map(split,
int-cast)`` (``DBSCAN.py:53``) and writes JSON / parquet sinks through a
Spark-1.x sqlContext (``DBSCAN.py:80-84``, ``k-means.ipynb:cell0:L69-71``).
Here every source is a DataFrameReader (predicate pushdown + column
pruning for free) and every sink a DataFrameWriter.  Any Hadoop-FS URI
(s3a://, hdfs://, file:) works unchanged — the reference's S3 source
(``DBSCAN.py:39-40``) is just a path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_csv_points(
    spark: SparkSession,
    path: str,
    dimension: int,
    n_cols: int | None = None,
    header: bool = False,
) -> DataFrame:
    """S1: headerless integer CSV -> points frame.

    Output schema: ``id long, features array<double>, sensitive long`` —
    the first ``dimension`` columns become the feature vector (distance
    participates), the column *after* the prefix is the sensitive
    attribute carried through anonymization untouched (``DBSCAN.py:84``).
    ``id`` is a stable surrogate (row position), replacing the
    reference's tuple-as-identity (SURVEY.md §1.3).
    """
    raw = spark.read.csv(path, header=header, inferSchema=False)
    cols = raw.columns
    if n_cols is not None:
        cols = cols[:n_cols]
    feature_cols = [F.col(c).cast("double") for c in cols[:dimension]]
    sensitive = (
        F.col(cols[dimension]).cast("long")
        if len(cols) > dimension
        else F.lit(None).cast("long")
    )
    # monotonically_increasing_id is partition-stable and never shuffles.
    return raw.select(
        F.monotonically_increasing_id().alias("id"),
        F.array(*feature_cols).alias("features"),
        sensitive.alias("sensitive"),
    )


def write_json(df: DataFrame, path: str) -> None:
    """S3: JSON sink, overwrite mode (``DBSCAN.py:80-84``)."""
    df.write.mode("overwrite").json(path)


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    """S4: parquet sink, overwrite (``k-means.ipynb:cell0:L69-71``)."""
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str, single_file: bool = False) -> None:
    """S5: metrics-log CSV sink (``DBSCAN.py:135-143`` wrote driver-local)."""
    w = (df.coalesce(1) if single_file else df).write.mode("overwrite")
    w.option("header", True).csv(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_by: list[str],
    num_buckets: int = 64,
    sort_by: list[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed parquet table sink — the co-located-join primitive.

    Pays ONE hash shuffle at write time (``bucketBy`` clusters rows into
    ``num_buckets`` files by ``hash(bucket_by)``); every later equi-join
    or aggregation on those keys between tables bucketed the same way
    runs with NO exchange on either side — at 100 TB that converts the
    nightly fact-to-fact join from the dominant shuffle into a local
    zipper of pre-sorted buckets (``sort_by`` additionally enables
    sort-merge without the sort). The reference re-shuffled its whole
    dataset every ε iteration; this is the durable alternative.
    """
    w = df.write.mode(mode).bucketBy(int(num_buckets), *bucket_by)
    if sort_by:
        w = w.sortBy(*sort_by)
    if path:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(table)


def zorder_key(cols, bits: int = 16):
    """Morton (Z-order) key from pre-gridded nonnegative integer coords.

    Interleaves the low ``bits`` bits of each column (column j supplies
    bit position ``i*len(cols)+j`` from its bit i), so rows close in ALL
    dimensions get close keys. Pure bitwise built-ins — whole-stage
    codegen keeps the ``bits * len(cols)`` shift/or terms JVM-side.
    """
    d = len(cols)
    if d < 1 or bits * d > 63:
        # a real error, not an assert: under `python -O` an oversized
        # bits*d would otherwise silently collide bit positions and
        # produce a broken Z-order layout
        raise ValueError(
            f"interleaved key must fit a long: bits={bits} x dims={d} > 63"
        )
    z = None
    for j, c in enumerate(cols):
        c = (F.col(c) if isinstance(c, str) else c).cast("long")
        for i in range(bits):
            term = F.shiftleft(
                F.shiftright(c, i).bitwiseAND(F.lit(1)), i * d + j
            )
            z = term if z is None else z.bitwiseOR(term)
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: list[str],
    bits: int = 12,
    num_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Parquet write clustered on the Z-order curve of ``cols``.

    Each column is min/max-scaled onto a ``2^bits`` grid (one bounded
    agg job computes the ranges), rows are range-partitioned AND sorted
    by the interleaved Morton key, then written. Because the curve
    localizes every participating dimension, each output file's parquet
    row-group min/max stats are narrow in ALL ``cols`` — so a later
    range predicate on ANY of them prunes most files/row-groups at the
    scan, where a plain ``sortWithinPartitions(col_a)`` layout prunes
    only on ``col_a`` and leaves every other column's stats spanning the
    full domain in every file. At 100 TB this is the difference between
    reading one file and reading the table for the second predicate.

    Beyond-reference extension (the reference has no layout control at
    all); same role as Delta/Iceberg OPTIMIZE ZORDER BY, built from
    plain Spark ops.
    """
    ranges = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"_min_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"_max_{c}") for c in cols],
    ).collect()[0]
    grid_max = (1 << bits) - 1
    coords = []
    for c in cols:
        lo, hi = ranges[f"_min_{c}"], ranges[f"_max_{c}"]
        if lo is None or hi is None:  # empty (or all-null) input
            lo, hi = 0.0, 1.0
        span = (hi - lo) or 1.0
        coords.append(
            F.least(
                F.lit(grid_max),
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * grid_max),
            ).cast("long")
        )
    keyed = df.withColumn("_z", zorder_key(coords, bits=bits))
    n = num_files or max(df.sparkSession.sparkContext.defaultParallelism, 1)
    (
        keyed.repartitionByRange(int(n), "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


POINTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
        T.StructField("sensitive", T.LongType(), True),
    ]
)


def compact_parquet(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: list[str] | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files (the OPTIMIZE/compaction half of
    lakehouse table maintenance; ``write_zordered`` is the clustering
    half). Returns the new file count.

    File count is sized from the on-disk bytes of the existing footprint
    (cheap driver-side listing, no data scan), so a directory of ten
    thousand 1 MB shuffle spills becomes ~80 right-sized files — at
    100 TB, small-file explosion is what turns scans into
    metadata-bound crawls. The rewrite is one coalesce-free
    ``repartition`` (even output sizes beat coalesce's skewed unions),
    optionally sorted within partitions to keep row-group stats tight.

    Swap discipline: the rewrite lands in a ``._compact_tmp`` sibling;
    the original is then renamed to ``._compact_old``, tmp renamed into
    place, and old deleted last — so a crash at any point leaves a
    complete copy of the data under exactly one of the three names
    (recovery: if ``path`` is missing, rename whichever sibling exists
    back). Local-filesystem only (os.rename semantics); concurrent
    readers can still observe a brief window where ``path`` is absent
    between the two renames — this is maintenance for quiesced tables,
    not a transactional commit (that's a table format's job).
    """
    import glob
    import os
    import shutil

    subdirs = [
        d
        for d in glob.glob(os.path.join(path, "*"))
        if os.path.isdir(d) and "=" in os.path.basename(d)
    ]
    if subdirs:
        # a flat rewrite would silently drop the partition layout (and
        # its pruning); compact each leaf instead
        raise ValueError(
            f"{path} is hive-partitioned ({os.path.basename(subdirs[0])}, "
            "...); call compact_parquet on each partition directory"
        )
    files = glob.glob(os.path.join(path, "*.parquet"))
    total = sum(os.path.getsize(f) for f in files)
    n_files = max(1, round(total / target_file_bytes)) if total else 1
    df = spark.read.parquet(path)
    out = df.repartition(n_files)
    if sort_within_by:
        out = out.sortWithinPartitions(*sort_within_by)
    tmp = path.rstrip("/") + "._compact_tmp"
    old = path.rstrip("/") + "._compact_old"
    out.write.mode("overwrite").parquet(tmp)
    if os.path.exists(old):
        shutil.rmtree(old)  # leftover from a previous crashed swap
    os.rename(path.rstrip("/"), old)
    os.rename(tmp, path.rstrip("/"))
    shutil.rmtree(old)
    return len(glob.glob(os.path.join(path, "*.parquet")))
