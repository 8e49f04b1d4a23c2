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


POINTS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
        T.StructField("sensitive", T.LongType(), True),
    ]
)
