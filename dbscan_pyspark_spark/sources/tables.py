"""Driver-testdata star schema + derived points views (FIXTURES.md §4).

Points views are computed *identically* in Spark and in the DuckDB oracle
SQL, so features are integer-quantized with ``round()`` where exact value
hash-matching matters (float L1 comparisons at an eps boundary would be
engine-dependent otherwise).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLE_NAMES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS,false): Spark has no nanos
        # type, so read it as long (legacy conf, set defensively here for
        # sessions not built by our factory) and truncate to microseconds
        # — exactly what engines with native readers (DuckDB) do.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/events.parquet")
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every test table as a temp view (same names DuckDB's
    oracle uses), so ``spark.sql("SELECT ... FROM lineitem ...")`` runs
    directly. Returns the registered names."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
    return list(TABLE_NAMES)


def points_from_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pts_lineitem(id, features[3], sensitive) — clustering fixture.

    The driver's synthetic lineitem repeats (l_orderkey, l_linenumber)
    pairs, so no natural key is unique; the id is
    ``monotonically_increasing_id`` — partition-stable, computed inline
    during the scan, NO shuffle (an earlier window-rank id cost a full
    sort-shuffle of the table before clustering even started). No
    oracle query consumes these ids (the SQL-matched point view is
    pts_customer), and DBSCAN's observable outputs — cluster sizes,
    noise split, centroid math — are invariant to which duplicate row
    carries which id.
    features = round(quantity), round(extendedprice/1000), round(discount*100)
    — integer-valued doubles so L1 comparisons are engine-exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        F.monotonically_increasing_id().alias("id"),
        F.array(
            F.round(F.col("l_quantity"), 0),
            F.round(F.col("l_extendedprice") / 1000.0, 0),
            F.round(F.col("l_discount") * 100.0, 0),
        ).alias("features"),
        F.col("l_linenumber").cast("long").alias("sensitive"),
    )


def points_from_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """pts_customer(id, features[2], sensitive) — small clustering fixture.

    Mirrors the reference's 2-QI ``data.csv`` shape (FIXTURES.md §1):
    features = round(acctbal/100), nationkey; sensitive = length of segment.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.array(
            F.round(F.col("c_acctbal") / 100.0, 0),
            F.col("c_nationkey").cast("double"),
        ).alias("features"),
        F.length("c_mktsegment").cast("long").alias("sensitive"),
    )


PTS_CUSTOMER_SQL = """
SELECT c_custkey AS id,
       round(c_acctbal / 100.0, 0) AS f0,
       CAST(c_nationkey AS DOUBLE) AS f1,
       CAST(length(c_mktsegment) AS BIGINT) AS sensitive
FROM customer
"""
