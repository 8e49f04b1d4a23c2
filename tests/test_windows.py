from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.windows import (
    anti_top_k_per_group,
    argmin_row,
    top_k_per_group,
)

ROWS = [
    ("a", 1, 10.0),
    ("a", 2, 5.0),
    ("a", 3, 7.0),
    ("b", 4, 1.0),
    ("b", 5, 2.0),
]


def test_top_k(spark):
    df = spark.createDataFrame(ROWS, ["g", "id", "d"])
    got = {
        (r["g"], r["id"])
        for r in top_k_per_group(df, ["g"], [F.col("d"), F.col("id")], 2).collect()
    }
    assert got == {("a", 2), ("a", 3), ("b", 4), ("b", 5)}


def test_anti_top_k(spark):
    df = spark.createDataFrame(ROWS, ["g", "id", "d"])
    got = {
        (r["g"], r["id"])
        for r in anti_top_k_per_group(df, ["g"], [F.col("d"), F.col("id")], 2).collect()
    }
    assert got == {("a", 1)}


def test_argmin_row(spark):
    df = spark.createDataFrame(ROWS, ["g", "id", "d"])
    assert argmin_row(df, [F.col("d"), F.col("id")]).first()["id"] == 4


# ------------------------------------------ distributed global ranking


def test_global_row_number_matches_window(spark):
    """global_row_number over a total order equals the unpartitioned
    Window row_number, for several partition counts including 1 and
    more partitions than rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.windows import global_row_number

    df = spark.range(500).select(
        F.col("id"),
        (F.abs(F.xxhash64("id")) % 37).alias("v"),  # heavy ties
    )
    # ascending AND descending leading keys: every production caller
    # orders by a .desc() column, so the desc path must be pinned too
    for order in (
        [F.col("v"), F.col("id")],
        [F.col("v").desc(), F.col("id")],
    ):
        want = {
            (r["id"], r["rn"])
            for r in df.select(
                "id",
                F.row_number()
                .over(Window.orderBy(*order))
                .cast("long")
                .alias("rn"),
            ).collect()
        }
        for parts in (1, 7, 32, 1000):
            got_df, n = global_row_number(
                df, list(order), out_col="rn", num_partitions=parts
            )
            assert n == 500
            got = {(r["id"], r["rn"]) for r in got_df.collect()}
            assert got == want, (parts, str(order))


def test_global_row_number_empty_and_dense(spark):
    """Empty input yields (empty, 0); on real input every rank appears
    exactly once, 1..n (the ranked relation is checkpointed, so the
    partition-id window itself is not inspectable from the final plan —
    the per-partition window shape is what the implementation builds by
    construction, and its WindowExec always has the _gpid key)."""
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.windows import global_row_number

    empty = spark.range(0).select(F.col("id"))
    out, n = global_row_number(empty, ["id"])
    assert n == 0 and out.count() == 0
    df = spark.range(100).select("id")
    out, _ = global_row_number(df, ["id"], num_partitions=8)
    rns = sorted(r["rn"] for r in out.collect())
    assert rns == list(range(1, 101))


def test_global_ntile_validates_k(spark):
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.windows import global_ntile

    df = spark.range(5).select("id")
    with _pytest.raises(ValueError):
        global_ntile(df, 0, ["id"])


def test_global_ntile_matches_window(spark):
    """Closed-form NTILE from the global row number is bit-identical
    to F.ntile for awkward n/k combinations (n%k != 0, n < k)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.windows import global_ntile

    for n, k in [(10, 4), (100, 7), (3, 5), (13, 13), (97, 10)]:
        df = spark.range(n).select(
            F.col("id"), (F.abs(F.xxhash64("id")) % 11).alias("v")
        )
        for order in (
            [F.col("v"), F.col("id")],
            [F.col("v").desc(), F.col("id")],
        ):
            want = {
                (r["id"], r["t"])
                for r in df.select(
                    "id",
                    F.ntile(k).over(Window.orderBy(*order)).alias("t"),
                ).collect()
            }
            got = {
                (r["id"], r["tile"])
                for r in global_ntile(
                    df, k, list(order), num_partitions=6
                ).collect()
            }
            assert got == want, (n, k, str(order))


def test_global_cumsum_matches_window(spark):
    """Distributed prefix sum (+ optional rank) equals the
    unpartitioned running-sum window under a total order, ascending and
    descending, across partition counts."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.windows import global_cumsum

    df = spark.range(400).select(
        F.col("id"),
        (F.abs(F.xxhash64("id")) % 23).alias("v"),
        (F.abs(F.xxhash64("id", F.lit(1))) % 1000).alias("x"),
    )
    for order in (
        [F.col("v"), F.col("id")],
        [F.col("v").desc(), F.col("id")],
    ):
        w = Window.orderBy(*order).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        want = {
            (r["id"], r["cs"], r["rn"])
            for r in df.select(
                "id",
                F.sum("x").over(w).cast("long").alias("cs"),
                F.row_number()
                .over(Window.orderBy(*order))
                .cast("long")
                .alias("rn"),
            ).collect()
        }
        for parts in (1, 9, 64):
            got_df, n, total = global_cumsum(
                df, list(order), "x", out_col="cs", rn_col="rn",
                num_partitions=parts,
            )
            assert n == 400
            got = {(r["id"], r["cs"], r["rn"]) for r in got_df.collect()}
            assert got == want, (parts, str(order))
            # the final cumulative value is the total
            assert total == max(cs for _, cs, _ in got)
    # empty input
    out, n, total = global_cumsum(df.where(F.lit(False)), ["id"], "x")
    assert n == 0 and total == 0 and out.count() == 0


def test_global_cumsum_null_and_collision_contracts(spark):
    """NULL values raise (per-partition pieces cannot reproduce the
    window's null propagation); out_col == value_col is safe because
    the running sum reads an internal copy of the value."""
    import pytest as _pytest
    from pyspark.errors import PythonException, SparkRuntimeException
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.windows import global_cumsum

    bad = spark.createDataFrame([(1, 10), (2, None)], "id long, x int")
    with _pytest.raises((PythonException, SparkRuntimeException)):
        global_cumsum(bad, ["id"], "x", num_partitions=2)

    df = spark.range(6).select("id", (F.col("id") + 1).alias("x"))
    out, n, total = global_cumsum(
        df, ["id"], "x", out_col="x", num_partitions=3
    )
    assert (n, total) == (6, 21)
    got = sorted((r["id"], r["x"]) for r in out.collect())
    # x overwritten by its own exact prefix sums: 1,3,6,10,15,21
    assert got == [(0, 1), (1, 3), (2, 6), (3, 10), (4, 15), (5, 21)]

    # an out_col (or rn_col) that SHADOWS an order_by sort key is SAFE:
    # all window expressions compute in one projection against the
    # pre-rename plan (round-6 advice; round-7 review closed the
    # Column-typed order_by hole the original name-based guard missed).
    # The multi-column case is the dangerous one — the second running
    # sum must still sort by the ORIGINAL id, not x's prefix sums.
    from dbscan_pyspark_spark.operators.windows import global_cumsums

    df2 = df.select(
        "id", "x", (F.lit(10) - F.col("id")).alias("y")
    )  # y descends as id ascends
    out2, n2, totals = global_cumsums(
        df2,
        [F.col("id")],  # Column-typed sort key — uninspectable by name
        ["x", "y"],
        out_cols=["id", "cy"],  # first output SHADOWS the sort key
        rn_col="rn",
        num_partitions=3,
    )
    assert (n2, totals) == (6, [21, 45])
    got2 = sorted(
        (r["rn"], r["id"], r["cy"]) for r in out2.collect()
    )
    # id overwritten by x's prefix sums in id order (1,3,6,10,15,21);
    # cy = prefix sums of y=10-id in the SAME id order: 10,19,27,34,40,45
    assert got2 == [
        (1, 1, 10), (2, 3, 19), (3, 6, 27),
        (4, 10, 34), (5, 15, 40), (6, 21, 45),
    ]

    # genuinely ambiguous outputs still raise
    with _pytest.raises(ValueError, match="duplicate"):
        global_cumsums(df2, ["id"], ["x", "y"], out_cols=["cx", "cx"])
    with _pytest.raises(ValueError, match="collides"):
        global_cumsums(df2, ["id"], ["x"], out_cols=["cx"], rn_col="cx")
    with _pytest.raises(ValueError, match="internal"):
        global_cumsums(df2, ["id"], ["x"], out_cols=["_gpid"])


def test_shuffle_partitions_tolerates_non_integer_conf(spark):
    """Platforms that set spark.sql.shuffle.partitions to 'auto'
    (Databricks AQE auto-optimized shuffle) must not break the
    global-rank default — fall back to defaultParallelism (r5
    advice)."""
    from dbscan_pyspark_spark.operators.windows import _shuffle_partitions

    class _FakeConf:
        def __init__(self, value):
            self._v = value

        def get(self, key):
            assert key == "spark.sql.shuffle.partitions"
            return self._v

    class _FakeSpark:
        def __init__(self, value, parallelism):
            self.conf = _FakeConf(value)
            self.sparkContext = type(
                "SC", (), {"defaultParallelism": parallelism}
            )()

    assert _shuffle_partitions(_FakeSpark("17", 4)) == 17
    assert _shuffle_partitions(_FakeSpark("auto", 4)) == 4
    assert _shuffle_partitions(_FakeSpark(None, 8)) == 8
    # the real session still resolves through the same helper
    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
