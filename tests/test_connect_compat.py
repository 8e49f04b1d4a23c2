"""Spark Connect compatibility shims (compat.py) — fallback branches.

The sandbox has no grpc, so no live Connect server: each shim's
Connect branch is exercised by handing it an object whose classic
accessor raises (the failure shape Connect produces), and the
operator-level tests force the fallback via monkeypatch and assert
output equivalence against the classic path. Matrix: CONNECT.md.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark import compat


class _Raises:
    def __getattr__(self, name):  # every access is a hard failure
        raise AttributeError(name)


class _FakeConf:
    def __init__(self, values):
        self._values = values

    def get(self, key, default=None):
        if key in self._values:
            return self._values[key]
        if default is not None:
            return default
        raise Exception(f"no conf {key}")


class _FakeConnectSession:
    """Raises on sparkContext/_jvm like a Connect session; conf works."""

    def __init__(self, conf_values):
        self.conf = _FakeConf(conf_values)

    @property
    def sparkContext(self):
        raise AttributeError("sparkContext is not available on Connect")

    @property
    def _jvm(self):
        raise AttributeError("_jvm is not available on Connect")


# --- unit: each shim's primary vs fallback ---------------------------


def test_is_connect(spark):
    assert compat.is_connect(spark) is False
    assert compat.is_connect(_FakeConnectSession({})) is True


def test_default_parallelism_classic(spark):
    assert (
        compat.default_parallelism(spark)
        == spark.sparkContext.defaultParallelism
    )


def test_default_parallelism_conf_fallback():
    fake = _FakeConnectSession({"spark.default.parallelism": "96"})
    assert compat.default_parallelism(fake) == 96
    fake = _FakeConnectSession({"spark.sql.shuffle.partitions": "48"})
    assert compat.default_parallelism(fake) == 48
    # Databricks 'auto' is not an int -> keep falling through to 200
    fake = _FakeConnectSession({"spark.sql.shuffle.partitions": "auto"})
    assert compat.default_parallelism(fake) == 200
    assert compat.default_parallelism(_FakeConnectSession({})) == 200


def test_num_scan_partitions_classic(spark):
    df = spark.range(100).repartition(7)
    assert compat.num_scan_partitions(df) == 7


def test_num_scan_partitions_file_fallback(spark, tmp_path):
    path = str(tmp_path / "p")
    spark.range(100).repartition(3).write.parquet(path)
    df = spark.read.parquet(path)

    class _NoRdd:
        def __init__(self, inner):
            self._inner = inner

        @property
        def rdd(self):
            raise AttributeError("rdd is not available on Connect")

        def inputFiles(self):
            return self._inner.inputFiles()

    n = compat.num_scan_partitions(_NoRdd(df))
    assert n == len(df.inputFiles()) == 3
    # non-file relation -> conservative 1 (force the spread)
    assert compat.num_scan_partitions(_Raises()) == 1


def test_master_and_heap_fallbacks(spark):
    assert compat.master_url(spark).startswith("local")
    assert compat.jvm_max_heap_bytes(spark) > 0
    fake = _FakeConnectSession({"spark.master": "sc://remote:15002"})
    assert compat.master_url(fake) == "sc://remote:15002"
    assert compat.master_url(_FakeConnectSession({})) == ""
    assert compat.jvm_max_heap_bytes(_FakeConnectSession({})) == 0


def test_ensure_checkpoint_dir_noop_on_connect(tmp_path):
    # must not raise when sparkContext is absent
    compat.ensure_checkpoint_dir(_FakeConnectSession({}), str(tmp_path))


def test_formatted_plan_string_fallback_equivalent(spark):
    df = spark.range(1000).where(F.col("id") > 5).select("id")
    via_jvm = compat.formatted_plan_string(df)

    class _NoJdf:
        """Connect shape: no _sc/_jdf, but explain() prints."""

        def __init__(self, inner):
            self._inner = inner

        @property
        def _sc(self):
            raise AttributeError("_sc is not available on Connect")

        def explain(self, mode):
            self._inner.explain(mode=mode)

    via_stdout = compat.formatted_plan_string(_NoJdf(df))
    assert via_stdout.strip() == via_jvm.strip()
    assert "Range" in via_stdout


# --- operator-level: forced fallback == classic output ----------------


def test_shingle_spread_guard_fallback_equivalence(spark, monkeypatch):
    from dbscan_pyspark_spark.operators import dedup as dedup_mod

    docs = spark.createDataFrame(
        [
            (i, f"alpha beta gamma delta {i % 7} epsilon zeta eta theta")
            for i in range(60)
        ],
        "doc_id long, text string",
    ).coalesce(1)

    classic = sorted(
        dedup_mod.ngram_jaccard_pairs(docs, threshold=0.8, n=3).collect()
    )
    # Connect shape: no df.rdd -> num_scan_partitions returns 1 and the
    # guard repartitions; result must be identical.
    monkeypatch.setattr(compat, "num_scan_partitions", lambda df: 1)
    forced = sorted(
        dedup_mod.ngram_jaccard_pairs(docs, threshold=0.8, n=3).collect()
    )
    assert forced == classic
    assert len(classic) > 0


def test_components_heap_check_skipped_off_classic(spark, monkeypatch):
    from dbscan_pyspark_spark.operators.components import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 20)], "src long, dst long"
    )
    classic = sorted(
        connected_components(edges).select("id", "component").collect()
    )
    # Connect shape: master_url '' -> single-JVM heap bracket skipped,
    # labels unchanged.
    monkeypatch.setattr(compat, "master_url", lambda s: "")
    monkeypatch.setattr(compat, "jvm_max_heap_bytes", lambda s: 0)
    forced = sorted(
        connected_components(edges).select("id", "component").collect()
    )
    assert forced == classic


def test_shuffle_partitions_auto_conf_fallback():
    # OSS Spark validates the conf as int, so 'auto' (Databricks AQE
    # auto-optimized shuffle) can only be simulated with a fake
    # session: the non-int value must route through
    # compat.default_parallelism, whose Connect branch is conf-driven.
    from dbscan_pyspark_spark.operators.windows import _shuffle_partitions

    fake = _FakeConnectSession(
        {
            "spark.sql.shuffle.partitions": "auto",
            "spark.default.parallelism": "37",
        }
    )
    assert _shuffle_partitions(fake) == 37
