from __future__ import annotations

from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.pipeline import (
    dedup_keep_best,
    hash_split,
    pack_documents,
    portable_hash,
)


def test_portable_hash_matches_duckdb(spark):
    import duckdb

    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    got = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", portable_hash("doc_id", salt="split").alias("h")
        ).collect()
    }
    want = {
        i: duckdb.sql(
            "SELECT CAST(concat('0x', substring(md5('split:' || CAST("
            f"{i} AS VARCHAR)), 1, 15)) AS BIGINT)"
        ).fetchone()[0]
        for i in range(50)
    }
    assert got == want


def test_hash_split_deterministic_and_complete(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    out = hash_split(df, splits=[("train", 8), ("val", 1), ("test", 1)])
    rows = out.groupBy("split").count().collect()
    counts = {r["split"]: r["count"] for r in rows}
    assert set(counts) == {"train", "val", "test"}
    assert sum(counts.values()) == 1000
    assert counts["train"] > counts["val"]
    # same assignment on re-run (pure function of the id)
    again = {
        r["doc_id"]: r["split"] for r in hash_split(df).select("doc_id", "split").collect()
    }
    once = {
        r["doc_id"]: r["split"] for r in hash_split(df).select("doc_id", "split").collect()
    }
    assert again == once


def test_pack_documents_respects_capacity_boundaries(spark):
    # 6 docs of 10 tokens each, one shard: capacity 25 -> exclusive
    # cumsums 0,10,20,30,40,50 -> bins 0,0,0,1,1,2
    rows = [(i, " ".join(["tok"] * 10)) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_documents(df, capacity=25, n_shards=1).orderBy("doc_id")
    got = [(r["doc_id"], r["shard"], r["bin"], r["n_tokens"]) for r in out.collect()]
    assert got == [
        (0, 0, 0, 10),
        (1, 0, 0, 10),
        (2, 0, 0, 10),
        (3, 0, 1, 10),
        (4, 0, 1, 10),
        (5, 0, 2, 10),
    ]


def test_pack_documents_shards_pack_independently(spark):
    rows = [(i, " ".join(["t"] * 7)) for i in range(40)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_documents(df, capacity=20, n_shards=4)
    # every shard starts at bin 0 and bins are contiguous per shard
    per_shard = (
        out.groupBy("shard")
        .agg(
            F.min("bin").alias("lo"),
            F.max("bin").alias("hi"),
            F.count_distinct("bin").alias("nbins"),
        )
        .collect()
    )
    assert len(per_shard) == 4
    for r in per_shard:
        assert r["lo"] == 0
        assert r["nbins"] == r["hi"] + 1


def test_dedup_keep_best_keeps_longest_then_lowest_id(spark):
    rows = [
        (1, "hello world"),
        (2, "Hello,   WORLD!!"),  # same fingerprint, longer raw text
        (3, "hello world"),       # same fingerprint, tie with 1 on length
        (4, "something else"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup_keep_best(df).collect())
    assert kept == [2, 4]
    # score override: keep lowest id regardless of length
    kept2 = sorted(
        r["doc_id"]
        for r in dedup_keep_best(df, score=-F.col("doc_id")).collect()
    )
    assert kept2 == [1, 4]


def test_dedup_keep_best_preserves_schema(spark):
    rows = [(1, "a b c", "en"), (2, "a  b c", "en")]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = dedup_keep_best(df)
    assert out.columns == ["doc_id", "text", "lang"]
    assert out.count() == 1


def test_stratified_sample_deterministic_and_rated(spark):
    from dbscan_pyspark_spark.operators.pipeline import stratified_sample

    rows = [(i, f"doc {i}", ["en", "de", "xx"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    rates = {"en": 100, "de": 30}
    kept1 = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    kept2 = sorted(r["doc_id"] for r in stratified_sample(df, rates).collect())
    assert kept1 == kept2  # no RNG: bit-identical re-runs
    by_lang = {
        lang: [i for i in kept1 if rows[i][2] == lang] for lang in ("en", "de", "xx")
    }
    assert len(by_lang["en"]) == 100       # rate 100 keeps every row
    assert len(by_lang["xx"]) == 0         # default rate 0 drops the stratum
    assert 10 <= len(by_lang["de"]) <= 60  # ~30% of 100, hash-binomial spread

    # independent of hash_split's hash (different salt): the de sample is
    # not correlated with split assignment
    from dbscan_pyspark_spark.operators.pipeline import hash_split

    splits = {r["doc_id"]: r["split"] for r in hash_split(df).collect()}
    assert any(splits[i] == "train" for i in by_lang["de"])


def test_near_dup_dedup_transitive_family(spark):
    from dbscan_pyspark_spark.operators.pipeline import near_dup_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        # A-family: 1~2 and 2~3 heavily overlap -> one component {1,2,3}
        (1, base + " version one"),
        (2, base + " version one extended with a tail"),  # longest -> survivor
        (3, base + " version one extra"),
        # B-family: exact pairs
        (4, "completely different text about sparkling distributed engines ok"),
        (5, "completely different text about sparkling distributed engines ok"),
        # C: unique
        (6, "nothing like the others at all in any way shape or form here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = near_dup_dedup(
        df, threshold=0.3, num_hashes=32, rows_per_band=4, n=3
    ).collect()
    by_group = {r["dup_group"]: r for r in out}
    # A-family collapsed to one survivor: the longest text, group min id 1
    assert by_group[1]["doc_id"] == 2 and by_group[1]["dup_group_size"] == 3
    # B-family: doc 4 wins (tie on length -> lowest id)
    assert by_group[4]["doc_id"] == 4 and by_group[4]["dup_group_size"] == 2
    # C survives alone
    assert by_group[6]["doc_id"] == 6 and by_group[6]["dup_group_size"] == 1
    assert len(out) == 3


def test_near_dup_dedup_string_ids(spark):
    from dbscan_pyspark_spark.operators.pipeline import near_dup_dedup

    base = "the quick brown fox jumps over the lazy dog again and again today"
    docs = [
        ("url/a", base + " version one"),
        ("url/b", base + " version one extended with a tail"),  # survivor
        ("url/c", "completely different text about sparkling distributed engines ok"),
    ]
    df = spark.createDataFrame(docs, "doc_id string, text string")
    out = near_dup_dedup(
        df, threshold=0.3, num_hashes=32, rows_per_band=4, n=3
    ).collect()
    by_group = {r["dup_group"]: r for r in out}
    assert by_group["url/a"]["doc_id"] == "url/b"
    assert by_group["url/a"]["dup_group_size"] == 2
    assert by_group["url/c"]["doc_id"] == "url/c"
    assert len(out) == 2


def test_shard_order_dense_deterministic(spark):
    from dbscan_pyspark_spark.operators.pipeline import shard_order

    df = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    out = shard_order(df, n_shards=4).collect()
    assert len(out) == 100
    by_shard = {}
    for r in out:
        assert 0 <= r["shard"] < 4
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    # positions are dense 1..k within every shard
    for positions in by_shard.values():
        assert sorted(positions) == list(range(1, len(positions) + 1))
    # deterministic: a second run yields the identical assignment
    again = {(r["doc_id"], r["shard"], r["pos"])
             for r in shard_order(df, n_shards=4).collect()}
    assert {(r["doc_id"], r["shard"], r["pos"]) for r in out} == again


def test_source_ngram_overlap_counts_and_boilerplate_cap(spark):
    from dbscan_pyspark_spark.operators.pipeline import source_ngram_overlap

    boiler = "all rights reserved"  # present in every source
    docs = [
        (1, "the quick brown fox " + boiler, "A"),
        (2, "the quick brown cat " + boiler, "B"),  # shares 'the quick brown'
        (3, "entirely different words here now " + boiler, "C"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_ngram_overlap(df, max_sources=2).collect()
    }
    # A-B share exactly 'the quick brown'; boilerplate shingles sit in
    # 3 sources > max_sources=2 so contribute nothing; C overlaps via
    # the boundary shingles around the boilerplate only if < cap —
    # every surviving pair must come from <=2-source shingles
    assert got[("A", "B")] >= 1
    # without the cap, every pair shares the boilerplate shingles
    full = {
        (r["source_a"], r["source_b"]): r["n_shared"]
        for r in source_ngram_overlap(df).collect()
    }
    assert full[("A", "C")] >= 1 and full[("B", "C")] >= 1
    assert full[("A", "B")] > got[("A", "B")]


def test_source_cap_two_phase_matches_single_window_and_caps(spark):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.pipeline import portable_hash, source_cap

    # 3 sources with 40/25/3 docs (skewed, incl. an under-cap source
    # exercised through the bucketed two-phase path); score = n_chars
    # with deliberate ties
    rows = [
        (i, "s0" if i < 40 else ("s1" if i < 65 else "s2"), i % 7)
        for i in range(68)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_chars long")
    got = {
        (r["doc_id"], r["source"], r["src_rank"])
        for r in source_cap(df, cap=5, score_col="n_chars").collect()
    }
    # single-window reference (what the oracle computes)
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), portable_hash("doc_id", salt="srccap"), "doc_id"
    )
    want = {
        (r["doc_id"], r["source"], r["rk"])
        for r in df.withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= 5)
        .collect()
    }
    assert got == want
    # the extreme-fan-in two-phase variant returns the identical set
    got2 = {
        (r["doc_id"], r["source"], r["src_rank"])
        for r in source_cap(
            df, cap=5, score_col="n_chars", salt_buckets=4
        ).collect()
    }
    assert got2 == want
    # scale posture: Catalyst must map-side-prune the default plan
    # (partial WindowGroupLimit before the exchange)
    plan = (
        source_cap(df, cap=5, score_col="n_chars")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan, plan
    # every source capped at 5, ranks dense 1..k
    per_source = {}
    for _, s, rk in got:
        per_source.setdefault(s, []).append(rk)
    for ranks in per_source.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
        assert len(ranks) <= 5


def test_source_cap_keeps_small_sources_whole_and_validates(spark):
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import source_cap

    df = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 5)],
        "doc_id long, source string, n_chars long",
    )
    out = source_cap(df, cap=10, score_col="n_chars").collect()
    assert len(out) == 3  # under-cap sources pass through whole
    # rank 1 of 'a' is the longest doc
    top_a = [r for r in out if r["source"] == "a" and r["src_rank"] == 1]
    assert top_a[0]["doc_id"] == 2
    with _pytest.raises(ValueError):
        source_cap(df, cap=0)


def test_temperature_sample_sqrt_law_and_determinism(spark):
    from dbscan_pyspark_spark.operators.pipeline import temperature_sample

    # head source 400 docs, mid 100, tail 9 (under target -> kept whole)
    rows = (
        [(i, "head") for i in range(400)]
        + [(1000 + i, "mid") for i in range(100)]
        + [(2000 + i, "tail") for i in range(9)]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = temperature_sample(df, per_source_target=16).collect()
    kept = {}
    for r in out:
        kept.setdefault(r["source"], set()).add(r["doc_id"])
    # tail under target: every doc survives
    assert kept["tail"] == {2000 + i for i in range(9)}
    # sqrt law in expectation: head ~ sqrt(16*400)=80, mid ~ sqrt(16*100)=40;
    # hash sampling is deterministic but ~binomial around the mean
    assert 50 <= len(kept["head"]) <= 110
    assert 25 <= len(kept["mid"]) <= 55
    # flattening: head/mid kept ratio ~2, not the raw 4
    assert len(kept["head"]) < 3 * len(kept["mid"])
    # deterministic: identical second run
    again = {(r["doc_id"], r["source"])
             for r in temperature_sample(df, per_source_target=16).collect()}
    assert {(r["doc_id"], r["source"]) for r in out} == again


def test_temperature_sample_validates_target(spark):
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import temperature_sample

    df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
    with _pytest.raises(ValueError):
        temperature_sample(df, per_source_target=0)


def test_validate_rule_suite_counts_violations(spark):
    from dbscan_pyspark_spark.operators.pipeline import validate

    df = spark.createDataFrame(
        [
            (1, "ok", 5.0),
            (1, "ok", 50.0),      # duplicate id
            (2, None, -1.0),      # null status, out of range
            (3, "bad", 7.0),      # unlisted status
            (4, "ok", None),      # null value -> in_range violation
        ],
        "id long, status string, val double",
    )
    rows = {
        r["rule"]: (r["violations"], r["passed"])
        for r in validate(
            df,
            [
                ("not_null", "status"),
                ("in_range", "val", 0, 10),
                ("accepted_values", "status", ["ok"]),
                ("matches", "status", "^o"),
                ("unique", "id"),
            ],
        ).collect()
    }
    assert rows["not_null:status"] == (1, False)
    assert rows["in_range:val"] == (3, False)  # -1, 50, null
    assert rows["accepted_values:status"] == (2, False)  # null + 'bad'
    assert rows["matches:status"] == (2, False)
    assert rows["unique:id"] == (1, False)
    # all-green suite
    clean = validate(df.where("id = 3"), [("not_null", "id")]).collect()
    assert clean[0]["violations"] == 0 and clean[0]["passed"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        validate(df, [("nope", "id")])


def test_validate_single_pass_for_predicate_rules(spark):
    """Row-predicate rules must compile into ONE aggregation over ONE
    scan — adding rules adds agg columns, not data passes."""
    from dbscan_pyspark_spark.operators.pipeline import validate

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 7).alias("v")
    )
    out = validate(
        df,
        [("not_null", "v"), ("in_range", "v", 0, 5), ("in_range", "id", 0, 98)],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Range (0, 100") == 1, plan


def test_column_drift_tvd_and_clamping(spark):
    from dbscan_pyspark_spark.operators.pipeline import column_drift

    a = spark.createDataFrame(
        [(v,) for v in [1.0, 2.0, 3.0, 4.0, -5.0]], "x double"
    )  # -5 clamps into bin 0
    b = spark.createDataFrame(
        [(v,) for v in [6.0, 7.0, 8.0, 99.0, None]], "x double"
    )  # 99 clamps into last bin, null dropped
    rows = {r["bin"]: r for r in column_drift(a, b, "x", 0.0, 10.0, 5).collect()}
    assert rows[0]["n_a"] == 2 and rows[0]["n_b"] == 0  # 1.0 and clamped -5
    assert rows[4]["n_b"] == 2 and rows[4]["n_a"] == 0  # 8.0 + clamped 99
    assert rows[0]["rate_a"] == 0.4
    # disjoint distributions -> total variation = 1
    tvd = sum(r["tvd_term"] for r in rows.values()) / 2
    assert abs(tvd - 1.0) < 1e-9
    import pytest as _pytest

    with _pytest.raises(ValueError):
        column_drift(a, b, "x", 10.0, 0.0)


def test_validate_empty_input_and_empty_rules(spark):
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import validate

    empty = spark.createDataFrame([], "id long, s string")
    rows = {
        r["rule"]: (r["violations"], r["passed"])
        for r in validate(
            empty, [("not_null", "s"), ("unique", "id")]
        ).collect()
    }
    # an empty (trivially clean) snapshot is 0 violations, not NULL
    assert rows["not_null:s"] == (0, True)
    assert rows["unique:id"] == (0, True)
    with _pytest.raises(ValueError):
        validate(empty, [])


def test_snapshot_diff_null_keys_classified_by_side(spark):
    from dbscan_pyspark_spark.operators.pipeline import snapshot_diff

    old = spark.createDataFrame([(None, "x")], "id string, v string")
    new = spark.createDataFrame([(None, "x")], "id string, v string")
    got = sorted(
        r["change"]
        for r in snapshot_diff(old, new, ["id"], ["v"]).collect()
    )
    # NULL keys never equi-join: one removed (old side), one added
    # (new side) — never a phantom 'added' for a removed row
    assert got == ["added", "removed"]


def test_shard_order_validates_n_shards(spark):
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import shard_order

    df = spark.createDataFrame([(1,)], "doc_id long")
    with _pytest.raises(ValueError):
        shard_order(df, n_shards=0)


def test_ks_drift_exact_statistic_and_contracts(spark):
    """ks_num/(n_a*n_b) equals the brute-force two-sample KS distance,
    nulls are excluded from both samples, and an empty side raises (D
    is undefined)."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import ks_drift

    a_vals = [1, 1, 2, 5, 9, 9, 12]
    b_vals = [2, 3, 3, 7, 9, 15]
    a = spark.createDataFrame(
        [(v,) for v in a_vals] + [(None,)], "x int"
    ).repartition(4)
    b = spark.createDataFrame(
        [(v,) for v in b_vals] + [(None,)], "x int"
    ).repartition(3)
    row = ks_drift(a, b, "x", num_partitions=3).collect()[0]
    assert (row["n_a"], row["n_b"]) == (len(a_vals), len(b_vals))
    # brute force: D = max over merged grid of |F_a(x) - F_b(x)|
    grid = sorted(set(a_vals + b_vals))
    na, nb = len(a_vals), len(b_vals)
    expect = max(
        abs(
            sum(v <= x for v in a_vals) * nb
            - sum(v <= x for v in b_vals) * na
        )
        for x in grid
    )
    assert row["ks_num"] == expect
    assert row["ks_stat"] == round(expect / (na * nb), 6)

    # identical samples -> D = 0
    same = ks_drift(a, a, "x").collect()[0]
    assert same["ks_num"] == 0 and same["ks_stat"] == 0.0

    empty = spark.createDataFrame([], "x int")
    with _pytest.raises(ValueError, match="both sides need rows"):
        ks_drift(a, empty, "x")


def test_exact_percentiles_and_quantile_drift(spark):
    """Discrete percentile = smallest value whose at-or-below count
    reaches ceil(n*p/100), verified against a sorted-list replay;
    contract raises on bad percents and empty input; quantile_drift
    reports exact per-percentile shifts."""
    import math

    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import (
        exact_percentiles,
        quantile_drift,
    )

    vals = [5, 1, 9, 1, 7, 3, 3, 3, 8, 2]  # n = 10, with ties
    df = spark.createDataFrame(
        [(v,) for v in vals] + [(None,)], "x int"
    ).repartition(4)
    got = {
        r["pct"]: r["value"]
        for r in exact_percentiles(df, "x", [10, 50, 90, 100]).collect()
    }
    s = sorted(vals)
    want = {p: s[math.ceil(len(s) * p / 100) - 1] for p in [10, 50, 90, 100]}
    assert got == want

    with _pytest.raises(ValueError, match="percents"):
        exact_percentiles(df, "x", [0])
    with _pytest.raises(ValueError, match="percents"):
        exact_percentiles(df, "x", [])
    with _pytest.raises(ValueError, match="distinct"):
        exact_percentiles(df, "x", [50, 50])
    empty = spark.createDataFrame([(None,)], "x int")
    with _pytest.raises(ValueError, match="no non-null rows"):
        exact_percentiles(empty, "x", [50])

    b = spark.createDataFrame([(v + 10,) for v in vals], "x int")
    drift = {
        r["pct"]: (r["val_a"], r["val_b"], r["shift"])
        for r in quantile_drift(df, b, "x", [50, 90]).collect()
    }
    assert drift == {
        50: (want[50], want[50] + 10, 10),
        90: (want[90], want[90] + 10, 10),
    }


def test_welch_t_test_matches_reference_and_contracts(spark):
    """The statistic equals an independent Python replay of the same
    IEEE expression tree (and scipy's Welch t where the tree agrees to
    6 digits); < 2 rows per side or zero pooled se raises."""
    import math

    import pytest as _pytest
    from pyspark.errors import PythonException, SparkRuntimeException

    from dbscan_pyspark_spark.operators.pipeline import welch_t_test

    a_vals = [10, 12, 9, 14, 11, 10]
    b_vals = [13, 15, 14, 16, 12]
    a = spark.createDataFrame(
        [(v,) for v in a_vals] + [(None,)], "x int"
    ).repartition(3)
    b = spark.createDataFrame([(v,) for v in b_vals], "x int")
    row = welch_t_test(a, b, "x").collect()[0]

    def replay(xs, ys):
        na, nb = float(len(xs)), float(len(ys))
        sa, sb = float(sum(xs)), float(sum(ys))
        qa, qb = float(sum(v * v for v in xs)), float(sum(v * v for v in ys))
        ma, mb = sa / na, sb / nb
        se2a = (qa - sa * ma) / (na - 1) / na
        se2b = (qb - sb * mb) / (nb - 1) / nb
        se2 = se2a + se2b
        t = (ma - mb) / math.sqrt(se2)
        dof = (se2 * se2) / (
            se2a * se2a / (na - 1) + se2b * se2b / (nb - 1)
        )
        return round(ma, 6), round(mb, 6), round(t, 6), round(dof, 6)

    ma, mb, t, dof = replay(a_vals, b_vals)
    assert (row["n_a"], row["n_b"]) == (len(a_vals), len(b_vals))
    assert (row["mean_a"], row["mean_b"]) == (ma, mb)
    assert (row["t_stat"], row["dof"]) == (t, dof)
    try:  # cross-check against scipy when available
        from scipy import stats as sps

        ref = sps.ttest_ind(a_vals, b_vals, equal_var=False)
        assert abs(row["t_stat"] - ref.statistic) < 1e-6
    except ImportError:
        pass

    one = spark.createDataFrame([(5,)], "x int")
    const = spark.createDataFrame([(7,), (7,), (7,)], "x int")
    for bad_a, bad_b in [(a, one), (const, const)]:
        with _pytest.raises((PythonException, SparkRuntimeException)):
            welch_t_test(bad_a, bad_b, "x").collect()


def test_ks_drift_by_group_matches_global_per_group(spark):
    """Each group's row equals the global ks_drift run on that group's
    rows alone; one-sided groups are dropped, null groups excluded."""
    from dbscan_pyspark_spark.operators.pipeline import ks_drift, ks_drift_by_group

    a_rows = [("g1", v) for v in [1, 2, 2, 9]] + [("g2", v) for v in [5, 6]]
    b_rows = [("g1", v) for v in [2, 3, 9, 9]] + [("g3", v) for v in [7]]
    a_rows += [(None, 1)]  # null group excluded
    a = spark.createDataFrame(a_rows, "g string, x int").repartition(3)
    b = spark.createDataFrame(b_rows, "g string, x int").repartition(2)
    got = {
        r["g"]: (r["ks_num"], r["n_a"], r["n_b"], r["ks_stat"])
        for r in ks_drift_by_group(a, b, "x", "g").collect()
    }
    # g2 (A-only) and g3 (B-only) are one-sided -> dropped
    assert set(got) == {"g1"}
    want = ks_drift(
        a.where(a.g == "g1"), b.where(b.g == "g1"), "x"
    ).collect()[0]
    assert got["g1"] == (
        want["ks_num"], want["n_a"], want["n_b"], want["ks_stat"]
    )


def test_category_drift_topn_fold_and_nulls(spark):
    from dbscan_pyspark_spark.operators.pipeline import category_drift

    a = spark.createDataFrame(
        [("en",)] * 6 + [("de",)] * 3 + [(None,)], "lang string"
    )
    b = spark.createDataFrame(
        [("en",)] * 2 + [("fr",)] * 5 + [("it",)] * 2 + [("pt",)] * 1,
        "lang string",
    )
    rows = {r["value"]: r for r in category_drift(a, b, "lang", top_n=2).collect()}
    # top-2 by combined count: en (8), fr (5); rest fold into __other__
    assert set(rows) == {"en", "fr", "__other__"}
    assert rows["en"]["n_a"] == 6 and rows["en"]["n_b"] == 2
    assert rows["fr"]["n_a"] == 0 and rows["fr"]["n_b"] == 5
    assert rows["__other__"]["n_a"] == 4  # de x3 + null
    assert rows["__other__"]["n_b"] == 3  # it x2 + pt
    assert rows["en"]["rate_a"] == 0.6 and rows["en"]["rate_b"] == 0.2
    # null surfaces as its own value without the fold
    unfolded = {r["value"] for r in category_drift(a, b, "lang").collect()}
    assert "__null__" in unfolded


def test_category_drift_topn_plan_has_no_unpartitioned_window(spark):
    """The top-N fold is a TakeOrdered head + broadcast relabel, NOT a
    row_number over the whole count relation: on a high-cardinality
    column (URL domains at corpus scale) an unpartitioned WindowExec
    would single-partition-sort every distinct value."""
    from dbscan_pyspark_spark.operators.pipeline import category_drift
    from dbscan_pyspark_spark.plans.inspect import _executed_plan_str

    a = spark.range(100).selectExpr("cast(id % 37 as string) AS k")
    b = spark.range(100).selectExpr("cast(id % 41 as string) AS k")
    out = category_drift(a, b, "k", top_n=5)
    plan = _executed_plan_str(out)
    assert "Window" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    # and the fold itself is still exact: 5 head values + __other__
    vals = {r["value"] for r in out.collect()}
    assert "__other__" in vals and len(vals) == 6


def test_snapshot_diff_classifies_all_change_kinds(spark):
    from dbscan_pyspark_spark.operators.pipeline import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", None), (4, "d", 40)],
        "id long, s string, v int",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (3, "c", None), (5, "e", 50)],
        "id long, s string, v int",
    )
    got = {
        r["id"]: r["change"]
        for r in snapshot_diff(old, new, ["id"], ["s", "v"]).collect()
    }
    assert got == {
        1: "same",
        2: "changed",
        3: "same",      # null == null under eqNullSafe
        4: "removed",
        5: "added",
    }


def test_surrogate_node_ids_no_global_sort_and_collision_fallback(spark):
    """Default surrogate path must be hash-based (no single-partition
    row_number window — the 100 TB hazard VERDICT r3 flagged); a forced
    hash collision must trip the audit and fall back to dense ids."""
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.pipeline import _surrogate_node_ids

    nodes_in = spark.createDataFrame(
        [("url/a",), ("url/b",), ("url/c",)], "doc_id string"
    )
    nodes = _surrogate_node_ids(nodes_in, "doc_id")
    plan = nodes._jdf.queryExecution().executedPlan().toString()
    assert "row_number" not in plan and "Window" not in plan, plan
    got = {r["doc_id"]: r["_sid"] for r in nodes.collect()}
    assert len(set(got.values())) == 3
    nodes.unpersist()

    # constant "hash" -> guaranteed collision -> dense fallback ids
    fallback = _surrogate_node_ids(nodes_in, "doc_id", hash_fn=lambda c: F.lit(1))
    got = {r["doc_id"]: r["_sid"] for r in fallback.collect()}
    assert sorted(got.values()) == [1, 2, 3]
    assert got["url/a"] < got["url/b"] < got["url/c"]
    fallback.unpersist()


def test_profile_columns_exact_stats(spark):
    from dbscan_pyspark_spark.operators.pipeline import profile_columns

    df = spark.createDataFrame(
        [(1.0, 10), (2.0, None), (2.0, 30), (None, 40)],
        "x double, y int",
    )
    out = {
        r["col_name"]: r.asDict() for r in profile_columns(df, ["x", "y"]).collect()
    }
    assert out["x"] == {
        "col_name": "x", "n_rows": 4, "n_null": 1, "n_distinct": 2,
        "min_val": 1.0, "max_val": 2.0, "avg_val": round(5.0 / 3, 4),
    }
    assert out["y"]["n_null"] == 1 and out["y"]["n_distinct"] == 3
    assert out["y"]["avg_val"] == round(80 / 3, 4)


def test_profile_columns_single_scan(spark, sf_dir):
    from dbscan_pyspark_spark.operators.pipeline import profile_columns
    from dbscan_pyspark_spark.plans.inspect import shuffle_count
    from dbscan_pyspark_spark.sources.tables import load_table

    prof = profile_columns(
        load_table(spark, sf_dir, "lineitem"), ["l_quantity", "l_discount"]
    )
    # one scan, one global-agg exchange pair at most; count_distinct adds
    # an expand+agg but no second pass over the table
    plan = prof._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan") + plan.count("Scan parquet") <= 2
    assert shuffle_count(prof) <= 2


def test_key_skew_stats_flags_hot_key(spark):
    from dbscan_pyspark_spark.operators.pipeline import key_skew_stats

    rows = [("hot",)] * 60 + [(f"k{i}",) for i in range(40)]
    df = spark.createDataFrame(rows, "k string")
    top = key_skew_stats(df, "k", top_n=3).collect()
    assert top[0]["k"] == "hot" and top[0]["cnt"] == 60
    assert top[0]["share"] == 0.6
    # mean rows/key = 100/41; skew = 60/(100/41)
    assert abs(top[0]["skew"] - round(60 / (100 / 41), 4)) < 1e-9
    assert top[1]["cnt"] == 1 and top[1]["k"] == "k0"  # tie-break by key


def test_histogram_fixed_and_auto_range(spark):
    from dbscan_pyspark_spark.operators.pipeline import histogram

    df = spark.createDataFrame(
        [(v,) for v in [0.0, 1.0, 4.9, 5.0, 9.9, 10.0]], "x double"
    )
    fixed = {r["bin"]: r for r in histogram(df, "x", n_bins=2, lo=0.0, hi=10.0).collect()}
    # [0,5) -> 3 rows; [5,10] -> 3 rows (max lands in last bin)
    assert fixed[0]["cnt"] == 3 and fixed[1]["cnt"] == 3
    assert fixed[1]["bin_lo"] == 5.0 and fixed[1]["bin_hi"] == 10.0
    auto = histogram(df, "x", n_bins=5)
    assert sum(r["cnt"] for r in auto.collect()) == 6


def test_new_ops_handle_empty_input(spark, tmp_path):
    from dbscan_pyspark_spark.operators.eps_join import k_distance
    from dbscan_pyspark_spark.operators.events import funnel
    from dbscan_pyspark_spark.operators.pipeline import (
        histogram,
        key_skew_stats,
        profile_columns,
    )
    from dbscan_pyspark_spark.sources.io import write_zordered

    empty_num = spark.createDataFrame([], "x double, k string")
    assert histogram(empty_num, "x").count() == 0
    assert key_skew_stats(empty_num, "k").count() == 0
    prof = profile_columns(empty_num, ["x"]).collect()
    assert len(prof) == 1 and prof[0]["n_rows"] == 0

    empty_pts = spark.createDataFrame([], "id long, features array<double>")
    assert k_distance(empty_pts, k=2, n_samples=4).count() == 0

    empty_ev = spark.createDataFrame(
        [], "user_id long, ts timestamp, event_type string"
    )
    counts = {r["step"]: r["n_users"] for r in funnel(empty_ev, ["a", "b"]).collect()}
    assert counts == {1: 0, 2: 0}

    write_zordered(empty_num, str(tmp_path / "z"), ["x"], num_files=2)


def test_chunk_documents_overlap_and_coverage(spark):
    from dbscan_pyspark_spark.operators.pipeline import chunk_documents

    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b")],
        "doc_id long, text string",
    )
    out = chunk_documents(docs, chunk_tokens=4, stride=3).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["chunk"], r["n_tokens"], r["chunk_text"])
        )
    c1 = sorted(by_doc[1])
    # windows at offsets 0,3,6 cover tokens 0..9; last is partial
    assert [c[0] for c in c1] == [0, 1, 2]
    assert c1[0][2] == "t0 t1 t2 t3"
    assert c1[1][2] == "t3 t4 t5 t6"
    assert c1[2][2] == "t6 t7 t8 t9"
    # short doc: single partial window
    assert by_doc[2] == [(0, 2, "a b")]


def test_redactions_struct(spark):
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.functions.text import redactions

    df = spark.createDataFrame(
        [(1, "call 555 or 911 now"), (2, "no digits")], "id long, text string"
    )
    r = redactions("text", "[0-9]+")
    got = {
        row["id"]: (row["n"], row["red"])
        for row in df.select(
            "id", r["n_redactions"].alias("n"), r["redacted"].alias("red")
        ).collect()
    }
    assert got[1] == (2, "call [REDACTED] or [REDACTED] now")
    assert got[2] == (0, "no digits")


def test_group_sample_exact_k_and_stability(spark):
    from dbscan_pyspark_spark.operators.pipeline import group_sample

    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)] + [(100, 9)],  # group 9 has 1 row
        "doc_id long, grp int",
    )
    s1 = group_sample(df, "grp", k=4)
    counts = {r["grp"]: r["n"] for r in s1.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert counts == {0: 4, 1: 4, 2: 4, 9: 1}
    # stable: same rows on re-run, and unaffected by extra non-sampled rows
    s2 = group_sample(df, "grp", k=4)
    assert sorted(r["doc_id"] for r in s1.collect()) == sorted(
        r["doc_id"] for r in s2.collect()
    )


def test_equi_depth_histogram_balances_counts(spark):
    from dbscan_pyspark_spark.operators.pipeline import equi_depth_histogram

    df = spark.createDataFrame([(float(i),) for i in range(1000)], "x double")
    out = {r["bin"]: r["cnt"] for r in equi_depth_histogram(df, "x", 4).collect()}
    assert sum(out.values()) == 1000
    assert all(240 <= c <= 260 for c in out.values()), out
    # approx mode: same shape, KLL error tolerance
    approx = {
        r["bin"]: r["cnt"]
        for r in equi_depth_histogram(df, "x", 4, exact=False).collect()
    }
    assert sum(approx.values()) == 1000
    assert all(200 <= c <= 300 for c in approx.values()), approx


def test_histogram_clamps_below_range(spark):
    from dbscan_pyspark_spark.operators.pipeline import histogram

    df = spark.createDataFrame([(-5.0,), (0.5,), (9.5,), (42.0,)], ["x"])
    bins = {r["bin"]: r["cnt"] for r in histogram(df, "x", n_bins=2, lo=0.0, hi=10.0).collect()}
    # below-lo clamps into bin 0, above-hi into the last bin
    assert bins == {0: 2, 1: 2}


def test_token_entropy_uniform_vs_repetitive(spark):
    import math

    from dbscan_pyspark_spark.operators.pipeline import token_entropy_stats

    df = spark.createDataFrame(
        [
            (1, "a b c d"),          # uniform: H = ln(4)
            (2, "a a a a"),          # degenerate: H = 0
            (3, "a a b b"),          # H = ln(2)
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in token_entropy_stats(df).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 4
    assert abs(out[1]["entropy"] - math.log(4)) < 1e-5
    assert out[2]["entropy"] == 0.0 and out[2]["n_distinct"] == 1
    assert abs(out[3]["entropy"] - math.log(2)) < 1e-5


def test_integrity_check_counts_orphans_and_nulls(spark):
    from dbscan_pyspark_spark.operators.pipeline import integrity_check

    child = spark.createDataFrame(
        [(1, "a"), (2, "b"), (99, "orphan"), (None, "nullkey")],
        "fk long, v string",
    )
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    row = integrity_check(child, parent, ["fk"], ["pk"]).first()
    assert (row["n_child"], row["n_orphans"]) == (4, 2)
    assert row["orphan_ratio"] == 0.5


def test_integrity_check_clean(spark):
    from dbscan_pyspark_spark.operators.pipeline import integrity_check

    child = spark.createDataFrame([(1,), (2,)], "fk long")
    parent = spark.createDataFrame([(1,), (2,)], "fk long")
    row = integrity_check(child, parent, ["fk"]).first()
    assert (row["n_orphans"], row["orphan_ratio"]) == (0, 0.0)


def test_corpus_filter_reasons_first_failing_rule(spark):
    from dbscan_pyspark_spark.operators.pipeline import corpus_filter

    long_good = " ".join(f"alpha{i} beta{i} gamma{i}" for i in range(12))
    rows = [
        (1, "tiny doc"),                               # too_short
        (2, long_good),                                # kept
        (3, long_good),                                # duplicate of 2
        (4, " ".join(["spam ham"] * 30)),              # repetitive
        (5, " ".join(["!!", "##", "$$", "%%"] * 3)),   # low quality (punct)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in corpus_filter(df, min_tokens=10).collect()}
    assert out[1]["reason"] == "too_short" and not out[1]["keep"]
    assert out[2]["reason"] == "kept" and out[2]["keep"]
    assert out[3]["reason"] == "duplicate"
    assert out[4]["reason"] == "repetitive"
    assert out[5]["reason"] == "low_quality"


def test_weighted_sample_deterministic_and_biased(spark):
    from dbscan_pyspark_spark.operators.pipeline import weighted_sample

    rows = [(i, 100.0 if i < 20 else 1.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    a = sorted(r["doc_id"] for r in weighted_sample(df, "w", 30).collect())
    b = sorted(r["doc_id"] for r in weighted_sample(df, "w", 30).collect())
    assert a == b and len(a) == 30
    # heavy rows (100x weight, 10% of population) should dominate
    heavy = sum(1 for i in a if i < 20)
    assert heavy >= 15, heavy
    # different salt -> different (but still deterministic) draw
    c = sorted(
        r["doc_id"]
        for r in weighted_sample(df, "w", 30, salt="other").collect()
    )
    assert c != a


def test_weighted_sample_excludes_nonpositive(spark):
    from dbscan_pyspark_spark.operators.pipeline import weighted_sample

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], "doc_id long, w double"
    )
    got = {r["doc_id"] for r in weighted_sample(df, "w", 10).collect()}
    assert got == {1, 4}


def test_impute_group_median(spark):
    from dbscan_pyspark_spark.operators.pipeline import impute_group_median

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("a", None), ("b", 10.0), ("b", None)],
        "g string, v double",
    )
    out = {
        (r["g"], r["v"])
        for r in impute_group_median(df, ["g"], "v").collect()
    }
    assert ("a", 2.0) in out      # null imputed with median(1,3)
    assert ("b", 10.0) in out     # null imputed with median(10)
    assert sum(1 for g, v in out if v is None) == 0


def test_winsorize_clamps_tails(spark):
    from dbscan_pyspark_spark.operators.pipeline import winsorize

    rows = [(float(i),) for i in range(1, 100)] + [(10_000.0,), (-10_000.0,)]
    df = spark.createDataFrame(rows, "v double")
    out = winsorize(df, "v", lo_q=0.05, hi_q=0.95)
    stats = out.agg(
        F.min("v").alias("mn"), F.max("v").alias("mx")
    ).first()
    assert stats["mn"] > -10_000.0 and stats["mx"] < 10_000.0
    # interior values untouched
    assert out.where(F.col("v") == 50.0).count() == 1


def test_winsorize_preserves_nulls(spark):
    from dbscan_pyspark_spark.operators.pipeline import winsorize

    df = spark.createDataFrame(
        [(1.0,), (2.0,), (3.0,), (100.0,), (None,)], "v double"
    )
    out = winsorize(df, "v", lo_q=0.25, hi_q=0.75).collect()
    vals = [r["v"] for r in out]
    assert vals.count(None) == 1, "null must stay null, not become the clip floor"


def test_histogram_excludes_nulls(spark):
    from dbscan_pyspark_spark.operators.pipeline import histogram

    df = spark.createDataFrame([(0.5,), (None,), (9.5,)], "v double")
    out = {r["bin"]: r["cnt"] for r in histogram(df, "v", n_bins=10, lo=0.0, hi=10.0).collect()}
    assert out == {0: 1, 9: 1}, out  # null neither binned nor top-edged


def test_budget_waterfill_matches_bruteforce(spark):
    """Closed-form waterfill == the obvious iterative water-raising
    algorithm: conservation, caps, max-min fairness, deterministic
    remainder placement."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import budget_waterfill

    avail = {"a": 100, "b": 7, "c": 55, "d": 7, "e": 0, "f": 1000}

    def brute(budget):
        # raise the water level one unit at a time (slow but obvious)
        alloc = {g: 0 for g in avail}
        left = budget
        while left > 0:
            open_ = sorted(
                g for g in avail if alloc[g] < avail[g]
            )
            if not open_:
                break
            # one unit to each open source, lowest current level first,
            # ties by group name — matches the closed form's sort-order
            # remainder rule
            open_.sort(key=lambda g: (alloc[g], avail[g], g))
            for g in open_:
                if left == 0:
                    break
                alloc[g] += 1
                left -= 1
        return alloc

    df = spark.createDataFrame(
        list(avail.items()), "source string, avail long"
    )
    for budget in (0, 5, 14, 69, 169, 300, 1169, 5000):
        got = {
            r["source"]: r["alloc"]
            for r in budget_waterfill(df, budget).collect()
        }
        assert sum(got.values()) == min(budget, sum(avail.values())), budget
        assert all(got[g] <= avail[g] for g in avail), budget
        exp = brute(budget)
        # max-min fairness: same multiset of allocations per level
        assert sorted(got.values()) == sorted(exp.values()), (budget, got, exp)

    with _pytest.raises(ValueError, match="budget"):
        budget_waterfill(df, -1)


def test_budget_waterfill_contracts(spark):
    """NULL or negative avail raises plan-side (the two engines sort
    NULLs to opposite ends — silent passthrough would be an
    oracle-parity break on top of a nonsense allocation); internal
    column-name collisions raise at the contract."""
    import pytest as _pytest
    from pyspark.errors import SparkRuntimeException

    from dbscan_pyspark_spark.operators.pipeline import budget_waterfill

    bad_null = spark.createDataFrame(
        [("a", 10), ("b", None)], "source string, avail long"
    )
    with _pytest.raises(Exception) as e:
        budget_waterfill(bad_null, 5).collect()
    assert "non-null" in str(e.value)
    bad_neg = spark.createDataFrame(
        [("a", 10), ("b", -3)], "source string, avail long"
    )
    with _pytest.raises(Exception) as e:
        budget_waterfill(bad_neg, 5).collect()
    assert "non-null" in str(e.value)
    with _pytest.raises(ValueError, match="internal"):
        budget_waterfill(bad_null, 5, group_col="_a")


def test_apply_allocation_greedy_prefix(spark):
    """Per source: never overshoots its allocation, undershoots by
    less than the first unselected doc, deterministic across runs."""
    from dbscan_pyspark_spark.operators.pipeline import (
        apply_allocation,
        budget_waterfill,
    )

    docs = spark.createDataFrame(
        [
            (i, f"s{i % 3}", " ".join(f"w{i}x{j}" for j in range(3 + i % 5)))
            for i in range(60)
        ],
        "doc_id long, source string, text string",
    )
    from dbscan_pyspark_spark.functions.text import token_count
    from pyspark.sql import functions as F

    avail = docs.groupBy("source").agg(
        F.sum(token_count("text")).cast("long").alias("avail")
    )
    alloc = budget_waterfill(avail, 50)
    alloc_map = {r["source"]: r["alloc"] for r in alloc.collect()}

    out1 = sorted(map(tuple, apply_allocation(docs, alloc).collect()))
    out2 = sorted(map(tuple, apply_allocation(docs, alloc).collect()))
    assert out1 == out2 and out1  # deterministic, non-empty

    from collections import defaultdict

    kept_tokens = defaultdict(int)
    for _, src, n_tokens, cum in out1:
        kept_tokens[src] += n_tokens
    for src, total in kept_tokens.items():
        assert total <= alloc_map[src], (src, total, alloc_map[src])
    # max cum_tokens per source == the kept total (running sum sanity)
    max_cum = defaultdict(int)
    for _, src, _, cum in out1:
        max_cum[src] = max(max_cum[src], cum)
    assert dict(max_cum) == dict(kept_tokens)


def test_budget_waterfill_rejects_duplicate_groups(spark):
    """Duplicate group values make the (avail, group) row_number
    tie-break — and hence the +1 remainder placement — arbitrary,
    silently breaking the determinism contract. Raises plan-side."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.pipeline import budget_waterfill

    dup = spark.createDataFrame(
        [("a", 10), ("a", 10), ("b", 4)], "source string, avail long"
    )
    with _pytest.raises(Exception) as e:
        budget_waterfill(dup, 12).collect()
    assert "duplicate group" in str(e.value)
    # unique groups (including ties on avail) still pass
    ok = spark.createDataFrame(
        [("a", 10), ("b", 10), ("c", 4)], "source string, avail long"
    )
    rows = {r["source"]: r["alloc"] for r in budget_waterfill(ok, 12).collect()}
    assert sum(rows.values()) == 12 and rows["c"] == 4


def test_apply_allocation_rejects_null_or_negative_tokens(spark):
    """A NULL token count would be skipped by the window sum (doc kept
    'for free'); a negative one breaks the monotone running sum and the
    never-overshoot guarantee. Both raise plan-side."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.pipeline import apply_allocation

    alloc = spark.createDataFrame(
        [("s0", 100)], "source string, alloc long"
    )
    null_text = spark.createDataFrame(
        [(1, "s0", "w1 w2"), (2, "s0", None)],
        "doc_id long, source string, text string",
    )
    with _pytest.raises(Exception) as e:
        apply_allocation(null_text, alloc).collect()
    assert "non-null" in str(e.value)
    neg = spark.createDataFrame(
        [(1, "s0", 5), (2, "s0", -2)],
        "doc_id long, source string, n_tok long",
    )
    with _pytest.raises(Exception) as e:
        apply_allocation(neg, alloc, token_count_col="n_tok").collect()
    assert "non-null" in str(e.value)
    # a Column-typed token_count_col is checked too
    with _pytest.raises(Exception) as e:
        apply_allocation(
            neg, alloc, token_count_col=F.col("n_tok") * 1
        ).collect()
    assert "non-null" in str(e.value)


def test_apply_allocation_chunked_matches_single_window(spark):
    """The chunked two-phase running sum is bit-identical to the
    single-window plan (contiguous hash-range chunks preserve the
    (hash, id) order), and the hot path's plan windows on
    (source, chunk) — never the bare source."""
    from pyspark.sql import functions as F

    from dbscan_pyspark_spark.operators.pipeline import apply_allocation

    docs = spark.createDataFrame(
        [
            (i, f"s{i % 2}", " ".join(f"w{i}x{j}" for j in range(2 + i % 7)))
            for i in range(300)
        ],
        "doc_id long, source string, text string",
    )
    alloc = spark.createDataFrame(
        [("s0", 10_000, 300), ("s1", 9_000, 250)],
        "source string, avail long, alloc long",
    )
    plain = sorted(
        map(tuple, apply_allocation(docs, alloc, chunked=False).collect())
    )
    forced = apply_allocation(docs, alloc, chunked=True, n_chunks=7)
    assert sorted(map(tuple, forced.collect())) == plain
    # auto mode: avail >= threshold switches those sources to chunked
    auto = apply_allocation(docs, alloc, hot_source_avail=9_500)
    assert sorted(map(tuple, auto.collect())) == plain
    # plan: the forced-chunked hot side windows on (source, _c)
    plan = forced._jdf.queryExecution().executedPlan().toString()
    assert "_c" in plan
    # single-chunk degenerate guard
    import pytest as _pytest

    with _pytest.raises(ValueError, match="n_chunks"):
        apply_allocation(docs, alloc, chunked=True, n_chunks=1)


def test_normalize_unicode_matches_unicodedata(spark):
    """NFC stage == Python unicodedata on composed, decomposed,
    non-composable-mark, None, and plain-ASCII inputs; bad form
    raises."""
    import unicodedata

    import pytest

    from dbscan_pyspark_spark.operators.pipeline import normalize_unicode

    rows = [
        (0, "Café mix"),       # decomposed -> composes
        (1, "Café mix"),        # already NFC -> unchanged
        (2, "e̅ overline"),     # U+0305 has no precomposition
        (3, "Å angstrom"),      # Å sign -> NFC composed form
        (4, None),
        (5, "plain ascii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["norm_text"] for r in normalize_unicode(df).collect()}
    for i, t in rows:
        exp = unicodedata.normalize("NFC", t) if t is not None else None
        assert got[i] == exp, (i, got[i], exp)
    assert got[0] == got[1]  # the dedup motivation: both hash together
    with pytest.raises(ValueError, match="form"):
        normalize_unicode(df, form="NFX")
