"""Sources & sinks (S1-S6): CSV points roundtrip mirroring the
reference's data.csv shape (FIXTURES.md §1)."""

import os

from pyspark.sql import functions as F

from dbscan_pyspark_spark.sources.io import read_csv_points, write_csv, write_json, write_parquet


def test_read_csv_points_shape(spark, tmp_path):
    p = str(tmp_path / "data.csv")
    with open(p, "w") as f:
        # 3 int cols: 2 QI + sensitive, like the reference's data.csv
        f.write("10,150,1\n20,160,2\n10,150,1\n")
    pts = read_csv_points(spark, p, dimension=2)
    rows = pts.collect()
    assert len(rows) == 3
    assert len({r["id"] for r in rows}) == 3  # surrogate ids unique even for dup rows
    feats = sorted(tuple(r["features"]) for r in rows)
    assert feats == [(10.0, 150.0), (10.0, 150.0), (20.0, 160.0)]
    assert {r["sensitive"] for r in rows} == {1, 2}


def test_sinks_roundtrip(spark, tmp_path):
    df = spark.createDataFrame([(1, 2.0), (2, 3.5)], ["k", "v"])
    pq = str(tmp_path / "out_parquet")
    js = str(tmp_path / "out_json")
    cs = str(tmp_path / "out_csv")
    write_parquet(df, pq)
    write_json(df, js)
    write_csv(df, cs, single_file=True)
    assert spark.read.parquet(pq).count() == 2
    assert spark.read.json(js).count() == 2
    back = spark.read.option("header", True).csv(cs)
    assert back.count() == 2 and set(back.columns) == {"k", "v"}
    # overwrite mode really overwrites
    write_parquet(df.limit(1), pq)
    assert spark.read.parquet(pq).count() == 1


def test_register_views_enables_raw_sql(spark):
    from dbscan_pyspark_spark.sources.tables import register_views

    names = register_views(spark, "/root/testdata/sf0.001")
    assert "lineitem" in names and "documents" in names
    n = spark.sql("SELECT count(*) AS n FROM lineitem").first()["n"]
    assert n == 6000
    joined = spark.sql(
        "SELECT count(*) AS n FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey"
    ).first()["n"]
    assert joined > 0


def _morton2(x: int, y: int, bits: int = 8) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i) | ((y >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_key_matches_reference_interleave(spark):
    from dbscan_pyspark_spark.sources.io import zorder_key

    rows = [(x, y) for x in [0, 1, 5, 200, 255] for y in [0, 3, 7, 128, 255]]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_key(["x", "y"], bits=8)
    )
    for r in df.collect():
        assert r["z"] == _morton2(r["x"], r["y"]), (r["x"], r["y"])


def test_zorder_layout_prunes_both_dims(spark, tmp_path):
    """Per-file parquet stats after a Z-ordered write are narrow in BOTH
    columns; a single-column sort leaves the other column unpruned."""
    import duckdb

    from dbscan_pyspark_spark.sources.io import write_zordered

    n = 1 << 14
    # two independent uniform dims (bit-reversal decorrelates y from x)
    df = (
        spark.range(n)
        .withColumn("x", F.col("id") % 128)
        .withColumn("y", (F.col("id") * 2654435761) % 128)
    )
    zdir, sdir = str(tmp_path / "zord"), str(tmp_path / "plain")
    write_zordered(df, zdir, ["x", "y"], bits=7, num_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(sdir)

    con = duckdb.connect()

    def mean_span(d, col):
        q = f"""
        SELECT avg(CAST(stats_max AS DOUBLE) - CAST(stats_min AS DOUBLE))
        FROM parquet_metadata('{d}/*.parquet')
        WHERE path_in_schema = '{col}'
        """
        return con.execute(q).fetchone()[0]

    # z-order: both dims localized to a fraction of the 0..127 domain
    assert mean_span(zdir, "x") < 127 * 0.6
    assert mean_span(zdir, "y") < 127 * 0.6
    # plain sort: x localized, y spans ~the full domain per file
    assert mean_span(sdir, "x") < 127 * 0.6
    assert mean_span(sdir, "y") > 127 * 0.8


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import compact_parquet

    d = str(tmp_path / "frag")
    spark.range(100000).repartition(64).write.parquet(d)
    import glob

    assert len(glob.glob(d + "/*.parquet")) == 64
    n = compact_parquet(spark, d, target_file_bytes=1 << 30)
    assert n == 1
    assert spark.read.parquet(d).count() == 100000


def test_compact_parquet_refuses_partitioned_layout(spark, tmp_path):
    import pytest

    from dbscan_pyspark_spark.sources.io import compact_parquet

    d = str(tmp_path / "part")
    spark.range(100).withColumn("p", F.col("id") % 2).write.partitionBy(
        "p"
    ).parquet(d)
    with pytest.raises(ValueError, match="hive-partitioned"):
        compact_parquet(spark, d)


def test_upsert_parquet_flat(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import upsert_parquet

    p = str(tmp_path / "tbl")
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, v string"
    )
    upsert_parquet(spark, p, base, key_cols=["id"])          # create
    upd = spark.createDataFrame(
        [(2, "B2"), (4, "d")], "id long, v string"
    )
    upsert_parquet(spark, p, upd, key_cols=["id"])           # merge
    got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (4, "d")}


def test_upsert_parquet_partitioned_rewrites_only_touched(spark, tmp_path):
    import glob
    import os

    from dbscan_pyspark_spark.sources.io import upsert_parquet

    p = str(tmp_path / "ptbl")
    base = spark.createDataFrame(
        [(1, "2024-01", "a"), (2, "2024-01", "b"), (3, "2024-02", "c")],
        "id long, day string, v string",
    )
    upsert_parquet(spark, p, base, key_cols=["id"], partition_col="day")
    untouched = sorted(glob.glob(os.path.join(p, "day=2024-02", "*.parquet")))
    mtimes = [os.path.getmtime(f) for f in untouched]

    upd = spark.createDataFrame(
        [(2, "2024-01", "B2"), (9, "2024-01", "z")],
        "id long, day string, v string",
    )
    upsert_parquet(spark, p, upd, key_cols=["id"], partition_col="day")
    got = {(r["id"], r["v"]) for r in spark.read.parquet(p).collect()}
    assert got == {(1, "a"), (2, "B2"), (3, "c"), (9, "z")}
    # dynamic overwrite must not have rewritten the 2024-02 partition
    after = sorted(glob.glob(os.path.join(p, "day=2024-02", "*.parquet")))
    assert after == untouched
    assert [os.path.getmtime(f) for f in after] == mtimes


def test_read_text_corpus_whole_files(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import read_text_corpus

    d = tmp_path / "corpus"
    d.mkdir()
    (d / "a.txt").write_text("hello world\nsecond line")
    (d / "b.txt").write_text("another doc")
    out = {
        r["doc_path"].rsplit("/", 1)[-1]: r["text"]
        for r in read_text_corpus(spark, str(d)).collect()
    }
    assert out == {
        "a.txt": "hello world\nsecond line",
        "b.txt": "another doc",
    }


def test_orc_roundtrip(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import read_orc, write_orc

    p = str(tmp_path / "orc_tbl")
    df = spark.createDataFrame([(1, "x"), (2, "y")], "id long, v string")
    write_orc(df, p)
    got = sorted(map(tuple, read_orc(spark, p).collect()))
    assert got == [(1, "x"), (2, "y")]


def test_read_json_robust_quarantines_bad_lines(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import read_json_robust

    p = tmp_path / "raw"
    p.mkdir()
    (p / "a.json").write_text(
        '{"id": 1, "v": "ok"}\n'
        "this is not json at all\n"
        '{"id": 2, "v": "also ok"}\n'
        '{"id": "NOT_A_NUMBER", "v": "type mismatch"}\n'
    )
    good, bad = read_json_robust(spark, str(p), "id long, v string")
    assert {(r["id"], r["v"]) for r in good.collect()} == {
        (1, "ok"), (2, "also ok")
    }
    bad_rows = [r[0] for r in bad.collect()]
    assert len(bad_rows) == 2
    assert "not json" in bad_rows[0] or "not json" in bad_rows[1]


def test_compact_partitioned_parquet_preserves_layout(spark, tmp_path):
    import glob
    import os

    from dbscan_pyspark_spark.sources.io import compact_partitioned_parquet

    p = str(tmp_path / "ptab")
    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], "id long, part string"
    )
    # many small files per partition
    df.repartition(8).write.partitionBy("part").parquet(p)
    before = spark.read.parquet(p)
    before_rows = sorted(map(tuple, before.collect()))
    counts = compact_partitioned_parquet(spark, p, target_file_bytes=1 << 30)
    assert set(counts) == {"part=a", "part=b"}
    assert all(n == 1 for n in counts.values())
    for leaf in counts:
        assert len(glob.glob(os.path.join(p, leaf, "*.parquet"))) == 1
    after = sorted(map(tuple, spark.read.parquet(p).collect()))
    assert after == before_rows


def test_read_parquet_evolved_merges_schemas(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import read_parquet_evolved

    p = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "x")], "id long, v string").write.parquet(p)
    spark.createDataFrame(
        [(2, "y", 9.5)], "id long, v string, score double"
    ).write.mode("append").parquet(p)
    out = read_parquet_evolved(spark, p)
    assert set(out.columns) == {"id", "v", "score"}
    got = {r["id"]: r["score"] for r in out.collect()}
    assert got == {1: None, 2: 9.5}


def test_upsert_parquet_partition_moving_key(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import upsert_parquet

    p = str(tmp_path / "movetbl")
    base = spark.createDataFrame(
        [(1, "a", "v1"), (2, "a", "v2"), (3, "b", "v3")],
        "id long, part string, v string",
    )
    upsert_parquet(spark, p, base, key_cols=["id"], partition_col="part")
    # key 2 MOVES from partition a to partition b
    upd = spark.createDataFrame(
        [(2, "b", "v2-moved")], "id long, part string, v string"
    )
    upsert_parquet(spark, p, upd, key_cols=["id"], partition_col="part")
    got = sorted(map(tuple, spark.read.parquet(p).collect()))
    assert got == [
        (1, "v1", "a"), (2, "v2-moved", "b"), (3, "v3", "b"),
    ] or got == sorted(
        [(1, "a", "v1"), (2, "b", "v2-moved"), (3, "b", "v3")]
    ), got
    # exactly one row per key — no stale duplicate in the old partition
    ids = [r for r in spark.read.parquet(p).groupBy("id").count().collect()]
    assert all(r["count"] == 1 for r in ids)


def test_upsert_parquet_emptied_partition_removed(spark, tmp_path):
    import os

    from dbscan_pyspark_spark.sources.io import upsert_parquet

    p = str(tmp_path / "emptytbl")
    base = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "id long, part string, v string"
    )
    upsert_parquet(spark, p, base, key_cols=["id"], partition_col="part")
    # the ONLY row of partition a moves away -> partition dir must go
    upd = spark.createDataFrame(
        [(1, "b", "x-moved")], "id long, part string, v string"
    )
    upsert_parquet(spark, p, upd, key_cols=["id"], partition_col="part")
    assert not os.path.isdir(os.path.join(p, "part=a"))
    got = sorted(map(tuple, spark.read.parquet(p).collect()))
    assert len(got) == 2


def test_read_media_files_binary_source(spark, tmp_path):
    """binaryFile ingestion lands in the MEDIA_SCHEMA shape, infers
    modality/mime from extension, assigns deterministic ids, and feeds
    decode_media end-to-end."""
    from dbscan_pyspark_spark.operators.multimodal import decode_media
    from dbscan_pyspark_spark.sources.io import read_media_files

    d = tmp_path / "media" / "nested"
    d.mkdir(parents=True)
    (tmp_path / "media" / "a.jpg").write_bytes(b"\xff\xd8fakejpeg")
    (tmp_path / "media" / "b.wav").write_bytes(b"RIFFfakewav")
    (d / "c.mp4").write_bytes(b"\x00\x00fakemp4")
    (d / "d.xyz").write_bytes(b"unknown")

    df = read_media_files(spark, str(tmp_path / "media"))
    rows = {r["media_path"].rsplit("/", 1)[-1]: r for r in df.collect()}
    assert set(rows) == {"a.jpg", "b.wav", "c.mp4", "d.xyz"}
    assert rows["a.jpg"]["modality"] == "image"
    assert rows["a.jpg"]["mime"] == "image/jpeg"
    assert rows["b.wav"]["modality"] == "audio"
    assert rows["c.mp4"]["modality"] == "video"  # recursive lookup
    assert rows["d.xyz"]["modality"] == "binary"
    assert rows["d.xyz"]["mime"] is None
    assert bytes(rows["a.jpg"]["content"]) == b"\xff\xd8fakejpeg"
    assert rows["b.wav"]["n_bytes"] == 11
    assert all(r["meta"] is not None for r in rows.values())
    # deterministic ids: re-read assigns identical media_id per path
    again = {r["media_path"]: r["media_id"]
             for r in read_media_files(spark, str(tmp_path / "media")).collect()}
    assert {r["media_path"]: r["media_id"] for r in rows.values()} == again
    # glob pruning happens at listing time
    only_img = read_media_files(spark, str(tmp_path / "media"), glob="*.jpg")
    assert only_img.count() == 1
    # the multimodal decode stage consumes this frame directly
    dec = decode_media(df.select("media_id", "modality", "content", "mime", "meta"))
    assert dec.count() == 4
    assert {r["n_bytes"] for r in dec.collect()} == {10, 11, 9, 7}


def test_export_training_shards_roundtrip_and_pruning(spark, tmp_path):
    """Export -> manifest -> single-shard read: shard dirs hold the
    shard_order assignment, the manifest accounts for every row, and
    the read_shard scan partition-prunes to ONE shard directory."""
    from dbscan_pyspark_spark.operators.pipeline import shard_order
    from dbscan_pyspark_spark.sources.io import export_training_shards, read_shard

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id long, text string"
    )
    out = str(tmp_path / "export")
    manifest = export_training_shards(df, out, n_shards=4)
    m = {r["shard"]: r["n_rows"] for r in manifest.collect()}
    assert sum(m.values()) == 200 and set(m) == {0, 1, 2, 3}
    # the written assignment IS shard_order's
    want = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in shard_order(df, n_shards=4).collect()
    }
    got = {
        (r["doc_id"], r["shard"], r["pos"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == want
    # single-shard read returns that shard in pos order
    s2 = read_shard(spark, out, 2).collect()
    assert [r["pos"] for r in s2] == sorted(r["pos"] for r in s2)
    assert {(r["doc_id"], 2, r["pos"]) for r in s2} == {
        t for t in want if t[1] == 2
    }
    # partition pruning: the plan's scan lists exactly one shard dir
    plan = (
        read_shard(spark, out, 2)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "shard=2" in plan or "PartitionFilters: [isnotnull(shard" in plan, plan


def test_read_xml_rowtag_and_schema(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import read_xml

    d = tmp_path / "xmls"
    d.mkdir()
    (d / "a.xml").write_text(
        "<rows><row><id>1</id><name>alpha</name></row>"
        "<row><id>2</id><name>beta</name></row></rows>"
    )
    (d / "b.xml").write_text("<rows><row><id>3</id><name>gamma</name></row></rows>")
    inferred = read_xml(spark, str(d), row_tag="row")
    assert {(r["id"], r["name"]) for r in inferred.collect()} == {
        (1, "alpha"), (2, "beta"), (3, "gamma"),
    }
    explicit = read_xml(spark, str(d), row_tag="row", schema="id long, name string")
    assert explicit.schema.simpleString() == "struct<id:bigint,name:string>"
    assert explicit.count() == 3


def test_read_csv_robust_quarantines_bad_lines(spark, tmp_path):
    from dbscan_pyspark_spark.sources.io import read_csv_robust

    p = tmp_path / "raw"
    p.mkdir()
    (p / "x.csv").write_text("1,alpha\nnot-an-int,beta\n3,gamma\n")
    df = read_csv_robust(spark, str(p), "id int, name string")
    rows = df.collect()
    assert len(rows) == 3  # every line accounted for
    clean = {(r["id"], r["name"]) for r in rows if r["_corrupt"] is None}
    assert clean == {(1, "alpha"), (3, "gamma")}
    bad = [r for r in rows if r["_corrupt"] is not None]
    assert len(bad) == 1 and bad[0]["_corrupt"] == "not-an-int,beta"


def test_read_csv_robust_short_row_caveat(spark, tmp_path):
    """Pins the version-specific short-row semantics the docstring
    documents: on Spark 4.x a line with FEWER tokens than the schema is
    null-padded AND flagged in _corrupt (older versions left _corrupt
    NULL) — and the belt-and-braces remedy (a not_null validate rule on
    trailing columns) catches it independently of _corrupt."""
    from dbscan_pyspark_spark.operators.pipeline import validate
    from dbscan_pyspark_spark.sources.io import read_csv_robust

    p = tmp_path / "raw"
    p.mkdir()
    (p / "x.csv").write_text("1,alpha\n2\n3,gamma\n")
    df = read_csv_robust(spark, str(p), "id int, name string")
    rows = df.collect()
    short = [r for r in rows if r["name"] is None]
    assert len(short) == 1 and short[0]["id"] == 2
    # Spark 4.x: the short row carries its raw line as evidence
    assert short[0]["_corrupt"] == "2"
    # the version-independent expectation flags it too
    report = validate(df, [("not_null", "name")]).collect()
    (rule,) = [r for r in report if r["rule"].startswith("not_null")]
    assert rule["violations"] == 1 and not rule["passed"]
