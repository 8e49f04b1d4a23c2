from pyspark.sql import functions as F

from dbscan_pyspark_spark.functions.text import (
    bpe_ish_tokens,
    fingerprint,
    lang_id,
    quality_score,
    stopword_ratio,
    token_count,
    word_shingles,
)


def test_token_count_and_shingles(spark):
    df = spark.createDataFrame([(1, "a b c d"), (2, "  x   y  "), (3, "solo")], ["id", "t"])
    rows = {
        r["id"]: r
        for r in df.select(
            "id",
            token_count("t").alias("n"),
            word_shingles("t", 2).alias("sh"),
        ).collect()
    }
    assert rows[1]["n"] == 4
    assert rows[2]["n"] == 2
    assert rows[1]["sh"] == ["a b", "b c", "c d"]
    assert rows[2]["sh"] == ["x y"]
    assert rows[3]["sh"] == [""] or rows[3]["sh"] == []  # degenerate: no 2-shingle


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO  world.")],
        ["id", "t"],
    )
    fps = [r["fp"] for r in df.select(fingerprint("t").alias("fp")).collect()]
    assert fps[0] == fps[1] == fps[2]


def test_stopword_ratio_and_quality(spark):
    df = spark.createDataFrame([(1, "the cat sat on the mat")], ["id", "t"])
    r = df.select(
        F.round(stopword_ratio("t"), 4).alias("sw"),
        quality_score("t").alias("q"),
    ).first()
    assert abs(r["sw"] - 2 / 6) < 1e-3
    assert 0.0 <= r["q"] <= 1.0


def test_lang_id(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of a house"),
            (2, "el perro y la casa de que si"),
            (3, "der hund und die katze ist hier"),
            (4, "zzz qqq xxx"),
        ],
        ["id", "t"],
    )
    out = {r["id"]: r["lang"] for r in df.select("id", lang_id("t").alias("lang")).collect()}
    assert out[1] == "en"
    assert out[2] == "es"
    assert out[3] == "de"
    assert out[4] == "und"


def test_bpe_ish_tokens(spark):
    df = spark.createDataFrame([(1, "hello world42 !? foo-bar")], ["id", "t"])
    toks = df.select(bpe_ish_tokens("t").alias("x")).first()["x"]
    assert toks == ["hello", "world", "42", "!?", "foo", "-", "bar"]
