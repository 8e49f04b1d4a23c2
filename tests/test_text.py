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


def test_strip_html_semantics(spark):
    """Tag forms, content angle brackets, entity decode order,
    comments/doctype, and the no-markup identity."""
    from dbscan_pyspark_spark.functions.text import strip_html

    rows = [
        (0, '<p id="a">Hello <b>world</b></p>', "Hello world", 4),
        (1, "a &lt; b &amp;&amp; c &gt; d", "a < b && c > d", 0),
        # &amp;lt; decodes ONCE: the literal text '&lt;'
        (2, "&amp;lt; stays", "&lt; stays", 0),
        # a lone '<' cannot swallow forward to the next tag
        (3, "lone < bracket <b>x", "lone < bracket x", 1),
        (4, "no markup", "no markup", 0),
        (5, "&quot;q&quot; &#39;s&#39;", "\"q\" 's'", 0),
        # '< e >' is content (no letter after '<'), not a tag
        (6, "a<b>c</b>d < e > f", "acd < e > f", 2),
        (7, "<!-- c -->kept<!DOCTYPE html>", "kept", 2),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _c, _n in rows], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["s"]["clean_text"], r["s"]["n_tags"])
        for r in df.select(
            "doc_id", strip_html("text").alias("s")
        ).collect()
    }
    for i, _t, clean, n in rows:
        assert got[i] == (clean, n), (i, got[i], (clean, n))


def test_url_extraction_semantics(spark):
    """URL matching shapes: plain, port, path+query, userinfo,
    mixed-case hosts (host lowercases, path case survives), http vs
    https, trailing content exclusion at whitespace/angle brackets,
    and non-URLs yielding empty arrays; registrable domain is the
    last-two-label heuristic, empty below two labels."""
    from dbscan_pyspark_spark.functions.text import (
        extract_urls,
        url_host,
        url_registrable_domain,
    )

    rows = [
        (0, "see https://sub.Example.com/P/9 end",
         ["https://sub.Example.com/P/9"],
         [("sub.example.com", "example.com")]),
        (1, "a http://x.org:8080/q?a=1&b=2 b",
         ["http://x.org:8080/q?a=1&b=2"], [("x.org", "x.org")]),
        (2, "u https://user:pw@deep.host.net/secret v",
         ["https://user:pw@deep.host.net/secret"],
         [("deep.host.net", "host.net")]),
        (3, '<a href="https://a.io/x">link</a>',
         ["https://a.io/x"], [("a.io", "a.io")]),
        (4, "two https://a.com and http://b.de/ here",
         ["https://a.com", "http://b.de/"],
         [("a.com", "a.com"), ("b.de", "b.de")]),
        (5, "no urls here, not even ftp://old.school", [], []),
        (6, "bare http://localhost/x", ["http://localhost/x"],
         [("localhost", "")]),
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t, _u, _h in rows], "doc_id long, text string"
    )
    got_urls = {
        r["doc_id"]: r["u"]
        for r in df.select(
            "doc_id", extract_urls("text").alias("u")
        ).collect()
    }
    for i, _t, urls, _h in rows:
        assert got_urls[i] == urls, (i, got_urls[i])

    from pyspark.sql import functions as F

    exploded = df.select(
        "doc_id", F.explode(extract_urls("text")).alias("url")
    ).select(
        "doc_id",
        url_host(F.col("url")).alias("host"),
        url_registrable_domain(F.col("url")).alias("domain"),
    )
    got_hosts: dict[int, list] = {}
    for r in exploded.collect():
        got_hosts.setdefault(r["doc_id"], []).append(
            (r["host"], r["domain"])
        )
    for i, _t, urls, hosts in rows:
        assert got_hosts.get(i, []) == hosts, (i, got_hosts.get(i))
