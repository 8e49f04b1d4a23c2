"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages (north-star extension).

The Spark-side plumbing — schemas, batch iteration, partitioning-safe
signatures — is real and tested. ``decode_mode='fake'`` produces a
deterministic synthetic decode from the bytes so the pipeline shape is
exercisable end-to-end. ``decode_mode='real'`` now carries FIVE real
zero-dependency codecs — binary PPM/PGM images, PNG (stdlib ``zlib``
inflate + full five-filter scanline reconstruction at every legal
depth incl. bit-packed 1/2/4, palette/PLTE expansion, Adam7
interlacing, CRC verified), JPEG
(baseline AND progressive: full entropy decode + dequant + IDCT +
restart markers, see ``operators/jpeg.py``), PCM WAV audio, and
PCM-in-MP4 (real ISO-BMFF stts/stsc/stsz/stco sample-table walk for
uncompressed 'twos'/'sowt' audio tracks) — so decode / dimension
extraction / resize run genuine formats end-to-end, including two
compressed image formats (JPEG at any legal chroma subsampling,
baseline or progressive); COMPRESSED MP4 sample data (H.264/AAC) and
12-bit JPEG still raise ``NotImplementedError`` at the exact call
site where PIL/ffmpeg would plug in (this container ships neither —
those genuinely need a codec, not a parser).

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; binary payloads never pass through a
shuffle (metadata-only projections before any wide operation); feature
vectors come back as plain ``array<float>`` columns that feed the
similarity operators (operators/similarity.py) directly.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# NumPy accelerates the PNG scanline unfilter (and frame synthesis)
# when present; every vectorized path has a bit-exact pure-Python twin.
try:
    import numpy as _np
except ImportError:  # pragma: no cover - numpy-free fallback
    _np = None

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("content", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("width", T.IntegerType(), True),
                    T.StructField("height", T.IntegerType(), True),
                    T.StructField("duration_ms", T.LongType(), True),
                    T.StructField("sample_rate", T.IntegerType(), True),
                ]
            ),
            True,
        ),
    ]
)

_DECODED_FIELDS = "media_id long, modality string, n_bytes long, checksum string"
_FEATURE_FIELDS = "media_id long, feature array<float>"
_FRAME_FIELDS = "media_id long, frame_index int, frame_offset_ms long, frame binary"


def media_from_documents(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Build a media table from any text table (test fixture path):
    content = utf-8 bytes, modality round-robin. Deterministic."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.col(id_col) % 3 + 1).cast("int"),
        ).alias("modality"),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.struct(
            F.lit(64).cast("int").alias("width"),
            F.lit(64).cast("int").alias("height"),
            (F.length(text_col).cast("long") * 10).alias("duration_ms"),
            F.lit(16000).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def _fake_decode(content: bytes) -> tuple[int, str]:
    import hashlib

    return len(content or b""), hashlib.md5(content or b"").hexdigest()


# ---- real zero-dependency codecs: binary PPM/PGM + PCM WAV ----------


def _decode_ppm(content: bytes) -> tuple[int, int, int, bytes]:
    """Parse a binary PPM (P6, RGB) or PGM (P5, gray) image: returns
    (width, height, channels, pixel_bytes). Pure bytes parsing of the
    Netpbm format — magic, whitespace/comment-separated width height
    maxval, one whitespace byte, then raw samples. maxval > 255 means
    two-byte big-endian samples (Netpbm "plain raster" extension);
    those come back as their high byte, the PNG-16 discipline."""
    if not content or content[:2] not in (b"P6", b"P5"):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if content[:2] == b"P6" else 1
    fields: list[int] = []
    i = 2
    while len(fields) < 3:
        while i < len(content) and content[i : i + 1].isspace():
            i += 1
        if content[i : i + 1] == b"#":  # comment to end of line
            while i < len(content) and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(content) and not content[j : j + 1].isspace():
            j += 1
        fields.append(int(content[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = fields
    if not 0 < maxval < 65536:
        raise ValueError(f"bad Netpbm maxval {maxval}")
    bps = 2 if maxval > 255 else 1
    n = width * height * channels * bps
    pix = content[i : i + n]
    if len(pix) != n:
        raise ValueError(
            f"truncated PPM payload: expected {n} bytes, got {len(pix)}"
        )
    if bps == 2:
        pix = pix[0::2]  # big-endian high byte per sample
    return width, height, channels, pix


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_filter_row(
    f: int, line: bytes, prev: bytes, bpp: int
) -> bytes:
    """Apply PNG scanline filter ``f`` (0=None 1=Sub 2=Up 3=Average
    4=Paeth, RFC 2083 §6) to a raw row — the encoder side; the decoder
    below inverts it. ``bpp`` is BYTES per pixel (channels at 8-bit,
    channels*2 at 16-bit, 1 for palette indices), the filters' left
    neighbor distance per the spec."""
    out = bytearray(len(line))
    for x in range(len(line)):
        a = line[x - bpp] if x >= bpp else 0
        b = prev[x]
        c = prev[x - bpp] if x >= bpp else 0
        if f == 0:
            v = line[x]
        elif f == 1:
            v = line[x] - a
        elif f == 2:
            v = line[x] - b
        elif f == 3:
            v = line[x] - ((a + b) >> 1)
        elif f == 4:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
            v = line[x] - pr
        else:
            raise ValueError(f"bad PNG filter {f}")
        out[x] = v & 0xFF
    return bytes(out)


# Adam7 interlace pass grid (RFC 2083 §2.6): (x_start, y_start,
# x_step, y_step) per pass; each pass is filtered as an independent
# sub-image, then scattered onto the full pixel grid.
_ADAM7 = (
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
)


def _png_unfilter(
    raw: bytes, pos: int, stride: int, height: int, bpp: int
) -> tuple[bytearray, int]:
    """Invert the scanline filters of one (sub-)image: ``height`` rows
    of ``1 + stride`` bytes starting at ``pos`` in the inflated
    stream. ``stride`` is the packed byte width of a row (pixels*bpp
    at byte depths, bit-packed-and-padded at sub-byte depths, where
    ``bpp`` is 1 per RFC 2083 §6.2). Returns (pixel bytes, next
    position). Shared by the sequential path (one call) and the Adam7
    path (one call per non-empty pass).

    With numpy, Sub rows invert as a per-lane modulo-256 cumulative
    sum and Up rows as one wrapping vector add — bit-identical to the
    byte loops (uint8 arithmetic IS the & 0xFF). Average and Paeth
    carry a left dependency through the decoded byte, so those rows
    keep the scalar loop. Truncated or bad-filter streams delegate to
    the scalar path so error order and messages stay identical."""
    if _np is not None and height > 0 and stride % bpp == 0:
        need = height * (1 + stride)
        block = None
        if len(raw) - pos >= need:
            block = _np.frombuffer(
                raw, dtype=_np.uint8, count=need, offset=pos
            ).reshape(height, 1 + stride)
            if (block[:, 0] > 4).any():
                block = None  # bad filter: scalar path raises in order
        if block is not None:
            ftypes = block[:, 0]
            data = block[:, 1:].copy()
            prev = _np.zeros(stride, dtype=_np.uint8)
            for y in range(height):
                f = ftypes[y]
                line = data[y]
                if f == 1:  # Sub: per-lane prefix sum mod 256
                    line[:] = _np.cumsum(
                        line.reshape(-1, bpp), axis=0, dtype=_np.uint8
                    ).reshape(-1)
                elif f == 2:  # Up
                    line += prev
                elif f == 3 or f == 4:  # left-carried: scalar row
                    lb = bytearray(line.tobytes())
                    pb = prev.tobytes()
                    if f == 3:
                        for x in range(stride):
                            a = lb[x - bpp] if x >= bpp else 0
                            lb[x] = (lb[x] + ((a + pb[x]) >> 1)) & 0xFF
                    else:
                        for x in range(stride):
                            a = lb[x - bpp] if x >= bpp else 0
                            b = pb[x]
                            c = pb[x - bpp] if x >= bpp else 0
                            p = a + b - c
                            pa, pb_, pc = abs(p - a), abs(p - b), abs(p - c)
                            pr = (
                                a
                                if (pa <= pb_ and pa <= pc)
                                else (b if pb_ <= pc else c)
                            )
                            lb[x] = (lb[x] + pr) & 0xFF
                    line[:] = _np.frombuffer(bytes(lb), dtype=_np.uint8)
                prev = line
            return bytearray(data.tobytes()), pos + need
    return _png_unfilter_scalar(raw, pos, stride, height, bpp)


def _png_unfilter_scalar(
    raw: bytes, pos: int, stride: int, height: int, bpp: int
) -> tuple[bytearray, int]:
    """Pure-Python twin of :func:`_png_unfilter` (and the exact-error
    path for truncated / bad-filter streams)."""
    out = bytearray()
    prev = bytes(stride)
    for _y in range(height):
        if pos >= len(raw):
            raise ValueError("PNG pixel stream truncated")
        f = raw[pos]
        pos += 1
        line = bytearray(raw[pos : pos + stride])
        if len(line) != stride:
            raise ValueError("PNG pixel stream truncated")
        pos += stride
        if f == 1:  # Sub
            for x in range(bpp, stride):
                line[x] = (line[x] + line[x - bpp]) & 0xFF
        elif f == 2:  # Up
            for x in range(stride):
                line[x] = (line[x] + prev[x]) & 0xFF
        elif f == 3:  # Average
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                line[x] = (line[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif f == 4:  # Paeth
            for x in range(stride):
                a = line[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = (
                    a
                    if (pa <= pb and pa <= pc)
                    else (b if pb <= pc else c)
                )
                line[x] = (line[x] + pr) & 0xFF
        elif f != 0:
            raise ValueError(f"bad PNG filter {f}")
        out += line
        prev = bytes(line)
    return out, pos


def _png_unpack_bits(row: bytes, width: int, depth: int) -> bytes:
    """Unpack sub-byte samples (depth 1/2/4, MSB-first within each
    byte per RFC 2083 §2.3) into one byte per sample, no scaling —
    trailing pad bits in the last byte of a row are dropped."""
    mask = (1 << depth) - 1
    per = 8 // depth
    out = bytearray(width)
    for x in range(width):
        out[x] = (row[x // per] >> (8 - depth * (x % per + 1))) & mask
    return bytes(out)


def _png_pack_bits(samples: bytes, depth: int) -> bytes:
    """Inverse of :func:`_png_unpack_bits`: pack one-byte-per-sample
    values (each already < 2**depth) MSB-first, zero-padding the last
    byte — one call per scanline so rows stay byte-aligned."""
    mask = (1 << depth) - 1
    per = 8 // depth
    out = bytearray((len(samples) + per - 1) // per)
    for i, v in enumerate(samples):
        out[i // per] |= (v & mask) << (8 - depth * (i % per + 1))
    return bytes(out)


def _decode_png(content: bytes) -> tuple[int, int, int, bytes]:
    """Zero-dependency PNG decode: stdlib ``zlib`` inflate of the IDAT
    stream plus scanline unfiltering (all five RFC 2083 filters).
    Supports gray / gray+alpha / RGB / RGBA at 8- and 16-bit depths,
    palette (PLTE-indexed) and grayscale at ALL legal depths
    (1/2/4/8 for palette, 1/2/4/8/16 for gray), and Adam7
    interlacing — the full RFC 2083 depth/type matrix. 16-bit
    samples come back as their high byte (the standard 16->8
    downsample); sub-byte gray scales to the full 0..255 range
    (left-bit replication); palette indices come back expanded to
    RGB. Returns (width, height, channels, pixel_bytes).
    CRCs are verified (a corrupt chunk should fail loudly, not decode
    garbage). Per-pixel Python unfiltering is the honest cost of zero
    dependencies — fine for planted test media; production pipelines
    plug PIL here."""
    import struct
    import zlib

    if not content or content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    chunks = []
    i = 8
    while i + 12 <= len(content):
        (ln,) = struct.unpack(">I", content[i : i + 4])
        typ = content[i + 4 : i + 8]
        data = content[i + 8 : i + 8 + ln]
        (crc,) = struct.unpack(
            ">I", content[i + 8 + ln : i + 12 + ln]
        )
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {typ!r} CRC mismatch")
        chunks.append((typ, data))
        i += 12 + ln
        if typ == b"IEND":
            break
    if not chunks or chunks[0][0] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w, h, depth, ctype, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", chunks[0][1]
    )
    if interlace not in (0, 1):
        raise ValueError(f"bad PNG interlace method {interlace}")
    plte = None
    if ctype == 3:
        if depth not in (1, 2, 4, 8):
            raise ValueError(f"bad palette PNG bit depth {depth}")
        plte = next((d for t, d in chunks if t == b"PLTE"), None)
        if plte is None or len(plte) % 3 or not 3 <= len(plte) <= 768:
            raise ValueError("palette PNG missing or invalid PLTE")
        nch = 1  # one index per pixel on the wire (bit-packed < 8)
    else:
        nch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
        if nch is None:
            raise NotImplementedError(f"PNG color type {ctype}")
        if depth not in ((1, 2, 4, 8, 16) if ctype == 0 else (8, 16)):
            raise ValueError(
                f"bad PNG bit depth {depth} for color type {ctype}"
            )
    raw = zlib.decompress(
        b"".join(d for t, d in chunks if t == b"IDAT")
    )
    # filters operate on BYTES with the left neighbor one whole pixel
    # back: bpp bytes (RFC 2083 §6.2) — channels at 8-bit, channels*2
    # at 16-bit, and rounded up to 1 at the sub-byte depths (where
    # rows are bit-packed MSB-first and padded to a byte boundary)
    bpp = max(1, nch * depth // 8)
    sub_byte = depth < 8  # only gray (0) / palette (3) reach here
    if interlace == 0:
        stride = (w * nch * depth + 7) // 8
        if len(raw) != h * (stride + 1):
            raise ValueError("PNG pixel stream size mismatch")
        out, _ = _png_unfilter(raw, 0, stride, h, bpp)
        if sub_byte:
            out = b"".join(
                _png_unpack_bits(
                    out[y * stride : (y + 1) * stride], w, depth
                )
                for y in range(h)
            )
    else:
        # Adam7: unfilter each pass as its own sub-image (sub-byte
        # passes unpack to one byte per sample first), scatter the
        # pass pixels onto the full grid by the pass's offset/stride
        obpp = 1 if sub_byte else bpp
        out = bytearray(w * h * obpp)
        pos = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue  # empty pass carries no bytes at all
            pstride = (pw * nch * depth + 7) // 8
            sub, pos = _png_unfilter(raw, pos, pstride, ph, bpp)
            if sub_byte:
                sub = b"".join(
                    _png_unpack_bits(
                        sub[sy * pstride : (sy + 1) * pstride], pw, depth
                    )
                    for sy in range(ph)
                )
            for sy in range(ph):
                for sx in range(pw):
                    src = (sy * pw + sx) * obpp
                    dst = ((y0 + sy * dy) * w + (x0 + sx * dx)) * obpp
                    out[dst : dst + obpp] = sub[src : src + obpp]
        if pos != len(raw):
            raise ValueError("PNG pixel stream size mismatch")
    if depth == 16:
        out = out[0::2]  # big-endian high byte per sample
    if sub_byte and plte is None:
        # grayscale sub-byte: scale to full 8-bit range (0..mask ->
        # 0..255, the exact left-bit-replication value)
        mask = (1 << depth) - 1
        out = bytes(v * 255 // mask for v in out)
    if plte is not None:
        for idx in out:
            if 3 * idx + 3 > len(plte):
                raise ValueError("palette index out of range")
        out = b"".join(plte[3 * idx : 3 * idx + 3] for idx in out)
        return w, h, 3, bytes(out)
    return w, h, nch, bytes(out)


def _encode_png(
    width: int,
    height: int,
    pix: bytes,
    channels: int = 3,
    row_filters: list[int] | None = None,
    depth: int = 8,
    palette: list[tuple[int, int, int]] | None = None,
    interlace: bool = False,
) -> bytes:
    """Encode raw pixels as a valid PNG (stdlib zlib + CRC chunks).
    ``row_filters`` optionally sets the filter per scanline (cycled) —
    the test path uses it to plant payloads that exercise every
    unfilter branch; default is filter 0 everywhere. ``depth=16``
    expects big-endian 16-bit samples in ``pix`` (2 bytes each);
    ``palette`` switches to color type 3 with ``pix`` holding one
    palette index byte per pixel (``channels`` ignored); sub-byte
    depths (1/2/4, palette or single-channel gray) also take one
    byte per sample in ``pix`` — each value < 2**depth — and are
    bit-packed per scanline; ``interlace`` writes Adam7 passes
    (pixels still given in normal row-major order — the encoder
    gathers them per pass)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    if palette is not None:
        if depth not in (1, 2, 4, 8):
            raise ValueError("palette PNG depth must be 1/2/4/8")
        ctype, nch = 3, 1
    else:
        ctype = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
        if depth < 8 and channels != 1:
            raise ValueError("sub-byte PNG depth needs 1 channel")
        nch = channels
    # unit = bytes per pixel in the CALLER's pix buffer; bpp = the
    # filter left-neighbor distance on the wire (1 at sub-byte depths)
    unit = nch * (2 if depth == 16 else 1)
    bpp = max(1, nch * depth // 8)

    def filtered_row(samples, f, prev):
        line = _png_pack_bits(samples, depth) if depth < 8 else samples
        return line, bytes([f]) + _png_filter_row(f, line, prev, bpp)

    ihdr = struct.pack(
        ">IIBBBBB", width, height, depth, ctype, 0, 0, int(interlace)
    )
    raw = bytearray()
    if interlace:
        fy = 0  # filter choice cycles across all emitted rows
        for x0, y0, dx, dy in _ADAM7:
            pw = (width - x0 + dx - 1) // dx
            ph = (height - y0 + dy - 1) // dy
            if pw <= 0 or ph <= 0:
                continue
            prev = bytes((pw * nch * depth + 7) // 8)
            for sy in range(ph):
                samples = b"".join(
                    pix[
                        ((y0 + sy * dy) * width + (x0 + sx * dx)) * unit :
                        ((y0 + sy * dy) * width + (x0 + sx * dx)) * unit
                        + unit
                    ]
                    for sx in range(pw)
                )
                f = row_filters[fy % len(row_filters)] if row_filters else 0
                fy += 1
                prev, enc = filtered_row(samples, f, prev)
                raw += enc
    else:
        stride = width * unit
        prev = bytes((width * nch * depth + 7) // 8)
        for y in range(height):
            samples = bytes(pix[y * stride : (y + 1) * stride])
            f = row_filters[y % len(row_filters)] if row_filters else 0
            prev, enc = filtered_row(samples, f, prev)
            raw += enc
    body = chunk(b"IHDR", ihdr)
    if palette is not None:
        body += chunk(
            b"PLTE", b"".join(bytes(rgb) for rgb in palette)
        )
    return (
        _PNG_SIG
        + body
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


# ---- MP4 / ISO BMFF container metadata (real parse, no sample decode)


def _mp4_boxes(data, start, end):
    i = start
    while i + 8 <= end:
        (size,) = struct.unpack(">I", data[i : i + 4])
        typ = data[i + 4 : i + 8]
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack(">Q", data[i + 8 : i + 16])
            payload_off = i + 16
        elif size == 0:  # to end of enclosing box
            size = end - i
            payload_off = i + 8
        else:
            payload_off = i + 8
        if size < 8 or i + size > end:
            raise ValueError("malformed MP4 box")
        yield typ, payload_off, i + size
        i += size


def _parse_mp4_meta(content: bytes):
    """Parse MP4/ISO-BMFF container metadata: returns
    (duration_ms, n_tracks, width, height) from mvhd/tkhd boxes —
    width/height from the first video-sized track (tkhd 16.16 fixed
    point), None when absent."""
    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (no ftyp)")
    duration_ms = None
    n_tracks = 0
    width = height = None
    for typ, off, end in _mp4_boxes(content, 0, len(content)):
        if typ != b"moov":
            continue
        for t2, o2, e2 in _mp4_boxes(content, off, end):
            if t2 == b"mvhd":
                ver = content[o2]
                if ver == 1:
                    timescale, duration = struct.unpack(
                        ">IQ", content[o2 + 20 : o2 + 32]
                    )
                else:
                    timescale, duration = struct.unpack(
                        ">II", content[o2 + 12 : o2 + 20]
                    )
                if timescale:
                    duration_ms = duration * 1000 // timescale
            elif t2 == b"trak":
                n_tracks += 1
                for t3, o3, e3 in _mp4_boxes(content, o2, e2):
                    if t3 != b"tkhd":
                        continue
                    ver = content[o3]
                    # after version/flags + timestamps + track id +
                    # reserved + duration: v0 ends at +24, v1 at +36
                    base = o3 + (36 if ver == 1 else 24)
                    # reserved(8) layer(2) alt_group(2) volume(2)
                    # reserved(2) matrix(36) -> width(4) height(4)
                    wh = content[base + 52 : base + 60]
                    if len(wh) == 8:
                        w_fp, h_fp = struct.unpack(">II", wh)
                        if w_fp and h_fp and width is None:
                            width, height = w_fp >> 16, h_fp >> 16
    if duration_ms is None and n_tracks == 0:
        raise ValueError("MP4 has no moov metadata")
    return duration_ms, n_tracks, width, height


def _mp4_box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _encode_mp4_stub(
    duration_ms: int, width: int, height: int, timescale: int = 1000
) -> bytes:
    """Synthesize a minimal valid MP4 container (ftyp + moov with mvhd
    and one video trak/tkhd) carrying REAL metadata — no media samples
    (mdat absent), exactly what a metadata probe reads."""
    dur = duration_ms * timescale // 1000
    mvhd = (
        bytes([0, 0, 0, 0])  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification
        + struct.pack(">II", timescale, dur)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume
        + b"\x00" * 10
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2)  # next track id
    )
    tkhd = (
        bytes([0, 0, 0, 7])  # version 0, flags: enabled+in-movie+preview
        + struct.pack(">II", 0, 0)
        + struct.pack(">I", 1)  # track id
        + b"\x00" * 4
        + struct.pack(">I", dur)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer/group/volume/reserved
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16)
    )
    moov = _mp4_box(b"mvhd", mvhd) + _mp4_box(b"trak", _mp4_box(b"tkhd", tkhd))
    return (
        _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
        + _mp4_box(b"moov", moov)
    )


def _full_box(typ: bytes, payload: bytes, version: int = 0, flags: int = 0) -> bytes:
    return _mp4_box(
        typ, bytes([version]) + flags.to_bytes(3, "big") + payload
    )


def _encode_mp4_pcm(
    rate: int, samples: list[int], chunk_size: int = 100, fmt: bytes = b"twos"
) -> bytes:
    """Synthesize a REAL playable MP4: one mono 16-bit PCM audio track
    ('twos' big-endian or 'sowt' little-endian sample entry) with a
    full sample table — stts/stsc/stsz/stco over an mdat split into
    ``chunk_size``-sample chunks — so the decoder's stbl walk is
    exercised on genuine chunked layout, not a degenerate single run."""
    import struct as _s

    if fmt not in (b"twos", b"sowt"):
        raise ValueError("fmt must be 'twos' or 'sowt'")
    n = len(samples)
    endian = ">h" if fmt == b"twos" else "<h"
    pcm = b"".join(_s.pack(endian, int(v)) for v in samples)
    n_full, rem = divmod(n, chunk_size)
    chunk_sizes = [chunk_size] * n_full + ([rem] if rem else [])
    if not chunk_sizes:
        chunk_sizes = [0]

    def build_moov(offsets):
        entry = (
            _s.pack(">I", 36)
            + fmt
            + b"\x00" * 6
            + _s.pack(">H", 1)  # data reference index
            + _s.pack(">HHI", 0, 0, 0)  # version/revision/vendor
            + _s.pack(">HHHH", 1, 16, 0, 0)  # ch/bits/compid/pkt
            + _s.pack(">I", rate << 16)
        )
        stsd = _full_box(b"stsd", _s.pack(">I", 1) + entry)
        stts = _full_box(b"stts", _s.pack(">III", 1, n, 1))
        stsc_entries = [(1, chunk_size)] if n_full else []
        if rem:
            stsc_entries.append((n_full + 1, rem))
        if not stsc_entries:
            stsc_entries = [(1, 0)]
        stsc = _full_box(
            b"stsc",
            _s.pack(">I", len(stsc_entries))
            + b"".join(_s.pack(">III", fc, spc, 1) for fc, spc in stsc_entries),
        )
        stsz = _full_box(b"stsz", _s.pack(">II", 2, n))
        stco = _full_box(
            b"stco",
            _s.pack(">I", len(offsets))
            + b"".join(_s.pack(">I", o) for o in offsets),
        )
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        smhd = _full_box(b"smhd", _s.pack(">HH", 0, 0))
        dref = _full_box(
            b"dref", _s.pack(">I", 1) + _full_box(b"url ", b"", flags=1)
        )
        dinf = _mp4_box(b"dinf", dref)
        minf = _mp4_box(b"minf", smhd + dinf + stbl)
        mdhd = _full_box(
            b"mdhd", _s.pack(">IIIIHH", 0, 0, rate, n, 0x55C4, 0)
        )
        hdlr = _full_box(
            b"hdlr", _s.pack(">I", 0) + b"soun" + b"\x00" * 12 + b"\x00"
        )
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        dur = n * 1000 // rate if rate else 0
        tkhd = _full_box(
            b"tkhd",
            _s.pack(">II", 0, 0)
            + _s.pack(">I", 1)
            + b"\x00" * 4
            + _s.pack(">I", n)
            + b"\x00" * 8
            + _s.pack(">HHHH", 0, 0, 0x0100, 0)
            + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + _s.pack(">II", 0, 0),
            flags=7,
        )
        mvhd = _full_box(
            b"mvhd",
            _s.pack(">IIII", 0, 0, 1000, dur)
            + _s.pack(">I", 0x00010000)
            + _s.pack(">H", 0x0100)
            + b"\x00" * 10
            + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + _s.pack(">I", 2),
        )
        return _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd + mdia))

    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    moov_len = len(build_moov([0] * len(chunk_sizes)))
    base = len(ftyp) + moov_len + 8  # + mdat header
    offsets, acc = [], 0
    for cs in chunk_sizes:
        offsets.append(base + acc * 2)
        acc += cs
    return ftyp + build_moov(offsets) + _mp4_box(b"mdat", pcm)


def _mp4_find_track(
    content: bytes, handler: bytes
) -> tuple[bytes, int, dict, int] | None:
    """First track whose hdlr type matches: returns (sample-entry
    fourcc, stsd payload offset, stbl box map, mdhd timescale) or
    None. Pure ISO-BMFF box walking — shared by the audio (soun) and
    video (vide) sample extractors."""
    import struct as _s

    if len(content) < 12 or content[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (no ftyp)")

    def walk(start, end):
        return _mp4_boxes(content, start, end)

    for typ, off, end in walk(0, len(content)):
        if typ != b"moov":
            continue
        for t2, o2, e2 in walk(off, end):
            if t2 != b"trak":
                continue
            mdia = next(
                ((o3, e3) for t3, o3, e3 in walk(o2, e2) if t3 == b"mdia"),
                None,
            )
            if mdia is None:
                continue
            found = None
            minf = None
            timescale = 0
            for t4, o4, e4 in walk(*mdia):
                if t4 == b"hdlr":
                    found = content[o4 + 8 : o4 + 12]
                elif t4 == b"minf":
                    minf = (o4, e4)
                elif t4 == b"mdhd":
                    version = content[o4]
                    ts_off = o4 + (20 if version == 1 else 12)
                    (timescale,) = _s.unpack(
                        ">I", content[ts_off : ts_off + 4]
                    )
            if found != handler or minf is None:
                continue
            stbl = None
            for t5, o5, e5 in walk(*minf):
                if t5 == b"stbl":
                    stbl = (o5, e5)
            if stbl is None:
                continue
            boxes = {t: (o, e) for t, o, e in walk(*stbl)}
            so, _se = boxes[b"stsd"]
            return content[so + 12 : so + 16], so, boxes, timescale
    return None


def _mp4_sample_times(content: bytes, boxes: dict) -> list[int]:
    """Per-sample start times in media-timescale ticks from the stts
    (decoding time-to-sample) runs: run (count, delta) advances the
    clock delta ticks per sample."""
    import struct as _s

    to, _te = boxes[b"stts"]
    (n_runs,) = _s.unpack(">I", content[to + 4 : to + 8])
    starts, t = [], 0
    for i in range(n_runs):
        count, delta = _s.unpack(
            ">II", content[to + 8 + 8 * i : to + 16 + 8 * i]
        )
        for _ in range(count):
            starts.append(t)
            t += delta
    return starts


def _mp4_extract_samples(content: bytes, boxes: dict) -> list[bytes]:
    """Raw sample payloads in sample order via the stsz/stco/stsc walk
    (stsc's samples-per-chunk runs are 1-based and apply from their
    first_chunk until the next entry)."""
    import struct as _s

    zo, _ze = boxes[b"stsz"]
    const_size, n_samples = _s.unpack(">II", content[zo + 4 : zo + 12])
    if const_size == 0:
        sizes = [
            _s.unpack(">I", content[zo + 12 + 4 * i : zo + 16 + 4 * i])[0]
            for i in range(n_samples)
        ]
    else:
        sizes = [const_size] * n_samples
    co, _ce = boxes[b"stco"]
    (n_chunks,) = _s.unpack(">I", content[co + 4 : co + 8])
    chunk_offs = [
        _s.unpack(">I", content[co + 8 + 4 * i : co + 12 + 4 * i])[0]
        for i in range(n_chunks)
    ]
    sc, _sce = boxes[b"stsc"]
    (n_stsc,) = _s.unpack(">I", content[sc + 4 : sc + 8])
    stsc = [
        _s.unpack(">III", content[sc + 8 + 12 * i : sc + 20 + 12 * i])
        for i in range(n_stsc)
    ]
    frames: list[bytes] = []
    si = 0
    for ci in range(1, n_chunks + 1):
        spc = 0
        for fc, s_per_c, _sdi in stsc:
            if fc <= ci:
                spc = s_per_c
        pos = chunk_offs[ci - 1]
        for _ in range(spc):
            if si >= n_samples:
                break
            sz = sizes[si]
            frame = content[pos : pos + sz]
            if len(frame) != sz:
                raise ValueError("MP4 mdat truncated")
            frames.append(frame)
            pos += sz
            si += 1
    if si != n_samples:
        raise ValueError(
            f"MP4 sample table mismatch: walked {si} of "
            f"{n_samples} samples"
        )
    return frames


def _mp4_pcm_samples(content: bytes) -> tuple[int, int, list[int]]:
    """REAL MP4 sample extraction for uncompressed audio: walk the
    first 'soun' track's sample table (stsd/stts/stsc/stsz/stco) and
    read the PCM frames out of mdat by chunk offset — the part of
    'MP4 decode' that is pure ISO-BMFF parsing. Supports the
    uncompressed 16-bit entries ('twos' big-endian, 'sowt'
    little-endian); compressed entries (mp4a/AAC, avc1/H.264, ...)
    raise the ffmpeg plug-point error — that half genuinely needs a
    codec. Returns (sample_rate, channels, samples)."""
    import struct as _s

    track = _mp4_find_track(content, b"soun")
    if track is None:
        raise NotImplementedError(
            "MP4 has no uncompressed ('twos'/'sowt') audio track; "
            "compressed tracks need ffmpeg"
        )
    fmt, so, boxes, _timescale = track
    if fmt not in (b"twos", b"sowt"):
        raise NotImplementedError(
            f"MP4 audio sample entry {fmt!r} needs ffmpeg; only "
            "uncompressed PCM ('twos'/'sowt') decodes here"
        )
    channels, bits = _s.unpack(">HH", content[so + 32 : so + 36])
    (rate_fp,) = _s.unpack(">I", content[so + 40 : so + 44])
    rate = rate_fp >> 16
    if bits != 16:
        raise NotImplementedError("only 16-bit MP4 PCM")
    endian = ">h" if fmt == b"twos" else "<h"
    samples = [
        _s.unpack(endian, frame[b0 : b0 + 2])[0]
        for frame in _mp4_extract_samples(content, boxes)
        for b0 in range(0, len(frame), 2)
    ]
    return rate, channels, samples


def _mp4_mjpeg_frames(
    content: bytes,
) -> tuple[int, int, list[bytes]]:
    """REAL MP4 *video* sample decode for Motion-JPEG tracks: walk the
    first 'vide' track's sample table and decode each sample — a
    complete baseline/progressive JPEG image in the 'jpeg'
    (photo-JPEG) or 'mjpa' (Motion-JPEG A) sample-entry layouts —
    through the zero-dependency JPEG codec (``operators/jpeg.py``).
    Inter-frame-predicted codecs (avc1/H.264, hvc1, mp4v, vp09, av01)
    raise the ffmpeg plug-point error: those genuinely need a video
    codec. Returns (width, height, [RGB/gray pixel bytes per frame]),
    with every frame checked against the stsd-declared dimensions —
    a sample table pointing at mismatched images is a malformed file,
    not a soft warning."""
    import struct as _s

    from dbscan_pyspark_spark.operators.jpeg import decode_jpeg

    track = _mp4_find_track(content, b"vide")
    if track is None:
        raise NotImplementedError("MP4 has no video track")
    fmt, so, boxes, _timescale = track
    if fmt not in (b"jpeg", b"mjpa"):
        raise NotImplementedError(
            f"MP4 video sample entry {fmt!r} needs ffmpeg; only "
            "Motion-JPEG ('jpeg'/'mjpa') decodes here"
        )
    # VisualSampleEntry: width/height at entry+32/+34 (entry = so+8)
    width, height = _s.unpack(">HH", content[so + 40 : so + 44])
    frames = []
    for i, sample in enumerate(_mp4_extract_samples(content, boxes)):
        w, h, _ch, pix = decode_jpeg(bytes(sample))
        if (w, h) != (width, height):
            raise ValueError(
                f"MP4 MJPEG frame {i} is {w}x{h}, sample entry says "
                f"{width}x{height}"
            )
        frames.append(pix)
    return width, height, frames


def _encode_mp4_mjpeg(
    jpeg_frames: list[bytes],
    width: int,
    height: int,
    fps: int = 10,
    chunk_frames: int = 4,
) -> bytes:
    """Synthesize a REAL Motion-JPEG MP4: one 'vide' track with a
    'jpeg' (photo-JPEG) sample entry and a full stts/stsc/stsz/stco
    sample table over an mdat holding the complete per-frame JPEG
    payloads, chunked ``chunk_frames`` per chunk so the decoder's
    stsc walk sees genuine multi-sample chunks. Each frame must be a
    self-contained JPEG (``encode_jpeg`` output)."""
    import struct as _s

    n = len(jpeg_frames)
    sizes = [len(f) for f in jpeg_frames]
    n_full, rem = divmod(n, chunk_frames)
    chunk_counts = [chunk_frames] * n_full + ([rem] if rem else [])
    if not chunk_counts:
        chunk_counts = [0]

    def build_moov(offsets):
        entry = (
            _s.pack(">I", 86)
            + b"jpeg"
            + b"\x00" * 6
            + _s.pack(">H", 1)  # data reference index
            + _s.pack(">HH", 0, 0)  # pre_defined/reserved
            + b"\x00" * 12  # pre_defined
            + _s.pack(">HH", width, height)
            + _s.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
            + _s.pack(">I", 0)
            + _s.pack(">H", 1)  # frame count per sample
            + b"\x00" * 32  # compressor name
            + _s.pack(">Hh", 24, -1)  # depth, color table id
        )
        stsd = _full_box(b"stsd", _s.pack(">I", 1) + entry)
        stts = _full_box(b"stts", _s.pack(">III", 1, n, 1))
        stsc_entries = [(1, chunk_frames)] if n_full else []
        if rem:
            stsc_entries.append((n_full + 1, rem))
        if not stsc_entries:
            stsc_entries = [(1, 0)]
        stsc = _full_box(
            b"stsc",
            _s.pack(">I", len(stsc_entries))
            + b"".join(
                _s.pack(">III", fc, spc, 1) for fc, spc in stsc_entries
            ),
        )
        stsz = _full_box(
            b"stsz",
            _s.pack(">II", 0, n)
            + b"".join(_s.pack(">I", s) for s in sizes),
        )
        stco = _full_box(
            b"stco",
            _s.pack(">I", len(offsets))
            + b"".join(_s.pack(">I", o) for o in offsets),
        )
        stbl = _mp4_box(b"stbl", stsd + stts + stsc + stsz + stco)
        vmhd = _full_box(
            b"vmhd", _s.pack(">HHHH", 0, 0, 0, 0), flags=1
        )
        dref = _full_box(
            b"dref", _s.pack(">I", 1) + _full_box(b"url ", b"", flags=1)
        )
        dinf = _mp4_box(b"dinf", dref)
        minf = _mp4_box(b"minf", vmhd + dinf + stbl)
        mdhd = _full_box(
            b"mdhd", _s.pack(">IIIIHH", 0, 0, fps, n, 0x55C4, 0)
        )
        hdlr = _full_box(
            b"hdlr", _s.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"\x00"
        )
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        dur = n * 1000 // fps if fps else 0
        tkhd = _full_box(
            b"tkhd",
            _s.pack(">II", 0, 0)
            + _s.pack(">I", 1)
            + b"\x00" * 4
            + _s.pack(">I", n)
            + b"\x00" * 8
            + _s.pack(">HHHH", 0, 0, 0, 0)
            + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + _s.pack(">II", width << 16, height << 16),
            flags=7,
        )
        mvhd = _full_box(
            b"mvhd",
            _s.pack(">IIII", 0, 0, 1000, dur)
            + _s.pack(">I", 0x00010000)
            + _s.pack(">H", 0x0100)
            + b"\x00" * 10
            + _s.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
            + b"\x00" * 24
            + _s.pack(">I", 2),
        )
        return _mp4_box(b"moov", mvhd + _mp4_box(b"trak", tkhd + mdia))

    ftyp = _mp4_box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2mp41")
    moov_len = len(build_moov([0] * len(chunk_counts)))
    base = len(ftyp) + moov_len + 8  # + mdat header
    offsets, fi = [], 0
    acc = 0
    for cc in chunk_counts:
        offsets.append(base + acc)
        acc += sum(sizes[fi : fi + cc])
        fi += cc
    return (
        ftyp + build_moov(offsets) + _mp4_box(b"mdat", b"".join(jpeg_frames))
    )


def _decode_wav(content: bytes) -> tuple[int, int, int, list[int]]:
    """Parse a PCM WAV payload via the stdlib ``wave`` module: returns
    (sample_rate, n_channels, n_frames, samples) with samples unpacked
    to SIGNED ints at every PCM width — 16/24/32-bit are little-endian
    signed as stored; 8-bit WAV is unsigned on the wire and comes back
    centered (v - 128), so silence is 0 at every width."""
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(content)) as w:
        sw = w.getsampwidth()
        rate, nch, nfr = w.getframerate(), w.getnchannels(), w.getnframes()
        raw = w.readframes(nfr)
    n = nfr * nch
    if sw == 2:
        samples = list(struct.unpack(f"<{n}h", raw))
    elif sw == 1:
        samples = [v - 128 for v in raw]
    elif sw == 4:
        samples = list(struct.unpack(f"<{n}i", raw))
    elif sw == 3:
        samples = [
            int.from_bytes(raw[3 * i : 3 * i + 3], "little", signed=True)
            for i in range(n)
        ]
    else:
        raise ValueError(f"bad WAV sample width {sw}")
    return rate, nch, nfr, samples


def _encode_ppm(
    width: int, height: int, pix: bytes, channels: int = 3,
    maxval: int = 255,
) -> bytes:
    """``maxval`` > 255 switches to the two-byte big-endian sample
    form; ``pix`` then carries 2 bytes per sample."""
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{width} {height}\n{maxval}\n".encode() + pix


def _encode_wav(
    rate: int, samples: list[int], sampwidth: int = 2, channels: int = 1
) -> bytes:
    """``samples`` are the SIGNED values `_decode_wav` returns
    (channel-interleaved when ``channels`` > 1); 8-bit re-offsets to
    the unsigned wire form."""
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 2:
            raw = struct.pack(f"<{len(samples)}h", *samples)
        elif sampwidth == 1:
            raw = bytes(v + 128 for v in samples)
        elif sampwidth == 4:
            raw = struct.pack(f"<{len(samples)}i", *samples)
        elif sampwidth == 3:
            raw = b"".join(
                v.to_bytes(3, "little", signed=True) for v in samples
            )
        else:
            raise ValueError(f"bad WAV sample width {sampwidth}")
        w.writeframes(raw)
    return buf.getvalue()


def _real_decode(content: bytes) -> tuple[int, str]:
    """decode_media's 'real' path: parse the payload with the matching
    zero-dependency codec and return (n_decoded_values, md5 of the
    decoded sample bytes) — a real parse, not the byte-level fake.
    Audio samples checksum in a canonical little-endian int32 form,
    independent of the on-wire PCM width (8/16/24/32-bit payloads of
    the same values hash identically — and 24/32-bit values cannot
    overflow the pack)."""
    import hashlib
    import struct

    if content and content[:2] in (b"P6", b"P5"):
        _, _, _, pix = _decode_ppm(content)
        return len(pix), hashlib.md5(pix).hexdigest()
    if content and content[:8] == _PNG_SIG:
        _, _, _, pix = _decode_png(content)
        return len(pix), hashlib.md5(pix).hexdigest()
    if content and content[:2] == b"\xFF\xD8":
        from dbscan_pyspark_spark.operators.jpeg import decode_jpeg

        _, _, _, pix = decode_jpeg(content)
        return len(pix), hashlib.md5(pix).hexdigest()
    if content and content[:4] == b"RIFF":
        _, _, _, samples = _decode_wav(content)
        raw = struct.pack(f"<{len(samples)}i", *samples)
        return len(samples), hashlib.md5(raw).hexdigest()
    if content and len(content) >= 12 and content[4:8] == b"ftyp":
        # real ISO-BMFF sample extraction: Motion-JPEG video tracks
        # decode frame-by-frame through the JPEG codec; uncompressed
        # PCM audio tracks unpack directly; inter-frame video and
        # compressed audio raise the ffmpeg plug point inside
        if _mp4_find_track(content, b"vide") is not None:
            _, _, frames = _mp4_mjpeg_frames(content)
            pix = b"".join(frames)
            return len(pix), hashlib.md5(pix).hexdigest()
        _, _, samples = _mp4_pcm_samples(content)
        raw = struct.pack(f"<{len(samples)}i", *samples)
        return len(samples), hashlib.md5(raw).hexdigest()
    raise NotImplementedError(
        "real decode supports binary PPM/PGM, PNG (8/16-bit, palette, "
        "Adam7), JPEG (baseline + progressive), PCM WAV, PCM-in-MP4, "
        "and Motion-JPEG-in-MP4; inter-frame MP4 video (H.264/AV1) "
        "and compressed audio (AAC) need PIL/ffmpeg, absent in this "
        "environment"
    )


def synth_real_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize a media table of REAL encoded payloads from any id
    column. Even ids become images (width 4+id%5, height 3+id%4),
    cycling four on-disk encodings by id%8 — 0: binary PPM (pixel
    byte j = (id*7+j)%256; 16-BIT two-byte samples when id%16==8,
    same high bytes with low byte (id*13+j)%256, so the oracle is
    depth-blind), 2: 8-bit RGB PNG (same pixels, row
    filters cycling 0..4), 4: 16-BIT grayscale PNG (sample j's high
    byte = (id*7+j)%256, low byte = (id*13+j)%256 — the decoder must
    recover the high bytes), 6: PALETTE PNG (16 entries, entry t
    channel c = (id*11+t*3+c)%256; pixel j's index = (id*7+j)%16,
    written ADAM7-INTERLACED, and BIT-PACKED at depth 4 when
    id%16==14 — the decoder must reassemble the passes, unpack the
    sub-byte indices, and expand them through PLTE; the decoded
    pixels are identical either way, so the oracle needs no
    interlace or depth arm). Odd ids become PCM
    WAV audio (rate 8000+(id%3)*4000, 50+id%30 samples, sample j =
    ((id*31+j*17) % 4096) - 2048; the PCM width cycles 16/24/32-bit
    by id%8 — values fit every width, so the oracle is width-blind).
    Every field is integer arithmetic
    on the id, so a SQL oracle can replay what the DECODERS must
    recover from the bytes — the contract that proves the parse."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def batches(it):
        import struct

        import pandas as pd

        for pdf in it:
            rows = {
                "media_id": [],
                "modality": [],
                "content": [],
                "mime": [],
                "meta": [],
            }
            for mid in pdf["media_id"]:
                mid = int(mid)
                if mid % 2 == 0:
                    w, h = 4 + mid % 5, 3 + mid % 4
                    m8 = mid % 8
                    if m8 == 2:
                        # PNG twin of the PPM recipe: same pixels, so
                        # the oracle's sum replays; row filters cycle
                        # 0..4 so every unfilter branch is exercised
                        pix = bytes(
                            (mid * 7 + j) % 256 for j in range(w * h * 3)
                        )
                        rows["content"].append(
                            _encode_png(
                                w, h, pix, 3, row_filters=[0, 1, 2, 3, 4]
                            )
                        )
                    elif m8 == 4:
                        # 16-bit grayscale: planted low bytes differ
                        # from the high bytes, so a decoder that
                        # slices the wrong half (or forgets the
                        # 2-byte filter offset) shifts the sum
                        pix16 = b"".join(
                            struct.pack(
                                ">H",
                                (((mid * 7 + j) % 256) << 8)
                                | ((mid * 13 + j) % 256),
                            )
                            for j in range(w * h)
                        )
                        rows["content"].append(
                            _encode_png(
                                w, h, pix16, 1,
                                row_filters=[0, 1, 2, 3, 4], depth=16,
                            )
                        )
                    elif m8 == 6:
                        # palette: the decoded values are PLTE entries,
                        # not indices — the oracle sums the expanded RGB
                        pal = [
                            tuple(
                                (mid * 11 + t * 3 + c) % 256
                                for c in range(3)
                            )
                            for t in range(16)
                        ]
                        idx = bytes(
                            (mid * 7 + j) % 16 for j in range(w * h)
                        )
                        # indices fit in 4 bits, so every other
                        # palette id is written BIT-PACKED (depth 4,
                        # still interlaced: per-pass packed strides) —
                        # decoded pixels are identical, so the oracle
                        # is depth-blind by construction
                        rows["content"].append(
                            _encode_png(
                                w, h, idx,
                                row_filters=[0, 1, 2, 3, 4], palette=pal,
                                interlace=True,
                                depth=4 if mid % 16 == 14 else 8,
                            )
                        )
                    else:  # m8 == 0
                        pix = bytes(
                            (mid * 7 + j) % 256 for j in range(w * h * 3)
                        )
                        if mid % 16 == 8:
                            # every other PPM id goes 16-BIT (maxval
                            # 65535, two-byte big-endian samples):
                            # planted high bytes are the same recipe,
                            # low bytes differ — the decoder must take
                            # the high half, so the oracle is
                            # depth-blind by construction
                            pix16 = b"".join(
                                bytes([v, (mid * 13 + j) % 256])
                                for j, v in enumerate(pix)
                            )
                            rows["content"].append(
                                _encode_ppm(w, h, pix16, maxval=65535)
                            )
                        else:
                            rows["content"].append(_encode_ppm(w, h, pix))
                    rows["modality"].append("image")
                    rows["mime"].append(
                        "image/png" if m8 in (2, 4, 6)
                        else "image/x-portable-pixmap"
                    )
                    rows["meta"].append(
                        {"width": w, "height": h, "duration_ms": None,
                         "sample_rate": None}
                    )
                else:
                    rate = 8000 + (mid % 3) * 4000
                    n = 50 + mid % 30
                    samples = [
                        ((mid * 31 + j * 17) % 4096) - 2048 for j in range(n)
                    ]
                    # PCM width cycles by id (16-bit default, 24-bit
                    # when id%8==7, 32-bit when id%8==3): the planted
                    # values fit every width, so the decoded samples —
                    # and with them the oracle — are width-blind
                    sw = {7: 3, 3: 4}.get(mid % 8, 2)
                    rows["content"].append(
                        _encode_wav(rate, samples, sampwidth=sw)
                    )
                    rows["modality"].append("audio")
                    rows["mime"].append("audio/wav")
                    rows["meta"].append(
                        {"width": None, "height": None,
                         "duration_ms": n * 1000 // rate,
                         "sample_rate": rate}
                    )
                rows["media_id"].append(mid)
            yield pd.DataFrame(rows)

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


def synth_mjpeg_media(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Synthesize REAL Motion-JPEG MP4 videos from any id column: for
    each id, ``2 + id%4`` frames of ``8*(1+id%3) x 8*(1+id%2)`` RGB
    pixels (frame f value j = ``(id*13 + f*29 + j) % 256``), each
    frame baseline-JPEG-encoded at id-cycled chroma subsampling
    (4:4:4/4:2:2/4:2:0 by id%3) and boxed into an ISO-BMFF container
    with a 'jpeg' visual sample entry and a full chunked sample table.
    Dims and frame counts are id arithmetic a SQL oracle replays; the
    (lossy) pixel VALUES are pinned by unit tests against standalone
    ``decode_jpeg`` of the same frames."""
    ids = df.select(F.col(id_col).cast("long").alias("media_id"))

    def batches(it):
        import pandas as pd

        from dbscan_pyspark_spark.operators.jpeg import encode_jpeg

        try:  # vectorized frame synthesis (exact same bytes)
            import numpy as np
        except ImportError:
            np = None

        for pdf in it:
            rows = {
                "media_id": [],
                "modality": [],
                "content": [],
                "mime": [],
                "meta": [],
            }
            for mid in pdf["media_id"]:
                mid = int(mid)
                w, h = 8 * (1 + mid % 3), 8 * (1 + mid % 2)
                n_frames = 2 + mid % 4
                # chroma subsampling cycles by id, so the contract
                # query decodes real 4:2:2/4:2:0 MCU layouts too —
                # the summary fields are full-res geometry either way
                sub = ("4:4:4", "4:2:2", "4:2:0")[mid % 3]
                if np is not None:
                    # (base + j) % 256 == (mid*13 + f*29 + j) % 256:
                    # identical bytes, no per-value Python loop
                    ramp = np.arange(w * h * 3, dtype=np.int64)
                    frame_pix = [
                        (
                            ((mid * 13 + f * 29) % 256 + ramp) % 256
                        ).astype(np.uint8).tobytes()
                        for f in range(n_frames)
                    ]
                else:
                    frame_pix = [
                        bytes(
                            (mid * 13 + f * 29 + j) % 256
                            for j in range(w * h * 3)
                        )
                        for f in range(n_frames)
                    ]
                frames = [
                    encode_jpeg(w, h, pix_f, 3, subsampling=sub)
                    for pix_f in frame_pix
                ]
                rows["media_id"].append(mid)
                rows["modality"].append("video")
                rows["content"].append(
                    bytearray(
                        _encode_mp4_mjpeg(frames, w, h, chunk_frames=3)
                    )
                )
                rows["mime"].append("video/mp4")
                rows["meta"].append(
                    {
                        "width": w,
                        "height": h,
                        "duration_ms": n_frames * 100,
                        "sample_rate": None,
                    }
                )
            yield pd.DataFrame(rows)

    return ids.mapInPandas(batches, schema=MEDIA_SCHEMA)


def mjpeg_video_summary(df: DataFrame) -> DataFrame:
    """Per-video structural summary via REAL sample decode: walk each
    MP4's 'vide' sample table, decode every Motion-JPEG frame through
    the zero-dependency JPEG codec, and emit
    ``(media_id, width, height, n_frames, n_vals)`` where ``n_vals``
    counts the decoded pixel values — all integer facts a SQL oracle
    replays from the synthesis recipe, so a hash match proves the
    container walk found every sample AND every frame decoded to the
    declared geometry. Arrow-batched, one row per video, no shuffle."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = {
                k: []
                for k in ("media_id", "width", "height", "n_frames", "n_vals")
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                w, h, frames = _mp4_mjpeg_frames(bytes(content))
                out["media_id"].append(mid)
                out["width"].append(w)
                out["height"].append(h)
                out["n_frames"].append(len(frames))
                out["n_vals"].append(sum(len(p) for p in frames))
            yield pd.DataFrame(out)

    return df.mapInPandas(
        batches,
        schema="media_id long, width int, height int, "
        "n_frames int, n_vals long",
    )


_DIMENSION_FIELDS = (
    "media_id long, fmt string, width int, height int, "
    "sample_rate int, n_vals long, sum_vals long"
)


def media_dimensions(df: DataFrame) -> DataFrame:
    """REAL typed extraction: parse each payload with the matching
    zero-dependency codec and emit its recovered dimensions plus the
    exact integer sum of decoded values — header fields prove the
    header parse, ``sum_vals`` proves the payload decode (any
    mis-slice shifts the sum). Arrow-batched, one row per media row,
    no shuffle."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = {k: [] for k in (
                "media_id", "fmt", "width", "height", "sample_rate",
                "n_vals", "sum_vals",
            )}
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                if content is not None and content[:2] in (b"P6", b"P5"):
                    w, h, ch, pix = _decode_ppm(bytes(content))
                    out["fmt"].append("ppm")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(None)
                    out["n_vals"].append(len(pix))
                    out["sum_vals"].append(sum(pix))
                elif content is not None and bytes(content[:8]) == _PNG_SIG:
                    w, h, ch, pix = _decode_png(bytes(content))
                    out["fmt"].append("png")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(None)
                    out["n_vals"].append(len(pix))
                    out["sum_vals"].append(sum(pix))
                elif content is not None and bytes(content[:2]) == b"\xFF\xD8":
                    from dbscan_pyspark_spark.operators.jpeg import (
                        decode_jpeg,
                    )

                    w, h, ch, pix = decode_jpeg(bytes(content))
                    out["fmt"].append("jpeg")
                    out["width"].append(w)
                    out["height"].append(h)
                    out["sample_rate"].append(None)
                    out["n_vals"].append(len(pix))
                    out["sum_vals"].append(sum(pix))
                elif (
                    content is not None
                    and len(content) >= 12
                    and bytes(content[4:8]) == b"ftyp"
                ):
                    # REAL container-metadata parse (mvhd/tkhd box
                    # walk). Motion-JPEG video tracks decode frame by
                    # frame through the JPEG codec (n_vals/sum_vals =
                    # exact decoded pixel count/sum); uncompressed
                    # ('twos'/'sowt') audio tracks walk the sample
                    # table for the exact PCM sample count/sum (the
                    # WAV discipline); otherwise n_vals is the track
                    # count and sum_vals the container duration in ms
                    # — inter-frame video / compressed audio stay the
                    # ffmpeg plug point.
                    dur, n_tracks, w, h = _parse_mp4_meta(bytes(content))
                    out["fmt"].append("mp4")
                    try:
                        fw, fh, frames = _mp4_mjpeg_frames(bytes(content))
                        out["width"].append(fw)
                        out["height"].append(fh)
                        out["sample_rate"].append(None)
                        out["n_vals"].append(
                            sum(len(p) for p in frames)
                        )
                        out["sum_vals"].append(
                            sum(v for p in frames for v in p)
                        )
                        out["media_id"].append(mid)
                        continue
                    except NotImplementedError:
                        pass
                    out["width"].append(w)
                    out["height"].append(h)
                    try:
                        rate, _ch, samples = _mp4_pcm_samples(
                            bytes(content)
                        )
                        out["sample_rate"].append(rate)
                        out["n_vals"].append(len(samples))
                        out["sum_vals"].append(sum(samples))
                    except NotImplementedError:
                        out["sample_rate"].append(None)
                        out["n_vals"].append(n_tracks)
                        out["sum_vals"].append(dur)
                elif content is not None and content[:4] == b"RIFF":
                    rate, nch, nfr, samples = _decode_wav(bytes(content))
                    out["fmt"].append("wav")
                    out["width"].append(None)
                    out["height"].append(None)
                    out["sample_rate"].append(rate)
                    out["n_vals"].append(len(samples))
                    out["sum_vals"].append(sum(samples))
                else:
                    raise NotImplementedError(
                        "media_dimensions supports PPM/PGM, PNG, baseline "
                        "JPEG, PCM WAV, and MP4 container metadata"
                    )
                out["media_id"].append(mid)
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=_DIMENSION_FIELDS)


def decode_media(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """Decode stage: binary -> (n_bytes, checksum) per media row.

    Arrow-batched; one output row per input row. 'real' mode is the
    PIL/soundfile/ffmpeg plug point (NotImplementedError here)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            if decode_mode == "real":
                # genuine parses for PPM/PGM + PCM WAV; raises the
                # PIL/ffmpeg plug-point error for compressed formats
                decoded = [
                    _real_decode(bytes(c) if c is not None else b"")
                    for c in pdf["content"]
                ]
            else:
                decoded = [_fake_decode(c) for c in pdf["content"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "n_bytes": [d[0] for d in decoded],
                    "checksum": [d[1] for d in decoded],
                }
            )

    return df.mapInPandas(batches, schema=_DECODED_FIELDS)


def extract_features(df: DataFrame, dim: int = 16, decode_mode: str = "fake") -> DataFrame:
    """Feature-extraction stage: binary -> float vector of ``dim``.

    Fake mode: deterministic bytes-histogram features (so downstream
    similarity search is exercisable); real mode = model plug point."""

    def batches(it):
        import numpy as np
        import pandas as pd

        for pdf in it:
            if decode_mode == "real":
                raise NotImplementedError("real feature extraction needs a model runtime")
            feats = []
            for c in pdf["content"]:
                b = np.frombuffer(c or b"\x00", dtype=np.uint8)
                hist, _ = np.histogram(b, bins=dim, range=(0, 256))
                denom = max(len(b), 1)
                feats.append((hist / denom).astype("float32"))
            yield pd.DataFrame({"media_id": pdf["media_id"], "feature": feats})

    return df.mapInPandas(batches, schema=_FEATURE_FIELDS)


def sample_frames(df: DataFrame, every_ms: int = 1000, max_frames: int = 8,
                  decode_mode: str = "fake") -> DataFrame:
    """Frame-sampling stage (video): one row per sampled frame (1->N).

    Fake mode slices the payload deterministically. Real mode walks a
    Motion-JPEG MP4's sample table: each target instant (multiples of
    ``every_ms``, up to ``max_frames``) resolves to the frame displayed
    then (last stts start <= target) and emits that sample's actual
    JPEG payload at its true start offset — container-accurate timing,
    no codec needed; inter-frame codecs (avc1/...) raise the ffmpeg
    plug point. Output partitioning follows the input — no shuffle."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            out = {"media_id": [], "frame_index": [], "frame_offset_ms": [], "frame": []}
            if decode_mode == "real":
                # REAL frame sampling for Motion-JPEG MP4s: resolve
                # each target instant (0, every_ms, 2*every_ms, ...)
                # to the frame DISPLAYED then — the last sample whose
                # stts start time <= target — and emit that sample's
                # actual JPEG payload with its true start offset.
                # Consecutive targets inside one frame period emit the
                # same frame (that is what's on screen); inter-frame
                # codecs raise the ffmpeg plug point inside the track
                # check.
                for mid, content, _meta in zip(
                    pdf["media_id"], pdf["content"], pdf["meta"]
                ):
                    content = bytes(content or b"")
                    track = (
                        _mp4_find_track(content, b"vide")
                        if len(content) >= 12 and content[4:8] == b"ftyp"
                        else None
                    )
                    if track is None:
                        raise NotImplementedError(
                            "real frame sampling decodes Motion-JPEG "
                            "MP4 video tracks; other containers need "
                            "ffmpeg"
                        )
                    fmt, _so, boxes, timescale = track
                    if fmt not in (b"jpeg", b"mjpa"):
                        raise NotImplementedError(
                            f"MP4 video sample entry {fmt!r} needs "
                            "ffmpeg; only Motion-JPEG samples here"
                        )
                    samples = _mp4_extract_samples(content, boxes)
                    starts = _mp4_sample_times(content, boxes)
                    if not samples:  # empty track: no frames to emit
                        continue
                    times_ms = [
                        t * 1000 // max(timescale, 1) for t in starts
                    ]
                    for i in range(max_frames):
                        target = i * every_ms
                        # last frame started at or before the target
                        fi = 0
                        for s, t in enumerate(times_ms):
                            if t <= target:
                                fi = s
                            else:
                                break
                        if i > 0 and target > times_ms[-1]:
                            break  # past the last frame's start
                        out["media_id"].append(mid)
                        out["frame_index"].append(i)
                        out["frame_offset_ms"].append(times_ms[fi])
                        out["frame"].append(samples[fi])
                yield pd.DataFrame(out)
                continue
            for mid, content, meta in zip(pdf["media_id"], pdf["content"], pdf["meta"]):
                dur = int(meta["duration_ms"] or 0) if meta is not None else 0
                n = min(max(dur // every_ms, 1), max_frames)
                payload = content or b""
                step = max(len(payload) // max(n, 1), 1)
                for i in range(n):
                    out["media_id"].append(mid)
                    out["frame_index"].append(i)
                    out["frame_offset_ms"].append(i * every_ms)
                    out["frame"].append(payload[i * step : i * step + step])
            yield pd.DataFrame(out)

    return df.mapInPandas(batches, schema=_FRAME_FIELDS)


_RESIZED_FIELDS = (
    "media_id long, modality string, content binary, mime string, "
    "meta struct<width:int,height:int,duration_ms:bigint,sample_rate:int>"
)


def resize_media(
    df: DataFrame, width: int = 32, height: int = 32, decode_mode: str = "fake"
) -> DataFrame:
    """Resize stage (image): binary -> binary at (width, height), meta
    updated. Output schema equals the input media schema, so stages
    compose (resize |> extract_features |> ...).

    Fake mode derives a deterministic ``width*height``-byte payload by
    striding the source bytes (shape-true: downstream stages see the
    new byte count and meta). Real mode genuinely resizes binary
    PPM/PGM payloads — nearest-neighbor resample of the decoded
    pixels, re-encoded as a valid Netpbm image whose header carries
    the new dimensions — and raises the PIL plug-point error for
    compressed formats."""

    def batches(it):
        import pandas as pd

        target = width * height
        for pdf in it:
            contents, metas = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                if decode_mode == "real":
                    src = bytes(content) if content is not None else b""
                    fmt = None
                    if src[:2] in (b"P6", b"P5"):
                        sw, sh, ch, pix = _decode_ppm(src)
                        fmt = "ppm"
                    elif src[:8] == _PNG_SIG:
                        sw, sh, ch, pix = _decode_png(src)
                        fmt = "png"
                    elif src[:2] == b"\xFF\xD8":
                        from dbscan_pyspark_spark.operators.jpeg import (
                            decode_jpeg,
                        )

                        sw, sh, ch, pix = decode_jpeg(src)
                        fmt = "jpeg"
                    else:
                        raise NotImplementedError(
                            "real resize supports binary PPM/PGM, PNG, "
                            "and baseline JPEG; other formats need PIL"
                        )
                    resized = bytearray()
                    for y in range(height):
                        sy = y * sh // height
                        for x in range(width):
                            sx = x * sw // width
                            o = (sy * sw + sx) * ch
                            resized += pix[o : o + ch]
                    if fmt == "png":
                        enc = _encode_png(width, height, bytes(resized), ch)
                    elif fmt == "jpeg":
                        from dbscan_pyspark_spark.operators.jpeg import (
                            encode_jpeg,
                        )

                        enc = encode_jpeg(
                            width, height, bytes(resized), ch, quality=90
                        )
                    else:
                        enc = _encode_ppm(width, height, bytes(resized), ch)
                    contents.append(enc)
                else:
                    payload = content or b"\x00"
                    step = max(len(payload) // target, 1)
                    contents.append(
                        (payload * (target // len(payload) + 1))[::step][:target]
                    )
                meta = dict(meta) if meta is not None else {}
                meta["width"], meta["height"] = width, height
                metas.append(meta)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "content": contents,
                    "mime": pdf["mime"],
                    "meta": metas,
                }
            )

    return df.mapInPandas(batches, schema=_RESIZED_FIELDS)


def media_stats(df: DataFrame) -> DataFrame:
    """Metadata-only rollup — projects the binary column away BEFORE the
    shuffle, which is the pattern every wide op over media tables must
    follow (payloads ride narrow stages only)."""
    return (
        df.select("media_id", "modality", F.length("content").alias("n_bytes"))
        .groupBy("modality")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.round(F.avg("n_bytes"), 4).alias("avg_bytes"),
        )
    )
