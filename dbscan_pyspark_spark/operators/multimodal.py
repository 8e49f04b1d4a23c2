"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata, with decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages (north-star extension).

The Spark-side plumbing — schemas, batch iteration, partitioning-safe
signatures — is real and tested. The codec calls themselves are STUBS
(this container ships no image/audio libraries): ``decode_mode='fake'``
produces a deterministic synthetic decode from the bytes so the
pipeline shape is exercisable end-to-end; ``decode_mode='real'`` raises
``NotImplementedError`` at the exact call site where PIL/ffmpeg would
plug in.

Scale notes: mapInPandas streams Arrow batches — constant memory per
task regardless of partition size; binary payloads never pass through a
shuffle (metadata-only projections before any wide operation); feature
vectors come back as plain ``array<float>`` columns that feed the
similarity operators (operators/similarity.py) directly.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

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


def decode_media(df: DataFrame, decode_mode: str = "fake") -> DataFrame:
    """Decode stage: binary -> (n_bytes, checksum) per media row.

    Arrow-batched; one output row per input row. 'real' mode is the
    PIL/soundfile/ffmpeg plug point (NotImplementedError here)."""

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        for pdf in it:
            if decode_mode == "real":
                raise NotImplementedError(
                    "real media decoding requires PIL/soundfile/ffmpeg; "
                    "not available in this environment"
                )
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

    Fake mode slices the payload deterministically; real mode = ffmpeg
    plug point. Output partitioning follows the input — no shuffle."""

    def batches(it):
        import pandas as pd

        for pdf in it:
            if decode_mode == "real":
                raise NotImplementedError("real frame sampling needs ffmpeg")
            out = {"media_id": [], "frame_index": [], "frame_offset_ms": [], "frame": []}
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
    new byte count and meta); real mode is the PIL plug point."""

    def batches(it):
        import pandas as pd

        target = width * height
        for pdf in it:
            if decode_mode == "real":
                raise NotImplementedError("real image resizing requires PIL")
            contents, metas = [], []
            for content, meta in zip(pdf["content"], pdf["meta"]):
                payload = content or b"\x00"
                step = max(len(payload) // target, 1)
                contents.append((payload * (target // len(payload) + 1))[::step][:target])
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
