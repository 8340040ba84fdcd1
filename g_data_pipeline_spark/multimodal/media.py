"""Multimodal (image/audio/video) column plumbing.

Pattern: media are opaque ``binary`` columns with typed metadata; all
decode / feature-extract / resize / frame-sample operators are
``mapInPandas`` transforms — Arrow-batched, partition-parallel, constant
driver memory. This file makes the SPARK side real (schemas, batch
iteration, partitioning, output contracts) while the codec layer is
swappable:

- Real codecs (PIL / soundfile / av) are NOT installed in this
  environment; ``_require_pil()`` raises a clearly-marked
  NotImplementedError where they would plug in.
- A deterministic FAKE codec ("FIMG"/"FVID" containers, documented below)
  exercises every pipeline end-to-end in tests with byte-exact
  expectations.

Scale notes: mapInPandas streams Arrow record batches — peak memory per
task is one batch (cap via ``spark.sql.execution.arrow.maxRecordsPerBatch``
when rows carry megabyte blobs); repartition upstream by size, not count,
when media sizes are skewed. Feature outputs are plain numeric columns, so
everything downstream (dedup on embeddings, quality filtering, joins)
reuses the normal relational operators.

FAKE container formats (big-endian u16 fields):

    FIMG: b"FIMG" | width u16 | height u16 | width*height luma bytes
    FVID: b"FVID" | n_frames u16 | width u16 | height u16
          | n_frames frames, each width*height luma bytes
"""

from __future__ import annotations

import struct
from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_FIELDS = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("content", T.BinaryType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("max_luma", T.IntegerType()),
    ]
)


def _require_pil() -> Any:
    """The real-codec plug point (PIL not present in this environment)."""
    try:
        import PIL.Image  # noqa: F401

        return PIL.Image
    except ImportError as exc:  # pragma: no cover - env without PIL
        raise NotImplementedError(
            "real image decoding requires Pillow, which is not installed in "
            "this environment; use codec='fake' (FIMG container) or install "
            "Pillow and pass codec='pil'"
        ) from exc


def _image_decoder(codec: str):
    """Return an executor-side ``bytes -> (width, height, luma_bytes)``
    decoder. ``codec='fake'`` parses the FIMG container; ``codec='pil'``
    decodes any real image format via Pillow (grayscale-converted so the
    downstream luma-stat contract is identical) — installing Pillow flips
    the whole pipeline from fake to real with zero code change. Validated
    driver-side by ``_require_pil`` so a missing library fails at plan time
    with a clear message, not per-task on the executors."""
    if codec == "fake":
        return _decode_fake_image
    if codec == "pil":

        def decode(content: bytes) -> tuple[int, int, bytes]:
            import io

            import PIL.Image

            img = PIL.Image.open(io.BytesIO(content)).convert("L")
            w, h = img.size
            return w, h, img.tobytes()

        return decode
    raise ValueError(f"unknown image codec {codec!r} (use 'fake' or 'pil')")


# ---- fake codec ----------------------------------------------------------

def encode_fake_image(width: int, height: int, pixels: bytes) -> bytes:
    assert len(pixels) == width * height
    return b"FIMG" + struct.pack(">HH", width, height) + pixels


def encode_fake_video(width: int, height: int, frames: list[bytes]) -> bytes:
    assert all(len(f) == width * height for f in frames)
    return (
        b"FVID"
        + struct.pack(">HHH", len(frames), width, height)
        + b"".join(frames)
    )


def _decode_fake_image(content: bytes) -> tuple[int, int, bytes]:
    if content[:4] != b"FIMG":
        raise ValueError("not a FIMG container")
    w, h = struct.unpack(">HH", content[4:8])
    return w, h, content[8 : 8 + w * h]


def _decode_fake_video(content: bytes) -> tuple[int, int, int, list[bytes]]:
    if content[:4] != b"FVID":
        raise ValueError("not a FVID container")
    n, w, h = struct.unpack(">HHH", content[4:10])
    sz = w * h
    frames = [content[10 + i * sz : 10 + (i + 1) * sz] for i in range(n)]
    return n, w, h, frames


# ---- synthetic media generation (executor-side) --------------------------

def synthetic_images(
    df: DataFrame, id_col: str, media_type: str = "image"
) -> DataFrame:
    """(id) -> (media_id, media_type, content FIMG blob), generated
    deterministically from the id ON THE EXECUTORS via mapInPandas — the
    binary column never exists driver-side, so the pattern scales to any
    corpus size. Dimensions/pixels are pure functions of the id."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 4 + mid % 13, 3 + mid % 7
                px = bytes((mid * 31 + i) % 256 for i in range(w * h))
                ids.append(mid)
                blobs.append(encode_fake_image(w, h, px))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": media_type, "content": blobs}
            )

    return df.select(id_col).mapInPandas(batches, MEDIA_FIELDS)


def synthetic_videos(df: DataFrame, id_col: str) -> DataFrame:
    """(id) -> (media_id, media_type, content FVID blob) with
    2 + id % 5 frames, each a deterministic function of (id, frame_idx)."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                w, h = 3 + mid % 5, 2 + mid % 4
                frames = [
                    bytes((mid * 17 + f * 7 + i) % 256 for i in range(w * h))
                    for f in range(2 + mid % 5)
                ]
                ids.append(mid)
                blobs.append(encode_fake_video(w, h, frames))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "video", "content": blobs}
            )

    return df.select(id_col).mapInPandas(batches, MEDIA_FIELDS)


# ---- operators -----------------------------------------------------------

def decode_image_features(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """binary -> per-image features (dims + luma stats) via mapInPandas."""
    if codec == "pil":
        _require_pil()
    decode = _image_decoder(codec)

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, px = decode(bytes(content))
                arr = np.frombuffer(px, dtype=np.uint8)
                out.append(
                    (int(mid), w, h, float(arr.mean()) if arr.size else None,
                     int(arr.max()) if arr.size else None)
                )
            yield pd.DataFrame(
                out, columns=["media_id", "width", "height", "mean_luma", "max_luma"]
            )

    return df.select(id_col, content_col).mapInPandas(batches, FEATURE_SCHEMA)


def resize_images(
    df: DataFrame,
    out_width: int,
    out_height: int,
    id_col: str = "media_id",
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """Nearest-neighbor resize, re-encoded into the FIMG container —
    the shape of any re-encode pipeline (decode -> transform -> encode)."""
    if codec == "pil":
        _require_pil()
    decode = _image_decoder(codec)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, blobs = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, px = decode(bytes(content))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(out_height) * h // out_height).clip(0, h - 1)
                xs = (np.arange(out_width) * w // out_width).clip(0, w - 1)
                resized = arr[np.ix_(ys, xs)]
                ids.append(int(mid))
                blobs.append(
                    encode_fake_image(out_width, out_height, resized.tobytes())
                )
            yield pd.DataFrame({"media_id": ids, "content": blobs})

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def frame_sample(
    df: DataFrame,
    every_k: int = 2,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """video binary -> one row per sampled frame (frame_idx, frame FIMG
    blob) — the explode-shaped media op (output rows > input rows)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame", T.BinaryType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                n, w, h, frames = _decode_fake_video(bytes(content))
                for i in range(0, n, every_k):
                    rows.append(
                        (int(mid), i, encode_fake_image(w, h, frames[i]))
                    )
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame"])

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def video_frame_stats(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
) -> DataFrame:
    """Per-video frame count + overall luma mean (a reduce-shaped media op)."""
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("n_frames", T.IntegerType()),
            T.StructField("mean_luma", T.DoubleType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            rows = []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                n, w, h, frames = _decode_fake_video(bytes(content))
                arr = np.frombuffer(b"".join(frames), dtype=np.uint8)
                rows.append(
                    (int(mid), n, float(arr.mean()) if arr.size else None)
                )
            yield pd.DataFrame(rows, columns=["media_id", "n_frames", "mean_luma"])

    return df.select(id_col, content_col).mapInPandas(batches, schema)


# ---- audio ----------------------------------------------------------------
#
#     FAUD: b"FAUD" | sample_rate u16 | n_samples u16
#           | n_samples signed-byte PCM samples
#
# Same contract as FIMG/FVID: real decoding (soundfile / librosa / av) is a
# plug point behind _require_audio_codec(); the FAUD container exercises the
# full Spark-side pipeline deterministically.

def _require_audio_codec() -> Any:
    """The real-codec plug point (soundfile/librosa not in this env)."""
    try:
        import soundfile  # noqa: F401

        return soundfile
    except ImportError as exc:  # pragma: no cover - env without soundfile
        raise NotImplementedError(
            "real audio decoding requires soundfile/librosa, not installed "
            "in this environment; use codec='fake' (FAUD container)"
        ) from exc


def encode_fake_audio(sample_rate: int, samples: bytes) -> bytes:
    return b"FAUD" + struct.pack(">HH", sample_rate, len(samples)) + samples


def _decode_fake_audio(content: bytes) -> tuple[int, bytes]:
    if content[:4] != b"FAUD":
        raise ValueError("not a FAUD container")
    rate, n = struct.unpack(">HH", content[4:8])
    return rate, content[8 : 8 + n]


def synthetic_audio(df: DataFrame, id_col: str) -> DataFrame:
    """(id) -> (media_id, media_type, content FAUD blob); rate and PCM are
    pure functions of the id, generated executor-side via mapInPandas."""

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, blobs = [], []
            for mid in pdf[id_col]:
                mid = int(mid)
                rate = 8000 + (mid % 3) * 4000
                n = 32 + mid % 50
                pcm = bytes((mid * 37 + i * 11) % 256 for i in range(n))
                ids.append(mid)
                blobs.append(encode_fake_audio(rate, pcm))
            yield pd.DataFrame(
                {"media_id": ids, "media_type": "audio", "content": blobs}
            )

    return df.select(id_col).mapInPandas(batches, MEDIA_FIELDS)


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.IntegerType()),
    ]
)


def decode_audio_features(media: DataFrame, codec: str = "fake") -> DataFrame:
    """binary -> per-clip features (rate, length, duration, RMS of the
    signed PCM, peak magnitude) via mapInPandas — the audio twin of
    decode_image_features."""
    if codec != "fake":
        _require_audio_codec()

    def batches(it: Iterator) -> Iterator:
        import math

        import numpy as np
        import pandas as pd

        for pdf in it:
            out: dict[str, list] = {
                k.name: [] for k in AUDIO_FEATURE_SCHEMA.fields
            }
            for mid, content in zip(pdf["media_id"], pdf["content"]):
                rate, pcm = _decode_fake_audio(bytes(content))
                # Vectorized per-sample math (r10 guide §4.2) — exact
                # twin of the per-byte Python loop: the squared sum is
                # integer (int64, no rounding), the final sqrt/div are
                # the same scalar float ops.
                arr = np.frombuffer(pcm, dtype=np.uint8).astype(np.int64)
                signed = arr - (arr >= 128) * 256
                out["media_id"].append(int(mid))
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(pcm))
                out["duration_s"].append(len(pcm) / rate)
                out["rms"].append(
                    math.sqrt(int(np.dot(signed, signed)) / len(pcm))
                    if len(pcm)
                    else 0.0
                )
                out["peak"].append(
                    int(np.abs(signed).max()) if len(pcm) else 0
                )
            yield pd.DataFrame(out)

    return media.mapInPandas(batches, AUDIO_FEATURE_SCHEMA)


def image_phash(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """Perceptual average-hash per image -> (media_id, phash int64).

    The aHash recipe: decode -> nearest-neighbor downsample to 8x8 luma ->
    threshold each cell against the 8x8 mean -> pack the 64 bits into one
    BIGINT. Byte-identical images always collide; small re-encodes/resizes
    usually do (the downsample discards exactly the detail they change).
    Arrow-batched mapInPandas (numpy per batch); the hash output is a plain
    integer column, so downstream dedup is ordinary relational groupBy —
    the multimodal twin of text fingerprint_dedup.
    """
    if codec == "pil":
        _require_pil()
    decode = _image_decoder(codec)
    schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("phash", T.LongType()),
        ]
    )

    def batches(it: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in it:
            ids, hashes = [], []
            for mid, content in zip(pdf[id_col], pdf[content_col]):
                w, h, px = decode(bytes(content))
                arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
                ys = (np.arange(8) * h // 8).clip(0, h - 1)
                xs = (np.arange(8) * w // 8).clip(0, w - 1)
                small = arr[np.ix_(ys, xs)].astype(np.float64)
                bits = (small >= small.mean()).flatten()
                val = 0
                for b in bits:
                    val = (val << 1) | int(b)
                # map to signed int64 (top bit set -> negative)
                if val >= 1 << 63:
                    val -= 1 << 64
                ids.append(int(mid))
                hashes.append(val)
            yield pd.DataFrame({"media_id": ids, "phash": hashes})

    return df.select(id_col, content_col).mapInPandas(batches, schema)


def image_phash_dedup(
    media: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """Perceptual image dedup: one survivor (MIN id) per phash bucket ->
    (media_id, phash, n_copies). The hash is computed once per image
    (mapInPandas); survivor choice is the standard WindowGroupLimit-pruned
    rank keyed on the hash — identical scale shape to exact_dedup."""
    from pyspark.sql import Window

    hashed = image_phash(media, id_col, content_col, codec)
    w = Window.partitionBy("phash").orderBy(id_col)
    return (
        hashed.withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "n_copies", F.count(F.lit(1)).over(Window.partitionBy("phash"))
        )
        .filter(F.col("__rn") == 1)
        .select(id_col, "phash", F.col("n_copies").cast("long"))
    )
