"""Multimodal plumbing tests: the fake-codec pipelines exercise real
mapInPandas schemas, Arrow batching, and explode/reduce output shapes with
byte-exact expectations; the real-codec path raises the documented stub."""

from __future__ import annotations

import pytest

from g_data_pipeline_spark.multimodal import (
    decode_image_features,
    encode_fake_image,
    encode_fake_video,
    frame_sample,
    resize_images,
    video_frame_stats,
)
from g_data_pipeline_spark.multimodal.media import _decode_fake_image


@pytest.fixture(scope="module")
def images(spark):
    rows = [
        (1, "image", encode_fake_image(4, 2, bytes([0, 50, 100, 150, 200, 250, 10, 20]))),
        (2, "image", encode_fake_image(2, 2, bytes([255, 255, 0, 0]))),
    ]
    return spark.createDataFrame(rows, "media_id long, media_type string, content binary")


@pytest.fixture(scope="module")
def videos(spark):
    frames = [bytes([i] * 6) for i in (10, 20, 30, 40, 50)]
    rows = [(7, "video", encode_fake_video(3, 2, frames))]
    return spark.createDataFrame(rows, "media_id long, media_type string, content binary")


def test_decode_image_features(images):
    got = {r.media_id: r for r in decode_image_features(images).collect()}
    assert (got[1].width, got[1].height) == (4, 2)
    assert got[1].mean_luma == pytest.approx(sum([0, 50, 100, 150, 200, 250, 10, 20]) / 8)
    assert got[2].max_luma == 255


def test_resize_images_byte_exact(images):
    out = {r.media_id: bytes(r.content) for r in resize_images(images, 2, 1).collect()}
    w, h, px = _decode_fake_image(out[1])
    # nearest-neighbor: rows [0], cols [0, 2] of the 4x2 image
    assert (w, h) == (2, 1)
    assert px == bytes([0, 100])


def test_frame_sample_explodes(videos):
    rows = frame_sample(videos, every_k=2).collect()
    assert [(r.media_id, r.frame_idx) for r in rows] == [(7, 0), (7, 2), (7, 4)]
    w, h, px = _decode_fake_image(bytes(rows[1].frame))
    assert px == bytes([30] * 6)


def test_video_frame_stats(videos):
    r = video_frame_stats(videos).collect()[0]
    assert r.n_frames == 5
    assert r.mean_luma == pytest.approx(30.0)


def test_real_codec_is_marked_stub(images):
    with pytest.raises(NotImplementedError, match="Pillow"):
        decode_image_features(images, codec="pil")


def test_corrupt_container_fails_loudly(spark):
    df = spark.createDataFrame(
        [(9, "image", b"NOPE")], "media_id long, media_type string, content binary"
    )
    with pytest.raises(Exception, match="FIMG|PythonException"):
        decode_image_features(df).collect()


def test_audio_features_exact(spark):
    """FAUD decode: rate/length/duration/RMS/peak must match a pure-Python
    recomputation from the same deterministic generator."""
    import math

    from g_data_pipeline_spark.multimodal.media import (
        decode_audio_features,
        synthetic_audio,
    )

    base = spark.range(0, 40).withColumnRenamed("id", "doc_id")
    got = {
        r.media_id: r
        for r in decode_audio_features(synthetic_audio(base, "doc_id")).collect()
    }
    assert len(got) == 40
    for mid in range(40):
        rate = 8000 + (mid % 3) * 4000
        n = 32 + mid % 50
        pcm = [(mid * 37 + i * 11) % 256 for i in range(n)]
        signed = [b - 256 if b >= 128 else b for b in pcm]
        r = got[mid]
        assert r.sample_rate == rate and r.n_samples == n
        assert r.duration_s == n / rate
        assert r.rms == pytest.approx(
            math.sqrt(sum(s * s for s in signed) / n), rel=1e-12
        )
        assert r.peak == max(abs(s) for s in signed)


def test_audio_real_codec_is_declared_plug_point():
    from g_data_pipeline_spark.multimodal.media import _require_audio_codec

    with pytest.raises(NotImplementedError):
        _require_audio_codec()


def test_image_phash_dedup_collapses_planted_copies(spark):
    """Byte-identical planted copies MUST share their original's phash and
    lose the MIN-id survivor rank. Distinct synthetic images may also
    collide (they are smooth ramps — exactly the near-uniform content
    aHash is designed to bucket together), so the invariants are
    group-level: survivors are originals, group sizes account for every
    row, survivor = MIN id of its group."""
    from pyspark.sql import functions as F

    from g_data_pipeline_spark.multimodal.media import (
        image_phash,
        image_phash_dedup,
        synthetic_images,
    )

    base = spark.range(60).select(F.col("id").alias("doc_id"))
    images = synthetic_images(base, "doc_id")
    copies = images.filter(F.col("media_id") % 4 == 0).withColumn(
        "media_id", F.col("media_id") + 10_000_000
    )
    corpus = images.unionByName(copies)

    hashes = {r.media_id: r.phash for r in image_phash(corpus).collect()}
    assert len(hashes) == 75  # 60 originals + 15 copies
    for m in range(0, 60, 4):
        assert hashes[m + 10_000_000] == hashes[m]  # exact copy collides

    out = image_phash_dedup(corpus).collect()
    survivors = {r.media_id for r in out}
    assert all(m < 10_000_000 for m in survivors)  # copies never survive
    assert sum(r.n_copies for r in out) == 75  # total labeling of the corpus
    by_hash: dict[int, list[int]] = {}
    for m, hv in hashes.items():
        by_hash.setdefault(hv, []).append(m)
    expected = {min(ids): len(ids) for ids in by_hash.values()}
    assert {r.media_id: r.n_copies for r in out} == expected

    # determinism: hashing twice gives identical values
    h2 = {r.media_id: r.phash for r in image_phash(corpus).collect()}
    assert h2 == hashes
