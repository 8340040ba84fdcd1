"""Multimodal queries (SURVEY.md north-star extension; rows-only for the
driver — binary codec ops have no DuckDB twin; byte-exact behavior is pinned
by tests/test_multimodal.py against the deterministic fake codec).

Both queries run the full distributed media pipeline: ids from ``documents``
-> synthesize binary media executor-side (mapInPandas, Arrow-batched)
-> decode/feature-extract (mapInPandas) -> relational post-processing. The
binary blobs never touch the driver."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.multimodal.media import (
    decode_image_features,
    synthetic_images,
    synthetic_videos,
    video_frame_stats,
)
from g_data_pipeline_spark.queries import register


@register("m_image_features", oracle=None)
def m_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image pipeline: binary FIMG column -> (width, height, luma stats) via
    mapInPandas, then a normal relational filter on the extracted features.
    Rows-only (codec ops are non-SQL-expressible); exact decode values are
    pinned in tests/test_multimodal.py."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    images = synthetic_images(docs, "doc_id")
    feats = decode_image_features(images)
    return feats.filter(F.col("mean_luma").isNotNull()).orderBy("media_id")


@register("m_video_frame_stats", oracle=None)
def m_video_frame_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video pipeline: FVID column -> per-video (n_frames, mean luma) via
    mapInPandas — the reduce-shaped media op. Rows-only."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    videos = synthetic_videos(docs, "doc_id")
    return video_frame_stats(videos).orderBy("media_id")


@register("m_audio_features", oracle=None)
def m_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio pipeline: binary FAUD column -> (rate, duration, RMS, peak)
    via mapInPandas — the audio twin of the image path. Rows-only; decode
    values pinned byte-exactly in tests/test_multimodal.py."""
    from g_data_pipeline_spark.multimodal.media import (
        decode_audio_features,
        synthetic_audio,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    audio = synthetic_audio(docs, "doc_id")
    return decode_audio_features(audio).orderBy("media_id")


@register("m_image_phash_dedup", oracle=None)
def m_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image dedup: aHash (8x8 mean-threshold, one BIGINT per
    image, mapInPandas) -> MIN-id survivor per hash bucket. The corpus is
    the synthetic image set PLUS a byte-identical planted copy of every
    4th image (media_id + 1e7; the MIN-id survivor rule requires planted
    ids ABOVE the originals, so the offset is load-bearing — valid while
    max(media_id) < 1e7, i.e. every sf* fixture; demo plant only, not a
    production path) — every copy must collapse onto its original.
    Rows-only (codec op); survivor/copy-count invariants pinned in
    tests/test_multimodal.py."""
    from g_data_pipeline_spark.multimodal.media import image_phash_dedup

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    images = synthetic_images(docs, "doc_id")
    copies = images.filter(F.col("media_id") % 4 == 0).withColumn(
        "media_id", F.col("media_id") + 10_000_000
    )
    corpus = images.unionByName(copies)
    return image_phash_dedup(corpus).orderBy("media_id")


def _caption_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(pair_id, content FIMG, caption) pairs: synthetic images keyed by
    doc_id, captions = the documents' text — the image-text fixture every
    m_image_text_* entry shares (blobs fabricated executor-side)."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    images = synthetic_images(docs.select("doc_id"), "doc_id").select(
        F.col("media_id").alias("pair_id"), "content"
    )
    return images.join(
        docs.select(
            F.col("doc_id").alias("pair_id"), F.col("text").alias("caption")
        ),
        "pair_id",
    )


@register("m_image_text_filter", oracle=None)
def m_image_text_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LAION-style image-text pair filter (multimodal/imagetext.py):
    resolution/aspect gates from one Arrow-batched dims decode, caption
    gates as pure JVM expressions, the CLIP-similarity gate through the
    deterministic fake scorer (the real-encoder seam raises until an
    encoder is installed), composed into one keep decision per pair.
    Rows-only (codec + encoder ops have no SQL twin); gate values pinned
    byte-exactly in tests/test_imagetext.py."""
    from g_data_pipeline_spark.multimodal.imagetext import image_text_filter

    return image_text_filter(_caption_pairs(spark, sf_dir)).orderBy(
        "pair_id"
    )


@register("m_phash_caption_clusters", oracle=None)
def m_phash_caption_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Caption behavior per near-duplicate image cluster: aHash clusters
    (with a planted byte-identical copy of every 4th image carrying a
    DIFFERENT caption) x caption stats — the duplicate-image /
    caption-farm diagnostic. Rows-only; cluster invariants pinned in
    tests/test_imagetext.py."""
    from g_data_pipeline_spark.multimodal.imagetext import (
        phash_caption_clusters,
    )

    pairs = _caption_pairs(spark, sf_dir)
    copies = pairs.filter(F.col("pair_id") % 4 == 0).select(
        (F.col("pair_id") + 10_000_000).alias("pair_id"),
        "content",
        F.concat(F.lit("alt caption: "), F.col("caption")).alias("caption"),
    )
    return phash_caption_clusters(pairs.unionByName(copies)).orderBy(
        "phash"
    )


@register("m_phash_neardup", oracle=None)
def m_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual NEAR-dup labels (round 10): Hamming-banded pHash
    through the shared banded decision core — the image modality of the
    incremental-dedup family (pigeonhole chunk candidates, bucket-min
    survivorship). Corpus: structured synthetic images (md5-mask cells,
    distinct aHash per doc — ramps would collapse, the r7 gotcha) PLUS a
    one-cell-flipped variant of every 5th image (media_id + 1e7, exactly
    one Hamming bit) — every variant must label is_dup against its
    original. Rows-only (codec op; the banding algebra holds its oracle
    via d_simhash_pairs); pair/incremental/replay/streaming pins live in
    tests/test_phash_neardup.py."""
    from g_data_pipeline_spark.multimodal.phash_neardup import (
        neardup_phash_dedup,
        structured_images,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    images = structured_images(docs, "doc_id")
    variants = structured_images(
        docs.filter(F.col("doc_id") % 5 == 0), "doc_id", flip_cell=0
    ).withColumn("media_id", F.col("media_id") + 10_000_000)
    corpus = images.unionByName(variants)
    return neardup_phash_dedup(corpus).orderBy("id")
