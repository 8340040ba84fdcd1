"""Image-text pair curation — the LAION-style filter stack (Schuhmann et
al. '21/'22) over (image binary, caption string) pairs.

Same house pattern as multimodal/media.py: binary decode runs in
Arrow-batched ``mapInPandas`` kernels (the only place Python touches
rows), everything textual/relational stays in JVM expressions, and the
encoder layer is a swappable seam — a deterministic FAKE "CLIP" scorer
exercises the full pipeline byte-exactly in tests, while
``model='clip'`` raises a clearly-marked NotImplementedError at the plug
point (no vision encoder ships in this environment).

The filter stack, mirroring the published LAION-400M/5B recipe:

1. resolution/aspect gates — min side, max aspect ratio (decode dims);
2. caption gates — length bounds, language, non-alpha share (pure JVM
   expressions over the caption column);
3. image-text similarity gate — CLIP cosine >= threshold (the seam);
4. near-dup collapse — pHash clusters (media.image_phash) joined back
   to caption stats, surfacing caption-divergent duplicate images.

Scale notes: decode + scoring are embarrassingly parallel scan-side
kernels (one Arrow batch resident per task); the only shuffles are the
pHash-cluster groupBys, keyed on hash content. Feature outputs are plain
columns, so the keep decision composes relationally with every text
operator (dedup, lang balance, quality scorecards).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from g_data_pipeline_spark.multimodal.media import _image_decoder

PAIR_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
    ]
)

CLIP_SCHEMA = T.StructType(
    [
        T.StructField("pair_id", T.LongType()),
        T.StructField("clip_micro", T.LongType()),
    ]
)


def _require_vision_encoder() -> Any:
    """The real-encoder plug point (no CLIP/vision model ships here)."""
    raise NotImplementedError(
        "real image-text similarity requires a vision-language encoder "
        "(e.g. open_clip), which is not installed in this environment; "
        "use model='fake' (deterministic hash-projection scorer) or "
        "install an encoder and extend clip_scores with model='clip'"
    )


def image_dims(
    pairs: DataFrame,
    id_col: str = "pair_id",
    content_col: str = "content",
    codec: str = "fake",
) -> DataFrame:
    """binary -> (pair_id, width, height) via one Arrow-batched kernel —
    the minimum decode the resolution/aspect gates need (full pixel
    features stay in media.decode_image_features)."""
    decode = _image_decoder(codec)

    def batches(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            ids, ws, hs = [], [], []
            for mid, blob in zip(pdf[id_col], pdf[content_col]):
                w, h, _ = decode(bytes(blob))
                ids.append(int(mid))
                ws.append(w)
                hs.append(h)
            yield pd.DataFrame(
                {"pair_id": ids, "width": ws, "height": hs}
            )

    return pairs.select(id_col, content_col).mapInPandas(
        batches, PAIR_FEATURE_SCHEMA
    )


def clip_scores(
    pairs: DataFrame,
    id_col: str = "pair_id",
    content_col: str = "content",
    caption_col: str = "caption",
    model: str = "fake",
    codec: str = "fake",
) -> DataFrame:
    """Image-text similarity scores (pair_id, clip_micro in [0, 1e6]).

    ``model='fake'``: a deterministic hash-projection scorer — image and
    caption each hash into a tiny pseudo-embedding (8 signed buckets from
    luma bytes / caption tokens), score = their cosine mapped to [0,1] —
    so thresholding, reporting and the keep decision are exercised
    end-to-end with byte-exact test expectations. ``model='clip'`` is the
    real-encoder seam and raises until one is installed (validated
    driver-side, like media._require_pil). The Spark-side contract
    (schema, Arrow batching, partition parallelism) is identical either
    way — swapping the model changes no plan shape."""
    if model == "clip":
        _require_vision_encoder()
    elif model != "fake":
        raise ValueError(f"unknown model {model!r} (use 'fake' or 'clip')")
    decode = _image_decoder(codec)

    def batches(it: Iterator) -> Iterator:
        import hashlib

        import numpy as np
        import pandas as pd

        def embed_bytes(bs: bytes) -> "np.ndarray":
            v = np.zeros(8, dtype=np.float64)
            for i in range(0, max(len(bs), 1), 7):
                chunk = bs[i : i + 7]
                d = hashlib.md5(chunk).digest()
                v[d[0] % 8] += 1.0 if d[1] % 2 else -1.0
            n = np.linalg.norm(v)
            return v / n if n else v

        for pdf in it:
            ids, scores = [], []
            for mid, blob, cap in zip(
                pdf[id_col], pdf[content_col], pdf[caption_col]
            ):
                _, _, luma = decode(bytes(blob))
                iv = embed_bytes(luma)
                tv = np.zeros(8, dtype=np.float64)
                for tok in str(cap).lower().split():
                    d = hashlib.md5(tok.encode()).digest()
                    tv[d[0] % 8] += 1.0 if d[1] % 2 else -1.0
                n = np.linalg.norm(tv)
                tv = tv / n if n else tv
                cos = float(np.dot(iv, tv))
                ids.append(int(mid))
                scores.append(int(round((cos + 1.0) / 2.0 * 1_000_000)))
            yield pd.DataFrame({"pair_id": ids, "clip_micro": scores})

    return pairs.select(id_col, content_col, caption_col).mapInPandas(
        batches, CLIP_SCHEMA
    )


def image_text_filter(
    pairs: DataFrame,
    id_col: str = "pair_id",
    content_col: str = "content",
    caption_col: str = "caption",
    min_side: int = 5,
    max_aspect: float = 3.0,
    min_caption_tokens: int = 3,
    max_caption_tokens: int = 128,
    max_nonalpha_frac: float = 0.5,
    clip_threshold_micro: int = 450_000,
    model: str = "fake",
    codec: str = "fake",
) -> DataFrame:
    """The composed LAION-style keep decision, one row per pair: gate
    flags + the final ``keep``. Caption gates are pure JVM expressions;
    only decode and the similarity seam run Python (Arrow-batched).
    Thresholds are the published recipe's shape (LAION: min side 200px,
    CLIP >= 0.28); defaults here are scaled to the fake codec's tiny
    fixtures and overridable per call."""
    from g_data_pipeline_spark.functions.text import tokens

    dims = image_dims(pairs, id_col, content_col, codec)
    sims = clip_scores(
        pairs, id_col, content_col, caption_col, model, codec
    )
    cap = pairs.select(
        F.col(id_col).alias("pair_id"),
        F.col(caption_col).alias("caption"),
    ).select(
        "pair_id",
        "caption",
        F.when(F.trim("caption") == "", F.lit(0))
        .otherwise(F.size(tokens(F.col("caption"))))
        .alias("caption_tokens"),
        (
            F.length(F.regexp_replace(F.col("caption"), r"[A-Za-z\s]", ""))
            / F.greatest(F.length("caption"), F.lit(1))
        ).alias("nonalpha_frac"),
    )
    out = (
        cap.join(dims, "pair_id")
        .join(sims, "pair_id")
        .withColumn(
            "size_keep",
            (F.least("width", "height") >= F.lit(min_side))
            & (
                F.greatest("width", "height")
                <= F.lit(float(max_aspect)) * F.least("width", "height")
            ),
        )
        .withColumn(
            "caption_keep",
            (F.col("caption_tokens") >= F.lit(min_caption_tokens))
            & (F.col("caption_tokens") <= F.lit(max_caption_tokens))
            & (F.col("nonalpha_frac") <= F.lit(float(max_nonalpha_frac))),
        )
        .withColumn(
            "clip_keep", F.col("clip_micro") >= F.lit(clip_threshold_micro)
        )
    )
    return out.select(
        "pair_id",
        "caption_tokens",
        F.round(F.col("nonalpha_frac") * 1e6).cast("long").alias(
            "nonalpha_micro"
        ),
        "width",
        "height",
        "clip_micro",
        "size_keep",
        "caption_keep",
        "clip_keep",
        (
            F.col("size_keep") & F.col("caption_keep") & F.col("clip_keep")
        ).alias("keep"),
    )


def phash_caption_clusters(
    pairs: DataFrame,
    id_col: str = "pair_id",
    content_col: str = "content",
    caption_col: str = "caption",
    codec: str = "fake",
) -> DataFrame:
    """Caption behavior per near-duplicate IMAGE cluster: pairs sharing
    an aHash (media.image_phash) grouped into clusters, each reporting
    its size, distinct captions, and caption-length spread — the
    LAION-style diagnostic separating true duplicates (same image, same
    caption: keep one) from caption farms (same image, many captions:
    keep the best-CLIP one). Shuffles key on hash content; caption
    lengths aggregate as integers."""
    from g_data_pipeline_spark.functions.text import tokens
    from g_data_pipeline_spark.multimodal.media import image_phash

    hashes = image_phash(pairs, id_col, content_col, codec=codec).select(
        F.col("media_id").alias("pair_id"), "phash"
    )
    cap = pairs.select(
        F.col(id_col).alias("pair_id"),
        F.when(F.trim(F.col(caption_col)) == "", F.lit(0))
        .otherwise(F.size(tokens(F.col(caption_col))))
        .alias("caption_tokens"),
        F.col(caption_col).alias("caption"),
    )
    return (
        hashes.join(cap, "pair_id")
        .groupBy("phash")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.count_distinct("caption").alias("n_distinct_captions"),
            F.min("caption_tokens").alias("min_caption_tokens"),
            F.max("caption_tokens").alias("max_caption_tokens"),
            F.min("pair_id").alias("canonical_pair_id"),
        )
        .filter(F.col("n_pairs") >= 2)
    )
