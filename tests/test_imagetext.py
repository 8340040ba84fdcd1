"""Image-text curation stack (multimodal/imagetext.py): byte-exact gate
values against the fake codec + a pure-Python twin of the fake CLIP
scorer, the real-encoder seam contract, and the pHash caption-cluster
diagnostic."""

from __future__ import annotations

import hashlib

import pytest

from g_data_pipeline_spark.multimodal.imagetext import (
    clip_scores,
    image_dims,
    image_text_filter,
    phash_caption_clusters,
)
from g_data_pipeline_spark.multimodal.media import encode_fake_image


def _pairs(spark, rows, pixels=None):
    """rows: (pair_id, width, height, caption); pixels a pure function of
    the id (the synthetic_images recipe) unless ``pixels[pair_id]``
    overrides (aHash collapses ALL monotone ramps to one hash, so
    distinct-image fixtures need a structurally different pattern)."""
    data = []
    for pid, w, h, cap in rows:
        px = (pixels or {}).get(pid) or bytes(
            (pid * 31 + i) % 256 for i in range(w * h)
        )
        data.append((pid, encode_fake_image(w, h, px), cap))
    return spark.createDataFrame(
        data, "pair_id long, content binary, caption string"
    )


def _fake_clip_twin(luma: bytes, caption: str) -> int:
    import numpy as np

    def embed(chunks):
        v = np.zeros(8)
        for c in chunks:
            d = hashlib.md5(c).digest()
            v[d[0] % 8] += 1.0 if d[1] % 2 else -1.0
        n = np.linalg.norm(v)
        return v / n if n else v

    iv = embed([luma[i : i + 7] for i in range(0, max(len(luma), 1), 7)])
    tv = embed([t.encode() for t in caption.lower().split()])
    return int(round((float(np.dot(iv, tv)) + 1.0) / 2.0 * 1_000_000))


def test_dims_decode_exact(spark):
    rows = [(1, 8, 6, "a cat"), (2, 16, 4, "a dog")]
    got = {r.pair_id: (r.width, r.height) for r in image_dims(_pairs(spark, rows)).collect()}
    assert got == {1: (8, 6), 2: (16, 4)}


def test_fake_clip_matches_python_twin(spark):
    rows = [
        (1, 8, 6, "a photo of a cat"),
        (2, 10, 10, "zzz qqq vvv"),
        (3, 5, 5, ""),
    ]
    got = {
        r.pair_id: r.clip_micro
        for r in clip_scores(_pairs(spark, rows)).collect()
    }
    for pid, w, h, cap in rows:
        luma = bytes((pid * 31 + i) % 256 for i in range(w * h))
        assert got[pid] == _fake_clip_twin(luma, cap), pid
    # empty caption -> zero text vector -> cosine 0 -> midpoint 500000
    assert got[3] == 500_000


def test_real_encoder_seam_raises_at_plan_time(spark):
    with pytest.raises(NotImplementedError, match="vision-language"):
        clip_scores(_pairs(spark, [(1, 4, 4, "x")]), model="clip")


def test_filter_gates_compose(spark):
    rows = [
        (1, 8, 6, "a clear photo of a cat on a mat"),  # all gates pass-able
        (2, 20, 4, "a very wide banner image of text"),  # aspect 5 > 3
        (3, 8, 8, "ok"),  # caption too short (< 3 tokens)
        (4, 8, 8, "!!! ### $$$ %%% ^^^"),  # non-alpha > 0.5
    ]
    got = {
        r.pair_id: r
        for r in image_text_filter(
            _pairs(spark, rows), clip_threshold_micro=0
        ).collect()
    }
    assert got[1].size_keep and got[1].caption_keep
    assert not got[2].size_keep and got[2].caption_keep
    assert got[3].size_keep and not got[3].caption_keep
    assert not got[4].caption_keep
    # threshold at 0 -> clip gate passes everywhere; keep == other gates
    for pid in got:
        r = got[pid]
        assert r.clip_keep
        assert r.keep == (r.size_keep and r.caption_keep)
    # raising the threshold above a pair's score flips only clip_keep
    s1 = got[1].clip_micro
    strict = {
        r.pair_id: r
        for r in image_text_filter(
            _pairs(spark, rows), clip_threshold_micro=s1 + 1
        ).collect()
    }
    assert not strict[1].clip_keep and not strict[1].keep
    assert strict[1].size_keep and strict[1].caption_keep


def test_phash_caption_clusters_surface_divergent_captions(spark):
    rows = [
        (1, 8, 8, "original caption one"),
        (2, 8, 8, "some other image"),
    ]
    from pyspark.sql import functions as F

    # image 2: checkerboard, structurally distinct from image 1's ramp
    # (every monotone ramp aHashes identically)
    board = bytes(255 if (i // 8 + i) % 2 else 0 for i in range(64))
    pairs = _pairs(spark, rows, pixels={2: board})
    # byte-identical copy of image 1 under a different caption
    dup = _pairs(spark, [(1, 8, 8, "totally different words")]).select(
        (F.col("pair_id") + 100).alias("pair_id"), "content", "caption"
    )
    clusters = phash_caption_clusters(pairs.unionByName(dup)).collect()
    assert len(clusters) == 1  # only the planted pair clusters
    c = clusters[0]
    assert c.n_pairs == 2
    assert c.n_distinct_captions == 2
    assert c.canonical_pair_id == 1


def test_curate_image_text_keeps_best_clip_per_image_cluster(spark):
    """Pipeline composition: gates filter, then the aHash cluster keeps
    the HIGHEST-CLIP caption (LAION survivor rule), not the smallest id."""
    from g_data_pipeline_spark.pipelines import curate_image_text

    rows = [
        (1, 8, 8, "plain caption words here"),
        (2, 8, 8, "another caption entirely here"),
    ]
    pairs = _pairs(spark, rows)
    out = curate_image_text(pairs, clip_threshold_micro=0)
    got = {r.pair_id for r in out.collect()}
    # both images share the ramp aHash -> ONE survivor, the higher CLIP
    scores = {
        r.pair_id: r.clip_micro
        for r in clip_scores(pairs).collect()
    }
    best = max(scores, key=lambda k: (scores[k], -k))
    assert got == {best}
    # with the dup gate removed by distinct images, both survive
    board = bytes(255 if (i // 8 + i) % 2 else 0 for i in range(64))
    distinct = _pairs(spark, rows, pixels={2: board})
    assert {r.pair_id for r in curate_image_text(
        distinct, clip_threshold_micro=0
    ).collect()} == {1, 2}
    # gate columns survive the pipeline for downstream reporting
    assert {"clip_micro", "phash", "keep"} <= set(out.columns)
