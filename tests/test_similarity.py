"""Similarity operator tests: cosine correctness vs numpy, LSH recall vs
the brute-force baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.vectors import cosine_sim, dot_fast
from g_data_pipeline_spark.operators.similarity import cosine_topk, lsh_topk
from tests.conftest import SF_DIR_ORACLE


def test_cosine_matches_numpy(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(size=16).astype(np.float32)
    b = rng.normal(size=16).astype(np.float32)
    df = spark.createDataFrame(
        [(a.tolist(), b.tolist())], "va array<float>, vb array<float>"
    )
    got = df.select(cosine_sim("va", "vb").alias("c"), dot_fast("va", "vb").alias("d")).collect()[0]
    a64, b64 = a.astype(np.float64), b.astype(np.float64)
    exp_c = float(np.dot(a64, b64) / (np.linalg.norm(a64) * np.linalg.norm(b64)))
    # cosine_sim quantizes per-element products at 1e-12 absolute
    assert got.c == pytest.approx(exp_c, abs=1e-9)
    assert got.d == pytest.approx(float(np.dot(a64, b64)), abs=1e-12)


def test_cosine_zero_norm_null(spark):
    df = spark.createDataFrame(
        [([0.0, 0.0], [1.0, 2.0])], "va array<float>, vb array<float>"
    )
    assert df.select(cosine_sim("va", "vb").alias("c")).collect()[0].c is None


def test_topk_matches_numpy_ranking(spark):
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    pdf = emb.toPandas()
    mat = np.array([np.array(v, dtype=np.float64) for v in pdf.embedding])
    ids = pdf.vec_id.to_numpy()
    q = mat[ids == 3][0]
    cos = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(
        [(c, i) for c, i in zip(cos, ids) if i != 3], key=lambda t: (-t[0], t[1])
    )
    expected = [i for _, i in order[:10]]

    queries = emb.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = [
        r.vec_id
        for r in cosine_topk(emb, queries, k=10).orderBy("rank").collect()
    ]
    assert got == expected


def test_lsh_recall_on_clustered_data(spark):
    """Planted clusters (the regime LSH exists for): 40 centers x 5 members
    with cosine ~0.95+ within a cluster — multi-table sign-LSH must recover
    nearly all true neighbors."""
    rng = np.random.default_rng(11)
    rows = []
    vid = 0
    for _ in range(40):
        center = rng.normal(size=32)
        center /= np.linalg.norm(center)
        for _ in range(5):
            v = center + rng.normal(scale=0.1, size=32)
            rows.append((vid, [float(x) for x in v.astype(np.float32)]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {
        (r.q_id, r.vec_id) for r in cosine_topk(df, queries, k=4).collect()
    }
    approx = {
        (r.q_id, r.vec_id)
        for r in lsh_topk(
            df, queries, k=4, dim=32, n_tables=8, planes_per_table=8
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f} on clustered data"


def test_lsh_on_noise_corpus_is_sane(spark):
    """On the near-orthogonal synthetic corpus LSH recall is inherently
    weak; assert structural sanity (subset of corpus, no self-hits, ranked)."""
    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    rows = lsh_topk(
        emb, queries, k=5, dim=64, n_tables=8, planes_per_table=6
    ).collect()
    assert rows
    assert all(r.q_id != r.vec_id for r in rows)
    assert all(1 <= r.rank <= 5 for r in rows)


def test_ivf_recall_on_clustered_data(spark):
    """Same planted-cluster regime: the IVF coarse quantizer should put a
    cluster in one (or few) cells, so probing 4/16 cells recovers nearly
    all true neighbors."""
    from g_data_pipeline_spark.operators.similarity import ivf_topk

    rng = np.random.default_rng(23)
    rows = []
    vid = 0
    for _ in range(40):
        center = rng.normal(size=32)
        center /= np.linalg.norm(center)
        for _ in range(5):
            v = center + rng.normal(scale=0.1, size=32)
            rows.append((vid, [float(x) for x in v.astype(np.float32)]))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = df.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.vec_id) for r in cosine_topk(df, queries, k=4).collect()}
    approx = {
        (r.q_id, r.vec_id)
        for r in ivf_topk(df, queries, k=4, n_centroids=16, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"IVF recall {recall:.2f} on clustered data"


def test_ivf_deterministic_across_runs(spark):
    from g_data_pipeline_spark.operators.similarity import ivf_topk

    emb = load_table(spark, SF_DIR_ORACLE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    r1 = sorted(map(tuple, ivf_topk(emb, queries, k=5).collect()))
    r2 = sorted(map(tuple, ivf_topk(emb, queries, k=5).collect()))
    assert r1 == r2


def test_lsh_near_dup_pairs_precision_and_recall(spark):
    """Bucketed near-dup must be a SUBSET of the exact O(n^2) pairs (exact
    verify = exact precision) with high recall on the planted-near-dup
    corpus (the high-similarity regime LSH is for)."""
    from g_data_pipeline_spark.operators.similarity import (
        lsh_near_dup_pairs,
        near_dup_pairs,
    )
    from g_data_pipeline_spark.query_defs.similarity import (
        _planted_near_dup_corpus,
    )

    corpus = _planted_near_dup_corpus(load_table(spark, SF_DIR_ORACLE, "embeddings"))
    exact = {
        (r.id_a, r.id_b) for r in near_dup_pairs(corpus, threshold=0.9).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in lsh_near_dup_pairs(
            corpus, threshold=0.9, dim=64, n_tables=6, planes_per_table=16
        ).collect()
    }
    assert len(exact) >= 40, "planted corpus should contain ~50 near-dup pairs"
    assert approx <= exact  # exact-cosine verification => perfect precision
    recall = len(approx) / len(exact)
    assert recall >= 0.9, f"LSH near-dup recall {recall:.2f}"


def test_mean_pool_matches_numpy(spark):
    from g_data_pipeline_spark.operators.similarity import mean_pool

    rows = [
        ("a", [1.0, 2.0, 3.0]),
        ("a", [3.0, 2.0, 1.0]),
        ("b", [10.0, 0.0, -10.0]),
    ]
    df = spark.createDataFrame(rows, "g string, embedding array<float>")
    got = {r.g: (r.mean_vec, r.n_vectors) for r in mean_pool(df, ["g"]).collect()}
    assert got["a"][0] == [2.0, 2.0, 2.0] and got["a"][1] == 2
    assert got["b"][0] == [10.0, 0.0, -10.0] and got["b"][1] == 1


def test_semantic_dedup_pairs_subset_of_exact_with_recall(spark):
    """SemDeDup candidate pairs must be a SUBSET of the exact near-dup set
    (precision 1.0 by construction) with healthy recall when cells are
    coarse; survivors = corpus minus greedy min-id drops of those pairs."""
    from g_data_pipeline_spark.operators.similarity import (
        near_dup_pairs,
        semantic_dedup,
        semantic_dedup_pairs,
    )
    from g_data_pipeline_spark.catalog import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r.id_a, r.id_b) for r in near_dup_pairs(emb, threshold=0.35).collect()
    }
    approx = {
        (r.id_a, r.id_b)
        for r in semantic_dedup_pairs(emb, 0.35, n_centroids=4).collect()
    }
    assert approx <= exact, "semantic pair outside the exact near-dup set"
    assert len(approx) / len(exact) >= 0.7, (
        f"recall {len(approx) / len(exact):.2f} with 4 coarse cells, top-2 "
        "soft assignment"
    )
    survivors = {
        r.vec_id for r in semantic_dedup(emb, 0.35, n_centroids=4).collect()
    }
    dropped = {b for _, b in approx}
    all_ids = {r.vec_id for r in emb.collect()}
    assert survivors == all_ids - dropped


def test_semantic_dedup_keeps_one_per_tight_cluster(spark):
    """Well-separated duplicate groups -> exactly the min id of each group
    survives, singletons untouched."""
    from g_data_pipeline_spark.operators.similarity import semantic_dedup

    rows = [
        (1, [1.0, 0.0, 0.0]), (2, [0.999, 0.01, 0.0]), (3, [0.998, 0.02, 0.0]),
        (10, [0.0, 1.0, 0.0]), (11, [0.01, 0.999, 0.0]),
        (20, [0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        r.vec_id
        for r in semantic_dedup(df, 0.99, n_centroids=3, n_iter=3).collect()
    )
    assert got == [1, 10, 20]


def test_quantize_int8_roundtrip_error_bound(spark):
    """Property of symmetric int8 quantization: |x - q*scale| <= scale/2
    and every q fits int8 range [-127, 127]. The registered query is the
    FLATTENED (vec_id, pos, scale, q) form (driver-gradeable, scalar-only);
    reassemble per vector here to check the round-trip."""
    import math

    from g_data_pipeline_spark.queries import REGISTRY

    rows = REGISTRY["v_quantize_int8"].fn(spark, "/root/testdata/sf0.001").collect()
    emb = {
        r.vec_id: r.embedding
        for r in spark.read.parquet(
            "/root/testdata/sf0.001/embeddings.parquet"
        ).collect()
    }
    assert rows
    by_vec: dict = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, {})[r.pos] = r
    for vec_id, elems in by_vec.items():
        v = emb[vec_id]
        assert len(elems) == len(v)
        for pos, x in enumerate(v):
            r = elems[pos]
            assert -127 <= r.q <= 127
            assert math.isfinite(r.scale)
            assert abs(float(x) - r.q * r.scale) <= r.scale / 2 + 1e-12
