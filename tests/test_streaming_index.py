"""Streaming growing-delta zone for the sealed IVF-PQ index
(operators/pq.py): streamed vectors become searchable immediately,
replay is exactly-once, and compaction folds the delta into the sealed
zone without changing search results."""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.pq import (
    compact_index_delta,
    search_ivfpq_index,
    streaming_index_delta_sink,
    write_ivfpq_index,
)


def _corpus(spark, n_clusters=10, per_cluster=4, dim=16, seed=7):
    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for _ in range(n_clusters):
        center = rng.normal(size=dim)
        center /= np.linalg.norm(center)
        for _ in range(per_cluster):
            v = center + rng.normal(scale=0.1, size=dim)
            rows.append((vid, [float(x) for x in v.astype(np.float32)]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_streamed_vectors_searchable_replay_safe_compaction_stable(
    spark, tmp_path
):
    full = _corpus(spark)
    part1 = full.filter(F.col("vec_id") % 2 == 0)
    part2 = full.filter(F.col("vec_id") % 2 == 1)
    queries = full.filter(F.col("vec_id") % 8 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    path = str(tmp_path / "index")
    write_ivfpq_index(
        part1, path, dim=16, n_centroids=6, m_subspaces=4, n_codes=8,
        n_iter=1,
    )
    # sealed-only baseline: streamed ids absent from results' candidates
    sealed_only = {
        (r.q_id, r.vec_id, r.rank) for r in search_ivfpq_index(
            spark, path, queries, k=3, n_probe=2
        ).collect()
    }
    assert all(vid % 2 == 0 for _, vid, _ in sealed_only)

    # stream part2 into the delta zone
    in_dir = str(tmp_path / "incoming")
    part2.write.parquet(in_dir)
    stream = spark.readStream.schema(
        "vec_id long, embedding array<float>"
    ).parquet(in_dir)
    write_batch = streaming_index_delta_sink(
        stream, path, str(tmp_path / "ckpt")
    )
    assert os.path.exists(os.path.join(path, "delta_codes"))

    after_stream = search_ivfpq_index(spark, path, queries, k=3, n_probe=2)
    got = {(r.q_id, r.vec_id, r.rank, r.cos) for r in after_stream.collect()}
    assert any(vid % 2 == 1 for _, vid, _, _ in got), (
        "streamed vectors must be searchable without compaction"
    )

    # the growing zone must equal the batch append path under the same
    # frozen model: compare against append_to_ivfpq_index on a twin index
    from g_data_pipeline_spark.operators.pq import append_to_ivfpq_index
    import shutil

    twin = str(tmp_path / "twin")
    shutil.copytree(path, twin)
    shutil.rmtree(os.path.join(twin, "delta_codes"))
    shutil.rmtree(os.path.join(twin, "delta_vectors"))
    append_to_ivfpq_index(spark, twin, part2)
    want = {
        (r.q_id, r.vec_id, r.rank, r.cos) for r in search_ivfpq_index(
            spark, twin, queries, k=3, n_probe=2
        ).collect()
    }
    assert got == want

    # simulated replay of the drained epoch: same batch_id overwrites its
    # own partitions -> search results unchanged, no duplicate candidates
    write_batch(part2, 0)
    replayed = {
        (r.q_id, r.vec_id, r.rank, r.cos) for r in search_ivfpq_index(
            spark, path, queries, k=3, n_probe=2
        ).collect()
    }
    assert replayed == got

    # compaction folds delta into sealed; results identical, dirs gone
    n = compact_index_delta(spark, path)
    assert n == part2.count()
    assert not os.path.exists(os.path.join(path, "delta_codes"))
    compacted = {
        (r.q_id, r.vec_id, r.rank, r.cos) for r in search_ivfpq_index(
            spark, path, queries, k=3, n_probe=2
        ).collect()
    }
    assert compacted == got
    assert compact_index_delta(spark, path) == 0  # idempotent no-op
