"""IVF-PQ tests: codebook determinism, encode plan shape (zero shuffle),
ADC exactness on codebook-reconstructible vectors, recall vs exact
cosine top-k, and the no-cartesian/broadcast plan pins."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.pq import (
    adc_score_expr,
    ivfpq_topk,
    pq_encode,
    train_pq_codebooks,
)
from g_data_pipeline_spark.operators.similarity import cosine_topk


def _clustered_corpus(spark, n_clusters=40, per_cluster=5, dim=32, seed=23):
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


def test_codebooks_shape_and_determinism(spark):
    df = _clustered_corpus(spark, n_clusters=10, per_cluster=4)
    b1 = train_pq_codebooks(df, dim=32, m_subspaces=4, n_codes=8, n_iter=2)
    b2 = train_pq_codebooks(df, dim=32, m_subspaces=4, n_codes=8, n_iter=2)
    assert len(b1) == 4 and all(len(bm) == 8 for bm in b1)
    assert all(len(entry) == 8 for bm in b1 for entry in bm)  # 32/4 dims
    assert b1 == b2, "codebook training must be run-deterministic"


def test_encode_zero_shuffle_and_code_range(spark):
    from tests.test_plans import shuffle_count

    df = _clustered_corpus(spark, n_clusters=8, per_cluster=4)
    books = train_pq_codebooks(df, dim=32, m_subspaces=4, n_codes=8, n_iter=1)
    enc = pq_encode(df, books, dim=32)
    plan = enc._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert shuffle_count(plan) == 0, "pq_encode must be a pure scan"
    rows = enc.collect()
    assert len(rows) == 32
    for r in rows:
        assert len(r.codes) == 4
        assert all(0 <= c < 8 for c in r.codes)


def test_adc_exact_when_vectors_are_codebook_points(spark):
    """If every corpus vector is a concatenation of codebook entries, the
    PQ reconstruction is lossless and ADC == the true dot product."""
    books = [
        [[1.0, 0.0], [0.0, 1.0]],  # subspace 0
        [[2.0, 0.0], [0.0, -1.0]],  # subspace 1
    ]
    # vectors = every combination of one entry per subspace
    vecs = []
    vid = 0
    for c0 in books[0]:
        for c1 in books[1]:
            vecs.append((vid, [float(x) for x in c0 + c1]))
            vid += 1
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    enc = pq_encode(df, books, dim=4)
    q = [0.5, -1.5, 2.0, 3.0]
    joined = df.join(enc, "vec_id").select(
        "vec_id",
        "embedding",
        adc_score_expr(F.array(*[F.lit(x) for x in q]), "codes", books, 4).alias(
            "adc"
        ),
    )
    for r in joined.collect():
        true_dot = sum(a * b for a, b in zip(q, r.embedding))
        assert abs(r.adc - true_dot) < 1e-9, (r.vec_id, r.adc, true_dot)


def test_ivfpq_recall_on_clustered_data(spark):
    """Planted-cluster regime (same as the IVF test): coarse cells prune,
    the ADC shortlist keeps the true neighbors, exact re-rank orders
    them — recall stays high while the candidate path reads codes only."""
    df = _clustered_corpus(spark)
    queries = df.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    exact = {(r.q_id, r.vec_id) for r in cosine_topk(df, queries, k=4).collect()}
    approx = {
        (r.q_id, r.vec_id)
        for r in ivfpq_topk(
            df, queries, k=4, dim=32, n_centroids=16, n_probe=4,
            m_subspaces=4, n_codes=16, refine=4,
        ).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.85, f"IVF-PQ recall {recall:.2f} on clustered data"


def test_ivfpq_returns_exact_cosine_values(spark):
    """Precision contract: every returned cos equals the exact cosine of
    that (query, corpus) pair — ADC orders the shortlist only."""
    df = _clustered_corpus(spark, n_clusters=10, per_cluster=4)
    queries = df.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    got = ivfpq_topk(
        df, queries, k=3, dim=32, n_centroids=8, n_probe=3,
        m_subspaces=4, n_codes=8,
    ).collect()
    assert got
    all_exact = {
        (r.q_id, r.vec_id): r.cos
        for r in cosine_topk(df, queries, k=40).collect()
    }
    for r in got:
        assert abs(r.cos - all_exact[(r.q_id, r.vec_id)]) < 1e-12


def test_persistent_index_partition_pruned_and_matches_in_memory(
    spark, tmp_path
):
    """write_ivfpq_index + search_ivfpq_index: the candidate scan must be
    PARTITION-PRUNED to the probed cells (literal IN predicate visible in
    the scan's PartitionFilters), and — same training params, same seed —
    results must be identical to the in-memory ivfpq_topk."""
    from g_data_pipeline_spark.operators.pq import (
        search_ivfpq_index,
        write_ivfpq_index,
    )

    df = _clustered_corpus(spark, n_clusters=12, per_cluster=4)
    queries = df.filter(F.col("vec_id") % 16 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    path = str(tmp_path / "ivfpq")
    meta = write_ivfpq_index(
        df, path, dim=32, n_centroids=8, m_subspaces=4, n_codes=8, n_iter=1
    )
    assert len(meta["centroids"]) == 8 and len(meta["books"]) == 4
    out = search_ivfpq_index(
        spark, path, queries, k=3, n_probe=2, refine=4
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf_lines = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "cell" in l
    ]
    assert pf_lines and any("IN" in l or "in(" in l for l in pf_lines), (
        "probe-cell predicate must reach the codes scan as a partition "
        f"filter; got: {pf_lines}"
    )
    assert "CartesianProduct" not in plan
    in_memory = ivfpq_topk(
        df, queries, k=3, dim=32, n_centroids=8, n_probe=2,
        m_subspaces=4, n_codes=8, refine=4, n_iter=1,
    )
    got = {(r.q_id, r.vec_id, r.rank, round(r.cos, 12)) for r in out.collect()}
    want = {
        (r.q_id, r.vec_id, r.rank, round(r.cos, 12))
        for r in in_memory.collect()
    }
    assert got == want


def test_ivfpq_plan_no_cartesian_broadcast_joins(spark):
    from tests.test_plans import op_counts

    df = _clustered_corpus(spark, n_clusters=8, per_cluster=4)
    queries = df.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    out = ivfpq_topk(
        df, queries, k=3, dim=32, n_centroids=4, n_probe=2,
        m_subspaces=4, n_codes=4, n_iter=1,
    )
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "CartesianProduct" not in plan
    counts = op_counts(plan)
    assert counts.get("BroadcastHashJoin", 0) >= 2, (
        "cell-probe join and shortlist re-rank join must both broadcast"
    )


def test_append_to_index_matches_batch_encode_and_stays_pruned(
    spark, tmp_path
):
    """append_to_ivfpq_index: (1) the stored model is frozen — meta.json
    byte-identical before/after; (2) build-on-part1 + append-part2 search
    results are BIT-IDENTICAL to searching an index whose codes were
    batch-encoded over part1 ∪ part2 under the same frozen model (encode
    is a pure expression of (vector, meta)); (3) appended rows land in
    the existing cell=N partition directories so the probe predicate
    still partition-prunes the grown index."""
    import json
    import os

    from g_data_pipeline_spark.operators.pq import (
        append_to_ivfpq_index,
        search_ivfpq_index,
        write_ivfpq_index,
    )

    full = _clustered_corpus(spark, n_clusters=12, per_cluster=4)
    part1 = full.filter(F.col("vec_id") % 2 == 0)
    part2 = full.filter(F.col("vec_id") % 2 == 1)
    queries = full.filter(F.col("vec_id") % 16 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )

    grown = str(tmp_path / "grown")
    meta0 = write_ivfpq_index(
        part1, grown, dim=32, n_centroids=8, m_subspaces=4, n_codes=8,
        n_iter=1,
    )
    before = open(os.path.join(grown, "meta.json")).read()
    meta1 = append_to_ivfpq_index(spark, grown, part2)
    assert open(os.path.join(grown, "meta.json")).read() == before
    assert meta1 == meta0, "append must never retrain"

    # batch twin: same frozen part1-trained model encoding part1 ∪ part2
    batch = str(tmp_path / "batch")
    os.makedirs(batch)
    json.dump(meta0, open(os.path.join(batch, "meta.json"), "w"))
    from g_data_pipeline_spark.operators.pq import pq_codes_expr
    from g_data_pipeline_spark.operators.similarity import (
        _nearest_centroid_expr,
    )

    full.select(
        F.col("vec_id").alias("id"),
        _nearest_centroid_expr("embedding", meta0["centroids"]).alias(
            "cell"
        ),
        pq_codes_expr("embedding", meta0["books"], 32).alias("codes"),
    ).write.partitionBy("cell").parquet(os.path.join(batch, "codes"))
    full.select(
        F.col("vec_id").alias("id"), F.col("embedding").alias("vector")
    ).write.parquet(os.path.join(batch, "vectors"))

    res_g = search_ivfpq_index(spark, grown, queries, k=3, n_probe=2)
    res_b = search_ivfpq_index(spark, batch, queries, k=3, n_probe=2)
    got = {(r.q_id, r.vec_id, r.rank, r.cos) for r in res_g.collect()}
    want = {(r.q_id, r.vec_id, r.rank, r.cos) for r in res_b.collect()}
    assert got == want and got

    # appended files live inside existing cell=N dirs; pruning intact
    cells = [
        d for d in os.listdir(os.path.join(grown, "codes"))
        if d.startswith("cell=")
    ]
    assert cells
    plan = res_g._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    pf = [
        l for l in plan.splitlines()
        if "PartitionFilters" in l and "cell" in l
    ]
    assert pf and any("IN" in l or "in(" in l for l in pf)


def test_filtered_search_exact_vs_bruteforce_and_never_leaks(
    spark, tmp_path
):
    """allowed_ids turns the index into a FILTERED search: with
    exhaustive probes (n_probe = n_centroids) and full refine the result
    must EQUAL brute-force exact cosine top-k over the allowed subset —
    and must never return a disallowed id at any probe setting. The
    filter applies before the ADC shortlist, so a heavily-filtered
    search still returns k allowed rows (post-filtering would starve)."""
    from g_data_pipeline_spark.operators.pq import (
        search_ivfpq_index,
        write_ivfpq_index,
    )

    df = _clustered_corpus(spark, n_clusters=12, per_cluster=4)
    queries = df.filter(F.col("vec_id") % 16 == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    allowed = df.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("id")
    )
    path = str(tmp_path / "ivfpq")
    write_ivfpq_index(
        df, path, dim=32, n_centroids=8, m_subspaces=4, n_codes=8, n_iter=1
    )

    # exhaustive probes -> exact parity with filtered brute force
    out = search_ivfpq_index(
        spark, path, queries, k=3, n_probe=8, refine=16,
        allowed_ids=allowed,
    ).collect()
    corpus_allowed = df.filter(F.col("vec_id") % 2 == 0)
    want = {
        (r.q_id, r.vec_id, r.rank)
        for r in cosine_topk(
            corpus_allowed, queries, k=3, corpus_id="vec_id",
            corpus_vec="embedding", query_id="q_id", query_vec="q_vec",
        ).collect()
    }
    got = {(r.q_id, r.vec_id, r.rank) for r in out}
    assert got == want
    assert all(r.vec_id % 2 == 0 for r in out)
    # every query still gets its full k despite 50% selectivity
    from collections import Counter

    per_q = Counter(r.q_id for r in out)
    assert all(v == 3 for v in per_q.values())

    # narrow probes: recall may drop, leakage may not
    narrow = search_ivfpq_index(
        spark, path, queries, k=3, n_probe=2, refine=4,
        allowed_ids=allowed,
    ).collect()
    assert all(r.vec_id % 2 == 0 for r in narrow)


# ---------------------------------------------------------------------------
# IVF-PQ-backed hybrid retrieval (verdict r9 #4): the registry entry
# v_hybrid_rrf_pq swaps v_hybrid_rrf's exact dense leg for the compressed
# index path; fusion algebra unchanged (rrf_fuse).
# ---------------------------------------------------------------------------


def test_hybrid_rrf_pq_recall_and_lex_parity(spark):
    """The PQ-leg fusion must (a) leave the lexical contributions
    untouched and (b) retrieve most of what the exact-leg fusion
    retrieves — the recall-vs-exact-fusion pin."""
    from g_data_pipeline_spark.queries import REGISTRY

    sf = "/root/testdata/sf0.001"
    exact = REGISTRY["v_hybrid_rrf"].fn(spark, sf).collect()
    pq = REGISTRY["v_hybrid_rrf_pq"].fn(spark, sf).collect()
    assert len(exact) == len(pq) == 20
    lex_exact = {r.id: r.lex_rank for r in exact if r.lex_rank is not None}
    lex_pq = {r.id: r.lex_rank for r in pq if r.lex_rank is not None}
    # every lex-ranked id surviving into both top-20s carries the same rank
    for i in set(lex_exact) & set(lex_pq):
        assert lex_exact[i] == lex_pq[i]
    overlap = len({r.id for r in exact} & {r.id for r in pq})
    assert overlap >= 15, f"fusion recall too low: {overlap}/20"


def test_hybrid_rrf_pq_matches_persisted_index_leg(spark, tmp_path):
    """Composing the SAME fusion from the PERSISTED index
    (write_ivfpq_index + search_ivfpq_index, identical training params)
    reproduces the registry entry exactly — the production shape where
    the index is built once and queried per request."""
    from g_data_pipeline_spark.operators.pq import (
        search_ivfpq_index,
        write_ivfpq_index,
    )
    from g_data_pipeline_spark.queries import REGISTRY
    from g_data_pipeline_spark.query_defs.text4 import _bm25_leg, rrf_fuse

    sf = "/root/testdata/sf0.001"
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    path = str(tmp_path / "hybrid_ivfpq")
    write_ivfpq_index(
        emb, path, dim=64, n_centroids=16, m_subspaces=8, n_codes=16
    )
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dense = search_ivfpq_index(
        spark, path, queries, k=50, n_probe=4, refine=4
    ).select(
        F.col("vec_id").alias("id"),
        F.col("rank").cast("long").alias("dense_rank"),
    )
    composed = rrf_fuse(dense, _bm25_leg(spark, sf)).collect()
    entry = REGISTRY["v_hybrid_rrf_pq"].fn(spark, sf).collect()
    as_set = lambda rows: {  # noqa: E731
        (r.id, r.dense_rank, r.lex_rank, r.rrf_micro) for r in rows
    }
    assert as_set(composed) == as_set(entry)
