"""Ranked-retrieval evaluation (operators/retrieval_eval.py): exact
micro recall@k / nDCG@k against a Python mirror, zero-result systems,
no-relevant-query exclusion, and the shared discount constants."""

from __future__ import annotations

import math

from g_data_pipeline_spark.operators.retrieval_eval import (
    discount_micros,
    retrieval_eval,
    sql_case_discount,
)

K = 3
DISCS = {r + 1: d for r, d in enumerate(discount_micros(K))}

# (query, doc, rel>0) judgments; q3 has NO relevant docs -> excluded
RELEVANCE = [
    ("q1", "d1", 2),
    ("q1", "d2", 1),
    ("q1", "d3", 1),
    ("q2", "d7", 3),
    ("q3", "d9", 0),
]
# (system, query, doc, rank)
RESULTS = [
    ("A", "q1", "d1", 1),
    ("A", "q1", "d9", 2),
    ("A", "q1", "d2", 3),
    ("A", "q1", "d3", 4),   # past k: must not count
    ("A", "q2", "d7", 2),
    ("A", "q3", "d9", 1),   # rel=0 judgment: not a hit
    ("B", "q1", "d5", 1),
    ("B", "q1", "d6", 2),
    ("B", "q1", "d3", 3),
    # B returns nothing for q2 -> contributes zeros for it
]


def _mirror():
    rel = {(q, d): r for q, d, r in RELEVANCE if r > 0}
    by_q: dict = {}
    for (q, d), r in rel.items():
        by_q.setdefault(q, []).append((d, r))
    out = {}
    for system in ("A", "B"):
        recs, ndcgs = [], []
        for q, docs in sorted(by_q.items()):
            n_rel = len(docs)
            ideal = sorted(docs, key=lambda t: (-t[1], t[0]))[:K]
            idcg = sum(
                ((1 << r) - 1) * DISCS[i + 1]
                for i, (_, r) in enumerate(ideal)
            )
            top = [
                (d, rk)
                for s, qq, d, rk in RESULTS
                if s == system and qq == q and rk <= K
            ]
            hits = sum(1 for d, _ in top if (q, d) in rel)
            dcg = sum(
                ((1 << rel[(q, d)]) - 1) * DISCS[rk]
                for d, rk in top
                if (q, d) in rel
            )
            recs.append(hits * 1_000_000 // n_rel)
            ndcgs.append(dcg * 1_000_000 // idcg)
        out[system] = (
            len(recs),
            sum(recs) // len(recs),
            sum(ndcgs) // len(ndcgs),
        )
    return out


def test_exact_micro_metrics_vs_mirror(spark):
    res = spark.createDataFrame(
        RESULTS, "system string, query_id string, doc_id string, rank int"
    )
    rel = spark.createDataFrame(
        RELEVANCE, "query_id string, doc_id string, rel int"
    )
    got = {
        r.system: (r.n_queries, r.recall_at_k_micro, r.ndcg_at_k_micro)
        for r in retrieval_eval(res, rel, k=K).collect()
    }
    assert got == _mirror()
    # spot values: A on q1 -> recall 2/3, dcg = 3*disc1 + 1*disc3
    assert got["A"][0] == 2  # q3 (no relevant docs) excluded


def test_perfect_ranking_scores_unity(spark):
    res = spark.createDataFrame(
        [("P", "q1", "d1", 1), ("P", "q1", "d2", 2), ("P", "q1", "d3", 3)],
        "system string, query_id string, doc_id string, rank int",
    )
    rel = spark.createDataFrame(
        [("q1", "d1", 2), ("q1", "d2", 1), ("q1", "d3", 1)],
        "query_id string, doc_id string, rel int",
    )
    row = retrieval_eval(res, rel, k=3).collect()[0]
    assert row.recall_at_k_micro == 1_000_000
    assert row.ndcg_at_k_micro == 1_000_000


def test_discount_constants_and_sql_twin():
    assert discount_micros(3) == [
        1_000_000,
        round(1_000_000 / math.log2(3)),
        500_000,
    ]
    case = sql_case_discount("rk", 3)
    assert "WHEN 1 THEN 1000000" in case
    assert f"WHEN 2 THEN {round(1_000_000 / math.log2(3))}" in case
    assert "WHEN 3 THEN 500000" in case
    import duckdb

    got = duckdb.sql(
        f"SELECT {sql_case_discount('rk', 3)} FROM (VALUES (1),(2),(3),(9)) t(rk)"
    ).fetchall()
    assert [r[0] for r in got] == discount_micros(3) + [0]


def test_ann_quality_scorecard_anchors_and_bounds(spark):
    """The composition over the REAL search paths: the exact-cosine
    system (which also defines relevance) must anchor at exactly
    1.0/1.0; the approximate legs land in (0, 1e6] and at sf0.001's
    tiny corpus LSH/IVF recall is high but the anchor is the pin."""
    from g_data_pipeline_spark.queries import REGISTRY

    rows = {
        r.system: r
        for r in REGISTRY["v_ann_quality_scorecard"]
        .fn(spark, "/root/testdata/sf0.001")
        .collect()
    }
    assert set(rows) == {"exact_cosine", "lsh_8x6", "ivf_16c_p4"}
    anchor = rows["exact_cosine"]
    assert anchor.recall_at_k_micro == 1_000_000
    assert anchor.ndcg_at_k_micro == 1_000_000
    for name in ("lsh_8x6", "ivf_16c_p4"):
        r = rows[name]
        assert r.n_queries == anchor.n_queries == 5
        assert 0 < r.recall_at_k_micro <= 1_000_000
        assert 0 < r.ndcg_at_k_micro <= 1_000_000
        assert r.ndcg_at_k_micro >= r.recall_at_k_micro - 400_000
