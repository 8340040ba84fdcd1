"""Theta-sketch cross-group overlap (operators/sketch_overlap.py) vs the
exact distinct-posts self-join.

A Theta sketch with nominal k entries retains EVERY hash until the group
exceeds k distinct values, so below capacity intersection/union estimates
are exact integers — the regime at test scale (premise asserted). The
test therefore pins bit-for-bit equality with the exact matrix, which
also exercises the estimate algebra end-to-end (a tolerance test would
hide sign/column mix-ups).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import word_shingles
from g_data_pipeline_spark.operators.sketch_overlap import (
    THETA_LG_K,
    distinct_sketches,
    pairwise_overlap,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def posts(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    return docs.select(
        "source", F.explode(word_shingles("text", n=3)).alias("s")
    ).localCheckpoint(eager=True)


def test_exact_regime_matches_posts_self_join(spark, posts):
    # premise: every source below sketch capacity -> exact mode
    max_distinct = (
        posts.distinct().groupBy("source").count().agg(F.max("count"))
    ).collect()[0][0]
    assert max_distinct < (1 << THETA_LG_K), (
        "fixture outgrew the sketch's exact-mode capacity; this test's "
        "bit-equality premise no longer holds — raise THETA_LG_K here "
        "or switch to tolerance"
    )

    got = {
        (r["grp_a"], r["grp_b"]): r
        for r in pairwise_overlap(
            distinct_sketches(posts, "source", "s"), "source"
        ).collect()
    }

    d = posts.distinct()
    a = d.select(F.col("source").alias("grp_a"), "s")
    b = d.select(F.col("source").alias("grp_b"), "s")
    shared = (
        a.join(b, "s")
        .filter(F.col("grp_a") < F.col("grp_b"))
        .groupBy("grp_a", "grp_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sizes = {r["source"]: r["n"] for r in
             d.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()}
    want = {(r["grp_a"], r["grp_b"]): r["shared"] for r in shared.collect()}

    n_sources = len(sizes)
    assert len(got) == n_sources * (n_sources - 1) // 2
    for (ga, gb), row in got.items():
        exact_shared = want.get((ga, gb), 0)
        exact_union = sizes[ga] + sizes[gb] - exact_shared
        assert row["shared_est"] == exact_shared, (ga, gb)
        assert row["union_est"] == exact_union, (ga, gb)
        assert row["jaccard_micro"] == round(
            exact_shared * 1e6 / exact_union
        ), (ga, gb)


def test_sketch_table_is_one_row_per_group_and_broadcast_join(spark, posts):
    sk = distinct_sketches(posts, "source", "s")
    assert sk.count() == 20
    plan = str(
        pairwise_overlap(sk, "source")._jdf.queryExecution().executedPlan()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
