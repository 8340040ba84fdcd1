"""Star connected-components (operators/dedup.py::cc_star) and the Bloom
incremental-dedup pre-filter (operators/bloom.py): convergence, exactness,
false-positive-rate, and plan-shape pins."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    incremental_dedup_bloom,
)
from g_data_pipeline_spark.operators.dedup import (
    cc_star,
    dedup_clusters,
    incremental_dedup,
)
from tests.conftest import SF_DIR_ORACLE
from tests.test_plans import op_counts, plan_of


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def test_cc_star_long_chain_logarithmic_rounds(spark):
    """A 64-node duplicate chain (0-1, 1-2, ..., 62-63) has diameter 63:
    min-label propagation needs ~63 rounds, the star alternation O(log n).
    Pin both the labels (all collapse to 0) and the round count."""
    chain = _pairs(spark, [(i, i + 1) for i in range(63)])
    labels, iters = cc_star(chain, return_iterations=True, max_iterations=20)
    rows = labels.collect()
    assert len(rows) == 64
    assert all(r.cluster_id == 0 for r in rows)
    assert iters <= 10, f"star contraction took {iters} rounds on a 64-chain"


def test_cc_star_matches_label_propagation(spark):
    """Same components as dedup_clusters on a multi-component graph with
    a bridge node, a triangle, and singleton-free isolates."""
    edges = [(1, 2), (2, 3), (3, 1), (10, 11), (11, 12), (20, 21), (5, 3)]
    star = {
        (r.id, r.cluster_id) for r in cc_star(_pairs(spark, edges)).collect()
    }
    prop = {
        (r.id, r.cluster_id)
        for r in dedup_clusters(_pairs(spark, edges)).collect()
    }
    assert star == prop
    assert {c for _, c in star} == {1, 10, 20}


def test_cc_star_empty_graph(spark):
    labels = cc_star(_pairs(spark, []).limit(0))
    assert labels.count() == 0


def test_bloom_no_false_negatives(spark):
    """Every inserted key MUST probe positive — the property exactness
    rests on (a false negative would skip the anti-join and resurrect a
    duplicate)."""
    hist = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    bloom = bloom_build(hist, "k", num_bits=1 << 16, num_hashes=5)
    flagged = bloom_might_contain(hist, bloom, "k", 1 << 16, 5)
    assert flagged.filter(~F.col("__might")).count() == 0


def test_bloom_false_positive_rate_bounded(spark):
    """2000 inserted keys in a 2^16-bit filter with 5 hashes: theoretical
    fpp ~ (1 - e^(-5*2000/65536))^5 ~ 0.05%; assert a loose 2% bound on
    2000 definitely-absent probes."""
    hist = spark.range(2000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    probe = spark.range(2000).select(
        F.concat(F.lit("other-"), F.col("id")).alias("k")
    )
    bloom = bloom_build(hist, "k", num_bits=1 << 16, num_hashes=5)
    flagged = bloom_might_contain(probe, bloom, "k", 1 << 16, 5)
    fp = flagged.filter(F.col("__might")).count()
    assert fp <= 40, f"false-positive rate {fp / 2000:.3%} exceeds 2%"


def test_bloom_incremental_matches_plain(spark):
    """Bit-identical output to the plain anti-join incremental dedup on
    the real corpus split (the residual anti-join preserves exactness)."""
    from g_data_pipeline_spark.catalog import load_table

    docs = load_table(spark, SF_DIR_ORACLE, "documents")
    batch = docs.filter(F.col("doc_id") % 4 == 0)
    history = docs.filter(F.col("doc_id") % 4 != 0)
    plain = {
        (r.doc_id, r.fingerprint)
        for r in incremental_dedup(batch, history, "text", "doc_id").collect()
    }
    bloomed = {
        (r.doc_id, r.fingerprint)
        for r in incremental_dedup_bloom(
            batch, history, "text", "doc_id"
        ).collect()
    }
    assert bloomed == plain and len(plain) > 0


def test_bloom_word_table_broadcasts(spark):
    """The Bloom word table joins the probe rows via broadcast — the
    probe side never shuffles for the membership check."""
    plan = plan_of(spark, "d_incremental_bloom")
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 1
    assert "CartesianProduct" not in plan
