"""Layout-invariance pins: the md5-hash-bucket family (sampling, splits,
weighted sampling, shard assignment) claims the SAME rows survive under any
partitioning — the property random()/rand(seed)-based sampling lacks (rand
is seeded per partition, so a repartition changes the sample). Verify by
recomputing under adversarial repartitionings and comparing exact row sets."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_DIR_SMOKE


def _rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_weighted_sample_layout_invariant(spark):
    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    fn = REGISTRY["t_weighted_sample"].fn
    base = _rows(fn(spark, SF_DIR_SMOKE), ["doc_id"])
    # same query over adversarial layouts: single partition and a salted
    # 13-way shuffle (exercises different task boundaries / row orders)
    for repartitioned in (docs.repartition(1), docs.repartition(13, "source")):
        # rebuild the same filter over the re-laid-out frame
        from g_data_pipeline_spark.functions.text import token_count
        from g_data_pipeline_spark.operators.sampling import hash_bucket_expr

        ntok = token_count(F.col("text")).cast("bigint")
        weight = F.least(F.lit(1000000).cast("bigint"), ntok * F.lit(12500))
        got = _rows(
            repartitioned.select("doc_id", weight.alias("w")).filter(
                hash_bucket_expr(["doc_id"], seed="wsample-v1") < F.col("w")
            ),
            ["doc_id"],
        )
        assert got == base


def test_split_assignment_layout_invariant(spark):
    from g_data_pipeline_spark.operators.sampling import hash_bucket_expr

    docs = load_table(spark, SF_DIR_SMOKE, "documents")
    b = hash_bucket_expr(["doc_id"], seed="split-v1")
    split = (
        F.when(b < 800000, F.lit("train"))
        .when(b < 900000, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    base = _rows(docs.select("doc_id", split.alias("s")), ["doc_id", "s"])
    for repartitioned in (docs.repartition(1), docs.repartition(17)):
        got = _rows(
            repartitioned.select("doc_id", split.alias("s")), ["doc_id", "s"]
        )
        assert got == base


def test_rand_seed_is_not_layout_invariant_baseline(spark):
    """Negative control documenting WHY the md5 family exists: F.rand(seed)
    values change under repartition (per-partition seeding), so a
    rand-based sample would not be reproducible across layouts."""
    docs = load_table(spark, SF_DIR_SMOKE, "documents").select("doc_id")
    a = _rows(
        docs.repartition(2).withColumn("r", F.rand(seed=7) < 0.5).filter("r"),
        ["doc_id"],
    )
    b = _rows(
        docs.repartition(9).withColumn("r", F.rand(seed=7) < 0.5).filter("r"),
        ["doc_id"],
    )
    # not asserting inequality strictly (vanishingly unlikely to collide,
    # but the CONTRACT is only that md5 buckets are stable) — document the
    # observed instability when it occurs, require stability never breaks:
    assert a != b or len(a) == 0


def test_deterministic_shuffle_layout_and_epoch_properties(spark):
    """deterministic_shuffle: identical (shard, order) under any input
    partitioning; epochs give different permutations; shards balanced."""
    from g_data_pipeline_spark.catalog import load_table
    from g_data_pipeline_spark.operators.sampling import deterministic_shuffle

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )

    def order_of(df, epoch):
        out = deterministic_shuffle(df, ["doc_id"], epoch=epoch, n_shards=8)
        rows = out.select("shard", "shuffle_pos", "doc_id").collect()
        return sorted((r.shard, r.shuffle_pos, r.doc_id) for r in rows)

    base = order_of(docs, 0)
    assert order_of(docs.repartition(17), 0) == base
    assert order_of(docs.coalesce(1), 0) == base

    # a different epoch is a genuinely different permutation of the SAME rows
    e1 = order_of(docs, 1)
    assert [t[2] for t in base] != [t[2] for t in e1]
    assert sorted(t[2] for t in base) == sorted(t[2] for t in e1)

    # shards are reasonably balanced (md5/xxhash uniformity)
    from collections import Counter

    sizes = Counter(t[0] for t in base)
    n = sum(sizes.values())
    assert len(sizes) == 8
    assert max(sizes.values()) < 2.0 * n / 8

    # within-shard order is by shuffle_pos (the dataloader contract)
    out = deterministic_shuffle(docs, ["doc_id"], epoch=0, n_shards=4)
    for pid_rows in out.select("shard", "shuffle_pos").rdd.glom().collect():
        keys = [(r.shard, r.shuffle_pos) for r in pid_rows]
        assert keys == sorted(keys)
