"""Join-strategy advisor (operators/advisor.py): each regime must be
chosen from the evidence AND execute with the plan shape it promised.
Result parity across all three strategies is pinned on the same data."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.advisor import (
    JoinAdvice,
    advise_join,
    apply_advice,
    key_skew_multiple,
    plan_size_bytes,
)


def _fact(spark, skewed: bool):
    k = (
        F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id") % 50)
        if skewed
        else F.col("id") % 50
    )
    return spark.range(0, 20000).select(
        k.alias("k"), (F.col("id") * 2).alias("v")
    )


def _dim(spark):
    return spark.range(0, 50).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("d")
    )


def _plan(df):
    return str(df._jdf.queryExecution().executedPlan())


def test_small_dim_gets_broadcast(spark):
    fact, dim = _fact(spark, skewed=False), _dim(spark)
    advice = advise_join(fact, dim, "k")
    assert advice.strategy == "broadcast"
    assert advice.skew_multiple is None  # no probe pass was paid
    joined = apply_advice(fact, dim, "k", advice)
    assert joined.count() == 20000
    assert "BroadcastHashJoin" in _plan(joined)


def test_big_even_sides_get_sort_merge(spark):
    fact, dim = _fact(spark, skewed=False), _dim(spark)
    # force the "both sides too big" regime with a tiny budget
    advice = advise_join(fact, dim, "k", broadcast_bytes=1)
    assert advice.strategy == "sort_merge"
    assert advice.skew_multiple is not None and advice.skew_multiple < 4
    joined = apply_advice(fact, dim, "k", advice)
    assert joined.count() == 20000
    p = _plan(joined)
    assert "SortMergeJoin" in p and "__salt" not in p


def test_skewed_fact_gets_salted(spark):
    fact, dim = _fact(spark, skewed=True), _dim(spark)
    advice = advise_join(fact, dim, "k", broadcast_bytes=1)
    assert advice.strategy == "salted"
    assert advice.skew_multiple >= 4
    joined = apply_advice(fact, dim, "k", advice)
    assert joined.count() == 20000
    assert "__salt" in _plan(joined)


def test_all_strategies_agree_on_results(spark):
    fact, dim = _fact(spark, skewed=True), _dim(spark)
    base = None
    for strategy in ["broadcast", "sort_merge", "salted"]:
        advice = JoinAdvice(strategy, "forced", 0, 0, None, 16)
        rows = sorted(
            (r["k"], r["v"], r["d"])
            for r in apply_advice(fact, dim, "k", advice).collect()
        )
        if base is None:
            base = rows
        else:
            assert rows == base, strategy


def test_evidence_helpers(spark):
    fact = _fact(spark, skewed=True)
    assert plan_size_bytes(fact) > 0
    # hot key holds 90% of rows; multiple ≈ 0.9 × shuffle partitions
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert key_skew_multiple(fact, "k") > 0.8 * parts
    even = _fact(spark, skewed=False)
    assert key_skew_multiple(even, "k") < 0.1 * parts + 2


def test_suggest_shuffle_partitions(spark):
    from g_data_pipeline_spark.operators.advisor import (
        suggest_shuffle_partitions,
    )

    small = spark.range(0, 10)
    assert suggest_shuffle_partitions(small) == 1
    big = _fact(spark, skewed=False)
    # ~20k rows of 16B: still under one 128MB target
    assert suggest_shuffle_partitions(big) == 1
    # shrink the target to force scaling, and check the ceiling division
    est_driven = suggest_shuffle_partitions(big, target_partition_bytes=1024)
    assert est_driven > 100
    assert suggest_shuffle_partitions(
        big, target_partition_bytes=1024, max_partitions=64
    ) == 64


def test_cms_point_estimates_exact_on_planted(spark):
    """Point queries: exact on a low-collision fixture (est == true), and
    the one-sided guarantee est >= true must hold for EVERY key."""
    from g_data_pipeline_spark.operators.advisor import (
        cms_point_estimate,
        cms_sketch,
        cms_total_count,
    )

    df = spark.createDataFrame(
        [(i % 7,) for i in range(1000)], "k long"
    )
    s = cms_sketch(df, "k", eps=0.001, confidence=0.99, seed=7)
    assert cms_total_count(s) == 1000
    est = cms_point_estimate(s, list(range(9)))
    true = {k: (1000 // 7) + (1 if k < 1000 % 7 else 0) for k in range(7)}
    true.update({7: 0, 8: 0})
    assert est == true  # eps small enough: no collisions on 7 keys


def test_cms_join_size_upper_bound_and_accuracy(spark):
    """Join-size estimate: >= the exact inner-join output count, within
    eps*|A|*|B| above it — and near-exact at this scale."""
    from g_data_pipeline_spark.operators.advisor import (
        cms_join_size_estimate,
        cms_sketch,
    )

    a = spark.createDataFrame([(i % 50,) for i in range(2000)], "k long")
    b = spark.createDataFrame([(i % 80,) for i in range(1200)], "k long")
    exact = a.join(b, "k").count()
    sa = cms_sketch(a, "k", eps=0.001, confidence=0.99, seed=7)
    sb = cms_sketch(b, "k", eps=0.001, confidence=0.99, seed=7)
    est = cms_join_size_estimate(sa, sb)
    assert exact <= est <= exact + 0.001 * 2000 * 1200
    # string keys work too: the hash lives JVM-side on both sketches
    a_s = a.select(F.concat(F.lit("u"), "k").alias("k"))
    b_s = b.select(F.concat(F.lit("u"), "k").alias("k"))
    est_s = cms_join_size_estimate(
        cms_sketch(a_s, "k", eps=0.001, confidence=0.99, seed=7),
        cms_sketch(b_s, "k", eps=0.001, confidence=0.99, seed=7),
    )
    assert exact <= est_s <= exact + 0.001 * 2000 * 1200


def test_cms_mismatched_sketches_raise(spark):
    from g_data_pipeline_spark.operators.advisor import (
        cms_join_size_estimate,
        cms_sketch,
    )
    import pytest as _pytest

    df = spark.createDataFrame([(1,)], "k long")
    s1 = cms_sketch(df, "k", seed=1)
    s2 = cms_sketch(df, "k", seed=2)
    with _pytest.raises(ValueError, match="not comparable"):
        cms_join_size_estimate(s1, s2)
