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
