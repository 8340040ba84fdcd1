"""The public plan-lint API (operators/planlint.py): clean plans pass,
each anti-pattern produces its finding, assert_clean raises with all of
them listed."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.planlint import (
    assert_clean,
    lint,
    plan_report,
)
from g_data_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_DIR_ORACLE


def test_clean_registry_query_lints_clean(spark):
    df = REGISTRY["j_q3_shipping_priority"].fn(spark, SF_DIR_ORACLE)
    assert lint(df) == []
    assert_clean(df)  # no raise
    report = plan_report(df)
    assert report["broadcast_joins"] >= 2
    assert report["shuffles"] == 1
    assert report["pushed_filters"], "scan filters must be visible"


def test_cartesian_flagged(spark):
    # tiny frames auto-broadcast into BroadcastNestedLoopJoin; disable the
    # threshold so the crossJoin plans a true CartesianProduct
    prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.range(10)
        b = spark.range(10).withColumnRenamed("id", "id2")
        findings = lint(a.crossJoin(b))
        assert any("CartesianProduct" in f for f in findings)
        with pytest.raises(AssertionError, match="CartesianProduct"):
            assert_clean(a.crossJoin(b))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)


def test_row_python_flagged_arrow_gated(spark):
    @F.udf("long")
    def plain_udf(x):
        return x + 1

    df = spark.range(10).select(plain_udf("id").alias("y"))
    assert any("BatchEvalPython" in f for f in lint(df))

    from g_data_pipeline_spark.operators.grouped import compression_ratio_udf

    adf = spark.createDataFrame([("abc",)], "t string").select(
        compression_ratio_udf()("t")
    )
    assert any("ArrowEvalPython" in f for f in lint(adf))
    assert lint(adf, allow_arrow=True) == []


def test_shuffle_budget_flagged(spark):
    df = (
        spark.range(100)
        .withColumn("g", F.col("id") % 10)
        .groupBy("g")
        .count()
        .withColumn("h", F.col("g") % 3)
        .groupBy("h")
        .sum("count")
    )
    assert lint(df, max_shuffles=0) and not lint(df, max_shuffles=8)
