"""Bucketed-table joins must be shuffle-free and value-correct."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.sources.bucketed import bucketed_join, land_bucketed
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, SF_DIR_SMOKE, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    orders = load_table(spark, SF_DIR_SMOKE, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    land_bucketed(li, "b_lineitem", "l_orderkey", num_buckets=8)
    land_bucketed(orders, "b_orders", "l_orderkey", num_buckets=8)
    yield "b_lineitem", "b_orders"
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    left, right = bucketed_tables
    # disable broadcast so the join strategy decision is about shuffles
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = bucketed_join(spark, left, right, "l_orderkey")
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        import re

        ops = {m.group(1): m.group(2) for m in re.finditer(r"\((\d+)\) (\w+)", plan)}
        assert "Exchange" not in ops.values(), "bucketed join must not shuffle"
        assert "SortMergeJoin" in ops.values()
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )


def test_bucketed_join_values_match_plain_join(spark, bucketed_tables):
    left, right = bucketed_tables
    got = bucketed_join(spark, left, right, "l_orderkey")
    li = load_table(spark, SF_DIR_SMOKE, "lineitem")
    orders = load_table(spark, SF_DIR_SMOKE, "orders")
    expected = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert got.count() == expected