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

def test_bucketed_dedup_directory_shuffles_batch_side_only(spark, tmp_path):
    """The scale claim every incremental-dedup docstring makes, proven in
    a plan: a window-hash DIRECTORY landed as a bucketed-by-h table joins
    a new dump's windows with NO Exchange on the directory side — only
    the (much smaller) batch side shuffles into the directory's
    bucketing. At 100 TB the directory never moves again after ingest."""
    import re

    from g_data_pipeline_spark.operators.dedup import (
        substring_window_directory,
    )

    W = 10
    words = lambda p, n: " ".join(f"{p}{k}" for k in range(n))  # noqa: E731
    history = spark.createDataFrame(
        [(i, words(f"h{i}", 30)) for i in range(20)],
        "doc_id long, text string",
    )
    directory = substring_window_directory(history, "doc_id", "text", W)
    land_bucketed(directory, "b_window_dir", "h", num_buckets=8)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        batch = spark.createDataFrame(
            [(100, words("h3", 30)), (101, words("z", 30))],
            "doc_id long, text string",
        )
        from g_data_pipeline_spark.functions.text import tokens

        tc = F.col("__toks")
        wins = F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(W - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tc, i, W))),
        )
        occ = batch.select(
            "doc_id", tokens(F.col("text")).alias("__toks")
        ).select("doc_id", F.explode(wins).alias("h"))
        hit = occ.join(spark.table("b_window_dir"), "h", "left_semi")
        plan = hit._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        # exactly ONE exchange: the batch side repartitioning into the
        # directory's bucketing; the directory side reads in place
        n_exchanges = len(set(re.findall(r"\((\d+)\) Exchange", plan)))
        assert n_exchanges == 1, plan
        # and the semantics hold: doc 100 (a copy of history doc 3) hits
        # on every window, doc 101 on none
        hits = {r.doc_id for r in hit.select("doc_id").distinct().collect()}
        assert hits == {100}
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_window_dir")
