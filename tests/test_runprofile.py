"""Runtime operator metrics (operators/runprofile.py): the harvest must
walk through AQE wrappers to the real operators, report the numbers the
Spark UI shows (scan rows, shuffle bytes, spill), and the summary must
distinguish a shuffling plan from a shuffle-free one."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.runprofile import (
    executed_metrics,
    metrics_frame,
    profile_action,
    run_summary,
)

SF_DIR = "/root/testdata/sf0.001"


def test_grouped_agg_metrics(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    rows, metrics = profile_action(df)
    assert len(rows) == 5

    # the harvest reached THROUGH AdaptiveSparkPlanExec / QueryStageExec:
    nodes = {m.node for m in metrics}
    assert any(n.startswith("Scan") for n in nodes)
    assert "Exchange" in nodes
    assert "HashAggregate" in nodes

    # scan metrics report the true input volume
    scan_rows = [
        m.value
        for m in metrics
        if m.node.startswith("Scan") and m.metric == "numOutputRows"
    ]
    assert sum(scan_rows) == orders.count()

    # the group-by exchange moved the 5 partial rows
    shuffled = [
        m.value
        for m in metrics
        if m.node == "Exchange" and m.metric == "shuffleRecordsWritten"
    ]
    assert sum(shuffled) == 5

    s = run_summary(metrics)
    assert s["rows_scanned"] == orders.count()
    assert s["shuffle_bytes_written"] > 0
    assert s["spill_bytes"] == 0  # nothing spills at this size
    assert s["n_exchanges"] >= 1
    assert s["files_read"] >= 1


def test_shuffle_free_plan_reports_zero_shuffle(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = orders.where(F.col("o_totalprice") > 100.0).select("o_orderkey")
    df.collect()
    s = run_summary(executed_metrics(df))
    assert s["shuffle_bytes_written"] == 0
    assert s["n_exchanges"] == 0
    assert s["rows_scanned"] > 0


def test_metrics_frame_roundtrip(spark):
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    df = orders.groupBy("o_orderstatus").count()
    _, metrics = profile_action(df)
    frame = metrics_frame(spark, metrics)
    assert frame.columns == ["seq", "depth", "node", "metric", "label", "value"]
    got = frame.where(
        (F.col("node").startswith("Scan"))
        & (F.col("metric") == "numOutputRows")
    ).agg(F.sum("value")).collect()[0][0]
    assert got == orders.count()


def test_broadcast_join_has_no_shuffle_exchange(spark):
    """A broadcast join's only data movement is the broadcast — the
    summary separates that from shuffle traffic (the 100 TB triage
    question: 'did my small side actually broadcast?')."""
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    customer = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    df = orders.join(
        F.broadcast(customer), orders.o_custkey == customer.c_custkey
    ).select("o_orderkey", "c_name")
    _, metrics = profile_action(df)
    s = run_summary(metrics)
    assert s["shuffle_bytes_written"] == 0
    nodes = {m.node for m in metrics}
    assert any("BroadcastHashJoin" in n for n in nodes)
