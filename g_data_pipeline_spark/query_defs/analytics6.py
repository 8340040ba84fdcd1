"""Analytics wave 6 (round 3, post-window additions): moving-average
window frames, grouped exact medians, fixed-width histograms, and
deterministic shard assignment — the remaining everyday analytics/
curation shapes not yet covered by a registry entry.

Registered AFTER the 50-slot driver window this round (the window is full
with never-graded entries); all are sim-gated now and rotate into the
driver window in round 4 (see ROTATION.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.sampling import (
    hash_bucket_expr,
    sql_hash_bucket,
)
from g_data_pipeline_spark.queries import register


@register(
    "w_moving_avg",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) OVER w
                AS DOUBLE) / 100.0
             / COUNT(*) OVER w AS mavg_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def w_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-order trailing moving average of order value per customer — the
    time-series smoothing frame (ROWS BETWEEN k PRECEDING AND CURRENT ROW).
    The 2-decimal prices sum exactly as scaled longs inside the frame, so
    the average is one deterministic double division — no float
    accumulation order to disagree on. One shuffle (customer partition)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-6, 0)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        (
            (F.sum(cents).over(w).cast("double") / F.lit(100.0))
            / F.count(F.lit(1)).over(w)
        ).alias("mavg_price"),
    )


@register(
    "p_grouped_median",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           QUANTILE_CONT(l_extendedprice, 0.5) AS median_price,
           QUANTILE_CONT(l_extendedprice, 0.9) AS p90_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
)
def p_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolated median + p90 PER GROUP (the profiler's
    percentile kernel generalized from whole-table to grouped form) —
    distribution drift checks per segment. Same scale caveat as the global
    exact percentile (values held per group buffer), same documented
    escape hatches (approx/distributed)."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    # one array-percentile buffer per group (two scalar F.percentile exprs
    # would hold the group's values twice — see a_equidepth_histogram)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.percentile(price, F.array(F.lit(0.5), F.lit(0.9))).alias("ps"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            F.col("ps")[0].alias("median_price"),
            F.col("ps")[1].alias("p90_price"),
            "n_rows",
        )
    )


@register(
    "p_histogram",
    oracle="""
    WITH rng AS (
      SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
      FROM lineitem
    )
    SELECT LEAST(CAST(floor((l_extendedprice - lo)
                            / ((hi - lo) / 20.0)) AS BIGINT),
                 19) AS bucket,
           COUNT(*) AS n,
           MIN(l_extendedprice) AS lo_seen,
           MAX(l_extendedprice) AS hi_seen
    FROM lineitem CROSS JOIN rng
    GROUP BY 1
    """,
)
def p_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width 20-bucket histogram of a numeric column (min/max from a
    broadcast single-row pre-aggregate; top edge clamped into the last
    bucket). The distribution-visualization primitive behind V1-style bar
    specs at any scale: two scans (tiny agg + bucketed count), bucket
    arithmetic identical double ops on both engines."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("x")
    )
    rng = li.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    width = (F.col("hi") - F.col("lo")) / F.lit(20.0)
    bucket = F.least(
        F.floor((F.col("x") - F.col("lo")) / width).cast("long"), F.lit(19)
    )
    return (
        li.crossJoin(F.broadcast(rng))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("x").alias("lo_seen"),
            F.max("x").alias("hi_seen"),
        )
    )


_SHARD = "16"


@register(
    "t_shard_stats",
    oracle=f"""
    SELECT ({sql_hash_bucket(['doc_id'], seed='shard-v1')}) % {_SHARD}
             AS shard,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1
    """,
)
def t_shard_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment for corpus export (md5-bucket of the
    doc id -> 16 shards; layout/engine-invariant like the sampling splits)
    with per-shard volume stats — the balance check before writing sharded
    training files. Scan + one tiny agg; at 100 TB the same expression is
    the ``partitionBy`` column of the writer."""
    docs = load_table(spark, sf_dir, "documents")
    shard = (hash_bucket_expr(["doc_id"], seed="shard-v1") % 16).alias("shard")
    return docs.groupBy(shard).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("total_chars"),
    )
