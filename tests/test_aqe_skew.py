"""AQE runtime skew handling, pinned.

The repo ships two answers to skewed shuffle keys: explicit salting
(operators/skew.py — for aggregations and for joins where the skew is
known ahead of time) and Spark's ADAPTIVE skew-join splitting, which
session.py enables by default (spark.sql.adaptive.skewJoin.enabled) and
which the 100 TB story leans on for UNFORESEEN skew. This test pins that
the adaptive path actually engages under this session's configuration:
a planted hot key makes one shuffle partition dominate, and after
execution the final adaptive plan must show the skew=true sort-merge
join with the hot partition split into multiple reader slices.

Thresholds are lowered to make "skewed" reachable at test scale —
the point pinned is the MECHANISM (config on -> OptimizeSkewedJoin
rewrites the join), not the default byte thresholds.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_CONF = {
    # force a sort-merge join: broadcast would hide the shuffle entirely
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    # make the planted hot partition qualify as skewed at ~1 MB scale
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "50k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    # keep coalescing from re-merging the split slices
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1k",
}


def test_adaptive_skew_join_splits_hot_partition(spark):
    saved = {k: spark.conf.get(k, None) for k in _CONF}
    try:
        for k, v in _CONF.items():
            spark.conf.set(k, v)
        # The payload must be non-constant (a literal constant-folds out of
        # sum(length(...)) and is pruned from the shuffle) AND incompressible
        # (skew detection reads COMPRESSED map-output sizes — an 'xxx…x'
        # payload lz4-compresses to nothing and the hot partition never
        # crosses the threshold). Four sha2 hashes per row do both.
        left = (
            spark.range(0, 8000)
            .withColumn(
                # 90% of rows on key 0, the rest spread over 50 keys
                "k",
                F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(
                    (F.col("id") % 50) + 1
                ),
            )
            .withColumn(
                "payload",
                F.concat(
                    *[
                        F.sha2((F.col("id") * i).cast("string"), 256)
                        for i in range(1, 5)
                    ]
                ),
            )
        )
        right = spark.range(0, 51).withColumnRenamed("id", "k").withColumn(
            "r_val", F.col("k") * 10
        )
        # Global aggregate downstream: a groupBy on the join key would make
        # AQE SKIP the skew rewrite (splitting the hot partition breaks the
        # hash partitioning the grouping wants to reuse) — a correct and
        # deliberate Spark behavior worth knowing when debugging "why
        # didn't my join split".
        joined = left.join(right, "k").agg(
            F.count("*").alias("n"),
            F.sum(F.length("payload")).alias("payload_bytes"),
        )
        row = joined.collect()[0]
        assert row["n"] == 8000  # correctness unaffected by the rewrite
        assert row["payload_bytes"] == 8000 * 4 * 64
        final_plan = str(joined._jdf.queryExecution().executedPlan())
        assert "skew=true" in final_plan, final_plan[:2000]
        assert "skewed" in final_plan  # AQEShuffleRead … skewed slices
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
