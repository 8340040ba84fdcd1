"""Distributed EXACT percentiles via range partitioning + order statistics.

``F.percentile`` (exact, linear interpolation) materializes every value of
the column in one aggregation buffer — fine at bench scale, impossible at
100 TB. ``percentile_approx`` scales but breaks oracle equality. This
operator is the scale path that stays EXACT:

1. one count of non-null values  ->  global positions h_p = (n-1)*p;
   the percentile needs the order statistics at floor(h_p) and ceil(h_p);
2. ``repartitionByRange`` on the column (Spark samples the column to build
   range bounds — data distributes by VALUE, so partitions are globally
   ordered) + ``sortWithinPartitions``;
3. per-partition row counts (a tiny aggregation) -> driver computes, per
   needed global index, which partition holds it and at what local offset
   (prefix sums over ~hundreds of numbers);
4. a per-partition ``row_number`` window (partitioned by
   ``spark_partition_id`` — NO global shuffle, the sort from step 2 is
   reused) + a broadcast semi-filter picks out the <= 2*len(pcts) rows;
5. linear interpolation driver-side:  v = lo + (h - floor(h)) * (hi - lo).

Total cost: one count + one range shuffle + one pruned pass — every stage
is fully parallel, per-executor memory is one partition of one column.
Matches ``F.percentile``/DuckDB ``quantile_cont`` bit-for-bit (same order
statistics, same interpolation arithmetic).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def exact_percentiles_distributed(
    df: DataFrame,
    col: str,
    pcts: list[float],
    num_partitions: int | None = None,
) -> dict[float, float | None]:
    """Exact linear-interpolated percentiles of ``df[col]``, scalably."""
    from g_data_pipeline_spark.operators.runprofile import tap_action

    vals = df.select(F.col(col).cast("double").alias("v")).filter(
        F.col("v").isNotNull()
    )
    # agg+collect (not .count(), which plans its own QueryExecution) so
    # the runtime-metrics tap can harvest this action's executed plan
    n_plan = vals.agg(F.count(F.lit(1)).alias("n"))
    n = n_plan.collect()[0]["n"]
    tap_action(n_plan)
    if n == 0:
        return {p: None for p in pcts}

    # global indices required (0-based order statistics)
    need: set[int] = set()
    pos: dict[float, float] = {}
    for p in pcts:
        h = (n - 1) * p
        pos[p] = h
        need.add(int(h))
        need.add(min(int(h) + 1, n - 1))

    parts = num_partitions or max(df.rdd.getNumPartitions(), 1)
    ranged = vals.repartitionByRange(parts, "v").sortWithinPartitions("v")
    with_pid = ranged.withColumn("pid", F.spark_partition_id())
    # cache: step 3's counts and step 4's pick read the same ranged data
    with_pid.persist()
    try:
        counts_plan = with_pid.groupBy("pid").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        counts = dict((r.pid, r.cnt) for r in counts_plan.collect())
        tap_action(counts_plan)
        # prefix sums -> (pid, local 1-based rank) for each needed index
        targets: list[tuple[int, int, int]] = []  # (global_idx, pid, local_rn)
        for g in sorted(need):
            acc = 0
            for pid in sorted(counts):
                if g < acc + counts[pid]:
                    targets.append((g, pid, g - acc + 1))
                    break
                acc += counts[pid]

        w = Window.partitionBy("pid").orderBy("v")
        pick_plan = with_pid.withColumn(
            "rn", F.row_number().over(w)
        ).join(
            F.broadcast(
                with_pid.sparkSession.createDataFrame(
                    [(pid, rn) for _, pid, rn in targets], "pid int, rn int"
                )
            ),
            ["pid", "rn"],
        )
        picked = pick_plan.collect()
        tap_action(pick_plan)
    finally:
        with_pid.unpersist()

    by_local = {(r.pid, r.rn): r.v for r in picked}
    by_global = {g: by_local[(pid, rn)] for g, pid, rn in targets}

    out: dict[float, float | None] = {}
    for p in pcts:
        h = pos[p]
        lo = by_global[int(h)]
        hi = by_global[min(int(h) + 1, n - 1)]
        out[p] = lo + (h - int(h)) * (hi - lo)
    return out


def grouped_weighted_lower_median(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    weight_col: str,
    bucket_width: int,
) -> DataFrame:
    """Per-group LOWER WEIGHTED MEDIAN — the smallest value whose
    cumulative weight reaches half the group total (2*cumw >= totw) —
    without ever sorting a fact-sized frame under a low-cardinality
    partition key (the 3-partition window sort this replaces caps
    parallelism at #groups whatever the cluster size).

    Weighted extension of the range-partitioned order-statistics idea
    above, fully lazy (no driver actions):

    1. reduce to one row per (group, value): ``wv = sum(weight)`` — a
       map-side-combinable shuffle on the HIGH-cardinality composite key;
       ties collapse here, so no tiebreak column is ever needed;
    2. bucket values by ``floor(value / bucket_width)`` (a pure function
       of the value — deterministic, no physical-partitioning coupling);
       per-(group, bucket) weight totals are a tiny second reduce;
    3. per-group windows over the BUCKET TOTALS (#buckets rows, bounded
       by the value span / bucket_width, not the data volume) yield each
       bucket's preceding-weight offset and the group total;
    4. broadcast the offsets back; a per-(group, bucket) local window
       completes the exact cumulative weight; filter + min picks the
       median value.

    Every fact-sized stage shuffles on (group, value) or (group, bucket)
    — parallelism scales with value cardinality, not group count.
    Output: (*group_cols, total_weight, wmedian) with the input column
    types preserved.
    """
    g = list(group_cols)
    per_v = df.groupBy(*g, value_col).agg(F.sum(weight_col).alias("__wv"))
    per_v = per_v.withColumn(
        "__bkt", F.floor(F.col(value_col) / F.lit(int(bucket_width)))
    )
    btot = per_v.groupBy(*g, "__bkt").agg(F.sum("__wv").alias("__btot"))
    w_off = (
        Window.partitionBy(*g)
        .orderBy("__bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*g)
    offs = btot.select(
        *g,
        "__bkt",
        F.coalesce(F.sum("__btot").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__btot").over(w_all).alias("__tw"),
    )
    w_loc = (
        Window.partitionBy(*g, "__bkt")
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = per_v.join(F.broadcast(offs), [*g, "__bkt"]).withColumn(
        "__cw", F.sum("__wv").over(w_loc) + F.col("__off")
    )
    return (
        cum.filter(F.lit(2) * F.col("__cw") >= F.col("__tw"))
        .groupBy(*g)
        .agg(
            F.min("__tw").alias("total_weight"),
            F.min(value_col).alias("wmedian"),
        )
    )
