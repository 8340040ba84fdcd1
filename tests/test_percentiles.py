"""Distributed exact percentiles must equal F.percentile bit-for-bit."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.percentiles import (
    exact_percentiles_distributed,
)
from tests.conftest import SF_DIR_ORACLE

PCTS = [0.25, 0.5, 0.75, 0.9]


def test_matches_builtin_exact_percentile(spark):
    li = load_table(spark, SF_DIR_ORACLE, "lineitem")
    got = exact_percentiles_distributed(li, "l_extendedprice", PCTS, num_partitions=16)
    exp_row = li.agg(
        F.percentile(F.col("l_extendedprice"), F.array(*[F.lit(p) for p in PCTS]))
    ).collect()[0][0]
    for p, e in zip(PCTS, exp_row):
        assert got[p] == e  # bit-for-bit, not approx


def test_small_and_edge_inputs(spark):
    df = spark.createDataFrame([(1.0,), (2.0,), (None,)], "v double")
    got = exact_percentiles_distributed(df, "v", [0.0, 0.5, 1.0], num_partitions=4)
    assert got[0.0] == 1.0 and got[1.0] == 2.0 and got[0.5] == 1.5
    empty = spark.createDataFrame([], "v double")
    assert exact_percentiles_distributed(empty, "v", [0.5]) == {0.5: None}


def test_skewed_partitioning_still_exact(spark):
    # heavy duplication: range partitioner sees few distinct values
    df = spark.range(0, 10000).select((F.col("id") % 3).cast("double").alias("v"))
    got = exact_percentiles_distributed(df, "v", [0.5], num_partitions=8)
    exp = df.agg(F.percentile("v", F.lit(0.5))).collect()[0][0]
    assert got[0.5] == exp


# ------------------------- round-6 scale kernels -------------------------


def test_bucketed_running_sum_matches_global_window(spark):
    """Two-phase prefix sum == the single-partition window it replaces,
    on keys that straddle bucket boundaries and buckets with gaps."""
    from pyspark.sql import Window

    from g_data_pipeline_spark.operators.windows import bucketed_running_sum

    rows = [(k, (k * 37) % 11 - 5) for k in range(0, 5000, 3)]
    df = spark.createDataFrame(rows, "k long, v long")
    got = {
        r.k: r.run
        for r in bucketed_running_sum(
            df, "k", "v", "run", bucket_width=100
        ).collect()
    }
    w = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.k: r.run
        for r in df.select("k", F.sum("v").over(w).alias("run")).collect()
    }
    assert got == want


def test_grouped_weighted_lower_median_matches_window_form(spark):
    """Bucketed weighted-selection kernel == the per-row cumulative
    formulation (the oracle's shape), including weight ties, duplicate
    values, and a single-row group."""
    from pyspark.sql import Window

    from g_data_pipeline_spark.operators.percentiles import (
        grouped_weighted_lower_median,
    )

    rows = []
    for i in range(2000):
        rows.append(("a", (i * 17) % 400, 1 + (i % 5)))
        rows.append(("b", (i * 29) % 97, 1 + (i % 3)))
    rows.append(("solo", 42, 7))
    df = spark.createDataFrame(rows, "g string, v long, w long")

    got = {
        r.g: (r.total_weight, r.wmedian)
        for r in grouped_weighted_lower_median(
            df, ["g"], "v", "w", bucket_width=13
        ).collect()
    }

    wcum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wtot = Window.partitionBy("g")
    c = df.select(
        "g",
        "v",
        F.sum("w").over(wcum).alias("cw"),
        F.sum("w").over(wtot).alias("tw"),
    )
    want = {
        r.g: (r.tw, r.v)
        for r in c.filter(F.lit(2) * F.col("cw") >= F.col("tw"))
        .groupBy("g")
        .agg(F.min("tw").alias("tw"), F.min("v").alias("v"))
        .collect()
    }
    assert got == want


def test_bucketed_row_index_matches_row_number(spark):
    """Two-phase row index == native row_number over a total order, for
    ascending, descending+partitioned, and composite-bucket forms."""
    from pyspark.sql import Window

    from g_data_pipeline_spark.operators.windows import (
        bucketed_row_index,
        ntile_from_index,
    )

    rows = [(i, (i * 37) % 500 - 250, (i * 13) % 7) for i in range(4321)]
    df = spark.createDataFrame(rows, "id long, v long, grp int")

    out = bucketed_row_index(
        df,
        [("v", True), ("id", True)],
        [(F.floor(F.col("v") / F.lit(64)), True)],
    )
    w = Window.orderBy("v", "id")
    ref = df.withColumn("rn", F.row_number().over(w)).withColumn(
        "nt", F.ntile(7).over(w)
    )
    got = {r.id: (r["__rn"], r["__total"]) for r in out.collect()}
    want = {r.id: r.rn for r in ref.collect()}
    assert all(got[i][0] == want[i] for i in want)
    assert all(got[i][1] == 4321 for i in got)

    # ntile_from_index == native NTILE (and for total < n)
    out2 = out.withColumn(
        "nt", ntile_from_index(F.col("__rn"), F.col("__total"), 7)
    )
    assert {r.id: r.nt for r in out2.collect()} == {
        r.id: r.nt for r in ref.collect()
    }
    small = spark.createDataFrame([(i,) for i in range(3)], "id long")
    o = bucketed_row_index(
        small, [("id", True)], [(F.floor(F.col("id") / F.lit(2)), True)]
    ).withColumn("nt", ntile_from_index(F.col("__rn"), F.col("__total"), 7))
    ws = Window.orderBy("id")
    rs = small.withColumn("nt", F.ntile(7).over(ws))
    assert {r.id: r.nt for r in o.collect()} == {
        r.id: r.nt for r in rs.collect()
    }

    # descending + group partition + exact-value leading bucket
    out3 = bucketed_row_index(
        df,
        [("v", False), ("id", True)],
        [(F.floor(F.col("v") / F.lit(32)), False)],
        partition_cols=("grp",),
    )
    wd = Window.partitionBy("grp").orderBy(F.desc("v"), "id")
    refd = df.withColumn("rn", F.row_number().over(wd))
    assert {r.id: r["__rn"] for r in out3.collect()} == {
        r.id: r.rn for r in refd.collect()
    }


def test_bucketed_running_sum_descending_with_tiebreak(spark):
    from pyspark.sql import Window

    from g_data_pipeline_spark.operators.windows import bucketed_running_sum

    rows = [(i, (i * 37) % 97, (i * 11) % 5 + 1) for i in range(3000)]
    df = spark.createDataFrame(rows, "id long, v long, w long")
    got = {
        r.id: r.run
        for r in bucketed_running_sum(
            df,
            "v",
            "w",
            "run",
            bucket_width=10,
            ascending=False,
            tiebreak_cols=("id",),
        ).collect()
    }
    win = Window.orderBy(F.desc("v"), "id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r.id: r.run
        for r in df.select(
            "id", F.sum("w").over(win).alias("run")
        ).collect()
    }
    assert got == want


def test_bucketed_kernels_survive_extreme_bucket_skew(spark):
    """A single hot bucket (80% of rows share one order value) must not
    break correctness: ties are interchangeable for running sums keyed on
    the value, and the row index stays a permutation. (Parallelism within
    the hot bucket is bounded by its tie block — the documented trade;
    choose finer widths or composite buckets when the leading key is
    low-cardinality, as t_curriculum_bins does.)"""
    from pyspark.sql import Window

    from g_data_pipeline_spark.operators.windows import (
        bucketed_row_index,
        bucketed_running_sum,
    )

    rows = [(i, 500 if i % 5 != 0 else (i * 7) % 400, 1 + i % 3) for i in range(4000)]
    df = spark.createDataFrame(rows, "id long, v long, w long")

    got = {
        r.id: r.run
        for r in bucketed_running_sum(
            df, "v", "w", "run", bucket_width=64, tiebreak_cols=("id",)
        ).collect()
    }
    win = Window.orderBy("v", "id").rowsBetween(Window.unboundedPreceding, 0)
    want = {
        r.id: r.run
        for r in df.select("id", F.sum("w").over(win).alias("run")).collect()
    }
    assert got == want

    idx = bucketed_row_index(
        df,
        [("v", True), ("id", True)],
        [(F.floor(F.col("v") / F.lit(64)), True)],
    )
    wn = Window.orderBy("v", "id")
    ref = {r.id: r.rn for r in df.withColumn("rn", F.row_number().over(wn)).collect()}
    assert {r.id: r["__rn"] for r in idx.collect()} == ref
