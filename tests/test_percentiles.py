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
