"""Skew primitives and the pandas-UDF/grouped-map surface."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.grouped import (
    scalar_pandas_udf_example,
    zscore_per_group,
)
from g_data_pipeline_spark.operators.skew import salted_agg, salted_join


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90%), long tail
    hot = spark.range(0, 9000).select(
        F.lit("hot").alias("k"), (F.col("id") % 100).cast("double").alias("v")
    )
    tail = spark.range(0, 1000).select(
        F.concat(F.lit("k"), (F.col("id") % 50).cast("string")).alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    return hot.union(tail)


def test_salted_agg_equals_plain_groupby(spark, skewed):
    plain = {
        (r.k): (r.s, r.n)
        for r in skewed.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    salted = {
        (r.k): (r.s, r.n)
        for r in salted_agg(
            skewed, ["k"], sums={"s": "v"}, count_alias="n", salt_buckets=16
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        assert salted[k][1] == plain[k][1]
        assert salted[k][0] == pytest.approx(plain[k][0], rel=1e-12)


def test_salted_join_equals_plain_join(spark, skewed):
    dim = spark.createDataFrame(
        [("hot", "HOT"), ("k1", "K1"), ("k2", "K2")], "k string, label string"
    )
    plain = skewed.join(dim, "k").groupBy("k", "label").count()
    salted = salted_join(skewed, dim, "k", salt_buckets=8).groupBy("k", "label").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_zscore_per_group_matches_numpy(spark):
    rows = [("a", float(v)) for v in [1, 2, 3, 4, 5]] + [("b", float(v)) for v in [10, 20, 30]]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {
        (r.g, r.v): r.zscore for r in zscore_per_group(df, ["g"], "v").collect()
    }
    a = np.array([1, 2, 3, 4, 5], dtype=float)
    exp = (a - a.mean()) / a.std(ddof=1)
    for v, e in zip(a, exp):
        assert got[("a", v)] == pytest.approx(e)


def test_zscore_degenerate_group_null(spark):
    df = spark.createDataFrame([("a", 5.0), ("a", 5.0)], "g string, v double")
    out = zscore_per_group(df, ["g"], "v").collect()
    assert all(r.zscore is None for r in out)  # zero variance -> null


def test_scalar_pandas_udf(spark):
    udf = scalar_pandas_udf_example()
    df = spark.createDataFrame([(9.0,), (99.0,)], "v double")
    got = [r.s for r in df.select(udf("v").alias("s")).collect()]
    assert got[0] == pytest.approx(1.0)  # log1p(9)/log(10) = 1
    assert got[1] == pytest.approx(2.0)
