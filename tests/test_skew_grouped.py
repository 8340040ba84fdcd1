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


def test_compression_ratio_bit_equal_to_local_zlib(spark):
    """The Arrow kernel must return EXACTLY len(zlib.compress(utf8,6))
    / len(utf8) — pinned bit-equal against driver-side zlib over the
    corpus sample plus adversarial literals (empty, None, non-ASCII,
    pathological repetition)."""
    import zlib

    from g_data_pipeline_spark.operators.grouped import compression_ratio_udf

    texts = [
        "the quick brown fox jumps over the lazy dog. " * 3,
        "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
        "",
        None,
        "héllo wörld — naïve café 東京",
        "x9f!Qz@7#mK$2pL%v8&wN*4rT(6yU)1iO",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "i long, t string")
    got = {
        r.i: r.ratio
        for r in df.select("i", compression_ratio_udf()("t").alias("ratio")).collect()
    }
    for i, t in enumerate(texts):
        if t is None:
            assert got[i] is None
        elif not t:
            assert got[i] == 0.0
        else:
            raw = t.encode("utf-8")
            assert got[i] == len(zlib.compress(raw, 6)) / len(raw)
    # ordering sanity: repetition compresses far below prose, junk above
    assert got[1] < got[0] < got[5]


def test_compression_signal_plan_arrow_only_no_shuffle(spark):
    """t_compression_signal plans ONE ArrowEvalPython node (never
    BatchEvalPython) and zero exchanges — a pure scan-side signal."""
    from g_data_pipeline_spark.queries import REGISTRY

    df = REGISTRY["t_compression_signal"].fn(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    import re

    assert "BatchEvalPython" not in plan
    # formatted explain prints each node twice (tree + detail section):
    # count distinct node ids, not substring occurrences
    assert len(set(re.findall(r"ArrowEvalPython \((\d+)\)", plan))) == 1
    assert "Exchange" not in plan
    out = df.limit(5).collect()
    assert out and all(r.flag in {"repetitive", "high_entropy", "ok"} for r in out)
