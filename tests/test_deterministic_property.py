"""Property tests (hypothesis) for the scaled-long deterministic sums:
for any list of <=2dp-valued doubles, dsum must equal the EXACT rational
sum, independent of partitioning."""

from __future__ import annotations

from fractions import Fraction

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from g_data_pipeline_spark.functions.deterministic import dsum


def cents(draw_max: int = 10**7):
    # doubles that are exactly k/100 — the money/quantity domain
    return st.integers(min_value=-draw_max, max_value=draw_max).map(
        lambda k: k / 100.0
    )


@settings(max_examples=15, deadline=None)
@given(st.lists(cents(), min_size=1, max_size=300), st.integers(1, 8))
def test_dsum_equals_exact_rational_sum(spark, values, partitions):
    df = spark.createDataFrame(
        [(v,) for v in values], "v double"
    ).repartition(partitions)
    got = df.agg(dsum("v").alias("s")).collect()[0].s
    exact = sum(Fraction(round(v * 100), 100) for v in values)
    assert got == pytest.approx(float(exact), abs=0)  # bit-exact


@settings(max_examples=10, deadline=None)
@given(st.lists(st.integers(0, 3_000_000).map(lambda k: k / 100.0),
                min_size=1, max_size=200))
def test_dsum_split_mode_equals_plain(spark, values):
    # squares-scale values: split accumulation must equal non-split exactly
    df = spark.createDataFrame([(v,) for v in values], "v double")
    plain = df.agg(dsum("v", scale=4).alias("s")).collect()[0].s
    split = df.agg(dsum("v", scale=4, split=True).alias("s")).collect()[0].s
    assert split == pytest.approx(plain, abs=0)
