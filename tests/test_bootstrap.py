"""Poisson-bootstrap CIs (operators/bootstrap.py): statistical sanity
(coverage vs the exact normal SE on a known series), determinism by
seed, Poisson(1)-weight distribution, and the B×groups-only shuffle
shape."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators import bootstrap
from g_data_pipeline_spark.operators.planlint import plan_report

SF = "/root/testdata/sf0.01"


def test_ci_brackets_mean_and_tracks_se(spark):
    """On customer acctbal: the CI must bracket the sample mean and have
    width within 2x of the CLT width (bootstrap != normal, but at n~1500
    they agree closely)."""
    cust = load_table(spark, SF, "customer")
    r = bootstrap.bootstrap_mean_ci(
        cust, "c_acctbal", key_cols=["c_custkey"], n_replicas=200, seed=11
    ).collect()[0]
    stats = cust.agg(
        F.avg("c_acctbal").alias("m"),
        F.stddev_samp("c_acctbal").alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    se = stats["s"] / math.sqrt(stats["n"])
    assert r["ci_lo"] < stats["m"] < r["ci_hi"]
    width = r["ci_hi"] - r["ci_lo"]
    clt = 2 * 1.96 * se
    assert 0.5 * clt < width < 2.0 * clt
    assert r["n_rows"] == stats["n"]


def test_ci_deterministic_and_seed_sensitive(spark):
    cust = load_table(spark, SF, "customer")

    def run(seed):
        r = bootstrap.bootstrap_mean_ci(
            cust,
            "c_acctbal",
            key_cols=["c_custkey"],
            n_replicas=100,
            seed=seed,
        ).collect()[0]
        return (r["ci_lo"], r["ci_hi"])

    assert run(3) == run(3)
    assert run(3) != run(4)


def test_grouped_ci_per_segment(spark):
    cust = load_table(spark, SF, "customer")
    rows = bootstrap.bootstrap_mean_ci(
        cust,
        "c_acctbal",
        key_cols=["c_custkey"],
        group_cols=["c_mktsegment"],
        n_replicas=100,
        seed=5,
    ).collect()
    assert len(rows) == 5
    for r in rows:
        assert r["ci_lo"] < r["mean"] < r["ci_hi"]


def test_poisson_weights_distribution(spark):
    """The hash-derived weights must actually look like Poisson(1):
    mean ~ 1, var ~ 1, P(0) ~ 1/e over a large sample."""
    n = 200_000
    df = spark.range(n).select(
        bootstrap._poisson1(
            bootstrap._uniform01(
                F.col("id").cast("string"), F.lit(1), seed=0
            )
        ).alias("w")
    )
    r = df.agg(
        F.avg("w").alias("m"),
        F.var_samp("w").alias("v"),
        F.avg((F.col("w") == 0).cast("double")).alias("p0"),
    ).collect()[0]
    assert abs(r["m"] - 1.0) < 0.01
    assert abs(r["v"] - 1.0) < 0.02
    assert abs(r["p0"] - math.exp(-1.0)) < 0.005


def test_bootstrap_plan_shape(spark):
    """The replica explosion must stay BELOW the exchange: partial
    aggregation on (group, replica) happens map-side, so shuffles carry
    aggregate rows only. Pin: no more than 3 exchanges (replica agg,
    percentile agg, point-estimate agg) and zero Python nodes."""
    cust = load_table(spark, SF, "customer")
    rep = plan_report(
        bootstrap.bootstrap_mean_ci(
            cust,
            "c_acctbal",
            key_cols=["c_custkey"],
            group_cols=["c_mktsegment"],
            n_replicas=50,
        )
    )
    assert rep["shuffles"] <= 4
    assert rep["row_python_nodes"] == []
    assert rep["arrow_python_nodes"] == []
    assert rep["op_counts"].get("Generate", 0) == 1  # one explode


def test_bad_confidence_rejected(spark):
    cust = load_table(spark, SF, "customer")
    with pytest.raises(ValueError):
        bootstrap.bootstrap_mean_ci(
            cust, "c_acctbal", key_cols=["c_custkey"], confidence=0.3
        )
