"""Profile-drift monitor (operators/drift.py): detection on planted
drifts, quiescence on identical snapshots, and the facts-unread plan
property (both report jobs read only stats-dataset rows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.drift import profile_drift_report
from g_data_pipeline_spark.operators.incremental_profile import (
    partial_profile,
)

SF_DIR = "/root/testdata/sf0.001"
COLS = ["l_quantity", "l_extendedprice"]


def _key():
    return F.date_trunc("month", "l_shipdate").alias("m")


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


@pytest.fixture(scope="module")
def base(spark, lineitem):
    # persisted like a real stats dataset would be
    return partial_profile(lineitem, COLS, [_key()]).localCheckpoint(
        eager=True
    )


def _report(base, new_df):
    rows = profile_drift_report(
        base, partial_profile(new_df, COLS, [_key()]), COLS
    ).collect()
    return {r["column"]: r for r in rows}


def test_identical_snapshots_are_quiet(lineitem, base):
    got = _report(base, lineitem)
    for c in COLS:
        assert got[c]["mean_shift_sigma"] == 0.0
        assert got[c]["null_rate_delta"] == 0.0
        assert got[c]["distinct_ratio"] == 1.0
        assert got[c]["range_breach"] is False
        # discrete columns give mild PSI noise from cut ties plus KLL's
        # randomized compaction (observed ~0.03); threshold leaves
        # headroom while staying an order below the planted-drift signal
        assert got[c]["psi"] < 0.15, c


def test_location_shift_detected(lineitem, base):
    shifted = lineitem.withColumn(
        "l_quantity", F.col("l_quantity") + F.lit(72.0)  # ~5 base sigmas
    )
    got = _report(base, shifted)
    q = got["l_quantity"]
    assert q["mean_shift_sigma"] > 4
    assert q["range_breach"] is True
    assert q["psi"] > 0.25  # conventional "major shift"
    # untouched column stays quiet
    assert got["l_extendedprice"]["mean_shift_sigma"] < 0.05
    assert got["l_extendedprice"]["psi"] < 0.1


def test_null_injection_detected(lineitem, base):
    holey = lineitem.withColumn(
        "l_extendedprice",
        F.when(F.rand(7) < 0.3, None).otherwise(F.col("l_extendedprice")),
    )
    got = _report(base, holey)
    p = got["l_extendedprice"]
    assert p["null_rate_delta"] == pytest.approx(0.3, abs=0.05)
    assert p["distinct_ratio"] == pytest.approx(0.7, abs=0.05)
    # dropping rows at random does not shift the distribution
    assert p["mean_shift_sigma"] < 0.05
    assert p["psi"] < 0.1


def test_report_reads_only_stats_rows(spark, lineitem, base):
    report = profile_drift_report(
        base, partial_profile(lineitem, COLS, [_key()]).localCheckpoint(
            eager=True
        ), COLS,
    )
    plan = str(report._jdf.queryExecution().executedPlan())
    # both sides are checkpointed stats scans: no parquet scan anywhere
    assert "Scan parquet" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan

# ------------------------------------------------- embedding centroid drift


def test_centroid_drift_identical_snapshots(spark):
    from g_data_pipeline_spark.catalog import load_table
    from g_data_pipeline_spark.operators.drift import embedding_centroid_drift

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    r = embedding_centroid_drift(emb, emb).collect()[0]
    assert r["n_ref"] == r["n_cur"] == 500
    assert abs(r["centroid_cosine"] - 1.0) < 1e-12
    assert abs(r["norm_ratio"] - 1.0) < 1e-12


def test_centroid_drift_detects_flip_and_scale(spark):
    from pyspark.sql import functions as F

    from g_data_pipeline_spark.catalog import load_table
    from g_data_pipeline_spark.operators.drift import embedding_centroid_drift

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    flipped = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: -x)
    )
    r = embedding_centroid_drift(flipped, emb).collect()[0]
    assert abs(r["centroid_cosine"] + 1.0) < 1e-12  # exact opposite
    assert abs(r["norm_ratio"] - 1.0) < 1e-12
    doubled = emb.withColumn(
        "embedding", F.transform("embedding", lambda x: x * F.lit(2.0))
    )
    r2 = embedding_centroid_drift(doubled, emb).collect()[0]
    assert abs(r2["centroid_cosine"] - 1.0) < 1e-12  # same direction
    assert abs(r2["norm_ratio"] - 2.0) < 1e-9


def test_centroid_drift_per_group(spark):
    from g_data_pipeline_spark.catalog import load_table
    from g_data_pipeline_spark.operators.drift import embedding_centroid_drift

    emb = load_table(spark, "/root/testdata/sf0.01", "embeddings")
    rows = embedding_centroid_drift(emb, emb, group_col="label").collect()
    labels = {r["label"] for r in rows}
    assert len(labels) == len(rows) >= 2
    for r in rows:
        assert abs(r["centroid_cosine"] - 1.0) < 1e-12
