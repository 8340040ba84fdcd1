"""The platform ops loop, end-to-end: one test wiring the round-5
maintenance stack together the way a production pipeline runs it —

  batch → validated landing (quarantine) → stats-dataset maintenance
        → materialized rollup refresh → drift monitor on the new batch
        → version-manifest backfill when the transform changes.

Each piece is pinned in its own suite; this test pins the CONTRACTS
BETWEEN them: the stats dataset and rollup are maintained from the
GOOD (post-quarantine) rows only, the drift monitor sees the planted
shift of batch 2, and the backfill touches only the stale partition.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.backfill import (
    apply_backfill,
    plan_backfill,
    stamp_manifest,
)
from g_data_pipeline_spark.operators.drift import profile_drift_report
from g_data_pipeline_spark.operators.expectations import (
    in_range,
    not_null,
    validated_land,
)
from g_data_pipeline_spark.operators.incremental_profile import (
    merged_profile,
    partial_profile,
    refresh_partials,
)
from g_data_pipeline_spark.operators.matview import (
    MatView,
    RollupSpec,
    aggregate_batch,
)


def _batch(spark, day: int, shift: float = 0.0, bad: int = 0):
    n = 400
    rows = [
        (day, day * n + i, 50.0 + (i % 100) + shift, f"u{i % 40}")
        for i in range(n)
    ]
    rows += [
        (day, day * n + n + j, None if j % 2 == 0 else 1e9, f"u{j}")
        for j in range(bad)
    ]
    return spark.createDataFrame(rows, "day int, id long, v double, user string")


def _rules():
    return [not_null("v"), in_range("v", 0, 1000)]


SPEC = RollupSpec(keys=["day"], sums={"sum_v": "v"})


def test_ops_loop(spark, tmp_path):
    good_p = str(tmp_path / "good")       # validated landing (unpartitioned)
    curated_p = str(tmp_path / "curated")  # day-partitioned, backfillable
    quar_p = str(tmp_path / "quar")
    stats = None
    view = MatView(spark, str(tmp_path / "mv"), SPEC)
    manifest = None

    # ---- day 0: clean batch; day 1: planted +70 shift and 10 bad rows
    for day, shift, bad in [(0, 0.0, 0), (1, 70.0, 10)]:
        batch = _batch(spark, day, shift, bad)
        n_good, n_quar = validated_land(batch, _rules(), good_p, quar_p)
        assert n_quar == bad
        landed = spark.read.parquet(good_p).filter(F.col("day") == day)
        assert landed.count() == n_good
        # curated layer: the partitioned, backfillable copy
        (
            landed.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("day")
            .parquet(curated_p)
        )

        # maintenance is fed from the GOOD rows only
        fresh_stats = partial_profile(landed, ["v"], ["day"])
        stats = (
            fresh_stats
            if stats is None
            else refresh_partials(stats, fresh_stats, ["day"])
        ).localCheckpoint(eager=True)
        view.refresh(landed)
        fresh_manifest = stamp_manifest(landed, "day", version=1)
        manifest = (
            fresh_manifest
            if manifest is None
            else manifest.unionByName(fresh_manifest)
        )

    # ---- drift monitor: day-1 slice vs day-0 baseline sees the shift
    drift = {
        r["column"]: r
        for r in profile_drift_report(
            stats.filter("day = 0"), stats.filter("day = 1"), ["v"]
        ).collect()
    }
    assert drift["v"]["mean_shift_sigma"] > 2
    assert drift["v"]["psi"] > 0.25
    # and the quarantine kept the poison out of the stats: no null creep
    assert drift["v"]["null_rate_delta"] == 0.0

    # ---- rollup stayed consistent with a recompute over the good rows
    all_good = spark.read.parquet(curated_p)
    got = sorted(tuple(r) for r in view.read().collect())
    want = sorted(tuple(r) for r in aggregate_batch(all_good, SPEC).collect())
    assert got == want

    # ---- transform v2 ships: only day 1 marked stale gets rewritten
    stale_manifest = manifest.withColumn(
        "version", F.when(F.col("day") == 1, 0).otherwise(1)
    )
    assert [r[0] for r in plan_backfill(stale_manifest, 1).collect()] == [1]
    # re-curate the stale day FROM THE RAW LANDING (never from curated
    # itself — the self-overwrite hazard apply_backfill documents)
    new_manifest = apply_backfill(
        spark.read.parquet(good_p),
        lambda df: df.withColumn("v", F.col("v") * 0 + 1.0),
        curated_p,
        "day",
        stale_manifest,
        current_version=1,
    )
    assert plan_backfill(new_manifest, 1).count() == 0
    rewritten = spark.read.parquet(curated_p)
    assert (
        rewritten.filter("day = 1").agg(F.sum("v")).collect()[0][0]
        == rewritten.filter("day = 1").count()  # all v == 1.0 now
    )
    day0 = rewritten.filter("day = 0").agg(F.sum("v")).collect()[0][0]
    assert day0 == all_good.filter("day = 0").agg(F.sum("v")).collect()[0][0]