"""Selective backfill (operators/backfill.py): only stale partitions are
rewritten (current partitions' files stay byte-identical on disk), the
re-read is partition-pruned, and the manifest converges to the current
version."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.backfill import (
    apply_backfill,
    plan_backfill,
    stamp_manifest,
)


def _source(spark):
    return spark.createDataFrame(
        [(d, i, float(i)) for d in range(4) for i in range(d * 10, d * 10 + 5)],
        "day int, id int, v double",
    )


def _land(spark, src, dest, transform, version):
    out = transform(src)
    (
        out.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(dest)
    )
    return stamp_manifest(out, "day", version)


def _mtimes(dest):
    return {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{dest}/day=*/part-*.parquet")
    }


def test_backfill_touches_only_stale_partitions(spark, tmp_path):
    dest = str(tmp_path / "land")
    src = _source(spark)
    v1 = lambda df: df.withColumn("score", F.col("v") * 1)  # noqa: E731
    v2 = lambda df: df.withColumn("score", F.col("v") * 2)  # noqa: E731

    manifest = _land(spark, src, dest, v1, version=1)
    # days 2,3 re-landed already at v2 (e.g. a partial rollout)
    manifest = apply_backfill(
        src.filter("day >= 2"), v2, dest, "day",
        manifest.withColumn(
            "version",
            F.when(F.col("day") >= 2, 1).otherwise(2),
        ),
        current_version=2,
    )
    plan = plan_backfill(manifest, 2)
    assert plan.count() == 0  # manifest converged

    # stale days 2,3 were rewritten with v2; days 0,1 files untouched
    landed = spark.read.parquet(dest)
    by_day = {
        r["day"]: r["s"]
        for r in landed.groupBy("day").agg(F.sum("score").alias("s")).collect()
    }
    raw = {
        r["day"]: r["s"]
        for r in src.groupBy("day").agg(F.sum("v").alias("s")).collect()
    }
    assert by_day[0] == raw[0] and by_day[1] == raw[1]  # still v1
    assert by_day[2] == 2 * raw[2] and by_day[3] == 2 * raw[3]  # v2


def test_untouched_partition_files_not_rewritten(spark, tmp_path):
    dest = str(tmp_path / "land")
    src = _source(spark)
    ident = lambda df: df  # noqa: E731
    manifest = _land(spark, src, dest, ident, version=1)
    before = _mtimes(dest)
    # mark ONLY day 3 stale
    stale_manifest = manifest.withColumn(
        "version", F.when(F.col("day") == 3, 0).otherwise(1)
    )
    assert [r[0] for r in plan_backfill(stale_manifest, 1).collect()] == [3]
    new_manifest = apply_backfill(
        src, ident, dest, "day", stale_manifest, current_version=1
    )
    after = _mtimes(dest)
    untouched = {p for p in before if "/day=3/" not in p}
    assert {p: before[p] for p in untouched} == {
        p: after[p] for p in untouched
    }
    assert {p for p in after if "/day=3/" in p}  # day 3 rewritten
    assert plan_backfill(new_manifest, 1).count() == 0
    # total rows unchanged
    assert spark.read.parquet(dest).count() == src.count()


def test_noop_when_nothing_stale(spark, tmp_path):
    dest = str(tmp_path / "land")
    src = _source(spark)
    manifest = _land(spark, src, dest, lambda df: df, version=3)
    before = _mtimes(dest)
    out = apply_backfill(
        src, lambda df: df, dest, "day", manifest, current_version=3
    )
    assert _mtimes(dest) == before  # no write happened at all
    assert out is manifest