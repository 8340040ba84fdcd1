"""File-skipping report (sources/skipping.py): clustering must
measurably shrink the row fraction a min/max-pruning reader touches,
and the report's selected set must be SAFE (never excludes a row group
that actually contains matching rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.sources.skipping import range_skipping_report


def _write_layouts(spark, tmp_path, n=50_000):
    df = spark.range(0, n).select(
        # pseudo-random order so the unclustered layout has no accidental
        # correlation with the range column
        F.xxhash64("id").alias("shuffle_key"),
        (F.col("id") % 1000).alias("bucket"),
        F.col("id").alias("v"),
    )
    random_path = str(tmp_path / "random")
    clustered_path = str(tmp_path / "clustered")
    (
        df.orderBy("shuffle_key")
        .coalesce(8)
        .write.mode("overwrite")
        .parquet(random_path)
    )
    (
        df.repartitionByRange(8, "bucket")
        .sortWithinPartitions("bucket")
        .write.mode("overwrite")
        .parquet(clustered_path)
    )
    return random_path, clustered_path


def test_clustered_layout_skips_and_random_does_not(spark, tmp_path):
    random_path, clustered_path = _write_layouts(spark, tmp_path)
    # ~1% selectivity range predicate
    rnd = range_skipping_report(random_path, "bucket", 100, 109)
    clu = range_skipping_report(clustered_path, "bucket", 100, 109)
    assert rnd.total_rows == clu.total_rows == 50_000
    # random layout: every file overlaps every bucket -> scans ~everything
    assert rnd.selected_fraction > 0.9
    # range-clustered: the range lives in ~one file
    assert clu.selected_fraction < 0.25
    assert clu.selected_files <= 2
    assert clu.selected_bytes < rnd.selected_bytes


def test_selected_set_is_safe(spark, tmp_path):
    _random_path, clustered_path = _write_layouts(spark, tmp_path)
    rep = range_skipping_report(clustered_path, "bucket", 100, 109)
    true_hits = (
        spark.read.parquet(clustered_path)
        .filter(F.col("bucket").between(100, 109))
        .count()
    )
    # every matching row lives inside the selected row groups
    assert rep.selected_rows >= true_hits > 0


def test_missing_stats_column_selects_everything(spark, tmp_path):
    _random_path, clustered_path = _write_layouts(spark, tmp_path)
    rep = range_skipping_report(clustered_path, "no_such_col", 0, 1)
    assert rep.selected_rows == rep.total_rows  # cannot skip the unbounded
