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


def test_file_balance_report_discriminates_layouts(spark, tmp_path):
    """file_balance_report must read only footers yet separate a skewed
    write (one hot partition dominating) from an even repartition of the
    same rows, and count small files."""
    from g_data_pipeline_spark.sources.skipping import file_balance_report

    df = spark.range(10_000).select(
        F.col("id"),
        # 91% of rows land on one key -> partitionBy writes one giant file
        F.when(F.col("id") % 11 == 0, F.col("id") % 4 + 1)
        .otherwise(F.lit(0))
        .alias("part"),
        F.sha2(F.col("id").cast("string"), 256).alias("payload"),
    )
    skewed = str(tmp_path / "skewed")
    df.repartition("part").write.partitionBy("part").parquet(skewed)
    even = str(tmp_path / "even")
    df.repartition(5, "id").write.parquet(even)

    rs = file_balance_report(skewed)
    re_ = file_balance_report(even)
    assert rs.total_rows == re_.total_rows == 10_000
    assert rs.skew_factor > 3.0, f"hot partition must show: {rs}"
    assert re_.skew_factor < 1.2, f"even layout must not: {re_}"
    assert re_.cv_rows < 0.1 < rs.cv_rows
    # every one of these tiny files is below 1 MiB
    assert rs.n_small_files == rs.n_files
    big = file_balance_report(even, small_bytes=1)
    assert big.n_small_files == 0


def test_file_balance_report_empty_dir(tmp_path):
    from g_data_pipeline_spark.sources.skipping import file_balance_report

    rep = file_balance_report(str(tmp_path))
    assert rep.n_files == 0 and rep.total_rows == 0
    assert rep.skew_factor == 0.0 and rep.cv_rows == 0.0
