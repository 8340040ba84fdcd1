"""Selective backfill planning: reprocess ONLY the partitions that need it.

When transform logic changes (a quality rule tightens, a tokenizer
version bumps), the naive move is re-running the pipeline over all
history — at 100 TB, days of cluster time. The disciplined move is a
VERSION MANIFEST: every landed partition records the transform version
that produced it; a backfill plans the set of partitions whose recorded
version lags, and the rewrite touches exactly those (dynamic partition
overwrite), leaving current partitions' files untouched.

Pieces:
- :func:`stamp_manifest` — per-partition (key, version, n_rows) rows for
  a landed batch; append next to the data (tiny; the stats-dataset
  pattern again).
- :func:`plan_backfill` — manifest ∖ current-version: the partition keys
  to rewrite, with their stale versions (evidence, not just a list).
- :func:`apply_backfill` — rewrite just those partitions from the source
  with the new transform, dynamic partition-overwrite, and return the
  refreshed manifest rows (latest-wins upsert mirrors
  incremental_profile.refresh_partials).

The source filter is a partition-key IN-list pushed into the scan, so
the re-read is partition-pruned too — a backfill of 3 stale days reads 3
days, not the table.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stamp_manifest(
    landed: DataFrame, partition_col: str, version: int
) -> DataFrame:
    return landed.groupBy(partition_col).agg(
        F.lit(int(version)).alias("version"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def plan_backfill(manifest: DataFrame, current_version: int) -> DataFrame:
    """Partitions whose landed version lags ``current_version``."""
    return manifest.filter(F.col("version") < int(current_version)).select(
        manifest.columns[0], "version", "n_rows"
    )


def apply_backfill(
    source: DataFrame,
    transform: Callable[[DataFrame], DataFrame],
    dest: str,
    partition_col: str,
    manifest: DataFrame,
    current_version: int,
) -> DataFrame:
    """Rewrite stale partitions only; returns the updated manifest.

    The stale-key list is collected (bounded: one row per partition, the
    manifest's own cardinality) and pushed into the source scan as an
    IN-filter so partition pruning bounds the re-read.

    ``source`` must be a DIFFERENT dataset than ``dest`` (the raw zone
    feeding the curated zone): overwriting partitions while reading them
    from the same files is the parquet self-overwrite hazard.
    """
    stale = [r[0] for r in plan_backfill(manifest, current_version).collect()]
    if not stale:
        return manifest
    subset = source.filter(F.col(partition_col).isin(stale))
    rewritten = transform(subset)
    (
        rewritten.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(dest)
    )
    # drop the session's cached file listing for dest — readers created
    # before the overwrite hold the replaced file names otherwise
    rewritten.sparkSession.catalog.refreshByPath(dest)
    fresh = stamp_manifest(rewritten, partition_col, current_version)
    return manifest.join(
        fresh.select(partition_col), on=partition_col, how="left_anti"
    ).unionByName(fresh)
