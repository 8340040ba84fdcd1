"""Small-files compaction for parquet datasets — the table-maintenance
pass every large pipeline needs: streaming/incremental ingest produces
thousands of KB-sized files, and scan throughput collapses under per-file
open/footer costs (the classic "small files problem").

``compact_parquet`` rewrites a dataset into ~``target_file_mb`` files:

- file count = ceil(input_bytes / target), from the filesystem listing
  (Hadoop FS API — works for any scheme Spark can read: file://, s3a://,
  hdfs://), never from a row count guess;
- ``sort_by`` uses repartitionByRange + sortWithinPartitions, so each
  output file covers a tight key range — parquet min/max column stats
  then let later scans skip whole files (poor-man's clustering/Z-order
  for the single-key case);
- without ``sort_by``, a plain repartition(n) round-robins rows for even
  file sizes.

The rewrite is one shuffle; at 100 TB you'd run it per partition
(directory) rather than whole-table, which is just a loop over this.
No reference counterpart (the reference stores raw CSV uploads —
`/root/reference/src/services/s3.rs:40-74` — and never compacts).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dataset_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API (scheme-
    aware: file://, s3a://, hdfs://...)."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet(
    spark: SparkSession,
    src: str,
    dest: str,
    target_file_mb: int = 128,
    sort_by: list[str] | None = None,
) -> int:
    """Rewrite the parquet dataset at ``src`` into ``dest`` with
    ~``target_file_mb`` output files. Returns the output file count."""
    total = dataset_bytes(spark, src)
    n_files = max(1, math.ceil(total / (target_file_mb * 1024 * 1024)))
    df: DataFrame = spark.read.parquet(src)
    if sort_by:
        out = df.repartitionByRange(n_files, *sort_by).sortWithinPartitions(
            *sort_by
        )
    else:
        out = df.repartition(n_files)
    out.write.mode("overwrite").parquet(dest)
    return n_files
