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


def zorder_value(cols: list[str], bits: int = 16):
    """Z-order (Morton) interleave of N numeric columns -> one BIGINT
    clustering key, built from pure Column expressions (no UDF).

    Each column is min-max scaled to ``bits`` bits via window-free rank
    approximation — here the caller passes PRE-SCALED integer columns in
    [0, 2^bits); this function only interleaves:
    bit j of column i lands at position j*N + i. Interleaving makes rows
    close in ALL dimensions land close in the sort order, so
    repartitionByRange on the z-value gives every output file a tight
    bounding BOX over the clustered columns — parquet min/max stats then
    skip files for predicates on ANY clustered column, not just the first
    sort key (the multi-column generalization of sort_by compaction;
    same idea as Delta/Iceberg Z-ordering).
    """
    from pyspark.sql import functions as F

    n = len(cols)
    if n * bits > 63:
        raise ValueError(
            f"z-order of {n} columns x {bits} bits needs {n * bits} bit "
            "positions; a BIGINT holds 63 (Spark shiftleft masks the shift "
            "count mod 64 and bit 63 is the sign) — lower bits to "
            f"<= {63 // n}"
        )
    one = F.lit(1).cast("long")
    z = F.lit(0).cast("long")
    for j in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftrightunsigned(F.col(c).cast("long"), j).bitwiseAND(one)
            z = z.bitwiseOR(F.shiftleft(bit, j * n + i))
    return z


def scale_to_bits(col_name: str, lo, hi, bits: int = 16):
    """Min-max scale a numeric column into [0, 2^bits) as a Column
    (driver supplies lo/hi, e.g. from a tiny pre-aggregate)."""
    from pyspark.sql import functions as F

    span = float(hi) - float(lo)
    maxv = (1 << bits) - 1
    if span <= 0:
        return F.lit(0).cast("long")
    scaled = ((F.col(col_name).cast("double") - float(lo)) / span) * maxv
    return F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(maxv))


def zorder_compact(
    spark: SparkSession,
    src: str,
    dest: str,
    cluster_by: list[str],
    n_files: int = 8,
    bits: int = 16,
) -> int:
    """Rewrite parquet clustered by the Z-order of ``cluster_by`` columns:
    scale each to ``bits`` bits using its global min/max (one tiny agg),
    interleave, range-partition on the z-value, drop the helper column.
    Returns the output file count. Files then carry tight min/max boxes on
    EVERY clustered column (asserted in tests/test_ingest.py)."""
    from pyspark.sql import functions as F

    # keep the interleave inside a BIGINT's 63 usable bits for any column
    # count (zorder_value raises otherwise)
    bits = min(bits, 63 // max(1, len(cluster_by)))
    df = spark.read.parquet(src)
    rng = df.agg(
        *[F.min(c).alias(f"lo_{c}") for c in cluster_by],
        *[F.max(c).alias(f"hi_{c}") for c in cluster_by],
    ).collect()[0]
    scaled_names = []
    for c in cluster_by:
        sn = f"__z_{c}"
        df = df.withColumn(
            sn, scale_to_bits(c, rng[f"lo_{c}"], rng[f"hi_{c}"], bits)
        )
        scaled_names.append(sn)
    df = df.withColumn("__z", zorder_value(scaled_names, bits)).drop(
        *scaled_names
    )
    (
        df.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(dest)
    )
    return n_files
