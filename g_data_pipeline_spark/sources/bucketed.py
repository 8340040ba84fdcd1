"""Bucketed-table landing: pre-shuffle once at write time, join forever
without shuffling.

``land_bucketed`` writes a DataFrame as a managed table bucketed (and
sorted) by the join key. Two tables bucketed by the same key into the same
bucket count join with NO Exchange on either side — the classic repeated-
join amortization for 100 TB fact-fact joins (pay one shuffle at ingest,
never again). Verified by plan assertion in tests/test_bucketed.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def land_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_by: str,
    num_buckets: int = 8,
    sort_by: str | None = None,
) -> None:
    writer = df.write.mode("overwrite").bucketBy(num_buckets, bucket_by)
    writer = writer.sortBy(sort_by or bucket_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, key: str, how: str = "inner"
) -> DataFrame:
    """Join two same-bucketed tables on their bucket key (shuffle-free)."""
    return spark.table(left_table).join(spark.table(right_table), key, how)
