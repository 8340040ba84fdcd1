"""SparkSession construction tuned for local testing and cluster scale.

The reference runs single-node Polars (SURVEY.md §4.2); here the execution
engine is Spark. The defaults below are chosen so the same code runs on
``local[N]`` for tests and on a multi-executor cluster unchanged:

- AQE on: runtime partition coalescing + skew-join splitting replace the
  hand-tuned shuffle sizing a 100 TB run would otherwise need.
- ``spark.sql.shuffle.partitions`` sized to the local core count; on a real
  cluster AQE's coalescing makes the initial number mostly irrelevant.
- Arrow enabled for any pandas-UDF path (the slow-path operators).
- Session timezone pinned to UTC so timestamp semantics match the DuckDB
  oracle used by the correctness harness.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "g-data-pipeline-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults."""
    cpus = cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Shuffle codec (guide §2.3): measured at sf0.1 — zstd is 15-20%
        # SLOWER on repeat collects here and no better fresh (local
        # shuffles land in page cache, so compression is pure CPU; the
        # ratio win only pays when blocks cross a network). lz4 stays
        # the local default; a network-bound cluster sets
        # SPARK_GRAFT_IO_CODEC=zstd.
        .config(
            "spark.io.compression.codec",
            os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4"),
        )
        # Python DataSource filter pushdown (sources/pydatasource.py)
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # managed-table warehouse out of the repo tree (bucketed tables)
        .config("spark.sql.warehouse.dir", f"/tmp/gdp-warehouse-{os.getpid()}")
        .config(
            "spark.driver.extraJavaOptions",
            f"-Dderby.system.home=/tmp/gdp-derby-{os.getpid()}",
        )
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
