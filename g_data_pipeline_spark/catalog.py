"""Table loading for the driver's TPC-H-ish parquet test data (TESTDATA.md).

The reference re-downloads and re-parses its CSV on every query
(``/root/reference/src/services/query_translator.rs:232-290`` — the scan-reuse
anti-pattern called out in SURVEY.md §4.1). Here a dataset is loaded once as a
lazy parquet scan; Catalyst prunes columns and pushes filters into the scan,
so repeated queries over the same table cost only what they read.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Small dimension tables that should always be broadcast in joins.
DIM_TABLES = frozenset({"region", "nation"})


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one test table.

    The events table stores TIMESTAMP(NANOS) parquet, which Spark's reader
    rejects outright ([PARQUET_TYPE_ILLEGAL]). For it, read nanos as raw
    longs (legacy knob, runtime-settable) and floor to microseconds —
    exactly what DuckDB does when it presents TIMESTAMP_NS as TIMESTAMP —
    so both engines see identical values AND identical orderings."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        df = df.withColumns(
            {
                f.name: F.timestamp_micros(F.expr(f"`{f.name}` div 1000"))
                for f in df.schema.fields
                if isinstance(f.dataType, T.LongType) and f.name == "ts"
            }
        )
    # Parquet timestamps with isAdjustedToUTC=false surface as
    # TIMESTAMP_NTZ; with the engine pinned to a UTC session (session.py)
    # the wall-clock values are identical, so normalize to TIMESTAMP for a
    # single timestamp type across the whole surface (matches the oracle).
    ntz = {
        f.name: F.col(f.name).cast(T.TimestampType())
        for f in df.schema.fields
        if isinstance(f.dataType, T.TimestampNTZType)
    }
    return df.withColumns(ntz) if ntz else df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every test table as a temp view (for the SQL API)."""
    dfs = load_tables(spark, sf_dir)
    for name, df in dfs.items():
        df.createOrReplaceTempView(name)
    return dfs
