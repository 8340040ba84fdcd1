"""Named query registry: every operator claimed in SURVEY.md §2 gets a
(PySpark query, DuckDB oracle SQL) pair here. ``__spark_entry__.py`` and
``bench.py`` are thin adapters over this registry.

Determinism policy for float outputs (so order-insensitive value hashes match
the DuckDB oracle bit-for-bit):

- SUM/AVG over doubles are order-dependent in the last bits on both engines.
  We therefore sum through an exact DECIMAL accumulator and cast the final
  value back to DOUBLE:  ``CAST(SUM(CAST(x AS DECIMAL(25,6))) AS DOUBLE)``.
  The decimal sum is exact (associative), the final cast is a single
  deterministic IEEE rounding — identical in Spark and DuckDB.
- AVG is expressed as ``decimal_sum / COUNT(col)`` (one deterministic double
  division) rather than engine-native AVG.
- Order-statistics (exact percentile with linear interpolation) are already
  deterministic given identical inputs.
- Variance-shaped statistics (stddev, corr) are rounded to 6 decimals on both
  sides (documented deviation; values here are nowhere near rounding
  boundaries).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table

SparkQuery = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: SparkQuery
    oracle: str | None  # ANSI SQL for DuckDB; None -> rows-only check
    doc: str


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    def deco(fn: SparkQuery) -> SparkQuery:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, doc=fn.__doc__ or "")
        return fn

    return deco


# --------------------------------------------------------------------------
# Deterministic aggregate helpers (see module docstring).
# --------------------------------------------------------------------------

def dsum(expr: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM over doubles via an exact decimal accumulator."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(f"decimal(25,{scale})")).cast("double")


def davg(expr: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return dsum(col, scale) / F.count(col)


def sql_dsum(expr: str, scale: int = 6) -> str:
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"


# --------------------------------------------------------------------------
# Flagship: pricing-summary rollup (TPC-H Q1 shape).
# Exercises the reference's whole aggregate surface in one plan: R3 ordering
# filter + R9 group-by + R6 mean + R7 sum + R8 count (SURVEY.md §2.2), but as
# a single grouped aggregation with map-side partial combine — one shuffle on
# (l_returnflag, l_linestatus), which at 100 TB is the minimal-shuffle plan.
# --------------------------------------------------------------------------

@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {sql_dsum('l_quantity')} AS sum_qty,
           {sql_dsum('l_extendedprice')} AS sum_base_price,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {sql_davg('l_quantity')} AS avg_qty,
           {sql_davg('l_extendedprice')} AS avg_price,
           {sql_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary: filter -> grouped multi-aggregate (R3+R6-R9 fused)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
