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

from pyspark.sql import DataFrame, SparkSession

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


# Deterministic aggregate helpers live in functions.deterministic (see its
# docstring for the exactness argument).
from g_data_pipeline_spark.functions.deterministic import (  # noqa: E402
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)

# Query definitions live in query_defs/* (imported for their registration
# side effects — one module per SURVEY.md §2 area).
from g_data_pipeline_spark import query_defs  # noqa: E402,F401
