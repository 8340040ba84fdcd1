"""Order-independent float aggregation.

Double SUM/AVG results depend on accumulation order (partition count, merge
order), so the same data can hash differently between Spark and a sequential
engine like the DuckDB oracle — or even between two Spark runs with different
partitioning. These helpers sum through an exact DECIMAL accumulator
(associative, exact) and cast the final value back to DOUBLE: one
deterministic IEEE rounding, identical on any engine.

Cost model: the per-row decimal cast stays in Spark's compact-long decimal
representation (unscaled value fits a long), so steady-state throughput is
within ~2× of a raw double sum — an acceptable price for reproducible results.
For 100 TB hot paths where bit-reproducibility doesn't matter, use plain
``F.sum``/``F.avg``; these helpers are the *numeric-fidelity mode* used by the
correctness-gated query surface.

Scale=6 is exact (no rounding at all) for inputs with ≤6 decimal digits —
true for every money/quantity column in the test schema, including 2dp×2dp×2dp
product expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(expr: Column | str, scale: int = 6) -> Column:
    """Order-independent SUM over doubles via an exact decimal accumulator."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(f"decimal(25,{scale})")).cast("double")


def davg(expr: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact decimal sum, one double division."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return dsum(col, scale) / F.count(col)


def sql_dsum(expr: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    return f"CAST(SUM(CAST({expr} AS DECIMAL(25,{scale}))) AS DOUBLE)"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"
