"""Order-independent float aggregation.

Double SUM/AVG results depend on accumulation order (partition count, merge
order), so the same data can hash differently between Spark and a sequential
engine like the DuckDB oracle — or even between two Spark runs with different
partitioning. These helpers make float sums bit-reproducible by summing exact
scaled integers:

    u     = ROUND(x * 10^scale)  cast to BIGINT   (exact when x has <= scale
                                                   decimal digits)
    sum   = SUM(u)                                 (exact 64-bit integer sum)
    value = CAST(sum AS DOUBLE) / 10^scale         (two deterministic IEEE
                                                    roundings, identical on
                                                    any engine)

Why this is engine-safe: x's true value sits ON the 10^-scale grid, and the
accumulated double error of ``x * 10^scale`` (~ulp) is orders of magnitude
below 0.5, so ROUND recovers the exact integer on every engine regardless of
its rounding-mode or decimal-formatting quirks. (Casting doubles straight to
DECIMAL is *not* engine-safe once ulp(x) approaches the decimal grid — Java
rounds the shortest-repr decimal string, DuckDB rounds the binary value, and
they can land in different cells.)

Why integers instead of DECIMAL accumulators: identical exactness, but the
whole pipeline stays in primitive-long whole-stage codegen — measured ~10 s
of janino/JIT per fresh plan for a 6-pair decimal correlation matrix vs
sub-second for the long version, and ~2× steady-state throughput.

Domain bounds (caller's contract, asserted nowhere — document per use):

- |x| * 10^scale < 2^63 per row, and |sum(x)| * 10^scale < 2^63. For the
  test schema's money/quantity columns at bench scale that holds through
  scale=6 with ~9 decimal orders of headroom.
- ``split=True`` extends the bound for large non-negative terms (squares /
  products ~1e10 per row whose totals exceed 2^63 * 10^-scale): u is split
  into hi/lo halves at 2^26, summed separately (each fits a long), and
  recombined in double — still fully deterministic. Requires x >= 0 (integer
  div/mod sign conventions differ between engines for negatives).

For 100 TB hot paths where bit-reproducibility doesn't matter, use plain
``F.sum``/``F.avg``; these helpers are the *numeric-fidelity mode* used by
the correctness-gated query surface.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPLIT = 1 << 26


def _scaled(expr: Column | str, scale: int) -> Column:
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.round(col * F.lit(float(10**scale))).cast("long")


def dsum(expr: Column | str, scale: int = 6, split: bool = False) -> Column:
    """Order-independent SUM over doubles via exact scaled-integer sums."""
    u = _scaled(expr, scale)
    if not split:
        return F.sum(u).cast("double") / F.lit(float(10**scale))
    # (u - u%S)/S is integral and exact for u >= 0; CAST to BIGINT before
    # summing keeps both engines in exact integer arithmetic. Plain `/` is
    # used (not div///) because its double semantics agree across engines.
    hi = F.sum(((u - (u % _SPLIT)) / _SPLIT).cast("long"))
    lo = F.sum(u % _SPLIT)
    return (
        hi.cast("double") * F.lit(float(_SPLIT)) + lo.cast("double")
    ) / F.lit(float(10**scale))


def davg(expr: Column | str, scale: int = 6) -> Column:
    """Order-independent AVG: exact scaled sum, one double division."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return dsum(col, scale) / F.count(col)


def sql_dsum(expr: str, scale: int = 6, split: bool = False) -> str:
    """DuckDB-side twin of :func:`dsum`."""
    u = f"CAST(ROUND(({expr}) * {float(10 ** scale)!r}) AS BIGINT)"
    if not split:
        return f"CAST(SUM({u}) AS DOUBLE) / {float(10 ** scale)!r}"
    hi = f"CAST(SUM(CAST(({u} - ({u} % {_SPLIT})) / {_SPLIT} AS BIGINT)) AS DOUBLE)"
    lo = f"CAST(SUM({u} % {_SPLIT}) AS DOUBLE)"
    return f"(({hi}) * {float(_SPLIT)!r} + ({lo})) / {float(10 ** scale)!r}"


def sql_davg(expr: str, scale: int = 6) -> str:
    """DuckDB-side twin of :func:`davg`."""
    return f"{sql_dsum(expr, scale)} / COUNT({expr})"
