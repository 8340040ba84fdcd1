"""Vector (embedding) column functions — dot products, norms, cosine —
as pure JVM array expressions over ``array<float>`` columns.

Determinism design: a float32×float32 product is EXACT in double (24+24
significand bits < 53), so per-element products are engine-identical; they
are then scaled by 10^12, rounded to exact longs, and summed with integer
arithmetic (``F.aggregate`` left fold) — the same scaled-integer scheme as
functions.deterministic, giving bit-identical cosines on any engine or
partitioning. Magnitude budget: |x·y| ≤ ~1e3 per element and ≤ 4096
elements keeps the scaled sum < 2^62.

At 100 TB the hot path would drop the rounding (plain double ``aggregate``
or a pandas_udf over Arrow batches) — the scaled-long form is the
numeric-fidelity mode used by the oracle-gated queries; both are provided.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCALE = 1e12


def _to_col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def dot_scaled(a: Column | str, b: Column | str) -> Column:
    """Deterministic dot product (double, via exact scaled-long sum)."""
    a, b = _to_col(a), _to_col(b)
    products = F.zip_with(
        a,
        b,
        lambda x, y: F.round(x.cast("double") * y.cast("double") * F.lit(_SCALE)).cast(
            "long"
        ),
    )
    return (
        F.aggregate(products, F.lit(0).cast("long"), lambda acc, v: acc + v).cast(
            "double"
        )
        / F.lit(_SCALE)
    )


def norm_sq_scaled(a: Column | str) -> Column:
    """Deterministic squared L2 norm."""
    return dot_scaled(a, a)


def cosine_sim(a: Column | str, b: Column | str) -> Column:
    """Deterministic cosine similarity (null on zero-norm inputs).

    The zero-norm guard is ``nullif`` algebra rather than
    ``F.when((na>0)&(nb>0), ...)``: the when-form evaluates each norm
    fold twice (condition + value — HOF folds are CodegenFallback, so
    nothing CSEs them), the nullif form once. Values are identical:
    norms are sums of rounded squares so never negative, a zero norm
    nulls the product and the division, and null inputs propagate the
    same way (r10 A/B: bit-identical outputs, ~1.4x on a cosine scan
    stage)."""
    dot = dot_scaled(a, b)
    na = norm_sq_scaled(a)
    nb = norm_sq_scaled(b)
    return dot / F.sqrt(
        F.nullif(na, F.lit(0.0)) * F.nullif(nb, F.lit(0.0))
    )


def cosine_sim_with_norm(
    a: Column | str, b: Column | str, nb: Column | str
) -> Column:
    """:func:`cosine_sim` with the ``b``-side squared norm PRECOMPUTED
    (``nb`` must be ``norm_sq_scaled(b)`` staged as a column). For
    broadcast-query legs the query norm is then computed once on the
    one-row side instead of twice per corpus row — bit-identical output
    (r10 A/B: ~2x on the dense-leg scan vs the when-form)."""
    dot = dot_scaled(a, b)
    na = norm_sq_scaled(a)
    return dot / F.sqrt(
        F.nullif(na, F.lit(0.0)) * F.nullif(_to_col(nb), F.lit(0.0))
    )


def dot_fast(a: Column | str, b: Column | str) -> Column:
    """Scale-path dot product: plain double fold (order-deterministic within
    the array, not engine-bit-matched after parallel reduction elsewhere)."""
    a, b = _to_col(a), _to_col(b)
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def sql_dot_scaled(a: str, b: str) -> str:
    """DuckDB twin of :func:`dot_scaled` (1-based list indexing)."""
    return (
        f"CAST(list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST(ROUND(CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE) * 1e12) "
        f"AS BIGINT))) AS DOUBLE) / 1e12"
    )


def sql_cosine_sim(a: str, b: str) -> str:
    dot = sql_dot_scaled(a, b)
    na = sql_dot_scaled(a, a)
    nb = sql_dot_scaled(b, b)
    return (
        f"CASE WHEN ({na}) > 0 AND ({nb}) > 0 "
        f"THEN ({dot}) / SQRT(({na}) * ({nb})) END"
    )
