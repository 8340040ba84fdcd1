"""Poisson-bootstrap confidence intervals for grouped means/sums — the
resampling scheme that survives 100 TB.

Classic bootstrap resamples n rows WITH replacement per replica — at
scale that is B full shuffles of the table. The Poisson bootstrap
(Hanley & MacGibbon 2006; used for exactly this purpose in
Chamandy et al., "Estimating Uncertainty for Massive Data Streams",
Google 2012) replaces the multinomial row counts with independent
Poisson(1) draws: each row contributes ``w ~ Poisson(1)`` copies to each
replica, computable ROW-LOCALLY. The whole B-replica bootstrap then
costs: one ``explode(sequence(1, B))`` (inside the scan stage, before
any exchange), a map-side-combinable ``groupBy(replica)`` partial-sum,
and a B-row percentile — the only shuffle traffic is ``B × groups``
aggregate rows, never data rows.

Determinism: the Poisson(1) draw inverts the CDF against a uniform
``u ~ xxhash64(row_key, replica, seed)`` (53-bit mantissa slice, same
construction as operators/privacy.py). Poisson(1) pmf decays fast —
P(w > 8) < 1e-9 — so the inverse CDF is a 9-branch CASE chain of
precomputed cumulative constants: pure expressions, no RNG state, fully
reproducible for a given seed, and layout-invariant because the uniform
depends only on (row key, replica, seed).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# cumulative P(Poisson(1) <= k) for k = 0..8; the tail beyond 8 carries
# < 1.1e-9 mass and rounds into the last bucket
_POIS1_CDF = []
_acc = 0.0
for _k in range(9):
    _acc += math.exp(-1.0) / math.factorial(_k)
    _POIS1_CDF.append(_acc)


def _uniform01(key: Column, replica: Column, seed: int) -> Column:
    h = F.xxhash64(key, replica, F.lit(seed))
    return F.shiftrightunsigned(h, 11).cast("double") / F.lit(float(1 << 53))


def _poisson1(u: Column) -> Column:
    expr = F.lit(8)
    for k in range(7, -1, -1):
        expr = F.when(u < F.lit(_POIS1_CDF[k]), F.lit(k)).otherwise(expr)
    return expr


def bootstrap_mean_ci(
    df: DataFrame,
    value_col: str,
    key_cols: list[str],
    group_cols: list[str] | None = None,
    n_replicas: int = 200,
    confidence: float = 0.95,
    seed: int = 0,
) -> DataFrame:
    """Per-group bootstrap CI for the MEAN of ``value_col``.

    ``key_cols``: columns identifying a row (the hash input — use the
    natural key, not a position). Output per group: ``mean`` (point
    estimate from the full data), ``ci_lo`` / ``ci_hi`` (percentile
    bootstrap bounds over ``n_replicas`` Poisson replicas), ``n_rows``.

    Plan shape: scan → explode(B) → partial aggregate on
    (group, replica) — all before one exchange carrying B×groups rows —
    → replica means → ONE `percentile(..., array(lo, hi))` per group.
    """
    if not 0.5 < confidence < 1.0:
        raise ValueError(f"confidence must be in (0.5, 1), got {confidence}")
    gcols = list(group_cols or [])
    alpha = 1.0 - confidence
    # NULL values would bias replica means toward zero: sum(__w * __v)
    # skips null-value rows while sum(__w) would still count their
    # weights, so the CI would no longer be centered on the point
    # estimate (which avg() computes over non-null rows only). Resample
    # exactly the population the point estimate covers.
    df = df.filter(F.col(value_col).isNotNull())
    key = F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in key_cols]
    )
    b = F.explode(F.sequence(F.lit(1), F.lit(int(n_replicas)))).alias(
        "__b"
    )
    v = F.col(value_col).cast("double")
    w = _poisson1(_uniform01(F.col("__k"), F.col("__b"), seed)).alias("__w")
    replicated = df.select(*gcols, v.alias("__v"), key.alias("__k"), b).select(
        *gcols, "__v", "__b", w
    )
    per_replica = replicated.groupBy(*gcols, "__b").agg(
        F.sum(F.col("__w") * F.col("__v")).alias("__ws"),
        F.sum("__w").alias("__wn"),
    )
    replica_means = per_replica.filter(F.col("__wn") > 0).select(
        *gcols, (F.col("__ws") / F.col("__wn")).alias("__rm")
    )
    ci = replica_means.groupBy(*gcols).agg(
        F.percentile(
            F.col("__rm"),
            F.array(F.lit(alpha / 2.0), F.lit(1.0 - alpha / 2.0)),
        ).alias("__ci")
    )
    point = df.groupBy(*gcols).agg(
        F.avg(v).alias("mean"), F.count(F.lit(1)).cast("bigint").alias("n_rows")
    )
    joined = point.join(ci, gcols) if gcols else point.crossJoin(ci)
    return joined.select(
        *gcols,
        "mean",
        F.element_at("__ci", 1).alias("ci_lo"),
        F.element_at("__ci", 2).alias("ci_hi"),
        "n_rows",
    )
