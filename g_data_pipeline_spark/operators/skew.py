"""Skew-handling primitives: salted aggregation and salted joins.

AQE's skew-join splitting handles most shuffle skew automatically
(enabled in session.py); these explicit primitives cover the cases AQE
can't: a single hot GROUP BY key whose partial aggregates still funnel to
one reducer (salting spreads the combine), and broadcast-ineligible joins
against a skewed build side.

Salted aggregation = two-stage combine:
    stage 1: groupBy(key, salt)  -- hot key spread over S reducers
    stage 2: groupBy(key)        -- S partials per key, trivially small
Works for any algebraic aggregate (sum/count/min/max); avg is derived as
sum/count at stage 2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    sums: dict[str, str] | None = None,
    count_alias: str | None = "n",
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``sums``: {output_alias: input_column} summed exactly through both
    stages. ``count_alias``: row count per key (None to skip)."""
    sums = sums or {}
    salt = (F.rand(seed=42) * salt_buckets).cast("int").alias("__salt")
    stage1_aggs = [F.sum(c).alias(a) for a, c in sums.items()]
    if count_alias:
        stage1_aggs.append(F.count(F.lit(1)).alias(count_alias))
    partial = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*stage1_aggs)
    stage2_aggs = [F.sum(a).alias(a) for a in sums]
    if count_alias:
        stage2_aggs.append(F.sum(count_alias).alias(count_alias))
    return partial.groupBy(*keys).agg(*stage2_aggs)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed fact ⋈ small-ish dim without broadcast: salt the fact side,
    replicate the dim side across all salt values, join on (key, salt).
    Replication factor = salt_buckets (keep the dim side narrow)."""
    f_salted = fact.withColumn(
        "__salt", (F.rand(seed=42) * salt_buckets).cast("int")
    )
    d_replicated = dim.withColumn(
        "__salt",
        F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])),
    )
    # The operator's premise is a dim too big to broadcast: pin the join
    # to sort-merge so the plan is the salted-shuffle shape at ANY scale
    # (without the hint, Catalyst broadcasts small test dims, and then the
    # salt is pure overhead — if the dim fits a broadcast, use a plain
    # broadcast join instead of this operator).
    out = f_salted.join(d_replicated.hint("merge"), [key, "__salt"], how)
    return out.drop("__salt")
