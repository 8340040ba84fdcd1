"""Privacy auditing and release primitives for curated datasets:
k-anonymity / l-diversity reports over quasi-identifier columns,
rare-class suppression, and deterministic seeded Laplace noise for
differentially-private aggregate release.

Why here: a training-data pipeline that joins user-event or customer
tables into a corpus needs to QUANTIFY re-identification risk before the
data leaves the platform. k-anonymity (Sweeney 2002) asks: how many rows
share my exact quasi-identifier combination? l-diversity (Machanavajjhala
2007) adds: within such a class, how many distinct sensitive values hide
mine? Both are one groupBy over the quasi-identifier tuple — at 100 TB
that is a single shuffle on the QI key, and the report side is a
20-row-scale second aggregate over class sizes, so nothing returns to the
driver but scalars.

DP release uses the standard inverse-CDF Laplace transform
mu - b*sign(u)*ln(1-2|u|) with u in (-0.5, 0.5) derived from
xxhash64(group_key, seed) — deterministic for a given seed (testable,
reproducible releases), uniform across groups, and computed as pure
Column expressions (no RNG state, no UDF). That is "seeded DP" for
release reproducibility: for fresh randomness per release, pass a fresh
seed. Sensitivity must be enforced by the caller via clamping (``clamp``
arg) exactly as in standard bounded-sum DP accounting.

No reference counterpart (the reference has no privacy surface); the
algorithms are the published ones cited above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def k_anonymity_report(
    df: DataFrame, quasi_cols: list[str], thresholds: tuple[int, ...] = (2, 5, 10)
) -> DataFrame:
    """One-row risk report over the quasi-identifier equivalence classes:
    ``k_min`` (the dataset's k-anonymity), ``n_classes``,
    ``n_singleton_classes`` (unique individuals — the re-identifiable
    ones), and ``rows_below_<t>`` = how many ROWS sit in classes smaller
    than each threshold (the population at risk if you require k >= t).

    Scale shape: groupBy(QI) is the only data-sized shuffle; the report
    aggregate runs over one row per class."""
    classes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("class_size"))
    aggs = [
        F.min("class_size").cast("bigint").alias("k_min"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum((F.col("class_size") == 1).cast("long"))
        .cast("bigint")
        .alias("n_singleton_classes"),
        F.sum("class_size").cast("bigint").alias("n_rows"),
    ]
    for t in thresholds:
        aggs.append(
            F.sum(
                F.when(F.col("class_size") < t, F.col("class_size")).otherwise(
                    F.lit(0)
                )
            )
            .cast("bigint")
            .alias(f"rows_below_{t}")
        )
    return classes.agg(*aggs)


def l_diversity_report(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str
) -> DataFrame:
    """Distinct-l-diversity: per QI class, the number of DISTINCT
    sensitive values; report row carries ``l_min`` (the dataset's
    l-diversity — 1 means some class leaks its sensitive value outright),
    ``n_classes``, and ``n_homogeneous_classes`` (l == 1).

    Exchange inventory (pinned in tests/test_plan_sweep_extras.py):
    pair dedup keyed (QI, sensitive), class fold keyed QI — different
    keys, so two data-sized exchanges are inherent to distinct-count —
    plus the 1-row report aggregate. All three carry aggregate buffers,
    never raw rows, after the map-side partials."""
    pairs = df.select(*quasi_cols, sensitive_col).distinct()
    classes = pairs.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("l_value")
    )
    return classes.agg(
        F.min("l_value").cast("bigint").alias("l_min"),
        F.count(F.lit(1)).cast("bigint").alias("n_classes"),
        F.sum((F.col("l_value") == 1).cast("long"))
        .cast("bigint")
        .alias("n_homogeneous_classes"),
    )


def suppress_rare_classes(
    df: DataFrame, quasi_cols: list[str], k: int
) -> DataFrame:
    """Drop every row whose QI equivalence class has fewer than ``k``
    members — the blunt-but-sound way to reach k-anonymity (suppression,
    not generalization). Implemented as a class-size window count so the
    fact table is shuffled ONCE on the QI key and never joined back to a
    separate class-size aggregate."""
    from pyspark.sql import Window

    w = Window.partitionBy(*quasi_cols)
    return (
        df.withColumn("__class_size", F.count(F.lit(1)).over(w))
        .filter(F.col("__class_size") >= k)
        .drop("__class_size")
    )


def _laplace_noise(key: Column, seed: int, scale: Column) -> Column:
    """Deterministic Laplace(0, scale) noise from xxhash64(key, seed):
    hash -> uniform u in (-0.5, 0.5) -> inverse CDF. Pure expressions."""
    # 53-bit mantissa slice of the hash -> uniform in [0, 1)
    u01 = (
        F.shiftrightunsigned(F.xxhash64(key, F.lit(seed)), 11).cast("double")
        / F.lit(float(1 << 53))
    )
    u = u01 - F.lit(0.5)  # (-0.5, 0.5)
    # clamp |u| away from 0.5 so ln(1-2|u|) stays finite
    absu = F.least(F.abs(u), F.lit(0.5 - 1e-12))
    sign = F.when(u < 0, F.lit(-1.0)).otherwise(F.lit(1.0))
    return -scale * sign * F.log(F.lit(1.0) - F.lit(2.0) * absu)


def dp_grouped_counts(
    df: DataFrame, keys: list[str], epsilon: float, seed: int = 0
) -> DataFrame:
    """Per-group counts with Laplace(1/epsilon) noise (count sensitivity
    is 1): ``n_noisy`` (double) next to nothing else — the true count
    never leaves the function. Deterministic for a given seed."""
    grouped = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("__n"))
    noise = _laplace_noise(
        F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys]),
        seed,
        F.lit(1.0 / float(epsilon)),
    )
    return grouped.select(
        *keys, (F.col("__n").cast("double") + noise).alias("n_noisy")
    )


def dp_grouped_sum(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    epsilon: float,
    clamp: tuple[float, float],
    seed: int = 0,
) -> DataFrame:
    """Per-group bounded sums with Laplace noise at scale
    ``max(|lo|, |hi|)/epsilon`` (the bounded-sum sensitivity). Values are
    CLAMPED into [lo, hi] first — without clamping there is no finite
    sensitivity and no DP guarantee."""
    lo, hi = float(clamp[0]), float(clamp[1])
    if hi < lo:
        raise ValueError(f"clamp upper {hi} < lower {lo}")
    sens = max(abs(lo), abs(hi))
    clamped = F.least(
        F.greatest(F.col(value_col).cast("double"), F.lit(lo)), F.lit(hi)
    )
    grouped = df.groupBy(*keys).agg(F.sum(clamped).alias("__s"))
    noise = _laplace_noise(
        F.concat_ws("\x1f", *[F.col(k).cast("string") for k in keys]),
        seed + 1,  # decorrelate from dp_grouped_counts on the same keys
        F.lit(sens / float(epsilon)),
    )
    return grouped.select(*keys, (F.col("__s") + noise).alias("sum_noisy"))
