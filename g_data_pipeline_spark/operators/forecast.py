"""Deterministic exponential-smoothing forecasts per key: Holt linear
(level + trend) and Holt-Winters additive (level + trend + seasonal),
as pure-expression ordered folds — no UDF, no MLlib, no RNG.

Pattern: per key, the series is assembled with ``array_sort(
collect_list(struct(order, value)))`` and folded left-to-right with
``F.aggregate`` carrying a struct accumulator (level, trend[, seasonal
array]). The fold is the textbook recurrence (Holt 1957, Winters 1960;
Hyndman & Athanasopoulos, *Forecasting: Principles and Practice* §8):

    level_t = alpha * (y_t - seas_{t-m}) + (1-alpha) * (level + trend)
    trend_t = beta * (level_t - level) + (1-beta) * trend
    seas_t  = gamma * (y_t - level_t) + (1-gamma) * seas_{t-m}

Scale shape: ONE shuffle on the key; the collected series lives inside a
single aggregate buffer per key, so memory is bounded by points-per-key
(daily series = hundreds of doubles — the same bound the e_ewma fold
documents), never by table size. Initialization: level = first value,
trend = second - first (0 for singletons), seasonal = first-cycle
deviations from the first value — simple, standard, and exactly
reproducible by the NumPy twin in tests/test_forecast.py (the fold and
the Python loop execute the SAME IEEE-double ops in the SAME order, so
parity is bitwise, not approximate).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _ordered_values(order_col: str, value_col: str) -> Column:
    pair = F.struct(
        F.col(order_col).alias("o"), F.col(value_col).cast("double").alias("v")
    )
    return F.transform(
        F.array_sort(F.collect_list(pair)), lambda s: s["v"]
    ).alias("ys")


def holt_linear(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 1,
) -> DataFrame:
    """Per-key Holt linear-trend smoothing. Output: key cols, ``n_points``,
    ``level``, ``trend``, ``forecast`` (= level + horizon * trend)."""
    a, b = float(alpha), float(beta)
    grouped = df.groupBy(*key_cols).agg(_ordered_values(order_col, value_col))
    ys = F.col("ys")
    n = F.size(ys)
    init = F.struct(
        F.element_at(ys, 1).alias("level"),
        F.when(n >= 2, F.element_at(ys, 2) - F.element_at(ys, 1))
        .otherwise(F.lit(0.0))
        .alias("trend"),
    )

    def step(acc, y):
        new_level = (
            F.lit(a) * y + F.lit(1.0 - a) * (acc["level"] + acc["trend"])
        )
        return F.struct(
            new_level.alias("level"),
            (
                F.lit(b) * (new_level - acc["level"])
                + F.lit(1.0 - b) * acc["trend"]
            ).alias("trend"),
        )

    tail = F.when(n >= 2, F.slice(ys, 2, n - 1)).otherwise(F.array().cast("array<double>"))
    fitted = F.aggregate(tail, init, step)
    return grouped.select(
        *key_cols,
        n.cast("bigint").alias("n_points"),
        fitted["level"].alias("level"),
        fitted["trend"].alias("trend"),
        (fitted["level"] + F.lit(float(horizon)) * fitted["trend"]).alias(
            "forecast"
        ),
    )


def holt_winters_additive(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    period: int,
    alpha: float = 0.5,
    beta: float = 0.3,
    gamma: float = 0.3,
    horizon: int = 1,
) -> DataFrame:
    """Per-key Holt-Winters additive seasonal smoothing with season
    length ``period``. Keys with fewer than ``2 * period`` points are
    dropped (not enough data to see one full season twice — the standard
    fitting minimum). Output: key cols, ``n_points``, ``level``,
    ``trend``, ``forecast`` (= level + h*trend + seasonal[(n+h-1) mod m]).
    """
    m = int(period)
    if m < 2:
        raise ValueError(f"period must be >= 2, got {period}")
    a, b, g = float(alpha), float(beta), float(gamma)
    grouped = (
        df.groupBy(*key_cols)
        .agg(_ordered_values(order_col, value_col))
        .filter(F.size("ys") >= 2 * m)
    )
    ys = F.col("ys")
    n = F.size(ys)
    # init from the first cycle: level = y_1, trend = (y_{m+1}-y_1)/m,
    # seasonal_j = y_j - y_1; fold starts at t = m+1
    init = F.struct(
        F.element_at(ys, 1).alias("level"),
        ((F.element_at(ys, m + 1) - F.element_at(ys, 1)) / F.lit(float(m))).alias(
            "trend"
        ),
        F.transform(
            F.slice(ys, 1, m), lambda y: y - F.element_at(ys, 1)
        ).alias("seas"),
        F.lit(0).alias("i"),  # 0-based position within the season
    )

    def step(acc, y):
        s_old = F.element_at(acc["seas"], acc["i"] + 1)
        new_level = (
            F.lit(a) * (y - s_old)
            + F.lit(1.0 - a) * (acc["level"] + acc["trend"])
        )
        new_trend = (
            F.lit(b) * (new_level - acc["level"]) + F.lit(1.0 - b) * acc["trend"]
        )
        new_seas_val = F.lit(g) * (y - new_level) + F.lit(1.0 - g) * s_old
        return F.struct(
            new_level.alias("level"),
            new_trend.alias("trend"),
            F.transform(
                acc["seas"],
                lambda s, j: F.when(j == acc["i"], new_seas_val).otherwise(s),
            ).alias("seas"),
            ((acc["i"] + 1) % m).alias("i"),
        )

    fitted = F.aggregate(F.slice(ys, m + 1, n - m), init, step)
    h = int(horizon)
    # season slot of y_{n+h} in 0-based phase: (n + h - 1) mod m
    slot = ((n + F.lit(h) - 1) % m).cast("int")
    return grouped.select(
        *key_cols,
        n.cast("bigint").alias("n_points"),
        fitted["level"].alias("level"),
        fitted["trend"].alias("trend"),
        (
            fitted["level"]
            + F.lit(float(h)) * fitted["trend"]
            + F.element_at(fitted["seas"], slot + 1)
        ).alias("forecast"),
    )


def seasonal_anomalies(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    period: int,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Seasonal-naive anomaly flags: the point forecast for y_t is simply
    y_{t-m} (same slot last season); residuals r_t = y_t - y_{t-m} are
    z-scored against the KEY's own residual distribution and |z| >
    ``z_threshold`` flags the row. The robust-and-dumb baseline every
    alerting stack ships before (and usually alongside) a model — immune
    to trend level, catches spikes/drops, explainable in one sentence.

    Output: key cols, order col, value, expected (y_{t-m}), residual,
    z (double, NULL for the first season or degenerate std), is_anomaly
    (int). Plan: one key shuffle shared by the lag window and the
    residual-stats window (same partitioning); no second exchange."""
    m = int(period)
    if m < 1:
        raise ValueError(f"period must be >= 1, got {period}")
    w = Window.partitionBy(*key_cols).orderBy(order_col)
    v = F.col(value_col).cast("double")
    lagged = df.withColumn("expected", F.lag(v, m).over(w))
    resid = lagged.withColumn("residual", v - F.col("expected"))
    stats = Window.partitionBy(*key_cols)
    mu = F.avg("residual").over(stats)
    sd = F.stddev_samp("residual").over(stats)
    z = F.when(
        F.col("residual").isNotNull() & (sd > 0),
        (F.col("residual") - mu) / sd,
    )
    return resid.select(
        *key_cols,
        order_col,
        v.alias(value_col),
        "expected",
        "residual",
        z.alias("z"),
        F.when(F.abs(z) > F.lit(float(z_threshold)), 1)
        .otherwise(0)
        .alias("is_anomaly"),
    )
