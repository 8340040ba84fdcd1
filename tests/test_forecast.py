"""Holt linear / Holt-Winters additive folds (operators/forecast.py) vs
an exact Python twin executing the same IEEE-double recurrence in the
same order — parity is pinned tight (1e-12 relative), not approximate.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators import forecast
from g_data_pipeline_spark.operators.planlint import plan_report

SF = "/root/testdata/sf0.01"


def _holt_py(ys, a, b, horizon=1):
    level = ys[0]
    trend = (ys[1] - ys[0]) if len(ys) >= 2 else 0.0
    for y in ys[1:]:
        new_level = a * y + (1.0 - a) * (level + trend)
        trend = b * (new_level - level) + (1.0 - b) * trend
        level = new_level
    return level, trend, level + float(horizon) * trend


def _hw_py(ys, m, a, b, g, horizon=1):
    level = ys[0]
    trend = (ys[m] - ys[0]) / float(m)
    seas = [y - ys[0] for y in ys[:m]]
    i = 0
    for y in ys[m:]:
        s_old = seas[i]
        new_level = a * (y - s_old) + (1.0 - a) * (level + trend)
        new_trend = b * (new_level - level) + (1.0 - b) * trend
        seas[i] = g * (y - new_level) + (1.0 - g) * s_old
        level, trend = new_level, new_trend
        i = (i + 1) % m
    slot = (len(ys) + horizon - 1) % m
    return level, trend, level + float(horizon) * trend + seas[slot]


def _close(x, y):
    assert x == pytest.approx(y, rel=1e-12, abs=1e-12), (x, y)


@pytest.fixture(scope="module")
def daily(spark):
    """(event_type, d, c): per-day event counts — a real keyed series."""
    ev = load_table(spark, SF, "events")
    return (
        ev.groupBy(
            "event_type", F.date_trunc("day", "ts").alias("d")
        )
        .agg(F.count(F.lit(1)).cast("double").alias("c"))
        .cache()
    )


def test_holt_linear_matches_python_twin(spark, daily):
    got = {
        r["event_type"]: r
        for r in forecast.holt_linear(
            daily, ["event_type"], "d", "c", alpha=0.4, beta=0.2, horizon=3
        ).collect()
    }
    series = {}
    for r in daily.collect():
        series.setdefault(r["event_type"], []).append((r["d"], r["c"]))
    assert set(got) == set(series)
    for k, pts in series.items():
        ys = [v for _, v in sorted(pts)]
        level, trend, fc = _holt_py(ys, 0.4, 0.2, horizon=3)
        assert got[k]["n_points"] == len(ys)
        _close(got[k]["level"], level)
        _close(got[k]["trend"], trend)
        _close(got[k]["forecast"], fc)


def test_holt_winters_matches_python_twin(spark, daily):
    m = 7
    got = {
        r["event_type"]: r
        for r in forecast.holt_winters_additive(
            daily,
            ["event_type"],
            "d",
            "c",
            period=m,
            alpha=0.5,
            beta=0.3,
            gamma=0.2,
            horizon=2,
        ).collect()
    }
    series = {}
    for r in daily.collect():
        series.setdefault(r["event_type"], []).append((r["d"], r["c"]))
    for k, pts in series.items():
        ys = [v for _, v in sorted(pts)]
        if len(ys) < 2 * m:
            assert k not in got
            continue
        level, trend, fc = _hw_py(ys, m, 0.5, 0.3, 0.2, horizon=2)
        _close(got[k]["level"], level)
        _close(got[k]["trend"], trend)
        _close(got[k]["forecast"], fc)


def test_holt_winters_learns_planted_seasonality(spark):
    """Perfect additive season + linear trend must be forecast (almost)
    exactly: y_t = 10 + 0.5*t + s_{t mod 4}."""
    m, n = 4, 40
    s = [3.0, -1.0, -2.0, 0.0]
    rows = [(1, t, 10.0 + 0.5 * t + s[t % m]) for t in range(n)]
    df = spark.createDataFrame(rows, "k int, t int, y double")
    out = forecast.holt_winters_additive(
        df, ["k"], "t", "y", period=m, alpha=0.3, beta=0.1, gamma=0.1
    ).collect()[0]
    true_next = 10.0 + 0.5 * n + s[n % m]
    assert abs(out["forecast"] - true_next) < 0.5
    assert abs(out["trend"] - 0.5) < 0.1


def test_holt_singleton_and_empty_group_semantics(spark):
    df = spark.createDataFrame([(1, 0, 7.0)], "k int, t int, y double")
    r = forecast.holt_linear(df, ["k"], "t", "y").collect()[0]
    assert r["level"] == 7.0 and r["trend"] == 0.0 and r["forecast"] == 7.0
    # HW: below 2*period -> key dropped
    assert (
        forecast.holt_winters_additive(
            df, ["k"], "t", "y", period=2
        ).count()
        == 0
    )


def test_forecast_single_shuffle(spark, daily):
    rep = plan_report(
        forecast.holt_winters_additive(
            daily.localCheckpoint(), ["event_type"], "d", "c", period=7
        )
    )
    assert rep["shuffles"] == 1
    assert rep["row_python_nodes"] == []
    assert rep["arrow_python_nodes"] == []


def test_holt_winters_rejects_bad_period(spark, daily):
    with pytest.raises(ValueError):
        forecast.holt_winters_additive(daily, ["event_type"], "d", "c", period=1)


def test_seasonal_anomalies_flags_planted_spike(spark):
    m, n = 7, 70
    base = [100.0 + [0, 5, 3, -2, -4, 8, 1][t % 7] for t in range(n)]
    base[50] += 60.0  # planted spike
    rows = [(1, t, base[t]) for t in range(n)]
    df = spark.createDataFrame(rows, "k int, t int, y double")
    out = forecast.seasonal_anomalies(df, ["k"], "t", "y", period=m)
    flagged = [r["t"] for r in out.filter("is_anomaly = 1").collect()]
    # the spike is flagged at t=50 and echoes at t=57 (it is the
    # seasonal-naive EXPECTATION one season later)
    assert 50 in flagged
    assert set(flagged) <= {50, 57}
    rows_by_t = {r["t"]: r for r in out.collect()}
    # first season has no expectation
    for t in range(m):
        assert rows_by_t[t]["expected"] is None
        assert rows_by_t[t]["is_anomaly"] == 0
    assert rows_by_t[50]["expected"] == pytest.approx(base[50 - m])
    assert abs(rows_by_t[50]["z"]) > 3


def test_seasonal_anomalies_single_shuffle(spark):
    rows = [(1, t, float(t % 5)) for t in range(20)]
    df = spark.createDataFrame(rows, "k int, t int, y double")
    rep = plan_report(
        forecast.seasonal_anomalies(df, ["k"], "t", "y", period=5)
    )
    assert rep["shuffles"] == 1


def test_seasonal_anomalies_rejects_bad_period(spark):
    df = spark.createDataFrame([(1, 0, 1.0)], "k int, t int, y double")
    with pytest.raises(ValueError):
        forecast.seasonal_anomalies(df, ["k"], "t", "y", period=0)
