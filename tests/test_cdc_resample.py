"""Semantics tests for operators/cdc.py and operators/resample.py on
hand-built inputs (the registry oracle covers the at-scale twin; these pin
the edge semantics the synthetic tables don't hit)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.cdc import merge_latest, scd2_history
from g_data_pipeline_spark.operators.resample import gap_fill


def _ts(h, m=0):
    return dt.datetime(2024, 1, 1, h, m)


def test_merge_latest_semantics(spark):
    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = spark.createDataFrame(
        [
            (1, "a2", 1, "U"),  # update
            (1, "a3", 2, "U"),  # later update wins
            (2, None, 1, "D"),  # delete
            (4, "d", 1, "I"),  # insert
            (5, "e", 1, "U"),  # upsert of unseen key = insert
            (5, None, 2, "D"),  # ...then deleted: net absent
        ],
        ["k", "v", "change_seq", "op"],
    )
    out = {
        r["k"]: r["v"]
        for r in merge_latest(base, changes, key="k").collect()
    }
    assert out == {1: "a3", 3: "c", 4: "d"}


def test_merge_latest_equal_seq_upsert_beats_delete(spark):
    base = spark.createDataFrame([(9, "x")], ["k", "v"])
    changes = spark.createDataFrame(
        [(9, None, 5, "D"), (9, "y", 5, "U")], ["k", "v", "change_seq", "op"]
    )
    rows = merge_latest(base, changes, key="k").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(9, "y")]


def test_scd2_collapses_runs_and_numbers_versions(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1), 10, "A"),
            (1, _ts(2), 11, "A"),  # same attr: no new version
            (1, _ts(3), 12, "B"),
            (1, _ts(4), 13, "A"),  # A again later = NEW version
            (2, _ts(5), 14, "Z"),
        ],
        ["k", "ts", "eid", "attr"],
    )
    hist = scd2_history(df, "k", "ts", "attr", tie_col="eid").collect()
    by_key = {}
    for r in hist:
        by_key.setdefault(r["k"], []).append(r)
    v1 = sorted(by_key[1], key=lambda r: r["version_no"])
    assert [r["attr"] for r in v1] == ["A", "B", "A"]
    assert [r["valid_from"] for r in v1] == [_ts(1), _ts(3), _ts(4)]
    assert [r["valid_to"] for r in v1] == [_ts(3), _ts(4), None]
    assert [r["is_current"] for r in v1] == [0, 0, 1]
    assert by_key[2][0]["is_current"] == 1 and by_key[2][0]["version_no"] == 1


def test_gap_fill_locf_and_zero_count_gaps(spark):
    df = spark.createDataFrame(
        [
            (1, _ts(1, 10), 100, 1.0),
            (1, _ts(1, 50), 101, 2.0),  # same bucket, later ts wins
            (1, _ts(4, 5), 102, 9.0),  # hours 2,3 are gaps
        ],
        ["k", "ts", "eid", "v"],
    )
    out = sorted(
        gap_fill(df, "k", "ts", "v", tie_col="eid").collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"].hour for r in out] == [1, 2, 3, 4]
    assert [r["n_events"] for r in out] == [2, 0, 0, 1]
    assert [r["filled_value"] for r in out] == [2.0, 2.0, 2.0, 9.0]


def test_gap_fill_bucket_tie_broken_by_id(spark):
    df = spark.createDataFrame(
        [(1, _ts(1, 30), 7, 5.0), (1, _ts(1, 30), 8, 6.0)],
        ["k", "ts", "eid", "v"],
    )
    out = gap_fill(df, "k", "ts", "v", tie_col="eid").collect()
    assert len(out) == 1 and out[0]["filled_value"] == 6.0
