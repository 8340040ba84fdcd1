"""Streaming/batch parity: the same window builders over the same rows must
produce identical results through the streaming engine (AvailableNow ->
memory sink) and the batch engine."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.windows import (
    session_window_agg,
    tumbling_window_agg,
)
from g_data_pipeline_spark.streaming import (
    run_available_now,
    sessionized_counts_stream,
    stream_events_from_json,
    tumbling_counts_stream,
)
from tests.conftest import SF_DIR_SMOKE


@pytest.fixture(scope="module")
def events_json_dir(spark, tmp_path_factory):
    """Land the sf0.001 events table as JSON files (the file stream source)."""
    out = tmp_path_factory.mktemp("events_stream")
    rows = load_table(spark, SF_DIR_SMOKE, "events").collect()
    half = len(rows) // 2
    for i, chunk in enumerate((rows[:half], rows[half:])):
        with open(out / f"part-{i}.json", "w") as fh:
            for r in chunk:
                d = r.asDict()
                d["ts"] = d["ts"].isoformat()
                fh.write(json.dumps(d) + "\n")
    return str(out)


def _normalize(df):
    return sorted(tuple(r) for r in df.collect())


def test_tumbling_stream_matches_batch(spark, events_json_dir):
    stream = stream_events_from_json(spark, events_json_dir)
    got = run_available_now(
        tumbling_counts_stream(stream, "1 hour"), "t_tumble", "complete"
    )
    batch = tumbling_window_agg(
        load_table(spark, SF_DIR_SMOKE, "events"),
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        ],
    )
    got_n = _normalize(got.select("w_start", "event_type", "n_events"))
    exp_n = _normalize(batch.select("w_start", "event_type", "n_events"))
    assert got_n == exp_n


def test_session_stream_matches_batch(spark, events_json_dir):
    stream = stream_events_from_json(spark, events_json_dir)
    got = run_available_now(
        sessionized_counts_stream(stream, gap="5 minutes"),
        "t_sessions",
        "complete",
    )
    batch = session_window_agg(
        load_table(spark, SF_DIR_SMOKE, "events"),
        "ts",
        "5 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events")],
    )
    assert _normalize(got) == _normalize(batch)


def test_watermark_drops_state_in_append_mode(spark, events_json_dir):
    """Append mode only emits windows finalized by the watermark — a smoke
    check that watermarking is wired (full late-data simulation needs a
    multi-batch source)."""
    stream = stream_events_from_json(spark, events_json_dir)
    got = run_available_now(
        tumbling_counts_stream(stream, "1 hour", watermark="1 minute"),
        "t_wm",
        "append",
    )
    batch_windows = (
        tumbling_window_agg(
            load_table(spark, SF_DIR_SMOKE, "events"), "ts", "1 hour",
            keys=["event_type"],
        )
        .select("w_start")
        .distinct()
        .count()
    )
    # all but the final watermark-straddling window(s) are emitted
    emitted = got.select("w_start").distinct().count()
    assert emitted >= batch_windows - 24
    assert emitted < batch_windows + 1


def test_stateful_custom_operator_matches_batch(spark, events_json_dir):
    """applyInPandasWithState running totals: after consuming all input,
    per-user state must equal the batch groupBy totals."""
    from g_data_pipeline_spark.streaming.pipelines import (
        running_user_totals_stream,
    )

    stream = stream_events_from_json(spark, events_json_dir)
    got_df = run_available_now(
        running_user_totals_stream(stream), "t_state", "update"
    )
    # update mode emits one row per user per micro-batch -> keep the one
    # with the highest running count (the final state)
    latest = {}
    for r in got_df.collect():
        cur = latest.get(r.user_id)
        if cur is None or r.n_events > cur[0]:
            latest[r.user_id] = (r.n_events, r.total_value)
    batch = {
        r.user_id: (r.n, r.total)
        for r in load_table(spark, SF_DIR_SMOKE, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total"))
        .collect()
    }
    assert set(latest) == set(batch)
    for u, (n, total) in batch.items():
        assert latest[u][0] == n
        assert latest[u][1] == pytest.approx(total, rel=1e-9)
