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


def test_late_data_dropped_across_microbatches(spark, tmp_path):
    """Two micro-batches (maxFilesPerTrigger=1): an event in batch 2 that is
    older than the watermark established by batch 1 must be DROPPED from the
    aggregation, and its window must never emit."""
    import datetime as dt
    import time as _time
    from g_data_pipeline_spark.streaming.pipelines import (
        EVENT_SCHEMA,
        run_available_now,
    )
    from g_data_pipeline_spark.operators.windows import tumbling_window_agg

    d = tmp_path / "late"
    d.mkdir()

    def write(fname, rows):
        with open(d / fname, "w") as fh:
            for i, ts in enumerate(rows):
                fh.write(
                    json.dumps(
                        {
                            "event_id": i,
                            "ts": ts.isoformat(),
                            "user_id": 1,
                            "event_type": "x",
                            "value": 1.0,
                        }
                    )
                    + "\n"
                )

    t0 = dt.datetime(2024, 1, 1, 10, 0)
    ckpt = str(tmp_path / "ckpt")
    emitted = []

    def run_once():
        stream = spark.readStream.schema(EVENT_SCHEMA).json(str(d))
        agg = tumbling_window_agg(
            stream.withWatermark("ts", "5 minutes"), "ts", "1 minute"
        )
        q = (
            agg.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .foreachBatch(
                lambda batch_df, _id: emitted.extend(batch_df.collect())
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        q.stop()

    # run 1: events 10:00-10:05 -> checkpointed watermark = 10:00
    write("a-first.json", [t0 + dt.timedelta(minutes=m) for m in range(6)])
    run_once()
    # run 2 (same checkpoint): one LATE event (09:00, beyond the persisted
    # watermark -> must be dropped) + one fresh event (10:06)
    write(
        "b-second.json",
        [dt.datetime(2024, 1, 1, 9, 0), t0 + dt.timedelta(minutes=6)],
    )
    run_once()

    windows = {r.w_start.hour * 60 + r.w_start.minute for r in emitted}
    assert 9 * 60 not in windows  # late 09:00 event dropped entirely
    assert 10 * 60 in windows  # on-time windows emitted
    counts = {
        (r.w_start.hour, r.w_start.minute): r.n_events for r in emitted
    }
    assert counts[(10, 0)] == 1  # exactly the batch-1 event, nothing late


def test_streaming_dedup_drops_redelivered_events(spark, tmp_path):
    """At-least-once redelivery (same event_id in two micro-batch files) must
    yield exactly one output row per event_id, with bounded state
    (dropDuplicatesWithinWatermark)."""
    import os

    from g_data_pipeline_spark.streaming import dedup_events_stream

    src = tmp_path / "dup_events"
    os.makedirs(src)
    base = {"user_id": 1, "event_type": "click", "value": 1.0, "props": "{}"}
    with open(src / "a.json", "w") as fh:
        for i in range(5):
            fh.write(json.dumps({**base, "event_id": i, "ts": f"2024-01-01T10:0{i}:00"}) + "\n")
    with open(src / "b.json", "w") as fh:
        # events 3,4 redelivered + two new ones
        for i in (3, 4, 5, 6):
            fh.write(json.dumps({**base, "event_id": i, "ts": f"2024-01-01T10:0{i}:00"}) + "\n")

    stream = stream_events_from_json(spark, str(src))
    got = run_available_now(
        dedup_events_stream(stream, watermark="1 hour"), "t_dedup", "append"
    )
    ids = sorted(r.event_id for r in got.collect())
    assert ids == [0, 1, 2, 3, 4, 5, 6]  # each id exactly once


def test_stream_static_enrichment_matches_batch(spark, events_json_dir):
    from g_data_pipeline_spark.streaming import (
        enrich_events_stream,
    )

    users = spark.createDataFrame(
        [(i, f"tier{i % 3}") for i in range(30)], "user_id long, tier string"
    )
    stream = stream_events_from_json(spark, events_json_dir)
    got = run_available_now(
        enrich_events_stream(stream, users).select(
            "event_id", "user_id", "tier"
        ),
        "t_enrich",
        "append",
    )
    batch = (
        load_table(spark, SF_DIR_SMOKE, "events")
        .join(F.broadcast(users), "user_id", "left")
        .select("event_id", "user_id", "tier")
    )
    assert _normalize(got) == _normalize(batch)


def test_stream_stream_join_matches_batch(spark, events_json_dir):
    """Watermarked stream-stream interval join (click -> purchase within 1h)
    must equal the equivalent batch interval join over the same rows."""
    from g_data_pipeline_spark.streaming import click_to_purchase_stream

    stream = stream_events_from_json(spark, events_json_dir)
    got = run_available_now(
        click_to_purchase_stream(stream), "t_c2p", "append"
    )
    ev = load_table(spark, SF_DIR_SMOKE, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"),
    )
    batch = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 hour")),
    ).select(
        "user_id", "click_id", "click_ts", "purchase_id", "purchase_ts",
        "purchase_value",
    )
    b = _normalize(batch)
    assert len(b) > 0  # the fixture must actually exercise the join
    assert _normalize(got) == b


def test_exactly_once_sink_idempotent_on_replay(spark, events_json_dir, tmp_path):
    """foreachBatch + dynamic partition overwrite: draining the stream lands
    exactly the input rows; replaying a batch (the post-failure path —
    Structured Streaming re-runs the epoch with the SAME batch_id)
    overwrites its own partition instead of appending duplicates."""
    from g_data_pipeline_spark.streaming.pipelines import (
        exactly_once_parquet_sink,
        stream_events_from_json,
    )

    out = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    stream = stream_events_from_json(spark, events_json_dir)
    write_batch = exactly_once_parquet_sink(stream, out, ckpt)

    n_expected = load_table(spark, SF_DIR_SMOKE, "events").count()
    landed = spark.read.parquet(out)
    assert landed.count() == n_expected
    assert landed.select("event_id").distinct().count() == n_expected

    # simulated replay: re-write batch 0 with the same batch_id. Materialize
    # the rows first — overwriting a path while lazily reading from it is
    # exactly the self-reference the real foreachBatch replay never has
    # (it replays from the SOURCE).
    rows0 = (
        landed.filter(F.col("__batch_id") == 0).drop("__batch_id").collect()
    )
    assert rows0
    batch0 = spark.createDataFrame(rows0, landed.drop("__batch_id").schema)
    write_batch(batch0, 0)
    after = spark.read.parquet(out)
    assert after.count() == n_expected  # no duplicates, nothing lost


def test_streaming_merge_sink_matches_batch_merge_and_replays(
    spark, tmp_path
):
    """streaming_merge_sink: applying a change feed in micro-batches lands
    the same final snapshot as one batch merge_latest over the whole feed
    (sequence numbers make latest-wins order-independent), and replaying an
    epoch (same batch_id) is idempotent."""
    import json as _json

    from g_data_pipeline_spark.operators.cdc import merge_latest
    from g_data_pipeline_spark.streaming.pipelines import (
        read_merge_snapshot,
        streaming_merge_sink,
    )

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"]
    )
    changes = [
        {"k": 1, "v": "a2", "change_seq": 1, "op": "U"},
        {"k": 2, "v": None, "change_seq": 2, "op": "D"},
        {"k": 4, "v": "d", "change_seq": 3, "op": "I"},
        {"k": 1, "v": "a3", "change_seq": 4, "op": "U"},
    ]
    src = tmp_path / "changes"
    src.mkdir()
    # two files -> at least the chance of multiple micro-batches; semantics
    # must not depend on the batch split (seq numbers carry the order)
    for i, chunk in enumerate((changes[:2], changes[2:])):
        with open(src / f"c{i}.json", "w") as fh:
            for row in chunk:
                fh.write(_json.dumps(row) + "\n")
    stream = (
        spark.readStream.schema("k long, v string, change_seq long, op string")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    target = str(tmp_path / "snap")
    apply_batch = streaming_merge_sink(
        stream, base, target, str(tmp_path / "ckpt"), key="k"
    )

    got = {
        r["k"]: r["v"] for r in read_merge_snapshot(spark, target).collect()
    }
    all_changes = spark.createDataFrame(
        [(c["k"], c["v"], c["change_seq"], c["op"]) for c in changes],
        ["k", "v", "change_seq", "op"],
    )
    want = {
        r["k"]: r["v"] for r in merge_latest(base, all_changes, "k").collect()
    }
    assert got == want == {1: "a3", 3: "c", 4: "d"}

    # replay the LAST epoch: same batch_id must reproduce, not double-apply
    last_batch = spark.createDataFrame(
        [(c["k"], c["v"], c["change_seq"], c["op"]) for c in changes[2:]],
        ["k", "v", "change_seq", "op"],
    )
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in __import__("os").listdir(target)
        if d.startswith("v=")
    )
    apply_batch(last_batch, versions[-1])
    got2 = {
        r["k"]: r["v"] for r in read_merge_snapshot(spark, target).collect()
    }
    assert got2 == want


def test_streaming_rollup_sink_matches_batch_and_replays(spark, tmp_path):
    """streaming_rollup_sink: folding a fact feed micro-batch by
    micro-batch lands a snapshot BIT-EQUAL to one aggregate over the whole
    feed (decimal sums are associative), and replaying an epoch repairs
    rather than double-counts."""
    import json as _json

    from g_data_pipeline_spark.operators.matview import (
        RollupSpec,
        aggregate_batch,
    )
    from g_data_pipeline_spark.streaming.pipelines import (
        read_merge_snapshot,
        streaming_rollup_sink,
    )

    spec = RollupSpec(
        keys=["k"],
        sums={"sx": "x"},
        mins={"mn": "x"},
        maxs={"mx": "x"},
    )
    facts = [
        {"k": "a", "x": 1.25},
        {"k": "b", "x": 2.5},
        {"k": "a", "x": -0.75},
        {"k": "c", "x": 10.0},
        {"k": "b", "x": 0.125},
        {"k": "a", "x": 3.0},
    ]
    src = tmp_path / "facts"
    src.mkdir()
    for i, chunk in enumerate((facts[:2], facts[2:4], facts[4:])):
        with open(src / f"f{i}.json", "w") as fh:
            for row in chunk:
                fh.write(_json.dumps(row) + "\n")
    stream = (
        spark.readStream.schema("k string, x double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    target = str(tmp_path / "mv")
    apply_batch = streaming_rollup_sink(
        stream, spec, target, str(tmp_path / "ckpt")
    )

    def rows(df):
        return sorted(tuple(r) for r in df.select(sorted(df.columns)).collect())

    whole = spark.createDataFrame(
        [(f["k"], f["x"]) for f in facts], "k string, x double"
    )
    want = rows(aggregate_batch(whole, spec))
    assert rows(read_merge_snapshot(spark, target)) == want

    # replay the LAST epoch: same batch_id reads the same predecessor and
    # rewrites the same version — no double-fold
    versions = sorted(
        int(d.split("=", 1)[1])
        for d in __import__("os").listdir(target)
        if d.startswith("v=")
    )
    last_batch = spark.createDataFrame(
        [(f["k"], f["x"]) for f in facts[4:]], "k string, x double"
    )
    apply_batch(last_batch, versions[-1])
    assert rows(read_merge_snapshot(spark, target)) == want


def test_streaming_sessionize_matches_batch(spark, events_json_dir):
    """sessionize_stream (applyInPandasWithState): single-batch replay must
    assign every event the same session_idx as the batch window-function
    assignment (30-min gap)."""
    from pyspark.sql import Window

    from g_data_pipeline_spark.streaming import sessionize_stream

    stream = stream_events_from_json(spark, events_json_dir)
    got = {
        (r.user_id, r.event_id): r.session_idx
        for r in run_available_now(
            sessionize_stream(stream), "t_sessionize", "append"
        ).collect()
    }

    events = load_table(spark, SF_DIR_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    gap = us - F.lag(us).over(w)
    new_s = F.when(gap.isNull() | (gap > 30 * 60 * 1_000_000), 1).otherwise(0)
    run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    expected = {
        (r.user_id, r.event_id): r.session_idx
        for r in events.select(
            "user_id",
            "event_id",
            F.sum(new_s).over(run).cast("long").alias("session_idx"),
        ).collect()
    }
    assert got == expected
