"""Streaming progress capture (streaming/metrics.py): listener records
one event per micro-batch with the right row counts, and the events land
as a queryable DataFrame."""

from __future__ import annotations

import json
import os
import time

from g_data_pipeline_spark.streaming.metrics import (
    attach,
    detach,
    progress_frame,
)
from g_data_pipeline_spark.streaming.pipelines import (
    exactly_once_parquet_sink,
)


def _write_jsonl(path, rows, age_s=0):
    with open(path, "w") as f:
        for rid, x in rows:
            f.write(json.dumps({"id": rid, "x": x}) + "\n")
    ts = time.time() - age_s
    os.utime(path, (ts, ts))


def test_listener_captures_per_batch_progress(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", [(1, 1.0), (2, 2.0), (3, 3.0)], age_s=60)
    _write_jsonl(src / "b.jsonl", [(4, 4.0), (5, 5.0)])
    stream = (
        spark.readStream.schema("id long, x double")
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    cap = attach(spark)
    try:
        exactly_once_parquet_sink(
            stream, str(tmp_path / "out"), str(tmp_path / "ckpt")
        )
        # listener callbacks are asynchronous: wait for both batch events
        deadline = time.time() + 30
        while (
            sum(e["num_input_rows"] > 0 for e in cap.events) < 2
            and time.time() < deadline
        ):
            time.sleep(0.2)
    finally:
        detach(spark, cap)
    data = [e for e in cap.events if e["num_input_rows"] > 0]
    assert sorted(e["num_input_rows"] for e in data) == [2, 3]
    assert all(e["batch_duration_ms"] >= 0 for e in data)
    assert len({e["run_id"] for e in data}) == 1

    mf = progress_frame(spark, cap)
    assert mf.filter("num_input_rows > 0").count() == 2
    assert set(mf.columns) >= {
        "batch_id",
        "num_input_rows",
        "processed_rows_per_second",
    }


def test_progress_frame_empty_safe(spark):
    cap = attach(spark)
    detach(spark, cap)
    assert progress_frame(spark, cap).count() == 0