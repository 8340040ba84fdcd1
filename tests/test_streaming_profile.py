"""Streaming profile maintenance (streaming/pipelines.
profile_maintenance_stream): the stats dataset built on ingest must yield
the same merged profile as a batch pass over all ingested data, and a
replayed epoch must not double-count its batch."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.incremental_profile import (
    merged_profile,
    partial_profile,
)
from g_data_pipeline_spark.streaming.pipelines import profile_maintenance_stream

_SCHEMA = "id long, x double, y double"
_COLS = ["x", "y"]


def _write_jsonl(path, rows, age_s=0):
    with open(path, "w") as f:
        for rid, x, y in rows:
            f.write(json.dumps({"id": rid, "x": x, "y": y}) + "\n")
    ts = time.time() - age_s
    os.utime(path, (ts, ts))


_B1 = [(1, 1.5, 10.0), (2, 2.5, None), (3, 3.5, 30.0)]
_B2 = [(4, 100.25, 40.0), (5, 0.75, None), (6, 2.5, 60.0), (7, 9.0, 70.0)]


def _run(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", _B1, age_s=60)
    _write_jsonl(src / "b.jsonl", _B2)
    stats = str(tmp_path / "stats")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    apply_batch = profile_maintenance_stream(
        stream, stats, str(tmp_path / "ckpt"), _COLS
    )
    return stats, apply_batch


def _merged(spark, stats):
    rows = merged_profile(spark.read.parquet(stats), _COLS).collect()
    return {r["column"]: r for r in rows}


def _batch_truth(spark):
    df = spark.createDataFrame(_B1 + _B2, _SCHEMA)
    return {
        r["column"]: r
        for r in merged_profile(
            partial_profile(df, _COLS, [F.lit(0).alias("k")]), _COLS
        ).collect()
    }


def test_streamed_stats_match_batch_profile(spark, tmp_path):
    stats, _ = _run(spark, tmp_path)
    # one stats partition per micro-batch
    assert (
        spark.read.parquet(stats).select("__batch_id").distinct().count() == 2
    )
    got, want = _merged(spark, stats), _batch_truth(spark)
    for c in _COLS:
        for f in ["cnt", "nulls", "mean", "min", "max", "stddev"]:
            assert got[c][f] == want[c][f], (c, f)
        # tiny batches: sketches are exact at this cardinality
        assert got[c]["distinct_est"] == want[c]["distinct_est"], c


def test_replay_does_not_double_count(spark, tmp_path):
    stats, apply_batch = _run(spark, tmp_path)
    before = _merged(spark, stats)
    # simulate a post-failure replay of epoch 1 with the same batch_id
    apply_batch(spark.createDataFrame(_B2, _SCHEMA), 1)
    after = _merged(spark, stats)
    for c in _COLS:
        for f in ["cnt", "nulls", "mean", "min", "max", "stddev",
                  "distinct_est", "q50_est"]:
            assert after[c][f] == before[c][f], (c, f)


def test_streaming_heavy_hitters_match_batch_and_replay(spark, tmp_path):
    """heavy_hitter_maintenance_stream: the folded top-k over streamed
    per-batch summaries brackets the exact batch counts, trailing-window
    trends come from a __batch_id filter, and an epoch replay doesn't
    double-count."""
    from g_data_pipeline_spark.operators.incremental_profile import (
        merged_heavy_hitters,
    )
    from g_data_pipeline_spark.streaming.pipelines import (
        heavy_hitter_maintenance_stream,
    )

    src = tmp_path / "hh_src"
    src.mkdir()
    rows1 = [(1, 1.0, 10.0), (2, 1.0, 10.0), (3, 1.0, 20.0)]
    rows2 = [(4, 1.0, 10.0), (5, 1.0, 30.0), (6, 1.0, 10.0), (7, 1.0, 30.0)]
    _write_jsonl(src / "a.jsonl", rows1, age_s=60)
    _write_jsonl(src / "b.jsonl", rows2)
    stats = str(tmp_path / "hh_stats")
    stream = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )
    apply_batch = heavy_hitter_maintenance_stream(
        stream, "y", stats, str(tmp_path / "hh_ckpt"), k=8
    )
    top = merged_heavy_hitters(spark.read.parquet(stats), k=3).collect()
    # k=8 covers every batch's alphabet -> fold is exact
    assert {r["value"]: r["cnt_lo"] for r in top} == {
        "10.0": 4, "30.0": 2, "20.0": 1
    }
    assert all(r["cnt_lo"] == r["cnt_hi"] for r in top)

    # trailing window = filter the stats partitions, never the stream
    last = spark.read.parquet(stats).where(F.col("__batch_id") == 1)
    trend = merged_heavy_hitters(last, k=2).collect()
    assert {r["value"]: r["cnt_lo"] for r in trend} == {"10.0": 2, "30.0": 2}

    # replay epoch 1: same batch_id overwrites its own partition only
    apply_batch(spark.createDataFrame(rows2, _SCHEMA), 1)
    again = merged_heavy_hitters(spark.read.parquet(stats), k=3).collect()
    assert {r["value"]: r["cnt_lo"] for r in again} == {
        "10.0": 4, "30.0": 2, "20.0": 1
    }
