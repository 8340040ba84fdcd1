"""substring_dedup_stream: exactly-once streaming substring dedup over
manifest tables — cross-batch cuts, replay idempotence, and the
crashed-after-delta-commit recovery (the as-of-parent directory read)."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from g_data_pipeline_spark.sources import txn
from g_data_pipeline_spark.streaming.pipelines import substring_dedup_stream

W = 10
_SCHEMA = "doc_id long, text string"


def _words(prefix, n):
    return " ".join(f"{prefix}{k}" for k in range(n))


SPAN = _words("dup", W)


def _write_jsonl(path, rows, age_s=0):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    ts = time.time() - age_s
    os.utime(path, (ts, ts))


def _stream(spark, src):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(str(src))
    )


def _out_rows(spark, table):
    return {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in txn.read_committed(spark, table).collect()
    }


def test_cross_batch_cut_and_replay_idempotence(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", [(1, f"{_words('h', 4)} {SPAN}")], age_s=60)
    _write_jsonl(
        src / "b.jsonl",
        [(2, f"{SPAN} {_words('x', 5)}"), (3, _words("q", 15))],
    )
    directory = str(tmp_path / "dir")
    out = str(tmp_path / "out")
    apply_batch = substring_dedup_stream(
        _stream(spark, src),
        directory,
        out,
        str(tmp_path / "ckpt"),
        window_tokens=W,
    )
    got = _out_rows(spark, out)
    # batch 0 doc keeps its text; batch 1's copy of the span is cut
    assert got[1] == (f"{_words('h', 4)} {SPAN}", W + 4, W + 4)
    assert got[2] == (_words("x", 5), W + 5, 5)
    assert got[3] == (_words("q", 15), 15, 15)
    v_dir = txn.latest_version(spark, directory)
    v_out = txn.latest_version(spark, out)

    # simulated replay of epoch 1: same batch_id, same data — both
    # commits no-op on their run_ids, directory read pins to the parent
    replay = spark.createDataFrame(
        [(2, f"{SPAN} {_words('x', 5)}"), (3, _words("q", 15))], _SCHEMA
    )
    apply_batch(replay, 1)
    assert txn.latest_version(spark, directory) == v_dir
    assert txn.latest_version(spark, out) == v_out
    assert _out_rows(spark, out) == got


def test_crash_after_delta_commit_recovers_correct_cleaned(spark, tmp_path):
    """A failed epoch that committed its directory delta but died before
    the cleaned commit must NOT cut its own windows on replay: the
    directory is read as of the delta's parent version."""
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", [(1, _words("z", 25))], age_s=60)
    directory = str(tmp_path / "dir")
    out = str(tmp_path / "out")
    apply_batch = substring_dedup_stream(
        _stream(spark, src),
        directory,
        out,
        str(tmp_path / "ckpt"),
        window_tokens=W,
        sink_name="s",
    )
    # simulate the first ATTEMPT of epoch 1: delta committed, out not
    batch1 = spark.createDataFrame([(9, _words("fresh", 20))], _SCHEMA)
    from g_data_pipeline_spark.operators.dedup import (
        incremental_substring_dedup,
    )

    _, delta = incremental_substring_dedup(
        batch1, txn.read_committed(spark, directory), "doc_id", "text", W
    )
    txn.commit_write(
        spark, delta, directory, run_id="s-dir-batch-1", mode="append"
    )
    v_dir = txn.latest_version(spark, directory)

    # the replay (what Structured Streaming does after the crash)
    apply_batch(batch1, 1)
    got = _out_rows(spark, out)
    # doc 9's text survives intact — its windows were NOT self-cut
    assert got[9] == (_words("fresh", 20), 20, 20)
    # directory was not double-appended
    assert txn.latest_version(spark, directory) == v_dir
    # next batch sees doc 9's windows and cuts a copy
    batch2 = spark.createDataFrame(
        [(10, " ".join(f"fresh{k}" for k in range(W)))], _SCHEMA
    )
    apply_batch(batch2, 2)
    got = _out_rows(spark, out)
    assert got[10] == ("", W, 0)
