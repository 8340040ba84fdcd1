"""Streaming incremental dedup (streaming/pipelines.incremental_dedup_stream):
cross-batch dedup against the growing fingerprint archive, within-batch
dedup, and the replay-idempotence property the __batch_id partitioning
exists for."""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import functions as F

from g_data_pipeline_spark.streaming.pipelines import incremental_dedup_stream

_SCHEMA = "doc_id long, text string"


def _write_jsonl(path, rows, age_s=0):
    """age_s: seconds BEFORE now to stamp as mtime — the file stream
    source orders micro-batches by modification time, so tests that rely
    on batch order must pin distinct mtimes."""
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    ts = time.time() - age_s
    os.utime(path, (ts, ts))


def _docs_stream(spark, src_dir):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)  # one file per micro-batch
        .json(src_dir)
    )


def test_incremental_dedup_stream_cross_batch(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    # batch 1: three docs, one internal duplicate pair (1, 2).
    _write_jsonl(
        src / "a.jsonl",
        [(1, "alpha beta gamma"), (2, "alpha  BETA gamma"), (3, "delta epsilon")],
        age_s=60,
    )
    # batch 2: doc 4 duplicates doc 1 (normalized); doc 5 is new.
    _write_jsonl(
        src / "b.jsonl",
        [(4, "Alpha Beta Gamma"), (5, "zeta eta theta")],
    )
    out = str(tmp_path / "out")
    archive = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")
    incremental_dedup_stream(
        _docs_stream(spark, str(src)), archive, out, ckpt
    )
    landed = spark.read.parquet(out)
    ids = sorted(r.doc_id for r in landed.collect())
    # 1 survives its within-batch dup 2; 3 new; 4 killed by archive; 5 new.
    assert ids == [1, 3, 5]
    fps = spark.read.parquet(archive)
    assert fps.count() == 3
    assert fps.select("fingerprint").distinct().count() == 3


def test_incremental_dedup_stream_replay_idempotent(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(
        src / "a.jsonl",
        [(1, "one two three"), (2, "four five six")],
        age_s=60,
    )
    _write_jsonl(src / "b.jsonl", [(3, "one  TWO three"), (4, "seven eight")])
    out = str(tmp_path / "out")
    archive = str(tmp_path / "archive")
    ckpt = str(tmp_path / "ckpt")
    apply_batch = incremental_dedup_stream(
        _docs_stream(spark, str(src)), archive, out, ckpt
    )
    before = sorted(
        (r.doc_id, r.fingerprint) for r in spark.read.parquet(out).collect()
    )
    # Simulate the epoch-replay failure mode: re-run the LAST batch with
    # its original batch_id, AFTER its own fingerprints are already in
    # the archive. A naive archive join would now kill the whole batch.
    last = spark.read.parquet(out).agg(F.max("__batch_id")).collect()[0][0]
    replay_ids = [
        r.doc_id
        for r in spark.read.parquet(out)
        .filter(F.col("__batch_id") == last)
        .collect()
    ]
    replay_df = (
        spark.read.schema(_SCHEMA)
        .json(str(src))
        .filter(F.col("doc_id").isin(replay_ids))
    )
    apply_batch(replay_df, int(last))
    after = sorted(
        (r.doc_id, r.fingerprint) for r in spark.read.parquet(out).collect()
    )
    assert after == before
    # archive also unchanged (partition overwritten with identical rows)
    assert spark.read.parquet(archive).count() == len(before)


def test_incremental_dedup_stream_bootstrap_empty_archive(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "only.jsonl", [(9, "solo document here")])
    out = str(tmp_path / "out")
    incremental_dedup_stream(
        _docs_stream(spark, str(src)),
        str(tmp_path / "archive"),
        out,
        str(tmp_path / "ckpt"),
    )
    assert [r.doc_id for r in spark.read.parquet(out).collect()] == [9]
