"""txn_commit_sink (streaming exactly-once manifest publish) and
group_split (leakage-safe group-keyed train/val/test assignment)."""

from __future__ import annotations

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators import sampling
from g_data_pipeline_spark.operators.planlint import plan_report
from g_data_pipeline_spark.sources import txn
from g_data_pipeline_spark.streaming.pipelines import txn_commit_sink

SF = "/root/testdata/sf0.01"
_SCHEMA = "doc_id long, text string"


def _write_jsonl(path, rows, age_s=0):
    with open(path, "w") as f:
        for doc_id, text in rows:
            f.write(json.dumps({"doc_id": doc_id, "text": text}) + "\n")
    ts = time.time() - age_s
    os.utime(path, (ts, ts))


def _docs_stream(spark, src_dir):
    return (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src_dir)
    )


# ---------------------------------------------------------------- txn sink


def test_txn_commit_sink_streams_batches_atomically(spark, tmp_path):
    src = tmp_path / "src"
    src.mkdir()
    _write_jsonl(src / "a.jsonl", [(1, "alpha"), (2, "beta")], age_s=60)
    _write_jsonl(src / "b.jsonl", [(3, "gamma")])
    table = str(tmp_path / "tbl")
    write_batch = txn_commit_sink(
        _docs_stream(spark, str(src)), table, str(tmp_path / "ckpt")
    )
    # two micro-batches -> two committed versions, union of all rows
    assert txn.latest_version(spark, table) == 2
    got = sorted(
        r.doc_id for r in txn.read_committed(spark, table).collect()
    )
    assert got == [1, 2, 3]

    # simulated replay of epoch 1 (same batch_id): the commit protocol
    # no-ops — no new version, no duplicate rows
    replay_df = spark.createDataFrame([(3, "gamma")], _SCHEMA)
    write_batch(replay_df, 1)
    assert txn.latest_version(spark, table) == 2
    got = sorted(
        r.doc_id for r in txn.read_committed(spark, table).collect()
    )
    assert got == [1, 2, 3]


def test_txn_commit_sink_second_stream_does_not_collide(spark, tmp_path):
    """Batch ids restart at 0 per checkpoint: a SECOND streaming query
    (fresh checkpoint dir) into the same table must append its batch-0,
    not silently no-op against the first query's batch-0 run_id."""
    src1 = tmp_path / "src1"
    src1.mkdir()
    _write_jsonl(src1 / "a.jsonl", [(1, "alpha")])
    src2 = tmp_path / "src2"
    src2.mkdir()
    _write_jsonl(src2 / "b.jsonl", [(2, "beta")])
    table = str(tmp_path / "tbl")
    txn_commit_sink(
        _docs_stream(spark, str(src1)), table, str(tmp_path / "ckpt1")
    )
    txn_commit_sink(
        _docs_stream(spark, str(src2)), table, str(tmp_path / "ckpt2")
    )
    got = sorted(
        r.doc_id for r in txn.read_committed(spark, table).collect()
    )
    assert got == [1, 2], "second query's batch-0 was dropped"
    # same checkpoint dir -> same namespace -> replay still idempotent
    txn_commit_sink(
        _docs_stream(spark, str(src2)), table, str(tmp_path / "ckpt2")
    )
    got = sorted(
        r.doc_id for r in txn.read_committed(spark, table).collect()
    )
    assert got == [1, 2]


def test_commit_write_version_race_rechecks_run_id(spark, tmp_path):
    """A writer that loses the version race to a CONCURRENT HOLDER OF ITS
    OWN run_id must return the winner's version, not commit a duplicate.
    Simulated by injecting the winner's manifest after the loser's
    pre-stage idempotence check has already passed."""
    table = str(tmp_path / "tbl")
    df1 = spark.createDataFrame([(1, "a")], _SCHEMA)

    real_staged = txn._staged_files
    state = {"injected": False}

    def inject_then_list(spark_, staging):
        # runs after the loser staged, before its commit loop lists
        # manifests: the "winner" (same run_id) commits now.
        files = real_staged(spark_, staging)
        if not state["injected"]:
            state["injected"] = True
            txn.commit_write(spark_, df1, table, run_id="shared")
        return files

    txn._staged_files = inject_then_list
    try:
        v = txn.commit_write(spark, df1, table, run_id="shared")
    finally:
        txn._staged_files = real_staged
    assert v == 1, "loser committed a duplicate version"
    assert txn.latest_version(spark, table) == 1
    assert [r.doc_id for r in txn.read_committed(spark, table).collect()] == [1]


# -------------------------------------------------------------- group_split


def test_group_split_never_straddles_groups(spark):
    docs = load_table(spark, SF, "documents")
    out = sampling.group_split(docs, ["source"], seed="s1")
    per_group = (
        out.groupBy("source")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert per_group
    for r in per_group:
        assert r["n_splits"] == 1, f"group {r[0]} straddles splits"


def test_group_split_fractions_and_determinism(spark):
    # orders has enough distinct o_custkey groups for fraction checks
    orders = load_table(spark, SF, "orders")
    splits = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = sampling.group_split(orders, ["o_custkey"], splits, seed="z")
    shares = {
        r["split"]: r["n"]
        for r in out.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    total = sum(shares.values())
    assert set(shares) == {"train", "val", "test"}
    assert 0.7 < shares["train"] / total < 0.9
    # deterministic: identical second run
    again = {
        r["split"]: r["n"]
        for r in sampling.group_split(orders, ["o_custkey"], splits, seed="z")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert shares == again


def test_group_split_matches_duckdb_twin(spark, duck):
    """Label assignment is reproducible in SQL via sql_hash_bucket — the
    same cumulative-range rule on the same md5 buckets."""
    docs = load_table(spark, SF, "documents")
    got = {
        (r["doc_id"], r["split"])
        for r in sampling.group_split(
            docs, ["source"], {"train": 0.8, "val": 0.1, "test": 0.1}, seed="q"
        )
        .select("doc_id", "split")
        .collect()
    }
    bucket = sampling.sql_hash_bucket(["source"], seed="q")
    want = {
        (r[0], r[1])
        for r in duck.execute(
            f"""
            SELECT doc_id,
                   CASE WHEN {bucket} < 800000 THEN 'train'
                        WHEN {bucket} < 900000 THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
            """
        ).fetchall()
    }
    assert got == want


def test_group_split_zero_shuffle(spark):
    docs = load_table(spark, SF, "documents")
    rep = plan_report(sampling.group_split(docs, ["source"]))
    assert rep["shuffles"] == 0


def test_group_split_rejects_bad_fractions(spark):
    docs = load_table(spark, SF, "documents")
    with pytest.raises(ValueError):
        sampling.group_split(docs, ["source"], {"train": 0.5, "test": 0.2})
