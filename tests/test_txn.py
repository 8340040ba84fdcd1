"""Manifest-committed atomic publishing (sources/txn.py).

Pins the commit protocol's contract: readers see committed manifests
only (partial/crashed writes invisible), retries are idempotent by
run_id, appends snapshot the parent's files, overwrite + time travel
coexist, version races resolve forward, and vacuum removes exactly the
never-committed staging runs.
"""

from __future__ import annotations

import json
from pathlib import Path

import pytest

from g_data_pipeline_spark.sources import txn


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def test_commit_then_read_roundtrip(spark, table):
    v = txn.commit_write(spark, _df(spark, 0, 10), table, run_id="r1")
    assert v == 1
    assert txn.latest_version(spark, table) == 1
    assert _ids(txn.read_committed(spark, table)) == list(range(10))


def test_append_snapshots_and_time_travel(spark, table):
    txn.commit_write(spark, _df(spark, 0, 5), table, run_id="r1")
    v2 = txn.commit_write(
        spark, _df(spark, 5, 8), table, run_id="r2", mode="append"
    )
    assert v2 == 2
    assert _ids(txn.read_committed(spark, table)) == list(range(8))
    # version 1 still reads exactly the first commit
    assert _ids(txn.read_committed(spark, table, version=1)) == list(range(5))


def test_overwrite_replaces_but_history_remains(spark, table):
    txn.commit_write(spark, _df(spark, 0, 5), table, run_id="r1")
    txn.commit_write(
        spark, _df(spark, 100, 103), table, run_id="r2", mode="overwrite"
    )
    assert _ids(txn.read_committed(spark, table)) == [100, 101, 102]
    assert _ids(txn.read_committed(spark, table, version=1)) == list(range(5))


def test_uncommitted_staging_invisible(spark, table):
    """Crash simulation: a run that staged data files but never reached
    the manifest rename must be invisible to readers."""
    txn.commit_write(spark, _df(spark, 0, 5), table, run_id="good")
    _df(spark, 900, 950).write.mode("overwrite").parquet(
        f"{table}/{txn.STAGING_DIR}/crashed-run"
    )
    assert _ids(txn.read_committed(spark, table)) == list(range(5))
    assert txn.latest_version(spark, table) == 1


def test_retry_same_run_id_is_idempotent(spark, table):
    v1 = txn.commit_write(spark, _df(spark, 0, 5), table, run_id="job-7")
    # driver crashed after commit, retries the whole write verbatim
    v2 = txn.commit_write(spark, _df(spark, 0, 5), table, run_id="job-7")
    assert v1 == v2 == 1
    assert txn.latest_version(spark, table) == 1
    assert _ids(txn.read_committed(spark, table)) == list(range(5))


def test_version_race_retries_forward(spark, table):
    """A competing writer's manifest at the next version forces the
    commit to land one higher, with the competitor as its parent."""
    txn.commit_write(spark, _df(spark, 0, 3), table, run_id="r1")
    # plant a competing version-2 manifest directly
    mdir = Path(table) / txn.MANIFEST_DIR
    competitor = {
        "version": 2,
        "parent": 1,
        "run_id": "competitor",
        "mode": "append",
        "files": json.loads((mdir / f"{1:020d}.json").read_text())["files"],
    }
    (mdir / f"{2:020d}.json").write_text(json.dumps(competitor))
    v = txn.commit_write(
        spark, _df(spark, 3, 6), table, run_id="r3", mode="append"
    )
    assert v == 3
    m = json.loads((mdir / f"{3:020d}.json").read_text())
    assert m["parent"] == 2
    assert _ids(txn.read_committed(spark, table)) == list(range(6))


def test_vacuum_removes_only_unreferenced_runs(spark, table):
    txn.commit_write(spark, _df(spark, 0, 5), table, run_id="keep1")
    txn.commit_write(
        spark, _df(spark, 5, 8), table, run_id="keep2", mode="append"
    )
    _df(spark, 900, 910).write.mode("overwrite").parquet(
        f"{table}/{txn.STAGING_DIR}/dead"
    )
    assert txn.vacuum_uncommitted(spark, table) == ["dead"]
    assert _ids(txn.read_committed(spark, table)) == list(range(8))
    assert not (Path(table) / txn.STAGING_DIR / "dead").exists()


def test_vacuum_retain_versions_shrinks_history(spark, table):
    txn.commit_write(spark, _df(spark, 0, 3), table, run_id="r1")
    txn.commit_write(
        spark, _df(spark, 10, 13), table, run_id="r2", mode="overwrite"
    )
    deleted = txn.vacuum_uncommitted(spark, table, retain_versions=1)
    # r1's files were only referenced by the dropped version-1 manifest
    # (staging dirs carry an attempt-uuid suffix so concurrent restages
    # of one run_id never clobber committed files)
    assert len(deleted) == 1 and deleted[0].startswith("r1-")
    assert txn.latest_version(spark, table) == 2
    assert _ids(txn.read_committed(spark, table)) == [10, 11, 12]
    with pytest.raises(Exception):
        txn.read_committed(spark, table, version=1)


def test_read_empty_table_raises(spark, table):
    with pytest.raises(FileNotFoundError):
        txn.read_committed(spark, table)


def test_read_incremental_delta_only(spark, table):
    txn.commit_write(spark, _df(spark, 0, 5), table, run_id="r1")
    txn.commit_write(
        spark, _df(spark, 5, 9), table, run_id="r2", mode="append"
    )
    assert _ids(txn.read_incremental(spark, table, since_version=1)) == [
        5,
        6,
        7,
        8,
    ]
    # from zero = everything; at head = empty with the live schema
    assert _ids(txn.read_incremental(spark, table, since_version=0)) == list(
        range(9)
    )
    head = txn.read_incremental(spark, table, since_version=2)
    assert head.count() == 0
    assert head.columns == ["id", "v"]


def test_read_incremental_guards(spark, table):
    txn.commit_write(spark, _df(spark, 0, 3), table, run_id="r1")
    with pytest.raises(ValueError):
        txn.read_incremental(spark, table, since_version=9)
    txn.commit_write(
        spark, _df(spark, 100, 103), table, run_id="r2", mode="overwrite"
    )
    # overwrite dropped v1's files from the lineage -> full-reprocess error
    with pytest.raises(ValueError):
        txn.read_incremental(spark, table, since_version=1)


def test_consume_incremental_exactly_once_chain(spark, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    double = lambda d: d.selectExpr("id", "v * 10 AS v10")  # noqa: E731

    # tick with empty source: nothing to do
    assert txn.consume_incremental(spark, src, dest, double) is None

    txn.commit_write(spark, _df(spark, 0, 4), src, run_id="s1")
    v = txn.consume_incremental(spark, src, dest, double)
    assert v == 1
    assert _ids(txn.read_committed(spark, dest)) == [0, 1, 2, 3]

    # idle tick: no new source version -> no-op
    assert txn.consume_incremental(spark, src, dest, double) is None
    assert txn.latest_version(spark, dest) == 1

    # second source commit -> only the delta flows
    txn.commit_write(spark, _df(spark, 4, 6), src, run_id="s2", mode="append")
    txn.consume_incremental(spark, src, dest, double)
    out = {
        (r.id, r.v10)
        for r in txn.read_committed(spark, dest).collect()
    }
    assert out == {(i, i * 2 * 10) for i in range(6)}

    # crash-retry simulation: calling consume again for the same source
    # head must not duplicate (run_id dedup in commit_write)
    assert txn.consume_incremental(spark, src, dest, double) is None
    assert txn.read_committed(spark, dest).count() == 6


def test_consume_incremental_raises_on_broken_lineage(spark, tmp_path):
    src = str(tmp_path / "src")
    dest = str(tmp_path / "dest")
    ident = lambda d: d  # noqa: E731
    txn.commit_write(spark, _df(spark, 0, 3), src, run_id="s1")
    txn.consume_incremental(spark, src, dest, ident)
    txn.commit_write(
        spark, _df(spark, 50, 53), src, run_id="s2", mode="overwrite"
    )
    with pytest.raises(ValueError):
        txn.consume_incremental(spark, src, dest, ident)


def test_table_history(spark, table):
    txn.commit_write(spark, _df(spark, 0, 4), table, run_id="r1")
    txn.commit_write(
        spark, _df(spark, 4, 6), table, run_id="r2", mode="append"
    )
    txn.commit_write(
        spark, _df(spark, 9, 10), table, run_id="r3", mode="overwrite"
    )
    hist = txn.table_history(spark, table).collect()
    assert [r["version"] for r in hist] == [3, 2, 1]
    assert [r["run_id"] for r in hist] == ["r3", "r2", "r1"]
    assert hist[0]["mode"] == "overwrite"
    v1, v2, v3 = hist[2], hist[1], hist[0]
    assert v2["n_files"] == v1["n_files"] + v2["n_new_files"]
    assert v3["n_files"] == v3["n_new_files"]  # overwrite starts fresh
    assert v1["parent"] is None and v2["parent"] == 1 and v3["parent"] == 2


def test_compaction_transparent_to_incremental_consumer(spark, tmp_path):
    """Round-8 verdict #3: a table consumed via consume_incremental can
    be compacted mid-stream — the rewrite_of marker lets the consumer
    skip the pure rewrite, and its dest output is byte-identical to a
    twin run with no compaction."""
    def run(compact_between):
        src = str(tmp_path / f"src-{compact_between}")
        dest = str(tmp_path / f"dest-{compact_between}")
        txn.commit_write(spark, _df(spark, 0, 10), src, run_id="b1")
        txn.commit_write(spark, _df(spark, 10, 20), src, run_id="b2")
        txn.consume_incremental(
            spark, src, dest, lambda d: d.selectExpr("id", "v * 10 AS v")
        )
        if compact_between:
            rep = txn.maintain_table(
                spark, src, retain_versions=2, max_files=1
            )
            assert rep["compacted_to_version"] is not None
        txn.commit_write(spark, _df(spark, 20, 30), src, run_id="b3")
        txn.consume_incremental(
            spark, src, dest, lambda d: d.selectExpr("id", "v * 10 AS v")
        )
        return sorted(
            map(tuple, txn.read_committed(spark, dest).collect())
        )

    plain = run(False)
    compacted = run(True)
    assert compacted == plain
    assert [t[0] for t in plain] == list(range(30))


def test_rewrite_past_consumer_checkpoint_harvests_pre_rewrite(spark, table):
    """A compaction that rewrote versions the consumer has NOT yet
    consumed: the delta comes from the retained PRE-rewrite manifest's
    append files (never from the mixed rewritten files), at any lag
    within retention."""
    txn.commit_write(spark, _df(spark, 0, 10), table, run_id="b1")   # v1
    txn.commit_write(spark, _df(spark, 10, 20), table, run_id="b2")  # v2
    assert txn.compact_table(spark, table, target_file_bytes=1 << 30) == 3
    # consumer lagging at v1 still gets exactly v2's appends
    assert _ids(txn.read_incremental(spark, table, since_version=1)) == list(
        range(10, 20)
    )
    # a consumer already at v2: baseline swap, empty delta
    assert txn.read_incremental(spark, table, since_version=2).count() == 0
    # appends after the compaction flow through for both checkpoints
    txn.commit_write(spark, _df(spark, 20, 25), table, run_id="b3")
    assert _ids(txn.read_incremental(spark, table, since_version=2)) == list(
        range(20, 25)
    )
    assert _ids(txn.read_incremental(spark, table, since_version=1)) == list(
        range(10, 25)
    )
    # a consumer from the very beginning (0) reads everything exactly once
    assert _ids(txn.read_incremental(spark, table, since_version=0)) == list(
        range(25)
    )


def test_rewrite_with_vacuumed_pre_manifest_raises(spark, table):
    txn.commit_write(spark, _df(spark, 0, 10), table, run_id="b1")   # v1
    txn.commit_write(spark, _df(spark, 10, 20), table, run_id="b2")  # v2
    txn.compact_table(spark, table, target_file_bytes=1 << 30)       # v3
    txn.commit_write(spark, _df(spark, 20, 25), table, run_id="b3")  # v4
    txn.vacuum_uncommitted(spark, table, retain_versions=2)  # keeps v3, v4
    # v1 itself is vacuumed -> checkpoint error either way
    with pytest.raises(ValueError, match="vacuumed"):
        txn.read_incremental(spark, table, since_version=1)


def test_plain_overwrite_still_raises_for_consumers(spark, table):
    txn.commit_write(spark, _df(spark, 0, 5), table, run_id="b1")
    txn.commit_write(
        spark, _df(spark, 0, 5), table, run_id="ow", mode="overwrite"
    )
    with pytest.raises(ValueError, match="overwrite"):
        txn.read_incremental(spark, table, since_version=1)
