"""Atomic-publish commit backends (sources/txn.py, round-8 verdict #4):
the rename default vs the conditional-put (If-None-Match) seam for
object stores where rename is not atomic. The race test injects a rival
committer INSIDE the loser's conditional put to pin that two concurrent
committers serialize onto consecutive versions with a correct append
lineage. Live object-store run is env-gated like
tests/test_storage_contract.py."""

from __future__ import annotations

import os
import uuid

import pytest

from g_data_pipeline_spark.sources import txn


@pytest.fixture()
def table(tmp_path):
    return str(tmp_path / "tbl")


def _df(spark, lo, hi):
    return spark.range(lo, hi).selectExpr("id", "id * 2 AS v")


def _ids(df):
    return sorted(r.id for r in df.select("id").collect())


def _posix_put_if_absent(path, data):
    """Genuinely atomic local put-if-absent (O_EXCL create)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    try:
        with open(path, "xb") as f:
            f.write(data)
        return True
    except FileExistsError:
        return False


def test_conditional_put_backend_round_trip(spark, table):
    """The bundled default (Hadoop create(overwrite=False)) commits and
    reads back like the rename backend; a duplicate run_id no-ops."""
    be = txn.ConditionalPutCommitBackend()
    v1 = txn.commit_write(spark, _df(spark, 0, 5), table, run_id="a", backend=be)
    v2 = txn.commit_write(spark, _df(spark, 5, 9), table, run_id="b", backend=be)
    assert (v1, v2) == (1, 2)
    assert txn.commit_write(
        spark, _df(spark, 0, 5), table, run_id="a", backend=be
    ) == 1
    assert _ids(txn.read_committed(spark, table)) == list(range(9))


def test_conditional_put_serializes_racing_committers(spark, table):
    """Two committers race for the same version under conditional put:
    the injected rival lands first, the loser's PUT returns False, and
    the retry commits at the next version ON TOP of the rival's files —
    no lost update, no duplicate version, correct parent chain."""
    armed = {"on": True}

    def put_with_race(path, data):
        if armed["on"]:
            armed["on"] = False
            txn.commit_write(
                spark,
                _df(spark, 100, 110),
                table,
                run_id="rival",
                backend=txn.ConditionalPutCommitBackend(_posix_put_if_absent),
            )
        return _posix_put_if_absent(path, data)

    v = txn.commit_write(
        spark,
        _df(spark, 0, 10),
        table,
        run_id="mine",
        backend=txn.ConditionalPutCommitBackend(put_with_race),
    )
    assert v == 2
    assert txn.find_run_version(spark, table, "rival") == 1
    m2 = txn._load_manifest(spark, table, 2)
    assert m2["parent"] == 1 and m2["run_id"] == "mine"
    assert _ids(txn.read_committed(spark, table)) == (
        list(range(10)) + list(range(100, 110))
    )
    # both committers idempotent on replay
    for rid, want in (("mine", 2), ("rival", 1)):
        assert txn.commit_write(
            spark, _df(spark, 0, 1), table, run_id=rid,
            backend=txn.ConditionalPutCommitBackend(_posix_put_if_absent),
        ) == want


def test_shared_run_id_both_paths_return_winner(spark, table):
    """A zombie driver + retry sharing ONE run_id under conditional put:
    the loser's in-loop marker recheck returns the winner's version."""
    def put_with_same_rid_race(path, data):
        if not txn.find_run_version(spark, table, "job-7"):
            txn.commit_write(
                spark,
                _df(spark, 0, 10),
                table,
                run_id="job-7",
                backend=txn.ConditionalPutCommitBackend(_posix_put_if_absent),
            )
        return _posix_put_if_absent(path, data)

    v = txn.commit_write(
        spark,
        _df(spark, 0, 10),
        table,
        run_id="job-7",
        backend=txn.ConditionalPutCommitBackend(put_with_same_rid_race),
    )
    assert v == 1
    assert txn._manifest_versions(spark, table) == [1]
    assert _ids(txn.read_committed(spark, table)) == list(range(10))


S3_TEST_URI = os.environ.get("GDP_S3_TEST_URI")


def test_conditional_put_against_live_object_store(spark):
    """Env-gated live contract: the same commit protocol through the
    conditional-put backend on a real object store (requires s3a with
    fs.s3a.create.conditional.enabled, Hadoop 3.4.1+)."""
    if S3_TEST_URI is None:
        pytest.skip("GDP_S3_TEST_URI not set (no live object store in env)")
    table = f"{S3_TEST_URI.rstrip('/')}/txn-cond-{uuid.uuid4().hex[:8]}"
    be = txn.ConditionalPutCommitBackend()
    assert txn.commit_write(spark, _df(spark, 0, 5), table, "r1", backend=be) == 1
    assert _ids(txn.read_committed(spark, table)) == list(range(5))
