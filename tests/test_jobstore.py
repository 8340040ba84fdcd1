"""Job-store contract (verdict r9 #8; reference database.rs twin): the
same state-machine assertions over the in-memory fake and the durable
sqlite backend, plus the restart-durability test that is the whole point
of the durable one."""

from __future__ import annotations

import threading

import pytest

from g_data_pipeline_spark.jobstore import (
    InMemoryJobStore,
    Job,
    JobStatus,
    SqliteJobStore,
)


@pytest.fixture(params=["memory", "sqlite"])
def store(request, tmp_path):
    if request.param == "memory":
        yield InMemoryJobStore()
        return
    s = SqliteJobStore(str(tmp_path / "jobs.db"))
    yield s
    s.close()


def test_put_get_roundtrip(store):
    job = Job(id="j1", file_path="s3a://g-data/uploads/j1.csv")
    store.put(job)
    got = store.get("j1")
    assert got is not None
    assert (got.id, got.file_path, got.status) == (
        "j1",
        "s3a://g-data/uploads/j1.csv",
        JobStatus.QUEUED,
    )
    assert got.error is None
    assert store.get("nope") is None
    assert "j1" in store and "nope" not in store


def test_state_machine_transitions(store):
    store.put(Job(id="j1", file_path="u"))
    j = store.transition("j1", JobStatus.PROCESSING)
    assert j.status == JobStatus.PROCESSING
    before = j.updated_at
    j = store.transition("j1", JobStatus.FAILED, error="boom")
    assert j.status == JobStatus.FAILED and j.error == "boom"
    assert j.updated_at >= before
    # a retry clears the error
    j = store.transition("j1", JobStatus.COMPLETED)
    assert j.status == JobStatus.COMPLETED and j.error is None
    with pytest.raises(KeyError):
        store.transition("ghost", JobStatus.PROCESSING)


def test_list_ids_sorted(store):
    for jid in ("b", "a", "c"):
        store.put(Job(id=jid, file_path="u"))
    assert store.list_ids() == ["a", "b", "c"]


def test_sqlite_survives_restart(tmp_path):
    """The durability gap the verdict named: a new process (new store
    instance on the same file) sees every job and status."""
    path = str(tmp_path / "jobs.db")
    s1 = SqliteJobStore(path)
    s1.put(Job(id="j1", file_path="u1"))
    s1.put(Job(id="j2", file_path="u2"))
    s1.transition("j1", JobStatus.COMPLETED)
    s1.transition("j2", JobStatus.FAILED, error="parse error")
    s1.close()

    s2 = SqliteJobStore(path)
    try:
        assert s2.list_ids() == ["j1", "j2"]
        assert s2.get("j1").status == JobStatus.COMPLETED
        j2 = s2.get("j2")
        assert j2.status == JobStatus.FAILED and j2.error == "parse error"
    finally:
        s2.close()


def test_sqlite_concurrent_readers_and_writer(tmp_path):
    """WAL mode: HTTP-reader threads poll while the worker transitions."""
    s = SqliteJobStore(str(tmp_path / "jobs.db"))
    s.put(Job(id="j1", file_path="u"))
    errors: list[Exception] = []

    def reader():
        try:
            for _ in range(200):
                j = s.get("j1")
                assert j is not None
        except Exception as exc:  # noqa: BLE001
            errors.append(exc)

    threads = [threading.Thread(target=reader) for _ in range(4)]
    for t in threads:
        t.start()
    for _ in range(100):
        s.transition("j1", JobStatus.PROCESSING)
        s.transition("j1", JobStatus.QUEUED)
    for t in threads:
        t.join()
    assert errors == []
    s.close()


def test_service_lifecycle_on_durable_store(spark, tmp_path):
    """The whole upload -> process lifecycle through SqliteJobStore, and a
    'restarted' service (new store instance, same file) still sees the
    COMPLETED job — the reference's Postgres-backed behavior."""
    from pathlib import Path

    from g_data_pipeline_spark.service import DataPipelineService

    csv = (Path(__file__).parent / "fixtures" / "people.csv").read_bytes()
    db = str(tmp_path / "jobs.db")
    svc = DataPipelineService(
        spark, str(tmp_path / "wd"), job_store=SqliteJobStore(db)
    )
    jid = svc.upload_csv(csv, "people.csv")
    svc.process_job(jid)
    assert svc.jobs[jid].status == JobStatus.COMPLETED

    restarted = SqliteJobStore(db)
    try:
        j = restarted.get(jid)
        assert j is not None and j.status == JobStatus.COMPLETED
        assert j.file_path.startswith("s3a://")
    finally:
        restarted.close()
