"""Queue-mode upload lifecycle: the JobWorker twin of the reference's
32-deep mpsc + single worker task (main.rs:72-107), driven end-to-end
through the WSGI app — upload returns while the job is QUEUED, /insights
answers 202 until the worker completes it, a full queue answers 503."""

from __future__ import annotations

import time

from g_data_pipeline_spark.http_api import PipelineApp
from g_data_pipeline_spark.service import DataPipelineService, JobStatus
from g_data_pipeline_spark.worker import JobWorker
from tests.test_http_api import FIXTURE, call


def _upload(app, body=None, name="people.csv"):
    return call(
        app,
        "POST",
        "/upload",
        body=body if body is not None else FIXTURE.read_bytes(),
        headers={"X-Filename": name},
    )


def test_upload_queues_then_worker_completes(spark, tmp_path):
    svc = DataPipelineService(spark, str(tmp_path / "w"))
    worker = JobWorker(svc)  # NOT started yet: the queued state is observable
    app = PipelineApp(svc, process_inline=False, worker=worker)

    status, out = _upload(app)
    assert status == 200
    job_id = out["job_id"]
    # upload returned while the job is still queued
    status, out = call(app, "GET", f"/insights/{job_id}")
    assert status == 202 and out == {"status": "queued"}

    worker.start()
    worker.drain()
    status, out = call(app, "GET", f"/insights/{job_id}")
    assert status == 200
    assert out["data_summary"]["row_count"] == 200
    worker.stop()


def test_worker_processes_in_submission_order(spark, tmp_path):
    svc = DataPipelineService(spark, str(tmp_path / "w"))
    worker = JobWorker(svc)
    app = PipelineApp(svc, process_inline=False, worker=worker)
    ids = [_upload(app)[1]["job_id"] for _ in range(3)]
    worker.start()
    worker.drain()
    jobs = [svc.jobs[i] for i in ids]
    assert all(j.status == JobStatus.COMPLETED for j in jobs)
    # FIFO: completion timestamps respect submission order
    assert jobs[0].updated_at <= jobs[1].updated_at <= jobs[2].updated_at
    worker.stop()


def test_full_queue_answers_503(spark, tmp_path):
    svc = DataPipelineService(spark, str(tmp_path / "w"))
    worker = JobWorker(svc, maxsize=1)  # not started: first upload fills it
    app = PipelineApp(svc, process_inline=False, worker=worker)
    status, _ = _upload(app)
    assert status == 200
    status, out = _upload(app)
    assert status == 503
    assert "queue full" in out["error"]
    # the shed job exists but stays QUEUED (client may retry by re-upload)
    assert svc.jobs[out["job_id"]].status == JobStatus.QUEUED


def test_worker_survives_failing_job(spark, tmp_path, monkeypatch):
    svc = DataPipelineService(spark, str(tmp_path / "w"))
    worker = JobWorker(svc)
    app = PipelineApp(svc, process_inline=False, worker=worker)
    bad = _upload(app)[1]["job_id"]
    good = _upload(app)[1]["job_id"]

    real = svc.process_job

    def process(job_id):
        if job_id == bad:
            svc.jobs[job_id].transition(JobStatus.FAILED, error="boom")
            raise RuntimeError("boom")
        return real(job_id)

    monkeypatch.setattr(svc, "process_job", process)
    worker.start()
    worker.drain()
    assert svc.jobs[bad].status == JobStatus.FAILED
    assert svc.jobs[good].status == JobStatus.COMPLETED  # loop moved on
    worker.stop()


def test_stop_leaves_unstarted_jobs_queued(spark, tmp_path):
    svc = DataPipelineService(spark, str(tmp_path / "w"))
    worker = JobWorker(svc)
    worker.start()
    worker.stop()  # stopped before any submission
    worker.jobs.put_nowait("never-processed")
    time.sleep(0.2)
    assert worker.jobs.qsize() == 1  # nothing drains a stopped worker
