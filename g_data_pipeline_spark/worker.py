"""Background job worker: the queue-mode twin of the reference's upload
pipeline (``/root/reference/src/main.rs:72-107`` — a 32-deep mpsc channel
drained by one spawned worker task).

``PipelineApp(process_inline=False, worker=...)`` routes uploads here: the
HTTP handler returns as soon as the job id is enqueued (the job stays
QUEUED), and the single daemon thread drains the queue calling
``service.process_job`` — so ``/insights/{id}`` answers 202 until the
worker gets there, exactly the reference's observable lifecycle.

Backpressure matches the bounded channel: when 32 jobs are already
pending, ``submit`` raises ``queue.Full`` and the HTTP layer answers
503 — the reference's ``send`` would await/fail the same way rather than
buffer unboundedly.

One worker thread is deliberate (reference parity AND Spark sanity: jobs
are whole Spark actions; a single local session gains nothing from
concurrent profile jobs fighting for the same executor threads). The
worker never dies to a job failure — ``process_job`` records FAILED on
the job itself and the loop moves on.
"""

from __future__ import annotations

import queue
import threading

from g_data_pipeline_spark.service import DataPipelineService

QUEUE_DEPTH = 32  # main.rs:74 — mpsc::channel(32)


class JobWorker:
    """Single-threaded bounded job queue; see module docstring."""

    def __init__(self, service: DataPipelineService, maxsize: int = QUEUE_DEPTH):
        self.service = service
        self.jobs: queue.Queue[str] = queue.Queue(maxsize=maxsize)
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, name="gdp-job-worker", daemon=True
        )

    # -- producer side -----------------------------------------------------

    def submit(self, job_id: str) -> None:
        """Enqueue a job id; raises ``queue.Full`` when the channel is at
        capacity (callers translate to backpressure, e.g. HTTP 503)."""
        self.jobs.put_nowait(job_id)

    # -- lifecycle ---------------------------------------------------------

    def start(self) -> "JobWorker":
        self._thread.start()
        return self

    def stop(self, timeout_s: float = 10.0) -> None:
        """Stop after the in-flight job (queued-but-unstarted jobs stay
        QUEUED — same as the reference dropping its receiver)."""
        self._stop.set()
        if self._thread.is_alive():
            self._thread.join(timeout=timeout_s)

    def drain(self) -> None:
        """Block until every job enqueued so far has been processed
        (test/shutdown helper)."""
        self.jobs.join()

    # -- consumer loop -----------------------------------------------------

    def _run(self) -> None:
        while not self._stop.is_set():
            try:
                job_id = self.jobs.get(timeout=0.05)
            except queue.Empty:
                continue
            try:
                self.service.process_job(job_id)
            except Exception:  # noqa: BLE001
                # process_job already transitioned the job to FAILED with
                # the error message; the worker must outlive bad uploads.
                pass
            finally:
                self.jobs.task_done()
