"""Durable job metadata store (verdict r9 #8).

The reference persists job rows in Postgres
(``/root/reference/src/services/database.rs:22-60`` — insert, status
update, fetch-by-id over a ``jobs`` table); this repo's job table was an
in-memory dict with the same state machine (``service.py``). This module
makes the store a SEAM with two implementations sharing one contract
suite (``tests/test_jobstore.py``):

- :class:`InMemoryJobStore` — the dict twin (reference ``memory``-fake
  role); exactly the previous ``service.jobs`` behavior.
- :class:`SqliteJobStore` — a durable file-backed store on stdlib
  ``sqlite3`` (public knowledge; same table shape as ``database.rs`` —
  id, file path, status, error, created/updated timestamps). Restart
  durability is the point: a new process opening the same path sees every
  job and status. WAL mode so the single-writer worker thread and HTTP
  readers do not block each other.

``Job``/``JobStatus`` live here (service.py re-exports them) so the store
does not import the service layer.

Scale note: job metadata is control-plane — a few rows per upload, never
per-record — so a single-file sqlite (or the reference's single Postgres)
is the right shape even when the data plane is 100 TB; nothing here ever
touches an executor.
"""

from __future__ import annotations

import sqlite3
import threading
import time
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from enum import Enum


class JobStatus(str, Enum):
    QUEUED = "queued"
    PROCESSING = "processing"
    COMPLETED = "completed"
    FAILED = "failed"


@dataclass
class Job:
    id: str
    file_path: str
    status: JobStatus = JobStatus.QUEUED
    error: str | None = None
    created_at: float = field(default_factory=time.time)
    updated_at: float = field(default_factory=time.time)

    def transition(self, status: JobStatus, error: str | None = None) -> None:
        self.status = status
        self.error = error
        self.updated_at = time.time()


class JobStore(ABC):
    """Contract: keyed job rows + the QUEUED->PROCESSING->COMPLETED/FAILED
    state machine. ``get`` returns None for unknown ids (the reference's
    fetch-by-id Option)."""

    @abstractmethod
    def put(self, job: Job) -> None:
        ...

    @abstractmethod
    def get(self, job_id: str) -> Job | None:
        ...

    @abstractmethod
    def transition(
        self, job_id: str, status: JobStatus, error: str | None = None
    ) -> Job:
        """Apply a state transition and persist it; returns the updated
        job. Raises ``KeyError`` for unknown ids."""

    @abstractmethod
    def list_ids(self) -> list[str]:
        ...

    def __contains__(self, job_id: str) -> bool:
        return self.get(job_id) is not None

    def __getitem__(self, job_id: str) -> Job:
        """Dict-style access (the pre-seam ``service.jobs`` surface).
        NOTE: for durable stores the returned Job is a detached row —
        mutate through :meth:`transition`, not attribute assignment."""
        job = self.get(job_id)
        if job is None:
            raise KeyError(job_id)
        return job


class InMemoryJobStore(JobStore):
    def __init__(self) -> None:
        self._jobs: dict[str, Job] = {}

    def put(self, job: Job) -> None:
        self._jobs[job.id] = job

    def get(self, job_id: str) -> Job | None:
        return self._jobs.get(job_id)

    def transition(
        self, job_id: str, status: JobStatus, error: str | None = None
    ) -> Job:
        job = self._jobs[job_id]
        job.transition(status, error)
        return job

    def list_ids(self) -> list[str]:
        return sorted(self._jobs)


class SqliteJobStore(JobStore):
    """File-backed store; one connection per instance, serialized by a
    lock (the worker is single-threaded; HTTP readers share safely)."""

    _SCHEMA = """
    CREATE TABLE IF NOT EXISTS jobs (
        id         TEXT PRIMARY KEY,
        file_path  TEXT NOT NULL,
        status     TEXT NOT NULL,
        error      TEXT,
        created_at REAL NOT NULL,
        updated_at REAL NOT NULL
    )
    """

    def __init__(self, path: str):
        self.path = path
        self._lock = threading.Lock()
        self._conn = sqlite3.connect(path, check_same_thread=False)
        with self._lock, self._conn:
            self._conn.execute("PRAGMA journal_mode=WAL")
            self._conn.execute(self._SCHEMA)

    def close(self) -> None:
        self._conn.close()

    def put(self, job: Job) -> None:
        with self._lock, self._conn:
            self._conn.execute(
                "INSERT OR REPLACE INTO jobs VALUES (?, ?, ?, ?, ?, ?)",
                (
                    job.id,
                    job.file_path,
                    job.status.value,
                    job.error,
                    job.created_at,
                    job.updated_at,
                ),
            )

    def _row_to_job(self, row) -> Job:
        return Job(
            id=row[0],
            file_path=row[1],
            status=JobStatus(row[2]),
            error=row[3],
            created_at=row[4],
            updated_at=row[5],
        )

    def get(self, job_id: str) -> Job | None:
        with self._lock:
            row = self._conn.execute(
                "SELECT id, file_path, status, error, created_at, updated_at"
                " FROM jobs WHERE id = ?",
                (job_id,),
            ).fetchone()
        return None if row is None else self._row_to_job(row)

    def transition(
        self, job_id: str, status: JobStatus, error: str | None = None
    ) -> Job:
        now = time.time()
        with self._lock, self._conn:
            cur = self._conn.execute(
                "UPDATE jobs SET status = ?, error = ?, updated_at = ?"
                " WHERE id = ?",
                (status.value, error, now, job_id),
            )
            if cur.rowcount == 0:
                raise KeyError(job_id)
        job = self.get(job_id)
        assert job is not None
        return job

    def list_ids(self) -> list[str]:
        with self._lock:
            rows = self._conn.execute("SELECT id FROM jobs ORDER BY id")
            return [r[0] for r in rows.fetchall()]
