"""The service layer: the reference's end-to-end lifecycles re-hosted on the
Spark engine (SURVEY.md §3).

- upload -> background profiling job (§3.1): ``upload_csv`` +
  ``process_job``. A job lands the CSV as typed Parquet ONCE (vs the
  reference re-parsing the CSV on every touch), profiles it, caches insights.
- insights with recompute-on-miss (§3.2): ``get_insights``.
- conversation query (§3.3): NL/IR -> compile -> ONE lazy plan -> JSON rows
  + Chart.js-style visualization spec (V1-V3) + templated prose.

Storage/queue/cache are in-process fakes mirroring the reference's default
memory-services mode (memory_s3.rs / memory_db.rs / memory_redis.rs) — on a
real deployment these become object storage + a DB + a cache, none of which
is a Spark concern. One uuid identifies upload, job, and dataset (fixing the
reference's dual-uuid quirk, SURVEY.md §3.1).
"""

from __future__ import annotations

import json
import time
import uuid
from dataclasses import dataclass, field
from enum import Enum
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from g_data_pipeline_spark.ir import QueryIntent, StructuredQuery
from g_data_pipeline_spark.nl import parse_llm_response, rule_based_translate
from g_data_pipeline_spark.plans import compile_query
from g_data_pipeline_spark.profiler import classify_columns, format_insights, profile
from g_data_pipeline_spark.sources import dataset_metadata, land_csv


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


@dataclass
class ConversationTurn:
    query: str
    response: str
    timestamp: float = field(default_factory=time.time)


@dataclass
class ConversationContext:
    id: str
    job_id: str
    history: list[ConversationTurn] = field(default_factory=list)


class DataPipelineService:
    """In-process equivalent of the reference's Actix service wired to Spark."""

    def __init__(self, spark: SparkSession, workdir: str):
        self.spark = spark
        self.workdir = Path(workdir)
        self.workdir.mkdir(parents=True, exist_ok=True)
        self.jobs: dict[str, Job] = {}
        self.insights_cache: dict[str, str] = {}  # job_id -> insights JSON
        self.conversations: dict[str, ConversationContext] = {}
        self._datasets: dict[str, DataFrame] = {}

    # ---- §3.1 upload -> profile job -------------------------------------

    def upload_csv(self, data: bytes, filename: str = "upload.csv") -> str:
        if not data:
            raise ValueError("empty file")
        if not filename.lower().endswith(".csv"):
            raise ValueError("only .csv files are accepted")
        job_id = str(uuid.uuid4())
        dest = self.workdir / "uploads" / f"{job_id}.csv"
        dest.parent.mkdir(parents=True, exist_ok=True)
        dest.write_bytes(data)
        self.jobs[job_id] = Job(id=job_id, file_path=str(dest))
        return job_id

    def process_job(self, job_id: str) -> dict[str, Any]:
        job = self.jobs[job_id]
        job.transition(JobStatus.PROCESSING)
        try:
            parquet_dir = self.workdir / "datasets" / job_id
            df, _ = land_csv(self.spark, job.file_path, str(parquet_dir))
            self._datasets[job_id] = df
            insights = profile(df)
            self.insights_cache[job_id] = json.dumps(format_insights(insights))
            job.transition(JobStatus.COMPLETED)
            return insights
        except Exception as exc:  # noqa: BLE001 — job must record failure
            job.transition(JobStatus.FAILED, error=str(exc))
            raise

    # ---- §3.2 insights with recompute-on-miss ----------------------------

    def get_insights(self, job_id: str) -> dict[str, Any] | None:
        job = self.jobs.get(job_id)
        if job is None:
            return None
        if job.status != JobStatus.COMPLETED:
            # reference answers 202 Accepted; callers poll
            return {"status": job.status.value}
        cached = self.insights_cache.get(job_id)
        if cached is None:
            self.process_job(job_id)  # materialized-view recompute-on-miss
            cached = self.insights_cache[job_id]
        return json.loads(cached)

    # ---- §3.3 conversation query -----------------------------------------

    def dataset(self, job_id: str) -> DataFrame:
        df = self._datasets.get(job_id)
        if df is None:
            parquet_dir = self.workdir / "datasets" / job_id
            df = self.spark.read.parquet(str(parquet_dir))
            self._datasets[job_id] = df
        return df

    def query(
        self,
        job_id: str,
        query_text: str | None = None,
        ir: dict[str, Any] | str | None = None,
        conversation_id: str | None = None,
    ) -> dict[str, Any]:
        df = self.dataset(job_id)
        if conversation_id is None or conversation_id not in self.conversations:
            conversation_id = conversation_id or str(uuid.uuid4())
            self.conversations[conversation_id] = ConversationContext(
                id=conversation_id, job_id=job_id
            )
        ctx = self.conversations[conversation_id]

        if ir is not None:
            sq = (
                StructuredQuery.from_json(ir)
                if isinstance(ir, (str, dict))
                else ir
            )
            sq.validate(available_columns=df.columns)
        elif query_text is not None:
            classes = classify_columns(df)
            try:
                sq = parse_llm_response(query_text, df.columns)
            except ValueError:
                sq = rule_based_translate(query_text, df.columns, classes.numeric)
        else:
            raise ValueError("need query_text or ir")

        result = compile_query(df, sq)
        rows = [r.asDict(recursive=True) for r in result.collect()]
        response: dict[str, Any] = {
            "conversation_id": conversation_id,
            "data": rows,
            "response": _prose_summary(sq, rows),
        }
        if sq.intent == QueryIntent.VISUALIZE:
            response["visualization_data"] = visualization_spec(result, rows)
        ctx.history.append(
            ConversationTurn(query=query_text or str(ir), response=response["response"])
        )
        return response


def _prose_summary(sq: StructuredQuery, rows: list[dict[str, Any]]) -> str:
    """N5 template fallback (the reference's LLM prose is out of correctness
    scope — SURVEY.md §2.5 N4/N5)."""
    if not rows:
        return "No data found for your query."
    if sq.intent == QueryIntent.AGGREGATE and len(rows) == 1:
        parts = ", ".join(f"{k} = {v}" for k, v in rows[0].items())
        return f"Computed {parts}."
    return f"Query returned {len(rows)} rows."


def visualization_spec(result: DataFrame, rows: list[dict[str, Any]]) -> dict[str, Any]:
    """V1-V3 (SURVEY.md §2.4) computed from the result's SCHEMA, not by
    sniffing the first JSON row like the reference (conversation.rs:188-287).

    V1: numeric columns -> bar chart of column averages.
    V2: else first string column -> bar chart of value counts.
    V3: else -> table spec.
    """
    numeric_cols = [
        f.name for f in result.schema.fields if isinstance(f.dataType, T.NumericType)
    ]
    if numeric_cols and rows:
        avgs = {
            c: (sum(r[c] for r in rows if r[c] is not None) / n)
            for c in numeric_cols
            if (n := sum(1 for r in rows if r[c] is not None)) > 0
        }
        return {
            "type": "bar",
            "data": {
                "labels": list(avgs.keys()),
                "datasets": [
                    {"label": "Average", "data": [avgs[c] for c in avgs]}
                ],
            },
        }
    string_cols = [
        f.name for f in result.schema.fields if isinstance(f.dataType, T.StringType)
    ]
    if string_cols and rows:
        col = string_cols[0]
        counts: dict[str, int] = {}
        for r in rows:
            v = r.get(col)
            if v is not None:
                counts[str(v)] = counts.get(str(v), 0) + 1
        return {
            "type": "bar",
            "data": {
                "labels": list(counts.keys()),
                "datasets": [{"label": f"Count of {col}", "data": list(counts.values())}],
            },
        }
    return {
        "type": "table",
        "columns": result.columns,
        "rows": [[None if r[c] is None else str(r[c]) for c in result.columns] for r in rows],
    }
