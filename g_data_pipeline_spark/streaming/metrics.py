"""Streaming observability: per-micro-batch progress capture.

Every long-running ingest stream needs its vitals — rows per batch,
processing rate, batch duration, watermark lag — without instrumenting
the pipeline itself. Structured Streaming already emits all of it as
``StreamingQueryProgress`` events; this module is the thin, testable
capture: a ``StreamingQueryListener`` that records each progress event
as a plain dict, and a converter to a DataFrame so the metrics can be
landed/aggregated with the same engine (e.g. appended to a metrics table
next to the stats dataset).

Listener callbacks run on the driver off the main thread and must never
throw or block — capture is append-to-list only; derivation happens in
:func:`progress_frame` afterwards.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

PROGRESS_SCHEMA = (
    "query_id string, run_id string, batch_id long, timestamp string, "
    "num_input_rows long, input_rows_per_second double, "
    "processed_rows_per_second double, batch_duration_ms long"
)


class ProgressCapture(StreamingQueryListener):
    """Append-only capture of per-batch progress across all queries the
    session runs while the listener is attached."""

    def __init__(self) -> None:
        self.events: list[dict] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self.events.append(
            {
                "query_id": str(p.id),
                "run_id": str(p.runId),
                "batch_id": int(p.batchId),
                "timestamp": p.timestamp,
                "num_input_rows": int(p.numInputRows),
                "input_rows_per_second": float(p.inputRowsPerSecond or 0.0),
                "processed_rows_per_second": float(
                    p.processedRowsPerSecond or 0.0
                ),
                "batch_duration_ms": int(p.batchDuration),
            }
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def attach(spark: SparkSession) -> ProgressCapture:
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    return cap


def detach(spark: SparkSession, cap: ProgressCapture) -> None:
    spark.streams.removeListener(cap)


def progress_frame(spark: SparkSession, cap: ProgressCapture) -> DataFrame:
    """The captured events as a DataFrame (empty-safe), ready to land in
    a metrics table."""
    return spark.createDataFrame(cap.events or [], PROGRESS_SCHEMA)
