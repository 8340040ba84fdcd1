"""Time-window aggregation over event streams (batch form).

The reference has no time-series operators at all (SURVEY.md §1.1); these are
the north-star extensions over the ``events`` table. Each helper is a plain
DataFrame transformation usable identically in batch and Structured Streaming
(``F.window`` / ``F.session_window`` are streaming-safe — the streaming
module reuses these builders verbatim).

Scale notes: tumbling/sliding windows are ordinary groupBy shuffles on
(window, keys); a sliding window with overlap factor f replicates each row f
times pre-shuffle (that's inherent to the semantics — keep slide ≥
duration/4 at 100 TB). Session windows in batch use Spark's native
``session_window`` aggregation; the merge happens inside the aggregation
operator, one shuffle on the keys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Fixed, non-overlapping windows: one shuffle on (window, keys)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    group = [F.window(ts_col, duration)] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*group).agg(*aggs)
    return out.select(
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        *[c for c in out.columns if c != "window"],
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Overlapping windows; each row lands in duration/slide windows."""
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    group = [F.window(ts_col, duration, slide)] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*group).agg(*aggs)
    return out.select(
        F.col("window.start").alias("w_start"),
        F.col("window.end").alias("w_end"),
        *[c for c in out.columns if c != "window"],
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sessions: windows that extend while events arrive within ``gap`` of
    the previous event, per key. Native ``session_window`` — the window's
    end is last_event + gap (Spark semantics)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n_events")]
    out = df.groupBy(F.session_window(ts_col, gap), *keys).agg(*aggs)
    return out.select(
        F.col("session_window.start").alias("s_start"),
        F.col("session_window.end").alias("s_end"),
        *[c for c in out.columns if c != "session_window"],
    )
