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

from pyspark.sql import Column, DataFrame, Window
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


def bucketed_running_sum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    bucket_width: int,
) -> DataFrame:
    """Scale-safe GLOBAL running sum of ``value_col`` in ``order_col``
    order — the two-phase prefix sum that replaces a single-partition
    ``Window.orderBy(order_col)`` (which serializes the whole frame onto
    one task, the classic 100 TB scale-killer).

    Phase 1: rows bucket by ``floor(order_col / bucket_width)`` — a pure
    function of the VALUE, so the decomposition is deterministic and does
    not depend on physical partitioning or exchange reuse — and a
    per-bucket window computes the local prefix.
    Phase 2: per-bucket totals (a map-side-combinable aggregate, one tiny
    row per bucket) get a cumulative offset via a window over #buckets
    rows (bounded by the ORDER-KEY SPAN / bucket_width — e.g. hours in the
    dataset — not by the data volume), then broadcast-join back.

    Requires ``order_col`` values unique per row (or rows within a tie
    interchangeable for the caller's downstream use): within a bucket the
    local window orders by ``order_col`` alone.
    """
    bkt = F.floor(F.col(order_col) / F.lit(int(bucket_width)))
    with_b = df.withColumn("__bkt", bkt)
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_b.withColumn("__loc", F.sum(value_col).over(w_local))
    totals = with_b.groupBy("__bkt").agg(F.sum(value_col).alias("__tot"))
    w_off = Window.orderBy("__bkt").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = totals.select(
        "__bkt",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.col("__loc") + F.col("__off"))
        .drop("__bkt", "__loc", "__off")
    )
