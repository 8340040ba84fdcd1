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
    ascending: bool = True,
    tiebreak_cols: tuple[str, ...] = (),
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

    Requires ``order_col`` values unique per row, or ``tiebreak_cols``
    completing a total order, or rows within a tie interchangeable for
    the caller's downstream use. ``ascending=False`` runs the sum in
    descending ``order_col`` order (tiebreaks stay ascending).
    """
    bkt = F.floor(F.col(order_col) / F.lit(int(bucket_width)))
    with_b = df.withColumn("__bkt", bkt)
    o = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    w_local = (
        Window.partitionBy("__bkt")
        .orderBy(o, *[F.col(c).asc() for c in tiebreak_cols])
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = with_b.withColumn("__loc", F.sum(value_col).over(w_local))
    totals = with_b.groupBy("__bkt").agg(F.sum(value_col).alias("__tot"))
    w_off = Window.orderBy(
        F.col("__bkt").asc() if ascending else F.col("__bkt").desc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "__bkt",
        F.coalesce(F.sum("__tot").over(w_off), F.lit(0)).alias("__off"),
    )
    return (
        local.join(F.broadcast(offsets), "__bkt")
        .withColumn(out_col, F.col("__loc") + F.col("__off"))
        .drop("__bkt", "__loc", "__off")
    )


def bucketed_row_index(
    df: DataFrame,
    order_specs: list[tuple[str, bool]],
    bucket_exprs: list[tuple[Column, bool]],
    partition_cols: tuple[str, ...] = (),
    rn_col: str = "__rn",
    total_col: str = "__total",
    running_sum_of: str | None = None,
    cum_col: str = "__cum",
    sum_total_col: str = "__sum_total",
) -> DataFrame:
    """Global (per ``partition_cols`` group) 1-based ROW INDEX in
    ``order_specs`` order, plus the group row count — the two-phase
    replacement for ``row_number()/ntile()`` over an unpartitioned (or
    low-cardinality-partitioned) window, which serializes the frame onto
    #groups tasks.

    ``order_specs``: [(column_name, ascending), ...] — must be a TOTAL
    order (include a tiebreak) so the index is deterministic.
    ``bucket_exprs``: [(expression, ascending), ...] — a deterministic
    LEXICOGRAPHIC COARSENING of the row order: each expression must be a
    monotone pure function of the corresponding order column (e.g.
    ``floor(col / width)``, or the column itself for a low-cardinality
    leading key), so that rows in bucket A precede rows in bucket B
    whenever A < B in the given directions. The caller owns this
    invariant; widths should target hundreds-to-thousands of buckets.

    Phase 1: a per-(partition, bucket) window computes local row numbers
    (parallelism = #buckets, not #groups). Phase 2: per-bucket row counts
    (a map-side-combinable aggregate) cumulate into each bucket's
    preceding-row offset via a window over the TINY counts frame, then
    broadcast-join back; ``rn = offset + local``.

    ``running_sum_of``: optionally also compute the GLOBAL running sum of
    a numeric column in the same order (inclusive of the current row) as
    ``cum_col``, plus the per-group total as ``sum_total_col`` — same two
    phases, shared windows, no extra pass.

    Cost note: the input subtree is derived twice (the local-window
    branch and the counts branch — column pruning diverges the branches,
    so ReuseExchange cannot collapse them; see CLAUDE.md round-6
    gotchas). Two parallel derivations of a rollup beat one serialized
    global sort at any real scale.
    """
    g = list(partition_cols)
    bnames = [f"__bkt{i}" for i in range(len(bucket_exprs))]
    with_b = df
    for name, (expr, _) in zip(bnames, bucket_exprs):
        with_b = with_b.withColumn(name, expr)
    order = [
        F.col(c).asc() if asc else F.col(c).desc() for c, asc in order_specs
    ]
    w_rank = Window.partitionBy(*g, *bnames).orderBy(*order)
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    local = with_b.withColumn("__lrn", F.row_number().over(w_rank))
    aggs = [F.count(F.lit(1)).alias("__bc")]
    if running_sum_of is not None:
        local = local.withColumn(
            "__lcum", F.sum(running_sum_of).over(w_cum)
        )
        aggs.append(F.sum(running_sum_of).alias("__bs"))
    counts = with_b.groupBy(*g, *bnames).agg(*aggs)
    border = [
        F.col(n).asc() if asc else F.col(n).desc()
        for n, (_, asc) in zip(bnames, bucket_exprs)
    ]
    w_off = (
        Window.partitionBy(*g)
        .orderBy(*border)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_all = Window.partitionBy(*(g or [F.lit(1)]))
    off_cols = [
        F.coalesce(F.sum("__bc").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__bc").over(w_all).alias(total_col),
    ]
    if running_sum_of is not None:
        off_cols += [
            F.coalesce(F.sum("__bs").over(w_off), F.lit(0)).alias("__soff"),
            F.sum("__bs").over(w_all).alias(sum_total_col),
        ]
    offs = counts.select(*g, *bnames, *off_cols)
    out = (
        local.join(F.broadcast(offs), [*g, *bnames])
        .withColumn(rn_col, (F.col("__off") + F.col("__lrn")).cast("long"))
    )
    drop = [*bnames, "__lrn", "__off"]
    if running_sum_of is not None:
        out = out.withColumn(cum_col, F.col("__soff") + F.col("__lcum"))
        drop += ["__lcum", "__soff"]
    return out.drop(*drop)


def ntile_from_index(rn: Column, total: Column, n: int) -> Column:
    """SQL-standard ``NTILE(n)`` from a 1-based global row index and the
    row count: the first ``total % n`` tiles hold ``ceil(total/n)`` rows,
    the rest ``floor(total/n)`` — exactly Spark's and DuckDB's NTILE, so
    a kernel-computed index reproduces the window function bit-for-bit.
    Integer arithmetic via floors of exact-int doubles (< 2^53)."""
    nn = F.lit(int(n))
    size = F.floor(total / nn)  # floor(total/n), long
    rem = total - size * nn  # total % n
    thr = rem * (size + F.lit(1))  # rows covered by the big tiles
    return (
        F.when(rn <= thr, F.floor((rn - F.lit(1)) / (size + F.lit(1))))
        .otherwise(rem + F.floor((rn - thr - F.lit(1)) / size))
        + F.lit(1)
    ).cast("long")
