"""Time-grid resampling with forward fill (gap filling).

Turns an irregular event stream into a dense fixed-interval series per key:
one row per (key, bucket) from the key's first to last bucket, carrying the
event count in that bucket and the last observation carried forward (LOCF)
across empty buckets — the standard shape for feeding time-series models
and dashboards. No reference counterpart (the reference has no time types —
SURVEY.md §2.2); DuckDB/Timescale expose the same thing as
``generate_series`` + ``last_value IGNORE NULLS`` / ``locf()``.

Scale model (100 TB): the dense grid is generated per key from a per-key
(min, max) aggregate — ``F.sequence`` + ``explode`` fans out AFTER the
aggregation, so the expensive input never replicates; grid size is bounded
by the key's time span / step, independent of event volume. The bucket
aggregate, the grid join, and the LOCF window are all keyed on the same
key column -> AQE coalesces them onto one exchange chain; the LOCF window
is a single per-key ordered carry (no self-join, no range join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill(
    df: DataFrame,
    key: str,
    ts_col: str,
    value_col: str,
    step: str = "1 hour",
    trunc_unit: str = "hour",
    tie_col: str | None = None,
) -> DataFrame:
    """Dense per-``key`` series at ``step`` granularity with LOCF.

    Output: (key, bucket, n_events, filled_value). ``n_events`` is 0 on gap
    rows; ``filled_value`` is the value of the latest event at or before the
    bucket (deterministic within a bucket: the event with the greatest
    (ts, tie_col) wins — pass an id column when timestamps can tie).
    """
    order = [F.col(ts_col).desc()] + (
        [F.col(tie_col).desc()] if tie_col is not None else []
    )
    bucketed = df.withColumn("bucket", F.date_trunc(trunc_unit, F.col(ts_col)))
    w_pick = Window.partitionBy(key, "bucket").orderBy(*order)
    per_bucket = (
        bucketed.withColumn("__rn", F.row_number().over(w_pick))
        .groupBy(key, "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.when(F.col("__rn") == 1, F.col(value_col))).alias(
                "last_value"
            ),
        )
    )

    grid = (
        df.groupBy(key)
        .agg(
            F.date_trunc(trunc_unit, F.min(ts_col)).alias("__lo"),
            F.date_trunc(trunc_unit, F.max(ts_col)).alias("__hi"),
        )
        .select(
            key,
            F.explode(
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr(f"INTERVAL {step}")
                )
            ).alias("bucket"),
        )
    )

    joined = grid.join(per_bucket, on=[key, "bucket"], how="left")
    w_ffill = (
        Window.partitionBy(key)
        .orderBy(F.col("bucket").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        key,
        "bucket",
        F.coalesce(F.col("n_events"), F.lit(0)).cast("long").alias("n_events"),
        F.last("last_value", ignorenulls=True)
        .over(w_ffill)
        .alias("filled_value"),
    )
