"""Bucketed range (interval) join: points matched to the intervals that
contain them, WITHOUT a cross product.

Spark has no native range-join optimization for ``p.ts BETWEEN i.start AND
i.end`` — a naive non-equi join plans as BroadcastNestedLoopJoin (every
point against every interval: O(P·I), a scale-killer). The standard fix is
time bucketing:

1. pick a bucket width; a point lands in exactly ONE bucket
   (``floor(ts / width)``),
2. an interval expands to the list of buckets it overlaps
   (``sequence(start_bucket, end_bucket)``, exploded),
3. equi-join on the bucket id (hash shuffle, AQE-skew-splittable),
4. re-check the exact containment predicate.

Each (point, interval) pair meets in at most one bucket — the point's — so
the output needs no dedup. Cost is O(P + I·avg_buckets_per_interval +
matches): linear, shuffle keyed on bucket id, no nested loop. Choose the
bucket width near the typical interval length: much smaller multiplies the
interval replication factor; much larger piles unrelated points into each
bucket (both only waste, never wrong).

The reference has no join at all (SURVEY.md §2.2 "Not implemented"); this
is a north-star extension alongside the as-of join (operators/asof.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucketed_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket_width: str = "15 minutes",
) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start <= point_ts < end`` (half-open, the window convention).

    Returns all columns of both inputs (they must not collide). Timestamps
    are compared at microsecond precision.
    """
    n, unit = bucket_width.split()
    width_us = int(n) * {
        "seconds": 1_000_000,
        "minutes": 60 * 1_000_000,
        "hours": 3600 * 1_000_000,
        "days": 86400 * 1_000_000,
    }[unit if unit.endswith("s") else unit + "s"]

    p = points.withColumn(
        "__bucket", (F.unix_micros(F.col(point_ts)) / width_us).cast("long")
    )
    start_b = (F.unix_micros(F.col(start_ts)) / width_us).cast("long")
    # half-open end: the last covered bucket holds end - 1 microsecond
    end_b = ((F.unix_micros(F.col(end_ts)) - 1) / width_us).cast("long")
    # Empty/inverted intervals (end <= start) would otherwise make sequence()
    # emit a DESCENDING bucket list — correct output (the exact predicate
    # filters every candidate) but wasted fan-out. Clamp them to no buckets.
    buckets = F.when(end_b >= start_b, F.sequence(start_b, end_b)).otherwise(
        F.array().cast("array<long>")
    )
    i = intervals.withColumn("__bucket", F.explode(buckets))
    return (
        p.join(i, "__bucket")
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) < F.col(end_ts))
        )
        .drop("__bucket")
    )
