"""As-of join — for each left row, the most recent right row with
``right.ts <= left.ts`` per key (point-in-time / last-known-value join).

Spark has no native ASOF JOIN (DuckDB/Pandas do; kdb's aj is the classic).
A naive range join explodes to |L|x|R| per key before picking the max; the
scalable form used here is the UNION + ORDERED-WINDOW construction:

    tag left rows src=1, right rows src=0 on a shared (key, ts) spine;
    union them; one window per key ordered by (ts, src) carries the LAST
    non-null right payload forward (``F.last(ignorenulls=True)`` over an
    unbounded-preceding frame); keep only left rows.

Cost: ONE shuffle (the window partition by key) over |L|+|R| rows, no
intermediate blowup — survives any key skew AQE can handle, and at 100 TB
both inputs stream through a single sort per partition. Ordering (ts, src)
puts a right row at ts == left.ts BEFORE the left row, so equal timestamps
match (the `>=` convention, same as DuckDB ASOF).

Ties: several right rows on one (key, ts) make "the" as-of row ambiguous;
callers should pre-aggregate the right side to one row per (key, ts) —
the registered query does (MAX event_id), keeping results deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    keys: list[str],
    left_ts: str,
    right_ts: str | None = None,
    right_values: list[str] | None = None,
    suffix: str = "",
) -> DataFrame:
    """Left rows + latest right ``right_values`` with right ts <= left ts.

    Returns all of ``left``'s columns plus one ``<value><suffix>`` column
    per right value column (null when no right row precedes the left row).
    """
    right_ts = right_ts or left_ts
    rv = right_values or [
        c for c in right.columns if c not in keys and c != right_ts
    ]
    l_payload = [c for c in left.columns if c not in keys]

    l_sel = (
        [F.col(k) for k in keys]
        + [F.col(left_ts).alias("__ts"), F.lit(1).alias("__src")]
        + [F.col(c) for c in l_payload]
        + [
            F.lit(None).cast(right.schema[c].dataType).alias(f"__rv_{c}")
            for c in rv
        ]
    )
    r_sel = (
        [F.col(k) for k in keys]
        + [F.col(right_ts).alias("__ts"), F.lit(0).alias("__src")]
        + [
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in l_payload
        ]
        + [F.col(c).alias(f"__rv_{c}") for c in rv]
    )
    spine = left.select(*l_sel).unionByName(right.select(*r_sel))

    w = (
        Window.partitionBy(*keys)
        .orderBy("__ts", "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = spine.select(
        "*",
        *[
            F.last(f"__rv_{c}", ignorenulls=True).over(w).alias(f"{c}{suffix}")
            for c in rv
        ],
    )
    return carried.filter(F.col("__src") == 1).select(
        *keys, *l_payload, *[f"{c}{suffix}" for c in rv]
    )
