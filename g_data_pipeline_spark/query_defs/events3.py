"""Round-5 third event wave (registered post-window; ROTATION.md queues
them for in-window r6 grading): peak session concurrency via the boundary
sweep, and per-day bounce rate over gap-based sessions.

Both build on the e_sessionize kernel (30-minute inactivity gap,
all-integer microsecond pipeline — query_defs/analytics8.py) so the session
semantics stay identical across the whole e_* family.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.windows import bucketed_running_sum
from g_data_pipeline_spark.queries import register

_GAP_US = 30 * 60 * 1_000_000  # 30 min, identical to e_sessionize

# Shared DuckDB session view (the e_sessionize oracle, reduced to one row
# per session with its start/end microseconds and event count).
_SQL_SESSIONS = f"""
    seq AS (
      SELECT user_id, event_id, epoch_us(ts) AS us,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER w AS gap_us
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), marked AS (
      SELECT user_id, us,
             CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > {_GAP_US}
                           THEN 1 ELSE 0 END)
                  OVER (PARTITION BY user_id ORDER BY us, event_id
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
      FROM seq
    ), sessions AS (
      SELECT user_id, session_idx,
             CAST(MIN(us) AS BIGINT) AS start_us,
             CAST(MAX(us) AS BIGINT) AS end_us,
             COUNT(*) AS n_events
      FROM marked GROUP BY user_id, session_idx
    )
"""


def _sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(user_id, session_idx, start_us, end_us, n_events) — the Spark twin
    of _SQL_SESSIONS. One user-keyed shuffle: both windows and the session
    aggregate share the user_id partitioning (the e_sessionize plan pin)."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    us = F.unix_micros(F.col("ts"))
    seq = events.select(
        "user_id",
        "event_id",
        us.alias("us"),
        (us - F.lag(us).over(w)).alias("gap_us"),
    )
    wrun = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = seq.select(
        "user_id",
        "us",
        F.sum(
            F.when(
                F.col("gap_us").isNull() | (F.col("gap_us") > F.lit(_GAP_US)),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .over(wrun)
        .alias("session_idx"),
    )
    return marked.groupBy("user_id", "session_idx").agg(
        F.min("us").cast("long").alias("start_us"),
        F.max("us").cast("long").alias("end_us"),
        F.count(F.lit(1)).alias("n_events"),
    )


@register(
    "e_concurrent_peak",
    oracle=f"""
    WITH {_SQL_SESSIONS}, bounds AS (
      SELECT start_us AS us, 1 AS delta FROM sessions
      UNION ALL
      SELECT end_us AS us, -1 AS delta FROM sessions
    ), run AS (
      SELECT us,
             SUM(delta) OVER (ORDER BY us, delta DESC
                              ROWS UNBOUNDED PRECEDING)
               + CASE WHEN delta = -1 THEN 1 ELSE 0 END AS c
      FROM bounds
    )
    SELECT CAST(us AS BIGINT) AS us,
           CAST(MAX(c) AS BIGINT) AS concurrency
    FROM run GROUP BY us
    ORDER BY concurrency DESC, us LIMIT 10
    """,
)
def e_concurrent_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 peak-concurrency instants across all user sessions — the
    classic interval-overlap BOUNDARY SWEEP (+1 at session start, -1 at
    session end, running sum), which counts overlaps in O(n log n) with no
    pairwise interval join anywhere. Overlap is inclusive: at a shared
    instant, starts order before ends (delta DESC), so touching sessions
    count as concurrent. The boundary rows EXPLODE from one array of
    structs per session — never a union of two selects over the session
    aggregate, which would run the sessionization twice (the CLAUDE.md
    explode rule).

    Scale shape (round-6; no single-partition window over the boundary
    set anywhere — plan-pinned in tests/test_plans6.py): the sweep first
    REDUCES per instant — grouping boundaries by ``us`` into
    ``net = sum(delta)`` and ``starts = count(delta=1)``. Within an
    instant, the running sum peaks right after its last START row, and an
    ends-only instant reports its pre-decrement value — both equal
    ``prefix_net(< us) + starts(us)``, so the per-instant max the oracle
    computes row-by-row collapses to one closed form. The global prefix
    of ``net`` then runs through the two-phase prefix sum
    (operators/windows.bucketed_running_sum): hour-bucketed local
    windows + a cumulative offset over #buckets rows (bounded by the time
    SPAN, not the data volume) broadcast back. Every stage shuffles on
    content keys (us, hour bucket); nothing serializes onto one task."""
    sessions = _sessions(spark, sf_dir)
    bounds = sessions.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_us").alias("us"), F.lit(1).alias("delta")
                ),
                F.struct(F.col("end_us").alias("us"), F.lit(-1).alias("delta")),
            )
        ).alias("b")
    ).select("b.us", "b.delta")
    instants = bounds.groupBy("us").agg(
        F.sum("delta").alias("net"),
        F.sum(F.when(F.col("delta") == 1, F.lit(1)).otherwise(F.lit(0))).alias(
            "starts"
        ),
    )
    run = bucketed_running_sum(
        instants, "us", "net", "cum_net", bucket_width=3_600_000_000
    )
    return (
        run.select(
            F.col("us").cast("long").alias("us"),
            (F.col("cum_net") - F.col("net") + F.col("starts"))
            .cast("long")
            .alias("concurrency"),
        )
        .orderBy(F.desc("concurrency"), "us")
        .limit(10)
    )


@register(
    "e_bounce_rate",
    oracle=f"""
    WITH {_SQL_SESSIONS}
    SELECT CAST(make_timestamp(start_us) AS DATE) AS day,
           COUNT(*) AS n_sessions,
           CAST(COUNT(*) FILTER (WHERE n_events = 1) AS BIGINT) AS n_bounce,
           CAST(ROUND(1e6 *
             CAST(COUNT(*) FILTER (WHERE n_events = 1) AS DOUBLE)
             / COUNT(*)) AS BIGINT) AS bounce_micro
    FROM sessions GROUP BY 1
    """,
)
def e_bounce_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day bounce rate: the share of sessions (30-min-gap sessions,
    bucketed by their START day) containing exactly one event — the
    engagement-quality headline next to e_daily_active_ratio. Day is CAST
    to DATE on both engines (the CLAUDE.md date_trunc gate rule); the rate
    is one double division micro-rounded once. Shape: the session rollup
    (already one user-keyed shuffle) re-aggregates by day — tiny."""
    sessions = _sessions(spark, sf_dir)
    bounce = F.sum(F.when(F.col("n_events") == 1, F.lit(1)).otherwise(F.lit(0)))
    return sessions.groupBy(
        F.to_date(F.timestamp_micros(F.col("start_us"))).alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        bounce.cast("long").alias("n_bounce"),
        F.round(F.lit(1e6) * bounce.cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("bounce_micro"),
    )
