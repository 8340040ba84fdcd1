"""Round-5 event-analytics wave: engagement/lifecycle reports over the
``events`` stream — activity streaks (gaps-and-islands), churn risk,
power-user ranking, inter-arrival stats, daily-active ratio, and
first-touch distribution. All-integer gated paths (epoch micros, counts,
micro-scaled shares with ONE rounding); every heavy aggregation is keyed
on user_id / event_type / day — no corpus-wide hot key.

The reference has no event surface at all (SURVEY.md §2.2); these extend
the e_* family the same way rounds 3-4 did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register


@register(
    "a_activity_streaks",
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
    ), seq AS (
      SELECT user_id, d,
             CAST(date_diff('day', DATE '2024-01-01', CAST(d AS DATE))
                  AS BIGINT)
             - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ), streaks AS (
      SELECT user_id, grp, COUNT(*) AS len FROM seq GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           COUNT(*) AS n_streaks,
           CAST(MAX(len) AS BIGINT) AS longest_streak
    FROM streaks GROUP BY user_id
    """,
)
def a_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consecutive-day activity streaks per user — the classic
    gaps-and-islands: distinct active days, then (epoch_day − row_number)
    buckets runs of consecutive days into one group. All-integer.
    Shape: day-distinct aggregate, ONE user-keyed window, two
    user-keyed aggregates — every exchange is on user_id, reused
    across stages (AQE coalesces); no global sort anywhere."""
    events = load_table(spark, sf_dir, "events")
    days = events.select(
        "user_id", F.date_trunc("day", "ts").alias("d")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    seq = days.select(
        "user_id",
        "d",
        (
            F.datediff(F.col("d").cast("date"), F.to_date(F.lit("2024-01-01")))
            .cast("long")
            - F.row_number().over(w)
        ).alias("grp"),
    )
    streaks = seq.groupBy("user_id", "grp").agg(F.count(F.lit(1)).alias("len"))
    return streaks.groupBy("user_id").agg(
        F.sum("len").cast("long").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.max("len").cast("long").alias("longest_streak"),
    )


@register(
    "e_churn_risk",
    oracle="""
    WITH mx AS (SELECT MAX(ts) AS maxts FROM events),
    u AS (
      SELECT user_id, MAX(ts) AS last_ts, COUNT(*) AS n_events
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(date_diff('day', CAST(last_ts AS DATE), CAST(maxts AS DATE))
                AS BIGINT) AS days_inactive,
           CAST(CASE WHEN date_diff('day', CAST(last_ts AS DATE),
                                    CAST(maxts AS DATE)) > 7
                     THEN 1 ELSE 0 END AS BIGINT) AS churn_risk
    FROM u CROSS JOIN mx
    """,
)
def e_churn_risk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user churn-risk report: days since last event (vs the corpus
    watermark) and a >7-day inactivity flag. One user-keyed aggregate +
    a broadcast 1-row watermark — the corpus-max never forces a second
    full pass; integer day arithmetic end to end."""
    events = load_table(spark, sf_dir, "events")
    mx = events.agg(F.max("ts").alias("maxts"))
    u = events.groupBy("user_id").agg(
        F.max("ts").alias("last_ts"), F.count(F.lit(1)).alias("n_events")
    )
    gap = F.datediff(
        F.col("maxts").cast("date"), F.col("last_ts").cast("date")
    ).cast("long")
    return u.crossJoin(F.broadcast(mx)).select(
        "user_id",
        "n_events",
        gap.alias("days_inactive"),
        F.when(gap > F.lit(7), F.lit(1))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("churn_risk"),
    )


@register(
    "e_power_users",
    oracle="""
    WITH c AS (
      SELECT user_id, COUNT(*) AS n_events FROM events GROUP BY user_id
    ), r AS (
      SELECT user_id, n_events,
             CAST(RANK() OVER (ORDER BY n_events DESC) AS BIGINT) AS rnk
      FROM c
    )
    SELECT user_id, n_events, rnk FROM r WHERE rnk <= 10
    """,
)
def e_power_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-rank power users by event volume, RANK semantics (ties share a
    rank and are ALL kept — deterministic without a tie-break column).
    The global window runs over the per-user AGGREGATE (cardinality =
    users, not events), and WindowGroupLimit prunes rows past rank 10
    before the single-partition sort — the only safe way to global-rank
    at 100 TB: rank the rollup, never the facts."""
    events = load_table(spark, sf_dir, "events")
    c = events.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.orderBy(F.desc("n_events"))
    return (
        c.withColumn("rnk", F.rank().over(w).cast("long"))
        .filter(F.col("rnk") <= 10)
    )


@register(
    "e_interarrival_stats",
    oracle="""
    WITH g AS (
      SELECT event_type,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT event_type,
           COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM g WHERE gap_us IS NOT NULL
    GROUP BY event_type
    """,
)
def e_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type inter-arrival gap profile (count/sum/min/max in
    exact epoch micros — feed rate estimation without a single float).
    ONE event_type-keyed window (tie-broken on event_id for a total
    order) then a same-keyed aggregate: the second exchange collapses
    under AQE since the partitioning is identical."""
    events = load_table(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts"))
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    g = events.select(
        "event_type", (us - F.lag(us).over(w)).alias("gap_us")
    ).filter(F.col("gap_us").isNotNull())
    return g.groupBy("event_type").agg(
        F.count("gap_us").alias("n_gaps"),
        F.sum("gap_us").cast("long").alias("sum_gap_us"),
        F.min("gap_us").cast("long").alias("min_gap_us"),
        F.max("gap_us").cast("long").alias("max_gap_us"),
    )


@register(
    "e_daily_active_ratio",
    oracle="""
    WITH tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM events),
    d AS (
      SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
             COUNT(DISTINCT user_id) AS dau
      FROM events GROUP BY 1
    )
    SELECT day, CAST(dau AS BIGINT) AS dau,
           CAST(n_users AS BIGINT) AS n_users,
           CAST(ROUND(dau * 1e6 / CAST(n_users AS DOUBLE)) AS BIGINT)
             AS dau_ratio_micro
    FROM d CROSS JOIN tot
    """,
)
def e_daily_active_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users and their share of the total user base
    (micro-scaled, ONE rounding). Two distinct-aggregates (day-keyed and
    global) + a broadcast 1-row total; the ratio's bigint*double
    promotion order is mirrored on both engines."""
    events = load_table(spark, sf_dir, "events")
    tot = events.agg(F.count_distinct("user_id").alias("n_users"))
    d = events.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day")
    ).agg(F.count_distinct("user_id").alias("dau"))
    return d.crossJoin(F.broadcast(tot)).select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col("n_users").cast("long").alias("n_users"),
        F.round(F.col("dau") * F.lit(1e6) / F.col("n_users").cast("double"))
        .cast("long")
        .alias("dau_ratio_micro"),
    )


@register(
    "e_first_touch_share",
    oracle="""
    WITH ft AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
      FROM events
    ), f AS (
      SELECT user_id, event_type FROM ft WHERE rn = 1
    ), tot AS (SELECT COUNT(*) AS n_users FROM f)
    SELECT event_type, COUNT(*) AS n_users_first,
           CAST(ROUND(COUNT(*) * 1e6 / CAST(n_users AS DOUBLE)) AS BIGINT)
             AS share_micro
    FROM f CROSS JOIN tot GROUP BY event_type, n_users
    """,
)
def e_first_touch_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Acquisition-channel distribution: each user's FIRST event type
    (total order on ts, event_id; WindowGroupLimit prunes to rank 1
    before the exchange completes) → share of the user base per type,
    micro-scaled with one rounding. One user-keyed window + a tiny
    type-keyed aggregate + broadcast total."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    f = (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type")
    )
    tot = f.agg(F.count(F.lit(1)).alias("n_users"))
    return (
        f.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_users_first"))
        .crossJoin(F.broadcast(tot))
        .select(
            "event_type",
            "n_users_first",
            F.round(
                F.col("n_users_first") * F.lit(1e6)
                / F.col("n_users").cast("double")
            )
            .cast("long")
            .alias("share_micro"),
        )
    )
