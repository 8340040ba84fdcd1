"""Time-series / event-stream queries over the ``events`` table: tumbling,
sliding, and session windows (batch form of the streaming operators —
operators.windows builders are shared verbatim with the Structured Streaming
module), plus JSON-ish property extraction.

The reference has no time/stream constructs at all (SURVEY.md §2.2 "Not
implemented"). Oracles express the same semantics in ANSI SQL: epoch-aligned
windows via date_trunc, sliding replication via a small UNNEST cross join,
sessions via gaps-and-islands (LAG + running SUM of breaks).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.operators.windows import (
    session_window_agg,
    sliding_window_agg,
    tumbling_window_agg,
)
from g_data_pipeline_spark.queries import register


@register(
    "e_tumbling_hourly",
    oracle=f"""
    SELECT date_trunc('hour', ts) AS w_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS w_end,
           event_type,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)
def e_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows per event type (F.window is epoch-aligned,
    so starts coincide with date_trunc('hour'))."""
    events = load_table(spark, sf_dir, "events")
    return tumbling_window_agg(
        events,
        "ts",
        "1 hour",
        keys=["event_type"],
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        ],
    )


@register(
    "e_sliding_2h_every_1h",
    oracle=f"""
    SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS w_start,
           date_trunc('hour', ts) + (2 - k) * INTERVAL 1 HOUR AS w_end,
           COUNT(*) AS n_events,
           {sql_dsum('value')} AS sum_value
    FROM events CROSS JOIN (SELECT UNNEST([0, 1]) AS k) offsets
    GROUP BY 1, 2
    """,
)
def e_sliding_2h_every_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding 2h windows every 1h: each event belongs to 2 windows (the
    duration/slide replication factor — inherent to overlap semantics)."""
    events = load_table(spark, sf_dir, "events")
    return sliding_window_agg(
        events,
        "ts",
        "2 hours",
        "1 hour",
        aggs=[
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        ],
    )


@register(
    "e_session_windows",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       > INTERVAL 5 MINUTE
                  THEN 1 ELSE 0 END AS brk
      FROM events
    ), sessions AS (
      SELECT user_id, ts,
             SUM(brk) OVER (PARTITION BY user_id ORDER BY ts
                            ROWS UNBOUNDED PRECEDING) AS sid
      FROM ordered
    )
    SELECT user_id,
           MIN(ts) AS s_start,
           MAX(ts) + INTERVAL 5 MINUTE AS s_end,
           COUNT(*) AS n_events
    FROM sessions GROUP BY user_id, sid
    """,
)
def e_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 5-minute inactivity gap. Spark's native
    session_window end = last event + gap; the oracle reproduces exactly
    that via gaps-and-islands."""
    events = load_table(spark, sf_dir, "events")
    return session_window_agg(
        events,
        "ts",
        "5 minutes",
        keys=["user_id"],
        aggs=[F.count(F.lit(1)).alias("n_events")],
    )


@register(
    "e_props_extract",
    oracle="""
    SELECT event_type,
           CAST(SUM(CAST(regexp_extract(props, '"k": (-?\\d+)', 1) AS BIGINT)) AS BIGINT) AS sum_k
    FROM events
    GROUP BY event_type
    """,
)
def e_props_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from the JSON-ish props column (from_json -> struct;
    the oracle uses a regexp so it needs no DuckDB JSON extension)."""
    events = load_table(spark, sf_dir, "events")
    return (
        events.withColumn("k", F.from_json("props", "k BIGINT").getField("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"))
    )


# --------------------------------------------------------------------------
# As-of join + deterministic sampling (operators/asof.py, sampling.py)
# --------------------------------------------------------------------------

from g_data_pipeline_spark.operators.asof import asof_join  # noqa: E402
from g_data_pipeline_spark.operators.sampling import (  # noqa: E402
    sql_hash_bucket,
    stratified_hash_sample,
)


@register(
    "a_asof_join",
    oracle="""
    WITH p AS (
      SELECT event_id, user_id, ts, value FROM events
      WHERE event_type = 'purchase'
    ), c AS (
      SELECT user_id, ts, MAX(event_id) AS click_id FROM events
      WHERE event_type = 'click' GROUP BY user_id, ts
    )
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.click_id AS last_click_id, c.ts AS last_click_ts
    FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
    """,
)
def a_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase annotated with the user's most recent
    prior-or-simultaneous click (union + ordered-window construction —
    ONE shuffle, no range-join blowup; operators/asof.py). Oracle is
    DuckDB's native ASOF LEFT JOIN. Right side pre-aggregated to one row
    per (user, ts) so the as-of row is well-defined."""
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", "value"
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
        .select("user_id", "ts", "click_id", F.col("ts").alias("click_ts"))
    )
    out = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_values=["click_id", "click_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        "ts",
        "value",
        F.col("click_id").alias("last_click_id"),
        F.col("click_ts").alias("last_click_ts"),
    )


_SAMPLE_BUCKET = sql_hash_bucket(["event_id"], seed="split1")


@register(
    "a_stratified_sample",
    oracle=f"""
    SELECT event_id, event_type, user_id, value FROM events
    WHERE {_SAMPLE_BUCKET} <
      CASE event_type WHEN 'click' THEN 100000 WHEN 'purchase' THEN 500000
      ELSE 0 END
    """,
)
def a_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sampling: 10% of clicks, 50% of purchases,
    keyed on md5(event_id) — identical row set on any cluster layout, any
    engine (the DuckDB oracle reproduces it exactly), no RNG state. The
    reproducible-training-split primitive (operators/sampling.py)."""
    events = load_table(spark, sf_dir, "events")
    return stratified_hash_sample(
        events.select("event_id", "event_type", "user_id", "value"),
        strata_col="event_type",
        fractions={"click": 0.1, "purchase": 0.5},
        key_cols=["event_id"],
        seed="split1",
    )


@register(
    "a_range_join",
    oracle="""
    WITH w AS (
      SELECT event_id AS window_id, ts AS w_start,
             ts + INTERVAL 15 MINUTE AS w_end
      FROM events WHERE event_type = 'error' AND value >= 200.0
    ), p AS (
      SELECT event_id AS purchase_id, ts AS p_ts, value FROM events
      WHERE event_type = 'purchase'
    )
    SELECT w.window_id, p.purchase_id, p.p_ts, p.value
    FROM w JOIN p ON p.p_ts >= w.w_start AND p.p_ts < w.w_end
    """,
)
def a_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval containment) join: every purchase falling inside a
    15-minute incident window opened by a high-value error event. Executed
    as a BUCKETED equi-join (operators/rangejoin.py) — point joins interval
    through a shared time-bucket key, then the exact containment predicate
    re-checks — no nested-loop cross product (plan-asserted in
    tests/test_plans.py). Oracle is the plain inequality join, which DuckDB
    runs via its native IEJoin."""
    from g_data_pipeline_spark.operators.rangejoin import bucketed_range_join

    events = load_table(spark, sf_dir, "events")
    intervals = events.filter(
        (F.col("event_type") == "error") & (F.col("value") >= 200.0)
    ).select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 15 MINUTES")).alias("w_end"),
    )
    points = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("p_ts"),
        "value",
    )
    out = bucketed_range_join(
        points, intervals, "p_ts", "w_start", "w_end", bucket_width="15 minutes"
    )
    return out.select("window_id", "purchase_id", "p_ts", "value")


@register(
    "e_funnel_conversion",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS v_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, MIN(e.ts) AS c_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.v_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, MIN(e.ts) AS p_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
      GROUP BY e.user_id
    )
    SELECT (SELECT COUNT(*) FROM v) AS n_view_users,
           (SELECT COUNT(*) FROM c) AS n_click_after_view,
           (SELECT COUNT(*) FROM p) AS n_purchase_after_click
    """,
)
def e_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel (view -> click -> purchase): users whose first click
    follows their first view, and whose first purchase follows THAT click.
    The product-analytics sequence primitive. Implemented with three
    stacked window expressions over the SAME user partition — Catalyst
    plans them into one shuffle + three Window nodes (no joins, no
    re-partitioning); the oracle expresses the identical semantics as
    chained grouped CTEs."""
    from pyspark.sql import Window

    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    staged = (
        events.select("user_id", "event_type", "ts")
        .withColumn(
            "v_ts",
            F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w),
        )
        .withColumn(
            "c_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "click") & (F.col("ts") > F.col("v_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
        .withColumn(
            "p_ts",
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") > F.col("c_ts")),
                    F.col("ts"),
                )
            ).over(w),
        )
    )
    per_user = staged.groupBy("user_id").agg(
        F.max("v_ts").alias("v_ts"),
        F.max("c_ts").alias("c_ts"),
        F.max("p_ts").alias("p_ts"),
    )
    return per_user.agg(
        F.count("v_ts").alias("n_view_users"),
        F.count("c_ts").alias("n_click_after_view"),
        F.count("p_ts").alias("n_purchase_after_click"),
    )


@register(
    "e_retention_cohorts",
    oracle="""
    WITH firsts AS (
      SELECT user_id, MIN(date_trunc('week', ts)) AS cohort_week
      FROM events GROUP BY user_id
    ), activity AS (
      SELECT DISTINCT e.user_id, f.cohort_week,
             CAST(datediff('week', f.cohort_week,
                           date_trunc('week', e.ts)) AS BIGINT) AS week_offset
      FROM events e JOIN firsts f ON e.user_id = f.user_id
    )
    SELECT cohort_week, week_offset,
           COUNT(*) AS n_active_users
    FROM activity
    GROUP BY cohort_week, week_offset
    """,
)
def e_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users grouped by first-seen week,
    counted per subsequent active week offset — THE product-analytics
    retention query. Two keyed shuffles (per-user first week, then the
    distinct (user, offset) reduction + cohort aggregation); exact integer
    outputs. Week buckets via date_trunc on both engines (Monday-start ISO
    weeks in Spark and DuckDB alike)."""
    events = load_table(spark, sf_dir, "events")
    # .cast("date"): Spark date_trunc returns TIMESTAMP where DuckDB's
    # returns DATE — align the output type with the oracle
    week = F.date_trunc("week", F.col("ts")).cast("date")
    firsts = (
        events.groupBy("user_id").agg(F.min(week).alias("cohort_week"))
    )
    activity = (
        events.join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (F.datediff(week, F.col("cohort_week")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .distinct()
    )
    return activity.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("n_active_users")
    )
