"""Lakehouse / pipeline-lifecycle queries (round 4, wave 2): CDC MERGE
(latest-wins upsert/delete apply), SCD type-2 history, marketing
attribution, time-grid gap filling, fixed-centroid k-means assignment,
full-frame window-function coverage, and curriculum binning.

None of these exist in the reference (immutable CSV uploads, no time or
array types — SURVEY.md §1.2/§2.2); they are the standard operations a
re-landing data pipeline needs on top of the reference's query surface.

Determinism policy: same as queries.py module docstring — doubles either
pass through untouched (single parquet-read value, or one arithmetic op),
or go through scaled-long sums (functions/deterministic.py); every window
ordering carries an id tie-break so both engines sort identically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.functions.text import token_count
from g_data_pipeline_spark.functions.vectors import cosine_sim, sql_cosine_sim
from g_data_pipeline_spark.operators.cdc import merge_latest, scd2_history
from g_data_pipeline_spark.operators.resample import gap_fill
from g_data_pipeline_spark.operators.sampling import (
    hash_bucket_expr,
    sql_hash_bucket,
)
from g_data_pipeline_spark.operators.similarity import assign_to_centroids
from g_data_pipeline_spark.queries import register

_SQL_NTOK = r"len(string_split_regex(trim(lower(text)), '\s+'))"


def _cdc_changes(base: DataFrame) -> DataFrame:
    """Deterministic synthetic CDC feed over the orders snapshot: a +100
    repricing for every key ending in 0, a LATER +200 repricing for keys
    ending in 00/20/.. (latest must win), a delete for keys ending in 5,
    and a brand-new negative-key insert cloned from keys ending in 7
    (collision-free: base orderkeys are positive)."""
    upd1 = base.filter(F.col("o_orderkey") % 10 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(100.0)).alias("o_totalprice"),
        F.lit(1).cast("long").alias("change_seq"),
        F.lit("U").alias("op"),
    )
    upd2 = base.filter(F.col("o_orderkey") % 20 == 0).select(
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + F.lit(200.0)).alias("o_totalprice"),
        F.lit(2).cast("long").alias("change_seq"),
        F.lit("U").alias("op"),
    )
    dels = base.filter(F.col("o_orderkey") % 10 == 5).select(
        "o_orderkey",
        F.lit(None).cast("long").alias("o_custkey"),
        F.lit(None).cast("string").alias("o_orderstatus"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(1).cast("long").alias("change_seq"),
        F.lit("D").alias("op"),
    )
    ins = base.filter(F.col("o_orderkey") % 10 == 7).select(
        (-F.col("o_orderkey")).alias("o_orderkey"),
        "o_custkey",
        F.lit("N").alias("o_orderstatus"),
        "o_totalprice",
        F.lit(1).cast("long").alias("change_seq"),
        F.lit("I").alias("op"),
    )
    return upd1.unionByName(upd2).unionByName(dels).unionByName(ins)


_CDC_ORACLE = """
    WITH base AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
    ), changes AS (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             o_totalprice + 100.0 AS o_totalprice,
             CAST(1 AS BIGINT) AS change_seq, 'U' AS op
      FROM base WHERE o_orderkey % 10 = 0
      UNION ALL
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice + 200.0,
             CAST(2 AS BIGINT), 'U'
      FROM base WHERE o_orderkey % 20 = 0
      UNION ALL
      SELECT o_orderkey, NULL, NULL, NULL, CAST(1 AS BIGINT), 'D'
      FROM base WHERE o_orderkey % 10 = 5
      UNION ALL
      SELECT -o_orderkey, o_custkey, 'N', o_totalprice, CAST(1 AS BIGINT), 'I'
      FROM base WHERE o_orderkey % 10 = 7
    ), unioned AS (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             CAST(0 AS BIGINT) AS change_seq, 'U' AS op
      FROM base
      UNION ALL SELECT * FROM changes
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY o_orderkey
               ORDER BY change_seq DESC, op DESC) AS rn
      FROM unioned
    )
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """


@register("a_cdc_merge", oracle=_CDC_ORACLE)
def a_cdc_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC MERGE apply (Delta ``MERGE INTO`` / Iceberg-upsert semantics as
    a pure DataFrame op): base snapshot + change feed (U/I/D with sequence
    numbers) -> post-merge snapshot, latest sequence wins per key, winning
    deletes drop the key. One shuffle on the merge key; the latest-wins
    rank is WindowGroupLimit-pruned (top-1 per key computed map-side), so
    the shuffle never carries a key's full change history — the shape that
    survives a 100 TB re-land. operators/cdc.py:merge_latest."""
    base = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    return merge_latest(base, _cdc_changes(base), key="o_orderkey")


@register(
    "a_scd2_history",
    oracle="""
    WITH flagged AS (
      SELECT user_id, event_type, ts, event_id,
             COALESCE(event_type <> LAG(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id), TRUE) AS chg
      FROM events
    ), starts AS (
      SELECT user_id, event_type, ts, event_id FROM flagged WHERE chg
    )
    SELECT user_id, event_type,
           ts AS valid_from,
           LEAD(ts) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version_no,
           CAST(CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END
                AS BIGINT) AS is_current
    FROM starts
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def a_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 dimension build from the event log: consecutive events
    with the same event_type per user collapse into one version row with
    [valid_from, valid_to) validity, version numbers, and a current flag.
    Change-capture lag, interval lead, and numbering share one (user_id)
    partitioning -> a single shuffle however long the history.
    operators/cdc.py:scd2_history."""
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return scd2_history(
        events, key="user_id", ts_col="ts", attr_col="event_type",
        tie_col="event_id",
    )


@register(
    "e_attribution",
    oracle=f"""
    WITH ev AS (
      SELECT user_id, ts, event_id, event_type, value,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_conv
      FROM events
      WHERE event_type IN ('click', 'view', 'signup', 'purchase')
    ), tagged AS (
      SELECT *,
             last_value(CASE WHEN is_conv = 0 THEN event_type END
                        IGNORE NULLS) OVER w AS lt_type,
             last_value(CASE WHEN is_conv = 0 THEN ts END
                        IGNORE NULLS) OVER w AS lt_ts
      FROM ev
      WINDOW w AS (PARTITION BY user_id
                   ORDER BY ts, is_conv, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT CASE WHEN lt_ts >= ts - INTERVAL 7 DAY THEN lt_type
                ELSE 'direct' END AS channel,
           COUNT(*) AS n_conversions,
           {sql_dsum("value")} AS attributed_value
    FROM tagged WHERE is_conv = 1
    GROUP BY 1
    """,
)
def e_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent touch event (click/view/signup) at-or-before the
    purchase and within a 7-day lookback, else to the 'direct' channel;
    output is per-channel conversion count and deterministic revenue sum.
    The as-of lookup is the asof.py UNION + ordered-window construction
    (one shuffle on user_id, no range-join blowup); at equal timestamps
    the touch sorts before the conversion (the >= convention)."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("click", "view", "signup", "purchase")
    )
    tagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        (F.col("event_type") == "purchase").cast("int").alias("is_conv"),
        F.when(
            F.col("event_type") != "purchase", F.col("event_type")
        ).alias("touch_type"),
        F.when(F.col("event_type") != "purchase", F.col("ts")).alias(
            "touch_ts"
        ),
        "value",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(
            F.col("ts").asc(), F.col("is_conv").asc(), F.col("event_id").asc()
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    attributed = tagged.withColumns(
        {
            "lt_type": F.last("touch_type", ignorenulls=True).over(w),
            "lt_ts": F.last("touch_ts", ignorenulls=True).over(w),
        }
    )
    conv = attributed.filter(F.col("is_conv") == 1).select(
        F.when(
            F.col("lt_ts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS"),
            F.col("lt_type"),
        )
        .otherwise(F.lit("direct"))
        .alias("channel"),
        "value",
    )
    return conv.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_conversions"),
        dsum("value").alias("attributed_value"),
    )


@register(
    "a_gap_fill",
    oracle="""
    WITH ev AS (
      SELECT user_id, ts, event_id, value, date_trunc('hour', ts) AS bucket
      FROM events WHERE user_id < 30
    ), ranked AS (
      SELECT user_id, bucket, value,
             ROW_NUMBER() OVER (PARTITION BY user_id, bucket
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM ev
    ), pb AS (
      SELECT user_id, bucket, COUNT(*) AS n_events,
             MAX(CASE WHEN rn = 1 THEN value END) AS lv
      FROM ranked GROUP BY 1, 2
    ), span AS (
      SELECT user_id, date_trunc('hour', MIN(ts)) AS lo,
             date_trunc('hour', MAX(ts)) AS hi
      FROM ev GROUP BY 1
    ), grid AS (
      SELECT user_id,
             UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM span
    ), joined AS (
      SELECT g.user_id, g.bucket,
             COALESCE(pb.n_events, 0) AS n_events, pb.lv
      FROM grid g LEFT JOIN pb USING (user_id, bucket)
    )
    SELECT user_id, bucket, CAST(n_events AS BIGINT) AS n_events,
           last_value(lv IGNORE NULLS) OVER (
             PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM joined
    """,
)
def a_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly gap-filled series per user (users < 30 bound the output):
    dense min->max hour grid with per-bucket event counts (0 on gaps) and
    last-observation-carried-forward values. The grid fans out from a
    per-key 2-timestamp aggregate — never from raw events — so grid cost
    is span/step per key, independent of event volume.
    operators/resample.py:gap_fill."""
    events = load_table(spark, sf_dir, "events").filter(F.col("user_id") < 30)
    return gap_fill(
        events, key="user_id", ts_col="ts", value_col="value",
        step="1 hour", trunc_unit="hour", tie_col="event_id",
    )


@register(
    "v_kmeans_assign",
    oracle=f"""
    WITH c AS (
      SELECT vec_id AS cell, embedding AS c_vec
      FROM embeddings WHERE vec_id < 8
    ), scored AS (
      SELECT a.vec_id, c.cell,
             {sql_cosine_sim("a.embedding", "c.c_vec")} AS cos
      FROM embeddings a CROSS JOIN c
    ), best AS (
      SELECT vec_id, cell, cos,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cell ASC) AS rn
      FROM scored
    )
    SELECT cell, COUNT(*) AS n_vecs,
           CAST(SUM(CAST(ROUND(cos * 1e6) AS BIGINT)) AS BIGINT)
             AS sum_cos_micro,
           CAST(SUM(CAST(ROUND(cos * 1e6) AS BIGINT)) AS DOUBLE) / 1e6
             / COUNT(*) AS avg_cos
    FROM best WHERE rn = 1
    GROUP BY cell
    """,
)
def v_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-means assignment step with a fixed deterministic codebook (the
    first 8 embeddings): every corpus vector goes to its max-cosine cell
    (ties to the lowest cell id), output is per-cell population and mean
    similarity via exact integer micro-cosines. The codebook side is
    broadcast (plan-pinned) — the corpus never shuffles for scoring, which
    is the IVF-training inner loop shape at any corpus size.
    operators/similarity.py:assign_to_centroids."""
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cell"), F.col("embedding").alias("c_vec")
    )
    best = assign_to_centroids(emb, cents)
    return best.groupBy("cell").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum(F.round(F.col("cos") * F.lit(1e6)).cast("long"))
        .cast("long")
        .alias("sum_cos_micro"),
    ).select(
        "cell",
        "n_vecs",
        "sum_cos_micro",
        (
            F.col("sum_cos_micro").cast("double") / F.lit(1e6)
            / F.col("n_vecs")
        ).alias("avg_cos"),
    )


@register(
    "w_first_last_nth",
    oracle="""
    SELECT o_orderkey, o_custkey,
           first_value(o_orderkey) OVER w AS first_key,
           nth_value(o_orderkey, 2) OVER w AS second_key,
           last_value(o_orderkey) OVER w AS last_key,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_orders
    FROM orders WHERE o_custkey < 200
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
)
def w_first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-frame window navigation coverage: first_value / nth_value(2) /
    last_value / count over an UNBOUNDED PRECEDING..UNBOUNDED FOLLOWING
    frame per customer (SURVEY.md §2 window-function surface; the frame
    shape the running-total/moving-avg queries don't exercise). Ordering
    carries the orderkey tie-break so both engines agree on date ties."""
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey") < 200)
        .select(
            "o_orderkey",
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_key"),
            F.nth_value("o_orderkey", 2).over(w).alias("second_key"),
            F.last("o_orderkey").over(w).alias("last_key"),
            F.count(F.lit(1)).over(w).cast("long").alias("n_orders"),
        )
    )


@register(
    "t_curriculum_bins",
    oracle=f"""
    WITH sized AS (
      SELECT doc_id, CAST({_SQL_NTOK} AS BIGINT) AS n_tokens
      FROM documents WHERE trim(text) <> ''
    ), binned AS (
      SELECT doc_id, n_tokens,
             CAST(NTILE(8) OVER (ORDER BY n_tokens, doc_id) AS BIGINT)
               AS bin
      FROM sized
    )
    SELECT bin, COUNT(*) AS n_docs,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens
    FROM binned GROUP BY bin
    """,
)
def t_curriculum_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning length bins: split the corpus into 8 equal-count
    tiers by token count (NTILE with doc_id tie-break) and report each
    tier's document count and token budget — the schedule table a
    length-curriculum trainer consumes. Scale shape (round-6): exact
    global NTILE via the two-phase row-index kernel
    (operators/windows.bucketed_row_index + ntile_from_index) — token
    counts are low-cardinality, so the length itself is the leading
    bucket and doc_id ranges the second level; no single-partition sort
    of the corpus anywhere (plan-pinned in tests/test_plans6.py)."""
    from g_data_pipeline_spark.operators.windows import (
        bucketed_row_index,
        ntile_from_index,
    )

    docs = load_table(spark, sf_dir, "documents")
    sized = docs.filter(F.trim(F.col("text")) != "").select(
        "doc_id", token_count("text").cast("long").alias("n_tokens")
    )
    idx = bucketed_row_index(
        sized,
        [("n_tokens", True), ("doc_id", True)],
        [
            (F.col("n_tokens"), True),
            (F.floor(F.col("doc_id") / F.lit(1 << 16)), True),
        ],
    )
    binned = idx.withColumn(
        "bin", ntile_from_index(F.col("__rn"), F.col("__total"), 8)
    )
    return binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        F.sum("n_tokens").cast("long").alias("sum_tokens"),
    )


@register(
    "a_iqr_outliers",
    oracle="""
    WITH b AS (
      SELECT l_returnflag,
             QUANTILE_CONT(l_extendedprice, 0.25) AS q1,
             QUANTILE_CONT(l_extendedprice, 0.75) AS q3
      FROM lineitem GROUP BY 1
    ), bb AS (
      SELECT l_returnflag, q1, q3,
             q1 - 1.5 * (q3 - q1) AS lo,
             q3 + 1.5 * (q3 - q1) AS hi
      FROM b
    )
    SELECT l.l_returnflag,
           MIN(q1) AS q1, MIN(q3) AS q3,
           COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN l.l_extendedprice < lo
                           OR l.l_extendedprice > hi
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CAST(SUM(CASE WHEN l.l_extendedprice < lo
                           OR l.l_extendedprice > hi
                         THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
             AS outlier_frac
    FROM lineitem l JOIN bb USING (l_returnflag)
    GROUP BY 1
    """,
)
def a_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey IQR outlier report per segment: exact q1/q3 per returnflag,
    1.5-IQR fences, and the count/fraction of rows outside them — the
    standard numeric-cleaning gate before training-set export. Two scans:
    a per-group exact-percentile aggregate (3 rows) broadcast back onto
    the fact scan — the fences never shuffle the fact table, which is the
    right shape at any scale (swap the percentile kernel for the GK sketch
    in operators/percentiles.py when exactness isn't required)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", F.col("l_extendedprice").cast("double").alias("x")
    )
    # one array-percentile buffer per group (two scalar F.percentile exprs
    # would hold the group's values twice — see a_equidepth_histogram)
    b = li.groupBy("l_returnflag").agg(
        F.percentile(F.col("x"), F.array(F.lit(0.25), F.lit(0.75))).alias("qs")
    ).select(
        "l_returnflag",
        F.col("qs")[0].alias("q1"),
        F.col("qs")[1].alias("q3"),
    )
    bounds = b.select(
        "l_returnflag",
        "q1",
        "q3",
        (F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    is_out = (F.col("x") < F.col("lo")) | (F.col("x") > F.col("hi"))
    return (
        li.join(F.broadcast(bounds), "l_returnflag")
        .groupBy("l_returnflag")
        .agg(
            F.min("q1").alias("q1"),
            F.min("q3").alias("q3"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.when(is_out, 1).otherwise(0))
            .cast("long")
            .alias("n_outliers"),
        )
        .select(
            "l_returnflag",
            "q1",
            "q3",
            "n_rows",
            "n_outliers",
            (
                F.col("n_outliers").cast("double") / F.col("n_rows")
            ).alias("outlier_frac"),
        )
    )


@register(
    "a_skew_report",
    oracle="""
    WITH per_key AS (
      SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id
    )
    SELECT COUNT(*) AS n_keys,
           CAST(SUM(n) AS BIGINT) AS total_rows,
           MAX(n) AS max_key_rows,
           QUANTILE_CONT(n, 0.5) AS p50_key_rows,
           QUANTILE_CONT(n, 0.99) AS p99_key_rows,
           CAST(MAX(n) AS DOUBLE) / SUM(n) AS top1_share,
           CAST(MAX(n) AS DOUBLE) / (CAST(SUM(n) AS DOUBLE) / COUNT(*))
             AS skew_factor
    FROM per_key
    """,
)
def a_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-skew diagnosis for a prospective shuffle key (here
    events.user_id): key count, hottest-key row count, exact p50/p99 key
    sizes, the hottest key's share of all rows, and max/mean skew factor —
    the report that decides between a plain shuffle, AQE skew splitting,
    and explicit salting (operators/skew.py). Two aggregations: the
    per-key count shuffles on the key under test (exactly what the real
    query would do), then a single-row reduce over one row per key."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    return per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("n").cast("long").alias("total_rows"),
        F.max("n").alias("max_key_rows"),
        F.percentile(F.col("n").cast("double"), F.lit(0.5)).alias(
            "p50_key_rows"
        ),
        F.percentile(F.col("n").cast("double"), F.lit(0.99)).alias(
            "p99_key_rows"
        ),
        (F.max("n").cast("double") / F.sum("n")).alias("top1_share"),
        (
            F.max("n").cast("double")
            / (F.sum("n").cast("double") / F.count(F.lit(1)))
        ).alias("skew_factor"),
    )


@register(
    "a_group_sample",
    oracle=f"""
    SELECT doc_id, source, rank FROM (
      SELECT doc_id, source,
             CAST(ROW_NUMBER() OVER (
               PARTITION BY source
               ORDER BY {sql_hash_bucket(['doc_id'], seed='inspect')},
                        doc_id) AS BIGINT) AS rank
      FROM documents)
    WHERE rank <= 3
    """,
)
def a_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group inspection sample: 3 documents per source,
    chosen by md5 hash order (layout/partitioning-invariant — the same 3
    docs on any engine, any run, any file order; a seeded ORDER BY
    random() is neither). The per-group rank is WindowGroupLimit-pruned,
    so each map partition forwards at most 3 rows per source — the
    sampling pass costs one group-keyed shuffle of k rows per group per
    partition, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(
        hash_bucket_expr(["doc_id"], seed="inspect").asc(),
        F.col("doc_id").asc(),
    )
    return (
        docs.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("long").alias("rank"),
        )
        .filter(F.col("rank") <= 3)
    )
