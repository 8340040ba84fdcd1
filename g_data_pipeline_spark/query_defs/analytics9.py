"""Analytics wave 9 (round 4, waves 5-6 and 9-10): group-wise linear
regression (closed-form OLS from exact moment sums), cumulative-adoption
curves, OOV-rate against a corpus-derived vocabulary, deterministic
train/val/test splitting, salted-join result parity, windowed event dedup
(keep-first), MoM/YoY growth reporting, and market-basket item
co-occurrence with lift.

Registered AFTER the round-4 driver window froze (the window's 50 slots
are all first-green candidates this round); these queue for the r5
window per ROTATION.md rule 3's queue clause — sim-gated now.

Determinism: regression moments are exact scaled-long sums cast to double
with the identical operation order on both engines; everything else is
integer counts or single-rounding micro-scaled ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.text import tokens
from g_data_pipeline_spark.operators.sampling import (
    hash_bucket_expr,
    sql_hash_bucket,
)
from g_data_pipeline_spark.queries import register

# ---------------------------------------------------------------------------
# Group-wise closed-form OLS
# ---------------------------------------------------------------------------


@register(
    "a_groupwise_regression",
    oracle="""
    WITH m AS (
      SELECT o_orderstatus,
             COUNT(*) AS n,
             SUM(CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS BIGINT)) AS sx,
             SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sy,
             SUM(CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS BIGINT)
                 * CAST(date_diff('day', DATE '1970-01-01',
                                  CAST(o_orderdate AS DATE)) AS BIGINT)) AS sxx,
             SUM(CAST(date_diff('day', DATE '1970-01-01',
                                CAST(o_orderdate AS DATE)) AS BIGINT)
                 * CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS sxy
      FROM orders
      GROUP BY o_orderstatus
    )
    SELECT o_orderstatus, n,
           CAST(ROUND((CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                 <> 0.0
                       THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                            / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                       ELSE 0.0 END)
                      * 1e6) AS BIGINT) AS slope_micro,
           CAST(ROUND(((CAST(sy AS DOUBLE)
                        - (CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                                     <> 0.0
                           THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                                / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                           ELSE 0.0 END)
                          * CAST(sx AS DOUBLE))
                       / CAST(n AS DOUBLE)) * 1e6) AS BIGINT)
             AS intercept_micro
    FROM m
    """,
)
def a_groupwise_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (order value in cents vs epoch-day):
    slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept = (Sy - slope*Sx)/n,
    computed from EXACT integer moment sums (epoch days x exact cents) in a
    single map-side-combined aggregate — the scalable way to fit millions
    of tiny per-segment models without MLlib: one shuffle total, no
    iteration. The long->double casts and the arithmetic order are
    mirrored on both engines; outputs are micro-scaled with ONE rounding."""
    orders = load_table(spark, sf_dir, "orders")
    x = F.datediff(
        F.col("o_orderdate").cast("date"), F.to_date(F.lit("1970-01-01"))
    ).cast("long")
    y = F.round(F.col("o_totalprice") * 100).cast("long")
    m = orders.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sx = F.col("sx").cast("double")
    sy = F.col("sy").cast("double")
    sxx = F.col("sxx").cast("double")
    sxy = F.col("sxy").cast("double")
    # Degenerate-group guard (mirrored CASE in the oracle): when every x in
    # a group is identical the denominator is exactly 0 — Spark's Divide
    # yields NULL there while DuckDB double division yields inf/nan, which
    # would crash the BIGINT cast on the gate. Define slope := 0 for that
    # case on both engines.
    den = nd * sxx - sx * sx
    slope = F.when(den != F.lit(0.0), (nd * sxy - sx * sy) / den).otherwise(
        F.lit(0.0)
    )
    intercept = (sy - slope * sx) / nd
    return m.select(
        "o_orderstatus",
        "n",
        F.round(slope * F.lit(1e6)).cast("bigint").alias("slope_micro"),
        F.round(intercept * F.lit(1e6)).cast("bigint").alias("intercept_micro"),
    )


# ---------------------------------------------------------------------------
# Cumulative adoption curve
# ---------------------------------------------------------------------------


@register(
    "e_cumulative_users",
    oracle="""
    WITH first_seen AS (
      SELECT user_id, MIN(date_trunc('day', ts)) AS first_day
      FROM events
      GROUP BY user_id
    ), per_day AS (
      SELECT first_day AS day, COUNT(*) AS n_new_users
      FROM first_seen
      GROUP BY first_day
    )
    SELECT day, n_new_users,
           CAST(SUM(n_new_users) OVER (ORDER BY day
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM per_day
    """,
)
def e_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative-adoption curve: each user's first-seen day (keyed
    aggregate over the fact table — the only big shuffle), then per-day
    new-user counts and a running total. The running-total window runs
    over the tiny per-day aggregate (days, not events), so the
    single-partition ordered window is trivially safe at any scale — the
    raw fact table is never globally sorted."""
    events = load_table(spark, sf_dir, "events")
    first_seen = events.groupBy("user_id").agg(
        F.min("ts").cast("date").alias("first_day")
    )
    per_day = first_seen.groupBy(F.col("first_day").alias("day")).agg(
        F.count(F.lit(1)).alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return per_day.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).cast("bigint").alias("cum_users"),
    )


# ---------------------------------------------------------------------------
# OOV rate vs corpus-derived vocabulary
# ---------------------------------------------------------------------------

_VOCAB_K = 50


@register(
    "t_oov_rate",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS tk
      FROM documents
    ), vocab AS (
      SELECT tk FROM (
        SELECT tk, COUNT(*) AS cnt,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, tk) AS rk
        FROM tok GROUP BY tk
      ) WHERE rk <= {_VOCAB_K}
    )
    SELECT t.doc_id,
           COUNT(*) AS n_tokens,
           COUNT(*) FILTER (WHERE v.tk IS NULL) AS n_oov,
           CAST(ROUND(CAST(COUNT(*) FILTER (WHERE v.tk IS NULL) AS DOUBLE)
                      / CAST(COUNT(*) AS DOUBLE) * 1e6) AS BIGINT)
             AS oov_micro
    FROM tok t LEFT JOIN vocab v ON t.tk = v.tk
    GROUP BY t.doc_id
    """,
)
def t_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own top-K
    token vocabulary (deterministic tie-break: count DESC, token ASC) —
    the tokenizer-coverage diagnostic run before committing to a vocab
    size. Shape: one token-count aggregate, a driver-free top-K (ordered
    window over the token-count aggregate, NOT the raw tokens), the tiny
    vocab broadcast back onto the exploded token stream, one per-doc
    aggregate. The explode is the unavoidable fan-out; everything joined
    against it is broadcast."""
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens(F.col("text"))).alias("tk"))
    counts = tok.groupBy("tk").agg(F.count(F.lit(1)).alias("cnt"))
    rk = F.row_number().over(Window.orderBy(F.col("cnt").desc(), F.col("tk")))
    vocab = (
        counts.withColumn("rk", rk)
        .filter(F.col("rk") <= _VOCAB_K)
        .select(F.col("tk").alias("vtk"))
    )
    joined = tok.join(
        F.broadcast(vocab), tok["tk"] == F.col("vtk"), "left"
    )
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.count_if(F.col("vtk").isNull()).alias("n_oov"),
        F.round(
            F.count_if(F.col("vtk").isNull()).cast("double")
            / F.count(F.lit(1)).cast("double")
            * F.lit(1e6)
        )
        .cast("bigint")
        .alias("oov_micro"),
    )


# ---------------------------------------------------------------------------
# Train / val / test split
# ---------------------------------------------------------------------------


@register(
    "t_train_val_test_split",
    oracle=f"""
    WITH assigned AS (
      SELECT source,
             CASE WHEN ({sql_hash_bucket(['doc_id'], seed='split-v1')}) < 800000
                  THEN 'train'
                  WHEN ({sql_hash_bucket(['doc_id'], seed='split-v1')}) < 900000
                  THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM documents
    )
    SELECT split, source, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM assigned
    GROUP BY split, source
    """,
)
def t_train_val_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split report by source: the
    assignment is the md5 hash bucket of the document id (layout- and
    scale-invariant — a document keeps its split across reshuffles,
    re-partitions, and re-runs, the property random() splits lack). Pure
    projection + one small aggregate; the split column is reusable as-is
    by the export pipeline."""
    docs = load_table(spark, sf_dir, "documents")
    b = hash_bucket_expr(["doc_id"], seed="split-v1")
    split = (
        F.when(b < 800000, F.lit("train"))
        .when(b < 900000, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


# ---------------------------------------------------------------------------
# Salted-join parity (wave 6)
# ---------------------------------------------------------------------------


@register(
    "a_salted_join",
    oracle="""
    SELECT s.s_nationkey,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_quantity * 100) AS BIGINT)) AS BIGINT)
             AS qty_cents
    FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
    GROUP BY s.s_nationkey
    """,
)
def a_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted fact-dim join (operators/skew.py): the fact side gets a
    random salt, the dim side replicates across all salt values, the join
    keys on (key, salt) — the hot-key defense when the dim is too big to
    broadcast and AQE's skew split can't help (e.g. a single key holding
    >1 executor-memory of rows). The salt only redistributes rows, so the
    joined RESULT is salt-invariant — which is exactly what this oracle
    checks: the salted plan must produce bit-identical aggregates to the
    plain SQL join. Exact integer outputs (count + cent sum)."""
    from g_data_pipeline_spark.operators.skew import salted_join

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("k"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("qty_cents"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("k"), "s_nationkey"
    )
    joined = salted_join(li, supp, "k", salt_buckets=8)
    return joined.groupBy("s_nationkey").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("qty_cents").cast("bigint").alias("qty_cents"),
    )


# ---------------------------------------------------------------------------
# Windowed event dedup, keep-first (wave 6)
# ---------------------------------------------------------------------------


@register(
    "e_event_dedup_first",
    oracle="""
    SELECT user_id, event_type,
           epoch_us(ts) // 300000000 AS bucket_5min,
           event_id
    FROM events
    QUALIFY ROW_NUMBER() OVER (
      PARTITION BY user_id, event_type, epoch_us(ts) // 300000000
      ORDER BY ts, event_id) = 1
    """,
)
def e_event_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup, keep-FIRST-occurrence: collapse repeated
    (user, event_type) events inside each 5-minute bucket to the earliest
    one — the batch twin of the streaming `dedup_events_stream`
    (watermark + dropDuplicates) for at-least-once feeds that retry
    sends. One shuffle on the dedup key; the rank-1 is
    WindowGroupLimit-pruned map-side, so a hot key's duplicates never
    all cross the wire. All-integer bucket arithmetic."""
    events = load_table(spark, sf_dir, "events")
    bucket = F.expr(f"unix_micros(ts) div {300 * 1_000_000}")
    w = Window.partitionBy("user_id", "event_type", "bucket_5min").orderBy(
        "ts", "event_id"
    )
    return (
        events.withColumn("bucket_5min", bucket)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("user_id", "event_type", "bucket_5min", "event_id")
    )


# ---------------------------------------------------------------------------
# Month-over-month / year-over-year growth (wave 9)
# ---------------------------------------------------------------------------


@register(
    "a_yoy_growth",
    oracle="""
    WITH monthly AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
             CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_cents,
             COUNT(*) AS n_orders
      FROM orders
      GROUP BY 1
    )
    SELECT m.month, m.revenue_cents, m.n_orders,
           m.revenue_cents - p1.revenue_cents AS mom_delta_cents,
           m.revenue_cents - p12.revenue_cents AS yoy_delta_cents
    FROM monthly m
    LEFT JOIN monthly p1
      ON p1.month = CAST(m.month - INTERVAL 1 MONTH AS DATE)
    LEFT JOIN monthly p12
      ON p12.month = CAST(m.month - INTERVAL 12 MONTH AS DATE)
    """,
)
def a_yoy_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month and year-over-year revenue deltas: one monthly
    aggregate over the fact table (exact cent sums), then CALENDAR
    self-joins on month-minus-1/minus-12 over the tiny month table — not
    LAG(1)/LAG(12), which silently compares against the wrong month when
    any month in the series is empty. The joins are broadcast (one row
    per month at any scale); a missing prior period yields a NULL delta
    on both engines. All-integer outputs."""
    orders = load_table(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month")
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("bigint")
        .alias("revenue_cents"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    p1 = monthly.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("revenue_cents").alias("prev1"),
    )
    p12 = monthly.select(
        F.add_months(F.col("month"), 12).alias("month"),
        F.col("revenue_cents").alias("prev12"),
    )
    return (
        monthly.join(F.broadcast(p1), "month", "left")
        .join(F.broadcast(p12), "month", "left")
        .select(
            "month",
            "revenue_cents",
            "n_orders",
            (F.col("revenue_cents") - F.col("prev1")).alias("mom_delta_cents"),
            (F.col("revenue_cents") - F.col("prev12")).alias(
                "yoy_delta_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Item co-occurrence / lift (wave 10)
# ---------------------------------------------------------------------------


@register(
    "e_item_cooccurrence",
    oracle=r"""
    WITH ui_all AS (
      SELECT DISTINCT user_id,
             CAST(regexp_extract(props, '"k": (\d+)', 1) AS BIGINT) AS item
      FROM events
      WHERE regexp_extract(props, '"k": (\d+)', 1) <> ''
    ), ui AS (
      SELECT user_id, item FROM ui_all
      QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY item) <= 500
    ), item_counts AS (
      SELECT item, COUNT(*) AS cnt FROM ui GROUP BY item
    ), total AS (
      SELECT COUNT(DISTINCT user_id) AS n_users FROM ui
    ), co AS (
      SELECT a.item AS item_a, b.item AS item_b, COUNT(*) AS n_co
      FROM ui a JOIN ui b
        ON a.user_id = b.user_id AND a.item < b.item
      GROUP BY 1, 2
    )
    SELECT c.item_a, c.item_b, c.n_co,
           CAST(ROUND((CAST(c.n_co AS DOUBLE) * CAST(t.n_users AS DOUBLE))
                      / (CAST(ia.cnt AS DOUBLE) * CAST(ib.cnt AS DOUBLE))
                      * 1e6) AS BIGINT) AS lift_micro
    FROM co c
    JOIN item_counts ia ON ia.item = c.item_a
    JOIN item_counts ib ON ib.item = c.item_b
    CROSS JOIN total t
    WHERE c.n_co >= 5
    """,
)
def e_item_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket item co-occurrence with lift (the item-item
    recommender / association-mining primitive): distinct (user, item)
    pairs from the event props, a self-join keyed on user_id for
    co-occurrence counts, and lift = P(a,b)/(P(a)P(b)) from exact integer
    counts. Scale shape: the self-join is co-partitioned on user_id and
    quadratic ONLY in per-user basket size — the production knob is a
    basket cap (top-N recent items per user) before the join; item counts
    and the 1-row user total broadcast back onto the tiny co-occurrence
    aggregate. Support floor n_co >= 5 bounds the output. All-integer
    inputs, one micro-rounding."""
    events = load_table(spark, sf_dir, "events")
    item = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1)
    ui_all = (
        events.select("user_id", item.alias("item_s"))
        .filter(F.col("item_s") != "")
        .select("user_id", F.col("item_s").cast("bigint").alias("item"))
        .distinct()
    )
    # Basket cap (the production skew knob): keep a bounded, DETERMINISTIC
    # subset per user before the quadratic self-join, so one scraper-bot
    # user with a million items can't mint 10^12 pair rows. Rank-500 is a
    # no-op on this data (baskets are far smaller) but pins the shape:
    # WindowGroupLimit prunes the rank map-side.
    w_cap = Window.partitionBy("user_id").orderBy("item")
    ui = (
        ui_all.withColumn("__rk", F.row_number().over(w_cap))
        .filter(F.col("__rk") <= 500)
        .drop("__rk")
    )
    a = ui.select("user_id", F.col("item").alias("item_a"))
    b = ui.select("user_id", F.col("item").alias("item_b"))
    co = (
        a.join(b, "user_id")
        .filter(F.col("item_a") < F.col("item_b"))
        .groupBy("item_a", "item_b")
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 5)
    )
    counts = ui.groupBy("item").agg(F.count(F.lit(1)).alias("cnt"))
    total = ui.agg(F.count_distinct("user_id").alias("n_users"))
    ia = counts.select(F.col("item").alias("item_a"), F.col("cnt").alias("cnt_a"))
    ib = counts.select(F.col("item").alias("item_b"), F.col("cnt").alias("cnt_b"))
    lift = (
        (F.col("n_co").cast("double") * F.col("n_users").cast("double"))
        / (F.col("cnt_a").cast("double") * F.col("cnt_b").cast("double"))
    )
    return (
        co.join(F.broadcast(ia), "item_a")
        .join(F.broadcast(ib), "item_b")
        .crossJoin(F.broadcast(total))
        .select(
            "item_a",
            "item_b",
            "n_co",
            F.round(lift * F.lit(1e6)).cast("bigint").alias("lift_micro"),
        )
    )


# ---------------------------------------------------------------------------
# A/B test: two-proportion z-test (wave 12)
# ---------------------------------------------------------------------------


@register(
    "e_ab_test",
    oracle="""
    WITH conv AS (
      SELECT user_id, user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' AND value > 150.0
                      THEN 1 ELSE 0 END) AS converted
      FROM events GROUP BY user_id
    ), wide AS (
      SELECT CAST(COUNT(*) FILTER (WHERE variant = 0) AS BIGINT) AS n_a,
             CAST(SUM(converted) FILTER (WHERE variant = 0) AS BIGINT) AS c_a,
             CAST(COUNT(*) FILTER (WHERE variant = 1) AS BIGINT) AS n_b,
             CAST(SUM(converted) FILTER (WHERE variant = 1) AS BIGINT) AS c_b
      FROM conv
    )
    SELECT n_a, c_a, n_b, c_b,
           CASE WHEN (CAST(c_a AS DOUBLE) + c_b) / (n_a + n_b) > 0
                 AND (CAST(c_a AS DOUBLE) + c_b) / (n_a + n_b) < 1
           THEN CAST(ROUND(((CAST(c_a AS DOUBLE) / n_a)
                            - (CAST(c_b AS DOUBLE) / n_b))
                           / SQRT(((CAST(c_a AS DOUBLE) + c_b) / (n_a + n_b))
                                  * (1 - (CAST(c_a AS DOUBLE) + c_b)
                                         / (n_a + n_b))
                                  * (1.0 / n_a + 1.0 / n_b)) * 1e6)
                     AS BIGINT) END AS z_micro
    FROM wide
    """,
)
def e_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test for an A/B experiment (variant = user_id
    parity, conversion = any purchase event): per-user conversion flags,
    conditional-count aggregation into one wide row, and the pooled-
    variance z statistic from EXACT integer counts — one fact shuffle
    (user agg) plus a 2-group conditional aggregate, no joins. The double
    arithmetic (two divisions, one sqrt) is written with identical
    operand order on both engines and micro-scaled with ONE rounding.
    The experimentation-analysis primitive every event pipeline ships."""
    events = load_table(spark, sf_dir, "events")
    conv = events.groupBy("user_id").agg(
        F.max(
            F.when(
                (F.col("event_type") == "purchase")
                & (F.col("value") > 150.0),
                F.lit(1),
            ).otherwise(F.lit(0))
        ).alias("converted")
    ).withColumn("variant", F.col("user_id") % 2)
    wide = conv.agg(
        F.count_if(F.col("variant") == 0).cast("bigint").alias("n_a"),
        F.sum(F.when(F.col("variant") == 0, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("c_a"),
        F.count_if(F.col("variant") == 1).cast("bigint").alias("n_b"),
        F.sum(F.when(F.col("variant") == 1, F.col("converted")).otherwise(0))
        .cast("bigint")
        .alias("c_b"),
    )
    ca = F.col("c_a").cast("double")
    cb = F.col("c_b").cast("double")
    na, nb = F.col("n_a"), F.col("n_b")
    pool = (ca + F.col("c_b")) / (na + nb)
    z = ((ca / na) - (cb / nb)) / F.sqrt(
        pool * (F.lit(1) - pool) * (F.lit(1.0) / na + F.lit(1.0) / nb)
    )
    # degenerate experiment (0% or 100% pooled conversion): z is 0/0 —
    # NULL on both engines, never an ANSI divide-by-zero
    z_guarded = F.when((pool > 0) & (pool < 1), z)
    return wide.select(
        "n_a",
        "c_a",
        "n_b",
        "c_b",
        F.round(z_guarded * F.lit(1e6)).cast("bigint").alias("z_micro"),
    )
