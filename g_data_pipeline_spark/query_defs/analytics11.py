"""Round-5 second analytics wave (registered post-window; ROTATION.md
queues them for in-window r6 grading): RFM customer segmentation, trimmed
(winsorized-cut) means, Benford first-digit audit, wide→long UNPIVOT, and
top user-journey trigrams.

Determinism: money flows as exact cents (ROUND(x*100) long), percentile
cuts use the doubled-cents trick (the p10/p90 of an even-integer column is
an integer — no half-value crosses the gate), means are micro-scaled with
ONE double division + ONE rounding, and every top-k has a total-order
tiebreak on the group key so LIMIT selects the same set on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register

_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "a_rfm_segments",
    oracle=f"""
    WITH c AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_d,
             COUNT(*) AS freq,
             SUM({_CENTS}) AS mon
      FROM orders GROUP BY o_custkey
    ), q AS (
      SELECT NTILE(5) OVER (ORDER BY last_d DESC, o_custkey) AS r_q,
             NTILE(5) OVER (ORDER BY freq DESC, o_custkey) AS f_q,
             NTILE(5) OVER (ORDER BY mon DESC, o_custkey) AS m_q,
             mon
      FROM c
    )
    SELECT CAST(r_q AS BIGINT) AS r_quintile,
           CAST(f_q AS BIGINT) AS f_quintile,
           CAST(m_q AS BIGINT) AS m_quintile,
           COUNT(*) AS n_customers,
           CAST(SUM(mon) AS BIGINT) AS total_cents
    FROM q GROUP BY 1, 2, 3
    """,
)
def a_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic CRM cube: per-customer last order date, order count, and
    lifetime cents, each cut into quintiles, then segment-level counts and
    revenue. NTILE runs over the CUSTOMER AGGREGATE (|customers| rows, not
    facts) with a custkey tiebreak for a total order, so both engines fill
    the same buckets. Scale shape (round-6): each of the three quintile
    cuts runs through the two-phase row-index kernel
    (operators/windows.bucketed_row_index + ntile_from_index) with a
    dimension-appropriate bucket (16-day recency bands; exact frequency
    value + custkey range — freq is low-cardinality, so it IS its own
    bucket level; 2^17-cent monetary bands), then the three per-customer
    quintiles re-join on custkey. No single-partition sort of the rollup
    anywhere (plan-pinned by the registry-wide global-window sweep)."""
    from g_data_pipeline_spark.operators.windows import (
        bucketed_row_index,
        ntile_from_index,
    )

    orders = load_table(spark, sf_dir, "orders")
    c = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_d"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("mon"),
    )

    def quintile(keys, buckets, alias):
        idx = bucketed_row_index(c, keys, buckets)
        return idx.select(
            "o_custkey",
            ntile_from_index(F.col("__rn"), F.col("__total"), 5).alias(alias),
        )

    r = quintile(
        [("last_d", False), ("o_custkey", True)],
        # o_orderdate is a TIMESTAMP: 16-day bands over microseconds
        [
            (
                F.floor(
                    F.unix_micros(F.col("last_d"))
                    / F.lit(16 * 86_400 * 1_000_000)
                ),
                False,
            )
        ],
        "r_quintile",
    )
    f = quintile(
        [("freq", False), ("o_custkey", True)],
        [
            (F.col("freq"), False),
            (F.floor(F.col("o_custkey") / F.lit(1 << 16)), True),
        ],
        "f_quintile",
    )
    m = quintile(
        [("mon", False), ("o_custkey", True)],
        [(F.floor(F.col("mon") / F.lit(1 << 17)), False)],
        "m_quintile",
    )
    q = (
        c.select("o_custkey", "mon")
        .join(r, "o_custkey")
        .join(f, "o_custkey")
        .join(m, "o_custkey")
    )
    return q.groupBy("r_quintile", "f_quintile", "m_quintile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("mon").cast("long").alias("total_cents"),
    )


@register(
    "a_trimmed_mean",
    oracle=f"""
    WITH x AS (
      SELECT o_orderpriority AS p, {_CENTS} AS c FROM orders
    ), cuts AS (
      SELECT p, CAST(QUANTILE_CONT(2 * c, 0.1) AS BIGINT) AS lo2,
                CAST(QUANTILE_CONT(2 * c, 0.9) AS BIGINT) AS hi2
      FROM x GROUP BY p
    )
    SELECT x.p AS o_orderpriority,
           COUNT(*) AS n_kept,
           CAST(SUM(x.c) AS BIGINT) AS kept_cents,
           CAST(ROUND(1e6 * CAST(SUM(x.c) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS trimmed_mean_micro
    FROM x JOIN cuts USING (p)
    WHERE 2 * x.c >= cuts.lo2 AND 2 * x.c <= cuts.hi2
    GROUP BY 1
    """,
)
def a_trimmed_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10%-trimmed mean per order priority — the robust location estimate
    that survives fat tails (complements a_mad_outliers: MAD flags, trim
    summarizes). Keeps rows inside [p10, p90]; the cut values are exact
    percentiles of DOUBLED cents (integers on both engines — the compare
    2·c >= lo2 never touches a float), and the kept-mean is one double
    division micro-rounded once. Shape: one percentile aggregate (ONE
    F.percentile with an array of fractions per the CLAUDE.md buffer rule)
    broadcast back onto the fact scan — the facts shuffle once."""
    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    cuts = x.groupBy("p").agg(
        F.percentile(F.col("c") * 2, F.array(F.lit(0.1), F.lit(0.9))).alias(
            "pct"
        )
    )
    cuts = cuts.select(
        "p",
        F.col("pct")[0].cast("long").alias("lo2"),
        F.col("pct")[1].cast("long").alias("hi2"),
    )
    kept = x.join(F.broadcast(cuts), "p").where(
        (F.col("c") * 2 >= F.col("lo2")) & (F.col("c") * 2 <= F.col("hi2"))
    )
    return kept.groupBy(F.col("p").alias("o_orderpriority")).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("c").cast("long").alias("kept_cents"),
        F.round(
            F.lit(1e6) * F.sum("c").cast("double") / F.count(F.lit(1))
        )
        .cast("long")
        .alias("trimmed_mean_micro"),
    )


@register(
    "a_benford_digits",
    oracle=f"""
    WITH d AS (
      SELECT CAST(SUBSTR(CAST({_CENTS} AS VARCHAR), 1, 1) AS BIGINT)
               AS first_digit
      FROM orders
    )
    SELECT first_digit,
           COUNT(*) AS n_orders,
           CAST(ROUND(1e6 * CAST(COUNT(*) AS DOUBLE)
                      / SUM(COUNT(*)) OVER ()) AS BIGINT) AS share_micro
    FROM d GROUP BY first_digit
    """,
)
def a_benford_digits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit audit of order amounts — the
    standard forensic / data-quality screen (fabricated or clipped values
    bend the leading-digit curve). The digit comes from the decimal STRING
    of exact cents (both engines print longs identically) — no log10 on a
    double, whose 10^k boundary ulps could flip a digit. The share window
    runs over the 9-row aggregate, never the facts."""
    orders = load_table(spark, sf_dir, "orders")
    d = orders.select(
        F.substring(
            F.round(F.col("o_totalprice") * 100).cast("long").cast("string"),
            1,
            1,
        )
        .cast("long")
        .alias("first_digit")
    )
    agg = d.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_orders"))
    total = Window.partitionBy()
    return agg.select(
        "first_digit",
        "n_orders",
        F.round(
            F.lit(1e6)
            * F.col("n_orders").cast("double")
            / F.sum("n_orders").over(total)
        )
        .cast("long")
        .alias("share_micro"),
    )


@register(
    "g_unpivot",
    oracle="""
    WITH wide AS (
      SELECT l_returnflag,
             CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT)
               AS qty_x100,
             CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS price_cents,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, measure, value
    FROM wide UNPIVOT (value FOR measure IN (qty_x100, price_cents, n_rows))
    """,
)
def g_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long UNPIVOT / melt — g_pivot's inverse and the standard
    metrics-table normalizer (one row per (key, measure) feeds generic
    dashboards and UNION-friendly sinks). Spark's native `unpivot`
    (Expand node — row-local, zero extra shuffles beyond the rollup's one)
    against DuckDB's UNPIVOT. All three measures are BIGINT so the long
    `value` column needs no lossy unification."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        F.sum(F.round(F.col("l_quantity") * 100).cast("long"))
        .cast("long")
        .alias("qty_x100"),
        F.sum(F.round(F.col("l_extendedprice") * 100).cast("long"))
        .cast("long")
        .alias("price_cents"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return wide.unpivot(
        ["l_returnflag"], ["qty_x100", "price_cents", "n_rows"], "measure", "value"
    )


@register(
    "e_session_paths",
    oracle="""
    WITH seq AS (
      SELECT event_type AS e1,
             LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2,
             LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e3
      FROM events
    )
    SELECT e1, e2, e3, COUNT(*) AS n_paths
    FROM seq WHERE e3 IS NOT NULL
    GROUP BY e1, e2, e3
    ORDER BY n_paths DESC, e1, e2, e3
    LIMIT 20
    """,
)
def e_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 user-journey trigrams (event-type 3-grams per user in time
    order) — the "common paths" report behind funnel design: which
    3-step sequences actually happen. One user-keyed exchange for the LEAD
    window; the trigram aggregate then shuffles tiny (|event_types|³ keys
    max). LIMIT rides a full tiebreak (n DESC, then the path) so both
    engines pick the same boundary rows; Spark compiles it to
    TakeOrderedAndProject — no global sort materializes."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    )
    return (
        seq.where(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n_paths"))
        .orderBy(F.desc("n_paths"), "e1", "e2", "e3")
        .limit(20)
    )


@register(
    "e_ewma_daily_volume",
    oracle=r"""
    WITH daily AS (
      SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS d,
             COUNT(*) AS c
      FROM events GROUP BY 1, 2
    ), arrs AS (
      SELECT event_type, list(c ORDER BY d) AS cs FROM daily GROUP BY 1
    )
    SELECT event_type,
           CAST(len(cs) AS BIGINT) AS n_days,
           CAST(cs[len(cs)] AS BIGINT) AS last_count,
           CAST(ROUND(1e6 * list_reduce(
                  list_transform(cs, x -> CAST(x AS DOUBLE)),
                  (acc, x) -> CAST(0.5 AS DOUBLE) * acc
                              + CAST(0.5 AS DOUBLE) * x)) AS BIGINT)
             AS ewma_micro,
           CASE WHEN len(cs) >= 2 THEN
             CAST(ROUND(1e6 * (CAST(cs[len(cs)] AS DOUBLE)
                  - list_reduce(
                      list_transform(cs[1:len(cs) - 1],
                                     x -> CAST(x AS DOUBLE)),
                      (acc, x) -> CAST(0.5 AS DOUBLE) * acc
                                  + CAST(0.5 AS DOUBLE) * x))) AS BIGINT)
           END AS last_dev_micro
    FROM arrs
    """,
)
def e_ewma_daily_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EWMA (α=0.5) of daily event volume per type + the last day's
    deviation from the forecast — the classic smoothed-baseline anomaly
    signal. EWMA is a RECURSIVE statistic (each value depends on the
    previous), which a distributed engine can't express as a plain
    aggregate; here the day series collapses to a per-type ordered array
    (30 elements — driver-safe at any fact scale since the daily rollup
    bounds it) and a row-local `F.aggregate` fold runs the recursion in
    one pass, seeded with the first element. DuckDB's `list_reduce` has
    identical seeding semantics, and both folds walk the same
    day-sorted order, so the doubles match bit-for-bit (α=0.5 keeps each
    step an exact power-of-two scale). Shuffles: the daily aggregate and
    the per-type array build — both keyed, no window over facts."""
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.count(F.lit(1)).alias("c"))
    arrs = daily.groupBy("event_type").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("d", "c"))),
            lambda s: s["c"],
        ).alias("cs")
    )
    n = F.size("cs")
    fold = lambda col: F.aggregate(  # noqa: E731
        F.slice(col, 2, F.size(col) - 1),
        F.element_at(col, 1).cast("double"),
        lambda acc, x: F.lit(0.5) * acc + F.lit(0.5) * x,
    )
    prev = fold(F.slice(F.col("cs"), 1, n - 1))
    return arrs.select(
        "event_type",
        n.cast("long").alias("n_days"),
        F.element_at("cs", -1).cast("long").alias("last_count"),
        F.round(F.lit(1e6) * fold(F.col("cs"))).cast("long").alias(
            "ewma_micro"
        ),
        F.when(
            n >= 2,
            F.round(
                F.lit(1e6)
                * (F.element_at("cs", -1).cast("double") - prev)
            ).cast("long"),
        ).alias("last_dev_micro"),
    )


@register(
    "a_log2_histogram",
    oracle=f"""
    WITH c AS (SELECT {_CENTS} AS cents FROM orders)
    SELECT CAST(LENGTH(bin(cents)) AS BIGINT) AS log2_bucket,
           COUNT(*) AS n_orders,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS total_cents
    FROM c GROUP BY 1
    """,
)
def a_log2_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential (power-of-two) histogram of order amounts — the
    HDR-histogram-style bucketing every latency/size distribution uses
    (equal-width drowns the tail, equi-depth needs a percentile pass; log2
    needs neither). The bucket is EXACT: LENGTH(bin(cents)) =
    floor(log2)+1 from the binary string both engines render identically —
    never floor(log10/log2(double)), whose 2^k-boundary ulps flip buckets.
    Zero-shuffle until the ~30-row aggregate."""
    orders = load_table(spark, sf_dir, "orders")
    c = orders.select(
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents")
    )
    return c.groupBy(
        F.length(F.bin("cents")).cast("long").alias("log2_bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").cast("long").alias("total_cents"),
    )
