"""Round-5 analytics wave: robust statistics (MAD outliers), distribution
reports (deciles, 2-D histogram, percent-of-total, Pareto concentration),
an exact-integer-moment correlation table, a time-hierarchy rollup, a
running-max/drawdown window, and a five-dimension star join.

Determinism: money flows as exact cents (ROUND(x*100) long), medians stay
integer by doubling before QUANTILE_CONT/percentile (median of even ints is
an int — no half-value ever leaves the engines), shares/correlations are
micro-scaled with ONE rounding, and big second-moment sums use decimal
accumulators (long would overflow on Σ cents² at sf ≥ 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.queries import register

_CENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"


@register(
    "a_mad_outliers",
    oracle=f"""
    WITH x AS (
      SELECT o_orderpriority AS p, {_CENTS} AS c FROM orders
    ), m AS (
      SELECT p, CAST(QUANTILE_CONT(2 * c, 0.5) AS BIGINT) AS med2
      FROM x GROUP BY p
    ), d AS (
      SELECT x.p, x.c, m.med2, ABS(2 * x.c - m.med2) AS dev2
      FROM x JOIN m USING (p)
    ), md AS (
      SELECT p, CAST(QUANTILE_CONT(2 * dev2, 0.5) AS BIGINT) AS mad4
      FROM d GROUP BY p
    )
    SELECT d.p AS o_orderpriority,
           COUNT(*) AS n_orders,
           MIN(d.med2) AS med_x2_cents,
           MIN(md.mad4) AS mad_x4_cents,
           COUNT(*) FILTER (WHERE 2 * d.dev2 > 3 * md.mad4) AS n_outliers
    FROM d JOIN md USING (p)
    GROUP BY d.p
    """,
)
def a_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Median-absolute-deviation outlier report per order priority — the
    robust alternative to z-scores (a_iqr_outliers' cousin; MAD shrugs at
    the heavy tail that inflates stddev). Stays integer throughout: the
    median of DOUBLED cents is an integer (mean of two even ints), the
    deviation median likewise, and the 3-MAD test cross-multiplies
    (2·dev2 > 3·mad4) — no float compare on the gate. Shape: two
    percentile aggregates + two broadcast joins of 5-row stats tables;
    the fact table is scanned, never wide-shuffled."""
    orders = load_table(spark, sf_dir, "orders")
    x = orders.select(
        F.col("o_orderpriority").alias("p"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("c"),
    )
    m = x.groupBy("p").agg(
        F.percentile(F.col("c") * 2, F.lit(0.5)).cast("long").alias("med2")
    )
    d = x.join(F.broadcast(m), "p").withColumn(
        "dev2", F.abs(F.col("c") * 2 - F.col("med2"))
    )
    md = d.groupBy("p").agg(
        F.percentile(F.col("dev2") * 2, F.lit(0.5)).cast("long").alias("mad4")
    )
    return (
        d.join(F.broadcast(md), "p")
        .groupBy("p")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("med2").alias("med_x2_cents"),
            F.min("mad4").alias("mad_x4_cents"),
            F.count_if(
                F.col("dev2") * 2 > F.col("mad4") * 3
            ).alias("n_outliers"),
        )
        .select(
            F.col("p").alias("o_orderpriority"),
            "n_orders",
            "med_x2_cents",
            "mad_x4_cents",
            "n_outliers",
        )
    )


@register(
    "a_decile_stats",
    oracle="""
    WITH x AS (
      SELECT c_custkey,
             CAST(ROUND(c_acctbal * 100) AS BIGINT) AS cents,
             NTILE(10) OVER (ORDER BY CAST(ROUND(c_acctbal * 100) AS BIGINT),
                             c_custkey) AS decile
      FROM customer
    )
    SELECT CAST(decile AS BIGINT) AS decile,
           COUNT(*) AS n_customers,
           MIN(cents) AS min_cents,
           MAX(cents) AS max_cents,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM x GROUP BY decile
    """,
)
def a_decile_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Account-balance decile report (NTILE over a TOTAL order — cents
    then custkey, so bucket boundaries are deterministic). Scale shape
    (round-6): the global NTILE runs through the two-phase row-index
    kernel (operators/windows.bucketed_row_index + ntile_from_index) —
    cents-bucketed local row numbers + tiny cumulative offsets broadcast
    back — never a single-partition sort of the customer dimension
    (plan-pinned in tests/test_plans6.py). ntile_from_index reproduces
    SQL NTILE exactly, so the oracle keeps its window formulation."""
    from g_data_pipeline_spark.operators.windows import (
        bucketed_row_index,
        ntile_from_index,
    )

    cust = load_table(spark, sf_dir, "customer")
    cents = F.round(F.col("c_acctbal") * 100).cast("long")
    idx = bucketed_row_index(
        cust.select(F.col("c_custkey"), cents.alias("cents")),
        [("cents", True), ("c_custkey", True)],
        [(F.floor(F.col("cents") / F.lit(2048)), True)],
    )
    x = idx.withColumn(
        "decile", ntile_from_index(F.col("__rn"), F.col("__total"), 10)
    )
    return x.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.min("cents").alias("min_cents"),
        F.max("cents").alias("max_cents"),
        F.sum("cents").cast("long").alias("sum_cents"),
    )


@register(
    "a_percent_of_total",
    oracle=f"""
    WITH rev AS (
      SELECT n.n_name, SUM({_CENTS}) AS revenue_cents
      FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY n.n_name
    )
    SELECT n_name,
           CAST(revenue_cents AS BIGINT) AS revenue_cents,
           CAST(ROUND(revenue_cents * 1e6
                      / CAST(SUM(revenue_cents) OVER () AS DOUBLE))
                AS BIGINT) AS share_micro
    FROM rev
    """,
)
def a_percent_of_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue share per nation: one fact aggregate (exact cents), then a
    percent-of-total window over the 25-row ROLLUP — the window touches
    the aggregate, never the facts (the golden rule every e_* window
    query here follows). Dimensions broadcast; share is micro-scaled with
    one rounding."""
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rev = (
        orders.join(
            F.broadcast(cust.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_name")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("n_name")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
            .alias("revenue_cents")
        )
    )
    return rev.select(
        "n_name",
        F.col("revenue_cents").cast("long").alias("revenue_cents"),
        F.round(
            F.col("revenue_cents") * F.lit(1e6)
            / F.sum("revenue_cents").over(Window.partitionBy()).cast("double")
        )
        .cast("long")
        .alias("share_micro"),
    )


_MOMENTS = """
    m AS (
      SELECT COUNT(*) AS n,
             SUM(CAST(q AS DECIMAL(38,0))) AS sq,
             SUM(CAST(e AS DECIMAL(38,0))) AS se,
             SUM(CAST(d AS DECIMAL(38,0))) AS sd,
             SUM(CAST(q*q AS DECIMAL(38,0))) AS sqq,
             SUM(CAST(e*e AS DECIMAL(38,0))) AS see,
             SUM(CAST(d*d AS DECIMAL(38,0))) AS sdd,
             SUM(CAST(q*e AS DECIMAL(38,0))) AS sqe,
             SUM(CAST(q*d AS DECIMAL(38,0))) AS sqd,
             SUM(CAST(e*d AS DECIMAL(38,0))) AS sed
      FROM (SELECT CAST(l_quantity AS BIGINT) AS q,
                   CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS e,
                   CAST(ROUND(l_discount * 100) AS BIGINT) AS d
            FROM lineitem)
    )
"""


def _sql_corr(sx: str, sy: str, sxy: str, sxx: str, syy: str) -> str:
    n = "CAST(n AS DOUBLE)"
    return (
        f"CAST(ROUND((({n} * CAST({sxy} AS DOUBLE)"
        f" - CAST({sx} AS DOUBLE) * CAST({sy} AS DOUBLE))"
        f" / SQRT(({n} * CAST({sxx} AS DOUBLE)"
        f" - CAST({sx} AS DOUBLE) * CAST({sx} AS DOUBLE))"
        f" * ({n} * CAST({syy} AS DOUBLE)"
        f" - CAST({sy} AS DOUBLE) * CAST({sy} AS DOUBLE)))) * 1e6)"
        f" AS BIGINT)"
    )


@register(
    "a_corr_pairs_moments",
    oracle=f"""
    WITH {_MOMENTS}
    SELECT 'qty_price' AS pair, n,
           {_sql_corr('sq', 'se', 'sqe', 'sqq', 'see')} AS corr_micro
    FROM m
    UNION ALL
    SELECT 'qty_discount' AS pair, n,
           {_sql_corr('sq', 'sd', 'sqd', 'sqq', 'sdd')} AS corr_micro
    FROM m
    UNION ALL
    SELECT 'price_discount' AS pair, n,
           {_sql_corr('se', 'sd', 'sed', 'see', 'sdd')} AS corr_micro
    FROM m
    """,
)
def a_corr_pairs_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlations from EXACT integer moment sums — the
    deterministic sibling of p_correlation_matrix (which rounds engine-
    native corr): quantity/price/discount as scaled longs, all nine
    moments in ONE map-side-combined aggregate pass (decimal accumulators
    — Σcents² overflows a long at sf ≥ 1), then each coefficient is an
    identical chain of double ops on both engines with one micro
    rounding. Adding columns grows the moment list quadratically but the
    pass count stays ONE — the way to correlate at 100 TB."""
    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast("long")
    e = F.round(F.col("l_extendedprice") * 100).cast("long")
    d = F.round(F.col("l_discount") * 100).cast("long")
    dec = lambda c: F.sum(c.cast("decimal(38,0)"))  # noqa: E731
    m = li.select(
        q.alias("q"), e.alias("e"), d.alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        dec(F.col("q")).alias("sq"),
        dec(F.col("e")).alias("se"),
        dec(F.col("d")).alias("sd"),
        dec(F.col("q") * F.col("q")).alias("sqq"),
        dec(F.col("e") * F.col("e")).alias("see"),
        dec(F.col("d") * F.col("d")).alias("sdd"),
        dec(F.col("q") * F.col("e")).alias("sqe"),
        dec(F.col("q") * F.col("d")).alias("sqd"),
        dec(F.col("e") * F.col("d")).alias("sed"),
    )

    def corr(sx, sy, sxy, sxx, syy):
        n = F.col("n").cast("double")
        dx = F.col(sx).cast("double")
        dy = F.col(sy).cast("double")
        return F.round(
            (
                (n * F.col(sxy).cast("double") - dx * dy)
                / F.sqrt(
                    (n * F.col(sxx).cast("double") - dx * dx)
                    * (n * F.col(syy).cast("double") - dy * dy)
                )
            )
            * F.lit(1e6)
        ).cast("long")

    rows = [
        ("qty_price", corr("sq", "se", "sqe", "sqq", "see")),
        ("qty_discount", corr("sq", "sd", "sqd", "sqq", "sdd")),
        ("price_discount", corr("se", "sd", "sed", "see", "sdd")),
    ]
    # Explode the 1-row aggregate into 3 pair rows (a union of three
    # selects would re-run the aggregate — and re-scan the fact table —
    # once per pair; plan-pinned single-scan in tests/test_plans5.py).
    return m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(name).alias("pair"),
                        F.col("n").alias("n"),
                        c.alias("corr_micro"),
                    )
                    for name, c in rows
                ]
            )
        ).alias("s")
    ).select("s.pair", "s.n", "s.corr_micro")


@register(
    "a_histogram_2d",
    oracle="""
    SELECT (CAST(l_quantity AS BIGINT) - 1) // 5 AS qty_bin,
           CAST(ROUND(l_discount * 100) AS BIGINT) // 2 AS disc_bin,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY 1, 2
    """,
)
def a_histogram_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D equi-width histogram (quantity × discount) — the joint-
    distribution profile behind correlation heat-maps. Pure integer
    floor-division binning, one map-side-combined aggregate over a
    bounded (10×6) grid; at 100 TB the grid size is what bounds the
    shuffle, not the row count."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(
            F.expr("(CAST(l_quantity AS BIGINT) - 1) div 5").alias("qty_bin"),
            F.expr(
                "CAST(ROUND(l_discount * 100) AS BIGINT) div 2"
            ).alias("disc_bin"),
        )
        .groupBy("qty_bin", "disc_bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "a_pareto_share",
    oracle=f"""
    WITH rev AS (
      SELECT o_custkey, SUM({_CENTS}) AS rev_cents
      FROM orders GROUP BY o_custkey
    ), t AS (SELECT SUM(rev_cents) AS total_cents FROM rev),
    c AS (
      SELECT rev_cents,
             SUM(rev_cents) OVER (ORDER BY rev_cents DESC, o_custkey
                                  ROWS UNBOUNDED PRECEDING) AS cum_cents
      FROM rev
    )
    SELECT COUNT(*) AS total_customers,
           CAST(MIN(total_cents) AS BIGINT) AS total_cents,
           COUNT(*) FILTER (
             WHERE 10 * (cum_cents - rev_cents) < 8 * total_cents)
             AS n_customers_to_80pct,
           CAST(ROUND(MAX(rev_cents) * 1e6
                      / CAST(MIN(total_cents) AS DOUBLE)) AS BIGINT)
             AS top_share_micro
    FROM c CROSS JOIN t
    """,
)
def a_pareto_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration (Pareto) report: how many customers produce
    80% of revenue, plus the single largest customer's share. Integer
    cross-multiplication (10·prefix < 8·total) instead of a float
    cumulative ratio. Scale shape (round-6): the descending cumulative
    sum over the customer rollup runs through the two-phase prefix-sum
    kernel (operators/windows.bucketed_running_sum, descending with a
    custkey tiebreak) — revenue-bucketed local prefixes + tiny offsets
    broadcast back, never a single-partition window over the rollup
    (plan-pinned in tests/test_plans6.py); output is one row."""
    from g_data_pipeline_spark.operators.windows import bucketed_running_sum

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .alias("rev_cents")
    )
    t = rev.agg(F.sum("rev_cents").alias("total_cents"))
    c = bucketed_running_sum(
        rev,
        "rev_cents",
        "rev_cents",
        "cum_cents",
        bucket_width=1 << 17,
        ascending=False,
        tiebreak_cols=("o_custkey",),
    ).select("rev_cents", "cum_cents")
    return c.crossJoin(F.broadcast(t)).agg(
        F.count(F.lit(1)).alias("total_customers"),
        F.min("total_cents").cast("long").alias("total_cents"),
        F.count_if(
            (F.col("cum_cents") - F.col("rev_cents")) * 10
            < F.col("total_cents") * 8
        ).alias("n_customers_to_80pct"),
        F.round(
            F.max("rev_cents") * F.lit(1e6)
            / F.min("total_cents").cast("double")
        )
        .cast("long")
        .alias("top_share_micro"),
    )


@register(
    "a_rollup_time",
    oracle=f"""
    SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
           CAST(quarter(CAST(o_orderdate AS DATE)) AS BIGINT) AS qtr,
           COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice')} AS revenue
    FROM orders
    GROUP BY ROLLUP (yr, qtr)
    ORDER BY yr NULLS FIRST, qtr NULLS FIRST
    """,
)
def a_rollup_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-hierarchy rollup (year → quarter → grand total) over order
    revenue — the OLAP drill path g_rollup does for flag/status, applied
    to the calendar. One ROLLUP aggregate (Spark expands grouping sets in
    a single Expand+HashAggregate, still one exchange); revenue via the
    deterministic scaled-long sum."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return (
        orders.select(
            F.year(d).cast("long").alias("yr"),
            F.quarter(d).cast("long").alias("qtr"),
            "o_totalprice",
        )
        .rollup("yr", "qtr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


@register(
    "w_running_max_drawdown",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           {_CENTS} AS cents,
           CAST(MAX({_CENTS}) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS running_max_cents,
           CAST(MAX({_CENTS}) OVER (PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS UNBOUNDED PRECEDING) - {_CENTS} AS BIGINT)
             AS drawdown_cents
    FROM orders WHERE o_custkey < 200
    """,
)
def w_running_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running maximum + drawdown per customer order history (the
    monitoring primitive behind 'how far below their peak is this
    account'). ONE customer-keyed window, total order (date, orderkey),
    all integer cents."""
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey") < 200
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_max = F.max(cents).over(w)
    return orders.select(
        "o_orderkey",
        "o_custkey",
        cents.alias("cents"),
        run_max.cast("long").alias("running_max_cents"),
        (run_max - cents).cast("long").alias("drawdown_cents"),
    )


@register(
    "j_star_join_chain",
    oracle=f"""
    SELECT r.r_name, p.p_brand,
           COUNT(*) AS n_lines,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', scale=4)}
             AS revenue
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY r.r_name, p.p_brand
    """,
)
def j_star_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Five-dimension star join (orders→customer→nation→region +
    part) rolling revenue up to (region, brand) — the snowflake
    shape every BI layer emits. Join policy mirrors how the tables scale:
    nation/region are CONSTANT-size → explicit broadcast; orders/
    customer/part grow with the corpus → no hint, Catalyst/AQE picks
    broadcast at small SF and a keyed shuffle at 100 TB (the fact-fact
    lineitem⋈orders edge shuffles on orderkey — the one unavoidable
    exchange — and the rollup reuses it). Revenue uses the scale-4
    deterministic sum (price×(1−disc) has 4 exact decimal digits)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    joined = (
        li.join(
            orders.select("o_orderkey", "o_custkey"),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(
            cust.select("c_custkey", "c_nationkey"),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(
            F.broadcast(nation.select("n_nationkey", "n_regionkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .join(
            F.broadcast(region.select("r_regionkey", "r_name")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .join(
            part.select("p_partkey", "p_brand"),
            li.l_partkey == F.col("p_partkey"),
        )
    )
    return joined.groupBy("r_name", "p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        dsum(
            F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
            scale=4,
        ).alias("revenue"),
    )
