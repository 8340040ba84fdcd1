"""Round-5 third analytics wave (registered post-window; ROTATION.md queues
them for in-window r6 grading): Gini concentration, weighted median, Shannon
entropy of category mix, Herfindahl-Hirschman supplier concentration, lag-1
autocorrelation of the daily series, and market-basket brand lift.

Determinism: money flows as exact cents (ROUND(x*100) bigint), every moment
sum is an exact integer (bigint, or decimal(38,0)/HUGEINT where squares can
exceed int64), and each query performs its double arithmetic in ONE
identically-ordered expression ending in ONE micro-rounding — the
functions/deterministic.py contract. log2/sqrt are correctly-rounded IEEE
primitives on both engines; the micro-rounded outputs sit far from .5e-6
boundaries (house policy, queries.py module docstring).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.percentiles import (
    grouped_weighted_lower_median,
)
from g_data_pipeline_spark.operators.windows import bucketed_row_index
from g_data_pipeline_spark.queries import register

_OCENTS = "CAST(ROUND(o_totalprice * 100) AS BIGINT)"
_REV_CENTS = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"


@register(
    "a_gini_coefficient",
    oracle=f"""
    WITH spend AS (
      SELECT o_custkey, SUM({_OCENTS}) AS cents
      FROM orders GROUP BY o_custkey
    ), x AS (
      SELECT c_mktsegment AS seg, cents, o_custkey
      FROM spend JOIN customer ON o_custkey = c_custkey
    ), r AS (
      SELECT seg, cents,
             CAST(ROW_NUMBER() OVER (PARTITION BY seg
                                     ORDER BY cents, o_custkey) AS BIGINT) AS i
      FROM x
    )
    SELECT seg AS c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(cents) AS BIGINT) AS total_cents,
           CAST(ROUND(1e6 *
             CAST(2 * SUM(i * cents) - (COUNT(*) + 1) * SUM(cents) AS DOUBLE)
             / CAST(COUNT(*) * SUM(cents) AS DOUBLE)) AS BIGINT) AS gini_micro
    FROM r GROUP BY seg
    """,
)
def a_gini_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer lifetime spend per market segment — the
    standard revenue-inequality screen (complements a_pareto_share's
    top-share cut with the full-distribution statistic). Rank formula
    G = (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) over cents sorted
    ascending with a custkey tiebreak, so both engines rank identically;
    numerator and denominator are exact bigints (max ~5e16 at sf0.1, well
    inside int64 — a 100 TB run promotes the two sums to decimal(38,0)),
    then ONE double division + ONE micro-rounding. Shape: the customer
    rollup (|customers| rows) is what gets ranked, through the two-phase
    bucketed row-index kernel — no per-segment global sort anywhere."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long")).alias("cents")
    )
    x = spend.join(
        customer, spend.o_custkey == customer.c_custkey
    ).select(F.col("c_mktsegment").alias("seg"), "cents", "o_custkey")
    # Two-phase row index (round-6): the old seg-partitioned row_number
    # capped parallelism at the 5 market segments; the kernel buckets by
    # spend cents so the per-task sort is a bucket, not a fifth of the
    # rollup (plan-pinned in tests/test_plans6.py).
    r = bucketed_row_index(
        x,
        [("cents", True), ("o_custkey", True)],
        [(F.floor(F.col("cents") / F.lit(1 << 17)), True)],
        partition_cols=("seg",),
        rn_col="i",
    )
    n = F.count(F.lit(1))
    s0 = F.sum("cents")
    s1 = F.sum(F.col("i") * F.col("cents"))
    return r.groupBy("seg").agg(
        n.alias("n_customers"),
        s0.cast("long").alias("total_cents"),
        F.round(
            F.lit(1e6)
            * (F.lit(2) * s1 - (n + F.lit(1)) * s0).cast("double")
            / (n * s0).cast("double")
        )
        .cast("long")
        .alias("gini_micro"),
    ).withColumnRenamed("seg", "c_mktsegment")


@register(
    "a_weighted_median",
    oracle=r"""
    WITH x AS (
      SELECT l_returnflag AS flag,
             CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS v,
             CAST(ROUND(l_quantity * 100) AS BIGINT) AS w,
             l_orderkey, l_linenumber
      FROM lineitem
    ), c AS (
      SELECT flag, v, w,
             SUM(w) OVER (PARTITION BY flag
                          ORDER BY v, l_orderkey, l_linenumber
                          ROWS UNBOUNDED PRECEDING) AS cw,
             SUM(w) OVER (PARTITION BY flag) AS tw
      FROM x
    )
    SELECT flag AS l_returnflag,
           CAST(MIN(tw) AS BIGINT) AS total_weight,
           CAST(MIN(v) AS BIGINT) AS wmedian_cents
    FROM c WHERE 2 * cw >= tw GROUP BY flag
    """,
)
def a_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-weighted median of extended price per return flag — the
    lower weighted median: the smallest price whose cumulative weight
    reaches half the total (2*cumw >= totw, all exact integer centi-unit
    weights, so no float ever crosses the comparison).

    Scale shape (round-6): the grouped weighted-selection kernel
    (operators/percentiles.grouped_weighted_lower_median) — reduce per
    (flag, price), bucket prices, per-flag cumulative offsets over the
    tiny bucket totals broadcast back, per-(flag, bucket) local windows.
    NO fact-sized sort under the 3-value flag key anywhere (the previous
    shape capped parallelism at 3 whatever the cluster size; plan-pinned
    in tests/test_plans6.py). The oracle keeps its per-row cumulative
    formulation: the smallest value whose row passes 2*cw >= tw is
    identical whether cw is accumulated per row or per distinct value,
    because within one value the largest row-cumulative equals the
    distinct-value cumulative. Bucket width 2^17 cents keeps the offset
    tables at ~100 rows per flag for TPC-H's price span."""
    li = load_table(spark, sf_dir, "lineitem")
    x = li.select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100).cast("long").alias("v"),
        F.round(F.col("l_quantity") * 100).cast("long").alias("w"),
    )
    med = grouped_weighted_lower_median(
        x, ["flag"], "v", "w", bucket_width=1 << 17
    )
    return med.select(
        F.col("flag").alias("l_returnflag"),
        F.col("total_weight").cast("long").alias("total_weight"),
        F.col("wmedian").cast("long").alias("wmedian_cents"),
    )


@register(
    "a_entropy_mix",
    oracle=r"""
    WITH cnt AS (
      SELECT c_mktsegment AS seg, o_orderpriority AS pri,
             COUNT(*) AS n
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1, 2
    ), terms AS (
      SELECT seg, n,
             CAST(ROUND(1e6 * n * LOG2(n)) AS BIGINT) AS term_micro
      FROM cnt
    )
    SELECT seg AS c_mktsegment,
           CAST(SUM(n) AS BIGINT) AS n_orders,
           COUNT(*) AS n_priorities,
           CAST(ROUND(1e6 * LOG2(SUM(n))
                      - CAST(SUM(term_micro) AS DOUBLE) / SUM(n))
                AS BIGINT) AS entropy_micro
    FROM terms GROUP BY seg
    """,
)
def a_entropy_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy (bits) of the order-priority mix per customer
    segment — the category-balance statistic behind mixture monitoring
    (uniform mix of 5 priorities -> log2(5) ~ 2.32 bits; a collapsed mix
    -> 0). Identity H = log2(N) - sum(n_i*log2(n_i))/N keeps every sum an
    exact integer: each term n*log2(n) is micro-rounded INDIVIDUALLY to a
    bigint (identical per-term value on both engines — log2 of the same
    integer), the term sum is exact, and the final expression does one
    division + one rounding, so double-summation order can never drift.
    Shape: two cascaded hash aggregates on (seg, pri) then seg — partial
    aggregation collapses the fact rows before the single exchange."""
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    cnt = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("seg"),
            F.col("o_orderpriority").alias("pri"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    terms = cnt.select(
        "seg",
        "n",
        F.round(F.lit(1e6) * F.col("n") * F.log2("n")).cast("long").alias(
            "term_micro"
        ),
    )
    return terms.groupBy("seg").agg(
        F.sum("n").cast("long").alias("n_orders"),
        F.count(F.lit(1)).alias("n_priorities"),
        F.round(
            F.lit(1e6) * F.log2(F.sum("n"))
            - F.sum("term_micro").cast("double") / F.sum("n")
        )
        .cast("long")
        .alias("entropy_micro"),
    ).withColumnRenamed("seg", "c_mktsegment")


@register(
    "a_hhi_concentration",
    oracle=f"""
    WITH rv AS (
      SELECT n_name, s_suppkey, SUM({_REV_CENTS}) AS rev
      FROM lineitem
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      GROUP BY 1, 2
    )
    SELECT n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(rev) AS BIGINT) AS total_rev_cents,
           CAST(ROUND(1e10 *
             CAST(SUM(CAST(rev AS HUGEINT) * rev) AS DOUBLE)
             / (CAST(SUM(rev) AS DOUBLE) * CAST(SUM(rev) AS DOUBLE)))
             AS BIGINT) AS hhi_micro
    FROM rv GROUP BY n_name
    """,
)
def a_hhi_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman index of supplier revenue concentration per
    nation — the antitrust-style market-concentration screen on the
    0..10000 point scale (micro-scaled: a monopoly scores 1e10). Per
    (nation, supplier) revenue is an exact bigint of cents; the sum of
    SQUARED revenues exceeds int64 at scale, so it accumulates as
    decimal(38,0) on Spark and HUGEINT on DuckDB (the CLAUDE.md overflow
    rule), then ONE double expression + ONE rounding. Shape: the fact scan
    aggregates once on (nation, supplier) — supplier/nation dims broadcast
    — and the HHI reduces the supplier rollup, never the facts."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    rev = F.round(
        F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")) * 100
    ).cast("long")
    rv = (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .groupBy("n_name", "s_suppkey")
        .agg(F.sum(rev).alias("rev"))
    )
    s1 = F.sum("rev")
    s2 = F.sum(
        F.col("rev").cast("decimal(19,0)") * F.col("rev").cast("decimal(19,0)")
    )
    return rv.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        s1.cast("long").alias("total_rev_cents"),
        F.round(
            F.lit(1e10)
            * s2.cast("double")
            / (s1.cast("double") * s1.cast("double"))
        )
        .cast("long")
        .alias("hhi_micro"),
    )


@register(
    "a_autocorr_lag1",
    oracle=r"""
    WITH daily AS (
      SELECT o_orderpriority AS pri,
             CAST(date_trunc('day', o_orderdate) AS DATE) AS d,
             COUNT(*) AS n
      FROM orders GROUP BY 1, 2
    ), pairs AS (
      SELECT pri, n AS y,
             LAG(n) OVER (PARTITION BY pri ORDER BY d) AS x
      FROM daily
    ), m AS (
      SELECT pri, COUNT(*) AS m,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x * y) AS sxy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy
      FROM pairs WHERE x IS NOT NULL GROUP BY pri
    )
    SELECT pri AS o_orderpriority,
           CAST(m AS BIGINT) AS n_pairs,
           CASE WHEN m * sxx - sx * sx > 0 AND m * syy - sy * sy > 0 THEN
             CAST(ROUND(1e6 * CAST(m * sxy - sx * sy AS DOUBLE)
               / SQRT(CAST((m * sxx - sx * sx) * (m * syy - sy * sy)
                           AS DOUBLE))) AS BIGINT)
           ELSE NULL END AS r1_micro
    FROM m
    """,
)
def a_autocorr_lag1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the daily order-count series per priority —
    the persistence statistic behind seasonality/trend screens (r1 ~ 0 for
    a memoryless arrival process, -> 1 for trending volume). Gap days are
    absent rows, so the series is the OBSERVED daily sequence (documented
    semantic; a_gap_fill provides the dense-grid alternative). Pearson r
    over (lag, current) pairs from six exact integer moment sums; the
    degenerate constant-series denominator is guarded on both engines (the
    e_zscore_anomaly lesson), and the two sum-of-squares factors multiply
    INSIDE one sqrt so there is a single irrational intermediate. Shape:
    daily rollup -> per-priority lag window over ~|days| rows -> one
    5-row aggregate; the facts shuffle once into the daily rollup."""
    orders = load_table(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderpriority").alias("pri"),
        F.date_trunc("day", F.col("o_orderdate")).cast("date").alias("d"),
    ).agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("pri").orderBy("d")
    pairs = daily.select(
        "pri", F.col("n").alias("y"), F.lag("n").over(w).alias("x")
    ).filter(F.col("x").isNotNull())
    m = pairs.groupBy("pri").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    dx = F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")
    dy = F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")
    num = F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")
    return m.select(
        F.col("pri").alias("o_orderpriority"),
        F.col("m").cast("long").alias("n_pairs"),
        F.when(
            (dx > 0) & (dy > 0),
            F.round(
                F.lit(1e6) * num.cast("double") / F.sqrt((dx * dy).cast("double"))
            ).cast("long"),
        ).alias("r1_micro"),
    )


@register(
    "a_basket_lift",
    oracle=r"""
    WITH ob AS (
      SELECT DISTINCT l_orderkey AS ok, p_brand AS b
      FROM lineitem JOIN part ON l_partkey = p_partkey
    ), nb AS (
      SELECT b, COUNT(*) AS n FROM ob GROUP BY b
    ), tot AS (
      SELECT COUNT(DISTINCT ok) AS n_orders FROM ob
    ), pairs AS (
      SELECT a.b AS brand_a, c.b AS brand_b, COUNT(*) AS n_ab
      FROM ob a JOIN ob c ON a.ok = c.ok AND a.b < c.b
      GROUP BY 1, 2
    )
    SELECT brand_a, brand_b, CAST(n_ab AS BIGINT) AS n_ab,
           CAST(ROUND(1e6 * CAST(n_ab * tot.n_orders AS DOUBLE)
                / CAST(na.n * nc.n AS DOUBLE)) AS BIGINT) AS lift_micro
    FROM pairs
    JOIN nb na ON na.b = brand_a
    JOIN nb nc ON nc.b = brand_b
    CROSS JOIN tot
    WHERE n_ab >= 5
    ORDER BY n_ab DESC, brand_a, brand_b LIMIT 20
    """,
)
def a_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket brand-association lift over orders (the retail twin of
    e_item_cooccurrence's event-session version): lift(a,b) =
    P(a,b)/(P(a)P(b)) from exact order counts, top-20 pairs by support
    with a full lexical tiebreak so LIMIT selects the same set on both
    engines. Shape: the pair generation SELF-JOINS the distinct
    (order, brand) directory ON the order key — pairs per order are
    C(brands_in_order, 2), so candidate volume is bounded per order and
    there is no cartesian anywhere; the brand marginals (~25 rows) and the
    1-row total broadcast back onto the pair rollup (the CLAUDE.md
    broadcast-1-row-totals rule)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    ob = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .select(F.col("l_orderkey").alias("ok"), F.col("p_brand").alias("b"))
        .distinct()
    )
    nb = ob.groupBy("b").agg(F.count(F.lit(1)).alias("n"))
    tot = ob.agg(F.countDistinct("ok").alias("n_orders"))
    a = ob.alias("a")
    c = ob.alias("c")
    pairs = (
        a.join(c, (F.col("a.ok") == F.col("c.ok")) & (F.col("a.b") < F.col("c.b")))
        .groupBy(F.col("a.b").alias("brand_a"), F.col("c.b").alias("brand_b"))
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= 5)
    )
    na = nb.select(F.col("b").alias("ba"), F.col("n").alias("na"))
    nc = nb.select(F.col("b").alias("bc"), F.col("n").alias("nc"))
    return (
        pairs.join(F.broadcast(na), F.col("brand_a") == F.col("ba"))
        .join(F.broadcast(nc), F.col("brand_b") == F.col("bc"))
        .crossJoin(F.broadcast(tot))
        .select(
            "brand_a",
            "brand_b",
            F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.lit(1e6)
                * (F.col("n_ab") * F.col("n_orders")).cast("double")
                / (F.col("na") * F.col("nc")).cast("double")
            )
            .cast("long")
            .alias("lift_micro"),
        )
        .orderBy(F.desc("n_ab"), "brand_a", "brand_b")
        .limit(20)
    )
