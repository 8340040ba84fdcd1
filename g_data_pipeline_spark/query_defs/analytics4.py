"""Fourth analytics wave: the remaining TPC-H query shapes expressible on
the test schema (no partsupp table; no commit/receipt dates or ship modes —
each query notes its adaptation). Exercises correlated EXISTS with
non-equi conditions, conditional market-share ratios, left-join count
distributions, argmax-by-aggregate, correlated scalar-average subqueries,
sole-late-supplier semi/anti logic, and anti-join + scalar-subquery combos.

All float aggregates go through functions/deterministic.py (scaled-long
sums) so values hash-match the DuckDB oracle bit-for-bit; COUNTs are cast
to bigint on the Spark side to match DuckDB's BIGINT counts.

Scale notes (100 TB): every query here shuffles at most once per aggregate
on its natural key; dimension sides (nation, region, part filters,
aggregated supplier/part statistics) are broadcast; no crossJoin anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import (
    davg,
    dsum,
    sql_davg,
    sql_dsum,
)
from g_data_pipeline_spark.queries import register


@register(
    "j_q4_priority_late_ship",
    oracle="""
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def j_q4_priority_late_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (adapted: the schema has no commit/receipt dates, so
    "late" = shipped after the order date): correlated EXISTS with a
    non-equi condition -> LEFT SEMI join, then one grouped count. The date
    filter reaches the orders scan before the join."""
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    filtered = orders.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    late = filtered.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("bigint").alias("order_count")
    )


@register(
    "j_q8_market_share",
    oracle=f"""
    SELECT o_year,
           ({sql_dsum("CASE WHEN n2_name = 'NATION_3' THEN volume ELSE 0 END")})
             / ({sql_dsum("volume")}) AS mkt_share
    FROM (
      SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice * (1 - l_discount) AS volume,
             n2.n_name AS n2_name
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation n1 ON c_nationkey = n1.n_nationkey
      JOIN region   ON n1.n_regionkey = r_regionkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation n2 ON s_nationkey = n2.n_nationkey
      JOIN part     ON l_partkey = p_partkey
      WHERE r_name = 'ASIA' AND p_type = 'PROMO'
        AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY o_year
    """,
)
def j_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): 8-table star join where every
    dimension side (nation x2, region, part filter, customer->nation map) is
    broadcast, so the lineitem fact is touched by exactly one scan and one
    final shuffle on o_year. share = conditional-sum / sum, both through
    the deterministic scaled-long path."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    supplier = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part")

    cust_region = (
        customer.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            customer.c_nationkey == nation.n_nationkey,
        ).select("c_custkey")
    )
    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", F.col("n_name").alias("n2_name"))
    joined = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
            ),
            li.l_orderkey == orders.o_orderkey,
        )
        .join(F.broadcast(part.filter(F.col("p_type") == "PROMO")),
              li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust_region), orders.o_custkey == F.col("c_custkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").alias("o_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "n2_name",
        )
    )
    return joined.groupBy(F.col("o_year").cast("bigint").alias("o_year")).agg(
        (
            dsum(F.when(F.col("n2_name") == "NATION_3", F.col("volume")).otherwise(0.0))
            / dsum("volume")
        ).alias("mkt_share")
    )


@register(
    "j_q12_late_priority_lines",
    oracle="""
    SELECT l_linestatus,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_shipdate > o_orderdate
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_linestatus
    """,
)
def j_q12_late_priority_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (adapted: no ship modes, grouped by l_linestatus;
    "late" = shipped after order date): fact-fact equi-join with a non-equi
    residual, conditional integer counts (no float path at all)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_line_count"),
        )
    )


@register(
    "j_q13_customer_order_distribution",
    oracle="""
    SELECT c_count, COUNT(*) AS custdist FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
)
def j_q13_customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: left outer join preserving order-less customers,
    per-customer order count, then the distribution of those counts — the
    double-aggregation histogram pattern. COUNT(col) ignores the nulls the
    outer join injects, so zero-order customers land in bucket 0."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").cast("bigint").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).cast("bigint").alias("custdist")
    )


@register(
    "j_q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             {sql_dsum("l_extendedprice * (1 - l_discount)")} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def j_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: aggregate-then-argmax — the revenue "view" is built
    once, its max is a broadcast scalar, and the equality filter keeps every
    tied supplier (exact doubles from the deterministic sum, so the
    tie-equality is well-defined on both engines)."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "total_revenue"
            )
        )
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("mx"))
    return (
        revenue.join(F.broadcast(max_rev), revenue.total_revenue == max_rev.mx)
        .join(supplier, F.col("supplier_no") == supplier.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "j_q17_small_quantity_revenue",
    oracle=f"""
    SELECT {sql_dsum("l_extendedprice")} / 7.0 AS avg_yearly
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    JOIN (SELECT l_partkey AS pk, {sql_davg("l_quantity")} AS avg_qty
          FROM lineitem GROUP BY l_partkey) ON pk = l_partkey
    WHERE p_brand = 'Brand#3' AND l_quantity < 0.4 * avg_qty
    """,
)
def j_q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-average subquery, decorrelated the
    way Catalyst would — the per-part average is one grouped aggregate
    broadcast back onto the fact, so the fact scans once and never shuffles
    for the comparison. Deterministic davg keeps the 0.4*avg threshold
    bit-identical across engines."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    wanted = part.filter(F.col("p_brand") == "Brand#3")
    # Aggregate the per-part average ONLY for parts that survive the brand
    # filter (semi join first): identical results — the threshold is only
    # ever compared for those parts — but the aggregate and its broadcast
    # shrink by the filter's selectivity (~25x here). The broadcast hint is
    # right whenever the filtered key set fits an executor; beyond that,
    # drop the hint and AQE picks a shuffled join.
    per_part = (
        li.join(F.broadcast(wanted), li.l_partkey == part.p_partkey, "left_semi")
        .groupBy(F.col("l_partkey").alias("pk"))
        .agg(davg("l_quantity").alias("avg_qty"))
    )
    return (
        li.join(F.broadcast(wanted), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("pk"))
        .filter(F.col("l_quantity") < 0.4 * F.col("avg_qty"))
        .agg((dsum("l_extendedprice") / 7.0).alias("avg_yearly"))
    )


@register(
    "j_q21_sole_late_supplier",
    oracle="""
    SELECT s_name, COUNT(*) AS numwait FROM (
      SELECT l_orderkey AS okey,
             MIN(CASE WHEN l_shipdate > o_orderdate THEN l_suppkey END) AS lone_late,
             COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate
                                 THEN l_suppkey END) AS n_late,
             COUNT(DISTINCT l_suppkey) AS n_supp
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderstatus = 'F'
      GROUP BY l_orderkey
    )
    JOIN supplier ON s_suppkey = lone_late
    WHERE n_late = 1 AND n_supp > 1
    GROUP BY s_name
    """,
)
def j_q21_sole_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the reference
    formulation is EXISTS(another supplier) AND NOT EXISTS(another LATE
    supplier); here both are folded into ONE grouped pass per order —
    count distinct suppliers vs distinct late suppliers — which replaces two
    correlated joins with a single shuffle on l_orderkey. "late" = shipped
    after order date (schema has no commit/receipt dates); nation filter
    dropped (synthetic nations are uniform)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supplier = load_table(spark, sf_dir, "supplier")
    late_supp = F.when(
        F.col("l_shipdate") > F.col("o_orderdate"), F.col("l_suppkey")
    )
    per_order = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy(F.col("l_orderkey").alias("okey"))
        .agg(
            F.min(late_supp).alias("lone_late"),
            F.countDistinct(late_supp).cast("bigint").alias("n_late"),
            F.countDistinct("l_suppkey").cast("bigint").alias("n_supp"),
        )
        .filter((F.col("n_late") == 1) & (F.col("n_supp") > 1))
    )
    return (
        per_order.join(F.broadcast(supplier), per_order.lone_late == supplier.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
    )


@register(
    "j_q22_dormant_rich_customers",
    oracle=f"""
    SELECT n_name AS cntry, COUNT(*) AS numcust,
           {sql_dsum("c_acctbal")} AS totacctbal
    FROM customer
    JOIN nation ON c_nationkey = n_nationkey
    WHERE c_acctbal > (SELECT {sql_davg("c_acctbal")} FROM customer
                       WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                      AND o_orderdate >= TIMESTAMP '1999-01-01 00:00:00')
      AND n_name IN ('NATION_1', 'NATION_2', 'NATION_3',
                     'NATION_4', 'NATION_5', 'NATION_6', 'NATION_7')
    GROUP BY n_name
    """,
)
def j_q22_dormant_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (adapted: country code -> nation name, no phone
    column; "dormant" = no order since 1999 — every synthetic customer has
    SOME order, so the unfiltered anti join would be empty): scalar
    subquery (deterministic avg of positive balances, broadcast) + anti
    join against filtered orders + IN-list dimension filter, one final
    grouped aggregate."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    nation = load_table(spark, sf_dir, "nation")
    nations = [f"NATION_{i}" for i in range(1, 8)]
    avg_bal = customer.filter(F.col("c_acctbal") > 0.0).agg(
        davg("c_acctbal").alias("ab")
    )
    return (
        customer.join(F.broadcast(avg_bal), customer.c_acctbal > F.col("ab"))
        .join(
            orders.filter(
                F.col("o_orderdate") >= F.lit("1999-01-01").cast("timestamp")
            ),
            customer.c_custkey == orders.o_custkey,
            "left_anti",
        )
        .join(
            F.broadcast(nation.filter(F.col("n_name").isin(nations))),
            customer.c_nationkey == nation.n_nationkey,
        )
        .groupBy(F.col("n_name").alias("cntry"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("numcust"),
            dsum("c_acctbal").alias("totacctbal"),
        )
    )


@register(
    "s_except_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def s_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics: each right occurrence cancels ONE left
    occurrence) — the multiplicity-aware sibling of s_except; exercised on
    sides with real duplicate keys so the bag arithmetic matters."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.exceptAll(b)


@register(
    "s_intersect_all",
    oracle="""
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    """,
)
def s_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics: min of the two multiplicities per
    key)."""
    orders = load_table(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    b = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return a.intersectAll(b)


@register(
    "g_grouping_sets",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(GROUPING(o_orderstatus) AS BIGINT) * 2
             + CAST(GROUPING(o_orderpriority) AS BIGINT) AS gid
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                            (o_orderstatus), (o_orderpriority))
    """,
)
def g_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (an asymmetric set list neither ROLLUP nor
    CUBE can express) + GROUPING() markers to tell a real NULL key from a
    subtotal row — via the SQL API (grouping sets have no DataFrame-side
    builder)."""
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_v")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(GROUPING(o_orderstatus) AS BIGINT) * 2
                 + CAST(GROUPING(o_orderpriority) AS BIGINT) AS gid
        FROM orders_v
        GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority),
                                (o_orderstatus), (o_orderpriority))
        """
    )


@register(
    "w_percent_rank_cume_dist",
    oracle="""
    SELECT c_custkey,
           PERCENT_RANK() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
             AS pr,
           CUME_DIST() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal)
             AS cd
    FROM customer
    """,
)
def w_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-rank window functions (percent_rank, cume_dist) — both are
    rank-count ratios, so the doubles are single divisions of identical
    integers on any engine: deterministic without scaled-long machinery."""
    from pyspark.sql import Window

    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal")
    return customer.select(
        "c_custkey",
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
    )
