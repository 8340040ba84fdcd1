"""Relational analytics beyond the reference's surface: joins (broadcast +
shuffle, semi/anti/outer), window functions, set operations, grouping sets,
pivot, and the scalar function library — all absent from the reference
(SURVEY.md §2.2 "Not implemented"), all oracle-gated.

Scale notes are attached per query; the common themes:
- dimension tables (region/nation, and customer at bench scale) join via
  explicit ``F.broadcast`` — no shuffle of the fact table;
- fact-fact joins shuffle once on the join key and rely on AQE for skew;
- window functions shuffle once on their partition keys (WindowGroupLimit
  prunes rank<=k partitions before the shuffle);
- running sums go through decimal accumulators inside the window frame so
  the result is identical regardless of the engine's internal frame
  evaluation strategy (sliding accumulation vs segment tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.operators.topk import top_k_per_group
from g_data_pipeline_spark.queries import register


# --------------------------------------------------------------------------
# Joins
# --------------------------------------------------------------------------

@register(
    "j_q3_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue,
           o_orderdate, o_orderpriority
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def j_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> two joins -> grouped sum ->
    deterministic top-10. Customer (filtered) broadcasts; lineitem never
    shuffles for the join, only for the final group-by."""
    cutoff = F.lit("1998-03-15 00:00:00").cast("timestamp")
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(F.broadcast(orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)),
                li.l_orderkey == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), "o_orderdate", "l_orderkey")
        .limit(10)
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "j_q5_local_supplier_volume",
    oracle=f"""
    SELECT n_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
    JOIN nation ON s_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def j_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-table join. region/nation/supplier/customer all
    broadcast (dims); the only fact shuffle is lineitem->orders on orderkey
    and the final 25-group aggregation."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    supplier = load_table(spark, sf_dir, "supplier")
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nations_in_region = nation.join(
        F.broadcast(region), nation.n_regionkey == region.r_regionkey
    ).select("n_nationkey", "n_name")
    supp = supplier.join(
        F.broadcast(nations_in_region),
        supplier.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "s_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey)
            & (customer.c_nationkey == supp.s_nationkey),
        )
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
    )


@register(
    "j_semi_join_exists",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey AND l_quantity >= 49)
    """,
)
def j_semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join == EXISTS; no row multiplication, build side only
    carries the join key after pushdown."""
    orders = load_table(spark, sf_dir, "orders")
    big = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return orders.join(
        big, orders.o_orderkey == big.l_orderkey, "left_semi"
    ).select("o_orderkey", "o_totalprice")


@register(
    "j_anti_join_not_exists",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    """,
)
def j_anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join == NOT EXISTS (customers who never ordered)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return customer.join(
        orders, customer.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "j_left_outer_count",
    oracle="""
    SELECT c_custkey, COUNT(o_orderkey) AS n_orders
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
)
def j_left_outer_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving zero-order customers (COUNT of NULL=0)."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        customer.join(orders, customer.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@register(
    "w_running_total",
    oracle="""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS running_total
    FROM orders
    """,
)
def w_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running order total. The frame sum goes through a
    decimal accumulator: exact, so Spark's sliding-frame evaluation and
    DuckDB's segment tree produce identical doubles."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("running_total"),
    )


@register(
    "w_topk_per_group",
    oracle="""
    SELECT o_orderpriority, o_orderkey, o_totalprice, rank FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY o_totalprice DESC, o_orderkey) AS rank
      FROM orders)
    WHERE rank <= 3
    """,
)
def w_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by value per priority class via operators.topk (the
    WindowGroupLimit-optimized row_number pattern)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders,
        group_by=["o_orderpriority"],
        order_by=[F.col("o_totalprice").desc(), F.col("o_orderkey")],
        k=3,
    ).select(
        "o_orderpriority",
        "o_orderkey",
        "o_totalprice",
        F.col("rank").cast("long").alias("rank"),
    )


@register(
    "w_lag_delta",
    oracle="""
    SELECT user_id, event_id,
           value - LAG(value) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS delta
    FROM events
    """,
)
def w_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive event value delta (LAG); one double subtraction,
    deterministic."""
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "user_id",
        "event_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )


@register(
    "w_ntile_rank_dense",
    oracle="""
    WITH nat AS (
      SELECT r.r_name, n.n_name,
             COUNT(*) AS n_customers,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) * 100 AS BIGINT)
               AS bal_cents
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
      GROUP BY r.r_name, n.n_name
    )
    SELECT r_name, n_name,
           CAST(n_customers AS BIGINT) AS n_customers,
           bal_cents,
           CAST(NTILE(4) OVER (PARTITION BY r_name
                               ORDER BY bal_cents DESC, n_name) AS BIGINT)
             AS quartile,
           CAST(RANK() OVER (PARTITION BY r_name
                             ORDER BY n_customers DESC) AS BIGINT)
             AS cust_rank,
           CAST(DENSE_RANK() OVER (PARTITION BY r_name
                                   ORDER BY n_customers DESC) AS BIGINT)
             AS cust_dense
    FROM nat
    """,
)
def w_ntile_rank_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile/rank/dense_rank SQL-surface parity on a BOUNDED rollup:
    within-region quartiles of per-nation balance and (tie-prone) rank /
    dense_rank of per-nation customer counts. Round-7 rework: the
    previous form ran a global window over the full customer dimension —
    the last gated entry whose window input grew with the data; now every
    window is PARTITIONED by region over the nations-per-region rollup
    (dimension-bounded, scale-free), so the registry-wide unpartitioned-
    window sweep needs no allowlist entry at all. The balance key is an
    exact decimal cents sum (order-deterministic); rank ties on customer
    counts are real, exercising rank-vs-dense_rank divergence."""
    customer = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    nat = (
        customer.join(
            F.broadcast(nation),
            customer.c_nationkey == nation.n_nationkey,
        )
        .join(
            F.broadcast(region), nation.n_regionkey == region.r_regionkey
        )
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            (
                F.sum(F.col("c_acctbal").cast("decimal(12,2)"))
                * F.lit(100)
            )
            .cast("long")
            .alias("bal_cents"),
        )
    )
    w_bal = Window.partitionBy("r_name").orderBy(
        F.col("bal_cents").desc(), "n_name"
    )
    w_cnt = Window.partitionBy("r_name").orderBy(
        F.col("n_customers").desc()
    )
    return nat.select(
        "r_name",
        "n_name",
        "n_customers",
        "bal_cents",
        F.ntile(4).over(w_bal).cast("long").alias("quartile"),
        F.rank().over(w_cnt).cast("long").alias("cust_rank"),
        F.dense_rank().over(w_cnt).cast("long").alias("cust_dense"),
    )


# --------------------------------------------------------------------------
# Set operations + distinct
# --------------------------------------------------------------------------

@register(
    "s_union_distinct",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    UNION
    SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
    """,
)
def s_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (distinct) of two key sets."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    b = (
        orders.filter(F.col("o_totalprice") > 400000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.union(b).distinct()


@register(
    "s_intersect",
    oracle="""
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    INTERSECT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
)
def s_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = (
        orders.filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return a.intersect(b)


@register(
    "s_except",
    oracle="""
    SELECT c_custkey FROM customer
    EXCEPT
    SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
)
def s_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    a = customer.select("c_custkey")
    b = (
        orders.filter(F.col("o_orderstatus") == "O")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    # subtract() is Spark's EXCEPT DISTINCT — removes a key entirely when it
    # appears on both sides, matching SQL EXCEPT for any multiplicity (unlike
    # exceptAll().distinct(), which keeps keys with left multiplicity > right).
    return a.subtract(b)


@register(
    "s_distinct_pairs",
    oracle="SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders",
)
def s_distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dropDuplicates == SELECT DISTINCT (exact dedup on all columns)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select("o_orderstatus", "o_orderpriority").dropDuplicates()


# --------------------------------------------------------------------------
# Grouping sets / rollup / cube / pivot
# --------------------------------------------------------------------------

@register(
    "g_rollup",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           COUNT(*) AS n, {sql_dsum('l_quantity')} AS sum_qty
    FROM lineitem
    GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def g_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total; NULL-filled keys)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), dsum("l_quantity").alias("sum_qty")
    )


@register(
    "g_cube",
    oracle=f"""
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n, {sql_dsum('o_totalprice')} AS sum_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def g_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all 2^k marginal combinations)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), dsum("o_totalprice").alias("sum_price")
    )


@register(
    "g_pivot",
    oracle=f"""
    SELECT l_returnflag,
           {sql_dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END")} AS O,
           {sql_dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END")} AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def g_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT on l_linestatus with explicit values (explicit value list keeps
    the plan single-pass; omitting it costs a distinct-values job)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(dsum("l_quantity"))
    )
