"""Second analytics wave: scan-efficiency and HAVING/subquery shapes, the
SQL API, and skew-safe aggregation — each oracle-matched."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.operators.skew import salted_agg
from g_data_pipeline_spark.queries import register


@register(
    "j_q6_forecast_revenue",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * l_discount')} AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def j_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: the pure scan-efficiency yardstick — every predicate
    must reach the parquet scan (verified: PushedFilters carries all four),
    zero joins, single agg."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@register(
    "j_q18_large_orders_having",
    oracle=f"""
    SELECT o_orderkey, o_totalprice, sum_qty FROM (
      SELECT l_orderkey AS o_orderkey_j, {sql_dsum('l_quantity')} AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING {sql_dsum('l_quantity')} > 250
    ) JOIN orders ON o_orderkey = o_orderkey_j
    """,
)
def j_q18_large_orders_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: grouped HAVING filter, then join back to the
    dimension — the aggregate-then-semi-join pattern."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)  # HAVING
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .select("o_orderkey", "o_totalprice", "sum_qty")
    )


@register(
    "sql_correlated_subquery",
    oracle="""
    SELECT c_custkey, c_acctbal FROM customer c
    WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) * 1.8 FROM customer c2
                       WHERE c2.c_nationkey = c.c_nationkey)
    """,
)
def sql_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery through the SQL API — Catalyst decorrelates
    it into an aggregate + join (same plan the DataFrame API would build).

    Determinism note: AVG over doubles is order-dependent in its last bits,
    but it only steers a > comparison against values ~1.8x away — a last-bit
    wobble cannot flip row membership here, so the output set matches even
    though the intermediate is not bit-pinned."""
    customer = load_table(spark, sf_dir, "customer")
    customer.createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT c_custkey, c_acctbal FROM customer_v c
        WHERE c_acctbal > (SELECT AVG(c2.c_acctbal) * 1.8 FROM customer_v c2
                           WHERE c2.c_nationkey = c.c_nationkey)
        """
    )


@register(
    "a_salted_agg",
    oracle=f"""
    SELECT l_returnflag, {sql_dsum('l_quantity')} AS sum_qty, COUNT(*) AS n
    FROM lineitem GROUP BY l_returnflag
    """,
)
def a_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-stage aggregation (operators.skew.salted_agg) on a
    3-value key — result must equal the plain groupBy exactly (the salt
    only changes the shuffle topology, never the algebra; the inner sums
    stay in exact scaled-long space so re-aggregation is lossless)."""
    li = load_table(spark, sf_dir, "lineitem")
    staged = salted_agg(
        li.withColumn(
            "__q", F.round(F.col("l_quantity") * F.lit(1e6)).cast("long")
        ),
        keys=["l_returnflag"],
        sums={"__sq": "__q"},
        count_alias="n",
        salt_buckets=8,
    )
    return staged.select(
        "l_returnflag",
        (F.col("__sq").cast("double") / F.lit(1e6)).alias("sum_qty"),
        "n",
    )
