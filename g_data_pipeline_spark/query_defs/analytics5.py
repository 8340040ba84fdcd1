"""Fifth analytics wave: the five TPC-H queries whose canonical forms need
the partsupp table (Q2, Q9, Q11, Q16, Q20), adapted to this schema by using
lineitem as the observed part<->supplier relation (each docstring notes the
exact substitution). This completes the full 22-query TPC-H shape coverage:
Q1,Q3-Q8,Q10,Q12-Q15,Q17-Q19,Q21,Q22 live in analytics*.py / the flagship.

Shapes exercised here that no earlier wave covers: correlated-MIN equality
selection (Q2), HAVING against a global-scalar subquery (Q11), NOT IN
exclusion subquery + multi-attribute COUNT DISTINCT (Q16), and a correlated
threshold subquery feeding a semi-join chain (Q20).

All float aggregates go through functions/deterministic.py (scaled-long
sums); per-row double arithmetic (divisions, products) is written with
identical association order in the Spark and DuckDB forms so IEEE results
are bit-identical. COUNTs cast to bigint on the Spark side.

Scale notes (100 TB): every derived part/supplier statistic is one grouped
aggregate on its natural key (map-side partials, one shuffle) and is
broadcast only when it is a filtered/aggregated small side; the lineitem
fact is scanned once per query and never re-shuffled for dimension joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.queries import register


@register(
    "j_q2_min_cost_supplier",
    oracle="""
    WITH asian AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier
      JOIN nation ON s_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
    ), costs AS (
      SELECT l_partkey, l_suppkey,
             MIN(l_extendedprice / l_quantity) AS unit_cost
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      JOIN asian ON s_suppkey = l_suppkey
      WHERE p_size = 15
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name,
           l_partkey AS p_partkey, unit_cost
    FROM costs c
    JOIN asian ON s_suppkey = l_suppkey
    WHERE unit_cost = (SELECT MIN(unit_cost) FROM costs c2
                       WHERE c2.l_partkey = c.l_partkey)
    """,
)
def j_q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (adapted: no partsupp, so the offered "supply cost"
    is the minimum observed unit price l_extendedprice/l_quantity per
    (part, supplier) from lineitem; no mfgr/address/phone columns): find
    the Asian suppliers offering the region-wide minimum cost for each
    size-15 part. The correlated MIN subquery is decorrelated Catalyst-style
    into a grouped MIN broadcast back onto the per-supplier costs; ties keep
    every minimal supplier. MIN over identical IEEE divisions is
    order-independent, so the double equality is engine-safe.

    Reference parity: translator join/filter surface
    (/root/reference/src/services/query_translator.rs:214-392) — this wave
    extends the same compile-to-DataFrame path to the full TPC-H shapes.
    """
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")

    asian = (
        supplier.join(
            F.broadcast(
                nation.join(
                    F.broadcast(region.filter(F.col("r_name") == "ASIA")),
                    nation.n_regionkey == region.r_regionkey,
                )
            ),
            supplier.s_nationkey == nation.n_nationkey,
        )
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    costs = (
        li.join(
            F.broadcast(part.filter(F.col("p_size") == 15)),
            li.l_partkey == part.p_partkey,
            "left_semi",
        )
        .join(F.broadcast(asian.select("s_suppkey")),
              li.l_suppkey == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(
            F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
        )
    )
    min_per_part = costs.groupBy(F.col("l_partkey").alias("mpk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        costs.join(
            F.broadcast(min_per_part),
            (costs.l_partkey == F.col("mpk"))
            & (costs.unit_cost == F.col("min_cost")),
        )
        .join(F.broadcast(asian), costs.l_suppkey == asian.s_suppkey)
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            F.col("l_partkey").alias("p_partkey"),
            "unit_cost",
        )
    )


@register(
    "j_q9_product_type_profit",
    oracle=f"""
    SELECT n_name AS nation, o_year,
           {sql_dsum(
               "l_extendedprice * (1 - l_discount)"
               " - 0.1 * p_retailprice * l_quantity"
           )} AS sum_profit
    FROM (
      SELECT n_name,
             CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
             l_extendedprice, l_discount, p_retailprice, l_quantity
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN part     ON p_partkey = l_partkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%bolt%'
    ) GROUP BY n_name, o_year
    """,
)
def j_q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (adapted: supply cost proxied as 10% of p_retailprice
    per unit since there is no partsupp; part filter '%bolt%' mirrors
    '%green%'): profit per supplier-nation per order-year. Part filter and
    supplier->nation map are broadcast; lineitem x orders is the one
    fact-fact edge (key-partitioned join at scale; AQE broadcasts it at
    test scale), then one shuffle for the final (nation, year) aggregate.
    The per-row profit expression keeps identical
    left-to-right association on both engines, then goes through the
    scaled-long sum."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    supp_nation = supplier.join(
        F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey
    ).select("s_suppkey", "n_name")
    profit = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%bolt%"))),
            li.l_partkey == part.p_partkey,
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp_nation), li.l_suppkey == F.col("s_suppkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("bigint").alias("o_year"),
            profit.alias("profit"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("profit").alias("sum_profit"))
    )


@register(
    "j_q11_important_parts",
    oracle=f"""
    WITH natline AS (
      SELECT l_partkey, l_extendedprice, l_discount
      FROM lineitem
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_regionkey = 3
    )
    SELECT l_partkey AS p_partkey,
           {sql_dsum("l_extendedprice * (1 - l_discount)")} AS part_value
    FROM natline
    GROUP BY l_partkey
    HAVING {sql_dsum("l_extendedprice * (1 - l_discount)")} >
           (SELECT {sql_dsum("l_extendedprice * (1 - l_discount)")} * 0.001
            FROM natline)
    """,
)
def j_q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (adapted: "stock value" = discounted revenue moved by
    EUROPE-region suppliers, since there is no partsupp availqty/supplycost):
    parts whose value share exceeds 0.1% of the region total — a grouped
    aggregate HAVING-compared against a global-scalar subquery of the SAME
    relation. The scalar is one extra reduce over the already-filtered
    slice, broadcast as a 1-row literal join; both sides use the scaled-long
    sum so the > comparison is bit-deterministic."""
    li = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    eu_supp = supplier.join(
        F.broadcast(nation.filter(F.col("n_regionkey") == 3)),
        supplier.s_nationkey == nation.n_nationkey,
        "left_semi",
    ).select("s_suppkey")
    natline = li.join(
        F.broadcast(eu_supp), li.l_suppkey == F.col("s_suppkey"), "left_semi"
    ).select(
        "l_partkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("val"),
    )
    per_part = natline.groupBy(F.col("l_partkey").alias("p_partkey")).agg(
        dsum("val").alias("part_value")
    )
    total = natline.agg((dsum("val") * F.lit(0.001)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total), per_part.part_value > F.col("threshold"))
        .select("p_partkey", "part_value")
    )


@register(
    "j_q16_supplier_part_counts",
    oracle="""
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem
    JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 4, 9, 16, 25, 36, 49)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def j_q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (adapted: the part<->supplier relation is observed
    lineitem shipments; the "customer complaints" comment filter becomes
    s_acctbal < 0 since there is no comment column): how many distinct
    suppliers ship each surviving (brand, type, size) combination,
    excluding blacklisted suppliers via NOT IN -> left_anti (keys are
    non-null, so the semantics coincide). Pure integer/count path — no
    float determinism machinery needed."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")

    wanted = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    blacklisted = supplier.filter(F.col("s_acctbal") < 0.0).select("s_suppkey")
    return (
        li.join(F.broadcast(blacklisted),
                li.l_suppkey == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(wanted), li.l_partkey == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").cast("bigint").alias("supplier_cnt"))
    )


@register(
    "j_q20_dominant_suppliers",
    oracle=f"""
    WITH qty AS (
      SELECT l_partkey, l_suppkey,
             {sql_dsum("l_quantity")} AS supp_qty
      FROM lineitem
      JOIN part ON p_partkey = l_partkey
      WHERE p_name LIKE 'small%'
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      GROUP BY l_partkey, l_suppkey
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_regionkey = 3
      AND s_suppkey IN (
        SELECT l_suppkey FROM qty q
        WHERE supp_qty > (SELECT {sql_dsum("supp_qty")} * 0.3 FROM qty q2
                          WHERE q2.l_partkey = q.l_partkey)
      )
    """,
)
def j_q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (adapted: "has excess stock available" becomes
    "shipped more than 30% of the part's 1996 volume", i.e. availqty >
    0.5*demand turns into a dominance test on observed shipments; 'small%'
    part-name prefix mirrors 'forest%'): a correlated threshold subquery —
    per-(part, supplier) quantity vs 30% of the per-part total — decorrelated
    into two grouped aggregates joined on the part key, feeding a semi-join
    that filters the EUROPE-region supplier list. Output is the supplier
    name/balance list, matching Q20's shape."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")

    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("small%"))),
            li.l_partkey == part.p_partkey,
            "left_semi",
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(dsum("l_quantity").alias("supp_qty"))
    )
    # Per-part total re-aggregated from the per-supplier sums (same grid ->
    # same scaled-long exactness as summing lines directly, and the input is
    # already small); threshold compare stays bit-deterministic.
    per_part = qty.groupBy(F.col("l_partkey").alias("tpk")).agg(
        (dsum("supp_qty") * F.lit(0.3)).alias("part_threshold")
    )
    dominant = (
        qty.join(
            F.broadcast(per_part),
            (qty.l_partkey == F.col("tpk"))
            & (qty.supp_qty > F.col("part_threshold")),
        )
        .select("l_suppkey")
    )
    return (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_regionkey") == 3)),
            supplier.s_nationkey == nation.n_nationkey,
            "left_semi",
        )
        .join(F.broadcast(dominant), supplier.s_suppkey == F.col("l_suppkey"), "left_semi")
        .select("s_name", "s_acctbal")
    )
