"""Third analytics wave: more TPC-H join shapes (Q7/Q10/Q14/Q19), window
RANGE frames, array-function library over embeddings, Levenshtein fuzzy
matching, and duplicate clustering — all but the iterative clustering
oracle-matched."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.deterministic import dsum, sql_dsum
from g_data_pipeline_spark.queries import register


@register(
    "j_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {sql_dsum('volume')} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             l_extendedprice * (1 - l_discount) AS volume
      FROM supplier
      JOIN lineitem ON s_suppkey = l_suppkey
      JOIN orders ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN nation n1 ON s_nationkey = n1.n_nationkey
      JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name)
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def j_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: the same dimension table (nation) joined TWICE under
    different roles — broadcast both aliases; fact shuffles only for the
    final group."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    supplier = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    nations = ["NATION_1", "NATION_2"]
    n1 = nation.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.filter(F.col("n_name").isin(nations)).select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    return (
        li.join(F.broadcast(supplier), li.l_suppkey == supplier.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(F.col("supp_nation") != F.col("cust_nation"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
    )


@register(
    "j_q10_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name, {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
      AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def j_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue, top-20 customers."""
    customer = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(F.broadcast(orders), li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
                "revenue"
            )
        )
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "j_q14_promo_revenue",
    oracle=f"""
    SELECT 100.00 * ({sql_dsum("CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")})
           / ({sql_dsum('l_extendedprice * (1 - l_discount)')}) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-06-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def j_q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional aggregation ratio over a broadcast
    dimension join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-06-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    part = load_table(spark, sf_dir, "part")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", disc).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            (F.lit(100.00) * dsum(promo) / dsum(disc)).alias("promo_revenue_pct")
        )
    )


@register(
    "j_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)')} AS revenue, COUNT(*) AS n
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 20 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def j_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive (OR-of-ANDs) mixed-table predicates —
    the optimizer must still push the common join key and evaluate the
    residual disjunction post-join."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(F.broadcast(part), part.p_partkey == li.l_partkey)
    b = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return j.filter(b).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "w_range_frame",
    oracle="""
    SELECT o_orderkey, o_custkey, days_since,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6)))
                OVER (PARTITION BY o_custkey ORDER BY days_since
                      RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS spend_30d
    FROM (SELECT o_orderkey, o_custkey, o_totalprice,
                 CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00',
                               o_orderdate) AS BIGINT) AS days_since
          FROM orders)
    """,
)
def w_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE window frame (value-based, not row-based): per-customer
    trailing-30-day spend. Decimal accumulator inside the frame keeps the
    result engine-identical regardless of frame evaluation strategy."""
    orders = load_table(spark, sf_dir, "orders")
    days = F.datediff(
        F.col("o_orderdate").cast("date"), F.lit("1995-01-01").cast("date")
    ).cast("long")
    base = orders.select(
        "o_orderkey", "o_custkey", "o_totalprice", days.alias("days_since")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("days_since")
        .rangeBetween(-30, Window.currentRow)
    )
    return base.select(
        "o_orderkey",
        "o_custkey",
        "days_since",
        F.sum(F.col("o_totalprice").cast("decimal(25,6)"))
        .over(w)
        .cast("double")
        .alias("spend_30d"),
    )


@register(
    "v_array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(embedding[1] AS FLOAT) AS first_v,
           CAST(list_max(embedding) AS FLOAT) AS max_v,
           CAST(list_min(embedding) AS FLOAT) AS min_v,
           len(list_filter(embedding, x -> x > 0)) AS n_positive,
           CAST(list_sort(embedding)[len(embedding)] AS FLOAT) AS sorted_last,
           CAST(list_transform(embedding, x -> abs(x))[1] AS FLOAT) AS abs_first
    FROM embeddings
    """,
)
def v_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function library over array<float>: size/element_at/array_max/
    array_min/filter/sort_array/transform — all JVM-side higher-order
    functions with DuckDB list-lambda twins."""
    emb = load_table(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    return emb.select(
        "vec_id",
        F.size(e).cast("long").alias("dim"),
        F.element_at(e, 1).alias("first_v"),
        F.array_max(e).alias("max_v"),
        F.array_min(e).alias("min_v"),
        F.size(F.filter(e, lambda x: x > 0)).cast("long").alias("n_positive"),
        F.element_at(F.sort_array(e), F.size(e)).alias("sorted_last"),
        F.element_at(F.transform(e, lambda x: F.abs(x)), 1).alias("abs_first"),
    )


@register(
    "t_levenshtein_fuzzy",
    oracle="""
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS BIGINT)
             AS edit_distance
    FROM documents a JOIN documents b ON a.doc_id < b.doc_id
    WHERE a.doc_id < 30 AND b.doc_id < 30
      AND levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) <= 25
    """,
)
def t_levenshtein_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy matching by edit distance (prefix-40 Levenshtein over a small
    id block) — the string-similarity member of the dedup family.

    Demo of F.levenshtein only, NOT the scale path: the crossJoin is made
    safe solely by the doc_id < 30 slice. At corpus scale, string
    similarity goes through the banded SimHash/MinHash family
    (operators/dedup.py) — sub-quadratic bucketed joins, never all-pairs."""
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 30)
    a = docs.select(
        F.col("doc_id").alias("id_a"), F.substring("text", 1, 40).alias("t_a")
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"), F.substring("text", 1, 40).alias("t_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.levenshtein("t_a", "t_b").cast("long").alias("edit_distance"),
        )
        .filter(F.col("edit_distance") <= 25)
    )


@register(
    "d_dedup_clusters",
    eager=True,  # label-propagation loop executes at DataFrame-build time
    oracle=r"""
    WITH RECURSIVE sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(toks[i:i+2], ' ')
                            for i in range(1, len(toks) - 1)]) AS sh
      FROM (SELECT doc_id,
                   string_split_regex(trim(lower(text)), '\s+') AS toks
            FROM documents)
      WHERE len(toks) >= 3
    ), posts_all AS (
      SELECT doc_id, len(sh) AS sz, unnest(sh) AS s FROM sets WHERE len(sh) > 0
    ), freq AS (
      SELECT s, COUNT(*) AS df FROM posts_all GROUP BY s
    ), posts AS (
      SELECT p.* FROM posts_all p JOIN freq f ON p.s = f.s WHERE f.df <= 1000
    ), pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             a.sz AS size_a, b.sz AS size_b, COUNT(*) AS common
      FROM posts a JOIN posts b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2, 3, 4
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      WHERE common / CAST(size_a + size_b - common AS DOUBLE) >= 0.5
      UNION
      SELECT id_b AS src, id_a AS dst FROM pairs
      WHERE common / CAST(size_a + size_b - common AS DOUBLE) >= 0.5
    ), walk(id, label) AS (
      SELECT src, src FROM edges
      UNION
      SELECT e.src, w.label FROM edges e JOIN walk w ON e.dst = w.id
    )
    SELECT id, MIN(label) AS cluster_id FROM walk GROUP BY id
    """,
)
def d_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pipeline endgame: exact word-3-gram Jaccard pairs (>= 0.5,
    the d_ngram_jaccard_pairs edge set) -> connected components ->
    (id, cluster_id = MIN member id). Spark side is iterative min-label
    propagation (operators/dedup.py:dedup_clusters, union-find parity also
    pinned in tests/test_dedup.py); the DuckDB twin expresses the same
    fixpoint as a recursive reachability CTE (min over reachable ids).
    The MinHash-edged variant stays rows-only in tests/test_dedup.py —
    seeded xxhash64 has no SQL twin."""
    from g_data_pipeline_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
    )

    docs = load_table(spark, sf_dir, "documents")
    pairs = ngram_jaccard_pairs(
        docs, "doc_id", "text", n=3, threshold=0.5, max_shingle_freq=1000
    )
    return dedup_clusters(pairs)
