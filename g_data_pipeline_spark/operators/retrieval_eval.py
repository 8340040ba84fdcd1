"""Ranked-retrieval quality evaluation: recall@k and nDCG@k against a
relevance table — the number a user actually tunes ``n_probe``, BM25
parameters, or LSH banding against (round-7 verdict directive #5; the
reference has no retrieval surface at all — extension).

Design for exact cross-engine reproducibility (the oracle gate): the
only irrational ingredient in nDCG is the rank discount 1/log2(rank+1).
Both engines' ``log2`` doubles can differ in the last ulp, so the
discounts are precomputed ONCE in Python as integer micros
(``round(1e6 / log2(r+1))``) and embedded as literals on BOTH sides —
every remaining step is integer arithmetic (gains ``2^rel - 1``,
micro floor-divisions), bit-identical in Spark and DuckDB.

Scale shape (100 TB): results join relevance on (query, doc) — a
content-keyed equi join, never all-pairs; the ideal-DCG pass windows
over the relevance table partitioned by query (bounded by judgments
per query, which is small by construction in any eval set); the final
rollup is one aggregate over #queries rows per system. Macro-averaged
metrics (mean over queries), queries with zero relevant docs excluded
(recall undefined — the trec_eval convention).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def discount_micros(k: int) -> list[int]:
    """Integer-micro DCG discounts for ranks 1..k: round(1e6/log2(r+1)).
    Shared by the Spark expressions and any SQL twin so both engines use
    the SAME constants (see module docstring)."""
    return [round(1_000_000 / math.log2(r + 1)) for r in range(1, k + 1)]


def _floordiv(a: Column, b: Column) -> Column:
    d = F.greatest(b, F.lit(1))
    return ((a - F.pmod(a, d)) / d).cast("long")


def _gain(rel: Column) -> Column:
    # graded gain 2^rel - 1 (0 -> 0, 1 -> 1, 2 -> 3, 3 -> 7). pow is
    # double-typed but exact for any realistic grade (integral powers of
    # two are exact doubles up to 2^52); the cast back to long is then
    # exact, matching the SQL twin's (1 << rel) - 1.
    return (F.pow(F.lit(2.0), rel.cast("int")).cast("long")) - F.lit(1)


def retrieval_eval(
    results: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    system_col: str = "system",
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-system macro recall@k / nDCG@k.

    ``results``: one row per (system, query, doc) with a 1-based
    ``rank`` (ties already broken by the ranker — ranks must be unique
    per (system, query)). ``relevance``: graded judgments (query, doc,
    rel >= 0); rel = 0 rows are allowed and ignored.

    Returns ``(system, n_queries, recall_at_k_micro, ndcg_at_k_micro)``
    where the micros are floor(mean-over-queries * 1e6); per-query
    recall = |relevant in top-k| / |relevant|, per-query nDCG =
    DCG@k / IDCG@k with the shared integer-micro discounts
    (:func:`discount_micros`) and ideal order (rel desc, doc asc — the
    deterministic tie-break both engines reproduce)."""
    discs = discount_micros(k)
    disc_arr = F.array(*[F.lit(d) for d in discs])

    rel_pos = relevance.filter(F.col(rel_col) > 0).select(
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rel_col).alias("rel"),
    )
    # per-query relevant count + ideal DCG (top-k by rel desc, doc asc)
    w_ideal = Window.partitionBy("q").orderBy(F.desc("rel"), F.asc("d"))
    ideal = (
        rel_pos.withColumn("__ir", F.row_number().over(w_ideal))
        .groupBy("q")
        .agg(
            F.count(F.lit(1)).alias("n_rel"),
            F.sum(
                F.when(
                    F.col("__ir") <= k,
                    _gain(F.col("rel"))
                    * F.element_at(disc_arr, F.col("__ir")),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("idcg_micro"),
        )
    )
    topk = results.filter(F.col(rank_col) <= k).select(
        F.col(system_col).alias("system"),
        F.col(query_col).alias("q"),
        F.col(doc_col).alias("d"),
        F.col(rank_col).alias("rank"),
    )
    scored = (
        topk.join(rel_pos, ["q", "d"], "left")
        .groupBy("system", "q")
        .agg(
            F.count(F.col("rel")).alias("hits"),
            F.sum(
                F.when(
                    F.col("rel").isNotNull(),
                    _gain(F.col("rel"))
                    * F.element_at(disc_arr, F.col("rank")),
                ).otherwise(F.lit(0))
            )
            .cast("long")
            .alias("dcg_micro"),
        )
    )
    # every (system, query-with-relevant) pair scores — a system that
    # returned nothing for a query still contributes 0s to its macro
    systems = topk.select("system").distinct()
    per_query = (
        ideal.crossJoin(F.broadcast(systems))
        .join(scored, ["system", "q"], "left")
        .select(
            "system",
            _floordiv(
                F.coalesce(F.col("hits"), F.lit(0)) * F.lit(1_000_000),
                F.col("n_rel"),
            ).alias("recall_micro"),
            _floordiv(
                F.coalesce(F.col("dcg_micro"), F.lit(0))
                * F.lit(1_000_000),
                F.col("idcg_micro"),
            ).alias("ndcg_micro"),
        )
    )
    return per_query.groupBy("system").agg(
        F.count(F.lit(1)).alias("n_queries"),
        _floordiv(F.sum("recall_micro"), F.count(F.lit(1))).alias(
            "recall_at_k_micro"
        ),
        _floordiv(F.sum("ndcg_micro"), F.count(F.lit(1))).alias(
            "ndcg_at_k_micro"
        ),
    )


def sql_case_discount(rank_expr: str, k: int) -> str:
    """The SQL-side twin of the embedded discount literals: a CASE over
    ranks 1..k, same integers as :func:`discount_micros`."""
    whens = " ".join(
        f"WHEN {r} THEN {d}"
        for r, d in zip(range(1, k + 1), discount_micros(k))
    )
    return f"CASE {rank_expr} {whens} ELSE 0 END"
