"""Curation-audit queries, wave 2 (round 4): per-document cross-source
contamination fractions, a trainable quality-classifier gate, and the
per-source dedup-survivorship report that feeds mixture weighting — the
remaining standard LLM-pipeline audit set (none of these exist in the
reference, whose surface stops at profiling; SURVEY.md §2).

Determinism policy (same as queries.py's module docstring): integer counts
everywhere, each ``ln`` evaluated ONCE on a single double quotient and
rounded ONCE to an integer micro-score, final fractions as one double
division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.text import fingerprint_md5
from g_data_pipeline_spark.operators.quality import (
    DEFAULT_BUCKETS,
    naive_bayes_hashed_weights,
    quality_scores,
    sql_hashed_token_bucket,
)
from g_data_pipeline_spark.operators.sampling import (
    hash_bucket_expr,
    sql_hash_bucket,
)
from g_data_pipeline_spark.queries import register

# DuckDB twins shared with text2.py / dedup.py oracles.
_SQL_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"
_SQL_SHINGLES3 = (
    "list_distinct([array_to_string(toks[i:i+2], ' ') "
    "for i in range(1, len(toks) - 1)])"
)
_SQL_FP = (
    r"md5(trim(regexp_replace(regexp_replace("
    r"lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))"
)


@register(
    "d_contamination_fraction",
    oracle=rf"""
    WITH sh AS (
      SELECT doc_id, source, {_SQL_SHINGLES3} AS sh
      FROM (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents)
      WHERE len(toks) >= 3
    ), posts AS (
      SELECT doc_id, source, unnest(sh) AS s FROM sh
    ), doc_sizes AS (
      SELECT doc_id, COUNT(*) AS n_shingles FROM posts GROUP BY doc_id
    ), src AS (
      SELECT DISTINCT source AS other_source, s FROM posts
    )
    SELECT p.doc_id, p.source, o.other_source,
           d.n_shingles,
           COUNT(*) AS shared_shingles,
           CAST(COUNT(*) AS DOUBLE) / d.n_shingles AS contamination
    FROM posts p
    JOIN src o ON p.s = o.s AND o.other_source <> p.source
    JOIN doc_sizes d ON d.doc_id = p.doc_id
    GROUP BY p.doc_id, p.source, o.other_source, d.n_shingles
    """,
)
def d_contamination_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination audit: for every (document, other
    source) pair with any overlap, the fraction of the doc's distinct
    word-3-gram shingles that the other source also contains —
    length-normalized doc-level evidence for decontamination decisions
    (d_decontaminate removes; this measures and ranks first). Exact path
    of operators/contamination.py; the bottom-k MinHash sketch option is
    graded as d_contamination_sketch. Shuffles keyed on shingle content
    then doc id; fan-out bounded by n_sources per shingle, never
    all-pairs."""
    from g_data_pipeline_spark.operators.contamination import (
        cross_source_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    return cross_source_contamination(docs, "doc_id", "source", "text", n=3)


@register("d_contamination_sketch")  # rows-only: estimator (sketch) path
def d_contamination_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k MinHash sketch of d_contamination_fraction (k=16 smallest
    xxhash64 shingles per doc join the source directory instead of every
    shingle — join volume cut by |doc|/k at equal directory cost).
    Rows-only: the estimate is sample-dependent by design; estimator
    accuracy vs the exact path is pinned by tests/test_contamination.py
    (exact agreement for docs with <= k shingles, bounded mean absolute
    error above)."""
    from g_data_pipeline_spark.operators.contamination import (
        sampled_contamination,
    )

    docs = load_table(spark, sf_dir, "documents")
    return sampled_contamination(docs, "doc_id", "source", "text", n=3, k=16)


@register(
    "t_quality_classifier",
    oracle=rf"""
    WITH occ AS (
      SELECT doc_id, n_chars,
             {sql_hash_bucket(['doc_id'], seed='quality-sample')} AS sbucket,
             unnest({_SQL_TOKS}) AS token
      FROM documents
    ), occ2 AS (
      SELECT doc_id,
             CASE WHEN sbucket < 200000 THEN 1 ELSE 0 END AS in_sample,
             CASE WHEN n_chars >= 250 THEN 1 ELSE 0 END AS label,
             {sql_hashed_token_bucket('token')} AS b
      FROM occ WHERE token <> ''
    ), tot AS (
      SELECT CAST(SUM(label) AS BIGINT) AS pos_tot,
             CAST(SUM(1 - label) AS BIGINT) AS neg_tot
      FROM occ2 WHERE in_sample = 1
    ), w AS (
      SELECT b,
             CAST(ROUND(ln(
               ((SUM(label) + 1.0) * (tot.neg_tot + {DEFAULT_BUCKETS}.0))
               / ((SUM(1 - label) + 1.0) * (tot.pos_tot + {DEFAULT_BUCKETS}.0))
             ) * 1e6) AS BIGINT) AS w_micro
      FROM occ2 CROSS JOIN tot WHERE in_sample = 1
      GROUP BY b, tot.neg_tot, tot.pos_tot
    )
    SELECT o.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(w.w_micro) AS BIGINT) AS sum_w_micro,
           CAST(SUM(w.w_micro) AS DOUBLE) / 1e6 / COUNT(*) AS avg_logit,
           CAST(CASE WHEN SUM(w.w_micro) > 0 THEN 1 ELSE 0 END AS BIGINT)
             AS keep
    FROM occ2 o JOIN w ON o.b = w.b
    GROUP BY o.doc_id
    """,
)
def t_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-classifier gate (CCNet / GPT-3 recipe, fasttext-shaped):
    learn naive-Bayes log-odds weights over HASHED tokens from a labeled
    sample (deterministic md5 20% of docs; label = n_chars >= 250, a
    stand-in for human labels), broadcast the bounded weight table, score
    every document, keep at logit > 0. The hashing trick caps the model at
    32768 rows however large the corpus, so the scoring join broadcasts by
    construction (plan-pinned); per-doc sums are exact integer micro-
    weights (one ln, one rounding per bucket — the t_dsir_weights
    recipe). operators/quality.py holds the seam; a real fasttext .bin
    scorer plugs in behind the same signatures."""
    docs = load_table(spark, sf_dir, "documents")
    sample = docs.filter(
        hash_bucket_expr(["doc_id"], seed="quality-sample") < 200_000
    ).withColumn("label", (F.col("n_chars") >= 250).cast("long"))
    weights = naive_bayes_hashed_weights(sample, "text", "label")
    return quality_scores(docs, weights, "doc_id", "text")


@register(
    "d_survivorship_report",
    oracle=rf"""
    WITH corpus AS (
      SELECT doc_id, source, n_chars, text FROM documents
      UNION ALL
      SELECT -doc_id - 1 AS doc_id, source, n_chars, text
      FROM documents WHERE doc_id % 3 = 0
    ), ranked AS (
      SELECT source, n_chars,
             CASE WHEN ROW_NUMBER() OVER (
               PARTITION BY {_SQL_FP}
               ORDER BY CASE WHEN doc_id < 0 THEN 1 ELSE 0 END, doc_id
             ) = 1 THEN 1 ELSE 0 END AS is_survivor
      FROM corpus
    ), agg AS (
      SELECT source,
             COUNT(*) AS n_docs,
             CAST(SUM(is_survivor) AS BIGINT) AS n_survivors,
             CAST(SUM(is_survivor * n_chars) AS BIGINT) AS survivor_chars
      FROM ranked GROUP BY source
    )
    SELECT source, n_docs, n_survivors,
           CAST(n_docs - n_survivors AS BIGINT) AS n_dupes,
           CAST(n_survivors AS DOUBLE) / n_docs AS survival_rate,
           survivor_chars,
           CAST(survivor_chars AS DOUBLE)
             / CAST((SELECT SUM(survivor_chars) FROM agg) AS DOUBLE)
             AS mix_weight
    FROM agg
    """,
)
def d_survivorship_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source dedup survivorship report: run exact (fingerprint)
    dedup over the corpus and report, per source, how many documents
    survive, the dup rate, and the source's post-dedup character-mass
    share — the number that should drive t_mixture_weights (mixing on RAW
    counts double-weights heavily-duplicated sources). The synthetic
    corpus has no natural duplicates, so a copy of every 3rd document is
    planted (id = -doc_id - 1, collision-free at any scale factor;
    originals out-rank plants) and must be counted as that source's dup
    mass. Shuffles: fingerprint window (content-keyed, WindowGroupLimit-
    prunable rank), per-source aggregation (20 rows); the grand total is
    a broadcast 1-row aggregate."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars", "text"
    )
    planted = docs.filter(F.col("doc_id") % 3 == 0).select(
        (-F.col("doc_id") - 1).alias("doc_id"), "source", "n_chars", "text"
    )
    corpus = docs.unionByName(planted)
    tier = F.when(F.col("doc_id") < 0, 1).otherwise(0)
    w = Window.partitionBy(fingerprint_md5("text")).orderBy(
        tier.asc(), F.col("doc_id").asc()
    )
    ranked = corpus.withColumn(
        "is_survivor", (F.row_number().over(w) == 1).cast("long")
    )
    agg = ranked.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("is_survivor").cast("long").alias("n_survivors"),
        F.sum(F.col("is_survivor") * F.col("n_chars"))
        .cast("long")
        .alias("survivor_chars"),
    )
    total = agg.agg(F.sum("survivor_chars").alias("total_chars"))
    return agg.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "n_survivors",
        (F.col("n_docs") - F.col("n_survivors")).cast("long").alias("n_dupes"),
        (F.col("n_survivors").cast("double") / F.col("n_docs")).alias(
            "survival_rate"
        ),
        "survivor_chars",
        (
            F.col("survivor_chars").cast("double")
            / F.col("total_chars").cast("double")
        ).alias("mix_weight"),
    )
