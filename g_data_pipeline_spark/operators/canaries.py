"""Memorization canaries — the data-side prep for exposure measurement
(Carlini et al. '19 "secret sharer", arXiv:1802.08232): plant unique,
out-of-distribution marker strings into a deterministic subset of
training documents, and later scan model GENERATIONS for those markers
to quantify verbatim memorization. The engine owns both halves: the
planting transform (pure function of (id, seed) — reproducible on any
cluster, layout, or rerun, and auditable: the canary table is derivable
from the corpus alone) and the detection join (extract-all + content-
keyed join, never a scan per canary).

Zero UDFs; planting is scan-stage, detection shuffles once on the
canary token.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.sampling import hash_bucket_expr

_PREFIX = "zq-canary-"  # deliberately OOD token shape
_PATTERN = rf"{_PREFIX}[0-9a-f]{{16}}"


def canary_token(id_col: str, seed: str) -> Column:
    """The per-document canary: a pure function of (id, seed) — 16 hex
    chars of md5, prefixed with an out-of-distribution marker."""
    return F.concat(
        F.lit(_PREFIX),
        F.substring(
            F.md5(F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(seed))),
            1,
            16,
        ),
    )


def plant_canaries(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    fraction: float = 0.01,
    seed: str = "canary-v1",
) -> DataFrame:
    """Append a unique canary to a deterministic ``fraction`` of
    documents (md5-bucket of the id — the sampling.py recipe, so the
    planted set is reproducible and layout-invariant). Adds
    ``canary`` (NULL for unplanted rows) and rewrites ``text_col``;
    ``canary_table`` below derives the audit table."""
    picked = hash_bucket_expr([id_col], seed) < int(fraction * 1_000_000)
    tok = canary_token(id_col, seed)
    return df.withColumn(
        "canary", F.when(picked, tok)
    ).withColumn(
        text_col,
        F.when(
            picked, F.concat(F.col(text_col), F.lit(" "), tok)
        ).otherwise(F.col(text_col)),
    )


def canary_table(
    df: DataFrame,
    id_col: str = "doc_id",
    fraction: float = 0.01,
    seed: str = "canary-v1",
) -> DataFrame:
    """The (id, canary) audit table, derived from ids alone — no text
    scan, reproducible long after the planted corpus shipped."""
    picked = hash_bucket_expr([id_col], seed) < int(fraction * 1_000_000)
    return df.select(id_col).filter(picked).select(
        id_col, canary_token(id_col, seed).alias("canary")
    )


def detect_canaries(
    outputs: DataFrame,
    canaries: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Scan generations for planted canaries: extract every
    canary-shaped token (regexp_extract_all — one pass per row), explode,
    and join the audit table on canary content. Returns one row per
    (canary, source id) with its occurrence count across outputs —
    any row here is verbatim memorization evidence. Unknown
    canary-shaped strings (hallucinated lookalikes) are dropped by the
    join; count them separately via the left_anti if needed."""
    hits = outputs.select(
        F.explode(
            F.regexp_extract_all(F.col(text_col), F.lit(_PATTERN), 0)
        ).alias("canary")
    ).groupBy("canary").agg(F.count(F.lit(1)).alias("n_occurrences"))
    return canaries.join(hits, "canary").select(
        "canary", *[c for c in canaries.columns if c != "canary"], "n_occurrences"
    )


def exposure_report(
    outputs: DataFrame,
    canaries: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """One-row summary: canaries planted, canaries emitted at least
    once, emitted share (micro, floor-exact), and total emissions — the
    headline memorization number tracked across training runs."""
    detected = detect_canaries(outputs, canaries, text_col)
    planted = canaries.agg(F.count(F.lit(1)).alias("n_planted"))
    hit = detected.agg(
        F.count(F.lit(1)).alias("n_emitted"),
        F.coalesce(F.sum("n_occurrences"), F.lit(0))
        .cast("long")
        .alias("total_emissions"),
    )
    joined = planted.crossJoin(hit)
    share = F.col("n_emitted") * F.lit(1_000_000)
    den = F.greatest(F.col("n_planted"), F.lit(1))
    return joined.select(
        "n_planted",
        "n_emitted",
        ((share - F.pmod(share, den)) / den).cast("long").alias(
            "emitted_share_micro"
        ),
        "total_emissions",
    )
