"""End-to-end corpus curation — the composed training-data pipeline:

    quality-score -> filter -> language-ID -> fingerprint dedup -> curated

Each stage is one of the engine's own operators (functions.text,
operators.dedup), composed LAZILY into a single DataFrame plan: Catalyst
sees the whole pipeline, so the quality filter prunes rows before the
dedup shuffle, and the only wide operations are the dedup window (one
shuffle on the fingerprint) — exactly what you want when the input is
100 TB of raw documents and 40% of it dies at the filter.

At scale, follow with ``.write.partitionBy("lang_pred").parquet(...)`` so
downstream per-language training jobs get partition pruning for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_features,
    token_count,
)


def curate_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 10,
    max_digit_ratio: float = 0.3,
) -> DataFrame:
    """Curated corpus: quality-filtered, language-tagged, exact-deduped
    (normalized-fingerprint, MIN-id survivor). Returns (id, lang_pred,
    n_tokens, digit_ratio) plus the original text column."""
    feats = quality_features(text_col)
    scored = df.select(
        F.col(id_col),
        F.col(text_col),
        token_count(text_col).cast("long").alias("n_tokens"),
        F.coalesce(feats["digit_ratio"], F.lit(0.0)).alias("digit_ratio"),
        lang_id(text_col).alias("lang_pred"),
        fingerprint_md5(text_col).alias("__fp"),
    )
    filtered = scored.filter(
        (F.col("n_tokens") >= min_tokens)
        & (F.col("digit_ratio") <= max_digit_ratio)
    )
    w = Window.partitionBy("__fp").orderBy(F.col(id_col).asc())
    return (
        filtered.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__fp")
    )
