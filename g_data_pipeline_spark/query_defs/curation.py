"""The composed curation pipeline as an oracle-matched query: every stage
(quality scoring, language ID, fingerprint dedup) is SQL-expressible, so the
whole pipeline gets end-to-end value verification, not just per-operator."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.pipelines import curate_documents
from g_data_pipeline_spark.queries import register
from g_data_pipeline_spark.query_defs.text import _sql_lang_scores

_LANG_CASE = """
    CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'unknown'
         WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
         WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
         WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
         WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
         ELSE 'zh' END
"""


@register(
    "pipeline_curate_documents",
    oracle=rf"""
    WITH scored AS (
      SELECT doc_id, text,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT)
             END AS n_tokens,
             CASE WHEN length(text) > 0
                  THEN len(regexp_extract_all(text, '[0-9]'))
                       / CAST(length(text) AS DOUBLE)
                  ELSE 0.0 END AS digit_ratio,
             {', '.join(f"{sql} AS s_{lang}" for lang, sql in _sql_lang_scores().items())},
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                     '\s+', ' ', 'g'))) AS fp
      FROM documents
    ), filtered AS (
      SELECT doc_id, text, n_tokens, digit_ratio, {_LANG_CASE} AS lang_pred, fp
      FROM scored
      WHERE n_tokens >= 10 AND digit_ratio <= 0.3
    )
    SELECT doc_id, text, n_tokens, digit_ratio, lang_pred FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM filtered) WHERE rn = 1
    """,
)
def pipeline_curate_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """quality filter -> language ID -> fingerprint dedup, as ONE lazy plan."""
    docs = load_table(spark, sf_dir, "documents")
    return curate_documents(docs)
