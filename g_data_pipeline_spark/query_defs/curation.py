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


@register(
    "t_pack_sequences",
    oracle=r"""
    WITH counted AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE CAST(len(string_split_regex(trim(lower(text)), '\s+'))
                       AS BIGINT) END AS n_tokens
      FROM documents
    ), cum AS (
      SELECT doc_id, source, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
      FROM counted
    )
    SELECT doc_id, source, n_tokens,
           CAST(floor((c - n_tokens) / 512.0) AS BIGINT) AS bin_id,
           CAST((c - n_tokens) % 512 AS BIGINT) AS bin_offset,
           floor((c - 1) / 512.0) > floor((c - n_tokens) / 512.0) AS spans_bins
    FROM cum
    """,
)
def t_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk sequence packing per source stream (512-token bins):
    each document's placement (bin id, offset, bin-boundary flag) in the
    GPT-style packed training layout. Pure integer math over the (source,
    doc_id) total order — bit-deterministic. See operators/packing.py for
    the stream-sharding scale plan."""
    from g_data_pipeline_spark.operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    return pack_sequences(docs, "doc_id", "text", "source", capacity=512)


@register(
    "t_mixture_weights",
    oracle="""
    WITH counts AS (
      SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
      GROUP BY source
    )
    SELECT source, n_docs,
           CAST(n_docs AS DOUBLE) / CAST(SUM(n_docs) OVER () AS DOUBLE)
             AS natural_share,
           CAST(CAST(floor(sqrt(n_docs) * 1000000.0) AS BIGINT) AS DOUBLE)
             / CAST(SUM(CAST(floor(sqrt(n_docs) * 1000000.0) AS BIGINT))
                    OVER () AS DOUBLE) AS mix_weight
    FROM counts
    """,
)
def t_mixture_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled (alpha=0.5) source mixing weights over the
    documents corpus — upsamples small sources, the mT5-style corpus-mixing
    scheme. sqrt is IEEE-correctly-rounded everywhere and the scaled-long
    totals are exact, so the weights are bit-deterministic. See
    operators/sampling.py::mixture_weights."""
    from g_data_pipeline_spark.operators.sampling import mixture_weights

    docs = load_table(spark, sf_dir, "documents")
    return mixture_weights(docs, "source", alpha=0.5)
