"""Round-8 oracle wave 1: script-aware (CJK) tokenization — the
round-7 verdict's #2 directive (the one text-stack gap a multilingual
100 TB crawl hits immediately: whitespace tokenization counts an
entire CJK sentence as ONE token, corrupting every token-based signal
downstream).

- t_cjk_token_stats: whitespace vs script-aware token counts over a
  planted CJK/Latin mixed corpus derived deterministically from the
  documents table (vowels -> Han chars + spaces removed on every third
  doc — the same literal-recipe planting style as d_url_filter). The
  gate proves the CJK docs stop counting as ~1 token under
  ``mode="script"`` while Latin docs count byte-identically in both
  modes, with DuckDB reproducing the script-class regex split exactly
  (explicit code-point ranges, engine-identical by construction —
  functions/text.CJK_CHAR_CLASS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.text import CJK_CHAR_CLASS, token_count
from g_data_pipeline_spark.queries import register

# ---------------------------------------------------------------------------
# t_cjk_token_stats: script-aware tokenization report on planted CJK
# ---------------------------------------------------------------------------

# Every third doc becomes "CJK-shaped": vowels map to Han ideographs and
# spaces are removed, yielding the whitespace-free mixed-script text a
# real zh/ja crawl produces. Identical literal recipe on both engines.
_HAN = "一二三四五"  # 一二三四五


def _floordiv_sql(num: str, den: str) -> str:
    return f"CAST({num} // GREATEST({den}, 1) AS BIGINT)"


@register(
    "t_cjk_token_stats",
    oracle=f"""
    WITH mixed AS (
      SELECT doc_id,
             CASE WHEN doc_id % 3 = 0
                  THEN replace(translate(text, 'aeiou', '{_HAN}'), ' ', '')
                  ELSE text END AS t
      FROM documents
    ), counted AS (
      SELECT CASE WHEN doc_id % 3 = 0 THEN 'cjk_planted' ELSE 'latin' END
               AS bucket,
             CASE WHEN trim(t) = '' THEN 0
                  ELSE len(string_split_regex(trim(lower(t)), '\\s+'))
             END AS ws,
             CASE WHEN trim(regexp_replace(t, '{CJK_CHAR_CLASS}', ' ', 'g'))
                       = '' THEN 0
                  ELSE len(string_split_regex(
                         trim(regexp_replace(t, '{CJK_CHAR_CLASS}', ' ',
                                             'g')), '\\s+'))
             END + len(regexp_extract_all(t, '{CJK_CHAR_CLASS}')) AS sc
      FROM mixed
    )
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws) AS BIGINT) AS ws_tokens,
           CAST(SUM(sc) AS BIGINT) AS script_tokens,
           {_floordiv_sql("SUM(sc) * 1000000", "SUM(ws)")}
             AS tokens_ratio_micro
    FROM counted GROUP BY bucket
    """,
)
def t_cjk_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Script-aware vs whitespace token accounting
    (functions/text.tokens ``mode="script"``) over a planted CJK/Latin
    mix: every third document is rewritten into whitespace-free
    mixed-script text (vowels -> Han, spaces removed). Per bucket —
    doc count, total whitespace tokens, total script-aware tokens, and
    their micro ratio. The planted bucket's ratio is large (whitespace
    sees ~one token per doc, script mode sees one per CJK char + Latin
    run); the latin bucket's ratio is exactly 1_000_000 (the two modes
    are byte-identical without CJK — the default-path parity claim,
    also pinned in tests/test_script_tokens.py). Zero-shuffle scan
    stage + one 2-group aggregate; the script pass is two regexps per
    doc, whole-stage-codegen'd (no UDFs). DuckDB twin reproduces the
    split with the same explicit code-point class."""
    docs = load_table(spark, sf_dir, "documents")
    planted = F.col("doc_id") % 3 == 0
    mixed = F.when(
        planted,
        F.regexp_replace(
            F.translate(F.col("text"), "aeiou", _HAN), " ", ""
        ),
    ).otherwise(F.col("text"))
    ws = token_count(mixed).cast("long")
    sc = token_count(mixed, mode="script").cast("long")
    counted = docs.select(
        F.when(planted, F.lit("cjk_planted")).otherwise(F.lit("latin")).alias(
            "bucket"
        ),
        ws.alias("ws"),
        sc.alias("sc"),
    )
    num = F.sum("sc") * F.lit(1_000_000)
    den = F.greatest(F.sum("ws"), F.lit(1))
    return counted.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("ws").alias("ws_tokens"),
        F.sum("sc").alias("script_tokens"),
        ((num - F.pmod(num, den)) / den).cast("long").alias(
            "tokens_ratio_micro"
        ),
    )
