"""Round-9 oracle wave 1: cross-document boilerplate-line REMOVAL —
the r8 verdict's #4 directive (CCNet's actual rule; the repo had the
>=3-doc line REPORT since r6 and the r8 paragraph dedup, but a real
crawl pipeline runs the removal transform, not just the report).

- d_boilerplate_removal: cut every occurrence of a line appearing in
  >= 3 DISTINCT docs, reassemble survivors in order, gate the
  reassembled text byte-for-byte (the d_paragraph_dedup convention).
  Planted fixture: a footer on two-thirds of docs + a header on every
  seventh doc (both >= 3 docs -> removed everywhere) and a TWIN line
  on exactly two docs (below the floor -> survives) prove both sides
  of the threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register

# ---------------------------------------------------------------------------
# d_boilerplate_removal: CCNet >=N-doc line removal transform
# ---------------------------------------------------------------------------

_FOOTER = "subscribe to our newsletter for daily updates"
_HEADER = "accept cookies to continue reading"
_TWIN = "limited offer shared by exactly two pages"


@register(
    "d_boilerplate_removal",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             CASE WHEN CAST(doc_id % 7 AS INT) = 0
                  THEN '{_HEADER}' || chr(10) ELSE '' END
             || text
             || CASE WHEN CAST(doc_id % 3 AS INT) IN (0, 1)
                     THEN chr(10) || '{_FOOTER}' ELSE '' END
             || CASE WHEN doc_id < 2
                     THEN chr(10) || '{_TWIN}' ELSE '' END AS t
      FROM documents
    ), lines AS (
      SELECT doc_id,
             unnest(string_split(t, chr(10))) AS line,
             unnest(range(len(string_split(t, chr(10))))) AS pos
      FROM planted
    ), freq AS (
      SELECT md5(line) AS h, COUNT(DISTINCT doc_id) AS nd
      FROM lines GROUP BY md5(line)
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN nd >= 3 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           COALESCE(string_agg(CASE WHEN nd < 3 THEN line END,
                               chr(10) ORDER BY pos), '') AS cleaned
    FROM lines JOIN freq ON md5(lines.line) = freq.h
    GROUP BY doc_id
    """,
)
def d_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet cross-document boilerplate-line REMOVAL transform
    (operators/paragraphs.remove_boilerplate_lines; Wenzek '20 §3.1):
    every occurrence of a line occurring in >= 3 distinct docs is cut
    — unlike the Dolma paragraph rule there is no first-occurrence
    privilege (the first page is no more the owner of a cookie banner
    than the last). Planted footer (2/3 of docs) and header (every 7th
    doc) vanish everywhere; a twin line planted on exactly TWO docs
    stays (below the floor); duplicate full-text doc bodies appearing
    in >= 3 docs are cut consistently on both engines. Per doc: line
    count, removed count, and the REASSEMBLED cleaned text
    byte-for-byte. One md5(line)-keyed distinct-doc aggregate + one
    content-keyed join back + one per-doc rollup — never all-pairs."""
    from g_data_pipeline_spark.operators.paragraphs import (
        remove_boilerplate_lines,
    )

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.when(
                (F.col("doc_id") % 7).cast("int") == 0,
                F.lit(_HEADER + "\n"),
            ).otherwise(F.lit("")),
            F.col("text"),
            F.when(
                (F.col("doc_id") % 3).cast("int").isin(0, 1),
                F.lit("\n" + _FOOTER),
            ).otherwise(F.lit("")),
            F.when(F.col("doc_id") < 2, F.lit("\n" + _TWIN)).otherwise(
                F.lit("")
            ),
        ).alias("text"),
    )
    return remove_boilerplate_lines(
        planted, "doc_id", "text", min_docs=3
    ).select(F.col("id").alias("doc_id"), "n_lines", "n_removed", "cleaned")


# ---------------------------------------------------------------------------
# d_paragraph_neardup: fuzzy (banded-MinHash) paragraph dedup (r8 verdict #8)
# ---------------------------------------------------------------------------


@register("d_paragraph_neardup")
def d_paragraph_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FUZZY paragraph dedup (operators/fuzzy_paragraphs.py): banded
    MinHash at paragraph granularity catches near-identical boilerplate
    VARIANTS that r8's exact paragraph dedup misses — here a planted
    footer whose page counter varies per doc (byte-different in every
    doc, ~0.78 pairwise Jaccard under 3-token shingles). Per source:
    docs, paragraphs, variants removed, docs touched. Rows-only BY
    DESIGN like d_incremental_minhash (banding-decides, no pairwise
    verification; the banding algebra holds its oracle row via
    d_minhash_lsh_pairs) — variant-footer removal, replay stability,
    and the one-shot/incremental twin are pinned in
    tests/test_fuzzy_paragraphs.py. All wide ops key on (band, bucket)
    content or doc id; pid packing bounds: < 2^20 paragraphs/doc."""
    from g_data_pipeline_spark.operators.fuzzy_paragraphs import (
        neardup_paragraph_dedup,
    )

    docs = load_table(spark, sf_dir, "documents")
    footer = F.concat(
        F.lit(
            "copyright example news network all rights reserved "
            "reproduction without permission is strictly prohibited "
            "contact the editorial desk for syndication page "
        ),
        (F.col("doc_id") % 97).cast("string"),
    )
    planted = docs.select(
        "doc_id",
        "source",
        F.concat(F.col("text"), F.lit("\n\n"), footer).alias("text"),
    )
    cleaned = neardup_paragraph_dedup(planted, "doc_id", "text")
    return (
        planted.select(F.col("doc_id").alias("id"), "source")
        .join(cleaned, "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_paragraphs").cast("long").alias("n_paragraphs"),
            F.sum("n_removed").cast("long").alias("n_removed"),
            F.sum((F.col("n_removed") > 0).cast("int"))
            .cast("long")
            .alias("n_docs_touched"),
        )
    )


# ---------------------------------------------------------------------------
# t_stopword_profile: language-ROUTED stopword quality signal (r8 verdict #6)
# ---------------------------------------------------------------------------

# One marker sentence per routed language: its full stopword table joined
# by spaces (repeated twice in the planted text). Cross-language word
# collisions exist (la/que/un...) but every marker's own-language score
# strictly dominates, so the extended argmax is deterministic.
_ROUTED_LANGS = ("de", "fr", "es", "it", "pt", "nl")


def _marker(lang: str) -> str:
    from g_data_pipeline_spark.functions.text import STOPWORDS_QUALITY

    return " ".join(STOPWORDS_QUALITY[lang])


def _sql_word_count(expr: str, lang: str) -> str:
    from g_data_pipeline_spark.functions.text import STOPWORDS_QUALITY

    alt = "|".join(STOPWORDS_QUALITY[lang])
    return rf"len(regexp_extract_all({expr}, '\b({alt})\b'))"


def _stopword_profile_oracle() -> str:
    langs = ("en",) + _ROUTED_LANGS
    planted_case = " ".join(
        f"WHEN {i} THEN '{_marker(lang)} {_marker(lang)} '"
        for i, lang in enumerate(_ROUTED_LANGS)
    )
    score_cols = ",\n             ".join(
        f"{_sql_word_count('t', lang)} AS s_{lang}" for lang in langs
    )
    best = "greatest(" + ", ".join(f"s_{lang}" for lang in langs) + ")"
    pred_case = " ".join(
        f"WHEN s_{lang} = {best} THEN '{lang}'" for lang in langs
    )
    routed_case = " ".join(
        f"WHEN '{lang}' THEN s_{lang}" for lang in langs
    )
    return f"""
    WITH planted AS (
      SELECT CASE CAST(doc_id % 6 AS INT) {planted_case} END
               || md5(text) AS t
      FROM documents
    ), scored AS (
      SELECT t,
             {score_cols},
             len(string_split(trim(t), ' ')) AS n_tokens
      FROM planted
    ), pred AS (
      SELECT *,
             CASE WHEN {best} = 0 THEN 'unknown' {pred_case} END AS lang_pred
      FROM scored
    ), routed AS (
      SELECT lang_pred,
             CASE lang_pred {routed_case} ELSE s_en END AS routed_hits,
             s_en AS static_en_hits,
             n_tokens
      FROM pred
    )
    SELECT lang_pred,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(routed_hits) AS BIGINT) AS routed_hits,
           CAST(SUM(static_en_hits) AS BIGINT) AS static_en_hits,
           CAST(SUM(routed_hits) * 1000000 // SUM(n_tokens) AS BIGINT)
             AS routed_ratio_micro
    FROM routed GROUP BY lang_pred
    """


@register("t_stopword_profile", oracle=_stopword_profile_oracle())
def t_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ROUTED stopword quality signal
    (functions/text.routed_stopword_count + lang_id_extended over the
    STOPWORDS_QUALITY superset — r8 verdict #6: the quality score's
    stopword signal was English-blind right after token counts went
    CJK-aware). Each doc is planted with one routed language's marker
    sentence (its stopword table, twice) plus an md5 filler token; the
    extended detector must identify it, the ROUTED count sees every
    planted stopword, and the en-static count sees ZERO (the
    blind-vs-seeing demonstration, the t_cjk_token_stats convention).
    Per predicted language: doc count, routed hits, en-static hits,
    routed micro ratio. Scan-stage regex cascade, one rollup; word
    tables are ASCII literals shared verbatim by both engines."""
    from g_data_pipeline_spark.functions.text import (
        lang_id_extended,
        routed_stopword_count,
        stopword_count,
    )

    docs = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 6).cast("int")
    marker = F.lit("")
    for i, lang in enumerate(_ROUTED_LANGS):
        marker = F.when(
            m == i, F.lit(f"{_marker(lang)} {_marker(lang)} ")
        ).otherwise(marker)
    planted = docs.select(
        F.concat(marker, F.md5(F.col("text"))).alias("t")
    )
    pred = planted.select(
        "t", lang_id_extended(F.col("t")).alias("lang_pred")
    )
    routed = pred.select(
        "lang_pred",
        routed_stopword_count(F.col("t"), F.col("lang_pred")).alias(
            "routed_hits"
        ),
        stopword_count(F.col("t"), "en").alias("static_en_hits"),
        F.size(F.split(F.trim(F.col("t")), r"\s+")).alias("n_tokens"),
    )
    s = F.sum("routed_hits") * F.lit(1_000_000)
    n = F.sum("n_tokens")
    return routed.groupBy("lang_pred").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("routed_hits").cast("long").alias("routed_hits"),
        F.sum("static_en_hits").cast("long").alias("static_en_hits"),
        ((s - F.pmod(s, n)) / n).cast("long").alias("routed_ratio_micro"),
    )
