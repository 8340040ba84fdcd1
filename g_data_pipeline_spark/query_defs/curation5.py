"""Round-5 second curation wave (registered post-window; ROTATION.md queues
them for in-window r6 grading): Flesch-Kincaid-style readability profile,
CCNet-style cross-document boilerplate line detection, and the duplicate-
cluster size profile.

The boilerplate detector is the CROSS-document companion to
d_dup_line_removal's within-document pass (CCNet, Wenzek et al. 2020 §3:
lines repeated across many pages are navigation/boilerplate; FineWeb keeps
the same screen). It shares curation3.py's deterministic 10-token line view
(the synthetic corpus stores one physical line per document — real corpora
pass split(text, '\\n')).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.text import normalize_text
from g_data_pipeline_spark.operators.lines import chunked_lines
from g_data_pipeline_spark.queries import register

# DuckDB twin of operators/lines.py:chunked_lines (curation3.py's view).
_SQL_LINEVIEW = r"""
    toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ), linesv AS (
      SELECT doc_id, source,
             list_transform(
               range(0, CAST(floor((len(t) + 9) / 10.0) AS INT)),
               i -> array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10),
                                    ' ')) AS lines
      FROM toks
    ), pl AS (
      SELECT doc_id, source, unnest(lines) AS line FROM linesv
    )
"""

#: A line present in at least this many DISTINCT documents is boilerplate.
BOILERPLATE_MIN_DOCS = 3


@register(
    "t_readability",
    oracle=r"""
    WITH per_doc AS (
      SELECT source,
             CAST(ROUND(1e6 * (
               CAST(0.39 AS DOUBLE)
                 * (CAST(w AS DOUBLE) / s)
               + CAST(11.8 AS DOUBLE)
                 * (CAST(sy AS DOUBLE) / w)
               - CAST(15.59 AS DOUBLE))) AS BIGINT) AS grade_micro,
             CAST(ROUND(1e6 * CAST(w AS DOUBLE) / s) AS BIGINT) AS wps_micro,
             CAST(ROUND(1e6 * CAST(sy AS DOUBLE) / w) AS BIGINT) AS spw_micro
      FROM (
        SELECT source,
               GREATEST(len(string_split_regex(trim(text), '\s+')), 1) AS w,
               GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
               GREATEST(len(regexp_extract_all(lower(text), '[aeiouy]+')), 1)
                 AS sy
        FROM documents)
    )
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(ROUND(CAST(SUM(grade_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mean_grade_micro,
           CAST(ROUND(CAST(SUM(wps_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mean_wps_micro,
           CAST(ROUND(CAST(SUM(spw_micro) AS DOUBLE) / COUNT(*)) AS BIGINT)
             AS mean_spw_micro
    FROM per_doc GROUP BY source
    """,
)
def t_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-Kincaid grade-level profile per source — the classic
    readability screen (Kincaid et al. 1975: 0.39*words/sentence +
    11.8*syllables/word - 15.59) with the standard cheap syllable proxy
    (count of vowel-group runs [aeiouy]+). Sentences count terminal-
    punctuation runs [.!?]+; every denominator is floored at 1. Each
    per-document grade micro-rounds ONCE from exact integer counts (vowel
    runs / punctuation runs / whitespace tokens agree between Java regex
    and RE2 on these literal classes), then the per-source mean divides
    the exact bigint sum of micros — so double-summation order can never
    drift. Shape: pure row-local expressions + one hash aggregate on
    source; everything stays in WholeStageCodegen."""
    docs = load_table(spark, sf_dir, "documents")
    w = F.greatest(F.size(F.split(F.trim("text"), r"\s+")), F.lit(1))
    s = F.greatest(
        F.size(F.regexp_extract_all("text", F.lit("[.!?]+"), F.lit(0))),
        F.lit(1),
    )
    sy = F.greatest(
        F.size(
            F.regexp_extract_all(F.lower("text"), F.lit("[aeiouy]+"), F.lit(0))
        ),
        F.lit(1),
    )
    grade = (
        F.lit(0.39) * (w.cast("double") / s)
        + F.lit(11.8) * (sy.cast("double") / w)
        - F.lit(15.59)
    )
    per_doc = docs.select(
        "source",
        F.round(F.lit(1e6) * grade).cast("long").alias("grade_micro"),
        F.round(F.lit(1e6) * w.cast("double") / s).cast("long").alias(
            "wps_micro"
        ),
        F.round(F.lit(1e6) * sy.cast("double") / w).cast("long").alias(
            "spw_micro"
        ),
    )
    n = F.count(F.lit(1))
    return per_doc.groupBy("source").agg(
        n.alias("n_docs"),
        F.round(F.sum("grade_micro").cast("double") / n)
        .cast("long")
        .alias("mean_grade_micro"),
        F.round(F.sum("wps_micro").cast("double") / n)
        .cast("long")
        .alias("mean_wps_micro"),
        F.round(F.sum("spw_micro").cast("double") / n)
        .cast("long")
        .alias("mean_spw_micro"),
    )


@register(
    "d_boilerplate_lines",
    oracle=f"""
    WITH {_SQL_LINEVIEW}, boiler AS (
      SELECT line FROM pl GROUP BY line
      HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
    )
    SELECT source,
           COUNT(DISTINCT doc_id) AS n_docs,
           COUNT(*) AS n_lines,
           CAST(COUNT(*) FILTER (WHERE line IN (SELECT line FROM boiler))
                AS BIGINT) AS n_boiler_instances,
           CAST(ROUND(1e6 *
             CAST(COUNT(*) FILTER (WHERE line IN (SELECT line FROM boiler))
                  AS DOUBLE) / COUNT(*)) AS BIGINT) AS boiler_micro
    FROM pl GROUP BY source
    """,
)
def d_boilerplate_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document boilerplate line report per source — CCNet's screen:
    a line occurring in >= 3 DISTINCT documents is boilerplate
    (navigation, footers, license blurbs), and the per-source removal
    fraction is the curation signal. Shape: the line explode stays
    row-local; the boilerplate directory is ONE hash aggregate keyed on
    line content (map-side combine collapses per-doc repeats before the
    exchange), and the report joins lines to that directory ON the line
    key — content-keyed shuffles only, no corpus-wide hot key. At 100 TB
    the directory join keys on xxhash64(line) so the exchange moves 8-byte
    keys, exactly as the shingle directories in operators/dedup.py do."""
    docs = load_table(spark, sf_dir, "documents")
    pl = docs.select(
        "doc_id", "source", F.explode(chunked_lines(F.col("text"))).alias("line")
    )
    boiler = (
        pl.groupBy("line")
        .agg(F.countDistinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= BOILERPLATE_MIN_DOCS)
        .select("line", F.lit(1).alias("is_boiler"))
    )
    flagged = pl.join(boiler, "line", "left")
    hit = F.sum(F.when(F.col("is_boiler") == 1, F.lit(1)).otherwise(F.lit(0)))
    return flagged.groupBy("source").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_lines"),
        hit.cast("long").alias("n_boiler_instances"),
        F.round(F.lit(1e6) * hit.cast("double") / F.count(F.lit(1)))
        .cast("long")
        .alias("boiler_micro"),
    )


@register(
    "d_cluster_size_profile",
    oracle=r"""
    WITH fp AS (
      SELECT md5(array_to_string(list_slice(string_split(
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')), ' '),
               1, 20), ' ')) AS f,
             COUNT(*) AS sz
      FROM documents GROUP BY 1
    ), prof AS (
      SELECT sz AS cluster_size, COUNT(*) AS n_clusters,
             CAST(sz * COUNT(*) AS BIGINT) AS n_docs
      FROM fp GROUP BY sz
    )
    SELECT CAST(cluster_size AS BIGINT) AS cluster_size, n_clusters, n_docs,
           CAST(ROUND(1e6 * CAST(n_docs AS DOUBLE)
                / SUM(n_docs) OVER ()) AS BIGINT) AS share_micro
    FROM prof
    """,
)
def d_cluster_size_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-cluster SIZE distribution over 20-token PREFIX
    fingerprints — the dedup diagnostic that tells you whether duplication
    is a long tail of pairs or a few giant clusters (drives the
    d_survivorship_report interpretation and the CC-algorithm choice:
    label propagation for dense blobs, star-contraction for long chains).
    The prefix fingerprint (md5 of the first 20 normalized tokens — the
    Common-Crawl-era prefix near-dup coarse key) clusters the planted
    near-dup families that full-text md5 (= d_fingerprint_dedup's basis)
    treats as distinct, so the profile carries real signal on near-dup
    corpora. Shape: two cascaded hash aggregates (fingerprint -> size,
    size -> counts); the share denominator is a window SUM OVER () on the
    handful-of-rows profile, not the corpus."""
    docs = load_table(spark, sf_dir, "documents")
    prefix = F.concat_ws(
        " ", F.slice(F.split(normalize_text("text"), " "), 1, 20)
    )
    fp = docs.groupBy(F.md5(prefix.cast("binary")).alias("f")).agg(
        F.count(F.lit(1)).alias("sz")
    )
    prof = fp.groupBy("sz").agg(F.count(F.lit(1)).alias("n_clusters"))
    prof = prof.select(
        F.col("sz").cast("long").alias("cluster_size"),
        "n_clusters",
        (F.col("sz") * F.col("n_clusters")).cast("long").alias("n_docs"),
    )
    return prof.select(
        "cluster_size",
        "n_clusters",
        "n_docs",
        F.round(
            F.lit(1e6)
            * F.col("n_docs").cast("double")
            / F.sum("n_docs").over(
                Window.partitionBy()
            )
        )
        .cast("long")
        .alias("share_micro"),
    )
