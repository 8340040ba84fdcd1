"""Round-5 second text wave (registered post-window; ROTATION.md queues
them for in-window r6 grading): word-length profiling and the Gopher
n-gram coverage metrics that complete the repetition-filter family.

`t_repetition_stats` covers Gopher's duplicate-token ratio and top-BIGRAM
fraction; Gopher's full repetition suite (Rae et al. '21, §A1.1) also cuts
on the CHARACTER fraction covered by the most frequent 3-gram and by all
duplicated 5-grams — those land here. The synthetic corpus barely repeats
5-grams, so a deterministic repeated phrase is planted on every 7th doc in
BOTH engines (the t_redact_pii enrichment pattern) to exercise the
duplicate path on real data.

Determinism: all fractions are exact-integer char masses micro-scaled with
ONE double division + ONE rounding; top-gram ties break on the gram string
so both engines pick the same winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions import text as X
from g_data_pipeline_spark.queries import register


@register(
    "t_word_length_profile",
    oracle=r"""
    WITH base AS (
      SELECT source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(string_split_regex(trim(lower(text)), '\s+'))
             END AS n_tok,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE len(list_filter(
                         string_split_regex(trim(lower(text)), '\s+'),
                         x -> len(x) >= 8))
             END AS n_long,
             length(regexp_replace(trim(lower(text)), '\s+', '', 'g'))
               AS wchars
      FROM documents
    )
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_words,
           CAST(SUM(n_long) AS BIGINT) AS n_long_words,
           CAST(SUM(wchars) AS BIGINT) AS word_chars,
           CASE WHEN SUM(n_tok) > 0 THEN
             CAST(ROUND(1e6 * CAST(SUM(wchars) AS DOUBLE) / SUM(n_tok))
                  AS BIGINT) END AS mean_word_len_micro,
           CASE WHEN SUM(n_tok) > 0 THEN
             CAST(ROUND(1e6 * CAST(SUM(n_long) AS DOUBLE) / SUM(n_tok))
                  AS BIGINT) END AS long_word_frac_micro
    FROM base GROUP BY source
    """,
)
def t_word_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source word-length profile: mean word length and the long-word
    (≥8 chars) fraction — the cheap morphology signals that separate prose
    from code/tables/gibberish in corpus triage (C4 uses a 3..10 mean-word
    -length keep band). Word chars come from one regexp strip of all
    whitespace (no explode); the long-word count is a row-local lambda
    filter over the token array. One exchange: the |sources|-row groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    t = X.tokens("text")
    base = docs.select(
        "source",
        X.token_count("text").alias("n_tok"),
        F.when(F.trim("text") == "", F.lit(0))
        .otherwise(F.size(F.filter(t, lambda x: F.length(x) >= 8)))
        .alias("n_long"),
        F.length(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", "")
        ).alias("wchars"),
    )
    words = F.sum("n_tok")
    return base.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        words.cast("long").alias("n_words"),
        F.sum("n_long").cast("long").alias("n_long_words"),
        F.sum("wchars").cast("long").alias("word_chars"),
        F.when(
            words > 0,
            F.round(F.lit(1e6) * F.sum("wchars").cast("double") / words).cast(
                "long"
            ),
        ).alias("mean_word_len_micro"),
        F.when(
            words > 0,
            F.round(F.lit(1e6) * F.sum("n_long").cast("double") / words).cast(
                "long"
            ),
        ).alias("long_word_frac_micro"),
    )


# Planted on every 7th doc so the duplicated-5-gram path sees real mass:
# the phrase repeats twice, so its five 5-grams (and the junction-spanning
# ones) all reach count 2.
_PLANT = (
    " alpha beta gamma delta epsilon alpha beta gamma delta epsilon"
)


@register(
    "t_gopher_ngram_coverage",
    oracle=rf"""
    WITH enriched AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || '{_PLANT}' ELSE text END
               AS text
      FROM documents
    ), toks AS (
      SELECT doc_id,
             regexp_split_to_array(trim(lower(text)), '\s+') AS t,
             length(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))
               AS norm_len
      FROM enriched
    ), g3 AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 2),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
      FROM toks WHERE len(t) >= 3
    ), c3 AS (
      SELECT doc_id, g, COUNT(*) AS c FROM g3 GROUP BY doc_id, g
    ), top3 AS (
      SELECT doc_id, CAST(c * length(g) AS BIGINT) AS mass
      FROM (SELECT doc_id, g, c,
                   ROW_NUMBER() OVER (PARTITION BY doc_id
                                      ORDER BY c DESC, g) AS rn
            FROM c3)
      WHERE rn = 1
    ), g5 AS (
      SELECT doc_id, unnest(list_transform(generate_series(1, len(t) - 4),
                            i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                 || ' ' || t[i+3] || ' ' || t[i+4])) AS g
      FROM toks WHERE len(t) >= 5
    ), dup5 AS (
      SELECT doc_id, CAST(SUM(c * length(g)) AS BIGINT) AS mass
      FROM (SELECT doc_id, g, COUNT(*) AS c FROM g5 GROUP BY doc_id, g)
      WHERE c > 1 GROUP BY doc_id
    )
    SELECT t.doc_id,
           CAST(t.norm_len AS BIGINT) AS norm_len,
           COALESCE(top3.mass, 0) AS top3_mass,
           COALESCE(dup5.mass, 0) AS dup5_mass,
           CASE WHEN t.norm_len > 0 THEN
             CAST(ROUND(1e6 * CAST(COALESCE(top3.mass, 0) AS DOUBLE)
                        / t.norm_len) AS BIGINT) ELSE 0 END
             AS top3_cov_micro,
           CASE WHEN t.norm_len > 0 THEN
             CAST(ROUND(1e6 * CAST(COALESCE(dup5.mass, 0) AS DOUBLE)
                        / t.norm_len) AS BIGINT) ELSE 0 END
             AS dup5_cov_micro
    FROM toks t LEFT JOIN top3 USING (doc_id) LEFT JOIN dup5 USING (doc_id)
    """,
)
def t_gopher_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher n-gram character-coverage filters (Rae et al. '21 §A1.1):
    the char fraction covered by the single most frequent word 3-gram and
    by ALL duplicated word 5-grams — the repetition cuts t_repetition_stats
    (dup tokens, top bigram) doesn't express. Char mass = count × gram
    length vs the whitespace-collapsed doc length, all exact integers until
    one micro division. Shape: two shingle explodes aggregate on
    (doc_id, gram) then doc_id — shuffles ride the doc key, facts are
    scanned twice (3- and 5-gram passes), never joined all-pairs; the
    top-gram rank is a doc-keyed WindowGroupLimit-prunable row_number."""
    docs = load_table(spark, sf_dir, "documents")
    enriched = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(_PLANT))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    base = enriched.select(
        "doc_id",
        F.length(
            F.regexp_replace(F.trim(F.lower(F.col("text"))), r"\s+", " ")
        )
        .cast("long")
        .alias("norm_len"),
    )
    sh3 = enriched.select(
        "doc_id", F.explode(X.word_shingles("text", 3)).alias("g")
    )
    c3 = sh3.groupBy("doc_id", "g").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.col("g"))
    top3 = (
        c3.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            (F.col("c") * F.length("g")).cast("long").alias("top3_mass_raw"),
        )
    )
    sh5 = enriched.select(
        "doc_id", F.explode(X.word_shingles("text", 5)).alias("g")
    )
    dup5 = (
        sh5.groupBy("doc_id", "g")
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") > 1)
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("c") * F.length("g")).cast("long").alias("dup5_mass_raw")
        )
    )
    out = (
        base.join(top3, "doc_id", "left")
        .join(dup5, "doc_id", "left")
        .select(
            "doc_id",
            "norm_len",
            F.coalesce(F.col("top3_mass_raw"), F.lit(0).cast("long")).alias(
                "top3_mass"
            ),
            F.coalesce(F.col("dup5_mass_raw"), F.lit(0).cast("long")).alias(
                "dup5_mass"
            ),
        )
    )
    return out.select(
        "doc_id",
        "norm_len",
        "top3_mass",
        "dup5_mass",
        F.when(
            F.col("norm_len") > 0,
            F.round(
                F.lit(1e6)
                * F.col("top3_mass").cast("double")
                / F.col("norm_len")
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("top3_cov_micro"),
        F.when(
            F.col("norm_len") > 0,
            F.round(
                F.lit(1e6)
                * F.col("dup5_mass").cast("double")
                / F.col("norm_len")
            ).cast("long"),
        )
        .otherwise(F.lit(0).cast("long"))
        .alias("dup5_cov_micro"),
    )


_STOP_EN = "|".join(X.STOPWORDS["en"])

# DuckDB twin of functions.text.quality_score — every literal cast DOUBLE
# (a bare 0.4 parses as DECIMAL and drifts the last ulp against Spark's
# double arithmetic; the CLAUDE.md SQL-literal gotcha), every term in the
# same operation order as the Column expression so score bits match and
# the >= threshold compares land identically.
_SCORE_SQL = rf"""
      CAST(0.4 AS DOUBLE)
        * LEAST(CAST(n_tok AS DOUBLE) / CAST(100.0 AS DOUBLE),
                CAST(1.0 AS DOUBLE))
      + CAST(0.4 AS DOUBLE)
        * LEAST(COALESCE(CASE WHEN n_tok > 0 THEN
                   len(regexp_extract_all(lower(text), '\b({_STOP_EN})\b'))
                     / CAST(n_tok AS DOUBLE) END,
                 CAST(0.0 AS DOUBLE)) * 4,
                CAST(1.0 AS DOUBLE))
      + CAST(0.2 AS DOUBLE)
        * (CAST(1.0 AS DOUBLE)
           - LEAST(COALESCE(CASE WHEN length(text) > 0 THEN
                      len(regexp_extract_all(text, '[0-9]'))
                        / CAST(length(text) AS DOUBLE) END,
                    CAST(0.0 AS DOUBLE))
                   + COALESCE(CASE WHEN length(text) > 0 THEN
                      len(regexp_extract_all(text, '[.!?,;:]'))
                        / CAST(length(text) AS DOUBLE) END,
                    CAST(0.0 AS DOUBLE)),
                   CAST(1.0 AS DOUBLE)))
"""


@register(
    "t_quality_threshold_sweep",
    oracle=rf"""
    WITH scored AS (
      SELECT ({_SCORE_SQL}) AS s
      FROM (SELECT text,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(string_split_regex(trim(lower(text)), '\s+'))
                   END AS n_tok
            FROM documents)
    ), thresholds AS (
      SELECT unnest([0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8,
                     0.9]::DOUBLE[]) AS thr
    )
    SELECT CAST(ROUND(thr * 1e6) AS BIGINT) AS threshold_micro,
           COUNT(*) AS n_docs,
           COUNT(*) FILTER (WHERE s >= thr) AS n_keep,
           CAST(ROUND(1e6 * CAST(COUNT(*) FILTER (WHERE s >= thr) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS keep_micro
    FROM scored CROSS JOIN thresholds
    GROUP BY 1
    """,
)
def t_quality_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-rate curve over quality-score thresholds — the calibration
    report behind every 'filter at 0.x' decision: how much corpus survives
    each candidate cut. One scan computes the score; a row-local explode of
    9 literal thresholds fans it out (never a join, never a second scan);
    the 9-row aggregate shuffles once. The oracle re-derives the score
    bit-for-bit in DuckDB (double-cast literals, identical operation
    order), so the >= compares — the part that could diverge — are proven
    engine-identical at every boundary."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(X.quality_score("text").alias("s"))
    thr = F.explode(
        F.array(*[F.lit(i / 10.0) for i in range(1, 10)])
    ).alias("thr")
    sweep = scored.select("s", thr)
    return sweep.groupBy("thr").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_if(F.col("s") >= F.col("thr")).alias("n_keep"),
    ).select(
        F.round(F.col("thr") * 1e6).cast("long").alias("threshold_micro"),
        "n_docs",
        "n_keep",
        F.round(
            F.lit(1e6) * F.col("n_keep").cast("double") / F.col("n_docs")
        )
        .cast("long")
        .alias("keep_micro"),
    )
