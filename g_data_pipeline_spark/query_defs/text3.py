"""Round-5 text wave: bigram language-model scoring, corpus n-gram
novelty, language-balance and character-class profiles — the next ring of
corpus-health reports around the t_* family (SURVEY.md §2.7).

Determinism: the bigram LM reuses t_unigram_logprob's recipe (each
DISTINCT bigram's ln(c12/c1) micro-rounded ONCE, per-doc totals are
integer sums); every share is micro-scaled with one rounding; everything
else is counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register

_SQL_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


def _tokens() -> F.Column:
    return F.split(F.trim(F.lower("text")), r"\s+")


@register(
    "t_bigram_logprob",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_SQL_TOKS} AS tk FROM documents
    ), bg AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(tk)),
                                   i -> tk[i] || ' ' || tk[i+1])) AS b
      FROM t WHERE len(tk) >= 2
    ), c12 AS (
      SELECT b, COUNT(*) AS c FROM bg GROUP BY b
    ), c1 AS (
      SELECT split_part(b, ' ', 1) AS w1, COUNT(*) AS c FROM bg GROUP BY 1
    ), lm AS (
      SELECT c12.b,
             CAST(ROUND(ln(c12.c / CAST(c1.c AS DOUBLE)) * 1e6) AS BIGINT)
               AS logp_micro
      FROM c12 JOIN c1 ON split_part(c12.b, ' ', 1) = c1.w1
    )
    SELECT bg.doc_id,
           COUNT(*) AS n_bigrams,
           CAST(SUM(lm.logp_micro) AS BIGINT) AS sum_logp_micro
    FROM bg JOIN lm ON bg.b = lm.b
    GROUP BY bg.doc_id
    """,
)
def t_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document bigram LM score: mean ln P(w_i | w_{i-1}) under the
    corpus's own bigram model — one conditioning order deeper than
    t_unigram_logprob (catches shuffled-word soup the unigram model
    scores as fluent). Same determinism recipe: ln(c12/c1) micro-rounded
    ONCE per DISTINCT bigram, per-doc totals integer. Shuffles keyed on
    bigram content and doc_id only; the LM table is vocabulary², still
    data-bounded, and broadcasts when small."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", _tokens().alias("tk")).filter(
        F.size("tk") >= 2
    )
    bg = t.select(
        "doc_id",
        F.explode(
            F.zip_with(
                F.slice(F.col("tk"), 1, F.size("tk") - 1),
                F.slice(F.col("tk"), 2, F.size("tk") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            )
        ).alias("b"),
    )
    c12 = bg.groupBy("b").agg(F.count(F.lit(1)).alias("c12"))
    c1 = (
        bg.select(F.split_part(F.col("b"), F.lit(" "), F.lit(1)).alias("w1"))
        .groupBy("w1")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    lm = c12.join(
        c1, F.split_part(c12.b, F.lit(" "), F.lit(1)) == c1.w1
    ).select(
        "b",
        F.round(F.log(F.col("c12") / F.col("c1").cast("double")) * F.lit(1e6))
        .cast("long")
        .alias("logp_micro"),
    )
    return (
        bg.join(lm, "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp_micro").cast("long").alias("sum_logp_micro"),
        )
    )


@register(
    "t_ngram_novelty",
    oracle=rf"""
    WITH sets AS (
      SELECT doc_id,
             list_distinct([array_to_string(tk[i:i+2], ' ')
                            for i in range(1, len(tk) - 1)]) AS sh
      FROM (SELECT doc_id, {_SQL_TOKS} AS tk FROM documents)
      WHERE len(tk) >= 3
    ), posts AS (
      SELECT doc_id, unnest(sh) AS s FROM sets
    ), freq AS (
      SELECT s, COUNT(*) AS df FROM posts GROUP BY s
    )
    SELECT p.doc_id,
           COUNT(*) AS n_shingles,
           COUNT(*) FILTER (WHERE f.df = 1) AS n_unique,
           CAST(ROUND(COUNT(*) FILTER (WHERE f.df = 1) * 1e6
                      / CAST(COUNT(*) AS DOUBLE)) AS BIGINT)
             AS novelty_micro
    FROM posts p JOIN freq f USING (s)
    GROUP BY p.doc_id
    """,
)
def t_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document novelty: the fraction of a document's distinct word
    3-grams that appear NOWHERE else in the corpus (df=1) — near 0 flags
    boilerplate/templated text, near 1 flags genuinely fresh content (the
    inverse signal of the near-dup detectors, from the same shingle
    inverted index). Shuffles keyed on shingle content then doc_id; the
    df table is the same index d_ngram_jaccard_pairs builds."""
    docs = load_table(spark, sf_dir, "documents")
    tk = _tokens()
    sets = docs.select(
        "doc_id",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(tk) - 2),
                lambda i: F.concat_ws(" ", F.slice(tk, i, 3)),
            )
        ).alias("sh"),
    ).filter(F.size(tk) >= 3)
    posts = sets.select("doc_id", F.explode("sh").alias("s"))
    freq = posts.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    unique_hits = F.count_if(F.col("df") == 1)
    return (
        posts.join(freq, "s")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            unique_hits.alias("n_unique"),
            F.round(
                unique_hits * F.lit(1e6)
                / F.count(F.lit(1)).cast("double")
            )
            .cast("long")
            .alias("novelty_micro"),
        )
    )


@register(
    "t_lang_balance",
    oracle=rf"""
    WITH per AS (
      SELECT lang,
             COUNT(*) AS n_docs,
             SUM(CAST(length(text) AS BIGINT)) AS sum_chars,
             SUM(CAST(len({_SQL_TOKS}) AS BIGINT)) AS sum_tokens
      FROM documents GROUP BY lang
    ), tot AS (SELECT SUM(n_docs) AS total FROM per)
    SELECT lang, n_docs,
           CAST(sum_tokens AS BIGINT) AS sum_tokens,
           CAST(sum_chars AS BIGINT) AS sum_chars,
           CAST(ROUND(n_docs * 1e6 / CAST(total AS DOUBLE)) AS BIGINT)
             AS share_micro
    FROM per CROSS JOIN tot
    """,
)
def t_lang_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-balance report: docs/tokens/chars per language plus each
    language's share of the corpus — the table a multilingual mixture
    design starts from (feeds t_mixture_weights the way
    d_survivorship_report feeds dedup review). One lang-keyed aggregate
    + broadcast 1-row total."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length("text").cast("long")).cast("long").alias("sum_chars"),
        F.sum(F.size(_tokens()).cast("long"))
        .cast("long")
        .alias("sum_tokens"),
    )
    tot = per.agg(F.sum("n_docs").alias("total"))
    return per.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n_docs",
        "sum_tokens",
        "sum_chars",
        F.round(F.col("n_docs") * F.lit(1e6) / F.col("total").cast("double"))
        .cast("long")
        .alias("share_micro"),
    )


@register(
    "t_case_profile",
    oracle=r"""
    SELECT source,
           CAST(SUM(length(text)) AS BIGINT) AS n_chars,
           CAST(SUM(len(regexp_extract_all(text, '[A-Z]'))) AS BIGINT)
             AS n_upper,
           CAST(SUM(len(regexp_extract_all(text, '[0-9]'))) AS BIGINT)
             AS n_digit,
           CAST(SUM(len(regexp_extract_all(text, '\s'))) AS BIGINT)
             AS n_space
    FROM documents GROUP BY source
    """,
)
def t_case_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-class profile per source (upper/digit/whitespace
    volumes) — the aggregate sibling of the per-document
    t_quality_features ratios: a source whose uppercase or digit volume
    spikes is shouting or tabular data. One map-side-combined aggregate;
    the class counts are regexp_extract_all lengths, identical in Java
    regex and RE2 for these classes."""
    docs = load_table(spark, sf_dir, "documents")

    def n_matches(pat: str) -> F.Column:
        return F.sum(
            F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), 0)).cast(
                "long"
            )
        ).cast("long")

    return docs.groupBy("source").agg(
        F.sum(F.length("text").cast("long")).cast("long").alias("n_chars"),
        n_matches("[A-Z]").alias("n_upper"),
        n_matches("[0-9]").alias("n_digit"),
        n_matches(r"\s").alias("n_space"),
    )


@register("t_compression_signal", oracle=None)
def t_compression_signal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document zlib compression-ratio quality signal (rows-only BY
    DESIGN: DuckDB has no compress-and-measure function, so the exact
    twin lives in pytest — tests/test_grouped.py pins the Spark column
    bit-equal to driver-side ``zlib.compress`` over the whole corpus).

    ratio ~ 0.3 or below flags template/boilerplate spam (compresses
    away), ~1.0 flags high-entropy junk; prose sits between. The UDF is
    the sanctioned Arrow-batched scalar kernel from operators/grouped.py
    — one ArrowEvalPython node, no shuffle at all (flag thresholds are
    row-local), so the signal costs one corpus scan at any scale."""
    from g_data_pipeline_spark.operators.grouped import compression_ratio_udf

    docs = load_table(spark, sf_dir, "documents")
    ratio = compression_ratio_udf()(F.col("text"))
    return docs.select(
        "doc_id",
        "source",
        F.length("text").cast("long").alias("n_chars"),
        ratio.alias("zlib_ratio"),
    ).withColumn(
        "flag",
        F.when(F.col("zlib_ratio") < 0.30, F.lit("repetitive"))
        .when(F.col("zlib_ratio") > 0.95, F.lit("high_entropy"))
        .otherwise(F.lit("ok")),
    )
