"""Text-analysis queries over ``documents``: token counting, quality
scoring, language ID, fingerprinting, shingling, plus a scalar-function
library sampler — every Spark expression paired with an ANSI-SQL twin.

All Spark sides are pure JVM expressions (functions/text.py) — no UDFs in
any text hot path, so these run at parquet-scan speed at 100 TB.

Oracle-parity notes: regexp syntax is kept to the portable subset (classes,
alternation, \\b, \\d); division results are single IEEE ops on identical
operands; md5 is identical by definition. ln/exp/round-to-odd-scales are
deliberately absent (libm / rounding-mode divergence across engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions import text as X
from g_data_pipeline_spark.queries import register

_STOP_EN = "|".join(X.STOPWORDS["en"])


@register(
    "t_token_stats",
    oracle=rf"""
    SELECT doc_id,
           length(text) AS n_chars,
           CASE WHEN trim(text) = '' THEN 0
                ELSE len(string_split_regex(trim(lower(text)), '\s+'))
           END AS n_tokens,
           len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
             AS n_bpe_tokens,
           len(regexp_extract_all(lower(text), '\b({_STOP_EN})\b'))
             AS n_stopwords
    FROM documents
    """,
)
def t_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting three ways: whitespace, BPE-ish regex, stopword hits."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        X.token_count("text").cast("long").alias("n_tokens"),
        X.bpe_token_count("text").cast("long").alias("n_bpe_tokens"),
        X.stopword_count("text", "en").cast("long").alias("n_stopwords"),
    )


@register(
    "t_quality_features",
    oracle=rf"""
    SELECT doc_id,
           CASE WHEN length(text) > 0
                THEN len(regexp_extract_all(text, '[.!?,;:]'))
                     / CAST(length(text) AS DOUBLE) END AS punct_ratio,
           CASE WHEN length(text) > 0
                THEN len(regexp_extract_all(text, '[0-9]'))
                     / CAST(length(text) AS DOUBLE) END AS digit_ratio,
           CASE WHEN n_tok > 0
                THEN len(regexp_extract_all(lower(text), '\b({_STOP_EN})\b'))
                     / CAST(n_tok AS DOUBLE) END AS stopword_ratio
    FROM (SELECT *, CASE WHEN trim(text) = '' THEN 0
                         ELSE len(string_split_regex(trim(lower(text)), '\s+'))
                    END AS n_tok
          FROM documents)
    """,
)
def t_quality_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality signals for training-data filtering (ratios of counts —
    single double divisions, engine-identical)."""
    docs = load_table(spark, sf_dir, "documents")
    feats = X.quality_features("text")
    return docs.select(
        "doc_id",
        feats["punct_ratio"].alias("punct_ratio"),
        feats["digit_ratio"].alias("digit_ratio"),
        feats["stopword_ratio"].alias("stopword_ratio"),
    )


def _sql_lang_scores() -> dict[str, str]:
    scores = {
        lang: rf"len(regexp_extract_all(lower(text), '\b({'|'.join(words)})\b'))"
        for lang, words in X.STOPWORDS.items()
    }
    scores["zh"] = r"len(regexp_extract_all(text, '[一-鿿]'))"
    return scores


@register(
    "t_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id,
             {', '.join(f"{sql} AS s_{lang}" for lang, sql in _sql_lang_scores().items())}
      FROM documents
    )
    SELECT doc_id,
           CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'unknown'
                WHEN s_en = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'en'
                WHEN s_de = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'de'
                WHEN s_fr = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'fr'
                WHEN s_es = greatest(s_en, s_de, s_fr, s_es, s_zh) THEN 'es'
                ELSE 'zh' END AS lang_pred
    FROM scored
    """,
)
def t_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword/script-count language heuristic with a fixed tie-break
    order (en,de,fr,es,zh)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.lang_id("text").alias("lang_pred"))


@register(
    "t_fingerprint",
    oracle=r"""
    SELECT doc_id,
           md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                   '\s+', ' ', 'g'))) AS fp
    FROM documents
    """,
)
def t_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprint: md5 of normalized text (lower, strip
    non-alphanumerics, collapse whitespace)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.fingerprint_md5("text").alias("fp"))


@register(
    "t_shingle_count",
    oracle=r"""
    SELECT doc_id,
           CASE WHEN len(toks) >= 3
                THEN len(list_distinct([array_to_string(toks[i:i+2], ' ')
                                        for i in range(1, len(toks) - 1)]))
                ELSE 0 END AS n_distinct_shingles
    FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
          FROM documents)
    """,
)
def t_shingle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-3-gram shingles per doc (the MinHash input signal),
    built array-native (sequence+transform, no explode)."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.size(F.array_distinct(X.word_shingles("text", 3)))
        .cast("long")
        .alias("n_distinct_shingles"),
    )


@register(
    "t_scalar_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name) AS up_name,
           substr(p_type, 1, 5) AS type5,
           concat_ws('-', p_brand, p_type) AS brand_type,
           length(p_name) AS name_len,
           reverse(p_brand) AS rev_brand,
           lpad(CAST(p_size AS VARCHAR), 4, '0') AS size4,
           abs(p_retailprice - 1000.0) AS price_dev,
           sqrt(p_retailprice) AS price_sqrt,
           floor(p_retailprice) AS price_floor,
           ceil(p_retailprice) AS price_ceil,
           greatest(p_size, 25) AS size_hi,
           least(p_size, 25) AS size_lo
    FROM part
    """,
)
def t_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String/math scalar-function sampler (the library the reference lacks
    entirely — SURVEY.md §2.2). Portable-semantics subset only."""
    part = load_table(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("up_name"),
        F.substring("p_type", 1, 5).alias("type5"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.length("p_name").cast("long").alias("name_len"),
        F.reverse("p_brand").alias("rev_brand"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size4"),
        F.abs(F.col("p_retailprice") - 1000.0).alias("price_dev"),
        F.sqrt("p_retailprice").alias("price_sqrt"),
        F.floor("p_retailprice").cast("double").alias("price_floor"),
        F.ceil("p_retailprice").cast("double").alias("price_ceil"),
        F.greatest("p_size", F.lit(25)).cast("long").alias("size_hi"),
        F.least("p_size", F.lit(25)).cast("long").alias("size_lo"),
    )


@register(
    "t_datetime_functions",
    oracle="""
    SELECT o_orderkey,
           year(o_orderdate) AS yr,
           month(o_orderdate) AS mo,
           day(o_orderdate) AS dy,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since
    FROM orders
    """,
)
def t_datetime_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Datetime scalar functions over timestamp columns."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofmonth("o_orderdate").cast("long").alias("dy"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.last_day(F.col("o_orderdate").cast("date")).alias("month_end"),
        F.datediff(
            F.col("o_orderdate").cast("date"),
            F.lit("1995-01-01").cast("date"),
        ).cast("long").alias("days_since"),
    )


@register(
    "t_chunk_documents",
    oracle=r"""
    SELECT doc_id,
           CAST(s // 28 AS BIGINT) AS chunk_idx,
           array_to_string(t[s + 1 : s + 32], ' ') AS chunk,
           CAST(LEAST(32, len(t) - s) AS BIGINT) AS n_tokens
    FROM (
      SELECT doc_id, t, unnest(range(0, len(t), 28)) AS s
      FROM (SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
            FROM documents
            WHERE len(trim(text)) > 0)
    )
    """,
)
def t_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document chunking: 32-token chunks with 4 tokens of overlap
    (stride 28) — the context-window preparation step of a training/
    embedding pipeline, array-native until the final explode (no UDF).
    DuckDB twin replays the same slicing with list ops."""
    docs = load_table(spark, sf_dir, "documents")
    ch = docs.select(
        "doc_id", F.explode(X.chunk_tokens("text", 32, overlap=4)).alias("c")
    )
    return ch.select(
        "doc_id",
        F.col("c.chunk_idx").cast("long").alias("chunk_idx"),
        F.col("c.chunk").alias("chunk"),
        F.col("c.n_tokens").cast("long").alias("n_tokens"),
    )


@register(
    "t_repetition_stats",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
      FROM documents
    ), base AS (
      SELECT doc_id,
             CAST(len(t) AS BIGINT) AS n_tokens,
             1.0 - CAST(len(list_distinct(t)) AS DOUBLE) / len(t)
               AS dup_token_ratio,
             CAST(len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
                  AS DOUBLE) / len(t) AS alpha_token_frac
      FROM toks
    ), big AS (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM toks WHERE len(t) >= 2
    ), top AS (
      SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_bigram_count,
             CAST(SUM(c) AS BIGINT) AS n_bigrams
      FROM (SELECT doc_id, bg, COUNT(*) AS c FROM big GROUP BY doc_id, bg)
      GROUP BY doc_id
    )
    SELECT base.doc_id, n_tokens, dup_token_ratio, alpha_token_frac,
           COALESCE(top_bigram_count, 0) AS top_bigram_count,
           COALESCE(CAST(top_bigram_count AS DOUBLE) / n_bigrams, 0.0)
             AS top_bigram_frac,
           (n_tokens >= 20 AND dup_token_ratio < 0.55
            AND COALESCE(CAST(top_bigram_count AS DOUBLE) / n_bigrams, 0.0)
                < 0.06
            AND alpha_token_frac >= 0.8) AS gopher_keep
    FROM base LEFT JOIN top ON base.doc_id = top.doc_id
    """,
)
def t_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition metrics + composite keep
    flag (operators/repetition.py): duplicate-token ratio, alphabetic-token
    fraction, top-bigram count/fraction. Every float is a single int/int
    division — bit-identical across engines."""
    from g_data_pipeline_spark.operators.repetition import repetition_stats

    docs = load_table(spark, sf_dir, "documents")
    return repetition_stats(docs, "doc_id", "text")


@register(
    "t_redact_pii",
    oracle=r"""
    WITH enriched AS (
      SELECT doc_id,
             text || ' contact user' || CAST(doc_id AS VARCHAR)
                  || '@example.com or +1-555-010' || CAST(doc_id % 10 AS VARCHAR)
                  || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7' AS raw
      FROM documents
    )
    SELECT doc_id,
           regexp_replace(
             regexp_replace(
               regexp_replace(raw,
                 '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>',
                 'g'),
               '\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}', '<PHONE>', 'g'),
             '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>',
             'g') AS redacted,
           len(regexp_extract_all(raw,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
             AS n_emails
    FROM enriched
    """,
)
def t_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails / phone numbers / IPv4 -> typed placeholders),
    the standard pre-training redaction pass — pure JVM regexp_replace, so
    it runs at scan speed on any corpus size. The synthetic corpus carries
    no PII, so the query deterministically enriches each doc with
    id-derived PII first (identically in both engines), making the
    redaction path non-trivially exercised and still oracle-gated."""
    docs = load_table(spark, sf_dir, "documents")
    raw = F.concat(
        F.col("text"),
        F.lit(" contact user"), F.col("doc_id").cast("string"),
        F.lit("@example.com or +1-555-010"),
        (F.col("doc_id") % 10).cast("string"),
        F.lit(" ip 10.0."), (F.col("doc_id") % 256).cast("string"),
        F.lit(".7"),
    )
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3,4}"
    ip_re = r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b"
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(raw, email_re, "<EMAIL>"), phone_re, "<PHONE>"
        ),
        ip_re,
        "<IP>",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.regexp_count(raw, F.lit(email_re)).cast("bigint").alias("n_emails"),
    )


@register(
    "t_top_ngrams",
    oracle=r"""
    SELECT bg, CAST(COUNT(*) AS BIGINT) AS n_docs_total,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs_distinct
    FROM (
      SELECT doc_id,
             unnest(list_transform(generate_series(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i + 1])) AS bg
      FROM (SELECT doc_id,
                   regexp_split_to_array(trim(lower(text)), '\s+') AS t
            FROM documents)
      WHERE len(t) >= 2
    )
    GROUP BY bg
    ORDER BY n_docs_total DESC, bg ASC
    LIMIT 20
    """,
)
def t_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 word bigrams (total occurrences + distinct-doc
    frequency, count-desc / bigram-asc tiebreak) — the vocabulary /
    boilerplate-detection scan. One explode + one grouped agg keyed on the
    bigram (content key: skew-bounded by true n-gram frequency), top-k via
    TakeOrdered — no global sort."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.explode(X.word_shingles("text", 2)).alias("bg")
        )
        .groupBy("bg")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs_total"),
            F.countDistinct("doc_id").cast("bigint").alias("n_docs_distinct"),
        )
        .orderBy(F.col("n_docs_total").desc(), F.col("bg").asc())
        .limit(20)
    )
