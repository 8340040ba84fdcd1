"""Corpus-statistics queries over ``documents``, wave 2: TF-IDF keyword
extraction, character-diversity quality scoring, and per-source vocabulary
statistics. All JVM-expression-only (no UDFs), shuffles keyed on content
(doc, token, source) — the shapes that survive a 100 TB corpus.

Determinism notes (same policy as queries.py's module docstring):
- Integer counts are exact everywhere.
- ``t_char_diversity`` is log-free by design: the Gini–Simpson index
  ``1 - Σc²/L²`` is computed from exact integer sums with one double
  multiply + divide at the end — bit-identical on any engine, unlike
  Shannon entropy whose per-term ``log`` last-bits differ between libm
  implementations.
- ``t_tfidf_topk`` does need ``ln``; scores are rounded to 6 decimals on
  BOTH engines before ranking (documented deviation, same as
  stddev/corr), and ties break on the token string.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.text import tokens
from g_data_pipeline_spark.operators.sampling import (
    hash_bucket_expr,
    sql_hash_bucket,
)
from g_data_pipeline_spark.queries import register

# DuckDB twin of functions.text.tokens(): lower, trim, split on whitespace.
_SQL_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


@register(
    "t_tfidf_topk",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM toks
      WHERE token <> '' GROUP BY doc_id, token
    ), df AS (
      SELECT token, COUNT(*) AS df FROM tf GROUP BY token
    ), n AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT tf.doc_id, tf.token, tf.tf, df.df,
             CAST(round(tf.tf * ln((n.n_docs + 1) / (df.df + 1.0)), 6)
                  AS DOUBLE) AS tfidf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n
    )
    SELECT doc_id, token, tf, df, tfidf, rank FROM (
      SELECT *, ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY tfidf DESC, token) AS rank
      FROM scored)
    WHERE rank <= 3
    """,
)
def t_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 keywords per document by smoothed TF-IDF
    (``tf · ln((N+1)/(df+1))``) — the classic keyword-extraction /
    relevance-weighting pass. Three content-keyed shuffles ((doc,token)
    count, token document-frequency, per-doc window) + one broadcast of
    the single-row corpus count; no UDFs, no cartesian. Scores rounded to
    6 decimals on both engines BEFORE ranking so the rank keys are
    bit-identical (ln last-bits differ across libm implementations)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            F.round(
                F.col("tf")
                * F.log((F.col("n_docs") + 1) / (F.col("df") + F.lit(1.0))),
                6,
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "token", "tf", "df", "tfidf", "rank")
    )


@register(
    "t_char_diversity",
    oracle=r"""
    SELECT doc_id,
           CAST(SUM(c) AS BIGINT) AS total_chars,
           COUNT(*) AS distinct_chars,
           1.0 - CAST(SUM(c * c) AS DOUBLE)
                 / (CAST(SUM(c) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)) AS gini
    FROM (
      SELECT doc_id, ch, COUNT(*) AS c
      FROM (SELECT doc_id,
                   unnest(regexp_extract_all(lower(text), '[\s\S]')) AS ch
            FROM documents)
      WHERE ch <> ''
      GROUP BY doc_id, ch
    )
    GROUP BY doc_id
    """,
)
def t_char_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-level Gini–Simpson diversity per document
    (``1 - Σc²/L²``): near 0 flags degenerate/spammy text (one repeated
    character), ~0.95 is normal prose — the log-free cousin of character
    entropy, chosen because it is EXACTLY deterministic: integer sums, one
    double multiply + divide at the end. Blank documents produce no rows
    (no characters to measure).

    Code-point splitting on BOTH engines: ``regexp_extract_all(text,
    '[\\s\\S]')`` — Java regex and DuckDB's RE2 both match character
    classes per CODE POINT, so a surrogate pair (emoji, rare CJK) is one
    cell on both sides ('.' would work too but excludes \\r on Java while
    RE2 includes it; the explicit class sidesteps line-terminator
    divergence entirely)."""
    docs = load_table(spark, sf_dir, "documents")
    chars = docs.select(
        "doc_id",
        F.explode(
            F.regexp_extract_all(F.lower("text"), F.lit(r"[\s\S]"), 0)
        ).alias("ch"),
    ).filter(F.col("ch") != "")
    per_char = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    total = F.sum("c").cast("long")
    return per_char.groupBy("doc_id").agg(
        total.alias("total_chars"),
        F.count(F.lit(1)).alias("distinct_chars"),
        (
            F.lit(1.0)
            - F.sum(F.col("c") * F.col("c")).cast("double")
            / (total.cast("double") * total.cast("double"))
        ).alias("gini"),
    )


@register(
    "t_vocab_stats",
    oracle=rf"""
    SELECT source,
           CAST(SUM(cnt) AS BIGINT) AS n_tokens,
           COUNT(*) AS n_types,
           CAST(SUM(CASE WHEN cnt = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS hapax_types,
           COUNT(*) / CAST(SUM(cnt) AS DOUBLE) AS type_token_ratio
    FROM (
      SELECT source, token, COUNT(*) AS cnt
      FROM (SELECT source, unnest({_SQL_TOKS}) AS token FROM documents)
      WHERE token <> ''
      GROUP BY source, token
    )
    GROUP BY source
    """,
)
def t_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary profile: token volume, distinct types, hapax
    legomena (frequency-1 types — the Zipf tail), and type/token ratio.
    The corpus-health metrics behind mixture and filtering decisions
    (a source whose TTR collapses is boilerplate; one that is all hapax is
    noise). Two keyed shuffles ((source, token) then source); all-integer
    aggregation with one final double division."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "source", F.explode(tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    per_tok = toks.groupBy("source", "token").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    return per_tok.groupBy("source").agg(
        F.sum("cnt").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("cnt") == 1, 1).otherwise(0))
        .cast("long")
        .alias("hapax_types"),
        (
            F.count(F.lit(1)).cast("double") / F.sum("cnt").cast("double")
        ).alias("type_token_ratio"),
    )


@register(
    "t_unigram_logprob",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), occ AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), lm AS (
      SELECT token,
             CAST(ROUND(ln(COUNT(*) / CAST((SELECT COUNT(*) FROM occ) AS DOUBLE))
                        * 1e6) AS BIGINT) AS logp_micro
      FROM occ GROUP BY token
    )
    SELECT o.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lm.logp_micro) AS BIGINT) AS sum_logp_micro,
           CAST(SUM(lm.logp_micro) AS DOUBLE) / 1e6 / COUNT(*) AS avg_logprob
    FROM occ o JOIN lm ON o.token = lm.token
    GROUP BY o.doc_id
    """,
)
def t_unigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document mean token log-probability under the corpus's own
    unigram language model — the KenLM-shaped fluency/quality filter
    (very negative = rare-token soup, near the corpus mode = ordinary
    prose). Determinism recipe for the float-laden sum: each DISTINCT
    token's ln(count/total) is scaled to an exact integer micro-logprob
    with ONE rounding (boundary risk per vocab entry, not per occurrence),
    and per-doc totals are integer sums — only the final
    mean is a double division. Shuffles: unigram count (token), LM join
    (token), doc aggregation (doc_id) — all content-keyed; the LM table is
    vocabulary-sized and broadcasts when small."""
    docs = load_table(spark, sf_dir, "documents")
    occ = docs.select(
        "doc_id", F.explode(tokens("text")).alias("token")
    ).filter(F.col("token") != "")
    total = occ.agg(F.count(F.lit(1)).alias("t"))
    lm = (
        occ.groupBy("token")
        .agg(F.count(F.lit(1)).alias("c"))
        .crossJoin(F.broadcast(total))
        .select(
            "token",
            F.round(F.log(F.col("c") / F.col("t").cast("double")) * 1e6)
            .cast("long")
            .alias("logp_micro"),
        )
    )
    return (
        occ.join(lm, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("logp_micro").cast("long").alias("sum_logp_micro"),
            (
                F.sum("logp_micro").cast("double")
                / F.lit(1e6)
                / F.count(F.lit(1))
            ).alias("avg_logprob"),
        )
    )


# DuckDB twin of the hashed-unigram bucket (md5 hex -> bigint -> % 4096),
# mirroring operators/sampling.py's engine-identical md5-bucket recipe.
_DSIR_BUCKET_SQL = (
    "CAST(('0x' || substring(md5(token), 1, 15)) AS BIGINT) % 4096"
)


@register(
    "t_dsir_weights",
    oracle=rf"""
    WITH occ AS (
      SELECT doc_id,
             CASE WHEN ({sql_hash_bucket(['doc_id'], seed='dsir-domain')})
                       < 250000 THEN 1 ELSE 0 END AS is_target,
             unnest({_SQL_TOKS}) AS token
      FROM documents
    ), occ2 AS (
      SELECT doc_id, is_target, {_DSIR_BUCKET_SQL} AS b
      FROM occ WHERE token <> ''
    ), lr AS (
      SELECT b,
             CAST(ROUND(ln(
               ((SUM(is_target) + 1.0)
                / ((SELECT COUNT(*) FROM occ2 WHERE is_target = 1) + 4096.0))
               / ((SUM(1 - is_target) + 1.0)
                  / ((SELECT COUNT(*) FROM occ2 WHERE is_target = 0) + 4096.0))
             ) * 1e6) AS BIGINT) AS lr_micro
      FROM occ2 GROUP BY b
    )
    SELECT o.doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(lr.lr_micro) AS BIGINT) AS sum_lr_micro,
           CAST(SUM(lr.lr_micro) AS DOUBLE) / 1e6 / COUNT(*) AS avg_log_ratio
    FROM occ2 o JOIN lr ON o.b = lr.b
    WHERE o.is_target = 0
    GROUP BY o.doc_id
    """,
)
def t_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score each RAW document by
    how target-like its hashed-unigram distribution is. A deterministic 25%
    of documents (md5 split, the sampling-op recipe) plays the target
    domain; tokens hash into 4096 buckets; each bucket's add-one-smoothed
    log probability ratio ln(p_target/p_raw) is rounded ONCE to an integer
    micro-score; a raw document's weight is the exact integer sum of its
    occurrences' bucket scores (mean exposed as one double division —
    same determinism recipe as t_unigram_logprob). High avg_log_ratio =
    resample into training. Shuffles: bucket stats (4096 rows), bucket
    join (keyed), doc aggregation — the bucket table always broadcasts."""
    docs = load_table(spark, sf_dir, "documents")
    is_target = F.when(
        hash_bucket_expr(["doc_id"], seed="dsir-domain") < 250_000, 1
    ).otherwise(0)
    occ = (
        docs.select(
            "doc_id",
            is_target.alias("is_target"),
            F.explode(tokens("text")).alias("token"),
        )
        .filter(F.col("token") != "")
        .select(
            "doc_id",
            "is_target",
            (
                F.conv(F.substring(F.md5("token"), 1, 15), 16, 10).cast("bigint")
                % 4096
            ).alias("b"),
        )
    )
    totals = occ.agg(
        F.sum("is_target").alias("t_total"),
        F.sum(1 - F.col("is_target")).alias("r_total"),
    )
    lr = (
        occ.groupBy("b")
        .agg(
            F.sum("is_target").alias("t_cnt"),
            F.sum(1 - F.col("is_target")).alias("r_cnt"),
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log(
                    ((F.col("t_cnt") + 1.0) / (F.col("t_total") + 4096.0))
                    / ((F.col("r_cnt") + 1.0) / (F.col("r_total") + 4096.0))
                )
                * 1e6
            )
            .cast("long")
            .alias("lr_micro"),
        )
    )
    return (
        occ.filter(F.col("is_target") == 0)
        .join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr_micro").cast("long").alias("sum_lr_micro"),
            (
                F.sum("lr_micro").cast("double") / F.lit(1e6) / F.count(F.lit(1))
            ).alias("avg_log_ratio"),
        )
    )


@register("t_bpe_tokenize", eager=True)  # rows-only: iterative merge learning has no SQL twin; eager: merges learned at build time
def t_bpe_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenization end-to-end (Sennrich 2016 / GPT-2 recipe): one
    distributed word-count pass -> driver-side merge learning over the
    compact vocabulary table (200 merges, deterministic tie-breaks) ->
    broadcast-model Arrow-batched encode. Output is the per-document token
    budget (n_words, n_bpe_tokens, n_unmerged) that drives packing and
    sharding. Rows-only; pure-Python parity + determinism pinned in
    tests/test_tokenizer.py."""
    from g_data_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        learn_bpe,
        word_counts,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    merges = learn_bpe(word_counts(docs, "text", top_words=20_000), 200)
    return bpe_encode(docs, "doc_id", "text", merges).withColumnRenamed(
        "id", "doc_id"
    )


@register("t_unigram_tokenize", eager=True)  # rows-only: EM training has no SQL twin; eager: model trained at build time
def t_unigram_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM tokenization end-to-end (Kudo '18, the SentencePiece
    default): one distributed word-count pass -> driver-side seed +
    hard-EM + prune (explicit tie-breaks, single-char coverage
    guarantee) -> broadcast-model Arrow-batched Viterbi encode. Output is
    the per-document token budget (n_words, n_pieces, n_unk). The encode
    demo runs over a deterministic 10% doc sample (doc_id % 10 = 0) —
    training statistics always use the FULL corpus word counts; the
    operator itself is linear in whatever frame it is given. Rows-only;
    exact-Python parity + layout invariance pinned in
    tests/test_unigram_lm.py."""
    from g_data_pipeline_spark.operators.tokenizer import word_counts
    from g_data_pipeline_spark.operators.unigram_lm import (
        train_unigram,
        unigram_encode,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    model = train_unigram(
        word_counts(docs, "text", top_words=5_000),
        vocab_size=300,
        seed_size=1_000,
    )
    sample = docs.filter(F.col("doc_id") % 10 == 0)
    return unigram_encode(sample, "doc_id", "text", model).withColumnRenamed(
        "id", "doc_id"
    )
