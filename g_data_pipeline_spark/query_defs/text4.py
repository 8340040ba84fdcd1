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


# Fixed literal query for the BM25 demo — common corpus terms so tf/df
# paths all carry real mass.
_BM25_TERMS = ("join", "filter", "scan", "hash", "merge")

# Per-doc BM25 scores for _BM25_TERMS, shared by the lexical top-k and the
# hybrid RRF fusion (kept as one WITH block; consumers wrap it as a
# subquery).
_BM25_SCORES_SQL = rf"""
    WITH occ AS (
      SELECT doc_id,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS token
      FROM documents
      WHERE trim(text) <> ''
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dlen FROM occ GROUP BY doc_id
    ), stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(dlen) AS DOUBLE) / COUNT(*) AS avgdl
      FROM dl
    ), tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM occ
      WHERE token IN {str(tuple(_BM25_TERMS))}
      GROUP BY doc_id, token
    ), idf AS (
      SELECT tf.token,
             ln((stats.n_docs - COUNT(*) + CAST(0.5 AS DOUBLE))
                / (COUNT(*) + CAST(0.5 AS DOUBLE))
                + CAST(1.0 AS DOUBLE)) AS idf
      FROM tf, stats GROUP BY tf.token, stats.n_docs
    ), scored AS (
      SELECT tf.doc_id,
             CAST(ROUND(1e6 * (idf.idf
               * ((tf.tf * (CAST(1.2 AS DOUBLE) + CAST(1.0 AS DOUBLE)))
                  / (tf.tf + CAST(1.2 AS DOUBLE)
                     * (CAST(1.0 AS DOUBLE) - CAST(0.75 AS DOUBLE)
                        + CAST(0.75 AS DOUBLE)
                          * (dl.dlen / stats.avgdl)))))) AS BIGINT)
               AS s_micro
      FROM tf JOIN dl USING (doc_id), stats, idf
      WHERE idf.token = tf.token
    )
    SELECT doc_id,
           COUNT(*) AS n_hit_terms,
           CAST(SUM(s_micro) AS BIGINT) AS bm25_micro
    FROM scored GROUP BY doc_id
"""


def _bm25_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BM25 scores (doc_id, n_hit_terms, bm25_micro) for
    _BM25_TERMS — the Spark twin of _BM25_SCORES_SQL, shared by
    t_bm25_topk and v_hybrid_rrf.

    Scan discipline (round-6 rewrite; plan-pinned in tests/test_plans6.py):
    NO token explode, NO per-token shuffle, and exactly TWO corpus scans.
    Both passes project the same per-doc row (doc_id, dlen, tf per query
    term) with ARRAY-LOCAL counting — ``size(filter(tokens, t = term))``
    — so term frequency never leaves the row. Pass 1 reduces that
    projection to ONE stats row (n_docs, avgdl, and per-term document
    frequencies via count_if(tf>0) — idf needs nothing else); pass 2
    broadcast-joins the stats row back and evaluates the whole BM25 sum
    row-locally (each (doc, term) partial micro-rounded ONCE, integers
    summed after — bit-identical to the oracle's per-posting-row
    formulation). The previous shape re-derived a token explode in four
    branches and scanned `documents` five times per v_hybrid_rrf plan;
    column pruning diverges the branch subtrees, so ReuseExchange cannot
    collapse them — the fix is to not need reuse at all."""
    docs = load_table(spark, sf_dir, "documents")
    # Materialize the token array as a COLUMN before the per-term filters:
    # referencing a computed array inside a higher-order lambda re-runs
    # the regex split per element (measured 6x the whole query at sf0.1);
    # an attribute reference is a cheap array read.
    staged = docs.filter(F.trim("text") != "").select(
        "doc_id", X.tokens("text").alias("__toks")
    )
    tc = F.col("__toks")
    proj = staged.select(
        "doc_id",
        F.size(tc).alias("dlen"),
        *[
            F.size(F.filter(tc, lambda x: x == F.lit(t))).alias(f"__tf{i}")
            for i, t in enumerate(_BM25_TERMS)
        ],
    )
    # One row per doc_id THROUGH AN AGGREGATE: enforces the uniqueness
    # contract the length/tf semantics assume, and lands the tokenization
    # behind a shuffle so the post-shuffle stages (and any repeated
    # action — shuffle map outputs persist per plan) never re-tokenize.
    # The tf/dlen expressions evaluate map-side, once per document.
    per_doc = proj.groupBy("doc_id").agg(
        F.first("dlen").alias("dlen"),
        *[F.first(f"__tf{i}").alias(f"__tf{i}") for i in range(len(_BM25_TERMS))],
    )
    stats = per_doc.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dlen").cast("double") / F.count(F.lit(1))).alias("avgdl"),
        *[
            F.count_if(F.col(f"__tf{i}") > 0).alias(f"__df{i}")
            for i in range(len(_BM25_TERMS))
        ],
    )
    k1, b = F.lit(1.2), F.lit(0.75)

    def idf(i: int):
        return F.log(
            (F.col("n_docs") - F.col(f"__df{i}") + F.lit(0.5))
            / (F.col(f"__df{i}") + F.lit(0.5))
            + F.lit(1.0)
        )

    def s_micro(i: int):
        tf = F.col(f"__tf{i}")
        return F.when(
            tf > 0,
            F.round(
                F.lit(1e6)
                * (
                    idf(i)
                    * (
                        (tf * (k1 + F.lit(1.0)))
                        / (
                            tf
                            + k1
                            * (
                                F.lit(1.0)
                                - b
                                + b * (F.col("dlen") / F.col("avgdl"))
                            )
                        )
                    )
                )
            ).cast("long"),
        ).otherwise(F.lit(0).cast("long"))

    n = len(_BM25_TERMS)
    hit = sum(
        (F.col(f"__tf{i}") > 0).cast("long") for i in range(n)
    )
    score = sum(s_micro(i) for i in range(n))
    return (
        per_doc.crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            hit.alias("n_hit_terms"),
            score.cast("long").alias("bm25_micro"),
        )
        .filter(F.col("n_hit_terms") > 0)
    )


@register(
    "t_bm25_topk",
    oracle=f"""
    SELECT * FROM ({_BM25_SCORES_SQL})
    ORDER BY bm25_micro DESC, doc_id
    LIMIT 20
    """,
)
def t_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (Robertson–Spärck Jones, k1=1.2, b=0.75) ranked retrieval for
    a fixed term query — the lexical half of hybrid search next to
    v_cosine_topk's dense half. Scoring is explode-free: two corpus scans
    (plan-pinned, tests/test_plans6.py) each project a per-doc row with
    array-local ``size(filter(tokens, t = term))`` term counts — tf never
    leaves the row; pass 1 reduces to the 1-row corpus stats, pass 2
    broadcast-joins it back and evaluates the BM25 sum row-locally (see
    _bm25_scores). Determinism: each (doc, term)
    partial score is micro-rounded ONCE (the t_unigram_logprob ln recipe —
    integer sums after, never a float sum), and top-20 rides a full
    (score, doc_id) tiebreak. Scale: shuffles key on token/doc_id; the
    posting explode is the same shape as the shingle index — no all-pairs
    anywhere."""
    return (
        _bm25_scores(spark, sf_dir)
        .orderBy(F.desc("bm25_micro"), "doc_id")
        .limit(20)
    )


from g_data_pipeline_spark.functions.vectors import (  # noqa: E402
    cosine_sim,
    cosine_sim_with_norm,
    norm_sq_scaled,
    sql_cosine_sim,
)

_COS_Q = sql_cosine_sim("a.embedding", "b.embedding")


@register(
    "v_hybrid_rrf",
    oracle=f"""
    WITH dense AS (
      SELECT a.vec_id AS id, {_COS_Q} AS cos
      FROM embeddings a
      CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) b
      WHERE a.vec_id <> 0
    ), d AS (
      SELECT id, rn AS dense_rank FROM (
        SELECT id, ROW_NUMBER() OVER (ORDER BY cos DESC, id) AS rn
        FROM dense) WHERE rn <= 50
    ), l AS (
      SELECT doc_id AS id, rn AS lex_rank FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS rn
        FROM ({_BM25_SCORES_SQL})) WHERE rn <= 50
    )
    SELECT COALESCE(d.id, l.id) AS id,
           CAST(d.dense_rank AS BIGINT) AS dense_rank,
           CAST(l.lex_rank AS BIGINT) AS lex_rank,
           COALESCE(CAST(ROUND(1e6 / (60 + d.dense_rank)) AS BIGINT), 0)
             + COALESCE(CAST(ROUND(1e6 / (60 + l.lex_rank)) AS BIGINT), 0)
             AS rrf_micro
    FROM d FULL OUTER JOIN l ON d.id = l.id
    ORDER BY rrf_micro DESC, id
    LIMIT 20
    """,
)
def v_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al. '09,
    k=60): the BM25 lexical ranking over documents fused with the dense
    cosine ranking against a fixed query vector (vec_id 0) over the
    id-aligned embeddings — the standard two-tower merge every RAG stack
    runs. Each leg's top-50 contributes ROUND(1e6/(60+rank)) — ranks are
    deterministic integers, so the fused score is an exact integer sum;
    the final top-20 rides a (score, id) tiebreak. Scale: both rank
    windows run over leg SHORTLISTS (the dense leg's input is the
    broadcast-query cosine scan, the lexical leg's the |hit-docs| score
    table); the fusion join touches 50+50 rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    # Query norm computed ONCE on the one-row broadcast side
    # (functions/vectors.cosine_sim_with_norm) — bit-identical cosines,
    # ~2x off the dense scan (r10; the fold is CodegenFallback, so it
    # would otherwise re-run per corpus row).
    qv = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("q_vec"),
        norm_sq_scaled("embedding").alias("q_norm"),
    )
    dense = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(qv))
        .select(
            F.col("vec_id").alias("id"),
            cosine_sim_with_norm("embedding", "q_vec", "q_norm").alias(
                "cos"
            ),
        )
    )
    wd = Window.orderBy(F.desc("cos"), F.col("id"))
    d = (
        dense.withColumn("dense_rank", F.row_number().over(wd))
        .filter(F.col("dense_rank") <= 50)
        .select("id", F.col("dense_rank").cast("long").alias("dense_rank"))
    )
    wl = Window.orderBy(F.desc("bm25_micro"), F.col("doc_id"))
    lex = (
        _bm25_scores(spark, sf_dir)
        .withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= 50)
        .select(
            F.col("doc_id").alias("id"),
            F.col("lex_rank").cast("long").alias("lex_rank"),
        )
    )
    fused = d.join(lex, "id", "full_outer")
    leg = lambda rank: F.coalesce(  # noqa: E731
        F.round(F.lit(1e6) / (F.lit(60) + rank)).cast("long"), F.lit(0)
    )
    return fused.select(
        "id",
        "dense_rank",
        "lex_rank",
        (leg(F.col("dense_rank")) + leg(F.col("lex_rank")))
        .cast("long")
        .alias("rrf_micro"),
    ).orderBy(F.desc("rrf_micro"), "id").limit(20)


def rrf_fuse(dense_ranked: DataFrame, lex_ranked: DataFrame, top: int = 20) -> DataFrame:
    """Source-agnostic reciprocal-rank fusion (k=60) of two ranked legs
    ``(id, dense_rank)`` / ``(id, lex_rank)`` — the algebra v_hybrid_rrf
    holds its oracle with, shared so the dense leg is swappable (exact
    cosine vs the IVF-PQ index path) without touching the fusion."""
    fused = dense_ranked.join(lex_ranked, "id", "full_outer")
    leg = lambda rank: F.coalesce(  # noqa: E731
        F.round(F.lit(1e6) / (F.lit(60) + rank)).cast("long"), F.lit(0)
    )
    return fused.select(
        "id",
        "dense_rank",
        "lex_rank",
        (leg(F.col("dense_rank")) + leg(F.col("lex_rank")))
        .cast("long")
        .alias("rrf_micro"),
    ).orderBy(F.desc("rrf_micro"), "id").limit(top)


def _bm25_leg(spark: SparkSession, sf_dir: str) -> DataFrame:
    wl = Window.orderBy(F.desc("bm25_micro"), F.col("doc_id"))
    return (
        _bm25_scores(spark, sf_dir)
        .withColumn("lex_rank", F.row_number().over(wl))
        .filter(F.col("lex_rank") <= 50)
        .select(
            F.col("doc_id").alias("id"),
            F.col("lex_rank").cast("long").alias("lex_rank"),
        )
    )


@register("v_hybrid_rrf_pq", oracle=None, eager=True)  # codebook training collects at build
def v_hybrid_rrf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval with the dense leg served by the IVF-PQ index
    path (verdict r9 #4 — the at-scale composition: v_hybrid_rrf's exact
    brute-force cosine leg is the scorecard anchor; at 100x the two-tower
    merge takes its dense top-50 from the compressed index that already
    powers v_ivfpq_topk). Same query (vec_id 0), same BM25 lexical leg,
    same RRF algebra (rrf_fuse — which holds its oracle via
    v_hybrid_rrf), only the dense ranking swaps to IVF cells + ADC
    shortlist + exact re-rank. Rows-only (codebook training has no SQL
    twin); fusion-recall vs the exact-leg fusion and parity with the
    PERSISTED search_ivfpq_index leg are pinned in tests/test_pq.py.
    Scale: the dense leg reads 8 code bytes per candidate in probed
    cells only — at a 100 TB corpus that is the difference between
    scanning the full embedding matrix per query and reading a few
    cell partitions."""
    from g_data_pipeline_spark.operators.pq import ivfpq_topk

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec")
    )
    dense = ivfpq_topk(
        emb, queries, k=50, dim=64, n_centroids=16, n_probe=4,
        m_subspaces=8, n_codes=16, refine=4,
    ).select(
        F.col("vec_id").alias("id"),
        F.col("rank").cast("long").alias("dense_rank"),
    )
    return rrf_fuse(dense, _bm25_leg(spark, sf_dir))
