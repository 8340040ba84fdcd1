"""Round-6 oracle wave: exact substring-level dedup (Lee et al. 2021),
the oracle graduation of the incremental profile's exact half, and the
fused quality scorecard's SQL-expressible surface.

All three are registered IN-WINDOW the round they land (ROTATION.md rule
3), traded against freshness slots per the round-6 budget.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register

#: Lee et al. 2021 ("Deduplicating Training Data Makes Language Models
#: Better") dedupe at ~50-token exact substrings; the synthetic corpus
#: genuinely contains cross-document duplicates at this width (280
#: distinct duplicated 50-token spans at sf0.01).
SUBSTRING_WINDOW = 50


@register(
    "d_substring_dedup",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ), spans AS (
      SELECT doc_id,
             md5(array_to_string(
               t[i : i + {SUBSTRING_WINDOW - 1}], ' ')) AS h
      FROM toks, LATERAL (SELECT unnest(generate_series(
           1, len(t) - {SUBSTRING_WINDOW - 1})) AS i)
    ), st AS (
      SELECT h, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY h
    ), pd AS (
      SELECT doc_id, COUNT(*) AS n_windows,
             COUNT(*) FILTER (WHERE nd >= 2) AS n_dup
      FROM spans JOIN st USING (h) GROUP BY doc_id
    )
    SELECT d.doc_id,
           CAST(COALESCE(n_windows, 0) AS BIGINT) AS n_windows,
           CAST(COALESCE(n_dup, 0) AS BIGINT) AS n_dup_windows,
           CAST(COALESCE(FLOOR((1e6 * n_dup) / n_windows), 0) AS BIGINT)
             AS dup_micro
    FROM documents d LEFT JOIN pd USING (doc_id)
    """,
)
def d_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup signal (Lee et al. '21): every sliding
    50-token window is hashed; a window whose content appears in >= 2
    DISTINCT documents marks a duplicated region, and each doc reports its
    window count, duplicated-window count, and the floored micro share —
    the signal production stacks compute before cutting the duplicated
    spans out. (The paper builds a suffix array; the Spark-native
    re-expression is the hash-window inverted index — the same shape as
    the shingle index, shuffling on CONTENT hashes, never all-pairs.)

    Scale: |spans| ~ |tokens|, so both the per-hash aggregate and the
    flag-back join shuffle on the md5 key — fully content-partitioned; the
    md5 (32 chars) caps shuffle width vs carrying 50-token strings. Total
    labeling: every doc comes back (LEFT JOIN), docs shorter than the
    window report 0/0/0."""
    w = SUBSTRING_WINDOW
    docs = load_table(spark, sf_dir, "documents")
    # tokens materialized as a COLUMN: a computed array referenced inside
    # the transform lambda re-runs the regex split per window position
    staged = docs.select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("__toks"),
    )
    tc = F.col("__toks")
    wins = F.when(
        F.size(tc) >= w,
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(w - 1)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tc, i, w))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    spans = staged.select("doc_id", F.explode(wins).alias("h"))
    stats = spans.groupBy("h").agg(F.count_distinct("doc_id").alias("nd"))
    per_doc = (
        spans.join(stats, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("__nw"),
            F.count_if(F.col("nd") >= 2).alias("__nd"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__nw", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("__nd", F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce(
                F.floor((F.lit(1e6) * F.col("__nd")) / F.col("__nw")),
                F.lit(0),
            )
            .cast("long")
            .alias("dup_micro"),
        )
    )


_MOMENT_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


def _moments_sql_one(c: str) -> str:
    s = f"CAST(SUM(CAST({c} AS DECIMAL(27,6))) AS DECIMAL(38,6))"
    # DECIMAL(19,6) (not 18): DuckDB executes an 18-digit x 18-digit
    # decimal multiply in int64 and overflows on price^2; 19 digits force
    # the int128 kernel. The product is exact either way, and the rescale
    # to (38,6) drops only zero sub-micro digits for <=2-decimal inputs —
    # numerically identical to Spark's decimal(18,6)^2 -> (37,12) -> (38,6).
    sq = (
        f"CAST(SUM(CAST(CAST({c} AS DECIMAL(19,6)) * CAST({c} AS "
        f"DECIMAL(19,6)) AS DECIMAL(38,6))) AS DECIMAL(38,6))"
    )
    return f"""
      SELECT '{c}' AS "column",
             CAST(COUNT({c}) AS BIGINT) AS cnt,
             CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS nulls,
             ROUND(CAST({s} AS DOUBLE) / CAST(COUNT({c}) AS DOUBLE), 6)
               AS mean,
             CAST(MIN({c}) AS DOUBLE) AS min,
             CAST(MAX({c}) AS DOUBLE) AS max,
             ROUND(SQRT(GREATEST(
               (CAST({sq} AS DOUBLE)
                - CAST({s} AS DOUBLE) * CAST({s} AS DOUBLE)
                  / CAST(COUNT({c}) AS DOUBLE))
               / (CAST(COUNT({c}) AS DOUBLE) - CAST(1.0 AS DOUBLE)),
               CAST(0.0 AS DOUBLE))), 6) AS stddev
      FROM lineitem"""


@register(
    "p_profile_moments",
    oracle=" UNION ALL ".join(_moments_sql_one(c) for c in _MOMENT_COLS)
    + ' ORDER BY "column"',
)
def p_profile_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EXACT half of the mergeable incremental profile, oracle-gated:
    per-ship-month partial states (operators/incremental_profile.py —
    count / nulls / decimal(38,6) sum / sum-of-squares / min / max) folded
    to corpus stats, proving partial->merge == direct-scan THROUGH THE
    DRIVER GATE, not just pytest. The sketch half (HLL distinct, KLL
    quantiles) stays rows-only in p_incremental_profile — estimates have
    no DuckDB twin.

    Exactness: decimal sums are associative (order- and split-free), so
    the month-partial fold reproduces the direct aggregate bit-for-bit;
    the derived mean/stddev are fixed-order double arithmetic identical
    to the oracle's expression tree, rounded once to 6dp on both engines
    (the standing variance-statistic policy). The 3 output rows EXPLODE
    from the single folded row."""
    from g_data_pipeline_spark.operators.incremental_profile import (
        _c,
        partial_profile,
    )

    li = load_table(spark, sf_dir, "lineitem")
    partials = partial_profile(
        li,
        _MOMENT_COLS,
        [F.date_trunc("month", "l_shipdate").alias("ingest_month")],
    )
    aggs = []
    for c in _MOMENT_COLS:
        aggs += [
            F.sum(_c(c, "cnt")).alias(_c(c, "cnt")),
            F.sum(_c(c, "nulls")).alias(_c(c, "nulls")),
            F.sum(_c(c, "sum")).alias(_c(c, "sum")),
            F.sum(_c(c, "sumsq")).alias(_c(c, "sumsq")),
            F.min(_c(c, "min")).alias(_c(c, "min")),
            F.max(_c(c, "max")).alias(_c(c, "max")),
        ]
    folded = partials.agg(*aggs)
    per_col = []
    for c in _MOMENT_COLS:
        cnt = F.col(_c(c, "cnt"))
        n = cnt.cast("double")
        s = F.col(_c(c, "sum")).cast("double")
        sq = F.col(_c(c, "sumsq")).cast("double")
        var = F.greatest(
            (sq - s * s / n) / (n - F.lit(1.0)), F.lit(0.0)
        )
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                cnt.cast("long").alias("cnt"),
                F.col(_c(c, "nulls")).cast("long").alias("nulls"),
                F.round(s / n, 6).alias("mean"),
                F.col(_c(c, "min")).alias("min"),
                F.col(_c(c, "max")).alias("max"),
                F.round(F.sqrt(var), 6).alias("stddev"),
            )
        )
    return (
        folded.select(F.explode(F.array(*per_col)).alias("s"))
        .select("s.*")
        .orderBy("column")
    )


# DuckDB view of the scorecard's token / bigram / line derivations —
# twins of functions/text.tokens, word_shingles(n=2) and
# operators/lines.chunked_lines (10-token lines).
_SQL_SCORECARD_VIEW = r"""
    base AS (
      SELECT doc_id, text,
             string_split_regex(trim(lower(text)), '\s+') AS t,
             string_split_regex(trim(text), '\s+') AS rt
      FROM documents
    ), feat AS (
      SELECT doc_id, text, t,
             CASE WHEN trim(text) = '' THEN 0 ELSE len(t) END AS n_tokens,
             len(t) AS n_tok_raw,
             len(list_distinct(t)) AS n_distinct_tok,
             len(list_filter(t, x -> regexp_matches(x, '[a-z]')))
               AS n_alpha_tok,
             CASE WHEN len(t) >= 2 THEN
               list_transform(range(0, len(t) - 1),
                 i -> array_to_string(list_slice(t, i + 1, i + 2), ' '))
             ELSE [] END AS bigrams,
             list_transform(
               range(0, CAST(floor((len(rt) + 9) / 10.0) AS INT)),
               i -> array_to_string(list_slice(rt, i * 10 + 1, i * 10 + 10),
                                    ' ')) AS lines
      FROM base
    ), topbg AS (
      SELECT doc_id, MAX(cnt) AS top_bigram_count FROM (
        SELECT doc_id, COUNT(*) AS cnt
        FROM (SELECT doc_id, unnest(bigrams) AS bg FROM feat)
        GROUP BY doc_id, bg)
      GROUP BY doc_id
    ), linestats AS (
      SELECT doc_id,
             COUNT(*) AS n_lines,
             COUNT(*) FILTER (WHERE len(string_split(line, ' ')) < 5)
               AS n_short_lines,
             COUNT(*) FILTER (WHERE regexp_matches(line, '[.!?"]$'))
               AS n_terminal_punct_lines
      FROM (SELECT doc_id, unnest(lines) AS line FROM feat)
      GROUP BY doc_id
    ), scard AS (
      SELECT f.doc_id,
             f.n_tokens,
             length(f.text) AS n_chars,
             CAST(1.0 AS DOUBLE) - CAST(f.n_distinct_tok AS DOUBLE)
               / f.n_tok_raw AS dup_token_ratio,
             CAST(f.n_alpha_tok AS DOUBLE) / f.n_tok_raw
               AS alpha_token_frac,
             COALESCE(tb.top_bigram_count, 0) AS top_bigram_count,
             COALESCE(
               CAST(COALESCE(tb.top_bigram_count, 0) AS DOUBLE)
                 / NULLIF(len(f.bigrams), 0),
               CAST(0.0 AS DOUBLE)) AS top_bigram_frac,
             len(f.lines) AS n_lines,
             len(f.lines) - len(list_distinct(f.lines)) AS n_dup_lines,
             ls.n_short_lines,
             ls.n_terminal_punct_lines
      FROM feat f
      LEFT JOIN topbg tb USING (doc_id)
      JOIN linestats ls USING (doc_id)
    )
"""


@register(
    "t_quality_scorecard",
    oracle=f"""
    WITH {_SQL_SCORECARD_VIEW}
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_chars AS BIGINT) AS n_chars,
           CAST(ROUND(1e6 * dup_token_ratio) AS BIGINT) AS dup_token_micro,
           CAST(ROUND(1e6 * alpha_token_frac) AS BIGINT)
             AS alpha_token_micro,
           CAST(top_bigram_count AS BIGINT) AS top_bigram_count,
           CAST(ROUND(1e6 * top_bigram_frac) AS BIGINT) AS top_bigram_micro,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_short_lines AS BIGINT) AS n_short_lines,
           CAST(n_dup_lines AS BIGINT) AS n_dup_lines,
           CAST(n_terminal_punct_lines AS BIGINT)
             AS n_terminal_punct_lines,
           (n_tokens >= 20
            AND dup_token_ratio < CAST(0.55 AS DOUBLE)
            AND top_bigram_frac < CAST(0.06 AS DOUBLE)
            AND alpha_token_frac >= CAST(0.8 AS DOUBLE)) AS gopher_keep,
           (n_dup_lines * 10 <= n_lines * 3
            AND n_short_lines * 2 <= n_lines) AS line_keep,
           (n_tokens >= 20
            AND dup_token_ratio < CAST(0.55 AS DOUBLE)
            AND top_bigram_frac < CAST(0.06 AS DOUBLE)
            AND alpha_token_frac >= CAST(0.8 AS DOUBLE)
            AND n_dup_lines * 10 <= n_lines * 3
            AND n_short_lines * 2 <= n_lines) AS keep
    FROM scard
    """,
)
def t_quality_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The fused zero-shuffle curation scorecard's SQL-expressible surface,
    oracle-gated: every Gopher/C4 signal and the composite keep decision
    from operators/scorecard.quality_scorecard (Scan -> Project, the
    one-pass production shape; the row-local sorted-run fold replaces the
    exploded top-bigram groupBy). Ratios micro-rounded once; the keep
    flags compare the RAW doubles on both engines, so the decision logic
    itself — not just the rounded report — is proven engine-identical.
    The float-free fields (quality_score, lang, fingerprint) already hold
    their own gated rows (t_quality_features, t_lang_id, t_fingerprint)."""
    from g_data_pipeline_spark.operators.scorecard import quality_scorecard

    docs = load_table(spark, sf_dir, "documents")
    sc = quality_scorecard(docs)
    return sc.select(
        "doc_id",
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(F.lit(1e6) * F.col("dup_token_ratio"))
        .cast("long")
        .alias("dup_token_micro"),
        F.round(F.lit(1e6) * F.col("alpha_token_frac"))
        .cast("long")
        .alias("alpha_token_micro"),
        "top_bigram_count",
        F.round(F.lit(1e6) * F.col("top_bigram_frac"))
        .cast("long")
        .alias("top_bigram_micro"),
        "n_lines",
        "n_short_lines",
        "n_dup_lines",
        "n_terminal_punct_lines",
        "gopher_keep",
        "line_keep",
        "keep",
    )
