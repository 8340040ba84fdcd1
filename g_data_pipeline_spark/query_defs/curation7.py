"""Round-7 oracle wave: the vocabulary-coverage curve graduation, the
exact substring-dedup TRANSFORM gate (the report half graduated in round
6), the CCNet-style perplexity-bucketed corpus mixing report, and the
context-length fit report for packing decisions.

All four registered IN-WINDOW the round they land (ROTATION.md rule 3),
traded against the round-7 freshness budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.queries import register

_SQL_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"


def _floordiv(a: Column, b: Column) -> Column:
    """Exact FLOOR division of integer columns in exact arithmetic (no
    double quotient). Oracle twins use DuckDB's ``//``, which TRUNCATES
    toward zero — so every gated call site keeps both operands
    nonnegative (where floor == truncate); negative-scale quantities are
    negated into costs first (see t_perplexity_buckets)."""
    return ((a - F.pmod(a, b)) / b).cast("long")


# ---------------------------------------------------------------------------
# t_vocab_coverage: operators/tokenizer.vocab_coverage_curve, oracle-gated
# ---------------------------------------------------------------------------

_COVERAGE_PCTS = (0.5, 0.9, 0.95, 0.99)
_PCT_MICROS = ", ".join(str(int(round(p * 1e6))) for p in _COVERAGE_PCTS)


@register(
    "t_vocab_coverage",
    oracle=rf"""
    WITH tok AS (
      SELECT unnest({_SQL_TOKS}) AS tk FROM documents
    ), counts AS (
      SELECT tk, COUNT(*) AS cnt FROM tok GROUP BY tk
    ), ranked AS (
      SELECT tk, cnt,
             ROW_NUMBER() OVER (ORDER BY cnt DESC, tk) AS rn,
             SUM(cnt) OVER (ORDER BY cnt DESC, tk
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND CURRENT ROW) AS cum
      FROM counts
    ), tot AS (
      SELECT COUNT(*) AS nv, SUM(cnt) AS occ FROM counts
    ), pcts AS (
      SELECT unnest([{_PCT_MICROS}]) AS pct_micro
    )
    SELECT CAST(p.pct_micro AS BIGINT) AS pct_micro,
           CAST(MIN(r.rn) AS BIGINT) AS vocab_size,
           CAST((MIN_BY(r.cum, r.rn) * 1000000) // t.occ AS BIGINT)
             AS coverage_micro,
           CAST(t.nv AS BIGINT) AS n_distinct_tokens,
           CAST(t.occ AS BIGINT) AS total_occurrences
    FROM pcts p, tot t, ranked r
    WHERE r.cum * 1000000 >= p.pct_micro * t.occ
    GROUP BY p.pct_micro, t.nv, t.occ
    """,
)
def t_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve (operators/tokenizer.vocab_coverage_curve),
    oracle-gated: the smallest top-frequency token prefix covering each
    requested share of corpus occurrences — the vocabulary-sizing
    diagnostic run before committing to a tokenizer budget. Rank +
    cumulative occurrences run through the two-phase bucketed kernel
    (operators/windows.bucketed_row_index — exact count as the leading
    bucket, token-prefix refinement; no single-partition vocabulary sort),
    while DuckDB answers with a plain global window — proving the kernel
    reproduces the window bit-for-bit. Scale-up multiplications go through
    decimal(38,0) (ANSI-safe past 9.2e12 total occurrences); all outputs
    exact integers."""
    from g_data_pipeline_spark.operators.tokenizer import (
        vocab_coverage_curve,
    )

    docs = load_table(spark, sf_dir, "documents")
    curve = vocab_coverage_curve(docs, "text", _COVERAGE_PCTS)
    return curve.select(
        F.col("pct_micro").cast("long").alias("pct_micro"),
        F.col("vocab_size").cast("long").alias("vocab_size"),
        F.col("coverage_micro").cast("long").alias("coverage_micro"),
        "n_distinct_tokens",
        "total_occurrences",
    )


# ---------------------------------------------------------------------------
# d_substring_transform: the cut-and-reassemble half of Lee et al. '21
# ---------------------------------------------------------------------------

_W = 50  # SUBSTRING_WINDOW (query_defs/curation6.py) — the report's width


@register(
    "d_substring_transform",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents
    ), spans AS (
      SELECT doc_id, i - 1 AS pos0,
             md5(array_to_string(t[i : i + {_W - 1}], ' ')) AS h
      FROM toks, LATERAL (SELECT unnest(generate_series(
           1, len(t) - {_W - 1})) AS i)
    ), nd AS (
      SELECT h, COUNT(DISTINCT doc_id) AS nd FROM spans GROUP BY h
    ), canon AS (
      SELECT h, doc_id AS kid, pos0 AS kpos FROM (
        SELECT h, doc_id, pos0,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos0) AS rn
        FROM spans) WHERE rn = 1
    ), removed AS (
      SELECT s.doc_id, list(s.pos0) AS starts
      FROM spans s JOIN canon c USING (h) JOIN nd USING (h)
      WHERE nd.nd >= 2 AND NOT (s.doc_id = c.kid AND s.pos0 = c.kpos)
      GROUP BY s.doc_id
    ), assembled AS (
      SELECT tk.doc_id, tk.text, tk.t,
             list_transform(
               list_filter(range(1, len(tk.t) + 1),
                 j -> len(list_filter(COALESCE(r.starts, []),
                          s -> j >= s + 1 AND j <= s + {_W})) = 0),
               j -> tk.t[j]) AS kept
      FROM toks tk LEFT JOIN removed r USING (doc_id)
    )
    SELECT doc_id,
           -- COALESCE: DuckDB's array_to_string([]) is NULL, Spark's
           -- array_join([]) is '' (fully-cut documents)
           CASE WHEN trim(text) = '' THEN ''
                ELSE COALESCE(array_to_string(kept, ' '), '') END
             AS dedup_text,
           CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(t) END
                AS BIGINT) AS n_tokens,
           CAST(CASE WHEN trim(text) = '' THEN 0 ELSE len(kept) END
                AS BIGINT) AS n_tokens_kept
    FROM assembled
    """,
)
def d_substring_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact substring-level dedup TRANSFORM (Lee et al. '21), oracle-gated
    end-to-end on the REASSEMBLED TEXT: every cross-document duplicated
    50-token window is cut from its non-canonical occurrences and the
    surviving tokens rejoined — the string the training pipeline actually
    emits, compared byte-for-byte against DuckDB's independent
    reimplementation (which keeps the naive per-token containment filter;
    Spark runs the linear merged-interval reassembly — the gate therefore
    pins the round-7 rewrite's exactness, not just its fixtures). The
    signal half (`d_substring_dedup` report) graduated in round 6; this
    completes the operator. Scale shape: identical to the report (content-
    hash keyed shuffles, never all-pairs) plus one per-doc starts collect
    bounded by document length."""
    from g_data_pipeline_spark.operators.dedup import substring_dedup

    docs = load_table(spark, sf_dir, "documents")
    out = substring_dedup(docs, "doc_id", "text", window_tokens=_W)
    return out.select(
        F.col("id").alias("doc_id"),
        "dedup_text",
        "n_tokens",
        "n_tokens_kept",
    )


# ---------------------------------------------------------------------------
# t_perplexity_buckets: CCNet head/middle/tail corpus mixing report
# ---------------------------------------------------------------------------


@register(
    "t_perplexity_buckets",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents
    ), occ AS (
      SELECT doc_id, token FROM toks WHERE token <> ''
    ), lm AS (
      SELECT token,
             CAST(ROUND(ln(COUNT(*) / CAST((SELECT COUNT(*) FROM occ)
                                           AS DOUBLE)) * 1e6) AS BIGINT)
               AS logp_micro
      FROM occ GROUP BY token
    ), per_doc AS (
      SELECT o.doc_id, COUNT(*) AS n_tokens,
             SUM(lm.logp_micro) AS slp
      FROM occ o JOIN lm USING (token) GROUP BY o.doc_id
    ), scored AS (
      -- cost = NEGATED sum logprob (positive, so // == floor division;
      -- DuckDB's // truncates toward zero, Spark's kernel floors)
      SELECT d.source, p.doc_id, p.n_tokens,
             ((-p.slp) * 1000) // p.n_tokens AS cost_milli
      FROM per_doc p JOIN documents d USING (doc_id)
    ), tiered AS (
      SELECT source, n_tokens,
             NTILE(3) OVER (ORDER BY cost_milli, doc_id) AS tier
      FROM scored
    ), agg AS (
      SELECT source, tier, COUNT(*) AS n_docs, SUM(n_tokens) AS n_toks
      FROM tiered GROUP BY source, tier
    )
    SELECT source, CAST(tier AS BIGINT) AS tier,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_toks AS BIGINT) AS n_tokens,
           CAST((n_docs * 1000000)
                // SUM(n_docs) OVER (PARTITION BY source) AS BIGINT)
             AS docs_share_micro,
           CAST((n_toks * 1000000)
                // SUM(n_toks) OVER (PARTITION BY source) AS BIGINT)
             AS tok_share_micro
    FROM agg
    """,
)
def t_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. '20): every document
    scored under the corpus's own unigram LM (the t_unigram_logprob
    recipe — integer micro-logprobs, one rounding per vocab entry), split
    into GLOBAL head/middle/tail terciles of model fit (tier 1 = lowest
    LM cost = lowest perplexity), then the per-source tier composition —
    the standard quality-stratified input to corpus mixing ("keep head +
    middle of every source" etc.).

    Determinism: the tier order key is the exact NONNEGATIVE integer
    ``floor(-sum_logp_micro * 1000 / n_tokens)`` (positive cost scale so
    Spark's floor division and DuckDB's truncating ``//`` agree) with
    doc_id tiebreak, so NTILE assignment is engine-identical. Scale: the
    tercile runs through the two-phase bucketed NTILE kernel
    (operators/windows.bucketed_row_index + ntile_from_index — no
    fact-sized single-partition window; DuckDB uses the plain window,
    pinning kernel == NTILE bit-for-bit); shuffles key on token, doc_id,
    then (source, tier) — the shares window runs over the sources x 3
    rollup only. Known constant factor: the kernel derives its scored
    input twice (column pruning diverges the branches — CLAUDE.md r6
    ReuseExchange note), so the doc-sized LM rollup pipeline runs 2x;
    two parallel derivations of a per-doc rollup still beat one global
    sort of the corpus at any real scale."""
    from g_data_pipeline_spark.functions.text import tokens
    from g_data_pipeline_spark.operators.windows import (
        bucketed_row_index,
        ntile_from_index,
    )

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
    per_doc = (
        occ.join(lm, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("logp_micro").cast("long").alias("slp"),
        )
    )
    scored = per_doc.join(docs.select("doc_id", "source"), "doc_id").select(
        "source",
        "doc_id",
        "n_tokens",
        _floordiv(-F.col("slp") * F.lit(1000), F.col("n_tokens")).alias(
            "cost_milli"
        ),
    )
    # two-phase global rank: the ONLY bucket expr is a coarsening of the
    # LEADING order column (1e8-milli cost slices -> hundreds of buckets;
    # a second bucket on the tiebreak column would break the
    # lexicographic-coarsening invariant — ties on cost order by doc_id
    # WITHIN a cost bucket, they don't split across buckets)
    ranked = bucketed_row_index(
        scored,
        [("cost_milli", True), ("doc_id", True)],
        [(F.floor(F.col("cost_milli") / F.lit(100_000_000)), True)],
    )
    tiered = ranked.withColumn(
        "tier", ntile_from_index(F.col("__rn"), F.col("__total"), 3)
    )
    agg = tiered.groupBy("source", "tier").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
    w_src = Window.partitionBy("source")
    return agg.select(
        "source",
        F.col("tier").cast("long").alias("tier"),
        "n_docs",
        "n_tokens",
        _floordiv(
            F.col("n_docs") * F.lit(1_000_000),
            F.sum("n_docs").over(w_src),
        ).alias("docs_share_micro"),
        _floordiv(
            F.col("n_tokens") * F.lit(1_000_000),
            F.sum("n_tokens").over(w_src),
        ).alias("tok_share_micro"),
    )


# ---------------------------------------------------------------------------
# t_context_fit_report: sequence-length fit vs candidate context windows
# ---------------------------------------------------------------------------

_CTX_SIZES = (128, 256, 512, 1024, 2048)


def _ctx_sql_one(ctx: int) -> str:
    return f"""
      SELECT CAST({ctx} AS BIGINT) AS ctx,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(COUNT(*) FILTER (WHERE n > {ctx}) AS BIGINT)
               AS n_truncated,
             CAST(SUM(n) AS BIGINT) AS tokens_total,
             CAST(SUM(GREATEST(n - {ctx}, 0)) AS BIGINT) AS tokens_lost,
             CAST(COUNT(*) FILTER (WHERE n > 0) * {ctx}
                  - SUM(LEAST(n, {ctx})) AS BIGINT) AS padding_tokens,
             CAST((SUM(LEAST(n, {ctx})) * 1000000)
                  // (COUNT(*) FILTER (WHERE n > 0) * {ctx}) AS BIGINT)
               AS utilization_micro
      FROM lens"""


@register(
    "t_context_fit_report",
    oracle=rf"""
    WITH lens AS (
      SELECT CASE WHEN trim(text) = '' THEN 0
                  ELSE len({_SQL_TOKS}) END AS n
      FROM documents
    )
    {" UNION ALL ".join(_ctx_sql_one(c) for c in _CTX_SIZES)}
    ORDER BY ctx
    """,
)
def t_context_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window sizing report: for each candidate training context
    length, how much of the corpus truncates (docs + tokens lost past the
    window) and how much padding one-doc-per-sequence batching wastes
    (utilization = packed tokens / sequence slots) — the measurement
    behind choosing a context size and deciding whether sequence packing
    (t_pack_sequences) is worth its shuffle. ONE zero-join aggregate over
    per-doc token counts computes every context size's counters as
    map-side-combinable sums; the 5 report rows EXPLODE from the single
    folded row (a union of per-ctx selects would rescan the corpus per
    size). All-integer outputs; utilization floors via subtract-pmod."""
    from g_data_pipeline_spark.functions.text import token_count

    docs = load_table(spark, sf_dir, "documents")
    lens = docs.select(token_count("text").cast("long").alias("n"))
    n = F.col("n")
    aggs = [
        F.count(F.lit(1)).alias("__docs"),
        F.sum(n).alias("__total"),
        F.count_if(n > 0).alias("__seqs"),
    ]
    for c in _CTX_SIZES:
        aggs += [
            F.count_if(n > c).alias(f"__tr{c}"),
            F.sum(F.greatest(n - F.lit(c), F.lit(0))).alias(f"__lost{c}"),
            F.sum(F.least(n, F.lit(c))).alias(f"__packed{c}"),
        ]
    folded = lens.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).cast("long").alias("ctx"),
                F.col("__docs").cast("long").alias("n_docs"),
                F.col(f"__tr{c}").cast("long").alias("n_truncated"),
                F.col("__total").cast("long").alias("tokens_total"),
                F.col(f"__lost{c}").cast("long").alias("tokens_lost"),
                (F.col("__seqs") * F.lit(c) - F.col(f"__packed{c}"))
                .cast("long")
                .alias("padding_tokens"),
                _floordiv(
                    F.col(f"__packed{c}") * F.lit(1_000_000),
                    F.col("__seqs") * F.lit(c),
                ).alias("utilization_micro"),
            )
            for c in _CTX_SIZES
        ]
    )
    return (
        folded.select(F.explode(rows).alias("s"))
        .select("s.*")
        .orderBy("ctx")
    )
