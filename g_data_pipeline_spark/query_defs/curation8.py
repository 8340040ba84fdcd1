"""Round-7 extended oracle wave: the three graduation candidates built
earlier this round gate NOW instead of waiting for round 8 (first-green
for new coverage outranks a freshness refresh — the r4 precedent;
ROTATION.md documents the three demotions that paid for the slots).

- d_url_filter: functions/urls.url_filter_report over a planted
  multi-variant URL recipe exercising EVERY signal (blocked token,
  blocked TLD, deep path, digit-heavy host, param arity, oversize URL,
  missing host) — the RefinedWeb-style pre-fetch gate.
- d_split_leakage: pipelines.split_leakage_report with the UNSAFE
  row-level split the audit exists to catch — cross-split shingle
  containment rolled up per (split, other_split).
- d_decontaminate_spans: operators/contamination.decontaminate_spans —
  the GPT-3/FLAN-style surgical n-gram scrub (Brown et al. '20) with a
  benchmark derived deterministically from the corpus itself, gated on
  the reassembled text byte-for-byte.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators.sampling import sql_hash_bucket
from g_data_pipeline_spark.queries import register

_SQL_TOKS = r"string_split_regex(trim(lower(text)), '\s+')"

# ---------------------------------------------------------------------------
# d_url_filter: URL-level quality gate on a planted multi-variant recipe
# ---------------------------------------------------------------------------

# One URL variant per doc_id % 8, each tripping exactly one signal (or
# none — cases 0 and 5 are the keepers). Same literal recipe on both
# engines, like d_url_dedup's canonicalizer fixture.
_XS = "x" * 600  # oversize-URL payload (len > 512 gate)


def _sql_url_cases() -> str:
    d = "CAST(doc_id % 10 AS VARCHAR)"
    return f"""CASE doc_id % 8
      WHEN 0 THEN 'https://www.example' || {d} || '.com/a/b?x=1'
      WHEN 1 THEN 'https://play-casino' || {d} || '.example.com/promo'
      WHEN 2 THEN 'https://site' || {d} || '.click/p'
      WHEN 3 THEN 'https://deep' || {d}
                  || '.org/s1/s2/s3/s4/s5/s6/s7/s8/s9/s'
                  || CAST(doc_id % 5 AS VARCHAR)
      WHEN 4 THEN 'https://host' || CAST(doc_id % 100 AS VARCHAR)
                  || '12345678.net/x'
      WHEN 5 THEN 'https://p' || {d} || '.org/q?a=1&b=2&c=3&utm_x='
                  || CAST(doc_id % 7 AS VARCHAR)
      WHEN 6 THEN 'https://l' || {d} || '.org/' || '{_XS}'
      ELSE 'relative/path/' || CAST(doc_id AS VARCHAR)
    END"""


def _spark_url_cases() -> Column:
    d = (F.col("doc_id") % 10).cast("string")
    m = F.col("doc_id") % 8
    return (
        F.when(m == 0, F.concat(F.lit("https://www.example"), d, F.lit(".com/a/b?x=1")))
        .when(m == 1, F.concat(F.lit("https://play-casino"), d, F.lit(".example.com/promo")))
        .when(m == 2, F.concat(F.lit("https://site"), d, F.lit(".click/p")))
        .when(
            m == 3,
            F.concat(
                F.lit("https://deep"),
                d,
                F.lit(".org/s1/s2/s3/s4/s5/s6/s7/s8/s9/s"),
                (F.col("doc_id") % 5).cast("string"),
            ),
        )
        .when(
            m == 4,
            F.concat(
                F.lit("https://host"),
                (F.col("doc_id") % 100).cast("string"),
                F.lit("12345678.net/x"),
            ),
        )
        .when(
            m == 5,
            F.concat(
                F.lit("https://p"),
                d,
                F.lit(".org/q?a=1&b=2&c=3&utm_x="),
                (F.col("doc_id") % 7).cast("string"),
            ),
        )
        .when(m == 6, F.concat(F.lit("https://l"), d, F.lit(".org/"), F.lit(_XS)))
        .otherwise(F.concat(F.lit("relative/path/"), F.col("doc_id").cast("string")))
    )


# DuckDB twins of url_quality_signals' expressions (functions/urls.py) —
# same regexes, RE2-safe, no lookaround.
_SQL_HOST = "lower(regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)', 1))"
_SQL_PATH = "regexp_extract(url, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)', 1)"
_SQL_QUERY = "regexp_extract(url, '\\?([^#]*)', 1)"


@register(
    "d_url_filter",
    oracle=rf"""
    WITH u AS (
      SELECT doc_id, {_sql_url_cases()} AS url FROM documents
    ), sig AS (
      SELECT doc_id, url,
             {_SQL_HOST} AS host,
             len(list_filter(string_split({_SQL_PATH}, '/'),
                             x -> x <> '')) AS path_depth,
             CASE WHEN {_SQL_QUERY} = '' THEN 0
                  ELSE len(string_split({_SQL_QUERY}, '&')) END
               AS n_query_params,
             regexp_matches(lower(url), 'casino|viagra|xxx|porn')
               AS blocked_token
      FROM u
    ), sig2 AS (
      SELECT doc_id, url, host, path_depth, n_query_params, blocked_token,
             regexp_extract(host, '\.([a-z0-9-]+)$', 1) AS tld,
             length(regexp_replace(host, '[^0-9]', '', 'g'))
               * 1e6 / GREATEST(length(host), 1) AS ratio_scaled
      FROM sig
    )
    SELECT doc_id, host, tld,
           CAST(path_depth AS BIGINT) AS path_depth,
           CAST(n_query_params AS BIGINT) AS n_query_params,
           CAST(ROUND(ratio_scaled) AS BIGINT) AS host_digit_ratio_micro,
           CAST(blocked_token AS BIGINT) AS blocked_token,
           CAST(tld IN ('click', 'top', 'gq') AS BIGINT) AS blocked_tld,
           CAST((NOT blocked_token
                 AND tld NOT IN ('click', 'top', 'gq')
                 AND path_depth <= 8
                 AND length(url) <= 512
                 AND ratio_scaled <= 0.4 * 1e6
                 AND host <> '') AS BIGINT) AS keep
    FROM sig2
    """,
)
def d_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level quality gate (functions/urls.url_filter_report) on a
    planted 8-variant recipe — one variant per signal: clean keeper,
    blocklisted token in the host, blocklisted TLD, 10-deep path,
    digit-heavy host, high param arity (reported, not gated), oversize
    URL, and a scheme-less relative path (no host). The gate fails if ANY
    signal regex or the composed keep logic diverges between engines.
    Scan-stage only: zero shuffles, zero UDFs — the cheapest stage of the
    crawl tick, run before anything touches document content (RefinedWeb
    §3.1's URL filtering; reference has no crawl surface — extension)."""
    from g_data_pipeline_spark.functions.urls import url_filter_report

    docs = load_table(spark, sf_dir, "documents")
    rep = url_filter_report(
        docs.select("doc_id", _spark_url_cases().alias("url"))
    )
    return rep.select(
        "doc_id",
        "host",
        "tld",
        F.col("path_depth").cast("long").alias("path_depth"),
        F.col("n_query_params").cast("long").alias("n_query_params"),
        "host_digit_ratio_micro",
        F.col("blocked_token").cast("long").alias("blocked_token"),
        F.col("blocked_tld").cast("long").alias("blocked_tld"),
        F.col("keep").cast("long").alias("keep"),
    )


# ---------------------------------------------------------------------------
# d_split_leakage: post-split contamination audit (row-level = unsafe)
# ---------------------------------------------------------------------------

_SQL_SHINGLES3 = (
    "list_distinct([array_to_string(toks[i:i+2], ' ') "
    "for i in range(1, len(toks) - 1)])"
)
_LEAK_SPLITS = {"train": 0.8, "val": 0.1, "test": 0.1}
_LEAK_SEED = "leak-audit-v1"


@register(
    "d_split_leakage",
    oracle=rf"""
    WITH assigned AS (
      SELECT doc_id, text,
             CASE WHEN b < 800000 THEN 'train'
                  WHEN b < 900000 THEN 'val'
                  ELSE 'test' END AS split
      FROM (SELECT doc_id, text,
                   {sql_hash_bucket(['doc_id'], seed=_LEAK_SEED)} AS b
            FROM documents)
    ), sh AS (
      SELECT doc_id, split, {_SQL_SHINGLES3} AS sh
      FROM (SELECT doc_id, split, {_SQL_TOKS} AS toks FROM assigned)
      WHERE len(toks) >= 3
    ), posts AS (
      SELECT doc_id, split, unnest(sh) AS s FROM sh
    ), doc_sizes AS (
      SELECT doc_id, COUNT(*) AS n FROM posts GROUP BY doc_id
    ), src AS (
      SELECT DISTINCT split AS other_split, s FROM posts
    ), per_doc AS (
      SELECT p.doc_id, p.split, o.other_split, d.n,
             COUNT(*) AS shared
      FROM posts p
      JOIN src o ON p.s = o.s AND o.other_split <> p.split
      JOIN doc_sizes d ON d.doc_id = p.doc_id
      GROUP BY p.doc_id, p.split, o.other_split, d.n
    )
    SELECT split, other_split,
           CAST(COUNT(*) AS BIGINT) AS n_docs_overlapping,
           CAST(COUNT(*) FILTER (WHERE CAST(shared AS DOUBLE) / n >= 0.5)
                AS BIGINT) AS n_docs_leaked,
           CAST(ROUND(MAX(CAST(shared AS DOUBLE) / n) * 1000000) AS BIGINT)
             AS max_contamination_micro
    FROM per_doc GROUP BY split, other_split
    """,
)
def d_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-split leakage audit (pipelines.split_leakage_report) under the
    UNSAFE row-level split the audit exists to catch: documents are
    assigned train/val/test by a pure md5-bucket of doc_id alone, then
    cross-SPLIT word-3-gram containment is rolled up per (split,
    other_split) — n_docs_leaked > 0 means eval text is effectively IN
    train (the corpus's planted duplicates scatter across splits). The
    leakage-safe group-keyed sibling is pinned by tests/test_crawl_tick
    (zero rows on the same corpus). Shuffles key on shingle content and
    doc id, never all-pairs — identical scale shape to
    d_contamination_fraction."""
    from g_data_pipeline_spark.pipelines import split_leakage_report

    docs = load_table(spark, sf_dir, "documents")
    return split_leakage_report(
        docs,
        "doc_id",
        "text",
        group_cols=None,
        splits=dict(_LEAK_SPLITS),
        seed=_LEAK_SEED,
        n=3,
        leak_fraction=0.5,
    )


# ---------------------------------------------------------------------------
# d_decontaminate_spans: surgical benchmark n-gram scrub (Brown et al. '20)
# ---------------------------------------------------------------------------

_SCRUB_W = 13  # GPT-3's 13-gram collision window


@register(
    "d_decontaminate_spans",
    oracle=rf"""
    WITH toks AS (
      SELECT doc_id, text, {_SQL_TOKS} AS t FROM documents
    ), cwin AS (
      SELECT doc_id, i - 1 AS pos0,
             md5(array_to_string(t[i : i + {_SCRUB_W - 1}], ' ')) AS h
      FROM toks, LATERAL (SELECT unnest(generate_series(
           1, len(t) - {_SCRUB_W - 1})) AS i)
    ), bwin AS (
      SELECT DISTINCT h FROM cwin WHERE doc_id % 37 = 0
    ), hist AS (
      SELECT c.doc_id, c.pos0 FROM cwin c JOIN bwin b USING (h)
    ), fresh AS (
      SELECT c.* FROM cwin c ANTI JOIN bwin b USING (h)
    ), canon AS (
      SELECT h, kid, kpos FROM (
        SELECT h, doc_id AS kid, pos0 AS kpos,
               ROW_NUMBER() OVER (PARTITION BY h
                                  ORDER BY doc_id, pos0) AS rn
        FROM fresh) WHERE rn = 1
    ), bdup AS (
      SELECT f.doc_id, f.pos0
      FROM fresh f JOIN canon c USING (h)
      WHERE NOT (f.doc_id = c.kid AND f.pos0 = c.kpos)
    ), removed AS (
      SELECT doc_id, list(pos0) AS starts FROM (
        SELECT * FROM hist UNION ALL SELECT * FROM bdup
      ) GROUP BY doc_id
    ), assembled AS (
      SELECT tk.doc_id, tk.text, tk.t,
             list_transform(
               list_filter(range(1, len(tk.t) + 1),
                 j -> len(list_filter(COALESCE(r.starts, []),
                          s -> j >= s + 1 AND j <= s + {_SCRUB_W})) = 0),
               j -> tk.t[j]) AS kept
      FROM toks tk LEFT JOIN removed r USING (doc_id)
    )
    SELECT doc_id,
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
def d_decontaminate_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Surgical span decontamination (operators/contamination.
    decontaminate_spans): every 13-token window of a deterministic
    benchmark (documents with doc_id % 37 = 0 — both engines derive it
    identically) is cut from EVERY corpus occurrence, and — because the
    scrub rides incremental_substring_dedup — non-benchmark windows
    duplicated within the corpus also collapse to their canonical (min
    id, min pos) occurrence. Gated byte-for-byte on the reassembled text:
    DuckDB keeps the naive per-token containment filter while Spark runs
    the linear merged-interval reassembly, so the gate re-proves the
    round-7 rewrite on a second window width and a directory-driven cut
    set. Benchmark docs themselves collapse to '' (every window is in the
    directory). Scale shape: content-hash keyed joins against a
    benchmark directory that is built ONCE and broadcast-sized, never
    all-pairs (Brown et al. '20 §C dedup methodology)."""
    from g_data_pipeline_spark.operators.contamination import (
        decontaminate_spans,
    )

    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 37 == 0).select("text")
    cleaned, _directory = decontaminate_spans(
        docs, bench, "doc_id", "text", window_tokens=_SCRUB_W
    )
    return cleaned.select(
        F.col("id").alias("doc_id"),
        "dedup_text",
        "n_tokens",
        "n_tokens_kept",
    )


# ---------------------------------------------------------------------------
# d_curation_funnel: per-source drop-reason attrition report
# ---------------------------------------------------------------------------

_SQL_FP = (
    r"md5(trim(regexp_replace(regexp_replace("
    r"lower(text), '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))"
)


@register(
    "d_curation_funnel",
    oracle=rf"""
    WITH scored AS (
      SELECT doc_id, source,
             CASE WHEN trim(text) = '' THEN 0
                  ELSE CAST(len({_SQL_TOKS}) AS BIGINT) END AS n_tokens,
             CASE WHEN length(text) > 0
                  THEN len(regexp_extract_all(text, '[0-9]'))
                       / CAST(length(text) AS DOUBLE)
                  ELSE 0.0 END AS digit_ratio,
             {_SQL_FP} AS fp
      FROM documents
    ), canon AS (
      SELECT fp, MIN(doc_id) AS keep_id FROM scored
      WHERE n_tokens >= 10 AND digit_ratio <= 0.3 GROUP BY fp
    ), labeled AS (
      SELECT s.source, s.n_tokens,
             CASE WHEN s.n_tokens < 10 THEN 'too_few_tokens'
                  WHEN s.digit_ratio > 0.3 THEN 'digit_heavy'
                  WHEN s.doc_id <> c.keep_id THEN 'exact_duplicate'
                  ELSE 'kept' END AS stage
      FROM scored s LEFT JOIN canon c USING (fp)
    )
    SELECT source, stage,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS n_tokens
    FROM labeled GROUP BY source, stage
    """,
)
def d_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation attrition funnel (pipelines.curation_attrition rolled up
    per source): how many documents — and how many tokens — each
    curate_documents gate kills, with first-fail attribution
    (too_few_tokens -> digit_heavy -> exact_duplicate -> kept). The
    ledger Dolma/RefinedWeb publish alongside their corpora, and the
    observability layer for tuning gate thresholds: a source whose mass
    dies at one gate is cheap feed, one that dies at dedup is a mirror.
    Shape: the labeling costs ONE fingerprint-keyed aggregate + a
    content-keyed join (labels row-local), the rollup one more keyed
    aggregate; DuckDB reproduces gate expressions, survivorship, and
    first-fail ordering exactly."""
    from g_data_pipeline_spark.pipelines import curation_attrition

    docs = load_table(spark, sf_dir, "documents")
    labeled = curation_attrition(docs, "doc_id", "text")
    return labeled.groupBy("source", "stage").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )


# ---------------------------------------------------------------------------
# t_code_signals: The Stack / StarCoder-style code-curation gate
# ---------------------------------------------------------------------------

# Planted per-doc suffix: every 5th doc embeds a fenced, indented,
# symbol-dense code block (signals must fire), every 5th+1 an
# auto-generated minified blob (the gate must REJECT it), the rest stay
# raw prose (signals must stay quiet). Same literal recipe both engines.
_SQL_CODE_TEXT = (
    "CASE WHEN doc_id % 5 = 0 THEN text || chr(10) || '```' || chr(10)"
    " || 'if (x' || CAST(doc_id % 7 AS VARCHAR) || ' == '"
    " || CAST(doc_id % 3 AS VARCHAR) || ') {' || chr(10)"
    " || '    y[' || CAST(doc_id % 5 AS VARCHAR) || '] = (x + 1);'"
    " || chr(10) || '    return y;' || chr(10) || '}' || chr(10) || '```'"
    " WHEN doc_id % 5 = 1 THEN text || chr(10)"
    " || '// auto-generated do not edit' || chr(10) || repeat('z=1;', 300)"
    " ELSE text END"
)


def _spark_code_text() -> Column:
    d = F.col("doc_id")
    nl = F.lit("\n")
    code = F.concat(
        F.col("text"), nl, F.lit("```"), nl,
        F.lit("if (x"), (d % 7).cast("string"), F.lit(" == "),
        (d % 3).cast("string"), F.lit(") {"), nl,
        F.lit("    y["), (d % 5).cast("string"), F.lit("] = (x + 1);"),
        nl, F.lit("    return y;"), nl, F.lit("}"), nl, F.lit("```"),
    )
    autogen = F.concat(
        F.col("text"), nl, F.lit("// auto-generated do not edit"), nl,
        F.lit("z=1;" * 300),
    )
    return (
        F.when(d % 5 == 0, code)
        .when(d % 5 == 1, autogen)
        .otherwise(F.col("text"))
    )


_SQL_CODE_MICRO = "CAST(({num} * 1000000) // GREATEST({den}, 1) AS BIGINT)"


@register(
    "t_code_signals",
    oracle=rf"""
    WITH t AS (
      SELECT doc_id, {_SQL_CODE_TEXT} AS txt FROM documents
    ), geom AS (
      SELECT doc_id, txt,
             string_split(txt, chr(10)) AS lines,
             length(txt) AS total_len,
             length(regexp_replace(txt, '[^A-Za-z]', '', 'g')) AS n_alpha,
             length(regexp_replace(txt, '[^{{}}\[\]();=<>]', '', 'g'))
               AS n_symbol,
             len(string_split(txt, '```')) - 1 AS fence_count,
             regexp_matches(lower(txt),
               'auto-generated|do not edit|generated by') AS autogen
      FROM t
    ), s AS (
      SELECT doc_id, fence_count, autogen,
             len(lines) AS n_lines,
             list_max(list_transform(lines, x -> length(x)))
               AS max_line_len,
             list_sum(list_transform(lines, x -> length(x))) AS sum_len,
             len(list_filter(lines, x -> length(x) > 120)) AS n_long,
             len(list_filter(lines,
                 x -> regexp_matches(x, '^(    |\t)'))) AS n_indent,
             total_len, n_alpha, n_symbol
      FROM geom
    ), m AS (
      SELECT doc_id,
             CAST(n_lines AS BIGINT) AS n_lines,
             CAST(max_line_len AS BIGINT) AS max_line_len,
             {_SQL_CODE_MICRO.format(num="sum_len", den="n_lines")}
               AS avg_line_len_micro,
             {_SQL_CODE_MICRO.format(num="n_long", den="n_lines")}
               AS long_line_share_micro,
             {_SQL_CODE_MICRO.format(num="n_alpha", den="total_len")}
               AS alpha_ratio_micro,
             {_SQL_CODE_MICRO.format(num="n_symbol", den="total_len")}
               AS symbol_ratio_micro,
             {_SQL_CODE_MICRO.format(num="n_indent", den="n_lines")}
               AS indent_share_micro,
             CAST(fence_count AS BIGINT) AS fence_count,
             autogen, max_line_len AS _maxl
      FROM s
    )
    SELECT doc_id, n_lines, max_line_len, avg_line_len_micro,
           long_line_share_micro, alpha_ratio_micro, symbol_ratio_micro,
           indent_share_micro, fence_count,
           CAST(autogen AS BIGINT) AS autogen,
           CAST((symbol_ratio_micro > 30000 OR indent_share_micro > 200000
                 OR fence_count > 0) AS BIGINT) AS is_code_like,
           CAST(((symbol_ratio_micro > 30000 OR indent_share_micro > 200000
                  OR fence_count > 0)
                 AND NOT autogen AND _maxl <= 1000
                 AND alpha_ratio_micro >= 250000) AS BIGINT)
             AS keep_for_code
    FROM m
    """,
)
def t_code_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-data curation gate (functions/code.code_filter_report — The
    Stack / StarCoder data-prep filters) on a planted 3-variant recipe:
    every 5th document embeds a fenced + indented + symbol-dense code
    block (fence/indent/symbol signals and is_code_like must fire and
    the gate must KEEP it), every 5th+1 an auto-generated minified blob
    (marker + 1200-char line: the gate must REJECT it twice over), the
    rest stay prose (signals quiet). Every line-geometry and ratio
    signal hash-compares against DuckDB's list-kernel twin. Scan-stage
    only: one line-split per document, zero shuffles, zero UDFs."""
    from g_data_pipeline_spark.functions.code import code_filter_report

    docs = load_table(spark, sf_dir, "documents")
    rep = code_filter_report(
        docs.select("doc_id", _spark_code_text().alias("text"))
    )
    return rep.select(
        "doc_id",
        "n_lines",
        "max_line_len",
        "avg_line_len_micro",
        "long_line_share_micro",
        "alpha_ratio_micro",
        "symbol_ratio_micro",
        "indent_share_micro",
        "fence_count",
        F.col("autogen").cast("long").alias("autogen"),
        F.col("is_code_like").cast("long").alias("is_code_like"),
        F.col("keep_for_code").cast("long").alias("keep_for_code"),
    )
