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
# t_blocklist_gate: C4 "bad words" page filter
# ---------------------------------------------------------------------------


def _blocklist_oracle() -> str:
    from g_data_pipeline_spark.functions.blocklist import blocklist_regex

    rx = blocklist_regex()
    return f"""
    WITH planted AS (
      SELECT source,
             text || CASE CAST(doc_id % 11 AS INT)
               WHEN 0 THEN ' this miracle cure works instantly'
               WHEN 1 THEN ' claim your casino bonus and payday loan now'
               WHEN 2 THEN ' enjoyable casino nights and payday advances'
               ELSE '' END AS t
      FROM documents
    ), sig AS (
      SELECT source,
             len(regexp_extract_all(lower(t), '{rx}')) AS hits
      FROM planted
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_blocked,
           CAST(SUM(hits) AS BIGINT) AS total_hits,
           CAST(SUM(CASE WHEN hits > 0 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS blocked_micro
    FROM sig GROUP BY source
    """


@register("t_blocklist_gate", oracle=_blocklist_oracle())
def t_blocklist_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 word-blocklist page gate (functions/blocklist.py; Raffel '20
    §2.2 — ONE blocklisted term drops the page; the text-side twin of
    the r7 URL-token filter). Planted tails: doc_id%11==0 hits one
    term, ==1 hits two (counted separately in total_hits), ==2 plants
    NEAR-MISSES ('casino nights', 'payday advances' — the phrase/word-
    boundary exactness negatives, the synthetic-gate convention). Per
    source: docs, blocked docs, total hits, blocked micro rate.
    Zero-shuffle scan stage + one rollup; the word list is an ASCII
    literal shared verbatim by both engines."""
    from g_data_pipeline_spark.functions.blocklist import blocklist_report

    docs = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 11).cast("int")
    tail = (
        F.when(m == 0, F.lit(" this miracle cure works instantly"))
        .when(m == 1, F.lit(" claim your casino bonus and payday loan now"))
        .when(m == 2, F.lit(" enjoyable casino nights and payday advances"))
        .otherwise(F.lit(""))
    )
    planted = docs.select(
        "source", F.concat(F.col("text"), tail).alias("text")
    )
    return blocklist_report(planted, "text", ["source"])


# ---------------------------------------------------------------------------
# t_line_rules: C4 line keeps + Gopher format page-gates
# ---------------------------------------------------------------------------


@register(
    "t_line_rules",
    oracle=r"""
    WITH planted AS (
      SELECT source,
             CASE WHEN CAST(doc_id % 8 AS INT) = 0 THEN '- ' ELSE '' END
             || text
             || CASE CAST(doc_id % 8 AS INT)
               WHEN 1 THEN ' read the full story ...'
               WHEN 2 THEN ' please enable javascript to view comments.'
               WHEN 3 THEN ' lorem ipsum dolor sit amet'
               WHEN 4 THEN ' window.onload = function() {'
               ELSE '' END AS t
      FROM documents
    ), toks AS (
      SELECT source, t, string_split_regex(trim(t), '\s+') AS tk
      FROM planted
    ), linesv AS (
      SELECT source, lower(t) AS lt,
             list_transform(
               range(0, CAST(floor((len(tk) + 9) / 10.0) AS INT)),
               i -> array_to_string(list_slice(tk, i * 10 + 1, i * 10 + 10),
                                    ' ')) AS lines
      FROM toks
    ), sig AS (
      SELECT source,
             len(lines) AS n_lines,
             len(list_filter(lines, l -> regexp_matches(l, '^[-*] ')))
               AS n_bullet,
             len(list_filter(lines, l -> regexp_matches(l, '\.\.\.\z')))
               AS n_ellipsis,
             len(list_filter(lines,
                             l -> regexp_matches(lower(l), 'javascript')))
               AS n_js,
             CASE WHEN regexp_matches(lt, 'lorem ipsum') THEN 1 ELSE 0 END
               AS lorem,
             CASE WHEN regexp_matches(lt, '[{]') THEN 1 ELSE 0 END AS brace,
             CASE WHEN len(list_filter(lines,
                    l -> regexp_matches(l, '^[-*] '))) * 10
                    > len(lines) * 9 THEN 1 ELSE 0 END AS bullet_heavy,
             CASE WHEN len(list_filter(lines,
                    l -> regexp_matches(l, '\.\.\.\z'))) * 10
                    > len(lines) * 3 THEN 1 ELSE 0 END AS ellipsis_heavy
      FROM linesv
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_lines) AS BIGINT) AS n_lines,
           CAST(SUM(n_bullet) AS BIGINT) AS n_bullet_start,
           CAST(SUM(n_ellipsis) AS BIGINT) AS n_ellipsis_end,
           CAST(SUM(n_js) AS BIGINT) AS n_javascript,
           CAST(SUM(lorem) AS BIGINT) AS n_lorem_docs,
           CAST(SUM(brace) AS BIGINT) AS n_brace_docs,
           CAST(SUM(bullet_heavy) AS BIGINT) AS n_bullet_heavy,
           CAST(SUM(ellipsis_heavy) AS BIGINT) AS n_ellipsis_heavy
    FROM sig GROUP BY source
    """,
)
def t_line_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line-rule + Gopher format-gate report
    (operators/lines.c4_gopher_line_rules): bullet-start lines, lines
    ending in an ellipsis, javascript-mentioning lines (C4 drops
    these), 'lorem ipsum' and curly-brace page flags (C4 drops those
    pages), and the Gopher bullet-heavy (>90% of lines) /
    ellipsis-heavy (>30%) page gates — integer cross-multiplied.
    Planted tails exercise every rule class on the re-chunked 10-token
    line view (the t_line_quality convention; a real corpus passes
    split(text, '\\n')). Array-local size(filter(...)) over a staged
    line array — zero explode, zero shuffle before the rollup."""
    from g_data_pipeline_spark.operators import lines as L

    docs = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 8).cast("int")
    planted = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.when(m == 0, F.lit("- ")).otherwise(F.lit("")),
            F.col("text"),
            F.when(m == 1, F.lit(" read the full story ..."))
            .when(m == 2, F.lit(" please enable javascript to view comments."))
            .when(m == 3, F.lit(" lorem ipsum dolor sit amet"))
            .when(m == 4, F.lit(" window.onload = function() {"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )
    sig = L.c4_gopher_line_rules(
        planted, L.chunked_lines(F.col("text")), keep_cols=("source",)
    )
    return sig.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_lines").cast("long").alias("n_lines"),
        F.sum("n_bullet_start").cast("long").alias("n_bullet_start"),
        F.sum("n_ellipsis_end").cast("long").alias("n_ellipsis_end"),
        F.sum("n_javascript").cast("long").alias("n_javascript"),
        F.sum("has_lorem_ipsum").cast("long").alias("n_lorem_docs"),
        F.sum("has_brace").cast("long").alias("n_brace_docs"),
        F.sum("bullet_heavy").cast("long").alias("n_bullet_heavy"),
        F.sum("ellipsis_heavy").cast("long").alias("n_ellipsis_heavy"),
    )


# ---------------------------------------------------------------------------
# t_gopher_outliers: Gopher document-level length/shape gates
# ---------------------------------------------------------------------------


@register(
    "t_gopher_outliers",
    oracle=r"""
    WITH planted AS (
      SELECT source,
             CASE CAST(doc_id % 9 AS INT)
               WHEN 0 THEN 'a b c d e'
               WHEN 1 THEN text || ' # # # # # # # # # # # #'
               WHEN 2 THEN text || ' ' || array_to_string(
                 list_transform(range(0, 30), i -> CAST(1000 + i AS VARCHAR)),
                 ' ')
               ELSE text END AS t
      FROM documents
    ), toks AS (
      SELECT source, t, string_split_regex(trim(t), '\s+') AS tk
      FROM planted
    ), sig AS (
      SELECT source,
             len(tk) AS n,
             list_sum(list_transform(tk, w -> len(w))) AS chars,
             len(regexp_extract_all(t, '(#|\.\.\.)')) AS sym,
             len(list_filter(tk, w -> regexp_matches(w, '[a-zA-Z]')))
               AS alpha
      FROM toks
    ), flags AS (
      SELECT source,
             CASE WHEN n < 50 THEN 1 ELSE 0 END AS too_short,
             CASE WHEN n > 90 THEN 1 ELSE 0 END AS too_long,
             CASE WHEN chars < 3 * n OR chars > 10 * n THEN 1 ELSE 0 END
               AS wordlen_out,
             CASE WHEN sym * 10 > n THEN 1 ELSE 0 END AS symbol_heavy,
             CASE WHEN alpha * 10 < n * 8 THEN 1 ELSE 0 END AS low_alpha
      FROM sig
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(too_short) AS BIGINT) AS n_too_short,
           CAST(SUM(too_long) AS BIGINT) AS n_too_long,
           CAST(SUM(wordlen_out) AS BIGINT) AS n_wordlen_out,
           CAST(SUM(symbol_heavy) AS BIGINT) AS n_symbol_heavy,
           CAST(SUM(low_alpha) AS BIGINT) AS n_low_alpha,
           CAST(SUM(CASE WHEN too_short + too_long + wordlen_out
                         + symbol_heavy + low_alpha = 0
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
    FROM flags GROUP BY source
    """,
)
def t_gopher_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher document-LEVEL quality gates (Rae '21 table A1): word
    count inside [min, max] (floor 50 = Gopher's real value — half the
    synthetic corpus fails it naturally; ceiling scaled to the corpus,
    real pipelines pass 100k), mean word length in [3, 10] (integer
    cross-multiplied: 3n <= chars <= 10n), symbol-to-word ratio (# and
    ... marks) <= 0.1, and >= 80% words containing an alphabetic char.
    Planted tails: doc_id%9==0 replaced by a 5x1-char doc (too short +
    word-length outlier), ==1 hash-spammed (symbol heavy), ==2 given 30
    numeric tokens (low alpha share). Per source: docs, per-rule
    failure counts, docs passing ALL rules. Token array staged once per
    row (the HOF-capture lesson); zero shuffle before the rollup."""
    docs = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 9).cast("int")
    numeric_tail = F.concat_ws(
        " ", F.transform(F.sequence(F.lit(0), F.lit(29)),
                         lambda i: (F.lit(1000) + i).cast("string"))
    )
    t = (
        F.when(m == 0, F.lit("a b c d e"))
        .when(m == 1, F.concat(F.col("text"), F.lit(" # # # # # # # # # # # #")))
        .when(m == 2, F.concat(F.col("text"), F.lit(" "), numeric_tail))
        .otherwise(F.col("text"))
    )
    staged = docs.select(
        "source",
        t.alias("t"),
        F.split(F.trim(t), r"\s+").alias("tk"),
    )
    tk = F.col("tk")
    n = F.size(tk)
    chars = F.aggregate(
        F.transform(tk, F.length), F.lit(0), lambda a, x: a + x
    )
    sym = F.regexp_count(F.col("t"), F.lit(r"(#|\.\.\.)"))
    alpha = F.size(F.filter(tk, lambda w: w.rlike("[a-zA-Z]")))
    flags = staged.select(
        "source",
        (n < 50).cast("int").alias("too_short"),
        (n > 90).cast("int").alias("too_long"),
        ((chars < 3 * n) | (chars > 10 * n)).cast("int").alias(
            "wordlen_out"
        ),
        (sym * F.lit(10) > n).cast("int").alias("symbol_heavy"),
        (alpha * F.lit(10) < n * F.lit(8)).cast("int").alias("low_alpha"),
    )
    fail_sum = (
        F.col("too_short") + F.col("too_long") + F.col("wordlen_out")
        + F.col("symbol_heavy") + F.col("low_alpha")
    )
    return flags.withColumn("__pass", (fail_sum == 0).cast("int")).groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("too_short").cast("long").alias("n_too_short"),
        F.sum("too_long").cast("long").alias("n_too_long"),
        F.sum("wordlen_out").cast("long").alias("n_wordlen_out"),
        F.sum("symbol_heavy").cast("long").alias("n_symbol_heavy"),
        F.sum("low_alpha").cast("long").alias("n_low_alpha"),
        F.sum("__pass").cast("long").alias("n_pass"),
    )


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


@register("d_incremental_boilerplate")
def d_incremental_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental boilerplate-line removal vs a growing capped owner
    directory (operators/incremental_boilerplate.py — the crawl-cadence
    form of d_boilerplate_removal, completing verdict #4's
    batch/incremental/streaming trio): even doc_ids play the archived
    history (their delta builds the >=3-distinct-doc owner sets), odd
    doc_ids are the new dump, cut against history+batch counts; the
    planted footer recipe matches d_boilerplate_removal so real
    cross-dump cuts occur. Rows-only BY DESIGN (the one-shot transform
    is the oracle-gated twin; within-dump agreement with it, replay
    stability incl. the cap-displacement edge, and the exactly-once
    streaming twin are pinned in tests/test_incremental_boilerplate.py)."""
    from g_data_pipeline_spark.operators.incremental_boilerplate import (
        DIRECTORY_SCHEMA,
        incremental_boilerplate_lines,
    )

    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(
                (F.col("doc_id") % 3).cast("int").isin(0, 1),
                F.lit("\n" + _FOOTER),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    history = planted.filter(F.col("doc_id") % 2 == 0)
    batch = planted.filter(F.col("doc_id") % 2 == 1)
    empty = spark.createDataFrame([], DIRECTORY_SCHEMA)
    _, directory = incremental_boilerplate_lines(
        history, empty, "doc_id", "text"
    )
    cleaned, _ = incremental_boilerplate_lines(
        batch, directory, "doc_id", "text"
    )
    return cleaned.select(
        F.col("id").alias("doc_id"), "n_lines", "n_removed", "cleaned"
    )


@register("t_hf_tokenizer_roundtrip", eager=True)  # trains BPE at build
def t_hf_tokenizer_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end HF tokenizer.json loop in the registry
    (operators/hf_tokenizer.py, r8 verdict #5): train BPE on the
    corpus, EXPORT to the public tokenizer.json schema, RELOAD, and
    encode every document under the reloaded model — the
    bring-your-own-production-tokenizer path a real budget/packing
    pipeline runs. Per source: docs, words, tokens under the
    round-tripped model, unmerged single-char tokens (the
    out-of-domain signal). Rows-only BY DESIGN (the mapInPandas encode
    has no SQL twin; byte-level round-trip identity and encode parity
    vs the merges path are pinned in tests/test_tokenizer.py)."""
    import os
    import tempfile

    from g_data_pipeline_spark.operators.hf_tokenizer import (
        load_hf_bpe,
        save_hf_bpe,
    )
    from g_data_pipeline_spark.operators.tokenizer import (
        bpe_encode,
        learn_bpe,
        word_counts,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    merges = learn_bpe(word_counts(docs, "text", top_words=2000), 100)
    with tempfile.TemporaryDirectory(prefix="hf_tok_") as tmp:
        path = os.path.join(tmp, "tokenizer.json")
        save_hf_bpe(merges, path)
        reloaded = load_hf_bpe(path)
    counted = bpe_encode(docs, "doc_id", "text", reloaded)
    return (
        docs.select(F.col("doc_id").alias("id"), "source")
        .join(counted, "id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_words").cast("long").alias("n_words"),
            F.sum("n_bpe_tokens").cast("long").alias("n_tokens"),
            F.sum("n_unmerged").cast("long").alias("n_unmerged"),
        )
    )


# ---------------------------------------------------------------------------
# d_c4_clean: the COMPOSED C4 page-cleaning transform
# ---------------------------------------------------------------------------


def _c4_clean_oracle() -> str:
    from g_data_pipeline_spark.functions.blocklist import blocklist_regex

    # the SAME alternation the operator compiles (shared-table rule:
    # a list edit can never silently diverge the oracle)
    return _C4_CLEAN_ORACLE_TEMPLATE.replace(
        "__BLOCKLIST_RE__", blocklist_regex()
    )


_C4_CLEAN_ORACLE_TEMPLATE = r"""
    WITH planted AS (
      SELECT doc_id,
             CASE CAST(doc_id % 10 AS INT)
               WHEN 0 THEN
                 'alpha beta gamma delta epsilon zeta eta theta iota one.'
                 || ' kappa lambda mu nu xi omicron pi rho sigma two.'
                 || ' tau upsilon phi chi psi omega alef bet gimel three.'
               WHEN 1 THEN text
                 || ' please enable javascript to view this page today.'
               WHEN 2 THEN text || ' lorem ipsum dolor sit amet'
               WHEN 3 THEN text || ' config = { key: value }'
               WHEN 4 THEN text
                 || ' claim your casino bonus now friends tonight.'
               ELSE text END AS t
      FROM documents
    ), toks AS (
      SELECT doc_id, t, string_split_regex(trim(t), '\s+') AS tk
      FROM planted
    ), linesv AS (
      SELECT doc_id, lower(t) AS lt,
             list_transform(
               range(0, CAST(floor((len(tk) + 9) / 10.0) AS INT)),
               i -> array_to_string(list_slice(tk, i * 10 + 1, i * 10 + 10),
                                    ' ')) AS lines
      FROM toks
    ), filtered AS (
      SELECT doc_id, lt,
             len(lines) AS n_lines,
             list_filter(lines, l ->
               len(string_split(l, ' ')) >= 5
               AND regexp_matches(l, '[.!?"''] *\z')
               AND NOT regexp_matches(lower(l), 'javascript')) AS kept
      FROM linesv
    ), built AS (
      SELECT doc_id, lt, n_lines,
             len(kept) AS n_kept_lines,
             COALESCE(array_to_string(kept, chr(10)), '') AS cleaned
      FROM filtered
    ), reasons AS (
      SELECT doc_id, n_lines, n_kept_lines, cleaned,
             CASE
               WHEN regexp_matches(lt, 'lorem ipsum') THEN 'lorem_ipsum'
               WHEN regexp_matches(lt, '[{]') THEN 'brace'
               WHEN regexp_matches(lt, '__BLOCKLIST_RE__')
                 THEN 'blocklist'
               WHEN len(regexp_extract_all(cleaned, '[.!?]')) < 3
                 THEN 'too_few_sentences'
               ELSE '' END AS drop_reason
      FROM built
    )
    SELECT doc_id,
           CAST(n_lines AS BIGINT) AS n_lines,
           CAST(n_kept_lines AS BIGINT) AS n_kept_lines,
           cleaned,
           drop_reason = '' AS page_keep,
           drop_reason
    FROM reasons
    """


@register("d_c4_clean", oracle=_c4_clean_oracle())
def d_c4_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPOSED C4 page-cleaning TRANSFORM
    (operators/lines.c4_clean; Raffel '20 §2.2 end-to-end): line keeps
    (>=5 words, terminal punctuation, no javascript) then page drops
    (lorem ipsum, curly brace, blocklisted term, <3 retained
    sentences) with a first-failed-rule drop_reason ledger — the
    transform whose report halves are t_line_rules, t_sentence_stats,
    and t_blocklist_gate. Gated BYTE-FOR-BYTE on the cleaned text of
    every doc (the d_paragraph_dedup convention) over planted
    keep/javascript/lorem/brace/blocklist classes; the punctuation-free
    base corpus cleans to '' and drops on the sentence floor. Zero
    explode, zero shuffle — pure scan-stage array algebra on the
    chunked line view (a real corpus passes split(text, '\\n'))."""
    from g_data_pipeline_spark.operators import lines as L

    docs = load_table(spark, sf_dir, "documents")
    m = (F.col("doc_id") % 10).cast("int")
    keep_doc = (
        "alpha beta gamma delta epsilon zeta eta theta iota one."
        " kappa lambda mu nu xi omicron pi rho sigma two."
        " tau upsilon phi chi psi omega alef bet gimel three."
    )
    planted = docs.select(
        "doc_id",
        F.when(m == 0, F.lit(keep_doc))
        .when(
            m == 1,
            F.concat(
                F.col("text"),
                F.lit(" please enable javascript to view this page today."),
            ),
        )
        .when(m == 2, F.concat(F.col("text"), F.lit(" lorem ipsum dolor sit amet")))
        .when(m == 3, F.concat(F.col("text"), F.lit(" config = { key: value }")))
        .when(
            m == 4,
            F.concat(
                F.col("text"),
                F.lit(" claim your casino bonus now friends tonight."),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return L.c4_clean(planted, L.chunked_lines(F.col("text")))


# ---------------------------------------------------------------------------
# e_preference_cycles: preference-pair TRANSITIVITY audit (3-cycles)
# ---------------------------------------------------------------------------


@register(
    "e_preference_cycles",
    oracle="""
    WITH raw AS (
      SELECT CAST(doc_id % 20 AS INT) AS pid,
             CAST(doc_id % 3 AS INT) AS u
      FROM documents
    ), edges AS (
      SELECT DISTINCT
             'p' || CAST(pid AS VARCHAR) AS prompt,
             'r' || CAST(CASE WHEN pid % 2 = 0 THEN u
                              WHEN u = 2 THEN 1 ELSE 0 END AS VARCHAR)
               AS chosen,
             'r' || CAST(CASE WHEN pid % 2 = 0 THEN (u + 1) % 3
                              WHEN u = 0 THEN 1 ELSE 2 END AS VARCHAR)
               AS rejected
      FROM raw
    ), cycles AS (
      SELECT e1.prompt
      FROM edges e1
      JOIN edges e2 ON e2.prompt = e1.prompt AND e2.chosen = e1.rejected
      JOIN edges e3 ON e3.prompt = e1.prompt AND e3.chosen = e2.rejected
                    AND e3.rejected = e1.chosen
      WHERE e1.chosen < e2.chosen AND e1.chosen < e3.chosen
    ), per_prompt AS (
      SELECT prompt, COUNT(*) AS n_cycles FROM cycles GROUP BY prompt
    )
    SELECT CAST((SELECT COUNT(DISTINCT prompt) FROM edges) AS BIGINT)
             AS n_prompts,
           CAST((SELECT COUNT(*) FROM edges) AS BIGINT) AS n_edges,
           CAST(COALESCE((SELECT COUNT(*) FROM per_prompt), 0) AS BIGINT)
             AS n_prompts_with_cycle,
           CAST(COALESCE((SELECT SUM(n_cycles) FROM per_prompt), 0)
                AS BIGINT) AS n_cycles
    """,
)
def e_preference_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Preference-pair TRANSITIVITY audit — the 3-cycle half of DPO
    label-noise detection (e_preference_audit's is_conflict catches
    2-cycles; a>b, b>c, c>a cycles are the next inconsistency class —
    annotation noise that no pairwise dedup sees): distinct directed
    (prompt, chosen, rejected) edges, then a triple content-keyed
    self-join within prompt; each cycle counted ONCE by anchoring on
    its lexicographically-least response. Planted recipe: even prompt
    classes carry a perfect r0>r1>r2>r0 cycle, odd classes an acyclic
    r0>r1>r2 chain — exactly half the prompts flag. Scale shape: edges
    dedup to (prompt, pair) cardinality; every join keys on (prompt,
    response) content — never all-pairs across prompts."""
    docs = load_table(spark, sf_dir, "documents")
    pid = (F.col("doc_id") % 20).cast("int")
    u = (F.col("doc_id") % 3).cast("int")
    chosen_i = F.when(pid % 2 == 0, u).otherwise(
        F.when(u == 2, F.lit(1)).otherwise(F.lit(0))
    )
    rejected_i = F.when(pid % 2 == 0, (u + 1) % 3).otherwise(
        F.when(u == 0, F.lit(1)).otherwise(F.lit(2))
    )
    edges = docs.select(
        F.concat(F.lit("p"), pid.cast("string")).alias("prompt"),
        F.concat(F.lit("r"), chosen_i.cast("string")).alias("chosen"),
        F.concat(F.lit("r"), rejected_i.cast("string")).alias("rejected"),
    ).distinct()
    e1 = edges.alias("e1")
    e2 = edges.alias("e2")
    e3 = edges.alias("e3")
    cycles = (
        e1.join(
            e2,
            (F.col("e2.prompt") == F.col("e1.prompt"))
            & (F.col("e2.chosen") == F.col("e1.rejected")),
        )
        .join(
            e3,
            (F.col("e3.prompt") == F.col("e1.prompt"))
            & (F.col("e3.chosen") == F.col("e2.rejected"))
            & (F.col("e3.rejected") == F.col("e1.chosen")),
        )
        .filter(
            (F.col("e1.chosen") < F.col("e2.chosen"))
            & (F.col("e1.chosen") < F.col("e3.chosen"))
        )
        .select(F.col("e1.prompt").alias("prompt"))
    )
    per_prompt = cycles.groupBy("prompt").agg(
        F.count(F.lit(1)).alias("n_cycles")
    )
    totals = edges.agg(
        F.count_distinct("prompt").cast("long").alias("n_prompts"),
        F.count(F.lit(1)).cast("long").alias("n_edges"),
    )
    cyc = per_prompt.agg(
        F.count(F.lit(1)).cast("long").alias("n_prompts_with_cycle"),
        F.coalesce(F.sum("n_cycles"), F.lit(0))
        .cast("long")
        .alias("n_cycles"),
    )
    # 1-row x 1-row combine: broadcast side -> BroadcastNestedLoopJoin
    # (the sweep's sanctioned shape), never CartesianProduct
    return totals.crossJoin(F.broadcast(cyc))


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
