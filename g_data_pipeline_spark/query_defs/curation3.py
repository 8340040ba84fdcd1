"""Round-5 curation wave 1: FineWeb/C4-style LINE-level quality filters and
HTML→text boilerplate extraction — the two standard web-corpus passes the
repo lacked (document-level Gopher stats live in operators/repetition.py).

The synthetic ``documents`` table stores one physical line per document, so
the line operators run over a deterministic re-chunked line view (10-token
lines — operators/lines.py:chunked_lines), mirrored in the oracles as
``list_transform(range(n), i -> array_to_string(list_slice(toks, ...)))``;
a real newline-delimited corpus passes ``split(text, '\\n')`` instead.
The HTML query synthesizes its markup in-query (identical literal wrapper
on both engines) because the corpus has no native HTML; the extraction
chain (functions/html.py) is the operator under test.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions import html as H
from g_data_pipeline_spark.operators import lines as L
from g_data_pipeline_spark.queries import register

# Shared DuckDB line view: whitespace-tokenize, re-chunk into 10-token
# lines (floor((n+9)/10.0) mirrors Spark's identical double floor).
_SQL_LINEVIEW = r"""
    toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ), linesv AS (
      SELECT doc_id,
             list_transform(
               range(0, CAST(floor((len(t) + 9) / 10.0) AS INT)),
               i -> array_to_string(list_slice(t, i * 10 + 1, i * 10 + 10),
                                    ' ')) AS lines
      FROM toks
    )
"""


@register(
    "t_line_quality",
    oracle=f"""
    WITH {_SQL_LINEVIEW}, pl AS (
      SELECT doc_id, unnest(lines) AS line FROM linesv
    ), stats AS (
      SELECT doc_id,
             COUNT(*) AS n_lines,
             COUNT(*) FILTER (WHERE len(string_split(line, ' ')) < 5)
               AS n_short_lines,
             COUNT(*) - COUNT(DISTINCT line) AS n_dup_lines,
             COUNT(*) FILTER (WHERE regexp_matches(line, '[.!?"]$'))
               AS n_terminal_punct_lines
      FROM pl GROUP BY doc_id
    )
    SELECT doc_id, n_lines, n_short_lines, n_dup_lines,
           n_terminal_punct_lines,
           CAST(CASE WHEN n_dup_lines * 10 <= n_lines * 3
                      AND n_short_lines * 2 <= n_lines
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM stats
    """,
)
def t_line_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style per-document line-quality report: line counts, short-line
    and duplicate-line counts, terminal-punctuation lines, composite keep
    flag (≤30% dup lines AND ≤50% short lines, integer cross-multiplied —
    no float ratio on the gated path). One explode + Spark's two-phase
    distinct aggregate (partial on (doc, line), final on doc) — two
    map-side-combined exchanges at any corpus size; no corpus-wide key
    exists to skew (plan-pinned in tests/test_line_quality.py)."""
    docs = load_table(spark, sf_dir, "documents")
    return L.line_quality_report(docs, L.chunked_lines(F.col("text")))


@register(
    "d_dup_line_removal",
    oracle=f"""
    WITH {_SQL_LINEVIEW}, pl AS (
      SELECT doc_id, line, pos FROM (
        SELECT doc_id, unnest(lines) AS line,
               unnest(range(0, len(lines))) AS pos
        FROM linesv)
    ), firsts AS (
      SELECT doc_id, line, MIN(pos) AS pos, COUNT(*) AS n_copies
      FROM pl GROUP BY doc_id, line
    )
    SELECT doc_id,
           CAST(SUM(n_copies) AS BIGINT) AS n_lines,
           COUNT(*) AS n_kept,
           md5(string_agg(line, chr(10) ORDER BY pos)) AS dedup_md5
    FROM firsts GROUP BY doc_id
    """,
)
def d_dup_line_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document duplicate-line removal (keep FIRST occurrence),
    gated on the md5 of the rebuilt text — the fingerprint downstream
    exact-dedup keys on, so the whole keep/order/rejoin pipeline is
    value-checked. Two map-side-combined keyed aggregates ((doc, line)
    min-pos, then doc rebuild via array_sort(collect_list(struct))) —
    never a window over raw lines."""
    docs = load_table(spark, sf_dir, "documents")
    return L.remove_duplicate_lines(docs, L.chunked_lines(F.col("text")))


def _sql_blocks(expr: str) -> str:
    out = rf"regexp_replace({expr}, '(?s)<script[^>]*>.*?</script>', ' ', 'g')"
    return rf"regexp_replace({out}, '(?s)<style[^>]*>.*?</style>', ' ', 'g')"


def _sql_html_to_text(expr: str) -> str:
    out = rf"regexp_replace({_sql_blocks(expr)}, '<[^>]+>', ' ', 'g')"
    for ent, plain in H.ENTITY_DECODES:
        # plain may itself be a single quote (&#39;) — SQL-escape it.
        out = f"replace({out}, '{ent}', '{plain.replace(chr(39), chr(39) * 2)}')"
    return rf"trim(regexp_replace({out}, '\s+', ' ', 'g'))"


# The HTML wrapper planted around each document (IDENTICAL literal on both
# engines): head boilerplate with a script containing entity-escaped code,
# a style block, heading/paragraph markup, and an entity-rich footer.
_PRE = (
    '<html><head><title>d</title>'
    '<script type="text/javascript">var x = 1 &amp;&amp; 2;</script>'
    "<style>.nav {color: red}</style></head><body><h1>Doc</h1><p>"
)
_POST = (
    '</p><div class="footer">&copy; 2026 &amp; &lt;Example&gt;&nbsp;Corp'
    "</div></body></html>"
)


@register(
    "t_html_to_text",
    oracle=f"""
    WITH h AS (
      SELECT doc_id,
             '{_PRE}' || text || '{_POST}' AS html
      FROM documents
    )
    SELECT doc_id,
           CAST(len(regexp_extract_all({_sql_blocks('html')}, '<[^>]+>'))
                AS BIGINT) AS n_tags,
           CAST(length({_sql_html_to_text('html')}) AS BIGINT) AS clean_len,
           md5({_sql_html_to_text('html')}) AS clean_md5
    FROM h
    """,
)
def t_html_to_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML boilerplate extraction: strip <script>/<style> blocks, strip
    tags, decode entities (&amp; LAST — HTML5 double-escape rule),
    collapse whitespace. The corpus has no native HTML, so a fixed
    entity-rich wrapper is planted in-query on both engines and the
    extraction chain (functions/html.py — pure regexp_replace/replace
    expressions, zero UDFs) is gated on the md5 of the extracted text.
    Runs inside WholeStageCodegen at parquet-scan speed — the 100 TB WET
    path."""
    docs = load_table(spark, sf_dir, "documents")
    html = F.concat(F.lit(_PRE), F.col("text"), F.lit(_POST))
    clean = H.html_to_text(html)
    return docs.select(
        "doc_id",
        H.tag_count(html).cast("long").alias("n_tags"),
        F.length(clean).cast("long").alias("clean_len"),
        F.md5(clean).alias("clean_md5"),
    )
