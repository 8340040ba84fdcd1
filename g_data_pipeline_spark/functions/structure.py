"""Document structure / format profiling — the formatting-diversity
signals a pretraining mix needs (markdown-rich vs HTML-remnant vs plain
prose behaves differently under HTML-to-text extraction and chat-style
rendering; FineWeb/Dolma track extraction quality with exactly these
shapes). Pure scan-stage regexp counts + a deterministic format
classifier; patterns shared verbatim with the DuckDB twin
(query_defs/curation9.py t_format_profile).

Pattern notes for cross-engine identity: ``(^|\\n)`` anchors line
starts without multiline mode (RE2 and java.util.regex agree: ``^`` is
string start by default); HTML tags match only ELEMENT OPENINGS
(``</...`` closings excluded by the leading letter class), so
``<html><p>x</p></html>`` counts 2, not 4.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

STRUCTURE_PATTERNS: dict[str, str] = {
    "md_headers": r"(^|\n)#{1,6} ",
    "md_bullets": r"(^|\n)[-*] ",
    "code_fences": r"```",
    "md_links": r"\[[^\]]+\]\([^)]+\)",
    "html_tags": r"<[a-zA-Z][a-zA-Z0-9]*( [^<>]*)?>",
    "table_rows": r"(^|\n)\|",
}

# classifier thresholds: >= 2 element openings -> html;
# >= 2 markdown constructs -> markdown; else plain
HTML_MIN_TAGS = 2
MD_MIN_SIGNALS = 2
_MD_KEYS = ("md_headers", "md_bullets", "code_fences", "md_links", "table_rows")


def structure_signals(col: Column | str) -> dict[str, Column]:
    """Per-document structure counts (one regexp_count per pattern)."""
    c = F.col(col) if isinstance(col, str) else col
    return {
        name: F.regexp_count(c, F.lit(pat))
        for name, pat in STRUCTURE_PATTERNS.items()
    }


def doc_format(col: Column | str) -> Column:
    """'html' | 'markdown' | 'plain' from :func:`structure_signals`
    (html wins — markdown constructs inside HTML remnants mean the
    extractor failed, which is the html bucket's whole point)."""
    sig = structure_signals(col)
    md_score = sum((sig[k] for k in _MD_KEYS[1:]), sig[_MD_KEYS[0]])
    return (
        F.when(sig["html_tags"] >= HTML_MIN_TAGS, F.lit("html"))
        .when(md_score >= MD_MIN_SIGNALS, F.lit("markdown"))
        .otherwise(F.lit("plain"))
    )


def format_profile(
    df: DataFrame, text_col: str = "text", group_cols: list[str] | None = None
) -> DataFrame:
    """Per-(group, format) rollup: doc count + total structure counts
    per family. One aggregate; signals are scan-stage."""
    sig = structure_signals(text_col)
    base = df.select(
        *(group_cols or []),
        doc_format(text_col).alias("doc_format"),
        *[c.alias(f"__{k}") for k, c in sig.items()],
    )
    keys = [*(group_cols or []), "doc_format"]
    return base.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        *[
            F.sum(f"__{k}").cast("long").alias(f"n_{k}")
            for k in STRUCTURE_PATTERNS
        ],
    )
