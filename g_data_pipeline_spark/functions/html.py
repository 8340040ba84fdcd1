"""HTML → text boilerplate extraction as pure column expressions.

The ubiquitous first step of a web-corpus pipeline (WET-file extraction in
Common-Crawl-derived corpora; the reference engine ingests only clean CSV —
SURVEY.md §2.1 — so this surface is new here). Everything is a chain of
``regexp_replace`` / literal ``replace`` calls: JVM-side, codegen'd,
zero UDFs — the chain runs at parquet-scan speed and pushes column pruning
through untouched.

Oracle-parity notes (Java regex on Spark vs RE2 in DuckDB):
- `(?s)` inline dotall + non-greedy `.*?` are supported by both engines;
  DuckDB additionally needs the `'g'` option for global replace (Java
  replaces all matches by default).
- No backreferences or lookaround anywhere (RE2 has neither).
- Entity decoding uses LITERAL `replace`, not regex, and decodes
  ``&amp;`` LAST so ``&amp;lt;`` round-trips to ``&lt;`` (the HTML5
  double-escape rule), identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: (script/style stripping) — dotall non-greedy block removal.
SCRIPT_RE = r"(?s)<script[^>]*>.*?</script>"
STYLE_RE = r"(?s)<style[^>]*>.*?</style>"
#: Any remaining tag (after block removal there are no '>' inside).
TAG_RE = r"<[^>]+>"

#: Literal entity decodes, applied in order (amp LAST — see module doc).
ENTITY_DECODES: tuple[tuple[str, str], ...] = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&copy;", "(c)"),
    ("&amp;", "&"),
)


def strip_blocks(html: Column) -> Column:
    """Remove <script> and <style> blocks wholesale (content included)."""
    out = F.regexp_replace(html, SCRIPT_RE, " ")
    return F.regexp_replace(out, STYLE_RE, " ")


def strip_tags(html: Column) -> Column:
    """Replace every remaining tag with a space (so adjacent text nodes
    don't fuse into one token)."""
    return F.regexp_replace(html, TAG_RE, " ")


def decode_entities(text: Column) -> Column:
    out = text
    for ent, plain in ENTITY_DECODES:
        out = F.replace(out, F.lit(ent), F.lit(plain))
    return out


def collapse_ws(text: Column) -> Column:
    return F.trim(F.regexp_replace(text, r"\s+", " "))


def html_to_text(html: Column) -> Column:
    """Full extraction chain: blocks → tags → entities → whitespace."""
    return collapse_ws(decode_entities(strip_tags(strip_blocks(html))))


def tag_count(html: Column) -> Column:
    """Number of tags removed (counted after block-stripping, so a
    script's inner markup-looking content is not miscounted)."""
    return F.size(F.regexp_extract_all(strip_blocks(html), F.lit(TAG_RE), 0))


#: Closing block-level tags and <br> become LINE BREAKS in the line-aware
#: extractor (how WET-style extraction keeps paragraph structure).
BLOCK_BREAK_RE = (
    r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol|blockquote|section|article)>"
    r"|<br\s*/?>"
)


def html_to_text_lines(html: Column) -> Column:
    """Line-preserving extraction: closing block tags / <br> become
    newlines, everything else follows the :func:`html_to_text` chain, and
    whitespace collapses WITHIN lines only. This is the variant the
    line-level curation pass (operators/lines.py) consumes — the
    flat :func:`html_to_text` collapses '\\n' too and would fuse every
    paragraph into one line."""
    out = strip_blocks(html)
    out = F.regexp_replace(out, BLOCK_BREAK_RE, "\n")
    out = F.regexp_replace(out, TAG_RE, " ")
    out = decode_entities(out)
    out = F.regexp_replace(out, r"[ \t\r\f]+", " ")
    out = F.regexp_replace(out, r" ?\n ?", "\n")
    out = F.regexp_replace(out, r"\n+", "\n")
    return F.trim(out)
