"""Word-blocklist page gate — C4's "bad words" filter (Raffel '20
§2.2: drop any page containing a word from a blocklist; production
pipelines pass the "List of Dirty, Naughty, Obscene..." list or a
curated policy list). The repo had URL-token blocklists
(functions/urls.py) but no TEXT-side gate; this is the content half.

Same honest-detector shape as functions/synthetic.py: word-boundary
regex over lowercased text, one scan-stage regexp_count per document,
zero shuffle before the rollup; the word list is an ASCII literal
shared verbatim with the DuckDB oracle (engine-stable by the round-9
portability lint). The bundled DEFAULT_BLOCKLIST is a neutral
PLACEHOLDER (spam/scam marker phrases safe to print in a test log);
real deployments pass their curated list — the operator is the
machinery, not the list.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: placeholder list — real deployments pass a curated policy list
DEFAULT_BLOCKLIST: tuple[str, ...] = (
    "viagra",
    "casino bonus",
    "payday loan",
    "crypto giveaway",
    "work from home scam",
    "miracle cure",
)


import re as _re

#: the round-9 portability contract for oracle-shared alternations:
#: lowercase ASCII word chars, single internal spaces. Regex
#: metacharacters would silently change matching semantics in both the
#: Spark gate and any oracle sharing the alternation; non-ASCII words
#: diverge java.util.regex vs RE2 \b classes (CLAUDE.md round-9 gotcha).
_WORD_CONTRACT = _re.compile(r"^[a-z0-9]+(?: [a-z0-9]+)*$")


def blocklist_regex(words: tuple[str, ...] = DEFAULT_BLOCKLIST) -> str:
    r"""``\b(w1|w2|...)\b`` over the lowercased text. Multi-word entries
    match as literal phrases (single internal spaces). Entries are
    VALIDATED against the ASCII word/space contract (raising like
    save_hf_bpe does for spaces in symbols) — a custom list containing
    metacharacters (``.``, ``+``, ``(``, ``?``) or space runs would
    otherwise silently change semantics on both engines."""
    bad = [w for w in words if not _WORD_CONTRACT.fullmatch(w)]
    if bad:
        raise ValueError(
            "blocklist entries must be lowercase ASCII words separated by "
            f"single spaces (regex-metacharacter-free): {bad!r}"
        )
    return r"\b(" + "|".join(words) + r")\b"


def blocklist_hits(
    col: Column | str, words: tuple[str, ...] = DEFAULT_BLOCKLIST
) -> Column:
    """Total blocklisted-term occurrences in a document."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(F.lower(c), F.lit(blocklist_regex(words)))


def blocklist_report(
    df: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    words: tuple[str, ...] = DEFAULT_BLOCKLIST,
) -> DataFrame:
    """Per-group gate rollup: doc count, blocked docs (any hit), total
    hits, blocked micro rate (nonneg floor-div, engine-exact). The C4
    rule is page-level: ONE hit drops the page."""
    hits = blocklist_hits(text_col, words)
    base = df.select(
        *(group_cols or []),
        hits.alias("__hits"),
    ).withColumn("__blocked", (F.col("__hits") > 0).cast("int"))
    n = F.count(F.lit(1))
    s = F.sum("__blocked") * F.lit(1_000_000)
    aggs = [
        n.cast("long").alias("n_docs"),
        F.sum("__blocked").cast("long").alias("n_blocked"),
        F.sum("__hits").cast("long").alias("total_hits"),
        ((s - F.pmod(s, n)) / n).cast("long").alias("blocked_micro"),
    ]
    return (
        base.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else base.agg(*aggs)
    )
