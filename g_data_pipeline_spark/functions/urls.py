"""URL-level quality filtering — the stage production crawl pipelines run
BEFORE fetching/scoring content (RefinedWeb's URL filter, Dolma's
blocklists): a page can be rejected from its address alone, which at
crawl scale saves the whole content pipeline for the worst documents.

Pure JVM expressions (zero-shuffle scan-stage work, like the
canonicalizer in query_defs/curation4.py); every signal is
SQL-expressible (round-8 oracle candidate). Wordlists here are
deliberately tiny placeholder sets with the PLUMBING real — swap in the
published blocklists (e.g. the UT1 categories RefinedWeb used) by
passing longer tuples; the expressions scale as one compiled regex
alternation each.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: placeholder wordlists — real deployments pass curated blocklists
BLOCKED_TOKENS = ("casino", "viagra", "xxx", "porn")
BLOCKED_TLDS = ("click", "top", "gq")


def url_quality_signals(
    url: Column,
    blocked_tokens: tuple[str, ...] = BLOCKED_TOKENS,
    blocked_tlds: tuple[str, ...] = BLOCKED_TLDS,
    max_path_depth: int = 8,
    max_url_len: int = 512,
    max_host_digit_ratio: float = 0.4,
) -> dict[str, Column]:
    """Per-URL filter signals as named Columns:

    - ``host``, ``tld``: lowercased parse of the authority;
    - ``path_depth``: non-empty path segments (deep auto-generated trees
      are a spam signal);
    - ``n_query_params``: query-string arity (session/tracking farms);
    - ``host_digit_ratio``: digits / host length (DGA-ish hosts);
    - ``blocked_token``: any blocklist token as a SUBSTRING of the whole
      lowercased URL;
    - ``blocked_tld``: exact TLD membership;
    - ``keep``: the composed gate (nothing blocked, bounded depth/arity/
      length, host not digit-heavy).
    """
    low = F.lower(url)
    host = F.lower(
        F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)", 1)
    )
    tld = F.regexp_extract(host, r"\.([a-z0-9-]+)$", 1)
    path = F.regexp_extract(url, r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path_depth = F.size(
        F.filter(F.split(path, "/"), lambda x: x != F.lit(""))
    )
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    n_query_params = F.when(query == "", F.lit(0)).otherwise(
        F.size(F.split(query, "&"))
    )
    host_digits = F.length(F.regexp_replace(host, r"[^0-9]", ""))
    host_digit_ratio = host_digits / F.greatest(
        F.length(host), F.lit(1)
    ).cast("double")
    blocked_token = low.rlike("|".join(blocked_tokens))
    blocked_tld = tld.isin(*blocked_tlds)
    keep = (
        ~blocked_token
        & ~blocked_tld
        & (path_depth <= F.lit(int(max_path_depth)))
        & (F.length(url) <= F.lit(int(max_url_len)))
        & (host_digit_ratio <= F.lit(float(max_host_digit_ratio)))
        & (host != "")
    )
    return {
        "host": host,
        "tld": tld,
        "path_depth": path_depth,
        "n_query_params": n_query_params,
        "host_digit_ratio": host_digit_ratio,
        "blocked_token": blocked_token,
        "blocked_tld": blocked_tld,
        "keep": keep,
    }


def url_filter_report(
    df: DataFrame, url_col: str = "url", **kwargs
) -> DataFrame:
    """One row per input row with every signal column + the keep gate —
    the audit form (filter with ``.filter("keep")`` for the pipeline
    form). Scan-stage only: zero shuffles, zero UDFs."""
    sig = url_quality_signals(F.col(url_col), **kwargs)
    return df.select(
        "*",
        sig["host"].alias("host"),
        sig["tld"].alias("tld"),
        sig["path_depth"].alias("path_depth"),
        sig["n_query_params"].alias("n_query_params"),
        F.round(sig["host_digit_ratio"] * F.lit(1e6))
        .cast("long")
        .alias("host_digit_ratio_micro"),
        sig["blocked_token"].alias("blocked_token"),
        sig["blocked_tld"].alias("blocked_tld"),
        sig["keep"].alias("keep"),
    )
