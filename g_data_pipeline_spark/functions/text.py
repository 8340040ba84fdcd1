"""Text-analysis column builders: tokenization, token counting, quality
scoring, language ID, fingerprinting, shingles.

All builders are pure ``pyspark.sql.functions`` expression trees — JVM-side,
whole-stage-codegen'd, no Python UDFs — so they run at scan speed over 100 TB
of documents. (The reference has no text operators at all; its only string
op is lowercasing the *query text* — SURVEY.md §2.2.)

Every builder has exactly mirrorable ANSI-SQL semantics (see
query_defs/text.py for the DuckDB twins), which is what makes these
oracle-checkable rather than folklore.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small, fixed stopword sets per language — marker words for the n-gram/
# stopword-count language heuristic and the quality score. Deliberately tiny:
# the point is deterministic, engine-mirrorable scoring, not linguistics.
STOPWORDS = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "en", "por", "que"),
}

# Round 9 (r8 verdict #6): per-language stopword tables for lang-ROUTED
# quality scoring — the quality score's stopword signal was blind outside
# English right after token counts went CJK-aware. STOPWORDS above stays
# the lang-ID marker table (its gated queries are byte-identical);
# STOPWORDS_QUALITY is the routing superset: en/de/fr/es tuples are THE
# SAME OBJECTS (defaults never move — the CJK-mode discipline), plus
# small public function-word sets for the next top crawl languages.
# ASCII-only words so \b behaves identically in java.util.regex and RE2
# (both are ASCII-word-boundary on these classes by default).
STOPWORDS_QUALITY = {
    **STOPWORDS,
    "it": ("il", "lo", "la", "che", "di", "per", "non", "sono", "con", "una"),
    "pt": ("o", "os", "as", "de", "que", "em", "para", "com", "uma", "por"),
    "nl": ("de", "het", "een", "en", "van", "dat", "die", "niet", "met", "voor"),
}

PUNCT_CLASS = r"[.!?,;:]"
# BPE-ish token regex: word pieces or single non-space symbols.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Scripts written WITHOUT word-separating whitespace (Han ideographs,
# kana, hangul syllables): under the default whitespace tokenizer an
# entire CJK sentence counts as ONE token, which silently corrupts every
# token-based signal (stats, shingle dedup, packing budgets) on a
# multilingual crawl. ``mode="script"`` applies the mBERT/XLM fallback —
# each such character becomes its own token (wordpieces then split
# further; one char per token is the standard pre-tokenization), while
# whitespace-delimited scripts keep their words. EXPLICIT code-point
# ranges rather than \\p{script=...} classes so Spark's java.util.regex
# and DuckDB's RE2 agree by construction (oracle-mirrorable):
CJK_CHAR_CLASS = (
    "["
    "぀-ヿ"  # Hiragana + Katakana
    "㐀-䶿"  # CJK Unified Ideographs Extension A
    "一-鿿"  # CJK Unified Ideographs
    "가-힯"  # Hangul syllables
    "豈-﫿"  # CJK Compatibility Ideographs
    "]"
)

_TOKEN_MODES = ("whitespace", "script")


def _check_mode(mode: str) -> None:
    if mode not in _TOKEN_MODES:
        raise ValueError(f"token mode must be one of {_TOKEN_MODES}, got {mode!r}")


def space_out_cjk(col: Column | str) -> Column:
    """Surround every CJK character with spaces (the script-aware
    pre-tokenization pass). Identity for pure whitespace-script text."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_replace(c, f"({CJK_CHAR_CLASS})", " $1 ")


def tokens(col: Column | str, mode: str = "whitespace") -> Column:
    """Tokenization of trimmed, lowercased text -> array<string>.

    ``mode="whitespace"`` (default): split on whitespace runs — byte-
    identical to the historical behavior. ``mode="script"``: CJK
    characters are first spaced out (one token per character, the
    mBERT/XLM convention — see CJK_CHAR_CLASS), then the same
    whitespace split runs; Latin-only text tokenizes identically in
    both modes."""
    _check_mode(mode)
    c = F.col(col) if isinstance(col, str) else col
    if mode == "script":
        c = space_out_cjk(c)
    return F.split(F.trim(F.lower(c)), r"\s+")


def token_count(col: Column | str, mode: str = "whitespace") -> Column:
    """Token count under ``mode`` (0 for blank text)."""
    _check_mode(mode)
    c = F.col(col) if isinstance(col, str) else col
    if mode == "script":
        # count CJK chars directly + whitespace tokens of the residual
        # text (cheaper than materializing the spaced-out array)
        residual = F.regexp_replace(c, CJK_CHAR_CLASS, " ")
        return F.when(F.trim(residual) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(residual), r"\s+"))
        ) + F.regexp_count(c, F.lit(CJK_CHAR_CLASS))
    # (r10 note: a regexp_count(trim(c), '\s+')+1 form measured a WASH
    # vs size(split(...)) at sf0.1 — the array materialization is not
    # the cost here; kept as the historical form.)
    return F.when(F.trim(c) == "", F.lit(0)).otherwise(F.size(tokens(c)))


def bpe_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: alpha runs, digit runs, single symbols."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(c, F.lit(BPE_TOKEN_RE))


def _word_regex(words: tuple[str, ...]) -> str:
    return r"\b(" + "|".join(words) + r")\b"


def stopword_count(col: Column | str, lang: str = "en") -> Column:
    """Stopword hits under ``lang``'s table (STOPWORDS_QUALITY — the
    routing superset; en/de/fr/es are byte-identical to STOPWORDS)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_count(
        F.lower(c), F.lit(_word_regex(STOPWORDS_QUALITY[lang]))
    )


def routed_stopword_count(col: Column | str, lang_col: Column) -> Column:
    """Row-level language-ROUTED stopword count: each row is scored
    against the stopword table named by ``lang_col`` (typically
    :func:`lang_id_extended` output); unknown/unlisted languages fall
    back to the en table. One regexp_count per table, selected by a
    CASE cascade — scan-stage, zero shuffle."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    expr = F.regexp_count(
        lowered, F.lit(_word_regex(STOPWORDS_QUALITY["en"]))
    )
    for lang, words in STOPWORDS_QUALITY.items():
        if lang == "en":
            continue
        expr = F.when(
            lang_col == lang,
            F.regexp_count(lowered, F.lit(_word_regex(words))),
        ).otherwise(expr)
    return expr


def quality_features(col: Column | str, lang: str = "en") -> dict[str, Column]:
    """Deterministic quality signals for training-data filtering.
    ``lang`` routes the stopword signal's table (default en —
    byte-identical to the historical behavior)."""
    c = F.col(col) if isinstance(col, str) else col
    n_chars = F.length(c)
    n_tokens = token_count(c)
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.when(
            n_tokens > 0,
            (n_chars - (n_tokens - F.lit(1))) / n_tokens,
        ),
        "punct_ratio": F.when(
            n_chars > 0, F.regexp_count(c, F.lit(PUNCT_CLASS)) / n_chars
        ),
        "digit_ratio": F.when(
            n_chars > 0, F.regexp_count(c, F.lit(r"[0-9]")) / n_chars
        ),
        "upper_ratio": F.when(
            n_chars > 0, F.regexp_count(c, F.lit(r"[A-Z]")) / n_chars
        ),
        "stopword_ratio": F.when(
            n_tokens > 0, stopword_count(c, lang) / n_tokens
        ),
    }


def quality_score(col: Column | str, lang: str = "en") -> Column:
    """Single [0,1]-ish score: rewards mid-length docs with healthy stopword
    density, penalizes digit/punct soup. Fixed weights, fully deterministic.
    ``lang`` routes the stopword table (default en, byte-identical).
    """
    f = quality_features(col, lang)
    length_term = F.least(f["n_tokens"] / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.4) * F.least(F.coalesce(f["stopword_ratio"], F.lit(0.0)) * 4, F.lit(1.0))
        + F.lit(0.2)
        * (
            F.lit(1.0)
            - F.least(
                F.coalesce(f["digit_ratio"], F.lit(0.0))
                + F.coalesce(f["punct_ratio"], F.lit(0.0)),
                F.lit(1.0),
            )
        )
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    """Per-language stopword-hit counts (the n-gram heuristic's signal)."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    scores = {
        lang: F.regexp_count(lowered, F.lit(_word_regex(words)))
        for lang, words in STOPWORDS.items()
    }
    # CJK detection by script, not stopwords.
    scores["zh"] = F.regexp_count(c, F.lit(r"[一-鿿]"))
    return scores


def lang_id(col: Column | str, default: str = "unknown") -> Column:
    """Argmax of lang_scores with a fixed language order for ties; 'unknown'
    when no signal at all."""
    scores = lang_scores(col)
    order = ["en", "de", "fr", "es", "zh"]  # deterministic tie-break order
    best = F.greatest(*[scores[k] for k in order])
    expr = F.lit(default)
    for lang in reversed(order):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def lang_id_extended(col: Column | str, default: str = "unknown") -> Column:
    """lang_id over the ROUTING superset (STOPWORDS_QUALITY + zh by
    script) — the detector that feeds :func:`routed_stopword_count`.
    Same argmax/tie-break semantics as :func:`lang_id` (first language
    in the fixed order whose score equals the max wins); the original
    5-language lang_id and its gated queries are untouched."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    scores = {
        lang: F.regexp_count(lowered, F.lit(_word_regex(words)))
        for lang, words in STOPWORDS_QUALITY.items()
    }
    scores["zh"] = F.regexp_count(c, F.lit(r"[一-鿿]"))
    order = ["en", "de", "fr", "es", "it", "pt", "nl", "zh"]
    best = F.greatest(*[scores[k] for k in order])
    expr = F.lit(default)
    for lang in reversed(order):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(expr)
    return expr


def normalize_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting: lower, collapse whitespace, strip
    non-alphanumerics (keeps spaces)."""
    c = F.col(col) if isinstance(col, str) else col
    cleaned = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]", "")
    return F.trim(F.regexp_replace(cleaned, r"\s+", " "))


def fingerprint_md5(col: Column | str) -> Column:
    """Document fingerprint = md5 of the normalized text (hex string)."""
    return F.md5(normalize_text(col).cast("binary"))


def rolling_hash(col: Column | str, base: int = 31, mod: int = 2**31 - 1) -> Column:
    """Polynomial rolling hash over the normalized text's characters —
    an order-sensitive fingerprint computed JVM-side via aggregate() over
    the char array. (md5 variant above is the oracle-matched one; this one
    demonstrates the custom-hash path.)

    ``mod`` must satisfy (mod-1)*base + 255 < 2^63 so the per-step
    accumulator never overflows int64 (works under ANSI mode too); the
    Mersenne prime 2^31-1 leaves ~2^57 of headroom at base=31."""
    c = normalize_text(col)
    chars = F.split(c, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, ch: (acc * base + F.ascii(ch)) % F.lit(mod).cast("long"),
    )


def word_shingles(
    col: Column | str, n: int = 3, mode: str = "whitespace"
) -> Column:
    """Word n-gram shingles -> array<string> (empty when fewer than n
    tokens). ``mode="script"`` shingles over script-aware tokens (CJK
    chars are tokens — without it a whole CJK sentence is one "word"
    and shingle dedup goes blind on CJK corpora). No explode, no UDF —
    and NO array reference inside any higher-order lambda: ``n``
    shifted slices are built OUTSIDE the lambdas and folded pairwise
    with zip_with. (The previous transform-with-slice form referenced
    the computed token array inside its lambda, which re-evaluates the
    regex split once PER POSITION — O(n_tokens²) splits per document,
    measured 3-10x the cost of whole queries at sf0.1.)"""
    toks = tokens(col, mode)
    m = F.size(toks) - F.lit(n - 1)  # number of shingles
    joined = F.slice(toks, 1, m)
    for k in range(2, n + 1):
        joined = F.zip_with(
            joined,
            F.slice(toks, k, m),
            lambda a, b: F.concat_ws(" ", a, b),
        )
    return F.when(F.size(toks) >= n, joined).otherwise(
        F.array().cast("array<string>")
    )


def chunk_tokens(
    col: Column | str, chunk_size: int, overlap: int = 0
) -> Column:
    """Split text into fixed-size token chunks with ``overlap`` tokens of
    context carried between consecutive chunks — the standard long-document
    preparation for context-bounded training/embedding. Returns
    array<struct<chunk_idx int, chunk string, n_tokens int>> built entirely
    from sequence/transform/slice (no explode until the caller wants rows,
    no UDF). stride = chunk_size - overlap; the last chunk may be short;
    empty/blank text yields zero chunks."""
    if not 0 <= overlap < chunk_size:
        raise ValueError("require 0 <= overlap < chunk_size")
    from g_data_pipeline_spark.functions.expr import let

    stride = chunk_size - overlap
    # let-bound so the tokenization runs once per row, not once per chunk
    return let(tokens(col), lambda toks: _chunks_of(
        toks, token_count(col), chunk_size, stride
    ))


def _chunks_of(
    toks: Column, n_tokens_guard: Column, chunk_size: int, stride: int
) -> Column:
    n = F.size(toks)
    # chunk starts: 0, stride, 2*stride, ... while start < n. token_count
    # (not size) guards blank text: split("") yields [""], size 1.
    starts = F.when(
        n_tokens_guard > 0, F.sequence(F.lit(0), n - 1, F.lit(stride))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        starts,
        lambda s, i: F.struct(
            i.cast("int").alias("chunk_idx"),
            F.concat_ws(" ", F.slice(toks, s + 1, chunk_size)).alias("chunk"),
            F.least(F.lit(chunk_size), n - s).cast("int").alias("n_tokens"),
        ),
    )


def luhn_valid(col: Column | str) -> Column:
    """Luhn checksum (ISO/IEC 7812) over a digits-only string, as pure
    expressions: reverse, double every second digit (minus 9 when > 9),
    sum % 10 == 0. False for empty/non-digit input."""
    c = F.col(col) if isinstance(col, str) else col
    digits = F.filter(F.split(F.reverse(c), ""), lambda ch: ch != "")
    term = F.transform(
        digits,
        lambda ch, i: F.when(
            i % 2 == 1,
            F.when(
                ch.cast("int") * 2 > 9, ch.cast("int") * 2 - 9
            ).otherwise(ch.cast("int") * 2),
        ).otherwise(ch.cast("int")),
    )
    total = F.aggregate(term, F.lit(0), lambda acc, x: acc + x)
    return c.rlike(r"^\d{13,19}$") & (total % 10 == 0)


def find_credit_cards(col: Column | str) -> Column:
    """Luhn-VERIFIED card numbers in free text -> array<string> of the
    digits-only forms. A bare \\d{13,19} regex false-positives on order
    ids, timestamps, and phone numbers constantly; the Luhn check kills
    ~90% of random digit runs (only 1 in 10 passes), which is why
    flag-then-review pipelines verify before redacting. Candidates may
    be space- or dash-separated groups (the common card formattings)."""
    c = F.col(col) if isinstance(col, str) else col
    cands = F.regexp_extract_all(c, F.lit(r"(?<![\d-])\d(?:[ -]?\d){12,18}(?![\d-])"), 0)
    cleaned = F.transform(
        cands, lambda s: F.regexp_replace(s, r"[ -]", "")
    )
    return F.filter(cleaned, lambda d: luhn_valid(d))


def has_credit_card(col: Column | str) -> Column:
    """True when the text contains at least one Luhn-valid card number —
    the quarantine/flag gate for pre-training PII review."""
    return F.size(find_credit_cards(col)) > 0
