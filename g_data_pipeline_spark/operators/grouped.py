"""Grouped-map / UDF surface — the extensibility layer the reference lacks
entirely (SURVEY.md §2.6 "None").

Two sanctioned Python extension points, both Arrow-batched:

- scalar ``pandas_udf``: vectorized column function, usable inside any
  expression (still ~an order slower than built-ins — reach for it only
  when no JVM expression exists);
- ``applyInPandas`` grouped map: per-group pandas DataFrame in/out, for
  algorithms that genuinely need the whole group materialized (iterative
  fits, per-group normalization). The shuffle is the same one groupBy
  needs; per-task memory = one group, so key cardinality/size balance is
  the scaling knob (salt first if one group dominates — operators.skew).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zscore_per_group(
    df: DataFrame, keys: list[str], value_col: str, out_col: str = "zscore"
) -> DataFrame:
    """Per-group z-score normalization via applyInPandas (the grouped-map
    reference example; a pure-SQL window version exists for this particular
    statistic — the point here is the general per-group-pandas contract)."""
    from pyspark.sql import types as T

    schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        pdf[out_col] = (pdf[value_col] - mean) / std if std and std > 0 else None
        return pdf

    return df.groupBy(*keys).applyInPandas(fn, schema=schema)


def scalar_pandas_udf_example():
    """A registered scalar pandas UDF (vectorized log1p-scaling) — returns
    the UDF so callers/tests can use it in expressions."""
    import numpy as np

    @F.pandas_udf("double")
    def log1p_scaled(s: pd.Series) -> pd.Series:
        return np.log1p(s) / np.log(10.0)

    return log1p_scaled


def compression_ratio_udf():
    """Vectorized zlib compression-ratio UDF: ``len(zlib.compress(utf8))
    / len(utf8)`` per string — the classic repetitiveness/entropy quality
    signal (Gopher table A1 and RedPajama-v2 both ship it): boilerplate
    and template spam compress far below prose (~0.3), random/binary
    junk barely compresses at all (~1.0).

    No JVM expression can compute this (Spark has no compress-and-
    measure builtin), so it is the textbook case for the sanctioned
    scalar ``pandas_udf`` path: Arrow-batched, one Python call per
    ~10k-row batch, zlib's C core doing the work — NOT a row-at-a-time
    BatchEvalPython (pinned by tests/test_plan_sweep.py's allowlist).
    Deterministic: zlib level 6 output is fixed for a given input on
    every platform zlib supports (same DEFLATE implementation)."""
    import zlib

    @F.pandas_udf("double")
    def zlib_ratio(s: pd.Series) -> pd.Series:
        def ratio(text: str | None) -> float | None:
            if text is None:
                return None
            raw = text.encode("utf-8")
            if not raw:
                return 0.0
            return len(zlib.compress(raw, 6)) / len(raw)

        return s.map(ratio)

    return zlib_ratio


def _lcs_rolling_py(la: list, lb: list) -> int:
    """Pure-Python rolling-row LCS DP (the historical kernel body; kept
    as the small-pair fast path and the numpy twin's parity reference).
    Precondition: len(la) <= len(lb), la non-empty."""
    prev = [0] * (len(la) + 1)
    for tok in lb:
        cur = [0]
        for j, t in enumerate(la, 1):
            cur.append(prev[j - 1] + 1 if t == tok else max(cur[-1], prev[j]))
        prev = cur
    return prev[-1]


def _lcs_rolling_np(la: list, lb: list) -> int:
    """numpy row-vectorized LCS DP (r8 verdict #7 — the LCS kernel was
    the most Python-heavy code in the repo): tokens are first mapped to
    integer codes (np.unique over the pair's joint vocabulary), then
    each DP row updates in three whole-row numpy ops via the standard
    reformulation  cur = cummax(max(prev[1:], eq ? prev[:-1]+1 : 0))  —
    valid because LCS DP rows are monotone nondecreasing, so folding
    the cur[j-1] dependency into a running max is exact (bit-parity
    with _lcs_rolling_py pinned in tests/test_rouge.py, including
    hypothesis-random sequences). Same O(len_a*len_b) work, C-speed
    inner row. Precondition: len(la) <= len(lb), la non-empty."""
    import numpy as np

    both = np.asarray(la + lb, dtype=object)
    _, codes = np.unique(both, return_inverse=True)
    ca, cb = codes[: len(la)], codes[len(la) :]
    prev = np.zeros(len(la) + 1, dtype=np.int64)
    cur = np.zeros_like(prev)
    for code in cb:
        d = np.maximum(prev[1:], np.where(ca == code, prev[:-1] + 1, 0))
        np.maximum.accumulate(d, out=cur[1:])
        prev, cur = cur, prev
    return int(prev[-1])


# Below this joint size the per-pair numpy setup (np.unique, array
# allocation) costs more than the pure loop saves; blocked ROUGE-L
# candidates are often short, so both paths stay live.
_LCS_NUMPY_MIN_CELLS = 1024


def lcs_length_udf(max_tokens: int = 256):
    """Vectorized token-LCS length kernel (two array<string> columns ->
    long): the exact dynamic program behind ROUGE-L (Lin '04), the
    dedup metric Self-Instruct (Wang et al. '22) applies to instruction
    corpora. O(len_a * len_b) per pair; large pairs run the numpy
    row-vectorized DP (_lcs_rolling_np), small ones the plain rolling
    loop — both exact and bit-identical. Both sides are truncated to
    ``max_tokens`` (a documented bound — ROUGE-L dedup of instructions
    operates on short texts; candidate PAIRING happens JVM-side first,
    this kernel only ever sees blocked candidates —
    operators/rouge.py)."""

    @F.pandas_udf("long")
    def lcs_len(a: pd.Series, b: pd.Series) -> pd.Series:
        out = []
        for xa, xb in zip(a, b):
            if xa is None or xb is None:
                out.append(0)
                continue
            la, lb = list(xa)[:max_tokens], list(xb)[:max_tokens]
            if len(la) > len(lb):
                la, lb = lb, la
            if not la:
                out.append(0)
                continue
            if len(la) * len(lb) >= _LCS_NUMPY_MIN_CELLS:
                out.append(_lcs_rolling_np(la, lb))
            else:
                out.append(_lcs_rolling_py(la, lb))
        return pd.Series(out, dtype="int64")

    return lcs_len


def unicode_normalize_udf(form: str = "NFC"):
    """Vectorized Unicode normalization kernel (string -> string) — the
    multilingual pre-fingerprinting step every dedup/fingerprint path
    needs on real crawls: the SAME visible text arrives precomposed
    (NFC) from one site and decomposed (NFD, combining marks) from
    another, and byte-level hashes treat them as different documents.
    Spark ships no built-in normalizer, so this is a sanctioned Arrow
    kernel; DuckDB's utf8proc-based nfc_normalize reproduces NFC
    exactly (both implement UAX #15), which is what makes the
    t_unicode_normalize report oracle-gatable."""
    import unicodedata

    if form not in ("NFC", "NFD", "NFKC", "NFKD"):
        raise ValueError(f"unknown normalization form {form!r}")

    @F.pandas_udf("string")
    def norm(s: pd.Series) -> pd.Series:
        return s.map(
            lambda x: unicodedata.normalize(form, x)
            if x is not None
            else None
        )

    return norm
