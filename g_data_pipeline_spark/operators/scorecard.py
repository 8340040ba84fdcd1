"""Fused zero-shuffle curation scorecard: every per-document quality
signal in ONE projection over ONE scan.

The standalone operators each scan the corpus: repetition_stats shuffles
exploded bigrams, line_quality_report shuffles exploded lines, the t_*
queries each re-read documents. Those shapes are right for oracle-gated
single-signal queries; a production curation pass wants all signals AT
ONCE — at 100 TB, five scans vs one is the whole bill. This module fuses:

- token stats + composite quality score  (functions/text.quality_score)
- language id                            (functions/text.lang_id)
- dedup fingerprint                      (functions/text.fingerprint_md5)
- Gopher repetition stats + keep flag    (operators/repetition semantics)
- C4 line-quality stats + keep flag      (operators/lines semantics)

into one SELECT of pure expressions — zero shuffles, zero joins, zero
UDFs; the plan is Scan → Project (pinned). The price of fusion is the
top-bigram count, which the standalone operator gets from an exploded
groupBy: here it is computed ROW-LOCALLY as the max run length of the
SORTED bigram array (sort_array + one F.aggregate scan, O(n log n) per
document) — same value, no exchange. Per-family parity vs the standalone
operators is pinned in tests/test_scorecard.py.

Scale note: the row-local fold keeps per-document cost linear-ish in
document length; documents are rows, so anything row-local scales with
the executor, not the shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    tokens,
)


def max_multiplicity(arr: Column) -> Column:
    """Max number of times any single element occurs in ``arr`` —
    row-local: sort the array, then one fold tracking the longest run.
    0 for an empty array."""
    s = F.sort_array(arr)
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
    )

    def step(a: Column, x: Column) -> Column:
        run = (
            F.when(x == a.getField("prev"), a.getField("run") + 1)
            .otherwise(F.lit(1))
        )
        return F.struct(
            x.alias("prev"),
            run.alias("run"),
            F.greatest(a.getField("best"), run).alias("best"),
        )

    return F.aggregate(s, init, step).getField("best")


def quality_scorecard(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    min_tokens: int = 20,
    max_dup_token_ratio: float = 0.55,
    max_top_bigram_frac: float = 0.06,
    min_alpha_token_frac: float = 0.8,
    short_line_tokens: int = 5,
) -> DataFrame:
    """One row per document with every signal and the composite ``keep``
    (= gopher_keep AND line_keep). Thresholds mirror the standalone
    operators' defaults; see module doc for the fusion contract.

    Performance contract (round-6): the token / bigram / line arrays are
    MATERIALIZED as columns in a first projection, and every feature
    reads the column. Referencing a COMPUTED array inside a higher-order
    lambda re-evaluates the array per element (the regex split ran once
    per bigram — O(n²) splits per doc, measured 10× the whole scorecard
    cost at sf0.1); an attribute reference is a cheap array read, and
    CollapseProject (SPARK-36718) keeps non-cheap aliases used more than
    once from being inlined back. Bigrams pair adjacent tokens with ONE
    zip_with over two slices rather than a per-position slice —
    bit-identical to word_shingles(text, 2) (parity-pinned)."""
    text = F.col(text_col)
    staged = docs.select(
        F.col(id_col),
        text.alias("__text"),
        tokens(text).alias("__toks"),
        # chunked_lines splits trim(text) WITHOUT lowercasing
        F.split(F.trim(text), r"\s+").alias("__rt"),
    )
    txt = F.col("__text")
    toks = F.col("__toks")
    n_tok = F.size(toks)
    bigrams = F.when(
        n_tok >= 2,
        F.zip_with(
            F.slice(toks, 1, n_tok - 1),
            F.slice(toks, 2, n_tok - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    rt = F.col("__rt")
    k = F.lit(10)
    n_rt = F.size(rt)
    n_line_cnt = F.floor((n_rt + k - F.lit(1)) / k.cast("double")).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_line_cnt - F.lit(1)),
        lambda i: F.concat_ws(" ", F.slice(rt, i * k + F.lit(1), 10)),
    )
    staged = staged.select(
        id_col,
        "__text",
        "__toks",
        bigrams.alias("__bigrams"),
        lines.alias("__lines"),
    )
    bg = F.col("__bigrams")
    lns = F.col("__lines")
    n_lines = F.size(lns)

    top_bg = max_multiplicity(bg)
    top_bg_frac = F.coalesce(
        top_bg / F.nullif(F.size(bg), F.lit(0)), F.lit(0.0)
    )
    short_line = lambda ln: F.size(F.split(ln, " ")) < F.lit(  # noqa: E731
        short_line_tokens
    )

    out = staged.select(
        F.col(id_col),
        F.when(F.trim(txt) == "", F.lit(0))
        .otherwise(F.size(toks))
        .alias("n_tokens"),
        F.length(txt).alias("n_chars"),
        quality_score(txt).alias("quality_score"),
        lang_id(txt).alias("lang"),
        fingerprint_md5(txt).alias("fingerprint"),
        (F.lit(1.0) - F.size(F.array_distinct(toks)) / n_tok).alias(
            "dup_token_ratio"
        ),
        (
            F.size(F.filter(toks, lambda x: x.rlike("[a-z]"))) / n_tok
        ).alias("alpha_token_frac"),
        top_bg.cast("bigint").alias("top_bigram_count"),
        top_bg_frac.alias("top_bigram_frac"),
        n_lines.cast("long").alias("n_lines"),
        F.size(F.filter(lns, short_line)).cast("long").alias(
            "n_short_lines"
        ),
        (n_lines - F.size(F.array_distinct(lns))).cast("long").alias(
            "n_dup_lines"
        ),
        F.size(F.filter(lns, lambda ln: ln.rlike('[.!?"]$')))
        .cast("long")
        .alias("n_terminal_punct_lines"),
    )
    return out.select(
        "*",
        (
            (F.col("n_tokens") >= min_tokens)
            & (F.col("dup_token_ratio") < max_dup_token_ratio)
            & (F.col("top_bigram_frac") < max_top_bigram_frac)
            & (F.col("alpha_token_frac") >= min_alpha_token_frac)
        ).alias("gopher_keep"),
        (
            (F.col("n_dup_lines") * F.lit(10) <= F.col("n_lines") * F.lit(3))
            & (F.col("n_short_lines") * F.lit(2) <= F.col("n_lines"))
        ).alias("line_keep"),
    ).withColumn("keep", F.col("gopher_keep") & F.col("line_keep"))
