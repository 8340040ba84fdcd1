"""Within-document repetition statistics — the Gopher-style repetition
signals (Rae et al. 2021, "Scaling Language Models", §A1.1: duplicate
line/paragraph fractions, top n-gram fraction) used by every large-scale
training-data curation pipeline to drop low-quality, repetitive documents.

Adapted to the corpus shape (single-line synthetic docs): repetition is
measured at token and bigram granularity —

- ``dup_token_ratio``   1 - distinct_tokens/tokens (duplicate-line analog)
- ``alpha_token_frac``  fraction of tokens containing a letter (Gopher's
                        "80% of words contain an alphabetic character")
- ``top_bigram_count``  occurrences of the most frequent word bigram
- ``top_bigram_frac``   that count / total bigrams (top n-gram fraction)
- ``gopher_keep``       the composite threshold filter

Scale design: ALL metrics are pure array expressions — one scan, ZERO
shuffles. The top-bigram count is the row-local sorted-run fold
(operators/scorecard.max_multiplicity, O(n log n) per document — the
round-6 fused-scorecard kernel, value-parity with the exploded groupBy
pinned in tests/test_scorecard.py). Until r10 this operator kept the
exploded (doc_id, bigram) double aggregation + join-back (two shuffles,
a second corpus scan); the fold replaces it at identical output — the
O(len^2) per-element-filter alternative remains deliberately avoided.

No reference counterpart (the reference has no text operators at all);
designed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import tokens


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tokens: int = 20,
    max_dup_token_ratio: float = 0.55,
    max_top_bigram_frac: float = 0.06,
    min_alpha_token_frac: float = 0.8,
) -> DataFrame:
    """Per-document repetition metrics + the composite ``gopher_keep`` flag.

    Determinism: every float here is a single int/int double division (plus
    threshold comparisons) — no order-dependent accumulation, so values
    hash-match any engine bit-for-bit.
    """
    from g_data_pipeline_spark.operators.scorecard import max_multiplicity

    # r11 (guide §1.2 step 2): the token split is staged as a real column
    # — the previous form referenced the tokens() EXPRESSION from every
    # consumer (sizes, array_distinct, the alpha filter target, and both
    # shingle slices inside word_shingles), so the regex split ran ~7x
    # per row (HOFs are CodegenFallback: no codegen subexpression
    # elimination reaches them). CollapseProject keeps the staging
    # because __toks is referenced more than once. The bigram expression
    # is word_shingles' shifted-slice zip_with inlined over the staged
    # array (identical semantics, n=2). Outputs proven row-identical on
    # the full sf0.1 corpus; repeat cost 0.72 -> 0.52 s.
    staged = df.select(id_col, tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    m = F.size(toks) - F.lit(1)
    bigrams = F.when(
        F.size(toks) >= 2,
        F.zip_with(
            F.slice(toks, 1, m),
            F.slice(toks, 2, m),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # "token contains a letter" via translate: removing [a-z] shortens
    # the token iff it contains one — identical to the old per-token
    # rlike('[a-z]') (tokens are already lowercased; both are ASCII-only)
    # and measured faster (no regex machinery per token).
    _letters = "abcdefghijklmnopqrstuvwxyz"
    n_alpha = F.size(toks) - F.size(
        F.filter(
            toks,
            lambda x: F.length(F.translate(x, _letters, "")) == F.length(x),
        )
    )
    base = staged.select(
        id_col,
        F.size(toks).cast("bigint").alias("n_tokens"),
        (
            F.lit(1.0)
            - F.size(F.array_distinct(toks)) / F.size(toks)
        ).alias("dup_token_ratio"),
        (n_alpha / F.size(toks)).alias("alpha_token_frac"),
        bigrams.alias("__bigrams"),
    )
    # max group count == longest run in the sorted array; n_bigrams ==
    # array size. Empty bigram arrays (docs under 2 tokens) give count 0
    # and a NULL fraction via nullif — same values the old exploded
    # aggregation produced through its left join (and no ANSI
    # divide-by-zero on the 0/0 case).
    counted = base.select(
        id_col,
        "n_tokens",
        "dup_token_ratio",
        "alpha_token_frac",
        max_multiplicity(F.col("__bigrams"))
        .cast("bigint")
        .alias("top_bigram_count"),
        F.size("__bigrams").alias("__nbg"),
    )
    staged = counted.select(
        id_col,
        "n_tokens",
        "dup_token_ratio",
        "alpha_token_frac",
        "top_bigram_count",
        F.coalesce(
            F.col("top_bigram_count") / F.nullif(F.col("__nbg"), F.lit(0)),
            F.lit(0.0),
        ).alias("top_bigram_frac"),
    )
    return staged.withColumn(
        "gopher_keep",
        (F.col("n_tokens") >= min_tokens)
        & (F.col("dup_token_ratio") < max_dup_token_ratio)
        & (F.col("top_bigram_frac") < max_top_bigram_frac)
        & (F.col("alpha_token_frac") >= min_alpha_token_frac),
    )
