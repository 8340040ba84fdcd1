"""Corpus datasheet: the one-stop "dataset card" summary a training-data
pipeline publishes next to every corpus snapshot (Gebru et al.,
"Datasheets for Datasets", 2021 — here the quantitative half).

``corpus_datasheet`` composes the engine's own text operators into TWO
aggregate passes over the documents table:

 pass 1 (doc-derived scalars, fused into ONE agg): doc/char/token
   counts, token-length quantiles (single ``F.percentile`` array —
   CLAUDE.md rule), mean quality score, exact-duplicate rate from
   fingerprint cardinality (count - distinct fingerprints), empty-doc
   count;
 pass 2 (composition): per-language and per-source shares from one
   groupBy each (unioned into a tidy long-format composition frame).

Outputs are engine-checkable numbers (tests cross-check every field
against DuckDB one-liners), not prose. At 100 TB both passes are
map-side-combinable aggregates — the fused scalar pass reads the table
once; composition reads it once more (or reuse a cached scan)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import (
    fingerprint_md5,
    lang_id,
    quality_score,
    token_count,
)


def corpus_datasheet_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One-row scalar summary (pass 1). Columns: n_docs, n_empty_docs,
    total_chars, total_tokens, tok_p25 / tok_p50 / tok_p75 (exact),
    mean_quality_micro (scaled-long deterministic), n_distinct_fps,
    exact_dup_rate_micro (duplicate rows per million)."""
    toks = token_count(text_col).cast("long")
    q = quality_score(text_col)
    prepared = df.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("__chars"),
        toks.alias("__toks"),
        (F.floor(q * F.lit(1_000_000.0))).cast("long").alias("__q_micro"),
        fingerprint_md5(text_col).alias("__fp"),
        (F.length(F.trim(text_col)) == 0).cast("long").alias("__empty"),
    )
    agg = prepared.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__empty").cast("bigint").alias("n_empty_docs"),
        F.sum("__chars").cast("bigint").alias("total_chars"),
        F.sum("__toks").cast("bigint").alias("total_tokens"),
        F.percentile(
            F.col("__toks"), F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
        ).alias("__tok_q"),
        F.sum("__q_micro").cast("bigint").alias("__q_sum"),
        F.count_distinct(F.col("__fp")).cast("bigint").alias("n_distinct_fps"),
    )
    return agg.select(
        "n_docs",
        "n_empty_docs",
        "total_chars",
        "total_tokens",
        F.element_at("__tok_q", 1).alias("tok_p25"),
        F.element_at("__tok_q", 2).alias("tok_p50"),
        F.element_at("__tok_q", 3).alias("tok_p75"),
        # floor of the mean of floored micro scores: integer-exact
        F.floor(F.col("__q_sum") / F.col("n_docs"))
        .cast("bigint")
        .alias("mean_quality_micro"),
        "n_distinct_fps",
        # floor the fractional quotient BEFORE the bigint cast (long/long
        # '/' is a double divide; a bare cast TRUNCATES in Spark but
        # ROUNDS in DuckDB, and IEEE division can round the quotient up
        # across an integer boundary) — same integer-floor convention as
        # share_micro / fertility_micro.
        F.floor(
            (F.col("n_docs") - F.col("n_distinct_fps"))
            * F.lit(1_000_000)
            / F.col("n_docs")
        )
        .cast("bigint")
        .alias("exact_dup_rate_micro"),
    )


def corpus_datasheet_composition(
    df: DataFrame,
    text_col: str = "text",
    source_col: str | None = "source",
) -> DataFrame:
    """Long-format composition (pass 2): rows
    (dimension ∈ {language, source}, value, n_docs, share_micro), with
    share_micro = floor(n/total * 1e6) — integer-exact per row. Sorted
    for stable display."""
    dims = [
        df.select(
            F.lit("language").alias("dimension"),
            lang_id(text_col).alias("value"),
        )
    ]
    if source_col is not None:
        dims.append(
            df.select(
                F.lit("source").alias("dimension"),
                F.col(source_col).cast("string").alias("value"),
            )
        )
    tall = dims[0]
    for d in dims[1:]:
        tall = tall.unionByName(d)
    counts = tall.groupBy("dimension", "value").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    w_total = F.sum("n_docs").over(Window.partitionBy("dimension"))
    return (
        counts.withColumn(
            "share_micro",
            F.floor(F.col("n_docs") * F.lit(1_000_000) / w_total).cast(
                "bigint"
            ),
        )
        .orderBy("dimension", F.desc("n_docs"), "value")
    )


def tokenizer_fertility(
    df: DataFrame, text_col: str = "text"
) -> DataFrame:
    """Per-language tokenizer-fertility report: how many sub-word-ish
    tokens the BPE-style pre-tokenizer emits per whitespace word, and
    characters per sub-word token — the standard multilingual corpus
    diagnostic (high fertility = the tokenizer fragments that language,
    inflating its effective training cost; mT5/BLOOM report exactly
    this). One grouped aggregate; ratios from integer sums, so the
    report is deterministic.

    Output: (language, n_docs, n_words, n_subword_tokens,
    fertility_micro = floor(1e6 * subword/words),
    chars_per_token_micro)."""
    from g_data_pipeline_spark.functions.text import (
        bpe_token_count,
        lang_id,
        token_count,
    )

    prepared = df.select(
        lang_id(text_col).alias("language"),
        token_count(text_col).cast("long").alias("__w"),
        bpe_token_count(text_col).cast("long").alias("__t"),
        F.length(text_col).cast("long").alias("__c"),
    )
    agg = prepared.groupBy("language").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("__w").cast("bigint").alias("n_words"),
        F.sum("__t").cast("bigint").alias("n_subword_tokens"),
        F.sum("__c").cast("bigint").alias("__chars"),
    )
    return agg.select(
        "language",
        "n_docs",
        "n_words",
        "n_subword_tokens",
        F.when(
            F.col("n_words") > 0,
            F.floor(
                F.col("n_subword_tokens") * F.lit(1_000_000) / F.col("n_words")
            ).cast("bigint"),
        ).alias("fertility_micro"),
        F.when(
            F.col("n_subword_tokens") > 0,
            F.floor(
                F.col("__chars") * F.lit(1_000_000) / F.col("n_subword_tokens")
            ).cast("bigint"),
        ).alias("chars_per_token_micro"),
    ).orderBy("language")
