"""Sequence packing for LLM training: assign each document a position in a
stream of fixed-capacity token bins (the GPT-style "concatenate then chunk"
batching scheme — documents are laid end-to-end per source stream and the
stream is cut every ``capacity`` tokens; Brown et al. 2020 §2.1, the
standard alternative to per-example padding).

Output is the *placement map* (bin id + offset per document), which is what
a downstream tokenizer/writer shards on — the engine's job is the
deterministic global layout, not the token bytes.

No equivalent in the reference (no corpus operators — SURVEY.md §2.3); this
is a north-star extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import token_count


def pack_sequences(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    capacity: int = 512,
    tokens_col: str | None = None,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Concat-and-chunk packing per ``group_col`` stream: documents are
    ordered by ``id_col`` within each group, token counts are prefix-summed,
    and each document's starting token index maps to ``bin_id = start //
    capacity`` and ``bin_offset = start % capacity``. ``spans_bins`` marks
    documents whose token run crosses a bin boundary (they are split by the
    chunker downstream).

    Deterministic: pure integer math over a total order (group, id).

    Scale (100 TB): the prefix sum is a window per group — parallelism =
    number of source streams, which is how production packing runs anyway
    (packing is sequential WITHIN a stream by definition; you shard the
    corpus into many streams, e.g. source × hash-bucket, and pack each
    independently). For a single giant stream, pre-bucket the group key by
    ``hash(id) % k`` first — each bucket packs independently and bins get a
    bucket prefix. One shuffle total (the window's partition-by).
    """
    # tokens_col: pre-computed token budgets (e.g. BPE counts from
    # operators.tokenizer) override the default whitespace count — packing
    # should spend the same currency the trainer will. token_mode="script"
    # makes the fallback counter CJK-aware (a CJK doc is ~1 whitespace
    # token — bins would pack 50x over capacity on zh/ja streams).
    n_tok = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else token_count(text_col, token_mode).cast("long")
    )
    w = (
        Window.partitionBy(group_col)
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_cum = df.select(
        F.col(id_col), F.col(group_col), n_tok.alias("n_tokens")
    ).withColumn("__cum", F.sum("n_tokens").over(w))
    start = F.col("__cum") - F.col("n_tokens")
    return with_cum.select(
        id_col,
        group_col,
        "n_tokens",
        F.floor(start / F.lit(capacity)).cast("long").alias("bin_id"),
        (start % F.lit(capacity)).cast("long").alias("bin_offset"),
        (
            F.floor((F.col("__cum") - 1) / F.lit(capacity))
            > F.floor(start / F.lit(capacity))
        ).alias("spans_bins"),
    )
