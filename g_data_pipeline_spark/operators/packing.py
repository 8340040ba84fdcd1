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


def bestfit_pack(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    capacity: int = 512,
    k_max: int = 8,
    tokens_col: str | None = None,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Length-grouped first-fit-decreasing packing: the no-split
    alternative to :func:`pack_sequences` (verdict r9 #7). Documents keep
    their boundaries (no cross-example attention contamination, no
    truncated heads) and pay PADDING instead — this operator makes that
    padding provably small.

    Scheme (the classic harmonic bin-packing grouping, SQL-expressible):
    each document lands in length class ``k = min(k_max,
    capacity // n_tokens)`` — the number of same-class documents a bin is
    guaranteed to hold, since every class-k doc has ``n_tokens <=
    capacity / k``. Within each (stream, class), documents rank by
    (n_tokens DESC, id) — first-fit-decreasing order — and fill bins k at
    a time: ``bin_in_class = rank // k``, ``slot = rank % k``. A class-k
    bin's fill exceeds ``k * capacity/(k+1)`` for full bins (every doc is
    longer than ``capacity/(k+1)``, else it would be in a later class),
    so per-bin waste is bounded by ``capacity/(k+1)`` + the short final
    bin of each class. Docs longer than ``capacity`` form class 0: one
    logical bin each, ``spans_bins`` marking the downstream chunker's
    split, waste measured against ``ceil(n/capacity)`` capacity units.
    Empty docs (0 tokens) join class ``k_max``.

    Global ``bin_id`` is dense: per-(stream, class) bin counts —
    ``ceil(count / k)``, or ``count`` for class 0 — cumulate into offsets
    over the TINY (streams x classes) rollup and broadcast back.

    Deterministic: pure integer math over the (group, class, n_tokens
    DESC, id) total order. Scale: the ranking window partitions by
    (stream, class) — parallelism = streams x classes, the
    :func:`pack_sequences` sharding story (pre-bucket giant streams by
    ``hash(id) % k`` and pack buckets independently); the offsets frame
    is bounded by streams x (k_max + 2) rows; the fill window partitions
    by bin (tiny groups). Shuffles: the rank exchange + the bin-fill
    exchange.

    Returns ``[id, group, n_tokens, class_k, bin_id, slot, bin_fill,
    bin_waste, spans_bins]``; ``bin_fill``/``bin_waste`` repeat per doc of
    a bin (scalar columns — window-gate friendly).
    """
    n_tok = (
        F.col(tokens_col).cast("long")
        if tokens_col is not None
        else token_count(text_col, token_mode).cast("long")
    )
    cap = F.lit(int(capacity))
    # Explicit null-group filter: the bin-id join drops null groups
    # anyway (inner on group_col), but filtering HERE keeps the ranked
    # and counts branches' exchange subtrees byte-identical (the join
    # would otherwise push isnotnull into only one branch's scan and
    # defeat AQE exchange reuse — the plan would tokenize twice).
    base = df.filter(F.col(group_col).isNotNull()).select(
        F.col(id_col), F.col(group_col), n_tok.alias("n_tokens")
    ).withColumn(
        "class_k",
        F.when(F.col("n_tokens") > cap, F.lit(0))
        .when(F.col("n_tokens") == 0, F.lit(int(k_max)))
        .otherwise(
            F.least(
                F.lit(int(k_max)),
                F.floor(cap.cast("double") / F.col("n_tokens")).cast("int"),
            )
        )
        .cast("long"),
    )
    w_rank = Window.partitionBy(group_col, "class_k").orderBy(
        F.col("n_tokens").desc(), F.col(id_col).asc()
    )
    ranked = base.withColumn("__r", F.row_number().over(w_rank) - 1)
    overflow = F.col("class_k") == 0
    ranked = ranked.withColumn(
        "__bic",
        F.when(overflow, F.col("__r"))
        .otherwise(F.floor(F.col("__r").cast("double") / F.col("class_k")))
        .cast("long"),
    ).withColumn(
        "slot",
        F.when(overflow, F.lit(0))
        .otherwise(F.col("__r") % F.col("class_k"))
        .cast("long"),
    )
    # Tiny per-(stream, class) rollup -> dense global bin-id offsets.
    # Derived from RANKED via max(__r)+1 (== the group count): the
    # rollup keys equal the rank window's partition keys (no new
    # shuffle), and referencing __r keeps the Window node alive in this
    # branch, so both branches share a byte-identical exchange subtree
    # that AQE reuse collapses — the corpus is scanned and tokenized
    # ONCE. (A count(*) rollup lets the optimizer eliminate the Window
    # and the branches' subtrees diverge into a second scan.)
    counts = ranked.groupBy(group_col, "class_k").agg(
        (F.max("__r") + 1).alias("__cnt")
    )
    n_bins = F.when(F.col("class_k") == 0, F.col("__cnt")).otherwise(
        F.ceil(F.col("__cnt").cast("double") / F.col("class_k"))
    )
    w_off = Window.orderBy(
        F.col(group_col).asc(), F.col("class_k").asc()
    ).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        group_col,
        "class_k",
        F.coalesce(F.sum(n_bins.cast("long")).over(w_off), F.lit(0)).alias(
            "__off"
        ),
    )
    placed = ranked.join(
        F.broadcast(offsets), [group_col, "class_k"]
    ).withColumn("bin_id", (F.col("__off") + F.col("__bic")).cast("long"))
    w_bin = Window.partitionBy(group_col, "class_k", "__bic")
    spanned = F.greatest(
        F.lit(1), F.ceil(F.col("n_tokens").cast("double") / cap)
    )
    return (
        placed.withColumn(
            "bin_fill", F.sum("n_tokens").over(w_bin).cast("long")
        )
        .withColumn(
            # A shared class-k bin is ONE capacity unit (k docs fill it);
            # an overflow bin spans ceil(n/capacity) units for its single
            # doc. class_k sits in the partition key, so the per-row CASE
            # is uniform within a bin.
            "bin_waste",
            (
                F.when(overflow, spanned.cast("long")).otherwise(F.lit(1))
                * cap
                - F.col("bin_fill")
            ).cast("long"),
        )
        .withColumn("spans_bins", F.col("n_tokens") > cap)
        .select(
            id_col,
            group_col,
            "n_tokens",
            "class_k",
            "bin_id",
            "slot",
            "bin_fill",
            "bin_waste",
            "spans_bins",
        )
    )
