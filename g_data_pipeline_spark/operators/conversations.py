"""Conversation / SFT-data curation: assemble event streams into ordered
multi-turn conversations and run the curation stages an instruction-tuning
pipeline needs — per-conversation structure stats, chat-template
rendering, whole-turn context truncation, and transcript-level dedup.

The reference has no conversation surface (extension); the design rules
are this repo's: conversation assembly is ONE user-keyed shuffle whose
exchange every downstream window/aggregate reuses (the e_sessionize
shape), everything after assembly is row-local array expressions (zero
further shuffles), and dedup keys on transcript-content hashes, never
all-pairs. Oracle-gated twin: query_defs/semistructured.py
(`e_conversation_stats`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_GAP_US_DEFAULT = 30 * 60 * 1_000_000  # 30 min, e_sessionize's gap


def conversation_turns(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    role_col: str = "event_type",
    content_col: str = "props",
    gap_us: int = _GAP_US_DEFAULT,
) -> DataFrame:
    """Sessionize an event stream into conversation turns: a gap of more
    than ``gap_us`` starts a new conversation; within one, turns order by
    (ts, tiebreak). Returns one row per turn: ``(user, conv_idx, us,
    tiebreak, role, content)``. Both windows and everything downstream
    partition by ``user_col`` — one shuffle, exchange reused.

    The gap lag and the running sum run over the SAME aliased attributes
    (``user``/``us``/``tiebreak``, aliased BEFORE the first window):
    partitioning the first window by ``user_col`` inside the aliasing
    select makes the second window's ``user`` a different attribute id,
    and the planner inserts a second full shuffle of every column,
    content included (optimization r10: 2 Exchanges -> 1; the shared
    (us, tiebreak) sort order also drops the second Sort — ordering by
    ``us`` == ordering by ``ts_col``, unix_micros is monotone)."""
    base = events.select(
        F.col(user_col).alias("user"),
        F.col(tiebreak_col).alias("tiebreak"),
        F.unix_micros(F.col(ts_col)).alias("us"),
        F.col(role_col).alias("role"),
        F.col(content_col).alias("content"),
    )
    w = Window.partitionBy("user").orderBy("us", "tiebreak")
    seq = base.select(
        "user",
        "tiebreak",
        "us",
        (F.col("us") - F.lag("us").over(w)).alias("__gap_us"),
        "role",
        "content",
    )
    wrun = (
        Window.partitionBy("user")
        .orderBy("us", "tiebreak")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return seq.select(
        "user",
        F.sum(
            F.when(
                F.col("__gap_us").isNull()
                | (F.col("__gap_us") > F.lit(int(gap_us))),
                F.lit(1),
            ).otherwise(F.lit(0))
        )
        .over(wrun)
        .cast("long")
        .alias("conv_idx"),
        "us",
        "tiebreak",
        "role",
        "content",
    )


def conversation_report(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    role_col: str = "event_type",
    content_col: str = "props",
    gap_us: int = _GAP_US_DEFAULT,
) -> DataFrame:
    """Per-conversation curation stats: ``(user, conv_idx, n_turns,
    n_roles, duration_ms, alternation_breaks, transcript_fp)``.

    - ``alternation_breaks``: consecutive same-role turns (a
      user/assistant feed that doesn't alternate is malformed SFT data);
    - ``transcript_fp``: md5 of the ordered ``role:content`` lines — the
      conversation-level dedup key (:func:`dedup_conversations`); a pure
      content hash, layout- and engine-independent.

    All three windows and the final aggregate share the user partition
    key — one shuffle end-to-end."""
    turns = conversation_turns(
        events, user_col, ts_col, tiebreak_col, role_col, content_col, gap_us
    )
    wconv = Window.partitionBy("user", "conv_idx").orderBy("us", "tiebreak")
    # NULL content is pinned to the EMPTY STRING ("role:" stays a line):
    # bare concat_ws would SKIP the null (line collapses to "role"),
    # while the DuckDB oracle's role || ':' || content nulls the whole
    # line and string_agg drops it — the fingerprint would diverge on
    # the first NULL-content row (round-8 ADVICE fix; oracle side
    # COALESCEs identically).
    line = F.concat_ws(":", "role", F.coalesce("content", F.lit("")))
    per_turn = turns.select(
        "user",
        "conv_idx",
        "us",
        "tiebreak",
        "role",
        line.alias("__line"),
        (F.lag("role").over(wconv) == F.col("role"))
        .cast("int")
        .alias("__same_role"),
    )
    ordered_lines = F.transform(
        F.array_sort(
            F.collect_list(F.struct("us", "tiebreak", F.col("__line")))
        ),
        lambda x: x["__line"],
    )
    dur = F.max("us") - F.min("us")  # >= 0: floor == truncate, exact
    return per_turn.groupBy("user", "conv_idx").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        ((dur - F.pmod(dur, F.lit(1000))) / F.lit(1000))
        .cast("long")
        .alias("duration_ms"),
        F.coalesce(F.sum("__same_role"), F.lit(0))
        .cast("long")
        .alias("alternation_breaks"),
        F.md5(F.array_join(ordered_lines, "\n")).alias("transcript_fp"),
    )


def assemble_conversations(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    role_col: str = "event_type",
    content_col: str = "props",
    gap_us: int = _GAP_US_DEFAULT,
    max_turns: int | None = None,
) -> DataFrame:
    """Materialize whole conversations: ``(user, conv_idx,
    turns array<struct<role, content>>)`` with turns in (ts, tiebreak)
    order — the input shape for :func:`render_chat_template` /
    :func:`truncate_to_context`. One user-keyed shuffle; per-row state
    bounded by conversation length.

    ``max_turns`` (round-8, verdict #8): gap-sessionization bounds
    conversations on real SFT feeds, but a pathological single-user raw
    event stream (a bot, a log mirror) can concentrate one giant array
    in one task. With ``max_turns`` set, only the FIRST ``max_turns``
    turns (by the same (ts, tiebreak) order) are materialized and two
    audit columns are added — ``n_turns_total`` (the uncapped count)
    and ``overflowed`` — so callers can route oversized conversations
    to review instead of silently training on a prefix. The cap filter
    runs on the same user-partitioned window (no extra shuffle) and
    bounds collect_list state at ``max_turns`` structs."""
    turns = conversation_turns(
        events, user_col, ts_col, tiebreak_col, role_col, content_col, gap_us
    )
    if max_turns is None:
        ordered = F.transform(
            F.array_sort(
                F.collect_list(F.struct("us", "tiebreak", "role", "content"))
            ),
            lambda x: F.struct(
                x["role"].alias("role"), x["content"].alias("content")
            ),
        )
        return turns.groupBy("user", "conv_idx").agg(ordered.alias("turns"))
    w = Window.partitionBy("user", "conv_idx").orderBy("us", "tiebreak")
    capped = turns.withColumn("__tn", F.row_number().over(w))
    ordered = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(
                    F.col("__tn") <= int(max_turns),
                    F.struct("us", "tiebreak", "role", "content"),
                )
            )
        ),
        lambda x: F.struct(
            x["role"].alias("role"), x["content"].alias("content")
        ),
    )
    return capped.groupBy("user", "conv_idx").agg(
        ordered.alias("turns"),
        F.max("__tn").cast("long").alias("n_turns_total"),
        (F.max("__tn") > int(max_turns)).alias("overflowed"),
    )


def render_chat_template(
    convs: DataFrame,
    turns_col: str = "turns",
    out_col: str = "text",
    turn_open: str = "<|im_start|>",
    turn_close: str = "<|im_end|>",
) -> DataFrame:
    """Render assembled conversations to one training string per row in
    the ChatML shape: ``<|im_start|>role\\ncontent<|im_end|>`` per turn,
    newline-joined. Pure row-local array expression — zero shuffles,
    zero UDFs; swap the delimiters for other template families."""
    rendered = F.array_join(
        F.transform(
            F.col(turns_col),
            lambda t: F.concat(
                F.lit(turn_open),
                t["role"],
                F.lit("\n"),
                t["content"],
                F.lit(turn_close),
            ),
        ),
        "\n",
    )
    return convs.withColumn(out_col, rendered)


def truncate_to_context(
    convs: DataFrame,
    max_tokens: int,
    turns_col: str = "turns",
) -> DataFrame:
    """Keep the longest SUFFIX of whole turns whose total whitespace-token
    count fits ``max_tokens`` — the standard SFT truncation (recent turns
    carry the supervision signal; a turn is never split mid-way). A
    conversation whose final turn alone exceeds the budget keeps zero
    turns (callers drop those rows). Adds ``turns_kept``/``tokens_kept``
    and rewrites ``turns_col``. Row-local O(turns) fold — zero shuffles."""
    t = F.col(turns_col)
    counts = F.transform(
        t,
        lambda x: F.when(F.trim(x["content"]) == "", F.lit(0)).otherwise(
            F.size(F.split(F.trim(F.lower(x["content"])), r"\s+"))
        ),
    )
    # fold the REVERSED per-turn counts: keep adding turns (from the end)
    # until the budget would overflow, then stop — (tokens, kept, stopped)
    acc0 = F.struct(
        F.lit(0).cast("long").alias("tok"),
        F.lit(0).alias("k"),
        F.lit(False).alias("stop"),
    )
    folded = F.aggregate(
        F.reverse(counts),
        acc0,
        lambda acc, c: F.when(
            acc["stop"] | ((acc["tok"] + c) > F.lit(int(max_tokens))),
            F.struct(
                acc["tok"].alias("tok"),
                acc["k"].alias("k"),
                F.lit(True).alias("stop"),
            ),
        ).otherwise(
            F.struct(
                (acc["tok"] + c).cast("long").alias("tok"),
                (acc["k"] + 1).alias("k"),
                F.lit(False).alias("stop"),
            )
        ),
    )
    out = convs.withColumn("__fit", folded)
    k = F.col("__fit.k")
    kept = F.when(k == 0, F.array().cast(out.schema[turns_col].dataType)).otherwise(
        F.slice(t, F.size(t) - k + 1, k)
    )
    return (
        out.withColumn("turns_kept", k.cast("long"))
        .withColumn("tokens_kept", F.col("__fit.tok"))
        .withColumn(turns_col, kept)
        .drop("__fit")
    )


def dedup_conversations(
    convs: DataFrame,
    turns_col: str = "turns",
    id_cols: tuple[str, str] = ("user", "conv_idx"),
) -> DataFrame:
    """Transcript-level exact dedup: fingerprint the ordered
    ``role:content`` lines and keep the min-(id) conversation per
    fingerprint — repeated conversations (retried sessions, mirrored
    logs) collapse to one training example. One fingerprint-keyed
    aggregate + a semi-join back on the ids; the same survivorship shape
    as operators/dedup.exact_dedup, never all-pairs."""
    fp = F.md5(
        F.array_join(
            F.transform(
                F.col(turns_col),
                # NULL content pins to '' — same line shape as
                # conversation_report's transcript_fp
                lambda x: F.concat_ws(
                    ":", x["role"], F.coalesce(x["content"], F.lit(""))
                ),
            ),
            "\n",
        )
    )
    u, c = id_cols
    with_fp = convs.withColumn("__fp", fp)
    survivors = (
        with_fp.groupBy("__fp")
        .agg(F.min(F.struct(u, c)).alias("__keep"))
        .select(
            F.col("__fp").alias("__fp_s"),
            F.col(f"__keep.{u}").alias("__keep_u"),
            F.col(f"__keep.{c}").alias("__keep_c"),
        )
    )
    return with_fp.join(
        survivors,
        (F.col("__fp") == F.col("__fp_s"))
        & (F.col(u) == F.col("__keep_u"))
        & (F.col(c) == F.col("__keep_c")),
        "left_semi",
    ).drop("__fp")
