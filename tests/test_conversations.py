"""SFT conversation curation (operators/conversations.py): assembly
ordering (ts + tiebreak), the structure report, chat-template rendering,
whole-turn context truncation, transcript dedup, and the one-shuffle
plan shape."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.conversations import (
    assemble_conversations,
    conversation_report,
    dedup_conversations,
    render_chat_template,
    truncate_to_context,
)

T0 = datetime(2024, 1, 1, 12, 0, 0)


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, "
        "event_type string, props string"
    )


def _fixture(spark):
    # user 1: two conversations split by a >30-min gap; inside conv 0 two
    # events share a timestamp (event_id breaks the tie) and the last two
    # turns repeat the same role (one alternation break).
    rows = [
        (1, 1, T0, "user", "hi"),
        (1, 3, T0 + timedelta(seconds=10), "assistant", "hello"),
        (1, 2, T0 + timedelta(seconds=10), "assistant", "first-by-id"),
        (1, 4, T0 + timedelta(minutes=45), "user", "new conv"),
        (1, 5, T0 + timedelta(minutes=46), "assistant", "yes"),
        # user 2: a verbatim copy of user 1's first conversation content
        (2, 6, T0, "user", "hi"),
        (2, 8, T0 + timedelta(seconds=10), "assistant", "hello"),
        (2, 7, T0 + timedelta(seconds=10), "assistant", "first-by-id"),
    ]
    return _events(spark, rows)


def test_report_structure_and_tie_ordering(spark):
    rep = {
        (r.user, r.conv_idx): r
        for r in conversation_report(_fixture(spark)).collect()
    }
    c0 = rep[(1, 1)]
    assert (c0.n_turns, c0.n_roles) == (3, 2)
    assert c0.alternation_breaks == 1  # assistant twice in a row
    assert c0.duration_ms == 10_000
    c1 = rep[(1, 2)]
    assert (c1.n_turns, c1.alternation_breaks) == (2, 0)
    # identical content + ordering => identical fingerprint across users
    assert c0.transcript_fp == rep[(2, 1)].transcript_fp


def test_null_content_pins_to_empty_string(spark):
    """Round-8 ADVICE fix: a NULL-content turn renders as 'role:' (the
    coalesced empty string), identical to an explicit '' turn — and the
    DuckDB oracle COALESCEs the same way, so transcript_fp cannot
    diverge on NULL props. Pinned both in conversation_report and in
    dedup_conversations' fingerprint."""
    import hashlib

    with_null = _events(spark, [(1, 1, T0, "user", None)])
    with_empty = _events(spark, [(3, 9, T0, "user", "")])
    fps = [
        conversation_report(df).collect()[0].transcript_fp
        for df in (with_null, with_empty)
    ]
    assert fps[0] == fps[1] == hashlib.md5(b"user:").hexdigest()
    # dedup collapses a NULL-content transcript onto its ''-content twin
    both = _events(
        spark, [(1, 1, T0, "user", None), (3, 9, T0, "user", "")]
    )
    kept = dedup_conversations(assemble_conversations(both))
    assert [r.user for r in kept.collect()] == [1]


def test_assembly_orders_ties_by_tiebreak(spark):
    convs = {
        (r.user, r.conv_idx): [(t.role, t.content) for t in r.turns]
        for r in assemble_conversations(_fixture(spark)).collect()
    }
    assert convs[(1, 1)] == [
        ("user", "hi"),
        ("assistant", "first-by-id"),  # event_id 2 before 3 on the tie
        ("assistant", "hello"),
    ]


def test_max_turns_guard_caps_and_flags(spark):
    """Round-8 verdict #8: max_turns keeps the FIRST n turns (ts,
    tiebreak order), reports the uncapped total, and flags overflow;
    conversations within the cap are untouched and unflagged."""
    rows = [(1, i, T0 + timedelta(seconds=i), "user", f"m{i}") for i in range(5)]
    rows += [(2, 10, T0, "user", "short"), (2, 11, T0 + timedelta(seconds=1), "assistant", "ok")]
    got = {
        r.user: r
        for r in assemble_conversations(
            _events(spark, rows), max_turns=3
        ).collect()
    }
    big, small = got[1], got[2]
    assert [t.content for t in big.turns] == ["m0", "m1", "m2"]
    assert (big.n_turns_total, big.overflowed) == (5, True)
    assert [t.content for t in small.turns] == ["short", "ok"]
    assert (small.n_turns_total, small.overflowed) == (2, False)
    # uncapped call keeps the historical schema (no audit columns)
    plain = assemble_conversations(_events(spark, rows))
    assert plain.columns == ["user", "conv_idx", "turns"]


def test_render_chat_template_exact(spark):
    out = render_chat_template(
        assemble_conversations(_fixture(spark))
    ).filter((F.col("user") == 1) & (F.col("conv_idx") == 2))
    assert out.collect()[0].text == (
        "<|im_start|>user\nnew conv<|im_end|>\n"
        "<|im_start|>assistant\nyes<|im_end|>"
    )


def test_truncate_keeps_whole_turn_suffix(spark):
    convs = assemble_conversations(_fixture(spark))
    got = {
        (r.user, r.conv_idx): r
        for r in truncate_to_context(convs, max_tokens=3).collect()
    }
    c0 = got[(1, 1)]  # per-turn tokens: [1, 1, 1] -> all 3 fit
    assert c0.turns_kept == 3 and c0.tokens_kept == 3
    c1 = got[(1, 2)]  # tokens [2, 1]: both fit exactly
    assert c1.turns_kept == 2 and c1.tokens_kept == 3
    tight = {
        (r.user, r.conv_idx): r
        for r in truncate_to_context(convs, max_tokens=2).collect()
    }
    t1 = tight[(1, 2)]  # last turn (1 tok) fits, adding "new conv" (2) busts
    assert t1.turns_kept == 1 and t1.tokens_kept == 1
    assert [t.content for t in t1.turns] == ["yes"]


def test_truncate_zero_when_last_turn_exceeds_budget(spark):
    convs = assemble_conversations(
        _events(spark, [(9, 1, T0, "user", "a b c d e")])
    )
    row = truncate_to_context(convs, max_tokens=3).collect()[0]
    assert row.turns_kept == 0 and row.tokens_kept == 0 and row.turns == []


def test_dedup_conversations_keeps_min_id(spark):
    convs = assemble_conversations(_fixture(spark))
    kept = {
        (r.user, r.conv_idx)
        for r in dedup_conversations(convs).collect()
    }
    # user 2's conversation duplicates user 1's conv 1 -> dropped
    assert kept == {(1, 1), (1, 2)}


def test_report_single_user_shuffle(spark):
    from g_data_pipeline_spark.operators.planlint import plan_report

    rep = plan_report(conversation_report(_fixture(spark)))
    # one user-keyed exchange (windows + lag reuse it) + the final
    # (user, conv) aggregate's own exchange
    assert rep["shuffles"] <= 2
    assert not rep["row_python_nodes"] and not rep["arrow_python_nodes"]


def test_curate_conversations_end_to_end(spark):
    """pipelines.curate_conversations: dedup -> structure gates ->
    whole-turn truncation -> ChatML rendering, one composed pass."""
    from g_data_pipeline_spark.pipelines import curate_conversations

    rows = [
        # conv A (user 1): well-formed, 2 roles, fits budget -> kept
        (1, 1, T0, "user", "hello there"),
        (1, 2, T0 + timedelta(seconds=5), "assistant", "hi"),
        # conv B (user 3): duplicate of A's transcript -> deduped away
        (3, 5, T0, "user", "hello there"),
        (3, 6, T0 + timedelta(seconds=5), "assistant", "hi"),
        # conv C (user 4): single role only -> gated out
        (4, 7, T0, "user", "monologue"),
        (4, 8, T0 + timedelta(seconds=3), "user", "still me"),
    ]
    out = curate_conversations(
        _events(spark, rows), min_turns=2, min_roles=2, max_tokens=16
    )
    got = out.collect()
    assert [(r.user, r.conv_idx) for r in got] == [(1, 1)]
    assert got[0].text == (
        "<|im_start|>user\nhello there<|im_end|>\n"
        "<|im_start|>assistant\nhi<|im_end|>"
    )
    assert got[0].turns_kept == 2 and got[0].tokens_kept == 3


def test_curate_conversations_truncation_gate(spark):
    """A conversation whose kept-suffix falls below min_turns after
    truncation is dropped, not emitted half-empty."""
    from g_data_pipeline_spark.pipelines import curate_conversations

    rows = [
        (7, 1, T0, "user", " ".join(f"w{i}" for i in range(20))),
        (7, 2, T0 + timedelta(seconds=1), "assistant", "ok fine"),
    ]
    out = curate_conversations(
        _events(spark, rows), min_turns=2, min_roles=2, max_tokens=5
    )
    # only the 2-token assistant turn fits the 5-token budget -> < 2 turns
    assert out.collect() == []


def test_curated_conversations_export_to_jsonl_shards(spark, tmp_path):
    """Glue: curate_conversations feeds export_jsonl_shards — the
    SFT-delivery path (deterministic shard routing on a conversation
    key, gzip JSONL on disk, text round-trips)."""
    import gzip
    import json as _json
    from pathlib import Path

    from g_data_pipeline_spark.pipelines import (
        curate_conversations,
        export_jsonl_shards,
    )

    rows = [
        (1, 1, T0, "user", "hello there"),
        (1, 2, T0 + timedelta(seconds=5), "assistant", "hi"),
        (2, 3, T0, "user", "different ask"),
        (2, 4, T0 + timedelta(seconds=9), "assistant", "different answer"),
    ]
    curated = curate_conversations(
        _events(spark, rows), min_turns=2, min_roles=2, max_tokens=64
    ).withColumn("conv_key", F.concat_ws("-", "user", "conv_idx"))
    dest = str(tmp_path / "sft")
    export_jsonl_shards(
        curated, dest, id_col="conv_key", text_col="text", n_shards=4
    )
    texts = set()
    for p in Path(dest).rglob("*.json*"):
        if p.name.startswith(".") or p.suffix == ".crc":
            continue
        opener = gzip.open if p.suffix == ".gz" else open
        with opener(p, "rt", encoding="utf-8") as fh:
            for line in fh:
                if line.strip():
                    texts.add(_json.loads(line)["text"])
    assert texts == {
        "<|im_start|>user\nhello there<|im_end|>\n"
        "<|im_start|>assistant\nhi<|im_end|>",
        "<|im_start|>user\ndifferent ask<|im_end|>\n"
        "<|im_start|>assistant\ndifferent answer<|im_end|>",
    }
