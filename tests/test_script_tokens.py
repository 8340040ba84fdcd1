"""Script-aware (CJK) tokenization (functions/text.py mode="script"):
default-path parity (byte-identical without CJK), per-character CJK
tokens, mixed-script counts, shingle threading, and the mode guard.
Round-7 verdict directive #2."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import (
    CJK_CHAR_CLASS,
    token_count,
    tokens,
    word_shingles,
)

LATIN = [
    "Hello world",
    "  padded   runs\tand\ttabs ",
    "",
    "one",
    "punct, stays. attached!",
]
CJK = "今日は良い天気です"          # 9 Han/kana chars, no whitespace
MIXED = "GPU 推論 is 速い"          # latin + spaced CJK words


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "t string").select(
        col.alias("v")
    ).collect()[0].v


def test_default_path_parity_without_cjk(spark):
    """mode='script' is byte-identical to the default on CJK-free text —
    the opt-in changes nothing for existing corpora."""
    df = spark.createDataFrame([(t,) for t in LATIN], "t string")
    rows = df.select(
        tokens("t").alias("w"),
        tokens("t", "script").alias("s"),
        token_count("t").alias("wc"),
        token_count("t", "script").alias("sc"),
    ).collect()
    for r in rows:
        assert r.w == r.s
        assert r.wc == r.sc


def test_cjk_sentence_one_token_per_char(spark):
    assert _one(spark, CJK, token_count(F.col("t"))) == 1  # the blind spot
    assert _one(spark, CJK, token_count(F.col("t"), "script")) == len(CJK)
    toks = _one(spark, CJK, tokens(F.col("t"), "script"))
    assert toks == list(CJK)


def test_mixed_script_counts(spark):
    # whitespace sees 4 space-delimited blobs; script mode splits the
    # two CJK blobs into chars: GPU, 推, 論, is, 速, い -> 6
    assert _one(spark, MIXED, token_count(F.col("t"))) == 4
    assert _one(spark, MIXED, token_count(F.col("t"), "script")) == 6
    assert _one(spark, MIXED, tokens(F.col("t"), "script")) == [
        "gpu", "推", "論", "is", "速", "い",
    ]


def test_shingles_script_mode(spark):
    got = _one(spark, "大規模モデル", word_shingles(F.col("t"), 2, "script"))
    assert got == ["大 規", "規 模", "模 モ", "モ デ", "デ ル"]
    # default mode: the whole string is one "word" -> no 2-shingles
    assert _one(spark, "大規模モデル", word_shingles(F.col("t"), 2)) == []


def test_hangul_and_kana_ranges_covered(spark):
    assert _one(spark, "안녕하세요", token_count(F.col("t"), "script")) == 5
    assert _one(spark, "カタカナとひらがな", token_count(F.col("t"), "script")) == 9


def test_packing_and_budget_thread_token_mode(spark):
    """pack_sequences/plan_token_budget accept token_mode='script': a
    whitespace-free CJK doc contributes its char count, not 1."""
    from g_data_pipeline_spark.operators.budget import plan_token_budget
    from g_data_pipeline_spark.operators.packing import pack_sequences

    df = spark.createDataFrame(
        [(1, CJK, "zh"), (2, "two words", "en")],
        "id long, text string, source string",
    )
    packed = {
        r.id: r.n_tokens
        for r in pack_sequences(
            df, "id", "text", "source", capacity=8, token_mode="script"
        ).collect()
    }
    assert packed == {1: len(CJK), 2: 2}
    plan = {
        r.source: r.natural_tokens
        for r in plan_token_budget(
            df, "source", "text", target_tokens=100, token_mode="script"
        ).collect()
    }
    assert plan == {"zh": len(CJK), "en": 2}
    # default mode unchanged: the CJK doc is 1 token
    legacy = {
        r.source: r.natural_tokens
        for r in plan_token_budget(
            df, "source", "text", target_tokens=100
        ).collect()
    }
    assert legacy == {"zh": 1, "en": 2}


def test_mode_guard():
    with pytest.raises(ValueError, match="token mode"):
        tokens("t", "bpe")
    with pytest.raises(ValueError, match="token mode"):
        token_count("t", "chars")


def test_char_class_is_engine_portable():
    """The class must stay explicit code-point ranges (no \\p{...}), so
    DuckDB's RE2 and Java regex agree by construction."""
    assert "\\p" not in CJK_CHAR_CLASS
    import re

    assert len(re.findall(CJK_CHAR_CLASS, "安녕hi히라がなヿテスト")) == 10
    import duckdb

    n = duckdb.sql(
        f"SELECT len(regexp_extract_all('安녕hi히라がなヿテスト', "
        f"'{CJK_CHAR_CLASS}'))"
    ).fetchone()[0]
    assert n == 10


def test_shingle_dedup_threads_token_mode(spark):
    """Round-8 thread-through: shingle-based dedup sees CJK near-dups
    only under token_mode='script' (default mode shingles a CJK
    sentence as zero 3-shingles -> blind), and the default path stays
    byte-identical on Latin text."""
    from g_data_pipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        ngram_jaccard_pairs,
    )

    a = "今日は良い天気ですね明日も晴れるでしょう"
    b = "今日は良い天気ですね明日も雨になるでしょう"
    df = spark.createDataFrame([(1, a), (2, b)], "id long, text string")
    blind = ngram_jaccard_pairs(df, "id", "text", n=3, threshold=0.3)
    assert blind.count() == 0
    seeing = ngram_jaccard_pairs(
        df, "id", "text", n=3, threshold=0.3, token_mode="script"
    )
    rows = seeing.collect()
    assert [(r.id_a, r.id_b) for r in rows] == [(1, 2)]
    assert rows[0].jaccard > 0.3
    mh = minhash_lsh_pairs(
        df, "id", "text", n=3, threshold=0.3, bands=16,
        token_mode="script",
    )  # 16x2 banding: candidate probability ~0.96 at this pair's
    # Jaccard (deterministic xxhash64 -> fixed outcome, not flaky)
    assert [(r.id_a, r.id_b) for r in mh.collect()] == [(1, 2)]
    # Latin default-path parity: mode changes nothing without CJK
    lat = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma epsilon")],
        "id long, text string",
    )
    k = lambda df_: sorted(map(tuple, df_.collect()))  # noqa: E731
    assert k(ngram_jaccard_pairs(lat, "id", "text", threshold=0.1)) == k(
        ngram_jaccard_pairs(
            lat, "id", "text", threshold=0.1, token_mode="script"
        )
    )
