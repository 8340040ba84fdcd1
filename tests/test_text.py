"""Unit tests for functions.text on inline edge cases (blank text, CJK,
short docs) that the documents-table oracle gate doesn't isolate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions import text as X


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "The quick brown fox jumps over the lazy dog and it is fine"),
        (2, "der hund ist nicht ein fisch und das ist gut"),
        (3, "le chat est dans la maison pour le moment"),
        (4, "el perro es un animal en la casa por que si"),
        (5, "这是一个中文句子没有空格"),
        (6, ""),
        (7, "   "),
        (8, "one two"),
        (9, "12345 67890 !!!"),
    ]
    return spark.createDataFrame(rows, "id int, text string")


def _one(df, col_expr, alias="v"):
    return {r.id: r[alias] for r in df.select("id", col_expr.alias(alias)).collect()}


def test_token_count_edges(docs):
    got = _one(docs, X.token_count("text"))
    assert got[1] == 13
    assert got[6] == 0 and got[7] == 0
    assert got[8] == 2


def test_lang_id(docs):
    got = _one(docs, X.lang_id("text"))
    assert got[1] == "en"
    assert got[2] == "de"
    assert got[3] == "fr"
    assert got[4] == "es"
    assert got[5] == "zh"
    assert got[9] == "unknown"


def test_quality_score_orders_sanely(docs):
    got = _one(docs, X.quality_score("text"))
    assert 0.0 <= got[1] <= 1.0
    assert got[1] > got[9]  # prose beats digit soup
    assert got[6] == pytest.approx(0.2)  # empty: only the no-noise term


def test_fingerprint_normalization(spark):
    df = spark.createDataFrame(
        [(1, "Hello,   World!"), (2, "hello world"), (3, "HELLO WORLD?")],
        "id int, text string",
    )
    got = _one(df, X.fingerprint_md5("text"))
    assert got[1] == got[2] == got[3]  # punctuation/case/whitespace invariant
    assert len(got[1]) == 32


def test_rolling_hash_deterministic_and_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "abc def"), (2, "abc def"), (3, "def abc")], "id int, text string"
    )
    got = _one(df, X.rolling_hash("text"))
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_word_shingles(spark):
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b"), (3, "x y z")], "id int, text string"
    )
    got = _one(df, X.word_shingles("text", 3))
    assert got[1] == ["a b c", "b c d"]
    assert got[2] == []
    assert got[3] == ["x y z"]


def test_bpe_token_count(spark):
    df = spark.createDataFrame([(1, "ab12-cd!")], "id int, text string")
    got = _one(df, X.bpe_token_count("text"))
    assert got[1] == 5  # ab | 12 | - | cd | !


def test_chunk_tokens_overlap_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g"), (2, "x"), (3, ""), (4, "   ")],
        "id int, text string",
    )
    got = _one(df, X.chunk_tokens("text", 3, 1))
    assert [(c.chunk_idx, c.chunk, c.n_tokens) for c in got[1]] == [
        (0, "a b c", 3),
        (1, "c d e", 3),
        (2, "e f g", 3),
        (3, "g", 1),
    ]
    assert [(c.chunk, c.n_tokens) for c in got[2]] == [("x", 1)]
    assert got[3] == [] and got[4] == []  # blank text -> zero chunks


def test_chunk_tokens_rejects_bad_overlap():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        X.chunk_tokens("text", 4, 4)


# ----------------------------------------------------- Luhn card detection


def test_luhn_valid_known_vectors(spark):
    rows = [
        ("4111111111111111", True),   # classic Visa test number
        ("4012888888881881", True),
        ("5555555555554444", True),   # Mastercard test number
        ("4111111111111112", False),  # off-by-one checksum
        ("1234567812345678", False),
        ("123", False),               # too short
        ("", False),
        ("41111111111111a1", False),  # non-digit
    ]
    df = spark.createDataFrame(rows, "d string, want boolean")
    bad = df.filter(X.luhn_valid("d") != F.col("want")).collect()
    assert bad == []


def test_find_credit_cards_in_text(spark):
    rows = [
        (1, "pay 4111-1111-1111-1111 now", ["4111111111111111"]),
        (2, "also 4012 8888 8888 1881 ok", ["4012888888881881"]),
        (3, "order 4111111111111112 isn't a card", []),   # fails Luhn
        (4, "call 555 123 4567", []),                     # too short
        (5, "ts 20260815061500 fine", []),                # 14d, bad Luhn
        (6, "two: 4111111111111111 5555555555554444",
            ["4111111111111111", "5555555555554444"]),
        (7, "", []),
    ]
    df = spark.createDataFrame(rows, "id int, text string, want array<string>")
    got = {
        r["id"]: (sorted(r["c"]), r["h"])
        for r in df.select(
            "id",
            X.find_credit_cards("text").alias("c"),
            X.has_credit_card("text").alias("h"),
        ).collect()
    }
    for rid, _, want in rows:
        assert got[rid] == (sorted(want), bool(want)), rid
