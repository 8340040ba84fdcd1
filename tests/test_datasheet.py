"""Corpus datasheet (operators/datasheet.py): every DuckDB-expressible
scalar is cross-checked one-liner-for-one-liner; composition shares are
pinned to sum ~1e6 per dimension and to match direct groupBy counts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.functions.text import lang_id, quality_score
from g_data_pipeline_spark.operators import datasheet

SF = "/root/testdata/sf0.01"

_TOK = (
    "CASE WHEN trim(text) = '' THEN 0 "
    "ELSE len(string_split_regex(trim(lower(text)), '\\s+')) END"
)
_FP = (
    r"md5(trim(regexp_replace(regexp_replace(lower(text),"
    r" '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')))"
)


def test_datasheet_stats_match_duckdb(spark, duck):
    docs = load_table(spark, SF, "documents")
    r = datasheet.corpus_datasheet_stats(docs).collect()[0]
    want = duck.execute(
        f"""
        SELECT COUNT(*) AS n_docs,
               SUM(CASE WHEN trim(text) = '' THEN 1 ELSE 0 END) AS n_empty,
               SUM(length(text)) AS total_chars,
               SUM({_TOK}) AS total_tokens,
               quantile_cont({_TOK}, 0.25) AS p25,
               quantile_cont({_TOK}, 0.5) AS p50,
               quantile_cont({_TOK}, 0.75) AS p75,
               COUNT(DISTINCT {_FP}) AS n_fps
        FROM documents
        """
    ).fetchone()
    assert r["n_docs"] == want[0]
    assert r["n_empty_docs"] == int(want[1])
    assert r["total_chars"] == int(want[2])
    assert r["total_tokens"] == int(want[3])
    assert r["tok_p25"] == pytest.approx(want[4], abs=1e-9)
    assert r["tok_p50"] == pytest.approx(want[5], abs=1e-9)
    assert r["tok_p75"] == pytest.approx(want[6], abs=1e-9)
    assert r["n_distinct_fps"] == want[7]
    assert r["exact_dup_rate_micro"] == (
        (r["n_docs"] - r["n_distinct_fps"]) * 1_000_000 // r["n_docs"]
    )


def test_datasheet_quality_field_matches_spark_recompute(spark):
    docs = load_table(spark, SF, "documents")
    r = datasheet.corpus_datasheet_stats(docs).collect()[0]
    chk = docs.agg(
        F.floor(
            F.sum(F.floor(quality_score("text") * F.lit(1_000_000.0)))
            / F.count(F.lit(1))
        ).alias("m")
    ).collect()[0]
    assert r["mean_quality_micro"] == chk["m"]
    assert 0 <= r["mean_quality_micro"] <= 1_000_000


def test_datasheet_composition_shares(spark):
    docs = load_table(spark, SF, "documents")
    rows = datasheet.corpus_datasheet_composition(docs).collect()
    dims = {}
    for r in rows:
        dims.setdefault(r["dimension"], []).append(r)
    assert set(dims) == {"language", "source"}
    n_docs = docs.count()
    for dim, rs in dims.items():
        assert sum(r["n_docs"] for r in rs) == n_docs
        total_share = sum(r["share_micro"] for r in rs)
        assert 1_000_000 - len(rs) <= total_share <= 1_000_000  # floor loss
    # source counts equal a direct groupBy
    direct = {
        r["source"]: r["count"]
        for r in docs.groupBy("source").count().collect()
    }
    got = {r["value"]: r["n_docs"] for r in dims["source"]}
    assert got == direct
    # language values come from the engine's own lang_id
    langs = {
        r["l"]
        for r in docs.select(lang_id("text").alias("l")).distinct().collect()
    }
    assert {r["value"] for r in dims["language"]} == langs


def test_tokenizer_fertility(spark):
    docs = load_table(spark, SF, "documents")
    rows = datasheet.tokenizer_fertility(docs).collect()
    assert rows and all(r["n_docs"] > 0 for r in rows)
    n_docs = docs.count()
    assert sum(r["n_docs"] for r in rows) == n_docs
    # cross-check one language's sums against a direct recompute
    from g_data_pipeline_spark.functions.text import (
        bpe_token_count,
        lang_id,
        token_count,
    )

    direct = (
        docs.select(
            lang_id("text").alias("l"),
            token_count("text").cast("long").alias("w"),
            bpe_token_count("text").cast("long").alias("t"),
        )
        .groupBy("l")
        .agg(F.sum("w").alias("w"), F.sum("t").alias("t"))
        .collect()
    )
    want = {r["l"]: (r["w"], r["t"]) for r in direct}
    for r in rows:
        assert (r["n_words"], r["n_subword_tokens"]) == want[r["language"]]
        if r["n_words"] > 0:
            assert (
                r["fertility_micro"]
                == r["n_subword_tokens"] * 1_000_000 // r["n_words"]
            )
            # sub-word tokenization never merges words: fertility >= ~1
            assert r["fertility_micro"] >= 900_000
