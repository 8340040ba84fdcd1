"""Fused scorecard (operators/scorecard.py): per-family parity vs the
standalone operators on real documents, plus the zero-shuffle plan pin
that is the module's whole point."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.lines import (
    chunked_lines,
    line_quality_report,
)
from g_data_pipeline_spark.operators.repetition import repetition_stats
from g_data_pipeline_spark.operators.scorecard import (
    max_multiplicity,
    quality_scorecard,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def card(spark, docs):
    return {
        r["doc_id"]: r for r in quality_scorecard(docs).collect()
    }


def test_max_multiplicity(spark):
    rows = spark.createDataFrame(
        [
            (1, ["a", "b", "a", "c", "a"]),
            (2, ["x"]),
            (3, []),
            (4, ["y", "y", "z", "z", "z", "y"]),
        ],
        "id int, arr array<string>",
    ).select("id", max_multiplicity(F.col("arr")).alias("m")).collect()
    assert {r["id"]: r["m"] for r in rows} == {1: 3, 2: 1, 3: 0, 4: 3}


def test_alpha_token_frac_translate_form_edge_tokens(spark):
    """repetition_stats' r11 translate-based "token contains a letter"
    must equal the historical per-token rlike('[a-z]') on edge tokens:
    digits-only, punctuation-only, empty-string token (blank text
    splits to ['']), mixed, and letters embedded in symbols. The
    scorecard keeps the rlike form, so the family-parity test above
    cross-pins the two on real documents; this pins the corners."""
    rows = (
        spark.createDataFrame(
            [
                (1, "123 456 789"),          # no letters at all
                (2, "a1 2b2 ..c.. --"),      # embedded letters + symbols
                (3, ""),                      # blank -> [''] token
                (4, "!!! ??? ,,,"),          # punctuation-only tokens
                (5, "normal words here 42"),
            ],
            "doc_id int, text string",
        )
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["alpha_token_frac"])
        for r in repetition_stats(rows).collect()
    }
    assert got[1] == (3, 0.0)
    assert got[2] == (4, 0.75)
    assert got[3] == (1, 0.0)
    assert got[4] == (3, 0.0)
    assert got[5] == (4, 0.75)


def test_gopher_family_matches_repetition_stats(docs, card):
    want = {r["doc_id"]: r for r in repetition_stats(docs).collect()}
    assert set(card) == set(want)
    for did, w in want.items():
        g = card[did]
        assert g["n_tokens"] == w["n_tokens"], did
        assert g["dup_token_ratio"] == w["dup_token_ratio"], did
        assert g["alpha_token_frac"] == w["alpha_token_frac"], did
        # the row-local sorted-run count vs the exploded groupBy count
        assert g["top_bigram_count"] == w["top_bigram_count"], did
        assert g["top_bigram_frac"] == w["top_bigram_frac"], did
        assert g["gopher_keep"] == w["gopher_keep"], did


def test_line_family_matches_line_quality_report(docs, card):
    want = {
        r["doc_id"]: r
        for r in line_quality_report(
            docs, chunked_lines(F.col("text"))
        ).collect()
    }
    for did, w in want.items():
        g = card[did]
        for f in [
            "n_lines",
            "n_short_lines",
            "n_dup_lines",
            "n_terminal_punct_lines",
        ]:
            assert g[f] == w[f], (did, f)
        assert int(g["line_keep"]) == w["keep"], did


def test_keep_is_conjunction(card):
    for did, g in card.items():
        assert g["keep"] == (g["gopher_keep"] and g["line_keep"]), did
    # the fixture corpus must exercise both outcomes
    assert {g["keep"] for g in card.values()} == {True, False}


def test_plan_is_single_scan_zero_shuffle(spark, docs):
    plan = (
        quality_scorecard(docs)
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
    )
    tree = plan.split("(1) Scan")[0]
    assert tree.count("Scan parquet") == 1
    assert "Exchange" not in tree
    assert "Join" not in tree
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan