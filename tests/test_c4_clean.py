"""The composed C4 cleaning transform (operators/lines.c4_clean) on
REAL newline-delimited corpora (the gate d_c4_clean covers the
chunked-line view; this is the primary split(text, '\\n') interface):
line keeps, page-drop rules, drop_reason ordering, and the full-keep
path."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.lines import c4_clean

GOOD = (
    "The first sentence has enough words right here.\n"
    "The second sentence also carries plenty of words.\n"
    "The third sentence closes the page nicely today."
)


def _run(spark, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    return {
        r.doc_id: r
        for r in c4_clean(
            df, F.split(F.col("text"), "\n"), id_col="doc_id"
        ).collect()
    }


def test_full_keep_page(spark):
    got = _run(spark, [(1, GOOD)])[1]
    assert got.page_keep and got.drop_reason == ""
    assert got.n_lines == 3 and got.n_kept_lines == 3
    assert got.cleaned == GOOD


def test_line_keeps_drop_short_nonterminal_and_javascript(spark):
    text = (
        GOOD
        + "\nshort line.\n"              # < 5 words
        + "no terminal punctuation on this line at all\n"
        + "please enable javascript to continue reading today."
    )
    got = _run(spark, [(1, text)])[1]
    assert got.n_lines == 6 and got.n_kept_lines == 3
    assert got.cleaned == GOOD
    assert got.page_keep  # 3 sentences retained


def test_page_drop_rules_and_reason_order(spark):
    rows = [
        (1, GOOD + "\nlorem ipsum dolor sit amet here today."),
        (2, GOOD + "\nwindow.config = { debug: true }"),
        (3, GOOD + "\nclaim your casino bonus now my good friends."),
        (4, "Only one good sentence lives on this page."),
        # lorem outranks brace outranks blocklist (first-failed-rule)
        (5, GOOD + "\nlorem ipsum { casino bonus }"),
    ]
    got = _run(spark, rows)
    assert [got[i].drop_reason for i in (1, 2, 3, 4, 5)] == [
        "lorem_ipsum",
        "brace",
        "blocklist",
        "too_few_sentences",
        "lorem_ipsum",
    ]
    assert not any(got[i].page_keep for i in (1, 2, 3, 4, 5))
    # cleaned is still computed for dropped pages (attrition audit)
    assert got[4].cleaned == "Only one good sentence lives on this page."


def test_custom_floors_and_blocklist(spark):
    got = {
        r.doc_id: r
        for r in c4_clean(
            spark.createDataFrame(
                [(1, "Tiny page.\nAnother tiny line here now.")],
                "doc_id long, text string",
            ),
            F.split(F.col("text"), "\n"),
            id_col="doc_id",
            min_words=2,
            min_sentences=1,
            blocklist_words=("another",),
        ).collect()
    }[1]
    assert got.n_kept_lines == 2
    assert got.drop_reason == "blocklist"  # custom list fires


def test_blocklist_regex_rejects_contract_violations():
    """r9 ADVICE: entries with regex metacharacters or space runs would
    silently change matching semantics in both the Spark gate and any
    oracle sharing the alternation — the builder must raise instead."""
    import pytest

    from g_data_pipeline_spark.functions.blocklist import (
        DEFAULT_BLOCKLIST,
        blocklist_regex,
    )

    # the bundled placeholder list satisfies the contract
    assert blocklist_regex(DEFAULT_BLOCKLIST).startswith(r"\b(")
    for bad in (
        ("a.b",),            # metacharacter
        ("win (now)",),      # parens
        ("cash+",),          # quantifier
        ("double  space",),  # space run
        ("Trés",),      # non-ASCII (word-boundary divergence)
        ("Upper",),          # uppercase (gate lowercases its input)
        ("",),               # empty alternation branch matches anything
    ):
        with pytest.raises(ValueError, match="blocklist entries"):
            blocklist_regex(bad)
