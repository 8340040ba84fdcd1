"""Paragraph-level exact dedup (operators/paragraphs.py): first-
occurrence survivorship, in-order reassembly, fully-cut docs, and
duplicate-doc interplay."""

from __future__ import annotations

from g_data_pipeline_spark.operators.paragraphs import dedup_paragraphs

SEP = "\n\n"


def _run(spark, rows):
    df = spark.createDataFrame(rows, "id long, text string")
    return {r.id: r for r in dedup_paragraphs(df, "id", "text").collect()}


def test_boilerplate_removed_everywhere_but_first(spark):
    boiler = "subscribe now"
    got = _run(
        spark,
        [
            (1, f"alpha body{SEP}{boiler}"),
            (2, f"{boiler}{SEP}beta body"),
            (3, f"gamma body{SEP}{boiler}{SEP}tail part"),
        ],
    )
    assert got[1].cleaned == f"alpha body{SEP}{boiler}"   # first occurrence
    assert got[2].cleaned == "beta body"
    assert got[3].cleaned == f"gamma body{SEP}tail part"  # mid-doc cut
    assert (got[2].n_paragraphs, got[2].n_removed) == (2, 1)
    assert (got[3].n_paragraphs, got[3].n_removed) == (3, 1)


def test_fully_boilerplate_doc_pins_empty_string(spark):
    got = _run(spark, [(1, "only para"), (2, "only para")])
    assert got[1].cleaned == "only para"
    assert got[2].cleaned == "" and got[2].n_removed == 1


def test_within_doc_repeats_keep_first(spark):
    got = _run(spark, [(1, f"x{SEP}x{SEP}y")])
    assert got[1].cleaned == f"x{SEP}y"
    assert got[1].n_removed == 1


def test_order_preserved_after_cuts(spark):
    got = _run(
        spark,
        [
            (1, "a"),
            (2, f"z{SEP}a{SEP}m{SEP}a{SEP}q"),
        ],
    )
    assert got[2].cleaned == f"z{SEP}m{SEP}q"
    assert got[2].n_removed == 2


def test_null_text_doc_keeps_its_row(spark):
    """split(NULL) is NULL and posexplode would silently drop the doc —
    NULL text must coalesce to '' so the one-row-per-input-doc contract
    holds (r8 ADVICE)."""
    got = _run(spark, [(1, "real body"), (2, None)])
    assert set(got) == {1, 2}
    assert got[2].n_paragraphs == 1
    assert got[2].cleaned == "" and got[2].n_removed == 0


# --- remove_boilerplate_lines (CCNet >=N-doc removal, round 9) --------------

from g_data_pipeline_spark.operators.paragraphs import (  # noqa: E402
    remove_boilerplate_lines,
)

NL = "\n"


def _run_lines(spark, rows, min_docs=3):
    df = spark.createDataFrame(rows, "id long, text string")
    return {
        r.id: r
        for r in remove_boilerplate_lines(
            df, "id", "text", min_docs=min_docs
        ).collect()
    }


def test_line_in_min_docs_removed_everywhere_including_first(spark):
    """No first-occurrence privilege: ALL occurrences of a >=3-doc line
    are cut (the contract difference vs dedup_paragraphs)."""
    b = "cookie banner"
    got = _run_lines(
        spark,
        [
            (1, f"{b}{NL}alpha"),
            (2, f"beta{NL}{b}"),
            (3, f"{b}{NL}gamma{NL}{b}"),
        ],
    )
    assert got[1].cleaned == "alpha"
    assert got[2].cleaned == "beta"
    assert got[3].cleaned == "gamma" and got[3].n_removed == 2


def test_line_below_floor_survives(spark):
    """A line in exactly min_docs-1 distinct docs survives everywhere —
    within-doc repeats don't count toward the distinct-doc floor."""
    t = "twin line"
    got = _run_lines(
        spark,
        [(1, f"{t}{NL}a{NL}{t}"), (2, f"{t}{NL}b"), (3, "c")],
    )
    assert got[1].cleaned == f"{t}{NL}a{NL}{t}"
    assert got[2].cleaned == f"{t}{NL}b"
    assert sum(r.n_removed for r in got.values()) == 0


def test_fully_boilerplate_doc_pins_empty_cleaned(spark):
    b = "footer"
    got = _run_lines(spark, [(1, b), (2, b), (3, b)])
    assert all(r.cleaned == "" and r.n_removed == 1 for r in got.values())


def test_null_text_doc_keeps_row_in_line_removal(spark):
    got = _run_lines(spark, [(1, "x\ny"), (2, None), (3, "z")])
    assert set(got) == {1, 2, 3}
    assert got[2].n_lines == 1 and got[2].cleaned == ""
