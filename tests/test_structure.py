"""Document structure profiling (functions/structure.py): per-pattern
counts, format classification precedence, and the rollup."""

from __future__ import annotations

from g_data_pipeline_spark.functions.structure import (
    doc_format,
    format_profile,
    structure_signals,
)

MD = "# Title\nintro text\n- one\n- two\n```\ncode\n```\n[x](https://e)"
HTML = "<html><p>hello world</p><div class=\"x\">y</div></html>"
PLAIN = "just ordinary prose with - a dash but no list\nand a # hash"
MIXED = "<table><tr>a</tr></table>\n# heading\n- bullet\n- bullet"


def _rows(spark):
    df = spark.createDataFrame(
        [(1, MD), (2, HTML), (3, PLAIN), (4, MIXED)], "id long, text string"
    )
    sig = structure_signals("text")
    cols = [c.alias(k) for k, c in sig.items()]
    return {
        r.id: r
        for r in df.select("id", *cols, doc_format("text").alias("fmt")).collect()
    }


def test_pattern_counts_exact(spark):
    got = _rows(spark)
    md = got[1]
    assert (md.md_headers, md.md_bullets, md.code_fences, md.md_links) == (
        1, 2, 2, 1,
    )
    html = got[2]
    # element OPENINGS only: html, p, div -- closings excluded
    assert html.html_tags == 3
    plain = got[3]
    # "- a dash" mid-line and "a # hash" must not count
    assert (plain.md_headers, plain.md_bullets) == (0, 0)


def test_format_classification(spark):
    got = _rows(spark)
    assert got[1].fmt == "markdown"
    assert got[2].fmt == "html"
    assert got[3].fmt == "plain"
    assert got[4].fmt == "html"  # html wins over markdown constructs


def test_profile_rollup(spark):
    df = spark.createDataFrame(
        [(1, MD), (2, HTML), (3, PLAIN), (4, MIXED)], "id long, text string"
    )
    rep = {r.doc_format: r for r in format_profile(df, "text").collect()}
    assert rep["markdown"].n_docs == 1
    assert rep["html"].n_docs == 2
    assert rep["plain"].n_docs == 1
    assert rep["markdown"].n_code_fences == 2
