"""Line-level curation (operators/lines.py) + HTML→text (functions/html.py):
exact-baseline unit tests on planted fixtures, plus plan pins for the
single-exchange shapes claimed in the docstrings."""

from __future__ import annotations

import hashlib
import re

from pyspark.sql import functions as F

from g_data_pipeline_spark.functions import html as H
from g_data_pipeline_spark.operators import lines as L
from tests.test_plans import op_counts, plan_of, shuffle_count


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_chunked_lines_exact(spark):
    df = _docs(spark, [(1, " ".join(f"w{i}" for i in range(23)),)])
    [row] = df.select(L.chunked_lines(F.col("text")).alias("ls")).collect()
    assert row.ls == [
        " ".join(f"w{i}" for i in range(10)),
        " ".join(f"w{i}" for i in range(10, 20)),
        "w20 w21 w22",
    ]


def test_line_quality_report_planted(spark):
    # doc 1: 4 lines, one duplicated ("dup line"), one short ("tiny").
    text1 = "\n".join(
        ["dup line one two three", "dup line one two three", "tiny", "a b c d e f"]
    )
    # doc 2: all unique, long enough -> keep.
    text2 = "\n".join(["one two three four five", "six seven eight nine ten"])
    df = _docs(spark, [(1, text1), (2, text2)])
    out = {
        r.doc_id: r
        for r in L.line_quality_report(df, F.split(F.col("text"), "\n")).collect()
    }
    assert out[1].n_lines == 4
    assert out[1].n_dup_lines == 1
    assert out[1].n_short_lines == 1
    # dup_frac 1/4 <= 0.3 and short_frac 1/4 <= 0.5 -> keep.
    assert out[1].keep == 1
    assert out[2].n_lines == 2 and out[2].keep == 1


def test_line_quality_keep_thresholds(spark):
    # 2 of 4 lines duplicate -> dup_frac 0.5 > 0.3 -> keep = 0.
    text = "\n".join(["x y z a b", "x y z a b", "x y z a b", "q w e r t"])
    df = _docs(spark, [(1, text)])
    [r] = L.line_quality_report(df, F.split(F.col("text"), "\n")).collect()
    assert r.n_dup_lines == 2
    assert r.keep == 0


def test_remove_duplicate_lines_keeps_first_in_order(spark):
    text = "\n".join(["b b b", "a a a", "b b b", "c c c", "a a a"])
    df = _docs(spark, [(7, text)])
    [r] = L.remove_duplicate_lines(df, F.split(F.col("text"), "\n")).collect()
    assert r.n_lines == 5 and r.n_kept == 3
    expected = "\n".join(["b b b", "a a a", "c c c"])
    assert r.dedup_md5 == hashlib.md5(expected.encode()).hexdigest()


def test_dedup_lines_exploded_matches_aggregate_form(spark):
    text = "\n".join(["l1 x", "l2 y", "l1 x", "l3 z"])
    df = _docs(spark, [(3, text)])
    rows = sorted(
        L.dedup_lines_exploded(df, F.split(F.col("text"), "\n")).collect(),
        key=lambda r: r.pos,
    )
    assert [(r.pos, r.line) for r in rows] == [(0, "l1 x"), (1, "l2 y"), (3, "l3 z")]


def _py_html_to_text(html: str) -> str:
    out = re.sub(r"(?s)<script[^>]*>.*?</script>", " ", html)
    out = re.sub(r"(?s)<style[^>]*>.*?</style>", " ", out)
    out = re.sub(r"<[^>]+>", " ", out)
    for ent, plain in H.ENTITY_DECODES:
        out = out.replace(ent, plain)
    return re.sub(r"\s+", " ", out).strip()


def test_html_to_text_exact(spark):
    html = (
        '<html><head><script src="x.js">if (a < b && c > d) { alert("hi"); }'
        "</script><style>p > a { color: blue }</style></head>"
        "<body><h1>Title</h1>\n<p>Hello &amp; welcome to &lt;Spark&gt;"
        "&nbsp;land &#39;quoted&#39; &amp;amp; double.</p></body></html>"
    )
    df = spark.createDataFrame([(1, html)], "id long, html string")
    [r] = df.select(H.html_to_text(F.col("html")).alias("t")).collect()
    expected = _py_html_to_text(html)
    assert r.t == expected
    # Spot-check semantics, not just parity with the Python twin:
    assert "alert" not in r.t and "color" not in r.t  # blocks gone
    assert "Title Hello & welcome to <Spark> land 'quoted' &amp; double." == r.t


def test_html_tag_count_ignores_script_innards(spark):
    html = "<script>var s = '<fake><tags>';</script><p>x</p><br/>"
    df = spark.createDataFrame([(1, html)], "id long, html string")
    [r] = df.select(H.tag_count(F.col("html")).alias("n")).collect()
    assert r.n == 3  # <p>, </p>, <br/> — nothing from inside the script


def test_line_quality_two_phase_distinct_aggregate(spark):
    """Exact duplicate-line counting needs COUNT(DISTINCT line) per doc:
    Spark plans it as the standard two-phase distinct aggregate — partial
    on (doc_id, line), final on doc_id — exactly two exchanges, both
    map-side combined, and no join anywhere."""
    plan = plan_of(spark, "t_line_quality")
    assert shuffle_count(plan) == 2
    assert "Join" not in plan


def test_dup_line_removal_two_mapside_aggregates(spark):
    """(doc,line) min-pos aggregate then doc rebuild: at most two
    exchanges, no window over raw lines, no join."""
    plan = plan_of(spark, "d_dup_line_removal")
    assert shuffle_count(plan) <= 2
    assert op_counts(plan).get("Window", 0) == 0
    assert "Join" not in plan


def test_html_to_text_zero_shuffle_scan(spark):
    """The extraction chain is pure per-row expressions: no exchange at
    all — it runs inside the scan stage."""
    plan = plan_of(spark, "t_html_to_text")
    assert shuffle_count(plan) == 0
