"""Corpus router (operators/router.py): per-class fixtures, routing
priority (low_quality > code > chat > prose), auditability columns, and
the zero-shuffle label plan."""

from __future__ import annotations

from g_data_pipeline_spark.operators.router import (
    route_documents,
    routing_report,
)

CODE = "def f(x):\n    y = [x]\n    return (y)\n    z = {1: 2}\nclass A:\n    pass"
CHAT = "alice: hey there\nbob: hi how are you\nalice: doing well thanks friend"
TMPL = (
    "<|im_start|>user\nhello there my good friend how are you today"
    "<|im_end|>\n<|im_start|>assistant\nvery well thanks<|im_end|>"
)
PROSE = "A plain paragraph about nothing in particular. " * 4
SHORT = "too short"
DIGITS = "1 2 3 4 5 6 7 8 9 10 11 12 13 14 15"
# code-like AND chat-like: priority must pick code
BOTH = "a: 1\n    x = [f(1)];\n    y = {2};\n    z = (3);\n    w = q<=r;"

DOCS = [
    (1, CODE), (2, CHAT), (3, TMPL), (4, PROSE),
    (5, SHORT), (6, DIGITS), (7, BOTH),
]


def _routes(spark, **kw):
    df = spark.createDataFrame(DOCS, "id long, text string")
    return {r.id: r for r in route_documents(df, **kw).collect()}


def test_each_class_routes_correctly(spark):
    got = _routes(spark)
    assert got[1].route == "code" and got[1].is_code_like
    assert got[2].route == "chat"
    assert got[2].turn_line_share_micro == 1_000_000
    assert got[3].route == "chat" and got[3].has_template_tokens
    assert got[4].route == "prose"
    assert got[5].route == "low_quality"
    assert got[6].route == "low_quality"


def test_priority_code_over_chat_and_quality_over_all(spark):
    got = _routes(spark)
    assert got[7].is_code_like and got[7].route == "code"
    # a code doc that is ALSO too short routes low_quality first
    strict = _routes(spark, min_tokens=25)
    assert strict[1].route == "low_quality"


def test_routing_report_rollup(spark):
    df = spark.createDataFrame(
        [(i, t, "src") for i, t in DOCS], "id long, text string, source string"
    )
    rep = {
        (r.source, r.route): r.n_docs
        for r in routing_report(df, group_cols=["source"]).collect()
    }
    assert rep[("src", "code")] == 2
    assert rep[("src", "chat")] == 2
    assert rep[("src", "prose")] == 1
    assert rep[("src", "low_quality")] == 2


def test_labels_are_scan_stage(spark):
    from g_data_pipeline_spark.operators.planlint import plan_report

    df = spark.createDataFrame(DOCS, "id long, text string")
    rep = plan_report(route_documents(df))
    assert rep["shuffles"] == 0
    assert not rep["row_python_nodes"] and not rep["arrow_python_nodes"]
