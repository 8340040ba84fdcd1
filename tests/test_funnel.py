"""Curation attrition funnel (pipelines.curation_attrition): first-fail
gate attribution, survivorship-among-passing semantics, and the plan
shape (one fingerprint aggregate, labels row-local)."""

from __future__ import annotations

from g_data_pipeline_spark.pipelines import curation_attrition

_W = " ".join(f"w{chr(97 + i)}" for i in range(12))   # letter-only words
_U = " ".join(f"u{chr(97 + i)}" for i in range(15))

DOCS = [
    (1, "short doc"),                                   # 2 tokens
    (2, "numbers 1 2 3 4 5 6 7 8 9 10 11 12 13 14"),    # digit-heavy
    (3, _W),                                             # kept (canonical)
    (4, _W),                                             # exact dup of 3
    (5, _U),                                             # kept, unique
    # duplicate of a REJECTED doc: judged on its own merits -> its only
    # quality-passing copy is itself, so it is kept, not 'exact_duplicate'
    (6, "short doc"),
]


def _stages(spark, **kw):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    return {
        r.doc_id: r.stage
        for r in curation_attrition(df, "doc_id", "text", **kw).collect()
    }


def test_first_fail_attribution(spark):
    got = _stages(spark)
    assert got[1] == "too_few_tokens"
    assert got[2] == "digit_heavy"
    assert got[3] == "kept"
    assert got[4] == "exact_duplicate"
    assert got[5] == "kept"
    # doc 6 duplicates a REJECTED doc -> it fails quality itself
    assert got[6] == "too_few_tokens"


def test_total_labeling_and_threshold_plumbing(spark):
    got = _stages(spark, min_tokens=2)
    assert len(got) == len(DOCS)  # every input row labeled
    # with the lower bar, 1 and 6 pass quality and dedup against each
    # other: min doc_id survives
    assert got[1] == "kept" and got[6] == "exact_duplicate"


def test_plan_one_content_keyed_aggregate(spark):
    from g_data_pipeline_spark.operators.planlint import plan_report

    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    rep = plan_report(curation_attrition(df))
    # canon aggregate + its join are the only wide ops
    assert rep["shuffles"] <= 3
    assert not rep["row_python_nodes"] and not rep["arrow_python_nodes"]
