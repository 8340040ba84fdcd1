"""Synthetic-text contamination detection (functions/synthetic.py):
per-family artifact counts, the suspect flag, clean-text negatives,
and the rollup micro rate."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.synthetic import (
    synthetic_report,
    synthetic_signals,
)

DOCS = [
    (1, "normal prose about weather and trade routes", "a"),
    (2, "tutorial text\n<|im_start|>assistant\nhello<|im_end|>", "a"),
    (3, "As an AI language model, I cannot do that.", "a"),
    (4, "steps below. Regenerate response. Copy code", "b"),
    (5, "please consult [INST] the manual [/INST] twice [INST] more", "b"),
    (6, "I'm sorry, but I can't help with that request.", "b"),
    # near-misses that must NOT trip: plain pipes, the word assistant
    (7, "a | b | c tables and an assistant manager role", "b"),
    (8, "as of my last visit the shop was closed", "b"),
]


def _sig(spark):
    df = spark.createDataFrame(DOCS, "id long, text string, source string")
    sig = synthetic_signals("text")
    return {
        r.id: r
        for r in df.select(
            "id",
            sig["template_hits"].alias("t"),
            sig["assistant_phrase_hits"].alias("p"),
            sig["ui_artifact_hits"].alias("u"),
            sig["is_synthetic_suspect"].alias("s"),
        ).collect()
    }


def test_artifact_counts_exact(spark):
    got = _sig(spark)
    assert (got[1].t, got[1].p, got[1].u, got[1].s) == (0, 0, 0, False)
    assert (got[2].t, got[2].s) == (2, True)       # im_start + im_end
    assert (got[3].p, got[3].s) == (1, True)
    assert (got[4].u, got[4].s) == (2, True)       # regenerate + copy code
    assert got[5].t == 3                           # [INST] x2 + [/INST]
    assert (got[6].p, got[6].s) == (1, True)
    assert (got[7].s, got[8].s) == (False, False)  # near-misses stay clean


def test_report_rollup(spark):
    df = spark.createDataFrame(DOCS, "id long, text string, source string")
    rep = {
        r.source: r
        for r in synthetic_report(df, "text", ["source"]).collect()
    }
    a, b = rep["a"], rep["b"]
    assert (a.n_docs, a.n_suspect) == (3, 2)
    assert a.suspect_micro == 666_666
    assert (b.n_docs, b.n_suspect) == (5, 3)
    assert (b.n_template_docs, b.n_phrase_docs, b.n_ui_docs) == (1, 1, 1)
    assert b.suspect_micro == 600_000
