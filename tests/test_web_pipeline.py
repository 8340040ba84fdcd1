"""End-to-end web-corpus ingestion (pipelines.ingest_web_corpus):
HTML→text → line-quality gate → dup-line removal → curation, on a planted
fixture exercising every stage."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.pipelines import ingest_web_corpus


def _wrap(body_lines: list[str]) -> str:
    paras = "".join(f"<p>{ln}</p>\n" for ln in body_lines)
    return (
        "<html><head><script>var nav = 1;</script>"
        "<style>.x{}</style></head><body>" + paras + "</body></html>"
    )


def test_ingest_web_corpus_end_to_end(spark):
    good_lines = [f"alpha beta gamma delta epsilon zeta token{i}" for i in range(6)]
    # doc 2 duplicates doc 1's text exactly (after extraction) -> deduped.
    # doc 3 is boilerplate: every line identical -> line-quality kill.
    # doc 4 is too short after extraction -> min_tokens kill.
    rows = [
        (1, _wrap(good_lines)),
        (2, _wrap(good_lines)),
        (3, _wrap(["buy now click here"] * 10)),
        (4, _wrap(["tiny"])),
    ]
    raw = spark.createDataFrame(rows, "doc_id long, html string")
    out = ingest_web_corpus(raw, min_tokens=10).collect()
    ids = sorted(r.doc_id for r in out)
    assert ids == [1], f"expected only doc 1 to survive, got {ids}"
    [r] = out
    # script/style boilerplate never reaches the curated text
    assert "nav" not in r.text and ".x" not in r.text
    assert r.n_tokens >= 10
    assert r.lang_pred is not None


def test_ingest_web_corpus_removes_duplicate_lines(spark):
    lines = [
        "one two three four five six seven",
        "repeat me repeat me repeat me now",
        "repeat me repeat me repeat me now",
        "eight nine ten eleven twelve thirteen",
    ]
    raw = spark.createDataFrame(
        [(7, _wrap(lines))], "doc_id long, html string"
    )
    out = ingest_web_corpus(raw, min_tokens=5).collect()
    [r] = out
    assert r.text.count("repeat me repeat me repeat me now") == 1
    assert r.text.splitlines()[0].startswith("one two")


def test_ingest_web_corpus_single_lazy_plan(spark):
    """The whole pipeline composes into one lazy DataFrame: building it
    triggers no job, and the plan contains the left-semi quality gate."""
    raw = spark.createDataFrame(
        [(1, _wrap(["alpha beta gamma delta epsilon"]))],
        "doc_id long, html string",
    )
    df = ingest_web_corpus(raw)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    assert "LeftSemi" in plan
