"""End-to-end service lifecycle tests mirroring the reference's three entry
points (SURVEY.md §3): upload -> job -> insights; recompute-on-miss;
conversation queries (rules + LLM-JSON + raw IR) with visualization specs."""

from __future__ import annotations

from pathlib import Path

import pytest

from g_data_pipeline_spark.service import DataPipelineService, JobStatus

FIXTURE = Path(__file__).parent / "fixtures" / "people.csv"


@pytest.fixture(scope="module")
def svc(spark, tmp_path_factory):
    return DataPipelineService(spark, str(tmp_path_factory.mktemp("svc")))


@pytest.fixture(scope="module")
def job_id(svc):
    jid = svc.upload_csv(FIXTURE.read_bytes(), "people.csv")
    svc.process_job(jid)
    return jid


def test_upload_validation(svc):
    with pytest.raises(ValueError):
        svc.upload_csv(b"", "x.csv")
    with pytest.raises(ValueError):
        svc.upload_csv(b"a,b\n1,2", "x.txt")


def test_job_lifecycle_and_insights(svc, job_id):
    assert svc.jobs[job_id].status == JobStatus.COMPLETED
    insights = svc.get_insights(job_id)
    assert insights["data_summary"]["row_count"] == 200
    stats = {s["name"]: s for s in insights["column_statistics"]}
    # landed dataset has normalized names + coerced types
    assert "income_as_at_joining_scheme" in stats
    assert "mean" in stats["age"]


def test_insights_recompute_on_miss(svc, job_id):
    svc.insights_cache.pop(job_id)
    insights = svc.get_insights(job_id)
    assert insights["data_summary"]["row_count"] == 200


def test_insights_unknown_and_pending(svc):
    assert svc.get_insights("nope") is None
    jid = svc.upload_csv(b"a,b\n1,2\n", "t.csv")
    assert svc.get_insights(jid) == {"status": "queued"}


def test_rule_based_query_mean(svc, job_id):
    out = svc.query(job_id, query_text="what is the average age?")
    assert out["data"][0]["mean_age"] == pytest.approx(41.0, abs=5)
    assert "mean_age" in out["response"]


def test_rule_based_group_by_count(svc, job_id):
    out = svc.query(job_id, query_text="count of customers by province")
    got = {r["province"]: r["count_province"] for r in out["data"]}
    assert set(got) == {"north", "south", "east", "west"}


def test_llm_json_query_path(svc, job_id):
    payload = """Here is the query:
    ```json
    {"intent": "aggregate", "columns": [],
     "operations": [{"type": "sum", "column": "score"}]}
    ```"""
    out = svc.query(job_id, query_text=payload)
    assert out["data"][0]["sum_score"] > 0


def test_raw_ir_query_with_conversation(svc, job_id):
    out1 = svc.query(
        job_id,
        ir={"intent": "describe", "columns": ["age", "sex"], "operations": []},
    )
    cid = out1["conversation_id"]
    assert len(out1["data"]) == 10  # describe cap
    out2 = svc.query(job_id, query_text="count by sex", conversation_id=cid)
    assert out2["conversation_id"] == cid
    assert len(svc.conversations[cid].history) == 2


def test_visualize_intent_produces_spec(svc, job_id):
    out = svc.query(
        job_id,
        ir={
            "intent": "visualize",
            "columns": ["age", "score"],
            "operations": [],
        },
    )
    viz = out["visualization_data"]
    assert viz["type"] == "bar"
    assert set(viz["data"]["labels"]) == {"age", "score"}
    assert len(out["data"]) <= 100  # visualize cap


def test_visualize_categorical_value_counts(svc, job_id):
    out = svc.query(
        job_id,
        ir={"intent": "visualize", "columns": ["province"], "operations": []},
    )
    viz = out["visualization_data"]
    assert viz["type"] == "bar"
    assert viz["data"]["datasets"][0]["label"] == "Count of province"


def test_failed_job_records_error(svc):
    jid = svc.upload_csv(b"not,really\ncsv", "bad.csv")
    # corrupt the landed path to force a failure
    svc.jobs[jid].file_path = "/nonexistent/really.csv"
    with pytest.raises(Exception):
        svc.process_job(jid)
    assert svc.jobs[jid].status == JobStatus.FAILED
    assert svc.jobs[jid].error


def test_rule_based_grouped_mean(svc, job_id):
    out = svc.query(job_id, query_text="average score by province")
    got = {r["province"]: r["mean_score"] for r in out["data"]}
    assert set(got) == {"north", "south", "east", "west"}
    assert all(v > 0 for v in got.values())
