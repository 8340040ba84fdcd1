"""Round-9 plan pins: the new curation gates keep their claimed shapes
(docstrings say zero-shuffle scan stage + one rollup — pin it), and the
boilerplate/fuzzy-paragraph transforms stay content-keyed with bounded
exchange counts and no cartesian products."""

from __future__ import annotations

import re

from g_data_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_DIR_SMOKE


def _plan(spark, name: str) -> str:
    df = REGISTRY[name].fn(spark, SF_DIR_SMOKE)
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    return df._jdf.queryExecution().explainString(mode)


def _exchanges(plan: str) -> int:
    # distinct node ids — every node prints twice in formatted mode
    return len(set(re.findall(r"Exchange \((\d+)\)", plan)))


def test_scan_stage_gates_single_shuffle(spark):
    """t_blocklist_gate / t_gopher_outliers / t_line_rules /
    t_stopword_profile: all signal work is scan-stage expressions; the
    ONLY exchange is the final rollup's."""
    for name in (
        "t_blocklist_gate",
        "t_gopher_outliers",
        "t_line_rules",
        "t_stopword_profile",
    ):
        plan = _plan(spark, name)
        assert _exchanges(plan) == 1, name
        assert "CartesianProduct" not in plan, name


def test_boilerplate_removal_content_keyed(spark):
    """d_boilerplate_removal: md5(line)-keyed distinct-doc aggregate +
    content-keyed join back + per-doc rollup + id join — bounded at 5
    exchanges, hash joins only."""
    plan = _plan(spark, "d_boilerplate_removal")
    assert _exchanges(plan) <= 5
    assert "CartesianProduct" not in plan


def test_paragraph_neardup_banded_not_allpairs(spark):
    """d_paragraph_neardup: every wide op keys on (band, bucket) content
    or doc id through the shared incremental core — no cartesian, no
    row-at-a-time Python, exchange count bounded."""
    plan = _plan(spark, "d_paragraph_neardup")
    assert "CartesianProduct" not in plan
    assert "BatchEvalPython" not in plan
    assert _exchanges(plan) <= 12
