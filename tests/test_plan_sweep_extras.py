"""Plan-hygiene sweep for the round-5 pytest-only operator surface —
the non-registry twin of tests/test_plan_sweep.py. Every builder here
is plan-checked (never executed): no CartesianProduct (except the one
explicitly documented 1x1-row global-CI join), no row-at-a-time Python,
no Arrow nodes outside the multimodal/grouped allowlist (these builders
use none)."""

from __future__ import annotations

import pytest

from g_data_pipeline_spark.catalog import load_table
from g_data_pipeline_spark.operators import (
    bootstrap,
    datasheet,
    forecast,
    privacy,
    sampling,
)
from g_data_pipeline_spark.operators.planlint import plan_report
from g_data_pipeline_spark.operators.similarity import mine_hard_negatives

SF = "/root/testdata/sf0.01"


def _builders(spark):
    cust = load_table(spark, SF, "customer")
    docs = load_table(spark, SF, "documents")
    emb = load_table(spark, SF, "embeddings")
    daily = cust.selectExpr(
        "c_mktsegment AS k", "c_custkey AS t", "CAST(c_acctbal AS DOUBLE) AS y"
    )
    return {
        "k_anonymity_report": privacy.k_anonymity_report(
            cust, ["c_nationkey", "c_mktsegment"]
        ),
        "l_diversity_report": privacy.l_diversity_report(
            cust, ["c_nationkey"], "c_mktsegment"
        ),
        "suppress_rare_classes": privacy.suppress_rare_classes(
            cust, ["c_nationkey"], 5
        ),
        "dp_grouped_counts": privacy.dp_grouped_counts(
            cust, ["c_mktsegment"], 1.0
        ),
        "dp_grouped_sum": privacy.dp_grouped_sum(
            cust, ["c_mktsegment"], "c_acctbal", 1.0, (0.0, 1e4)
        ),
        "group_split": sampling.group_split(docs, ["source"]),
        "holt_linear": forecast.holt_linear(daily, ["k"], "t", "y"),
        "holt_winters": forecast.holt_winters_additive(
            daily, ["k"], "t", "y", period=7
        ),
        "seasonal_anomalies": forecast.seasonal_anomalies(
            daily, ["k"], "t", "y", period=7
        ),
        "bootstrap_grouped": bootstrap.bootstrap_mean_ci(
            cust, "c_acctbal", ["c_custkey"], group_cols=["c_mktsegment"],
            n_replicas=20,
        ),
        "datasheet_stats": datasheet.corpus_datasheet_stats(docs),
        "datasheet_composition": datasheet.corpus_datasheet_composition(docs),
        "tokenizer_fertility": datasheet.tokenizer_fertility(docs),
        "mine_hard_negatives": mine_hard_negatives(emb, k=3),
    }


def test_extras_plan_hygiene(spark):
    bad = {}
    for name, df in _builders(spark).items():
        rep = plan_report(df)
        problems = []
        if rep["cartesian_products"]:
            problems.append("CartesianProduct")
        if rep["row_python_nodes"]:
            problems.append(f"row-python {rep['row_python_nodes']}")
        if rep["arrow_python_nodes"]:
            problems.append(f"arrow {rep['arrow_python_nodes']}")
        if problems:
            bad[name] = problems
    assert not bad, bad


def test_extras_shuffle_budgets(spark):
    """Upper-bound exchange counts for the single-pass builders — a new
    exchange sneaking into these is a scale regression, not noise."""
    b = _builders(spark)
    budgets = {
        "k_anonymity_report": 2,      # QI agg + 1-row report
        "l_diversity_report": 3,      # (QI,s) dedup + QI fold + report
        "suppress_rare_classes": 1,
        "dp_grouped_counts": 1,
        "dp_grouped_sum": 1,
        "group_split": 0,
        "holt_linear": 1,
        "holt_winters": 1,
        "seasonal_anomalies": 1,
        "datasheet_stats": 2,         # count_distinct two-phase expand
        "tokenizer_fertility": 2,     # language agg + display sort
    }
    over = {}
    for name, budget in budgets.items():
        got = plan_report(b[name])["shuffles"]
        if got > budget:
            over[name] = (got, budget)
    assert not over, f"shuffle budget exceeded: {over}"
