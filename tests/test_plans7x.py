"""Round-7 extended plan pins: the five new gated entries keep their
designed shapes — the URL filter stays scan-stage, VARIANT extraction
stays JVM-side, conversation assembly stays on one user partitioning,
and the two contamination-machinery gates stay content-keyed (no
cartesian / all-pairs nodes)."""

from __future__ import annotations

import re

from tests.test_plans import op_counts, plan_of, shuffle_count


def test_url_filter_scan_stage_only(spark):
    """Every signal + the keep gate is a scan-stage expression: zero
    exchanges, zero Python nodes, zero joins."""
    plan = plan_of(spark, "d_url_filter")
    c = op_counts(plan)
    assert shuffle_count(plan) == 0
    assert c.get("Generate", 0) == 0
    assert not re.search(r"BatchEvalPython|ArrowEvalPython", plan)


def test_variant_shred_jvm_side_single_aggregate(spark):
    """parse_json + variant_get are JVM expressions: no Python eval
    nodes anywhere, and the whole query is ONE keyed aggregate (its
    exchange) over the scan."""
    plan = plan_of(spark, "e_variant_shred")
    assert not re.search(r"BatchEvalPython|ArrowEvalPython", plan)
    assert re.search(r"variant_get|parse_json", plan), (
        "VARIANT expressions vanished from the plan"
    )
    assert shuffle_count(plan) == 1


def test_conversation_stats_single_user_partitioning(spark):
    """Sessionization windows, the within-conversation lag, and the
    final rollup share the user-keyed partitioning: at most 2 exchanges
    (user window + the (user, conv) aggregate) and no sort-merge join."""
    plan = plan_of(spark, "e_conversation_stats")
    c = op_counts(plan)
    assert shuffle_count(plan) <= 2, plan
    assert c.get("SortMergeJoin", 0) == 0
    # every window spec is user-partitioned, never unpartitioned
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and all(s.lstrip().startswith("user") for s in specs)


def test_split_leakage_content_keyed_no_cartesian(spark):
    """The audit joins on shingle content and doc id only: no cartesian
    or broadcast nested loop anywhere in the plan."""
    plan = plan_of(spark, "d_split_leakage")
    c = op_counts(plan)
    assert c.get("CartesianProduct", 0) == 0
    assert c.get("BroadcastNestedLoopJoin", 0) == 0


def test_decontaminate_spans_hash_keyed_no_cartesian(spark):
    """The scrub shuffles on window-hash content (directory semi/anti
    joins) and batch doc ids — never all-pairs."""
    plan = plan_of(spark, "d_decontaminate_spans")
    c = op_counts(plan)
    assert c.get("CartesianProduct", 0) == 0
    assert c.get("BroadcastNestedLoopJoin", 0) == 0
