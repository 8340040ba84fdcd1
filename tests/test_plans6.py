"""Round-6 plan pins: the scale-shape rewrites of the r5 perf-weak
entries (e_concurrent_peak, a_weighted_median) and the BM25 scan-fanout
fix, asserted against the physical plan so they can't regress."""

from __future__ import annotations

import re

from tests.test_plans import op_counts, plan_of


def test_concurrent_peak_no_global_sweep_window(spark):
    """The boundary sweep must never serialize onto one task: no window
    spec whose leading element is the raw sweep key (an unpartitioned
    ORDER BY us). The two-phase form's windows are either partitioned by
    the hour bucket or run over the tiny bucket-totals frame (ordered by
    __bkt)."""
    plan = plan_of(spark, "e_concurrent_peak")
    assert not re.search(r"windowspecdefinition\(us#\d+L? ASC", plan), (
        "unpartitioned running-sum window over the boundary set is back"
    )
    # the local phase IS bucket-partitioned
    assert re.search(r"windowspecdefinition\(__bkt#\d+L?, us#\d+L? ASC", plan)
    # offsets broadcast back, never a sort-merge join of the sweep rows
    assert op_counts(plan).get("SortMergeJoin", 0) == 0


def test_weighted_median_no_fact_sort_under_flag(spark):
    """Parallelism must not cap at the 3 distinct return flags: no window
    ordered by the price under a flag-only partition spec (the old
    fact-sized 3-partition sort). The kernel's windows are (flag, __bkt)-
    partitioned locals or run over the tiny per-bucket totals."""
    plan = plan_of(spark, "a_weighted_median")
    assert not re.search(
        r"windowspecdefinition\(flag#\d+, v#\d+L? ASC", plan
    ), "fact-sized flag-partitioned sort is back"
    assert re.search(
        r"windowspecdefinition\(flag#\d+, __bkt#\d+L?, v#\d+L? ASC", plan
    )
    # offsets rejoin the per-value rows via broadcast
    assert op_counts(plan).get("BroadcastHashJoin", 0) >= 1


def test_bm25_two_scans_no_explode(spark):
    """BM25 runs in exactly TWO corpus passes (stats fold + row-local
    scoring) with term counting array-local: no Generate (token explode)
    node, no token-keyed shuffle, stats rejoined via broadcast. The r5
    shape scanned documents 5x per v_hybrid_rrf plan."""
    plan = plan_of(spark, "t_bm25_topk")
    c = op_counts(plan)
    assert c.get("Scan", 0) == 2, f"expected 2 scans, plan has {c.get('Scan')}"
    assert c.get("Generate", 0) == 0, "token explode is back"
    assert c.get("SortMergeJoin", 0) == 0


def test_hybrid_rrf_scan_budget(spark):
    """The fused plan reads documents exactly twice (the BM25 passes —
    the r5 shape read it 5x; this is the regression target). The
    embeddings side (a corpus pass + the pushed-down vec_id=0 point
    lookup) is not counted: test_hard_negatives caches the embeddings
    table session-wide and the cache substitutes a varying mix of
    InMemoryTableScan/parquet nodes depending on suite order."""
    plan = plan_of(spark, "v_hybrid_rrf")
    docs_scans = len(
        re.findall(r"Location:.*documents\.parquet", plan)
    )
    assert docs_scans == 2, f"documents scanned {docs_scans}x"
    assert op_counts(plan).get("Generate", 0) == 0


def test_decile_stats_no_global_customer_sort(spark):
    """NTILE runs through the bucketed row-index kernel: no window spec
    leading with the raw cents order (an unpartitioned global sort of the
    customer dimension); the local window is bucket-partitioned."""
    plan = plan_of(spark, "a_decile_stats")
    assert not re.search(r"windowspecdefinition\(cents#\d+L? ASC", plan)
    assert re.search(
        r"windowspecdefinition\(__bkt0#\d+L?, cents#\d+L? ASC", plan
    )


def test_pareto_no_global_rollup_sweep(spark):
    """The descending cumulative revenue sum is bucket-partitioned — no
    unpartitioned window over the customer rollup."""
    plan = plan_of(spark, "a_pareto_share")
    assert not re.search(
        r"windowspecdefinition\(rev_cents#\d+L? DESC", plan
    )
    assert re.search(
        r"windowspecdefinition\(__bkt#\d+L?, rev_cents#\d+L? DESC", plan
    )


def test_gini_not_capped_at_five_segments(spark):
    """The rank index is (seg, cents-bucket)-partitioned — parallelism
    scales with spend buckets, not the 5 market segments."""
    plan = plan_of(spark, "a_gini_coefficient")
    assert not re.search(
        r"windowspecdefinition\(seg#\d+, cents#\d+L? ASC", plan
    )
    assert re.search(
        r"windowspecdefinition\(seg#\d+, __bkt0#\d+L?, cents#\d+L? ASC",
        plan,
    )


def test_curriculum_bins_no_corpus_sort(spark):
    """Global NTILE over documents runs bucket-partitioned (length +
    doc_id range), never a single-partition corpus sort."""
    plan = plan_of(spark, "t_curriculum_bins")
    assert not re.search(
        r"windowspecdefinition\(n_tokens#\d+L? ASC", plan
    )
    assert re.search(
        r"windowspecdefinition\(__bkt0#\d+L?, __bkt1#\d+L?, n_tokens#\d+L? ASC",
        plan,
    )
