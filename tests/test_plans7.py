"""Round-7 plan pins: the new oracle wave's scale shapes — context-fit's
zero-join single-pass, the substring transform's content-hash scan
budget, the banded-LSH join discipline under the md5 family, the
perplexity kernel's bucket partitioning, and the linear reassembly's
node diet (no per-token Exists over cut starts)."""

from __future__ import annotations

import re

from tests.test_plans import op_counts, plan_of


def test_context_fit_single_pass(spark):
    """Every context size's counters fold in ONE aggregate over ONE scan
    (a union of per-ctx selects would rescan the corpus 5x); rows explode
    from the folded single row."""
    plan = plan_of(spark, "t_context_fit_report")
    c = op_counts(plan)
    assert c.get("Scan", 0) == 1, f"corpus scanned {c.get('Scan')}x"
    assert c.get("Exchange", 0) == 1  # the single-row final aggregate
    assert c.get("Generate", 0) == 1  # the 5-row explode


def test_substring_transform_scan_budget_and_linear_reassembly(spark):
    """The transform reads documents a bounded number of times (base +
    the occurrence branch feeding stats and the flag-back join — never
    per-window), shuffles key on the md5 window hash / doc id only, and
    the reassembly is the merged-interval form: NO per-token Exists
    predicate over the cut-start array anywhere in the plan."""
    plan = plan_of(spark, "d_substring_transform")
    docs_scans = len(re.findall(r"Location:.*documents\.parquet", plan))
    assert docs_scans <= 3, f"documents scanned {docs_scans}x"
    assert "exists(" not in plan.lower().replace("window_exists", ""), (
        "per-token exists() containment filter is back — the linear "
        "merged-interval reassembly was replaced"
    )
    assert op_counts(plan).get("CartesianProduct", 0) == 0


def test_minhash_lsh_md5_keys_on_band_content(spark):
    """The gated md5-family LSH entry joins candidates on (band, bucket)
    CONTENT — hash-partitioned exchanges, no cartesian, no sort-merge of
    the corpus — and verifies over id-keyed joins only."""
    plan = plan_of(spark, "d_minhash_lsh_pairs")
    c = op_counts(plan)
    assert c.get("CartesianProduct", 0) == 0
    # the candidate self-join keys on (band, bucket) — at sf0.01 AQE
    # plans it as a broadcast join, at scale a hash exchange; either way
    # the join key list must lead with the band content
    assert re.search(r"\[band#\d+, bucket#\d+\]", plan), (
        "candidate join no longer keys on band content"
    )


def test_perplexity_tercile_bucket_partitioned(spark):
    """The global tercile never sorts the corpus on one task: the rank
    window is cost-bucket-partitioned; the only unpartitioned windows run
    over the tiny bucket-offsets frame (__bkt-leading, sweep-allowed)."""
    plan = plan_of(spark, "t_perplexity_buckets")
    assert not re.search(
        r"windowspecdefinition\(cost_milli#\d+L? ASC", plan
    ), "unpartitioned corpus-order window is back"
    assert re.search(
        r"windowspecdefinition\(__bkt0#\d+L?, cost_milli#\d+L? ASC", plan
    )


def test_vocab_coverage_rank_stays_bucketed(spark):
    """The vocabulary ranking is (cnt, token-prefix)-bucketed — no
    unpartitioned (cnt DESC, tk ASC) window over the full vocabulary."""
    plan = plan_of(spark, "t_vocab_coverage")
    assert not re.search(
        r"windowspecdefinition\(cnt#\d+L? DESC NULLS LAST, tk#\d+ ASC",
        plan,
    )
    assert re.search(
        r"windowspecdefinition\(__bkt0#\d+L?, __bkt1#\d+, cnt#\d+L? DESC",
        plan,
    )


def test_incremental_minhash_no_archive_rescan_shape(spark):
    """The labeling plan joins batch band rows against the directory on
    (band, bucket) and batch ids only — no cartesian, no token/shingle
    explode of the directory side."""
    plan = plan_of(spark, "d_incremental_minhash")
    c = op_counts(plan)
    assert c.get("CartesianProduct", 0) == 0
    assert c.get("SortMergeJoin", 0) == 0  # broadcast at test scale
