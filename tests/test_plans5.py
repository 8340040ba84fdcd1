"""Round-5 plan pins: the scale-shape claims made in the wave 3-4 query
docstrings, asserted against the physical plan so they can't regress."""

from __future__ import annotations

from tests.test_plans import op_counts, plan_of, shuffle_count


def test_star_join_chain_constant_dims_broadcast(spark):
    """nation/region are explicitly broadcast; no cartesian anywhere. At
    bench SF the scaling dims also resolve to broadcast via stats — the
    pin only requires what holds at EVERY scale."""
    plan = plan_of(spark, "j_star_join_chain")
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 2
    assert "CartesianProduct" not in plan


def test_mad_outliers_stats_broadcast(spark):
    """Both 5-row stats tables (median, MAD) join the fact scan via
    broadcast — the fact side never wide-shuffles."""
    plan = plan_of(spark, "a_mad_outliers")
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 2
    assert c.get("SortMergeJoin", 0) == 0


def test_corr_pairs_single_fact_scan(spark):
    """All nine moments fold in ONE aggregate over ONE scan; the 3 output
    rows come from exploding the 1-row result (a union of selects would
    triple-scan the fact table)."""
    plan = plan_of(spark, "a_corr_pairs_moments")
    c = op_counts(plan)
    assert c.get("Scan", 0) == 1, f"expected 1 fact scan, plan ops: {c}"
    assert c.get("Generate", 0) == 1  # the explode


def test_power_users_rank_limit_pushdown(spark):
    """Global rank runs over the per-user aggregate and WindowGroupLimit
    prunes past rank 10 before the final sort."""
    plan = plan_of(spark, "e_power_users")
    assert "WindowGroupLimit" in plan


def test_histogram_2d_single_exchange(spark):
    plan = plan_of(spark, "a_histogram_2d")
    assert shuffle_count(plan) == 1
    assert "Join" not in plan


def test_rollup_time_single_expand_aggregate(spark):
    """ROLLUP compiles to one Expand + hash aggregate — a single
    exchange, not one scan per grouping set."""
    plan = plan_of(spark, "a_rollup_time")
    c = op_counts(plan)
    assert c.get("Expand", 0) == 1
    assert c.get("Scan", 0) == 1
    assert shuffle_count(plan) == 1


def test_percent_of_total_window_over_aggregate(spark):
    """The share window sorts the 25-row nation rollup, never the orders
    facts: the Window's child side contains the HashAggregate."""
    plan = plan_of(spark, "a_percent_of_total")
    c = op_counts(plan)
    assert c.get("Window", 0) == 1
    assert c.get("HashAggregate", 0) >= 2  # partial+final agg below window


def test_pareto_cumulative_over_rollup(spark):
    """Round-6 shape: the descending cumulative runs through the bucketed
    running-sum kernel (bucket-local window + tiny offsets window); the
    offsets and the 1-row total broadcast back."""
    plan = plan_of(spark, "a_pareto_share")
    c = op_counts(plan)
    assert c.get("Window", 0) == 2  # bucket-local + bucket offsets
    assert c.get("BroadcastNestedLoopJoin", 0) + c.get(
        "BroadcastHashJoin", 0
    ) >= 2  # offsets join + 1-row total


def test_interarrival_reuses_type_partitioning(spark):
    """event_type window then event_type aggregate: at most two
    exchanges (AQE may collapse to one)."""
    plan = plan_of(spark, "e_interarrival_stats")
    assert shuffle_count(plan) <= 2
    assert op_counts(plan).get("Window", 0) == 1


def test_activity_streaks_all_user_keyed(spark):
    """Day-distinct, window, and both aggregates all key on user_id —
    no global sort, no join."""
    plan = plan_of(spark, "a_activity_streaks")
    assert "Join" not in plan
    assert op_counts(plan).get("Window", 0) == 1


def test_url_dedup_single_exchange_scan_side_canonicalization(spark):
    """Canonicalization is scan-stage expression work; the only exchange
    is the canonical-key aggregate."""
    plan = plan_of(spark, "d_url_dedup")
    assert shuffle_count(plan) == 1
    assert "Join" not in plan


def test_topic_balance_zero_shuffle_assignment(spark):
    """Cell assignment never shuffles the corpus (codebook collapsed to a
    broadcast 1-row array): every join in the plan is broadcast."""
    plan = plan_of(spark, "v_topic_balance")
    c = op_counts(plan)
    assert c.get("SortMergeJoin", 0) == 0
    assert c.get("BroadcastHashJoin", 0) + c.get(
        "BroadcastNestedLoopJoin", 0
    ) >= 2
    assert "CartesianProduct" not in plan


def test_bigram_logprob_content_keyed_only(spark):
    """Every exchange keys on bigram content or doc_id; the LM join is
    stats-adaptive (broadcast at test SF). No cartesian anywhere."""
    plan = plan_of(spark, "t_bigram_logprob")
    assert "CartesianProduct" not in plan
    assert op_counts(plan).get("Window", 0) == 0


def test_ngram_novelty_reuses_jaccard_index_shape(spark):
    """Shingle-keyed df join then doc-keyed aggregate — same inverted-
    index shape as d_ngram_jaccard_pairs, no pair blowup, no cartesian."""
    plan = plan_of(spark, "t_ngram_novelty")
    assert "CartesianProduct" not in plan


def test_lang_balance_single_pass_plus_broadcast_total(spark):
    plan = plan_of(spark, "t_lang_balance")
    c = op_counts(plan)
    assert c.get("BroadcastNestedLoopJoin", 0) + c.get(
        "BroadcastHashJoin", 0
    ) >= 1
    assert c.get("SortMergeJoin", 0) == 0


def _fmt(df, spark):
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def test_partial_heavy_hitters_two_exchanges(spark):
    """partial_heavy_hitters: exactly the (by,value) count shuffle + the
    per-partial window shuffle — the post-filter min window REUSES the
    rank window's hash partitioning (a third exchange would re-shuffle
    the stats rows for nothing). Zero Python nodes."""
    from g_data_pipeline_spark.operators.incremental_profile import (
        partial_heavy_hitters,
    )

    df = spark.createDataFrame(
        [(i % 3, f"v{i % 11}") for i in range(100)], "day int, v string"
    )
    plan = _fmt(partial_heavy_hitters(df, "v", ["day"], k=4), spark)
    c = op_counts(plan)
    assert c.get("Exchange", 0) == 2, c
    assert c.get("Window", 0) == 3
    assert "EvalPython" not in plan


def test_merged_heavy_hitters_slack_is_broadcast(spark):
    """merged_heavy_hitters: the 1-row (or per-group) slack side joins the
    per-value fold via broadcast — never a shuffle of the value rows."""
    from g_data_pipeline_spark.operators.incremental_profile import (
        merged_heavy_hitters,
        partial_heavy_hitters,
    )

    df = spark.createDataFrame(
        [(i % 3, f"v{i % 11}") for i in range(100)], "day int, v string"
    )
    p = partial_heavy_hitters(df, "v", ["day"], k=4)
    plan = _fmt(merged_heavy_hitters(p, k=5), spark)
    c = op_counts(plan)
    assert (
        c.get("BroadcastNestedLoopJoin", 0) + c.get("BroadcastHashJoin", 0)
        == 1
    ), c
    assert "SortMergeJoin" not in plan
    assert "EvalPython" not in plan
