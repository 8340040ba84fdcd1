"""Physical-plan regression tests: the scale properties (.explain-verified
pushdown, broadcast joins, shuffle counts, rank-limit pushdown, partition
pruning) are asserted here so they can't silently regress."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.queries import REGISTRY
from tests.conftest import SF_DIR_ORACLE


# plan helpers live in the package now (public lint API); tests keep
# their historical names as thin delegates
from g_data_pipeline_spark.operators.planlint import (  # noqa: E402
    formatted_plan,
    op_counts,
)


def plan_of(spark, name: str) -> str:
    return formatted_plan(REGISTRY[name].fn(spark, SF_DIR_ORACLE))


def shuffle_count(plan: str) -> int:
    return op_counts(plan).get("Exchange", 0)


def test_q6_all_predicates_pushed(spark):
    plan = plan_of(spark, "j_q6_forecast_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for frag in ("l_shipdate", "l_discount", "l_quantity"):
        assert frag in pushed, f"{frag} not pushed into the parquet scan"
    # column pruning: scan must not read unused columns
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in schema_line
    assert "l_returnflag" not in schema_line


def test_q3_broadcasts_dims_and_takeordered(spark):
    plan = plan_of(spark, "j_q3_shipping_priority")
    assert op_counts(plan).get("BroadcastHashJoin", 0) == 2  # customer & orders
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan  # top-10 without a global sort
    # exactly one real shuffle (the group-by); broadcasts are not exchanges
    assert shuffle_count(plan) == 1


def test_q5_fact_never_shuffles_for_dim_joins(spark):
    plan = plan_of(spark, "j_q5_local_supplier_volume")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # all joins broadcast at this scale
    assert shuffle_count(plan) == 1  # only the final 25-group aggregation


def test_q1_single_shuffle_aggregation(spark):
    plan = plan_of(spark, "q1_pricing_summary")
    assert shuffle_count(plan) == 1
    assert "HashAggregate" in plan  # partial+final combine, not sort-agg


def test_topk_rank_limit_pushdown(spark):
    plan = plan_of(spark, "w_topk_per_group")
    assert "WindowGroupLimit" in plan  # per-partition truncation pre-shuffle


def test_filter_projection_reach_scan(spark):
    plan = plan_of(spark, "r2_filter_eq")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    assert "l_returnflag" in pushed
    schema_line = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_extendedprice" not in schema_line  # pruned


def test_partition_pruning_on_partitioned_landing(spark, tmp_path):
    """land partitioned -> a partition-key filter must prune at planning
    time (PartitionFilters, not a post-scan Filter)."""
    events = (
        spark.range(0, 1000)
        .select(
            F.col("id"),
            (F.col("id") % 7).alias("day"),
            F.rand(1).alias("v"),
        )
    )
    dest = str(tmp_path / "part_events")
    events.write.mode("overwrite").partitionBy("day").parquet(dest)
    df = spark.read.parquet(dest).filter(F.col("day") == 3)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l][0]
    assert "day" in pf
    assert df.count() == events.filter(F.col("day") == 3).count()


def test_lsh_near_dup_no_cartesian_product(spark):
    """The bucketed near-dup path must never plan a CartesianProduct /
    nested-loop join (the O(n^2) shape it exists to avoid). Since r11 it
    is join-FREE: one signature scan, one (table, bucket) group exchange
    with row-local pairing+cosine, one dedup exchange of surviving
    scalars — pin zero joins and <= 2 shuffles so the r10 shape (6
    exchanges, 2 signature scans, 2 attach joins; 2x bench regression on
    both driver runs) cannot come back."""
    plan = plan_of(spark, "v_lsh_near_dup_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    counts = op_counts(plan)
    assert not any("Join" in op for op in counts), counts
    assert counts.get("Exchange", 0) <= 2, counts


def test_ivf_topk_corpus_joins_broadcast_probes(spark):
    """IVF candidate join must broadcast the (small) probe side so the
    corpus never shuffles for the join; no all-pairs shape."""
    plan = plan_of(spark, "v_ivf_topk")
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_exact_cosine_topk_is_broadcast_nested_loop(spark):
    """The exact baseline IS a crossJoin by design — but the query side must
    be broadcast (corpus never shuffles for the join)."""
    plan = plan_of(spark, "v_cosine_topk")
    assert "BroadcastNestedLoopJoin" in plan
    assert "WindowGroupLimit" in plan  # top-k pruned before the final sort


def test_multimodal_pipeline_stays_arrow_batched(spark):
    """Media pipelines run as mapInPandas (Arrow batches) — binary blobs
    never route through row-at-a-time Python evaluation."""
    plan = plan_of(spark, "m_image_features")
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time UDF node


def test_q8_star_join_all_dims_broadcast(spark):
    """Q8's seven joins: every dimension side (part filter, customer-region
    semi, supplier-nation map, nation x2, region) must broadcast; the only
    sort-merge join is fact-fact (lineitem-orders); one final shuffle for
    the o_year aggregate."""
    plan = plan_of(spark, "j_q8_market_share")
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 4
    assert c.get("SortMergeJoin", 0) <= 1  # lineitem x orders only
    assert "CartesianProduct" not in plan


def test_q17_decorrelated_avg_broadcasts(spark):
    """The per-part average (Q17's correlated scalar subquery, decorrelated
    to a grouped aggregate) must be broadcast back onto the fact — the big
    lineitem side must not shuffle for the comparison join."""
    plan = plan_of(spark, "j_q17_small_quantity_revenue")
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q21_single_pass_per_order(spark):
    """The folded EXISTS/NOT-EXISTS formulation must aggregate per order in
    one pass — no correlated re-joins of lineitem against itself (the
    naive translation would scan lineitem three times)."""
    plan = plan_of(spark, "j_q21_sole_late_supplier")
    # exactly one scan per table (lineitem, orders, supplier) — the naive
    # EXISTS/NOT-EXISTS translation would scan lineitem three times
    assert op_counts(plan).get("Scan", 0) == 3


def test_semantic_dedup_no_cartesian(spark):
    """SemDeDup's pair join must be hash-keyed on the cell id — never a
    cartesian/nested-loop shape (the O(n^2) plan it exists to avoid)."""
    plan = plan_of(spark, "d_semantic_dedup")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q9_profit_dims_broadcast(spark):
    """Q9's star: part filter and supplier->nation map broadcast; the only
    allowed sort-merge edge is fact-fact (lineitem x orders); no cartesian
    product anywhere."""
    plan = plan_of(spark, "j_q9_product_type_profit")
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 2
    assert c.get("SortMergeJoin", 0) <= 1  # lineitem x orders only
    assert "CartesianProduct" not in plan


def test_q2_min_cost_correlated_min_broadcasts(spark):
    """Q2's correlated-MIN selection: the per-part minimum (a grouped
    aggregate of the small per-(part,supplier) cost table) must broadcast
    back onto the costs side, and the supplier/nation/region dimension
    chain must broadcast — lineitem never shuffles for a dimension join."""
    plan = plan_of(spark, "j_q2_min_cost_supplier")
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 3
    assert "CartesianProduct" not in plan


def test_span_dedup_shuffles_on_content_only(spark):
    """span_dedup's wide stages key on span content (first-occurrence rank)
    and doc id (reassembly + zero-planting join) — no cartesian anywhere,
    and the rank filter gets the WindowGroupLimit truncation."""
    plan = plan_of(spark, "d_span_dedup")
    assert "CartesianProduct" not in plan
    assert "WindowGroupLimit" in plan


def test_pack_sequences_single_window_shuffle(spark):
    """Packing is ONE window (prefix sum per source stream): exactly one
    exchange, keyed on the stream column."""
    plan = plan_of(spark, "t_pack_sequences")
    assert shuffle_count(plan) == 1
    assert "CartesianProduct" not in plan


def test_incremental_dedup_anti_join_adapts_to_history_size(spark):
    """The operator never FORCES a broadcast of the history fingerprints —
    Catalyst picks by stats: at test scale (375-row history) it correctly
    broadcasts; past the threshold the same plan hash-partitions on the
    fingerprint. Pin: an anti join exists, no cartesian, and no broadcast
    HINT in the logical plan (so the size-based choice stays adaptive)."""
    from g_data_pipeline_spark.queries import REGISTRY

    df = REGISTRY["d_incremental_dedup"].fn(spark, SF_DIR_ORACLE)
    plan = plan_of(spark, "d_incremental_dedup")
    assert "CartesianProduct" not in plan
    assert "LeftAnti" in plan
    logical = df._jdf.queryExecution().logical().toString()
    assert "UnresolvedHint" not in logical and "hint" not in logical.lower()


def test_range_join_is_bucketed_equi_join(spark):
    """The range join must plan as a hash equi-join on the time bucket —
    a naive ts-between-start-and-end join degenerates to
    BroadcastNestedLoopJoin (O(points x intervals), the scale-killer the
    bucketing exists to avoid)."""
    plan = plan_of(spark, "a_range_join")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) + c.get("SortMergeJoin", 0) >= 1


def test_funnel_single_shuffle_window_stack(spark):
    """The three stacked funnel windows share the user partition: Catalyst
    must plan ONE exchange for all of them (plus the final single-row
    aggregate's), never re-shuffling between window stages."""
    plan = plan_of(spark, "e_funnel_conversion")
    assert "CartesianProduct" not in plan
    # user-partition exchange + two for the global agg boundary at most
    assert shuffle_count(plan) <= 3
    assert op_counts(plan).get("Window", 0) >= 1


def test_priority_merge_rank_pruned(spark):
    """Survivor selection is a rank over the content fingerprint — the
    rn=1 filter must get WindowGroupLimit truncation so a hot fingerprint
    (mass-duplicated doc) is pruned per-partition before the shuffle."""
    plan = plan_of(spark, "d_priority_merge")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan


def test_tfidf_only_broadcast_is_corpus_count(spark):
    """tf-idf joins are keyed on token; the only nested-loop-ish shape
    allowed is the broadcast of the single-row corpus-count aggregate."""
    plan = plan_of(spark, "t_tfidf_topk")
    assert "CartesianProduct" not in plan
    # the single-row count may broadcast via BNLJ; anything bigger may not
    assert op_counts(plan).get("BroadcastNestedLoopJoin", 0) <= 1
    assert "WindowGroupLimit" in plan  # top-3 pruned before final shuffle


def test_histogram_broadcasts_range_aggregate(spark):
    """The min/max pre-aggregate is a single row: it must broadcast (BNLJ
    of a 1-row side is fine); the bucketed count is one shuffle."""
    plan = plan_of(spark, "p_histogram")
    assert "CartesianProduct" not in plan
    c = op_counts(plan)
    assert c.get("BroadcastNestedLoopJoin", 0) + c.get("BroadcastHashJoin", 0) >= 1


def test_moving_avg_single_window_shuffle(spark):
    """The trailing frame is one Window over the customer partition:
    exactly one exchange."""
    plan = plan_of(spark, "w_moving_avg")
    assert shuffle_count(plan) == 1
    assert op_counts(plan).get("Window", 0) == 1


def test_grouped_median_single_shuffle(spark):
    """Grouped exact percentiles are one hash aggregation: a single
    exchange keyed on the group columns, no joins."""
    plan = plan_of(spark, "p_grouped_median")
    assert shuffle_count(plan) == 1
    assert "Join" not in plan


def test_dsir_lm_table_broadcasts(spark):
    """The DSIR per-bucket log-ratio table is 4096 rows: the occurrence
    join against it must broadcast, never shuffle the occurrences side for
    the join; no cartesian beyond the single-row totals broadcast."""
    plan = plan_of(spark, "t_dsir_weights")
    assert "CartesianProduct" not in plan
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 1
    assert c.get("SortMergeJoin", 0) == 0


def test_quality_classifier_model_broadcasts(spark):
    """The hashed weight table is bounded at n_buckets rows by
    construction: the scoring join must broadcast it (the corpus side
    never shuffles for the join); no cartesian beyond the 1-row totals
    broadcast."""
    plan = plan_of(spark, "t_quality_classifier")
    assert "CartesianProduct" not in plan
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 1
    assert c.get("SortMergeJoin", 0) == 0


def test_contamination_fraction_keyed_joins_only(spark):
    """Contamination joins are keyed on shingle content and doc id — never
    a cartesian / nested-loop shape (there is no 1-row broadcast in this
    query at all)."""
    plan = plan_of(spark, "d_contamination_fraction")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_contamination_sketch_prunes_topk_before_join(spark):
    """The bottom-k sample must plan as a WindowGroupLimit (per-doc top-k
    truncated before the shuffle) and keep every join keyed."""
    plan = plan_of(spark, "d_contamination_sketch")
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cdc_merge_rank_pruned_single_shuffle(spark):
    """merge_latest: ONE shuffle on the merge key, and the latest-wins
    row_number is WindowGroupLimit-pruned (top-1 per key computed map-side
    pre-shuffle) so a key's change history never crosses the wire whole."""
    plan = plan_of(spark, "a_cdc_merge")
    assert "WindowGroupLimit" in plan
    assert shuffle_count(plan) == 1
    assert "CartesianProduct" not in plan


def test_scd2_single_shuffle_window_stack(spark):
    """scd2_history: change-capture lag, interval lead, and version
    numbering all share the (user_id) partitioning -> one shuffle."""
    plan = plan_of(spark, "a_scd2_history")
    assert shuffle_count(plan) == 1


def test_attribution_single_shuffle(spark):
    """e_attribution: the as-of carry window and the per-channel aggregate
    are the only exchanges (user window + tiny final agg); no join at all
    on the event volume."""
    plan = plan_of(spark, "e_attribution")
    assert op_counts(plan).get("Exchange", 0) <= 2
    assert "Join" not in plan or "BroadcastHashJoin" in plan


def test_kmeans_assign_zero_shuffle_scoring(spark):
    """assign_to_centroids: codebook collapses to ONE broadcast row; the
    per-vector argmax is a row-local array expression — the corpus is
    scored with NO exchange except the final per-cell aggregate, and no
    per-centroid row fan-out (no window, no rank)."""
    plan = plan_of(spark, "v_kmeans_assign")
    assert "BroadcastNestedLoopJoin" in plan  # 1-row codebook cross join
    assert "CartesianProduct" not in plan
    assert "Window" not in plan  # argmax is array_max, not a rank window
    # corpus scan -> broadcast join -> project -> final agg: the only
    # exchanges are the codebook collect (1 row) and the 8-cell aggregate
    assert shuffle_count(plan) <= 2


def test_gap_fill_grid_from_aggregate_not_events(spark):
    """gap_fill: the dense grid explodes out of a per-key (min,max)
    aggregate, never from raw events — plan has exactly one Generate
    (explode) fed by a HashAggregate, and the LOCF window rides the same
    key partitioning as the grid join."""
    plan = plan_of(spark, "a_gap_fill")
    assert op_counts(plan).get("Generate", 0) == 1
    assert "CartesianProduct" not in plan


def test_iqr_outliers_fences_broadcast(spark):
    """a_iqr_outliers: the 3-row fence table joins back broadcast — the
    fact scan never shuffles for the join (its only exchanges are the two
    per-group aggregates)."""
    plan = plan_of(spark, "a_iqr_outliers")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_group_sample_rank_limit_pushdown(spark):
    """a_group_sample: the per-source rank-3 is WindowGroupLimit-pruned —
    each map partition forwards at most 3 rows per source."""
    plan = plan_of(spark, "a_group_sample")
    assert "WindowGroupLimit" in plan
    assert shuffle_count(plan) == 1


def test_transition_matrix_windows_after_agg(spark):
    """e_transition_matrix: the row-normalizing window runs on the tiny
    (from,to) aggregate, never on raw events — two Window-able exchanges
    plus the pair agg, no joins."""
    plan = plan_of(spark, "e_transition_matrix")
    assert "Join" not in plan
    assert op_counts(plan).get("Window", 0) == 2  # lead + normalizer
    assert shuffle_count(plan) == 3  # user seq, pair agg, from_type window


def test_dwell_time_single_sequencing_shuffle(spark):
    """e_dwell_time: one user-partition window for the lag, one map-side
    combined bucket aggregate — all-integer pipeline, no joins."""
    plan = plan_of(spark, "e_dwell_time")
    assert "Join" not in plan
    assert op_counts(plan).get("Window", 0) == 1
    assert shuffle_count(plan) == 2
    assert "HashAggregate" in plan


def test_zscore_stats_broadcast(spark):
    """e_zscore_anomaly: the 5-row moment table joins back broadcast; the
    fact scan never shuffles for the join."""
    plan = plan_of(spark, "e_zscore_anomaly")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_snapshot_diff_keyed_join_no_cartesian(spark):
    """a_snapshot_diff: the full-outer diff is a keyed sort-merge join
    (neither snapshot is broadcastable at scale; Spark's BHJ cannot do
    full-outer anyway) — never a nested-loop/cartesian."""
    plan = plan_of(spark, "a_snapshot_diff")
    assert "SortMergeJoin FullOuter" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_equidepth_cuts_broadcast(spark):
    """a_equidepth_histogram: the 1-row decile-cut aggregate broadcasts
    (BNLJ of a single-row side), the binning agg is map-side combined."""
    plan = plan_of(spark, "a_equidepth_histogram")
    assert "CartesianProduct" not in plan
    c = op_counts(plan)
    assert c.get("BroadcastNestedLoopJoin", 0) + c.get("BroadcastHashJoin", 0) >= 1
    assert "HashAggregate" in plan


def test_weighted_sample_zero_shuffle(spark):
    """t_weighted_sample: pure filter + projection — embarrassingly
    parallel, zero exchanges."""
    plan = plan_of(spark, "t_weighted_sample")
    assert shuffle_count(plan) == 0
    assert "Join" not in plan


def test_norm_stats_single_shuffle(spark):
    """v_norm_stats: one map-side-combined per-label aggregate; the norm
    is a scaled-long fold inside the project, no join, no extra pass."""
    plan = plan_of(spark, "v_norm_stats")
    assert "Join" not in plan
    assert shuffle_count(plan) == 1


def test_expectations_three_pass_shape(spark):
    """a_expectations_report: four row-level rules fuse into one aggregate
    pass (conditional counts — no per-rule scans), uniqueness is a keyed
    agg, the FK check is a broadcast left-anti join; no cartesian
    anywhere."""
    plan = plan_of(spark, "a_expectations_report")
    assert "CartesianProduct" not in plan
    c = op_counts(plan)
    # FK anti join broadcasts the distinct parent-key side at this scale.
    assert c.get("BroadcastHashJoin", 0) >= 1
    assert "SortMergeJoin" not in plan


def test_record_linkage_blocked_not_allpairs(spark):
    """a_record_linkage: candidates come from an equi-join on the blocking
    key — never a nested-loop all-pairs product."""
    plan = plan_of(spark, "a_record_linkage")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) + c.get("SortMergeJoin", 0) >= 1


def test_sessionize_single_shuffle(spark):
    """e_sessionize: both windows and the per-session aggregate share the
    user_id clustering — Catalyst satisfies all three from ONE exchange."""
    plan = plan_of(spark, "e_sessionize")
    assert "Join" not in plan
    assert shuffle_count(plan) == 1
    assert op_counts(plan).get("Window", 0) == 2


def test_groupwise_regression_single_shuffle(spark):
    """a_groupwise_regression: all five OLS moments in ONE map-side
    combined aggregate — a single exchange, no joins, no iteration."""
    plan = plan_of(spark, "a_groupwise_regression")
    assert "Join" not in plan
    assert shuffle_count(plan) == 1
    assert "HashAggregate" in plan


def test_cumulative_users_window_on_aggregate(spark):
    """e_cumulative_users: the running total windows over the per-day
    aggregate (days), never the raw events — one fact shuffle (user
    first-seen), one tiny per-day agg, one single-partition window."""
    plan = plan_of(spark, "e_cumulative_users")
    assert "Join" not in plan
    assert op_counts(plan).get("Window", 0) == 1
    assert shuffle_count(plan) == 3


def test_oov_vocab_broadcasts(spark):
    """t_oov_rate: the top-K vocab joins the exploded token stream
    broadcast — the token stream never shuffles for the join."""
    plan = plan_of(spark, "t_oov_rate")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_split_report_single_shuffle(spark):
    """t_train_val_test_split: hash-bucket assignment is a pure
    projection; the report is one small aggregate."""
    plan = plan_of(spark, "t_train_val_test_split")
    assert "Join" not in plan
    assert shuffle_count(plan) == 1


def test_salted_join_no_broadcast_no_cartesian(spark):
    """a_salted_join: the whole point is a non-broadcast keyed join on
    (key, salt) — the dim replication is an explode projection, never a
    nested-loop product."""
    plan = plan_of(spark, "a_salted_join")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan


def test_event_dedup_rank_limit_pushdown(spark):
    """e_event_dedup_first: the keep-first rank is WindowGroupLimit-pruned
    map-side, so a hot key's duplicates never all cross the shuffle."""
    plan = plan_of(spark, "e_event_dedup_first")
    assert "WindowGroupLimit" in plan
    assert shuffle_count(plan) == 1


def test_minhash_estimate_keyed_joins_only(spark):
    """d_minhash_estimate_pairs: signature build is row-wise array
    expressions (no explode for the sig), pair candidates come from the
    DF-cutoff inverted index, signatures join back keyed on doc id —
    never a cartesian/nested-loop."""
    plan = plan_of(spark, "d_minhash_estimate_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_grouped_median_pandas_arrow_shape(spark):
    """p_grouped_median_pandas: the grouped-map pandas kernel rides the
    ordinary groupBy shuffle (FlatMapGroupsInPandas, one exchange)."""
    plan = plan_of(spark, "p_grouped_median_pandas")
    assert "FlatMapGroupsInPandas" in plan
    assert shuffle_count(plan) == 1


def test_text_normalize_zero_shuffle(spark):
    """t_text_normalize: pure projection — zero exchanges."""
    plan = plan_of(spark, "t_text_normalize")
    assert shuffle_count(plan) == 0
    assert "Join" not in plan


def test_yoy_growth_joins_on_aggregate(spark):
    """a_yoy_growth: the calendar self-joins (month-1 / month-12) are
    broadcast joins over the per-month aggregate — the raw orders shuffle
    once for the month agg and never for the joins."""
    plan = plan_of(spark, "a_yoy_growth")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


def test_item_cooccurrence_user_keyed_join(spark):
    """e_item_cooccurrence: the pair generation is an equi-join on
    user_id (quadratic only within baskets); the count/total lookups are
    broadcast onto the tiny co-occurrence aggregate."""
    plan = plan_of(spark, "e_item_cooccurrence")
    assert "CartesianProduct" not in plan
    c = op_counts(plan)
    assert c.get("BroadcastHashJoin", 0) >= 2  # item count lookups
    # the 1-row total may plan as BNLJ (fine) but never a real cartesian
    assert "WindowGroupLimit" in plan  # basket cap pruned map-side


def test_simhash_estimate_keyed_joins_only(spark):
    """d_simhash_estimate_pairs: fingerprints are row-wise bit expressions
    (no explode); fingerprint lookups join keyed on doc id — never a
    cartesian/nested-loop."""
    plan = plan_of(spark, "d_simhash_estimate_pairs")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_ab_test_two_aggregates_no_join(spark):
    """e_ab_test: per-user conversion agg + one conditional-count global
    aggregate — two shuffles, no joins."""
    plan = plan_of(spark, "e_ab_test")
    assert "Join" not in plan
    assert shuffle_count(plan) == 2
    assert "HashAggregate" in plan
