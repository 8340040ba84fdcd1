"""Preference-pair curation (operators/preferences.py): dup + conflict
flags, the length-bias and margin audits (exact micro arithmetic), and
eval-prompt contamination."""

from __future__ import annotations

from g_data_pipeline_spark.operators.preferences import (
    dedup_preference_pairs,
    length_bias_report,
    margin_report,
    prompt_contamination,
)

PAIRS = [
    # (id, prompt, chosen, rejected)
    (1, "What is two plus two?", "four", "five"),
    (2, "What is two plus two?", "four", "five"),       # exact dup of 1
    (3, "What is two plus two?", "five", "four"),       # CONFLICT with 1/2
    (4, "Name a color.", "blue is a color", "no"),
    (5, "Name a color.", "red", "blue is a nice color"),
]


def _pairs(spark):
    return spark.createDataFrame(
        PAIRS, "pair_id long, prompt string, chosen string, rejected string"
    )


def test_dup_and_conflict_flags(spark):
    got = {
        r.pair_id: (r.is_dup, r.is_conflict)
        for r in dedup_preference_pairs(_pairs(spark)).collect()
    }
    assert got[1] == (False, True)   # canonical, but orientation-conflicted
    assert got[2] == (True, True)    # exact dup of 1 + conflicted
    assert got[3] == (False, True)   # reversed orientation: conflict, not dup
    assert got[4] == (False, False)
    assert got[5] == (False, False)


def test_length_bias_micro_exact(spark):
    row = length_bias_report(_pairs(spark)).collect()[0]
    # chosen longer in pairs 4 (4 vs 1); equal in 1-3 (1 vs 1); shorter in 5
    assert row.n_pairs == 5
    assert row.chosen_longer_micro == 200_000  # 1/5
    # deltas: 0, 0, 0, +3, -4 -> mean -1/5 -> floor(-0.2e6) = -200000
    assert row.mean_token_delta_micro == -200_000


def test_margin_report_flags_suspect_labels(spark):
    rows = [
        (1, 0.9, 0.1),   # clean margin
        (2, 0.2, 0.7),   # negative: label says chosen, score disagrees
        (3, 0.5, 0.5),   # tie
    ]
    df = spark.createDataFrame(
        rows, "pair_id long, s_chosen double, s_rejected double"
    )
    row = margin_report(df, "s_chosen", "s_rejected").collect()[0]
    assert row.n_pairs == 3
    assert row.negative_margin_micro == 333_333
    assert row.zero_margin_micro == 333_333
    # margins micro: 800000, -500000, 0 -> mean 100000
    assert row.mean_margin_micro == 100_000


def test_prompt_contamination_normalized_match(spark):
    evals = spark.createDataFrame(
        [("  what is TWO plus two!?",)], "prompt string"
    )
    got = {
        r.pair_id: r.is_contaminated
        for r in prompt_contamination(_pairs(spark), evals).collect()
    }
    # normalization strips punctuation/case: all "two plus two" prompts hit
    assert got == {1: True, 2: True, 3: True, 4: False, 5: False}


def test_zero_python_nodes(spark):
    from g_data_pipeline_spark.operators.planlint import plan_report

    rep = plan_report(dedup_preference_pairs(_pairs(spark)))
    assert not rep["row_python_nodes"] and not rep["arrow_python_nodes"]
    # two content-keyed window exchanges, no joins
    assert rep["shuffles"] <= 2


def test_preference_audit_composed_rollup(spark):
    """Round-8 oracle-graduation twin (e_preference_audit): the composed
    per-group rollup, exact-micro pinned on the fixture. Pairs carry
    scores so the margin fractions appear; pair 3 conflicts with 1/2,
    pair 2 is a dup; prompt 'Name a color.' is an eval prompt."""
    from g_data_pipeline_spark.operators.preferences import preference_audit

    rows = [p + (0.9, 0.2, "s1") for p in PAIRS[:3]]
    rows += [
        PAIRS[3] + (0.4, 0.4, "s2"),  # zero margin
        PAIRS[4] + (0.1, 0.7, "s2"),  # negative margin
    ]
    pairs = spark.createDataFrame(
        rows,
        "pair_id long, prompt string, chosen string, rejected string, "
        "cscore double, rscore double, source string",
    )
    bench = spark.createDataFrame([("name a COLOR",)], "prompt string")
    got = {
        r.source: r
        for r in preference_audit(
            pairs,
            bench,
            group_cols=["source"],
            chosen_score="cscore",
            rejected_score="rscore",
        ).collect()
    }
    s1, s2 = got["s1"], got["s2"]
    assert (s1.n_pairs, s1.n_dups, s1.n_conflicts, s1.n_contaminated) == (
        3, 1, 3, 0,
    )
    assert (s2.n_pairs, s2.n_dups, s2.n_conflicts, s2.n_contaminated) == (
        2, 0, 0, 2,
    )
    # s1: all three pairs are one-token vs one-token -> no length bias
    assert s1.chosen_longer_micro == 0
    assert s1.mean_abs_token_delta_micro == 0
    # s2: pair 4 chosen longer by 3 (4 vs 1), pair 5 shorter by 4 (1 vs 5)
    assert s2.chosen_longer_micro == 500_000
    assert s2.mean_abs_token_delta_micro == 3_500_000
    # margins: s1 all +0.7; s2 one zero, one negative
    assert (s1.negative_margin_micro, s1.zero_margin_micro) == (0, 0)
    assert (s2.negative_margin_micro, s2.zero_margin_micro) == (
        500_000, 500_000,
    )
