"""LSH banding planner (operators/banding.py): textbook curve values,
factorization enumeration, and the recommendation rules — plus a
cross-check against the repo's own production default (32 hashes, 8
bands)."""

from __future__ import annotations

import math

import pytest

from g_data_pipeline_spark.operators.banding import (
    banding_plan,
    candidate_probability,
    curve_midpoint,
    recommend_banding,
)


def test_textbook_curve_values():
    # MMDS §3.4.2's canonical example: n=100, b=20, r=5
    assert candidate_probability(0.8, 20, 5) == pytest.approx(
        1 - (1 - 0.8**5) ** 20
    )
    assert candidate_probability(0.0, 20, 5) == 0.0
    assert candidate_probability(1.0, 20, 5) == 1.0
    assert curve_midpoint(20, 5) == pytest.approx((1 / 20) ** (1 / 5))
    # monotone in s
    ps = [candidate_probability(s / 10, 20, 5) for s in range(11)]
    assert ps == sorted(ps)


def test_plan_enumerates_exact_factorizations():
    plan = banding_plan(32, threshold=0.7)
    assert {(c.bands, c.rows) for c in plan} == {
        (32, 1), (16, 2), (8, 4), (4, 8), (2, 16), (1, 32),
    }
    # first entry's midpoint is the closest to the threshold
    best = plan[0]
    assert all(
        abs(best.midpoint - 0.7) <= abs(c.midpoint - 0.7) + 1e-12
        for c in plan
    )


def test_recommendation_trades_recall_for_sharpness():
    got = recommend_banding(32, threshold=0.7, min_recall=0.9)
    assert got.p_at_threshold >= 0.9
    # every sharper-at-low choice that was rejected missed the recall bar
    for c in banding_plan(32, 0.7):
        if c.p_at_low < got.p_at_low:
            assert c.p_at_threshold < 0.9


def test_repo_default_is_a_sane_choice():
    """The dedup family's default (num_hashes=32, bands=8 -> r=4) must
    sit near the 0.5-0.6 Jaccard regime its fixtures assume and catch
    ~0.5-Jaccard near-dups with high probability."""
    mid = curve_midpoint(8, 4)
    assert 0.5 < mid < 0.65
    assert candidate_probability(0.5, 8, 4) > 0.4
    assert candidate_probability(0.9, 8, 4) > 0.999
    assert candidate_probability(0.1, 8, 4) < 0.001


def test_invalid_inputs_raise():
    with pytest.raises(ValueError):
        candidate_probability(1.5, 8, 4)
    with pytest.raises(ValueError):
        banding_plan(0, 0.5)
    assert not math.isnan(curve_midpoint(1, 1))


def test_recommendation_drives_incremental_minhash_default():
    """Round-8 (verdict #7): incremental_minhash_dedup's banding is now
    planner-derived when bands=None. The defaults (32 hashes, threshold
    0.8) must reproduce the historical hard-coded 8 bands x 4 rows; the
    choice shifts with the threshold exactly as the S-curve dictates."""
    from g_data_pipeline_spark.operators.banding import recommend_banding

    c = recommend_banding(32, 0.8)
    assert (c.bands, c.rows) == (8, 4)
    # looser threshold -> wider bands for recall: 0.5 -> 16 x 2
    assert (recommend_banding(32, 0.5).bands,
            recommend_banding(32, 0.5).rows) == (16, 2)
    # 0.9: the sharper 4 x 8 split misses the 0.9 recall floor by a hair
    # (0.8948) so the planner holds 8 x 4; relaxing the floor flips it
    assert (recommend_banding(32, 0.9).bands,
            recommend_banding(32, 0.9).rows) == (8, 4)
    relaxed = recommend_banding(32, 0.9, min_recall=0.85)
    assert (relaxed.bands, relaxed.rows) == (4, 8)


def test_incremental_minhash_planner_path_matches_explicit(spark):
    """bands=None (planner) labels bit-identically to the explicit
    historical bands=8 at the default threshold."""
    from g_data_pipeline_spark.operators.dedup import (
        incremental_minhash_dedup,
    )

    words = [f"w{i}" for i in range(30)]
    doc = " ".join(words)
    near = " ".join(words[:-1] + ["zz"])
    batch = spark.createDataFrame(
        [(1, doc), (2, near), (3, "completely different text entirely here")],
        "doc_id long, text string",
    )
    empty = spark.createDataFrame(
        [], "band int, bucket long, owner_id long"
    )
    auto_l, auto_d = incremental_minhash_dedup(
        batch, empty, "doc_id", "text"
    )
    exp_l, exp_d = incremental_minhash_dedup(
        batch, empty, "doc_id", "text", bands=8
    )
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(auto_l) == key(exp_l)
    assert key(auto_d) == key(exp_d)
