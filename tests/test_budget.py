"""Token-budget planning (operators/budget.py): exact integer pins on a
crafted two-source corpus (alpha-weighting, floor allocations, epoch
accounting, repeat warning, keep fractions)."""

from __future__ import annotations

from g_data_pipeline_spark.operators.budget import plan_token_budget


def _corpus(spark):
    # big: 4 docs x 100 tokens = 400; small: 1 doc x 100 tokens = 100
    rows = [(i, "w " * 100, "big") for i in range(4)]
    rows.append((9, "w " * 100, "small"))
    return spark.createDataFrame(rows, "id long, text string, source string")


def test_alpha_half_plan_exact(spark):
    plan = {
        r.source: r
        for r in plan_token_budget(
            _corpus(spark), "source", "text", target_tokens=300
        ).collect()
    }
    big, small = plan["big"], plan["small"]
    assert (big.natural_tokens, small.natural_tokens) == (400, 100)
    # sqrt weights: 20 vs 10 -> shares 2/3 and 1/3 exactly
    assert big.mix_weight_micro == 666_666
    assert small.mix_weight_micro == 333_333
    assert big.budget_tokens == 200 and small.budget_tokens == 100
    # big is downsampled to half its supply; small runs exactly 1 epoch
    assert big.epochs_micro == 500_000 and big.keep_fraction_micro == 500_000
    assert small.epochs_micro == 1_000_000
    assert not big.repeat_warning and not small.repeat_warning


def test_repeat_warning_fires_past_max_epochs(spark):
    plan = {
        r.source: r
        for r in plan_token_budget(
            _corpus(spark), "source", "text",
            target_tokens=3_000, max_epochs=4,
        ).collect()
    }
    # small gets 1000 tokens over a 100-token supply = 10 epochs
    assert plan["small"].epochs_micro == 10_000_000
    assert plan["small"].repeat_warning
    assert plan["big"].epochs_micro == 5_000_000  # 5 epochs > 4: warned too
    assert plan["big"].repeat_warning
    # keep fraction caps at 1 for upsampled sources
    assert plan["small"].keep_fraction_micro == 1_000_000


def test_budget_never_exceeds_target(spark):
    rows = plan_token_budget(
        _corpus(spark), "source", "text", target_tokens=777
    ).collect()
    assert sum(r.budget_tokens for r in rows) <= 777


def test_trillion_scale_target_does_not_overflow(spark):
    """Round-8 ADVICE fix: __w * target ran in BIGINT and overflowed at
    the module's advertised scales (1e13-token targets); the allocation
    now runs in decimal(38,0). Exact check: weights 20e6/10e6 over a
    1e13 target -> floor(2/3 * 1e13) and floor(1/3 * 1e13)."""
    target = 10**13
    plan = {
        r.source: r
        for r in plan_token_budget(
            _corpus(spark), "source", "text", target_tokens=target
        ).collect()
    }
    assert plan["big"].budget_tokens == (20 * target) // 30
    assert plan["small"].budget_tokens == (10 * target) // 30
    assert plan["big"].repeat_warning and plan["small"].repeat_warning
