"""Token-budget planning: turn a corpus inventory + mixture weights
into the per-source sampling plan a training run executes — for each
source, how many tokens the budget allocates to it, what fraction of
its natural supply that is (keep fraction when < 1), and how many
EPOCHS it repeats (when > 1) — the data-planning table behind
"X tokens total, temperature-mixed" runs (mT5 §3.1 alpha-mixing;
repeat-epoch accounting per Muennighoff et al. '23, arXiv:2305.16264,
which quantifies the diminishing value of >4 epochs).

All exact integer-micro arithmetic over the #sources-row mixture rollup
(operators/sampling.mixture_weights): one corpus aggregate feeds the
whole plan, everything downstream is arithmetic on a tiny frame. The
``repeat_warning`` column flags sources the budget would cycle past
``max_epochs`` — the signal to either cap the source (shift mass to
the others) or lower the budget.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import token_count


def _floordiv(a: Column, b: Column) -> Column:
    d = F.greatest(b, F.lit(1))
    return ((a - F.pmod(a, d)) / d).cast("long")


def plan_token_budget(
    df: DataFrame,
    source_col: str,
    text_col: str,
    target_tokens: int,
    alpha: float = 0.5,
    max_epochs: int = 4,
    token_mode: str = "whitespace",
) -> DataFrame:
    """Per-source plan: ``(source, natural_tokens, mix_weight_micro,
    budget_tokens, epochs_micro, keep_fraction_micro, repeat_warning)``.

    - ``budget_tokens``: the target allocated by alpha-temperature
      weights over per-source TOKEN supply (floor division — the
      column sums to <= target; the remainder, < #sources tokens, is
      noise at any real budget);
    - ``epochs_micro``: allocated / natural (1e6 = exactly one epoch);
    - ``keep_fraction_micro``: min(1, allocation share of supply) — the
      deterministic-sampler fraction for downsampled sources
      (operators/sampling.hash_sample takes it directly);
    - ``repeat_warning``: epochs beyond ``max_epochs`` (Muennighoff
      '23: returns diminish sharply past ~4 repeats).

    One corpus aggregate (map-side combined) to #sources rows; the
    weight window runs over that tiny frame only."""
    from pyspark.sql import Window

    # token_mode="script" counts CJK characters as tokens (functions/
    # text.CJK_CHAR_CLASS) — without it a CJK-heavy source's supply is
    # undercounted ~50x and the alpha-mix starves it.
    supply = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(token_count(text_col, token_mode).cast("long")).alias(
            "natural_tokens"
        )
    )
    if alpha == 0.5:
        w_scaled = F.floor(
            F.sqrt(F.col("natural_tokens")) * F.lit(1_000_000.0)
        ).cast("long")
    else:
        w_scaled = F.floor(
            F.pow(F.col("natural_tokens").cast("double"), F.lit(float(alpha)))
            * F.lit(1_000_000.0)
        ).cast("long")
    everything = Window.partitionBy()
    # The micro-scaled weights multiply against trillion-token targets
    # (__w ~ supply^alpha * 1e6, target up to ~1e13): products reach
    # ~1e25, far past BIGINT — all cross-products run in decimal(38,0)
    # (exact, ANSI-safe); only the final floored quotients (< target)
    # come back as long. (Round-8 ADVICE fix.)
    dec = "decimal(38,0)"
    weighted = supply.withColumn("__w", w_scaled).withColumn(
        "__wsum", F.sum(F.col("__w").cast(dec)).over(everything)
    )
    budget = _floordiv(
        F.col("__w").cast(dec) * F.lit(int(target_tokens)).cast(dec),
        F.col("__wsum"),
    )
    nat = F.col("natural_tokens")
    epochs = _floordiv(
        F.col("budget_tokens").cast(dec) * F.lit(1_000_000).cast(dec), nat
    )
    return (
        weighted.withColumn(
            "mix_weight_micro",
            _floordiv(
                F.col("__w").cast(dec) * F.lit(1_000_000).cast(dec),
                F.col("__wsum"),
            ),
        )
        .withColumn("budget_tokens", budget)
        .withColumn("epochs_micro", epochs)
        .withColumn(
            "keep_fraction_micro",
            F.least(F.col("epochs_micro"), F.lit(1_000_000)),
        )
        .withColumn(
            "repeat_warning",
            F.col("epochs_micro") > F.lit(int(max_epochs) * 1_000_000),
        )
        .select(
            "source",
            "natural_tokens",
            "mix_weight_micro",
            "budget_tokens",
            "epochs_micro",
            "keep_fraction_micro",
            "repeat_warning",
        )
        .orderBy("source")
    )
