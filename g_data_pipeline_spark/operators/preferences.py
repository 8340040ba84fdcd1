"""Preference-pair (RLHF/DPO) dataset curation: the audits and dedup a
pairwise-feedback dataset needs before reward-model or DPO training.
All pure JVM expressions — fingerprints, token counts, and flag logic
are row-local; the only shuffles key on content hashes (dedup/conflict
groups) or the rollup keys.

The reference has no preference surface (extension); fixtures pin every
rule in tests/test_preferences.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import fingerprint_md5, token_count


def _pair_key(prompt: str, a: str, b: str) -> F.Column:
    """Orientation-SENSITIVE pair fingerprint (prompt, chosen, rejected)."""
    return F.md5(
        F.concat_ws(
            "\x1f",
            fingerprint_md5(prompt),
            fingerprint_md5(a),
            fingerprint_md5(b),
        )
    )


def dedup_preference_pairs(
    pairs: DataFrame,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """Exact pair dedup + LABEL-CONFLICT detection, one pass:

    - ``is_dup``: an identical (prompt, chosen, rejected) triple with a
      smaller id exists — repeated ratings of one comparison;
    - ``is_conflict``: the SAME unordered response pair appears with
      BOTH orientations somewhere in the data (annotators disagreed) —
      every row of such a pair is flagged; standard practice drops or
      down-weights them (label noise hurts DPO more than missing data).

    Shape: two content-hash-keyed window exchanges (orientation key for
    survivorship, unordered key for the conflict scan) — no joins, never
    all-pairs."""
    from pyspark.sql import Window

    fp_o = _pair_key(prompt_col, chosen_col, rejected_col)
    # unordered key: same pair regardless of orientation
    ca, cb = fingerprint_md5(chosen_col), fingerprint_md5(rejected_col)
    fp_u = F.md5(
        F.concat_ws(
            "\x1f",
            fingerprint_md5(prompt_col),
            F.least(ca, cb),
            F.greatest(ca, cb),
        )
    )
    keyed = pairs.withColumn("__fpo", fp_o).withColumn("__fpu", fp_u)
    w_o = Window.partitionBy("__fpo")
    w_u = Window.partitionBy("__fpu")
    return (
        keyed.withColumn(
            "is_dup", F.col(id_col) != F.min(id_col).over(w_o)
        )
        .withColumn(
            "is_conflict",
            F.min("__fpo").over(w_u) != F.max("__fpo").over(w_u),
        )
        .drop("__fpo", "__fpu")
    )


def length_bias_report(
    pairs: DataFrame,
    group_cols: list[str] | None = None,
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
) -> DataFrame:
    """The RLHF length-bias audit: a reward signal that just prefers
    LONGER answers is the classic failure mode, and it is visible in the
    data before training — per group (or globally): pair count, fraction
    of pairs whose chosen response is strictly longer (micro int), and
    the mean chosen-minus-rejected token delta (micro, floor-div exact).
    chosen_longer_micro far above 500000 means length predicts the
    label. One map-side-combined aggregate."""
    lc = token_count(chosen_col).cast("long")
    lr = token_count(rejected_col).cast("long")
    base = pairs.select(
        *(group_cols or []),
        (lc > lr).cast("int").alias("__longer"),
        (lc - lr).alias("__delta"),
    )
    n = F.count(F.lit(1))
    longer = F.sum("__longer") * F.lit(1_000_000)
    delta = F.sum("__delta") * F.lit(1_000_000)
    aggs = [
        n.cast("long").alias("n_pairs"),
        ((longer - F.pmod(longer, n)) / n).cast("long").alias(
            "chosen_longer_micro"
        ),
        ((delta - F.pmod(delta, n)) / n).cast("long").alias(
            "mean_token_delta_micro"
        ),
    ]
    return (
        base.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else base.agg(*aggs)
    )


def margin_report(
    pairs: DataFrame,
    chosen_score: str,
    rejected_score: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Score-margin audit when rater/model scores accompany the pairs:
    per group — pair count, negative-margin fraction (micro; the label
    says chosen but the score disagrees = suspect labels), zero-margin
    fraction (uninformative ties), and mean margin (micro). Margins are
    exact integer micro arithmetic on ROUND(score * 1e6)."""
    m = (
        F.round(F.col(chosen_score) * F.lit(1e6)).cast("long")
        - F.round(F.col(rejected_score) * F.lit(1e6)).cast("long")
    )
    base = pairs.select(*(group_cols or []), m.alias("__m"))
    n = F.count(F.lit(1))
    neg = F.count_if(F.col("__m") < 0) * F.lit(1_000_000)
    zero = F.count_if(F.col("__m") == 0) * F.lit(1_000_000)
    tot = F.sum("__m")
    aggs = [
        n.cast("long").alias("n_pairs"),
        ((neg - F.pmod(neg, n)) / n).cast("long").alias(
            "negative_margin_micro"
        ),
        ((zero - F.pmod(zero, n)) / n).cast("long").alias(
            "zero_margin_micro"
        ),
        ((tot - F.pmod(tot, n)) / n).cast("long").alias("mean_margin_micro"),
    ]
    return (
        base.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else base.agg(*aggs)
    )


def preference_audit(
    pairs: DataFrame,
    eval_prompts: DataFrame,
    group_cols: list[str] | None = None,
    id_col: str = "pair_id",
    prompt_col: str = "prompt",
    chosen_col: str = "chosen",
    rejected_col: str = "rejected",
    chosen_score: str | None = None,
    rejected_score: str | None = None,
) -> DataFrame:
    """The composed per-group DPO-data gate report (round-8 oracle
    graduation of this module — verdict #6): runs the pair dedup /
    conflict scan and eval-prompt contamination, then rolls everything
    into one scalar row per group:

    ``(group..., n_pairs, n_dups, n_conflicts, n_contaminated,
    chosen_longer_micro, mean_abs_token_delta_micro[,
    negative_margin_micro, zero_margin_micro])``

    Gate-safe arithmetic: every micro is a floor-division of NONNEGATIVE
    integers (counts, absolute deltas), so Spark's subtract-pmod floor
    equals DuckDB's truncating ``//`` (mean_token_delta / mean_margin
    can be negative and stay in their pytest-pinned single reports).
    Shape: the two fingerprint windows + one broadcast contamination
    join + one rollup aggregate — content-keyed only."""
    flagged = dedup_preference_pairs(
        pairs, id_col, prompt_col, chosen_col, rejected_col
    )
    flagged = prompt_contamination(flagged, eval_prompts, prompt_col)
    lc = token_count(chosen_col).cast("long")
    lr = token_count(rejected_col).cast("long")
    cols = [
        F.col("is_dup").cast("int").alias("__dup"),
        F.col("is_conflict").cast("int").alias("__conf"),
        F.col("is_contaminated").cast("int").alias("__cont"),
        (lc > lr).cast("int").alias("__longer"),
        F.abs(lc - lr).alias("__absd"),
    ]
    with_margin = chosen_score is not None and rejected_score is not None
    if with_margin:
        m = F.round(F.col(chosen_score) * F.lit(1e6)).cast("long") - F.round(
            F.col(rejected_score) * F.lit(1e6)
        ).cast("long")
        cols += [
            (m < 0).cast("int").alias("__neg"),
            (m == 0).cast("int").alias("__zero"),
        ]
    base = flagged.select(*(group_cols or []), *cols)
    n = F.count(F.lit(1))

    def micro(cnt_col: str) -> F.Column:
        s = F.sum(cnt_col) * F.lit(1_000_000)
        return ((s - F.pmod(s, n)) / n).cast("long")

    aggs = [
        n.cast("long").alias("n_pairs"),
        F.sum("__dup").cast("long").alias("n_dups"),
        F.sum("__conf").cast("long").alias("n_conflicts"),
        F.sum("__cont").cast("long").alias("n_contaminated"),
        micro("__longer").alias("chosen_longer_micro"),
        micro("__absd").alias("mean_abs_token_delta_micro"),
    ]
    if with_margin:
        aggs += [
            micro("__neg").alias("negative_margin_micro"),
            micro("__zero").alias("zero_margin_micro"),
        ]
    return (
        base.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else base.agg(*aggs)
    )


def prompt_contamination(
    pairs: DataFrame,
    eval_prompts: DataFrame,
    prompt_col: str = "prompt",
    eval_prompt_col: str = "prompt",
) -> DataFrame:
    """Flag preference pairs whose PROMPT is an eval-set prompt
    (normalized-fingerprint equality — the eval-prompt twin of
    dedup.decontaminate): training a reward model on eval prompts leaks
    the benchmark even when responses differ. Adds ``is_contaminated``;
    the eval fingerprint set is aggregated once and joined content-keyed
    (broadcast-sized for any real eval suite)."""
    bench = F.broadcast(
        eval_prompts.select(
            fingerprint_md5(eval_prompt_col).alias("__bfp")
        ).distinct()
    )
    keyed = pairs.withColumn("__pfp", fingerprint_md5(prompt_col))
    hit = bench.withColumn("__hit", F.lit(True))
    return (
        keyed.join(hit, keyed["__pfp"] == hit["__bfp"], "left")
        .withColumn("is_contaminated", F.coalesce("__hit", F.lit(False)))
        .drop("__bfp", "__pfp", "__hit")
    )
