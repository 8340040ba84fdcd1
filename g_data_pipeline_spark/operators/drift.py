"""Data-drift monitoring between two profile snapshots — facts unread.

The operational loop the mergeable profiler exists for: every ingest
batch lands partial-profile states (operators/incremental_profile.py,
streaming twin in streaming/pipelines.profile_maintenance_stream); drift
detection then compares ANY two slices of the stats dataset — this week
vs history, source A vs source B, post-migration vs pre — by folding
each side's states and differencing, never re-scanning data. At 100 TB
this is the difference between a dashboard query and a cluster job.

Per-column metrics, all standard drift diagnostics:

- ``mean_shift_sigma``  |mean_new − mean_base| / stddev_base — location
  shift in base-noise units (exact moments, deterministic).
- ``null_rate_delta``   null-fraction change (exact).
- ``distinct_ratio``    distinct_new / distinct_base (HLL estimates).
- ``range_breach``      new min/max escaping the base envelope (exact).
- ``psi``               Population Stability Index over ``bins``
  equi-population buckets: cuts from the BASE KLL sketch's quantiles,
  new-side bucket masses from the NEW sketch's rank function —
  PSI = Σ (pᵢ − 1/bins)·ln(pᵢ/(1/bins)). Sketch-only: no histogram
  job on either side. Conventional reading: <0.1 stable, 0.1–0.25
  moderate, >0.25 major shift. Probabilities are clamped at 1e-6
  before the log so an empty bucket yields a large finite PSI, not inf.

Execution note: the report runs TWO tiny jobs over the stats dataset —
``kll_sketch_get_rank_double`` demands a FOLDABLE value argument, so the
base cuts (bins × cols doubles) are evaluated and collected first, then
spliced into the report expression as literals. Both jobs fold only
stats rows; the facts are never read. Calling this builds+runs the cuts
job immediately (register with ``eager=True`` if it ever enters the
registry).

The two folded sides are single rows, so the combine is a 1×1 broadcast
join — the whole report costs two folds of the tiny stats dataset.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.incremental_profile import (
    _c,
    merged_states,
)

_EPS = 1e-6


def _psi(new_kll: Column, cuts: list[float], bins: int) -> Column:
    """PSI from the NEW sketch's rank (CDF) at the BASE's literal cuts."""
    uniform = 1.0 / bins

    def rank_at(i: int) -> Column:
        # endpoints are exact 0/1 by definition
        if i <= 0:
            return F.lit(0.0)
        if i >= bins:
            return F.lit(1.0)
        return F.kll_sketch_get_rank_double(new_kll, F.lit(cuts[i - 1]))

    terms = []
    for i in range(bins):
        p = rank_at(i + 1) - rank_at(i)
        p = F.greatest(p, F.lit(_EPS))
        terms.append((p - uniform) * F.log(p / F.lit(uniform)))
    out = terms[0]
    for t in terms[1:]:
        out = out + t
    return out


def profile_drift_report(
    base_partials: DataFrame,
    new_partials: DataFrame,
    cols: Sequence[str],
    bins: int = 10,
) -> DataFrame:
    """One row per column comparing the two snapshots' folded states."""
    base = merged_states(base_partials, cols)
    new = merged_states(new_partials, cols)
    # cuts job: bins-1 interior quantiles per column from the base fold.
    # Driver state is bounded (bins × cols doubles). Literal quantile
    # ranks ARE foldable, so this select resolves; the computed cut
    # VALUES then return as Python floats to become foldable literals in
    # the rank calls below.
    qs = [(i + 1) / bins for i in range(bins - 1)]
    cuts_row = base.select(
        [
            F.kll_sketch_get_quantile_double(
                F.col(_c(c, "kll")), F.lit(float(q))
            ).alias(f"{c}__{i}")
            for c in cols
            for i, q in enumerate(qs)
        ]
    ).collect()[0]
    cuts = {
        c: [cuts_row[f"{c}__{i}"] for i in range(len(qs))] for c in cols
    }
    b = base.select([F.col(c).alias(f"b_{c}") for c in base.columns])
    n = new.select([F.col(c).alias(f"n_{c}") for c in new.columns])
    both = b.join(n)  # 1×1: plans as a broadcast nested loop over one row

    def d(side: str, c: str, part: str) -> Column:
        return F.col(f"{side}_{_c(c, part)}")

    per_col = []
    for c in cols:
        b_cnt = d("b", c, "cnt").cast("double")
        n_cnt = d("n", c, "cnt").cast("double")
        b_sum = d("b", c, "sum").cast("double")
        n_sum = d("n", c, "sum").cast("double")
        b_sq = d("b", c, "sumsq").cast("double")
        b_mean = b_sum / b_cnt
        n_mean = n_sum / n_cnt
        b_var = F.when(
            d("b", c, "cnt") > 1,
            F.greatest(
                (b_sq - b_sum * b_sum / b_cnt) / (b_cnt - 1.0), F.lit(0.0)
            ),
        ).otherwise(F.lit(0.0))
        b_std = F.sqrt(b_var)
        b_rows = F.col("b_rows").cast("double")
        n_rows = F.col("n_rows").cast("double")
        per_col.append(
            F.struct(
                F.lit(c).alias("column"),
                F.when(b_std > 0, F.abs(n_mean - b_mean) / b_std).alias(
                    "mean_shift_sigma"
                ),
                (
                    d("n", c, "nulls") / n_rows - d("b", c, "nulls") / b_rows
                ).alias("null_rate_delta"),
                (
                    d("n", c, "distinct").cast("double")
                    / d("b", c, "distinct")
                ).alias("distinct_ratio"),
                (
                    (d("n", c, "min") < d("b", c, "min"))
                    | (d("n", c, "max") > d("b", c, "max"))
                ).alias("range_breach"),
                _psi(d("n", c, "kll"), cuts[c], bins).alias("psi"),
            )
        )
    return both.select(F.explode(F.array(*per_col)).alias("s")).select("s.*")


def max_expected_psi(bins: int = 10) -> float:
    """PSI when every new row lands in ONE base bucket (total collapse):
    useful as a sanity ceiling in alerts/tests."""
    return (1 - 1 / bins) * abs(math.log(_EPS / (1 / bins))) + (
        1 - 1 / bins
    ) * math.log(1 / (1 / bins))


def embedding_centroid_drift(
    cur: DataFrame,
    ref: DataFrame,
    vec_col: str = "embedding",
    group_col: str | None = None,
) -> DataFrame:
    """Semantic drift between two embedding snapshots: per group (or one
    global row), the cosine similarity between the REFERENCE centroid and
    the CURRENT centroid, plus the centroid-norm ratio — the two cheap
    scalars that catch "the corpus moved" (topic shift, encoder version
    change, a source going rogue) before any model does.

    Output: [group_col,] n_ref, n_cur, centroid_cosine, norm_ratio
    (|cur| / |ref|). centroid_cosine near 1.0 = stable; the alarm
    threshold is domain-specific (tests plant a sign-flip = -1).

    Scale shape: each side is ONE posexplode + groupBy(dim) partial-sum
    pass (map-side combine on (group, dim) keys — never a per-row
    shuffle of whole vectors), then the per-dim means join on
    (group, dim) and fold to a dot product. All driver-free.
    """
    from pyspark.sql import functions as F

    def centroids(df: DataFrame, tag: str) -> DataFrame:
        g = F.col(group_col) if group_col else F.lit(0)
        per_dim = (
            df.select(
                g.alias("__g"), F.posexplode(vec_col).alias("dim", "x")
            )
            .groupBy("__g", "dim")
            .agg(
                F.sum("x").alias("s"),
                F.count(F.lit(1)).alias("c"),
            )
        )
        return per_dim.select(
            "__g",
            "dim",
            (F.col("s") / F.col("c")).alias(f"m_{tag}"),
            F.col("c").alias(f"n_{tag}"),
        )

    r = centroids(ref, "ref")
    c = centroids(cur, "cur")
    joined = r.join(c, ["__g", "dim"])
    out = joined.groupBy("__g").agg(
        # MAX, not FIRST: with ragged (different-length) vectors in a
        # group the per-dimension counts differ and F.first is
        # nondeterministic — max = "rows that carry dimension 0..k", a
        # deterministic upper envelope. (Fixed-length vectors per group,
        # the documented contract, make every per-dim count equal.)
        F.max("n_ref").cast("bigint").alias("n_ref"),
        F.max("n_cur").cast("bigint").alias("n_cur"),
        F.sum(F.col("m_ref") * F.col("m_cur")).alias("__dot"),
        F.sum(F.col("m_ref") * F.col("m_ref")).alias("__nr"),
        F.sum(F.col("m_cur") * F.col("m_cur")).alias("__nc"),
    )
    cos = F.when(
        (F.col("__nr") > 0) & (F.col("__nc") > 0),
        F.col("__dot") / (F.sqrt("__nr") * F.sqrt("__nc")),
    )
    ratio = F.when(F.col("__nr") > 0, F.sqrt("__nc") / F.sqrt("__nr"))
    cols = [
        F.col("n_ref"),
        F.col("n_cur"),
        cos.alias("centroid_cosine"),
        ratio.alias("norm_ratio"),
    ]
    if group_col:
        return out.select(F.col("__g").alias(group_col), *cols)
    return out.select(*cols)
