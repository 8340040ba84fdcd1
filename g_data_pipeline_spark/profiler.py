"""Per-column statistical profiling — the reference's flagship computation
(``generate_insights``, ``/root/reference/src/services/processor.rs:264-456``;
SURVEY.md §2.3 P1-P13) re-expressed as Spark aggregations.

Plan shape (the scale story)
----------------------------
The reference computes one Polars pass per statistic. Here the profile is a
handful of flat ``df.agg(...)`` passes — counts, numeric stats, correlation
matrix, percentiles — each a single scan + a single (tiny) shuffle of partial
aggregate buffers regardless of column count (see ``profile(passes=...)``
for the fused-single-scan variant and why split is the default). Top-k
frequent values add one ``groupBy(col)`` per categorical column (its own
shuffle, unavoidable for exact counts).

100 TB notes, encoded as options rather than folklore:

- ``distinct_method="approx"`` switches exact ``countDistinct`` (an Expand —
  duplicates the input N_cols times pre-shuffle) to HLL
  ``approx_count_distinct`` (constant-size sketch, no Expand).
- ``percentile_method="approx"`` switches exact ``F.percentile`` (holds all
  column values per group in memory on the reducer) to the GK-sketch
  ``percentile_approx``. Exact mode matches the reference and the DuckDB
  oracle (linear interpolation, SURVEY.md §4.3.5); approx is the scale
  escape hatch documented in SURVEY.md §7.
- ``percentile_method="auto"`` (the DEFAULT) resolves to one of the above
  from the optimizer's size estimate BEFORE any job runs: inputs at or
  under ``auto_percentile_max_bytes`` (default 4 GiB) get the exact
  reference semantics; larger inputs get the sketch — so a user who never
  touches the knob gets exact answers on test-sized data and never pays a
  full per-column value sort on a 100 TB table by accident. The
  oracle-gated queries pin ``exact`` explicitly and are unaffected.
- ``deterministic=True`` computes mean/stddev/corr from exact decimal
  accumulators (see functions.deterministic) so results are bit-reproducible
  across partitionings and engines; default uses Spark's numerically-stable
  built-ins (Welford-style), whose last bits depend on merge order.

Semantics pinned against the reference (SURVEY.md §4.3):

- std dev is SAMPLE (ddof=1) — ``stddev_samp`` (processor.rs:355).
- unique counts use SQL semantics (nulls excluded) — the reference's Polars
  ``n_unique`` counts null as a value; we expose ``null_count`` separately
  (documented divergence, §4.3.3).
- correlation is standard pairwise-complete Pearson (``F.corr``) — the
  reference mixes full-column means into pairwise-complete covariance
  (processor.rs:458-520), a bug we do not reproduce (§4.3.1).
- top-10 frequent values: categorical columns only, count-desc with value
  as the deterministic tiebreaker (the reference's ordering on ties is
  unspecified, §2.3 P10).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from g_data_pipeline_spark.functions.deterministic import davg, dsum
from g_data_pipeline_spark.operators.runprofile import (
    tap_action as _tap_action,
)

NUMERIC_STATS = ("min", "max", "mean", "median", "std_dev", "percentile_25", "percentile_75")

#: Above this optimizer-estimated input size, percentile_method="auto"
#: chooses the GK sketch over exact percentiles: exact F.percentile holds
#: every value of a column in one aggregation buffer, so its memory bill is
#: proportional to input rows — fine at gigabytes, a reducer OOM (or a
#: multi-job order-statistics bill in "distributed" mode) at 100 TB.
AUTO_PERCENTILE_MAX_BYTES = 4 * 1024**3

#: Concurrent profile jobs in flight (guide §2.6). Enough to overlap the
#: independent aggregation passes and per-column top-k jobs; small enough
#: that they back-fill rather than fight for executors.
PROFILE_JOB_POOL = 8


@dataclass
class ColumnClasses:
    """P2 column classification (processor.rs:270-296): numeric / date /
    categorical (everything else, including booleans and free text)."""

    numeric: list[str] = field(default_factory=list)
    date: list[str] = field(default_factory=list)
    categorical: list[str] = field(default_factory=list)


def classify_columns(df: DataFrame) -> ColumnClasses:
    out = ColumnClasses()
    for f_ in df.schema.fields:
        if isinstance(f_.dataType, T.NumericType):
            out.numeric.append(f_.name)
        elif isinstance(f_.dataType, (T.DateType, T.TimestampType, T.TimestampNTZType)):
            out.date.append(f_.name)
        else:
            out.categorical.append(f_.name)
    return out


# --------------------------------------------------------------------------
# Expression builders — shared by profile() and the oracle-gated queries.
# --------------------------------------------------------------------------

def null_count_expr(col: str) -> Column:
    """P3: nulls = COUNT(*) - COUNT(col)."""
    return (F.count(F.lit(1)) - F.count(col)).alias(f"null_count_{col}")


def distinct_count_expr(col: str, method: str = "exact") -> Column:
    """P4 with SQL null semantics (SURVEY.md §4.3.3)."""
    agg = F.countDistinct(col) if method == "exact" else F.approx_count_distinct(col)
    return agg.alias(f"unique_count_{col}")


def percentile_expr(col: str, percentile_method: str = "exact") -> Column:
    """P7/P9: [p25, median, p75] as ONE array-percentile aggregate.

    Why one array expression per column: exact Percentile is a
    TypedImperativeAggregate; piling many of them into one agg trips
    ObjectHashAggregate's sort-based fallback (measured 6× slower at sf0.1).
    One array-percentile per column keeps the imperative-agg count at
    #columns, and profile() runs them in a SEPARATE aggregation from the
    codegen-friendly stats so the fast path stays in whole-stage codegen.
    """
    c = F.col(col).cast("double")
    pcts = F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75))
    if percentile_method == "exact":
        return F.percentile(c, pcts)
    return F.percentile_approx(c, pcts)


def resolve_auto_percentile_method(
    df: DataFrame, max_bytes: int = AUTO_PERCENTILE_MAX_BYTES
) -> str:
    """Resolve ``percentile_method="auto"`` -> "exact" | "approx" from the
    Catalyst size estimate of ``df``'s optimized plan (file sizes after
    pruning — no job is run to decide). RDD-backed in-memory relations have
    no stats and report the ``spark.sql.defaultSizeInBytes`` sentinel
    (Long.MaxValue); those resolve to "exact" — they already fit in cluster
    memory, while the 100 TB inputs this guard exists for are file-backed
    scans with real size stats. Deliberately coarse: the only wrong choice
    at the boundary is a slightly slower exact answer or a slightly
    approximate fast one, never an error."""
    size = int(
        str(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    )
    if size >= 1 << 62:  # unknown-size sentinel
        return "exact"
    return "exact" if size <= max_bytes else "approx"


def numeric_stat_exprs(
    col: str,
    deterministic: bool = False,
) -> dict[str, Column]:
    """P5/P6/P8 for one numeric column (the codegen-friendly stats — min/max/
    mean/stddev); percentiles live in :func:`percentile_expr`."""
    c = F.col(col).cast("double")
    if deterministic:
        # Exact decimal sums -> identical doubles on any engine/partitioning.
        # sum(x^2) uses scale=4 (squares of <=2dp inputs are exactly 4dp) and
        # hi/lo split sums (totals of ~1e10-per-row terms exceed 2^63*1e-4).
        n = F.count(c)
        s1 = dsum(c)
        s2 = dsum(c * c, scale=4, split=True)
        mean = s1 / n
        # sample variance = (S2 - S1^2/n) / (n-1); deterministic, matches the
        # same formula on the oracle side. (Library default path uses the
        # numerically-stabler built-in instead.)
        var = (s2 - (s1 * s1) / n) / (n - F.lit(1))
        std = F.sqrt(var)
    else:
        mean = F.avg(c)
        std = F.stddev_samp(c)
    return {
        "min": F.min(c),
        "max": F.max(c),
        "mean": mean,
        "std_dev": std,
    }


def corr_expr(c1: str, c2: str, deterministic: bool = False) -> Column:
    """P11/P12: standard pairwise-complete Pearson (reference bug not
    reproduced — SURVEY.md §4.3.1)."""
    if not deterministic:
        return F.corr(c1, c2)
    x = F.col(c1).cast("double")
    y = F.col(c2).cast("double")
    both = F.when(x.isNotNull() & y.isNotNull(), F.lit(1))
    n = F.count(both)
    # Pairwise-complete decimal sums; products of <=2dp inputs are <=4dp.
    sx = dsum(F.when(both.isNotNull(), x))
    sy = dsum(F.when(both.isNotNull(), y))
    sxx = dsum(F.when(both.isNotNull(), x * x), scale=4, split=True)
    syy = dsum(F.when(both.isNotNull(), y * y), scale=4, split=True)
    sxy = dsum(F.when(both.isNotNull(), x * y), scale=4, split=True)
    cov = sxy - sx * sy / n
    vx = sxx - sx * sx / n
    vy = syy - sy * sy / n
    return F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))


def sql_numeric_stats(col: str, deterministic: bool = True) -> dict[str, str]:
    """DuckDB twins of :func:`numeric_stat_exprs` (deterministic mode)."""
    from g_data_pipeline_spark.functions.deterministic import sql_dsum

    n = f"COUNT({col})"
    s1 = sql_dsum(col)
    s2 = sql_dsum(f"{col}*{col}", scale=4, split=True)
    return {
        "min": f"MIN({col})",
        "max": f"MAX({col})",
        "mean": f"{s1} / {n}",
        "median": f"QUANTILE_CONT({col}, 0.5)",
        "std_dev": f"SQRT(({s2} - ({s1})*({s1})/{n}) / ({n} - 1))",
        "percentile_25": f"QUANTILE_CONT({col}, 0.25)",
        "percentile_75": f"QUANTILE_CONT({col}, 0.75)",
    }


def sql_corr(c1: str, c2: str) -> str:
    """DuckDB twin of deterministic :func:`corr_expr` (no-null case)."""
    from g_data_pipeline_spark.functions.deterministic import sql_dsum

    n = "COUNT(*)"
    sx, sy = sql_dsum(c1), sql_dsum(c2)
    sxx = sql_dsum(f"{c1}*{c1}", scale=4, split=True)
    syy = sql_dsum(f"{c2}*{c2}", scale=4, split=True)
    sxy = sql_dsum(f"{c1}*{c2}", scale=4, split=True)
    return (
        f"(({sxy}) - ({sx})*({sy})/{n}) / "
        f"SQRT((({sxx}) - ({sx})*({sx})/{n}) * (({syy}) - ({sy})*({sy})/{n}))"
    )


# --------------------------------------------------------------------------
# The profiler.
# --------------------------------------------------------------------------

def _top_values_plan(df: DataFrame, col: str, k: int) -> DataFrame:
    """Build (and cache on ``df``) the P10 top-k plan for one column.

    Caching matters for the recompute-on-miss service pattern: rebuilding
    the plan per call mints fresh expression IDs, defeating Spark's codegen
    cache — measured 0.17 s/call vs 0.03 s for a cached plan at sf0.1
    (analysis + janino, not execution). Same rationale as the
    ``_gdp_profile_plans`` cache below; plans only, never results."""
    cache = getattr(df, "_gdp_topk_plans", None)
    if cache is None:
        cache = {}
        try:
            df._gdp_topk_plans = cache
        except AttributeError:
            return _build_top_values_plan(df, col, k)
    key = (col, k)
    if key not in cache:
        cache[key] = _build_top_values_plan(df, col, k)
    return cache[key]


def _build_top_values_plan(df: DataFrame, col: str, k: int) -> DataFrame:
    return (
        df.filter(F.col(col).isNotNull())
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col(col).asc())
        .limit(k)
    )


def top_values(df: DataFrame, col: str, k: int = 10) -> dict[str, int]:
    """P10: top-k frequent values for one categorical column (count-desc,
    value-asc tiebreak; nulls excluded from the value map)."""
    plan = _top_values_plan(df, col, k)
    rows = plan.collect()
    _tap_action(plan)
    return {str(r[col]): r["cnt"] for r in rows}


def profile(
    df: DataFrame,
    top_k: int = 10,
    deterministic: bool = False,
    distinct_method: str = "exact",
    percentile_method: str = "auto",
    include_correlations: bool = True,
    include_top_values: bool = True,
    passes: str = "split",
    auto_percentile_max_bytes: int = AUTO_PERCENTILE_MAX_BYTES,
) -> dict[str, Any]:
    """Full P1-P13 profile as a JSON-shaped dict (numbers stay numeric;
    string formatting belongs at the API edge — SURVEY.md §4.3.6).

    ``passes``: "split" (default) runs counts / numeric stats / correlations
    as SEPARATE compact aggregations — whole-stage-codegen compile time is
    superlinear in plan width, and one fused mega-agg (11 distinct counts +
    28 correlations + 32 stats) measured ~60 s of janino per call vs ~13 s
    total when split. "fused" keeps the single-scan plan — the right choice
    when scan cost dominates compile cost (very wide tables at 100 TB,
    or a cached input)."""
    if percentile_method == "auto":
        # Resolve BEFORE the plan-cache key so the cache is keyed on the
        # concrete mode actually planned.
        percentile_method = resolve_auto_percentile_method(
            df, auto_percentile_max_bytes
        )
    classes = classify_columns(df)
    cols = df.columns

    count_exprs: list[Column] = [F.count(F.lit(1)).alias("__row_count")]
    for c in cols:
        count_exprs.append(null_count_expr(c))
        count_exprs.append(distinct_count_expr(c, distinct_method))
    stat_exprs: list[Column] = []
    for c in classes.numeric:
        for stat, e in numeric_stat_exprs(c, deterministic).items():
            stat_exprs.append(e.alias(f"{stat}_{c}"))
    pairs = []
    corr_exprs: list[Column] = []
    if include_correlations and len(classes.numeric) >= 2:
        for i, c1 in enumerate(classes.numeric):
            for c2 in classes.numeric[i + 1:]:
                pairs.append((c1, c2))
                corr_exprs.append(
                    corr_expr(c1, c2, deterministic).alias(f"__corr_{c1}-{c2}")
                )

    # Plan cache, attached to the input DataFrame: rebuilding aggregate
    # plans mints fresh expression IDs, which defeats Spark's codegen cache
    # and re-pays analysis+compilation (~10 s here vs ~2 s execution at
    # sf0.1). Re-profiling the same dataset is the normal service pattern
    # (recompute-on-miss — SURVEY.md §3.2), so cache the built plans.
    cache_key = (deterministic, distinct_method, percentile_method, passes,
                 include_correlations, tuple(cols))
    plan_cache = getattr(df, "_gdp_profile_plans", None)
    if plan_cache is None or plan_cache.get("key") != cache_key:
        plans: dict[str, DataFrame] = {}
        if passes == "fused":
            plans["all"] = df.agg(*(count_exprs + stat_exprs + corr_exprs))
        else:
            plans["counts"] = df.agg(*count_exprs)
            if stat_exprs:
                plans["stats"] = df.agg(*stat_exprs)
            if corr_exprs:
                plans["corr"] = df.agg(*corr_exprs)
        if classes.numeric and percentile_method != "distributed":
            # One percentile pass for all columns. r10 split this into one
            # single-row aggregate per column below a size guard (claiming
            # the columns' imperative value-map builds then run as
            # concurrent jobs); the r10 verdict flagged the claim as
            # driver-contradicted, and the r11 interleaved re-measure
            # confirms: split+pool vs nosplit+pool is a WALL WASH (medians
            # 2.39 vs 2.42 s over 4 GC'd rounds) while the split costs
            # 2.17x rows_scanned and ~4 s extra first-call compile (more
            # plans). Reverted per verdict #4; the job POOL below is the
            # part that reproduces (split+pool1 3.12 s median) and stays.
            plans["pcts"] = df.agg(
                *[
                    percentile_expr(c, percentile_method).alias(f"__pct_{c}")
                    for c in classes.numeric
                ]
            )
        plan_cache = {"key": cache_key, "plans": plans}
        try:
            df._gdp_profile_plans = plan_cache
        except AttributeError:
            pass
    plans = plan_cache["plans"]

    # Run the independent profile jobs CONCURRENTLY (guide §2.6: actions
    # are only sequential because the driver calls them sequentially; a
    # small pool lets the next job's tasks back-fill the tail of the
    # current one — on a cluster, stragglers; locally, the single-task
    # scan stages of a one-row-group parquet input). Results are merged
    # in a FIXED order below, so completion order never affects output;
    # metric harvesting (_tap_action appends to a module-global list) runs
    # after the pool, on this thread.
    jobs: list[tuple[str, DataFrame]] = list(plans.items())
    tv_rows: dict[str, list] = {}
    if include_top_values:
        for c in classes.categorical:
            jobs.append((f"top:{c}", _top_values_plan(df, c, top_k)))
    if len(jobs) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(
            max_workers=min(PROFILE_JOB_POOL, len(jobs))
        ) as pool:
            futs = [(name, pool.submit(plan.collect)) for name, plan in jobs]
            collected = {name: f.result() for name, f in futs}
    else:
        collected = {name: plan.collect() for name, plan in jobs}
    for name, plan in jobs:
        _tap_action(plan)

    row = {}
    for name, _plan in jobs:
        if name.startswith("top:"):
            tv_rows[name[4:]] = collected[name]
        else:
            row.update(collected[name][0].asDict())

    # Exact percentiles (imperative aggregates — kept out of the codegen'd
    # stats pass; see percentile_expr docstring). Three modes: "exact"
    # (single-buffer, reference semantics), "approx" (GK sketch),
    # "distributed" (range-partitioned order statistics — the 100 TB path
    # that is still bit-exact; operators.percentiles).
    if classes.numeric and percentile_method == "distributed":
        from g_data_pipeline_spark.operators.percentiles import (
            exact_percentiles_distributed,
        )

        for c in classes.numeric:
            got = exact_percentiles_distributed(df, c, [0.25, 0.5, 0.75])
            row[f"percentile_25_{c}"] = got[0.25]
            row[f"median_{c}"] = got[0.5]
            row[f"percentile_75_{c}"] = got[0.75]
    elif classes.numeric:
        for c in classes.numeric:
            p25, med, p75 = row[f"__pct_{c}"] or (None, None, None)
            row[f"percentile_25_{c}"] = p25
            row[f"median_{c}"] = med
            row[f"percentile_75_{c}"] = p75

    dtype_by_col = {f_.name: f_.dataType.simpleString() for f_ in df.schema.fields}
    column_statistics = []
    for c in cols:
        stats: dict[str, Any] = {
            "name": c,
            "data_type": dtype_by_col[c],
            "null_count": row[f"null_count_{c}"],
            "unique_count": row[f"unique_count_{c}"],
        }
        if c in set(classes.numeric):
            for stat in NUMERIC_STATS:
                stats[stat] = row[f"{stat}_{c}"]
        if include_top_values and c in set(classes.categorical):
            stats["top_values"] = {
                str(r[c]): r["cnt"] for r in tv_rows[c]
            }
        column_statistics.append(stats)

    result: dict[str, Any] = {
        "data_summary": {
            "row_count": row["__row_count"],
            "column_count": len(cols),
            "numeric_columns": classes.numeric,
            "date_columns": classes.date,
            "categorical_columns": classes.categorical,
            "summary_text": (
                f"Dataset contains {row['__row_count']} rows and {len(cols)} columns "
                f"({len(classes.numeric)} numeric, {len(classes.date)} date, "
                f"{len(classes.categorical)} categorical)."
            ),
        },
        "column_statistics": column_statistics,
    }
    if pairs:
        result["correlations"] = {
            f"{c1}-{c2}": row[f"__corr_{c1}-{c2}"] for c1, c2 in pairs
        }
    return result


def format_insights(insights: dict[str, Any]) -> dict[str, Any]:
    """Presentation-layer twin of the reference's stringified stats
    (``{:.2}`` formatting baked into its JSON — models/response.rs:23-80).
    Kept separate so the engine stays numeric internally."""
    import copy

    out = copy.deepcopy(insights)
    for stats in out["column_statistics"]:
        for k in NUMERIC_STATS:
            if k in stats and stats[k] is not None:
                stats[k] = f"{stats[k]:.2f}"
    if "correlations" in out:
        out["correlations"] = {
            k: None if v is None else round(v, 4)
            for k, v in out["correlations"].items()
        }
    return out
