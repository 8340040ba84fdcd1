"""Declarative data-quality expectations (Deequ/Great-Expectations-shaped,
pure DataFrame ops): each rule compiles to ONE conditional-count expression,
all rules over the same table run in a SINGLE map-side-combined aggregate
pass, and cross-table rules (uniqueness, referential integrity) compile to
the keyed aggregate / anti-join shape that survives 100 TB.

The reference has no validation surface at all (CSV rows are trusted as
parsed — ``src/services/query_translator.rs`` SURVEY.md §2.1); this is the
quality gate a production re-landing of it needs before any downstream
query runs.

Report contract: every check yields one row ``(rule, n_checked,
n_violations)`` — integers only, so the report is oracle-gatable
bit-for-bit.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """A named row-level predicate: a row violates the rule when
    ``violation`` evaluates true (nulls count as configured by the
    builder, not silently skipped)."""

    name: str
    violation: Column


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNull())


def in_range(col: str, lo: float, hi: float) -> Rule:
    """Closed-interval range check; NULL passes (pair with not_null)."""
    c = F.col(col)
    return Rule(
        f"in_range({col},{lo},{hi})",
        c.isNotNull() & ((c < F.lit(lo)) | (c > F.lit(hi))),
    )


def in_set(col: str, values: list[str]) -> Rule:
    c = F.col(col)
    return Rule(
        f"in_set({col})",
        c.isNotNull() & ~c.isin(values),
    )


def matches(col: str, pattern: str, label: str | None = None) -> Rule:
    """Regex full-match check; NULL passes."""
    c = F.col(col)
    return Rule(
        label or f"matches({col})",
        c.isNotNull() & ~c.rlike(pattern),
    )


def row_level_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """All row-level rules in ONE aggregate scan: n_checked is the table
    row count, each rule's violation count is a conditional sum — a single
    shuffle-free-until-final-combine pass regardless of rule count."""
    agg = df.agg(
        F.count(F.lit(1)).alias("__n"),
        *[
            F.count_if(r.violation).alias(f"__v{i}")
            for i, r in enumerate(rules)
        ],
    )
    # Pivot the 1-row aggregate into (rule, n_checked, n_violations) rows
    # driver-free: stack() on the single-row result (tiny, no shuffle of
    # the fact table). Rule names are spliced into SQL — escape backslashes
    # FIRST, then quotes (matches() accepts arbitrary labels, and a regex
    # echoed into a label would otherwise corrupt the string literal).
    escaped = [
        r.name.replace("\\", "\\\\").replace("'", "\\'") for r in rules
    ]
    pairs = ", ".join(f"'{name}', __v{i}" for i, name in enumerate(escaped))
    return agg.selectExpr(
        f"stack({len(rules)}, {pairs}) AS (rule, n_violations)", "__n"
    ).select(
        "rule",
        F.col("__n").cast("bigint").alias("n_checked"),
        F.col("n_violations").cast("bigint").alias("n_violations"),
    )


def observed_row_level(df: DataFrame, rules: list[Rule]):
    """ONE-PASS variant of :func:`row_level_report`: attach the same fused
    conditional-count metrics to ``df`` as a Spark ``Observation`` and
    return ``(df_passthrough, observation)``. The caller runs whatever
    action it was going to run anyway (typically the curated-output WRITE)
    and reads the report from the observation afterwards — the quality
    gate costs ZERO extra scans of the fact table, which at 100 TB is the
    difference between "free" and "a second full pass".

    Semantics: metrics cover exactly the rows the action processed (a full
    write sees every row; a ``take(n)`` would see a prefix — pair with
    full-table actions). ``observation_report`` blocks until the action
    has completed."""
    from pyspark.sql import Observation

    obs = Observation()
    metrics = [F.count(F.lit(1)).alias("__n")] + [
        F.count_if(r.violation).alias(f"__v{i}") for i, r in enumerate(rules)
    ]
    return df.observe(obs, *metrics), obs


def observation_report(obs, rules: list[Rule]) -> list[tuple[str, int, int]]:
    """(rule, n_checked, n_violations) rows from a completed
    :func:`observed_row_level` action — same contract as
    :func:`row_level_report` (pinned by parity test)."""
    got = obs.get
    n = int(got["__n"])
    return [(r.name, n, int(got[f"__v{i}"])) for i, r in enumerate(rules)]


def unique_report(df: DataFrame, cols: list[str]) -> DataFrame:
    """Uniqueness: rows minus distinct keys, via a keyed count aggregate
    (one shuffle on the key — never a driver-side distinct).

    NULL keys are EXCLUDED from the check (SQL COUNT(DISTINCT) semantics —
    Spark's groupBy would otherwise count a NULL group as one distinct key
    and diverge from a ``COUNT(*) - COUNT(DISTINCT col)`` oracle); pair
    with :func:`not_null` to flag the NULLs themselves. ``n_checked`` is
    therefore the non-NULL row count."""
    label = f"unique({','.join(cols)})"
    non_null = df
    for c in cols:
        non_null = non_null.filter(F.col(c).isNotNull())
    per_key = non_null.groupBy(*[F.col(c) for c in cols]).agg(
        F.count(F.lit(1)).alias("__n")
    )
    return per_key.agg(
        F.sum("__n").cast("bigint").alias("n_checked"),
        (F.sum("__n") - F.count(F.lit(1))).cast("bigint").alias("n_violations"),
    ).select(F.lit(label).alias("rule"), "n_checked", "n_violations")


def foreign_key_report(
    child: DataFrame, child_col: str, parent: DataFrame, parent_col: str
) -> DataFrame:
    """Referential integrity: child keys with no parent, via left-anti
    join (Catalyst broadcasts the parent when its stats allow, shuffles
    otherwise — both are the correct shape; NULL child keys are orphans
    only if not excluded upstream, here they are counted by the anti join
    semantics: NULL never matches, so they surface as violations)."""
    label = f"fk({child_col}->{parent_col})"
    n_checked = child.agg(F.count(F.lit(1)).alias("__n"))
    pkeys = parent.select(F.col(parent_col).alias("__pk")).distinct()
    orphans = child.join(
        pkeys, child[child_col] == F.col("__pk"), "left_anti"
    ).agg(F.count(F.lit(1)).alias("__v"))
    return n_checked.crossJoin(orphans).select(
        F.lit(label).alias("rule"),
        F.col("__n").cast("bigint").alias("n_checked"),
        F.col("__v").cast("bigint").alias("n_violations"),
    )


def expectations_report(parts: list[DataFrame]) -> DataFrame:
    """Union the per-family reports into the final (rule, n_checked,
    n_violations) table."""
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def validated_land(
    df: DataFrame,
    rules: list[Rule],
    good_path: str,
    quarantine_path: str,
) -> tuple[int, int]:
    """Validated landing: rows passing EVERY rule land at ``good_path``;
    violators land at ``quarantine_path`` with a ``__violated`` column
    naming the rules they broke (replayable after the upstream fix — drop
    the column and re-land).

    Execution shape: ONE annotation projection computes the violation
    array, then each side filters it — the classic fork. The input is
    localCheckpointed before the fork so the two writes scan the source
    ONCE between them, not once each (same pattern as
    incremental_dedup_stream's two-writer batch). Row counts come from
    the writes' own frames via ``Observation`` — zero extra passes.

    Quarantine is append-mode: successive batches accumulate, preserving
    the audit trail; good output is append too (the caller owns
    partitioning/exactly-once concerns — compose with the streaming sinks
    for that).
    """
    from pyspark.sql import Observation

    annotated = df.withColumn(
        "__violated",
        F.filter(
            F.array(
                *[
                    F.when(r.violation, F.lit(r.name)).otherwise(F.lit(None))
                    for r in rules
                ]
            ),
            lambda x: x.isNotNull(),
        ),
    ).localCheckpoint(eager=True)

    good_obs, quar_obs = Observation(), Observation()
    good = annotated.filter(F.size("__violated") == 0).drop("__violated")
    (
        good.observe(good_obs, F.count(F.lit(1)).alias("n"))
        .write.mode("append")
        .parquet(good_path)
    )
    quarantined = annotated.filter(F.size("__violated") > 0).withColumn(
        "__violated", F.concat_ws(";", "__violated")
    )
    (
        quarantined.observe(quar_obs, F.count(F.lit(1)).alias("n"))
        .write.mode("append")
        .parquet(quarantine_path)
    )
    return int(good_obs.get["n"]), int(quar_obs.get["n"])
