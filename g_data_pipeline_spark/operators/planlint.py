"""Physical-plan linting as a public API — the `.explain("formatted")`
checks this repo pins in tests (no cartesian products, no row-at-a-time
Python, bounded shuffles, filters reaching the scan), packaged so USERS
can hold their own queries to the same 100 TB hygiene bar:

    from g_data_pipeline_spark.operators.planlint import lint, assert_clean
    assert_clean(my_df)                      # raises listing violations
    findings = lint(my_df, max_shuffles=2)   # or inspect them

No reference counterpart (the reference has no query planner to lint —
SURVEY.md §1); this is Spark-first tooling born from this repo's own
plan-pin test suite (tests/test_plans.py, tests/test_plan_sweep.py both
delegate to these helpers).

Findings are STRUCTURAL ONLY — derived from the formatted explain
string, so linting never executes the plan (safe on any size input; see
the eager-entry caveat in queries.py for the one registry family whose
BUILD is eager)."""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

#: plan nodes that evaluate Python row-at-a-time — never acceptable
ROW_PYTHON_NODES = ("BatchEvalPython",)

#: Arrow-batched Python nodes — acceptable only where no JVM expression
#: exists (the grouped/multimodal house rule)
ARROW_PYTHON_NODES = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
)


def formatted_plan(df: DataFrame) -> str:
    """The formatted physical plan string (plan-only: does not execute)."""
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )


def op_counts(plan: str) -> dict[str, int]:
    """Operator name -> count by DISTINCT operator id. The formatted
    explain prints every node TWICE (tree + details section) — counting
    substring hits double-counts; node ids de-duplicate."""
    ops = {
        m.group(1): m.group(2)
        for m in re.finditer(r"\((\d+)\) (\w+)", plan)
    }
    out: dict[str, int] = {}
    for name in ops.values():
        out[name] = out.get(name, 0) + 1
    return out


def plan_report(df: DataFrame) -> dict:
    """Structural summary of a DataFrame's physical plan: the facts the
    lint rules (and this repo's plan-pin tests) decide on."""
    plan = formatted_plan(df)
    counts = op_counts(plan)
    lines = plan.splitlines()
    return {
        "op_counts": counts,
        "shuffles": counts.get("Exchange", 0),
        "cartesian_products": counts.get("CartesianProduct", 0),
        "broadcast_joins": counts.get("BroadcastHashJoin", 0)
        + counts.get("BroadcastNestedLoopJoin", 0),
        "sortmerge_joins": counts.get("SortMergeJoin", 0),
        "row_python_nodes": [
            n for n in ROW_PYTHON_NODES if counts.get(n, 0)
        ],
        "arrow_python_nodes": [
            n for n in ARROW_PYTHON_NODES if counts.get(n, 0)
        ],
        "pushed_filters": [
            l.split("PushedFilters:", 1)[1].strip()
            for l in lines
            if "PushedFilters" in l
        ],
        "partition_filters": [
            l.split("PartitionFilters:", 1)[1].strip()
            for l in lines
            if "PartitionFilters" in l
        ],
        "read_schemas": [
            l.split("ReadSchema:", 1)[1].strip()
            for l in lines
            if "ReadSchema" in l
        ],
        "codegen_spans": counts.get("WholeStageCodegen", 0),
        # windowspecdefinition(...) whose FIRST element is already a sort
        # order (col ASC/DESC ...) has an EMPTY partition spec: the window
        # serializes its whole input onto one task. Fine over a bounded
        # frame (bucket offsets, per-day sketches, #sources rows); a
        # scale-killer over anything data-sized.
        "global_windows": sorted(
            {
                m.group(1)
                for m in re.finditer(
                    r"windowspecdefinition\((\S+) (?:ASC|DESC)", plan
                )
            }
        ),
    }


def lint(
    df: DataFrame,
    *,
    allow_arrow: bool = False,
    allow_global_window: bool = False,
    max_shuffles: int | None = None,
    forbid_sortmerge: bool = False,
) -> list[str]:
    """Return human-readable findings for plan shapes that do not
    survive a 100× scale-up. Empty list == clean.

    - CartesianProduct: always flagged (O(n²) candidate volume).
    - BatchEvalPython: always flagged (row-at-a-time Python).
    - Arrow pandas nodes: flagged unless ``allow_arrow`` (the house rule:
      only where no JVM expression can express the kernel).
    - ``max_shuffles``: flag plans exchanging more than the stated budget
      (a shuffle per join/agg is expected; N re-shuffles of the same
      data usually means a missing broadcast or reusable partitioning).
    - Unpartitioned windows: flagged unless ``allow_global_window`` —
      an empty partition spec serializes the window's input onto ONE
      task; allow only when the input is provably bounded (an aggregate
      over buckets/days/sources, or a WindowGroupLimit-pruned rank).
    - ``forbid_sortmerge``: flag SortMergeJoin where every join side is
      known-small (dim tables that should have broadcast)."""
    report = plan_report(df)
    findings: list[str] = []
    if report["cartesian_products"]:
        findings.append(
            f"{report['cartesian_products']} CartesianProduct node(s): "
            "O(n^2) pair volume — key the join (bucket/band/cell) instead"
        )
    for n in report["row_python_nodes"]:
        findings.append(
            f"{n}: row-at-a-time Python in the plan — use built-in "
            "expressions, or an Arrow-batched pandas kernel if none exists"
        )
    if not allow_arrow:
        for n in report["arrow_python_nodes"]:
            findings.append(
                f"{n}: Python (Arrow) eval node — acceptable only when no "
                "JVM expression exists; pass allow_arrow=True to accept"
            )
    # "__bkt*" leading columns are the two-phase kernels' offset windows
    # (operators/windows.py): they run over per-bucket totals — bounded
    # by the order-key span, not the data — so they are exempt.
    unbounded_gw = [
        c for c in report["global_windows"] if not c.startswith("__bkt")
    ]
    if not allow_global_window and unbounded_gw:
        findings.append(
            "unpartitioned Window over "
            f"{unbounded_gw}: single-task sort of the whole "
            "input — bucket the window (operators/windows.py kernels) or "
            "pass allow_global_window=True for a provably bounded frame"
        )
    if max_shuffles is not None and report["shuffles"] > max_shuffles:
        findings.append(
            f"{report['shuffles']} Exchange nodes > budget {max_shuffles}: "
            "look for a missing broadcast or a reusable partitioning"
        )
    if forbid_sortmerge and report["sortmerge_joins"]:
        findings.append(
            f"{report['sortmerge_joins']} SortMergeJoin node(s) where a "
            "broadcast was expected — check join-side size estimates"
        )
    return findings


def assert_clean(df: DataFrame, **kwargs) -> None:
    """Raise ``AssertionError`` listing every lint finding (none: no-op)."""
    findings = lint(df, **kwargs)
    if findings:
        raise AssertionError(
            "plan lint failed:\n" + "\n".join(f"- {f}" for f in findings)
        )
