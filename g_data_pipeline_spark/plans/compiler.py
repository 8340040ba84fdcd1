"""StructuredQuery IR -> one lazy DataFrame chain.

The reference compiles and ``collect()``s each operation separately, so its
optimizer never sees the whole query (``/root/reference/src/services/
query_translator.rs:309-465``; SURVEY.md §3.3/§4.1). Here the IR is folded
into a single DataFrame expression chain and returned *unevaluated* — Catalyst
gets the full plan, so filter pushdown into the parquet scan, column pruning,
and predicate fusion happen automatically. At 100 TB this is the difference
between scanning the table once with pushed predicates and materializing an
intermediate per operation.

Semantics pinned to the reference (SURVEY.md §2.2, §4.3):

- R1  projection    : applied for Filter/Sort/Visualize intents when
                      ``query.columns`` is non-empty.
- R2/R4 (in)equality: the IR value is a string; the literal is cast to the
                      column's type so ``numeric_col == "10"`` behaves like
                      a typed comparison (the reference compares raw strings
                      and Polars errors on type mismatch — we adopt typed).
- R3  ordering      : value parsed as float; an unparseable value SKIPS the
                      operation with a warning, matching ``query_translator
                      .rs:365-404``.
- R5  conjunction   : multiple filter ops AND together.
- R6-R8 aggregates  : whole-column mean/sum/count aliased
                      ``mean_{col}`` / ``sum_{col}`` / ``count_{col}``;
                      count is SQL COUNT(col) — non-null (SURVEY.md §4.3.2).
- R9  group_by_count: ``groupBy(col).agg(count(col) as count_{col})``;
                      NULL keys form their own group (count 0 for them under
                      COUNT(col) semantics).
- R10 sort          : single column, ascending flag; unstable sort is
                      acceptable (reference uses maintain_order=false).
- R11 caps          : Describe -> 10 rows, Visualize -> 100 rows.

Sequential composition over the running result is preserved: each operation
transforms the output of the previous one, so ``[group_by_count(a), mean(b)]``
applies mean to the grouped counts — exactly the reference's (odd) contract.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from g_data_pipeline_spark.functions.deterministic import davg, dsum
from g_data_pipeline_spark.ir import (
    DESCRIBE_ROW_CAP,
    VISUALIZE_ROW_CAP,
    ColumnOperation,
    QueryIntent,
    StructuredQuery,
)

logger = logging.getLogger(__name__)

_ORDERING_OPS = {">", "<", ">=", "<="}
_EQUALITY_OPS = {"=", "==", "!=", "<>"}


def _typed_literal(df: DataFrame, column: str, value: str) -> Column:
    """Cast the IR's string literal to the column's type (SURVEY.md §4.3.4)."""
    dtype = dict((f.name, f.dataType) for f in df.schema.fields).get(column)
    if dtype is None:
        return F.lit(value)
    if isinstance(dtype, T.StringType):
        return F.lit(value)
    return F.lit(value).cast(dtype)


def _filter_condition(df: DataFrame, op: ColumnOperation) -> Column | None:
    """Compile one filter op; returns None if the op must be skipped."""
    col = F.col(op.column)
    assert op.value is not None
    if op.operator in _ORDERING_OPS:
        try:
            num = float(op.value)
        except (TypeError, ValueError):
            # Reference behavior: log a warning and skip the operation
            # (query_translator.rs:365-404).
            logger.warning(
                "skipping filter %s %s %r: value is not numeric",
                op.column,
                op.operator,
                op.value,
            )
            return None
        if op.operator == ">":
            return col > num
        if op.operator == "<":
            return col < num
        if op.operator == ">=":
            return col >= num
        return col <= num
    lit = _typed_literal(df, op.column, op.value)
    if op.operator in ("=", "=="):
        return col == lit
    return col != lit  # "!=" / "<>"


def _apply_operation(
    df: DataFrame, op: ColumnOperation, deterministic_floats: bool = False
) -> DataFrame:
    if op.type == "filter":
        cond = _filter_condition(df, op)
        return df if cond is None else df.filter(cond)
    if op.type in ("mean", "sum", "count"):
        if op.type == "mean":
            agg = davg(op.column) if deterministic_floats else F.mean(op.column)
        elif op.type == "sum":
            agg = dsum(op.column) if deterministic_floats else F.sum(op.column)
        else:
            # SQL COUNT(col): non-null only (SURVEY.md §4.3.2).
            agg = F.count(op.column)
        aliased = agg.alias(f"{op.type}_{op.column}")
        if op.by:
            # grouped aggregate (IR extension — ir.ColumnOperation.by)
            return df.groupBy(op.by).agg(aliased)
        return df.select(aliased)
    if op.type == "group_by_count":
        return df.groupBy(op.column).agg(
            F.count(op.column).alias(f"count_{op.column}")
        )
    if op.type == "sort":
        order = F.col(op.column).asc() if op.ascending else F.col(op.column).desc()
        return df.orderBy(order)
    if op.type == "limit":
        assert op.n is not None
        return df.limit(op.n)
    raise ValueError(f"unknown operation type {op.type!r}")


def compile_query(
    df: DataFrame, query: StructuredQuery, deterministic_floats: bool = False
) -> DataFrame:
    """Compile the IR against ``df`` into one unevaluated DataFrame.

    Mirrors ``apply_operations`` (``query_translator.rs:309-465``) but lazily:
    no action is triggered here, so Catalyst optimizes the whole chain.

    ``deterministic_floats`` switches mean/sum to the decimal-accumulator
    numeric-fidelity mode (see functions.deterministic) — used by the
    oracle-gated query surface; default is the fast double path.
    """
    query.validate()
    result = df

    # Filters first (in IR order — AND semantics), exactly as the reference's
    # sequential loop does for Filter/Sort/Visualize intents.
    for op in query.operations:
        if op.type == "filter":
            result = _apply_operation(result, op)

    if query.intent == QueryIntent.AGGREGATE:
        for op in query.operations:
            if op.type in ("mean", "sum", "count", "group_by_count"):
                result = _apply_operation(result, op, deterministic_floats)
        return result

    # Non-aggregate intents: projection applies when columns were requested
    # (query_translator.rs:418-425, 437-445, 449-457).
    if query.columns:
        result = result.select(*query.columns)

    for op in query.operations:
        if op.type == "sort":
            result = _apply_operation(result, op)

    for op in query.operations:
        if op.type == "limit":
            result = _apply_operation(result, op)

    if query.intent == QueryIntent.DESCRIBE:
        result = result.limit(DESCRIBE_ROW_CAP)
    elif query.intent == QueryIntent.VISUALIZE:
        result = result.limit(VISUALIZE_ROW_CAP)
    return result
