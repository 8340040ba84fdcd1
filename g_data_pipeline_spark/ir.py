"""The structured query IR.

Mirrors the reference's ``StructuredQuery`` JSON shape
(``/root/reference/src/services/query_translator.rs:14-53``):

    {"intent": "aggregate|filter|sort|describe|visualize",
     "columns": ["a", "b"],
     "operations": [{"type": "filter", "column": "x", "operator": ">", "value": "10"},
                    {"type": "mean", "column": "y"},
                    {"type": "sort", "column": "y", "ascending": false}, ...]}

This module is pure data modelling + validation; compilation to a Spark plan
lives in :mod:`g_data_pipeline_spark.plans.compiler`.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from enum import Enum
from typing import Any


class QueryIntent(str, Enum):
    """Intent taxonomy (reference ``query_translator.rs:14-25``, N1)."""

    AGGREGATE = "aggregate"
    FILTER = "filter"
    SORT = "sort"
    DESCRIBE = "describe"
    VISUALIZE = "visualize"


# Row caps by intent (reference ``query_translator.rs:313-316, 460``, R11).
DESCRIBE_ROW_CAP = 10
VISUALIZE_ROW_CAP = 100

FILTER_OPERATORS = ("=", "==", "!=", "<>", ">", "<", ">=", "<=")
OP_TYPES = ("filter", "mean", "sum", "count", "group_by_count", "sort", "limit")


@dataclass(frozen=True)
class ColumnOperation:
    """One operation of the reference's ``ColumnOperation`` enum
    (``query_translator.rs:29-42``), extended with ``by`` — an optional
    grouping column for the aggregate ops (the reference can only express
    group-by-COUNT; grouped mean/sum are the natural completion and what
    NL queries like "average price by segment" need)."""

    type: str  # one of OP_TYPES
    column: str
    operator: str | None = None  # filter only
    value: str | None = None  # filter only (always a string in the IR)
    ascending: bool = True  # sort only
    n: int | None = None  # limit only
    by: str | None = None  # aggregates only: grouping column

    def validate(self) -> None:
        if self.type not in OP_TYPES:
            raise ValueError(f"unknown operation type {self.type!r}")
        if self.type == "filter":
            if self.operator not in FILTER_OPERATORS:
                raise ValueError(f"unknown filter operator {self.operator!r}")
            if self.value is None:
                raise ValueError("filter requires a value")
        if self.type == "limit" and (self.n is None or self.n < 0):
            raise ValueError("limit requires n >= 0")


@dataclass
class StructuredQuery:
    """The whole-query IR (reference ``query_translator.rs:45-53``)."""

    intent: QueryIntent = QueryIntent.DESCRIBE
    columns: list[str] = field(default_factory=list)
    operations: list[ColumnOperation] = field(default_factory=list)

    def validate(self, available_columns: list[str] | None = None) -> None:
        for op in self.operations:
            op.validate()
        if available_columns is not None:
            known = set(available_columns)
            for c in self.columns:
                if c not in known:
                    raise ValueError(f"unknown column {c!r}")
            for op in self.operations:
                if op.column and op.column not in known:
                    raise ValueError(f"unknown column {op.column!r} in {op.type}")
                if op.by is not None and op.by not in known:
                    raise ValueError(f"unknown grouping column {op.by!r} in {op.type}")

    @classmethod
    def from_json(cls, payload: str | dict[str, Any]) -> StructuredQuery:
        """Parse the reference's JSON IR (including what its LLM translator
        emits but never parses — SURVEY.md §2.5 N3 calls out the stub; here
        parsing is implemented for real)."""
        obj = json.loads(payload) if isinstance(payload, str) else payload
        intent = QueryIntent(str(obj.get("intent", "describe")).lower())
        ops = []
        for raw in obj.get("operations", []):
            ops.append(
                ColumnOperation(
                    type=str(raw.get("type", "")).lower(),
                    column=raw.get("column", ""),
                    operator=raw.get("operator"),
                    value=None if raw.get("value") is None else str(raw["value"]),
                    ascending=bool(raw.get("ascending", True)),
                    n=raw.get("n"),
                    by=raw.get("by"),
                )
            )
        q = cls(intent=intent, columns=list(obj.get("columns", [])), operations=ops)
        q.validate()
        return q
