"""NL-query translation (control plane — SURVEY.md §2.5 N1-N3).

Two translators produce the same StructuredQuery IR:

- :func:`rule_based_translate` — the reference's keyword matcher
  (``query_translator.rs:156-213``): "average"/"mean" -> Mean, "sum" -> Sum,
  "count" -> Count, anything else -> Describe. The reference always targets
  the FIRST column of the dataset; we first look for a column actually named
  in the query text and fall back to the first *numeric* column (documented
  improvement — targeting a string column with mean() is never right).
- :func:`parse_llm_response` — parses an LLM's JSON into the IR and validates
  it against the dataset schema. The reference's version is a stub that
  discards the LLM output and hard-codes Describe
  (``query_translator.rs:145-153``); this is the real implementation. The
  LLM call itself stays outside the engine (driver-side, non-deterministic,
  no correctness weight).
"""

from __future__ import annotations

import json
import re
from typing import Any

from g_data_pipeline_spark.ir import ColumnOperation, QueryIntent, StructuredQuery

_AGG_KEYWORDS = (
    ("mean", ("average", "mean", "avg")),
    ("sum", ("sum", "total")),
    ("count", ("count", "how many", "number of")),
)


def _find_named_column(text: str, columns: list[str]) -> str | None:
    lowered = text.lower()
    # Longest column names first so "order total price" prefers o_totalprice.
    for col in sorted(columns, key=len, reverse=True):
        pattern = re.escape(col.lower().replace("_", " "))
        if col.lower() in lowered or re.search(pattern, lowered):
            return col
    return None


_FILTER_RE = re.compile(
    r"\b(?:where|with)\s+([\w ]+?)\s*(>=|<=|>|<|=|is)\s*([\w.\-]+)"
)


def _extract_filters(text: str, columns: list[str]) -> list[ColumnOperation]:
    """Parse simple comparison phrases ('where age > 30', 'with status =
    active') into filter ops — a capability the reference's keyword
    translator lacks entirely (its only filters come from the LLM path,
    whose parser is a stub)."""
    ops = []
    for m in _FILTER_RE.finditer(text.lower()):
        col = _find_named_column(m.group(1), columns)
        if col is None:
            continue
        operator = "=" if m.group(2) == "is" else m.group(2)
        ops.append(
            ColumnOperation(
                type="filter", column=col, operator=operator, value=m.group(3)
            )
        )
    return ops


def rule_based_translate(
    query_text: str,
    columns: list[str],
    numeric_columns: list[str] | None = None,
    history: list[str] | None = None,
) -> StructuredQuery:
    """N2: keyword rules over the lowercased query (query_translator.rs:161).

    ``history`` (prior turns' query texts, oldest first) makes follow-ups
    resolve: when the current query names no column ("and the sum?"), the
    most recent prior turn that named one supplies the target — the
    conversation-context behavior of the reference's translation prompt
    (query_translator.rs:109-142), done with rules instead of a model."""
    lowered = query_text.lower()
    filters = _extract_filters(query_text, columns)
    # "... by <col>" / "per <col>" names the grouping column
    group_col = None
    by_match = re.search(r"\b(?:by|per|each)\b(.*)$", lowered)
    if by_match:
        group_col = _find_named_column(by_match.group(1), columns)
    value_text = lowered[: by_match.start()] if by_match else query_text
    named = _find_named_column(value_text, columns)
    if named is None and history:
        for prior in reversed(history):
            named = _find_named_column(prior, columns)
            if named is not None:
                break
    # Sort / top-k phrases -> SORT intent. Precedence: an EXPLICIT sort
    # verb ("sort", "order by", "rank by", "top 5") outranks aggregate
    # keywords (so "sort by total price" is not hijacked by "total"->sum),
    # but weak sort words ("highest", "lowest", bare "rank") never outrank
    # an aggregate verb ("average revenue per order" stays a mean, even
    # though questions often contain "order"/"highest" as nouns).
    strong_sort = re.search(
        r"\bsort\b|\b(?:order|rank)\s+by\b|\b(?:top|first)\s+\d+", lowered
    )
    weak_sort = re.search(
        r"\b(rank|highest|largest|lowest|smallest|ascending|descending)\b",
        lowered,
    )
    has_agg_kw = any(
        k in lowered for _, kws in _AGG_KEYWORDS for k in kws
    )
    if strong_sort or (weak_sort and not has_agg_kw):
        target = named or (numeric_columns[0] if numeric_columns else None)
        if target is not None:
            ascending = bool(
                re.search(r"\b(lowest|smallest|ascending|asc)\b", lowered)
            )
            sort_ops: list[ColumnOperation] = [
                ColumnOperation(type="sort", column=target, ascending=ascending)
            ]
            top_n = re.search(r"\b(?:top|first)\s+(\d+)", lowered)
            if top_n:
                sort_ops.append(
                    ColumnOperation(
                        type="limit", column=target, n=int(top_n.group(1))
                    )
                )
            return StructuredQuery(
                intent=QueryIntent.SORT, operations=filters + sort_ops
            )
    for op_type, keywords in _AGG_KEYWORDS:
        if any(k in lowered for k in keywords):
            if op_type in ("mean", "sum"):
                target = named or (numeric_columns[0] if numeric_columns else None)
            else:
                target = named or (columns[0] if columns else None)
            if target is None:
                break
            if op_type == "count" and group_col:
                ops = [ColumnOperation(type="group_by_count", column=group_col)]
            elif op_type == "count" and by_match:
                ops = [ColumnOperation(type="group_by_count", column=target)]
            else:
                ops = [ColumnOperation(type=op_type, column=target, by=group_col)]
            return StructuredQuery(
                intent=QueryIntent.AGGREGATE, operations=filters + ops
            )
    if any(k in lowered for k in ("chart", "plot", "visualiz", "graph")):
        return StructuredQuery(
            intent=QueryIntent.VISUALIZE, columns=[], operations=filters
        )
    return StructuredQuery(
        intent=QueryIntent.DESCRIBE, columns=[], operations=filters
    )


def parse_llm_response(payload: str, columns: list[str]) -> StructuredQuery:
    """N3, implemented for real: LLM JSON -> validated IR.

    Tolerates markdown fences and surrounding prose; raises ValueError on
    anything that doesn't validate against the dataset columns."""
    text = payload.strip()
    fence = re.search(r"```(?:json)?\s*(.*?)```", text, re.DOTALL)
    if fence:
        text = fence.group(1).strip()
    start = text.find("{")
    end = text.rfind("}")
    if start == -1 or end == -1:
        raise ValueError("no JSON object in LLM response")
    obj: dict[str, Any] = json.loads(text[start : end + 1])
    sq = StructuredQuery.from_json(obj)
    sq.validate(available_columns=columns)
    return sq
