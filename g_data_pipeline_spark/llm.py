"""Pluggable LLM client seam (SURVEY.md §2.5 N3/N4).

The reference calls a hosted model for query translation and insight prose
(``/root/reference/src/services/ai.rs:37-336``). Those calls are
non-deterministic and carry no correctness weight (SURVEY §2.5), so the
engine keeps them behind this interface:

- :class:`LLMClient` — the contract: ``translate`` returns the model's raw
  text (expected to contain a StructuredQuery JSON object; parsed/validated
  by :func:`g_data_pipeline_spark.nl.parse_llm_response`), ``summarize``
  returns prose for a result set.
- :class:`FakeLLMClient` — deterministic canned-response implementation so
  the full translate -> compile -> respond lifecycle runs end-to-end in
  tests with zero network and stable outputs.

A production client (OpenAI/Anthropic/local model) implements the same two
methods; nothing else in the service changes.
"""

from __future__ import annotations

import json
from typing import Any, Protocol


class LLMClient(Protocol):
    def translate(
        self, query_text: str, columns: list[str], history: list[str]
    ) -> str:
        """Return model text containing a StructuredQuery JSON object.
        Raise ``ValueError`` when the model cannot translate (callers fall
        back to the rule-based translator)."""
        ...

    def summarize(self, query_text: str, rows: list[dict[str, Any]]) -> str:
        """Return prose describing ``rows`` for the user's query."""
        ...


class FakeLLMClient:
    """Canned, deterministic LLM. ``translations`` maps a query substring
    (matched case-insensitively, first match in insertion order wins) to the
    IR dict/JSON the "model" answers with — wrapped in a markdown fence the
    way real models answer, so the fence-stripping parser path is exercised.
    Unmatched queries raise ValueError (-> rule-based fallback)."""

    def __init__(
        self, translations: dict[str, dict[str, Any] | str] | None = None
    ):
        self.translations = translations or {}
        self.calls: list[tuple[str, tuple[str, ...]]] = []  # (method, args) log

    def translate(
        self, query_text: str, columns: list[str], history: list[str]
    ) -> str:
        self.calls.append(("translate", (query_text, *history)))
        lowered = query_text.lower()
        for needle, ir in self.translations.items():
            if needle.lower() in lowered:
                body = ir if isinstance(ir, str) else json.dumps(ir)
                return f"Sure — here is the structured query:\n```json\n{body}\n```"
        raise ValueError(f"fake LLM has no canned translation for {query_text!r}")

    def summarize(self, query_text: str, rows: list[dict[str, Any]]) -> str:
        self.calls.append(("summarize", (query_text,)))
        if not rows:
            return "The query returned no data."
        cols = ", ".join(sorted(rows[0]))
        return (
            f"Deterministic summary: {len(rows)} row(s) with columns {cols} "
            f"for question {query_text!r}."
        )
