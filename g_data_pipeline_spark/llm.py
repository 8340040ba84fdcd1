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
import time
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


class LLMUnavailable(RuntimeError):
    """The model could not be used. Base class covers transient transport
    failure (network error, 5xx, timeout — retrying later may succeed);
    see :class:`LLMRequestRejected` for the persistent 4xx case."""


class LLMRequestRejected(LLMUnavailable):
    """The server answered with a non-retryable 4xx (bad credentials, bad
    request). Retrying will NOT help — this is a configuration error, not
    an outage. Subclasses LLMUnavailable so callers that only degrade
    gracefully keep working, while monitoring can tell the cases apart."""


class HttpLLMClient:
    """OpenAI-compatible chat-completions client over stdlib ``urllib`` —
    the production implementation of the :class:`LLMClient` seam, with the
    reference's operational semantics (``/root/reference/src/services/
    ai.rs:96`` 30 s summary / 15 s translation timeouts; ``processor.rs:
    128,155,176-206`` two attempts then canned fallback):

    - per-attempt socket timeout (``timeout_s``),
    - ``max_attempts`` tries, retrying on network errors, timeouts, HTTP
      5xx and 429 — NOT on other 4xx (a bad request stays bad). 5xx/network
      retries wait nothing (matching the reference's immediate retry); 429
      is a rate limit, where an instant retry is near-guaranteed to fail
      again, so the client honors the server's ``Retry-After`` seconds when
      present (capped at ``rate_limit_wait_cap_s``) and otherwise pauses
      ``rate_limit_wait_s``,
    - ``translate`` raises ``ValueError`` when the transport is down or the
      model returns unusable output, which routes callers onto the
      rule-based translator (service.py's documented fallback),
    - ``summarize`` degrades to the same canned fallback prose shape the
      reference uses rather than failing the profiling job.

    Point ``base_url`` at any chat-completions server (hosted or local);
    there is deliberately no SDK dependency. Deterministic tests drive it
    against a loopback ``http.server`` (tests/test_llm_http.py); nothing
    here requires external network access.
    """

    def __init__(
        self,
        base_url: str,
        api_key: str = "",
        model: str = "gpt-4o",
        timeout_s: float = 15.0,
        max_attempts: int = 2,
        rate_limit_wait_s: float = 0.5,
        rate_limit_wait_cap_s: float = 10.0,
    ):
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self.model = model
        self.timeout_s = timeout_s
        self.max_attempts = max_attempts
        self.rate_limit_wait_s = rate_limit_wait_s
        self.rate_limit_wait_cap_s = rate_limit_wait_cap_s

    # -- transport ---------------------------------------------------------

    def _chat(self, messages: list[dict[str, str]]) -> str:
        import urllib.error
        import urllib.request

        body = json.dumps(
            {"model": self.model, "messages": messages}
        ).encode("utf-8")
        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = f"Bearer {self.api_key}"
        last_err: Exception | None = None
        for attempt in range(self.max_attempts):
            req = urllib.request.Request(
                f"{self.base_url}/chat/completions", data=body, headers=headers
            )
            try:
                with urllib.request.urlopen(req, timeout=self.timeout_s) as resp:
                    payload = json.loads(resp.read().decode("utf-8"))
                return payload["choices"][0]["message"]["content"]
            except urllib.error.HTTPError as exc:
                if exc.code < 500 and exc.code != 429:
                    raise LLMRequestRejected(
                        f"HTTP {exc.code}: {exc.reason}"
                    ) from exc
                last_err = exc  # 5xx / 429: retry
                if exc.code == 429 and attempt + 1 < self.max_attempts:
                    # Rate limit: retrying instantly would fail again.
                    try:
                        wait = float(exc.headers.get("Retry-After"))
                    except (TypeError, ValueError):
                        wait = self.rate_limit_wait_s
                    time.sleep(min(max(wait, 0.0), self.rate_limit_wait_cap_s))
            except (urllib.error.URLError, TimeoutError, OSError) as exc:
                last_err = exc
            except (KeyError, IndexError, ValueError) as exc:
                # 200 with an unusable body — retrying may help (LB flap)
                last_err = exc
        raise LLMUnavailable(
            f"LLM unreachable after {self.max_attempts} attempts: {last_err}"
        ) from last_err

    # -- LLMClient ---------------------------------------------------------

    def translate(
        self, query_text: str, columns: list[str], history: list[str]
    ) -> str:
        prompt = (
            "Translate the user's question about a dataset into a single "
            "StructuredQuery JSON object with keys intent, column, value, "
            "operator. Answer with JSON only.\n"
            f"Columns: {', '.join(columns)}\n"
            + (f"Conversation so far: {' | '.join(history)}\n" if history else "")
            + f"Question: {query_text}"
        )
        try:
            return self._chat(
                [
                    {
                        "role": "system",
                        "content": "You translate questions to structured queries.",
                    },
                    {"role": "user", "content": prompt},
                ]
            )
        except LLMUnavailable as exc:
            # contract: ValueError -> caller falls back to rule-based NL
            raise ValueError(str(exc)) from exc

    def summarize(self, query_text: str, rows: list[dict[str, Any]]) -> str:
        try:
            return self._chat(
                [
                    {
                        "role": "system",
                        "content": (
                            "You are a data analysis assistant. Provide a "
                            "concise, business-focused summary."
                        ),
                    },
                    {
                        "role": "user",
                        "content": (
                            f"Question: {query_text}\n"
                            f"Result rows (JSON): {json.dumps(rows[:50])}"
                        ),
                    },
                ]
            )
        except LLMUnavailable:
            # reference behavior: canned fallback, never fail the job
            if not rows:
                return "The query returned no data."
            return (
                f"Summary unavailable (LLM error); the query "
                f"returned {len(rows)} row(s)."
            )


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
