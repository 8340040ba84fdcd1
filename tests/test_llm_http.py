"""HttpLLMClient transport semantics against a loopback chat-completions
server — timeouts, retry, 4xx-vs-5xx routing, and fallback behavior
(reference parity: 15 s per attempt, 2 attempts, canned fallback —
``/root/reference/src/services/ai.rs:96``, ``processor.rs:128-206``).
No external network: the "model" is an in-process http.server thread.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from g_data_pipeline_spark.llm import HttpLLMClient, LLMUnavailable


class _Script:
    """Mutable behavior script the handler consults per request."""

    def __init__(self):
        # (status, delay_s, text) or (status, delay_s, text, extra_headers)
        self.responses: list[tuple] = []
        self.requests: list[dict] = []

    def next(self) -> tuple[int, float, str, dict]:
        item = self.responses.pop(0) if self.responses else (200, 0.0, "ok")
        status, delay, text = item[:3]
        extra = item[3] if len(item) > 3 else {}
        return status, delay, text, extra


@pytest.fixture()
def llm_server():
    script = _Script()

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):  # noqa: N802 (http.server API)
            n = int(self.headers.get("Content-Length", 0))
            script.requests.append(json.loads(self.rfile.read(n)))
            status, delay, text, extra = script.next()
            if delay:
                time.sleep(delay)
            body = json.dumps(
                {"choices": [{"message": {"content": text}}]}
            ).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            for k, v in extra.items():
                self.send_header(k, v)
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *a):  # silence
            pass

    srv = HTTPServer(("127.0.0.1", 0), Handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_port}", script
    srv.shutdown()
    srv.server_close()


def test_success_first_attempt(llm_server):
    url, script = llm_server
    script.responses = [(200, 0.0, '{"intent": "aggregate"}')]
    c = HttpLLMClient(url, api_key="k", timeout_s=5)
    out = c.translate("average price", ["price"], [])
    assert out == '{"intent": "aggregate"}'
    req = script.requests[0]
    assert req["model"] == "gpt-4o"
    assert any("average price" in m["content"] for m in req["messages"])


def test_retry_on_500_then_success(llm_server):
    url, script = llm_server
    script.responses = [(500, 0.0, "boom"), (200, 0.0, "recovered")]
    c = HttpLLMClient(url, timeout_s=5, max_attempts=2)
    assert c.summarize("q", [{"a": 1}]) == "recovered"
    assert len(script.requests) == 2


def test_no_retry_on_400(llm_server):
    from g_data_pipeline_spark.llm import LLMRequestRejected

    url, script = llm_server
    script.responses = [(400, 0.0, "bad request")]
    c = HttpLLMClient(url, timeout_s=5, max_attempts=2)
    with pytest.raises(ValueError):
        c.translate("q", [], [])
    assert len(script.requests) == 1  # 4xx is not retried
    # and the raw transport error is the distinguishable rejected class
    script.responses = [(401, 0.0, "unauthorized")]
    with pytest.raises(LLMRequestRejected):
        c._chat([{"role": "user", "content": "x"}])


def test_timeout_exhausts_attempts_then_translate_valueerror(llm_server):
    url, script = llm_server
    script.responses = [(200, 1.0, "slow"), (200, 1.0, "slow")]
    c = HttpLLMClient(url, timeout_s=0.2, max_attempts=2)
    t0 = time.monotonic()
    with pytest.raises(ValueError):  # routes caller to rule-based fallback
        c.translate("q", [], [])
    assert time.monotonic() - t0 < 3  # both attempts bounded by timeout


def test_429_waits_before_retry(llm_server):
    """A rate-limit response must NOT be retried instantly (that converts
    429 into a single-attempt failure); default pause applies when the
    server sends no Retry-After."""
    url, script = llm_server
    script.responses = [(429, 0.0, "slow down"), (200, 0.0, "ok now")]
    c = HttpLLMClient(url, timeout_s=5, max_attempts=2, rate_limit_wait_s=0.3)
    t0 = time.monotonic()
    assert c.summarize("q", [{"a": 1}]) == "ok now"
    assert time.monotonic() - t0 >= 0.3
    assert len(script.requests) == 2


def test_429_honors_retry_after_header(llm_server):
    url, script = llm_server
    script.responses = [
        (429, 0.0, "slow down", {"Retry-After": "0.4"}),
        (200, 0.0, "recovered"),
    ]
    c = HttpLLMClient(url, timeout_s=5, max_attempts=2, rate_limit_wait_s=0.0)
    t0 = time.monotonic()
    assert c.summarize("q", [{"a": 1}]) == "recovered"
    assert time.monotonic() - t0 >= 0.4  # server-requested wait, not default
    assert len(script.requests) == 2


def test_summarize_degrades_to_canned_fallback(llm_server):
    url, script = llm_server
    script.responses = [(500, 0.0, ""), (500, 0.0, "")]
    c = HttpLLMClient(url, timeout_s=1, max_attempts=2)
    out = c.summarize("q", [{"a": 1}, {"a": 2}])
    assert "2 row(s)" in out  # canned fallback, job never fails


def test_unreachable_host_raises_llm_unavailable():
    c = HttpLLMClient("http://127.0.0.1:1", timeout_s=0.2, max_attempts=2)
    with pytest.raises(LLMUnavailable):
        c._chat([{"role": "user", "content": "x"}])
