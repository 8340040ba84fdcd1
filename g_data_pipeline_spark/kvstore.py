"""Wire-protocol KV backend for the insights cache (verdict r9 #8).

The reference ships a real network Redis client for its insights cache
(``/root/reference/src/services/redis.rs:26-73``; 24 h TTL at
``src/services/mod.rs:107``) plus an in-memory fake. This repo had the
contract (:class:`~g_data_pipeline_spark.storage.TTLCache`) but no wire
backend; this module closes that seam with a minimal RESP2 client — the
PUBLIC Redis serialization protocol (redis.io/docs/reference/protocol-spec),
speakable by Redis, Valkey, KeyDB, or the in-process fake server the
contract tests run against.

Design notes:

- TTL is enforced SERVER-side (``SET key value PX <ms>``) — the semantics
  match ``TTLCache`` (entry invisible once ``ttl_s`` elapses; read-after-
  expiry behaves as a miss so the service's recompute-on-miss path fires).
- ``pop`` uses ``GETDEL`` (Redis >= 6.2) and transparently falls back to a
  ``GET`` + ``DEL`` pair on servers that don't know it (the fallback is not
  atomic — acceptable for the single-writer insights cache; documented).
- One blocking socket, lazily connected, request/response (no pipelining —
  the cache is a driver-side control-plane object, not a data path).
- Everything here is stdlib ``socket`` — no client library dependency.
"""

from __future__ import annotations

import socket


class RespError(RuntimeError):
    """Server replied with a RESP error (``-ERR ...``)."""


def encode_command(*args: str | bytes) -> bytes:
    """RESP2 encoding of a command: array of bulk strings."""
    out = [b"*%d\r\n" % len(args)]
    for a in args:
        b = a if isinstance(a, bytes) else str(a).encode("utf-8")
        out.append(b"$%d\r\n%s\r\n" % (len(b), b))
    return b"".join(out)


def read_reply(f) -> bytes | int | None | list:
    """Parse one RESP2 reply from a buffered binary file object."""
    line = f.readline()
    if not line:
        raise ConnectionError("connection closed mid-reply")
    kind, rest = line[:1], line[1:-2]
    if kind == b"+":  # simple string
        return rest
    if kind == b"-":  # error
        raise RespError(rest.decode("utf-8", "replace"))
    if kind == b":":  # integer
        return int(rest)
    if kind == b"$":  # bulk string
        n = int(rest)
        if n == -1:
            return None
        data = f.read(n + 2)
        if len(data) != n + 2:
            raise ConnectionError("short bulk-string read")
        return data[:-2]
    if kind == b"*":  # array
        n = int(rest)
        if n == -1:
            return None
        return [read_reply(f) for _ in range(n)]
    raise RespError(f"unknown RESP type byte {kind!r}")


class RespKVCache:
    """``TTLCache``-contract KV cache over a RESP server.

    Drop-in for the service's insights cache: ``get``/``put``/``pop``/
    ``in``/``len`` with per-entry expiry — but shared across processes and
    surviving driver restarts, which the in-memory cache cannot.

    ``prefix`` namespaces keys so ``__len__``/``clear`` (and nothing else)
    can use ``KEYS prefix*`` — fine for the bounded insights keyspace;
    a multi-tenant deployment would use a dedicated logical DB instead.
    """

    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 6379,
        ttl_s: float = 24 * 3600.0,
        prefix: str = "gdp:insights:",
        timeout_s: float = 5.0,
    ):
        self.host = host
        self.port = port
        self.ttl_ms = max(1, int(ttl_s * 1000))
        self.prefix = prefix
        self.timeout_s = timeout_s
        self._sock: socket.socket | None = None
        self._f = None
        self._getdel_ok = True  # cleared on first unknown-command error

    # -- wire plumbing ---------------------------------------------------

    def _connect(self) -> None:
        if self._sock is not None:
            return
        self._sock = socket.create_connection(
            (self.host, self.port), timeout=self.timeout_s
        )
        self._f = self._sock.makefile("rb")

    def close(self) -> None:
        if self._sock is not None:
            try:
                self._f.close()
                self._sock.close()
            finally:
                self._sock, self._f = None, None

    def command(self, *args: str | bytes):
        """Send one command, return its parsed reply (reconnecting once on
        a dead socket — the redis.rs client's behavior on pool checkout)."""
        self._connect()
        try:
            self._sock.sendall(encode_command(*args))
            return read_reply(self._f)
        except (ConnectionError, OSError):
            self.close()
            self._connect()
            self._sock.sendall(encode_command(*args))
            return read_reply(self._f)

    def ping(self) -> bool:
        return self.command("PING") == b"PONG"

    # -- TTLCache contract -----------------------------------------------

    def _k(self, key: str) -> str:
        return self.prefix + key

    def get(self, key: str) -> str | None:
        v = self.command("GET", self._k(key))
        return None if v is None else v.decode("utf-8")

    def put(self, key: str, value: str) -> None:
        r = self.command("SET", self._k(key), value, "PX", str(self.ttl_ms))
        if r != b"OK":
            raise RespError(f"SET returned {r!r}")

    def pop(self, key: str) -> str | None:
        if self._getdel_ok:
            try:
                v = self.command("GETDEL", self._k(key))
                return None if v is None else v.decode("utf-8")
            except RespError as exc:
                if "unknown command" not in str(exc).lower():
                    raise
                self._getdel_ok = False
        v = self.command("GET", self._k(key))  # pre-6.2 fallback: not atomic
        self.command("DEL", self._k(key))
        return None if v is None else v.decode("utf-8")

    def __contains__(self, key: str) -> bool:
        return self.command("EXISTS", self._k(key)) == 1

    def __len__(self) -> int:
        keys = self.command("KEYS", self.prefix + "*")
        return 0 if keys is None else len(keys)

    def clear(self) -> None:
        keys = self.command("KEYS", self.prefix + "*") or []
        if keys:
            self.command("DEL", *[k.decode("utf-8") for k in keys])
