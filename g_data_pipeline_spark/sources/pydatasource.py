"""Custom PySpark-4 Python DataSource for crawl-dump record files — the
ingestion seam for feeds that arrive in bespoke record-framed formats no
built-in reader speaks (the WARC-shaped case; real WARC plugs into the
same parser seam).

Format ("crawlrec"): a file is a sequence of records, each

    url: <address>
    status: <int>
    fetched_at: <ISO-8601>
    <blank line>
    <payload lines ... may contain blank lines>
    \\x1e                        (record separator on its own line)

Spark-first shape:

- ONE partition PER FILE (`partitions()`), so a 100 TB dump directory
  fans out across executors with no driver-side parsing; files are the
  natural split unit for record-framed formats (records cross line
  boundaries, so byte-range splits would need resync logic).
- FILTER PUSHDOWN (`pushFilters`): comparison/membership predicates on
  ``status`` are evaluated DURING parsing and rows dropped before they
  ever reach Spark — the crawl case where most of a dump is 4xx/5xx
  noise; unsupported filters are handed back for Spark to apply.
- Exactly-once WRITES: tasks write to a hidden staging directory and the
  driver-side ``commit`` renames files into place (abort removes the
  staging dir) — the same stage-then-commit discipline as sources/txn.py.

Python-per-record is the honest cost model here (the format itself is
line-oriented text); at scale the parse is embarrassingly parallel and
downstream processing happens on the returned DataFrame JVM-side.
"""

from __future__ import annotations

import os
import uuid
from datetime import datetime
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

RECORD_SEP = "\x1e"

SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("status", IntegerType()),
        StructField("fetched_at", TimestampType()),
        StructField("payload", StringType()),
        StructField("source_file", StringType()),
    ]
)

_STATUS_OPS = {
    EqualTo: lambda v: (lambda s: s == v),
    GreaterThan: lambda v: (lambda s: s > v),
    GreaterThanOrEqual: lambda v: (lambda s: s >= v),
    LessThan: lambda v: (lambda s: s < v),
    LessThanOrEqual: lambda v: (lambda s: s <= v),
    In: lambda v: (lambda s, _vs=frozenset(v): s in _vs),
}


def parse_crawlrec(text: str, source_file: str) -> Iterator[tuple]:
    """Parse one crawlrec file body into (url, status, fetched_at,
    payload, source_file) tuples. Header block ends at the first blank
    line; payload runs to the record separator (blank lines allowed)."""
    for chunk in text.split(f"\n{RECORD_SEP}\n"):
        if not chunk.strip():
            continue
        head, _, payload = chunk.partition("\n\n")
        fields: dict[str, str] = {}
        for line in head.splitlines():
            key, _, value = line.partition(":")
            fields[key.strip().lower()] = value.strip()
        status = int(fields["status"]) if "status" in fields else None
        fetched = (
            datetime.fromisoformat(fields["fetched_at"])
            if "fetched_at" in fields
            else None
        )
        yield (fields.get("url"), status, fetched, payload, source_file)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class CrawlDumpReader(DataSourceReader):
    def __init__(self, options):
        self.path = options["path"]
        self._status_preds: list = []

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (API name)
        """Accept status comparisons/membership for parse-time evaluation;
        everything else is returned unsupported (Spark applies it)."""
        for f in filters:
            op = _STATUS_OPS.get(type(f))
            if op is not None and tuple(f.attribute) == ("status",):
                self._status_preds.append(op(f.value))
            else:
                yield f

    def partitions(self):
        files = sorted(
            os.path.join(self.path, n)
            for n in os.listdir(self.path)
            if not n.startswith(("_", "."))
            and os.path.isfile(os.path.join(self.path, n))
        )
        # empty dir still needs >= 1 partition for a valid (empty) scan
        return [_FilePartition(p) for p in files] or [_FilePartition("")]

    def read(self, partition: _FilePartition):
        if not partition.path:
            return
        with open(partition.path, encoding="utf-8") as fh:
            text = fh.read()
        preds = self._status_preds
        for row in parse_crawlrec(text, os.path.basename(partition.path)):
            status = row[1]
            if preds and (
                status is None or not all(p(status) for p in preds)
            ):
                continue
            yield row


class _Staged(WriterCommitMessage):
    def __init__(self, staged: str, final: str):
        self.staged = staged
        self.final = final


class CrawlDumpWriter(DataSourceWriter):
    def __init__(self, options):
        self.path = options["path"]
        self.run = uuid.uuid4().hex[:12]

    def write(self, rows) -> _Staged:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        stage_dir = os.path.join(self.path, f"_staging-{self.run}")
        os.makedirs(stage_dir, exist_ok=True)
        # The run id is part of the COMMITTED name, not just the staging
        # dir: repeated .mode("append") runs into one directory must
        # coexist (a bare part-{pid} name would silently clobber the
        # previous run's files at commit time — round-8 ADVICE fix).
        name = f"part-{self.run}-{pid:05d}.crawlrec"
        staged = os.path.join(stage_dir, name)
        with open(staged, "w", encoding="utf-8") as fh:
            for r in rows:
                # field access BY NAME: the incoming DataFrame may carry
                # the right columns in any order (positional access wrote
                # fields under the wrong header keys — round-8 ADVICE fix)
                ts = (
                    r["fetched_at"].isoformat()
                    if r["fetched_at"] is not None
                    else ""
                )
                fh.write(
                    f"url: {r['url']}\nstatus: {r['status']}\n"
                    f"fetched_at: {ts}\n\n"
                    f"{r['payload']}\n{RECORD_SEP}\n"
                )
        return _Staged(staged, os.path.join(self.path, name))

    def commit(self, messages):
        for m in messages:
            os.replace(m.staged, m.final)
        self._cleanup(messages)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)
        self._cleanup(m for m in messages if m is not None)

    def _cleanup(self, messages):
        for m in messages:
            d = os.path.dirname(m.staged)
            try:
                os.rmdir(d)
            except OSError:
                pass  # another task's file still staged


class CrawlDumpStreamReader(SimpleDataSourceStreamReader):
    """Streaming form: each micro-batch ingests the dump files that
    arrived since the last offset. The offset is the lexicographically
    LARGEST file name ingested so far — O(1) state under the documented
    contract that dump files arrive in lexicographic order (date-named
    crawl dumps; a file sorting below the watermark is never read, the
    same monotone-arrival contract the crawl tick's dump_id replay
    uses). ``readBetweenOffsets`` re-reads exactly the (start, end] file
    range, so checkpoint recovery replays byte-identically."""

    def __init__(self, options):
        self.path = options["path"]

    def _files(self, above: str, upto: str | None = None) -> list[str]:
        return sorted(
            n
            for n in os.listdir(self.path)
            if not n.startswith(("_", "."))
            and os.path.isfile(os.path.join(self.path, n))
            and n > above
            and (upto is None or n <= upto)
        )

    def _rows(self, names: list[str]):
        for name in names:
            with open(
                os.path.join(self.path, name), encoding="utf-8"
            ) as fh:
                yield from parse_crawlrec(fh.read(), name)

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        return {"upto": ""}

    def read(self, start: dict):
        names = self._files(start["upto"])
        end = {"upto": names[-1] if names else start["upto"]}
        # iter(list(...)): the prefetch cache requires an ITERATOR
        # (`next(it)` on empty reads), but a generator cannot be pickled
        # into the cache — a materialized list_iterator satisfies both
        return iter(list(self._rows(names))), end

    def readBetweenOffsets(self, start: dict, end: dict):  # noqa: N802
        return iter(list(self._rows(self._files(start["upto"], end["upto"]))))


class CrawlDumpDataSource(DataSource):
    """`spark.dataSource.register(CrawlDumpDataSource)` then
    `spark.read.format("crawlrec").option("path", dir).load()` /
    `df.write.format("crawlrec").option("path", dir).mode(...).save()`."""

    @classmethod
    def name(cls) -> str:
        return "crawlrec"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema) -> CrawlDumpReader:
        opts = dict(self.options)
        opts.setdefault("path", opts.get("paths", ""))
        return CrawlDumpReader(opts)

    def simpleStreamReader(self, schema) -> CrawlDumpStreamReader:  # noqa: N802
        return CrawlDumpStreamReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> CrawlDumpWriter:
        if overwrite:
            raise NotImplementedError(
                "crawlrec writes are append-only (stage-then-commit); "
                "overwrite a dump directory explicitly if you mean it"
            )
        return CrawlDumpWriter(dict(self.options))
