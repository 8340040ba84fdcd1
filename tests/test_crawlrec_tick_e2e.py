"""End-to-end: crawl dumps in the custom "crawlrec" format flow through
the Python DataSource into crawl_curation_tick — bespoke-format ingest
feeding the exactly-once curation stack, with the URL gate firing on
record-level metadata the format carries natively."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.pipelines import crawl_curation_tick
from g_data_pipeline_spark.sources import txn
from g_data_pipeline_spark.sources.pydatasource import (
    RECORD_SEP,
    CrawlDumpDataSource,
)

W = 10


def _words(prefix, n):
    return " ".join(f"{prefix}{k}" for k in range(n))


def _rec(url, body):
    return (
        f"url: {url}\nstatus: 200\nfetched_at: 2024-01-01T00:00:00\n\n"
        f"{body}\n{RECORD_SEP}\n"
    )


def _tick(spark, df, base, dump_id):
    return crawl_curation_tick(
        spark,
        df,
        base,
        dump_id,
        url_col="url",
        min_tokens=5,
        max_digit_ratio=0.9,
        window_tokens=W,
        num_hashes=16,
        bands=8,
    )


def test_crawlrec_dumps_through_the_tick(spark, tmp_path):
    spark.dataSource.register(CrawlDumpDataSource)
    base = str(tmp_path / "corpus")
    keep1 = _words("alpha", 20)
    keep2 = _words("beta", 25)

    d1 = tmp_path / "dump1"
    d1.mkdir()
    (d1 / "f0.crawlrec").write_text(
        _rec("https://a.example/page-one", keep1)
        + _rec("https://b.example/page-two", keep2),
        encoding="utf-8",
    )
    d2 = tmp_path / "dump2"
    d2.mkdir()
    (d2 / "f0.crawlrec").write_text(
        # exact duplicate of dump1 content under a NEW url
        _rec("https://c.example/mirror", keep1)
        # blocked TLD: the URL gate must kill it before content stages
        + _rec("https://spam.click/x", _words("gamma", 30))
        # fresh survivor
        + _rec("https://d.example/fresh", _words("delta", 22)),
        encoding="utf-8",
    )

    def _load(path):
        raw = (
            spark.read.format("crawlrec").option("path", str(path)).load()
        )
        return raw.select(
            F.xxhash64("url").alias("doc_id"),
            F.col("payload").alias("text"),
            "url",
        )

    r1 = _tick(spark, _load(d1), base, "d1")
    assert r1["n_kept"] == 2 and not r1["replay"]
    r2 = _tick(spark, _load(d2), base, "d2")
    # of dump2: mirror = exact cross-dump dup, spam.click = URL-gated,
    # fresh survives
    assert r2["n_kept"] == 1

    texts = {
        r.text
        for r in txn.read_committed(spark, f"{base}/clean_docs").collect()
    }
    assert texts == {keep1, keep2, _words("delta", 22)}

    # replaying dump2 from its files is a pure no-op (run_id short-circuit)
    v = txn.latest_version(spark, f"{base}/clean_docs")
    r2b = _tick(spark, _load(d2), base, "d2")
    assert r2b.get("replay") is True
    assert txn.latest_version(spark, f"{base}/clean_docs") == v


def test_crawlrec_streaming_into_curation_stream(spark, tmp_path):
    """The full production loop: bespoke-format dump files -> the custom
    Python STREAMING DataSource -> crawl_curation_stream (exactly-once
    tick per micro-batch). A second dump lands between two availableNow
    runs over one checkpoint; re-running with no new files is a no-op."""
    from g_data_pipeline_spark.streaming.pipelines import (
        crawl_curation_stream,
    )

    spark.dataSource.register(CrawlDumpDataSource)
    base = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    src = tmp_path / "dumps"
    src.mkdir()
    keep1 = _words("alpha", 20)
    (src / "d0.crawlrec").write_text(
        _rec("https://a.example/one", keep1)
        + _rec("https://b.example/two", _words("beta", 25)),
        encoding="utf-8",
    )

    def _run():
        stream = (
            spark.readStream.format("crawlrec")
            .option("path", str(src))
            .load()
            .select(
                F.xxhash64("url").alias("doc_id"),
                F.col("payload").alias("text"),
                "url",
            )
        )
        return crawl_curation_stream(
            stream, base, ckpt, timeout_s=300,
            url_col="url", min_tokens=5, max_digit_ratio=0.9,
            window_tokens=W, num_hashes=16, bands=8,
        )

    _run()
    assert len(txn.read_committed(spark, f"{base}/clean_docs").collect()) == 2

    # second dump: a cross-dump exact duplicate + a fresh doc
    (src / "d1.crawlrec").write_text(
        _rec("https://c.example/mirror", keep1)
        + _rec("https://d.example/fresh", _words("delta", 22)),
        encoding="utf-8",
    )
    _run()
    texts = {
        r.text
        for r in txn.read_committed(spark, f"{base}/clean_docs").collect()
    }
    assert texts == {keep1, _words("beta", 25), _words("delta", 22)}

    # a third run with NO new files moves nothing
    v = txn.latest_version(spark, f"{base}/clean_docs")
    _run()
    assert txn.latest_version(spark, f"{base}/clean_docs") == v


def test_multi_dump_streaming_soak_with_maintenance(spark, tmp_path):
    """Round-8 verdict #9 soak: five dumps stream through
    crawl_curation_stream with directory maintenance ON (all four
    directories, including clean_docs since the round-8 consumer-safe
    compaction). Pins: (a) survivor set byte-identical to a batch-tick
    twin run with maintenance OFF — maintenance never changes answers;
    (b) every directory's manifest count stays <= retain_versions and
    its live snapshot stays <= max_files files — bounded growth over
    the stream's lifetime."""
    from g_data_pipeline_spark.streaming.pipelines import (
        crawl_curation_stream,
    )

    spark.dataSource.register(CrawlDumpDataSource)
    base = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    src = tmp_path / "dumps"
    src.mkdir()
    RETAIN, MAXF = 2, 3

    def dump_text(b):
        fresh = _words(f"fresh{b}_", 20)
        recs = _rec(f"https://site{b}.example/fresh", fresh)
        if b > 0:
            # exact dup of the previous dump's fresh doc, new url
            recs += _rec(
                f"https://mirror{b}.example/copy",
                _words(f"fresh{b - 1}_", 20),
            )
            # near-dup: same 20 words, one swapped
            recs += _rec(
                f"https://near{b}.example/nd",
                _words(f"fresh{b - 1}_", 19) + " zz",
            )
        return recs

    def _frame(df):
        return df.select(
            F.xxhash64("url").alias("doc_id"),
            F.col("payload").alias("text"),
            "url",
        )

    def _run_stream():
        stream = (
            spark.readStream.format("crawlrec")
            .option("path", str(src))
            .load()
        )
        crawl_curation_stream(
            _frame(stream), base, ckpt, timeout_s=300,
            url_col="url", min_tokens=5, max_digit_ratio=0.9,
            window_tokens=W, num_hashes=16, bands=8,
            retain_versions=RETAIN, max_files=MAXF,
        )

    for b in range(5):
        (src / f"d{b}.crawlrec").write_text(dump_text(b), encoding="utf-8")
        _run_stream()

    # (a) answers match a maintenance-free batch twin
    twin_base = str(tmp_path / "twin")
    for b in range(5):
        raw = (
            spark.read.format("crawlrec")
            .option("path", str(src))
            .load()
            .filter(F.col("source_file") == f"d{b}.crawlrec")
        )
        crawl_curation_tick(
            spark, _frame(raw), twin_base, f"{b:03d}",
            url_col="url", min_tokens=5, max_digit_ratio=0.9,
            window_tokens=W, num_hashes=16, bands=8,
        )
    got = {
        r.text
        for r in txn.read_committed(spark, f"{base}/clean_docs").collect()
    }
    twin = {
        r.text
        for r in txn.read_committed(
            spark, f"{twin_base}/clean_docs"
        ).collect()
    }
    # the near-dup docs are substring-CUT against the archive first
    # (their 19-word prefix is archived content), leaving the 'zz'
    # remnant as a legitimate surviving row — same in both runs
    assert got == twin
    assert got == {_words(f"fresh{b}_", 20) for b in range(5)} | {"zz"}

    # (b) bounded directories after 5 dumps of appends + maintenance
    for t in ("fingerprint_directory", "substring_directory",
              "band_directory", "clean_docs"):
        table = f"{base}/{t}"
        vs = txn._manifest_versions(spark, table)
        assert len(vs) <= RETAIN, f"{t} manifests unbounded: {vs}"
        n_files = len(txn._load_manifest(spark, table, vs[-1])["files"])
        assert n_files <= MAXF, f"{t} snapshot fragmented: {n_files}"
