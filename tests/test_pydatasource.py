"""Custom Python DataSource (sources/pydatasource.py): record parsing,
one-partition-per-file planning, status filter pushdown (unit-level and
through Spark), and the stage-then-commit writer round-trip."""

from __future__ import annotations

import os
from datetime import datetime

from pyspark.sql import functions as F

from g_data_pipeline_spark.sources.pydatasource import (
    RECORD_SEP,
    CrawlDumpDataSource,
    CrawlDumpReader,
    parse_crawlrec,
)

REC = (
    "url: https://a.example/one\nstatus: 200\n"
    "fetched_at: 2024-01-01T00:00:05\n\nbody one\n\nwith blank line\n"
    f"{RECORD_SEP}\n"
    "url: https://a.example/two\nstatus: 404\n"
    "fetched_at: 2024-01-01T00:00:06\n\nmissing page\n"
    f"{RECORD_SEP}\n"
)
REC2 = (
    "url: https://b.example/three\nstatus: 200\n"
    "fetched_at: 2024-01-02T10:00:00\n\nbody three\n"
    f"{RECORD_SEP}\n"
)


def _dump(tmp_path):
    d = tmp_path / "dump"
    d.mkdir()
    (d / "f1.crawlrec").write_text(REC, encoding="utf-8")
    (d / "f2.crawlrec").write_text(REC2, encoding="utf-8")
    (d / "_SUCCESS").write_text("", encoding="utf-8")  # must be ignored
    return str(d)


def test_parse_payload_keeps_blank_lines():
    rows = list(parse_crawlrec(REC, "f1"))
    assert rows[0][0] == "https://a.example/one"
    assert rows[0][3] == "body one\n\nwith blank line"
    assert rows[0][2] == datetime(2024, 1, 1, 0, 0, 5)
    assert [r[1] for r in rows] == [200, 404]


def test_read_partitions_and_rows(spark, tmp_path):
    spark.dataSource.register(CrawlDumpDataSource)
    df = spark.read.format("crawlrec").option("path", _dump(tmp_path)).load()
    assert df.rdd.getNumPartitions() == 2  # one per data file
    got = {r.url: r for r in df.collect()}
    assert set(got) == {
        "https://a.example/one",
        "https://a.example/two",
        "https://b.example/three",
    }
    assert got["https://b.example/three"].source_file == "f2.crawlrec"
    assert got["https://a.example/two"].status == 404


def test_pushdown_unit_semantics():
    from pyspark.sql.datasource import EqualTo, StringContains

    r = CrawlDumpReader({"path": "."})
    leftover = list(
        r.pushFilters(
            [EqualTo(("status",), 200), StringContains(("url",), "a.ex")]
        )
    )
    # the status comparison is consumed, the string filter handed back
    assert [type(f).__name__ for f in leftover] == ["StringContains"]
    rows = [r for r in parse_crawlrec(REC, "f1")]
    kept = [row for row in rows if all(p(row[1]) for p in r._status_preds)]
    assert [k[1] for k in kept] == [200]


def test_filter_through_spark_correct_under_pushdown(spark, tmp_path):
    spark.dataSource.register(CrawlDumpDataSource)
    df = (
        spark.read.format("crawlrec")
        .option("path", _dump(tmp_path))
        .load()
        .filter((F.col("status") == 200) & F.col("url").contains("a.ex"))
    )
    assert [r.url for r in df.collect()] == ["https://a.example/one"]


def test_writer_round_trip_and_staging_cleanup(spark, tmp_path):
    spark.dataSource.register(CrawlDumpDataSource)
    src = _dump(tmp_path)
    dest = str(tmp_path / "out")
    os.makedirs(dest)
    original = spark.read.format("crawlrec").option("path", src).load()
    (
        original.drop("source_file")
        .withColumn("source_file", F.lit(""))
        .write.format("crawlrec")
        .option("path", dest)
        .mode("append")
        .save()
    )
    # staging directories are gone after commit, only part files remain
    assert all(not n.startswith("_staging") for n in os.listdir(dest))
    back = spark.read.format("crawlrec").option("path", dest).load()
    key = lambda r: (r.url, r.status, r.fetched_at, r.payload)  # noqa: E731
    assert sorted(map(key, back.collect())) == sorted(
        map(key, original.collect())
    )


def test_two_appends_coexist_and_column_order_is_by_name(spark, tmp_path):
    """Round-8 ADVICE fixes: (a) two .mode('append') runs into one
    directory must BOTH survive — committed names carry the run id, so
    a second append can't clobber the first run's part files; (b) the
    writer serializes fields BY NAME, so a DataFrame with the right
    columns in a different order round-trips correctly."""
    spark.dataSource.register(CrawlDumpDataSource)
    dest = str(tmp_path / "out")
    os.makedirs(dest)
    rows1 = [("https://w.example/a", 200, datetime(2024, 1, 1), "pay a", "")]
    rows2 = [("https://w.example/b", 301, datetime(2024, 1, 2), "pay b", "")]
    cols = ["url", "status", "fetched_at", "payload", "source_file"]
    df1 = spark.createDataFrame(rows1, cols).coalesce(1)
    # shuffled column order, same names
    df2 = (
        spark.createDataFrame(rows2, cols)
        .select("payload", "source_file", "fetched_at", "url", "status")
        .coalesce(1)
    )
    for df in (df1, df2):
        df.write.format("crawlrec").option("path", dest).mode(
            "append"
        ).save()
    assert len(os.listdir(dest)) == 2  # second append did not clobber
    back = spark.read.format("crawlrec").option("path", dest).load()
    got = sorted(
        (r.url, r.status, r.fetched_at, r.payload) for r in back.collect()
    )
    assert got == [
        ("https://w.example/a", 200, datetime(2024, 1, 1), "pay a"),
        ("https://w.example/b", 301, datetime(2024, 1, 2), "pay b"),
    ]


def test_streaming_new_files_per_batch_with_checkpoint(spark, tmp_path):
    """Two availableNow runs over one checkpoint: run 1 ingests the
    initial dumps, a file lands between runs, run 2 picks up ONLY the
    new file — offset state survives the restart (exactly-once)."""
    spark.dataSource.register(CrawlDumpDataSource)
    src = _dump(tmp_path)
    ckpt = str(tmp_path / "ckpt")
    out: list = []

    def _run():
        q = (
            spark.readStream.format("crawlrec")
            .option("path", src)
            .load()
            .writeStream.foreachBatch(
                lambda df, _bid: out.extend(r.url for r in df.collect())
            )
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    _run()
    first = sorted(out)
    assert first == [
        "https://a.example/one",
        "https://a.example/two",
        "https://b.example/three",
    ]
    out.clear()
    (tmp_path / "dump" / "f3.crawlrec").write_text(
        "url: https://c.example/four\nstatus: 200\n"
        "fetched_at: 2024-01-03T00:00:00\n\nlate dump\n"
        f"{RECORD_SEP}\n",
        encoding="utf-8",
    )
    _run()
    assert out == ["https://c.example/four"]
