"""maintain_table / compact_table / marker GC: the retention policy that
keeps the incremental-dedup directories (substring window hashes, MinHash
band buckets) bounded across unbounded crawl dumps."""

from __future__ import annotations

from g_data_pipeline_spark.sources import txn


def _commit(spark, table, rid, rows):
    df = spark.createDataFrame(rows, "h string, owner_id long, owner_pos int")
    return txn.commit_write(spark, df, table, run_id=rid, mode="append")


def _snapshot(spark, table):
    return {
        (r.h, r.owner_id, r.owner_pos)
        for r in txn.read_committed(spark, table).collect()
    }


def test_compact_preserves_content_and_shrinks_files(spark, tmp_path):
    table = str(tmp_path / "dir_table")
    for b in range(6):
        _commit(spark, table, f"dump-{b}", [(f"h{b}{i}", b, i) for i in range(3)])
    before = _snapshot(spark, table)
    n_before = len(txn._load_manifest(spark, table, 6)["files"])
    v = txn.compact_table(spark, table, target_file_bytes=1 << 30)
    assert v == 7
    assert _snapshot(spark, table) == before
    n_after = len(txn._load_manifest(spark, table, v)["files"])
    assert n_after < n_before
    assert n_after == 1  # 1 GiB target -> single file at fixture scale
    # idempotence: retrying the crashed compaction no-ops on its run_id
    assert txn.commit_write(
        spark,
        txn.read_committed(spark, table),
        table,
        run_id="compact-upto-6",
        mode="overwrite",
    ) == v
    # a second maintenance pass finds the top already compacted
    assert txn.compact_table(spark, table) is None


def test_maintain_table_bounds_versions_and_gcs_markers(spark, tmp_path):
    table = str(tmp_path / "dir_table")
    for b in range(8):
        _commit(spark, table, f"dump-{b}", [(f"h{b}", b, 0)])
    before = _snapshot(spark, table)
    report = txn.maintain_table(
        spark, table, retain_versions=2, max_files=3,
        target_file_bytes=1 << 30,
    )
    assert report["compacted_to_version"] == 9
    assert report["retained_versions"] == [8, 9]
    assert _snapshot(spark, table) == before
    # markers of vacuumed versions are gone; retained ones still resolve
    assert txn.find_run_version(spark, table, "dump-0") is None
    assert txn.find_run_version(spark, table, "compact-upto-8") == 9
    # incremental consumers past the horizon get the documented error
    import pytest

    with pytest.raises(ValueError, match="vacuumed"):
        txn.read_incremental(spark, table, since_version=3)
    # the directory keeps absorbing dumps after maintenance
    _commit(spark, table, "dump-9", [("h9", 9, 0)])
    assert ("h9", 9, 0) in _snapshot(spark, table)


def test_maintenance_tick_composes_with_incremental_dedup(spark, tmp_path):
    """End-to-end: substring directory built incrementally, maintained,
    then a later dump dedups against the COMPACTED directory with
    unchanged semantics."""
    from g_data_pipeline_spark.operators.dedup import (
        incremental_substring_dedup,
        substring_window_directory,
    )

    W = 10
    words = lambda p, n: " ".join(f"{p}{k}" for k in range(n))  # noqa: E731
    span = words("dup", W)
    table = str(tmp_path / "substr_dir")

    d0 = substring_window_directory(
        spark.createDataFrame(
            [(1, f"{words('a', 4)} {span}")], "doc_id long, text string"
        ),
        "doc_id",
        "text",
        W,
    )
    txn.commit_write(spark, d0, table, run_id="dump-0", mode="append")
    for b in range(1, 5):  # more dumps, each appending fresh windows
        delta = substring_window_directory(
            spark.createDataFrame(
                [(10 + b, words(f"u{b}", W + 4))], "doc_id long, text string"
            ),
            "doc_id",
            "text",
            W,
        )
        txn.commit_write(spark, delta, table, run_id=f"dump-{b}", mode="append")
    txn.maintain_table(
        spark, table, retain_versions=1, max_files=2,
        target_file_bytes=1 << 30,
    )
    directory = txn.read_committed(spark, table)
    batch = spark.createDataFrame(
        [(99, f"{span} {words('z', 5)}")], "doc_id long, text string"
    )
    cleaned, _ = incremental_substring_dedup(
        batch, directory, "doc_id", "text", W
    )
    row = cleaned.collect()[0]
    assert row.dedup_text == words("z", 5)  # history (pre-compaction) wins
    assert row.n_tokens_kept == 5


def test_torn_and_stale_markers_read_as_not_committed(spark, tmp_path):
    """find_run_version's failure discipline: a torn marker JSON (crash
    mid-write — by marker-before-rename ordering the commit never
    happened) and a marker whose claimed version belongs to another
    run_id both read as not-committed, and a subsequent commit of that
    run_id proceeds normally."""
    table = str(tmp_path / "t")
    _commit(spark, table, "winner", [("h0", 0, 0)])

    # torn marker for a never-committed run
    jvm = spark._jvm
    path = txn._run_marker_path(table, "crashed-run")
    hp = jvm.org.apache.hadoop.fs.Path(path)
    fs = hp.getFileSystem(spark._jsc.hadoopConfiguration())
    out = fs.create(hp, True)
    out.write(bytearray(b'{"run_id": "crashed-'))  # truncated JSON
    out.close()
    assert txn.find_run_version(spark, table, "crashed-run") is None

    # stale marker: claims a version the race winner owns
    txn._write_run_marker(spark, table, "loser-run", 1)
    assert txn.find_run_version(spark, table, "loser-run") is None
    # marker naming a version that does not exist at all
    txn._write_run_marker(spark, table, "ghost-run", 99)
    assert txn.find_run_version(spark, table, "ghost-run") is None

    # all three can now commit cleanly and become findable
    for rid, want in (("crashed-run", 2), ("loser-run", 3), ("ghost-run", 4)):
        assert _commit(spark, table, rid, [("hx", 1, 1)]) == want
        assert txn.find_run_version(spark, table, rid) == want
