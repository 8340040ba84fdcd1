"""Incremental paragraph dedup (operators/incremental_paragraphs.py):
cross-dump + within-batch cuts, self-ownership replay stability,
batch-form parity with the one-shot operator, and the exactly-once
streaming twin."""

from __future__ import annotations

from g_data_pipeline_spark.operators.incremental_paragraphs import (
    DIRECTORY_SCHEMA,
    incremental_paragraph_dedup,
    paragraph_dedup_stream,
)

SEP = "\n\n"
SCHEMA = "doc_id long, text string"

D0 = [(1, f"alpha body{SEP}subscribe now"), (2, "beta body")]
D1 = [
    (10, f"subscribe now{SEP}gamma body"),   # archived boilerplate cut
    (11, f"delta body{SEP}delta body"),      # within-batch repeat
    (12, "beta body"),                       # exact archived para = whole doc
]


def _mk(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _empty_dir(spark):
    return spark.createDataFrame([], DIRECTORY_SCHEMA)


def _cleaned(df):
    return {r.id: (r.n_paragraphs, r.n_removed, r.cleaned) for r in df.collect()}


def test_cross_dump_and_batch_cuts(spark):
    empty = _empty_dir(spark)
    c0, d0 = incremental_paragraph_dedup(_mk(spark, D0), empty, "doc_id", "text")
    assert _cleaned(c0) == {
        1: (2, 0, f"alpha body{SEP}subscribe now"),
        2: (1, 0, "beta body"),
    }
    directory = empty.unionByName(d0)
    c1, d1 = incremental_paragraph_dedup(_mk(spark, D1), directory, "doc_id", "text")
    assert _cleaned(c1) == {
        10: (2, 1, "gamma body"),
        11: (2, 1, "delta body"),
        12: (1, 1, ""),           # fully archived -> empty string
    }
    # delta: only genuinely new hashes, owned by their first occurrence
    hashes = {(r.owner_id, r.owner_pos) for r in d1.collect()}
    assert hashes == {(10, 1), (11, 0)}


def test_replay_against_absorbed_delta_is_identical(spark):
    empty = _empty_dir(spark)
    _, d0 = incremental_paragraph_dedup(_mk(spark, D0), empty, "doc_id", "text")
    directory = empty.unionByName(d0)
    c1, d1 = incremental_paragraph_dedup(_mk(spark, D1), directory, "doc_id", "text")
    first = _cleaned(c1)
    absorbed = directory.unionByName(d1)
    c2, d2 = incremental_paragraph_dedup(_mk(spark, D1), absorbed, "doc_id", "text")
    assert _cleaned(c2) == first    # self-ownership exclusion holds
    assert d2.count() == 0          # replayed delta is empty


def test_single_dump_matches_batch_operator(spark):
    """Empty directory == the one-shot dedup_paragraphs transform."""
    from g_data_pipeline_spark.operators.paragraphs import dedup_paragraphs

    rows = D0 + [(3, f"alpha body{SEP}tail"), (4, "alpha body")]
    inc, _ = incremental_paragraph_dedup(
        _mk(spark, rows), _empty_dir(spark), "doc_id", "text"
    )
    one = dedup_paragraphs(_mk(spark, rows), "doc_id", "text")
    key = lambda df: sorted(map(tuple, df.collect()))  # noqa: E731
    assert key(inc) == key(one)


def test_streaming_twin_exactly_once(spark, tmp_path):
    from g_data_pipeline_spark.sources import txn

    src = tmp_path / "src"
    _mk(spark, D0).write.mode("overwrite").parquet(str(src / "batch=0"))
    dir_table = str(tmp_path / "para_directory")
    out_table = str(tmp_path / "cleaned")
    ckpt = str(tmp_path / "ckpt")

    def _run():
        stream = spark.readStream.schema(SCHEMA).parquet(str(src / "batch=*"))
        return paragraph_dedup_stream(
            stream, dir_table, out_table, ckpt, timeout_s=240
        )

    apply_batch = _run()
    _mk(spark, D1).write.mode("overwrite").parquet(str(src / "batch=1"))
    apply_batch = _run()

    got = {
        r.id: r.cleaned
        for r in txn.read_committed(spark, out_table).collect()
    }
    assert got == {
        1: f"alpha body{SEP}subscribe now",
        2: "beta body",
        10: "gamma body",
        11: "delta body",
        12: "",
    }
    v_dir = txn.latest_version(spark, dir_table)
    v_out = txn.latest_version(spark, out_table)
    # simulated replays: version-stable both tables
    apply_batch(_mk(spark, D1), 1)
    apply_batch(_mk(spark, D0), 0)
    assert txn.latest_version(spark, dir_table) == v_dir
    assert txn.latest_version(spark, out_table) == v_out
