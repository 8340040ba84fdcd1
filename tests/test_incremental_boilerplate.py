"""Incremental CCNet boilerplate-line removal (round 9): cross-dump
floor counting, capped owner directory, replay stability (including the
cap-displacement edge), batch/one-shot agreement, and the exactly-once
streaming twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.incremental_boilerplate import (
    DIRECTORY_SCHEMA,
    boilerplate_lines_stream,
    incremental_boilerplate_lines,
)
from g_data_pipeline_spark.operators.paragraphs import (
    remove_boilerplate_lines,
)

NL = "\n"
B = "accept all cookies to continue"


def _df(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


def _empty(spark):
    return spark.createDataFrame([], DIRECTORY_SCHEMA)


def _clean(df):
    return {r.id: r for r in df.collect()}


def test_cross_dump_floor_cuts_only_after_threshold(spark):
    """Dump 1 holds the line in 2 docs (< 3: survives); dump 2 adds a
    third doc -> the BATCH occurrence is cut (earlier dumps are not
    retro-cut — the documented incremental edge)."""
    d1 = _df(spark, [(1, f"{B}{NL}alpha1"), (2, f"beta2{NL}{B}")])
    d2 = _df(spark, [(3, f"{B}{NL}gamma3")])
    c1, delta1 = incremental_boilerplate_lines(d1, _empty(spark), "id", "text")
    got1 = _clean(c1)
    assert got1[1].n_removed == 0 and got1[2].n_removed == 0
    c2, _ = incremental_boilerplate_lines(d2, delta1, "id", "text")
    got2 = _clean(c2)
    assert got2[3].n_removed == 1 and got2[3].cleaned == "gamma3"


def test_within_one_dump_matches_batch_transform(spark):
    """A single dump against an empty directory decides exactly like
    remove_boilerplate_lines (the batch twin)."""
    rows = [
        (1, f"{B}{NL}a1"),
        (2, f"{B}{NL}b2"),
        (3, f"{B}{NL}c3"),
        (4, f"solo4{NL}d4"),
    ]
    df = _df(spark, rows)
    inc, _ = incremental_boilerplate_lines(df, _empty(spark), "id", "text")
    batch = remove_boilerplate_lines(df, "id", "text")
    assert sorted(tuple(r) for r in inc.collect()) == sorted(
        tuple(r) for r in batch.collect()
    )


def test_directory_capped_at_min_docs_per_hash(spark):
    df = _df(spark, [(i, f"{B}{NL}body{i}") for i in range(1, 8)])
    _, delta = incremental_boilerplate_lines(
        df, _empty(spark), "id", "text", min_docs=3
    )
    per_h = {
        r.h: r.n
        for r in delta.groupBy("h").agg(F.count("*").alias("n")).collect()
    }
    assert max(per_h.values()) == 3  # the shared line stores 3 owners
    shared_h = [h for h, n in per_h.items() if n == 3]
    owners = sorted(
        r.owner_id
        for r in delta.filter(F.col("h") == shared_h[0]).collect()
    )
    assert owners == [1, 2, 3]  # smallest ids win the cap


def test_replay_stable_including_cap_displacement(spark):
    """Replaying a batch against a directory that absorbed its delta
    decides identically — exercised where the cap displaced ids (an
    archive owner + a 5-doc batch over a 3-doc floor) and where it
    did not."""
    seed = _df(spark, [(100, f"{B}{NL}seed")])
    _, d0 = incremental_boilerplate_lines(
        seed, _empty(spark), "id", "text", min_docs=3
    )
    batch = _df(spark, [(i, f"{B}{NL}own{i}") for i in range(1, 6)])
    c1, d1 = incremental_boilerplate_lines(batch, d0, "id", "text", min_docs=3)
    absorbed = d0.unionByName(d1)
    c2, d2 = incremental_boilerplate_lines(
        batch, absorbed, "id", "text", min_docs=3
    )
    assert sorted(tuple(r) for r in c1.collect()) == sorted(
        tuple(r) for r in c2.collect()
    )
    assert d2.count() == 0  # replay appends nothing


def test_null_text_doc_keeps_row(spark):
    c, _ = incremental_boilerplate_lines(
        _df(spark, [(1, "x"), (2, None)]), _empty(spark), "id", "text"
    )
    got = _clean(c)
    assert set(got) == {1, 2} and got[2].n_lines == 1


def test_streaming_twin_exactly_once(spark, tmp_path):
    """Three dumps through boilerplate_lines_stream: output rows exactly
    once per doc, the floor crossing happens at the right dump, and a
    re-run with no new files moves nothing."""
    from g_data_pipeline_spark.sources import txn

    src = str(tmp_path / "src")
    dir_t = str(tmp_path / "dir")
    out_t = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("id long, text string").parquet(src)
        boilerplate_lines_stream(stream, dir_t, out_t, ckpt, id_col="id")

    _df(spark, [(1, f"{B}{NL}a1"), (2, f"{B}{NL}a2")]).write.mode(
        "append"
    ).parquet(src)
    run()
    _df(spark, [(3, f"{B}{NL}a3")]).write.mode("append").parquet(src)
    run()
    got = {r.id: r for r in txn.read_committed(spark, out_t).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1].n_removed == 0 and got[2].n_removed == 0
    assert got[3].n_removed == 1 and got[3].cleaned == "a3"
    v = txn.latest_version(spark, out_t)
    run()  # no new files -> no new commits
    assert txn.latest_version(spark, out_t) == v
