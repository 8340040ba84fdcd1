"""Fuzzy (banded-MinHash) paragraph dedup (round 9, r8 verdict #8):
variant-footer removal, first-occurrence survivorship, incremental
archive behavior, replay stability, and the one-shot/incremental twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.fuzzy_paragraphs import (
    DIRECTORY_SCHEMA,
    incremental_neardup_paragraphs,
    neardup_paragraph_dedup,
)

SEP = "\n\n"

# A long boilerplate footer whose tail token VARIES per doc — byte-level
# different in every doc (exact paragraph dedup is blind to it), near-
# identical under 3-token shingles (J ~ 21/27 pairwise).
_BASE = (
    "copyright example news network all rights reserved "
    "reproduction without permission is strictly prohibited "
    "contact the editorial desk for licensing and syndication requests"
)


def _footer(i: int) -> str:
    return f"{_BASE} page {i}"


def _body(i: int) -> str:
    # token-DISJOINT bodies (every token id-specific): near-dup banding
    # must see zero shared shingles across docs' bodies
    return " ".join(f"body{i}word{j}" for j in range(8))


def _docs(spark, ids):
    rows = [(i, f"{_body(i)}{SEP}{_footer(i)}") for i in ids]
    return spark.createDataFrame(rows, "id long, text string")


def _run(spark, ids):
    return {
        r.id: r for r in neardup_paragraph_dedup(_docs(spark, ids), "id", "text").collect()
    }


def test_variant_footers_collapse_to_first_occurrence(spark):
    got = _run(spark, [1, 2, 3, 4])
    assert got[1].cleaned.endswith(_footer(1))  # first occurrence kept
    for i in (2, 3, 4):
        assert got[i].n_removed == 1, i
        assert got[i].cleaned == _body(i)
    assert got[1].n_removed == 0


def test_distinct_paragraphs_and_short_paragraphs_survive(spark):
    rows = [
        (1, f"alpha beta gamma delta{SEP}tiny"),
        (2, f"completely different content about other topics entirely{SEP}tiny"),
    ]
    df = spark.createDataFrame(rows, "id long, text string")
    got = {r.id: r for r in neardup_paragraph_dedup(df, "id", "text").collect()}
    # 'tiny' is too short to shingle (n=3) -> survives in BOTH docs
    assert got[1].n_removed == 0 and got[2].n_removed == 0
    assert got[1].cleaned == rows[0][1] and got[2].cleaned == rows[1][1]


def test_incremental_archive_cuts_new_dump_variants(spark):
    empty = spark.createDataFrame([], DIRECTORY_SCHEMA)
    history = _docs(spark, [1, 2])
    batch = _docs(spark, [10, 11])
    _, delta = incremental_neardup_paragraphs(history, empty, "id", "text")
    cleaned, delta2 = incremental_neardup_paragraphs(
        batch, delta, "id", "text"
    )
    got = {r.id: r for r in cleaned.collect()}
    for i in (10, 11):
        assert got[i].n_removed == 1, i  # footer variant cut vs archive
        assert got[i].cleaned == _body(i)
    # the new bodies' buckets append; footer buckets already owned
    assert delta2.count() > 0


def test_replay_is_stable_after_delta_absorbed(spark):
    """The shared-core invariant: labeling the SAME batch against a
    directory that already absorbed its delta yields identical cleaned
    output (archive hits exclude self-owned buckets)."""
    empty = spark.createDataFrame([], DIRECTORY_SCHEMA)
    batch = _docs(spark, [1, 2, 3])
    cleaned1, delta = incremental_neardup_paragraphs(batch, empty, "id", "text")
    absorbed = empty.unionByName(delta)
    cleaned2, delta2 = incremental_neardup_paragraphs(
        batch, absorbed, "id", "text"
    )
    a = sorted(tuple(r) for r in cleaned1.collect())
    b = sorted(tuple(r) for r in cleaned2.collect())
    assert a == b
    assert delta2.count() == 0  # nothing new on replay


def test_one_shot_equals_history_then_batch(spark):
    """Greedy bucket-min with pid = (doc, pos) packing: one-shot over
    the full corpus labels the late docs exactly like incremental
    (batch vs directory-from-history) — the batch/incremental twin."""
    empty = spark.createDataFrame([], DIRECTORY_SCHEMA)
    history, batch = _docs(spark, [1, 2]), _docs(spark, [10, 11])
    one_shot = {
        r.id: r
        for r in neardup_paragraph_dedup(
            _docs(spark, [1, 2, 10, 11]), "id", "text"
        ).collect()
        if r.id >= 10
    }
    _, delta = incremental_neardup_paragraphs(history, empty, "id", "text")
    stepped, _ = incremental_neardup_paragraphs(batch, delta, "id", "text")
    stepped = {r.id: r for r in stepped.collect()}
    for i in (10, 11):
        assert (
            one_shot[i].n_removed,
            one_shot[i].cleaned,
        ) == (stepped[i].n_removed, stepped[i].cleaned)


def test_streaming_twin_exactly_once(spark, tmp_path):
    """Two dumps through neardup_paragraph_stream: variant footers in
    the second dump are cut against the first dump's archive, output
    rows land exactly once, and a re-run with no new files moves
    nothing."""
    from g_data_pipeline_spark.operators.fuzzy_paragraphs import (
        neardup_paragraph_stream,
    )
    from g_data_pipeline_spark.sources import txn

    src = str(tmp_path / "src")
    dir_t = str(tmp_path / "dir")
    out_t = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run():
        stream = spark.readStream.schema("id long, text string").parquet(src)
        neardup_paragraph_stream(stream, dir_t, out_t, ckpt, id_col="id")

    _docs(spark, [1, 2]).write.mode("append").parquet(src)
    run()
    _docs(spark, [10, 11]).write.mode("append").parquet(src)
    run()
    got = {r.id: r for r in txn.read_committed(spark, out_t).collect()}
    assert set(got) == {1, 2, 10, 11}
    assert got[1].n_removed == 0  # first occurrence kept
    for i in (2, 10, 11):
        assert got[i].n_removed == 1, i
    assert got[10].cleaned == _body(10)
    v = txn.latest_version(spark, out_t)
    run()  # no new files -> no new commits
    assert txn.latest_version(spark, out_t) == v


def test_pid_packing_bounds_fail_loudly(spark):
    """r9 ADVICE: an out-of-bound corpus must raise, not silently alias
    pids into the next doc's range."""
    import pytest

    from g_data_pipeline_spark.operators import fuzzy_paragraphs as fp

    # doc id beyond 2^43 would collide after the 2^20 shift
    df = spark.createDataFrame(
        [(1 << 44, "alpha beta gamma delta epsilon zeta")], ["doc_id", "text"]
    )
    with pytest.raises(Exception, match="out of bounds"):
        fp.neardup_paragraph_dedup(df, "doc_id", "text").collect()

    # paragraph-position overflow (POS_BITS shrunk to make it reachable)
    old = fp.POS_BITS
    fp.POS_BITS = 1
    try:
        many = spark.createDataFrame(
            [(7, "\n\n".join(f"unique tokens row {i} alpha beta gamma" for i in range(4)))],
            ["doc_id", "text"],
        )
        with pytest.raises(Exception, match="out of bounds"):
            fp.neardup_paragraph_dedup(many, "doc_id", "text").collect()
    finally:
        fp.POS_BITS = old
