"""incremental_substring_dedup: batch windows vs a history window-hash
directory — cross-batch cuts, within-batch canonical survivor, delta
append algebra (directory + delta == one-shot directory over the union),
and history-wins idempotence on replay."""

from __future__ import annotations

from g_data_pipeline_spark.operators.dedup import (
    incremental_substring_dedup,
    substring_dedup,
    substring_window_directory,
)

W = 10


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, n):
    return " ".join(f"{prefix}{k}" for k in range(n))


def _cleaned(df):
    return {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept) for r in df.collect()
    }


def test_batch_window_in_history_is_cut_everywhere(spark):
    span = _words("dup", W)
    history = _mk(spark, [(1, f"{_words('h', 4)} {span}")])
    directory = substring_window_directory(history, "doc_id", "text", W)
    batch = _mk(
        spark,
        [
            (100, f"{span} {_words('x', 5)}"),
            (101, f"{_words('y', 3)} {span} {_words('z', 2)}"),
            (102, _words("q", 15)),
        ],
    )
    cleaned, delta = incremental_substring_dedup(
        batch, directory, "doc_id", "text", W
    )
    got = _cleaned(cleaned)
    # history wins: BOTH batch occurrences cut (no batch survivor)
    assert got[100] == (_words("x", 5), W + 5, 5)
    assert got[101][2] == got[101][1] - W
    assert span not in got[101][0]
    assert got[102] == (_words("q", 15), 15, 15)
    # the delta holds only never-seen hashes
    hist_hashes = {r.h for r in directory.collect()}
    delta_hashes = {r.h for r in delta.collect()}
    assert not (hist_hashes & delta_hashes)


def test_within_batch_canonical_survivor_and_delta_algebra(spark):
    span = _words("m", W)
    batch = _mk(
        spark,
        [
            (7, f"{_words('a', 3)} {span}"),
            (8, f"{span} {_words('b', 3)}"),
        ],
    )
    empty_dir = substring_window_directory(
        _mk(spark, []), "doc_id", "text", W
    )
    cleaned, delta = incremental_substring_dedup(
        batch, empty_dir, "doc_id", "text", W
    )
    got = _cleaned(cleaned)
    # min-doc canonical survives, exactly like the one-shot operator
    one_shot = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in substring_dedup(batch, "doc_id", "text", W).collect()
    }
    assert got == one_shot
    # directory + delta == directory built over history ∪ batch
    full = substring_window_directory(batch, "doc_id", "text", W)
    assert sorted(tuple(r) for r in delta.collect()) == sorted(
        tuple(r) for r in full.collect()
    )


def test_replay_against_absorbed_delta_cuts_batch_fully(spark):
    """Re-running a batch after its delta was appended cuts every window
    the directory now owns — the batch contributes nothing new twice."""
    span = _words("r", W + 3)
    batch = _mk(spark, [(50, span)])
    empty_dir = substring_window_directory(_mk(spark, []), "doc_id", "text", W)
    _, delta = incremental_substring_dedup(
        batch, empty_dir, "doc_id", "text", W
    )
    replay_cleaned, replay_delta = incremental_substring_dedup(
        batch, delta, "doc_id", "text", W
    )
    got = _cleaned(replay_cleaned)
    assert got[50] == ("", W + 3, 0)
    assert replay_delta.count() == 0


def test_directory_canonical_matches_one_shot_stats(spark):
    """Directory built over a corpus holds exactly the one-shot operator's
    canonical occurrences (min doc, min pos per hash)."""
    from g_data_pipeline_spark.catalog import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(60)
    )
    d = substring_window_directory(docs, "doc_id", "text", 20)
    rows = d.collect()
    assert len({r.h for r in rows}) == len(rows)  # one row per hash
    # every owner is the lexicographic min over that hash's occurrences
    from pyspark.sql import functions as F

    from g_data_pipeline_spark.functions.text import tokens as toks_fn

    base = docs.select("doc_id", toks_fn(F.col("text")).alias("t"))
    tc = F.col("t")
    wins = F.when(
        F.size(tc) >= 20,
        F.transform(
            F.sequence(F.lit(1), F.size(tc) - F.lit(19)),
            lambda i: F.md5(F.concat_ws(" ", F.slice(tc, i, 20))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = base.select("doc_id", F.posexplode(wins).alias("p", "h")).collect()
    best: dict[str, tuple] = {}
    for r in occ:
        k = (r.doc_id, r.p)
        if r.h not in best or k < best[r.h]:
            best[r.h] = k
    assert {r.h: (r.owner_id, r.owner_pos) for r in rows} == best
