"""substring_dedup (Lee et al. '21 exact substring-level dedup transform):
planted cross-document duplicates + a pure-Python twin for exactness."""

from __future__ import annotations

from g_data_pipeline_spark.operators.dedup import substring_dedup

W = 10  # small window so fixtures stay readable


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _python_twin(rows, w):
    """Reference implementation: hash sliding windows, canonical first
    occurrence (min doc, min pos) survives, other occurrences' covered
    tokens cut. Cross-document duplicates only."""
    toks = {i: t.strip().lower().split() for i, t in rows}
    occ: dict[tuple, list[tuple[int, int]]] = {}
    for i, ts in toks.items():
        for p in range(len(ts) - w + 1):
            occ.setdefault(tuple(ts[p : p + w]), []).append((i, p))
    removed: dict[int, set[int]] = {i: set() for i, _ in rows}
    for span, places in occ.items():
        if len({i for i, _ in places}) < 2:
            continue
        keep = min(places)
        for i, p in places:
            if (i, p) != keep:
                removed[i].update(range(p, p + w))
    out = {}
    for i, ts in toks.items():
        kept = [t for j, t in enumerate(ts) if j not in removed[i]]
        out[i] = (" ".join(kept), len(ts), len(kept))
    return out


def _words(prefix, n):
    return " ".join(f"{prefix}{k}" for k in range(n))


def test_planted_cross_doc_span_cut_from_loser_only(spark):
    shared = _words("dup", W)  # exactly one window wide
    rows = [
        (1, f"{_words('a', 5)} {shared} {_words('b', 5)}"),
        (2, f"{_words('c', 7)} {shared} {_words('d', 3)}"),
        (3, _words("e", 25)),
    ]
    got = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in substring_dedup(_mk(spark, rows), "doc_id", "text", W).collect()
    }
    want = _python_twin(rows, W)
    assert got == want
    # doc 1 (min doc id) keeps the span, doc 2 loses exactly W tokens
    assert shared in got[1][0]
    assert shared not in got[2][0]
    assert got[2][2] == got[2][1] - W
    # untouched doc passes through verbatim (lowercased join)
    assert got[3][0] == rows[2][1]


def test_overlapping_windows_cut_union_not_sum(spark):
    # an 18-token shared run = 9 overlapping windows; the loser loses the
    # UNION of their coverage (18 tokens), not 9*W
    shared = _words("z", W + 8)
    rows = [
        (10, f"{shared} {_words('p', 6)}"),
        (20, f"{_words('q', 6)} {shared}"),
    ]
    got = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in substring_dedup(_mk(spark, rows), "doc_id", "text", W).collect()
    }
    assert got == _python_twin(rows, W)
    assert got[20][2] == got[20][1] - (W + 8)


def test_within_doc_repeat_without_cross_doc_copy_untouched(spark):
    span = _words("r", W)
    rows = [(5, f"{span} {span}"), (6, _words("s", 12))]
    got = {
        r.id: r.n_tokens_kept
        for r in substring_dedup(_mk(spark, rows), "doc_id", "text", W).collect()
    }
    assert got == {5: 2 * W, 6: 12}


def test_short_and_blank_docs_total_labeling(spark):
    rows = [(1, "only three tokens"), (2, "   "), (3, _words("x", W))]
    got = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in substring_dedup(_mk(spark, rows), "doc_id", "text", W).collect()
    }
    assert got[1] == ("only three tokens", 3, 3)
    assert got[2] == ("", 0, 0)
    assert got[3][1] == W and got[3][2] == W


def test_three_way_duplicate_single_survivor(spark):
    shared = _words("m", W)
    rows = [
        (7, f"{_words('a', 3)} {shared}"),
        (8, f"{shared} {_words('b', 3)}"),
        (9, f"{_words('c', 1)} {shared} {_words('d', 1)}"),
    ]
    got = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in substring_dedup(_mk(spark, rows), "doc_id", "text", W).collect()
    }
    assert got == _python_twin(rows, W)
    survivors = [i for i in (7, 8, 9) if shared in got[i][0]]
    assert survivors == [7]


def test_matches_python_twin_on_real_corpus_sample(spark):
    from g_data_pipeline_spark.catalog import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .select("doc_id", "text")
        .limit(80)
    )
    rows = [(r.doc_id, r.text) for r in docs.collect()]
    got = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in substring_dedup(docs, "doc_id", "text", 20).collect()
    }
    assert got == _python_twin(rows, 20)


def test_long_fully_duplicated_doc_linear_reassembly(spark):
    """Perf pin for the round-7 merged-interval reassembly: a long doc
    duplicated verbatim cuts EVERY window of the loser — the worst case
    for the old per-token ``exists`` over cut starts (O(tokens x cuts),
    ~9e8 predicate evaluations at this size). The linear form must stay
    interactive AND bit-exact: the loser collapses to empty text, the
    canonical copy is untouched."""
    import time

    n, w = 30_000, 50
    text = _words("tok", n)
    df = _mk(spark, [(1, text), (2, text)])
    t0 = time.perf_counter()
    got = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in substring_dedup(df, "doc_id", "text", w).collect()
    }
    elapsed = time.perf_counter() - t0
    assert got[1] == (text.lower(), n, n)
    assert got[2] == ("", n, 0)
    # generous wall bound (local[32] CI noise) — the quadratic shape blew
    # far past this; the linear one runs in low single-digit seconds.
    assert elapsed < 20, f"reassembly took {elapsed:.1f}s"
