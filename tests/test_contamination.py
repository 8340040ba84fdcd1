"""Round-4 curation operators: cross-source contamination (exact + bottom-k
sketch), the hashed naive-Bayes quality classifier, and the survivorship
report. Oracle parity is covered by test_registry_oracle; these pin the
operator semantics and the sketch's estimator quality on hand-built corpora."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.contamination import (
    cross_source_contamination,
    sampled_contamination,
)
from g_data_pipeline_spark.operators.quality import (
    hashed_token_bucket,
    naive_bayes_hashed_weights,
    quality_scores,
)


def _corpus(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "source", "text"])


def test_cross_source_contamination_fractions(spark):
    """Known shingle sets -> exact containment fractions; zero-overlap
    pairs are absent; own-source matches never count."""
    df = _corpus(
        spark,
        [
            (1, "A", "a b c d"),       # shingles {a b c, b c d}
            (2, "B", "a b c x"),       # shingles {a b c, b c x}
            (3, "C", "p q r s"),       # disjoint
        ],
    )
    out = {
        (r.doc_id, r.other_source): (r.n_shingles, r.shared_shingles, r.contamination)
        for r in cross_source_contamination(df, "doc_id", "source", "text").collect()
    }
    assert out == {
        (1, "B"): (2, 1, 0.5),  # 'a b c' shared
        (2, "A"): (2, 1, 0.5),
    }


def test_cross_source_contamination_same_source_multiple_docs(spark):
    """The directory is per-source: a doc overlapping a SIBLING doc in its
    own source contributes nothing; overlap with another source counts the
    shingle once however many docs over there contain it."""
    df = _corpus(
        spark,
        [
            (1, "A", "a b c"),
            (2, "A", "a b c"),       # same source duplicate: no self rows
            (3, "B", "a b c"),
            (4, "B", "a b c d"),     # 'a b c' present twice in B
        ],
    )
    out = {
        (r.doc_id, r.other_source): r.shared_shingles
        for r in cross_source_contamination(df, "doc_id", "source", "text").collect()
    }
    # doc 1 vs B: shingle 'a b c' counted ONCE though two B docs contain it
    assert out[(1, "B")] == 1
    assert (1, "A") not in out and (2, "A") not in out


def test_sampled_contamination_exact_for_small_docs(spark):
    """Docs with <= k shingles are scored exactly (the sample IS the set)."""
    df = _corpus(
        spark,
        [
            (1, "A", "a b c d"),
            (2, "B", "a b c x"),
        ],
    )
    exact = {
        (r.doc_id, r.other_source): r.contamination
        for r in cross_source_contamination(df, "doc_id", "source", "text").collect()
    }
    est = {
        (r.doc_id, r.other_source): r.est_contamination
        for r in sampled_contamination(df, "doc_id", "source", "text", k=16).collect()
    }
    assert est == exact


def test_sampled_contamination_estimator_quality(spark):
    """Large docs: the bottom-k estimate must be exact at the extremes
    (full containment -> 1.0; zero overlap -> no row) and close on
    average for partial overlap. Deterministic: xxhash64 sampling has no
    RNG, so these values never flap."""
    # Reference source: one long doc holding tokens t0..t119 (118 shingles).
    ref_text = " ".join(f"t{i}" for i in range(120))
    rows = [(1000, "REF", ref_text)]
    # 8 fully-contained docs (40 contiguous ref tokens each)
    for d in range(8):
        toks = [f"t{i}" for i in range(d * 10, d * 10 + 40)]
        rows.append((d, "FULL", " ".join(toks)))
    # 8 half-contained docs: 20 ref tokens + 20 unique tokens (the splice
    # point creates 2 mixed shingles out of ~38 -> true containment ~0.5)
    for d in range(8):
        toks = [f"t{i}" for i in range(d * 10, d * 10 + 20)] + [
            f"u{d}_{j}" for j in range(20)
        ]
        rows.append((100 + d, "HALF", " ".join(toks)))
    # 4 disjoint docs
    for d in range(4):
        rows.append((200 + d, "NONE", " ".join(f"z{d}_{j}" for j in range(40))))
    df = _corpus(spark, rows)

    est = {
        (r.doc_id, r.other_source): r.est_contamination
        for r in sampled_contamination(df, "doc_id", "source", "text", k=16).collect()
    }
    exact = {
        (r.doc_id, r.other_source): r.contamination
        for r in cross_source_contamination(df, "doc_id", "source", "text").collect()
    }
    # extremes are exact
    for d in range(8):
        assert est[(d, "REF")] == 1.0
    for d in range(4):
        assert (200 + d, "REF") not in est
    # partial overlap: per-doc estimates are plausible, mean error small
    errs = []
    for d in range(8):
        key = (100 + d, "REF")
        assert 0.0 < est[key] <= 1.0
        errs.append(abs(est[key] - exact[key]))
    assert sum(errs) / len(errs) < 0.2


def test_sampled_contamination_deterministic(spark):
    df = _corpus(
        spark,
        [(i, f"S{i % 3}", " ".join(f"w{(i * 7 + j) % 40}" for j in range(30)))
         for i in range(12)],
    )
    a = sorted(map(tuple, sampled_contamination(df, "doc_id", "source", "text", k=8).collect()))
    b = sorted(map(tuple, sampled_contamination(df, "doc_id", "source", "text", k=8).collect()))
    assert a == b


def test_quality_classifier_learns_separating_weights(spark):
    """Tokens exclusive to positive sample docs get positive micro-weights,
    negative-exclusive tokens negative; scoring applies them and the
    logit>0 gate."""
    sample = spark.createDataFrame(
        [
            (1, "good clean prose here", 1),
            (2, "good solid text too", 1),
            (3, "spam junk spam junk", 0),
            (4, "junk noise spam", 0),
        ],
        ["doc_id", "text", "label"],
    )
    w = naive_bayes_hashed_weights(sample, "text", "label")
    bucket_of = {
        r.token: r.b
        for r in spark.createDataFrame(
            [("good",), ("spam",)], ["token"]
        ).select("token", hashed_token_bucket("token").alias("b")).collect()
    }
    weights = {r.b: r.w_micro for r in w.collect()}
    assert weights[bucket_of["good"]] > 0
    assert weights[bucket_of["spam"]] < 0

    docs = spark.createDataFrame(
        [
            (10, "good good clean"),
            (11, "spam spam junk junk"),
            (12, "entirely unseen tokens qqq"),  # no bucket in model
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in quality_scores(docs, w, "doc_id", "text").collect()}
    assert out[10].keep == 1 and out[10].sum_w_micro > 0
    assert out[11].keep == 0 and out[11].sum_w_micro < 0
    # doc 12: every token OOV -> no scored occurrences -> absent (fasttext
    # semantics: the model can only see its vocabulary)
    assert 12 not in out


def test_quality_scores_avg_logit_is_sum_over_count(spark):
    sample = spark.createDataFrame(
        [(1, "alpha beta", 1), (2, "gamma delta", 0)], ["doc_id", "text", "label"]
    )
    w = naive_bayes_hashed_weights(sample, "text", "label")
    docs = spark.createDataFrame([(5, "alpha alpha gamma")], ["doc_id", "text"])
    r = quality_scores(docs, w, "doc_id", "text").collect()[0]
    assert r.n_tokens == 3
    assert r.avg_logit == pytest.approx(r.sum_w_micro / 1e6 / 3, abs=0)


def test_survivorship_report_planted_dupes(spark):
    """Registry query at sf0.001 (500 docs): every planted copy (of docs
    with doc_id % 3 == 0) must be counted as a dupe of its own source; all
    originals survive; mix weights sum to 1."""
    from g_data_pipeline_spark.queries import REGISTRY
    from tests.conftest import SF_DIR_SMOKE

    rows = REGISTRY["d_survivorship_report"].fn(spark, SF_DIR_SMOKE).collect()
    assert sum(r.n_survivors for r in rows) == 500  # every original survives
    assert sum(r.n_dupes for r in rows) == 167  # one per planted copy
    for r in rows:
        assert r.n_docs == r.n_survivors + r.n_dupes
        assert r.survival_rate == pytest.approx(r.n_survivors / r.n_docs)
    assert sum(r.mix_weight for r in rows) == pytest.approx(1.0)


def test_decontaminate_spans_cuts_benchmark_text_surgically(spark):
    """The n-gram scrub (Brown et al. '20 shape): benchmark windows are
    cut from EVERY training doc occurrence, the clean remainder of a
    quoting doc survives, untouched docs pass through verbatim, and a
    doc that IS a benchmark item collapses to empty."""
    from g_data_pipeline_spark.operators.contamination import (
        decontaminate_spans,
    )

    W = 10
    words = lambda p, n: " ".join(f"{p}{k}" for k in range(n))  # noqa: E731
    bench_item = words("bench", W + 4)  # > W: contributes windows
    benchmark = spark.createDataFrame([(bench_item,)], "text string")
    docs = spark.createDataFrame(
        [
            (1, f"{words('a', 8)} {bench_item} {words('b', 8)}"),  # quotes it
            (2, words("clean", 30)),                               # untouched
            (3, bench_item),                                       # verbatim copy
        ],
        "doc_id long, text string",
    )
    cleaned, directory = decontaminate_spans(
        docs, benchmark, "doc_id", "text", window_tokens=W
    )
    got = {
        r.id: (r.dedup_text, r.n_tokens, r.n_tokens_kept)
        for r in cleaned.collect()
    }
    # every window of the benchmark item is in the directory
    assert directory.count() == 5  # (W+4) - W + 1
    # the quoting doc keeps its own prose, loses the quoted span
    assert got[1][0] == f"{words('a', 8)} {words('b', 8)}"
    assert got[1][2] == 16
    # clean doc verbatim (lowercased join), benchmark copy emptied
    assert got[2] == (words("clean", 30), 30, 30)
    assert got[3] == ("", W + 4, 0)
    # the directory is corpus-independent: re-cutting another shard
    # against the SAME directory needs no benchmark rescan
    shard2 = spark.createDataFrame(
        [(9, f"{bench_item} {words('z', 5)}")], "doc_id long, text string"
    )
    from g_data_pipeline_spark.operators.dedup import (
        incremental_substring_dedup,
    )

    cleaned2, _ = incremental_substring_dedup(
        shard2, directory, "doc_id", "text", W
    )
    assert cleaned2.collect()[0].dedup_text == words("z", 5)
