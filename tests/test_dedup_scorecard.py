"""Dedup-modality scorecard pins (round 10): on a token-disjoint
controlled corpus (the r9 banding-fixture rule — non-planted bodies
share NO tokens) every modality scores precision 1, and recall
separates the modality classes: fingerprint sees only byte/normalized
copies, shingle/banded methods also see near variants."""

from __future__ import annotations

from pyspark.sql import functions as F

from g_data_pipeline_spark.operators.dedup_scorecard import (
    dedup_scorecard,
    exact_fingerprint_pairs,
    pair_confusion,
)

# 8 token-disjoint base docs (9 unique tokens each), ids 0..7
_BASES = [
    " ".join(f"w{d}x{i}" for i in range(9)) for d in range(8)
]


def _fixture(spark):
    rows = [(d, _BASES[d]) for d in range(8)]
    # byte copies of docs 0,1 -> ids 100,101
    rows += [(100, _BASES[0]), (101, _BASES[1])]
    # near variants (drop the last token) of docs 2,3 -> ids 102,103
    rows += [(102, " ".join(_BASES[2].split()[:-1]))]
    rows += [(103, " ".join(_BASES[3].split()[:-1]))]
    truth = [(0, 100), (1, 101), (2, 102), (3, 103)]
    return (
        spark.createDataFrame(rows, ["doc_id", "text"]),
        spark.createDataFrame(truth, ["id_a", "id_b"]),
    )


def test_scorecard_separates_modalities(spark):
    corpus, truth = _fixture(spark)
    out = {
        r.method: r
        for r in dedup_scorecard(corpus, truth, "doc_id", "text").collect()
    }
    assert set(out) == {
        "exact_fingerprint",
        "ngram_jaccard",
        "minhash_lsh",
        "simhash",
    }
    # token-disjoint bodies: NO false positives anywhere
    for m, r in out.items():
        assert r.fp == 0, (m, r)
        assert r.n_true_pairs == 4
    # fingerprint catches exactly the byte copies
    fp_row = out["exact_fingerprint"]
    assert (fp_row.tp, fp_row.fn) == (2, 2)
    assert fp_row.precision_micro == 1_000_000
    assert fp_row.recall_micro == 500_000
    # exact jaccard catches copies AND variants (J = 6/7 > 0.5)
    assert out["ngram_jaccard"].recall_micro == 1_000_000
    # banded minhash: within its S-curve of the jaccard row — at J=6/7
    # and 8x4 banding, miss probability is ~(1-(6/7)^4)^8 ~ 0.004/pair;
    # require at least the copies plus one variant
    assert out["minhash_lsh"].tp >= 3
    # simhash: byte copies are Hamming 0 — always caught
    assert out["simhash"].tp >= 2
    # f1 consistency: f1 = 2tp/(2tp+fp+fn), micro-rounded
    for r in out.values():
        want = round(1e6 * 2 * r.tp / (2 * r.tp + r.fp + r.fn))
        assert r.f1_micro == want


def test_fingerprint_pairs_group_fanout(spark):
    """A 3-way identical group yields (min, other) pairs only — 2 pairs,
    not the 3-pair closure (identity is transitive; the survivor view)."""
    df = spark.createDataFrame(
        [(5, "same body here"), (9, "same body here"), (7, "Same  body HERE")],
        ["doc_id", "text"],
    )
    pairs = {
        (r.id_a, r.id_b)
        for r in exact_fingerprint_pairs(df, "doc_id", "text").collect()
    }
    # normalization folds case/whitespace -> all three share one fp
    assert pairs == {(5, 7), (5, 9)}


def test_pair_confusion_empty_prediction(spark):
    truth = spark.createDataFrame([(1, 2)], ["id_a", "id_b"])
    empty = spark.createDataFrame([], "id_a long, id_b long")
    (row,) = pair_confusion(empty, truth, "nothing").collect()
    assert (row.tp, row.fp, row.fn) == (0, 0, 1)
    assert row.precision_micro == 0 and row.recall_micro == 0
    assert row.f1_micro == 0


def test_registry_entry_shape_and_planted_recall(spark):
    """The registry entry's planted classes: every modality but
    fingerprint recalls all planted pairs on the smoke corpus;
    fingerprint recalls exactly the byte-copy half."""
    from g_data_pipeline_spark.queries import REGISTRY
    from tests.conftest import SF_DIR_SMOKE

    out = {
        r.method: r
        for r in REGISTRY["d_dedup_scorecard"].fn(spark, SF_DIR_SMOKE).collect()
    }
    n_true = out["exact_fingerprint"].n_true_pairs
    assert n_true > 0
    assert all(r.n_true_pairs == n_true for r in out.values())
    assert out["ngram_jaccard"].fn == 0
    assert out["exact_fingerprint"].fn > 0  # variants invisible to fp
