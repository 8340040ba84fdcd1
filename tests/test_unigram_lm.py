"""Unigram-LM tokenizer (operators/unigram_lm.py): Viterbi exactness,
training behavior (coverage guarantee, frequent-word promotion, vocab
cap), encode parity vs a pure-Python recompute, and determinism under
input layout."""

from __future__ import annotations

import math

from g_data_pipeline_spark.operators.tokenizer import word_counts
from g_data_pipeline_spark.operators.unigram_lm import (
    train_unigram,
    unigram_encode,
    viterbi_segment,
)


def test_viterbi_picks_max_logprob_path():
    logp = {"a": -3.0, "b": -3.0, "ab": -2.0, "abc": -9.0, "c": -3.0}
    # "ab" + "c" = -5.0 beats a+b+c = -9.0 and abc = -9.0
    assert viterbi_segment("abc", logp) == ["ab", "c"]


def test_viterbi_tie_prefers_longer_piece():
    logp = {"x": -1.0, "xx": -2.0}
    # xx == x+x score-wise (-2.0): the longer piece wins the tie
    assert viterbi_segment("xx", logp) == ["xx"]


def test_viterbi_unknown_char_is_unk_piece():
    segs = viterbi_segment("aQb", {"a": -1.0, "b": -1.0})
    assert segs == ["a", "Q", "b"]


def test_train_promotes_frequent_word_and_keeps_chars():
    counts = [("the", 500), ("them", 60), ("cat", 40), ("dog", 3)]
    model = train_unigram(counts, vocab_size=12, seed_size=60)
    assert "the" in model  # dominant word becomes one piece
    for ch in "thecadogm":
        assert ch in model  # single-char coverage never pruned
    assert sum(1 for p in model if len(p) > 1) <= 12
    # log-probs normalize to a distribution
    assert abs(sum(math.exp(lp) for lp in model.values()) - 1.0) < 1e-9
    assert viterbi_segment("the", model) == ["the"]


def test_encode_matches_python_twin_and_layout_invariance(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the them theme"),
        (3, ""),
        (4, "dog dog dog unknownZZword"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    counts = word_counts(df, "text")
    model = train_unigram(counts, vocab_size=20, seed_size=100)

    got = {
        r.id: (r.n_words, r.n_pieces, r.n_unk)
        for r in unigram_encode(df, "doc_id", "text", model).collect()
    }
    # pure-Python twin over the same model
    import re

    ws = re.compile(r"\s+", re.ASCII)
    for did, text in rows:
        words = [w for w in ws.split(text.lower()) if w]
        pieces = [p for w in words for p in viterbi_segment(w, model)]
        unk = sum(1 for p in pieces if p not in model)
        assert got[did] == (len(words), len(pieces), unk), did
    # layout invariance: training from a repartitioned frame is identical
    model2 = train_unigram(
        word_counts(df.repartition(7), "text"), vocab_size=20, seed_size=100
    )
    assert model2 == model


def test_viterbi_achieves_bruteforce_optimum():
    """Property: the DP's segmentation score equals the brute-force
    optimum over ALL segmentations (pieces from a small closed alphabet,
    every word coverable by single chars)."""
    import itertools

    pieces = {
        "a": -2.0, "b": -2.5, "ab": -3.0, "ba": -1.5,
        "aa": -4.0, "abb": -3.5, "bb": -5.0,
    }

    def brute(word):
        def splits(w):
            if not w:
                yield []
                return
            for k in range(1, min(len(w), 8) + 1):
                head, rest = w[:k], w[k:]
                if head in pieces:
                    for tail in splits(rest):
                        yield [head] + tail

        return max(
            (sum(pieces[p] for p in seg) for seg in splits(word)),
        )

    for n in range(1, 7):
        for word in ("".join(t) for t in itertools.product("ab", repeat=n)):
            got = viterbi_segment(word, pieces)
            assert sum(pieces[p] for p in got) == brute(word), word
