"""Unigram-LM subword tokenizer (Kudo '18 — the SentencePiece default
for modern LLM pipelines), as the same hybrid shape as the BPE trainer
in operators/tokenizer.py:

1. **Distributed pass** — the SAME capped (word, count) table
   (tokenizer.word_counts: one corpus groupBy, deterministic cap).
2. **Driver-side training** — seed a substring vocabulary from the
   compact word table, then alternate hard-EM (Viterbi re-segmentation
   under current piece log-probs, expected counts weighted by word
   frequency) with pruning (drop the lowest-probability multi-char
   pieces) until the target vocabulary size. Single characters are
   never pruned, so every word stays segmentable. Pure Python over
   ~10^4 rows; the corpus is never rescanned.
3. **Distributed encode** — broadcast the (piece -> logp) model, apply
   Viterbi per word via ``mapInPandas`` (Arrow-batched, per-batch word
   cache), emitting the per-document token-budget counters.

Determinism: every argmax breaks ties explicitly — seed selection by
(count desc, piece asc), Viterbi by (score, piece length, piece) — so
the learned vocabulary and every segmentation are pure functions of the
word-count table, reproducible across runs, partitionings, and the
exact-Python test twin (tests/test_unigram_lm.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MAX_PIECE_LEN = 8


def seed_vocab(
    counts: list[tuple[str, int]],
    seed_size: int = 2000,
    max_piece_len: int = MAX_PIECE_LEN,
) -> dict[str, int]:
    """Candidate pieces: every substring (length <= max_piece_len) of
    every counted word, scored by total occurrences. ALL single
    characters are kept (coverage guarantee); the multi-char tail is
    capped at ``seed_size`` by (count desc, piece asc)."""
    sub: dict[str, int] = {}
    for w, c in counts:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(i + max_piece_len, n) + 1):
                p = w[i:j]
                sub[p] = sub.get(p, 0) + c
    chars = {p: c for p, c in sub.items() if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in sub.items() if len(p) > 1),
        key=lambda kv: (-kv[1], kv[0]),
    )[: max(0, seed_size - len(chars))]
    return {**chars, **dict(multi)}


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int = MAX_PIECE_LEN
) -> list[str]:
    """Best segmentation of ``word`` under piece log-probs: standard
    O(len x max_piece_len) DP. A character absent from the model is an
    UNK piece at a fixed heavy penalty (kept in the output so callers
    can count coverage gaps). On an exact score tie at an end position
    the LONGER piece wins (two candidates there always differ in
    length) — fully deterministic."""
    unk = -100.0
    n = len(word)
    best: list[float] = [0.0] + [-math.inf] * n
    back: list[tuple[int, str] | None] = [None] * (n + 1)
    for end in range(1, n + 1):
        cand: tuple[float, int, str] | None = None  # (score, start, piece)
        for start in range(max(0, end - max_piece_len), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                if len(piece) > 1:
                    continue
                lp = unk
            score = best[start] + lp
            # two candidates at one end position always have DIFFERENT
            # lengths (same length => same start => same piece), so the
            # only tie-break needed on equal score is: longer piece wins
            if (
                cand is None
                or score > cand[0]
                or (score == cand[0] and len(piece) > len(cand[2]))
            ):
                cand = (score, start, piece)
        assert cand is not None
        best[end] = cand[0]
        back[end] = (cand[1], cand[2])
    out: list[str] = []
    pos = n
    while pos > 0:
        start, piece = back[pos]  # type: ignore[misc]
        out.append(piece)
        pos = start
    return out[::-1]


def _estimate(
    counts: list[tuple[str, int]],
    vocab: dict[str, float],
    max_piece_len: int,
) -> dict[str, float]:
    """One hard-EM step: Viterbi counts weighted by word frequency ->
    renormalized log-probs. Pieces never used keep a floor count of 0
    and are dropped (single chars keep an epsilon so coverage holds)."""
    used: dict[str, float] = {}
    for w, c in counts:
        for piece in viterbi_segment(w, vocab, max_piece_len):
            used[piece] = used.get(piece, 0.0) + c
    for ch in (p for p in vocab if len(p) == 1):
        used.setdefault(ch, 0.5)  # epsilon: chars stay available
    total = sum(used.values())
    return {p: math.log(c / total) for p, c in used.items()}


def train_unigram(
    counts: list[tuple[str, int]],
    vocab_size: int = 500,
    seed_size: int = 2000,
    prune_factor: float = 0.75,
    max_piece_len: int = MAX_PIECE_LEN,
) -> dict[str, float]:
    """Train the unigram LM vocabulary: seed -> (EM, prune) rounds until
    at most ``vocab_size`` pieces remain (single chars never pruned,
    multi-char pieces drop lowest-log-prob first by (logp asc, piece
    desc) — i.e. keep by (logp desc, piece asc)). Returns piece ->
    log-prob, renormalized after the final prune."""
    seeds = seed_vocab(counts, seed_size, max_piece_len)
    total = sum(seeds.values())
    vocab = {p: math.log(c / total) for p, c in seeds.items()}
    while True:
        vocab = _estimate(counts, vocab, max_piece_len)
        n_multi = sum(1 for p in vocab if len(p) > 1)
        n_chars = len(vocab) - n_multi
        target_multi = max(0, vocab_size - n_chars)
        if n_multi <= target_multi:
            break
        keep = max(target_multi, int(n_multi * prune_factor))
        kept_multi = sorted(
            ((p, lp) for p, lp in vocab.items() if len(p) > 1),
            key=lambda kv: (-kv[1], kv[0]),
        )[:keep]
        vocab = {
            **{p: lp for p, lp in vocab.items() if len(p) == 1},
            **dict(kept_multi),
        }
    return _estimate(counts, vocab, max_piece_len)


def unigram_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    model: dict[str, float],
    max_piece_len: int = MAX_PIECE_LEN,
) -> DataFrame:
    """Encode documents -> (id, n_words, n_pieces, n_unk): per-document
    unigram-LM token budgets (``n_unk`` = characters outside the model —
    the script-coverage signal, the unigram twin of bpe_encode's
    ``n_unmerged``). Broadcast model; Arrow-batched; per-batch word
    cache; tokenization matches the training pass exactly (ASCII \\s+
    over lowercased text)."""
    schema = T.StructType(
        [
            T.StructField("id", T.LongType()),
            T.StructField("n_words", T.LongType()),
            T.StructField("n_pieces", T.LongType()),
            T.StructField("n_unk", T.LongType()),
        ]
    )

    def batches(it):
        import re as _re

        import pandas as pd

        ws = _re.compile(r"\s+", _re.ASCII)
        cache: dict[str, tuple[int, int]] = {}
        for pdf in it:
            rows = []
            for did, text in zip(pdf[id_col], pdf[text_col]):
                words = [w for w in ws.split(str(text or "").lower()) if w]
                n_pieces = n_unk = 0
                for w in words:
                    got = cache.get(w)
                    if got is None:
                        seg = viterbi_segment(w, model, max_piece_len)
                        got = (
                            len(seg),
                            sum(1 for s in seg if s not in model),
                        )
                        cache[w] = got
                    n_pieces += got[0]
                    n_unk += got[1]
                rows.append((int(did), len(words), n_pieces, n_unk))
            yield pd.DataFrame(
                rows, columns=["id", "n_words", "n_pieces", "n_unk"]
            )

    return df.select(id_col, text_col).mapInPandas(batches, schema)
