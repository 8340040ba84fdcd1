"""Hugging Face ``tokenizer.json`` interop (r8 verdict #5): export and
import the repo's trained BPE (operators/tokenizer.py) and unigram-LM
(operators/unigram_lm.py) models in the public huggingface/tokenizers
serialization schema, stdlib JSON only.

Why it matters at 100 TB: token budgets, packing, and fertility numbers
only mean something when counted under the PRODUCTION tokenizer. The
repo already round-trips subword-nmt ``merges.txt``; production models
ship as ``tokenizer.json`` — this module closes that loop in both
directions (train here -> consume in a serving stack, or bring a
production tokenizer.json and run every token-counting operator under
it; ``bpe_encode(..., load_hf_bpe(path))`` and
``unigram_encode(..., load_hf_unigram(path))`` need no retraining pass).

Schema notes (public format, stable since tokenizers 0.13):

- BPE model: ``{"type": "BPE", "vocab": {token: id}, "merges": [...]}``
  — merges serialized as ``"a b"`` strings historically and as
  ``["a", "b"]`` pairs since tokenizers 0.20; the loader accepts both,
  the exporter writes the string form (read by every version).
- Unigram model: ``{"type": "Unigram", "vocab": [[piece, logp], ...]}``
  — id order IS list order; the exporter sorts by (logp desc, piece
  asc) so the file is a deterministic function of the trained model.
- The exporter declares the repo's actual pre-processing
  (``Lowercase`` normalizer + ``WhitespaceSplit`` pre-tokenizer —
  functions/text.tokens) so a consumer reproduces the training-time
  tokenization; the BPE model keeps the standalone ``</w>``
  end-of-word SYMBOL convention of operators/tokenizer.py (exported as
  ordinary vocab entries, not an ``end_of_word_suffix``).
"""

from __future__ import annotations

import json

from g_data_pipeline_spark.operators.tokenizer import EOW

_SKELETON = {
    "version": "1.0",
    "truncation": None,
    "padding": None,
    "added_tokens": [],
    "normalizer": {"type": "Lowercase"},
    "pre_tokenizer": {"type": "WhitespaceSplit"},
    "post_processor": None,
    "decoder": None,
}


def bpe_vocab_from_merges(
    merges: list[tuple[str, str]], unk_token: str = "<unk>"
) -> dict[str, int]:
    """Deterministic ``token -> id`` table: unk first, then the alphabet
    (every base character occurring in any merge symbol plus the ``</w>``
    symbol, sorted), then one product token per merge in RANK order —
    the standard BPE id convention (merge rank == id order), so two
    exports of the same merge list are byte-identical."""
    alphabet: set[str] = {EOW}
    for a, b in merges:
        for sym in (a, b):
            alphabet.update(sym.replace(EOW, ""))
    vocab: dict[str, int] = {unk_token: 0}
    for tok in sorted(alphabet):
        vocab.setdefault(tok, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def save_hf_bpe(
    merges: list[tuple[str, str]], path: str, unk_token: str = "<unk>"
) -> None:
    """Write the trained merge list as an HF ``tokenizer.json`` (BPE
    model). Symbols may not contain spaces (the ``"a b"`` merge
    serialization — same restriction save_merges enforces)."""
    for a, b in merges:
        if " " in a or " " in b:
            raise ValueError(f"symbol contains a space: {(a, b)!r}")
    doc = {
        **_SKELETON,
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": unk_token,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": None,
            "fuse_unk": False,
            "byte_fallback": False,
            "vocab": bpe_vocab_from_merges(merges, unk_token),
            "merges": [f"{a} {b}" for a, b in merges],
        },
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=1)


def save_hf_unigram(model: dict[str, float], path: str) -> None:
    """Write a trained unigram-LM model (piece -> logp) as an HF
    ``tokenizer.json`` (Unigram model), pieces ordered by
    (logp desc, piece asc) — deterministic ids."""
    ordered = sorted(model.items(), key=lambda kv: (-kv[1], kv[0]))
    doc = {
        **_SKELETON,
        "model": {
            "type": "Unigram",
            "unk_id": None,
            "vocab": [[p, lp] for p, lp in ordered],
            "byte_fallback": False,
        },
    }
    with open(path, "w", encoding="utf-8") as f:
        json.dump(doc, f, ensure_ascii=False, indent=1)


def _model_section(path: str, expected_type: str) -> dict:
    with open(path, encoding="utf-8") as f:
        doc = json.load(f)
    model = doc.get("model")
    if not isinstance(model, dict) or "type" not in model:
        raise ValueError(f"{path}: no tokenizer model section")
    if model["type"] != expected_type:
        raise ValueError(
            f"{path}: model type {model['type']!r}, expected {expected_type!r}"
        )
    return model


def load_hf_bpe(path: str) -> list[tuple[str, str]]:
    """Read an HF ``tokenizer.json`` BPE model -> ordered merge list
    (plugs straight into ``bpe_encode``). Accepts both merge
    serializations (``"a b"`` strings and ``["a", "b"]`` pairs)."""
    model = _model_section(path, "BPE")
    merges: list[tuple[str, str]] = []
    for i, m in enumerate(model.get("merges", [])):
        if isinstance(m, str):
            parts = m.split(" ")
        else:
            parts = list(m)
        if len(parts) != 2:
            raise ValueError(f"{path}: merges[{i}] is not a pair: {m!r}")
        merges.append((parts[0], parts[1]))
    return merges


def load_hf_unigram(path: str) -> dict[str, float]:
    """Read an HF ``tokenizer.json`` Unigram model -> piece -> logp
    (plugs straight into ``unigram_encode``/``viterbi_segment``)."""
    model = _model_section(path, "Unigram")
    out: dict[str, float] = {}
    for i, entry in enumerate(model.get("vocab", [])):
        if len(entry) != 2:
            raise ValueError(f"{path}: vocab[{i}] is not [piece, logp]")
        out[str(entry[0])] = float(entry[1])
    return out


def load_hf_model(path: str):
    """Dispatch on the file's model type: returns ``("bpe", merges)`` or
    ``("unigram", piece_logp)``."""
    with open(path, encoding="utf-8") as f:
        kind = json.load(f).get("model", {}).get("type")
    if kind == "BPE":
        return "bpe", load_hf_bpe(path)
    if kind == "Unigram":
        return "unigram", load_hf_unigram(path)
    raise ValueError(f"{path}: unsupported tokenizer model type {kind!r}")
