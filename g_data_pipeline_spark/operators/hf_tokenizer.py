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
  The unigram export is fully HF-faithful (no end-of-word symbol).
- The exporter declares the repo's actual pre-processing
  (``Lowercase`` normalizer + ``WhitespaceSplit`` pre-tokenizer —
  functions/text.tokens).

End-of-word CONVENTIONS (r9 ADVICE — the two are NOT translatable):

- ``eow_mode="standalone"`` (repo default, subword-nmt style): words
  end in a separate ``</w>`` symbol. The real huggingface/tokenizers
  BPE never synthesizes such an input symbol, so a standalone-mode
  export is a REPO-INTERNAL round-trip format: loading it back here
  reproduces bpe_encode exactly, but a real HF consumer would leave
  every ``</w>`` merge dead and diverge. The exporter therefore keeps
  ``end_of_word_suffix: null`` and this caveat; use suffix mode for HF
  consumers.
- ``eow_mode="suffix"`` (HF ``end_of_word_suffix`` convention): train
  with ``learn_bpe(..., eow_mode="suffix")`` — the word-final char
  carries ``</w>`` from the start — and export with
  ``save_hf_bpe(..., eow_mode="suffix")``; the file declares
  ``end_of_word_suffix: "</w>"`` and an HF consumer reproduces
  ``bpe_encode(..., eow_mode="suffix")`` exactly (initial states and
  merge semantics match by construction).

A merge list learned under one convention CANNOT be rewritten into the
other (word-final merges have different pair structure — e.g. a
standalone-mode merge ``(ab, c)`` fires on word-final ``c`` while the
suffix-mode final symbol is ``c</w>``), which is why the loader
VALIDATES the file's convention against the caller's declared
``eow_mode`` and raises instead of silently miscounting (also for any
non-null ``continuing_subword_prefix`` — a GPT-2-style ``Ġ`` model
needs a different pre-tokenizer entirely).
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
    merges: list[tuple[str, str]],
    unk_token: str = "<unk>",
    eow_mode: str = "standalone",
) -> dict[str, int]:
    """Deterministic ``token -> id`` table: unk first, then the alphabet
    sorted, then one product token per merge in RANK order — the
    standard BPE id convention (merge rank == id order), so two exports
    of the same merge list are byte-identical. The alphabet is the
    INITIAL-symbol set derivable from the merges: in standalone mode the
    base characters plus the ``</w>`` symbol; in suffix mode the base
    characters plus every ``c</w>`` suffixed single char (a word-final
    char carries the suffix from the start, so those ARE initial
    symbols, never merge products)."""
    chars: set[str] = set()
    for a, b in merges:
        for sym in (a, b):
            chars.update(sym.replace(EOW, ""))
    if eow_mode == "standalone":
        alphabet = chars | {EOW}
    elif eow_mode == "suffix":
        alphabet = chars | {c + EOW for c in chars}
    else:
        raise ValueError(f"unknown eow_mode {eow_mode!r}")
    vocab: dict[str, int] = {unk_token: 0}
    for tok in sorted(alphabet):
        vocab.setdefault(tok, len(vocab))
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    return vocab


def save_hf_bpe(
    merges: list[tuple[str, str]],
    path: str,
    unk_token: str = "<unk>",
    eow_mode: str = "standalone",
) -> None:
    """Write the trained merge list as an HF ``tokenizer.json`` (BPE
    model). Symbols may not contain spaces (the ``"a b"`` merge
    serialization — same restriction save_merges enforces).

    ``eow_mode`` MUST match the mode the merges were learned under (see
    the module docstring): ``"standalone"`` writes the repo-internal
    round-trip format (``end_of_word_suffix: null``; a real HF consumer
    would leave ``</w>`` merges dead); ``"suffix"`` writes a genuinely
    HF-consumable file declaring ``end_of_word_suffix: "</w>"``. Suffix
    mode rejects merge lists that contain a standalone ``</w>`` part —
    proof the list was trained in the wrong mode."""
    for a, b in merges:
        if " " in a or " " in b:
            raise ValueError(f"symbol contains a space: {(a, b)!r}")
    if eow_mode == "suffix":
        for a, b in merges:
            for sym in (a, b):
                if sym == EOW or (EOW in sym and not sym.endswith(EOW)):
                    raise ValueError(
                        f"merge part {sym!r} is not in suffix convention — "
                        'these merges were learned with eow_mode="standalone"'
                    )
    elif eow_mode != "standalone":
        raise ValueError(f"unknown eow_mode {eow_mode!r}")
    doc = {
        **_SKELETON,
        "model": {
            "type": "BPE",
            "dropout": None,
            "unk_token": unk_token,
            "continuing_subword_prefix": None,
            "end_of_word_suffix": EOW if eow_mode == "suffix" else None,
            "fuse_unk": False,
            "byte_fallback": False,
            "vocab": bpe_vocab_from_merges(merges, unk_token, eow_mode),
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


def load_hf_bpe(
    path: str, eow_mode: str = "standalone"
) -> list[tuple[str, str]]:
    """Read an HF ``tokenizer.json`` BPE model -> ordered merge list
    (plugs straight into ``bpe_encode(..., eow_mode=...)``). Accepts
    both merge serializations (``"a b"`` strings and ``["a", "b"]``
    pairs).

    VALIDATES the file's conventions against the caller's (r9 ADVICE —
    previously a production BPE with ``end_of_word_suffix`` or
    ``continuing_subword_prefix`` loaded and silently miscounted):
    ``continuing_subword_prefix`` must be null (a GPT-2-style prefix
    model needs a different pre-tokenizer entirely), and the file's
    ``end_of_word_suffix`` must match ``eow_mode`` (null <->
    "standalone", ``</w>`` <-> "suffix")."""
    model = _model_section(path, "BPE")
    csp = model.get("continuing_subword_prefix")
    if csp is not None:
        raise ValueError(
            f"{path}: continuing_subword_prefix={csp!r} is not supported — "
            "this model's convention cannot be counted by bpe_encode"
        )
    suffix = model.get("end_of_word_suffix")
    expected = EOW if eow_mode == "suffix" else None
    if eow_mode not in ("standalone", "suffix"):
        raise ValueError(f"unknown eow_mode {eow_mode!r}")
    if suffix != expected:
        raise ValueError(
            f"{path}: end_of_word_suffix={suffix!r} does not match "
            f'eow_mode="{eow_mode}" (expected {expected!r}) — load with '
            "the matching eow_mode to avoid silent miscounting"
        )
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
    """Dispatch on the file's model type AND convention: returns
    ``("bpe", merges)`` (standalone-convention file),
    ``("bpe-suffix", merges)`` (``end_of_word_suffix: "</w>"`` file —
    pass ``eow_mode="suffix"`` to bpe_encode), or
    ``("unigram", piece_logp)``."""
    with open(path, encoding="utf-8") as f:
        model = json.load(f).get("model", {})
    kind = model.get("type")
    if kind == "BPE":
        if model.get("end_of_word_suffix") == EOW:
            return "bpe-suffix", load_hf_bpe(path, eow_mode="suffix")
        return "bpe", load_hf_bpe(path)
    if kind == "Unigram":
        return "unigram", load_hf_unigram(path)
    raise ValueError(f"{path}: unsupported tokenizer model type {kind!r}")
