"""Seeded-random parity for the round-9 boilerplate/paragraph
transforms vs exact pure-Python references — the property layer above
the fixture tests (random corpora catch rule interactions the planted
fixtures don't): removal = distinct-doc floor over the WHOLE corpus,
reassembly preserves order, and the incremental two-dump decision
equals the full-corpus count restricted to the processed dumps."""

from __future__ import annotations

import random

from g_data_pipeline_spark.operators.incremental_boilerplate import (
    DIRECTORY_SCHEMA,
    incremental_boilerplate_lines,
)
from g_data_pipeline_spark.operators.paragraphs import (
    dedup_paragraphs,
    remove_boilerplate_lines,
)

NL = "\n"
SEP = "\n\n"


def _corpus(seed: int, n_docs: int = 12, vocab: int = 9):
    """Random line corpora from a tiny line vocabulary — heavy overlap
    by construction, so floors and first-occurrence rules all fire."""
    rng = random.Random(seed)
    lines = [f"line {chr(97 + i)} content" for i in range(vocab)]
    return [
        (i, NL.join(rng.choice(lines) for _ in range(rng.randint(1, 6))))
        for i in range(1, n_docs + 1)
    ]


def _py_removal(rows, min_docs=3):
    docs_per_line: dict[str, set] = {}
    for i, text in rows:
        for ln in text.split(NL):
            docs_per_line.setdefault(ln, set()).add(i)
    out = {}
    for i, text in rows:
        lines = text.split(NL)
        kept = [ln for ln in lines if len(docs_per_line[ln]) < min_docs]
        out[i] = (
            len(lines),
            len(lines) - len(kept),
            NL.join(kept),
        )
    return out


def test_removal_matches_python_reference(spark):
    for seed in (7, 41, 1999):
        rows = _corpus(seed)
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r.id: (r.n_lines, r.n_removed, r.cleaned)
            for r in remove_boilerplate_lines(df, "id", "text").collect()
        }
        assert got == _py_removal(rows), seed


def _py_paragraph_dedup(rows):
    seen: set[str] = set()
    out = {}
    for i, text in sorted(rows):
        paras = text.split(SEP)
        kept = []
        removed = 0
        for p in paras:
            if p in seen:
                removed += 1
            else:
                seen.add(p)
                kept.append(p)
        out[i] = (len(paras), removed, SEP.join(kept))
    return out


def test_paragraph_dedup_matches_python_reference(spark):
    for seed in (3, 88):
        rng = random.Random(seed)
        paras = [f"paragraph {c} body text" for c in "abcdef"]
        rows = [
            (
                i,
                SEP.join(
                    rng.choice(paras) for _ in range(rng.randint(1, 4))
                ),
            )
            for i in range(1, 11)
        ]
        df = spark.createDataFrame(rows, "id long, text string")
        got = {
            r.id: (r.n_paragraphs, r.n_removed, r.cleaned)
            for r in dedup_paragraphs(df, "id", "text").collect()
        }
        assert got == _py_paragraph_dedup(rows), seed


def test_incremental_decision_equals_full_corpus_count(spark):
    """For the second dump, cut iff the line's distinct-doc count over
    dump1 ∪ dump2 reaches the floor — the cap never changes a decision
    (the module-docstring proof, exercised on random corpora)."""
    for seed in (11, 202):
        rows = _corpus(seed, n_docs=14)
        d1, d2 = rows[:7], rows[7:]
        full_ref = _py_removal(rows)  # floor over d1 ∪ d2
        empty = spark.createDataFrame([], DIRECTORY_SCHEMA)
        df1 = spark.createDataFrame(d1, "id long, text string")
        df2 = spark.createDataFrame(d2, "id long, text string")
        _, delta = incremental_boilerplate_lines(df1, empty, "id", "text")
        cleaned2, _ = incremental_boilerplate_lines(
            df2, delta, "id", "text"
        )
        got = {
            r.id: (r.n_lines, r.n_removed, r.cleaned)
            for r in cleaned2.collect()
        }
        assert got == {i: full_ref[i] for i, _ in d2}, seed
