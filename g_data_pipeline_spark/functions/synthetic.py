"""Synthetic-text (AI-generation) contamination detection — the
post-2023 crawl-hygiene gate: web dumps increasingly contain LLM
output, and training on it degrades models (the model-collapse /
self-consumption concern, Shumailov et al. '23). The detectable slice
is marked by three families of artifacts, all cheap scan-stage regexes:

- chat TEMPLATE tokens that leak from scraped chat UIs or mis-rendered
  fine-tune exports (``<|im_start|>``, ``[INST]``, ``<|endoftext|>``);
- ASSISTANT-SPEAK phrases characteristic of aligned-model responses
  ("as an AI language model", knowledge-cutoff disclaimers, refusal
  framings);
- chat-UI artifacts copied along with the text ("Regenerate response",
  "Copy code").

This is a detector for *marked* synthetic text — fluent unmarked LLM
prose is not detectable by regex (that honest limitation is the
docstring of every production filter too; FineWeb/Dolma ship exactly
this artifact-list shape). Patterns are shared verbatim with the
DuckDB twin (query_defs/curation9.py t_synthetic_artifacts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Regex-escaped template tokens (matched against the RAW text — the
# tokens are case-exact by convention).
TEMPLATE_PATTERNS: tuple[str, ...] = (
    r"<\|im_start\|>",
    r"<\|im_end\|>",
    r"<\|assistant\|>",
    r"<\|user\|>",
    r"<\|system\|>",
    r"<\|endoftext\|>",
    r"\[INST\]",
    r"\[/INST\]",
)

# Literal phrases matched against lower(text).
ASSISTANT_PHRASES: tuple[str, ...] = (
    "as an ai language model",
    "as a large language model",
    "i cannot assist with",
    "i'm sorry, but i can",
    "as of my last knowledge update",
    "i do not have access to real-time",
    "i hope this helps!",
)

UI_ARTIFACTS: tuple[str, ...] = (
    "regenerate response",
    "copy code",
    "chatgpt said",
)


def _alt(patterns: tuple[str, ...]) -> str:
    return "(" + "|".join(patterns) + ")"


TEMPLATE_RE = _alt(TEMPLATE_PATTERNS)
PHRASE_RE = _alt(ASSISTANT_PHRASES)
UI_RE = _alt(UI_ARTIFACTS)


def synthetic_signals(col: Column | str) -> dict[str, Column]:
    """Per-document artifact counts + the suspect flag (any artifact).
    Three regexp_count passes, whole-stage-codegen'd."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.lower(c)
    template = F.regexp_count(c, F.lit(TEMPLATE_RE))
    phrase = F.regexp_count(lowered, F.lit(PHRASE_RE))
    ui = F.regexp_count(lowered, F.lit(UI_RE))
    return {
        "template_hits": template,
        "assistant_phrase_hits": phrase,
        "ui_artifact_hits": ui,
        "is_synthetic_suspect": (template + phrase + ui) > 0,
    }


def synthetic_report(
    df: DataFrame, text_col: str = "text", group_cols: list[str] | None = None
) -> DataFrame:
    """Per-group contamination rollup: doc count, docs hit per artifact
    family, suspect count and micro rate. One aggregate; all counts
    nonnegative so the micro floor-div is engine-exact."""
    sig = synthetic_signals(text_col)
    # __s derives from the three already-computed flag columns (not
    # sig['is_synthetic_suspect'], which would re-evaluate all three
    # regexp_count expressions a second time — r8 ADVICE).
    base = df.select(
        *(group_cols or []),
        (sig["template_hits"] > 0).cast("int").alias("__t"),
        (sig["assistant_phrase_hits"] > 0).cast("int").alias("__p"),
        (sig["ui_artifact_hits"] > 0).cast("int").alias("__u"),
    ).withColumn(
        "__s", F.greatest(F.col("__t"), F.col("__p"), F.col("__u"))
    )
    n = F.count(F.lit(1))
    s = F.sum("__s") * F.lit(1_000_000)
    aggs = [
        n.cast("long").alias("n_docs"),
        F.sum("__t").cast("long").alias("n_template_docs"),
        F.sum("__p").cast("long").alias("n_phrase_docs"),
        F.sum("__u").cast("long").alias("n_ui_docs"),
        F.sum("__s").cast("long").alias("n_suspect"),
        ((s - F.pmod(s, n)) / n).cast("long").alias("suspect_micro"),
    ]
    return (
        base.groupBy(*group_cols).agg(*aggs)
        if group_cols
        else base.agg(*aggs)
    )
