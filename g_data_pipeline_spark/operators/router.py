"""Corpus routing — the front door of a multi-pipeline curation stack
(the Dolma/RedPajama shape: code, conversational, and prose documents
flow through DIFFERENT cleaning stacks; mis-routed docs get the wrong
gates). One scan-stage decision per document composed from the
engine's own signal families:

  code   — functions/code.code_signals (symbol density / indentation /
           fences), the Stack-style detector;
  chat   — dialogue markers: speaker-prefixed lines ("name:", "Q:/A:",
           chat-template tokens) on a meaningful share of lines;
  low_quality — the curate_documents gates (too short / digit-heavy);
  prose  — everything else (the default pretraining pipeline).

Priority is explicit and documented: low_quality fires first (no
pipeline wants it); an EXPLICIT chat-template token outranks the code
heuristic (`<|im_start|>` markers are themselves symbol-dense — the
exact-marker evidence beats the density heuristic); then code; then
turn-shaped chat; then prose — a fenced code file with a stray "a:"
line still routes to code. Zero shuffles, zero UDFs; the rollup is one
keyed aggregate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.code import code_signals
from g_data_pipeline_spark.functions.text import token_count

#: line starts that look like dialogue turns
_CHAT_LINE = r"^\s*([A-Za-z][A-Za-z0-9_ ]{0,15}:|[QA]:|<\|im_start\|>|>)"


def chat_signals(text: Column) -> dict[str, Column]:
    """Dialogue detection signals: share of lines that open like a
    speaker turn, plus explicit chat-template token presence."""
    lines = F.split(text, "\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    n_turnish = F.size(F.filter(lines, lambda ln: ln.rlike(_CHAT_LINE)))
    share = n_turnish * F.lit(1_000_000)
    return {
        "turn_line_share_micro": (
            (share - F.pmod(share, n_lines)) / n_lines
        ).cast("long"),
        "has_template_tokens": text.contains("<|im_start|>"),
    }


def route_documents(
    df: DataFrame,
    text_col: str = "text",
    min_tokens: int = 10,
    max_digit_ratio: float = 0.3,
    chat_share_micro: int = 400_000,
) -> DataFrame:
    """Label every document with its pipeline ``route``:
    ``low_quality`` -> ``code`` -> ``chat`` -> ``prose`` (first match,
    see module docstring for the priority argument). Adds the deciding
    signals so the routing is auditable. Row-local; write the result
    ``partitionBy("route")`` and each downstream pipeline reads only
    its partition."""
    from g_data_pipeline_spark.functions.text import quality_features

    code = code_signals(F.col(text_col))
    chat = chat_signals(F.col(text_col))
    q = quality_features(text_col)
    n_tok = token_count(text_col).cast("long")
    digit_ratio = F.coalesce(q["digit_ratio"], F.lit(0.0))
    route = (
        F.when(
            (n_tok < F.lit(int(min_tokens)))
            | (digit_ratio > F.lit(float(max_digit_ratio))),
            F.lit("low_quality"),
        )
        .when(chat["has_template_tokens"], F.lit("chat"))
        .when(code["is_code_like"], F.lit("code"))
        .when(
            chat["turn_line_share_micro"] >= F.lit(int(chat_share_micro)),
            F.lit("chat"),
        )
        .otherwise(F.lit("prose"))
    )
    return df.select(
        "*",
        n_tok.alias("n_tokens"),
        code["is_code_like"].alias("is_code_like"),
        chat["turn_line_share_micro"].alias("turn_line_share_micro"),
        chat["has_template_tokens"].alias("has_template_tokens"),
        route.alias("route"),
    )


def routing_report(
    df: DataFrame,
    text_col: str = "text",
    group_cols: list[str] | None = None,
    **kw,
) -> DataFrame:
    """Per-(group, route) composition: document and token counts — the
    dashboard row that says how much of each source is code vs chat vs
    prose vs waste. One keyed aggregate over the row-local labels."""
    routed = route_documents(df, text_col, **kw)
    keys = [*(group_cols or []), "route"]
    return routed.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("n_tokens"),
    )
