"""Exact PARAGRAPH-level dedup — the Dolma corpus rule (Soldaini et
al. '24: documents are kept, but a paragraph whose exact text already
occurred anywhere in the corpus is removed; first occurrence wins).
Paragraph granularity sits between document-level exact dedup
(operators/dedup.exact_dedup) and token-window substring dedup (Lee
'21): it kills cross-site boilerplate blocks (navigation, subscribe
footers, license blurbs) without cutting inside sentences.

Spark-first shape: one posexplode on the paragraph split, one
content-hash-keyed window for first-occurrence survivorship (never
all-pairs), one per-doc rollup that reassembles survivors in original
order. All wide ops key on md5(paragraph) content or doc id. Oracle
twin: query_defs/curation9.py (`d_paragraph_dedup`) — lockstep
unnest + the same (doc, pos) window in DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PARA_SEP = "\n\n"
LINE_SEP = "\n"


def _explode_units(
    df: DataFrame, id_col: str, text_col: str, sep: str, unit_name: str
) -> DataFrame:
    """(id, pos, <unit>) rows — one per separator-delimited unit.
    ``sep`` must be a regex-free literal (it is reused verbatim as the
    reassembly joiner). NULL text coalesces to '' so every input doc
    contributes at least one (empty) unit (r8 ADVICE)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(
            F.split(F.coalesce(F.col(text_col), F.lit("")), sep)
        ).alias("pos", unit_name),
    )


def dedup_paragraphs(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Remove corpus-duplicated paragraphs, keep first occurrence by
    (doc id, position). Returns one row per input doc:
    ``(id, n_paragraphs, n_removed, cleaned)`` — ``cleaned`` is the
    surviving paragraphs rejoined with the blank-line separator (''
    for a fully-boilerplate doc — pinned to the empty string on both
    engines, the array_join-vs-NULL oracle gotcha).

    Blank paragraphs (consecutive separators) participate like any
    other content: they hash equal everywhere, so only the very first
    blank in the corpus survives — consistent with the exact-match
    contract (Dolma normalizes upstream; pass pre-normalized text).

    NULL text coalesces to '' before the split (split(NULL) is NULL
    and posexplode would silently drop the doc, breaking the
    one-row-per-input-doc contract — r8 ADVICE); a NULL-text doc
    therefore contributes one empty paragraph, like an empty doc."""
    paras = _explode_units(df, id_col, text_col, PARA_SEP, "para")
    w = Window.partitionBy(F.md5(F.col("para"))).orderBy("id", "pos")
    ranked = paras.withColumn("__rk", F.row_number().over(w))
    kept_agg = (
        ranked.groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_paragraphs"),
            F.sum((F.col("__rk") > 1).cast("int"))
            .cast("long")
            .alias("n_removed"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("__rk") == 1,
                                F.struct("pos", "para"),
                            )
                        )
                    ),
                    lambda x: x["para"],
                ),
                PARA_SEP,
            ).alias("cleaned"),
        )
    )
    return df.select(F.col(id_col).alias("id")).join(kept_agg, "id")


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = LINE_SEP,
    min_docs: int = 3,
) -> DataFrame:
    """Cross-document boilerplate-line REMOVAL — CCNet's actual rule
    (Wenzek et al. '20 §3.1: drop lines that occur verbatim in many
    documents — navigation menus, cookie banners, subscribe footers;
    the reporting half is query_defs/curation5.py d_boilerplate_lines).
    Unlike :func:`dedup_paragraphs`' first-occurrence-wins contract,
    EVERY occurrence of a unit appearing in >= ``min_docs`` DISTINCT
    docs is cut (the first doc is no more legitimate an owner of a
    cookie banner than the last).

    Returns one row per input doc: ``(id, n_lines, n_removed,
    cleaned)`` — ``cleaned`` is the surviving units rejoined with
    ``sep`` ('' for a fully-boilerplate doc, pinned on both engines).

    Scale shape: one posexplode, one md5(unit)-keyed COUNT(DISTINCT id)
    aggregate (two-phase partial agg), one content-keyed join back, one
    per-doc rollup — never all-pairs; the frequency side is bounded by
    the number of distinct lines, not docs x lines. ``sep`` is a
    regex-free literal (split pattern + reassembly joiner)."""
    units = _explode_units(df, id_col, text_col, sep, "line").withColumn(
        "h", F.md5(F.col("line"))
    )
    freq = units.groupBy("h").agg(
        F.count_distinct("id").alias("__nd")
    )
    flagged = units.join(freq, "h")
    out = flagged.groupBy("id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum((F.col("__nd") >= min_docs).cast("int"))
        .cast("long")
        .alias("n_removed"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("__nd") < min_docs,
                            F.struct("pos", "line"),
                        )
                    )
                ),
                lambda x: x["line"],
            ),
            sep,
        ).alias("cleaned"),
    )
    return df.select(F.col(id_col).alias("id")).join(out, "id")
