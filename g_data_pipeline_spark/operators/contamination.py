"""Cross-source contamination measurement: for each document, what
fraction of its word n-gram shingles also occurs in each OTHER source.

The doc-level sibling of ``query_defs/dedup.py``'s source-pair overlap
matrix, and the per-document evidence behind decontamination decisions
(``operators/dedup.py::decontaminate`` removes; this MEASURES, so a
curation run can rank and audit before it deletes). The reference has no
corpus operators at all (SURVEY.md §2 "Not implemented"); both paths here
are Spark-first compositions.

Two paths, one semantics:

- :func:`cross_source_contamination` — EXACT: one shingle-keyed exchange
  attaches each post's source SET (collect_set window); a shingle fans
  out to at most n_sources rows independent of corpus row count (same
  argument as the source overlap matrix) — correct at any scale, but the
  shuffle volume is every post in the corpus.
- :func:`sampled_contamination` — the sketch option: per document, keep
  only the k shingles with the smallest ``xxhash64`` (a bottom-k MinHash
  sample — uniform over the doc's shingle set, deterministic, no RNG).
  The directory join then sees at most k rows per document instead of
  every shingle, cutting join volume by |doc|/k while the hit fraction
  over the sample is an unbiased estimate of the exact containment.
  WindowGroupLimit prunes the per-doc top-k before the shuffle; accuracy
  vs the exact path is pinned by tests/test_contamination.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from g_data_pipeline_spark.functions.text import word_shingles


def shingle_posts(
    df: DataFrame, id_col: str, source_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Distinct (id, source, shingle) posting rows — one row per distinct
    word n-gram per document. Documents with fewer than ``n`` tokens
    contribute nothing (word_shingles yields an empty array)."""
    return df.select(
        id_col, source_col, F.explode(word_shingles(text_col, n)).alias("s")
    ).distinct()


def _directory(posts: DataFrame, source_col: str) -> DataFrame:
    """Distinct (source, shingle) membership directory."""
    return posts.select(
        F.col(source_col).alias("other_source"), "s"
    ).distinct()


def _hit_fractions(
    doc_side: DataFrame,
    directory: DataFrame,
    sizes: DataFrame,
    id_col: str,
    source_col: str,
    size_col: str,
    frac_col: str,
) -> DataFrame:
    hits = (
        doc_side.join(directory, "s")
        .filter(F.col("other_source") != F.col(source_col))
        .groupBy(id_col, source_col, "other_source")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    return hits.join(sizes, id_col).select(
        id_col,
        source_col,
        "other_source",
        size_col,
        "shared_shingles",
        (
            F.col("shared_shingles").cast("double") / F.col(size_col)
        ).alias(frac_col),
    )


def cross_source_contamination(
    df: DataFrame, id_col: str, source_col: str, text_col: str, n: int = 3
) -> DataFrame:
    """Exact per-document containment in every other source:
    ``[id, source, other_source, n_shingles, shared_shingles,
    contamination]`` where contamination = shared / n_shingles (the
    fraction of the doc's distinct shingles that the other source also
    contains — length-normalized, so long documents aren't inflated).
    Pairs with zero overlap are absent (sparse output).

    Shape (optimization r10, guide §2.3/§2.4): the per-document shingle
    dedup is ROW-LOCAL (``array_distinct`` — the old global ``.distinct()``
    exchange only ever removed within-document repeats, because doc ids are
    unique), ``n_shingles`` rides the explode as one int (the old
    per-doc-count aggregate + join re-derived it from the posts), and the
    source directory is a ``collect_set`` window over ONE shingle-keyed
    exchange instead of a distinct-directory self-join (two more exchanges
    carrying every post). 2 exchanges total — the content-keyed post
    shuffle and the per-(doc, other_source) partial-aggregated count —
    never all-pairs; the window's per-partition state is bounded by
    n_sources per shingle."""
    sh = F.array_distinct(word_shingles(text_col, n))
    staged = df.select(F.col(id_col), F.col(source_col), sh.alias("__sh"))
    posts = staged.select(
        id_col,
        source_col,
        F.size("__sh").cast("long").alias("n_shingles"),
        F.explode("__sh").alias("s"),
    )
    srcs = F.collect_set(source_col).over(Window.partitionBy("s"))
    return (
        posts.withColumn("__srcs", srcs)
        .select(
            id_col,
            source_col,
            "n_shingles",
            F.explode("__srcs").alias("other_source"),
        )
        .filter(F.col("other_source") != F.col(source_col))
        .groupBy(id_col, source_col, "other_source", "n_shingles")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .select(
            id_col,
            source_col,
            "other_source",
            "n_shingles",
            "shared_shingles",
            (
                F.col("shared_shingles").cast("double") / F.col("n_shingles")
            ).alias("contamination"),
        )
    )


def sampled_contamination(
    df: DataFrame,
    id_col: str,
    source_col: str,
    text_col: str,
    n: int = 3,
    k: int = 16,
    seed: int = 7,
) -> DataFrame:
    """Bottom-k MinHash estimate of :func:`cross_source_contamination`:
    ``[id, source, other_source, n_sampled, shared_shingles,
    est_contamination]``. Each document contributes only its k
    smallest-hashed shingles to the directory join (unbiased uniform
    sample of its shingle set); ``est_contamination`` = hits / n_sampled.
    Documents with <= k shingles are scored exactly. The directory itself
    stays exact — the sketch thins the (much larger) per-document side."""
    posts = shingle_posts(df, id_col, source_col, text_col, n)
    w = Window.partitionBy(id_col).orderBy(
        F.xxhash64("s", F.lit(seed)), F.col("s")
    )
    sampled = (
        posts.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__rn")
    )
    sizes = sampled.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sampled"))
    return _hit_fractions(
        sampled,
        _directory(posts, source_col),
        sizes,
        id_col,
        source_col,
        "n_sampled",
        "est_contamination",
    )


def decontaminate_spans(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    bench_text_col: str | None = None,
    window_tokens: int = 13,
) -> tuple["DataFrame", "DataFrame"]:
    """SURGICAL decontamination: CUT every benchmark-overlapping token
    window out of the training documents instead of dropping whole docs
    — the FLAN/GPT-3-style n-gram scrub (Brown et al. '20 removed
    13-gram collisions with eval sets; ``dedup.decontaminate`` is the
    document-DROP sibling, this keeps the clean remainder of a long doc
    that merely quotes a benchmark item).

    Pure reuse of the substring-dedup machinery: the benchmark's sliding
    ``window_tokens``-token hash windows become the cut DIRECTORY
    (operators/dedup.substring_window_directory) and the corpus is cut
    against it (operators/dedup.incremental_substring_dedup — history
    wins, so EVERY occurrence of benchmark text is removed; the linear
    merged-interval reassembly applies). Benchmark items shorter than
    the window contribute no windows — pair with the shingle-level
    ``dedup.decontaminate`` gate for very short eval items.

    Returns ``(cleaned, directory)``: the total labeling (id,
    dedup_text, n_tokens, n_tokens_kept) and the benchmark window
    directory (reusable across corpus shards — at 100 TB land it
    bucketed by ``h`` so only the corpus side ever shuffles).
    """
    from g_data_pipeline_spark.operators.dedup import (
        incremental_substring_dedup,
        substring_window_directory,
    )

    bcol = bench_text_col or text_col
    directory = substring_window_directory(
        benchmark.select(
            F.lit(-1).cast("long").alias("__bench_id"),
            F.col(bcol).alias("__bench_text"),
        ),
        "__bench_id",
        "__bench_text",
        window_tokens,
    )
    cleaned, _delta = incremental_substring_dedup(
        docs, directory, id_col, text_col, window_tokens
    )
    return cleaned, directory
