"""Scratch A/B (r10 guide §1): contamination-fraction shapes in one JVM.

V0 = r10-close shape (global distinct + directory join + sizes join).
V1 = window shape (row-local distinct, carried n_shingles, collect_set
     window over one shingle-keyed exchange).
V2 = row-local distinct + carried n_shingles + distinct-directory join.
V3 = V2 with a SHUFFLE_HASH hint on the directory side.

Prints warm / best-of-3 repeats / fresh for each, plus row counts so the
variants are proven to agree.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from g_data_pipeline_spark.catalog import load_table  # noqa: E402
from g_data_pipeline_spark.functions.text import word_shingles  # noqa: E402
from g_data_pipeline_spark.session import get_spark  # noqa: E402

ID, SRC, TXT, N = "doc_id", "source", "text", 3


def v0(docs: DataFrame) -> DataFrame:
    posts = docs.select(
        ID, SRC, F.explode(word_shingles(TXT, N)).alias("s")
    ).distinct()
    sizes = posts.groupBy(ID).agg(F.count(F.lit(1)).alias("n_shingles"))
    directory = posts.select(F.col(SRC).alias("other_source"), "s").distinct()
    hits = (
        posts.join(directory, "s")
        .filter(F.col("other_source") != F.col(SRC))
        .groupBy(ID, SRC, "other_source")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
    )
    return hits.join(sizes, ID).select(
        ID, SRC, "other_source", "n_shingles", "shared_shingles",
        (F.col("shared_shingles").cast("double") / F.col("n_shingles")).alias("contamination"),
    )


def _posts_local(docs: DataFrame) -> DataFrame:
    sh = F.array_distinct(word_shingles(TXT, N))
    staged = docs.select(F.col(ID), F.col(SRC), sh.alias("__sh"))
    return staged.select(
        ID, SRC,
        F.size("__sh").cast("long").alias("n_shingles"),
        F.explode("__sh").alias("s"),
    )


def v1(docs: DataFrame) -> DataFrame:
    posts = _posts_local(docs)
    srcs = F.collect_set(SRC).over(Window.partitionBy("s"))
    return (
        posts.withColumn("__srcs", srcs)
        .select(ID, SRC, "n_shingles", F.explode("__srcs").alias("other_source"))
        .filter(F.col("other_source") != F.col(SRC))
        .groupBy(ID, SRC, "other_source", "n_shingles")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .select(
            ID, SRC, "other_source", "n_shingles", "shared_shingles",
            (F.col("shared_shingles").cast("double") / F.col("n_shingles")).alias("contamination"),
        )
    )


def _v2(docs: DataFrame, hint: str | None) -> DataFrame:
    posts = _posts_local(docs)
    directory = posts.select(F.col(SRC).alias("other_source"), "s").distinct()
    if hint:
        directory = directory.hint(hint)
    return (
        posts.join(directory, "s")
        .filter(F.col("other_source") != F.col(SRC))
        .groupBy(ID, SRC, "other_source", "n_shingles")
        .agg(F.count(F.lit(1)).alias("shared_shingles"))
        .select(
            ID, SRC, "other_source", "n_shingles", "shared_shingles",
            (F.col("shared_shingles").cast("double") / F.col("n_shingles")).alias("contamination"),
        )
    )


def main() -> None:
    spark = get_spark(app_name="exp-contam")
    docs = load_table(spark, "/root/testdata/sf0.1", "documents")
    builders = {
        "v0_old": lambda: v0(docs),
        "v1_window": lambda: v1(docs),
        "v2_join": lambda: _v2(docs, None),
        "v3_shj": lambda: _v2(docs, "shuffle_hash"),
    }
    sigs = {}
    for name, b in builders.items():
        spark.sparkContext.setJobDescription(f"contam:{name}")
        t0 = time.perf_counter()
        df = b()
        rows = df.collect()
        warm = time.perf_counter() - t0
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        t0 = time.perf_counter()
        b().collect()
        fresh = time.perf_counter() - t0
        sigs[name] = sorted(
            (r[0], r[1], r[2], r[3], r[4]) for r in rows
        )
        print(
            f"{name}: warm={warm:.3f} best_repeat={best:.3f} "
            f"fresh={fresh:.3f} nrows={len(rows)}"
        )
    base = sigs["v0_old"]
    for name, s in sigs.items():
        print(f"{name} rows == v0_old: {s == base}")


if __name__ == "__main__":
    main()
