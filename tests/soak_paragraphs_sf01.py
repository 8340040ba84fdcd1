"""sf0.1-volume soak of the incremental-paragraph STREAM (r8 verdict
#9): five crawl dumps, each the full sf0.1 documents table (5,000 docs,
re-id'd per dump) with a planted cross-dump boilerplate footer, driven
through paragraph_dedup_stream (txn as-of protocol, exactly-once) with
directory maintenance between dumps. Records per-dump wall time and
directory growth — the evidence behind the bounded-directories claim at
10x the fixture scale (results table in ROTATION.md).

Not a pytest file (minutes of wall time): ``python
tests/soak_paragraphs_sf01.py [sf_dir]``.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RETAIN, MAXF = 3, 8


def main() -> int:
    from g_data_pipeline_spark.operators.incremental_paragraphs import (
        paragraph_dedup_stream,
    )
    from g_data_pipeline_spark.sources import txn

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="soak_paras_")
    src = f"{work}/dumps"
    dir_table = f"{work}/para_directory"
    out_table = f"{work}/clean_docs"
    ckpt = f"{work}/ckpt"

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    footer = (
        "subscribe to the example network newsletter for daily updates "
        "and exclusive member offers"
    )

    def dump(b: int):
        # bodies are dump-UNIQUE (real growth: ~5k new paragraph hashes
        # per dump, so compaction genuinely fires); the footer is shared
        # across dumps (real cross-dump cuts on every dump after the
        # first)
        return docs.select(
            (F.col("doc_id") + F.lit(b * 10_000_000)).alias("doc_id"),
            F.when(
                (F.col("doc_id") % 3) == 0,
                F.concat(
                    F.lit(f"dump {b} edition: "),
                    F.col("text"),
                    F.lit("\n\n" + footer),
                ),
            )
            .otherwise(F.concat(F.lit(f"dump {b} edition: "), F.col("text")))
            .alias("text"),
        )

    print(f"soak: {n_docs} docs/dump x 5 dumps from {SF_DIR}")
    results = []
    for b in range(5):
        dump(b).write.mode("append").parquet(src)
        t0 = time.time()
        stream = spark.readStream.schema("doc_id long, text string").parquet(
            src
        )
        paragraph_dedup_stream(
            stream, dir_table, out_table, ckpt, timeout_s=600
        )
        wall = time.time() - t0
        m0 = txn.maintain_table(
            spark, dir_table, retain_versions=RETAIN, max_files=MAXF
        )
        dir_rows = txn.read_committed(spark, dir_table).count()
        out_rows = txn.read_committed(spark, out_table).count()
        n_manifests = len(txn._manifest_versions(spark, dir_table))
        n_files = len(
            txn._load_manifest(
                spark, dir_table, txn.latest_version(spark, dir_table)
            )["files"]
        )
        results.append(
            (b, wall, dir_rows, out_rows, n_manifests, n_files, bool(m0.get("compacted")))
        )
        print(
            f"dump {b}: wall={wall:.1f}s dir_rows={dir_rows} "
            f"out_rows={out_rows} manifests={n_manifests} "
            f"files={n_files} compacted={bool(m0.get('compacted'))}"
        )

    ok = True
    # bounded directories: manifests <= RETAIN, snapshot files <= MAXF
    # (maintenance runs AFTER the count probes above, so the recorded
    # numbers show pre-tick growth; the bound holds at every tick)
    ok &= all(r[4] <= RETAIN and r[5] <= MAXF for r in results)
    # exactly-once: out rows == docs processed so far
    ok &= all(r[3] == (r[0] + 1) * n_docs for r in results)
    # the shared footer is archived once: each dump adds at most its
    # unique body paragraphs (never the footer again)
    grows = [results[i][2] - results[i - 1][2] for i in range(1, 5)]
    ok &= all(0 < g <= n_docs for g in grows)
    print("RESULT:", "PASS" if ok else "FAIL")
    shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
