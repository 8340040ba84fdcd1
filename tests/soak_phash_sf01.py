"""sf0.1-volume soak of the incremental pHash near-dup STREAM (round
10): five image dumps, each fabricated from the full sf0.1 documents
table's ids (5,000 structured images, re-id'd per dump) — every dump
after the first consists ENTIRELY of one-bit variants of dump 0's
images, so the archive must label them all dup while growing only on
dump 0 and on each dump's small fresh-content slice. Directory
maintenance runs between dumps; records per-dump wall time and
directory growth — the bounded-archive evidence for the image modality
at 10x the fixture scale (results table in ROTATION.md).

Not a pytest file (minutes of wall time): ``python
tests/soak_phash_sf01.py [sf_dir]``.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time
from pathlib import Path

# self-contained: `python tests/soak_phash_sf01.py` puts tests/ (not the
# repo root) on sys.path
_ROOT = str(Path(__file__).resolve().parent.parent)
if _ROOT not in sys.path:
    sys.path.insert(0, _ROOT)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
RETAIN, MAXF = 3, 8


def main() -> int:
    from g_data_pipeline_spark.multimodal.phash_neardup import (
        phash_neardup_stream,
        structured_images,
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
    work = tempfile.mkdtemp(prefix="soak_phash_")
    src = f"{work}/dumps"
    dir_table = f"{work}/phash_directory"
    out_table = f"{work}/labels"
    ckpt = f"{work}/ckpt"

    ids = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    n_docs = ids.count()

    def dump(b: int):
        if b == 0:
            imgs = structured_images(ids, "doc_id")
        else:
            # re-crawl: the same images re-encoded with a one-bit
            # perturbation (cell b — a different cell each dump, so the
            # variants are distinct bytes every time), PLUS a 10% slice
            # of genuinely new content (ids offset into a fresh range)
            variants = structured_images(ids, "doc_id", flip_cell=b)
            fresh = structured_images(
                ids.filter(F.col("doc_id") % 10 == 0).select(
                    (F.col("doc_id") + F.lit(b * 1_000_000)).alias("doc_id")
                ),
                "doc_id",
            )
            imgs = variants.unionByName(fresh)
        return imgs.select(
            (F.col("media_id") + F.lit(b * 100_000_000)).alias("media_id"),
            "content",
        )

    print(f"soak: ~{n_docs} images/dump x 5 dumps from {SF_DIR}")
    results = []
    total_rows = 0
    for b in range(5):
        n_dump = dump(b).count()
        dump(b).write.mode("append").parquet(src)
        total_rows += n_dump
        t0 = time.time()
        stream = spark.readStream.schema(
            "media_id long, content binary"
        ).parquet(src)
        phash_neardup_stream(stream, dir_table, out_table, ckpt, timeout_s=600)
        wall = time.time() - t0
        m0 = txn.maintain_table(
            spark, dir_table, retain_versions=RETAIN, max_files=MAXF
        )
        labels = txn.read_committed(spark, out_table)
        out_rows = labels.count()
        # STRONG dups (>= 2 shared bands) separate true 1-bit variants
        # (3 shared archived bands) from single-band pigeonhole noise:
        # at 5k docs x 4 16-bit chunks, ~7% of docs tie SOME chunk with
        # SOME other doc per band (1-exp(-n/2^16)), ~13% overall — but
        # two independent smaller-id band ties run ~6*(0.037)^2 ~ 0.8%
        # of docs, so the >=2 rule cleanly isolates real variants.
        dup_rows = labels.filter(F.col("n_dup_buckets") >= 2).count()
        dir_rows = txn.read_committed(spark, dir_table).count()
        n_manifests = len(txn._manifest_versions(spark, dir_table))
        n_files = len(
            txn._load_manifest(
                spark, dir_table, txn.latest_version(spark, dir_table)
            )["files"]
        )
        results.append(
            (b, wall, n_dump, out_rows, dup_rows, dir_rows, n_manifests, n_files)
        )
        print(
            f"dump {b}: wall={wall:.1f}s n={n_dump} out_rows={out_rows} "
            f"dups={dup_rows} dir_rows={dir_rows} manifests={n_manifests} "
            f"files={n_files} compacted={bool(m0.get('compacted'))}"
        )
        assert out_rows == total_rows, (out_rows, total_rows)

    ok = True
    # bounded archive state: manifests <= RETAIN, snapshot files <= MAXF
    ok &= all(r[6] <= RETAIN and r[7] <= MAXF for r in results)
    # dump 0 has ~0.8% strong dups (the two-independent-ties floor)
    ok &= results[0][4] < n_docs * 0.02
    # every later dump: variants of dump-0 SURVIVORS label strongly
    # (3 archived bands). Variants of the ~13% pigeonhole-dropped docs
    # can only hit weakly — survivor-only archiving (the documented
    # contract: only survivors extend any archive) — so the bound is
    # ~0.85 * n_docs, pinned at 0.75 for headroom.
    dups_per_dump = [
        results[i][4] - results[i - 1][4] for i in range(1, 5)
    ]
    ok &= all(d >= n_docs * 0.75 for d in dups_per_dump)
    # archive growth after dump 0 is bounded by the fresh slice's bands
    # (variants never extend the archive — they are dups)
    grows = [results[i][5] - results[i - 1][5] for i in range(1, 5)]
    ok &= all(0 <= g <= (n_docs // 10 + 1) * 4 for g in grows)
    print("RESULT:", "PASS" if ok else "FAIL")
    shutil.rmtree(work, ignore_errors=True)
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
