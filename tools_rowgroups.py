"""Row-group parallelism A/B (r10 verdict #9) — NEVER used by bench/driver.

Every sf0.1 table is ONE parquet file with ONE row group, so every scan
stage runs as a single task regardless of split settings (the r10
"structural finding"). This tool makes the confound measurable without
touching the real testdata or any plan: it copies ONE table from
$SPARK_GRAFT_SF_DIR into a scratch directory rewritten as N files (N
splits -> N scan tasks), then times the same expression-heavy projection
over both layouts inside one JVM, interleaved.

Usage (explicitly opt-in; writes only under --out, default /tmp)::

    python tools_rowgroups.py [--table lineitem] [--n 8] [--rounds 3]

The rewritten copy is deterministic input for the measurement only — it
is deleted afterwards unless --keep is passed. Findings recorded in
TESTDATA.md.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from g_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", default="lineitem")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--out", default="/tmp/gdp_rowgroup_ab")
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gdp-rowgroup-ab")
    src = f"{sf_dir}/{args.table}.parquet"
    dst = f"{args.out}/{args.table}_n{args.n}"
    shutil.rmtree(dst, ignore_errors=True)

    one = spark.read.parquet(src)
    # Deterministic round-robin split into n files — same rows, n splits.
    one.repartition(args.n).write.mode("overwrite").parquet(dst)
    many = spark.read.parquet(dst)

    from pyspark.sql import functions as F

    def heavy(df):
        # Scan-stage expression work representative of the text/profile
        # entries: per-row regex + string + hash, aggregated so the
        # result is one row (no driver-transfer component). Uses the
        # document text when present (the scan-bound regime), else a
        # synthesized string column.
        if "text" in df.columns:
            s = F.col("text")
        else:
            s = F.repeat(
                F.concat_ws(
                    " ",
                    *[F.col(c).cast("string") for c in df.columns[:6]],
                ),
                8,
            )
        return df.select(
            F.sum(F.length(F.regexp_replace(s, "[aeiou0-9]", ""))),
            # per-row array sort+distinct: the repetition/scorecard-class
            # per-task work (heavier than the regex pass)
            F.sum(
                F.size(
                    F.array_distinct(F.array_sort(F.split(F.lower(s), r"\s+")))
                )
            ),
            # decimal accumulator: a long sum of 64-bit hashes overflows
            # under ANSI (house rule, CLAUDE.md)
            F.sum(F.xxhash64(s).cast("decimal(38,0)")),
        )

    def run(df) -> float:
        t0 = time.perf_counter()
        df.collect()
        return time.perf_counter() - t0

    d1, dn = heavy(one), heavy(many)
    d1.collect(), dn.collect()  # warm both (janino/JIT)
    for r in range(args.rounds):
        t1, tn = run(d1), run(dn)
        print(
            f"round {r}: 1-file={t1:.3f}s  {args.n}-file={tn:.3f}s  "
            f"speedup={t1 / tn:.2f}x",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()

    ntasks_1 = one.rdd.getNumPartitions()
    ntasks_n = many.rdd.getNumPartitions()
    print(f"scan splits: 1-file={ntasks_1}, {args.n}-file={ntasks_n}")
    if not args.keep:
        shutil.rmtree(dst, ignore_errors=True)


if __name__ == "__main__":
    main()
