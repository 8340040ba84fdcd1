"""Scratch experiment (optimization r10, guide §1/§6): quantify scan
parallelism on single-file parquet inputs.

Hypothesis: with spark.sql.files.openCostInBytes at its 4 MiB default,
maxSplitBytes = min(128M, max(4M, bytes/defaultParallelism)) floors at
4 MiB, so an 11 MiB lineitem scans as ~3 tasks on 32 cores; scan-stage
work (imperative percentile partials, regex scorecards) serializes on 3
cores. Lowering openCostInBytes lets bytesPerCore govern locally while
changing nothing at 100 TB (bytesPerCore >> 128M there).

Run AFTER any in-flight Spark job finishes (exclusive machine).
Usage: python tools_exp_scan.py <openCostBytes> name [name ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from g_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from g_data_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def main() -> None:
    open_cost = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark(
        app_name=f"exp-scan-{open_cost}",
        extra_conf={"spark.sql.files.openCostInBytes": open_cost},
    )
    print(
        "openCostInBytes =",
        spark.conf.get("spark.sql.files.openCostInBytes"),
    )
    for name in names:
        spec = REGISTRY[name]
        df = spec.fn(spark, SF_DIR)
        df.collect()  # warm: codegen + JIT
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            df.collect()
            best = min(best, time.perf_counter() - t0)
        n_parts = df.rdd.getNumPartitions() if False else None  # noqa
        print(f"{name}: best={best:.3f}")
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
