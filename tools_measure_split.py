"""Split an entry's warm collect() time into compute vs driver transfer.

For each named registry entry: build the DataFrame once, warm it, then
time (a) best-of-3 collect() repeats (the bench methodology) and
(b) best-of-3 noop-sink writes (guide §1.4 — computes every column,
discards the result, no driver transfer). Also prints the output row
count. collect >> noop means the entry's bench seconds are dominated by
returning rows to the driver, not by the query.

Usage::  python tools_measure_split.py name [name ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from g_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from g_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gdp-measure-split")
    for name in names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"split:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        build = time.perf_counter() - t0
        rows = df.collect()  # warm
        nrows = len(rows)
        coll = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.collect()
            coll.append(time.perf_counter() - t0)
        noop = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            noop.append(time.perf_counter() - t0)
        print(
            f"{name}: build={build:.3f} collect={min(coll):.3f} "
            f"noop={min(noop):.3f} nrows={nrows}",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
