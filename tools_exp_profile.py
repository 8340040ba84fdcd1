"""Scratch (r10 guide §1): break profile(lineitem) into its component jobs
and time each — counts / stats / corr / pcts aggregation passes and the
per-categorical-column top-k jobs — to see where the 2-2.8 s goes.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from g_data_pipeline_spark.catalog import load_table  # noqa: E402
from g_data_pipeline_spark.profiler import profile, top_values  # noqa: E402
from g_data_pipeline_spark.session import get_spark  # noqa: E402


def main() -> None:
    spark = get_spark(app_name="exp-profile")
    li = load_table(spark, "/root/testdata/sf0.1", "lineitem")

    profile(li)  # warm: builds+caches plans, codegen, JIT
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        profile(li)
        best = min(best, time.perf_counter() - t0)
    print(f"profile_full best: {best:.3f}")

    plans = li._gdp_profile_plans["plans"]
    for part, plan in plans.items():
        plan.collect()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            plan.collect()
            best = min(best, time.perf_counter() - t0)
        print(f"pass {part}: {best:.3f}")

    from g_data_pipeline_spark.profiler import classify_columns

    cats = classify_columns(li).categorical
    for c in cats:
        top_values(li, c)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            top_values(li, c)
            best = min(best, time.perf_counter() - t0)
        print(f"top_values {c}: {best:.3f}")


if __name__ == "__main__":
    main()
