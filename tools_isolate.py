"""Per-entry isolation harness for the optimization rounds (guide §1).

Times one or more registry entries exactly like bench.py (ONE DataFrame,
warm collect, best-of-3 timed repeats) and additionally:

- a FRESH fn()+collect() run (what a cold plan costs end to end),
- the post-execution ``explain("formatted")`` written to
  ``plans/<tag>/<name>_<suffix>.txt`` (AQE final plan — CLAUDE.md r10
  gotcha: static explain hides AQE-applied exchange reuse).

Usage::

    python tools_isolate.py [--tag r10] [--suffix before] name [name ...]

Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

REPO_ROOT = str(Path(__file__).resolve().parent)
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)

from g_data_pipeline_spark.queries import REGISTRY  # noqa: E402
from g_data_pipeline_spark.session import get_spark  # noqa: E402


def explain_formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--tag", default="r10")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--no-plan", action="store_true")
    args = ap.parse_args()

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="gdp-isolate")
    out_dir = Path(REPO_ROOT, "plans", args.tag)
    out_dir.mkdir(parents=True, exist_ok=True)

    for name in args.names:
        spec = REGISTRY[name]
        spark.sparkContext.setJobDescription(f"isolate:{name}")
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        build = time.perf_counter() - t0
        t0 = time.perf_counter()
        df.collect()
        warm = time.perf_counter() - t0
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            df.collect()
            reps.append(time.perf_counter() - t0)
        t0 = time.perf_counter()
        spec.fn(spark, sf_dir).collect()
        fresh = time.perf_counter() - t0
        if not args.no_plan:
            (out_dir / f"{name}_{args.suffix}.txt").write_text(
                explain_formatted(df)
            )
        print(
            f"{name}: build={build:.3f} warm={warm:.3f} "
            f"best_repeat={min(reps):.3f} fresh={fresh:.3f}",
            flush=True,
        )
        spark.sparkContext._jvm.System.gc()


if __name__ == "__main__":
    main()
