"""The runtime-metrics regression gate (bench.check_runtime_regressions):
counter growth past 2x above the noise floor must trip, waivers must
annotate instead, and the committed BENCH_DETAIL.json must carry no
unwaived violations."""

from __future__ import annotations

import json
from pathlib import Path

from bench import REGRESSION_RATIO, check_runtime_regressions

PREV = {
    "q_big_shuffle": {
        "shuffle_bytes_written": 10 << 20,
        "rows_scanned": 600_000,
        "spill_bytes": 0,
        "collects": 4,
    },
    "q_tiny": {
        "shuffle_bytes_written": 1024,  # under the 1 MiB floor
        "rows_scanned": 100,
        "collects": 4,
    },
    "q_methodology_change": {
        "shuffle_bytes_written": 10 << 20,
        "collects": 4,
    },
}


def test_3x_shuffle_growth_trips():
    new = {
        "q_big_shuffle": {
            "shuffle_bytes_written": 30 << 20,  # 3x: a BM25-class rescan
            "rows_scanned": 600_000,
            "spill_bytes": 0,
            "collects": 4,
        }
    }
    violations, waived = check_runtime_regressions(PREV, new, {})
    assert [v["query"] for v in violations] == ["q_big_shuffle"]
    assert violations[0]["metric"] == "shuffle_bytes_written"
    assert violations[0]["ratio"] == 3.0
    assert waived == []


def test_waiver_moves_violation_to_waived():
    new = {
        "q_big_shuffle": {
            "shuffle_bytes_written": 30 << 20,
            "collects": 4,
        }
    }
    violations, waived = check_runtime_regressions(
        PREV, new, {"q_big_shuffle": "intentional: oracle family widened"}
    )
    assert violations == []
    assert waived[0]["waiver"].startswith("intentional")


def test_growth_below_ratio_or_floor_passes():
    new = {
        "q_big_shuffle": {
            # 1.9x < REGRESSION_RATIO
            "shuffle_bytes_written": int((10 << 20) * 1.9),
            "rows_scanned": 600_000,
            "collects": 4,
        },
        "q_tiny": {
            # 100x but both sides under the noise floor
            "shuffle_bytes_written": 102_400,
            "rows_scanned": 10_000,
            "collects": 4,
        },
    }
    violations, _ = check_runtime_regressions(PREV, new, {})
    assert violations == []
    assert REGRESSION_RATIO == 2.0


def test_collect_count_change_suppresses_compare():
    """Counters only have a stable meaning under the same collect count
    (accumulators grow across repeats while shuffle-stage reuse skips map
    stages) — a methodology change must not read as a regression."""
    new = {
        "q_methodology_change": {
            "shuffle_bytes_written": 100 << 20,
            "collects": 1,
        }
    }
    violations, waived = check_runtime_regressions(PREV, new, {})
    assert violations == [] and waived == []


def test_committed_bench_detail_has_no_unwaived_violations():
    detail = json.loads(
        (Path(__file__).resolve().parents[1] / "BENCH_DETAIL.json").read_text()
    )
    reg = detail.get("runtime_regressions", {"violations": []})
    assert reg["violations"] == [], (
        "BENCH_DETAIL.json records unwaived runtime regressions — fix the "
        "plan or waive with a reason in BENCH_ALLOWED_REGRESSIONS.json: "
        f"{reg['violations']}"
    )
