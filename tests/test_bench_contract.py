"""Pin bench.py's stdout emission contract.

Round 5's driver record came back ``"parsed": null``: the single JSON line
carried the full 119-entry per-query dict (~4.5 KB) and the driver's tail
capture kept only the last ~4 KB, front-truncating the line. The contract is
therefore: ONE stdout line, < 2048 bytes regardless of registry growth, with
the complete record in BENCH_DETAIL.json beside the repo.
"""

from __future__ import annotations

import json
from pathlib import Path

import bench


def test_stdout_line_bounded_at_any_registry_size(tmp_path, monkeypatch):
    # Simulate a registry twice today's size with worst-case long names.
    monkeypatch.setattr(bench, "REPO_ROOT", str(tmp_path))
    timings = {
        f"a_very_long_query_name_entry_{i:04d}": round(0.0001 * i + 0.05, 4)
        for i in range(400)
    }
    runtime = {
        name: {
            "shuffle_bytes_written": 10**12,
            "shuffle_records_written": 10**9,
            "spill_bytes": 0,
            "rows_scanned": 10**10,
            "n_exchanges": 7,
        }
        for name in timings
    }
    line = bench.emit(timings, runtime, sf=0.1)

    assert "\n" not in line
    assert len(line.encode()) < 2048, f"stdout line {len(line.encode())}B >= 2KB"

    parsed = json.loads(line)
    assert parsed["metric"] == "headline_queries_total_wall"
    assert parsed["unit"] == "sec"
    assert parsed["n_queries"] == 400
    assert len(parsed["queries"]) == 20
    # Inline entries are the costliest ones.
    inline_min = min(parsed["queries"].values())
    dropped_max = max(
        v for k, v in timings.items() if k not in parsed["queries"]
    )
    assert inline_min >= dropped_max
    assert parsed["value"] == round(sum(timings.values()), 4)

    # Full record landed beside the repo and round-trips.
    detail = json.loads(Path(tmp_path, "BENCH_DETAIL.json").read_text())
    assert detail["queries"] == timings
    assert detail["runtime_metrics"] == runtime
    assert detail["n_queries"] == 400


def test_headline_names_exist_in_registry():
    from g_data_pipeline_spark.queries import REGISTRY

    missing = [n for n in bench.HEADLINE if n not in REGISTRY]
    assert not missing, f"HEADLINE names absent from registry: {missing}"
