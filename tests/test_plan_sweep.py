"""Registry-WIDE physical-plan hygiene sweep: every entry's plan is built
(at sf0.001 — plan shape, not timing) and checked for the global scale
invariants, so a future registration can never silently introduce a
cartesian join or a row-at-a-time Python UDF. Complements the per-query
shape pins in tests/test_plans.py.

Eager entries (spec.eager — training loops / kernels that execute at
DataFrame-build time) run their build jobs here too; sf0.001 keeps that
cheap. The sweep is one test so the whole registry shares one pass."""

from __future__ import annotations

from g_data_pipeline_spark.queries import REGISTRY

# Entries allowed to carry Python-evaluation plan nodes, and why. The
# house rule (CLAUDE.md): NO BatchEvalPython anywhere (row-at-a-time
# Python is never acceptable); Arrow-batched pandas nodes only in the
# grouped-kernel gate, the multimodal family, and the BPE encoder.
ARROW_ALLOWED = {
    "p_grouped_median_pandas",  # applyInPandas kernel gate (operators/grouped.py)
    "m_image_features",         # mapInPandas multimodal decode plumbing
    "m_video_frame_stats",
    "m_audio_features",
    "m_image_phash_dedup",
    "t_bpe_tokenize",           # broadcast-vocab Arrow encode
    "t_compression_signal",     # scalar pandas zlib kernel (operators/grouped.py)
}
ARROW_NODES = (
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
    "FlatMapGroupsInPandasWithState",
)

# No entry may plan a CartesianProduct even at tiny scale. The two
# labeled O(n^2) exactness baselines (v_near_dup_pairs, the levenshtein
# demo inside t_levenshtein_fuzzy) keep one side broadcastable by
# construction, so they plan as BroadcastNestedLoopJoin — acceptable
# for a deliberately-small side, never CartesianProduct.
CARTESIAN_ALLOWED: set[str] = set()


def test_registry_wide_plan_hygiene(spark):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted"
    )
    violations: list[str] = []
    for name, spec in REGISTRY.items():
        df = spec.fn(spark, "/root/testdata/sf0.001")
        plan = df._jdf.queryExecution().explainString(mode)
        if "CartesianProduct" in plan and name not in CARTESIAN_ALLOWED:
            violations.append(f"{name}: CartesianProduct")
        if "BatchEvalPython" in plan:
            violations.append(f"{name}: row-at-a-time Python UDF")
        arrow_hits = [op for op in ARROW_NODES if op in plan]
        if arrow_hits and name not in ARROW_ALLOWED:
            violations.append(f"{name}: unexpected pandas node {arrow_hits}")
    assert not violations, "\n".join(violations)
    # the allowlist itself must not rot: every allowed entry still exists
    missing = ARROW_ALLOWED - REGISTRY.keys()
    assert not missing, f"ARROW_ALLOWED names not in registry: {missing}"
